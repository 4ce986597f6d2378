"""Sources & sinks: batch connectors beyond bare parquet.

Readers take an EXPLICIT schema wherever the format can't prove one
(CSV/JSON): schema inference is a full extra pass over the data — at
100 TB that doubles the scan — and silently drifts when a new file adds
a field. Writers control output layout: partition columns for pruning,
file counts for small-file avoidance.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    MapType,
    StructType,
)


def read_csv(
    spark: SparkSession, path: str, schema: StructType, header: bool = True,
    **options,
) -> DataFrame:
    """CSV with explicit schema (no inference pass)."""
    return (
        spark.read.schema(schema)
        .options(header=str(header).lower(), **options)
        .csv(path)
    )


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite"):
    df.write.options(header=str(header).lower()).mode(mode).csv(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | None = None, **options
) -> DataFrame:
    """JSON-lines. Schema strongly recommended; without one Spark scans
    the data once just to infer."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.options(**options).json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite"):
    """JSON-lines sink (the interchange format of most LLM-data
    pipelines). Binary columns are not JSON-representable — callers
    encode them (base64) first; this raises early instead of writing
    garbage."""
    from pyspark.sql.types import BinaryType

    for f in df.schema.fields:
        if isinstance(f.dataType, BinaryType):
            raise ValueError(
                f"column {f.name!r} is binary; base64-encode before JSONL"
            )
    df.write.mode(mode).json(path)


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    approx_rows: int | None = None,
    target_rows_per_file: int = 1_000_000,
    mode: str = "overwrite",
):
    """Hive-partitioned parquet sink with small-file control.

    ``partitionBy`` alone writes one file per (task × partition-value) —
    with 1000 tasks × 100 values that's 100k files of a few MB: the
    classic small-file explosion. Repartitioning by the partition
    columns (plus a bounded salt when a value needs > 1 file) makes
    each output file a full task's worth of one partition value.
    Readers then get partition pruning for free on ``partition_by``
    predicates."""
    from pyspark.sql import functions as F

    if approx_rows is None:
        salt_n = 1
    else:
        salt_n = max(1, math.ceil(approx_rows / target_rows_per_file))
    if salt_n > 1:
        salted = df.withColumn("_salt", (F.rand(seed=7) * salt_n).cast("int"))
        out = salted.repartition(*(partition_by + ["_salt"])).drop("_salt")
    else:
        out = df.repartition(*partition_by)
    out.write.partitionBy(*partition_by).mode(mode).parquet(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
):
    """Bucketed (hash-clustered) managed table: pre-shuffles data into
    ``n_buckets`` files per partition clustered by ``bucket_cols``.

    Joins/aggregations between tables bucketed the SAME way on the SAME
    keys need NO exchange at read time — at 100 TB this converts every
    repeated fact⋈fact join on the bucket key from a full shuffle into
    a zipped per-bucket merge. ``sort_cols`` additionally pre-sorts
    within buckets so sort-merge joins skip the sort."""
    w = (
        df.write.bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
        .mode(mode)
        .format("parquet")
    )
    if path is not None:  # external table (e.g. outside the warehouse dir)
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def read_orc(spark: SparkSession, path: str, **options) -> DataFrame:
    """ORC reader — like parquet, ORC is self-describing (schema in the
    file footer) and supports predicate pushdown + column pruning, so
    no explicit schema is required."""
    return spark.read.options(**options).orc(path)


def write_orc(
    df: DataFrame, path: str, mode: str = "overwrite", partition_by: list | None = None
):
    """ORC sink (the columnar interchange format of Hive/Trino stacks)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Whole-file binary ingestion — the front door for media blobs
    (images/audio/video) arriving as individual objects rather than
    rows.  Each row is (path, modificationTime, length, content);
    ``glob`` pushes the filename filter into the file LISTING (files
    never open), which is the only pushdown a whole-file format has.

    Scale: binary files are not splittable, so parallelism equals file
    count — a 100 TB media corpus must arrive as many objects (the
    normal case), and a filter on ``length`` prunes oversized payloads
    before their bytes reach downstream stages only in the sense that
    the column is metadata; the CONTENT of every matched file is still
    read, so prefilter by name/prefix where possible."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list,
    bits: int = 8,
    n_files: int | None = None,
    bounds: tuple | None = None,
    mode: str = "overwrite",
):
    """Z-ORDER-clustered parquet sink: rows are range-partitioned and
    sorted by the Morton interleave of two cluster columns before
    writing, so every output file covers a tight min/max range on BOTH
    columns — parquet row-group/file pruning then works for range
    predicates on either one (the layout trick behind Delta/Iceberg
    ``ZORDER BY``, expressed with stock Spark operators).

    Each column is min/max-scaled to the full ``bits`` width before
    interleaving (one cheap extra min/max scan, or pass ``bounds`` to
    skip it) — interleaving RAW low bits would let whichever dimension
    has the larger magnitude dominate every significant bit and destroy
    locality on the other (a 0–1500 id column against an epoch-hour
    column never constrains a file's range without scaling).

    ``repartitionByRange`` samples the key, so file boundaries adapt to
    its distribution (a skewed dimension doesn't produce one fat file);
    ``sortWithinPartitions`` orders rows inside each file so row-group
    stats are tight too, enabling page/row-group skipping within files.
    The z-key column is dropped before the write — layout is invisible
    to readers.  S10 in SURVEY §2.7."""
    from pyspark.sql import functions as F

    from faconne_spark.functions import zorder_key

    if len(cols) != 2:
        raise ValueError(f"write_zordered clusters exactly 2 columns, got {cols}")
    a, b = cols
    if bounds is None:
        r = df.agg(
            F.min(a), F.max(a), F.min(b), F.max(b)
        ).first()
        if any(v is None for v in r):
            raise ValueError(
                "write_zordered: cannot derive cluster bounds — input is"
                f" empty or a cluster column ({a!r}/{b!r}) is all-NULL;"
                " pass explicit bounds or filter NULLs first"
            )
        bounds = (r[0], r[1], r[2], r[3])
    amin, amax, bmin, bmax = (int(v) for v in bounds)
    m = 1 << bits

    def scaled(col, lo, hi):
        return f"((({col}) - {lo}) * {m} div {hi - lo + 1})"

    z = zorder_key(
        scaled(a, amin, amax), scaled(b, bmin, bmax), bits, "spark"
    )
    keyed = df.withColumn("_zkey", F.expr(z))
    n = n_files or max(df.sparkSession.sparkContext.defaultParallelism, 1)
    (
        keyed.repartitionByRange(n, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .parquet(path)
    )


def compaction_plan(
    spark: SparkSession, path: str, target_bytes: int = 128 * 1024 * 1024
):
    """Small-file compaction plan for a parquet directory: first-fit-
    decreasing bin packing of data files into ~``target_bytes`` output
    groups.  Returns a DataFrame (group_id, n_files, total_bytes,
    files) — the inspection artifact reviewed before rewriting.

    File listing and packing run on the DRIVER deliberately: the input
    is file *metadata* (one row per file, via the Hadoop FileSystem API
    so HDFS/S3 paths work), never data.  At 100 TB a table has ~10⁵-10⁶
    files — trivial driver-side; the heavy part (the rewrite) is
    :func:`compact_parquet`."""
    bins = _ffd_bins(spark, path, target_bytes)
    rows = [
        (i, len(names), total, sorted(names))
        for i, (_, names, total) in enumerate(bins)
    ]
    return spark.createDataFrame(
        rows,
        "group_id int, n_files int, total_bytes bigint, files array<string>",
    )


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    mode: str = "overwrite",
):
    """Execute a compaction: rewrite a fragmented parquet directory into
    ~``target_bytes`` files.  The output file count comes from the same
    FFD plan as :func:`compaction_plan`; rows are hash-redistributed
    with ``repartition(n)`` (even output sizes regardless of input
    fragmentation).  Returns the plan's group count.  The bin count is
    read straight off the driver-side packing — no Spark job or second
    directory listing just to recover a length."""
    n = max(len(_ffd_bins(spark, path, target_bytes)), 1)
    spark.read.parquet(path).repartition(n).write.mode(mode).parquet(out_path)
    return n


def _ffd_bins(spark: SparkSession, path: str, target_bytes: int) -> list:
    """List a directory's parquet data files (Hadoop FS, so HDFS/S3
    work) and first-fit-decreasing pack them into ~target_bytes bins.
    Deterministic: sizes descending, name-stable ties."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    files = [
        (st.getPath().getName(), st.getLen())
        for st in fs.listStatus(jpath)
        if st.isFile()
        and st.getPath().getName().endswith(".parquet")
        and not st.getPath().getName().startswith(("_", "."))
    ]
    files.sort(key=lambda t: (-t[1], t[0]))
    bins = []  # [remaining, [names], total]
    for name, size in files:
        placed = False
        for b in bins:
            if b[0] >= size:
                b[0] -= size
                b[1].append(name)
                b[2] += size
                placed = True
                break
        if not placed:
            bins.append([max(target_bytes - size, 0), [name], size])
    return bins


# S12 — streaming state store reader (Spark 4 State Data Source).
# Reading a running/stopped streaming query's state as a batch
# DataFrame is the operational debugging surface for stateful
# pipelines: inspect watermarked aggregation state, audit session
# windows, or bootstrap a migration without replaying the stream.


def read_stream_state(
    spark: SparkSession,
    checkpoint: str,
    operator_id: int = 0,
    batch_id: int | None = None,
) -> DataFrame:
    """Read a Structured Streaming checkpoint's state store as a batch
    DataFrame (``format("statestore")``) — columns ``key``, ``value``
    (structs mirroring the stateful operator's schema) plus
    ``partition_id``.  ``batch_id`` defaults to the latest committed
    micro-batch.

    Scale: the data source lists one state file per shuffle partition
    per operator — reads parallelize across partitions exactly like the
    stream that wrote them; no driver materialization.
    """
    r = (
        spark.read.format("statestore")
        .option("operatorId", operator_id)
    )
    if batch_id is not None:
        r = r.option("batchId", batch_id)
    return r.load(checkpoint)


def read_stream_state_metadata(
    spark: SparkSession, checkpoint: str
) -> DataFrame:
    """Operator-level metadata of a streaming checkpoint
    (``format("state-metadata")``): operator ids/names, partition
    counts, and the min/max batch ids whose state is retained — the
    index one consults before :func:`read_stream_state`."""
    return spark.read.format("state-metadata").load(checkpoint)


# S13 — write-audit-publish (WAP): stage, validate, atomically publish.


def write_audit_publish(
    df: DataFrame,
    path: str,
    audits: list,
    mode: str = "error",
) -> dict:
    """Write ``df`` to a staging directory next to ``path``, run every
    audit callable against the STAGED read-back (not the in-memory
    plan — audits see exactly what readers will), then publish with an
    atomic filesystem rename.  A failing audit leaves the target
    untouched and removes the staging directory — the
    write-audit-publish pattern production lakehouses run so a bad
    batch can never be half-visible.

    ``audits``: callables ``(DataFrame) -> (ok: bool, detail: str)``.
    ``mode``: 'error' refuses an existing target; 'overwrite' replaces
    it atomically-ish (delete after the staged write is validated, then
    rename — the unavoidable non-transactional window of plain
    filesystems, documented; table formats close it with metadata
    commits).  Returns {'rows': n, 'audits': [...]} on success.

    Scale: the staged write is the same distributed write as a direct
    save; audits are ordinary Spark jobs over the staged files; the
    publish is one namenode/metadata rename — O(1), not a data copy.
    """
    if mode not in ("error", "overwrite"):
        raise ValueError(f"write_audit_publish mode must be error|overwrite, got {mode!r}")
    spark = df.sparkSession
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    final = jvm.org.apache.hadoop.fs.Path(path)
    fs = final.getFileSystem(conf)
    if mode == "error" and fs.exists(final):
        raise ValueError(f"write_audit_publish: target {path!r} exists (mode='error')")
    staging_str = path.rstrip("/") + "._staging"
    staging = jvm.org.apache.hadoop.fs.Path(staging_str)
    if fs.exists(staging):
        fs.delete(staging, True)
    df.write.mode("overwrite").parquet(staging_str)
    staged = spark.read.parquet(staging_str)
    results = []
    try:
        for audit in audits:
            ok, detail = audit(staged)
            results.append({"audit": getattr(audit, "__name__", "audit"),
                            "ok": bool(ok), "detail": detail})
            if not ok:
                raise ValueError(
                    f"write_audit_publish: audit "
                    f"{getattr(audit, '__name__', 'audit')!r} failed: {detail}"
                )
        n = staged.count()
    except Exception:
        fs.delete(staging, True)
        raise
    # re-check the mode contract AT PUBLISH TIME: a target created
    # between the entry check and here must not be silently destroyed
    # in 'error' mode (TOCTOU on plain filesystems; table formats close
    # it with a metadata commit)
    if fs.exists(final):
        if mode == "error":
            fs.delete(staging, True)
            raise ValueError(
                f"write_audit_publish: target {path!r} appeared during the "
                f"staged write (mode='error'); staging removed, target kept"
            )
        fs.delete(final, True)
    if not fs.rename(staging, final):
        # mirror the failing-audit path: never leave ._staging behind
        fs.delete(staging, True)
        raise IOError(f"write_audit_publish: rename to {path!r} failed")
    return {"rows": n, "audits": results}


# S14 — manifest-snapshot tables: atomic snapshot commits + time travel
# on plain parquet (the minimal form of the public Iceberg/Delta idea:
# a table IS its newest manifest; data files are immutable; commit =
# exclusive creation of the next sequential manifest).


class ConcurrentCommitError(RuntimeError):
    """Another writer committed the same snapshot id first — the
    optimistic-concurrency loser.  Retry by re-running the write (the
    data files it staged are orphaned, never referenced)."""


class SchemaEvolutionError(ValueError):
    """An append's schema conflicts with the table schema in a way the
    format refuses: a column whose TYPE changed, or a new column that
    is not nullable (old data files cannot supply values for it).
    Additive nullable columns evolve the schema instead; a full schema
    replacement is an ``overwrite`` commit."""


def _evolve_schema(parent_schema: dict, df_schema) -> dict:
    """Merge an append's schema into the table schema (Iceberg-style
    minimal evolution): columns present in both must keep their exact
    type (no silent casts — widening is refused, documented); columns
    only in the new df are APPENDED to the table schema and must be
    nullable (older data files lack them, so reads project NULL);
    columns only in the parent stay (the new files lack them — same
    NULL projection).  Returns the evolved schema as a JSON dict."""
    import json

    new = json.loads(df_schema.json())
    old_fields = {f["name"]: f for f in parent_schema["fields"]}
    new_fields = {f["name"]: f for f in new["fields"]}
    for name, f in new_fields.items():
        if name in old_fields:
            if old_fields[name]["type"] != f["type"]:
                raise SchemaEvolutionError(
                    f"column {name!r} changes type "
                    f"{old_fields[name]['type']!r} -> {f['type']!r}; "
                    f"type changes (including widening) are refused — "
                    f"write to a new column or overwrite the table"
                )
        elif not f.get("nullable", True):
            raise SchemaEvolutionError(
                f"new column {name!r} is non-nullable; existing data "
                f"files cannot supply it — add it as nullable"
            )
    merged = dict(parent_schema)
    merged["fields"] = parent_schema["fields"] + [
        f for n, f in new_fields.items() if n not in old_fields
    ]
    return merged


def _fs_for(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()), jvm


def _list_manifests(spark: SparkSession, table_dir: str) -> list:
    """(snapshot_id, path) pairs, ascending — missing dir = empty."""
    import re

    fs, jvm = _fs_for(spark, table_dir)
    mdir = jvm.org.apache.hadoop.fs.Path(table_dir + "/_manifests")
    if not fs.exists(mdir):
        return []
    out = []
    for st in fs.listStatus(mdir):
        m = re.fullmatch(r"manifest-(\d+)\.json", st.getPath().getName())
        if m:
            out.append((int(m.group(1)), str(st.getPath())))
    return sorted(out)


def _read_manifest(spark: SparkSession, path: str) -> dict | None:
    """Parse one manifest; None when torn/unparseable (a crashed commit
    left a partial file — readers skip it, the parent stays current)."""
    import json

    fs, jvm = _fs_for(spark, path)
    try:
        stream = fs.open(jvm.org.apache.hadoop.fs.Path(path))
        try:
            data = bytes(
                spark.sparkContext._jvm.org.apache.commons.io.IOUtils
                .toByteArray(stream)
            )
        finally:
            stream.close()
        return json.loads(data.decode("utf-8"))
    except Exception:
        return None


def write_snapshot(
    df: DataFrame, table_dir: str, mode: str = "append"
) -> dict:
    """Commit ``df`` to a manifest-snapshot table: stage immutable
    parquet files under ``table_dir/data/snap-<id>-.../``, then commit
    by EXCLUSIVELY creating ``_manifests/manifest-<id>.json`` listing
    every file visible in the new snapshot (``append`` = parent's files
    plus the new ones; ``overwrite`` = the new ones only).

    The manifest creation is the single commit point (create with
    overwrite=false — the filesystem arbitrates racing writers, and the
    loser raises :class:`ConcurrentCommitError` with only orphaned,
    never-referenced data files to show for it).  A crash mid-commit
    leaves a torn manifest that readers detect (JSON parse fails) and
    skip — the parent snapshot stays current.  This is the minimal
    public lakehouse-table idea: readers never list the data directory,
    so there are no phantom half-written files and O(1) time travel.

    ATOMICITY SCOPE: the commit race is decided by the filesystem's
    exclusive create, which is atomic on HDFS, local filesystems, and
    consistent cloud stores with conditional writes (ABFS, GCS) — but
    NOT on plain S3A, where create(overwrite=false) is a non-atomic
    check-then-PUT and two racers can both "win" (last write silently
    replaces the first manifest).  On S3, front this with a locking
    layer or a conditional-PUT catalog — exactly why the full table
    formats use a catalog service for the commit step.

    Scale: the staged write is an ordinary distributed parquet write;
    the commit is one small metadata file; readers plan from the file
    LIST (no directory listing of millions of files — the same reason
    Iceberg beats Hive tables at scale).
    """
    import json
    import uuid

    if mode not in ("append", "overwrite"):
        raise ValueError(
            f"write_snapshot mode must be append|overwrite, got {mode!r}"
        )
    spark = df.sparkSession
    fs, jvm = _fs_for(spark, table_dir)
    manifests = _list_manifests(spark, table_dir)
    parent = None
    parent_files: list = []
    parent_schema = None
    for sid, mpath in reversed(manifests):
        doc = _read_manifest(spark, mpath)
        if doc is not None:
            parent = sid
            parent_files = doc["files"]
            parent_schema = doc.get("schema")
            break
    # schema evolution (append only — overwrite REPLACES the schema):
    # additive nullable columns evolve the table schema; type changes
    # and non-nullable additions refuse BEFORE any file is staged
    table_schema = json.loads(df.schema.json())
    if mode == "append" and parent_schema is not None:
        table_schema = _evolve_schema(parent_schema, df.schema)
    snap_id = (manifests[-1][0] + 1) if manifests else 0
    data_rel = f"data/snap-{snap_id}-{uuid.uuid4().hex[:8]}"
    data_dir = table_dir.rstrip("/") + "/" + data_rel
    df.write.mode("error").parquet(data_dir)
    new_files = sorted(
        f"{data_rel}/{st.getPath().getName()}"
        for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(data_dir))
        if st.getPath().getName().endswith(".parquet")
    )
    # one distributed pass over the staged files folds the row count
    # AND per-file zone maps (min/max of every atomic column, grouped
    # by input_file_name) — the Iceberg-style column stats that let
    # readers SKIP files at planning time (see plan_snapshot_files)
    staged = spark.read.parquet(data_dir)
    stat_cols = [
        f.name for f in staged.schema.fields
        if not isinstance(
            f.dataType, (ArrayType, MapType, StructType, BinaryType)
        )
    ]
    from pyspark.sql import functions as _F

    per_file = (
        staged.groupBy(_F.input_file_name().alias("__f"))
        .agg(
            _F.count("*").alias("__n"),
            *[
                a
                for c in stat_cols
                for a in (
                    _F.min(c).alias(f"__min_{c}"),
                    _F.max(c).alias(f"__max_{c}"),
                )
            ],
        )
        .collect()
    )
    n_rows = sum(r["__n"] for r in per_file)

    def _j(v):
        # JSON-safe bound: primitives pass through, everything else
        # (dates, timestamps, decimals) goes through str() — the
        # pruner compares same-typed bounds, so str ordering is only
        # used for str-typed columns and ISO dates, where it is
        # order-faithful
        return v if isinstance(v, (int, float, str, bool, type(None))) \
            else str(v)

    file_stats = {}
    for r in per_file:
        name = r["__f"].rsplit("/", 1)[-1]
        file_stats[f"{data_rel}/{name}"] = {
            "n_rows": r["__n"],
            **{
                c: [_j(r[f"__min_{c}"]), _j(r[f"__max_{c}"])]
                for c in stat_cols
            },
        }
    files = (parent_files + new_files) if mode == "append" else new_files
    # append keeps the parent's stats for the files it carries forward
    parent_stats = {}
    if mode == "append" and parent is not None:
        for sid, mpath in reversed(manifests):
            d = _read_manifest(spark, mpath)
            if d is not None:
                parent_stats = d.get("file_stats", {}) or {}
                break
    manifest = {
        "snapshot_id": snap_id,
        "parent": parent,
        "mode": mode,
        "files": files,
        "n_files": len(files),
        "n_rows_added": n_rows,
        "file_stats": {**parent_stats, **file_stats},
        # the schema travels in the manifest so an empty snapshot (an
        # overwrite that matched nothing) still reads back as an empty,
        # correctly-typed table; appends carry the EVOLVED table schema
        # (parent columns + any additive nullable columns), which is
        # what gives old snapshots their own stable read schema
        "schema": table_schema,
    }
    mpath = jvm.org.apache.hadoop.fs.Path(
        table_dir.rstrip("/") + f"/_manifests/manifest-{snap_id}.json"
    )
    fs.mkdirs(mpath.getParent())
    try:
        out = fs.create(mpath, False)  # overwrite=False: the commit race
    except Exception as exc:
        # ONLY a lost commit race becomes ConcurrentCommitError (and
        # cleans its orphaned staged files); any other failure —
        # permissions, quota, transient I/O — re-raises as itself with
        # the staged files LEFT IN PLACE (they are never referenced, and
        # destroying a finished distributed write over a transient error
        # would force a full re-write)
        name = ""
        java_exc = getattr(exc, "java_exception", None)
        if java_exc is not None:
            name = java_exc.getClass().getName()
        if "AlreadyExists" in name or "already exists" in str(exc).lower():
            fs.delete(jvm.org.apache.hadoop.fs.Path(data_dir), True)
            raise ConcurrentCommitError(
                f"snapshot {snap_id} of {table_dir!r} was committed by "
                f"another writer; staged files removed — retry the write"
            ) from exc
        raise
    try:
        out.write(bytearray(json.dumps(manifest).encode("utf-8")))
    finally:
        out.close()
    return manifest


def read_snapshot(
    spark: SparkSession, table_dir: str, snapshot_id: int | None = None
) -> DataFrame:
    """Read a manifest-snapshot table as of ``snapshot_id`` (default:
    the newest VALID snapshot — torn manifests from crashed commits are
    skipped).  Plans from the manifest's file list, so concurrent
    writers' half-staged files are invisible and filter pushdown /
    column pruning apply per file exactly as for a plain parquet scan."""
    manifests = _list_manifests(spark, table_dir)
    if snapshot_id is not None:
        matches = [p for sid, p in manifests if sid == snapshot_id]
        if not matches:
            raise ValueError(
                f"no snapshot {snapshot_id} in {table_dir!r} "
                f"(have {[sid for sid, _ in manifests]})"
            )
        doc = _read_manifest(spark, matches[0])
        if doc is None:
            raise ValueError(
                f"snapshot {snapshot_id} of {table_dir!r} is torn "
                f"(crashed commit) — pick a valid ancestor"
            )
    else:
        doc = None
        for sid, mpath in reversed(manifests):
            doc = _read_manifest(spark, mpath)
            if doc is not None:
                break
        if doc is None:
            raise ValueError(f"{table_dir!r} has no valid snapshots")
    if not doc["files"]:
        # a legitimately empty snapshot (an overwrite that kept nothing)
        # reads back as an empty, correctly-typed table via the schema
        # the manifest carries; manifests without one (hand-written /
        # pre-schema) have nothing to type the result with
        if doc.get("schema") is not None:
            import json

            from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    MapType,
    StructType,
)

            return spark.createDataFrame(
                [], StructType.fromJson(doc["schema"])
            )
        raise ValueError(
            f"snapshot {doc['snapshot_id']} of {table_dir!r} is empty "
            f"and carries no schema"
        )
    base = table_dir.rstrip("/")
    reader = spark.read
    if doc.get("schema") is not None:
        import json  # noqa: F401  (StructType below)

        from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    MapType,
    StructType,
)

        # read under the MANIFEST's schema, not file inference: after
        # an add-column evolution, older data files lack the new
        # columns and must project NULL for them — and time travel to a
        # pre-evolution snapshot reads under THAT manifest's narrower
        # schema, files written later being invisible to it anyway
        reader = reader.schema(StructType.fromJson(doc["schema"]))
    return reader.parquet(*[f"{base}/{f}" for f in doc["files"]])


def snapshot_history(spark: SparkSession, table_dir: str) -> DataFrame:
    """One row per snapshot (torn manifests flagged, not hidden):
    (snapshot_id, parent, mode, n_files, n_rows_added, valid)."""
    rows = []
    for sid, mpath in _list_manifests(spark, table_dir):
        doc = _read_manifest(spark, mpath)
        if doc is None:
            rows.append((sid, None, None, None, None, False))
        else:
            rows.append(
                (sid, doc["parent"], doc["mode"], doc["n_files"],
                 doc["n_rows_added"], True)
            )
    return spark.createDataFrame(
        rows,
        "snapshot_id int, parent int, mode string, n_files int,"
        " n_rows_added bigint, valid boolean",
    )


def read_snapshot_changes(
    spark: SparkSession,
    table_dir: str,
    from_snapshot: int,
    to_snapshot: int | None = None,
) -> DataFrame:
    """Incremental consumption of a manifest-snapshot table: the rows
    in files ADDED after ``from_snapshot`` up to ``to_snapshot``
    (default: latest valid) — the CDC-style feed a downstream
    micro-batch job reads instead of rescanning the table (pair with
    the incremental-aggregate operators to maintain derived state).

    Append-only semantics: because data files are immutable, the added
    file set IS the added row set.  An ``overwrite`` snapshot in the
    range makes 'changes' ill-defined (rows disappeared) — this raises
    rather than silently replaying the full table.

    Scale: planning is manifest-list set difference (two small JSON
    reads); the scan touches ONLY the added files."""
    manifests = dict(_list_manifests(spark, table_dir))
    if from_snapshot not in manifests:
        raise ValueError(
            f"no snapshot {from_snapshot} in {table_dir!r}"
        )
    from_doc = _read_manifest(spark, manifests[from_snapshot])
    if from_doc is None:
        raise ValueError(f"snapshot {from_snapshot} is torn")
    if to_snapshot is None:
        to_doc = None
        for sid in sorted(manifests, reverse=True):
            d = _read_manifest(spark, manifests[sid])
            if d is not None:
                to_doc, to_snapshot = d, sid
                break
        if to_doc is None:
            raise ValueError(f"{table_dir!r} has no valid snapshots")
    else:
        if to_snapshot not in manifests:
            raise ValueError(f"no snapshot {to_snapshot} in {table_dir!r}")
        to_doc = _read_manifest(spark, manifests[to_snapshot])
        if to_doc is None:
            raise ValueError(f"snapshot {to_snapshot} is torn")
    if to_snapshot < from_snapshot:
        raise ValueError(
            f"to_snapshot {to_snapshot} < from_snapshot {from_snapshot}"
        )
    for sid in range(from_snapshot + 1, to_snapshot + 1):
        if sid in manifests:
            d = _read_manifest(spark, manifests[sid])
            if d is not None and d["mode"] == "overwrite":
                raise ValueError(
                    f"snapshot {sid} is an overwrite — incremental "
                    f"changes are ill-defined across it; re-read the "
                    f"table from read_snapshot({sid})"
                )
    added = sorted(set(to_doc["files"]) - set(from_doc["files"]))
    if not added:
        raise ValueError(
            f"no files added between snapshots {from_snapshot} and "
            f"{to_snapshot} of {table_dir!r}"
        )
    base = table_dir.rstrip("/")
    reader = spark.read
    if to_doc.get("schema") is not None:
        from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    MapType,
    StructType,
)

        # the feed reads under the TO snapshot's (possibly evolved)
        # schema: files added before an add-column boundary project
        # NULL for the new columns, matching what read_snapshot shows
        reader = reader.schema(StructType.fromJson(to_doc["schema"]))
    return reader.parquet(*[f"{base}/{f}" for f in added])


def expire_snapshots(
    spark: SparkSession,
    table_dir: str,
    keep_last: int = 2,
    grace_seconds: int = 0,
) -> dict:
    """Retention for a manifest-snapshot table: drop all but the newest
    ``keep_last`` manifests, then VACUUM — delete every data file no
    surviving manifest references (expired history + orphans from
    losing/crashed commits).  Time travel past the retention horizon is
    gone afterwards; the newest snapshots keep working untouched — the
    same contract as the public table formats' expire+orphan-cleanup.

    ``grace_seconds`` protects IN-FLIGHT commits: an unreferenced file
    younger than the grace window is left alone, because a concurrent
    writer stages data files BEFORE its manifest exists — vacuuming
    with no grace while writers run would delete their staged work.
    The same grace applies to TORN manifests (a racing writer's
    manifest looks torn while its bytes are still being written).
    Production should pass a comfortably large value (the formats use
    hours); the default 0 is only safe when no writer is active.

    Retention counts VALID snapshots only: torn manifests never
    displace a valid one from the keep window (otherwise keep_last=1
    next to a crashed commit would expire the real head and vacuum the
    whole table).

    Scale: pure metadata — manifest JSON reads, one data-directory
    walk, no Spark job."""
    if keep_last < 1:
        raise ValueError(f"expire_snapshots needs keep_last >= 1, got {keep_last}")
    import time as _time

    fs, jvm = _fs_for(spark, table_dir)
    now_ms = int(_time.time() * 1000)
    manifests = _list_manifests(spark, table_dir)
    if not manifests:
        raise ValueError(f"{table_dir!r} has no snapshots")
    valid, torn = [], []
    for sid, mpath in manifests:
        if _read_manifest(spark, mpath) is None:
            torn.append((sid, mpath))
        else:
            valid.append((sid, mpath))
    expired, kept = valid[:-keep_last], valid[-keep_last:]
    for _, mpath in expired:
        fs.delete(jvm.org.apache.hadoop.fs.Path(mpath), False)
    for _, mpath in torn:
        p = jvm.org.apache.hadoop.fs.Path(mpath)
        age_ms = now_ms - fs.getFileStatus(p).getModificationTime()
        if age_ms >= grace_seconds * 1000:
            fs.delete(p, False)
    referenced = set()
    for _, mpath in kept:
        doc = _read_manifest(spark, mpath)
        if doc is not None:
            referenced.update(doc["files"])
    base = table_dir.rstrip("/")
    data_root = jvm.org.apache.hadoop.fs.Path(base + "/data")
    removed = 0
    if fs.exists(data_root):
        for sub in fs.listStatus(data_root):
            if not sub.isDirectory():
                continue
            sub_name = sub.getPath().getName()
            live = 0
            for st in fs.listStatus(sub.getPath()):
                rel = f"data/{sub_name}/{st.getPath().getName()}"
                is_data = st.getPath().getName().endswith(".parquet")
                if rel in referenced:
                    live += 1
                    continue
                young = (now_ms - st.getModificationTime()) < grace_seconds * 1000
                if young:
                    live += 1  # possibly a racing writer's staged file
                    continue
                # recursive for directory entries: a crashed write's
                # _temporary tree is a non-empty DIRECTORY — a plain
                # delete throws and would abort the vacuum mid-way
                fs.delete(st.getPath(), st.isDirectory())
                if is_data:
                    removed += 1
            if live == 0:
                fs.delete(sub.getPath(), True)
    return {
        "expired_snapshots": [sid for sid, _ in expired],
        "kept_snapshots": [sid for sid, _ in kept],
        "removed_files": removed,
    }


def compact_snapshot(
    spark: SparkSession, table_dir: str, target_bytes: int = 128 * 1024 * 1024
) -> dict:
    """Rewrite a manifest-snapshot table's CURRENT data into
    ~``target_bytes`` files and commit the result as a new OVERWRITE
    snapshot — small-file compaction with full snapshot isolation
    (readers of older snapshots are untouched; pair with
    :func:`expire_snapshots` to actually reclaim the old files).

    Concurrency: a compaction is a REWRITE of a specific base snapshot,
    so after the commit the new manifest's parent is revalidated against
    that base — if another writer committed in between (its rows would
    be silently dropped by our overwrite head), the compaction manifest
    is withdrawn and :class:`ConcurrentCommitError` raised; the
    interleaved commit stays the head and the caller retries.  This is
    the rewrite-revalidation step every real table format performs
    before publishing a compaction.

    Scale: sizes come from the manifest's file list (no directory
    walk); the rewrite is one repartition-by-count distributed write."""
    import math as _math

    fs, jvm = _fs_for(spark, table_dir)
    manifests = _list_manifests(spark, table_dir)
    doc = None
    for _, mpath in reversed(manifests):
        doc = _read_manifest(spark, mpath)
        if doc is not None:
            break
    if doc is None or not doc["files"]:
        raise ValueError(f"{table_dir!r} has no non-empty valid snapshot")
    base_id = doc["snapshot_id"]
    base = table_dir.rstrip("/")
    total = 0
    for f in doc["files"]:
        total += fs.getFileStatus(
            jvm.org.apache.hadoop.fs.Path(f"{base}/{f}")
        ).getLen()
    n_files = max(1, _math.ceil(total / target_bytes))
    df = spark.read.parquet(*[f"{base}/{f}" for f in doc["files"]]).repartition(
        n_files
    )
    manifest = write_snapshot(df, table_dir, mode="overwrite")
    if manifest["parent"] != base_id:
        # a commit interleaved between our base read and our commit —
        # withdraw the compaction (delete its manifest + data) so the
        # interleaved rows stay visible, and let the caller retry
        mpath = jvm.org.apache.hadoop.fs.Path(
            base + f"/_manifests/manifest-{manifest['snapshot_id']}.json"
        )
        fs.delete(mpath, False)
        for f in manifest["files"]:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{base}/{f}"), False)
        raise ConcurrentCommitError(
            f"compact_snapshot of {table_dir!r}: snapshot "
            f"{manifest['parent']} was committed while compacting base "
            f"{base_id}; compaction withdrawn — retry"
        )
    return {
        "snapshot_id": manifest["snapshot_id"],
        "input_files": len(doc["files"]),
        "output_files": manifest["n_files"],
        "input_bytes": total,
    }


def sampled_file_names(
    spark: SparkSession, path: str, fraction: float, salt: str = "sample"
) -> list:
    """The file names :func:`read_sampled_files` would keep — the
    deterministic hash decision factored out so callers (and tests) can
    audit the sample without reading any data."""
    import hashlib

    if not 0.0 < fraction <= 1.0:
        raise ValueError(
            f"read_sampled_files: fraction must be in (0, 1], got {fraction}"
        )
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    names = [
        st.getPath().getName()
        for st in fs.listStatus(jpath)
        if st.isFile()
        and st.getPath().getName().endswith(".parquet")
        and not st.getPath().getName().startswith(("_", "."))
    ]
    thr = int(fraction * float(1 << 60))
    return sorted(
        n
        for n in names
        if int(hashlib.md5(f"{salt}:{n}".encode()).hexdigest()[:15], 16)
        < thr
    )


def read_sampled_files(
    spark: SparkSession, path: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Deterministic file-level sampled read: keep a data file iff its
    60-bit md5(salt ‖ name) falls below fraction·2⁶⁰ — the dev-loop
    scale pattern for iterating against a ~100 TB table: the subset is
    STABLE across runs (same files every time, independent of listing
    order), NESTED across fractions (the 1% sample is a subset of the
    10% sample, because both compare the same hash to a threshold), and
    excluded files cost nothing (pruning happens on the driver-side
    file LIST, before any I/O or task scheduling).  ``salt`` picks an
    independent sample family — e.g. a disjoint holdout via a second
    salt.

    File-level sampling is biased if rows were written clustered (a
    file ≈ a partition range); use it for throughput-realistic dev
    iteration, not for statistical estimates — that's what
    row-level Poisson weights are for (evalstats).

    Scale (100 TB): listing is file *metadata* on the driver (the
    compaction planner's justification, sources S11); the read plans
    only the kept files, so scan cost is proportional to the sample."""
    kept = sampled_file_names(spark, path, fraction, salt)
    if not kept:
        raise ValueError(
            f"read_sampled_files: fraction {fraction} kept none of the"
            f" files under {path} — raise it or change the salt"
        )
    sep = "" if path.endswith("/") else "/"
    return spark.read.parquet(*[f"{path}{sep}{n}" for n in kept])


def plan_snapshot_files(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int | None = None,
    prune: dict | None = None,
) -> list:
    """The file list a read of ``snapshot_id`` would scan, after
    zone-map pruning: ``prune={"col": (lo, hi)}`` keeps only files
    whose manifest [min, max] for ``col`` INTERSECTS [lo, hi] (either
    bound may be None for one-sided ranges).  This is the
    Iceberg-style planning step that makes a 100 TB table cheap to
    range-query: the decision runs entirely on the manifest — no file
    is opened.

    Conservative by construction: a file with no recorded stats for a
    pruned column (pre-stats manifests, carried-forward files from a
    pre-stats append) is KEPT; NULL bounds (all-NULL column in that
    file) are kept only for ``lo is None and hi is None``-free...
    kept always, since NULL comparisons cannot prove exclusion."""
    manifests = _list_manifests(spark, table_dir)
    doc = None
    if snapshot_id is not None:
        for sid, mpath in manifests:
            if sid == snapshot_id:
                doc = _read_manifest(spark, mpath)
        if doc is None:
            raise ValueError(f"no valid snapshot {snapshot_id}")
    else:
        for sid, mpath in reversed(manifests):
            doc = _read_manifest(spark, mpath)
            if doc is not None:
                break
        if doc is None:
            raise ValueError(f"{table_dir!r} has no valid snapshots")
    files = doc["files"]
    if not prune:
        return list(files)
    stats = doc.get("file_stats", {}) or {}
    kept = []
    for f in files:
        st = stats.get(f)
        keep = True
        if st is not None:
            for col, (lo, hi) in prune.items():
                bounds = st.get(col)
                if bounds is None:
                    continue  # no stats for this column: keep
                mn, mx = bounds
                if mn is None or mx is None:
                    continue  # all-NULL file: cannot prove exclusion
                if lo is not None and mx < lo:
                    keep = False
                    break
                if hi is not None and mn > hi:
                    keep = False
                    break
        if keep:
            kept.append(f)
    return kept


def read_snapshot_pruned(
    spark: SparkSession,
    table_dir: str,
    prune: dict,
    snapshot_id: int | None = None,
) -> DataFrame:
    """read_snapshot restricted to the zone-map-surviving files —
    planning-level file skipping on top of the ordinary per-file
    parquet pushdown.  The caller still applies its row filter (the
    zone map only proves which FILES cannot match); an empty
    surviving set returns an empty, correctly-typed frame."""
    import json as _json  # noqa: F401

    manifests = _list_manifests(spark, table_dir)
    doc = None
    if snapshot_id is not None:
        for sid, mpath in manifests:
            if sid == snapshot_id:
                doc = _read_manifest(spark, mpath)
    else:
        for sid, mpath in reversed(manifests):
            doc = _read_manifest(spark, mpath)
            if doc is not None:
                break
    if doc is None:
        raise ValueError(f"no valid snapshot in {table_dir!r}")
    kept = plan_snapshot_files(
        spark, table_dir, snapshot_id=doc["snapshot_id"], prune=prune
    )
    schema = (
        StructType.fromJson(doc["schema"])
        if doc.get("schema") is not None
        else None
    )
    if not kept:
        if schema is None:
            raise ValueError(
                "zone-map pruning left no files and the manifest has"
                " no schema to type an empty result"
            )
        return spark.createDataFrame([], schema)
    base = table_dir.rstrip("/")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(*[f"{base}/{f}" for f in kept])
