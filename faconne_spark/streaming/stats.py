"""Streaming corpus statistics: the continuous face of the batch
curation dashboards (``source_stats`` / ``corpus_health`` /
``quality_gate`` in queries/pipeline.py).

Design: each micro-batch reduces to DECOMPOSABLE sufficient statistics
— per-(source, lang) doc/char/token counts, per-fingerprint copy
counts, per-(keep, reject_reasons) gate tallies — written as
epoch-partitioned parquet partials under a state directory.  The
dashboards are then exact partial-aggregate rollups over the state
(`*_from_state`), bit-equal to running the batch operator over the
union of every micro-batch:

- counts / sums merge by addition,
- ``avg_chars`` is re-derived as total/count at read time (never
  averaged-of-averages),
- ``n_langs`` / ``n_sources`` merge because the partials keep the full
  (source, lang) key, and
- the exact-duplicate rate merges because ``phash60`` fingerprints are
  deterministic, so cross-epoch copies collapse in the rollup
  (``n_exact_dups = Σcopies − #distinct fingerprints``).

Scale: state per epoch is O(sources×langs + distinct fingerprints +
reject-reason combos) — the compact checkpoint, not the corpus; the
fingerprint relation is the same asymptotics as the incremental-dedup
state next door.  Restart idempotency follows the same contract as
:func:`faconne_spark.streaming.incremental_dedup_epoch`: every write is
partitioned by epoch with dynamic partition overwrite, and an epoch is
pure write-only (no read-modify-write), so a foreachBatch same-epoch
replay overwrites its own partitions bit-identically.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from faconne_spark.functions import tokens_ws
from faconne_spark.operators.dedup import exact_dedup
from faconne_spark.operators.text import quality_gate_verdicts

SOURCE_LANG = "source_lang"
FINGERPRINTS = "fingerprints"
GATE = "gate"


def corpus_stats_epoch(batch_df: DataFrame, epoch_id: int, state_dir: str):
    """Reduce one micro-batch of documents to its three partial-stat
    relations and overwrite this epoch's partitions (idempotent under
    the foreachBatch same-epoch replay contract)."""
    toks = tokens_ws("text", "spark")
    # three write actions read the same micro-batch: persist it once so
    # the input files aren't rescanned (and quality_score's regexes not
    # recomputed) per partial
    batch_df = batch_df.persist()
    try:
        partials = {
            SOURCE_LANG: batch_df.groupBy("source", "lang").agg(
                F.count("*").alias("n_docs"),
                F.sum("n_chars").alias("total_chars"),
                F.sum(F.expr(f"size({toks})")).alias("total_tokens"),
            ),
            FINGERPRINTS: exact_dedup(batch_df).select(
                "fingerprint", "n_copies"
            ),
            GATE: quality_gate_verdicts(batch_df)
            .groupBy("keep", "reject_reasons")
            .agg(F.count("*").alias("n_docs")),
        }
        for name, rel in partials.items():
            (
                rel.withColumn("epoch", F.lit(epoch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("epoch")
                .parquet(os.path.join(state_dir, name))
            )
    finally:
        batch_df.unpersist()


def streaming_corpus_stats(stream: DataFrame, state_dir: str):
    """Attach the running-stats maintenance to a document stream.
    Returns the ``writeStream`` builder (caller sets checkpoint/trigger
    and ``start()``s).  ``foreachBatch`` is the right hook because each
    epoch is a three-relation batch computation with its own writes."""

    def handle(batch_df, epoch_id):
        corpus_stats_epoch(batch_df, epoch_id, state_dir)

    return stream.writeStream.foreachBatch(handle)


def _state(spark: SparkSession, state_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(state_dir, name))


def source_stats_from_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Per-source rollup over the partial state — same schema and values
    as the batch ``source_stats`` over the union of all micro-batches."""
    return (
        _state(spark, state_dir, SOURCE_LANG)
        .groupBy("source")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("total_chars").alias("total_chars"),
            F.round(
                F.sum("total_chars") / F.sum("n_docs").cast("double"), 6
            ).alias("avg_chars"),
            F.countDistinct("lang").alias("n_langs"),
            F.min("lang").alias("first_lang"),
        )
    )


def corpus_health_from_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """One-row health dashboard over the partial state — same schema and
    values as the batch ``corpus_health`` over the union of all
    micro-batches.  The fingerprint rollup collapses cross-epoch copies
    before counting, so the duplicate rate sees duplicates that span
    micro-batches."""
    sl = _state(spark, state_dir, SOURCE_LANG)
    stats = sl.agg(
        F.sum("n_docs").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("total_tokens").alias("total_tokens"),
        F.sum("total_chars").alias("total_chars"),
    )
    dup = (
        _state(spark, state_dir, FINGERPRINTS)
        .groupBy("fingerprint")
        .agg(F.sum("n_copies").alias("n_copies"))
        .agg(
            F.count("*").alias("n_fingerprints"),
            F.sum(F.expr("n_copies - 1")).alias("n_exact_dups"),
        )
    )
    return stats.crossJoin(dup).select(
        "n_docs", "n_langs", "n_sources", "total_tokens", "total_chars",
        "n_fingerprints", "n_exact_dups",
        F.expr(
            "round(cast(n_exact_dups as double) / cast(n_docs as double), 6)"
        ).alias("dup_rate"),
    )


def quality_gate_summary(verdicts: DataFrame) -> DataFrame:
    """Batch-side gate summary (counts per keep/reject-reason combo) —
    the comparison target for the streaming rollup."""
    return verdicts.groupBy("keep", "reject_reasons").agg(
        F.count("*").alias("n_docs")
    )


def quality_gate_summary_from_state(
    spark: SparkSession, state_dir: str
) -> DataFrame:
    """Gate summary over the partial state — equals
    :func:`quality_gate_summary` of the batch verdicts over the union of
    all micro-batches (the gate is map-only, so per-epoch tallies merge
    by addition)."""
    return (
        _state(spark, state_dir, GATE)
        .groupBy("keep", "reject_reasons")
        .agg(F.sum("n_docs").alias("n_docs"))
    )


def temperature_plan_from_state(
    spark: SparkSession, state_dir: str, budget_frac: float = 0.5
) -> DataFrame:
    """The α=0.5 temperature mixture plan derived straight from the
    running-stats state — the continuously-maintained version of
    ``sample_temperature``'s planning half: per-source sizes are an
    exact rollup of the per-epoch (source, lang) partials, budgets
    follow the same division-free DECIMAL(38,0) arithmetic as
    :func:`faconne_spark.operators.text.sqrt_temperature_sample`.

    Returns (source, n_docs, w_micro, budget, sum_w) — the
    broadcastable plan relation an ingestion job applies with the
    hash-membership test ``pmod(hash, n_docs) * sum_w < budget *
    w_micro`` (all four numeric columns are load-bearing);
    the realized keep counts come from the batch operator over actual
    documents (membership needs doc ids, which the compact state
    rightly does not keep)."""
    from faconne_spark.functions import sqrt_weight_micro

    w_expr = sqrt_weight_micro("n_docs")
    per_source = (
        _state(spark, state_dir, SOURCE_LANG)
        .groupBy("source")
        .agg(F.sum("n_docs").alias("n_docs"))
    )
    tot = per_source.agg(
        F.sum("n_docs").alias("_total"),
        F.sum(F.expr(w_expr)).alias("_sum_w"),
    )
    return (
        per_source.withColumn("w_micro", F.expr(w_expr))
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "w_micro",
            F.expr(
                f"cast(round(_total * {budget_frac}, 0) as decimal(38,0))"
            ).alias("budget"),
            F.col("_sum_w").alias("sum_w"),
        )
    )


# ------------------------------------------------- value-quantile state

VALUE_BINS = "value_bins"


def value_stats_epoch(
    batch_df: DataFrame,
    epoch_id: int,
    state_dir: str,
    bounds: tuple,
    key: str = "event_type",
    value_col: str = "value",
    n_bins: int = 64,
):
    """Reduce one micro-batch of events to per-key mergeable value
    state: (n, fixed-point sum, min, max) algebraic aggregates PLUS
    histogram bin counts over CALLER-PINNED global bounds —
    decomposable sufficient statistics for streaming quantile
    estimates.

    ``bounds`` must be pinned by the caller (domain knowledge: sensor
    range, price cap, ...) because a histogram whose bin space is
    derived per epoch cannot merge across epochs — the fixed-range
    histogram is the standard streaming contract (out-of-range values
    clamp to the edge bins, visible in the min/max of the algebraic
    state).  Same epoch-partitioned dynamic-overwrite idempotency
    contract as the corpus stats."""
    from faconne_spark.operators.relational import bounds_us, mergeable_stats

    lo, hi = bounds_us(bounds, "value_stats_epoch")
    us = f"cast(floor({value_col} * 1000000 + 0.5) as bigint)"
    # clamp the VALUE before the bin multiply (bounded_bin_sql): the
    # old clamp-the-product form still overflowed BIGINT in
    # (us − lo) · n_bins for a far-out-of-range sensor-glitch value —
    # the exact case the edge-bin clamp exists for
    from faconne_spark.operators.evalstats import bounded_bin_sql

    bin_expr = bounded_bin_sql(us, f"{lo}L", f"{hi}L", n_bins)
    # two write actions read the same micro-batch: persist it once so
    # the input files aren't rescanned per partial (the same pattern as
    # corpus_stats_epoch above)
    batch_df = batch_df.persist()
    try:
        stats = mergeable_stats(batch_df, key, value_col)
        bins = (
            batch_df.withColumn("_bin", F.expr(bin_expr))
            .groupBy(key, "_bin")
            .agg(F.count("*").alias("n"))
        )
        for name, rel in ((VALUE_BINS, bins), (VALUE_BINS + "_agg", stats)):
            (
                rel.withColumn("epoch", F.lit(epoch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("epoch")
                .parquet(os.path.join(state_dir, name))
            )
    finally:
        batch_df.unpersist()


def value_stats_from_state(
    spark: SparkSession, state_dir: str, key: str = "event_type"
) -> DataFrame:
    """Merged per-key algebraic value stats over every epoch — equal to
    the batch :func:`~faconne_spark.operators.relational
    .mergeable_stats` over the union of all micro-batches (the
    merge_stats contract, applied across epochs)."""
    from faconne_spark.operators.relational import merge_stats

    parts = _state(spark, state_dir, VALUE_BINS + "_agg").drop("epoch")
    return merge_stats(parts.select(key, "n", "sum_us", "min_us", "max_us"))


def value_quantiles_from_state(
    spark: SparkSession,
    state_dir: str,
    bounds: tuple,
    key: str = "event_type",
    n_bins: int = 64,
    qs: tuple = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Quantile estimates off the merged cross-epoch histogram — the
    streaming face of :func:`~faconne_spark.operators.relational
    .histogram_quantiles` with the same pinned bounds: bin counts add
    across epochs, then the identical integer cumulative-threshold /
    bin-midpoint arithmetic reads the estimates (batch⇆stream equality
    pinned in tests)."""
    from pyspark.sql import Window

    from faconne_spark.operators.relational import bounds_us

    lo, hi = bounds_us(bounds, "value_quantiles_from_state")
    merged = (
        _state(spark, state_dir, VALUE_BINS)
        .groupBy(key, "_bin")
        .agg(F.sum("n").alias("_cnt"))
    )
    w = Window.partitionBy(key).orderBy("_bin")
    cum = merged.withColumn("_cum", F.sum("_cnt").over(w)).withColumn(
        "_total", F.sum("_cnt").over(Window.partitionBy(key))
    )
    # single-subtree read-off (mirror of relational.
    # quantiles_from_value_bins): one conditional aggregation per q in
    # ONE groupBy + a stack() unpivot — never a per-q filter+union that
    # re-reads the state store once per quantile
    aggs = []
    for i, q in enumerate(qs):
        q_us = int(round(q * 1_000_000))
        aggs.append(
            F.min(
                F.expr(
                    f"case when _cum * 1000000 >= _total * {q_us}"
                    f" then _bin end"
                )
            ).alias(f"_qb{i}")
        )
    stack_args = ", ".join(
        f"cast({float(q)!r} as double), _qb{i}" for i, q in enumerate(qs)
    )
    return (
        cum.groupBy(key)
        .agg(*aggs)
        .select(
            key,
            F.expr(f"stack({len(qs)}, {stack_args}) as (q, _qbin)"),
        )
        .select(
            key,
            "q",
            F.expr(
                f"round(cast(cast({lo} as bigint) + (2 * _qbin + 1)"
                f" * cast({hi} - {lo} + 1 as bigint)"
                f" div {2 * n_bins} as double) / 1000000.0, 6)"
            ).alias("estimate"),
        )
    )


# --------------------------------------------- count-min-sketch state

CMS_SKETCH = "cms_sketch"
CMS_VOCAB = "cms_vocab"


def token_cms_epoch(
    batch_df: DataFrame,
    epoch_id: int,
    state_dir: str,
    width: int = 1024,
    depth: int = 4,
    min_count: int = 1,
):
    """Reduce one micro-batch of documents to its count-min-sketch
    partial (width×depth counter rows — CMS counters MERGE by addition,
    so per-epoch sketches roll up exactly) plus the epoch's candidate
    token counts.  Same epoch-partitioned dynamic-overwrite idempotency
    contract as the corpus stats.

    ``min_count`` bounds the candidate state: only tokens seen at least
    that often WITHIN an epoch are remembered as heavy-hitter
    candidates (the standard sketch+candidate-set compromise — the
    sketch itself stays exact-mergeable regardless).  min_count=1 keeps
    the full per-epoch vocabulary and makes the state reader bit-equal
    to the batch operator; larger values trade that for bounded state,
    and can only drop candidates, never inflate an estimate.

    The sketch is built FROM the epoch's vocabulary counts (Σcnt per
    bucket ≡ counting raw occurrences), so the micro-batch is scanned
    once; note the SKETCH always comes from the unfiltered counts —
    min_count prunes only the candidate relation.  width/depth are
    stamped onto every sketch row so the reader can detect a mismatched
    re-read instead of silently mis-bucketing."""
    from faconne_spark.operators.text import cms_sketch_from_counts

    toks = tokens_ws("lower(text)", "spark")
    stream = batch_df.select(F.explode(F.expr(toks)).alias("tok"))
    vocab = stream.groupBy("tok").agg(F.count("*").alias("cnt")).persist()
    try:
        sketch = cms_sketch_from_counts(vocab, width, depth).select(
            "r", "bucket", "c",
            F.lit(width).alias("width"), F.lit(depth).alias("depth"),
        )
        cands = vocab
        if min_count > 1:
            cands = vocab.filter(F.col("cnt") >= min_count)
        for name, rel in ((CMS_SKETCH, sketch), (CMS_VOCAB, cands)):
            (
                rel.withColumn("epoch", F.lit(epoch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("epoch")
                .parquet(os.path.join(state_dir, name))
            )
    finally:
        vocab.unpersist()


def cms_topk_from_state(
    spark: SparkSession,
    state_dir: str,
    width: int = 1024,
    depth: int = 4,
    k: int = 20,
) -> DataFrame:
    """Heavy hitters off the merged cross-epoch sketch — the streaming
    face of :func:`faconne_spark.operators.text.token_cms_topk`:
    counters add across epochs, candidate counts add across epochs,
    and the identical estimate/rank expressions read the top-k (bit-
    equal to the batch operator over the union of all micro-batches
    when epochs were written with min_count=1).

    Raises when the state was written with a different width/depth —
    probing a sketch with the wrong modulus silently picks unrelated
    counters and breaks the est ≥ exact upper-bound guarantee."""
    from faconne_spark.operators.text import cms_rank_candidates

    raw = _state(spark, state_dir, CMS_SKETCH)
    dims = [
        (r["width"], r["depth"])
        for r in raw.select("width", "depth").distinct().collect()
    ]
    if dims != [(width, depth)]:
        raise ValueError(
            f"cms_topk_from_state: state at {state_dir!r} was written "
            f"with (width, depth) {dims}, read with ({width}, {depth})"
        )
    sketch = raw.groupBy("r", "bucket").agg(F.sum("c").alias("c"))
    vocab = (
        _state(spark, state_dir, CMS_VOCAB)
        .groupBy("tok")
        .agg(F.sum("cnt").alias("exact"))
    )
    return cms_rank_candidates(vocab, sketch, width, depth, k)


# --------------------------------------------- HyperLogLog state

HLL_STATE = "hll_regs"


def hll_epoch(
    batch_df: DataFrame,
    epoch_id: int,
    state_dir: str,
    key_expr: str = "user_id",
    group_col: str = "event_type",
    salt: str = "hll",
):
    """Reduce one micro-batch to its HLL register partial: per-(group,
    bucket) max-rho rows — registers MERGE BY MAX, so per-epoch partials
    roll up to exactly the registers of the union of all micro-batches
    (the sketch's defining property; same idempotency contract as the
    CMS state: epoch-partitioned dynamic overwrite, write-only epochs).

    The precision p and salt are stamped onto every row so the reader
    can refuse a mismatched re-read instead of silently merging
    registers built from a different bucketing."""
    from faconne_spark.functions import HLL_P
    from faconne_spark.operators.sketches import hll_registers

    regs = hll_registers(batch_df, key_expr, group_col, salt).select(
        F.col(group_col).alias("grp"),
        "bucket",
        "m_j",
        F.lit(HLL_P).alias("p"),
        F.lit(salt).alias("salt"),
    )
    (
        regs.withColumn("epoch", F.lit(epoch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch")
        .parquet(os.path.join(state_dir, HLL_STATE))
    )


def hll_distinct_from_state(
    spark: SparkSession, state_dir: str, salt: str = "hll"
) -> DataFrame:
    """Distinct-count estimates off the max-merged cross-epoch
    registers — the streaming face of
    :func:`faconne_spark.operators.sketches.hll_distinct`: registers
    merge by max across epochs AND into the ``__all__`` rollup, and the
    identical fixed-point estimate expression reads them, so the
    estimate columns are bit-equal to the batch operator over the union
    of all micro-batches.  (No ``n_exact`` calibration here: the whole
    point of the streaming sketch is never materializing the exact
    distinct set.)"""
    from faconne_spark.functions import HLL_P
    from faconne_spark.operators.sketches import MERGED_KEY, _estimates

    raw = _state(spark, state_dir, HLL_STATE)
    metas = [
        (r["p"], r["salt"])
        for r in raw.select("p", "salt").distinct().collect()
    ]
    if metas != [(HLL_P, salt)]:
        raise ValueError(
            f"hll_distinct_from_state: state at {state_dir!r} was written"
            f" with (p, salt) {metas}, read with ({HLL_P}, {salt!r})"
        )
    regs = raw.groupBy(F.col("grp").alias("grp"), F.col("bucket")).agg(
        F.max("m_j").alias("m_j")
    )
    merged = (
        regs.groupBy("bucket")
        .agg(F.max("m_j").alias("m_j"))
        .withColumn("grp", F.lit(MERGED_KEY))
    )
    return _estimates(regs.unionByName(merged), "grp")


# --------------------------------------------- Bloom-bitmap state

BLOOM_STATE = "bloom_words"


def bloom_epoch(
    batch_df: DataFrame,
    epoch_id: int,
    state_dir: str,
    m_bits: int = 1 << 17,
    k: int = 4,
):
    """Reduce one micro-batch of documents to its Bloom bitmap partial:
    (word, bits) rows over the normalized-text fingerprints — bitmaps
    with the same (m_bits, k) MERGE BY bit_or, so per-epoch partials
    roll up to exactly the bitmap of the union of all micro-batches
    (same epoch-partitioned idempotency contract as the CMS/HLL
    states).  m_bits is FIXED by the caller: a streaming bloom cannot
    re-size mid-stream the way the batch prefilter derives p from a
    history count — size for the expected total, or re-bootstrap.

    (m_bits, k) are stamped on every row so the reader refuses a
    mismatched re-read (probing with the wrong modulus silently breaks
    the no-false-negative guarantee)."""
    from faconne_spark.operators.dedup import NORM, bloom_word_bits
    from faconne_spark.functions import phash60

    fps = batch_df.select(F.expr(phash60(NORM, "spark")).alias("fp"))
    words = bloom_word_bits(fps, m_bits, k).select(
        "word", "bits",
        F.lit(m_bits).alias("m_bits"), F.lit(k).alias("k"),
    )
    (
        words.withColumn("epoch", F.lit(epoch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch")
        .parquet(os.path.join(state_dir, BLOOM_STATE))
    )


def bloom_filter_from_state(
    spark: SparkSession, state_dir: str, m_bits: int = 1 << 17, k: int = 4
) -> DataFrame:
    """The merged cross-epoch Bloom bitmap ((word, bits) rows) — the
    streaming face of the batch prefilter's word table: bit_or across
    epochs, bit-equal to building the bitmap over the union of all
    micro-batches.  Raises on an (m_bits, k) mismatch."""
    raw = _state(spark, state_dir, BLOOM_STATE)
    metas = [
        (r["m_bits"], r["k"])
        for r in raw.select("m_bits", "k").distinct().collect()
    ]
    if metas != [(m_bits, k)]:
        raise ValueError(
            f"bloom_filter_from_state: state at {state_dir!r} was written"
            f" with (m_bits, k) {metas}, read with ({m_bits}, {k})"
        )
    return raw.groupBy("word").agg(F.expr("bit_or(bits)").alias("bits"))


# --------------------------------------------- KMV k-min-values state

KMV_STATE = "kmv_mins"


def kmv_epoch(
    batch_df: DataFrame,
    epoch_id: int,
    state_dir: str,
    key_expr: str = "cast(user_id as string)",
    group_col: str = "event_type",
    k: int = 64,
):
    """Reduce one micro-batch to its per-group k-minimum hash values —
    KMV partials MERGE BY UNION-THEN-TRUNCATE (any hash in the global
    top-k is in its epoch's top-k), so per-epoch k-min rows roll up to
    exactly the sketch of the union of all micro-batches.  Same
    idempotency contract as the HLL/Bloom/CMS states: epoch-partitioned
    dynamic overwrite, write-only epochs.  ``k`` is stamped onto every
    row so the reader refuses a mismatched re-read."""
    from faconne_spark.operators.sketches import kmv_sketch

    sk = kmv_sketch(batch_df, group_col, key_expr, k)
    rows = sk.select(
        F.col(group_col).alias("grp"),
        F.explode("hs").alias("h"),
        F.lit(k).alias("k"),
    )
    (
        rows.withColumn("epoch", F.lit(epoch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch")
        .parquet(os.path.join(state_dir, KMV_STATE))
    )


def kmv_sketch_from_state(
    spark: SparkSession, state_dir: str, k: int = 64
) -> DataFrame:
    """The KMV sketch of the union of all micro-batches, read from the
    epoch state — bit-equal to the batch
    :func:`faconne_spark.operators.sketches.kmv_sketch` over the same
    rows (both finalize through ``kmv_from_hashes``)."""
    from faconne_spark.operators.sketches import kmv_from_hashes

    raw = _state(spark, state_dir, KMV_STATE)
    ks = [r["k"] for r in raw.select("k").distinct().collect()]
    if ks != [k]:
        raise ValueError(
            f"kmv_sketch_from_state: state at {state_dir!r} was written"
            f" with k {ks}, read with {k}"
        )
    return kmv_from_hashes(raw.select("grp", "h"), k)


# --------------------------------------------------- AUC state

AUC_BINS = "auc_bins"


def auc_epoch(
    batch_df: DataFrame,
    epoch_id: int,
    state_dir: str,
    label_sql: str,
    bounds: tuple,
    key: str = "event_type",
    score_col: str = "value",
    n_bins: int = 64,
):
    """Reduce one micro-batch to the mergeable AUC state: per-(key,
    score-bin) positive/negative counts.  The histogram formulation is
    what makes Mann–Whitney AUC mergeable at all — bins add across
    epochs/shards, and the exact statistic is read off the merged
    relation (evalstats.auc_from_histogram, the SAME code as batch).

    Scores are binned over CALLER-PINNED ``bounds`` (the
    value_stats_epoch contract: a per-epoch bin space cannot merge;
    out-of-range scores clamp to the edge bins).  The streaming AUC
    therefore equals the batch AUC computed on the binned score — the
    bin grid is the stream's score resolution.  Same epoch-partitioned
    dynamic-overwrite idempotency contract as the other states."""
    from faconne_spark.operators.evalstats import bounded_bin_sql
    from faconne_spark.operators.relational import bounds_us

    lo, hi = bounds_us(bounds, "auc_epoch")
    us = f"cast(floor({score_col} * 1000000 + 0.5) as bigint)"
    bin_expr = bounded_bin_sql(f"({us})", str(lo), str(hi), n_bins)
    hist = (
        batch_df.filter(F.col(score_col).isNotNull())
        .withColumn("_bin", F.expr(bin_expr))
        .withColumn(
            "_y", F.expr(f"case when {label_sql} then 1 else 0 end")
        )
        .groupBy(key, "_bin")
        .agg(
            F.sum("_y").alias("pos"),
            F.sum(F.expr("1 - _y")).alias("neg"),
        )
    )
    (
        hist.withColumn("epoch", F.lit(epoch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch")
        .parquet(os.path.join(state_dir, AUC_BINS))
    )


def auc_from_state(
    spark: SparkSession, state_dir: str, key: str = "event_type"
) -> DataFrame:
    """Exact Mann–Whitney AUC over the merged cross-epoch score-bin
    histogram — bit-equal to the batch evalstats.auc_mann_whitney on
    the union of all micro-batches with the same binned score (the one
    shared auc_from_histogram implementation guarantees it)."""
    from faconne_spark.operators.evalstats import auc_from_histogram

    merged = (
        _state(spark, state_dir, AUC_BINS)
        .groupBy(key, "_bin")
        .agg(F.sum("pos").alias("pos"), F.sum("neg").alias("neg"))
    )
    return auc_from_histogram(merged, [key], "_bin")


def pr_auc_from_state(
    spark: SparkSession, state_dir: str, key: str = "event_type"
) -> DataFrame:
    """Average precision off the SAME merged AUC histogram state —
    one mergeable artifact, two read-offs (ROC-AUC and PR-AUC), the
    round-6 evalstats contract: shards/epochs add their (key, bin,
    pos, neg) counts once and every rank statistic reads the merged
    relation (evalstats.pr_auc_from_histogram, the identical code as
    the batch average_precision on the binned score)."""
    from faconne_spark.operators.evalstats import pr_auc_from_histogram

    merged = (
        _state(spark, state_dir, AUC_BINS)
        .groupBy(key, "_bin")
        .agg(F.sum("pos").alias("pos"), F.sum("neg").alias("neg"))
    )
    return pr_auc_from_histogram(merged, [key], "_bin")


def reliability_from_state(
    spark: SparkSession,
    state_dir: str,
    bounds: tuple,
    n_bins: int = 64,
    key: str = "event_type",
) -> DataFrame:
    """Per-bin calibration counters off the SAME merged AUC histogram
    state — the THIRD read-off of one mergeable artifact (ROC-AUC,
    PR-AUC, and now the reliability diagram all read the identical
    (key, bin, pos, neg) relation; shards/epochs added their counts
    exactly once).  ``bounds``/``n_bins`` must match the epoch
    writer's pinned grid — they reconstruct each bin's integer
    midpoint (the same exact midpoint formula as
    histogram_quantiles).

    Columns per (key, bin): mid_score (micro units), n, n_pos — the
    observed positive rate per predicted-score bucket is n_pos/n, one
    division away, and the curve merges across runs by adding the
    counters."""
    from faconne_spark.operators.relational import bounds_us

    lo, hi = bounds_us(bounds, "reliability_from_state")
    span = hi - lo + 1
    merged = (
        _state(spark, state_dir, AUC_BINS)
        .groupBy(key, "_bin")
        .agg(F.sum("pos").alias("pos"), F.sum("neg").alias("neg"))
    )
    return merged.select(
        key,
        F.col("_bin").alias("bin"),
        F.expr(
            f"{lo} + cast((2 * _bin + 1) * {span}L div {2 * n_bins}"
            " as bigint)"
        ).alias("mid_score"),
        (F.col("pos") + F.col("neg")).alias("n"),
        F.col("pos").alias("n_pos"),
    )


# ---------------------------------------------------- KS state

KS_BINS_STATE = "ks_bins"


def ks_epoch(
    batch_df: DataFrame,
    epoch_id: int,
    state_dir: str,
    lo: float,
    width: float,
    n_bins: int,
    key: str = "event_type",
    value_col: str = "value",
):
    """Reduce one micro-batch to the mergeable KS state: per-(key,
    bin) counts on the SAME grid expression as the batch operator
    (evalstats.ks_bin_sql — shared so the grids can never drift).
    Because the batch statistic is already binned, the streaming KS
    equals the batch KS on the union of micro-batches EXACTLY — not
    just up to a binning convention.  Same epoch-partitioned
    dynamic-overwrite idempotency contract as the other states."""
    from faconne_spark.operators.evalstats import ks_bin_sql

    hist = (
        batch_df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(key).alias("grp"),
            F.expr(ks_bin_sql(value_col, lo, width, n_bins)).alias("bin"),
        )
        .groupBy("grp", "bin")
        .agg(F.count("*").alias("n_gb"))
    )
    (
        hist.withColumn("epoch", F.lit(epoch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch")
        .parquet(os.path.join(state_dir, KS_BINS_STATE))
    )


def ks_from_state(
    spark: SparkSession, state_dir: str, key: str = "event_type"
) -> DataFrame:
    """One-vs-rest KS drift off the merged cross-epoch bin histogram —
    bit-equal to batch evalstats.ks_drift over the union of all
    micro-batches (the one shared ks_from_binned implementation)."""
    from faconne_spark.operators.evalstats import ks_from_binned

    merged = (
        _state(spark, state_dir, KS_BINS_STATE)
        .groupBy("grp", "bin")
        .agg(F.sum("n_gb").alias("n_gb"))
    )
    return ks_from_binned(merged).withColumnRenamed("grp", key)


# ---------------------------------------------- bootstrap state

BOOT_REPS = "boot_reps"
BOOT_BASE = "boot_base"


def bootstrap_epoch(
    batch_df: DataFrame,
    epoch_id: int,
    state_dir: str,
    key: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    n_boot: int = 32,
    micro: int = 1_000_000,
):
    """Reduce one micro-batch to the mergeable Poisson-bootstrap state:
    per-(key, replicate) weight/weighted-value part-sums plus the base
    count/sum.  Because replicate weights are row-local hash draws, the
    parts combine across epochs BY ADDITION — the merged CI equals the
    batch bootstrap on the union of micro-batches bit-for-bit, as long
    as ``id_col`` is unique across the stream (redelivery of an epoch
    id overwrites, not double-counts).  Same epoch-partitioned
    dynamic-overwrite idempotency contract as the other states."""
    from faconne_spark.operators.evalstats import (
        bootstrap_base,
        bootstrap_reps,
    )

    batch_df = batch_df.filter(F.col(value_col).isNotNull()).persist()
    try:
        reps = bootstrap_reps(
            batch_df, [key], value_col, id_col, n_boot, micro
        )
        base = bootstrap_base(batch_df, [key], value_col, micro)
        for name, rel in ((BOOT_REPS, reps), (BOOT_BASE, base)):
            (
                rel.withColumn("epoch", F.lit(epoch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("epoch")
                .parquet(os.path.join(state_dir, name))
            )
    finally:
        batch_df.unpersist()


def bootstrap_from_state(
    spark: SparkSession,
    state_dir: str,
    key: str = "event_type",
    micro: int = 1_000_000,
) -> DataFrame:
    """Per-key mean + bootstrap CI off the merged cross-epoch parts —
    bit-equal to batch evalstats.poisson_bootstrap_mean over the union
    of all micro-batches (the one shared bootstrap_ci_from_parts
    implementation)."""
    from faconne_spark.operators.evalstats import bootstrap_ci_from_parts

    reps = (
        _state(spark, state_dir, BOOT_REPS)
        .groupBy(key, "__b")
        .agg(F.sum("__nw").alias("__nw"), F.sum("__sw").alias("__sw"))
    )
    base = (
        _state(spark, state_dir, BOOT_BASE)
        .groupBy(key)
        .agg(F.sum("n").alias("n"), F.sum("__svm").alias("__svm"))
    )
    return bootstrap_ci_from_parts(reps, base, [key], micro)


# ------------------------------------------------- Page–Hinkley drift

PH_DAYS = "ph_days"


def ph_daily_epoch(
    batch_df: DataFrame, epoch_id: int, state_dir: str,
    key: str = "event_type",
):
    """Reduce one micro-batch to per-(key, day) event counts — the
    mergeable sufficient statistic for the Page–Hinkley drift walk
    (counts add across epochs, so late rows for an already-seen day
    merge exactly at read time).  Same epoch-partitioned
    dynamic-overwrite idempotency contract as the other epoch ops:
    replaying an epoch fully supersedes its half-written attempt."""
    daily = (
        batch_df.select(key, F.expr("to_date(ts)").alias("d"))
        .groupBy(key, "d")
        .agg(F.count("*").alias("c"))
    )
    (
        daily.withColumn("epoch", F.lit(epoch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch")
        .parquet(os.path.join(state_dir, PH_DAYS))
    )


def ph_walk(daily: DataFrame, key: str = "event_type") -> DataFrame:
    """Page–Hinkley mean-shift walk (Page 1954, Hinkley 1971) over a
    per-(key, day) count relation: devₜ = xₜ − μ̂ₜ against the
    RUNNING mean (the sequential/online centering — the daily-CUSUM
    key centers on the GLOBAL mean, which an online monitor never
    has), mₜ = Σdev, PHₜ = mₜ − min(m≤ₜ); reports the deepest
    excursion and the day it peaks — 'had this been monitored live,
    when would the drift alarm have fired loudest'.

    Exactness: devₜ micro-rounds ONE signed double division of exact
    integers (t·xₜ − Sₜ stays < 2⁵³); the walk/min/excursion are
    exact BIGINTs; one final double.  Scale: windows partition by
    key over the bounded day relation."""
    from pyspark.sql import Window as W

    w = W.partitionBy(key).orderBy("d")
    cum = W.partitionBy(key).orderBy("d").rowsBetween(
        W.unboundedPreceding, 0
    )
    full = W.partitionBy(key).orderBy("d").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    dev = daily.select(
        key, "d", "c",
        F.row_number().over(w).alias("t"),
        F.sum("c").over(cum).alias("s"),
    ).select(
        key, "d",
        F.expr(
            "cast(round(cast((t * c - s) as double) * 1000000 / t, 0)"
            " as bigint)"
        ).alias("dev"),
    )
    walk = dev.select(
        key, "d", F.sum("dev").over(cum).alias("m")
    ).select(
        key, "d", "m", F.min("m").over(cum).alias("mn")
    ).select(
        key, "d", F.expr("m - mn").alias("ph")
    ).select(
        key, "d", "ph", F.max("ph").over(full).alias("mph")
    )
    return walk.groupBy(key).agg(
        F.count("*").cast("long").alias("n_days"),
        F.expr("min(case when ph = mph then d end)").alias("peak_day"),
        F.expr("round(cast(max(ph) as double) / 1e6, 6) + 0.0")
        .alias("max_ph"),
    )


def ph_drift_from_state(
    spark: SparkSession, state_dir: str, key: str = "event_type"
) -> DataFrame:
    """Page–Hinkley drift read off the merged cross-epoch day counts —
    bit-equal to :func:`ph_walk` over the union of all micro-batches
    (counts for a day seen in several epochs sum exactly before the
    walk runs)."""
    daily = (
        _state(spark, state_dir, PH_DAYS)
        .groupBy(key, "d")
        .agg(F.sum("c").alias("c"))
    )
    return ph_walk(daily, key)
