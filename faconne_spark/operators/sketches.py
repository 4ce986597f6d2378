"""Mergeable cardinality sketches for 100 TB-scale distinct counting.

HyperLogLog (Flajolet-Fuks-Gandouet-Meunier 2007) re-expressed as pure
Catalyst integer expressions over the portable 60-bit hash
(``faconne_spark.functions.phash60``), so the DuckDB oracle computes
bit-identical registers.  Spark's own ``approx_count_distinct`` IS an
HLL++ — this module exists for what it can't give you: the register
table itself, which is the mergeable artifact (union registers by
``max`` across shards / days / streams, estimate once at the end), plus
an exact-vs-sketch calibration joined alongside.

Scale notes (100 TB): the register extraction is map-only; the only
shuffle key is (group, bucket) with partial ``max`` map-side, so the
exchange carries ≤ groups × 256 rows regardless of input size.  The
merged "__all__" estimate is computed FROM the per-group registers —
the demonstration that rolling up shards never rescans the input.

Reference parity: the reference engine has no sketch surface (it is a
shape-transformation library — parse_range.cljc); this family is part
of the training-data-pipeline extension mandated alongside SURVEY §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from faconne_spark.functions import (
    HLL_FIX,
    HLL_M,
    HLL_P,
    hll_estimate,
    hll_rho,
    phash60,
)
from faconne_spark.operators.dedup import track_persist

MERGED_KEY = "__all__"


def hll_registers(
    df: DataFrame, key_expr: str, group_col: str, salt: str = "hll"
) -> DataFrame:
    """Per-(group, bucket) HLL registers: ``max`` of rho over the rows
    hashing into each of the 256 buckets.  Output is tiny (≤ 256 rows
    per group) and mergeable: ``max`` per bucket across any register
    tables built with the same salt is the register table of the union
    of their inputs."""
    h = phash60(f"concat('{salt}:', cast({key_expr} as string))", "spark")
    rows = df.select(
        F.col(group_col).cast("string").alias(group_col),
        F.expr(h).alias("h"),
    ).select(
        group_col,
        (F.col("h") % HLL_M).alias("bucket"),
        F.expr(hll_rho(f"(h >> {HLL_P})")).alias("rho"),
    )
    return rows.groupBy(group_col, "bucket").agg(F.max("rho").alias("m_j"))


def _estimates(regs: DataFrame, group_col: str) -> DataFrame:
    """Fold register tables into per-group fixed-point harmonic sums and
    the HLL estimate.  The sum is exact BIGINT arithmetic (Σ 2^(53-M_j)
    + V·2^53 ≤ 256·2^53), so it is shuffle-order-independent — the one
    double rounding happens in the final estimate expression."""
    agg = regs.groupBy(group_col).agg(
        F.count("*").alias("n_occupied"),
        F.sum(F.expr("shiftleft(cast(1 as bigint), 53 - m_j)")).alias(
            "sum_occupied"
        ),
    )
    return agg.select(
        group_col,
        (F.lit(HLL_M) - F.col("n_occupied")).alias("empty_regs"),
        (
            (F.lit(HLL_M) - F.col("n_occupied")).cast("long") * F.lit(HLL_FIX)
            + F.col("sum_occupied")
        ).alias("harmonic_fixed"),
    ).select(
        group_col,
        "empty_regs",
        "harmonic_fixed",
        F.expr(hll_estimate("harmonic_fixed", "empty_regs")).alias("hll_est"),
    )


def hll_distinct(
    df: DataFrame, key_expr: str, group_col: str, salt: str = "hll"
) -> DataFrame:
    """Per-group approximate-distinct with exact calibration, plus a
    merged ``__all__`` row whose registers come from folding the
    per-group registers (max per bucket) — NOT from rescanning ``df``.

    Columns: group, n_exact, hll_est, abs_err_pct, empty_regs,
    harmonic_fixed.  The register table is persisted (tracked by
    ``dedup.release_caches``) because both the per-group and the merged
    estimate read it; it is ≤ groups × 256 rows."""
    regs = track_persist(hll_registers(df, key_expr, group_col, salt))
    merged = (
        regs.groupBy("bucket")
        .agg(F.max("m_j").alias("m_j"))
        .withColumn(group_col, F.lit(MERGED_KEY))
    )
    est = _estimates(regs.unionByName(merged), group_col)

    per_group = df.groupBy(F.col(group_col).cast("string").alias(group_col)).agg(
        F.countDistinct(F.expr(key_expr)).alias("n_exact")
    )
    overall = df.select(
        F.lit(MERGED_KEY).alias(group_col),
        F.expr(key_expr).alias("_k"),
    ).groupBy(group_col).agg(F.countDistinct("_k").alias("n_exact"))
    exact = per_group.unionByName(overall)

    return est.join(exact, group_col).select(
        group_col,
        "n_exact",
        "hll_est",
        F.round(
            F.abs(F.col("hll_est") - F.col("n_exact"))
            / F.col("n_exact")
            * 100,
            2,
        ).alias("abs_err_pct"),
        "empty_regs",
        "harmonic_fixed",
    )


def hll_overlap(
    df: DataFrame, key_expr: str, group_col: str, salt: str = "hll"
) -> DataFrame:
    """Sketch set-algebra: estimated distinct-key OVERLAP between every
    pair of groups by inclusion-exclusion over HLL registers —
    est(A∩B) = est(A) + est(B) − est(A∪B), where the union estimate
    comes from folding the two groups' registers (max per bucket), the
    audience-overlap question answered without ever materializing the
    distinct sets.  An exact overlap count rides along as calibration.

    Scale (100 TB): the input is scanned twice (once for registers,
    once for the exact calibration — drop the exact side in production
    and the single scan remains); everything downstream operates on
    register tables of ≤ groups × 256 rows.  The pair enumeration is
    groups², intended for small group vocabularies (event types,
    sources, days); for large vocabularies, restrict to chosen pairs
    first.  Exact calibration shuffles the distinct (group, key)
    relation once.
    """
    regs = track_persist(hll_registers(df, key_expr, group_col, salt))

    types = regs.select(F.col(group_col).alias("ta")).distinct()
    pairs = types.crossJoin(
        types.select(F.col("ta").alias("tb"))
    ).filter(F.col("ta") < F.col("tb"))

    # per-pair union registers: fold both groups' registers, max/bucket
    pair_regs = (
        F.broadcast(pairs)
        .join(
            regs,
            (F.col(group_col) == F.col("ta"))
            | (F.col(group_col) == F.col("tb")),
        )
        .groupBy("ta", "tb", "bucket")
        .agg(F.max("m_j").alias("m_j"))
        .withColumn("pair_key", F.concat_ws("|", "ta", "tb"))
    )
    est_union = _estimates(pair_regs, "pair_key").select(
        F.col("pair_key"), F.col("hll_est").alias("est_union")
    )
    est_each = _estimates(regs, group_col).select(
        F.col(group_col).alias("t"), F.col("hll_est").alias("est")
    )

    # exact overlap: distinct (group, key) self-joined on the key
    gk = df.select(
        F.col(group_col).cast("string").alias("t"),
        F.expr(key_expr).alias("k"),
    ).distinct()
    exact = (
        gk.alias("x")
        .join(gk.alias("y"), "k")
        .filter(F.col("x.t") < F.col("y.t"))
        .groupBy(
            F.col("x.t").alias("ta"), F.col("y.t").alias("tb")
        )
        .agg(F.countDistinct("k").alias("n_exact_overlap"))
    )

    out = (
        pairs.join(
            est_each.withColumnRenamed("t", "ta").withColumnRenamed(
                "est", "est_a"
            ),
            "ta",
        )
        .join(
            est_each.withColumnRenamed("t", "tb").withColumnRenamed(
                "est", "est_b"
            ),
            "tb",
        )
        .withColumn("pair_key", F.concat_ws("|", "ta", "tb"))
        .join(est_union, "pair_key")
        .join(exact, ["ta", "tb"], "left")
    )
    return out.select(
        "ta",
        "tb",
        F.coalesce("n_exact_overlap", F.lit(0)).alias("n_exact_overlap"),
        "est_a",
        "est_b",
        "est_union",
        F.round(
            F.greatest(
                F.lit(0.0),
                F.col("est_a") + F.col("est_b") - F.col("est_union"),
            ),
            2,
        ).alias("overlap_est"),
    )


def hll_daily_rollup(
    df: DataFrame,
    key_expr: str,
    ts_col: str = "ts",
    window_days: int = 7,
    salt: str = "hll",
    calibrate: bool = False,
) -> DataFrame:
    """DAU / trailing-WAU from one register pass: per-day HLL registers
    are built ONCE, and every trailing window's estimate comes from
    max-folding the member days' registers — the canonical sketch
    rollup (a 30-day dashboard re-reads 30 × 256 register rows, never
    the event log).  The exact per-day DAU calibration always rides
    along (one distinct aggregate, no join); ``calibrate=True``
    additionally emits the exact trailing count, which pays the
    events × window_days self-join the sketch exists to avoid —
    default OFF, the production shape at scale (round-6 flag;
    VERDICT r5 ask #6).

    Columns: day, dau_exact, dau_est, wau_est (+ wau_exact when
    ``calibrate=True``)."""
    h = phash60(f"concat('{salt}:', cast({key_expr} as string))", "spark")
    rows = df.select(
        F.to_date(F.col(ts_col)).alias("day"), F.expr(h).alias("h")
    ).select(
        "day",
        (F.col("h") % HLL_M).alias("bucket"),
        F.expr(hll_rho(f"(h >> {HLL_P})")).alias("rho"),
    )
    regs = track_persist(
        rows.groupBy("day", "bucket").agg(F.max("rho").alias("m_j"))
    )
    days = regs.select("day").distinct().withColumnRenamed("day", "wday")

    dau_est = _estimates(regs, "day").select(
        "day", F.col("hll_est").alias("dau_est")
    )
    wau_regs = (
        regs.join(
            F.broadcast(days),
            F.expr(f"datediff(wday, day) BETWEEN 0 AND {window_days - 1}"),
        )
        .groupBy(F.col("wday").alias("day"), F.col("bucket"))
        .agg(F.max("m_j").alias("m_j"))
    )
    wau_est = _estimates(wau_regs, "day").select(
        "day", F.col("hll_est").alias("wau_est")
    )

    daily = df.select(
        F.to_date(F.col(ts_col)).alias("day"), F.expr(key_expr).alias("k")
    )
    dau_exact = daily.groupBy("day").agg(
        F.countDistinct("k").alias("dau_exact")
    )
    out = dau_exact.join(dau_est, "day").join(wau_est, "day")
    cols = ["dau_exact", "dau_est", "wau_est"]
    if calibrate:
        wau_exact = (
            daily.join(
                F.broadcast(days),
                F.expr(
                    f"datediff(wday, day) BETWEEN 0 AND {window_days - 1}"
                ),
            )
            .groupBy(F.col("wday").alias("day"))
            .agg(F.countDistinct("k").alias("wau_exact"))
        )
        out = out.join(wau_exact, "day")
        cols = ["dau_exact", "dau_est", "wau_exact", "wau_est"]
    return out.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"), *cols
    )


# ------------------------------------------------------ KMV (k-min values)

KMV_DOMAIN = 1 << 60  # phash60 range


def kmv_sketch(
    df: DataFrame, group_col: str, id_expr: str, k: int = 64
) -> DataFrame:
    """K-minimum-values distinct sketch (Beyer et al. 2007) per group:
    the k smallest portable 60-bit hashes of ``id_expr``, the kth
    value θ, and the unbiased estimate (k−1)·D/θ.  Where HLL gives
    cardinalities, KMV's value list additionally supports set
    INTERSECTION estimates (:func:`kmv_overlap`) — θ-thresholded
    sample agreement, which inclusion–exclusion on HLL does badly for
    small overlaps.

    Deterministic end-to-end: the hash is the md5-based ``phash60``
    (bit-identical in DuckDB and plain Python), so the sketch replays
    exactly.

    Scale (100 TB): distinct-hash reduction first (map-side combined),
    then the k-smallest selection is a per-group window over the
    distinct-hash relation — partitioned by the group key, never a
    global sort.  Output is ≤ groups×k rows."""
    if k < 2:
        raise ValueError(f"kmv_sketch needs k >= 2, got {k}")
    hashed = df.select(
        F.col(group_col).alias("grp"),
        F.expr(phash60(id_expr, "spark")).alias("h"),
    )
    return kmv_from_hashes(hashed, k).withColumnRenamed("grp", group_col)


def kmv_from_hashes(hashed: DataFrame, k: int) -> DataFrame:
    """Finalize a KMV sketch from a (grp, h) hash relation — shared by
    the batch operator and the streaming epoch-state reader, so both
    produce bit-identical sketches over the same hash union (the
    k-smallest of a union of per-epoch k-smallest IS the k-smallest of
    the union: any globally kept value is kept in its own epoch)."""
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy("h")
    kept = (
        hashed.distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )
    return kept.groupBy("grp").agg(
        F.count("*").alias("n_kept"),
        F.max("h").alias("theta"),
        F.sort_array(F.collect_list("h")).alias("hs"),
    ).select(
        "grp",
        "n_kept",
        "theta",
        "hs",
        # n_kept < k means the group had fewer than k distinct ids —
        # the sketch IS the exact value set, so the estimate is exact
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise(
            (k - 1) * F.lit(float(KMV_DOMAIN)) / F.col("theta")
        )
        .alias("est_distinct"),
    )


def kmv_overlap(sketch: DataFrame, group_col: str, k: int = 64) -> DataFrame:
    """Pairwise intersection/Jaccard estimates from KMV sketches
    (Beyer et al. 2007 §4): for each group pair, pool both hash lists,
    keep the k smallest of the union (θ = kth), and count pooled
    values below θ present in BOTH sketches (ρ).  Then
    |A∪B| ≈ (k−1)·D/θ and |A∩B| ≈ (ρ/k)·|A∪B|.

    Scale: operates ONLY on sketch rows (groups×k), never the raw
    data; the pair join is sketch-sized."""
    ex = sketch.select(
        F.col(group_col).alias("g"), F.explode("hs").alias("h")
    )
    # pair frame: for every (ga < gb) pair, the union of both hash
    # lists with membership flags
    pairs = (
        ex.alias("x")
        .select(F.col("g").alias("ga"))
        .distinct()
        .join(
            ex.select(F.col("g").alias("gb")).distinct(),
            F.col("ga") < F.col("gb"),
        )
    )
    u = (
        pairs.join(ex.select(F.col("g").alias("ga"), "h"), "ga")
        .withColumn("in_a", F.lit(1))
        .unionByName(
            pairs.join(
                ex.select(F.col("g").alias("gb"), "h"), "gb"
            ).withColumn("in_a", F.lit(0)),
            allowMissingColumns=False,
        )
    )
    from pyspark.sql import Window

    agg = u.groupBy("ga", "gb", "h").agg(
        F.max("in_a").alias("a_has"),
        F.min("in_a").alias("not_b"),
    )
    # a_has=1 & not_b=0 → in both; rank pooled distinct hashes per pair
    w = Window.partitionBy("ga", "gb").orderBy("h")
    ranked = agg.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    return ranked.groupBy("ga", "gb").agg(
        F.count("*").alias("n_pool"),
        F.max("h").alias("theta"),
        F.sum(
            F.when((F.col("a_has") == 1) & (F.col("not_b") == 0), 1)
            .otherwise(0)
        ).alias("rho"),
    ).select(
        F.col("ga").alias("type_a"),
        F.col("gb").alias("type_b"),
        "n_pool",
        "theta",
        "rho",
        F.when(
            F.col("n_pool") < k, F.col("n_pool").cast("double")
        )
        .otherwise((k - 1) * F.lit(float(KMV_DOMAIN)) / F.col("theta"))
        .alias("est_union"),
        (
            F.col("rho")
            / F.col("n_pool")
            * F.when(
                F.col("n_pool") < k, F.col("n_pool").cast("double")
            ).otherwise(
                (k - 1) * F.lit(float(KMV_DOMAIN)) / F.col("theta")
            )
        ).alias("est_intersection"),
    )
