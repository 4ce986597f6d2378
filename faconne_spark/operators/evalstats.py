"""Evaluation & inference statistics: AUC, Poisson-bootstrap CIs,
two-sample KS drift, Cohen's kappa.

These are the measurement half of a training-data pipeline — scoring a
quality classifier (AUC), putting error bars on corpus means without a
second pass (Poisson bootstrap — the standard resampling scheme at
data-parallel scale, since replicate weights are computed row-locally),
detecting distribution drift between slices (KS), and quantifying
rater/classifier agreement (kappa).

House rules apply throughout: everything stays in Catalyst (no UDFs),
arithmetic is exact-integer until one final division so Spark and the
DuckDB oracles agree bit-for-bit, and every window partitions on a
bounded key (never a global sort over the raw stream).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Cumulative Poisson(1) probabilities P(K <= k) for the inverse-CDF
# ladder; identical literals are embedded in the DuckDB oracle so both
# engines compare the SAME doubles.  P(K > 8) ~ 1.1e-9 — the ladder
# clamps there (a weight of 8 on ~1e-9 of rows is statistically inert).
POISSON1_CUM = [
    sum(math.exp(-1.0) / math.factorial(j) for j in range(k + 1))
    for k in range(8)
]


def auc_mann_whitney(
    df: DataFrame,
    label: Column,
    score_col: str,
    group_cols: list,
) -> DataFrame:
    """Tie-averaged Mann–Whitney AUC of ``score_col`` as a predictor of
    the boolean ``label``, per group: AUC = P(s⁺ > s⁻) + ½·P(s⁺ = s⁻).

    Formulated over the DISTINCT-SCORE histogram, not ranked rows:
    2·AUC·n⁺·n⁻ = Σ_s pos(s)·(2·cum_neg(<s) + neg(s)) — an exact BIGINT,
    so the only float op is the final division (bit-identical across
    engines).

    Scale (100 TB): one map-side-combined groupBy to (group, score),
    then a window over the distinct-score relation only — the raw
    stream is never rank-sorted.  For a score column with unbounded
    cardinality, quantize first (the histogram IS the ECDF).  The
    histogram is also what makes AUC MERGEABLE: shards/epochs add
    their (group, score, pos, neg) counts, then
    :func:`auc_from_histogram` reads the exact statistic off the
    merged relation (the streaming face lives in streaming/stats)."""
    hist = (
        df.select(
            *group_cols,
            F.col(score_col).alias("__s"),
            F.when(label, 1).otherwise(0).alias("__y"),
        )
        .groupBy(*group_cols, "__s")
        .agg(
            F.sum("__y").alias("pos"),
            F.sum(F.lit(1) - F.col("__y")).alias("neg"),
        )
    )
    return auc_from_histogram(hist, group_cols, "__s")


def auc_from_histogram(
    hist: DataFrame,
    group_cols: list,
    score_col: str,
    pos_col: str = "pos",
    neg_col: str = "neg",
) -> DataFrame:
    """The AUC window+aggregate over an already-built per-(group,
    score) pos/neg histogram — shared by the batch operator and the
    merged streaming state so both faces are ONE implementation.
    NULL scores are excluded here (not ranked as lowest/highest): an
    absent score has no rank, and Spark windows order NULLs first
    where DuckDB orders them last — the exact cross-engine divergence
    this module exists to rule out."""
    if (pos_col, neg_col) != ("pos", "neg"):
        hist = hist.withColumnRenamed(pos_col, "pos").withColumnRenamed(
            neg_col, "neg"
        )
    if score_col != "__s":
        hist = hist.withColumnRenamed(score_col, "__s")
    hist = hist.filter(F.col("__s").isNotNull())
    w = Window.partitionBy(*group_cols).orderBy("__s")
    cum_neg_lt = F.coalesce(
        F.sum("neg").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    num2 = F.col("pos") * (2 * cum_neg_lt + F.col("neg"))
    return (
        hist.withColumn("__num2", num2)
        .groupBy(*group_cols)
        .agg(
            F.sum("pos").alias("n_pos"),
            F.sum("neg").alias("n_neg"),
            F.sum("__num2").alias("__n2"),
        )
        .withColumn(
            "auc",
            F.when(
                (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
                F.round(
                    F.col("__n2")
                    / (2.0 * F.col("n_pos") * F.col("n_neg")),
                    6,
                ),
            ),
        )
        .drop("__n2")
    )


def poisson_weight_sql(u_expr: str) -> str:
    """Inverse-CDF ladder mapping a uniform ``u_expr`` in [0, 1) to a
    Poisson(1) draw — plain CASE SQL valid verbatim in both engines."""
    arms = " ".join(
        f"WHEN {u_expr} < {c!r} THEN {k}"
        for k, c in enumerate(POISSON1_CUM)
    )
    return f"(CASE {arms} ELSE 8 END)"


def poisson_bootstrap_mean(
    df: DataFrame,
    group_cols: list,
    value_col: str,
    id_col: str,
    n_boot: int = 32,
    micro: int = 1_000_000,
) -> DataFrame:
    """Per-group mean of ``value_col`` with a percentile CI from
    ``n_boot`` Poisson(1) bootstrap replicates.

    Replicate weights come from the inverse Poisson CDF applied to
    u = phash60(id ‖ b) / 2⁶⁰ — row-local and deterministic, so the
    resample is reproducible and identical in the DuckDB oracle (the
    reason Poisson bootstrap is THE bootstrap at data-parallel scale:
    no global resample pass, just a per-row weight).  Values are
    fixed-pointed to ``micro`` units so replicate sums are exact
    integers; each replicate mean is one division of identical ints.
    The CI is the (2nd, B−1th) order statistic of the replicate means
    (≈ 93.75% coverage at B = 32), picked by row_number with the
    replicate index as tie-break — no interpolation to diverge on.

    Scale (100 TB): the B-fold explode is map-side only; the shuffle
    carries (group × B) partial sums.  Replicates that draw zero total
    weight (probability e^{-n}) are dropped before ranking.

    The per-replicate sums are plain BIGINT sums of row-local terms,
    which makes the whole bootstrap MERGEABLE: shards/epochs add their
    (group, b, nw, sw) parts and :func:`bootstrap_ci_from_parts` reads
    the identical CI off the merged relation (streaming face in
    streaming/stats) — provided ids are unique across the union."""
    from faconne_spark.session import spread

    # Optimization r13 (guide §2.5 input parallelism): the B-fold
    # explode multiplies the input ×n_boot and every exploded row pays
    # an md5 — but a small parquet table arrives as ONE split, so the
    # entire map-side bootstrap ran on one core (measured: both reps
    # ~6 s at sf0.1 with 31 cores idle).  spread() is a no-op at
    # cluster scale (the scan already has ≥ defaultParallelism splits);
    # locally it spreads the explode across cores.  Results identical:
    # replicate part-sums are exact BIGINTs of row-local terms, so
    # partitioning cannot change them.  Applied HERE (the batch face),
    # not in bootstrap_reps — the streaming face writes per-epoch state
    # files and must keep its input partitioning.
    df = spread(df)
    return bootstrap_ci_from_parts(
        bootstrap_reps(df, group_cols, value_col, id_col, n_boot, micro),
        bootstrap_base(df, group_cols, value_col, micro),
        group_cols,
        micro,
    )


def bootstrap_reps(
    df: DataFrame,
    group_cols: list,
    value_col: str,
    id_col: str,
    n_boot: int,
    micro: int = 1_000_000,
) -> DataFrame:
    """The mergeable replicate part-sums (group, __b, __nw, __sw) —
    exact BIGINT sums of row-local hash-weighted terms, so shards and
    epochs combine by addition.  NULL values are excluded (a NULL
    would silently poison __sw while still counting in __nw — and the
    streaming face filters them, so the batch face must too for the
    bit-for-bit merge contract)."""
    from faconne_spark.functions import phash60

    h = phash60(
        f"concat(cast({id_col} as string), ':', cast(__b as string))",
        "spark",
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *group_cols,
            F.col(id_col),
            F.expr(
                f"cast(round({value_col} * {micro}) as bigint)"
            ).alias("__vm"),
        )
        .withColumn("__b", F.explode(F.expr(f"sequence(0, {n_boot - 1})")))
        .withColumn("__u", F.expr(f"({h}) / {float(1 << 60)!r}"))
        .withColumn("__w", F.expr(poisson_weight_sql("__u")))
        .groupBy(*group_cols, "__b")
        .agg(
            F.sum("__w").alias("__nw"),
            F.sum(F.col("__w") * F.col("__vm")).alias("__sw"),
        )
    )


def bootstrap_base(
    df: DataFrame,
    group_cols: list,
    value_col: str,
    micro: int = 1_000_000,
) -> DataFrame:
    """The mergeable base part-sums (group, n, __svm) for the point
    estimate.  Excludes NULL values (the bootstrap_reps contract)."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.expr(f"cast(round({value_col} * {micro}) as bigint)")
            ).alias("__svm"),
        )
    )


def bootstrap_ci_from_parts(
    reps: DataFrame,
    base: DataFrame,
    group_cols: list,
    micro: int = 1_000_000,
) -> DataFrame:
    """The order-statistic CI + point estimate over already-built
    (possibly merged) replicate and base part-sums — ONE implementation
    for batch and the streaming state."""
    rep = reps.filter(F.col("__nw") > 0).withColumn(
        "__mb", F.col("__sw") / (F.col("__nw") * float(micro))
    )
    wr = Window.partitionBy(*group_cols).orderBy("__mb", "__b")
    ranked = rep.withColumn("__rk", F.row_number().over(wr)).withColumn(
        "__nb", F.count("*").over(Window.partitionBy(*group_cols))
    )
    ci = ranked.groupBy(*group_cols).agg(
        F.max("__nb").alias("n_boot"),
        F.round(
            F.min(F.when(F.col("__rk") == 2, F.col("__mb"))), 6
        ).alias("ci_lo"),
        F.round(
            F.min(
                F.when(F.col("__rk") == F.col("__nb") - 1, F.col("__mb"))
            ),
            6,
        ).alias("ci_hi"),
    )
    point = base.select(
        *group_cols,
        "n",
        F.round(
            F.col("__svm") / (F.col("n") * float(micro)), 6
        ).alias("mean_value"),
    )
    return point.join(ci, group_cols)


def ks_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float,
    width: float,
    n_bins: int,
) -> DataFrame:
    """One-vs-rest two-sample Kolmogorov–Smirnov drift per group:
    D = max_b |ECDF_in(b) − ECDF_rest(b)| over a FIXED bin grid.

    Binning first is what makes this a 100 TB operator: the exact KS
    statistic needs a per-pair global sort of the raw values, while the
    binned ECDF is one map-side-combined groupBy to (group, bin) and a
    window over the (groups × bins) grid — and for any monitoring use
    the grid resolution IS the detection resolution.  D is kept as the
    cross-multiplied integer max |cum_in·n_out − cum_out·n_in| until
    the single final division.

    The grid is densified (groups × observed bins) so a bin that one
    side skips still advances the other side's ECDF.  The (group, bin)
    histogram is also the MERGEABLE state: shards/epochs add their
    counts, then :func:`ks_from_binned` reads the identical statistic
    off the merged relation (streaming face in streaming/stats).
    NULL values are excluded — an absent value has no ECDF position,
    and Spark and DuckDB would order a NULL bin oppositely."""
    binned = ks_binned(df, group_col, value_col, lo, width, n_bins)
    return ks_from_binned(binned).withColumnRenamed("grp", group_col)


def ks_binned(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float,
    width: float,
    n_bins: int,
) -> DataFrame:
    """The NULL-filtered (grp, bin, n_gb) histogram on the KS grid —
    the one binning block shared by :func:`ks_drift` and
    :func:`quantile_normalize` so their grids and NULL contracts can
    never drift."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(group_col).alias("grp"),
            F.expr(ks_bin_sql(value_col, lo, width, n_bins)).alias("bin"),
        )
        .groupBy("grp", "bin")
        .agg(F.count("*").alias("n_gb"))
    )


def bounded_bin_sql(
    us_expr: str, lo_sql: str, hi_sql: str, n_bins: int
) -> str:
    """The pinned-bounds micro-unit bin expression.  The VALUE is
    clamped into [lo, hi] BEFORE the bin multiply — clamping only the
    product would still overflow BIGINT in (us − lo) · n_bins for a
    far-out-of-range glitch value, the exact case the edge-bin clamp
    exists for — and the int cast comes last.  ``us_expr`` is an
    integer micro-unit value expression; ``lo_sql``/``hi_sql`` are SQL
    texts (literals or column refs).  Shared by the streaming AUC
    state, the weighted quantile sketch, and (since round 6) the
    histogram_quantiles / value_stats_epoch twins — every pinned-bounds
    binner in the repo reads THIS text, so the grids cannot drift and
    the overflow fix exists exactly once."""
    clamped = f"least(greatest({us_expr}, {lo_sql}), {hi_sql})"
    return (
        f"cast(({clamped} - {lo_sql}) * {n_bins}"
        f" div ({hi_sql} - {lo_sql} + 1) as int)"
    )


def ks_bin_sql(value_col: str, lo: float, width: float, n_bins: int) -> str:
    """The KS bin expression — shared by the batch operator and the
    streaming epoch state so the grids can never drift.  Clamps on the
    DOUBLE and casts to int LAST: casting the unclamped floor overflows
    INT32 under ANSI for far-out-of-range values — exactly the case the
    edge-bin clamp exists for.  Callers must filter NULL values first
    (engines order a NULL bin oppositely in windows)."""
    return (
        f"cast(least(greatest(floor(({value_col} - {lo!r}) /"
        f" {width!r}), 0), {n_bins - 1}) as int)"
    )


def ks_from_binned(binned: DataFrame) -> DataFrame:
    """The densify + cumulative + max-gap stages over an already-built
    (grp, bin, n_gb) histogram — ONE implementation for batch and the
    merged streaming state."""
    # the bin side is bounded by the fixed grid (≤ n_bins rows) — force
    # the broadcast so the planner never falls back to CartesianProduct
    # when upstream stats are unknown (post-shuffle-join inputs)
    grid = (
        binned.select("grp")
        .distinct()
        .crossJoin(F.broadcast(binned.select("bin").distinct()))
    )
    tot_b = binned.groupBy("bin").agg(F.sum("n_gb").alias("n_b"))
    cells = (
        grid.join(binned, ["grp", "bin"], "left")
        .join(tot_b, "bin")
        .select(
            "grp",
            "bin",
            F.coalesce("n_gb", F.lit(0)).alias("n_in_b"),
            (F.col("n_b") - F.coalesce("n_gb", F.lit(0))).alias("n_out_b"),
        )
    )
    w = Window.partitionBy("grp").orderBy("bin")
    cum = cells.select(
        "grp",
        F.sum("n_in_b").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("c_in"),
        F.sum("n_out_b").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("c_out"),
        F.sum("n_in_b").over(Window.partitionBy("grp")).alias("n_in"),
        F.sum("n_out_b").over(Window.partitionBy("grp")).alias("n_out"),
    )
    return (
        cum.groupBy("grp")
        .agg(
            F.max("n_in").alias("n_in"),
            F.max("n_out").alias("n_out"),
            F.max(
                F.abs(
                    F.col("c_in") * F.col("n_out")
                    - F.col("c_out") * F.col("n_in")
                )
            ).alias("__dnum"),
        )
        .withColumn(
            "ks_d",
            F.when(
                (F.col("n_in") > 0) & (F.col("n_out") > 0),
                F.round(
                    F.col("__dnum") / (F.col("n_in") * F.col("n_out") * 1.0),
                    6,
                ),
            ),
        )
        .drop("__dnum")
    )


def cohens_kappa(
    df: DataFrame,
    rater_a: Column,
    rater_b: Column,
    group_cols: list,
) -> DataFrame:
    """Cohen's kappa between two boolean raters per group — chance-
    corrected agreement κ = (p_o − p_e) / (1 − p_e), computed as the
    all-integer identity (n·(n₁₁+n₀₀) − (a₁b₁ + a₀b₀)) /
    (n² − (a₁b₁ + a₀b₀)) so the one float op is the final division.
    κ can be a tiny negative, so the rounded value is canonicalized
    with + 0.0 (the Spark −0.0 vs DuckDB 0.0 hash divergence).

    Scale (100 TB): a single map-side-combined groupBy; the exchange
    carries five counters per group."""
    a = F.when(rater_a, 1).otherwise(0)
    b = F.when(rater_b, 1).otherwise(0)
    agg = df.groupBy(*group_cols).agg(
        F.count("*").alias("n"),
        F.sum(a).alias("a1"),
        F.sum(b).alias("b1"),
        F.sum(a * b).alias("n11"),
        F.sum((1 - a) * (1 - b)).alias("n00"),
    )
    pe_num = F.col("a1") * F.col("b1") + (F.col("n") - F.col("a1")) * (
        F.col("n") - F.col("b1")
    )
    denom = F.col("n") * F.col("n") - pe_num
    return agg.select(
        *group_cols,
        "n",
        (F.col("n11") + F.col("n00")).alias("n_agree"),
        "a1",
        "b1",
        F.when(
            denom > 0,
            F.round(
                (
                    F.col("n") * (F.col("n11") + F.col("n00")) - pe_num
                )
                / (denom * 1.0),
                6,
            )
            + 0.0,
        ).alias("kappa"),
    )


# P(first digit = d) = log10(1 + 1/d), fixed-pointed to micro units;
# the nine literals sum to exactly 1_000_000, so expected counts are
# an exact integer partition of n·10⁶.
BENFORD_MICRO = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def benford_case_sql(digit_expr: str) -> str:
    """CASE ladder for the Benford micro-probabilities — plain SQL
    valid verbatim in both engines."""
    arms = " ".join(
        f"WHEN {digit_expr} = {d} THEN {p}"
        for d, p in BENFORD_MICRO.items()
    )
    return f"(CASE {arms} END)"


def benford_deviation(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """First-significant-digit deviation from Benford's law per group —
    the classic fabricated/degenerate-numbers screen for a numeric
    column.  Values are fixed-pointed to integer cents, the leading
    digit read off the FIRST CHARACTER of the decimal string (pure
    string ops, identical in both engines — a pow(10, len−1) float
    division would misidentify the digit beyond 2⁵³ cents), and the
    mean absolute deviation kept as the exact
    integer Σ_d |obs_d·10⁶ − p_d^micro·n| until the single final
    division.  The worst digit maximizes a UNIQUE ordering value
    (dev·16 − digit), so ties break to the smaller digit
    deterministically.  Non-positive cents are excluded (no leading
    digit), reported via n vs the caller's row count.

    Scale (100 TB): one map-side-combined groupBy to (group, digit);
    every window/aggregate after that runs over the ≤ 9-row-per-group
    grid."""
    cents = f"cast(round({value_col} * 100) as bigint)"
    base = (
        df.select(F.col(group_col).alias("grp"), F.expr(cents).alias("c"))
        .filter(F.col("c") >= 1)
        .select(
            "grp",
            F.expr(
                "cast(substring(cast(c as string), 1, 1) as int)"
            ).alias("digit"),
        )
    )
    obs = base.groupBy("grp", "digit").agg(F.count("*").alias("n_d"))
    grid = obs.select("grp").distinct().crossJoin(
        df.sparkSession.range(1, 10).select(
            F.col("id").cast("int").alias("digit")
        )
    )
    cells = (
        grid.join(obs, ["grp", "digit"], "left")
        .select(
            "grp", "digit", F.coalesce("n_d", F.lit(0)).alias("n_d")
        )
        .withColumn("n", F.sum("n_d").over(Window.partitionBy("grp")))
        .withColumn(
            "dev",
            F.abs(
                F.col("n_d") * 1_000_000
                - F.expr(benford_case_sql("digit")) * F.col("n")
            ),
        )
    )
    return (
        cells.groupBy(F.col("grp").alias(group_col))
        .agg(
            F.max("n").alias("n"),
            F.sum(F.when(F.col("n_d") > 0, 1).otherwise(0)).alias(
                "n_digits_seen"
            ),
            F.expr("max_by(digit, dev * 16 - digit)").alias("worst_digit"),
            F.round(
                F.sum("dev") / (F.lit(9_000_000.0) * F.max("n")), 6
            ).alias("benford_mad"),
        )
    )


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float,
    width: float,
    n_bins: int,
) -> DataFrame:
    """Quantile normalization of per-group score distributions onto the
    POOLED distribution — the batch-effect correction that makes
    quality scores comparable across sources whose scorers drift
    (bin b of group g maps to the smallest pooled bin whose cumulative
    fraction reaches g's cumulative fraction at b).

    Everything happens on the fixed bin grid (the ks_drift contract:
    grid resolution = correction resolution), and the cumulative-
    fraction comparison is the cross-multiplied integer
    cum_pool·n_group ≥ cum_group·n_pool — no float ECDFs to diverge.
    The cross-multiply runs in DECIMAL(38,0) (Spark BIGINT products
    would overflow past ~3·10⁹ pooled rows; DuckDB already promotes
    to HUGEINT — decimal keeps both engines exact AND identical).
    Returns per (group, bin): count, the mapped pooled bin, and the
    mapped bin's midpoint value (the corrected score).

    Scale (100 TB): one map-side-combined groupBy to (group, bin);
    the mapping join is over the bounded (groups × bins) × bins grid
    relation, never the data.  NULL values are excluded (no ECDF
    position — the ks_drift contract)."""
    binned = ks_binned(df, group_col, value_col, lo, width, n_bins)
    wg = Window.partitionBy("grp").orderBy("bin")
    cells = binned.select(
        "grp",
        "bin",
        "n_gb",
        F.sum("n_gb").over(wg.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_g"),
        F.sum("n_gb").over(Window.partitionBy("grp")).alias("n_g"),
    )
    pooled = binned.groupBy("bin").agg(F.sum("n_gb").alias("n_pb"))
    wp = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    pool = pooled.select(
        F.col("bin").alias("pbin"),
        F.sum("n_pb").over(wp).alias("cum_p"),
        F.sum("n_pb").over(
            Window.orderBy("bin").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n_p"),
    )
    mapped = (
        cells.join(
            pool,
            F.expr(
                "cast(cum_p as decimal(38, 0)) * n_g"
                " >= cast(cum_g as decimal(38, 0)) * n_p"
            ),
        )
        .groupBy("grp", "bin", "n_gb", "cum_g", "n_g")
        .agg(F.min("pbin").alias("mapped_bin"))
    )
    return mapped.select(
        F.col("grp").alias(group_col),
        "bin",
        F.col("n_gb").alias("n"),
        "mapped_bin",
        F.round(
            F.lit(lo) + (F.col("mapped_bin") + 0.5) * F.lit(width), 6
        ).alias("mapped_value"),
    )


def mutual_information(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list,
) -> DataFrame:
    """Mutual information I(X; Y) between two discrete columns per
    group — the model-free feature-relevance gauge (how much the value
    distribution knows about the event type, a quality score about the
    source, ...).

    Per-cell log ratios ln((n_xy/n_x)·(n/n_y)) are micro-rounded to
    BIGINT (the Zipf-slope convention: rounding at 1e-6 absorbs libm
    last-ulp differences), and the OUTPUT is the exact integer sum
    ``mi_micro`` = Σ n_xy·L_xy — micro-nats times n, the fs_link_scores
    ``llr_micro`` precedent: no final float division exists to land on
    a decimal rounding boundary (MI in nats = mi_micro / (n·10⁶)).
    The ratio is computed as two DOUBLE divisions, never the integer
    products n_xy·n / n_x·n_y — those overflow BIGINT right at the
    billions-of-rows scale this operator claims.  NULL symbols are
    excluded (no marginal mass).

    Scale (100 TB): ONE map-side-combined groupBy over the data to the
    (group, x, y) joint; marginals and totals derive from that bounded
    relation, and every join after it is keyed on the bounded symbol
    relations."""
    joint = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .select(*group_cols, F.col(x_col).alias("__x"), F.col(y_col).alias("__y"))
        .groupBy(*group_cols, "__x", "__y")
        .agg(F.count("*").alias("n_xy"))
    )
    nx = joint.groupBy(*group_cols, "__x").agg(F.sum("n_xy").alias("n_x"))
    ny = joint.groupBy(*group_cols, "__y").agg(F.sum("n_xy").alias("n_y"))
    nt = joint.groupBy(*group_cols).agg(F.sum("n_xy").alias("n"))
    marg = joint.join(nx, [*group_cols, "__x"]).join(
        ny, [*group_cols, "__y"]
    )
    # an empty key list means the total is a 1-row broadcast, not an
    # equi-join (join(on=[]) is an error in PySpark)
    cells = (
        marg.join(nt, group_cols)
        if group_cols
        else marg.crossJoin(F.broadcast(nt))
    )
    cells = (
        cells
        .withColumn(
            # explicit DOUBLE casts: a bare `* 1.0` is a DECIMAL
            # literal in both engines' parsers, and decimal division
            # rounds differently from double division — enough to flip
            # the micro-rounding of ln on real data
            "__l",
            F.expr(
                "cast(round(ln((cast(n_xy as double) / n_x)"
                " * (cast(n as double) / n_y)) * 1000000, 0) as bigint)"
            ),
        )
    )
    return cells.groupBy(*group_cols).agg(
        F.max("n").alias("n"),
        F.countDistinct("__x").alias("n_x_values"),
        F.countDistinct("__y").alias("n_y_values"),
        F.sum(F.col("n_xy") * F.col("__l")).alias("mi_micro"),
    )


def categorical_entropy(
    df: DataFrame,
    symbol_col: str,
    group_cols: list,
) -> DataFrame:
    """Shannon entropy of a discrete column per group — the mix-
    diversity gauge (how concentrated is the traffic / source / label
    distribution), the marginal companion to
    :func:`mutual_information`.

    Same conventions: per-symbol ln(n_s/n) micro-rounds to BIGINT via
    two-sided-identical DOUBLE division (explicit cast — never a
    decimal `* 1.0` literal), and the OUTPUT is the exact integer
    ``h_micro`` = −Σ n_s·L_s (micro-nats times n; entropy in nats =
    h_micro / (n·10⁶)) — no final float division to land on a rounding
    boundary.  NULL symbols are excluded.

    Scale (100 TB): one map-side-combined groupBy to (group, symbol);
    everything after runs on the bounded symbol relation."""
    counts = (
        df.filter(F.col(symbol_col).isNotNull())
        .select(*group_cols, F.col(symbol_col).alias("__s"))
        .groupBy(*group_cols, "__s")
        .agg(F.count("*").alias("n_s"))
    )
    nt = counts.groupBy(*group_cols).agg(F.sum("n_s").alias("n"))
    cells = (
        counts.join(nt, group_cols)
        if group_cols
        else counts.crossJoin(F.broadcast(nt))
    )
    cells = cells.withColumn(
        "__l",
        F.expr(
            "cast(round(ln(cast(n_s as double) / n) * 1000000, 0)"
            " as bigint)"
        ),
    )
    return cells.groupBy(*group_cols).agg(
        F.max("n").alias("n"),
        F.count("*").alias("n_symbols"),
        (-F.sum(F.col("n_s") * F.col("__l"))).alias("h_micro"),
    )


def average_precision(
    df: DataFrame,
    label: Column,
    score_col: str,
    group_cols: list,
) -> DataFrame:
    """Average precision (step-wise PR-AUC) of ``score_col`` as a
    predictor of the boolean ``label``, per group — the
    class-imbalance-honest companion of :func:`auc_mann_whitney`
    (ROC-AUC stays high when positives are rare; AP collapses, which
    is what a rare-event classifier eval needs to see).

    AP = Σ_s pos(s) · precision(s) / n⁺ over distinct scores s in
    DESCENDING order, precision(s) = TP(≥s) / (TP(≥s) + FP(≥s)) — the
    non-interpolated estimator.  House integer rules: precision is
    micro-rounded per distinct score (round-half-up in pure BIGINT
    arithmetic: (2·10⁶·TP + T) div (2·T)), each term pos(s)·prec_micro
    is an exact BIGINT, and the OUTPUT is the exact integer
    ``ap_micro`` = Σ terms (AP = ap_micro / (n_pos·10⁶)) — no final
    float division to land on a rounding boundary, and the sum is
    partition-order-free.

    Scale (100 TB): same shape as the AUC — one map-side-combined
    groupBy to (group, score), then a window over the DISTINCT-SCORE
    relation only; the raw stream is never rank-sorted.  Quantize
    unbounded-cardinality scores first."""
    hist = (
        df.select(
            *group_cols,
            F.col(score_col).alias("__s"),
            F.when(label, 1).otherwise(0).alias("__y"),
        )
        .groupBy(*group_cols, "__s")
        .agg(
            F.sum("__y").alias("pos"),
            F.sum(F.lit(1) - F.col("__y")).alias("neg"),
        )
    )
    return pr_auc_from_histogram(hist, group_cols, "__s")


def pr_auc_from_histogram(
    hist: DataFrame,
    group_cols: list,
    score_col: str,
    pos_col: str = "pos",
    neg_col: str = "neg",
) -> DataFrame:
    """The AP read-off over an already-built per-(group, score)
    pos/neg histogram — the SAME mergeable state
    :func:`auc_from_histogram` consumes, different statistic (add the
    shards' counts, then read either).  NULL scores are excluded for
    the same cross-engine NULL-ordering reason."""
    if (pos_col, neg_col) != ("pos", "neg"):
        hist = hist.withColumnRenamed(pos_col, "pos").withColumnRenamed(
            neg_col, "neg"
        )
    if score_col != "__s":
        hist = hist.withColumnRenamed(score_col, "__s")
    hist = hist.filter(F.col("__s").isNotNull())
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("__s").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tp = F.sum("pos").over(w)
    t = tp + F.sum("neg").over(w)
    # per-score precision micro-rounds half-up in pure BIGINT
    # arithmetic — jaccard_micro_sql's (2·10⁶·TP + T) div (2·T), the
    # ONE audited rounding text — before the pos(s) multiply, so no
    # intermediate exceeds 2·10⁶·n and the term sum stays
    # partition-order-free
    from faconne_spark.functions import jaccard_micro_sql

    return (
        hist.withColumn("__tp", tp)
        .withColumn("__t", t)
        .withColumn(
            "__term",
            F.expr(f"pos * {jaccard_micro_sql('__tp', '__t', 'spark')}"),
        )
        .groupBy(*group_cols)
        .agg(
            F.sum("pos").alias("n_pos"),
            F.sum("neg").alias("n_neg"),
            F.sum("__term").alias("ap_micro"),
        )
    )


def reliability_bins(
    df: DataFrame,
    score_col: str,
    label: Column,
    bounds: tuple,
    n_bins: int = 10,
    group_cols: list = (),
) -> DataFrame:
    """Reliability-diagram bins for a log-odds (or any monotone) score
    against the observed boolean label — the calibration audit behind
    "is the classifier's confidence honest?".  Each row is one score
    bin on CALLER-PINNED integer bounds: how many held-out examples
    landed there, how many were actually positive, and the exact
    integer score mass — predicted-vs-actual rate per bin is then one
    division away, and the curve MERGES across shards/epochs by adding
    the three counters.

    House rules: ``score_col`` must already be an integer (micro-unit)
    score; binning is :func:`bounded_bin_sql` (clamp-value-first — the
    round-6 overflow contract), the bin midpoint is the same exact
    integer midpoint formula as histogram_quantiles, and the outputs
    are integers (no final float division to land on a rounding
    boundary).  ``sum_score`` accumulates the CLAMPED score, for the
    same two reasons the bin index clamps: one 2e17 glitch would
    otherwise poison the edge bin's predicted-rate mass, and enough of
    them would overflow the BIGINT sum under ANSI.  NULL scores are
    excluded.

    Scale (100 TB): one map-side-combined groupBy to ≤ groups × n_bins
    rows; nothing downstream ever touches the example stream again."""
    if n_bins < 1:
        raise ValueError(f"reliability_bins needs n_bins >= 1, got {n_bins}")
    lo, hi = (int(bounds[0]), int(bounds[1]))
    if hi <= lo:
        raise ValueError(f"reliability_bins needs lo < hi, got {bounds}")
    span = hi - lo + 1
    bin_expr = bounded_bin_sql(
        f"cast({score_col} as bigint)", f"{lo}L", f"{hi}L", n_bins
    )
    clamped = (
        f"least(greatest(cast({score_col} as bigint), {lo}L), {hi}L)"
    )
    mid = f"{lo} + cast((2 * __bin + 1) * {span}L div {2 * n_bins} as bigint)"
    return (
        df.filter(F.col(score_col).isNotNull())
        .select(
            *group_cols,
            F.expr(bin_expr).alias("__bin"),
            F.expr(clamped).alias("__s"),
            F.when(label, 1).otherwise(0).alias("__y"),
        )
        .groupBy(*group_cols, "__bin")
        .agg(
            F.count("*").alias("n"),
            F.sum("__y").alias("n_pos"),
            F.sum("__s").alias("sum_score"),
        )
        .withColumn("mid_score", F.expr(mid))
        .select(
            *group_cols,
            F.col("__bin").alias("bin"),
            "mid_score",
            "n",
            "n_pos",
            "sum_score",
        )
    )


def oneway_anova(
    df: DataFrame, key: str, value_col: str, micro: int = 1_000_000
) -> DataFrame:
    """One-way ANOVA of ``value_col`` across the groups of ``key`` —
    the categorical→numeric member of the association family (χ² covers
    categorical→categorical, Pearson numeric→numeric, MI the
    model-free case): F-statistic, degrees of freedom, and η² effect
    size, answering "does this grouping explain any of the variance?".

    Determinism: per-group sums fix-point to ``micro`` BIGINTs (one
    map-side-combined pass); the between/within squared terms are
    computed per GROUP in doubles derived from those identical
    integers and micro-rounded to ONE BIGINT per group before the
    final sum (the chi2_type_dow term discipline — never a float sum
    across groups), so ssb/ssw are exact integers in both engines and
    F/η² are final-expression doubles.  NULL F when fewer than two
    groups, no residual degrees of freedom, or zero within-variance.

    Scale (100 TB): one groupBy(key) over the data (3 counters), then
    everything runs on the ≤ groups relation."""
    # internal aliases are dunder-prefixed and the key column is
    # DROPPED before the cross join: a user key named "n"/"s"/"k"
    # would otherwise collide and throw AMBIGUOUS_REFERENCE (found by
    # the hypothesis replay test)
    vm = f"cast(round({value_col} * {micro}) as bigint)"
    g = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(key)
        .agg(
            F.count("*").alias("__n"),
            F.expr(f"sum({vm})").alias("__s"),
            F.expr(
                f"sum(cast({vm} as decimal(38,0))"
                f" * cast({vm} as decimal(38,0)))"
            ).alias("__ss"),
        )
        .select("__n", "__s", "__ss")
    )
    tot = g.agg(
        F.sum("__n").alias("__nt"),
        F.sum("__s").alias("__st"),
        F.count("*").alias("__k"),
    )
    # per-group micro-rounded terms (grand mean rides in as two exact
    # integers, never a pre-divided float)
    terms = g.crossJoin(F.broadcast(tot)).select(
        "__k",
        "__nt",
        F.expr(
            "cast(round(cast(__n as double)"
            " * pow(cast(__s as double) / cast(__n as double)"
            "       - cast(__st as double) / cast(__nt as double), 2)"
            " / 1000000.0, 0) as bigint)"
        ).alias("__b"),
        F.expr(
            "cast(round((cast(__ss as double)"
            " - cast(__s as double) * cast(__s as double)"
            " / cast(__n as double))"
            " / 1000000.0, 0) as bigint)"
        ).alias("__w"),
    )
    ssb = "cast(sum(__b) as double)"
    ssw = "cast(sum(__w) as double)"
    ok = (
        "max(__k) >= 2 and max(__nt) > max(__k) and sum(__w) > 0"
    )
    return terms.groupBy().agg(
        F.max("__k").cast("long").alias("n_groups"),
        F.max("__nt").cast("long").alias("n_rows"),
        F.sum("__b").alias("ssb_micro"),
        F.sum("__w").alias("ssw_micro"),
        F.expr(
            f"case when {ok} then round(({ssb} / (max(__k) - 1))"
            f" / ({ssw} / (max(__nt) - max(__k))), 6) + 0.0 end"
        ).alias("f_stat"),
        F.expr(
            f"case when sum(__b) + sum(__w) > 0 then"
            f" round({ssb} / ({ssb} + {ssw}), 6) + 0.0 end"
        ).alias("eta_sq"),
    )


def kruskal_wallis(
    df: DataFrame, key: str, value_int_expr: str
) -> DataFrame:
    """Kruskal–Wallis H across the groups of ``key`` on an integer
    value expression (Kruskal & Wallis 1952) — the rank-based one-way
    test completing the location family next to ``oneway_anova``
    (ANOVA assumes normality; prices/latencies/values rarely oblige).
    Returns one row: n, k, df, H, the tie correction, and the
    tie-corrected H (NULL when every value ties).

    Determinism & scale: average tie-ranks come ×2 from
    ``distributed_avg_ranks`` (rank arithmetic on the distinct-value
    relation, two-phase, no partition-less window); each group's
    (2R_j)²/n_j cell rounds to ONE BIGINT ((2R)² ≤ (2N·n)² stays
    under 2⁵³ through sf1); the tie term Σ(t³−t) is an exact per-row
    sum of (t²−1); H and C are final-expression doubles."""
    from faconne_spark.operators.relational import distributed_avg_ranks

    ranked = distributed_avg_ranks(
        df.selectExpr(f"{key} AS __g", f"{value_int_expr} AS __v"),
        "__v",
        ties_col="__t",
    )
    per_group = ranked.groupBy("__g").agg(
        F.count("*").alias("n_j"), F.sum("avg2_rank").alias("s2_j")
    )
    cells = per_group.select(
        "n_j",
        F.expr(
            "cast(floor(cast(s2_j as double) * cast(s2_j as double)"
            " / n_j + 0.5) as bigint)"
        ).alias("cell"),
    )
    ties = ranked.groupBy().agg(
        F.sum(F.expr("__t * __t - 1")).alias("tie_sum"),
        F.count("*").alias("n"),
    )
    h = (
        "3.0 * sum(cell) / (cast(min(n) as double) * (min(n) + 1))"
        " - 3.0 * (min(n) + 1)"
    )
    c = (
        "1.0 - cast(min(tie_sum) as double)"
        " / (cast(min(n) as double) * min(n) * min(n) - min(n))"
    )
    return cells.crossJoin(F.broadcast(ties)).groupBy().agg(
        F.min("n").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("k_groups"),
        F.expr("cast(count(*) - 1 as bigint)").alias("df"),
        F.expr(f"round({h}, 6) + 0.0").alias("h_stat"),
        F.expr(f"round({c}, 9) + 0.0").alias("tie_correction"),
        F.expr(
            f"case when {c} > 0 then round(({h}) / ({c}), 6) + 0.0 end"
        ).alias("h_adj"),
    )


def wilcoxon_signed_rank(df: DataFrame, diff_int_col: str) -> DataFrame:
    """Wilcoxon signed-rank test over a relation of integer paired
    differences (Wilcoxon 1945): zero differences drop, |d| takes
    average tie-ranks (×2, exact) from ``distributed_avg_ranks``, and
    the normal-approximation z carries the standard tie-corrected
    variance n(n+1)(2n+1)/24 − Σ(t³−t)/48.  One row: n, W⁺×2, W⁻×2,
    tie term, z.

    The caller supplies the REDUCED difference relation (one row per
    pair/subject); the rank arithmetic never touches row-scale
    data."""
    from faconne_spark.operators.relational import distributed_avg_ranks

    nz = df.selectExpr(f"{diff_int_col} AS d").filter(F.col("d") != 0)
    ranked = distributed_avg_ranks(nz, "abs(d)", ties_col="t")
    agg = ranked.groupBy().agg(
        F.count("*").alias("n"),
        F.sum(F.expr("if(d > 0, avg2_rank, 0)")).alias("w2p"),
        F.sum(F.expr("if(d < 0, avg2_rank, 0)")).alias("w2m"),
        F.sum(F.expr("t * t - 1")).alias("tie_sum"),
    )
    var = (
        "(cast(n as double) * (n + 1) * (2 * n + 1) / 24.0"
        " - cast(tie_sum as double) / 48.0)"
    )
    return agg.select(
        F.col("n").cast("long").alias("n_nonzero"),
        F.col("w2p").cast("long").alias("w_plus_2x"),
        F.col("w2m").cast("long").alias("w_minus_2x"),
        F.col("tie_sum").cast("long").alias("tie_sum"),
        F.expr(
            f"case when n >= 2 and {var} > 0 then"
            f" round((cast(w2p as double) / 2.0"
            f" - cast(n as double) * (n + 1) / 4.0)"
            f" / sqrt({var}), 6) + 0.0 end"
        ).alias("z_stat"),
    )


def spearman_rho(
    df: DataFrame, x_int_expr: str, y_int_expr: str
) -> DataFrame:
    """Spearman rank correlation between two integer expressions:
    Pearson on the ×2 average tie-ranks from two
    ``distributed_avg_ranks`` passes — tie-correct by construction,
    and the monotone-association twin of a raw Pearson.  One row:
    n, ρ (NULL when either variable is constant).

    Scale: two distinct-value rank builds + one five-moment
    aggregation; moments in BIGINT/DECIMAL(38,0), ρ one final
    double."""
    from faconne_spark.operators.relational import distributed_avg_ranks

    base = df.selectExpr(f"{x_int_expr} AS __x", f"{y_int_expr} AS __y")
    rx = distributed_avg_ranks(base, "__x", out_col="r_x")
    rxy = distributed_avg_ranks(rx, "__y", out_col="r_y")
    m = rxy.groupBy().agg(
        F.count("*").alias("n"),
        F.sum("r_x").alias("sx"),
        F.sum("r_y").alias("sy"),
        F.sum(
            F.col("r_x").cast("decimal(38,0)") * F.col("r_y").cast("decimal(38,0)")
        ).alias("sxy"),
        F.sum(
            F.col("r_x").cast("decimal(38,0)") * F.col("r_x").cast("decimal(38,0)")
        ).alias("sxx"),
        F.sum(
            F.col("r_y").cast("decimal(38,0)") * F.col("r_y").cast("decimal(38,0)")
        ).alias("syy"),
    )
    num = (
        "(cast(n as double) * cast(sxy as double)"
        " - cast(sx as double) * cast(sy as double))"
    )
    vx = (
        "(cast(n as double) * cast(sxx as double)"
        " - cast(sx as double) * cast(sx as double))"
    )
    vy = (
        "(cast(n as double) * cast(syy as double)"
        " - cast(sy as double) * cast(sy as double))"
    )
    return m.select(
        F.col("n").cast("long").alias("n_rows"),
        F.expr(
            f"case when {vx} > 0 and {vy} > 0 then"
            f" round({num} / sqrt({vx} * {vy}), 6) + 0.0 end"
        ).alias("spearman_rho"),
    )
