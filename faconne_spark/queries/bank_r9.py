"""Round-8 wave 4 (originally staged as the round-9 bank): three
query/oracle pairs built and cross-engine proven at three SFs in
round 8, then REGISTERED in the same round because the ≤50-key driver
window still had free slots — an unregistered-but-proven key is a
wasted green row when the window isn't full (the bank_r8 precedent,
applied again).  tests/test_bank_r9.py keeps the bank-style driver +
partitioning-invariance coverage.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from faconne_spark.queries import T

BANK_QUERIES: dict = {}
BANK_ORACLES: dict = {}


# --------------------------------------------- reorder acceleration

def orders_reorder_acceleration(spark, sf):
    """Are repeat customers speeding up or slowing down?  Per customer
    with ≥ 2 inter-order gaps, the exact integer trend statistic
    T = m·Σ(i·gᵢ) − (Σi)(Σgᵢ) over the ordered gap sequence (the
    least-squares slope's sign without the division); the rollup is
    the share of repeat customers ACCELERATING (T < 0) with a Wilson
    interval (shared wilson_bounds_sql).

    Scale: one customer-partitioned lag window builds gaps; the trend
    reduces per customer map-side (exact BIGINTs — gap days and index
    products stay far inside 2⁶³); the rollup is one row."""
    from faconne_spark.operators.relational import wilson_bounds_sql

    o = T(spark, sf, "orders").select(
        "o_custkey", "o_orderkey",
        F.expr("cast(o_orderdate as date)").alias("d"),
    )
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    gaps = (
        o.withColumn("prev_d", F.lag("d").over(w))
        .filter(F.col("prev_d").isNotNull())
        .withColumn("g", F.expr("cast(datediff(d, prev_d) as bigint)"))
        .withColumn(
            "i",
            F.row_number().over(
                Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
            ),
        )
    )
    per_cust = gaps.groupBy("o_custkey").agg(
        F.count("*").alias("m"),
        F.sum(F.expr("cast(i as bigint) * g")).alias("sig"),
        F.sum(F.expr("cast(i as bigint)")).alias("si"),
        F.sum("g").alias("sg"),
    ).filter(F.col("m") >= 2).select(
        F.expr("m * sig - si * sg").alias("t_stat")
    )
    lo, hi = wilson_bounds_sql("k", "n")
    return (
        per_cust.agg(
            F.count("*").alias("n"),
            F.sum(F.expr("if(t_stat < 0, 1, 0)")).alias("k"),
        )
        .select(
            F.col("n").cast("long").alias("n_repeat_customers"),
            F.col("k").cast("long").alias("n_accelerating"),
            F.expr(
                "case when n > 0 then cast((2 * 1000000 * k + n)"
                " div (2 * n) as bigint) end"
            ).alias("accel_share_micro"),
            F.expr(f"case when n > 0 then {lo} + 0.0 end").alias(
                "wilson_lo"
            ),
            F.expr(f"case when n > 0 then {hi} + 0.0 end").alias(
                "wilson_hi"
            ),
        )
    )


def _oracle_reorder_acceleration() -> str:
    from faconne_spark.operators.relational import wilson_bounds_sql

    lo, hi = wilson_bounds_sql("k", "n")
    return f"""
WITH o AS (
  SELECT o_custkey, o_orderkey, o_orderdate::DATE AS d FROM orders),
gaps AS (
  SELECT o_custkey,
         (d - lag(d) OVER (PARTITION BY o_custkey
                           ORDER BY d, o_orderkey))::BIGINT AS g,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY d, o_orderkey) - 1 AS i
  FROM o),
per_cust AS (
  SELECT o_custkey, count(*)::BIGINT AS m,
         sum(i::BIGINT * g)::BIGINT AS sig,
         sum(i::BIGINT)::BIGINT AS si, sum(g)::BIGINT AS sg
  FROM gaps WHERE g IS NOT NULL GROUP BY 1),
t AS (
  SELECT m * sig - si * sg AS t_stat FROM per_cust WHERE m >= 2),
agg AS (
  SELECT count(*)::BIGINT AS n,
         sum(CASE WHEN t_stat < 0 THEN 1 ELSE 0 END)::BIGINT AS k
  FROM t)
SELECT n AS n_repeat_customers, k AS n_accelerating,
       CASE WHEN n > 0 THEN (2 * 1000000 * k + n) // (2 * n) END
         AS accel_share_micro,
       CASE WHEN n > 0 THEN {lo} + 0.0 END AS wilson_lo,
       CASE WHEN n > 0 THEN {hi} + 0.0 END AS wilson_hi
FROM agg
"""


BANK_QUERIES["orders_reorder_acceleration"] = orders_reorder_acceleration
BANK_ORACLES["orders_reorder_acceleration"] = _oracle_reorder_acceleration()


# ------------------------------------------------- part size KS

PSIZE_LO, PSIZE_WIDTH, PSIZE_BINS = 0.0, 1.0, 64


def part_size_brand_ks(spark, sf):
    """One-vs-rest binned KS of the part-size distribution per brand —
    'does this brand stock a different size profile than the rest of
    the catalog?'  The KS machinery proven on the CATALOG dimension
    (same ks_drift operator and grid discipline as the events and
    lineitem keys; integer sizes land exactly on the unit grid)."""
    from faconne_spark.operators.evalstats import ks_drift

    return ks_drift(
        T(spark, sf, "part"), "p_brand", "p_size",
        PSIZE_LO, PSIZE_WIDTH, PSIZE_BINS,
    )


ORACLE_PART_SIZE_KS = f"""
WITH binned AS (
  SELECT p_brand AS grp,
         cast(least(greatest(floor((p_size - {PSIZE_LO!r})
           / {PSIZE_WIDTH!r}), 0), {PSIZE_BINS - 1}) AS INT) AS bin,
         count(*)::BIGINT AS n_gb
  FROM part WHERE p_size IS NOT NULL GROUP BY 1, 2),
grid AS (
  SELECT g.grp, b.bin
  FROM (SELECT DISTINCT grp FROM binned) g
  CROSS JOIN (SELECT DISTINCT bin FROM binned) b),
tot AS (SELECT bin, sum(n_gb)::BIGINT AS n_b FROM binned GROUP BY 1),
cells AS (
  SELECT grid.grp, grid.bin,
         coalesce(n_gb, 0) AS n_in_b,
         n_b - coalesce(n_gb, 0) AS n_out_b
  FROM grid
  LEFT JOIN binned ON binned.grp = grid.grp AND binned.bin = grid.bin
  JOIN tot ON tot.bin = grid.bin),
cum AS (
  SELECT grp,
         sum(n_in_b) OVER (PARTITION BY grp ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_in,
         sum(n_out_b) OVER (PARTITION BY grp ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_out,
         sum(n_in_b) OVER (PARTITION BY grp) AS n_in,
         sum(n_out_b) OVER (PARTITION BY grp) AS n_out
  FROM cells)
SELECT grp AS p_brand,
       max(n_in)::BIGINT AS n_in, max(n_out)::BIGINT AS n_out,
       CASE WHEN max(n_in) > 0 AND max(n_out) > 0 THEN
         round(max(abs(c_in * n_out - c_out * n_in))
               / (max(n_in) * max(n_out) * 1.0), 6)
       END AS ks_d
FROM cum GROUP BY grp
"""

BANK_QUERIES["part_size_brand_ks"] = part_size_brand_ks
BANK_ORACLES["part_size_brand_ks"] = ORACLE_PART_SIZE_KS


# ------------------------------------------------- DAU trend

def events_dau_mann_kendall(spark, sf):
    """Mann–Kendall monotone-trend test on the DAILY ACTIVE USERS
    series — 'is the user base actually growing?' on the
    distribution-free machinery of events_mann_kendall_trend, applied
    to the distinct-user series instead of raw volume (volume can
    trend while DAU decays: fewer users doing more).

    Scale: one countDistinct rollup to ≤ days rows, then the pair
    join runs on the DAYS×DAYS relation (calendar-bounded); S exact
    BIGINT, variance from identical integers."""
    daily = (
        T(spark, sf, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("c"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    s = (
        a.join(b, F.col("a.day") < F.col("b.day"))
        .agg(
            F.sum(
                F.expr("cast(sign(b.c - a.c) as bigint)")
            ).alias("s_stat")
        )
    )
    nd = daily.agg(F.count("*").alias("n_days"))
    ties = (
        daily.groupBy("c")
        .agg(F.count("*").alias("t"))
        .agg(F.sum(F.expr("t * (t - 1) * (2 * t + 5)")).alias("tsum"))
    )
    var_s = (
        "(cast(n_days as double) * (n_days - 1) * (2 * n_days + 5)"
        " - cast(tsum as double)) / 18"
    )
    z = (
        f"case when {var_s} > 0 then round("
        f" (cast(s_stat as double) - cast(sign(s_stat) as double))"
        f" / sqrt({var_s}), 6) + 0.0 end"
    )
    return (
        nd.crossJoin(s)
        .crossJoin(ties)
        .select(
            F.col("n_days").cast("long").alias("n_days"),
            "s_stat",
            F.expr(z).alias("mk_z"),
        )
    )


ORACLE_DAU_MK = """
WITH daily AS (
  SELECT ts::DATE AS day, count(DISTINCT user_id)::BIGINT AS c
  FROM events GROUP BY 1),
s AS (
  SELECT sum(sign(b.c - a.c))::BIGINT AS s_stat
  FROM daily a JOIN daily b ON a.day < b.day),
nd AS (SELECT count(*)::BIGINT AS n_days FROM daily),
ties AS (
  SELECT sum(t * (t - 1) * (2 * t + 5))::BIGINT AS tsum FROM (
    SELECT c, count(*)::BIGINT AS t FROM daily GROUP BY 1))
SELECT n_days, s_stat,
       CASE WHEN (n_days::DOUBLE * (n_days - 1) * (2 * n_days + 5)
                  - tsum::DOUBLE) / 18 > 0 THEN
         round((s_stat::DOUBLE - sign(s_stat)::DOUBLE)
               / sqrt((n_days::DOUBLE * (n_days - 1) * (2 * n_days + 5)
                       - tsum::DOUBLE) / 18), 6) + 0.0 END AS mk_z
FROM nd CROSS JOIN s CROSS JOIN ties
"""

BANK_QUERIES["events_dau_mann_kendall"] = events_dau_mann_kendall
BANK_ORACLES["events_dau_mann_kendall"] = ORACLE_DAU_MK


# registry aliases: _merged() consumes QUERIES/ORACLES from every module
QUERIES = BANK_QUERIES
ORACLES = BANK_ORACLES
