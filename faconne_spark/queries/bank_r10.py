"""Round-10 STAGING bank: pairs built and cross-engine-proven in
round 9, deliberately left unregistered so next round's opening move
inherits already-proven work (the bank_r6…bank_r9/staged_r9
precedent).  tests/test_bank_r10.py carries the 3-SF driver-style
proofs + the partitioning-invariance sweep; registration is the
round-10 move (QUERIES/ORACLES aliases + _merged() import + window
entries + snapshots + bench + SURVEY §2 rows + SCALING)."""

from __future__ import annotations

from pyspark.sql import functions as F

from faconne_spark.queries import T

BANK_QUERIES: dict = {}
BANK_ORACLES: dict = {}


# ----------------------------- does priority actually ship faster?

# the synthetic ship lag spans roughly [-2400, 2500] days (shipdate
# is not orderdate-correlated in this generator) — the grid covers it
SHIPLAG_LO, SHIPLAG_WIDTH, SHIPLAG_BINS = -2560.0, 40.0, 128


def orders_priority_shiplag_ks(spark, sf):
    """One-vs-rest binned KS of the SHIP-LAG distribution per order
    priority — the SLA audit that asks whether priority classes
    actually ship on different schedules, distribution-wide, not just
    on average (a mean shift and a tail shift read identically to an
    avg; KS separates them).  Same ks_drift operator and grid
    discipline as the events/lineitem/catalog KS keys."""
    from faconne_spark.operators.evalstats import ks_drift

    lags = (
        T(spark, sf, "lineitem")
        .select("l_orderkey", F.expr("to_date(l_shipdate)").alias("sd"))
        .join(
            T(spark, sf, "orders").select(
                F.col("o_orderkey").alias("l_orderkey"),
                F.expr("to_date(o_orderdate)").alias("od"),
                "o_orderpriority",
            ),
            "l_orderkey",
        )
        .select(
            "o_orderpriority",
            F.expr("cast(datediff(sd, od) as double)").alias("lag"),
        )
    )
    return ks_drift(
        lags, "o_orderpriority", "lag",
        SHIPLAG_LO, SHIPLAG_WIDTH, SHIPLAG_BINS,
    )


ORACLE_PRIORITY_SHIPLAG_KS = f"""
WITH lags AS (
  SELECT o.o_orderpriority,
         (l.l_shipdate::DATE - o.o_orderdate::DATE)::DOUBLE AS lag
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
binned AS (
  SELECT o_orderpriority AS grp,
         cast(least(greatest(floor((lag - {SHIPLAG_LO!r})
           / {SHIPLAG_WIDTH!r}), 0), {SHIPLAG_BINS - 1}) AS INT) AS bin,
         count(*)::BIGINT AS n_gb
  FROM lags WHERE lag IS NOT NULL GROUP BY 1, 2),
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
SELECT grp AS o_orderpriority,
       max(n_in)::BIGINT AS n_in, max(n_out)::BIGINT AS n_out,
       CASE WHEN max(n_in) > 0 AND max(n_out) > 0 THEN
         round(max(abs(c_in * n_out - c_out * n_in))
               / (max(n_in)::DOUBLE * max(n_out)::DOUBLE), 6)
       END AS ks_d
FROM cum GROUP BY grp
"""

BANK_QUERIES["orders_priority_shiplag_ks"] = orders_priority_shiplag_ks
BANK_ORACLES["orders_priority_shiplag_ks"] = ORACLE_PRIORITY_SHIPLAG_KS


# ------------------------------ engagement concentration per cohort

def events_active_days_gini(spark, sf):
    """Per signup-cohort (first-activity month) Gini of users' ACTIVE
    DAY counts — engagement concentration inside each cohort (a high
    Gini says a thin power-user crust carries the cohort; retention
    averages hide that).  Same exact integer rank-sum Gini as
    orders_revenue_gini; the rank window partitions by cohort — never
    partition-less."""
    from pyspark.sql import Window

    per_user = (
        T(spark, sf, "events")
        .select("user_id", F.expr("to_date(ts)").alias("d"))
        .distinct()
        .groupBy("user_id")
        .agg(
            F.count("*").alias("active_days"),
            F.expr("trunc(min(d), 'MM')").alias("cohort"),
        )
    )
    w = Window.partitionBy("cohort").orderBy("active_days", "user_id")
    ranked = per_user.withColumn("rk", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(Window.partitionBy("cohort"))
    )
    return ranked.groupBy("cohort").agg(
        F.count("*").alias("n_users"),
        F.sum("active_days").alias("total_active_days"),
        F.round(
            (
                2.0 * F.sum(F.col("rk") * F.col("active_days"))
                - (F.count("*") + 1) * F.sum("active_days")
            )
            / (F.count("*") * F.sum("active_days")),
            6,
        ).alias("gini"),
        F.round(
            F.sum(
                F.when(
                    F.col("rk") * 10 > F.col("n") * 9, F.col("active_days")
                ).otherwise(0)
            )
            / F.sum("active_days"),
            6,
        ).alias("top_decile_share"),
    )


ORACLE_ACTIVE_DAYS_GINI = """
WITH per_user AS (
  SELECT user_id, count(*)::BIGINT AS active_days,
         date_trunc('month', min(d))::DATE AS cohort
  FROM (SELECT DISTINCT user_id, ts::DATE AS d FROM events)
  GROUP BY 1),
ranked AS (
  SELECT cohort, user_id, active_days,
         row_number() OVER (PARTITION BY cohort
                            ORDER BY active_days, user_id) AS rk,
         count(*) OVER (PARTITION BY cohort) AS n
  FROM per_user)
SELECT cohort, count(*)::BIGINT AS n_users,
       sum(active_days)::BIGINT AS total_active_days,
       round((2.0 * sum(rk * active_days)
              - (count(*) + 1) * sum(active_days))
             / (count(*) * sum(active_days)), 6) AS gini,
       round(sum(CASE WHEN rk * 10 > n * 9 THEN active_days ELSE 0 END)
             / sum(active_days), 6) AS top_decile_share
FROM ranked GROUP BY 1
"""

BANK_QUERIES["events_active_days_gini"] = events_active_days_gini
BANK_ORACLES["events_active_days_gini"] = ORACLE_ACTIVE_DAYS_GINI


# ------------------------------------ transition-flow asymmetry

def events_transition_asymmetry(spark, sf):
    """Directional asymmetry of the event-type transition graph: for
    each unordered type pair, the net flow (n_ab − n_ba)/(n_ab + n_ba)
    in half-up integer micro — the funnel-direction detector behind
    events_markov_transitions' raw matrix (a strongly positive
    view→purchase asymmetry is a funnel; symmetric flows are browsing
    noise).  Everything after the one corpus pass runs on the ≤ types²
    relation; the asymmetry keeps Spark's div truncation semantics on
    a non-negative numerator by orienting each pair a < b and signing
    at the end."""
    from pyspark.sql import Window

    ev = T(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(
            F.col("next_type").isNotNull()
            & (F.col("next_type") != F.col("event_type"))
        )
        .groupBy(
            F.col("event_type").alias("src"),
            F.col("next_type").alias("dst"),
        )
        .agg(F.count("*").alias("n"))
    )
    fwd = trans.select(
        F.expr("least(src, dst)").alias("a"),
        F.expr("greatest(src, dst)").alias("b"),
        F.expr("if(src < dst, n, cast(0 as bigint))").alias("n_ab"),
        F.expr("if(src > dst, n, cast(0 as bigint))").alias("n_ba"),
    )
    pair = fwd.groupBy("a", "b").agg(
        F.sum("n_ab").alias("n_ab"), F.sum("n_ba").alias("n_ba")
    )
    return pair.select(
        F.col("a").alias("type_a"), F.col("b").alias("type_b"),
        "n_ab", "n_ba",
        F.expr(
            "cast(if(n_ab >= n_ba, 1, -1)"
            " * ((2000000 * abs(n_ab - n_ba) + (n_ab + n_ba))"
            " div (2 * (n_ab + n_ba))) as bigint)"
        ).alias("asymmetry_micro"),
    )


ORACLE_TRANSITION_ASYMMETRY = """
WITH trans AS (
  SELECT src, dst, count(*)::BIGINT AS n FROM (
    SELECT event_type AS src,
           lead(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS dst
    FROM events)
  WHERE dst IS NOT NULL AND dst != src GROUP BY 1, 2),
pair AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b,
         sum(CASE WHEN src < dst THEN n ELSE 0 END)::BIGINT AS n_ab,
         sum(CASE WHEN src > dst THEN n ELSE 0 END)::BIGINT AS n_ba
  FROM trans GROUP BY 1, 2)
SELECT a AS type_a, b AS type_b, n_ab, n_ba,
       ((CASE WHEN n_ab >= n_ba THEN 1 ELSE -1 END)
        * ((2000000 * abs(n_ab - n_ba) + (n_ab + n_ba))
           // (2 * (n_ab + n_ba))))::BIGINT AS asymmetry_micro
FROM pair
"""

BANK_QUERIES["events_transition_asymmetry"] = events_transition_asymmetry
BANK_ORACLES["events_transition_asymmetry"] = ORACLE_TRANSITION_ASYMMETRY
