"""Round-7 wave 5 (originally staged as the round-8 bank): six
query/oracle pairs built and cross-engine proven at three SFs in
round 7, then REGISTERED in the same round because the ≤50-key driver
window still had free slots — an unregistered-but-proven key is a
wasted green row when the window isn't full.  tests/test_bank_r8.py
runs each pair driver-style against DuckDB plus a
partitioning-invariance sweep (the bank-module test shape, kept)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from faconne_spark.queries import T

BANK_QUERIES: dict = {}
BANK_ORACLES: dict = {}


# ------------------------------------------------- gap survival ladder

GAP_THRESHOLDS_S = (60, 300, 1800, 7200, 86400)


def events_gap_survival(spark, sf):
    """Survival curve of inter-event gaps at a pinned threshold ladder:
    per event type, the share of same-user consecutive gaps exceeding
    1 m / 5 m / 30 m / 2 h / 1 d — the session-gap calibration read-out
    (the 30-minute sessionization cutoff is an industry habit; this
    table says where THIS corpus's dead zones actually sit).

    One user-partitioned lag window builds the gap relation; then one
    grouped pass of |ladder| conditional sums unpivoted with stack —
    counts merge across shards by addition."""
    ev = T(spark, sf, "events").select(
        "user_id", "event_type", "event_id", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = (
        ev.withColumn("gap_us", F.col("us") - F.lag("us").over(w))
        .filter(F.col("gap_us").isNotNull())
    )
    aggs = [F.count("*").alias("n")] + [
        F.sum(
            F.expr(f"case when gap_us > {t * 1_000_000} then 1 else 0 end")
        ).alias(f"x_{i}")
        for i, t in enumerate(GAP_THRESHOLDS_S)
    ]
    agg = gaps.groupBy("event_type").agg(*aggs)
    stack = ", ".join(
        f"{t}, x_{i}" for i, t in enumerate(GAP_THRESHOLDS_S)
    )
    return agg.select(
        "event_type",
        "n",
        F.expr(
            f"stack({len(GAP_THRESHOLDS_S)}, {stack})"
            " as (threshold_s, n_exceed)"
        ),
    ).select(
        "event_type",
        F.col("threshold_s").cast("long").alias("threshold_s"),
        F.col("n").alias("n_gaps"),
        "n_exceed",
        F.expr("round(n_exceed / n, 6)").alias("survival"),
    )


def _oracle_gap_survival() -> str:
    sums = ", ".join(
        f"sum(CASE WHEN gap_us > {t * 1_000_000} THEN 1 ELSE 0 END)::BIGINT"
        f" AS x_{i}"
        for i, t in enumerate(GAP_THRESHOLDS_S)
    )
    rungs = " UNION ALL ".join(
        f"SELECT event_type, {t}::BIGINT AS threshold_s, n AS n_gaps,"
        f" x_{i} AS n_exceed, round(x_{i} / n, 6) AS survival FROM agg"
        for i, t in enumerate(GAP_THRESHOLDS_S)
    )
    return f"""
WITH ev AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS us FROM events),
gaps AS (
  SELECT event_type,
         us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
           AS gap_us
  FROM ev),
agg AS (
  SELECT event_type, count(*)::BIGINT AS n, {sums}
  FROM gaps WHERE gap_us IS NOT NULL GROUP BY 1)
{rungs}
"""


BANK_QUERIES["events_gap_survival"] = events_gap_survival
BANK_ORACLES["events_gap_survival"] = _oracle_gap_survival()


# ------------------------------------------------- user lifetime

def events_user_lifetime_quantiles(spark, sf):
    """p50/p95/p99 of user LIFETIME (days between first and last
    activity) via the mergeable histogram sketch — the engagement-span
    tile behind retention targets (a p50 lifetime of 3 days and a p95
    of 80 says the base is tourists plus a devoted tail).  The
    per-user span relation is track_persist'ed so the sketch's bounds
    and binning passes share ONE execution of the rollup (r7 judge
    finding; the cache is one row per user — dimension-sized)."""
    from faconne_spark.operators.dedup import track_persist
    from faconne_spark.operators.relational import histogram_quantiles
    from faconne_spark.queries.curation import HQ_BINS, HQ_QS

    spans = track_persist(
        T(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.expr(
                "cast(datediff(max(to_date(ts)), min(to_date(ts)))"
                " as double)"
            ).alias("value")
        )
        .select(F.lit("all").alias("grp"), "value")
    )
    return histogram_quantiles(spans, "value", "grp", HQ_BINS, HQ_QS)


def _oracle_lifetime_quantiles() -> str:
    from faconne_spark.queries.curation import HQ_BINS, HQ_QS

    nb = HQ_BINS
    parts = []
    for q in HQ_QS:
        q_us = int(round(q * 1_000_000))
        parts.append(f"""
SELECT grp, {q} AS q,
       round((_lo + (2 * _qbin + 1)::BIGINT * (_hi - _lo + 1) // {2 * nb})
             / 1000000.0, 6) AS estimate
FROM (
  SELECT grp, min(_bin) AS _qbin, min(_lo) AS _lo, min(_hi) AS _hi
  FROM cum WHERE _cum * 1000000 >= _total * {q_us}
  GROUP BY grp)""")
    return f"""
WITH vals AS (
  SELECT 'all' AS grp,
         floor((max(ts::DATE) - min(ts::DATE))::DOUBLE * 1000000
               + 0.5)::BIGINT AS us
  FROM events GROUP BY user_id),
bounds AS (SELECT grp, min(us) AS _lo, max(us) AS _hi FROM vals GROUP BY 1),
binned AS (
  SELECT v.grp,
         ((least(greatest(v.us, bo._lo), bo._hi) - bo._lo) * {nb}
          // (bo._hi - bo._lo + 1))::INT AS _bin,
         count(*) AS _cnt, min(bo._lo) AS _lo, min(bo._hi) AS _hi
  FROM vals v JOIN bounds bo USING (grp)
  GROUP BY 1, 2),
cum AS (
  SELECT grp, _bin, _lo, _hi,
         sum(_cnt) OVER (PARTITION BY grp ORDER BY _bin) AS _cum,
         sum(_cnt) OVER (PARTITION BY grp) AS _total
  FROM binned)
{" UNION ALL ".join(parts)}
"""


BANK_QUERIES["events_user_lifetime_quantiles"] = events_user_lifetime_quantiles
BANK_ORACLES["events_user_lifetime_quantiles"] = _oracle_lifetime_quantiles()


# ------------------------------------------------- balance–orders corr

def customer_balance_vs_orders_corr(spark, sf):
    """Pearson correlation between a customer's account balance and
    their order count (customers with no orders count as zero) — the
    one-scalar sanity check on 'do richer accounts actually buy
    more?' before anyone fits a model to it.

    DECIMAL(38,0) moment sums from exact integer cents and counts;
    the left join keeps orderless customers; NULL when either
    variance vanishes."""
    cust = T(spark, sf, "customer").select(
        "c_custkey",
        F.expr("cast(round(c_acctbal * 100) as bigint)").alias("x"),
    )
    per_cust = (
        T(spark, sf, "orders")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.count("*").alias("y"))
    )
    joined = cust.join(per_cust, "c_custkey", "left").select(
        F.col("x").cast("decimal(38,0)").alias("x"),
        F.coalesce("y", F.lit(0)).cast("decimal(38,0)").alias("y"),
    )
    m = joined.groupBy().agg(
        F.count("*").alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("y * y")).alias("syy"),
        F.sum(F.expr("x * y")).alias("sxy"),
    )
    num = (
        "(cast(k as double) * cast(sxy as double)"
        " - cast(sx as double) * cast(sy as double))"
    )
    dx = (
        "(cast(k as double) * cast(sxx as double)"
        " - cast(sx as double) * cast(sx as double))"
    )
    dy = (
        "(cast(k as double) * cast(syy as double)"
        " - cast(sy as double) * cast(sy as double))"
    )
    return m.select(
        F.col("k").alias("n_customers"),
        F.expr(
            f"case when {dx} > 0 and {dy} > 0 then"
            f" round({num} / sqrt({dx} * {dy}), 6) + 0.0 end"
        ).alias("pearson_r"),
    )


ORACLE_BAL_ORDERS_CORR = """
WITH per_cust AS (
  SELECT o_custkey AS c_custkey, count(*)::BIGINT AS y
  FROM orders GROUP BY 1),
joined AS (
  SELECT round(c.c_acctbal * 100)::BIGINT::DECIMAL(38,0) AS x,
         coalesce(p.y, 0)::DECIMAL(38,0) AS y
  FROM customer c LEFT JOIN per_cust p USING (c_custkey)),
m AS (
  SELECT count(*)::BIGINT AS k, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM joined)
SELECT k AS n_customers,
       CASE WHEN (k::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) > 0
             AND (k::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE) > 0
       THEN round((k::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                  / sqrt((k::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                       * (k::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)),
                  6) + 0.0
       END AS pearson_r
FROM m
"""

BANK_QUERIES["customer_balance_vs_orders_corr"] = customer_balance_vs_orders_corr
BANK_ORACLES["customer_balance_vs_orders_corr"] = ORACLE_BAL_ORDERS_CORR


# ------------------------------------------------- brand price premium

def part_brand_price_premium(spark, sf):
    """Each brand's mean retail price as an exact integer micro ratio
    of the catalog-wide mean — the brand-premium league table (and the
    canary for a mispriced catalog import: one brand's premium jumping
    20% overnight is a units bug, not a strategy).

    Ratio of two integer-cents means computed cross-multiplied —
    (s·N)/(n·S) in IEEE doubles from identical BIGINTs, one
    micro-round."""
    p = T(spark, sf, "part").select(
        "p_brand",
        F.expr("cast(round(p_retailprice * 100) as bigint)").alias("c"),
    )
    brand = p.groupBy("p_brand").agg(
        F.count("*").alias("n"), F.sum("c").alias("s")
    )
    glob = p.groupBy().agg(
        F.count("*").alias("gn"), F.sum("c").alias("gs")
    )
    return brand.crossJoin(F.broadcast(glob)).select(
        "p_brand",
        F.col("n").alias("n_parts"),
        F.expr(
            "cast(round(1000000 * cast(s as double) * cast(gn as double)"
            " / (cast(n as double) * cast(gs as double)), 0) as bigint)"
        ).alias("premium_micro"),
    )


ORACLE_BRAND_PREMIUM = """
WITH p AS (
  SELECT p_brand, round(p_retailprice * 100)::BIGINT AS c FROM part),
brand AS (
  SELECT p_brand, count(*)::BIGINT AS n, sum(c)::BIGINT AS s
  FROM p GROUP BY 1),
gtot AS (SELECT count(*)::BIGINT AS gn, sum(c)::BIGINT AS gs FROM p)
SELECT p_brand, n AS n_parts,
       round(1000000 * s::DOUBLE * gn::DOUBLE
             / (n::DOUBLE * gs::DOUBLE), 0)::BIGINT AS premium_micro
FROM brand CROSS JOIN gtot
"""

BANK_QUERIES["part_brand_price_premium"] = part_brand_price_premium
BANK_ORACLES["part_brand_price_premium"] = ORACLE_BRAND_PREMIUM


# ------------------------------------------------- doc length quantiles

def docs_source_length_quantiles(spark, sf):
    """p50/p95/p99 of document length (chars) per source via the
    mergeable histogram sketch — the per-source length fingerprint
    (a source whose p95 collapses after a crawler change lost its
    long-form tail; the mean hides that)."""
    from faconne_spark.operators.relational import histogram_quantiles
    from faconne_spark.queries.curation import HQ_BINS, HQ_QS

    docs = T(spark, sf, "documents").select(
        F.col("source").alias("grp"),
        F.expr("cast(n_chars as double)").alias("value"),
    )
    return histogram_quantiles(docs, "value", "grp", HQ_BINS, HQ_QS)


def _oracle_length_quantiles() -> str:
    from faconne_spark.queries.curation import HQ_BINS, HQ_QS

    nb = HQ_BINS
    parts = []
    for q in HQ_QS:
        q_us = int(round(q * 1_000_000))
        parts.append(f"""
SELECT grp, {q} AS q,
       round((_lo + (2 * _qbin + 1)::BIGINT * (_hi - _lo + 1) // {2 * nb})
             / 1000000.0, 6) AS estimate
FROM (
  SELECT grp, min(_bin) AS _qbin, min(_lo) AS _lo, min(_hi) AS _hi
  FROM cum WHERE _cum * 1000000 >= _total * {q_us}
  GROUP BY grp)""")
    return f"""
WITH vals AS (
  SELECT source AS grp,
         floor(n_chars::DOUBLE * 1000000 + 0.5)::BIGINT AS us
  FROM documents),
bounds AS (SELECT grp, min(us) AS _lo, max(us) AS _hi FROM vals GROUP BY 1),
binned AS (
  SELECT v.grp,
         ((least(greatest(v.us, bo._lo), bo._hi) - bo._lo) * {nb}
          // (bo._hi - bo._lo + 1))::INT AS _bin,
         count(*) AS _cnt, min(bo._lo) AS _lo, min(bo._hi) AS _hi
  FROM vals v JOIN bounds bo USING (grp)
  GROUP BY 1, 2),
cum AS (
  SELECT grp, _bin, _lo, _hi,
         sum(_cnt) OVER (PARTITION BY grp ORDER BY _bin) AS _cum,
         sum(_cnt) OVER (PARTITION BY grp) AS _total
  FROM binned)
{" UNION ALL ".join(parts)}
"""


BANK_QUERIES["docs_source_length_quantiles"] = docs_source_length_quantiles
BANK_ORACLES["docs_source_length_quantiles"] = _oracle_length_quantiles()


# ------------------------------------------------- quantity KS by flag

LQTY_LO, LQTY_WIDTH, LQTY_BINS = 0.0, 1.0, 64


def lineitem_qty_returnflag_ks(spark, sf):
    """One-vs-rest binned two-sample KS of the quantity distribution
    per return flag — 'do returned lines ship in different quantities
    than kept ones?'.  The lineitem-side proof of the KS machinery
    (same ks_drift operator and grid discipline as the events key)."""
    from faconne_spark.operators.evalstats import ks_drift

    return ks_drift(
        T(spark, sf, "lineitem"), "l_returnflag", "l_quantity",
        LQTY_LO, LQTY_WIDTH, LQTY_BINS,
    )


ORACLE_QTY_KS = f"""
WITH binned AS (
  SELECT l_returnflag AS grp,
         cast(least(greatest(floor((l_quantity - {LQTY_LO!r})
           / {LQTY_WIDTH!r}), 0), {LQTY_BINS - 1}) AS INT) AS bin,
         count(*)::BIGINT AS n_gb
  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2),
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
SELECT grp AS l_returnflag,
       max(n_in)::BIGINT AS n_in, max(n_out)::BIGINT AS n_out,
       CASE WHEN max(n_in) > 0 AND max(n_out) > 0 THEN
         round(max(abs(c_in * n_out - c_out * n_in))
               / (max(n_in) * max(n_out) * 1.0), 6)
       END AS ks_d
FROM cum GROUP BY grp
"""

BANK_QUERIES["lineitem_qty_returnflag_ks"] = lineitem_qty_returnflag_ks
BANK_ORACLES["lineitem_qty_returnflag_ks"] = ORACLE_QTY_KS

# registry aliases: _merged() consumes QUERIES/ORACLES from every module
QUERIES = BANK_QUERIES
ORACLES = BANK_ORACLES
