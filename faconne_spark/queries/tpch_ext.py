"""TPC-H remainder + analytic extensions, adapted to the driver schema.

The driver tables lack ``partsupp`` and commit/receipt dates, so Q2 /
Q9 / Q11 / Q12 / Q16 / Q20 / Q21 are re-expressed over lineitem as the
price/quantity fact while keeping each query's *operator shape* intact
(correlated min, scalar-subquery threshold, multi-EXISTS, distinct agg,
…).  Scale notes per query; every money sum uses the cross-engine
exact fixed-point form from faconne_spark.functions.exact_money_sum.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from faconne_spark.functions import exact_money_sum
from faconne_spark.queries import T

REV = "l_extendedprice * (1 - l_discount)"


# ---------------------------------------------------------------------------
# q2 (adapted): min-cost supplier per part in a region
# ---------------------------------------------------------------------------
def q2_min_cost_supp(spark, sf):
    """For each small EUROPE-supplied part, the cheapest supplier
    (min observed sale price; ties broken by suppkey).

    Scale: the per-(part,supp) agg shuffles lineitem once on a compound
    key; supplier⋈nation⋈region is a broadcast dim; the per-part min is
    a window over the already-shuffled compound key (AQE coalesces)."""
    li = T(spark, sf, "lineitem")
    part = T(spark, sf, "part").filter("p_size <= 5")
    supp = T(spark, sf, "supplier")
    nat = T(spark, sf, "nation")
    reg = T(spark, sf, "region").filter("r_name = 'EUROPE'")
    dims = F.broadcast(
        supp.join(nat, supp.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
    )
    offers = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.round(F.min("l_extendedprice"), 2).alias("price"))
        .join(dims, F.col("l_suppkey") == dims.s_suppkey)
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
    )
    w = Window.partitionBy("l_partkey").orderBy("price", "l_suppkey")
    return (
        offers.withColumn("rk", F.row_number().over(w))
        .filter("rk = 1")
        .select("p_partkey", "p_name", "s_name", "n_name", "price")
    )


ORACLE_Q2 = """
SELECT p_partkey, p_name, s_name, n_name, price FROM (
  SELECT p_partkey, p_name, s_name, n_name, price,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY price, l_suppkey) AS rk
  FROM (
    SELECT l_partkey, l_suppkey, round(min(l_extendedprice), 2) AS price
    FROM lineitem GROUP BY l_partkey, l_suppkey) o
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  JOIN part     ON l_partkey = p_partkey
  WHERE r_name = 'EUROPE' AND p_size <= 5
) WHERE rk = 1
"""


# ---------------------------------------------------------------------------
# q8: national market share within a region
# ---------------------------------------------------------------------------
def q8_market_share(spark, sf):
    """NATION_5's share of AMERICA-customer ECONOMY-part revenue per
    order year.  Conditional-aggregate form: one pass, no self-join."""
    li = T(spark, sf, "lineitem")
    orders = T(spark, sf, "orders")
    cust = T(spark, sf, "customer")
    part = T(spark, sf, "part").filter("p_type = 'ECONOMY'")
    supp = T(spark, sf, "supplier")
    nat = T(spark, sf, "nation")
    reg = T(spark, sf, "region").filter("r_name = 'AMERICA'")
    cust_dim = F.broadcast(
        cust.join(nat, cust.c_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .select("c_custkey")
    )
    supp_dim = F.broadcast(
        supp.join(
            nat.withColumnRenamed("n_name", "supp_nation"),
            supp.s_nationkey == F.col("n_nationkey"),
        ).select("s_suppkey", "supp_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_dim, orders.o_custkey == cust_dim.c_custkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(supp_dim, li.l_suppkey == supp_dim.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.expr(
                exact_money_sum(
                    f"CASE WHEN supp_nation = 'NATION_5' THEN {REV} ELSE 0 END"
                )
            ).alias("nation_rev"),
            F.expr(exact_money_sum(REV)).alias("total_rev"),
        )
        .withColumn(
            "mkt_share", F.round(F.col("nation_rev") / F.col("total_rev"), 6)
        )
    )


ORACLE_Q8 = f"""
SELECT o_year,
       {exact_money_sum("CASE WHEN supp_nation = 'NATION_5' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")} AS nation_rev,
       {exact_money_sum("l_extendedprice * (1 - l_discount)")} AS total_rev,
       round(({exact_money_sum("CASE WHEN supp_nation = 'NATION_5' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")})
             / ({exact_money_sum("l_extendedprice * (1 - l_discount)")}), 6) AS mkt_share
FROM (
  SELECT l_extendedprice, l_discount, year(o_orderdate) AS o_year,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region   ON cn.n_regionkey = r_regionkey
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
) GROUP BY o_year
"""


# ---------------------------------------------------------------------------
# q9 (adapted): product-type profit by nation × year
# ---------------------------------------------------------------------------
def q9_product_profit(spark, sf):
    """Profit (revenue − 50 % of retail-price cost proxy) for widget
    parts, by supplier nation and order year.  partsupp's supplycost is
    replaced by p_retailprice/2 (reference shape: 6-way join + 2-key
    agg).  Dims broadcast; lineitem shuffles once for the final agg."""
    li = T(spark, sf, "lineitem")
    orders = T(spark, sf, "orders")
    part = T(spark, sf, "part").filter("p_name LIKE '%widget%'")
    supp = T(spark, sf, "supplier")
    nat = T(spark, sf, "nation")
    supp_dim = F.broadcast(
        supp.join(nat, supp.s_nationkey == nat.n_nationkey).select(
            "s_suppkey", "n_name"
        )
    )
    amount = (
        f"{REV} - 0.5 * p_retailprice * l_quantity"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(supp_dim, li.l_suppkey == supp_dim.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.expr(exact_money_sum(amount)).alias("sum_profit"))
    )


ORACLE_Q9 = f"""
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       {exact_money_sum("l_extendedprice * (1 - l_discount) - 0.5 * p_retailprice * l_quantity")} AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
"""


# ---------------------------------------------------------------------------
# q11 (adapted): important parts by traded value vs global threshold
# ---------------------------------------------------------------------------
def q11_important_parts(spark, sf):
    """Parts whose NATION_3-supplied traded value exceeds 0.1 % of the
    global NATION_3 value.  The threshold is a 1-row aggregate joined by
    broadcast cross-join — no driver collect; comparison happens on
    integer cents so both engines agree exactly."""
    li = T(spark, sf, "lineitem")
    supp = T(spark, sf, "supplier")
    nat = T(spark, sf, "nation").filter("n_name = 'NATION_3'")
    supp_dim = F.broadcast(
        supp.join(nat, supp.s_nationkey == nat.n_nationkey).select("s_suppkey")
    )
    cents = (
        "sum(cast(round(l_extendedprice * l_quantity * 100, 0)"
        " as decimal(38,0)))"
    )
    per_part = (
        li.join(supp_dim, li.l_suppkey == supp_dim.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.expr(cents).alias("cents"))
    )
    total = per_part.agg(F.expr("sum(cents)").alias("total_cents"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter("cents * 1000 > total_cents")
        .select(
            "l_partkey",
            F.round(F.col("cents").cast("double") / 100.0, 2).alias(
                "part_value"
            ),
        )
    )


ORACLE_Q11 = """
WITH per_part AS (
  SELECT l_partkey,
         sum(cast(round(l_extendedprice * l_quantity * 100, 0) as decimal(38,0))) AS cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey)
SELECT l_partkey, round(cast(cents as double) / 100.0, 2) AS part_value
FROM per_part
WHERE cents * 1000 > (SELECT sum(cents) FROM per_part)
"""


# ---------------------------------------------------------------------------
# q12 (adapted): shipping-delay buckets × order priority
# ---------------------------------------------------------------------------
def q12_ship_lateness(spark, sf):
    """1997 shipments bucketed by order→ship delay; urgent vs normal
    line counts per bucket (Q12's conditional-count shape with derived
    buckets instead of shipmode)."""
    li = T(spark, sf, "lineitem").filter(
        "l_shipdate >= date'1997-01-01' AND l_shipdate < date'1998-01-01'"
    )
    orders = T(spark, sf, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay <= 30, "fast")
        .when(delay <= 90, "medium")
        .otherwise("slow")
    )
    urgent = "o_orderpriority IN ('1-URGENT', '2-HIGH')"
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.count(F.when(F.expr(urgent), 1)).alias("high_line_count"),
            F.count(F.when(~F.expr(urgent), 1)).alias("low_line_count"),
        )
    )


ORACLE_Q12 = """
SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) <= 30 THEN 'fast'
            WHEN datediff('day', o_orderdate, l_shipdate) <= 90 THEN 'medium'
            ELSE 'slow' END AS delay_bucket,
       count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count,
       count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q15: top supplier(s) by quarterly revenue
# ---------------------------------------------------------------------------
def q15_top_supplier(spark, sf):
    """Suppliers achieving the max Q1-1997 revenue.  The max is a 1-row
    aggregate broadcast back over the per-supplier revenues (original's
    view + scalar subquery); revenue is exact cents so equality is
    bit-stable in both engines."""
    li = T(spark, sf, "lineitem").filter(
        "l_shipdate >= date'1997-01-01' AND l_shipdate < date'1997-04-01'"
    )
    supp = T(spark, sf, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.expr(exact_money_sum(REV)).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter("total_revenue = max_revenue")
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


ORACLE_Q15 = f"""
WITH rev AS (
  SELECT l_suppkey, {exact_money_sum("l_extendedprice * (1 - l_discount)")} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""


# ---------------------------------------------------------------------------
# q16 (adapted): supplier variety per part class
# ---------------------------------------------------------------------------
def q16_part_supplier_cnt(spark, sf):
    """Distinct supplier count per (brand, type, size) from observed
    shipments, excluding Brand#1 / PROMO.  Distinct-agg over a compound
    key — Spark plans a two-phase distinct aggregate (partial dedupe
    map-side before the shuffle)."""
    li = T(spark, sf, "lineitem")
    part = T(spark, sf, "part").filter(
        "p_brand <> 'Brand#1' AND p_type <> 'PROMO'"
        " AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


ORACLE_Q16 = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
GROUP BY p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# q20 (adapted): suppliers shipping excess volume of small parts
# ---------------------------------------------------------------------------
def q20_excess_shipments(spark, sf):
    """Suppliers whose 1997 shipped quantity of a 'small …' part
    exceeds 150 % of the per-part average across suppliers (original's
    availqty > ½·qty threshold shape: agg → window threshold →
    semi-join back to supplier).  The window reuses the groupBy
    shuffle partitioning (both keyed on l_partkey)."""
    li = T(spark, sf, "lineitem").filter(
        "l_shipdate >= date'1997-01-01' AND l_shipdate < date'1998-01-01'"
    )
    part = T(spark, sf, "part").filter("p_name LIKE 'small%'")
    supp = T(spark, sf, "supplier")
    per = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    excess = (
        per.withColumn("avg_qty", F.avg("qty").over(w))
        .filter("qty > 1.5 * avg_qty")
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(excess, supp.s_suppkey == excess.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


ORACLE_Q20 = """
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM (
    SELECT l_partkey, l_suppkey, qty,
           avg(qty) OVER (PARTITION BY l_partkey) AS avg_qty
    FROM (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_partkey, l_suppkey))
  WHERE qty > 1.5 * avg_qty)
"""


# ---------------------------------------------------------------------------
# q21 (adapted): the lone late supplier on multi-supplier orders
# ---------------------------------------------------------------------------
def q21_waiting_suppliers(spark, sf):
    """For finished multi-supplier orders where EXACTLY ONE supplier
    shipped late (> 30 days after order), count such orders per
    supplier.  Q21's EXISTS + NOT-EXISTS pair collapses into one
    grouped pass over the order's lines: distinct suppliers vs distinct
    late suppliers — one shuffle on orderkey instead of two self-joins
    of lineitem."""
    li = T(spark, sf, "lineitem")
    orders = T(spark, sf, "orders").filter("o_orderstatus = 'F'")
    supp = T(spark, sf, "supplier")
    late = "l_shipdate > o_orderdate + INTERVAL 30 DAYS"
    per_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.expr(f"CASE WHEN {late} THEN l_suppkey END"))
            .alias("n_late"),
            F.min(F.expr(f"CASE WHEN {late} THEN l_suppkey END"))
            .alias("late_supp"),
        )
        .filter("n_supp > 1 AND n_late = 1")
    )
    return (
        per_order.groupBy("late_supp")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(supp), F.col("late_supp") == supp.s_suppkey)
        .select("s_name", "numwait")
    )


ORACLE_Q21 = """
SELECT s_name, numwait FROM (
  SELECT late_supp, count(*) AS numwait FROM (
    SELECT l_orderkey,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY
                               THEN l_suppkey END) AS n_late,
           min(CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY
                    THEN l_suppkey END) AS late_supp
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY l_orderkey)
  WHERE n_supp > 1 AND n_late = 1
  GROUP BY late_supp)
JOIN supplier ON late_supp = s_suppkey
"""


# ---------------------------------------------------------------------------
# set-operation analytics: customer retention (INTERSECT / EXCEPT)
# ---------------------------------------------------------------------------
def set_ops_retention(spark, sf):
    """Customers active in 1996 split by 1999 behavior: retained
    (INTERSECT) vs churned (EXCEPT).  Distinct-key set ops — Spark
    plans these as aggregate/anti-join with partial dedupe before the
    shuffle."""
    orders = T(spark, sf, "orders")
    y96 = orders.filter(
        "o_orderdate >= date'1996-01-01' AND o_orderdate < date'1997-01-01'"
    ).select("o_custkey")
    y99 = orders.filter(
        "o_orderdate >= date'1999-01-01' AND o_orderdate < date'2000-01-01'"
    ).select("o_custkey")
    retained = y96.intersect(y99).withColumn("cohort", F.lit("retained"))
    churned = y96.subtract(y99).withColumn("cohort", F.lit("churned"))
    return (
        retained.unionByName(churned)
        .groupBy("cohort")
        .agg(F.count("*").alias("n_customers"))
    )


ORACLE_SETOPS = """
WITH y96 AS (SELECT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'),
     y99 AS (SELECT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1999-01-01' AND o_orderdate < TIMESTAMP '2000-01-01')
SELECT cohort, count(*) AS n_customers FROM (
  SELECT o_custkey, 'retained' AS cohort FROM (SELECT o_custkey FROM y96 INTERSECT SELECT o_custkey FROM y99)
  UNION ALL
  SELECT o_custkey, 'churned' AS cohort FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y99)
) GROUP BY cohort
"""


# ---------------------------------------------------------------------------
# window analytics: account-balance deciles
# ---------------------------------------------------------------------------
def ntile_custbal_deciles(spark, sf):
    """Customer account-balance deciles with per-decile stats, via the
    range-partitioned two-phase distributed_ntile (exact bucket
    offsets from a broadcast triangular join + per-bucket windows) —
    NO partition-less Window, so the plan survives a 100× customer
    dimension (r6 watch item).  Cents (round(bal·100), exact for
    2-decimal balances) is the monotone integer bucket key; the
    within-bucket window still orders on the raw (c_acctbal,
    c_custkey), so the assignment is identical to a global ntile."""
    from faconne_spark.operators.relational import distributed_ntile

    cust = T(spark, sf, "customer").withColumn(
        "__cents", F.expr("cast(round(c_acctbal * 100) as bigint)")
    )
    tiled = distributed_ntile(
        cust, "__cents", ("c_acctbal", "c_custkey"), 10, tile_col="decile"
    )
    return (
        tiled.groupBy("decile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        )
    )


ORACLE_NTILE = """
SELECT decile, count(*) AS n,
       round(min(c_acctbal), 2) AS min_bal,
       round(max(c_acctbal), 2) AS max_bal,
       round(avg(c_acctbal), 4) AS avg_bal
FROM (SELECT c_acctbal, ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
      FROM customer)
GROUP BY decile
"""


# ---------------------------------------------------------------------------
# exact percentiles: order-value distribution per priority
# ---------------------------------------------------------------------------
def percentile_order_value(spark, sf):
    """Median / p90 / p99 of order value per priority.  Exact
    percentile (both engines interpolate identically: linear on sorted
    doubles).  At 100 TB you'd swap in approx_percentile with a
    documented error bound; exact is kept here because the oracle gate
    demands bit-equality."""
    orders = T(spark, sf, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
        F.count("*").alias("n_orders"),
    )


ORACLE_PCTL = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 4)  AS p50,
       round(quantile_cont(o_totalprice, 0.9), 4)  AS p90,
       round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
       count(*) AS n_orders
FROM orders GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# grouping sets: multi-level order stats in one pass
# ---------------------------------------------------------------------------
def grouping_sets_orders(spark, sf):
    """GROUPING SETS (priority, status), (priority), () — three
    aggregation levels sharing one scan + one shuffle (Spark expands to
    a single Expand+Aggregate; no multi-pass union)."""
    orders = T(spark, sf, "orders")
    return (
        orders.groupingSets(
            [
                [F.col("o_orderpriority"), F.col("o_orderstatus")],
                [F.col("o_orderpriority")],
                [],
            ],
            F.col("o_orderpriority"),
            F.col("o_orderstatus"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.expr(exact_money_sum("o_totalprice", 2)).alias("total_value"),
        )
    )


ORACLE_GSETS = f"""
SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
       {exact_money_sum("o_totalprice", 2)} AS total_value
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
"""


# ---------------------------------------------------------------------------
# event funnel: ordered view → click → purchase per user
# ---------------------------------------------------------------------------
def events_funnel(spark, sf):
    """Funnel completion: users whose first view precedes their first
    click precedes their first purchase.  One grouped pass computing
    conditional min-timestamps — no per-step self-joins (the naive
    3-way join shape would shuffle events three times)."""
    ev = T(spark, sf, "events")
    first = lambda t: F.min(  # noqa: E731
        F.when(F.col("event_type") == t, F.col("ts"))
    )
    per_user = ev.groupBy("user_id").agg(
        first("view").alias("t_view"),
        first("click").alias("t_click"),
        first("purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count(F.when(F.col("t_view").isNotNull(), 1)).alias("viewed"),
        F.count(
            F.when(F.col("t_click") > F.col("t_view"), 1)
        ).alias("clicked_after_view"),
        F.count(
            F.when(
                (F.col("t_click") > F.col("t_view"))
                & (F.col("t_purchase") > F.col("t_click")),
                1,
            )
        ).alias("full_funnel"),
    )


ORACLE_FUNNEL = """
SELECT count(*) AS n_users,
       count(CASE WHEN t_view IS NOT NULL THEN 1 END) AS viewed,
       count(CASE WHEN t_click > t_view THEN 1 END) AS clicked_after_view,
       count(CASE WHEN t_click > t_view AND t_purchase > t_click THEN 1 END) AS full_funnel
FROM (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id)
"""


QUERIES = {
    "tpch_q2_min_cost_supp": q2_min_cost_supp,
    "tpch_q8_market_share": q8_market_share,
    "tpch_q9_product_profit": q9_product_profit,
    "tpch_q11_important_parts": q11_important_parts,
    "tpch_q12_ship_lateness": q12_ship_lateness,
    "tpch_q15_top_supplier": q15_top_supplier,
    "tpch_q16_part_supplier_cnt": q16_part_supplier_cnt,
    "tpch_q20_excess_shipments": q20_excess_shipments,
    "tpch_q21_waiting_suppliers": q21_waiting_suppliers,
    "set_ops_retention": set_ops_retention,
    "ntile_custbal_deciles": ntile_custbal_deciles,
    "percentile_order_value": percentile_order_value,
    "grouping_sets_orders": grouping_sets_orders,
    "events_funnel": events_funnel,
}

ORACLES = {
    "tpch_q2_min_cost_supp": ORACLE_Q2,
    "tpch_q8_market_share": ORACLE_Q8,
    "tpch_q9_product_profit": ORACLE_Q9,
    "tpch_q11_important_parts": ORACLE_Q11,
    "tpch_q12_ship_lateness": ORACLE_Q12,
    "tpch_q15_top_supplier": ORACLE_Q15,
    "tpch_q16_part_supplier_cnt": ORACLE_Q16,
    "tpch_q20_excess_shipments": ORACLE_Q20,
    "tpch_q21_waiting_suppliers": ORACLE_Q21,
    "set_ops_retention": ORACLE_SETOPS,
    "ntile_custbal_deciles": ORACLE_NTILE,
    "percentile_order_value": ORACLE_PCTL,
    "grouping_sets_orders": ORACLE_GSETS,
    "events_funnel": ORACLE_FUNNEL,
}


def events_retention_cohorts(spark, sf):
    """Weekly cohort-retention matrix: users grouped by first-activity
    week; for each (cohort_week, weeks-since-cohort) the count of still
    active users.  Two shuffles total: the per-user min(ts) aggregate
    (map-side combined) broadcast back onto the distinct user-week
    activity relation — the standard cohort formulation with no
    self-join of the event log."""
    ev = T(spark, sf, "events").select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    )
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = ev.distinct()
    return (
        active.join(F.broadcast(first), "user_id")
        .groupBy(
            F.col("cohort_week"),
            ((F.unix_timestamp("week") - F.unix_timestamp("cohort_week"))
             / (7 * 24 * 3600)).cast("int").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


ORACLE_RETENTION = """
WITH ev AS (
  SELECT user_id, date_trunc('week', ts)::TIMESTAMP AS week FROM events),
first AS (
  SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id),
active AS (SELECT DISTINCT user_id, week FROM ev)
SELECT cohort_week,
       (date_diff('day', cohort_week, week) / 7)::INTEGER AS week_offset,
       count(DISTINCT user_id)::BIGINT AS n_active
FROM active JOIN first USING (user_id)
GROUP BY 1, 2
"""


def sliding_window_counts(spark, sf):
    """Sliding-window event counts (1 h window, 30 min slide): each
    event lands in two overlapping windows — the smoothing shape
    dashboards use.  Spark's window() generates both assignments
    inline (an Expand, no self-join); batch-equivalent of the
    streaming formulation."""
    ev = T(spark, sf, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )


ORACLE_SLIDING = """
WITH assigned AS (
  SELECT event_type, value,
         unnest([time_bucket(INTERVAL 30 minutes, ts),
                 time_bucket(INTERVAL 30 minutes, ts) - INTERVAL 30 minutes])
           AS window_start
  FROM events)
SELECT window_start, event_type, count(*)::BIGINT AS n_events,
       round(sum(value), 6) AS sum_value
FROM assigned GROUP BY 1, 2
"""

QUERIES.update(
    {
        "events_retention_cohorts": events_retention_cohorts,
        "sliding_window_counts": sliding_window_counts,
    }
)
ORACLES.update(
    {
        "events_retention_cohorts": ORACLE_RETENTION,
        "sliding_window_counts": ORACLE_SLIDING,
    }
)


def events_window_zscore(spark, sf):
    """Window-count anomaly detection: hourly counts per event_type,
    z-scored against that type's own mean/stddev of hourly counts;
    |z| > 2 flags the window.  Two small aggregations — the per-type
    stats relation is types-sized and broadcasts back onto the window
    counts; population stddev (stddev_pop) is exact and identical in
    both engines.  Batch complement of the streaming CUSUM detector."""
    ev = T(spark, sf, "events")
    counts = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.count("*").alias("n"))
    stats = counts.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_pop("n").alias("sigma")
    )
    return (
        counts.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            F.col("hour").alias("window_start"),
            "n",
            F.expr(
                "round(if(sigma = 0, 0.0, (n - mu) / sigma), 6)"
            ).alias("zscore"),
            F.expr(
                "if(sigma = 0, false, abs((n - mu) / sigma) > 2)"
            ).alias("anomalous"),
        )
    )


ORACLE_ZSCORE = """
WITH counts AS (
  SELECT date_trunc('hour', ts)::TIMESTAMP AS hour, event_type,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2),
stats AS (
  SELECT event_type, avg(n) AS mu, stddev_pop(n) AS sigma
  FROM counts GROUP BY event_type)
SELECT event_type, hour AS window_start, n,
       round(CASE WHEN sigma = 0 THEN 0.0 ELSE (n - mu) / sigma END, 6)
         AS zscore,
       CASE WHEN sigma = 0 THEN false ELSE abs((n - mu) / sigma) > 2 END
         AS anomalous
FROM counts JOIN stats USING (event_type)
"""

QUERIES["events_window_zscore"] = events_window_zscore
ORACLES["events_window_zscore"] = ORACLE_ZSCORE


def basket_part_pairs(spark, sf):
    """Market-basket affinity: part pairs co-occurring in an order,
    with support counts and lift.  Pair generation self-joins lineitem
    ON ORDERKEY with partkey ordering — bounded by order size (~7
    lines), never corpus×corpus; the per-part totals are a parts-sized
    relation broadcast back for the lift denominator.  Top pairs only
    (support ≥ 3) to keep the result gate-friendly."""
    li = T(spark, sf, "lineitem").select("l_orderkey", "l_partkey").distinct()
    n_orders = T(spark, sf, "orders").agg(
        F.countDistinct("o_orderkey").alias("n_orders")
    )
    item = li.groupBy("l_partkey").agg(F.count("*").alias("item_n"))
    pairs = (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("pair_n"))
        .filter(F.col("pair_n") >= 3)
    )
    ia = F.broadcast(item.select(F.col("l_partkey").alias("part_a"),
                                 F.col("item_n").alias("n_a")))
    ib = F.broadcast(item.select(F.col("l_partkey").alias("part_b"),
                                 F.col("item_n").alias("n_b")))
    return (
        pairs.join(ia, "part_a").join(ib, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a", "part_b", "pair_n",
            F.expr(
                "round(cast(pair_n as double) * cast(n_orders as double)"
                " / (cast(n_a as double) * cast(n_b as double)), 6)"
            ).alias("lift"),
        )
    )


ORACLE_BASKET = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT count(DISTINCT o_orderkey)::BIGINT AS n_orders FROM orders),
item AS (SELECT l_partkey, count(*)::BIGINT AS item_n FROM li GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         count(*)::BIGINT AS pair_n
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 3)
SELECT part_a, part_b, pair_n,
       round(pair_n::DOUBLE * n_orders::DOUBLE
             / (ia.item_n::DOUBLE * ib.item_n::DOUBLE), 6) AS lift
FROM pairs
JOIN item ia ON ia.l_partkey = part_a
JOIN item ib ON ib.l_partkey = part_b
CROSS JOIN n
"""

QUERIES["basket_part_pairs"] = basket_part_pairs
ORACLES["basket_part_pairs"] = ORACLE_BASKET


def events_markov_transitions(spark, sf):
    """First-order event-type transition matrix: per user, consecutive
    event pairs (ordered by time, event_id tie-break for total order),
    aggregated to transition counts and row-normalized probabilities.
    One shuffle on user_id for the lead window; the normalizing window
    runs over the types×types matrix only."""
    from pyspark.sql import Window

    ev = T(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
    )
    wn = Window.partitionBy("from_type")
    return pairs.withColumn(
        "p", F.round(F.col("n") / F.sum("n").over(wn), 6)
    )


ORACLE_MARKOV = """
WITH pairs AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events),
counts AS (
  SELECT from_type, to_type, count(*)::BIGINT AS n
  FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2)
SELECT from_type, to_type, n,
       round(n::DOUBLE / sum(n) OVER (PARTITION BY from_type), 6) AS p
FROM counts
"""


def user_rfm_segments(spark, sf):
    """RFM segmentation: per-user recency (days since last order),
    frequency (order count), monetary (total spend) → quartile codes →
    segment counts with averages.

    Scale design — NO global sort: quartile codes are value-based, not
    rank-based.  Boundaries are exact Type-7 quantiles
    (``F.percentile`` ⇆ DuckDB ``quantile_cont``) computed by one
    map-side-combined aggregation whose state is O(distinct metric
    values) — recency and frequency are small integers, and monetary is
    rounded to whole dollars FOR THE BOUNDARY CALC ONLY, bounding its
    distinct count at any corpus size.  The single-row cuts relation is
    broadcast and codes are comparison assignments, so the whole query
    is: one orders shuffle (per-user rollup) + one segment-rollup
    shuffle.  Integer-valued inputs make the interpolated boundaries
    bit-exact across engines (h=(n-1)p has an exact binary fraction, so
    lower + f·(upper−lower) is exact in both).  Ties share a quartile —
    standard value-based RFM semantics, deterministic everywhere."""
    orders = T(spark, sf, "orders")
    maxd = orders.agg(F.max("o_orderdate").alias("maxd"))
    per_user = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("frequency"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
        .crossJoin(F.broadcast(maxd))
        .select(
            "o_custkey",
            F.datediff("maxd", "last_order").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    # both the cuts agg and the coded assignment consume per_user;
    # persist so the orders scan+rollup shuffle runs once, not twice
    # (O(#users) rows — far smaller than orders; spills if not resident)
    from faconne_spark.operators.dedup import _persist_sig

    per_user = _persist_sig(per_user, orders)
    pcts = F.lit([0.25, 0.5, 0.75])
    cuts = per_user.agg(
        F.percentile(F.col("recency_days").cast("double"), pcts).alias("r_q"),
        F.percentile(F.col("frequency").cast("double"), pcts).alias("f_q"),
        F.percentile(F.round("monetary", 0), pcts).alias("m_q"),
    )

    def asc_code(v, q):  # Q1 = smallest values (best recency)
        return (
            F.lit(1)
            + (F.col(v) > F.element_at(q, 1)).cast("int")
            + (F.col(v) > F.element_at(q, 2)).cast("int")
            + (F.col(v) > F.element_at(q, 3)).cast("int")
        )

    def desc_code(v, q):  # Q1 = largest values (best frequency/spend)
        return (
            F.lit(1)
            + (F.col(v) < F.element_at(q, 3)).cast("int")
            + (F.col(v) < F.element_at(q, 2)).cast("int")
            + (F.col(v) < F.element_at(q, 1)).cast("int")
        )

    coded = per_user.crossJoin(F.broadcast(cuts)).select(
        "o_custkey", "recency_days", "monetary",
        asc_code("recency_days", F.col("r_q")).alias("r_quartile"),
        desc_code("frequency", F.col("f_q")).alias("f_quartile"),
        desc_code("monetary", F.col("m_q")).alias("m_quartile"),
    )
    return coded.groupBy("r_quartile", "f_quartile", "m_quartile").agg(
        F.count("*").alias("n_users"),
        F.round(F.avg("monetary"), 6).alias("avg_monetary"),
        F.round(F.avg("recency_days"), 6).alias("avg_recency"),
    )


ORACLE_RFM = """
WITH maxd AS (SELECT max(o_orderdate) AS maxd FROM orders),
per_user AS (
  SELECT o_custkey,
         date_diff('day', max(o_orderdate), (SELECT maxd FROM maxd))::INTEGER
           AS recency_days,
         count(*)::BIGINT AS frequency,
         round(sum(o_totalprice), 2) AS monetary
  FROM orders GROUP BY o_custkey),
cuts AS (
  SELECT quantile_cont(recency_days::DOUBLE, [0.25, 0.5, 0.75]) AS r_q,
         quantile_cont(frequency::DOUBLE, [0.25, 0.5, 0.75]) AS f_q,
         quantile_cont(round(monetary, 0), [0.25, 0.5, 0.75]) AS m_q
  FROM per_user),
coded AS (
  SELECT o_custkey, recency_days, monetary,
         1 + (recency_days > r_q[1])::INT + (recency_days > r_q[2])::INT
           + (recency_days > r_q[3])::INT AS r_quartile,
         1 + (frequency < f_q[3])::INT + (frequency < f_q[2])::INT
           + (frequency < f_q[1])::INT AS f_quartile,
         1 + (monetary < m_q[3])::INT + (monetary < m_q[2])::INT
           + (monetary < m_q[1])::INT AS m_quartile
  FROM per_user, cuts)
SELECT r_quartile, f_quartile, m_quartile, count(*)::BIGINT AS n_users,
       round(avg(monetary), 6) AS avg_monetary,
       round(avg(recency_days), 6) AS avg_recency
FROM coded GROUP BY 1, 2, 3
"""

QUERIES.update(
    {
        "events_markov_transitions": events_markov_transitions,
        "user_rfm_segments": user_rfm_segments,
    }
)
ORACLES.update(
    {
        "events_markov_transitions": ORACLE_MARKOV,
        "user_rfm_segments": ORACLE_RFM,
    }
)


def orders_monthly_yoy(spark, sf):
    """Monthly order volume with month-over-month and year-over-year
    deltas — the trend-decomposition record.  One orders shuffle for
    the month rollup; the lag windows run over the months-sized
    relation."""
    from pyspark.sql import Window

    orders = T(spark, sf, "orders")
    monthly = orders.groupBy(
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
    ).agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )
    w = Window.orderBy("yr", "mo")
    return monthly.select(
        "yr", "mo", "n_orders", "revenue",
        F.round(
            F.col("revenue") - F.lag("revenue", 1).over(w), 2
        ).alias("mom_delta"),
        F.round(
            F.col("revenue") - F.lag("revenue", 12).over(w), 2
        ).alias("yoy_delta"),
    )


ORACLE_MONTHLY_YOY = """
WITH monthly AS (
  SELECT year(o_orderdate)::INTEGER AS yr, month(o_orderdate)::INTEGER AS mo,
         count(*)::BIGINT AS n_orders, round(sum(o_totalprice), 2) AS revenue
  FROM orders GROUP BY 1, 2)
SELECT yr, mo, n_orders, revenue,
       round(revenue - lag(revenue, 1) OVER (ORDER BY yr, mo), 2)
         AS mom_delta,
       round(revenue - lag(revenue, 12) OVER (ORDER BY yr, mo), 2)
         AS yoy_delta
FROM monthly
"""

QUERIES["orders_monthly_yoy"] = orders_monthly_yoy
ORACLES["orders_monthly_yoy"] = ORACLE_MONTHLY_YOY


def part_price_stats(spark, sf):
    """Statistical aggregates per part brand: price/quantity
    correlation and regression slope plus dispersion — exercises the
    corr/regr/stddev family (native partial-aggregable statistics in
    both engines; one lineitem⋈part pass with the part dim broadcast).
    Rounded to 6 dp so partial-aggregation summation order cannot flip
    the comparison."""
    li = T(spark, sf, "lineitem")
    part = T(spark, sf, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "qty_price_corr"
            ),
            F.round(
                F.expr("regr_slope(l_extendedprice, l_quantity)"), 6
            ).alias("price_per_qty"),
            F.round(F.stddev_pop("l_extendedprice"), 6).alias("price_stddev"),
            F.round(F.covar_pop("l_quantity", "l_discount"), 6).alias(
                "qty_disc_covar"
            ),
        )
    )


ORACLE_PRICE_STATS = """
SELECT p_brand, count(*)::BIGINT AS n,
       round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
       round(regr_slope(l_extendedprice, l_quantity), 6) AS price_per_qty,
       round(stddev_pop(l_extendedprice), 6) AS price_stddev,
       round(covar_pop(l_quantity, l_discount), 6) AS qty_disc_covar
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""

QUERIES["part_price_stats"] = part_price_stats
ORACLES["part_price_stats"] = ORACLE_PRICE_STATS


def customer_order_reconciliation(spark, sf):
    """FULL OUTER reconciliation between the customer master and order
    rollups — the data-integrity report (customers without orders,
    orphan order keys, matched totals).  Aggregated to one row so the
    gate result is compact; the outer join itself is the exercised
    operator."""
    cust = T(spark, sf, "customer").select("c_custkey")
    per_cust = (
        T(spark, sf, "orders")
        .groupBy(F.col("o_custkey"))
        .agg(F.count("*").alias("n_orders"))
    )
    j = cust.join(
        per_cust, cust.c_custkey == per_cust.o_custkey, "full_outer"
    )
    return j.agg(
        F.count("*").alias("n_rows"),
        F.sum(
            F.expr("if(c_custkey IS NOT NULL AND o_custkey IS NOT NULL, 1, 0)")
        ).alias("matched"),
        F.sum(F.expr("if(o_custkey IS NULL, 1, 0)")).alias(
            "customers_without_orders"
        ),
        F.sum(F.expr("if(c_custkey IS NULL, 1, 0)")).alias(
            "orphan_order_custkeys"
        ),
        F.sum(F.coalesce("n_orders", F.lit(0))).alias("total_orders"),
    )


ORACLE_RECONCILIATION = """
WITH per_cust AS (
  SELECT o_custkey, count(*)::BIGINT AS n_orders FROM orders GROUP BY 1)
SELECT count(*)::BIGINT AS n_rows,
       sum(CASE WHEN c_custkey IS NOT NULL AND o_custkey IS NOT NULL
                THEN 1 ELSE 0 END)::BIGINT AS matched,
       sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT
         AS customers_without_orders,
       sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT
         AS orphan_order_custkeys,
       sum(coalesce(n_orders, 0))::BIGINT AS total_orders
FROM customer FULL OUTER JOIN per_cust ON c_custkey = o_custkey
"""


def sql_api_segment_revenue(spark, sf):
    """The SQL text entry path: the engine's tables registered as temp
    views and queried with a plain ANSI string through spark.sql() —
    identical Catalyst plan to the DataFrame API, proving both faces of
    the engine serve the same operators."""
    T(spark, sf, "customer").createOrReplaceTempView("v_customer")
    T(spark, sf, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT c_mktsegment,
               count(DISTINCT c_custkey) AS n_customers,
               count(o_orderkey) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM v_customer LEFT JOIN v_orders ON c_custkey = o_custkey
        GROUP BY c_mktsegment
        """
    )


ORACLE_SQL_API = """
SELECT c_mktsegment,
       count(DISTINCT c_custkey)::BIGINT AS n_customers,
       count(o_orderkey)::BIGINT AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""

QUERIES.update(
    {
        "customer_order_reconciliation": customer_order_reconciliation,
        "sql_api_segment_revenue": sql_api_segment_revenue,
    }
)
ORACLES.update(
    {
        "customer_order_reconciliation": ORACLE_RECONCILIATION,
        "sql_api_segment_revenue": ORACLE_SQL_API,
    }
)


# -------------------------------------------- join-key skew report

SKEW_TARGETS = [
    ("orders", "o_custkey"),
    ("lineitem", "l_orderkey"),
    ("events", "user_id"),
]
SKEW_TOP = 5


def join_skew_report(spark, sf):
    """Pre-flight skew diagnostics: the top-N heaviest values of each
    production join key with their share of the table — the table you
    read before deciding which joins need salting (S7) or AQE skew
    splitting.  Per key: one map-side-combined count groupBy, then
    top-N via sort-limit, which compiles to TakeOrderedAndProject — a
    per-partition heap + single tiny merge, NOT a global sort, so the
    distinct-key relation is never materialized in one task at any
    scale."""
    parts = []
    for table, key in SKEW_TARGETS:
        tbl = T(spark, sf, table)
        counts = tbl.groupBy(F.col(key).cast("long").alias("key_value")).agg(
            F.count("*").alias("n_rows")
        )
        # total from the tiny per-key relation — a second tbl.agg would
        # re-scan the full table per SKEW_TARGETS entry
        total = counts.agg(F.sum("n_rows").alias("total"))
        top = (
            counts.orderBy(F.col("n_rows").desc(), F.col("key_value"))
            .limit(SKEW_TOP)
            .crossJoin(F.broadcast(total))
            .select(
                F.lit(table).alias("tbl"),
                F.lit(key).alias("join_key"),
                "key_value",
                "n_rows",
                F.expr(
                    "round(cast(n_rows as double) / total, 6)"
                ).alias("share"),
            )
        )
        parts.append(top)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_SKEW_SELECTS = "\nUNION ALL\n".join(
    f"""(SELECT '{t}' AS tbl, '{k}' AS join_key, key_value, n_rows,
       round(n_rows::DOUBLE / (SELECT count(*) FROM {t}), 6) AS share
FROM (SELECT {k}::BIGINT AS key_value, count(*)::BIGINT AS n_rows
      FROM {t} GROUP BY 1)
ORDER BY n_rows DESC, key_value LIMIT {SKEW_TOP})"""
    for t, k in SKEW_TARGETS
)

ORACLE_SKEW = _SKEW_SELECTS

QUERIES["join_skew_report"] = join_skew_report
ORACLES["join_skew_report"] = ORACLE_SKEW


# ------------------------------------------- last-touch attribution

ATTR_TRIGGERS = ("click", "view", "signup")
ATTR_WINDOW_HOURS = 24
ATTR_WINDOW_US = ATTR_WINDOW_HOURS * 3600 * 1_000_000  # precomputed: the
# inline product overflows INT32 constant-folding in BOTH engines


def events_attribution(spark, sf):
    """Last-touch attribution: credit each purchase to the same user's
    most recent trigger event (click/view/signup) within the lookback
    window, then roll up conversions and mean time-to-convert per
    trigger type — the marketing-attribution table every event
    pipeline ships.

    Scale design: ONE user-partitioned ordered window carries the last
    trigger (ts, type) forward via last_value(... IGNORE NULLS) — no
    self-join of the event stream against itself, so the cost is one
    shuffle on user_id plus the tiny rollup.  Purchases with no
    in-window trigger credit 'none' (kept: attribution tables must
    account for every conversion).  Lag is integer seconds, so the
    rollup means are engine-exact integer sums."""
    from pyspark.sql import Window

    ev = T(spark, sf, "events").select("user_id", "event_id", "ts", "event_type")
    trig = ", ".join(f"'{t}'" for t in ATTR_TRIGGERS)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_trig = F.last(
        F.expr(
            f"CASE WHEN event_type IN ({trig})"
            " THEN struct(ts AS t_ts, event_type AS t_type) END"
        ),
        ignorenulls=True,
    ).over(w)
    in_window = (
        "_lt IS NOT NULL AND unix_micros(ts) - unix_micros(_lt.t_ts)"
        f" <= {ATTR_WINDOW_US}L"
    )
    conv = (
        ev.withColumn("_lt", last_trig)
        .filter("event_type = 'purchase'")
        .select(
            F.expr(
                f"CASE WHEN {in_window} THEN _lt.t_type ELSE 'none' END"
            ).alias("trigger_type"),
            # exact integer microseconds: sub-second components survive,
            # and the rollup mean is a single division of equal integers
            F.expr(
                f"CASE WHEN {in_window}"
                " THEN unix_micros(ts) - unix_micros(_lt.t_ts) END"
            ).alias("lag_us"),
        )
    )
    return conv.groupBy("trigger_type").agg(
        F.count("*").alias("n_conversions"),
        F.round(
            F.expr("cast(sum(lag_us) as double) / count(lag_us) / 1000000"),
            6,
        ).alias("mean_lag_s"),
    )


_TRIG_DUCK = ", ".join(f"'{t}'" for t in ATTR_TRIGGERS)

ORACLE_ATTRIBUTION = f"""
WITH marked AS (
  SELECT user_id, event_id, ts, event_type,
         last_value(CASE WHEN event_type IN ({_TRIG_DUCK})
                         THEN struct_pack(t_ts := ts, t_type := event_type)
                    END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
  FROM events),
conv AS (
  SELECT CASE WHEN lt IS NOT NULL AND
                   epoch_us(ts::TIMESTAMP) - epoch_us(lt.t_ts::TIMESTAMP)
                   <= {ATTR_WINDOW_US}
              THEN lt.t_type ELSE 'none' END AS trigger_type,
         CASE WHEN lt IS NOT NULL AND
                   epoch_us(ts::TIMESTAMP) - epoch_us(lt.t_ts::TIMESTAMP)
                   <= {ATTR_WINDOW_US}
              THEN epoch_us(ts::TIMESTAMP) - epoch_us(lt.t_ts::TIMESTAMP)
         END AS lag_us
  FROM marked WHERE event_type = 'purchase')
SELECT trigger_type, count(*)::BIGINT AS n_conversions,
       round(sum(lag_us)::DOUBLE / count(lag_us) / 1000000, 6) AS mean_lag_s
FROM conv GROUP BY trigger_type
"""

QUERIES["events_attribution"] = events_attribution
ORACLES["events_attribution"] = ORACLE_ATTRIBUTION


def customer_ltv_cohorts(spark, sf):
    """Cohort lifetime-value table: customers bucketed by first-order
    month, revenue tracked by whole months since that first order — the
    retention/LTV curve read off acquisition cohorts.

    First-order dates come from ONE partial-aggregated groupBy (no
    window over order history); the join back is custkey⇆custkey
    (co-partitioned with the rollup's shuffle), and the final rollup
    groups on the bounded (cohort, age) grid. Revenue uses the exact
    fixed-point sum so both engines agree on the cent."""
    orders = T(spark, sf, "orders")
    first = orders.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_dt")
    )
    mo = "(year({0}) * 12 + month({0}))"
    return (
        orders.join(first, "o_custkey")
        .withColumn("cohort", F.expr("date_format(first_dt, 'yyyy-MM')"))
        .withColumn(
            "age_months",
            F.expr(
                f"{mo.format('o_orderdate')} - {mo.format('first_dt')}"
            ),
        )
        .groupBy("cohort", "age_months")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
            F.expr(exact_money_sum("o_totalprice", 2)).alias("revenue"),
        )
    )


ORACLE_LTV_COHORTS = f"""
WITH first AS (
  SELECT o_custkey, min(o_orderdate) AS first_dt FROM orders GROUP BY 1)
SELECT strftime(first_dt, '%Y-%m') AS cohort,
       ((year(o_orderdate) * 12 + month(o_orderdate))
        - (year(first_dt) * 12 + month(first_dt)))::INTEGER AS age_months,
       count(DISTINCT o.o_custkey)::BIGINT AS n_customers,
       count(*)::BIGINT AS n_orders,
       {exact_money_sum('o_totalprice', 2)} AS revenue
FROM orders o JOIN first USING (o_custkey)
GROUP BY 1, 2
"""

QUERIES["customer_ltv_cohorts"] = customer_ltv_cohorts
ORACLES["customer_ltv_cohorts"] = ORACLE_LTV_COHORTS
