"""TPC-H-style analytic queries adapted to the driver schema.

DataFrame-API formulations with explicit scale choices: dimension sides
broadcast, aggregations partial-aggregate map-side, top-N via
window-rank on rounded measures (so float summation order can't flip
the oracle comparison), semi-joins for EXISTS.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from faconne_spark.functions import exact_money_sum
from faconne_spark.operators.relational import asof_join, range_join, top_k_per_group
from faconne_spark.queries import T

REV = "l_extendedprice * (1 - l_discount)"


def q1_pricing(spark, sf):
    """TPC-H Q1: scan-filter + 8-aggregate groupBy, full pushdown."""
    li = T(spark, sf, "lineitem").filter("l_shipdate <= date'1998-09-02'")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.expr(exact_money_sum(REV)).alias("sum_disc_price"),
            F.expr(
                exact_money_sum(
                    "l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6
                )
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


ORACLE_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)      AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(cast(sum(cast(round((l_extendedprice * (1 - l_discount)) * 10000, 0) as decimal(38,0))) as double) / 100.0, 0) / 100.0 AS sum_disc_price,
       round(cast(sum(cast(round((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 1000000, 0) as decimal(38,0))) as double) / 10000.0, 0) / 100.0 AS sum_charge,
       round(avg(l_quantity), 6)      AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6)      AS avg_disc,
       count(*)                       AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping(spark, sf):
    """TPC-H Q3: 3-way join + agg + top-N."""
    cust = T(spark, sf, "customer").filter("c_mktsegment = 'BUILDING'")
    orders = T(spark, sf, "orders").filter("o_orderdate < date'1998-01-01'")
    li = T(spark, sf, "lineitem").filter("l_shipdate > date'1997-01-01'")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.expr(exact_money_sum(REV)).alias("revenue")
        )
    )
    return top_k_per_group(
        joined.withColumn("__g", F.lit(1)),
        ["__g"],
        [F.col("revenue").desc(), F.col("l_orderkey")],
        10,
    ).drop("__g")


ORACLE_Q3 = """
SELECT l_orderkey, o_orderdate, revenue FROM (
  SELECT l_orderkey, o_orderdate,
         round(cast(sum(cast(round((l_extendedprice * (1 - l_discount)) * 10000, 0) as decimal(38,0))) as double) / 100.0, 0) / 100.0 AS revenue
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1998-01-01'
    AND l_shipdate  > TIMESTAMP '1997-01-01'
  GROUP BY l_orderkey, o_orderdate
) ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


def q4_priority(spark, sf):
    """TPC-H Q4: EXISTS as left-semi join + agg."""
    orders = T(spark, sf, "orders")
    li = T(spark, sf, "lineitem")
    # EXISTS → left_semi: only order keys shuffle, not lineitem payload
    qualifying = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        qualifying.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


ORACLE_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


def q5_local_volume(spark, sf):
    """TPC-H Q5: 5-way join, dims broadcast."""
    region = T(spark, sf, "region").filter("r_name = 'ASIA'")
    nation = T(spark, sf, "nation")
    cust = T(spark, sf, "customer")
    orders = T(spark, sf, "orders")
    li = T(spark, sf, "lineitem")
    supp = T(spark, sf, "supplier")
    dims = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter("s_nationkey = c_nationkey")
        .join(dims, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.expr(exact_money_sum(REV)).alias("revenue")
        )
    )


ORACLE_Q5 = """
SELECT n_name, round(cast(sum(cast(round((l_extendedprice * (1 - l_discount)) * 10000, 0) as decimal(38,0))) as double) / 100.0, 0) / 100.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND s_nationkey = c_nationkey
GROUP BY n_name
"""


def q6_forecast(spark, sf):
    """TPC-H Q6: pure scan-filter aggregate."""
    li = T(spark, sf, "lineitem")
    return li.filter(
        "l_shipdate >= date'1996-01-01' AND l_shipdate < date'1997-01-01'"
        " AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
    ).agg(
        F.expr(exact_money_sum("l_extendedprice * l_discount")).alias(
            "revenue"
        )
    )


ORACLE_Q6 = """
SELECT round(cast(sum(cast(round((l_extendedprice * l_discount) * 10000, 0) as decimal(38,0))) as double) / 100.0, 0) / 100.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def q10_returns(spark, sf):
    """TPC-H Q10: returns revenue join + agg + top-N."""
    cust = T(spark, sf, "customer")
    orders = T(spark, sf, "orders")
    li = T(spark, sf, "lineitem").filter("l_returnflag = 'R'")
    nation = F.broadcast(T(spark, sf, "nation"))
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.expr(exact_money_sum(REV)).alias("revenue")
        )
    )
    return top_k_per_group(
        agg.withColumn("__g", F.lit(1)),
        ["__g"],
        [F.col("revenue").desc(), F.col("c_custkey")],
        20,
    ).drop("__g")


ORACLE_Q10 = """
SELECT c_custkey, c_name, n_name, revenue FROM (
  SELECT c_custkey, c_name, n_name,
         round(cast(sum(cast(round((l_extendedprice * (1 - l_discount)) * 10000, 0) as decimal(38,0))) as double) / 100.0, 0) / 100.0 AS revenue
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
  GROUP BY c_custkey, c_name, n_name
) ORDER BY revenue DESC, c_custkey LIMIT 20
"""


def q14_promo(spark, sf):
    """TPC-H Q14: conditional promo-share aggregate over a broadcast join."""
    li = T(spark, sf, "lineitem").filter(
        "l_shipdate >= date'1996-01-01' AND l_shipdate < date'1996-07-01'"
    )
    part = F.broadcast(T(spark, sf, "part"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.expr(
                    "100.0 * sum(if(p_type = 'PROMO',"
                    " l_extendedprice * (1 - l_discount), 0.0))"
                    " / sum(l_extendedprice * (1 - l_discount))"
                ),
                6,
            ).alias("promo_revenue_pct")
        )
    )


ORACLE_Q14 = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                       THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
       / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-07-01'
"""


def q18_large_orders(spark, sf):
    """TPC-H Q18: HAVING-style agg filter joined back to orders."""
    li = T(spark, sf, "lineitem")
    orders = T(spark, sf, "orders")
    cust = T(spark, sf, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter("total_qty > 300")
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"), "total_qty",
        )
    )


ORACLE_Q18 = """
SELECT c_custkey, c_name, o_orderkey,
       round(o_totalprice, 2) AS o_totalprice, total_qty
FROM (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300) big
JOIN orders   ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def win_top_orders_per_cust(spark, sf):
    """Window-rank top-3 orders per customer (single shuffle)."""
    orders = T(spark, sf, "orders")
    return top_k_per_group(
        orders.select(
            "o_custkey", "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        ),
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        3,
    )


ORACLE_WIN_TOP = """
SELECT o_custkey, o_orderkey, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY round(o_totalprice, 2) DESC, o_orderkey) rk
  FROM orders) WHERE rk <= 3
"""


def asof_join_events(spark, sf):
    """Per-user as-of join events->latest order (union + last ignorenulls window)."""
    events = T(spark, sf, "events")
    orders = T(spark, sf, "orders")
    # dedupe right side to one row per (key, time) so the as-of pick is
    # well-defined in both engines
    right = (
        orders.groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("odate"),
        )
        .agg(
            F.max("o_orderkey").alias("last_orderkey"),
            F.round(F.expr("max_by(o_totalprice, o_orderkey)"), 2).alias(
                "last_totalprice"
            ),
        )
    )
    left = events.select("event_id", "user_id", "ts", "event_type")
    return asof_join(
        left, right,
        on="user_id", left_time="ts", right_time="odate",
        right_cols=["last_orderkey", "last_totalprice"],
    ).select("event_id", "user_id", "event_type", "last_orderkey", "last_totalprice")


ORACLE_ASOF = """
WITH right_side AS (
  SELECT o_custkey AS user_id, o_orderdate AS odate,
         max(o_orderkey) AS last_orderkey,
         round(arg_max(o_totalprice, o_orderkey), 2) AS last_totalprice
  FROM orders GROUP BY 1, 2)
SELECT event_id, e.user_id AS user_id, event_type, last_orderkey, last_totalprice
FROM events e ASOF LEFT JOIN right_side r
  ON e.user_id = r.user_id AND e.ts >= r.odate
"""


def range_join_events(spark, sf):
    """Time-band range join over user events."""
    events = T(spark, sf, "events")
    e = events.select("user_id", "event_id", "ts")
    pairs = range_join(
        e, e.select(F.col("user_id"), F.col("event_id").alias("event_id2"),
                    F.col("ts").alias("ts2")),
        on="user_id", left_time="ts", right_time="ts2",
        upper_expr="l.ts + interval 10 minutes",
    )
    return (
        pairs.groupBy(F.col("l.user_id").alias("user_id"))
        .agg(F.count("*").alias("n_pairs"))
    )


ORACLE_RANGE_JOIN = """
SELECT a.user_id AS user_id, count(*) AS n_pairs
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
GROUP BY a.user_id
"""


def pivot_events(spark, sf):
    """Two-phase pivot of event-type counts (explicit values list)."""
    events = T(spark, sf, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        events.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )


ORACLE_PIVOT = """
SELECT user_id,
       count(*) FILTER (event_type = 'click')    AS click,
       count(*) FILTER (event_type = 'error')    AS error,
       count(*) FILTER (event_type = 'purchase') AS purchase,
       count(*) FILTER (event_type = 'signup')   AS signup,
       count(*) FILTER (event_type = 'view')     AS view
FROM events GROUP BY user_id
"""


def rollup_orders(spark, sf):
    """ROLLUP multi-level aggregate over orders."""
    orders = T(spark, sf, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


ORACLE_ROLLUP = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def cube_lineitem_volume(spark, sf):
    """CUBE over returnflag x linestatus."""
    li = T(spark, sf, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


ORACLE_CUBE = """
SELECT l_returnflag, l_linestatus, count(*) AS n_lines,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q7_nation_volume(spark, sf):
    """Revenue flow between distinct supplier/customer nations per ship
    year. Both nation sides broadcast; one shuffle for the final agg."""
    li = T(spark, sf, "lineitem")
    orders = T(spark, sf, "orders")
    cust = T(spark, sf, "customer")
    supp = T(spark, sf, "supplier")
    n1 = F.broadcast(
        T(spark, sf, "nation").select(
            F.col("n_nationkey").alias("s_nk"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    n2 = F.broadcast(
        T(spark, sf, "nation").select(
            F.col("n_nationkey").alias("c_nk"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .filter("supp_nation != cust_nation")
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.expr(exact_money_sum(REV)).alias("revenue")
        )
    )


ORACLE_Q7 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       round(cast(sum(cast(round((l_extendedprice * (1 - l_discount)) * 10000, 0) as decimal(38,0))) as double) / 100.0, 0) / 100.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name != n2.n_name
GROUP BY 1, 2, 3
"""


def q13_order_counts(spark, sf):
    """Distribution of orders-per-customer including zero-order
    customers (left join → count of non-null keys → re-group)."""
    cust = T(spark, sf, "customer")
    orders = T(spark, sf, "orders")
    per = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per.groupBy("c_count").agg(F.count("*").alias("custdist"))


ORACLE_Q13 = """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey)
GROUP BY c_count
"""


def q17_small_qty(spark, sf):
    """Revenue from small-quantity lineitems of one brand, threshold =
    0.2 × per-part average quantity (correlated scalar subquery →
    pre-aggregated per-part averages joined back on partkey; both the
    agg and the join shuffle on the same key, so they co-locate)."""
    li = T(spark, sf, "lineitem")
    part = F.broadcast(T(spark, sf, "part").filter("p_brand = 'Brand#1'"))
    thresh = (
        li.groupBy(F.col("l_partkey").alias("t_partkey"))
        .agg(F.round(F.expr("0.2 * avg(l_quantity)"), 6).alias("qty_thresh"))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(thresh, li.l_partkey == thresh.t_partkey)
        .filter("l_quantity < qty_thresh")
        .agg(
            F.round(F.expr("sum(l_extendedprice) / 7.0"), 2).alias(
                "avg_yearly"
            )
        )
    )


ORACLE_Q17 = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (SELECT l_partkey AS t_partkey,
             round(0.2 * avg(l_quantity), 6) AS qty_thresh
      FROM lineitem GROUP BY 1) t ON l_partkey = t_partkey
WHERE p_brand = 'Brand#1' AND l_quantity < qty_thresh
"""


def q19_disjunctive(spark, sf):
    """Disjunctive predicate bundles over part attributes × lineitem
    quantity — exercises OR-pushdown through a broadcast join."""
    li = T(spark, sf, "lineitem")
    part = F.broadcast(T(spark, sf, "part"))
    cond = (
        "(p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15"
        " AND l_quantity BETWEEN 1 AND 11)"
        " OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25"
        " AND l_quantity BETWEEN 10 AND 20)"
        " OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35"
        " AND l_quantity BETWEEN 20 AND 30)"
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.expr(exact_money_sum(REV)).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


ORACLE_Q19 = """
SELECT round(cast(sum(cast(round((l_extendedprice * (1 - l_discount)) * 10000, 0) as decimal(38,0))) as double) / 100.0, 0) / 100.0 AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


def q22_dormant_customers(spark, sf):
    """Wealthy customers with no completed ('F') order: scalar subquery
    (global avg, broadcast 1-row cross join — never a collect) +
    anti-join. The anti-join side is pre-filtered so only 'F' order keys
    shuffle."""
    cust = T(spark, sf, "customer")
    orders = T(spark, sf, "orders").filter("o_orderstatus = 'F'")
    avg_bal = cust.filter("c_acctbal > 0").agg(
        F.round(F.avg("c_acctbal"), 6).alias("avg_bal")
    )
    dormant = cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    )
    return (
        dormant.crossJoin(F.broadcast(avg_bal))
        .filter("c_acctbal > avg_bal")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


ORACLE_Q22 = """
SELECT c_nationkey, count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT round(avg(c_acctbal), 6) FROM customer
                   WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
GROUP BY c_nationkey
"""


def win_running_total(spark, sf):
    """Cumulative revenue per customer over order date — running-frame
    window, single shuffle on the partition key."""
    from pyspark.sql import Window

    orders = T(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


ORACLE_WIN_RUNNING = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS UNBOUNDED PRECEDING), 2) AS running_total
FROM orders
"""


def win_order_gaps(spark, sf):
    """Days since the previous order per customer (lag window)."""
    from pyspark.sql import Window

    orders = T(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).alias("gap_days"),
    )


ORACLE_WIN_GAPS = """
SELECT o_custkey, o_orderkey,
       date_diff('day',
                 lag(o_orderdate::DATE) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                 o_orderdate::DATE) AS gap_days
FROM orders
"""


def events_json_props(spark, sf):
    """Semi-structured extraction: pull a JSON field out of the string
    props column and aggregate — JVM-side json path, no UDF."""
    ev = T(spark, sf, "events")
    return (
        ev.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
        )
    )


ORACLE_JSON_PROPS = """
SELECT event_type, count(*) AS n_events,
       sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k,
       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k
FROM events GROUP BY event_type
"""


QUERIES = {
    "tpch_q1_pricing": q1_pricing,
    "tpch_q3_shipping": q3_shipping,
    "tpch_q4_priority": q4_priority,
    "tpch_q5_local_volume": q5_local_volume,
    "tpch_q6_forecast": q6_forecast,
    "tpch_q10_returns": q10_returns,
    "tpch_q14_promo": q14_promo,
    "tpch_q18_large_orders": q18_large_orders,
    "tpch_q7_nation_volume": q7_nation_volume,
    "tpch_q13_order_counts": q13_order_counts,
    "tpch_q17_small_qty": q17_small_qty,
    "tpch_q19_disjunctive": q19_disjunctive,
    "tpch_q22_dormant": q22_dormant_customers,
    "win_running_total": win_running_total,
    "win_order_gaps": win_order_gaps,
    "events_json_props": events_json_props,
    "win_top_orders_per_cust": win_top_orders_per_cust,
    "asof_join_events": asof_join_events,
    "range_join_events": range_join_events,
    "pivot_events": pivot_events,
    "rollup_orders": rollup_orders,
    "cube_lineitem_volume": cube_lineitem_volume,
}

ORACLES = {
    "tpch_q1_pricing": ORACLE_Q1,
    "tpch_q3_shipping": ORACLE_Q3,
    "tpch_q4_priority": ORACLE_Q4,
    "tpch_q5_local_volume": ORACLE_Q5,
    "tpch_q6_forecast": ORACLE_Q6,
    "tpch_q10_returns": ORACLE_Q10,
    "tpch_q14_promo": ORACLE_Q14,
    "tpch_q18_large_orders": ORACLE_Q18,
    "tpch_q7_nation_volume": ORACLE_Q7,
    "tpch_q13_order_counts": ORACLE_Q13,
    "tpch_q17_small_qty": ORACLE_Q17,
    "tpch_q19_disjunctive": ORACLE_Q19,
    "tpch_q22_dormant": ORACLE_Q22,
    "win_running_total": ORACLE_WIN_RUNNING,
    "win_order_gaps": ORACLE_WIN_GAPS,
    "events_json_props": ORACLE_JSON_PROPS,
    "win_top_orders_per_cust": ORACLE_WIN_TOP,
    "asof_join_events": ORACLE_ASOF,
    "range_join_events": ORACLE_RANGE_JOIN,
    "pivot_events": ORACLE_PIVOT,
    "rollup_orders": ORACLE_ROLLUP,
    "cube_lineitem_volume": ORACLE_CUBE,
}
