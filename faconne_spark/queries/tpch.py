"""TPC-H-style analytic queries adapted to the driver schema.

DataFrame-API formulations with explicit scale choices: dimension sides
broadcast, aggregations partial-aggregate map-side, top-N via
window-rank on rounded measures (so float summation order can't flip
the oracle comparison), semi-joins for EXISTS.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from faconne_spark.operators.relational import asof_join, range_join, top_k_per_group
from faconne_spark.queries import T


def q1_pricing(spark, sf):
    li = T(spark, sf, "lineitem").filter("l_shipdate <= date'1998-09-02'")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.expr("l_extendedprice * (1 - l_discount)")), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.expr(
                        "l_extendedprice * (1 - l_discount) * (1 + l_tax)"
                    )
                ),
                2,
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
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 6)      AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6)      AS avg_disc,
       count(*)                       AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping(spark, sf):
    cust = T(spark, sf, "customer").filter("c_mktsegment = 'BUILDING'")
    orders = T(spark, sf, "orders").filter("o_orderdate < date'1998-01-01'")
    li = T(spark, sf, "lineitem").filter("l_shipdate > date'1997-01-01'")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.expr("l_extendedprice * (1 - l_discount)")), 2
            ).alias("revenue")
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
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
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
    region = T(spark, sf, "region").filter("r_name = 'REGION_0'")
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
            F.round(
                F.sum(F.expr("l_extendedprice * (1 - l_discount)")), 2
            ).alias("revenue")
        )
    )


ORACLE_Q5 = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'REGION_0' AND s_nationkey = c_nationkey
GROUP BY n_name
"""


def q6_forecast(spark, sf):
    li = T(spark, sf, "lineitem")
    return li.filter(
        "l_shipdate >= date'1996-01-01' AND l_shipdate < date'1997-01-01'"
        " AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
    ).agg(
        F.round(F.sum(F.expr("l_extendedprice * l_discount")), 2).alias(
            "revenue"
        )
    )


ORACLE_Q6 = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def q10_returns(spark, sf):
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
            F.round(
                F.sum(F.expr("l_extendedprice * (1 - l_discount)")), 2
            ).alias("revenue")
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
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
  GROUP BY c_custkey, c_name, n_name
) ORDER BY revenue DESC, c_custkey LIMIT 20
"""


def q14_promo(spark, sf):
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


QUERIES = {
    "tpch_q1_pricing": q1_pricing,
    "tpch_q3_shipping": q3_shipping,
    "tpch_q4_priority": q4_priority,
    "tpch_q5_local_volume": q5_local_volume,
    "tpch_q6_forecast": q6_forecast,
    "tpch_q10_returns": q10_returns,
    "tpch_q14_promo": q14_promo,
    "tpch_q18_large_orders": q18_large_orders,
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
    "win_top_orders_per_cust": ORACLE_WIN_TOP,
    "asof_join_events": ORACLE_ASOF,
    "range_join_events": ORACLE_RANGE_JOIN,
    "pivot_events": ORACLE_PIVOT,
    "rollup_orders": ORACLE_ROLLUP,
    "cube_lineitem_volume": ORACLE_CUBE,
}
