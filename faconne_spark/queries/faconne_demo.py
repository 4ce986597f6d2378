"""The faconne DSL exercised on the TPC-H-style tables — one query per
domain/range capability group from SURVEY.md §2.1-2.2, each with a
DuckDB oracle over the same parquet.

These run through the full engine path (Binder → RangeBuilder →
Catalyst); outputs are flat/keyed DataFrames so the driver's
hash-compare is well-defined.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from faconne_spark import Agg, K, Keys, SetOf, V, transform
from faconne_spark.queries import T


# D7/D8 literal keys + R3 grouping + R6 struct + R7 expand-aggs
def fac_group_report(spark, sf):
    """DSL flagship: nested grouping + expand-aggregates over orders (R3/R4/R7)."""
    li = T(spark, sf, "lineitem")
    return transform(
        li,
        [Keys("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")],
        {K("concat(l_returnflag, '|', l_linestatus) AS grp"): {
            "sum_qty": Agg("round(sum(l_quantity), 2)"),
            "n_lines": Agg("count(1)"),
            "avg_price": Agg("round(avg(l_extendedprice), 6)"),
        }},
    )


ORACLE_GROUP_REPORT = """
SELECT l_returnflag || '|' || l_linestatus AS grp,
       round(sum(l_quantity), 2)       AS sum_qty,
       count(*)                        AS n_lines,
       round(avg(l_extendedprice), 6)  AS avg_price
FROM lineitem GROUP BY 1
"""


# D2/D6 + R1: nest rows into a keyed list, then traverse the keyed
# DataFrame back to rows (the map⇄relation round-trip, demo.clj:88-91)
def fac_unnest_roundtrip(spark, sf):
    """DSL un-nesting: vector iterate + rebuild round-trip (D2/D4/R1)."""
    orders = T(spark, sf, "orders")
    nested = transform(
        orders,
        [Keys("o_custkey", "o_totalprice")],
        {V.o_custkey: ["round(o_totalprice, 2) AS tp"]},
    )
    return transform(
        nested,
        {V.o_custkey: [V.tp]},
        [{"o_custkey": V.o_custkey, "tp": V.tp}],
    )


ORACLE_UNNEST_ROUNDTRIP = """
SELECT o_custkey, round(o_totalprice, 2) AS tp FROM orders
"""


# D6 inversion (demo.clj:224-230) through a keyed DataFrame
def fac_invert_map(spark, sf):
    """DSL map inversion {k v} -> {v k} over nation names (D6)."""
    nation = T(spark, sf, "nation")
    as_map = transform(nation, [Keys("n_name", "n_nationkey")],
                       {V.n_name: V.n_nationkey})
    return transform(as_map, {V.n_name: V.n_nationkey},
                     {V.n_nationkey: V.n_name})


ORACLE_INVERT = """
SELECT n_nationkey, n_name FROM nation
"""


# D13 where-pushdown: filters reach the parquet scan (asserted in
# tests/test_plans.py)
def fac_where_pushdown(spark, sf):
    """DSL :where pushdown — filter reaches the parquet scan (D13)."""
    li = T(spark, sf, "lineitem")
    return transform(
        li,
        [Keys("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")],
        [{"l_orderkey": V.l_orderkey, "l_linenumber": V.l_linenumber,
          "price": "round(l_extendedprice, 2) AS price"}],
        where=["l_quantity < 5", "l_extendedprice > 20000"],
    )


ORACLE_WHERE = """
SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
FROM lineitem WHERE l_quantity < 5 AND l_extendedprice > 20000
"""


# D12 multi-binding map: all k-groupings of entries (demo.clj:354-367)
def fac_pairs_sum(spark, sf):
    """DSL multi-binding map {k v, k' v'}: all entry pairs (D12)."""
    region = T(spark, sf, "region")
    as_map = (
        region.groupBy()
        .agg(
            F.expr(
                "map_from_entries(array_sort(collect_list("
                "struct(r_name, r_regionkey))))"
            ).alias("__root")
        )
    )
    return transform(
        as_map,
        {V.k: V.v, V.k2: V.v2},
        [{"name_a": V.k, "name_b": V.k2, "key_sum": "v + v2 AS key_sum"}],
        where=["k < k2"],
    )


ORACLE_PAIRS = """
SELECT a.r_name AS name_a, b.r_name AS name_b,
       a.r_regionkey + b.r_regionkey AS key_sum
FROM region a JOIN region b ON a.r_name < b.r_name
"""


# D3 n-at-a-time vector partitioning over token arrays
def fac_vector_partition(spark, sf):
    """DSL n-at-a-time vector partition with wildcard skip (D3)."""
    docs = T(spark, sf, "documents").select(
        "doc_id", F.expr("split(trim(text), '\\\\s+')").alias("toks")
    )
    return transform(
        docs,
        [{"doc_id": V.doc_id, "toks": [V.a, V._]}],
        [{"doc_id": V.doc_id, "tok": V.a}],
        where=["a IS NOT NULL"],
    )


ORACLE_VECTOR_PARTITION = """
SELECT doc_id, toks[i] AS tok
FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM documents),
     LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i)
WHERE i % 2 = 1
"""


# R5 conditional/computed keys (issue #3, test/core.clj:444-450)
def fac_conditional_key(spark, sf):
    """DSL computed/conditional map keys (R5/R10, issue #3)."""
    orders = T(spark, sf, "orders")
    return transform(
        orders,
        [Keys("o_totalprice", "o_orderstatus")],
        {K("case when o_totalprice > 150000 then 'big'"
           " when o_totalprice > 50000 then 'mid' else 'small' end AS bucket"): {
            "n_orders": Agg("count(1)"),
            "total": Agg("round(sum(o_totalprice), 2)"),
        }},
    )


ORACLE_CONDITIONAL_KEY = """
SELECT CASE WHEN o_totalprice > 150000 THEN 'big'
            WHEN o_totalprice > 50000 THEN 'mid' ELSE 'small' END AS bucket,
       count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY 1
"""


# R7/R8 expand-reducers composed in one expression (core.clj:397-401)
def fac_expand_aggs(spark, sf):
    """DSL ^:expand reducers: composed aggregate expressions (R7/R8)."""
    li = T(spark, sf, "lineitem")
    return transform(
        li,
        [Keys("l_returnflag", "l_quantity", "l_discount")],
        {V.l_returnflag: {
            "max_or_n": Agg("greatest(max(l_quantity), count(l_quantity))"),
            "hi_disc_share": Agg(
                "round(cast(count(if(l_discount > 0.05, 1, null)) as double)"
                " / count(1), 6)"),
        }},
    )


ORACLE_EXPAND_AGGS = """
SELECT l_returnflag,
       greatest(max(l_quantity), count(l_quantity)) AS max_or_n,
       round(count(CASE WHEN l_discount > 0.05 THEN 1 END)::DOUBLE
             / count(*), 6) AS hi_disc_share
FROM lineitem GROUP BY l_returnflag
"""


# R9 argmax (max-key analog, core.clj:403-409) with deterministic ties
def fac_argmax(spark, sf):
    """DSL max-key analog via max_by struct ordering (R9)."""
    li = T(spark, sf, "lineitem")
    return transform(
        li,
        [Keys("l_returnflag", "l_orderkey", "l_extendedprice")],
        {V.l_returnflag: {
            "best_order": Agg(
                "max_by(l_orderkey, cast(round(l_extendedprice, 2) * 100 as bigint)"
                " * 10000000 + l_orderkey)"),
            "best_price": Agg("round(max(l_extendedprice), 2)"),
        }},
    )


ORACLE_ARGMAX = """
SELECT l_returnflag,
       arg_max(l_orderkey, (round(l_extendedprice, 2) * 100)::BIGINT
               * 10000000 + l_orderkey) AS best_order,
       round(max(l_extendedprice), 2) AS best_price
FROM lineitem GROUP BY l_returnflag
"""


# R2 set build (canonically sorted)
def fac_store_products(spark, sf):
    """DSL set build #{...}: canonically sorted collect_set (R2)."""
    orders = T(spark, sf, "orders")
    out = transform(
        orders,
        [Keys("o_orderpriority", "o_orderstatus")],
        {V.o_orderpriority: SetOf(V.o_orderstatus)},
    )
    # The DSL's SetOf yields a canonically-sorted array<string>; the driver's
    # pandas canonicalizer cannot sort list cells, so the gate query joins
    # the sorted set into one scalar string (semantics unchanged).
    return out.withColumn("value", F.array_join("value", ","))


ORACLE_STORE_PRODUCTS = """
SELECT o_orderpriority,
       array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS value
FROM orders GROUP BY o_orderpriority
"""


# R6 multi-branch report over a join (deep merge of same-level branches)
def fac_campus_report(spark, sf):
    """DSL deep merge: sibling branches at different grouping depths
    (R6), spelled with the first-class struct-of-aggregates sugar
    (``Struct``/``CountDistinct``/``Round(Sum(...))`` — reference
    parse_range.cljc:112-139 composable expands); desugars to the
    literal-dict + ``Agg`` form, identical plan."""
    from faconne_spark import CountDistinct, Min, Round, Struct, Sum

    cust = T(spark, sf, "customer")
    nation = F.broadcast(T(spark, sf, "nation"))
    joined = cust.join(nation, cust.c_nationkey == nation.n_nationkey)
    return transform(
        joined,
        [Keys("n_name", "c_custkey", "c_acctbal", "c_mktsegment")],
        {V.n_name: Struct(
            n_customers=CountDistinct(V.c_custkey),
            total_bal=Round(Sum(V.c_acctbal), 2),
            first_segment=Min(V.c_mktsegment),
        )},
    )


ORACLE_CAMPUS = """
SELECT n_name, count(distinct c_custkey) AS n_customers,
       round(sum(c_acctbal), 2) AS total_bal,
       min(c_mktsegment) AS first_segment
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


QUERIES = {
    "fac_group_report": fac_group_report,
    "fac_unnest_roundtrip": fac_unnest_roundtrip,
    "fac_invert_map": fac_invert_map,
    "fac_where_pushdown": fac_where_pushdown,
    "fac_pairs_sum": fac_pairs_sum,
    "fac_vector_partition": fac_vector_partition,
    "fac_conditional_key": fac_conditional_key,
    "fac_expand_aggs": fac_expand_aggs,
    "fac_argmax": fac_argmax,
    "fac_store_products": fac_store_products,
    "fac_campus_report": fac_campus_report,
}

ORACLES = {
    "fac_group_report": ORACLE_GROUP_REPORT,
    "fac_unnest_roundtrip": ORACLE_UNNEST_ROUNDTRIP,
    "fac_invert_map": ORACLE_INVERT,
    "fac_where_pushdown": ORACLE_WHERE,
    "fac_pairs_sum": ORACLE_PAIRS,
    "fac_vector_partition": ORACLE_VECTOR_PARTITION,
    "fac_conditional_key": ORACLE_CONDITIONAL_KEY,
    "fac_expand_aggs": ORACLE_EXPAND_AGGS,
    "fac_argmax": ORACLE_ARGMAX,
    "fac_store_products": ORACLE_STORE_PRODUCTS,
    "fac_campus_report": ORACLE_CAMPUS,
}


def _second_top(xs):
    """Bespoke reducer an SQL aggregate does not spell directly — the
    reference's arbitrary-fn ^:expand case (parse_range.cljc:112-139)."""
    return float(xs[-2]) if len(xs) > 1 else float(xs[-1])


def fac_pyagg_second_top(spark, sf):
    """R7 arbitrary-fn reducer THROUGH the driver gate: PyAgg applies
    a plain Python fn to each group's sorted value list, once per
    group (native collect_list aggregate underneath)."""
    from faconne_spark import PyAgg

    return transform(
        T(spark, sf, "customer"),
        [Keys("c_nationkey", "c_acctbal")],
        {V.c_nationkey: PyAgg(
            V.c_acctbal, _second_top, "double", alias="second_top_bal"
        )},
    )


ORACLE_PYAGG_SECOND = """
WITH l AS (
  SELECT c_nationkey, list_sort(list(c_acctbal)) AS xs
  FROM customer GROUP BY c_nationkey)
SELECT c_nationkey,
       CASE WHEN len(xs) > 1 THEN xs[-2] ELSE xs[-1] END AS second_top_bal
FROM l
"""

QUERIES["fac_pyagg_second_top"] = fac_pyagg_second_top
ORACLES["fac_pyagg_second_top"] = ORACLE_PYAGG_SECOND
