"""sample_panel — the fixed-COUNT hash-panel primitive (judge r9 ask
#7): determinism, exact size, nesting across sizes, cross-engine panel
identity with the DuckDB mirror, and the bounded-broadcast plan shape
of the two embedding diagnostics it now backs."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from faconne_spark.operators.relational import sample_panel, sample_panel_sql
from faconne_spark.queries import T


def _ids(spark, sf_dir, n, salt="t"):
    emb = T(spark, sf_dir, "embeddings").select("vec_id")
    return [
        r.vec_id for r in sample_panel(emb, "vec_id", n, salt=salt).collect()
    ]


def test_panel_is_exact_count_and_deterministic(spark, sf_dir):
    a = _ids(spark, sf_dir, 100)
    b = _ids(spark, sf_dir, 100)
    assert len(a) == 100 and a == b


def test_panels_nest_across_sizes(spark, sf_dir):
    small = set(_ids(spark, sf_dir, 50))
    big = set(_ids(spark, sf_dir, 200))
    assert small <= big and len(small) == 50 and len(big) == 200


def test_distinct_salts_sample_independently(spark, sf_dir):
    a = set(_ids(spark, sf_dir, 100, salt="hub"))
    b = set(_ids(spark, sf_dir, 100, salt="twonn"))
    assert a != b  # 500 ids, two independent 100-panels colliding
    # exactly is astronomically unlikely; equality would mean the salt
    # is not reaching the hash


def test_panel_matches_duckdb_mirror(spark, sf_dir):
    got = _ids(spark, sf_dir, 75, salt="xe")
    p = os.path.join(sf_dir, "embeddings.parquet")
    con = duckdb.connect()
    sql = sample_panel_sql(
        "vec_id", 75, salt="xe",
        from_sql=f"(SELECT vec_id FROM read_parquet('{p}'))",
    )
    want = [r[0] for r in con.sql(sql).fetchall()]
    assert got == want


def test_panel_larger_than_corpus_returns_all(spark, sf_dir):
    emb = T(spark, sf_dir, "embeddings").select("vec_id")
    n = emb.count()
    assert sample_panel(emb, "vec_id", n + 10_000).count() == n


@pytest.mark.parametrize(
    "key", ["ann_hubness", "embed_twonn_intrinsic_dim"]
)
def test_pair_stage_broadcast_is_panel_bounded(spark, sf_dir, key):
    """The r9 defect was panel ∝ corpus (vec_id % 4): the plan
    broadcast the whole quarter-corpus.  The bounded panel must show a
    GlobalLimit/TakeOrderedAndProject UNDER the BroadcastExchange so
    the broadcast is ≤ panel rows at any corpus size."""
    from faconne_spark.queries import all_queries

    df = all_queries()[key](spark, sf_dir)
    qe = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = qe.explainString(mode)
    assert "TakeOrderedAndProject" in plan, key
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
