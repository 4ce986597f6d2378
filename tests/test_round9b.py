"""Round-9 wave-3 hardening: the distributed rank primitive proven
against a naive window rank on constructed tie-heavy data, plus the
partitioning-invariance sweep over the eight new registry keys (rank
sums, tie counts, and DECIMAL weighted sums are the partition-
sensitive shapes this wave adds).

The cross-engine value proof itself lives in tests/test_oracle.py once
the keys are registered (every registry key runs Spark-vs-DuckDB
there); this file covers what the oracle gate cannot: the primitive's
contract on hostile inputs and shuffle-layout independence."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WAVE3 = [
    "orders_revenue_theil_nation", "events_daily_overdispersion",
    "part_brand_price_kruskal", "events_value_brownforsythe",
    "orders_seasonal_naive_mase", "docs_word_dispersion_dp",
    "embed_dim_variance_concentration", "events_weekend_wilcoxon",
]


def test_distributed_avg_ranks_matches_naive_window(spark):
    """avg2 = 2·rank() + ties − 1 from a partition-less window is the
    textbook definition; the two-phase operator must reproduce it
    bit-for-bit on tie-heavy data spanning several buckets (values
    repeat 1-40 times over a wide range, including negatives and the
    min/max edge bins)."""
    from pyspark.sql import functions as F

    from faconne_spark.operators.relational import distributed_avg_ranks

    rows = []
    v = -1000
    for i in range(200):
        v += (i * 7919) % 97  # irregular gaps, deterministic
        for _ in range((i % 40) + 1):
            rows.append((len(rows), v))
    df = spark.createDataFrame(rows, "id long, v long")

    got = {
        r["id"]: (r["avg2_rank"], r["t"])
        for r in distributed_avg_ranks(
            df, "v", n_buckets=16, ties_col="t"
        ).collect()
    }
    naive = {
        r["id"]: (r["a2"], r["t"])
        for r in df.selectExpr(
            "id",
            "2 * rank() OVER (ORDER BY v)"
            " + count(*) OVER (PARTITION BY v) - 1 AS a2",
            "count(*) OVER (PARTITION BY v) AS t",
        ).collect()
    }
    assert got == naive
    # rank-sum identity: Σ avg ranks = n(n+1)/2  ⇒  Σ avg2 = n(n+1)
    n = len(rows)
    assert sum(a for a, _ in got.values()) == n * (n + 1)


def test_distributed_avg_ranks_single_value(spark):
    """Degenerate all-ties input: every row gets the midrank
    (n+1)/2 — avg2 = n + 1 — and the bucket machinery must not
    divide by a zero value range."""
    from faconne_spark.operators.relational import distributed_avg_ranks

    df = spark.createDataFrame([(i, 42) for i in range(7)], "id long, v long")
    out = distributed_avg_ranks(df, "v").collect()
    assert len(out) == 7
    assert all(r["avg2_rank"] == 8 for r in out)


def test_wave3_partitioning_invariant(spark, sf_dir):
    """Identical results at 5 vs 32 shuffle partitions for all eight
    wave-3 keys — different partial-agg groupings must not move a
    single micro (the registry determinism claim)."""
    from faconne_spark.queries import all_queries

    qs = all_queries()
    before = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for n in ("5", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            for k in WAVE3:
                rows = sorted(
                    tuple(map(str, r)) for r in qs[k](spark, sf_dir).collect()
                )
                results.setdefault(k, []).append(rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    for k, (a, b) in results.items():
        assert a == b, f"{k} differs across partitioning"
        assert len(a) > 0, f"{k} vacuous at the test SF"
