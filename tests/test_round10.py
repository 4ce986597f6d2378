"""Round-10 wave hardening: 3-SF cross-engine proofs live in
tests/test_oracle.py once keys are registered; this file covers the
shuffle-layout independence sweep for the fourteen wave keys (pair
counts, rank sums, per-cell χ² terms, panel selection, and DECIMAL
power sums are the partition-sensitive shapes this round adds) plus
contract checks the oracle gate cannot see."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WAVE_R10 = [
    "events_volume_value_kendall", "events_weekend_cliffs_delta",
    "events_type_median_test", "events_value_moors_kurtosis",
    "events_value_expected_shortfall", "events_weekly_cohort_halflife",
    "docs_yule_k", "docs_adjacent_repeat_rate",
    "docs_word_bigram_cond_entropy", "docs_word_length_profile",
    "mm_png_channel_stats", "ann_panel_epsilon_degree",
    "embed_dim_kurtosis", "orders_status_priority_cramers_v",
    "mm_jpeg_progressive",
    # wave E
    "docs_vocab_chao1_unseen", "docs_bigram_kn_discount",
    "events_gap_geometric_gof", "events_value_differential_entropy",
    "mm_audio_zero_crossings", "orders_value_hill_tail",
    # wave F
    "mm_jpeg12_decode", "docs_lexical_richness_indices",
    "orders_totalprice_benford12",
]


def test_round10_keys_partitioning_invariant(spark, sf_dir):
    """Identical results under different shuffle-partition counts."""
    from faconne_spark.queries import all_queries

    queries = all_queries()
    before = spark.conf.get("spark.sql.shuffle.partitions")
    results: dict = {}
    try:
        for n in ("5", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            for k in WAVE_R10:
                rows = sorted(
                    tuple(map(str, r))
                    for r in queries[k](spark, sf_dir).collect()
                )
                results.setdefault(k, []).append(rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    for k, (r5, r32) in results.items():
        assert r5 == r32, f"{k}: partition-count-dependent output"


def test_kendall_matches_scipy_free_reference(spark, sf_dir):
    """τ-b on the real day relation equals a plain-Python pair count
    (the engine's C/D/tie integers are re-derived independently)."""
    import math

    from pyspark.sql import functions as F

    from faconne_spark.queries import T, all_queries

    daily = (
        T(spark, sf_dir, "events")
        .groupBy(F.expr("to_date(ts)").alias("day"))
        .agg(
            F.count("*").alias("x"),
            F.sum(
                F.expr("cast(floor(value * 1000000 + 0.5) as bigint)")
            ).alias("y"),
        )
        .collect()
    )
    pts = [(r["x"], r["y"]) for r in daily]
    nc = nd = ntx = nty = ntxy = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            (x1, y1), (x2, y2) = pts[i], pts[j]
            if x1 == x2 and y1 == y2:
                ntxy += 1
            elif x1 == x2:
                ntx += 1
            elif y1 == y2:
                nty += 1
            elif (x1 < x2) == (y1 < y2):
                nc += 1
            else:
                nd += 1
    n0 = len(pts) * (len(pts) - 1) // 2
    r = all_queries()["events_volume_value_kendall"](spark, sf_dir).collect()[0]
    assert (r["concordant"], r["discordant"]) == (nc, nd)
    assert (r["ties_x"], r["ties_y"]) == (ntx + ntxy, nty + ntxy)
    want = (nc - nd) / (
        math.sqrt(n0 - ntx - ntxy) * math.sqrt(n0 - nty - ntxy)
    )
    assert abs(r["kendall_tau_b"] - want) < 1e-6


def test_cliffs_delta_matches_brute_force_pairs(spark):
    """δ from the rank identity equals the O(n²) definition on a
    constructed tie-heavy sample (the identity is the part a wrong
    sign or off-by-one would silently corrupt)."""
    import tempfile

    from pyspark.sql import functions as F

    from faconne_spark.queries import all_queries

    # weekday (Mon 2024-01-01 .. Fri) and weekend (Sat/Sun) values
    weekday = [10, 20, 20, 30, 50]
    weekend = [20, 40, 40]
    rows = []
    for i, v in enumerate(weekday):
        rows.append((i, 1, f"2024-01-0{1 + i % 5} 00:00:00", "a", float(v), "{}"))
    for i, v in enumerate(weekend):
        rows.append(
            (100 + i, 1, f"2024-01-0{6 + i % 2} 00:00:00", "a", float(v), "{}")
        )
    df = spark.createDataFrame(
        rows,
        "event_id bigint, user_id bigint, ts string, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, "events.parquet")
        )
        r = all_queries()["events_weekend_cliffs_delta"](spark, d).collect()[0]
    gt = sum(1 for a in weekend for b in weekday if a > b)
    lt = sum(1 for a in weekend for b in weekday if a < b)
    assert r["n_weekend"] == len(weekend)
    assert r["n_weekday"] == len(weekday)
    assert r["delta_num"] == gt - lt
    assert abs(
        r["cliffs_delta"] - (gt - lt) / (len(weekend) * len(weekday))
    ) < 1e-6


def test_epsilon_degree_accounts_every_panel_vector(spark, sf_dir):
    """The degree histogram must cover the full panel (zero-degree
    vectors included via the conditional aggregate, not dropped)."""
    from faconne_spark.queries import all_queries
    from faconne_spark.queries.round10 import EPS_PANEL_N

    rows = all_queries()["ann_panel_epsilon_degree"](spark, sf_dir).collect()
    total = sum(r["n_queries"] for r in rows)
    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM"
        f" read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchone()[0]
    assert total == min(EPS_PANEL_N, n)


def test_png_channel_stats_sum_to_pixel_sum(spark, sf_dir):
    """r+g+b must equal mm_png_decode's grand pixel_sum per doc — the
    two gates must agree on the same decode."""
    from faconne_spark.queries import all_queries

    q = all_queries()
    chans = {
        r["doc_id"]: r["r_sum"] + r["g_sum"] + r["b_sum"]
        for r in q["mm_png_channel_stats"](spark, sf_dir).collect()
    }
    totals = {
        r["doc_id"]: r["pixel_sum"]
        for r in q["mm_png_decode"](spark, sf_dir).collect()
    }
    assert chans == totals
