"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line with per-query wall times.

Queries are forced with the noop sink (full computation, no driver
collect). Each query runs once after a session warm-up query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "fac_group_report",
    "fac_campus_report",
    "tpch_q1_pricing",
    "tpch_q3_shipping",
    "tpch_q5_local_volume",
    "tpch_q18_large_orders",
    "win_top_orders_per_cust",
    "asof_join_events",
    "pivot_events",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_clusters",
    "ann_cosine_topk",
    "ann_ivf_kmeans",
    "knn_classify_labels",
    "text_quality",
    "text_lang_id",
    "text_pii_scrub",
    "contamination_ngram",
    "pipeline_clean_corpus",
    "stream_window_counts",
    "stream_session_agg",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from faconne_spark.session import get_session
    from faconne_spark.queries import all_queries

    spark = get_session("faconne_spark_bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # warm up the JVM + parquet footers + regexp/md5 codegen paths
    queries["tpch_q6_forecast"](spark, sf_dir).count()
    queries["text_token_count"](spark, sf_dir).count()

    from faconne_spark.operators.dedup import release_caches

    times = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)
        release_caches()  # drop per-query signature caches between runs

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
