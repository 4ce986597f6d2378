"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line with per-query wall times.  Per-query shuffle-write bytes
go to the bench_shuffle.json sidecar (they overflowed the driver's
bounded stdout capture in round 4 and truncated the wall times away).

Queries are forced with the noop sink (full computation, no driver
collect). Each query runs $FACONNE_BENCH_REPS times (default 2, judge
r10 ask #2a) after a session warm-up query and reports the per-key MIN
(single-shot walls wobbled up to 7x on persisted-iteration keys across
same-commit runs); per-rep walls go to the bench_times.json sidecar.
NOTE: r11 onward per-key times and totals are min-of-2 — compare to
r10-and-earlier single-shot figures with that in mind.  The
dedup cascade is snapshotted to parquet and training_manifest consumes
the snapshot — the production shape, so the bench doesn't pay the whole
dedup family twice.
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
    # composed end-to-end pipelines + the rewritten RFM (headline since
    # round 4).  NOTE: round 5 changed what these two measure —
    # dedup_cascade's timed write is now a real parquet snapshot (not
    # the noop sink) and training_manifest CONSUMES that snapshot
    # instead of recomputing the cascade — so compare their times (and
    # totals that include them) from r5 onward only; the r3 subset
    # below excludes both and stays comparable across all rounds.
    "dedup_cascade",
    "training_manifest",
    "user_rfm_segments",
]


def bench_comparability(reps: int) -> dict:
    """Cross-round comparability label (judge r11 ask #7): min-of-N
    per-key timing needs N >= 2 to suppress first-rep cache inflation
    (observed up to 4x on stamp-identical plans) — a reps=1 run's
    totals are NOT comparable to other rounds and must say so in the
    emitted JSON rather than silently reviving the single-shot era."""
    if reps >= 2:
        return {"cross_round_comparable": True}
    return {
        "cross_round_comparable": False,
        "incomparable_reason": (
            f"reps={reps} < 2: per-key min cannot suppress first-rep "
            f"cache inflation; do not compare these totals across rounds"
        ),
    }


def _reclaim(spark) -> None:
    """Force a JVM GC in the untimed gap between queries. Spark's
    ContextCleaner frees shuffle files, broadcast blocks and
    localCheckpoint RDDs only when the JVM garbage-collects their
    references — by default a periodic GC every 30 min, i.e. never
    within one bench run.  Without this, 50+ queries' worth of shuffle
    state accumulates in the driver JVM and late queries pay the
    eviction/GC pressure (measured: dedup_clusters 22 s at position 14
    vs 10 s in a fresh session)."""
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass


def _shuffle_bytes_total(spark) -> int:
    """Cumulative shuffle-write bytes across all completed stages, via
    the Spark UI REST API (public monitoring surface)."""
    import urllib.request

    try:
        ui = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete", timeout=5
        ) as r:
            stages = json.load(r)
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:
        return -1


def skew_dedup_minhash(spark, sf_dir):
    """Skew stress: a bounded corpus where 30% of docs share one text
    (hence one set of minhash bands → one hot LSH bucket). Exercises the
    banded self-join under a hot key with AQE skew splitting; the corpus
    is capped so the hot bucket's pair output stays bounded (pair count
    is inherently O(hot²) — that's the semantics, not the engine)."""
    from pyspark.sql import functions as F

    from faconne_spark.operators.dedup import exact_dedup, minhash_lsh_pairs

    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .limit(2000)
    )
    skewed = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 < 3,
            F.lit("the quick brown fox jumps over the lazy dog again and again"),
        ).otherwise(F.col("text")),
    )
    pairs = minhash_lsh_pairs(skewed)
    keepers = exact_dedup(skewed)
    return pairs.groupBy().agg(
        F.count("*").alias("n_pairs")
    ).crossJoin(keepers.groupBy().agg(F.count("*").alias("n_fingerprints")))


def skew_hot_user_join(spark, sf_dir):
    """Skew stress #2: 30% of events forced onto ONE user, joined to a
    per-user dimension through the explicit salted join — times the
    hot-key join path that AQE alone cannot always fix (the salt
    spreads the hot key over n_salts tasks)."""
    from pyspark.sql import functions as F

    from faconne_spark.operators.relational import salted_join
    from faconne_spark.queries import T

    ev = T(spark, sf_dir, "events").select("user_id", "value")
    skewed = ev.withColumn(
        "user_id",
        F.when(F.expr("pmod(hash(value), 10) < 3"), F.lit(7)).otherwise(
            F.col("user_id")
        ),
    )
    dim = skewed.groupBy("user_id").agg(F.count("*").alias("n_ev"))
    joined = salted_join(skewed, dim, "user_id", n_salts=16)
    return joined.groupBy().agg(
        F.count("*").alias("n_rows"),
        F.sum("n_ev").alias("sum_dim"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from faconne_spark.session import get_session
    from faconne_spark.queries import all_queries

    # UI on: per-query shuffle-write bytes come from its REST API
    spark = get_session(
        "faconne_spark_bench", cpus=cpus, extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    queries["skew_dedup_minhash"] = skew_dedup_minhash
    queries["skew_hot_user_join"] = skew_hot_user_join

    # warm up the JVM + parquet footers + regexp/md5 codegen paths
    queries["tpch_q6_forecast"](spark, sf_dir).count()
    queries["text_token_count"](spark, sf_dir).count()

    # machine-throughput calibration: a fixed CPU-bound JVM aggregation
    # (no I/O, no shuffle) timed in the same session.  The sandbox VM's
    # steady throughput shifts between rounds (it restarted mid-round 4
    # at ~2x slower wall for identical plans), so round-over-round
    # comparisons should read headline_total / calibration, not raw
    # seconds.
    t0 = time.perf_counter()
    spark.range(2**27).selectExpr(
        "sum(id * 2654435761 % 1000003) AS chk"
    ).collect()
    calibration = round(time.perf_counter() - t0, 3)

    # Spark-stack calibration (judge r8 ask #4): the CPU microbench
    # above doesn't move with the cost that dominates sub-3 s queries —
    # JVM scheduling, stage launch, codegen, shuffle machinery.  Time a
    # FIXED tiny multi-stage job (32 tasks/stage, a shuffle, trivial
    # data — pure per-stage overhead) five times so cross-round
    # comparisons of small-query totals have a denominator measuring
    # the same stack.
    t0 = time.perf_counter()
    for _ in range(5):
        spark.range(0, 32_000, 1, 32).selectExpr(
            "id % 97 AS k"
        ).groupBy("k").count().selectExpr("sum(count) AS n").collect()
    spark_calibration = round(time.perf_counter() - t0, 3)

    # Shuffle-shaped calibration (judge r10 ask #2b): the tiny-job probe
    # above measures stage-launch overhead, which does NOT move with the
    # cost that dominates the multi-second shuffle-heavy keys (exchange
    # write/read, sort-merge machinery, GC under shuffle memory
    # pressure) — in r9/r10 the normalized headline swung 11.3 -> 19.0
    # on stamped-identical plans because the denominator was shaped
    # unlike the workload.  Time a FIXED mid-size shuffle job — 10M rows
    # in 32 partitions grouped to 1M keys (a real 2-stage exchange with
    # non-trivial map output) — three times and keep the min (the
    # steady-state figure; first run absorbs codegen).
    shuffle_runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(0, 10_000_000, 1, 32).selectExpr(
            "id % 1000000 AS k", "id AS v"
        ).groupBy("k").agg({"v": "sum"}).selectExpr(
            "sum(`sum(v)`) AS chk"
        ).collect()
        shuffle_runs.append(time.perf_counter() - t0)
    shuffle_calibration = round(min(shuffle_runs), 3)

    from faconne_spark.operators.dedup import release_caches

    # measured but excluded from the headline total, so round-over-round
    # totals stay comparable as coverage grows
    extra = [
        "skew_dedup_minhash",
        "skew_hot_user_join",
        "text_repetition",
        "text_unigram_logprob",
        "docs_topk_ngrams",
        "embed_label_centroids",
        "dedup_containment",
        # round-4 quality gauges + diagnostics (timed, not headline)
        "ann_recall_eval",
        "dedup_minhash_calibration",
        "embed_threshold_sweep",
        "join_skew_report",
        "corpus_snapshot_diff",
        "text_readability",
        # round-4b curation family (timed, not headline)
        "contamination_embedding",
        "sample_temperature",
        "events_anomaly_mad",
        "scd2_customer_merge",
        "dedup_keep_best",
        "docs_zipf_slope",
        "events_zorder_key",
        "docs_perplexity_buckets",
        "mm_audio_stats",
        "customer_ltv_cohorts",
        "events_path_ngrams",
        "embed_quantize_int8",
        "dup_graph_pagerank",
        "ann_hard_negatives",
        # round-4c curation additions (timed, not headline)
        "text_boilerplate_segments",
        "pack_training_chunks",
        "docs_chunk_overlap",
        "docs_bigram_logprob",
        # round-4d curation additions (timed, not headline)
        "dedup_semantic",
        "text_gopher_rules",
        "docs_importance_weights",
        "customer_fuzzy_matches",
        "embed_pca_gramian",
        "docs_bpe_pair_counts",
        "events_fill_forward",
        "dup_graph_triangles",
        "events_value_quantiles",
        "events_incremental_stats",
        "dedup_minhash_pr",
        "quality_feature_cov",
        "events_ab_test",
        # round-5 curation additions (timed, not headline)
        "text_tokenizer_fertility",
        "docs_ngram_novelty",
        "docs_cdc_chunks",
        "docs_token_cms_topk",
        "docs_dsir_resample",
        "dedup_cdc",
        "events_ab_sequential",
        "events_quantile_calibration",
        # round-5b sketch wave (timed, not headline)
        "events_hll_distinct",
        "dedup_bloom_prefilter",
        "events_ewma",
        "events_hll_overlap",
        "mm_image_ahash",
        "mm_audio_resample",
        "events_cusum_drift",
        "docs_split_leakage",
        "embed_matryoshka_recall",
        "events_active_users_rollup",
        "dedup_setsim_prefix",
        "sample_priority",
        "events_hourly_seasonality",
        "docs_source_lang_kl",
        "embed_centroid_drift",
        "fac_pyagg_second_top",
        "dedup_recent_window",
        "win_rolling_7d",
        "join_size_from_stats",
        "docs_nb_quality_classifier",
        "ann_nprobe_sweep",
        "events_conversion_lag",
        "events_anomaly_seasonal",
        "orders_revenue_gini",
        # round-5c analytics wave (timed, not headline)
        "events_sessionize",
        "events_audience_overlap",
        "orders_basket_lift",
        "part_skyline",
        "embed_diversity",
        "events_range_partition_plan",
        "dup_graph_lpa",
        "mm_scene_cuts",
        # round-6 registration of the r5 bank (timed, not headline)
        "events_kmv_distinct",
        "events_kmv_overlap",
        "customer_order_golden",
        "customer_fs_scores",
        "orders_basket_confidence",
        "part_skyline_by_brand",
        "docs_vocab_kmv",
        "events_auc_purchase",
        "events_value_bootstrap",
        "events_ks_value_drift",
        "docs_rater_kappa",
        "part_copurchase_kcore",
        "part_copurchase_ra",
        "events_day_concurrency",
        "ann_rrf_fusion",
        "events_benford",
        "events_quantile_normalize",
        "events_value_weighted_quantiles",
        "events_type_value_mi",
        "events_type_entropy",
        # round-6 new keys (timed, not headline)
        "events_pr_auc",
        "docs_reliability_curve",
        "dedup_changefeed",
        "events_value_quantiles_merged",
        "events_purchase_rate_ci",
        "events_ab_srm",
        "part_copurchase_jaccard",
        "dedup_simhash_hamming_hist",
        "events_chi2_type_dow",
        "dedup_lsh_banding_sweep",
        "events_winsorized_stats",
        "orders_lorenz_curve",
        "events_new_vs_returning",
        "dup_cluster_source_mix",
        "events_ab_power",
        "events_topk_user_churn",
        "embed_pq_distortion",
        "events_session_quantiles",
        "orders_basket_chi2",
        "lineitem_return_rate_ci",
        "docs_profile_completeness",
        "events_retention_ci",
        "orders_interpurchase_quantiles",
        # round-7 registration of the r6 bank (timed, not headline)
        "events_funnel_ci",
        "docs_lang_purity_ci",
        "orders_priority_mix_drift",
        "events_markov_cond_entropy",
        "part_brand_supplier_hhi",
        "events_burstiness",
        "docs_filter_confusion",
        "events_weekend_effect",
        # round-7 merged-state + S15 gate keys (timed, not headline)
        "events_hll_merged",
        "docs_cms_topk_merged",
        "events_auc_merged",
        "docs_file_sample",
        # round-7 analytics wave (timed, not headline)
        "events_ab_cuped",
        "events_mann_kendall_trend",
        "events_autocorr_daily",
        "customer_segment_nation_chi2",
        "events_value_ecdf",
        "events_session_bounce",
        "orders_repeat_rate_ci",
        "events_transition_lift",
        "docs_simhash_bit_bias",
        "embed_norm_quantiles",
        "lineitem_discount_lift",
        "docs_ttr_by_source",
        "events_hill_tail_alpha",
        "orders_order_size_hist",
        "lineitem_ship_lag_quantiles",
        "events_whale_share",
        "docs_dedup_survivor_bias",
        "docs_ngram_coverage_curve",
        "part_type_price_dispersion",
        "supplier_debt_rate_ci",
        "docs_char_entropy_by_lang",
        # round-7 wave 5 (timed, not headline)
        "events_gap_survival",
        "events_user_lifetime_quantiles",
        "customer_balance_vs_orders_corr",
        "part_brand_price_premium",
        "docs_source_length_quantiles",
        "lineitem_qty_returnflag_ks",
        "events_ks_merged",
        "events_kmv_merged",
        # round-7 wave 6 (timed, not headline)
        "docs_stopword_rate_by_lang",
        "events_hour_hhi",
        "part_size_vs_price_corr",
        "orders_pareto_8020",
        # round-8: the last two merged-state gate keys + BPE end-to-end
        "dedup_bloom_merged",
        "events_bootstrap_merged",
        "docs_bpe_token_counts",
        "mm_png_decode",
        # round-8 analytics wave
        "fk_orphan_audit",
        "pk_duplicate_audit",
        "docs_hash_uniformity_chi2",
        "events_interarrival_cv",
        "events_changepoint_binary",
        "events_dow_type_decomp",
        "events_kmv_precision_sweep",
        "brand_price_volume_decomp",
        "copurchase_degree_assortativity",
        "docs_prefix_boilerplate",
        "embed_cosine_pair_histogram",
        "docs_source_vocab_overlap",
        "part_brand_type_mi",
        "supplier_balance_mad_outliers",
        "dup_pairs_transitivity",
        "events_markov_stationary",
        "ann_mrr_eval",
        "customer_segment_balance_anova",
        "docs_cross_source_duplication",
        "orders_status_age_quantiles",
        "embed_centroid_separation",
        "orders_reorder_acceleration",
        "part_size_brand_ks",
        "events_dau_mann_kendall",
        # round-9 registrations (JPEG decode + the staged_r9 six)
        "mm_jpeg_decode",
        "mm_jpeg_ahash",
        # round-9 analytics wave
        "events_type_share_drift_jsd",
        "events_user_entropy_quantiles",
        "copurchase_clustering_coeff",
        "orders_priority_balance_catrend",
        "orders_value_decile_migration",
        "ann_label_consistency",
        "ann_hubness",
        "embed_twonn_intrinsic_dim",
        "docs_ocr_garbage_score",
        # round-9 analytics wave 2
        "lineitem_qty_discount_ols",
        "docs_source_unigram_jsd",
        "events_conversion_hazard",
        "supplier_part_concentration_gini",
        "events_stickiness_ratio",
        "events_dow_volume_anova",
        "orders_value_cv_by_segment",
        "events_type_cooccurrence_pmi",
        "docs_char_bigram_cond_entropy",
        "events_value_spearman_daily",
        "docs_vocab_growth_heaps",
        # round-9 analytics wave 3 (rank primitive + decompositions)
        "orders_revenue_theil_nation",
        "events_daily_overdispersion",
        "part_brand_price_kruskal",
        "events_value_brownforsythe",
        "orders_seasonal_naive_mase",
        "docs_word_dispersion_dp",
        "embed_dim_variance_concentration",
        "events_weekend_wilcoxon",
        # round-9 analytics wave 4 (+ GIF/silence multimodal gates)
        "orders_priority_value_gamma",
        "events_hourly_profile_correlation",
        "events_monthly_max_gumbel",
        "docs_hapax_rate",
        "docs_length_lognormal_fit",
        "mm_gif_decode",
        "mm_audio_silence_runs",
        # round-9 analytics wave 5 (tail/shape + robust trend)
        "events_user_degree_powerlaw_mle",
        "docs_source_topword_rbo",
        "customer_order_value_icc",
        "events_value_jarque_bera",
        "events_user_count_nbd_fit",
        "orders_monthly_theil_sen",
        # round-9 analytics wave 6 (circular/forensic/calendar)
        "events_hour_circular_stats",
        "embed_norm_label_anova",
        "events_benford_second_digit",
        "events_dow_hour_mi",
        # round-10: the registered bank_r10 fourteen
        "orders_priority_shiplag_ks",
        "events_active_days_gini",
        "events_transition_asymmetry",
        "docs_source_simpson_diversity",
        "events_daily_runs_test",
        "part_size_price_spearman",
        "mm_gif_ahash",
        "docs_bigram_pmi_top",
        "docs_quality_length_spearman",
        "events_value_kruskal_by_dow",
        "events_weekday_friedman",
        "events_value_bowley_skew",
        "mm_gif_pixel_entropy",
        "events_type_value_qq",
        "mm_jpeg_progressive",
        # round-10 analytics waves A-D
        "events_volume_value_kendall",
        "events_weekend_cliffs_delta",
        "events_type_median_test",
        "events_value_moors_kurtosis",
        "events_value_expected_shortfall",
        "events_weekly_cohort_halflife",
        "docs_yule_k",
        "docs_adjacent_repeat_rate",
        "docs_word_bigram_cond_entropy",
        "docs_word_length_profile",
        "mm_png_channel_stats",
        "ann_panel_epsilon_degree",
        "embed_dim_kurtosis",
        "orders_status_priority_cramers_v",
        # round-10 wave E
        "docs_vocab_chao1_unseen",
        "docs_bigram_kn_discount",
        "events_gap_geometric_gof",
        "events_value_differential_entropy",
        "mm_audio_zero_crossings",
        "orders_value_hill_tail",
        # round-10 wave F
        "mm_jpeg12_decode",
        "docs_lexical_richness_indices",
        "orders_totalprice_benford12",
        # round-11: the registered bank_r11 eighteen
        "events_value_quartile_dispersion",
        "docs_word_burstiness_fano",
        "events_value_lorenz_asymmetry",
        "part_brand_price_icc",
        "events_weekly_user_jaccard",
        "orders_interpurchase_lognormal_fit",
        "customer_segment_simpson_diversity",
        "lineitem_qty_discount_kendall",
        "events_daily_periodogram",
        "events_daily_hurst_rs",
        "events_weekend_cvm",
        "docs_mattr",
        "events_daily_turning_points",
        "embed_anisotropy_panel",
        "events_spectral_entropy",
        "events_gap_weibull_fit",
        "events_weekend_energy_distance",
        "orders_monthly_seasonal_strength",
        # round-11 codec gates
        "mm_resize",
        "mm_mp4_frames",
        # round-11 analytics waves A-D
        "events_daily_acf_ljungbox",
        "events_value_mad_by_type",
        "events_value_gini_by_type",
        "docs_word_recurrence_gap",
        "docs_vocab_gini",
        "docs_length_freq_spearman",
        "lineitem_qty_twoway_anova",
        "customer_segment_welch_pairs",
        "embed_panel_knn_reciprocity",
        # round-12: the registered bank_r12 twenty-two
        "events_value_theil_by_type",
        "events_hour_kl_uniform",
        "events_type_gap_median",
        "events_value_filliben_normality",
        "docs_token_lorenz_deciles",
        "docs_len_by_freq_decile",
        "docs_source_topk_chi2",
        "lineitem_unitprice_iqr_outliers",
        "customer_nation_balance_kruskal",
        "embed_dim_sign_balance",
        "orders_totalprice_weibull_ventiles",
        "events_daily_cusum_max",
        "events_type_value_ks_matrix",
        "customer_neg_balance_share",
        "lineitem_tax_discount_corr",
        "events_user_gap_autocorr",
        "events_hourly_peak_trough",
        "docs_freq_spectrum_shares",
        "events_weekend_anderson_darling",
        "docs_lang_mix_entropy",
        "events_hour_value_median_profile",
        "docs_ttr_quantiles",
        # round-12 codec gate
        "mm_mp4_fragmented",
        # r12 continuation: FLAC gate + wave F (timed, not headline)
        "mm_flac_stats",
        "events_daily_permutation_entropy",
        "events_daily_grubbs",
        "events_daily_max_drawdown",
        "events_hour_hellinger_weekend",
        "events_value_levene",
        "events_type_daily_xcorr",
        "embed_label_silhouette",
        "orders_customer_tenure_quartiles",
        "docs_source_wasserstein",
        "events_hour_tv_distance",
        "stream_ph_drift",
        "mm_gif_animation",
        "events_daily_blomqvist_beta",
        "orders_priority_shiplag_somers_d",
    ]
    times = {}
    shuffle = {}
    # the cascade verdict is snapshotted once and the manifest reads the
    # snapshot — the production shape (run dedup once, consume its
    # artifact) instead of paying the whole dedup family twice in one
    # bench; training_manifest rows are identical either way
    # (tests/test_hardening.py asserts it)
    import shutil
    import tempfile

    snap_dir = tempfile.mkdtemp(prefix="faconne_bench_")
    cascade_snap = os.path.join(snap_dir, "cascade_verdict")
    # Per-key min-of-N timing (judge r10 ask #2a): single-shot walls on
    # persisted-iteration keys wobbled up to 7x across same-commit runs
    # (dup_graph_lpa 4.1 <-> 28.4 s on a stamp-identical plan) — GC /
    # cache-state noise, not plan drift.  Every key now runs
    # FACONNE_BENCH_REPS times (default 2) and reports the min; the
    # per-rep walls go to the bench_times.json sidecar so wobble is
    # visible inside ONE run instead of needing two driver rounds.
    reps = max(1, int(os.environ.get("FACONNE_BENCH_REPS", "2")))
    times_reps = {}
    for name in HEADLINE + extra:
        fn = queries[name]
        walls = []
        for rep in range(reps):
            # shuffle-bytes delta from the first rep only
            sb0 = _shuffle_bytes_total(spark) if rep == 0 else -1
            t0 = time.perf_counter()
            if name == "dedup_cascade":
                # timed write is a real parquet snapshot (the artifact
                # the manifest consumes), not the noop sink
                fn(spark, sf_dir).write.mode("overwrite").parquet(
                    cascade_snap
                )
            elif name == "training_manifest" and os.path.isdir(
                cascade_snap
            ):
                from faconne_spark.queries.pipeline import (
                    training_manifest,
                )

                training_manifest(
                    spark, sf_dir, cascade=spark.read.parquet(cascade_snap)
                ).write.format("noop").mode("overwrite").save()
            else:
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            walls.append(round(time.perf_counter() - t0, 3))
            if rep == 0:
                sb1 = _shuffle_bytes_total(spark)
                shuffle[name] = (
                    (sb1 - sb0) if sb0 >= 0 and sb1 >= 0 else -1
                )
            release_caches()  # drop per-query signature caches
            _reclaim(spark)  # ContextCleaner reaps shuffle/broadcast
        times[name] = min(walls)
        times_reps[name] = walls
    shutil.rmtree(snap_dir, ignore_errors=True)

    total = round(sum(t for n, t in times.items() if n in HEADLINE), 3)
    # the headline grew in round 4 (dedup_cascade / training_manifest /
    # user_rfm_segments); this subtotal is the round-3 24-query set so
    # round-over-round totals stay directly comparable
    r3_set = set(HEADLINE) - {
        "dedup_cascade", "training_manifest", "user_rfm_segments"
    }
    prev_compat = round(sum(t for n, t in times.items() if n in r3_set), 3)
    # per-query shuffle-write bytes go to a SIDECAR file, not the JSON
    # line: in round 4 the one-line output (71 timings + 71 byte counts)
    # outgrew the driver's bounded tail capture and the wall times were
    # truncated away (BENCH_r04.json "parsed": null).  The stdout line
    # stays small enough that truncation can never eat the headline.
    sidecar = {
        "shuffle_write_bytes": shuffle,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_shuffle.json"),
            "w",
        ) as fh:
            json.dump(sidecar, fh, indent=1)
    except OSError:
        pass
    # FULL per-query wall times as a second sidecar (judge r7 ask #6):
    # the stdout tail capture keeps only the short headline line, so
    # the complete ~200-query map must live in a file refreshed every
    # run to be machine-readable at round close.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_times.json"),
            "w",
        ) as fh:
            json.dump(
                {
                    "times_sec": times,
                    "times_all_reps_sec": times_reps,
                    "reps": reps,
                    "machine_calibration_sec": calibration,
                    "spark_calibration_sec": spark_calibration,
                    "shuffle_calibration_sec": shuffle_calibration,
                    "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                    "cpus": cpus,
                },
                fh,
                indent=1,
                sort_keys=True,
            )
    except OSError:
        pass
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "total_r3_comparable_subset": prev_compat,
                "machine_calibration_sec": calibration,
                "spark_calibration_sec": spark_calibration,
                # cross-round comparator (judge r9 ask #5): total wall
                # normalized by the same-process Spark calibration query
                # -- raw walls drift +/-20-30% with VM state; this ratio
                # factors the machine out
                "total_per_spark_calibration": (
                    round(total / spark_calibration, 3)
                    if spark_calibration else None
                ),
                # shuffle-shaped comparator (judge r10 ask #2b): the
                # denominator is a fixed 10M-row 2-stage exchange, the
                # shape that actually dominates multi-second keys
                "shuffle_calibration_sec": shuffle_calibration,
                "total_per_shuffle_calibration": (
                    round(total / shuffle_calibration, 3)
                    if shuffle_calibration else None
                ),
                "bench_reps": reps,
                **bench_comparability(reps),
                "queries": times,
                "sf": sf_val,
                "cpus": cpus,
            }
        )
    )
    # The driver's capture keeps the TAIL of stdout, and the full line
    # above (~4 kB of per-query timings) twice outgrew it — BENCH_r04 and
    # BENCH_r05 both recorded "parsed": null with the headline scalars
    # truncated away.  So the LAST line is a second, short, self-contained
    # JSON object: the round-over-round scalars plus ONLY the headline
    # queries' times (~700 B total) — whatever bounded tail the driver
    # keeps, this parses.  (The full per-query map lives in the line above
    # and, with shuffle bytes, in bench_shuffle.json.)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "total_r3_comparable_subset": prev_compat,
                "machine_calibration_sec": calibration,
                "spark_calibration_sec": spark_calibration,
                # cross-round comparator (judge r9 ask #5): total wall
                # normalized by the same-process Spark calibration query
                # -- raw walls drift +/-20-30% with VM state; this ratio
                # factors the machine out
                "total_per_spark_calibration": (
                    round(total / spark_calibration, 3)
                    if spark_calibration else None
                ),
                # shuffle-shaped comparator (judge r10 ask #2b): the
                # denominator is a fixed 10M-row 2-stage exchange, the
                # shape that actually dominates multi-second keys
                "shuffle_calibration_sec": shuffle_calibration,
                "total_per_shuffle_calibration": (
                    round(total / shuffle_calibration, 3)
                    if shuffle_calibration else None
                ),
                "bench_reps": reps,
                **bench_comparability(reps),
                "queries": {n: t for n, t in times.items() if n in HEADLINE},
                "queries_timed": len(times),
                "sf": sf_val,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
