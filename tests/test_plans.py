"""Plan-shape assertions: the engine must produce the plans a Spark
expert would write by hand — pushdown into the parquet scan, broadcast
joins for dims, partial aggregation, and no cartesian products in the
LSH/dedup paths."""

import pytest

from faconne_spark import Agg, Keys, Transformer, V


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_where_pushdown_reaches_scan(spark, tables):
    t = Transformer(
        [Keys("l_returnflag", "l_quantity")],
        {V.l_returnflag: Agg("sum(l_quantity) AS s")},
        where=["l_quantity < 30", "l_shipdate <= date'1998-09-02'"],
    )
    plan = plan_of(t(tables["lineitem"]))
    assert "PushedFilters: [" in plan
    assert "LessThan(l_quantity,30.0)" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1].split("]")[0]


def test_column_pruning(spark, tables):
    t = Transformer(
        [Keys("l_returnflag", "l_quantity")],
        {V.l_returnflag: Agg("sum(l_quantity) AS s")},
    )
    plan = plan_of(t(tables["lineitem"]))
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_quantity" in read and "l_returnflag" in read
    assert "l_extendedprice" not in read, "unused columns must be pruned"


def test_partial_aggregation_before_exchange(spark, tables):
    t = Transformer(
        [Keys("l_returnflag", "l_quantity")],
        {V.l_returnflag: Agg("sum(l_quantity) AS s")},
    )
    plan = plan_of(t(tables["lineitem"]))
    before_exchange = plan.split("Exchange")[-1]
    assert "partial_sum" in before_exchange, "map-side combine missing"


def test_broadcast_join_on_dims(spark, sf_dir):
    from faconne_spark.queries.tpch import q5_local_volume

    plan = plan_of(q5_local_volume(spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_no_cartesian_in_lsh(spark, sf_dir):
    from faconne_spark.queries.pipeline import dedup_minhash_lsh, ann_lsh_bucketed

    for q in (dedup_minhash_lsh, ann_lsh_bucketed):
        plan = plan_of(q(spark, sf_dir))
        assert "CartesianProduct" not in plan, q.__name__


def test_brute_ann_broadcasts_queries(spark, sf_dir):
    from faconne_spark.queries.pipeline import ann_cosine_topk

    plan = plan_of(ann_cosine_topk(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_no_python_eval_in_text_ops(spark, sf_dir):
    """Text ops stay JVM-side. (Higher-order lambda functions are not
    whole-stage-codegen-eligible by design, so we assert absence of
    Python eval nodes here and codegen on the scalar-expression path
    below.)"""
    from faconne_spark.queries.pipeline import text_quality

    plan = plan_of(text_quality(spark, sf_dir))
    assert "BatchEvalPython" not in plan, "no row-at-a-time Python UDFs"
    assert "ArrowEvalPython" not in plan


def test_wholestage_codegen_on_scalar_path(spark, sf_dir):
    from faconne_spark.queries.tpch import q6_forecast

    df = q6_forecast(spark, sf_dir)
    df.collect()  # finalize AQE so codegen stages are decided
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "*(" in plan or "WholeStageCodegen" in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_asof_join_single_shuffle(spark, sf_dir):
    from faconne_spark.queries.tpch import asof_join_events

    plan = plan_of(asof_join_events(spark, sf_dir))
    # union + window formulation: no join node at all for the asof core
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 3


def test_semi_join_for_exists(spark, sf_dir):
    from faconne_spark.queries.tpch import q4_priority

    plan = plan_of(q4_priority(spark, sf_dir))
    assert "LeftSemi" in plan


def test_knn_broadcasts_queries_not_corpus(spark, sf_dir):
    """knn/ANN: the query set broadcasts; the corpus is never the build
    side of a shuffle for the scoring join."""
    from faconne_spark.queries.pipeline import knn_classify_labels

    plan = plan_of(knn_classify_labels(spark, sf_dir))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan or "BroadcastNestedLoopJoin" in plan


def test_simhash_partial_agg_before_shuffle(spark, sf_dir):
    """SimHash counters must partial-aggregate map-side: the shuffle
    carries one 60-counter row per doc, not the exploded token stream."""
    from faconne_spark.queries.pipeline import dedup_simhash

    plan = plan_of(dedup_simhash(spark, sf_dir))
    # bit votes are count_if aggregates since the 2c>n rewrite, so the
    # map-side combine shows up as partial_count, not partial_sum
    assert "partial_count" in plan
    assert "CartesianProduct" not in plan


def test_pii_scrub_is_map_only(spark, sf_dir):
    """PII scrub: no exchange except the parallelism-guard repartition —
    a pure map pass over the scan."""
    from faconne_spark.queries.pipeline import text_pii_scrub

    plan = plan_of(text_pii_scrub(spark, sf_dir))
    # RoundRobin repartition (spread) is allowed; hash/range exchanges are not
    import re

    hash_ex = re.findall(r"Exchange (hash|range)partitioning", plan)
    assert not hash_ex, f"unexpected shuffles: {hash_ex}"


def test_aqe_splits_skewed_join(spark, sf_dir):
    """Skew path: a hot key (one user owning ~half the fact rows) is
    split by AQE's skew-join handling at execution time — the adaptive
    final plan marks the sort-merge join as skew=true."""
    from pyspark.sql import functions as F

    from faconne_spark.queries import T

    ev = T(spark, sf_dir, "events").select("user_id", "value")
    # manufacture skew: replicate one key to dominate, sized above the
    # skewed-partition threshold relative to the median partition
    # one hot key with incompressible values, spread over 8 map tasks —
    # AQE splits a skewed reduce partition at mapper-block granularity,
    # so a single-mapper hot side would be unsplittable
    hot = (
        ev.limit(1)
        .select(
            F.lit(999_999_999).alias("user_id"),
            F.explode(F.sequence(F.lit(1), F.lit(500_000))).alias("i"),
        )
        .repartition(8)
        .select("user_id", (F.rand(seed=5) * F.col("i")).alias("value"))
    )
    big = ev.union(hot)
    # independent dim side (deriving it from `big` would reuse the same
    # exchange, which blocks OptimizeSkewedJoin)
    dim = ev.select("user_id").distinct().union(
        hot.limit(1).select("user_id")
    )

    old = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        j = big.join(dim, "user_id")
        n = len(j.collect())  # execute THIS plan → AQE finalizes it
        assert n == big.count()
        final = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final
        assert "skew=true" in final, "AQE skew-join did not trigger"
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_repetition_map_only(spark, sf_dir):
    """text_repetition is a pure map pass: the sorted-run-length lambda
    replaces the bigram explode entirely — the plan must contain NO
    exchange, no join, and no Python eval."""
    from faconne_spark.queries.pipeline import text_repetition

    plan = plan_of(text_repetition(spark, sf_dir))
    # spread()'s round-robin input rebalance is the ONLY allowed
    # exchange; no data-dependent (hash) shuffle may appear
    assert "Exchange hashpartitioning" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_topk_ngrams_fused_limit(spark, sf_dir):
    """Corpus top-k must fuse sort+limit into TakeOrderedAndProject —
    a global Sort of the ngram table would be a scale killer."""
    from faconne_spark.queries.pipeline import docs_topk_ngrams

    plan = plan_of(docs_topk_ngrams(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan


def test_logprob_broadcasts_freq_table(spark, sf_dir):
    """The vocabulary-sized frequency table must broadcast back onto the
    token stream — a sort-merge join would shuffle the whole stream."""
    from faconne_spark.queries.pipeline import text_unigram_logprob

    plan = plan_of(text_unigram_logprob(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_label_centroids_partial_agg(spark, sf_dir):
    from faconne_spark.queries.pipeline import embed_label_centroids

    plan = plan_of(embed_label_centroids(spark, sf_dir))
    assert "partial_avg" in plan
    assert "BatchEvalPython" not in plan


def test_containment_no_cartesian(spark, sf_dir):
    """Containment candidates come from the rare-shingle inverted index
    — never an all-pairs product."""
    from faconne_spark.queries.pipeline import dedup_containment

    plan = plan_of(dedup_containment(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_tfidf_broadcasts_df_table(spark, sf_dir):
    from faconne_spark.queries.pipeline import doc_tfidf_keywords

    plan = plan_of(doc_tfidf_keywords(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_winnowing_no_cartesian(spark, sf_dir):
    from faconne_spark.queries.pipeline import dedup_winnowing

    plan = plan_of(dedup_winnowing(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_pq_broadcasts_codebook_and_lut(spark, sf_dir):
    """PQ: the codebook and the per-query lookup table must broadcast —
    the corpus-sized code relation must never sort-merge against them."""
    from faconne_spark.queries.pipeline import ann_pq_adc

    plan = plan_of(ann_pq_adc(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "partial_max_by" in plan or "partial_sum" in plan


def test_graph_stats_no_cartesian(spark, sf_dir):
    from faconne_spark.queries.pipeline import dup_graph_stats

    plan = plan_of(dup_graph_stats(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_join_skew_report_no_global_sort(spark, sf_dir):
    """Top-N per join key must compile to TakeOrderedAndProject (a
    per-partition heap), never a global Sort of the distinct-key
    relation."""
    from faconne_spark.queries.tpch_ext import join_skew_report

    plan = plan_of(join_skew_report(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan


def test_snapshot_diff_single_join(spark, sf_dir):
    """The snapshot diff is one full-outer join on doc_id plus a
    map-side-combined rollup — no cartesian, no extra exchanges."""
    from faconne_spark.queries.pipeline import corpus_snapshot_diff

    plan = plan_of(corpus_snapshot_diff(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


def test_contamination_embedding_broadcasts_benchmark(spark, sf_dir):
    """Decontamination must broadcast the benchmark side (corpus never
    shuffles for scoring) and keep the per-vector max a partial agg."""
    from faconne_spark.queries.curation import contamination_embedding

    plan = plan_of(contamination_embedding(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "partial_max" in plan.split("Exchange")[-1] or "partial" in plan
    assert "BatchEvalPython" not in plan


def test_sample_temperature_has_no_window_or_python(spark, sf_dir):
    """Mixture sampling is window-free (membership by hash-budget
    comparison) with the stats relation broadcast — the corpus is one
    map-side pass."""
    from faconne_spark.queries.curation import sample_temperature

    plan = plan_of(sample_temperature(spark, sf_dir))
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan


def test_scd2_merge_single_join(spark, sf_dir):
    """The SCD2 array-of-struct/explode formulation must run exactly ONE
    join of dim vs updates (a UNION formulation would run it twice)."""
    from faconne_spark.queries.curation import scd2_customer_merge

    plan = plan_of(scd2_customer_merge(spark, sf_dir))
    joins = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") + (
        plan.count("BroadcastHashJoin")
    )
    assert joins == 1, f"expected exactly one dim-vs-updates join:\n{plan}"
    assert "Generate explode" in plan or "Generate" in plan


def test_zorder_key_is_map_side(spark, sf_dir):
    """The Morton-key audit is one partial-agg shuffle on the cell id —
    no joins, no windows, key computed in the scan projection."""
    from faconne_spark.queries.curation import events_zorder_key

    plan = plan_of(events_zorder_key(spark, sf_dir))
    assert "Join" not in plan
    assert "Window" not in plan
    assert "partial_count" in plan.split("Exchange")[-1] or (
        "partial_count" in plan
    )


def test_chunk_overlap_map_only(spark, sf_dir):
    """docs_chunk_overlap is a pure map-side 1→N explode: no
    data-dependent shuffle, no join, no Python eval."""
    from faconne_spark.queries.curation import docs_chunk_overlap

    plan = plan_of(docs_chunk_overlap(spark, sf_dir))
    assert "Exchange hashpartitioning" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_bigram_logprob_broadcasts_model(spark, sf_dir):
    """The vocabulary-sized history/vocab relations must broadcast back
    onto the stream.  The bigram-count side carries NO forced hint
    (distinct bigrams grow with the corpus, not the vocabulary) — at
    gate scale AQE still broadcasts it, so the executed plan here shows
    broadcast joins only; at 100 TB it degrades to a shuffle join on
    'bg' instead of an OOM."""
    from faconne_spark.queries.curation import docs_bigram_logprob

    plan = plan_of(docs_bigram_logprob(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_gopher_rules_map_only(spark, sf_dir):
    """Gopher rules are one tokenize + expressions: no data-dependent
    shuffle, no join, no Python eval."""
    from faconne_spark.queries.pipeline import text_gopher_rules

    plan = plan_of(text_gopher_rules(spark, sf_dir))
    assert "Exchange hashpartitioning" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_pca_gramian_partial_agg_no_cartesian(spark, sf_dir):
    """The outer-product sum must combine map-side (the exchange
    carries d² rows per partition, not d² per vector) and the totals
    relation must broadcast."""
    from faconne_spark.queries.curation import embed_pca_gramian

    plan = plan_of(embed_pca_gramian(spark, sf_dir))
    # tree print order: final agg, Exchange, THEN the map side — so the
    # partial_sum must appear after the hash exchange line
    map_side = plan.split("Exchange hashpartitioning")[1]
    assert "partial_sum" in map_side, "map-side combine missing"
    assert "CartesianProduct" not in plan


def test_semantic_dedup_joins_on_cluster(spark, sf_dir):
    """SemDedup's pairwise step joins on cid — never a cartesian."""
    from faconne_spark.operators.dedup import release_caches
    from faconne_spark.queries.pipeline import dedup_semantic

    plan = plan_of(dedup_semantic(spark, sf_dir))
    release_caches()
    assert "CartesianProduct" not in plan


def test_fuzzy_pairs_block_join(spark, sf_dir):
    """Blocked fuzzy matching joins on the blocking key — never a
    cartesian, and the Levenshtein filter runs JVM-side."""
    from faconne_spark.queries.curation import customer_fuzzy_matches

    plan = plan_of(customer_fuzzy_matches(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "levenshtein" in plan
    assert "BatchEvalPython" not in plan


def test_plan_report_surface(spark, sf_dir):
    """plan_report turns the plan-shape checks into a programmatic
    audit: pushdown and broadcast visible on a joined query, a UDF-free
    map pass reports no python eval and no hash exchange."""
    from faconne_spark.queries.pipeline import text_quality
    from faconne_spark.queries.tpch import q5_local_volume
    from faconne_spark.session import plan_report

    r = plan_report(q5_local_volume(spark, sf_dir))
    assert r["n_broadcast_joins"] >= 1
    assert not r["has_cartesian"]
    assert any(s["pushed_filters"] for s in r["scans"])

    m = plan_report(text_quality(spark, sf_dir))
    assert not m["has_python_eval"]
    assert "hashpartitioning" not in m["exchange_kinds"]


def test_r5_ops_plan_shapes(spark, sf_dir):
    """Round-5 operators produce the plans you'd write by hand:
    fertility is one groupBy with map-side combine and ZERO joins; the
    CMS sketch rides as a broadcast and tops out in a TakeOrdered (no
    global Sort); CDC windows per doc (no single-partition window);
    novelty and the DSIR draw stay join-sane (no cartesian)."""
    from faconne_spark.queries.curation import (
        docs_cdc_chunks,
        docs_dsir_resample,
        docs_ngram_novelty,
        docs_token_cms_topk,
        text_tokenizer_fertility,
    )

    p = plan_of(text_tokenizer_fertility(spark, sf_dir))
    assert "partial_" in p and "Join" not in p
    assert "BatchEvalPython" not in p

    p = plan_of(docs_token_cms_topk(spark, sf_dir))
    assert "BroadcastExchange" in p or "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p

    p = plan_of(docs_cdc_chunks(spark, sf_dir))
    # the running boundary count must be a doc-partitioned window, not
    # a global single-partition sort
    assert "SinglePartition" not in p
    assert "CartesianProduct" not in p

    for q in (docs_ngram_novelty, docs_dsir_resample):
        p = plan_of(q(spark, sf_dir))
        assert "CartesianProduct" not in p, q.__name__
        assert "BatchEvalPython" not in p, q.__name__
    p = plan_of(docs_dsir_resample(spark, sf_dir))
    assert "TakeOrderedAndProject" in p


def test_r5b_sketch_ops_plan_shapes(spark, sf_dir):
    """The sketch wave keeps its promised shapes: HLL register
    extraction partial-aggs map-side with no Python and no cartesian;
    the bloom bitmap rides a BroadcastExchange onto the incoming side
    (never a shuffle join against the raw history); EWMA is one
    hash aggregation with zero joins and no global sort."""
    from faconne_spark.queries.curation import (
        dedup_bloom_prefilter,
        events_ewma,
        events_hll_distinct,
    )

    p = plan_of(events_hll_distinct(spark, sf_dir))
    assert "partial_" in p
    assert "BatchEvalPython" not in p and "CartesianProduct" not in p

    p = plan_of(dedup_bloom_prefilter(spark, sf_dir))
    assert "BroadcastExchange" in p
    assert "BatchEvalPython" not in p and "CartesianProduct" not in p

    p = plan_of(events_ewma(spark, sf_dir))
    assert "Join" not in p and "SinglePartition" not in p
    assert "BatchEvalPython" not in p


def test_hll_overlap_joins_only_register_tables(spark, sf_dir):
    """The overlap estimate's joins run over register/pair tables (≤
    groups×256 rows) — no cartesian over the events input, no Python."""
    from faconne_spark.queries.curation import events_hll_overlap

    p = plan_of(events_hll_overlap(spark, sf_dir))
    assert "BatchEvalPython" not in p
    # the pair enumeration is the one intentional nested-loop join,
    # and it must ride a broadcast of the tiny pair relation
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "partial_" in p


def test_cusum_windows_partition_by_key(spark, sf_dir):
    """Both CUSUM windows ride the entity-key partitioning — no
    single-partition window, no Python, no cartesian."""
    from faconne_spark.queries.curation import events_cusum_drift

    p = plan_of(events_cusum_drift(spark, sf_dir))
    assert "SinglePartition" not in p
    assert "BatchEvalPython" not in p and "CartesianProduct" not in p
    assert "BroadcastExchange" in p  # median/MAD ride broadcasts


def test_split_leakage_and_matryoshka_plan_shapes(spark, sf_dir):
    """Split leakage is one fingerprint groupBy + equi-join (no
    cartesian, no Python); the matryoshka ablations broadcast the query
    set and never shuffle the corpus for scoring."""
    from faconne_spark.queries.curation import docs_split_leakage
    from faconne_spark.queries.pipeline import embed_matryoshka_recall

    p = plan_of(docs_split_leakage(spark, sf_dir))
    assert "partial_" in p
    assert "BatchEvalPython" not in p and "CartesianProduct" not in p

    p = plan_of(embed_matryoshka_recall(spark, sf_dir))
    assert "BroadcastExchange" in p
    assert "BatchEvalPython" not in p


def test_active_users_rollup_folds_registers(spark, sf_dir):
    """The WAU estimate joins register tables against a broadcast day
    list — events are scanned for registers and the exact calibration,
    never re-shuffled for the sketch windows."""
    from faconne_spark.queries.curation import events_active_users_rollup

    p = plan_of(events_active_users_rollup(spark, sf_dir))
    assert "BroadcastExchange" in p
    assert "partial_" in p
    assert "BatchEvalPython" not in p and "CartesianProduct" not in p


def test_setsim_prefix_no_cartesian(spark, sf_dir):
    """Prefix-filter join: candidates come from a prefix equi-join and
    the verify is a two-key equi-join — no cartesian anywhere, df
    ranking windows partition per doc."""
    from faconne_spark.queries.curation import dedup_setsim_prefix

    p = plan_of(dedup_setsim_prefix(spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p
    assert "SinglePartition" not in p


def test_priority_sample_is_take_ordered(spark, sf_dir):
    """The top-(k+1) draw must be a TakeOrdered (per-partition heap),
    never a global sort of the corpus."""
    from faconne_spark.queries.curation import sample_priority

    p = plan_of(sample_priority(spark, sf_dir))
    assert "TakeOrderedAndProject" in p
    assert "BatchEvalPython" not in p


def test_r5c_ops_plan_shapes(spark, sf_dir):
    """Bounded-lookback dedup self-joins the DAILY fingerprint relation
    (never events×events); the rolling window slides over the
    pre-aggregated day relation (its single-partition range frame is
    calendar-bounded BY construction — the aggregate must sit below the
    window); the join-size estimate is aggregate-then-multiply with no
    cartesian."""
    from faconne_spark.queries.curation import (
        dedup_recent_window,
        join_size_from_stats,
        win_rolling_7d,
    )

    p = plan_of(dedup_recent_window(spark, sf_dir))
    assert "partial_" in p
    assert "CartesianProduct" not in p and "BatchEvalPython" not in p

    p = plan_of(win_rolling_7d(spark, sf_dir))
    # aggregate (daily rollup) below the window operator
    assert p.index("Window") < p.index("Scan parquet")
    assert "partial_" in p and "BatchEvalPython" not in p

    p = plan_of(join_size_from_stats(spark, sf_dir))
    assert "partial_count" in p
    assert "BatchEvalPython" not in p


def test_r5d_analytics_plan_shapes(spark, sf_dir):
    """The analytics wave keeps its scale contracts: sessionization
    windows partition by user (no single-partition window over
    events); the audience/basket self-joins are equi-joins, never
    cartesian; the diversity gauge reads the corpus EXACTLY once; the
    range-partition plan broadcasts its one-row cuts; the skyline's
    exact sweep sits above the broadcast bucket prune."""
    from faconne_spark.queries.curation import (
        dup_graph_lpa,
        embed_diversity,
        events_audience_overlap,
        events_range_partition_plan,
        events_sessionize,
        orders_basket_lift,
        part_skyline,
    )

    p = plan_of(events_sessionize(spark, sf_dir))
    assert "hashpartitioning(user_id" in p
    assert "SinglePartition" not in p
    assert "partial_" in p and "BatchEvalPython" not in p

    for q in (events_audience_overlap, orders_basket_lift):
        p = plan_of(q(spark, sf_dir))
        assert "CartesianProduct" not in p, q.__name__
        assert "BatchEvalPython" not in p, q.__name__

    p = plan_of(embed_diversity(spark, sf_dir))
    assert p.count("Scan parquet") == 1, "diversity must scan once"
    assert "partial_sum" in p and "BatchEvalPython" not in p

    p = plan_of(events_range_partition_plan(spark, sf_dir))
    assert "BroadcastExchange" in p or "BroadcastNestedLoopJoin" in p
    assert "partial_percentile" in p or "partial_" in p

    p = plan_of(part_skyline(spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p

    p = plan_of(dup_graph_lpa(spark, sf_dir))
    assert "CartesianProduct" not in p and "BatchEvalPython" not in p


def test_bank_r6_plan_shapes(spark, sf_dir):
    """The banked evaluation-stats wave keeps its scale contracts:
    every window partitions on a bounded key (AUC/KS run over
    distinct-score/bin histograms, never rank-sorting the raw stream);
    every aggregation partial-combines map-side; nothing drops into
    Python eval; the only nested-loop join is the KS grid densify over
    the bounded (groups × bins) relation."""
    from faconne_spark.queries.bank_r6 import BANK_QUERIES

    shapes = {
        "events_auc_purchase": "hashpartitioning(day",
        "events_value_bootstrap": "hashpartitioning(event_type",
        "events_ks_value_drift": "hashpartitioning(grp",
        "docs_rater_kappa": "hashpartitioning(source",
        "events_day_concurrency": "hashpartitioning(day",
        "events_benford": "hashpartitioning(grp",
        "ann_rrf_fusion": "hashpartitioning(q_id",
        "part_copurchase_ra": "hashpartitioning(id_a",
        "events_quantile_normalize": "hashpartitioning(grp",
        "events_value_weighted_quantiles": "hashpartitioning(event_type",
        "events_type_value_mi": "hashpartitioning(day",
        "events_type_entropy": "hashpartitioning(day",
    }
    for key, part in shapes.items():
        p = plan_of(BANK_QUERIES[key](spark, sf_dir))
        assert part in p, key
        if key != "events_quantile_normalize":
            # (its pooled-ECDF window is a deliberate global window
            #  over the ≤ n_bins pooled-bin relation)
            assert "SinglePartition" not in p, key
        assert "partial_" in p, key
        assert "BatchEvalPython" not in p, key
        assert "CartesianProduct" not in p, key
        if key not in (
            "events_ks_value_drift",  # bounded (groups × bins) grid
            "events_benford",  # bounded (groups × 9 digits) grid
            "ann_rrf_fusion",  # broadcast query fan-out (by design:
            #                    queries broadcast, corpus never shuffles)
            "events_quantile_normalize",  # ECDF theta-join over the
            #                    bounded (groups × bins) × bins grid
        ):
            assert "BroadcastNestedLoopJoin" not in p, key


def test_no_cartesian_in_any_plan_snapshot():
    """Mechanical repo-wide invariant (was a manual per-round grep):
    no registry key's stamped physical plan may contain a
    CartesianProduct.  Bounded grid builds must broadcast their small
    side explicitly (BroadcastNestedLoopJoin) — the r10 shiplag-KS
    lesson: the planner falls back to CartesianProduct exactly when
    upstream stats are unknown, which is also when the input might
    not be small."""
    import os

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "plans",
    )
    offenders = []
    for name in sorted(os.listdir(plans_dir)):
        if not name.endswith(".txt"):
            continue
        with open(os.path.join(plans_dir, name)) as fh:
            if "CartesianProduct" in fh.read():
                offenders.append(name)
    assert not offenders, f"CartesianProduct in plans: {offenders}"
