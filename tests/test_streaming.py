"""Structured Streaming: the same transformations run as real streams
(readStream → memory sink) and agree with their batch formulations."""

import os
import time

import pytest
from pyspark.sql import functions as F

from faconne_spark.queries import T
from faconne_spark.streaming import (
    read_stream_parquet,
    sessionize_streaming,
    streaming_window_counts,
    window_counts,
)


def _run_stream(q, name: str, timeout_s: int = 120):
    query = (
        q.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(timeout_s)
    return query


def test_streaming_window_counts_matches_batch(spark, sf_dir):
    stream_df = streaming_window_counts(
        spark, os.path.join(sf_dir, "events.parquet"), "1 hour"
    )
    q = _run_stream(stream_df, "win_counts")
    try:
        got = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in spark.sql("SELECT * FROM win_counts").collect()
        }
        batch = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in window_counts(T(spark, sf_dir, "events"), "1 hour").collect()
        }
        assert got == batch
        assert len(got) > 0
    finally:
        q.stop()


def test_streaming_sessionization_runs(spark, sf_dir):
    stream_df = sessionize_streaming(
        spark, os.path.join(sf_dir, "events.parquet"), 30
    )
    q = _run_stream(stream_df, "sessions")
    try:
        rows = spark.sql("SELECT * FROM sessions").collect()
        assert len(rows) > 0
        # session invariant: total events across sessions == table count
        total = sum(r["n_events"] for r in rows)
        assert total == T(spark, sf_dir, "events").count()
    finally:
        q.stop()


def test_foreach_batch_sink(spark, sf_dir):
    """for-each analog in streaming: foreachBatch side effects."""
    seen = []

    def sink(batch_df, batch_id):
        seen.append((batch_id, batch_df.count()))

    stream = read_stream_parquet(spark, os.path.join(sf_dir, "events.parquet"))
    q = (
        stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    assert sum(n for _, n in seen) == spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")
    ).count()


def test_streaming_dedup_bounded_state(spark, sf_dir, tmp_path):
    """dropDuplicatesWithinWatermark: duplicated input → unique output."""
    from faconne_spark.streaming import streaming_dedup

    events = T(spark, sf_dir, "events").limit(200)
    dup_dir = str(tmp_path / "dup_events")
    events.union(events).write.parquet(dup_dir)

    out = streaming_dedup(spark, dup_dir)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got = spark.sql("SELECT count(*) c, count(DISTINCT event_id) d FROM dedup_stream").first()
    assert got["c"] == got["d"] == events.select("event_id").distinct().count()


def test_stateful_user_totals_across_batches(spark, sf_dir, tmp_path):
    """applyInPandasWithState: state carries across micro-batches —
    after the last batch, per-user totals equal the batch groupBy, and
    at least one user saw fewer rows in its final batch than in total
    (proof the final numbers came out of carried state, not one batch).
    """
    from faconne_spark.streaming import user_totals_stateful

    events = T(spark, sf_dir, "events").select("user_id", "ts", "value").limit(500)
    src = str(tmp_path / "batched_events")
    # two files → two micro-batches (maxFilesPerTrigger=1), split so
    # most users have events in BOTH batches — the totals can only be
    # right if per-user state survives the batch boundary
    half = events.withColumn(
        "_h", F.expr("abs(hash(user_id, ts, value)) % 2")
    )
    half.filter("_h = 0").drop("_h").coalesce(1).write.parquet(src)
    half.filter("_h = 1").drop("_h").coalesce(1).write.parquet(src, mode="append")

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = user_totals_stateful(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()

    import collections

    rows = spark.sql("SELECT * FROM user_totals").collect()
    assert len(rows) > 0
    # cumulative n_events is monotone → the max-n_events emission per
    # user is its final state, independent of sink row order
    last = {}
    for r in rows:
        if r["user_id"] not in last or r["n_events"] > last[r["user_id"]]["n_events"]:
            last[r["user_id"]] = r
    # state carry proof: some user's final batch saw fewer rows than its total
    assert any(r["batch_events"] < r["n_events"] for r in last.values())
    expected = {
        r["user_id"]: (r["n"], round(r["tv"], 6))
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("tv"))
        .collect()
    }
    got = {
        u: (r["n_events"], round(r["total_value"], 6)) for u, r in last.items()
    }
    assert got == expected


def test_cusum_state_carries_across_batches(spark, sf_dir, tmp_path):
    """CUSUM detector: state (n, mean, cusums) must carry across
    micro-batches — the final per-user n equals the total event count,
    and a drift injected in batch 2 is flagged using batch-1 history."""
    from faconne_spark.streaming import user_cusum_stateful

    base = [(1, float(v)) for v in [10, 10, 10, 10, 10, 10]]
    drift = [(1, float(v)) for v in [30, 30, 30, 30]]
    schema = "user_id long, value double"
    src = str(tmp_path / "cusum_src")
    spark.createDataFrame(base, schema).coalesce(1).write.parquet(src)
    spark.createDataFrame(drift, schema).coalesce(1).write.parquet(
        src, mode="append"
    )
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = user_cusum_stateful(stream, k=0.5, h=5.0)
    q = (
        out.writeStream.format("memory")
        .queryName("cusum_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    rows = spark.sql(
        "SELECT * FROM cusum_out ORDER BY n_events"
    ).collect()
    assert rows[-1]["n_events"] == 10  # state carried: 6 + 4
    assert rows[-1]["drifted"]  # the 30s blew past h using prior mean
    first_batch = [r for r in rows if r["n_events"] == 6]
    assert first_batch and not first_batch[0]["drifted"]


def test_stream_static_enrich(spark, sf_dir, tmp_path):
    """Stream-static join: every streamed event carries its user's
    static aggregate; results equal the batch join."""
    from faconne_spark.streaming import stream_static_enrich

    events = T(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    ).limit(300)
    src = str(tmp_path / "sse")
    events.coalesce(1).write.parquet(src)
    dim = events.groupBy("user_id").agg(F.count("*").alias("user_events"))
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    out = stream_static_enrich(stream, dim)
    q = (
        out.writeStream.format("memory").queryName("sse_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    q.stop()
    got = spark.sql(
        "SELECT count(*) AS n, sum(user_events) AS s FROM sse_out"
    ).first()
    want = events.join(dim, "user_id").agg(
        F.count("*").alias("n"), F.sum("user_events").alias("s")
    ).first()
    assert (got["n"], got["s"]) == (want["n"], want["s"])


def test_stream_stream_self_join(spark, sf_dir, tmp_path):
    """Stream-stream interval self-join runs as a real streaming query
    (bounded state via watermark + time-range condition) and matches
    the equivalent batch join."""
    from faconne_spark.streaming import (
        read_stream_parquet,
        stream_stream_self_join,
    )

    events = T(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    ).limit(400)
    src = str(tmp_path / "ssj")
    events.coalesce(1).write.parquet(src)
    stream = read_stream_parquet(spark, src)
    out = stream_stream_self_join(stream, window_minutes=30)
    q = (
        out.writeStream.format("memory").queryName("ssj_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    q.stop()
    got = spark.sql("SELECT count(*) AS n FROM ssj_out").first()["n"]
    e = events
    want = (
        e.alias("a")
        .join(
            e.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.event_id") != F.col("a.event_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("interval 30 minutes")),
        )
        .count()
    )
    assert got == want and want > 0


def test_dsl_binder_on_stream(spark, sf_dir, tmp_path):
    """The faconne domain binder (explode/field/filter steps) is
    stateless, so a compiled Transformer binds STREAMING input too —
    the DSL front-end composes with Structured Streaming. Bound rows
    from the stream equal the batch binding."""
    from faconne_spark import Keys, Transformer, V

    events = T(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", "event_type"
    ).limit(300)
    src = str(tmp_path / "dsl_stream")
    events.coalesce(1).write.parquet(src)
    t = Transformer(
        [Keys("event_id", "user_id", "value", "event_type")],
        None,
        where=["value > 100", "event_type = 'click'"],
    )
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    bound = t.bind(stream)
    assert bound.isStreaming
    q = (
        bound.writeStream.format("memory").queryName("dsl_bound")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    q.stop()
    got = spark.sql("SELECT count(*) n, sum(value) s FROM dsl_bound").first()
    want = t.bind(events).agg(
        F.count("*").alias("n"), F.sum("value").alias("s")
    ).first()
    assert (got["n"], round(got["s"], 6)) == (want["n"], round(want["s"], 6))
    assert want["n"] > 0


def test_streaming_incremental_dedup(spark, tmp_path):
    """Two micro-batches through the foreachBatch incremental dedup:
    batch-2 duplicates of batch-1 keepers are flagged against the
    PERSISTED state, and the state grows only by new fingerprints."""
    from faconne_spark.streaming import streaming_incremental_dedup

    b1 = [(0, "alpha text"), (1, "beta text"), (2, "alpha  TEXT")]
    b2 = [(10, "alpha text"), (11, "gamma text"), (12, "gamma text")]
    schema = "doc_id long, text string"
    src = str(tmp_path / "src")
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(
        src, mode="append"
    )
    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        streaming_incremental_dedup(stream, state, out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()

    res = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert len(res) == 6
    # batch 1: 2 fresh keepers + 1 within-batch dup (normalized match)
    assert not res[0]["dup_of_existing"] and not res[0]["dup_within_batch"]
    assert res[2]["dup_within_batch"] and res[2]["keeper_id"] == 0
    # batch 2: doc 10 duplicates batch-1 keeper 0 via persisted state
    assert res[10]["dup_of_existing"] and res[10]["keeper_id"] == 0
    assert res[12]["dup_within_batch"] and res[12]["keeper_id"] == 11
    # state = exactly the 3 distinct keeper fingerprints
    state_rows = spark.read.parquet(state).collect()
    assert len(state_rows) == 3
    assert {r["keeper_id"] for r in state_rows} == {0, 1, 11}


def test_sliding_windows_streaming_equals_batch(spark, sf_dir, tmp_path):
    """Sliding windows (1 h / 30 min slide) through a real watermarked
    streaming query equal the batch formulation."""
    events = T(spark, sf_dir, "events").select(
        "ts", "event_type", "value"
    ).limit(500)
    src = str(tmp_path / "slide")
    events.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    agg = (
        stream.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
    )
    q = (
        agg.writeStream.format("memory").queryName("slide_out")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    q.stop()
    got = sorted(
        tuple(map(str, r))
        for r in spark.sql("SELECT * FROM slide_out").collect()
    )
    want = sorted(
        tuple(map(str, r))
        for r in events.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
        .collect()
    )
    assert got == want and len(got) > 0


def test_streaming_incremental_dedup_replay_idempotent(spark, tmp_path):
    """Whole-stream replay: re-running the stream with a FRESH
    checkpoint re-delivers the same files under the same epoch ids, and
    dynamic partition overwrite makes the second pass a no-op on the
    output contents.  (The REAL recovery contract — same-epoch replay
    with cross-epoch-colliding fingerprints — is exercised directly in
    test_same_epoch_replay_is_idempotent below.)"""
    from faconne_spark.streaming import streaming_incremental_dedup

    schema = "doc_id long, text string"
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(0, "alpha text"), (1, "beta text")], schema
    ).coalesce(1).write.parquet(src)
    spark.createDataFrame(
        [(10, "alpha text"), (11, "gamma text")], schema
    ).coalesce(1).write.parquet(src, mode="append")
    state = str(tmp_path / "state")
    out = str(tmp_path / "out")

    def run(ckpt):
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            streaming_incremental_dedup(stream, state, out)
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        q.stop()

    run("ckpt1")
    first_out = sorted(
        (r["doc_id"], r["dup_of_existing"], r["keeper_id"])
        for r in spark.read.parquet(out).collect()
    )
    first_state = sorted(
        (r["fingerprint"], r["keeper_id"])
        for r in spark.read.parquet(state).collect()
    )
    assert len(first_out) == 4 and len(first_state) == 3
    run("ckpt2")  # full replay of every epoch
    second_out = sorted(
        (r["doc_id"], r["dup_of_existing"], r["keeper_id"])
        for r in spark.read.parquet(out).collect()
    )
    second_state = sorted(
        (r["fingerprint"], r["keeper_id"])
        for r in spark.read.parquet(state).collect()
    )
    assert second_out == first_out
    assert second_state == first_state


def test_same_epoch_replay_is_idempotent(spark, tmp_path):
    """The REAL foreachBatch recovery contract: on failure the handler
    is re-invoked with the SAME epoch id.  Epoch 1 here contains a
    duplicate of an epoch-0 keeper (a cross-epoch fingerprint
    collision), so if the replay wrongly classified against its OWN
    half-written state — or appended instead of overwriting — either
    the verdicts or the state row count would change."""
    from faconne_spark.streaming import incremental_dedup_epoch

    schema = "doc_id long, text string"
    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    e0 = spark.createDataFrame([(0, "alpha text"), (1, "beta text")], schema)
    e1 = spark.createDataFrame([(10, "alpha text"), (11, "gamma text")], schema)

    incremental_dedup_epoch(e0, 0, state, out)
    incremental_dedup_epoch(e1, 1, state, out)

    def snapshot():
        o = sorted(
            (r["doc_id"], r["dup_of_existing"], r["keeper_id"], r["epoch"])
            for r in spark.read.parquet(out).collect()
        )
        s = sorted(
            (r["fingerprint"], r["keeper_id"], r["epoch"])
            for r in spark.read.parquet(state).collect()
        )
        return o, s

    first = snapshot()
    out_rows, state_rows = first
    assert len(out_rows) == 4 and len(state_rows) == 3
    # doc 10 collides with epoch-0 keeper 0 across the epoch boundary
    assert (10, True, 0, 1) in out_rows

    # replay epoch 1 (failure recovery): must be a bit-exact no-op
    incremental_dedup_epoch(e1, 1, state, out)
    assert snapshot() == first
    # and replaying epoch 0 (replay of an OLDER epoch after epoch 1
    # committed) must not reclassify doc 0 against epoch 1's state
    incremental_dedup_epoch(e0, 0, state, out)
    assert snapshot() == first


def test_legacy_flat_state_dir_fails_loudly(spark, tmp_path):
    """A state_dir written by the old flat-append layout (plain
    .parquet files, no epoch= partitions) must raise, not be silently
    ignored as empty state."""
    from faconne_spark.streaming import incremental_dedup_epoch

    state = str(tmp_path / "state")
    spark.createDataFrame(
        [(123, 0)], "fingerprint bigint, keeper_id bigint"
    ).coalesce(1).write.parquet(state)  # flat layout — no epoch=
    batch = spark.createDataFrame([(5, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="epoch"):
        incremental_dedup_epoch(batch, 0, state, str(tmp_path / "out"))


def test_stream_event_time_is_watermark_compatible(spark, sf_dir):
    """Runtime guard: whatever this Spark version does with parquet
    TIMESTAMP(NANOS) (bigint under nanosAsLong on <= 4.0, timestamp_ntz
    on 4.1+), read_stream_parquet must surface a plain TIMESTAMP ts —
    anything else makes withWatermark throw
    EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE five tests later.  Fail HERE,
    pointedly, when the next runtime bump changes the mapping."""
    stream = read_stream_parquet(spark, os.path.join(sf_dir, "events.parquet"))
    dtype = dict(stream.dtypes)["ts"]
    assert dtype == "timestamp", (
        f"streaming ts arrived as {dtype!r}; extend "
        "faconne_spark.streaming.ensure_event_time for this runtime"
    )
    # the batch loader must agree (oracle comparisons share the dtype)
    assert dict(T(spark, sf_dir, "events").dtypes)["ts"] == "timestamp"


def _rows(df):
    return sorted(tuple(map(str, r)) for r in df.collect())


def test_streaming_corpus_stats_equals_batch(spark, sf_dir, tmp_path):
    """The running-stats state after N micro-batches yields dashboards
    bit-equal to the batch operators over the union of the batches —
    source_stats, corpus_health (including the CROSS-epoch duplicate
    rate), and the quality-gate summary."""
    from faconne_spark.queries.pipeline import (
        corpus_health,
        quality_gate,
        source_stats,
    )
    from faconne_spark.streaming import (
        corpus_health_from_state,
        quality_gate_summary,
        quality_gate_summary_from_state,
        source_stats_from_state,
        streaming_corpus_stats,
    )

    # stage the corpus as a 3-file sf-shaped dir so the SAME path serves
    # the stream (3 micro-batches) and the batch registry operators
    sf_tmp = tmp_path / "sf"
    src = str(sf_tmp / "documents.parquet")
    T(spark, sf_dir, "documents").limit(300).repartition(3).write.parquet(src)
    state = str(tmp_path / "state")

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        streaming_corpus_stats(stream, state)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()

    # >1 epoch actually ran (3 files, 1 per trigger)
    epochs = spark.read.parquet(os.path.join(state, "source_lang")).select(
        "epoch"
    ).distinct().count()
    assert epochs == 3

    sf = str(sf_tmp)
    assert _rows(source_stats_from_state(spark, state)) == _rows(
        source_stats(spark, sf)
    )
    assert _rows(corpus_health_from_state(spark, state)) == _rows(
        corpus_health(spark, sf)
    )
    assert _rows(quality_gate_summary_from_state(spark, state)) == _rows(
        quality_gate_summary(quality_gate(spark, sf))
    )


def test_corpus_stats_same_epoch_replay_idempotent(spark, tmp_path):
    """foreachBatch recovery contract for the stats state: a
    half-written epoch attempt is fully overwritten by the replay, and
    a duplicate text that SPANS epochs still collapses to one
    fingerprint in the merged health rollup."""
    from faconne_spark.streaming import (
        corpus_health_from_state,
        corpus_stats_epoch,
    )

    schema = "doc_id long, text string, source string, lang string, n_chars long"

    def docs(rows):
        return spark.createDataFrame(
            [(i, t, s, lg, len(t)) for i, t, s, lg in rows], schema
        )

    e0 = docs([(0, "shared duplicate text", "web", "en"),
               (1, "unique zero", "web", "en")])
    e1 = docs([(10, "shared duplicate text", "books", "fr"),
               (11, "unique one", "web", "en")])
    state = str(tmp_path / "state")
    corpus_stats_epoch(e0, 0, state)
    # half-written previous attempt at epoch 1: only one row landed
    corpus_stats_epoch(e1.limit(1), 1, state)
    # replay of epoch 1 with the full batch must fully supersede it
    corpus_stats_epoch(e1, 1, state)

    health = corpus_health_from_state(spark, state).collect()[0]
    assert health["n_docs"] == 4
    assert health["n_langs"] == 2 and health["n_sources"] == 2
    # doc 10 duplicates doc 0 ACROSS epochs: 4 docs, 3 fingerprints
    assert health["n_fingerprints"] == 3
    assert health["n_exact_dups"] == 1
    assert health["dup_rate"] == 0.25
    # replaying epoch 1 again is a bit-exact no-op
    before = _rows(corpus_health_from_state(spark, state))
    corpus_stats_epoch(e1, 1, state)
    assert _rows(corpus_health_from_state(spark, state)) == before


def test_transform_with_state_matches_batch_and_legacy(spark, sf_dir, tmp_path):
    """transformWithState (Spark 4 stateful API): same split-into-two-
    micro-batches drive as the applyInPandasWithState test — final
    per-user totals must equal the batch groupBy, with state carried
    across the batch boundary.  Runs on the RocksDB state store
    provider (required by transformWithState); the conf is restored
    afterwards so other tests keep the default provider."""
    from faconne_spark.streaming import (
        transform_with_state_available,
        user_totals_transform_with_state,
    )

    if not transform_with_state_available():
        pytest.skip(
            "transformWithState needs google.protobuf on the workers"
            " (its state-server protocol); not installed here —"
            " processor logic covered by"
            " test_tws_processor_logic_without_runtime"
        )

    events = (
        T(spark, sf_dir, "events").select("user_id", "ts", "value").limit(500)
    )
    src = str(tmp_path / "tws_events")
    half = events.withColumn(
        "_h", F.expr("abs(hash(user_id, ts, value)) % 2")
    )
    half.filter("_h = 0").drop("_h").coalesce(1).write.parquet(src)
    half.filter("_h = 1").drop("_h").coalesce(1).write.parquet(
        src, mode="append"
    )

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    key = "spark.sql.streaming.stateStore.providerClass"
    prior = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        out = user_totals_transform_with_state(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("tws_totals")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "tws_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        q.stop()
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)

    rows = spark.sql("SELECT * FROM tws_totals").collect()
    assert rows
    last = {}
    for r in rows:
        if (
            r["user_id"] not in last
            or r["n_events"] > last[r["user_id"]]["n_events"]
        ):
            last[r["user_id"]] = r
    # the carried-state proof, same as the legacy-API test
    assert any(r["batch_events"] < r["n_events"] for r in last.values())
    expected = {
        r["user_id"]: (r["n"], round(r["tv"], 6))
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("tv"))
        .collect()
    }
    got = {
        u: (r["n_events"], round(r["total_value"], 6))
        for u, r in last.items()
    }
    assert got == expected


def test_tws_processor_logic_without_runtime():
    """Drive the transformWithState processor against a fake
    handle/state — the runtime-free check that its fold (carry state
    across calls, per-batch counts, rounding) is right, so the gated
    integration test above is pure plumbing."""
    import pandas as pd

    from faconne_spark.streaming import UserTotalsProcessor

    class FakeState:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

    class FakeHandle:
        def __init__(self):
            self.state = FakeState()

        def getValueState(self, name, schema, ttlDurationMs=None):
            assert name == "totals"
            return self.state

    p = UserTotalsProcessor()
    h = FakeHandle()
    p.init(h)
    out1 = list(
        p.handleInputRows(
            (7,), iter([pd.DataFrame({"value": [1.0, 2.5]})]), None
        )
    )[0]
    assert out1.iloc[0].to_dict() == {
        "user_id": 7, "n_events": 2, "total_value": 3.5, "batch_events": 2,
    }
    # second micro-batch: totals continue from carried state
    out2 = list(
        p.handleInputRows(
            (7,), iter([pd.DataFrame({"value": [0.5]})]), None
        )
    )[0]
    assert out2.iloc[0].to_dict() == {
        "user_id": 7, "n_events": 3, "total_value": 4.0, "batch_events": 1,
    }
    assert h.state.v == (3, 4.0)


def test_temperature_plan_from_state_equals_batch(spark, sf_dir, tmp_path):
    """The mixture plan derived from the running-stats state, applied
    as the hash-membership test over the union corpus, keeps EXACTLY
    the documents the batch sqrt_temperature_sample operator keeps."""
    from faconne_spark.functions import phash60
    from faconne_spark.operators.text import sqrt_temperature_sample
    from faconne_spark.streaming import streaming_corpus_stats
    from faconne_spark.streaming.stats import temperature_plan_from_state

    sf_tmp = tmp_path / "sf"
    src = str(sf_tmp / "documents.parquet")
    T(spark, sf_dir, "documents").limit(300).repartition(3).write.parquet(src)
    state = str(tmp_path / "state")

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        streaming_corpus_stats(stream, state)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()

    plan = temperature_plan_from_state(spark, state)
    docs = spark.read.parquet(src)
    h = phash60("concat('samp', cast(doc_id as string))", "spark")
    applied = (
        docs.select("doc_id", "source")
        .join(F.broadcast(plan), "source")
        .withColumn(
            "_keep",
            F.expr(
                f"cast(pmod({h}, n_docs) as decimal(38,0)) * sum_w"
                f" < budget * w_micro"
            ),
        )
        .groupBy("source")
        .agg(
            F.max("n_docs").alias("n_docs"),
            F.sum(F.when(F.col("_keep"), 1).otherwise(0)).alias("n_kept"),
        )
    )
    assert _rows(applied) == _rows(sqrt_temperature_sample(docs))


def test_fill_forward_processor_logic_without_runtime():
    """Runtime-free check of the fill-forward fold: NULLs repaired in
    (ts, event_id) order, state seeds the batch, new state = last
    non-null (the same pattern as the totals processor's unit test —
    the sandboxed runtime lacks the TWS protobuf protocol)."""
    import pandas as pd

    from faconne_spark.streaming import _fill_step

    b1 = pd.DataFrame(
        {
            "event_id": [2, 1, 3],
            "user_id": [7, 7, 7],
            "ts": [20, 10, 30],
            "value": [None, 1.5, None],
        }
    )
    out, last = _fill_step(None, [b1])
    assert list(out["event_id"]) == [1, 2, 3]
    assert list(out["value_filled"]) == [1.5, 1.5, 1.5]
    assert last == 1.5

    # second micro-batch: state seeds the leading NULL; a fresh value
    # takes over mid-batch
    b2 = pd.DataFrame(
        {
            "event_id": [4, 5],
            "user_id": [7, 7],
            "ts": [40, 50],
            "value": [None, 9.0],
        }
    )
    out2, last2 = _fill_step(last, [b2])
    assert list(out2["value_filled"]) == [1.5, 9.0]
    assert last2 == 9.0

    # all-null stream with no prior state stays null
    out3, last3 = _fill_step(None, [b2.assign(value=[None, None])])
    assert list(out3["value_filled"]) == [None, None]
    assert last3 is None


def test_streaming_fill_forward_matches_batch(spark, sf_dir, tmp_path):
    """Full-runtime equivalence: streaming fill-forward over two
    event-time-ordered micro-batches equals the batch window operator
    (skips where the TWS protobuf protocol is unavailable)."""
    from faconne_spark.operators.relational import fill_forward
    from faconne_spark.streaming import (
        fill_forward_transform_with_state,
        transform_with_state_available,
    )

    if not transform_with_state_available():
        pytest.skip(
            "transformWithState needs google.protobuf on the workers;"
            " processor logic covered by"
            " test_fill_forward_processor_logic_without_runtime"
        )

    ev = (
        T(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "value")
        .limit(500)
        .withColumn(
            "value",
            F.expr("if(event_id % 5 = 0, cast(null as double), value)"),
        )
    )
    # split into two batches at the per-user event-time median so
    # batches arrive in event-time order per key (the contract)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    halves = ev.withColumn(
        "_rk", F.row_number().over(w)
    ).withColumn(
        "_n", F.count("*").over(Window.partitionBy("user_id"))
    )
    src = str(tmp_path / "ff_events")
    halves.filter("_rk <= _n / 2").drop("_rk", "_n").coalesce(1).write.parquet(src)
    halves.filter("_rk > _n / 2").drop("_rk", "_n").coalesce(1).write.parquet(
        src, mode="append"
    )
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    key = "spark.sql.streaming.stateStore.providerClass"
    prior = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        out = fill_forward_transform_with_state(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("ff_tws")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        got = {
            r["event_id"]: r["value_filled"]
            for r in spark.sql("SELECT * FROM ff_tws").collect()
        }
        want = {
            r["event_id"]: r["value_filled"]
            for r in fill_forward(
                ev, "user_id", ["ts", "event_id"], "value"
            ).collect()
        }
        assert got == want
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)


def test_streaming_value_quantiles_match_batch(spark, sf_dir, tmp_path):
    """Streaming value state: after two micro-batches, (a) the merged
    algebraic stats equal the one-pass batch aggregate, and (b) the
    cross-epoch histogram quantiles equal the batch sketch with the
    same pinned bounds — the mergeable-sufficient-statistics contract
    end-to-end through foreachBatch."""
    from faconne_spark.operators.relational import (
        histogram_quantiles,
        mergeable_stats,
    )
    from faconne_spark.streaming.stats import (
        value_quantiles_from_state,
        value_stats_epoch,
        value_stats_from_state,
    )

    ev = T(spark, sf_dir, "events").select("event_type", "value").limit(600)
    src = str(tmp_path / "vq_events")
    half = ev.withColumn("_h", F.expr("abs(hash(event_type, value)) % 2"))
    half.filter("_h = 0").drop("_h").coalesce(1).write.parquet(src)
    half.filter("_h = 1").drop("_h").coalesce(1).write.parquet(
        src, mode="append"
    )
    bounds = (0.0, 500.0)
    state = str(tmp_path / "vq_state")

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda b, e: value_stats_epoch(b, e, state, bounds, n_bins=32)
        )
        .option("checkpointLocation", str(tmp_path / "vq_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()

    full = spark.read.parquet(src)
    got_stats = {
        r["event_type"]: (r["n"], r["sum_us"], r["min_us"], r["max_us"])
        for r in value_stats_from_state(spark, state).collect()
    }
    want_stats = {
        r["event_type"]: (r["n"], r["sum_us"], r["min_us"], r["max_us"])
        for r in mergeable_stats(full, "event_type", "value").collect()
    }
    assert got_stats == want_stats

    got_q = {
        (r["event_type"], r["q"]): r["estimate"]
        for r in value_quantiles_from_state(
            spark, state, bounds, n_bins=32, qs=(0.5, 0.95)
        ).collect()
    }
    want_q = {
        (r["event_type"], r["q"]): r["estimate"]
        for r in histogram_quantiles(
            full, "value", "event_type", 32, (0.5, 0.95), bounds=bounds
        ).collect()
    }
    assert got_q == want_q and got_q


def test_streaming_cms_equals_batch(spark, sf_dir, tmp_path):
    """The cross-epoch merged count-min sketch yields a top-k BIT-EQUAL
    to the batch operator over the union of the micro-batches (CMS
    counters merge by addition); with a min_count candidate bound, the
    surviving estimates are unchanged (the bound drops candidates, never
    inflates estimates)."""
    from faconne_spark.operators.text import token_cms_topk
    from faconne_spark.streaming.stats import (
        cms_topk_from_state,
        token_cms_epoch,
    )

    w, d, k = 256, 3, 15
    sf_tmp = tmp_path / "sf"
    src = str(sf_tmp / "documents.parquet")
    T(spark, sf_dir, "documents").limit(300).repartition(3).write.parquet(src)
    state = str(tmp_path / "cms_state")

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, eid: token_cms_epoch(df, eid, state, w, d)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    epochs = (
        spark.read.parquet(os.path.join(state, "cms_sketch"))
        .select("epoch").distinct().count()
    )
    assert epochs == 3

    want_rows = token_cms_topk(spark.read.parquet(src), w, d, k).collect()
    got = [tuple(r) for r in cms_topk_from_state(spark, state, w, d, k).collect()]
    want = [tuple(r) for r in want_rows]
    assert got == want and len(got) == k

    # bounded-candidate mode: estimates of surviving tokens unchanged
    state2 = str(tmp_path / "cms_state2")
    for eid, part in enumerate(
        spark.read.parquet(src).randomSplit([1.0, 1.0, 1.0], seed=7)
    ):
        token_cms_epoch(part, eid, state2, w, d, min_count=3)
    full_est = {r["tok"]: r["est"] for r in want_rows}
    for r in cms_topk_from_state(spark, state2, w, d, k).collect():
        if r["tok"] in full_est:
            assert r["est"] == full_est[r["tok"]]


def test_streaming_hll_equals_batch(spark, sf_dir, tmp_path):
    """The cross-epoch max-merged HLL registers yield estimates
    BIT-EQUAL to the batch operator over the union of the micro-batches
    (registers merge by max), and a salt/precision mismatch on re-read
    raises instead of silently merging foreign registers."""
    import pytest as _pytest

    from faconne_spark.operators.sketches import hll_distinct
    from faconne_spark.streaming.stats import (
        hll_distinct_from_state,
        hll_epoch,
    )

    sf_tmp = tmp_path / "sf"
    src = str(sf_tmp / "events.parquet")
    T(spark, sf_dir, "events").limit(600).repartition(3).write.parquet(src)
    state = str(tmp_path / "hll_state")

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, eid: hll_epoch(df, eid, state)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    epochs = (
        spark.read.parquet(os.path.join(state, "hll_regs"))
        .select("epoch").distinct().count()
    )
    assert epochs == 3

    want = {
        r["event_type"]: (r["hll_est"], r["empty_regs"], r["harmonic_fixed"])
        for r in hll_distinct(
            spark.read.parquet(src), "user_id", "event_type"
        ).collect()
    }
    got = {
        r["grp"]: (r["hll_est"], r["empty_regs"], r["harmonic_fixed"])
        for r in hll_distinct_from_state(spark, state).collect()
    }
    assert got == want and "__all__" in got

    with _pytest.raises(ValueError, match="salt"):
        hll_distinct_from_state(spark, state, salt="other")


def test_streaming_bloom_equals_batch(spark, sf_dir, tmp_path):
    """The cross-epoch bit_or-merged Bloom bitmap is BIT-EQUAL to the
    batch-built bitmap over the union of the micro-batches, and an
    (m_bits, k) mismatch on re-read raises."""
    import pytest as _pytest

    from faconne_spark.functions import phash60
    from faconne_spark.operators.dedup import NORM, bloom_word_bits
    from faconne_spark.streaming.stats import (
        bloom_epoch,
        bloom_filter_from_state,
    )

    m_bits, k = 1 << 16, 4
    sf_tmp = tmp_path / "sf"
    src = str(sf_tmp / "documents.parquet")
    T(spark, sf_dir, "documents").limit(300).repartition(3).write.parquet(src)
    state = str(tmp_path / "bloom_state")

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, eid: bloom_epoch(df, eid, state, m_bits, k)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()

    fps = spark.read.parquet(src).select(
        F.expr(phash60(NORM, "spark")).alias("fp")
    )
    want = {
        r["word"]: r["bits"]
        for r in bloom_word_bits(fps, m_bits, k).collect()
    }
    got = {
        r["word"]: r["bits"]
        for r in bloom_filter_from_state(spark, state, m_bits, k).collect()
    }
    assert got == want and got

    with _pytest.raises(ValueError, match="m_bits"):
        bloom_filter_from_state(spark, state, m_bits // 2, k)


def test_hll_and_bloom_epochs_are_replay_idempotent(spark, sf_dir, tmp_path):
    """The foreachBatch restart contract: re-running the SAME epoch
    overwrites its own partition bit-identically, so a post-failure
    replay cannot double-count registers or bitmap words."""
    from faconne_spark.streaming.stats import (
        bloom_epoch,
        bloom_filter_from_state,
        hll_distinct_from_state,
        hll_epoch,
    )

    ev = T(spark, sf_dir, "events").limit(400)
    docs = T(spark, sf_dir, "documents").limit(200)
    hs, bs = str(tmp_path / "h"), str(tmp_path / "b")

    hll_epoch(ev, 0, hs)
    bloom_epoch(docs, 0, bs)
    first_h = {(r["grp"], r["empty_regs"], r["harmonic_fixed"], r["hll_est"])
               for r in hll_distinct_from_state(spark, hs).collect()}
    first_b = {(r["word"], r["bits"])
               for r in bloom_filter_from_state(spark, bs).collect()}

    # same-epoch replay (the restart path) — state must not change
    hll_epoch(ev, 0, hs)
    bloom_epoch(docs, 0, bs)
    again_h = {(r["grp"], r["empty_regs"], r["harmonic_fixed"], r["hll_est"])
               for r in hll_distinct_from_state(spark, hs).collect()}
    again_b = {(r["word"], r["bits"])
               for r in bloom_filter_from_state(spark, bs).collect()}
    assert again_h == first_h and again_b == first_b


def test_kmv_state_bit_equal_to_batch(spark, tmp_path):
    """Three epochs of KMV partials merge to EXACTLY the batch sketch
    of the union (hash lists, θ, and estimates identical), and a
    k-mismatched read refuses."""
    import pytest as _pytest

    from faconne_spark.operators.sketches import kmv_sketch
    from faconne_spark.streaming.stats import kmv_epoch, kmv_sketch_from_state

    rows = [
        (i, ["view", "click", "buy"][i % 3], i % 97) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, user_id long")
    state = str(tmp_path / "state")
    for e, lo in enumerate(range(0, 300, 100)):
        batch = df.filter(
            (F.col("event_id") >= lo) & (F.col("event_id") < lo + 100)
        )
        kmv_epoch(batch, e, state, k=16)

    got = {
        r["grp"]: r for r in kmv_sketch_from_state(spark, state, 16).collect()
    }
    want = {
        r["event_type"]: r
        for r in kmv_sketch(df, "event_type", "cast(user_id as string)", 16).collect()
    }
    assert set(got) == set(want)
    for g in want:
        assert got[g]["hs"] == want[g]["hs"]
        assert got[g]["theta"] == want[g]["theta"]
        assert got[g]["est_distinct"] == want[g]["est_distinct"]

    with _pytest.raises(ValueError, match="written with k"):
        kmv_sketch_from_state(spark, state, 32)

    # re-writing an epoch (replay) leaves the merged sketch unchanged
    kmv_epoch(df.filter(F.col("event_id") < 100), 0, state, k=16)
    again = {
        r["grp"]: r for r in kmv_sketch_from_state(spark, state, 16).collect()
    }
    assert {g: r["hs"] for g, r in again.items()} == {
        g: r["hs"] for g, r in got.items()
    }


def test_streaming_auc_equals_batch(spark, sf_dir, tmp_path):
    """Streaming AUC state: after two micro-batches through
    foreachBatch, the merged score-bin histogram yields EXACTLY the
    batch Mann-Whitney AUC on the same binned score — the mergeable-
    histogram contract through the one shared auc_from_histogram
    implementation.  Replaying an epoch leaves the state unchanged."""
    from faconne_spark.operators.evalstats import auc_mann_whitney
    from faconne_spark.streaming.stats import auc_epoch, auc_from_state

    ev = T(spark, sf_dir, "events").select(
        "event_type", "value"
    ).limit(600)
    src = str(tmp_path / "auc_events")
    half = ev.withColumn("_h", F.expr("abs(hash(event_type, value)) % 2"))
    half.filter("_h = 0").drop("_h").coalesce(1).write.parquet(src)
    half.filter("_h = 1").drop("_h").coalesce(1).write.parquet(
        src, mode="append"
    )
    bounds = (0.0, 500.0)
    state = str(tmp_path / "auc_state")
    label = "value > 50"

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda b, e: auc_epoch(b, e, state, label, bounds, n_bins=32)
        )
        .option("checkpointLocation", str(tmp_path / "auc_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()

    got = {
        r["event_type"]: (r["n_pos"], r["n_neg"], r["auc"])
        for r in auc_from_state(spark, state).collect()
    }

    full = spark.read.parquet(src)
    lo, hi, nb = 0, 500_000_000, 32
    binned = full.withColumn(
        "_bin",
        F.expr(
            f"cast(least(greatest((cast(floor(value * 1000000 + 0.5) as"
            f" bigint) - {lo}) * {nb} div ({hi} - {lo} + 1), 0),"
            f" {nb - 1}) as int)"
        ),
    )
    want = {
        r["event_type"]: (r["n_pos"], r["n_neg"], r["auc"])
        for r in auc_mann_whitney(
            binned, F.expr(label), "_bin", ["event_type"]
        ).collect()
    }
    assert got == want and got

    # round 6: the SAME merged state reads PR-AUC bit-equal to the
    # batch average_precision on the identical binned score — one
    # mergeable artifact, two rank statistics
    from faconne_spark.operators.evalstats import average_precision
    from faconne_spark.streaming.stats import pr_auc_from_state

    got_ap = {
        r["event_type"]: (r["n_pos"], r["n_neg"], r["ap_micro"])
        for r in pr_auc_from_state(spark, state).collect()
    }
    want_ap = {
        r["event_type"]: (r["n_pos"], r["n_neg"], r["ap_micro"])
        for r in average_precision(
            binned, F.expr(label), "_bin", ["event_type"]
        ).collect()
    }
    assert got_ap == want_ap and got_ap

    # ...and the THIRD read-off: per-bin calibration counters equal the
    # batch reliability_bins on the identical micro-unit score and grid
    from faconne_spark.operators.evalstats import reliability_bins
    from faconne_spark.streaming.stats import reliability_from_state

    got_rel = {
        (r["event_type"], r["bin"]): (r["mid_score"], r["n"], r["n_pos"])
        for r in reliability_from_state(
            spark, state, bounds, n_bins=32
        ).collect()
    }
    micro = full.selectExpr(
        "event_type",
        "cast(floor(value * 1000000 + 0.5) as bigint) AS us",
        f"case when {label} then 1 else 0 end AS y",
    )
    want_rel = {
        (r["event_type"], r["bin"]): (r["mid_score"], r["n"], r["n_pos"])
        for r in reliability_bins(
            micro, "us", F.col("y") == 1, (0, 500_000_000), 32,
            group_cols=["event_type"],
        ).collect()
    }
    assert got_rel == want_rel and got_rel


def test_auc_epoch_replay_is_idempotent(spark, sf_dir, tmp_path):
    """Re-delivering a micro-batch under its original epoch id (the
    foreachBatch at-least-once case) leaves the merged AUC state
    bit-identical — the dynamic epoch-partition overwrite contract."""
    from faconne_spark.streaming.stats import auc_epoch, auc_from_state

    ev = T(spark, sf_dir, "events").select("event_type", "value")
    b0 = ev.filter("value < 50")
    b1 = ev.filter("value >= 50")
    state = str(tmp_path / "auc_replay_state")
    bounds = (0.0, 500.0)
    auc_epoch(b0, 0, state, "value > 30", bounds, n_bins=16)
    auc_epoch(b1, 1, state, "value > 30", bounds, n_bins=16)
    before = {
        r["event_type"]: (r["n_pos"], r["n_neg"], r["auc"])
        for r in auc_from_state(spark, state).collect()
    }
    auc_epoch(b1, 1, state, "value > 30", bounds, n_bins=16)  # redeliver
    after = {
        r["event_type"]: (r["n_pos"], r["n_neg"], r["auc"])
        for r in auc_from_state(spark, state).collect()
    }
    assert before == after and before


def test_streaming_ks_equals_batch(spark, sf_dir, tmp_path):
    """Streaming KS state: the merged cross-epoch bin histogram yields
    BIT-EXACTLY the batch ks_drift on the union of micro-batches — the
    shared bin expression and shared ks_from_binned make stream and
    batch one implementation."""
    from faconne_spark.operators.evalstats import ks_drift
    from faconne_spark.streaming.stats import ks_epoch, ks_from_state

    ev = T(spark, sf_dir, "events").select("event_type", "value").limit(600)
    src = str(tmp_path / "ks_events")
    half = ev.withColumn("_h", F.expr("abs(hash(event_type, value)) % 2"))
    half.filter("_h = 0").drop("_h").coalesce(1).write.parquet(src)
    half.filter("_h = 1").drop("_h").coalesce(1).write.parquet(
        src, mode="append"
    )
    state = str(tmp_path / "ks_state")
    lo, width, nb = 0.0, 8.0, 32

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda b, e: ks_epoch(b, e, state, lo, width, nb)
        )
        .option("checkpointLocation", str(tmp_path / "ks_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()

    got = {
        r["event_type"]: (r["n_in"], r["n_out"], r["ks_d"])
        for r in ks_from_state(spark, state).collect()
    }
    want = {
        r["event_type"]: (r["n_in"], r["n_out"], r["ks_d"])
        for r in ks_drift(
            spark.read.parquet(src), "event_type", "value", lo, width, nb
        ).collect()
    }
    assert got == want and got


def test_streaming_bootstrap_equals_batch(spark, sf_dir, tmp_path):
    """Streaming bootstrap state: replicate weights are row-local, so
    part-sums merged across two micro-batches yield BIT-EXACTLY the
    batch poisson_bootstrap_mean on the union — the shared
    bootstrap_ci_from_parts implementation end-to-end."""
    from faconne_spark.operators.evalstats import poisson_bootstrap_mean
    from faconne_spark.streaming.stats import (
        bootstrap_epoch,
        bootstrap_from_state,
    )

    ev = T(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    ).limit(600)
    src = str(tmp_path / "boot_events")
    half = ev.withColumn("_h", F.expr("abs(hash(event_id)) % 2"))
    half.filter("_h = 0").drop("_h").coalesce(1).write.parquet(src)
    half.filter("_h = 1").drop("_h").coalesce(1).write.parquet(
        src, mode="append"
    )
    state = str(tmp_path / "boot_state")

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda b, e: bootstrap_epoch(b, e, state, n_boot=16)
        )
        .option("checkpointLocation", str(tmp_path / "boot_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()

    got = {
        r["event_type"]: tuple(r)
        for r in bootstrap_from_state(spark, state).collect()
    }
    want = {
        r["event_type"]: tuple(r)
        for r in poisson_bootstrap_mean(
            spark.read.parquet(src), ["event_type"], "value", "event_id",
            n_boot=16,
        ).collect()
    }
    assert got == want and got


def test_ph_drift_merge_proof(spark, sf_dir, tmp_path):
    """Page–Hinkley drift state merges across micro-batches: after a
    two-file availableNow drive (plus a half-written epoch replay),
    ph_drift_from_state is bit-equal to the batch-face walk over the
    full relation — INCLUDING days whose rows were split across
    epochs (the counts merge before the walk runs)."""
    from faconne_spark.queries import all_queries
    from faconne_spark.streaming.stats import (
        ph_daily_epoch,
        ph_drift_from_state,
    )

    ev = T(spark, sf_dir, "events").select("event_type", "ts")
    src = str(tmp_path / "ph_events")
    # split on event_id-free hash of (type, ts): many days straddle
    # both files, so the cross-epoch day merge is genuinely exercised
    half = ev.withColumn("_h", F.expr("abs(hash(event_type, ts)) % 2"))
    half.filter("_h = 0").drop("_h").coalesce(1).write.parquet(src)
    half.filter("_h = 1").drop("_h").coalesce(1).write.parquet(
        src, mode="append"
    )
    state = str(tmp_path / "ph_state")

    # half-written attempt at epoch 0, fully superseded by the drive
    ph_daily_epoch(spark.read.parquet(src).limit(7), 0, state)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda b, e: ph_daily_epoch(b, e, state)
        )
        .option("checkpointLocation", str(tmp_path / "ph_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()

    got = sorted(
        tuple(map(str, r))
        for r in ph_drift_from_state(spark, state).collect()
    )
    want = sorted(
        tuple(map(str, r))
        for r in all_queries()["stream_ph_drift"](spark, sf_dir).collect()
    )
    assert got == want
