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
