"""Structured Streaming parity: streaming results must equal the batch
twins (operators/events_ops.py) over the same fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_cherry_shuffle_service_spark.sources.catalog import table
from spark_cherry_shuffle_service_spark.streaming.streams import (
    read_events_stream,
    run_to_memory,
    sessionize_stream,
    windowed_counts_stream,
)
from tests.conftest import SF_SMOKE


def test_windowed_counts_stream_matches_batch(spark):
    stream = windowed_counts_stream(read_events_stream(spark, SF_SMOKE))
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in run_to_memory(stream, "win_counts").collect()
    }
    batch = (
        table(spark, SF_SMOKE, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
    )
    want = {(r["ws"], r["event_type"]): r["n"] for r in batch.collect()}
    assert got == want


def test_sessionize_stream_matches_batch_session_window(spark):
    stream = sessionize_stream(read_events_stream(spark, SF_SMOKE))
    got = run_to_memory(stream, "sessions")
    batch = (
        table(spark, SF_SMOKE, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )
    key = lambda r: (r["user_id"], r["session_start"], r["session_end"], r["n_events"])  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, batch.collect()))


def test_stream_session_count_matches_gaps_and_islands(spark):
    """The streaming session_window must agree with the batch
    gaps-and-islands sessionization on per-user session counts."""
    from spark_cherry_shuffle_service_spark.plans.registry import all_specs

    stream = sessionize_stream(read_events_stream(spark, SF_SMOKE))
    got = (
        run_to_memory(stream, "sessions2")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
    batch = all_specs()["events_sessionize"].builder(spark, SF_SMOKE).select(
        "user_id", "n_sessions"
    )
    g = {r["user_id"]: r["n_sessions"] for r in got.collect()}
    b = {r["user_id"]: r["n_sessions"] for r in batch.collect()}
    assert g == b
