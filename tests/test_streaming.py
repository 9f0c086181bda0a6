"""Streaming tests: finite replay through the real streaming engine
(file source -> watermarked stateful agg -> memory sink) must agree
with the batch DataFrame path on the same data."""

from __future__ import annotations

from pyspark.sql import functions as F

from simpleetlpipeline_spark.plans.analytics import QUERIES as BATCH
from simpleetlpipeline_spark.streaming import windows as W


def test_streaming_hourly_equals_batch(spark, sf_dir):
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in W.streaming_events_hourly(spark, sf_dir).collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in BATCH["events_hourly"](spark, sf_dir).collect()
    }
    assert got == want


def test_streaming_sliding_double_counts(spark, sf_dir):
    """Each event lands in exactly two 1h/30min sliding windows."""
    from simpleetlpipeline_spark.io import read_table
    n_events = read_table(spark, sf_dir, "events").count()
    total = (
        W.streaming_events_sliding(spark, sf_dir)
        .agg(F.sum("n_events").alias("s")).first()["s"]
    )
    assert total == 2 * n_events


def test_streaming_sessions_invariants(spark, sf_dir):
    rows = W.streaming_user_sessions(spark, sf_dir).collect()
    assert rows
    assert all(r["session_start"] < r["session_end"] for r in rows)
    assert all(r["n_events"] >= 1 for r in rows)
