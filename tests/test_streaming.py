"""Structured Streaming twins: drive the finite fixture through the
streaming queries and reconcile against the batch results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lisp_batch_processor_spark.catalog import load
from lisp_batch_processor_spark.streaming.windows import (
    read_events_stream,
    run_to_memory,
    streaming_sessionize,
    streaming_tumbling_counts,
)


@pytest.mark.slow
def test_streaming_tumbling_matches_batch(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    run_to_memory(streaming_tumbling_counts(stream), "tumbling_out")
    got = {(r.window_start, r.event_type): (r.n_events, r.sum_value)
           for r in spark.sql("SELECT * FROM tumbling_out").collect()}

    ev = load(spark, sf_dir, "events")
    batch = (ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                    .alias("v")))
    want = {(r.w.start, r.event_type): (r.n, r.v) for r in batch.collect()}
    assert got == want


@pytest.mark.slow
def test_streaming_sessionize_produces_sessions(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    run_to_memory(streaming_sessionize(stream), "session_out")
    rows = spark.sql("SELECT * FROM session_out").collect()
    assert rows
    for r in rows[:50]:
        assert r.session_end >= r.session_start
        assert r.n_events >= 1
