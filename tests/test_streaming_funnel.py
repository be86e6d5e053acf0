"""Streaming funnel: multi-micro-batch replay (with out-of-order
arrivals inside the watermark) + flush must emit exactly the batch
funnel's per-step conversions."""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from lisp_batch_processor_spark.operators.events import funnel
from lisp_batch_processor_spark.streaming.funnel import streaming_funnel

BASE = datetime(2025, 6, 1)
S = 1_000_000  # one second in microseconds
SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def _ev(eid, us, uid, et):
    return (eid, BASE + timedelta(microseconds=us), uid, et)


@pytest.mark.slow
@pytest.mark.parametrize("buckets", [1, 2, 256])
def test_streaming_funnel_matches_batch(spark, tmp_path, buckets):
    """Pinned at several bucket counts: B=1 routes every user through
    ONE state group (the multi-user walk), B=256 gives each of the 4
    users their own (the pre-r5 per-user shape), B=2 mixes."""
    steps = ["view", "click", "purchase"]
    horizon = 3600

    # Batch 1: early activity. User 2's view arrives HERE but its
    # click arrives in batch 2 with an EARLIER timestamp than user
    # 2's later view — out-of-order across batches, inside the
    # 30-min watermark, so correctness depends on the buffer.
    b1 = [
        _ev(1, 0, 1, "view"), _ev(2, 10 * S, 1, "click"),
        _ev(3, 0, 2, "view"), _ev(4, 600 * S, 2, "view"),
        _ev(5, 0, 3, "click"),            # click before any view
        _ev(6, 5 * S, 3, "view"),
    ]
    b2 = [
        _ev(7, 20 * S, 1, "purchase"),    # completes user 1
        _ev(8, 300 * S, 2, "click"),      # out-of-order vs event 4
        _ev(9, 3700 * S, 3, "click"),     # past user 3's horizon...
        _ev(10, 900 * S, 2, "purchase"),  # completes user 2
    ]
    # Flush: a far-future non-matching event pushes the watermark
    # past everything above so all buffered events get consumed.
    flush = [_ev(99, 864000 * S, 999, "noise")]

    src = os.path.join(str(tmp_path), "ev_in")
    for i, batch in enumerate((b1, b2, flush)):
        spark.createDataFrame(batch, SCHEMA).coalesce(1) \
            .write.parquet(os.path.join(src, f"batch={i}"))

    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "batch=*")))
    out = streaming_funnel(stream, steps, horizon_s=horizon,
                           user_buckets=buckets)
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName("funnel_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    try:
        emitted = spark.sql(
            "SELECT user_id, step_idx, at_us FROM funnel_out").collect()
    finally:
        spark.catalog.dropTempView("funnel_out")

    # Each (user, step) at most once; counts match the batch funnel.
    seen = [(r.user_id, r.step_idx) for r in emitted]
    assert len(seen) == len(set(seen))
    got_counts = {}
    for _, s_ in seen:
        got_counts[s_] = got_counts.get(s_, 0) + 1

    batch_df = spark.createDataFrame(b1 + b2 + flush, SCHEMA)
    want = {r.step_idx: r.n_users
            for r in funnel(batch_df, steps, horizon_s=horizon).collect()
            if r.n_users > 0}
    assert got_counts == want
    # Crafted expectations: users 1 and 2 complete all three steps
    # (user 2 only thanks to the in-watermark reorder of event 8);
    # user 3 anchors at its view but its click is past the horizon.
    assert want == {0: 3, 1: 2, 2: 2}

    # Advance timestamps are the matched events' event times
    # (absolute epoch micros).
    base_us = int(BASE.timestamp() * 1_000_000)
    at = {(r.user_id, r.step_idx): r.at_us for r in emitted}
    assert at[(1, 0)] == base_us and at[(1, 1)] == base_us + 10 * S
    assert at[(2, 1)] == base_us + 300 * S   # the reordered click
    assert at[(2, 2)] == base_us + 900 * S


def test_streaming_funnel_rejects_non_integral_tie(spark):
    """The state carries ties as longs; a string tie would order
    '10' before '9' and silently diverge from the batch twin — it
    must be rejected up front (ADVICE r4)."""
    df = spark.createDataFrame(
        [], "event_id string, ts timestamp, user_id long, "
            "event_type string")
    with pytest.raises(ValueError, match="integral"):
        streaming_funnel(df, ["view", "click"], tie_col="event_id")
    with pytest.raises(ValueError, match="user_buckets"):
        streaming_funnel(
            spark.createDataFrame(
                [], "event_id long, ts timestamp, user_id long, "
                    "event_type string"),
            ["view", "click"], user_buckets=0)
