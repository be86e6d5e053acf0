"""Custom stateful streaming operator (bounded sessions via
applyInPandasWithState): structural properties over the fixture plus
a deterministic synthetic burst for the max-events close path."""

from __future__ import annotations

import os
from collections import defaultdict
from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import types as T

from lisp_batch_processor_spark.streaming.stateful import (
    MAX_EVENTS, bounded_sessionize,
)
from lisp_batch_processor_spark.streaming.windows import read_events_stream


def _run_stream(spark, df, name):
    q = (bounded_sessionize(df).writeStream.outputMode("append")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}").collect()


@pytest.mark.slow
def test_bounded_sessions_fixture_properties(spark, sf_dir):
    rows = _run_stream(spark, read_events_stream(spark, sf_dir), "bo_fix")
    assert rows, "no sessions closed over the whole fixture"
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    for user, sessions in by_user.items():
        sessions.sort(key=lambda r: r.session_seq)
        for r in sessions:
            assert 1 <= r.n_events <= MAX_EVENTS
            assert r.end_us >= r.start_us
            if r.closed_by == 1:
                assert r.n_events == MAX_EVENTS
        # Sessions are disjoint and ordered.
        for prev, cur in zip(sessions, sessions[1:]):
            assert cur.session_seq > prev.session_seq
            assert cur.start_us > prev.end_us


@pytest.mark.slow
def test_bounded_sessions_split_on_max_events(spark, tmp_path):
    """One user, 50 events 1 s apart, then a watermark-advancing
    straggler: the burst must split into two full sessions (closed by
    size) with the 10-event tail left open."""
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ])
    t0 = datetime(2024, 6, 1, tzinfo=timezone.utc)
    burst = [(i, t0 + timedelta(seconds=i), 1, 1.0) for i in range(50)]
    # A far-future row from another user pushes the watermark past the
    # burst's gap horizon so gap-closed tails would flush; the tail
    # here stays open only until the timeout batch fires.
    burst.append((99, t0 + timedelta(days=2), 2, 1.0))
    src = os.path.join(str(tmp_path), "burst")
    spark.createDataFrame(burst, schema).write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    rows = _run_stream(spark, stream, "bo_burst")
    u1 = sorted([r for r in rows if r.user_id == 1],
                key=lambda r: r.session_seq)
    assert [r.closed_by for r in u1][:2] == [1, 1]
    assert [r.n_events for r in u1][:2] == [MAX_EVENTS, MAX_EVENTS]
    # The 10-event tail closes by gap/timeout once the watermark
    # passes its horizon (same file => single batch; the timeout
    # batch runs after the watermark update).
    if len(u1) == 3:
        assert u1[2].closed_by == 0
        assert u1[2].n_events == 50 - 2 * MAX_EVENTS
