"""Custom stateful streaming operator (bounded sessions via
applyInPandasWithState): structural properties over the fixture plus
a deterministic synthetic burst for the max-events close path."""

from __future__ import annotations

import math
import os
from collections import defaultdict
from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import types as T

from lisp_batch_processor_spark.streaming.stateful import (
    MAX_EVENTS, SESSION_GAP_US, bounded_sessionize,
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
    # The 10-event tail closes by watermark timeout (closed_by=2) once
    # the watermark passes its horizon (same file => single batch; the
    # timeout batch runs after the watermark update).
    if len(u1) == 3:
        assert u1[2].closed_by == 2
        assert u1[2].n_events == 50 - 2 * MAX_EVENTS


@pytest.mark.slow
def test_session_seq_survives_timeout_close(spark, tmp_path):
    """(user_id, session_seq) must stay unique across micro-batches:
    a session closed by event-time TIMEOUT must not reset the user's
    sequence counter — the next session continues at seq+1."""
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ])
    t0 = datetime(2024, 6, 1, tzinfo=timezone.utc)
    src = os.path.join(str(tmp_path), "seqsrc")

    def write_batch(rows, part):
        (spark.createDataFrame(rows, schema)
         .coalesce(1).write.mode("append").parquet(src))

    # Batch 1: user 1 opens a session; user 9 pushes the watermark far
    # ahead so user 1's session times out on a later trigger.
    write_batch([(1, t0, 1, 1.0), (2, t0 + timedelta(seconds=5), 1, 1.0),
                 (900, t0 + timedelta(days=2), 9, 1.0)], 0)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (bounded_sessionize(stream).writeStream.outputMode("append")
         .format("memory").queryName("bo_seq").start())
    try:
        q.processAllAvailable()
        # Batch 2: user 1 returns AFTER the timeout close; user 9
        # advances the watermark again so this second session also
        # times out before the stream stops.
        write_batch([(3, t0 + timedelta(days=3), 1, 2.0),
                     (901, t0 + timedelta(days=5), 9, 1.0)], 1)
        q.processAllAvailable()
        # Batch 3: watermark push only, to fire the second timeout.
        write_batch([(902, t0 + timedelta(days=7), 9, 1.0)], 2)
        q.processAllAvailable()
    finally:
        q.stop()
    u1 = sorted([r for r in spark.sql("SELECT * FROM bo_seq").collect()
                 if r.user_id == 1], key=lambda r: r.start_us)
    assert len(u1) == 2
    # Distinct, increasing seqs — the pre-fix bug restarted at 0.
    assert [r.session_seq for r in u1] == [0, 1]


@pytest.mark.slow
def test_multibatch_in_data_sessions_subset_of_replay(spark, sf_dir,
                                                      tmp_path):
    """Multi-micro-batch equivalence (the q_stream_sessions oracle
    requires ONE data batch; this is the complementary check): the
    fixture split into 6 time-ordered files driven one file per
    trigger. In-order arrival means nothing is ever late, so every
    session the engine closes on IN-DATA evidence (gap / max-events)
    must appear — same seq, counts, cents, and bounds — in the
    single-pass relational replay. Timeout closes (closed_by=2) may
    fire mid-stream here, which is exactly why they are excluded from
    the oracle subset."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lisp_batch_processor_spark.catalog import load

    pdf = (load(spark, sf_dir, "events")
           .select("event_id", "ts", "user_id", "value").toPandas()
           .sort_values(["ts", "event_id"]).reset_index(drop=True))
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    src = os.path.join(str(tmp_path), "chunks")
    os.makedirs(src)
    n_chunks = 6
    step = math.ceil(len(pdf) / n_chunks)
    for i in range(n_chunks):
        p = os.path.join(src, f"ev_{i:03d}.parquet")
        pq.write_table(
            pa.Table.from_pandas(pdf.iloc[i * step:(i + 1) * step],
                                 preserve_index=False), p)
        # FileStreamSource orders by modification time: pin it so the
        # chunks arrive in event-time order.
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ])
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    rows = _run_stream(spark, stream, "bo_multibatch")
    in_data = [r for r in rows if r.closed_by != 2]
    assert in_data, "no in-data-closed sessions over the fixture"

    # Pure-Python replay of the bounded-session fold over ALL data at
    # once (gap-split then size-split, integer cents).
    per_user: dict[int, list[tuple[int, float]]] = defaultdict(list)
    for r in pdf.itertuples():  # already (ts, event_id)-ordered
        per_user[r.user_id].append((r.ts.value // 1000, float(r.value)))
    replay = set()
    for user, evs in per_user.items():
        seq = n = cents = 0
        start = last = None
        for ts_us, val in evs:
            if n > 0 and ts_us - last > SESSION_GAP_US:
                replay.add((user, seq, n, cents, start, last))
                seq, n, cents, start = seq + 1, 0, 0, None
            if n == 0:
                start = ts_us
            n += 1
            cents += int(math.floor(val * 100 + 0.5))
            last = ts_us
            if n >= MAX_EVENTS:
                replay.add((user, seq, n, cents, start, last))
                seq, n, cents, start = seq + 1, 0, 0, None
        if n > 0:  # open tail: engine may close it by timeout only
            replay.add((user, seq, n, cents, start, last))

    got = {(r.user_id, r.session_seq, r.n_events,
            int(math.floor(r.sum_value * 100 + 0.5)),
            r.start_us, r.end_us)
           for r in in_data}
    missing = got - replay
    assert not missing, f"streaming sessions absent from replay: {sorted(missing)[:5]}"
