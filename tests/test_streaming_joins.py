"""Stream-stream attribution join: multi-micro-batch replay (with an
out-of-order touch inside the watermark) + flush must emit exactly
the batch attribution_join's rows."""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from lisp_batch_processor_spark.operators.events import attribution_join
from lisp_batch_processor_spark.streaming.joins import (
    streaming_attribution_join)

BASE = datetime(2025, 6, 1)
S = 1_000_000  # one second in microseconds
SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def _ev(eid, us, uid, et):
    return (eid, BASE + timedelta(microseconds=us), uid, et)


@pytest.mark.slow
def test_streaming_attribution_matches_batch(spark, tmp_path):
    horizon = 3600

    b1 = [
        _ev(1, 0, 1, "click"),
        _ev(2, 50 * S, 1, "click"),          # later touch, should win
        _ev(3, 100 * S, 1, "purchase"),      # -> touch 2
        _ev(4, 0, 2, "purchase"),            # no touch yet -> dropped
        _ev(5, 10 * S, 3, "click"),
        _ev(6, 7200 * S, 3, "purchase"),     # touch 5 beyond horizon
        _ev(7, 500 * S, 4, "click"),
    ]
    b2 = [
        # Out-of-order: a touch for user 5 arrives AFTER its
        # conversion was read, inside the watermark — it must still
        # win over touch 9 (earlier ts).
        _ev(8, 700 * S, 5, "click"),
        _ev(9, 600 * S, 5, "click"),
        _ev(10, 800 * S, 5, "purchase"),     # -> touch 8
        _ev(11, 500 * S, 4, "purchase"),     # same instant as touch 7
        _ev(12, 500 * S, 6, "click"),        # tie ids: 12 vs 13
        _ev(13, 500 * S, 6, "click"),
        _ev(14, 600 * S, 6, "purchase"),     # -> max id touch 13
    ]
    # Flush batches carry one event of EACH participating type (the
    # branch watermarks advance only on their own type — a noise
    # event advances neither), for users with no counterpart so
    # nothing extra emits. Two flush batches: the first advances the
    # watermark past the real events, the second makes the engine
    # apply that watermark inside a DATA batch (processAllAvailable
    # does not wait for trailing no-data batches).
    flush1 = [_ev(96, 864000 * S, 999, "click"),
              _ev(97, 864000 * S, 998, "purchase")]
    flush2 = [_ev(98, 2 * 864000 * S, 999, "click"),
              _ev(99, 2 * 864000 * S, 998, "purchase")]

    src = os.path.join(str(tmp_path), "ev_in")
    for i, batch in enumerate((b1, b2, flush1, flush2)):
        spark.createDataFrame(batch, SCHEMA).coalesce(1) \
            .write.parquet(os.path.join(src, f"batch={i}"))

    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "batch=*")))
    out = streaming_attribution_join(stream, horizon_s=horizon)
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName("attr_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    try:
        emitted = {(r.user_id, r.conversion_id, r.touch_id)
                   for r in spark.sql(
                       "SELECT * FROM attr_out").collect()}
    finally:
        spark.catalog.dropTempView("attr_out")

    batch_df = spark.createDataFrame(b1 + b2 + flush1 + flush2, SCHEMA)
    want = {(r.user_id, r.conversion_id, r.touch_id)
            for r in attribution_join(batch_df,
                                      horizon_s=horizon).collect()}
    assert emitted == want
    # The crafted expectations, explicitly:
    assert want == {(1, 3, 2),    # latest of two touches
                    (5, 10, 8),   # the out-of-order cross-batch touch
                    (4, 11, 7),   # same-instant touch qualifies
                    (6, 14, 13)}  # tie at one instant -> max touch id
    # Dropped: user 2 (no touch), user 3 (touch beyond horizon).


@pytest.mark.slow
def test_streaming_attribution_left_outer_matches_batch(spark, tmp_path):
    """emit_unmatched: conversions with no qualifying touch emit
    exactly once with NULL touch columns, at watermark close."""
    horizon = 3600
    b1 = [
        _ev(1, 0, 1, "click"),
        _ev(2, 100 * S, 1, "purchase"),      # attributed -> touch 1
        _ev(3, 50 * S, 2, "purchase"),       # no touch -> NULL row
        _ev(4, 10 * S, 3, "click"),
        _ev(5, 7200 * S, 3, "purchase"),     # expired touch -> NULL row
    ]
    flush1 = [_ev(96, 864000 * S, 999, "click"),
              _ev(97, 864000 * S, 998, "purchase")]
    flush2 = [_ev(98, 2 * 864000 * S, 999, "click"),
              _ev(99, 2 * 864000 * S, 998, "purchase")]

    src = os.path.join(str(tmp_path), "ev_in")
    for i, batch in enumerate((b1, flush1, flush2)):
        spark.createDataFrame(batch, SCHEMA).coalesce(1) \
            .write.parquet(os.path.join(src, f"batch={i}"))

    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "batch=*")))
    out = streaming_attribution_join(stream, horizon_s=horizon,
                                     emit_unmatched=True)
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName("attr_outer").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    try:
        emitted = {(r.user_id, r.conversion_id, r.touch_id)
                   for r in spark.sql(
                       "SELECT * FROM attr_outer").collect()}
    finally:
        spark.catalog.dropTempView("attr_outer")

    batch_df = spark.createDataFrame(b1 + flush1 + flush2, SCHEMA)
    want = {(r.user_id, r.conversion_id, r.touch_id)
            for r in attribution_join(batch_df, horizon_s=horizon,
                                      emit_unmatched=True).collect()}
    # The FINAL flush conversion (99) is never watermark-sealed, so
    # append mode cannot emit it — inherent to any unmatched-row
    # emission, which must wait out the full horizon+watermark.
    want -= {(998, 99, None)}
    assert emitted == want
    assert (2, 3, None) in emitted       # no touch at all
    assert (3, 5, None) in emitted       # only an expired touch
    assert (1, 2, 1) in emitted          # the attributed one
    assert (998, 97, None) in emitted    # flush conv sealed by flush2


@pytest.mark.slow
@pytest.mark.parametrize("model", ["first_touch", "all_touches"])
def test_streaming_attribution_models_match_batch(spark, tmp_path,
                                                  model):
    """The round-5 scenario replayed under the other two models:
    first_touch flips the winning touch (earliest qualifying;
    same-instant ties -> SMALLEST id), all_touches emits every
    qualifying pair."""
    horizon = 3600
    b1 = [
        _ev(1, 0, 1, "click"),
        _ev(2, 50 * S, 1, "click"),
        _ev(3, 100 * S, 1, "purchase"),      # first: 1, pairs: {1,2}
        _ev(4, 0, 2, "purchase"),            # no touch
        _ev(5, 10 * S, 3, "click"),
        _ev(6, 7200 * S, 3, "purchase"),     # touch beyond horizon
        _ev(7, 500 * S, 4, "click"),
    ]
    b2 = [
        _ev(8, 700 * S, 5, "click"),         # out-of-order arrival
        _ev(9, 600 * S, 5, "click"),
        _ev(10, 800 * S, 5, "purchase"),     # first: 9 (earlier ts)
        _ev(11, 500 * S, 4, "purchase"),     # same instant: 7
        _ev(12, 500 * S, 6, "click"),
        _ev(13, 500 * S, 6, "click"),
        _ev(14, 600 * S, 6, "purchase"),     # tie -> MIN id 12
    ]
    flush1 = [_ev(96, 864000 * S, 999, "click"),
              _ev(97, 864000 * S, 998, "purchase")]
    flush2 = [_ev(98, 2 * 864000 * S, 999, "click"),
              _ev(99, 2 * 864000 * S, 998, "purchase")]

    src = os.path.join(str(tmp_path), "ev_in")
    for i, batch in enumerate((b1, b2, flush1, flush2)):
        spark.createDataFrame(batch, SCHEMA).coalesce(1) \
            .write.parquet(os.path.join(src, f"batch={i}"))

    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "batch=*")))
    out = streaming_attribution_join(stream, horizon_s=horizon,
                                     model=model)
    name = f"attr_{model}"
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    try:
        emitted = [(r.user_id, r.conversion_id, r.touch_id)
                   for r in spark.sql(f"SELECT * FROM {name}").collect()]
    finally:
        spark.catalog.dropTempView(name)

    batch_df = spark.createDataFrame(b1 + b2 + flush1 + flush2, SCHEMA)
    want = [(r.user_id, r.conversion_id, r.touch_id)
            for r in attribution_join(batch_df, horizon_s=horizon,
                                      model=model).collect()]
    assert sorted(emitted) == sorted(want)
    if model == "first_touch":
        assert set(want) == {(1, 3, 1),   # earliest of two touches
                             (5, 10, 9),  # earlier-ts out-of-order touch
                             (4, 11, 7),  # same-instant qualifies
                             (6, 14, 12)}  # tie -> min touch id
    else:
        assert sorted(want) == sorted([
            (1, 3, 1), (1, 3, 2), (5, 10, 8), (5, 10, 9),
            (4, 11, 7), (6, 14, 12), (6, 14, 13)])
        assert len(emitted) == len(set(emitted))  # one row per pair


@pytest.mark.slow
@pytest.mark.parametrize("credit_model",
                         ["linear", "position_based", "time_decay"])
def test_streaming_attribution_credit_matches_batch(spark, tmp_path,
                                                    credit_model):
    """streaming_attribution_credit replay == attribution_credit over
    the batch all_touches pair set, per-credit, and credits sum to 1
    per emitted conversion."""
    import math

    from lisp_batch_processor_spark.operators.events import (
        attribution_credit)
    from lisp_batch_processor_spark.streaming.joins import (
        streaming_attribution_credit)

    horizon = 3600
    b1 = [
        _ev(1, 0, 1, "click"),
        _ev(2, 50 * S, 1, "click"),
        _ev(3, 100 * S, 1, "purchase"),      # two touches
        _ev(5, 10 * S, 3, "click"),
        _ev(6, 7200 * S, 3, "purchase"),     # touch beyond horizon
        _ev(7, 500 * S, 4, "click"),
    ]
    b2 = [
        _ev(8, 700 * S, 5, "click"),
        _ev(9, 600 * S, 5, "click"),
        _ev(15, 650 * S, 5, "click"),
        _ev(10, 800 * S, 5, "purchase"),     # three touches (middle!)
        _ev(11, 500 * S, 4, "purchase"),     # one touch, same instant
        _ev(12, 500 * S, 6, "click"),        # tie instants
        _ev(13, 500 * S, 6, "click"),
        _ev(14, 600 * S, 6, "purchase"),
    ]
    flush1 = [_ev(96, 864000 * S, 999, "click"),
              _ev(97, 864000 * S, 998, "purchase")]
    flush2 = [_ev(98, 2 * 864000 * S, 999, "click"),
              _ev(99, 2 * 864000 * S, 998, "purchase")]

    src = os.path.join(str(tmp_path), "ev_in")
    for i, batch in enumerate((b1, b2, flush1, flush2)):
        spark.createDataFrame(batch, SCHEMA).coalesce(1) \
            .write.parquet(os.path.join(src, f"batch={i}"))

    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "batch=*")))
    out = streaming_attribution_credit(stream, horizon_s=horizon,
                                       credit_model=credit_model,
                                       half_life_s=600)
    name = f"attr_credit_{credit_model}"
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    try:
        emitted = {(r.user_id, r.conversion_id, r.touch_id): r.credit
                   for r in spark.sql(f"SELECT * FROM {name}").collect()}
    finally:
        spark.catalog.dropTempView(name)

    batch_df = spark.createDataFrame(b1 + b2 + flush1 + flush2, SCHEMA)
    pairs = attribution_join(batch_df, horizon_s=horizon,
                             model="all_touches")
    want = {(r.user_id, r.conversion_id, r.touch_id): r.credit
            for r in attribution_credit(pairs, model=credit_model,
                                        half_life_s=600).collect()}
    assert set(emitted) == set(want)
    for k in want:
        assert math.isclose(emitted[k], want[k],
                            rel_tol=1e-9), (k, emitted[k], want[k])
    sums: dict = {}
    for (_, cid, _t), c in emitted.items():
        sums[cid] = sums.get(cid, 0.0) + c
    assert all(math.isclose(s, 1.0, rel_tol=1e-9)
               for s in sums.values())
    if credit_model == "position_based":
        # User 5's three touches: 9 (first, 0.4), 15 (middle, 0.2),
        # 8 (last, 0.4) — order is touch TS, not arrival/id order.
        assert math.isclose(emitted[(5, 10, 9)], 0.4)
        assert math.isclose(emitted[(5, 10, 15)], 0.2)
        assert math.isclose(emitted[(5, 10, 8)], 0.4)


def test_streaming_attribution_validation(spark):
    df = spark.createDataFrame([], SCHEMA)
    with pytest.raises(ValueError, match="must differ"):
        streaming_attribution_join(df, conv_type="click",
                                   touch_type="click")
    with pytest.raises(ValueError, match="model"):
        streaming_attribution_join(df, model="linear")
