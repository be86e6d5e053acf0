"""Streaming funnel — the stateful-streaming twin of
`operators.events.funnel` (earliest-anchor greedy ordered-sequence
conversion), via applyInPandasWithState.

The batch operator sorts each user's events globally before the
greedy walk; a stream cannot, because a micro-batch may carry events
out of order relative to ones still in flight. The standard fix is
applied here: arrivals BUFFER in per-user state, and the walk only
consumes events once the watermark passes them — at that point no
on-time event can precede them, so the consumption order equals the
batch sort order and the streaming walk is EXACTLY the batch walk on
the watermark-complete prefix (pinned by
tests/test_streaming_funnel.py: full replay + flush == batch funnel).

Each step advance emits one row ``(user_id, step_idx, at_us)`` in
append mode — a user emits step i at most once (the walk is
monotone), so ``groupBy(step_idx).count()`` over the emitted stream
IS the conversion table, maintained incrementally.

Scale notes: state per user = the walk cursor (4 longs) plus the
pending buffer, which the watermark bounds to (per-user step-event
arrival rate x watermark horizon) — the same state-size contract as
any watermarked stateful operator. Events are pre-filtered to the
step types BEFORE grouping, so non-step traffic never shuffles. A
completed user (m = k) keeps a tombstone cursor so later events
cannot restart the funnel; pair with a state-TTL policy in
unbounded production runs (the seq-carrier GC pattern in
streaming/stateful.py).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, LongType, StringType, StructField, StructType,
)

FUNNEL_OUTPUT = StructType([
    StructField("user_id", LongType()),
    StructField("step_idx", LongType()),
    StructField("at_us", LongType()),
])

FUNNEL_STATE = StructType([
    StructField("m", LongType()),
    StructField("prev_us", LongType()),
    StructField("prev_tie", LongType()),
    StructField("t1_us", LongType()),
    StructField("pend_us", ArrayType(LongType())),
    StructField("pend_tie", ArrayType(LongType())),
    StructField("pend_et", ArrayType(StringType())),
])


def _mk_fold(steps: list[str], horizon_us: int):
    k = len(steps)

    def fold(key: tuple, pdfs: Iterable[pd.DataFrame],
             state: GroupState):
        (user_id,) = key
        if state.exists:
            m, prev_us, prev_tie, t1_us, pus, ptie, pet = state.get
            pend = list(zip(pus, ptie, pet))
        else:
            m, prev_us, prev_tie, t1_us, pend = 0, None, None, None, []
        if not state.hasTimedOut:
            rows = pd.concat(list(pdfs), ignore_index=True)
            pend.extend(zip((int(v) for v in rows["ts_us"]),
                            (int(v) for v in rows["tie"]),
                            rows["et"]))

        # Consume everything the watermark has sealed, in event-time
        # order — identical to the batch walk on this prefix.
        wm_us = state.getCurrentWatermarkMs() * 1000
        pend.sort()
        out = []
        remaining = []
        for us, tie, et in pend:
            if us > wm_us:
                remaining.append((us, tie, et))
                continue
            if (m < k and et == steps[m]
                    and (m == 0 or (us, tie) > (prev_us, prev_tie))
                    and (m == 0 or us <= t1_us + horizon_us)):
                m += 1
                prev_us, prev_tie = us, tie
                t1_us = us if t1_us is None else t1_us
                out.append((user_id, m - 1, us))

        state.update((m, prev_us, prev_tie, t1_us,
                      [r[0] for r in remaining],
                      [r[1] for r in remaining],
                      [r[2] for r in remaining]))
        if remaining:
            # Wake when the watermark passes the oldest pending
            # event (clamped ahead of the current watermark — Spark
            # rejects timestamps at/behind it).
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max(remaining[0][0] // 1000 + 1, wm_ms + 1))
        if out:
            yield pd.DataFrame(
                [{"user_id": u, "step_idx": s, "at_us": t}
                 for u, s, t in out])

    return fold


def streaming_funnel(events: DataFrame, steps: list[str],
                     horizon_s: int = 24 * 3600,
                     watermark: str = "30 minutes",
                     user_col: str = "user_id", ts_col: str = "ts",
                     type_col: str = "event_type",
                     tie_col: str = "event_id") -> DataFrame:
    """Streaming step-advance feed for the funnel ``steps``: one
    appended row per (user, step) the moment the watermark seals the
    advance. Input may be a stream or a batch frame routed through
    the same function for differential testing."""
    from pyspark.sql import functions as F

    if len(steps) < 2:
        raise ValueError(f"a funnel needs >= 2 steps, got {steps!r}")
    prepared = (events
                .withWatermark(ts_col, watermark)
                .filter(F.col(type_col).isin(*steps))
                # The watermarked event-time column itself must stay
                # in the projection for event-time timeouts.
                .select(F.col(user_col).alias("user_id"),
                        F.col(ts_col),
                        F.unix_micros(F.col(ts_col)).alias("ts_us"),
                        F.col(tie_col).alias("tie"),
                        F.col(type_col).alias("et")))
    return (prepared.groupBy("user_id").applyInPandasWithState(
        _mk_fold(list(steps), int(horizon_s) * 1_000_000),
        outputStructType=FUNNEL_OUTPUT,
        stateStructType=FUNNEL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout))
