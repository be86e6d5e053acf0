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

Scale notes — BUCKETED STATE (round 5): state groups are
``pmod(xxhash64(user_id), user_buckets)``, not individual users.
Round 4 measured the per-user grouping at slope exp 0.97 (×10 users
⇒ ×10 tiny state groups ⇒ ×10 Arrow state round-trips per resident
micro-batch; 27.5 s vs the batch funnel's 0.9 s on the same events).
With B buckets the number of Arrow round-trips per micro-batch is
min(B, active users) regardless of population — each group carries a
dict of per-user cursors (4 longs per user that has advanced past
step 0, nothing for the never-anchored majority) plus the shared
pending buffer, which the watermark bounds exactly as before
(arrival rate × watermark horizon, now per bucket instead of per
user). Events are pre-filtered to the step types BEFORE grouping, so
non-step traffic never shuffles. A completed user (m = k) keeps a
tombstone cursor so later events cannot restart the funnel; pair
with a state-TTL policy in unbounded production runs (the
seq-carrier GC pattern in streaming/stateful.py).

Within a bucket the sealed events are consumed in global
``(ts, tie)`` order, whose per-user subsequences are each in that
user's event-time order — identical to the per-user walk, pinned by
the batch-equality test at several bucket counts (including B=1,
every user through one group).
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

# Per-bucket state: parallel arrays of per-user cursors (only users
# that advanced past step 0) + the shared pending buffer.
FUNNEL_STATE = StructType([
    StructField("cur_uid", ArrayType(LongType())),
    StructField("cur_m", ArrayType(LongType())),
    StructField("cur_prev_us", ArrayType(LongType())),
    StructField("cur_prev_tie", ArrayType(LongType())),
    StructField("cur_t1_us", ArrayType(LongType())),
    StructField("pend_uid", ArrayType(LongType())),
    StructField("pend_us", ArrayType(LongType())),
    StructField("pend_tie", ArrayType(LongType())),
    StructField("pend_et", ArrayType(StringType())),
])

_INTEGRAL_TYPES = {"tinyint", "smallint", "int", "bigint"}


def _mk_fold(steps: list[str], horizon_us: int):
    k = len(steps)

    def fold(key: tuple, pdfs: Iterable[pd.DataFrame],
             state: GroupState):
        if state.exists:
            (cu, cm, cpu, cpt, ct1, puid, pus, ptie, pet) = state.get
            cur = {u: [m, p1, p2, t1]
                   for u, m, p1, p2, t1 in zip(cu, cm, cpu, cpt, ct1)}
            pend = list(zip(puid, pus, ptie, pet))
        else:
            cur, pend = {}, []
        if not state.hasTimedOut:
            rows = pd.concat(list(pdfs), ignore_index=True)
            pend.extend(zip((int(v) for v in rows["user_id"]),
                            (int(v) for v in rows["ts_us"]),
                            (int(v) for v in rows["tie"]),
                            rows["et"]))

        # Consume everything the watermark has sealed, in global
        # event-time order — each user's subsequence of that order is
        # the user's own event-time order, so the per-user walk is
        # identical to the batch walk on this prefix.
        wm_us = state.getCurrentWatermarkMs() * 1000
        sealed, remaining = [], []
        for ev in pend:
            (sealed if ev[1] <= wm_us else remaining).append(ev)
        sealed.sort(key=lambda ev: (ev[1], ev[2]))
        out = []
        for uid, us, tie, et in sealed:
            m, prev_us, prev_tie, t1_us = cur.get(uid) or (0, None,
                                                           None, None)
            if (m < k and et == steps[m]
                    and (m == 0 or (us, tie) > (prev_us, prev_tie))
                    and (m == 0 or us <= t1_us + horizon_us)):
                m += 1
                cur[uid] = [m, us, tie, us if t1_us is None else t1_us]
                out.append((uid, m - 1, us))

        state.update((list(cur.keys()),
                      [c[0] for c in cur.values()],
                      [c[1] for c in cur.values()],
                      [c[2] for c in cur.values()],
                      [c[3] for c in cur.values()],
                      [r[0] for r in remaining],
                      [r[1] for r in remaining],
                      [r[2] for r in remaining],
                      [r[3] for r in remaining]))
        if remaining:
            # Wake when the watermark passes the oldest pending
            # event (clamped ahead of the current watermark — Spark
            # rejects timestamps at/behind it).
            wm_ms = state.getCurrentWatermarkMs()
            oldest_us = min(r[1] for r in remaining)
            state.setTimeoutTimestamp(
                max(oldest_us // 1000 + 1, wm_ms + 1))
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
                     tie_col: str = "event_id",
                     user_buckets: int = 256) -> DataFrame:
    """Streaming step-advance feed for the funnel ``steps``: one
    appended row per (user, step) the moment the watermark seals the
    advance. Input may be a stream or a batch frame routed through
    the same function for differential testing.

    ``tie_col`` MUST be an integral column (validated up front): the
    state carries ties as longs, and silently coercing a string tie
    would order "10" before "9" — diverging from the batch funnel,
    which accepts any orderable tie. Hash or dictionary-encode
    non-integral ties on both twins identically before calling.

    ``user_buckets`` bounds the number of state groups (Arrow
    round-trips per micro-batch); raise it if a single bucket's
    pending buffer grows past executor memory at extreme per-user
    event rates, lower it toward 1 only for debugging.
    """
    from pyspark.sql import functions as F

    if len(steps) < 2:
        raise ValueError(f"a funnel needs >= 2 steps, got {steps!r}")
    if user_buckets < 1:
        raise ValueError(f"user_buckets must be >= 1, got {user_buckets}")
    tie_type = dict(events.dtypes).get(tie_col)
    if tie_type not in _INTEGRAL_TYPES:
        raise ValueError(
            f"streaming_funnel carries the tie as a long: tie_col "
            f"{tie_col!r} must be integral, got {tie_type!r} — encode "
            "it to an integer (identically for the batch twin) first")
    prepared = (events
                .withWatermark(ts_col, watermark)
                .filter(F.col(type_col).isin(*steps))
                # The watermarked event-time column itself must stay
                # in the projection for event-time timeouts.
                .select(F.col(user_col).alias("user_id"),
                        F.col(ts_col),
                        F.unix_micros(F.col(ts_col)).alias("ts_us"),
                        F.col(tie_col).cast("long").alias("tie"),
                        F.col(type_col).alias("et"),
                        F.pmod(F.xxhash64(F.col(user_col)),
                               F.lit(user_buckets)).alias("bucket")))
    return (prepared.groupBy("bucket").applyInPandasWithState(
        _mk_fold(list(steps), int(horizon_s) * 1_000_000),
        outputStructType=FUNNEL_OUTPUT,
        stateStructType=FUNNEL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout))
