"""Custom stateful streaming operator via applyInPandasWithState.

Built-in session_window covers plain gap sessions
(`streaming/windows.py`); this module implements what it cannot:
BOUNDED sessions — a session closes on a 30-minute inactivity gap OR
as soon as it reaches MAX_EVENTS rows, whichever comes first. That
per-group, order-dependent, split-on-condition logic is exactly the
"custom stateful operator" case (SURVEY.md §2.C q_event_sessionize
streaming mode; the reference's nearest analog is its per-item
stateful walk, `Batch Processor.py:306-310`).

Scale notes: state is one tiny tuple per user (open-session
aggregate), partitioned by user_id across executors; the watermark
bounds how long an idle session's state lives (GroupStateTimeout),
so state size is O(active users), not O(events).

Session-identity contract: `session_seq` is unique per user WITHIN
the state-retention horizon — after a timeout close, an empty
seq-carrier row holds the next seq for another 2x gap of watermark
time, then is garbage-collected (the standard keyed-state TTL
trade-off; without GC, state grows O(all users ever seen)). A user
returning after GC restarts at seq 0, so (user_id, session_seq) can
recur across retention windows; (user_id, start_us) — both emitted —
is the globally unique session key.
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType,
)

SESSION_GAP_US = 30 * 60 * 1_000_000
MAX_EVENTS = 20

# closed_by: 0 = in-data inactivity gap, 1 = max-events, 2 = watermark
# timeout (no further data arrived). Distinguishing 0 from 2 lets a
# caller take the deterministic in-data subset of a finite replay.
OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_seq", LongType()),
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
    StructField("start_us", LongType()),
    StructField("end_us", LongType()),
    StructField("closed_by", LongType()),
])

# state: (session_seq, n_events, sum_cents, start_us, last_us).
# The running sum is held in integer CENTS: float accumulation order
# would make sum_value depend on batch boundaries; integer adds are
# exact and match a decimal-sum oracle bit-for-bit.
STATE_SCHEMA = StructType([
    StructField("session_seq", LongType()),
    StructField("n_events", LongType()),
    StructField("sum_cents", LongType()),
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
])


def _set_timeout(state: GroupState, proposed_ms: int) -> None:
    """Set an event-time timeout, clamped to stay ahead of the current
    watermark (Spark rejects timestamps at/behind it — reachable when
    a timeout fires late because the watermark jumped far forward)."""
    wm = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(proposed_ms, wm + 1))


def _bounded_sessions(key: tuple, pdfs: Iterable[pd.DataFrame],
                      state: GroupState):
    """Fold this micro-batch's rows (event-time order) into the open
    session; emit every session that closes by gap or by size.

    Per-group cost matters here more than anywhere else in the repo:
    this function runs once per user group per micro-batch (guide
    §4.2), so the pandas fixed costs are paid O(groups), not O(rows).
    Round 14 trimmed them — no concat for the common single-chunk
    group, numpy lexsort + array extraction instead of a whole-frame
    sort_values, the quantization vectorized out of the row loop, and
    column-dict output construction instead of a list of row dicts.
    The row fold itself is unchanged (same branches, same integer
    cents). Locally flat (two interleaved A/B sessions: min −5/−8 %,
    median −3/+1 % — the fixture's per-group work is parallel and
    small); the claim is per-group CPU at scale, where groups per
    task is what this operator pays for. Output value-checked
    identical (93,965 rows) against the previous body."""
    (user_id,) = key
    if state.hasTimedOut:
        # Watermark passed last_event + gap: the open session is
        # definitively closed (no on-time row can extend it). The
        # sequence counter must SURVIVE the close — removing state
        # here would restart the user's next session at seq 0 and
        # collide (user_id, session_seq) keys across batches — so
        # keep an empty (n_events=0) state row carrying seq+1, with a
        # later timeout that garbage-collects it if the user stays
        # idle (state stays O(recently-active users)).
        if state.exists:
            seq, n, sv, start, last = state.get
            if n > 0:
                state.update((seq + 1, 0, 0, last, last))
                _set_timeout(state, (int(last) + 2 * SESSION_GAP_US) // 1000)
                yield pd.DataFrame(
                    {"user_id": [user_id], "session_seq": [seq],
                     "n_events": [n], "sum_value": [sv / 100.0],
                     "start_us": [start], "end_us": [last],
                     "closed_by": [2]})
            else:
                # Second timeout on the empty seq-carrier: drop it.
                state.remove()
        return

    chunks = list(pdfs)
    rows = chunks[0] if len(chunks) == 1 else pd.concat(
        chunks, ignore_index=True)
    ts_a = rows["ts_us"].to_numpy()
    order = np.lexsort((rows["event_id"].to_numpy(), ts_a))
    ts_l = ts_a[order].tolist()
    # Half-up quantization (floor(x*100 + 0.5)), matching the
    # dround/DECIMAL-cast convention — Python round() is half-even
    # and would silently diverge from the oracle on a value whose
    # double*100 lands exactly on .5 (e.g. 0.125) or any >2dp input.
    # Values are non-negative (fixture contract). np.floor performs
    # the identical IEEE double ops elementwise, and every cents
    # value is integer-exact in double, so the int64 cast is exact.
    cents_l = np.floor(rows["value"].to_numpy()[order] * 100.0
                       + 0.5).astype("int64").tolist()
    if state.exists:
        seq, n, sv, start, last = state.get
    else:
        seq, n, sv, start, last = 0, 0, 0, None, None
    out = []
    for ts_us, cents in zip(ts_l, cents_l):
        if n > 0 and (ts_us - last) > SESSION_GAP_US:
            out.append((seq, n, sv, start, last, 0))
            seq, n, sv, start = seq + 1, 0, 0, None
        if n == 0:
            start = ts_us
        n += 1
        sv += cents
        last = ts_us
        if n >= MAX_EVENTS:
            out.append((seq, n, sv, start, last, 1))
            seq, n, sv, start = seq + 1, 0, 0, None
    if n > 0:
        state.update((seq, n, sv, int(start), int(last)))
        # Event-time timeout: fire once the watermark passes the gap
        # horizon — wall-clock-independent and terminating on finite
        # input (no perpetual empty micro-batches).
        _set_timeout(state, (int(last) + SESSION_GAP_US) // 1000)
    elif last is not None:
        # Batch ended exactly on a max-events close: persist the seq
        # carrier (same rationale as the timeout branch) instead of
        # dropping it and restarting the user at seq 0.
        state.update((seq, 0, 0, int(last), int(last)))
        _set_timeout(state, (int(last) + 2 * SESSION_GAP_US) // 1000)
    elif state.exists:
        state.remove()
    if out:
        cols = list(zip(*out))
        yield pd.DataFrame(
            {"user_id": [user_id] * len(out), "session_seq": cols[0],
             "n_events": cols[1],
             "sum_value": [c / 100.0 for c in cols[2]],
             "start_us": cols[3], "end_us": cols[4], "closed_by": cols[5]})


def bounded_sessionize(events: DataFrame) -> DataFrame:
    """events (ts, user_id, event_id, value) -> closed bounded
    sessions. Input may be a stream (update mode) or a batch frame
    routed through the same function for differential testing."""
    from pyspark.sql import functions as F

    prepared = (events.withWatermark("ts", "30 minutes")
                .select("user_id", "event_id", "ts",
                        F.unix_micros("ts").alias("ts_us"), "value"))
    return (prepared.groupBy("user_id").applyInPandasWithState(
        _bounded_sessions,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout))
