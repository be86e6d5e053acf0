"""Event-time operators: tumbling windows and sessionization
(SURVEY.md §2.C q_event_sessionize; milestone 3).

Batch variants live here; the Structured Streaming twins (same
semantics as a mode, not a separate engine) are in
``lisp_batch_processor_spark.streaming``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lisp_batch_processor_spark.catalog import load
from lisp_batch_processor_spark.functions.numeric import dsum, sql_dsum
from lisp_batch_processor_spark.registry import query

SESSION_GAP_SECONDS = 30 * 60

_Q_EVENT_SESSIONIZE_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
    CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_SECONDS} * 1000000
         OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT *, SUM(new_session) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id,
  -- DuckDB's windowed SUM(int) is HUGEINT, which pandas-canonicalizes
  -- to float64; Spark emits bigint. Pin the type — this is the
  -- functions/numeric.sql_isum convention, inlined because the SUM
  -- lives in the CTE above, not in this SELECT.
  CAST(session_id AS BIGINT) AS session_id,
  COUNT(*) AS n_events,
  {sql_dsum('value')} AS sum_value,
  MIN(epoch_us(ts)) AS session_start_us,
  CAST((MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 1000000 AS BIGINT)
    AS duration_s
FROM sessions
GROUP BY user_id, session_id
"""


@query("q_event_sessionize", oracle=_Q_EVENT_SESSIONIZE_ORACLE)
def q_event_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity gap): lag ->
    new-session flag -> running sum as session id -> per-session
    rollup. Generalizes the reference's per-item stateful walk (R13).

    Scale notes: one shuffle on user_id serves both windows and the
    final groupBy (same partitioning, Catalyst reuses the exchange);
    frames are streaming so memory is bounded per user partition.
    Timestamps are compared in epoch microseconds — the fixture's
    ns component is zero, so Spark's micros == DuckDB's ns.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ts_us = F.unix_micros("ts")
    lag_us = F.unix_micros(F.lag("ts").over(w))
    new_session = F.when(
        lag_us.isNull()
        | ((ts_us - lag_us) > SESSION_GAP_SECONDS * 1_000_000), 1).otherwise(0)
    return (
        ev.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(run))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", 2).alias("sum_value"),
            F.min(F.unix_micros("ts")).alias("session_start_us"),
            F.max(F.unix_micros("ts")).alias("_end_us"),
        )
        # Integer div (not double /1e6 + cast) matches DuckDB's //
        # exactly; both sides are non-negative micros.
        .withColumn("duration_s",
                    F.expr("(_end_us - session_start_us) div 1000000"))
        .drop("_end_us")
    )


# Deterministic window form rather than DuckDB's ASOF JOIN: when
# several touches share the greatest b.ts < a.ts, ASOF picks an
# unspecified one — the randomized differential test (same-instant
# touches planted) caught Spark and DuckDB picking different rows.
# The operator's contract is "latest ts, ties by largest event_id",
# and this oracle replays exactly that.
_Q_JOIN_ASOF_ORACLE = """
SELECT event_id, user_id, conv_ts_us, touch_event_id, touch_ts_us,
       touch_type
FROM (
  SELECT a.event_id, a.user_id,
    epoch_us(a.ts) AS conv_ts_us,
    b.event_id AS touch_event_id,
    epoch_us(b.ts) AS touch_ts_us,
    b.event_type AS touch_type,
    row_number() OVER (PARTITION BY a.event_id
                       ORDER BY b.ts DESC, b.event_id DESC) AS rn
  FROM (SELECT * FROM events WHERE event_type = 'error') a
  JOIN (SELECT * FROM events WHERE event_type IN ('click', 'view')) b
    ON a.user_id = b.user_id AND b.ts < a.ts
)
WHERE rn = 1
"""


@query("q_join_asof", oracle=_Q_JOIN_ASOF_ORACLE)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — an operator Spark's DataFrame API lacks: each
    'error' event joined to the same user's most recent strictly-
    earlier 'click'/'view' (attribution's last-touch). Implemented
    with the union-sort pattern: tag both sides, union, one window
    per user carrying the last touch forward, keep the error rows.

    Scale notes: this is ONE shuffle on user_id and a streaming
    window frame — no row explosion, no inequality join (Spark would
    execute `b.ts < a.ts` as a broadcast nested loop). The same plan
    shape serves any as-of tolerance by filtering the carried gap.
    """
    ev = load(spark, sf_dir, "events")
    conv = (ev.filter(F.col("event_type") == "error")
            .select("event_id", "user_id", "ts",
                    F.lit(None).cast("long").alias("t_id"),
                    F.lit(None).cast("string").alias("t_type"),
                    F.lit(0).alias("side")))
    touch = (ev.filter(F.col("event_type").isin("click", "view"))
             .select("event_id", "user_id", "ts",
                     F.col("event_id").alias("t_id"),
                     F.col("event_type").alias("t_type"),
                     F.lit(1).alias("side")))
    # Order (ts, side, event_id): at equal ts the error (side 0)
    # sorts before the touch, so a same-instant touch is not visible
    # — the strict `b.ts < a.ts` semantics. event_id makes the order
    # TOTAL: when several touches share a ts, the largest event_id
    # sorts last and is the one carried — without it `last()` over a
    # tied order is partitioning-dependent (caught by the randomized
    # differential test; the fixture has unique per-user timestamps
    # so the gate alone could not see it).
    w = (Window.partitionBy("user_id").orderBy("ts", "side", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = (conv.unionByName(touch)
               .withColumn("touch_event_id",
                           F.last("t_id", ignorenulls=True).over(w))
               .withColumn("touch_ts_us",
                           F.last(F.when(F.col("side") == 1,
                                         F.unix_micros("ts")),
                                  ignorenulls=True).over(w))
               .withColumn("touch_type",
                           F.last("t_type", ignorenulls=True).over(w)))
    return (carried.filter((F.col("side") == 0)
                           & F.col("touch_event_id").isNotNull())
            .select("event_id", "user_id",
                    F.unix_micros("ts").alias("conv_ts_us"),
                    "touch_event_id", "touch_ts_us", "touch_type"))


RANGE_JOIN_WINDOW_S = 600

_Q_JOIN_RANGE_ORACLE = f"""
SELECT a.event_id, a.user_id,
  COUNT(*) AS n_touches,
  {sql_dsum('b.value')} AS sum_touch_value,
  MAX(epoch_us(b.ts)) AS last_touch_us
FROM (SELECT * FROM events WHERE event_type = 'error') a
JOIN (SELECT * FROM events WHERE event_type IN ('click', 'view')) b
  ON a.user_id = b.user_id
 AND b.ts >= a.ts - INTERVAL {RANGE_JOIN_WINDOW_S} SECOND
 AND b.ts < a.ts
GROUP BY a.event_id, a.user_id
"""


@query("q_join_range", oracle=_Q_JOIN_RANGE_ORACLE)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: per 'error' event, aggregate the same user's
    'click'/'view' events in the preceding 10 minutes.

    Scale notes: a raw `b.ts BETWEEN a.ts - 10m AND a.ts` predicate
    gives Spark no equi-key (broadcast nested loop — unusable at
    100 TB). Instead both sides are bucketed to 10-minute epochs and
    the probe side expands to its two covering buckets, making an
    equi-join on (user_id, bucket) with the exact range as residual:
    candidate volume is bounded by bucket population, shuffles hash-
    partition evenly, and AQE can still pick broadcast when one side
    is small.
    """
    ev = load(spark, sf_dir, "events")
    bucket = lambda c: (F.unix_micros(c) / F.lit(RANGE_JOIN_WINDOW_S * 1_000_000)).cast("bigint")  # noqa: E731
    conv = (ev.filter(F.col("event_type") == "error")
            .select("event_id", "user_id", F.unix_micros("ts").alias("a_us"),
                    F.explode(F.array(bucket(F.col("ts")),
                                      bucket(F.col("ts")) - 1)).alias("bucket")))
    touch = (ev.filter(F.col("event_type").isin("click", "view"))
             .select(F.col("user_id").alias("t_user"), "value",
                     F.unix_micros("ts").alias("b_us"),
                     bucket(F.col("ts")).alias("bucket")))
    return (
        conv.join(touch, (conv.user_id == touch.t_user)
                  & (conv.bucket == touch.bucket)
                  & (touch.b_us >= conv.a_us - RANGE_JOIN_WINDOW_S * 1_000_000)
                  & (touch.b_us < conv.a_us))
        .groupBy("event_id", "user_id")
        .agg(F.count(F.lit(1)).alias("n_touches"),
             dsum("value", 2).alias("sum_touch_value"),
             F.max("b_us").alias("last_touch_us"))
    )


_Q_WINDOW_TUMBLING_ORACLE = f"""
SELECT
  strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
    AS window_start,
  event_type,
  COUNT(*) AS n_events,
  {sql_dsum('value')} AS sum_value,
  COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


@query("q_window_tumbling", oracle=_Q_WINDOW_TUMBLING_ORACLE)
def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event type — the batch
    twin of the streaming windowed aggregation
    (`streaming/windows.py`); window-start emitted as a string to pin
    cross-engine timestamp formatting.

    Scale notes: window(ts) is a projection, so this is a plain
    groupBy shuffle on (hour, type) — bounded cardinality per day.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             dsum("value", 2).alias("sum_value"),
             F.countDistinct("user_id").alias("n_users"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss")
                .alias("window_start"),
            "event_type", "n_events", "sum_value", "n_users",
        )
    )


def funnel(events: DataFrame, steps: list[str],
           horizon_s: int = 24 * 3600,
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type",
           tie_col: str = "event_id") -> DataFrame:
    """Ordered-sequence conversion ("funnel") over an event stream:
    for each user, match step i at the earliest event of type
    ``steps[i]`` STRICTLY after the step i-1 match (ties broken by
    ``tie_col``, so same-instant events have a deterministic order),
    anchored at the user's EARLIEST step-0 event, with every later
    step landing within ``horizon_s`` of that anchor. Returns the
    conversion table ``(step_idx, step, n_users)`` — n_users is how
    many users reached at least that step.

    Semantics are the standard "earliest-anchor greedy" funnel:
    deterministic, one answer per user, replayable in any engine
    (Python replay pinned in tests/test_new_operators.py). A user
    whose first anchor fails the horizon does NOT retry a later
    anchor — document-simple and what most funnel products compute.

    Scale notes (100 TB): events are pre-filtered to the step types
    (predicate pushdown to the scan), then ONE shuffle on user_id
    builds each user's sorted (ts, tie, type) array, and the greedy
    walk is a single JVM-side `aggregate` over that array — no
    per-step joins, no window functions, no Python. Per-user state is
    the user's step-typed events only; the final count is a
    map-side-combinable global aggregate producing k numbers. Skewed
    power users cost one wide array each (bound it upstream with a
    time-range filter if a user can emit millions of step events
    inside the horizon).
    """
    if len(steps) < 2:
        raise ValueError(f"a funnel needs >= 2 steps, got {steps!r}")
    k = len(steps)
    step_arr = F.array(*[F.lit(s) for s in steps])
    horizon_us = int(horizon_s) * 1_000_000
    ev = (events
          .filter(F.col(type_col).isin(*steps))
          .select(F.col(user_col).alias("_fn_user"),
                  F.struct(
                      F.unix_micros(F.col(ts_col)).alias("us"),
                      F.col(tie_col).alias("tie"),
                      F.col(type_col).alias("et")).alias("_fn_e")))
    per_user = (ev.groupBy("_fn_user")
                .agg(F.array_sort(F.collect_list("_fn_e")).alias("_fn_es")))
    init = F.struct(
        F.lit(0).alias("m"),
        F.lit(None).cast("long").alias("prev_us"),
        F.lit(None).cast("long").alias("prev_tie"),
        F.lit(None).cast("long").alias("t1_us"))
    def _step(acc, e):
        advance = (
            (acc["m"] < k)
            & (e["et"] == F.element_at(step_arr, acc["m"] + 1))
            & ((acc["m"] == 0)
               | (F.struct(e["us"], e["tie"])
                  > F.struct(acc["prev_us"], acc["prev_tie"])))
            & ((acc["m"] == 0)
               | (e["us"] <= acc["t1_us"] + F.lit(horizon_us))))
        return F.when(advance, F.struct(
            (acc["m"] + 1).alias("m"),
            e["us"].alias("prev_us"),
            e["tie"].cast("long").alias("prev_tie"),
            F.coalesce(acc["t1_us"], e["us"]).alias("t1_us"))
        ).otherwise(acc)
    reached = per_user.select(
        F.aggregate("_fn_es", init, _step)["m"].alias("_fn_m"))
    counts = reached.agg(*[
        F.sum((F.col("_fn_m") >= i + 1).cast("long")).alias(f"_fn_s{i}")
        for i in range(k)])
    return (counts.select(F.posexplode(
                F.array(*[F.coalesce(F.col(f"_fn_s{i}"), F.lit(0))
                          for i in range(k)]))
                .alias("step_idx", "n_users"))
            .select("step_idx",
                    F.element_at(step_arr, F.col("step_idx") + 1)
                     .alias("step"),
                    "n_users"))


def asof_join(left: DataFrame, right: DataFrame,
              on: str = "ts", by: list[str] | str = "user_id",
              tolerance_s: int | None = None, strict: bool = True,
              right_prefix: str = "r_",
              direction: str = "backward") -> DataFrame:
    """General as-of join (pandas `merge_asof`) — the reusable
    library form of q_join_asof's union-sort pattern: each left row
    gains the NEAREST matching right row among rows sharing the
    ``by`` keys, optionally within ``tolerance_s`` seconds —
    ``backward`` (default): the greatest right ``on`` ≤ (or <, when
    ``strict``) the left row's; ``forward``: the smallest right
    ``on`` ≥ (or >) it. Right columns arrive prefixed; unmatched
    left rows keep NULLs (left-outer semantics).

    ``on`` must be a timestamp column on BOTH sides. Ties among
    right rows at the matched instant resolve by the greatest
    right-row struct for ``backward`` and the SMALLEST for
    ``forward`` — forward is exactly backward under time negation,
    which flips the struct order too, so the rule stays a total,
    partitioning-independent order (the q_join_asof tie lesson,
    generalized).

    Plan shape — the whole point: ONE shuffle on the ``by`` keys and
    a streaming window frame in either direction. The naive
    formulation (``right.on < left.on`` + row_number) plans as a
    broadcast nested loop or an exploding theta join; this is the
    shape that survives 100 TB. Same single-shuffle basis as
    q_join_asof, whose plan the audit pins.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or "
                         f"'forward', got {direction!r}")
    keys = [by] if isinstance(by, str) else list(by)
    lpay = F.struct(*[F.col(c) for c in left.columns])
    rpay = F.struct(*[F.col(c) for c in right.columns])
    ltype = left.select(lpay.alias("p")).schema["p"].dataType
    rtype = right.select(rpay.alias("p")).schema["p"].dataType
    # strict: left sorts BEFORE a same-instant right row in scan
    # order (invisible); non-strict: after (visible). The side
    # assignment is direction-independent because the scan reverses
    # WITH the ``on`` order below.
    lside, rside = (0, 1) if strict else (1, 0)
    lu = left.select(
        *[F.col(k) for k in keys], F.col(on).alias("_aj_on"),
        F.lit(lside).alias("_aj_side"), lpay.alias("_aj_l"),
        F.lit(None).cast(rtype).alias("_aj_r"))
    ru = right.select(
        *[F.col(k) for k in keys], F.col(on).alias("_aj_on"),
        F.lit(rside).alias("_aj_side"),
        F.lit(None).cast(ltype).alias("_aj_l"), rpay.alias("_aj_r"))
    if direction == "backward":
        order = [F.col("_aj_on").asc(), F.col("_aj_side").asc(),
                 F.col("_aj_r").asc()]
    else:
        # Time-negated scan: largest ``on`` first, so the last right
        # seen before a left row is the smallest ``on`` at/after it;
        # struct desc makes the instant's SMALLEST struct win.
        order = [F.col("_aj_on").desc(), F.col("_aj_side").asc(),
                 F.col("_aj_r").desc()]
    w = (Window.partitionBy(*keys)
         .orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = (lu.unionByName(ru)
               .withColumn("_aj_m", F.last("_aj_r", ignorenulls=True).over(w))
               .filter(F.col("_aj_l").isNotNull()))
    if tolerance_s is not None:
        gap = (F.unix_micros(F.col("_aj_on"))
               - F.unix_micros(F.col("_aj_m")[on]))
        in_tol = ((gap if direction == "backward" else -gap)
                  <= int(tolerance_s) * 1_000_000)
        carried = carried.withColumn(
            "_aj_m", F.when(in_tol, F.col("_aj_m")))
    return carried.select(
        *[F.col("_aj_l")[c].alias(c) for c in left.columns],
        *[F.col("_aj_m")[c].alias(f"{right_prefix}{c}")
          for c in right.columns])


def range_join(left: DataFrame, right: DataFrame,
               on: str = "ts", by: list[str] | str = "user_id",
               lower_s: int = -600, upper_s: int = 0,
               right_prefix: str = "r_") -> DataFrame:
    """General interval join — every (left, right) pair sharing the
    ``by`` keys whose timestamps satisfy
    ``left.on + lower_s <= right.on <= left.on + upper_s`` (defaults:
    the preceding 10 minutes, q_join_range's shape). One row per
    matching PAIR, right columns prefixed; aggregate downstream.

    Plan shape — the reusable library form of q_join_range's
    bucketing: a raw BETWEEN predicate has no equi-key (Spark plans
    a broadcast nested loop — unusable at scale), so both sides
    bucket to width-(upper−lower) epochs, the left side explodes to
    its covering buckets (always exactly 2 for any window), and the
    join is an equi-join on (by..., bucket) with the exact interval
    as a residual filter: candidate volume is bounded by bucket
    population, shuffles hash-partition evenly, and AQE still picks
    broadcast when one side is small.

    ``on`` must be a timestamp column on both sides; the window must
    be non-empty (lower_s < upper_s... equal bounds would mean an
    exact-instant join — use a plain equi-join on the timestamp).
    """
    if not lower_s < upper_s:
        raise ValueError(
            f"need lower_s < upper_s, got [{lower_s}, {upper_s}]")
    keys = [by] if isinstance(by, str) else list(by)
    width_us = (upper_s - lower_s) * 1_000_000
    lo_us, up_us = lower_s * 1_000_000, upper_s * 1_000_000

    def bucket(us_col):
        return F.floor(us_col / F.lit(width_us)).cast("long")

    lpay = F.struct(*[F.col(c) for c in left.columns])
    rpay = F.struct(*[F.col(c) for c in right.columns])
    l_us = F.unix_micros(F.col(on))
    # The left row's match interval [l+lo, l+up] spans width_us, so
    # it covers exactly the bucket of (l+lo) and the one after.
    lu = left.select(
        *[F.col(k).alias(f"_rj_k{i}") for i, k in enumerate(keys)],
        l_us.alias("_rj_lus"), lpay.alias("_rj_l"),
        F.explode(F.array(bucket(l_us + lo_us),
                          bucket(l_us + lo_us) + 1)).alias("_rj_b"))
    r_us = F.unix_micros(F.col(on))
    ru = right.select(
        *[F.col(k).alias(f"_rj_k{i}") for i, k in enumerate(keys)],
        r_us.alias("_rj_rus"), rpay.alias("_rj_r"),
        bucket(r_us).alias("_rj_b"))
    joined = lu.join(ru, [f"_rj_k{i}" for i in range(len(keys))]
                     + ["_rj_b"])
    matched = joined.filter(
        (F.col("_rj_rus") >= F.col("_rj_lus") + lo_us)
        & (F.col("_rj_rus") <= F.col("_rj_lus") + up_us))
    return matched.select(
        *[F.col("_rj_l")[c].alias(c) for c in left.columns],
        *[F.col("_rj_r")[c].alias(f"{right_prefix}{c}")
          for c in right.columns])


def sessionize(events: DataFrame, gap_s: int = SESSION_GAP_SECONDS,
               on: str = "ts", by: list[str] | str = "user_id",
               tie: str = "event_id",
               session_col: str = "session_id") -> DataFrame:
    """General gap-based sessionization as a library function — the
    reusable form of q_event_sessionize's lag → new-session flag →
    running-sum pattern: every input row comes back with a
    ``session_col`` (1-based per ``by`` group — the group's first
    row opens session 1, matching q_event_sessionize — ordered by
    (``on``, ``tie``)), where a new session starts when the gap to
    the previous row STRICTLY exceeds ``gap_s`` seconds. Keeping the
    rows (rather than rolling up) lets callers aggregate whatever
    they need per session — or feed the funnel/as-of operators with
    a session-scoped key.

    Plan shape: one shuffle on the ``by`` keys serving both window
    functions (Catalyst reuses the exchange); frames are streaming,
    so memory is bounded per group partition. The streaming mode of
    this semantics is streaming/windows.streaming_sessionize
    (session_window) and streaming/stateful.bounded_sessionize (the
    custom capped variant).
    """
    keys = [by] if isinstance(by, str) else list(by)
    w = Window.partitionBy(*keys).orderBy(on, tie)
    gap_us = int(gap_s) * 1_000_000
    prev_us = F.unix_micros(F.lag(on).over(w))
    new_flag = F.when(
        prev_us.isNull()
        | (F.unix_micros(F.col(on)) - prev_us > gap_us), 1
    ).otherwise(0)
    run = (Window.partitionBy(*keys).orderBy(on, tie)
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (events
            .withColumn("_sz_new", new_flag)
            .withColumn(session_col,
                        F.sum("_sz_new").over(run).cast("long"))
            .drop("_sz_new"))


# ---------------------------------------------------------------------------
# Attribution join — "latest qualifying touch before each conversion"
# (the click-attribution shape; batch twin of
# streaming.joins.streaming_attribution_join).
# ---------------------------------------------------------------------------

ATTRIBUTION_MODELS = ("last_touch", "first_touch", "all_touches")


def attribution_join(events: DataFrame, conv_type: str = "purchase",
                     touch_type: str = "click",
                     horizon_s: int = 24 * 3600,
                     user_col: str = "user_id", ts_col: str = "ts",
                     type_col: str = "event_type",
                     id_col: str = "event_id",
                     emit_unmatched: bool = False,
                     model: str = "last_touch") -> DataFrame:
    """Attribute each ``conv_type`` event to the ``touch_type``
    events by the same user with ``conv_ts - horizon_s <= touch_ts
    <= conv_ts``. Returns (user, conversion_id, conv_ts, touch_id,
    touch_ts); with ``emit_unmatched`` every conversion appears and
    unattributed ones carry NULL touch columns (the funnel-drop
    report). Three models, each mirrored by the streaming twin
    (`streaming.joins.streaming_attribution_join`, pinned equal on
    replay in tests/test_streaming_joins.py):

    - ``last_touch`` (default): the LATEST qualifying touch, one row
      per attributed conversion; ties at one instant resolve to the
      greatest touch id (asof_join's greatest-right-struct rule).
    - ``first_touch``: the EARLIEST qualifying touch; ties at one
      instant resolve to the SMALLEST touch id (the forward
      direction's mirrored tie rule).
    - ``all_touches``: every qualifying (conversion, touch) pair,
      one row each — the raw material for positional/linear credit
      weighting downstream.

    Plan shape: two filters of one scan, then one shuffle on the
    user key — `asof_join`'s union-sort window for last/first touch
    (first touch is the forward as-of from ``conv_ts - horizon``
    with the same tolerance), `range_join`'s bucketed equi-join for
    all_touches. No theta join, no per-conversion subquery.
    """
    if model not in ATTRIBUTION_MODELS:
        raise ValueError(f"model must be one of "
                         f"{ATTRIBUTION_MODELS}, got {model!r}")
    if int(horizon_s) < 0:
        raise ValueError(f"horizon_s must be >= 0, got {horizon_s} "
                         "(0 = same-instant attribution)")
    touches = (events.filter(F.col(type_col) == touch_type)
               .select(F.col(user_col),
                       F.col(ts_col),
                       F.col(id_col).alias("touch_id")))
    if model == "all_touches":
        convs = (events.filter(F.col(type_col) == conv_type)
                 .select(F.col(user_col),
                         F.col(ts_col),
                         F.col(id_col).alias("conversion_id")))
        if int(horizon_s) == 0:
            # Degenerate window [conv_ts, conv_ts]: an exact-instant
            # equi-join on (user, ts) — range_join's bucketing needs
            # a non-empty interval, but the semantics here are plain
            # equality, and last/first touch already accept
            # horizon_s=0 (same-instant attribution); all three
            # models now agree on the parameter.
            t = touches.select(
                F.col(user_col).alias(f"_at_{user_col}"),
                F.col(ts_col).alias(f"r_{ts_col}"),
                F.col("touch_id").alias("r_touch_id"))
            pairs = convs.join(
                t, (F.col(user_col) == F.col(f"_at_{user_col}"))
                & (F.col(ts_col) == F.col(f"r_{ts_col}")))
        else:
            pairs = range_join(convs, touches, on=ts_col, by=user_col,
                               lower_s=-int(horizon_s), upper_s=0)
        out = pairs.select(
            F.col(user_col), "conversion_id",
            F.col(ts_col).alias("conv_ts"),
            F.col("r_touch_id").alias("touch_id"),
            F.col(f"r_{ts_col}").alias("touch_ts"))
        if emit_unmatched:
            unmatched = (convs.join(out.select("conversion_id"),
                                    "conversion_id", "left_anti")
                         .select(F.col(user_col), "conversion_id",
                                 F.col(ts_col).alias("conv_ts"),
                                 F.lit(None).cast(
                                     dict(out.dtypes)["touch_id"])
                                 .alias("touch_id"),
                                 F.lit(None).cast("timestamp")
                                 .alias("touch_ts")))
            out = out.unionByName(unmatched)
        return out
    if model == "last_touch":
        convs = (events.filter(F.col(type_col) == conv_type)
                 .select(F.col(user_col),
                         F.col(ts_col),
                         F.col(id_col).alias("conversion_id")))
        j = asof_join(convs, touches, on=ts_col, by=user_col,
                      tolerance_s=horizon_s, strict=False)
        conv_ts = F.col(ts_col)
    else:  # first_touch: forward as-of from the window's left edge
        convs = (events.filter(F.col(type_col) == conv_type)
                 .select(F.col(user_col),
                         (F.col(ts_col) - F.expr(
                             f"INTERVAL {int(horizon_s)} SECOND"))
                         .alias(ts_col),
                         F.col(ts_col).alias("_at_conv_ts"),
                         F.col(id_col).alias("conversion_id")))
        j = asof_join(convs, touches, on=ts_col, by=user_col,
                      tolerance_s=horizon_s, strict=False,
                      direction="forward")
        conv_ts = F.col("_at_conv_ts")
    if not emit_unmatched:
        j = j.filter(F.col("r_touch_id").isNotNull())
    return (j.select(F.col(user_col), "conversion_id",
                     conv_ts.alias("conv_ts"),
                     F.col("r_touch_id").alias("touch_id"),
                     F.col(f"r_{ts_col}").alias("touch_ts")))


CREDIT_MODELS = ("linear", "position_based", "time_decay")


def attribution_credit(pairs: DataFrame, model: str = "linear",
                       u_weight: float = 0.4,
                       half_life_s: int = 7 * 24 * 3600) -> DataFrame:
    """Fractional-credit weighting over an ``all_touches`` pair set
    (the output of ``attribution_join(model="all_touches")``): every
    (conversion, touch) row gains a ``credit`` column and each
    conversion's credits sum to exactly 1 — the multi-touch models
    marketing analytics layers over the raw pair expansion:

    - ``linear``: 1/n to each of the conversion's n touches;
    - ``position_based`` (U-shaped): ``u_weight`` to the FIRST and
      to the LAST touch, the remaining 1 − 2·u_weight split evenly
      across the middle touches; one touch → 1.0, two touches →
      0.5/0.5 (the standard degenerate-case convention);
    - ``time_decay``: weight 2^(−age/half_life) where age =
      conv_ts − touch_ts, normalized per conversion — recent
      touches dominate smoothly instead of winner-take-all.

    Touch order within a conversion is the total (touch_ts,
    touch_id) order, consistent with the single-touch models' tie
    rules (first = smallest id at the earliest instant, last =
    greatest at the latest). NULL-touch rows (an ``emit_unmatched``
    pair set) keep a NULL credit — unattributed conversions carry
    no credit to distribute.

    Plan shape: ONE shuffle on conversion_id serving both window
    frames (count + row_number reuse the exchange; Catalyst
    collapses them into one Window node chain) — no join back to
    the pair set, no per-conversion subquery. Skew-safe: a
    conversion's pair count is bounded by touches-per-user in the
    horizon, the same bound as the pair expansion itself.
    """
    if model not in CREDIT_MODELS:
        raise ValueError(f"model must be one of {CREDIT_MODELS}, "
                         f"got {model!r}")
    if model == "position_based" and not 0.0 <= 2 * u_weight <= 1.0:
        raise ValueError(f"need 0 <= 2*u_weight <= 1, got {u_weight}")
    w = Window.partitionBy("conversion_id")
    matched = F.col("touch_id").isNotNull()
    n = F.count(F.when(matched, 1)).over(w)
    if model == "linear":
        credit = 1.0 / n
    elif model == "position_based":
        pos = F.row_number().over(
            w.orderBy(F.col("touch_ts").asc_nulls_last(),
                      F.col("touch_id").asc_nulls_last()))
        uw = F.lit(float(u_weight))
        credit = (
            F.when(n == 1, F.lit(1.0))
            .when(n == 2, F.lit(0.5))
            .when((pos == 1) | (pos == n), uw)
            .otherwise((1.0 - 2 * uw) / (n - 2)))
    else:  # time_decay
        age_s = (F.unix_micros("conv_ts")
                 - F.unix_micros("touch_ts")) / 1e6
        weight = F.pow(F.lit(2.0), -age_s / F.lit(float(half_life_s)))
        credit = weight / F.sum(F.when(matched, weight)).over(w)
    return pairs.withColumn(
        "credit", F.when(matched, credit).cast("double"))
