"""Stream-stream time-bounded joins — the native Structured
Streaming join class (state on BOTH sides, watermark-bounded), which
none of the other streaming twins exercise: sessions/funnel are
stateful aggregations, dedup is a keyed filter, the ingest loops are
foreachBatch. This module covers the canonical shape — last-touch
attribution: every conversion joined to the latest qualifying touch
by the same user within a horizon.

Why this is the scale-correct plan: Spark's stream-stream inner join
with a time-range condition keeps BOTH sides' state bounded by the
watermark + the range bound (touches older than
max(watermark, conv_watermark - horizon) are evicted; conversions
likewise) — state is (arrival rate × horizon) per side, never the
full history. The downstream "latest touch per conversion" is an
append-mode aggregation keyed by the conversion's event-time column,
so its state also closes with the watermark. Both stateful operators
run in ONE query (Spark's chained-stateful-operator support); the
alternative — materialize the join and post-process in batch — would
re-read the join output every trigger.

Semantics contract (pinned against the batch twin
`operators.events.attribution_join` by full replay + flush in
tests/test_streaming_joins.py):

- inner (default): conversions with no qualifying touch never emit;
  ``emit_unmatched`` switches both twins to left-outer — the
  streaming side emits the NULL-touch row only at watermark close
  (when no touch can still arrive), the batch side keeps
  asof_join's left-outer rows;
- latest touch wins; ties at one instant resolve to the greatest
  touch id (``max(struct(touch_ts, touch_id))`` here ==
  asof_join's greatest-right-struct there);
- same-instant touches qualify (``touch_ts <= conv_ts``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_attribution_join(events: DataFrame,
                               conv_type: str = "purchase",
                               touch_type: str = "click",
                               horizon_s: int = 24 * 3600,
                               watermark: str = "30 minutes",
                               user_col: str = "user_id",
                               ts_col: str = "ts",
                               type_col: str = "event_type",
                               id_col: str = "event_id",
                               emit_unmatched: bool = False,
                               model: str = "last_touch"
                               ) -> DataFrame:
    """Append-mode stream of (user, conversion_id, conv_ts, touch_id,
    touch_ts), mirroring the batch twin's three models:

    - ``last_touch`` / ``first_touch``: one row per attributed
      conversion, emitted once the watermark seals it (no earlier —
      a later-arriving better/earlier touch inside the watermark
      must still be able to win). The only difference is the final
      per-conversion aggregate: ``max(struct(touch_ts, touch_id))``
      vs ``min`` — the same tie rules as the batch twin (greatest
      touch id for last, smallest for first).
    - ``all_touches``: every qualifying pair, emitted as soon as
      both sides have arrived (no sealing aggregate needed — a pair
      is a pair regardless of later events).

    With ``emit_unmatched`` the join is LEFT-OUTER: a conversion
    with no qualifying touch emits once with NULL touch columns
    after the watermark proves no touch can still arrive — for the
    single-touch models the null-extended row is the group's only
    row, so the aggregation passes it through unchanged.

    Input may be a stream or a batch frame routed through the same
    function for differential testing. Both sides derive from ONE
    pre-filtered pass over `events`; non-participating event types
    never enter join state.
    """
    from lisp_batch_processor_spark.operators.events import (
        ATTRIBUTION_MODELS)

    if model not in ATTRIBUTION_MODELS:
        raise ValueError(f"model must be one of "
                         f"{ATTRIBUTION_MODELS}, got {model!r}")
    joined = _attribution_joined(
        events, conv_type, touch_type, horizon_s, watermark,
        user_col, ts_col, type_col, id_col, emit_unmatched)
    if model == "all_touches":
        return joined.select(F.col("c_user").alias(user_col),
                             "conversion_id", "conv_ts",
                             "touch_id", "touch_ts")
    pick = F.max if model == "last_touch" else F.min
    return (joined
            .groupBy("c_user", "conversion_id", "conv_ts")
            .agg(pick(F.struct("touch_ts", "touch_id")).alias("_at"))
            .select(F.col("c_user").alias(user_col),
                    "conversion_id", "conv_ts",
                    F.col("_at.touch_id").alias("touch_id"),
                    F.col("_at.touch_ts").alias("touch_ts")))


def _attribution_joined(events, conv_type, touch_type, horizon_s,
                        watermark, user_col, ts_col, type_col,
                        id_col, emit_unmatched) -> DataFrame:
    """The shared stream-stream time-bounded join core: one
    pre-filtered pass over `events` split into watermarked touch and
    conversion branches, joined on (user, conv−horizon ≤ touch ≤
    conv) — inner, or left-outer when ``emit_unmatched``."""
    if conv_type == touch_type:
        raise ValueError("conv_type and touch_type must differ "
                         f"(got {conv_type!r} for both)")
    # Watermark placement note: each branch's watermark advances only
    # on events of ITS participating type — Catalyst evaluates the
    # type filter before the watermark stats collection regardless of
    # where withWatermark sits in the chain (verified empirically: a
    # non-participating "noise" event advances neither watermark).
    # The global watermark is the min of the two branches, so
    # emission progress requires BOTH touch- and conversion-type
    # traffic; that is the honest semantics for a join between those
    # two sub-streams. Differential tests flush with one event of
    # each participating type.
    touches = (events
               .withWatermark(ts_col, watermark)
               .filter(F.col(type_col) == touch_type)
               .select(F.col(user_col).alias("t_user"),
                       F.col(ts_col).alias("touch_ts"),
                       F.col(id_col).alias("touch_id")))
    convs = (events
             .withWatermark(ts_col, watermark)
             .filter(F.col(type_col) == conv_type)
             .select(F.col(user_col).alias("c_user"),
                     F.col(ts_col).alias("conv_ts"),
                     F.col(id_col).alias("conversion_id")))
    lo = F.col("conv_ts") - F.expr(f"INTERVAL {int(horizon_s)} SECOND")
    return convs.join(
        touches,
        (F.col("c_user") == F.col("t_user"))
        & (F.col("touch_ts") <= F.col("conv_ts"))
        & (F.col("touch_ts") >= lo),
        "leftOuter" if emit_unmatched else "inner")


def streaming_attribution_credit(events: DataFrame,
                                 credit_model: str = "linear",
                                 u_weight: float = 0.4,
                                 half_life_s: int = 7 * 24 * 3600,
                                 conv_type: str = "purchase",
                                 touch_type: str = "click",
                                 horizon_s: int = 24 * 3600,
                                 watermark: str = "30 minutes",
                                 user_col: str = "user_id",
                                 ts_col: str = "ts",
                                 type_col: str = "event_type",
                                 id_col: str = "event_id",
                                 emit_unmatched: bool = False
                                 ) -> DataFrame:
    """The streaming twin of ``attribution_credit(attribution_join(
    model="all_touches"))``: an append-mode stream of (user,
    conversion_id, conv_ts, touch_id, touch_ts, credit) with each
    conversion's credits summing to 1 (see
    `operators.events.attribution_credit` for the three models and
    their conventions; with ``emit_unmatched``, a touchless
    conversion emits once with NULL touch columns and NULL credit).

    Why this needs its own shape: credit depends on the FULL touch
    set of a conversion (n for linear, positions for U-shaped, the
    weight total for time_decay), so pairs cannot stream out as they
    match — the conversion's touch set is sealed by ONE
    watermark-closed aggregation (``collect_list`` keyed by the
    conversion's event-time column) and the per-touch credits are
    then pure array arithmetic over the sorted set: ``transform`` /
    ``aggregate`` with an index, one posexplode — no second shuffle,
    no Python. Per-conversion state is its in-horizon touch set,
    the same bound as the join state itself. Touch order is the
    (touch_ts, touch_id) total order — the batch twin's.

    Pinned equal (per-credit isclose) to the batch composition on
    replay in tests/test_streaming_joins.py.
    """
    from lisp_batch_processor_spark.operators.events import (
        CREDIT_MODELS)

    if credit_model not in CREDIT_MODELS:
        raise ValueError(f"credit_model must be one of "
                         f"{CREDIT_MODELS}, got {credit_model!r}")
    if credit_model == "position_based" and not 0 <= 2 * u_weight <= 1:
        raise ValueError(f"need 0 <= 2*u_weight <= 1, got {u_weight}")
    joined = _attribution_joined(
        events, conv_type, touch_type, horizon_s, watermark,
        user_col, ts_col, type_col, id_col, emit_unmatched)
    sealed = (joined
              .groupBy("c_user", "conversion_id", "conv_ts")
              .agg(F.array_sort(F.collect_list(
                  F.struct("touch_ts", "touch_id"))).alias("_tc")))
    # The left-outer null-extended row arrives as struct(NULL, NULL);
    # strip it so n counts real touches only.
    touches = F.filter("_tc", lambda s: s["touch_id"].isNotNull())
    sealed = sealed.withColumn("_tc", touches)
    n = F.size("_tc")
    if credit_model == "time_decay":
        half = F.lit(float(half_life_s))

        def wgt(s):
            age_s = (F.unix_micros("conv_ts")
                     - F.unix_micros(s["touch_ts"])) / 1e6
            return F.pow(F.lit(2.0), -age_s / half)

        sealed = sealed.withColumn(
            "_tot", F.aggregate("_tc", F.lit(0.0),
                                lambda acc, s: acc + wgt(s)))
        credit = lambda s, i: wgt(s) / F.col("_tot")  # noqa: E731
    elif credit_model == "linear":
        credit = lambda s, i: F.lit(1.0) / n  # noqa: E731
    else:  # position_based
        uw = F.lit(float(u_weight))
        credit = (lambda s, i: (  # noqa: E731
            F.when(n == 1, F.lit(1.0))
            .when(n == 2, F.lit(0.5))
            .when((i == 0) | (i == n - 1), uw)
            .otherwise((1.0 - 2 * uw) / (n - 2))))
    out_arr = F.transform(
        "_tc", lambda s, i: F.struct(
            s["touch_ts"].alias("touch_ts"),
            s["touch_id"].alias("touch_id"),
            credit(s, i).cast("double").alias("credit")))
    null_row = F.array(F.struct(
        F.lit(None).cast(dict(sealed.select(
            F.col("_tc")[0]["touch_ts"].alias("t")).dtypes)["t"])
        .alias("touch_ts"),
        F.lit(None).cast(dict(sealed.select(
            F.col("_tc")[0]["touch_id"].alias("t")).dtypes)["t"])
        .alias("touch_id"),
        F.lit(None).cast("double").alias("credit")))
    return (sealed
            .select("c_user", "conversion_id", "conv_ts",
                    F.explode(F.when(n == 0, null_row)
                              .otherwise(out_arr)).alias("_e"))
            .select(F.col("c_user").alias(user_col),
                    "conversion_id", "conv_ts",
                    F.col("_e.touch_id").alias("touch_id"),
                    F.col("_e.touch_ts").alias("touch_ts"),
                    F.col("_e.credit").alias("credit")))
