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
from lisp_batch_processor_spark.functions.numeric import dsum
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
SELECT user_id, session_id,
  COUNT(*) AS n_events,
  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value,
  MIN(epoch_us(ts)) AS session_start_us,
  (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 1000000 AS duration_s
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
            ((F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts")))
             / F.lit(1_000_000)).cast("bigint").alias("duration_s"),
        )
    )


_Q_WINDOW_TUMBLING_ORACLE = """
SELECT
  strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
    AS window_start,
  event_type,
  COUNT(*) AS n_events,
  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value,
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
