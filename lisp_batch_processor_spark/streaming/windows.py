"""Structured Streaming: watermarked tumbling windows and session
windows over the `events` table shape (SURVEY.md §2.C
q_event_sessionize streaming mode; milestone 3).

The reference's nearest analog is incremental drag-and-drop ingest +
live status ticks (`Batch Processor.py:237-244, 420-425`, R4/R18) —
here that becomes a real incremental engine: readStream over the
events schema, event-time windows with a watermark for late data,
and exactly-once sinks via checkpoint + idempotent writers.

For local verification the parquet fixture drives the stream
(one file = one micro-batch) into a memory sink; swap
``readStream.format("kafka")`` in production — the query body is
identical, which is the point.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Non-ts columns are stable across fixture generations; ts's physical
# type varies (TIMESTAMP(NANOS) vs TIMESTAMP(MICROS)) so the stream
# schema is probed from the batch footer at call time.
_EVENTS_FIELDS = [
    T.StructField("event_id", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
]


def read_events_stream(spark: SparkSession, sf_dir: str,
                       max_files_per_trigger: int = 1) -> DataFrame:
    """readStream over the events fixture: ts normalized to
    TimestampType under the same truncation contract as the batch
    catalog (catalog.normalize_event_ts), whatever the fixture's
    physical timestamp type.

    max_files_per_trigger=1 exercises multi-micro-batch behavior
    (each file a batch); pass a large value when a caller needs the
    whole fixture in ONE data batch (e.g. q_stream_sessions, whose
    oracle equivalence assumes gap-closes are decided against all
    in-data evidence at once).

    The fixture may be either the driver's SINGLE FILE
    `events.parquet` (selected out of the shared sf dir via
    pathGlobFilter) or a Spark-written DIRECTORY of part files (the
    scale blow-ups under .scale/) — the stream source points at
    whichever shape exists, so the same reader under test feeds both
    the correctness fixtures and the multi-file scale corpora.
    """
    from lisp_batch_processor_spark.catalog import (
        normalize_event_ts, read_parquet_nanos_ok)

    # Streams need a declared schema; probe ts's physical type from
    # the batch footer (metadata-only read) so one code path serves
    # every fixture vintage. The probe tolerates legacy
    # TIMESTAMP(NANOS) fixtures without mutating session state (see
    # read_parquet_nanos_ok — set-and-restore around the probe only;
    # the stream itself runs under the DECLARED schema, so execution
    # never consults the legacy conf).
    path = f"{sf_dir}/events.parquet"
    ts_type = read_parquet_nanos_ok(spark, path).schema["ts"].dataType
    schema = T.StructType([_EVENTS_FIELDS[0],
                           T.StructField("ts", ts_type),
                           *_EVENTS_FIELDS[1:]])
    reader = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger))
    if os.path.isdir(path):
        raw = reader.option("pathGlobFilter", "*.parquet").parquet(path)
    else:
        raw = reader.option("pathGlobFilter", "events.parquet") \
                    .parquet(sf_dir)
    return normalize_event_ts(raw)


def streaming_tumbling_counts(events: DataFrame,
                              watermark: str = "1 hour",
                              window: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window counts per event type — the
    streaming twin of q_window_tumbling. Late rows beyond the
    watermark are dropped and state is evicted, which is what keeps
    state bounded on an unbounded stream.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
               .alias("sum_value"))
        .select(F.col("w.start").alias("window_start"),
                "event_type", "n_events", "sum_value")
    )


def streaming_sessionize(events: DataFrame,
                         watermark: str = "30 minutes",
                         gap: str = "30 minutes") -> DataFrame:
    """Session windows with a dynamic inactivity gap — the streaming
    twin of q_event_sessionize, using the built-in session_window
    (state store handles merge-on-update; no custom stateful op
    needed for gap sessions).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
               .alias("sum_value"))
        .select("user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events", "sum_value")
    )


def run_to_memory(df: DataFrame, name: str) -> None:
    """Drive a streaming query over the finite fixture to completion
    synchronously (complete mode; memory sink) — the local test
    harness for the streaming mode."""
    q = (df.writeStream.outputMode("complete")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
