"""Streaming dedup — the reference's dedup-on-insert (R4/R6,
`Batch Processor.py:231, 240`) as an incremental operator.

Batch dedup keeps all keys forever; a stream can't. Two honest
variants:

- `dedup_within_watermark`: drops duplicate event_ids whose
  duplicates arrive within the watermark horizon — state is evicted
  once the watermark passes, so memory is bounded by (arrival rate x
  watermark), the standard at-least-once -> effectively-once fix.
- `dedup_exact_unbounded`: exact forever-dedup via dropDuplicates on
  a keyed stream — state grows with distinct keys; only for bounded
  key domains (documented trade-off, same as any engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_within_watermark(events: DataFrame,
                           watermark: str = "1 hour") -> DataFrame:
    """Keep the first arrival of each event_id; suppress duplicates
    arriving within the watermark horizon. State for an id is evicted
    once the watermark passes its event time."""
    return (events.withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["event_id"]))


def dedup_exact_unbounded(events: DataFrame) -> DataFrame:
    """Exact streaming dedup on event_id with unbounded state —
    correct for key domains that fit in the state store."""
    return events.dropDuplicates(["event_id"])
