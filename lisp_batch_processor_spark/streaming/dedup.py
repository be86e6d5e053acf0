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


def streaming_near_dup_ingest(stream_docs: DataFrame, index_path: str,
                              store_path: str, sink,
                              threshold_num: int = 7,
                              threshold_den: int = 10):
    """Streaming ingest with ever-growing near-dup suppression — the
    streaming twin of `operators.dedup.incremental_near_dups`, and
    the reference's dedup-on-insert (R4/R6) generalized from exact
    path-string dedup to MinHash near-dup at corpus scale.

    Each micro-batch of (doc_id, text) is assigned against the
    PERSISTED corpus stores (banded-signature index at `index_path`,
    shingle verify store at `store_path` — `banded_signatures` /
    `shingle_store` parquet, seeded from the initial corpus), then
    the batch's survivors append their own signatures + shingle sets
    to both stores, so later micro-batches also dedup against every
    earlier survivor. `sink(assignment_df, epoch_id)` receives each
    epoch's (doc_id, rep_id, is_dup) rows.

    Why foreachBatch and not a pure stream-static plan: the per-doc
    min-neighbor reduction would be an unbounded-state streaming
    aggregation, and the store append is a batch write — exactly the
    two things Structured Streaming's foreachBatch escape hatch is
    for. The per-epoch work item is the batch operator itself, so
    batch and streaming can't drift.

    Ordering inside the epoch matters: the epoch's assignment is
    eagerly materialized BEFORE the appends run — both read the
    stores lazily, so appending first would let a doc match its own
    just-appended signature. Returns the DataStreamWriter (caller
    picks trigger/start); use a checkpointLocation for exactly-once
    epoch replay — reprocessing an epoch re-appends its survivors,
    which the min-id assignment tolerates (duplicate index rows
    produce the same candidates).
    """
    from pyspark.sql import functions as F

    from lisp_batch_processor_spark.operators.dedup import (
        banded_signatures, incremental_near_dups, minhash_signatures,
        shingle_store)

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.localCheckpoint(eager=True)
        idx = spark.read.parquet(index_path)
        store = spark.read.parquet(store_path)
        out = (incremental_near_dups(None, batch,
                                     corpus_index=idx,
                                     verify_store=store,
                                     threshold_num=threshold_num,
                                     threshold_den=threshold_den)
               .localCheckpoint(eager=True))  # snapshot pre-append
        survivors = (batch.join(out.filter(~F.col("is_dup"))
                                .select("doc_id"), "doc_id")
                     .localCheckpoint(eager=True))
        banded_signatures(minhash_signatures(survivors)) \
            .write.mode("append").parquet(index_path)
        shingle_store(survivors).write.mode("append").parquet(store_path)
        sink(out, epoch_id)

    return stream_docs.writeStream.foreachBatch(_process)
