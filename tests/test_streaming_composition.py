"""Composition of the foreachBatch maintenance loops: one document
stream driven through FIVE persisted-state operators inside a single
micro-batch loop — near-dup ingest, line dedup, quantile-histogram
and HLL sketch maintenance, and a type-1 CDC dimension upsert — must
leave every store in exactly the state of its isolated run.

The operators are tested only in isolation elsewhere
(test_streaming_dedup / test_sketches / test_cdc); this pins that
they share one epoch without clobbering each other's stores, epoch
markers, or localCheckpoint snapshots."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id long, text string"

BOILER = ("subscribe to our newsletter for updates and offers "
          "delivered weekly to your inbox")
BODY_A = ("the quick brown fox jumps over the lazy dog and runs far "
          "away into the deep dark forest to find some food for the "
          "long winter ahead of us all")
BODY_B = ("totally novel text about mountains rivers valleys and "
          "glaciers carving stone over ten thousand slow years of "
          "patient geological time")
BODY_C = ("entirely fresh content on tide pools barnacles kelp "
          "anemones urchins and the patient rhythm of the moon "
          "pulling water up the shore")


pytestmark = pytest.mark.slow  # whole-module streaming-lifecycle tier


def _batches(spark):
    """Three micro-batches: a near-dup pair across batches (11 ~ 20),
    the boilerplate line repeated in every batch, and fresh bodies."""
    rows = [
        [(10, BODY_A + "\n" + BOILER),
         (11, BODY_B + "\n" + BOILER)],
        [(20, BODY_B.replace("slow", "fast") + "\n" + BOILER),
         (21, BODY_C + "\n" + "unique line only in doc twenty one")],
        [(30, "another completely different document about desert "
              "sand dunes wind and the slow march of saguaro cactus "
              "across a hundred years" + "\n" + BOILER)],
    ]
    return [spark.createDataFrame(b, DOC_SCHEMA) for b in rows]


SPLITS = [40.0, 90.0, 140.0]


def _with_features(batch):
    return batch.select(
        "doc_id", "text",
        (F.col("doc_id") % 2).alias("g"),
        F.length("text").cast("double").alias("v"))


def _dim_updates(batch):
    return _with_features(batch).select(
        F.col("doc_id").alias("k"), F.col("v").cast("long").alias("length"))


def _init_stores(spark, root):
    from lisp_batch_processor_spark.operators.cdc import upsert_init
    from lisp_batch_processor_spark.operators.dedup import (
        banded_signatures, minhash_signatures, shingle_store)
    from lisp_batch_processor_spark.streaming.dedup import line_store_init

    paths = {n: os.path.join(root, n) for n in
             ("index", "shingles", "lines", "qhist", "hll", "dim")}
    corpus = spark.createDataFrame([(1, BODY_A)], DOC_SCHEMA)
    banded_signatures(minhash_signatures(corpus)) \
        .write.parquet(paths["index"])
    shingle_store(corpus).write.parquet(paths["shingles"])
    line_store_init(spark, paths["lines"])
    upsert_init(spark.createDataFrame([(1, 7)], "k long, length long"),
                paths["dim"], key="k", n_buckets=4)
    return paths


def _run_epoch(spark, paths, batch, epoch_id, outs):
    """The composed per-epoch work item: all five maintenance
    operators against their stores, in one foreachBatch body."""
    from lisp_batch_processor_spark.operators.cdc import upsert_apply
    from lisp_batch_processor_spark.operators.sketches import (
        hll_build, quantile_hist_build)
    from lisp_batch_processor_spark.streaming.dedup import (
        line_dedup_ingest_epoch, near_dup_ingest_epoch)

    nd = near_dup_ingest_epoch(batch, paths["index"], paths["shingles"])
    outs.setdefault("nd", set()).update(
        (r.doc_id, r.rep_id, r.is_dup) for r in nd.collect())
    ld = line_dedup_ingest_epoch(batch, paths["lines"], epoch_id)
    outs.setdefault("ld", set()).update(
        (r.doc_id, r.text, r.lines_kept) for r in ld.collect())
    feat = _with_features(batch)
    (quantile_hist_build(feat, ["g"], "v", SPLITS)
     .withColumn("epoch_id", F.lit(int(epoch_id)))
     .write.mode("append").parquet(paths["qhist"]))
    hll_build(feat, ["g"], "doc_id") \
        .write.mode("append").parquet(paths["hll"])
    upsert_apply(spark, paths["dim"], _dim_updates(batch),
                 epoch_id=epoch_id)


def _store_states(spark, paths):
    from lisp_batch_processor_spark.operators.cdc import upsert_read
    from lisp_batch_processor_spark.operators.sketches import (
        hll_rollup, hll_store_read, quantile_hist_store_read)

    return {
        "index_ids": frozenset(
            r.doc_id for r in spark.read.parquet(paths["index"])
            .select("doc_id").distinct().collect()),
        "shingle_ids": frozenset(
            r.doc_id for r in spark.read.parquet(paths["shingles"])
            .select("doc_id").distinct().collect()),
        "lines": frozenset(
            (r.line_key, r.epoch_id)
            for r in spark.read.parquet(paths["lines"]).collect()),
        "qhist": frozenset(
            (r.g, r.bucket, r.cnt)
            for r in quantile_hist_store_read(spark, paths["qhist"],
                                              ["g"]).collect()),
        "hll": frozenset(
            (r.g, r.n_distinct)
            for r in hll_rollup(hll_store_read(spark, paths["hll"]),
                                ["g"]).collect()),
        "dim": frozenset(
            (r.k, r.length)
            for r in upsert_read(spark, paths["dim"]).collect()),
    }


@pytest.mark.slow
def test_composed_maintenance_loop_equals_isolated_runs(spark,
                                                        tmp_path):
    batches = _batches(spark)

    # Composed: one stream, one foreachBatch running all five.
    comp_paths = _init_stores(spark, os.path.join(str(tmp_path), "comp"))
    src = os.path.join(str(tmp_path), "incoming")
    for i, b in enumerate(batches):
        b.coalesce(1).write.parquet(os.path.join(src, f"batch={i}"))
    stream = (spark.readStream.schema(DOC_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "batch=*")))
    comp_outs: dict = {}
    q = (stream.writeStream.foreachBatch(
            lambda bdf, eid: _run_epoch(spark, comp_paths, bdf, eid,
                                        comp_outs))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # Isolated: the same batches through each operator ALONE against
    # fresh stores (the per-epoch functions are the pinned
    # batch==stream work items, so direct calls are the reference).
    from lisp_batch_processor_spark.operators.cdc import upsert_apply
    from lisp_batch_processor_spark.operators.sketches import (
        hll_build, quantile_hist_build)
    from lisp_batch_processor_spark.streaming.dedup import (
        line_dedup_ingest_epoch, near_dup_ingest_epoch)

    iso_paths = _init_stores(spark, os.path.join(str(tmp_path), "iso"))
    iso_outs: dict = {}
    for e, b in enumerate(batches):
        nd = near_dup_ingest_epoch(b, iso_paths["index"],
                                   iso_paths["shingles"])
        iso_outs.setdefault("nd", set()).update(
            (r.doc_id, r.rep_id, r.is_dup) for r in nd.collect())
    for e, b in enumerate(batches):
        ld = line_dedup_ingest_epoch(b, iso_paths["lines"], e)
        iso_outs.setdefault("ld", set()).update(
            (r.doc_id, r.text, r.lines_kept) for r in ld.collect())
    for e, b in enumerate(batches):
        (quantile_hist_build(_with_features(b), ["g"], "v", SPLITS)
         .withColumn("epoch_id", F.lit(e))
         .write.mode("append").parquet(iso_paths["qhist"]))
        hll_build(_with_features(b), ["g"], "doc_id") \
            .write.mode("append").parquet(iso_paths["hll"])
    for e, b in enumerate(batches):
        upsert_apply(spark, iso_paths["dim"], _dim_updates(b),
                     epoch_id=e)

    assert comp_outs["nd"] == iso_outs["nd"]
    assert comp_outs["ld"] == iso_outs["ld"]
    comp_state = _store_states(spark, comp_paths)
    iso_state = _store_states(spark, iso_paths)
    assert comp_state == iso_state

    # Sanity on the scenario itself: the cross-batch near-dup was
    # caught, the boilerplate line deduped after its first epoch,
    # and the dimension holds the latest lengths.
    assert (20, 11, True) in comp_outs["nd"]
    assert all(BOILER not in t for d, t, _ in comp_outs["ld"]
               if d in (20, 30) and t is not None)
    dim = dict(comp_state["dim"])
    assert dim[30] > 0 and 1 in dim  # upserted doc + untouched seed

    # And the sketch stores still compact cleanly AFTER the composed
    # run (the maintenance-on-maintenance path).
    from lisp_batch_processor_spark.operators.sketches import (
        sketch_store_compact)
    assert sketch_store_compact(spark, comp_paths["qhist"]) == 2
    assert sketch_store_compact(spark, comp_paths["hll"]) > 0
    after = _store_states(spark, comp_paths)
    assert after["qhist"] == comp_state["qhist"]
    assert after["hll"] == comp_state["hll"]

    # Same for the dimension: per-bucket compaction bounds the file
    # count and the table state is untouched.
    from lisp_batch_processor_spark.operators.cdc import (
        _bucket_dirs, upsert_compact)
    upsert_compact(spark, comp_paths["dim"], min_files=1)
    for broot in _bucket_dirs(spark, comp_paths["dim"]):
        n = len([f for f in os.listdir(broot)
                 if not f.startswith(("_", "."))])
        assert n == 1, (broot, n)
    assert _store_states(spark, comp_paths)["dim"] == comp_state["dim"]
