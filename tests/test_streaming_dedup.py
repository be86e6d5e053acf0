"""Streaming dedup: duplicate event_ids injected into the stream are
suppressed; result matches batch dropDuplicates."""

from __future__ import annotations

import os

import pytest

from lisp_batch_processor_spark.catalog import load
from lisp_batch_processor_spark.streaming.dedup import dedup_within_watermark


@pytest.mark.slow
def test_streaming_dedup_within_watermark(spark, sf_dir, tmp_path):
    # Build a source dir whose single file contains each event twice.
    ev = load(spark, sf_dir, "events").limit(500)
    doubled = ev.unionByName(ev)
    src = os.path.join(str(tmp_path), "dup_events")
    doubled.write.parquet(src)

    # Spark wrote the file, so ts is a real timestamp (not the
    # fixture's raw nanos): stream with the written schema.
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    out = dedup_within_watermark(stream)
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName("dedup_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_out"
    ).collect()[0]
    assert got.n == 500
    assert got.d == 500
