"""Edge-case tests for the round-2 operators (the oracle gate covers
fixture-scale correctness; these pin the boundary semantics)."""

from __future__ import annotations

from pyspark.sql import types as T


def test_quantiles_single_row_group(spark, tmp_path):
    import os

    from lisp_batch_processor_spark.operators.relational import (
        q_agg_quantiles,
    )
    schema = T.StructType([
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_orderpriority", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
    ])
    rows = [(1, "solo", 42.0),
            (2, "pair", 10.0), (3, "pair", 30.0)]
    sf = os.path.join(str(tmp_path), "q")
    spark.createDataFrame(rows, schema).write.parquet(
        os.path.join(sf, "orders.parquet"))
    got = {r.o_orderpriority: r for r in q_agg_quantiles(spark, sf).collect()}
    # n=1: every quantile is the single value.
    assert (got["solo"].p25, got["solo"].p50,
            got["solo"].p75, got["solo"].p95) == (42.0,) * 4
    # n=2: ceil-rank selection -> p25/p50 pick rank 1, p75/p95 rank 2.
    assert (got["pair"].p25, got["pair"].p50) == (10.0, 10.0)
    assert (got["pair"].p75, got["pair"].p95) == (30.0, 30.0)


def test_editdist_identical_and_over_threshold(spark, tmp_path):
    import os

    from lisp_batch_processor_spark.operators.dedup import (
        MAX_EDIT_DIST, q_dedup_editdist,
    )
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("text", T.StringType()),
    ])
    base = "the quick brown fox jumps over the lazy dog " * 3
    rows = [
        (1, "s", base),
        (2, "s", base),                     # identical -> dist 0
        (3, "s", base.replace("quick", "quack")),  # tiny edit
        (4, "s", "z" * len(base)),          # same length, huge distance
        (5, "other", base),                 # different block: never paired
    ]
    sf = os.path.join(str(tmp_path), "e")
    spark.createDataFrame(rows, schema).write.parquet(
        os.path.join(sf, "documents.parquet"))
    got = {(r.doc_a, r.doc_b): r.dist
           for r in q_dedup_editdist(spark, sf).collect()}
    assert got[(1, 2)] == 0
    assert 0 < got[(1, 3)] <= MAX_EDIT_DIST
    assert (1, 4) not in got and (2, 4) not in got
    assert all(5 not in pair for pair in got)


def test_frames_cover_payload_exactly(spark, sf_dir):
    from lisp_batch_processor_spark.operators.multimodal import (
        FRAME_SIZE, FRAME_STRIDE, q_multimodal_frames,
    )
    rows = q_multimodal_frames(spark, sf_dir).collect()
    assert rows
    for r in rows[:200]:
        assert r.frame_idx % FRAME_STRIDE == 0
        assert r.frame_off == r.frame_idx * FRAME_SIZE
        assert 1 <= r.frame_len <= FRAME_SIZE
        assert len(r.frame_md5) == 32
