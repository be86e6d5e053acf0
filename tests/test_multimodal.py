"""Binary-modality pipeline tests: schema, determinism, batch shape."""

from __future__ import annotations

from lisp_batch_processor_spark.operators.multimodal import (
    FEATURE_DIM,
    q_multimodal_decode,
)


def test_decode_schema_and_shape(spark, sf_dir):
    df = q_multimodal_decode(spark, sf_dir)
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "modality", "byte_len", "features"]
    rows = df.limit(20).collect()
    assert rows
    for r in rows:
        assert r.modality == "text/plain"
        assert len(r.features) == FEATURE_DIM
        assert abs(sum(r.features) - 1.0) < 1e-6  # histogram sums to 1
        assert r.byte_len > 0


def test_decode_deterministic(spark, sf_dir):
    a = {r.doc_id: r.features
         for r in q_multimodal_decode(spark, sf_dir).collect()}
    b = {r.doc_id: r.features
         for r in q_multimodal_decode(spark, sf_dir).collect()}
    assert a == b
