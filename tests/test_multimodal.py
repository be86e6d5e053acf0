"""Binary-modality pipeline tests: schema, determinism, batch shape."""

from __future__ import annotations

from lisp_batch_processor_spark.operators.multimodal import (
    FEATURE_DIM,
    q_multimodal_decode,
)

_FEATURE_COLS = [f"f{i}" for i in range(FEATURE_DIM)]


def test_decode_schema_and_shape(spark, sf_dir):
    df = q_multimodal_decode(spark, sf_dir)
    assert [f.name for f in df.schema.fields] == (
        ["doc_id", "modality", "byte_len"] + _FEATURE_COLS)
    rows = df.limit(20).collect()
    assert rows
    for r in rows:
        assert r.modality == "text/plain"
        feats = [r[c] for c in _FEATURE_COLS]
        assert abs(sum(feats) - 1.0) < 1e-6  # histogram sums to 1
        assert r.byte_len > 0


def test_decode_deterministic(spark, sf_dir):
    def snap():
        return {r.doc_id: tuple(r[c] for c in _FEATURE_COLS)
                for r in q_multimodal_decode(spark, sf_dir).collect()}

    assert snap() == snap()
