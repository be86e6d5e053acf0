"""Bloom filter operator: no false negatives ever, fpp near target,
and the prefiltered incremental append is bit-identical to the plain
anti-join path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lisp_batch_processor_spark.operators.bloom import (
    bloom_build, bloom_parameters, bloom_probe, bloom_union,
    incremental_append_bloom)
from lisp_batch_processor_spark.sources.readers import incremental_append


def test_bloom_parameters_textbook():
    m, k = bloom_parameters(1000, 0.01)
    # ~9.585 bits/key, k ~ 7 at 1% fpp
    assert 9 * 1000 <= m <= 10.5 * 1000
    assert k == 7
    # Rounded to whole 64-bit words
    assert m % 64 == 0


def test_bloom_no_false_negatives(spark):
    members = spark.range(0, 2000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k"))
    m, k = bloom_parameters(2000, 0.01)
    bloom = bloom_build(members, "k", m, k)
    flagged = bloom_probe(members, bloom, "k", m, k)
    assert flagged.filter(~F.col("maybe_present")).count() == 0


def test_bloom_fpp_near_target(spark):
    members = spark.range(0, 5000).select(
        F.concat(F.lit("in-"), F.col("id")).alias("k"))
    outsiders = spark.range(0, 5000).select(
        F.concat(F.lit("out-"), F.col("id")).alias("k"))
    m, k = bloom_parameters(5000, 0.01)
    bloom = bloom_build(members, "k", m, k)
    fp = (bloom_probe(outsiders, bloom, "k", m, k)
          .filter(F.col("maybe_present")).count())
    # 1% target; allow generous slack for a 5000-trial estimate
    assert fp <= 5000 * 0.03
    # ... but the filter must actually discriminate
    assert fp < 5000


def test_bloom_sparse_word_map(spark):
    members = spark.range(0, 100).select(F.col("id").alias("k"))
    m, k = bloom_parameters(100_000, 0.01)  # heavily oversized
    bloom = bloom_build(members, "k", m, k)
    # One row per NON-ZERO word: at most rows*k words touched
    assert bloom.count() <= 100 * k
    # Only (word_idx, bits) columns
    assert bloom.columns == ["word_idx", "bits"]


def test_bloom_union_equals_single_build(spark):
    a = spark.range(0, 500).select(F.col("id").alias("k"))
    b = spark.range(400, 900).select(F.col("id").alias("k"))
    m, k = bloom_parameters(1000, 0.01)
    merged = bloom_union(bloom_build(a, "k", m, k),
                         bloom_build(b, "k", m, k))
    whole = bloom_build(a.unionByName(b), "k", m, k)
    assert (merged.exceptAll(whole).count() == 0
            and whole.exceptAll(merged).count() == 0)


def test_bloom_multi_column_key(spark):
    members = spark.range(0, 300).select(
        (F.col("id") % 10).alias("a"), F.col("id").alias("b"))
    m, k = bloom_parameters(300, 0.01)
    bloom = bloom_build(members, ["a", "b"], m, k)
    flagged = bloom_probe(members, bloom, ["a", "b"], m, k)
    assert flagged.filter(~F.col("maybe_present")).count() == 0


@pytest.mark.slow
def test_band_bloom_prefilter_preserves_near_dup_assignments(spark):
    """incremental_near_dups with a corpus-band Bloom prefilter must
    assign the batch identically to the unfiltered path, while the
    prefilter itself provably drops the novel docs' band rows."""
    from lisp_batch_processor_spark.operators.bloom import (
        prefilter_members)
    from lisp_batch_processor_spark.operators.dedup import (
        banded_signatures, incremental_near_dups, minhash_signatures)

    base = ("the quick brown fox jumps over the lazy dog while the "
            "cold winter wind blows across the quiet frozen valley "
            "and the pale morning sun climbs above the distant hills")
    corpus = spark.createDataFrame(
        [(10, base),
         (11, "databases indexes btrees transactions locks logs pages "
              "buffers recovery checkpoints undo redo vacuum stats")],
        "doc_id long, text string")
    batch = spark.createDataFrame(
        [(20, base.replace("winter", "summer")),   # corpus near-dup
         (21, "totally novel text about mountains rivers valleys and "
              "glaciers carving stone over ten thousand slow years"),
         (22, "second novel doc on tides moons orbits and the slow "
              "clockwork of planets sweeping out equal areas")],
        "doc_id long, text string")

    idx = banded_signatures(minhash_signatures(corpus))
    m, k = bloom_parameters(max(idx.count(), 1), 0.01)
    band_bloom = bloom_build(idx, ["band_idx", "band_key"], m, k)

    want = {(r.doc_id, r.rep_id, r.is_dup)
            for r in incremental_near_dups(corpus, batch).collect()}
    got = {(r.doc_id, r.rep_id, r.is_dup)
           for r in incremental_near_dups(
               corpus, batch, corpus_band_bloom=band_bloom,
               bloom_bits=m, bloom_hashes=k).collect()}
    assert got == want
    assert dict((d, (r, f)) for d, r, f in got)[20] == (10, True)

    # The prefilter must actually prune: the two novel docs' bands
    # (8 rows) cannot all survive a 1% fpp filter.
    new_banded = banded_signatures(minhash_signatures(batch))
    kept = prefilter_members(
        new_banded, band_bloom, ["band_idx", "band_key"], m, k)
    assert kept.count() < new_banded.count()


def test_incremental_append_bloom_equals_plain(spark):
    existing = spark.range(0, 1000).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("path"),
        (F.col("id") * 2).alias("payload"))
    # Batch: 50 dups of existing keys (conflicting payloads must NOT
    # replace existing rows), 150 new, plus an in-batch duplicate key
    batch = spark.range(950, 1150).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("path"),
        (F.col("id") * 7).alias("payload"))
    batch = batch.unionByName(batch.limit(1))
    m, k = bloom_parameters(1000, 0.01)
    bloom = bloom_build(existing, "path", m, k)

    got = incremental_append_bloom(existing, batch, "path", bloom, m, k)
    want = incremental_append(existing, batch, "path")
    assert got.count() == want.count() == 1150
    assert (got.exceptAll(want).count() == 0
            and want.exceptAll(got).count() == 0)


def test_incremental_append_bloom_null_keys_match_plain(spark):
    """NULL-key batch rows must survive the bloom path exactly as
    they survive the plain path (round-4 regression: the null-unsafe
    flag join-back left their flag NULL and BOTH branches dropped
    them)."""
    existing = spark.createDataFrame(
        [("doc-1", 1), (None, 2)], "path string, payload long")
    batch = spark.createDataFrame(
        [("doc-1", 10),   # existing key -> skipped
         ("doc-9", 11),   # new key -> appended
         (None, 12)],     # NULL key: plain anti-join KEEPS it
        "path string, payload long")
    m, k = bloom_parameters(2, 0.01)
    bloom = bloom_build(existing, "path", m, k)

    got = incremental_append_bloom(existing, batch, "path", bloom, m, k)
    want = incremental_append(existing, batch, "path")
    assert (got.exceptAll(want).count() == 0
            and want.exceptAll(got).count() == 0)
    # The NULL-key batch row is present (name-based anti-join never
    # matches NULL, so the plain path keeps it — and so must we).
    assert got.filter(F.col("path").isNull()).count() == 2

    # bloom_probe itself: every NULL-key row carries a real flag.
    flagged = bloom_probe(batch, bloom, "path", m, k)
    assert (flagged.filter(F.col("maybe_present").isNull()).count()
            == 0)


# ---------------------------------------------------------------------------
# bloom_parameters pure property suite (no SparkSession needed).
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=10**12),
    fpp=st.floats(min_value=1e-6, max_value=0.5,
                  allow_nan=False, allow_infinity=False),
)
def test_bloom_parameters_properties(n, fpp):
    import math

    m, k = bloom_parameters(n, fpp)
    # Whole words, at least one word, at least one hash.
    assert m % 64 == 0 and m >= 64 and k >= 1
    # Within one word of the textbook optimum m* = -n ln p / ln^2 2.
    m_star = -n * math.log(fpp) / (math.log(2) ** 2)
    assert m >= min(m_star, 64)
    assert m <= max(m_star, 64) + 64
    # k is the rounded optimum for the ACTUAL m.
    assert abs(k - m / n * math.log(2)) <= 0.5 + 1e-9 or k == 1
    # Monotone in n at fixed fpp (more keys never shrink the filter).
    m2, _ = bloom_parameters(n + max(1, n // 7), fpp)
    assert m2 >= m
