"""Similarity-search property tests: cosine math vs numpy, exact
top-k ground truth, ANN recall."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lisp_batch_processor_spark.functions.vectors import cosine, dot, l2_norm

SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("a", T.ArrayType(T.FloatType())),
    T.StructField("b", T.ArrayType(T.FloatType())),
])


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.default_rng(7)
    rows = [(i,
             [float(x) for x in rng.normal(size=8).astype(np.float32)],
             [float(x) for x in rng.normal(size=8).astype(np.float32)])
            for i in range(20)]
    return spark.createDataFrame(rows, SCHEMA), rows


def test_dot_and_norm_match_numpy(spark, vec_df):
    df, rows = vec_df
    got = df.select("vec_id", dot(F.col("a"), F.col("b")).alias("d"),
                    l2_norm(F.col("a")).alias("n")).collect()
    for r in got:
        a = np.array(rows[r.vec_id][1], dtype=np.float64)
        b = np.array(rows[r.vec_id][2], dtype=np.float64)
        assert math.isclose(r.d, float(a @ b), rel_tol=1e-9)
        assert math.isclose(r.n, float(np.linalg.norm(a)), rel_tol=1e-9)


def test_cosine_bounds_and_self(spark, vec_df):
    df, _ = vec_df
    got = df.select(cosine(F.col("a"), F.col("b")).alias("c"),
                    cosine(F.col("a"), F.col("a")).alias("self")).collect()
    for r in got:
        assert -1.0 - 1e-9 <= r.c <= 1.0 + 1e-9
        assert math.isclose(r.self, 1.0, rel_tol=1e-9)


def test_ann_recall_against_brute_force(spark, sf_dir):
    from lisp_batch_processor_spark.operators.similarity import (
        q_similarity_ann, q_similarity_topk)
    exact = q_similarity_topk(spark, sf_dir).collect()
    approx = q_similarity_ann(spark, sf_dir).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    n_exact = sum(len(s) for s in exact_sets.values())
    hits = sum(len(exact_sets[q] & approx_sets.get(q, set()))
               for q in exact_sets)
    # Top-5 recall vs brute force: an ANN below this bar is
    # misconfigured (tune N_BANDS / BITS_PER_BAND), not "approximate".
    assert n_exact > 0
    assert hits / n_exact >= 0.8, f"ANN top-5 recall {hits / n_exact:.2f}"


def test_ivf_recall_against_brute_force(spark, sf_dir):
    """IVF is the second ANN scale path (SURVEY §2.C names IVF or
    LSH; both are now implemented). Seed-deterministic training (md5
    seeds; Lloyd means can move by ULPs across partitionings) keeps
    recall stable on the fixture without a flaky random sample —
    probing half the cells must recover most of the exact top-5."""
    from lisp_batch_processor_spark.operators.similarity import (
        ivf_topk, ivf_train, q_similarity_topk,
    )
    from lisp_batch_processor_spark.catalog import load

    emb = load(spark, sf_dir, "embeddings")
    cents = ivf_train(emb, k=16, iters=2)
    assert len(cents) == 16 and all(len(c) == 64 for c in cents)

    approx = ivf_topk(emb, cents, nprobe=8).collect()
    exact = q_similarity_topk(spark, sf_dir).collect()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    n_exact = sum(len(s) for s in exact_sets.values())
    hits = sum(len(exact_sets[q] & approx_sets.get(q, set()))
               for q in exact_sets)
    assert n_exact > 0
    assert hits / n_exact >= 0.6, f"IVF top-5 recall {hits / n_exact:.2f}"
    # Every IVF answer must carry the true exact cosine (re-rank is
    # exact): cross-check a value against the brute-force row.
    exact_vals = {(r.query_id, r.neighbor_id): r.cos_sim for r in exact}
    for r in approx:
        if (r.query_id, r.neighbor_id) in exact_vals:
            assert r.cos_sim == exact_vals[(r.query_id, r.neighbor_id)]


def test_ivf_train_on_sample_probe_full_corpus(spark, sf_dir):
    """The scale recipe in ivf_train's docstring — train centroids on
    a deterministic `md5(vec_id) < p` sample, then assign/probe the
    FULL corpus — must hold the same recall bar as full-corpus
    training (the sample only moves centroids, and nprobe/nlist is
    what bounds recall)."""
    from lisp_batch_processor_spark.catalog import load
    from lisp_batch_processor_spark.operators.similarity import (
        ivf_topk, ivf_train, q_similarity_topk,
    )

    emb = load(spark, sf_dir, "embeddings")
    # ~50% deterministic sample: first md5 hex digit < '8'.
    sample = emb.filter(
        F.md5(F.col("vec_id").cast("string")) < F.lit("8"))
    n_all, n_sample = emb.count(), sample.count()
    assert 0 < n_sample < n_all

    cents = ivf_train(sample, k=16, iters=2)
    assert len(cents) == 16

    approx = ivf_topk(emb, cents, nprobe=8).collect()
    exact = q_similarity_topk(spark, sf_dir).collect()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    n_exact = sum(len(s) for s in exact_sets.values())
    hits = sum(len(exact_sets[q] & approx_sets.get(q, set()))
               for q in exact_sets)
    assert n_exact > 0
    assert hits / n_exact >= 0.6, \
        f"sample-trained IVF top-5 recall {hits / n_exact:.2f}"


def test_ivf_train_tiny_corpus_clamps_k(spark):
    """A corpus smaller than k must train len(corpus) centroids, not
    IndexError inside the Lloyd refresh (ADVICE r3)."""
    import numpy as np

    from lisp_batch_processor_spark.operators.similarity import ivf_train

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=64)]) for i in range(5)]
    tiny = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = ivf_train(tiny, k=16, iters=1)
    assert len(cents) == 5 and all(len(c) == 64 for c in cents)


def test_ann_collapsed_equals_plain_on_duplicated_corpus(spark):
    """ann_topk_collapsed must return EXACTLY what the plain SRP path
    returns on a corpus full of exact-duplicate vectors (the SCALE.md
    adversarial case it exists to fix): identical candidate id sets,
    cosines, and ranks — while indexing only the unique vectors."""
    import numpy as np

    from lisp_batch_processor_spark.operators.similarity import (
        ann_topk_collapsed, collapse_duplicate_vectors, srp_ann_topk,
    )

    rng = np.random.default_rng(11)
    uniq_vecs = [[float(x) for x in rng.normal(size=64).astype(np.float32)]
                 for _ in range(30)]
    # Copies assigned round-robin so the low ids (the query set) are
    # spread across groups of multiplicity 1..4 — queries themselves
    # have exact-duplicate twins that must rank as neighbors (cos 1.0).
    copies = []
    for i, v in enumerate(uniq_vecs):
        copies.extend([v] * (1 + i % 4))
    rows = [(i, v) for i, v in enumerate(copies)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    grouped = collapse_duplicate_vectors(emb)
    assert grouped.count() == 30
    got_members = {tuple(r.members) for r in grouped.collect()}
    assert all(len(set(m)) == len(m) for m in got_members)
    assert sum(len(m) for m in got_members) == len(copies)

    plain = {(r.query_id, r.neighbor_id, r.cos_sim, r.rank)
             for r in srp_ann_topk(emb).collect()}
    collapsed = {(r.query_id, r.neighbor_id, r.cos_sim, r.rank)
                 for r in ann_topk_collapsed(emb).collect()}
    assert collapsed == plain
    # Sanity: duplicate twins of a query really surface at cos 1.0.
    assert any(c == 1.0 for (_, _, c, _) in collapsed)
