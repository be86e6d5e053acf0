"""Optional semantic-dedup stage in the corpus assembly
(assemble_corpus(embeddings=...), VERDICT r7 ask #5): a tau-level
embedding pair whose TEXTS share no shingles survives MinHash and
dies at exactly the semantic stage; docs without embeddings pass
through; counters chain through the inserted stage; resume after a
tau change reruns from the semantic stage and adopts the byte-level
dedup passes; and with the knob off the layout/fingerprints are
byte-identical to a pre-semantic run."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F  # noqa: F401

from lisp_batch_processor_spark.pipelines import assemble_corpus

DIM = 12
KW = dict(pack_budget=64, pack_buckets=2, salt="sem-v1",
          splits=(("train", 1.0),))


def text(i: int) -> str:
    lines = []
    for j in range(3):
        lines.append(" ".join(
            f"w{(2 * (j * 4 + k)) % 8} u{i}x{j}x{k}"
            for k in range(4)))
    return "\n".join(lines)


def corpus(spark):
    # Docs 1..10 plus the semantic plant 200/201: every doc's text is
    # MinHash/line/span-inert vs every other (per-doc-unique tokens),
    # so nothing byte-level links 200 and 201 — only their vectors.
    rows = [(i, f"https://d{i}.example.com/", text(i))
            for i in list(range(1, 11)) + [200, 201]]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, url string, text string")
    evals = spark.createDataFrame(
        [("benchmark only words never in corpus at all today forever",)],
        "text string")
    return docs, evals


def embeddings(spark):
    """Unit vectors: docs 3..10 spread across axes (pairwise cosine
    far below tau), the plant 200/201 nearly colinear (cosine
    ~0.9999), and docs 1..2 deliberately ABSENT (must pass through).
    """
    import math
    rows = []
    # Axes e2..e9: pairwise orthogonal to each other AND to the
    # plant's e0(+eps e1) direction, so the only cosine above tau in
    # the whole corpus is the planted pair's.
    for n, i in enumerate(range(3, 11)):
        v = [0.0] * DIM
        v[2 + n] = 1.0
        rows.append((i, v))
    a = [1.0, 0.01] + [0.0] * (DIM - 2)
    b = [1.0, 0.02] + [0.0] * (DIM - 2)
    norm = lambda v: [x / math.sqrt(sum(y * y for y in v))  # noqa: E731
                      for x in v]
    rows += [(200, norm(a)), (201, norm(b))]
    return spark.createDataFrame(
        rows, "doc_id bigint, embedding array<double>")


def train_docs(spark, out):
    return sorted(r.doc_id for r in spark.read.parquet(out.split_path)
                  .filter("split = 'train'").select("doc_id").collect())


def test_semantic_pair_dies_at_exactly_the_semantic_stage(
        spark, tmp_path):
    wd = str(tmp_path / "w")
    docs, evals = corpus(spark)
    out = assemble_corpus(spark, docs, evals, wd,
                          embeddings=embeddings(spark),
                          semantic_tau=0.95, semantic_k=3, **KW)

    names = [s.name for s in out.stages]
    assert names == ["url_dedup", "line_dedup", "span_dedup",
                     "near_dup", "semantic", "quality", "split",
                     "pack", "shuffle"]
    # Counters chain through the inserted stage.
    for a, b in zip(out.stages, out.stages[1:]):
        assert b.rows_in == a.rows_out, (a.name, b.name)

    # The plant survives every byte-level pass...
    nd_ids = {r.doc_id for r in
              spark.read.parquet(f"{wd}/04_near_dup").collect()}
    assert {200, 201} <= nd_ids
    # ...and dies at the semantic stage, min-id winner kept.
    sem_ids = {r.doc_id for r in
               spark.read.parquet(f"{wd}/04b_semantic").collect()}
    assert 200 in sem_ids and 201 not in sem_ids
    assert out.stage("semantic").dropped == 1
    # Docs without embeddings pass through.
    assert {1, 2} <= sem_ids
    assert 201 not in set(train_docs(spark, out))


@pytest.mark.slow
def test_tau_change_resumes_from_the_semantic_stage(spark, tmp_path):
    from tests.test_corpus_resume import _sealed  # shared probe

    wd0 = str(tmp_path / "base")
    docs, evals = corpus(spark)
    emb = embeddings(spark)
    assemble_corpus(spark, docs, evals, wd0, embeddings=emb,
                    semantic_tau=0.95, semantic_k=3, **KW)

    wd = str(tmp_path / "resumed")
    shutil.copytree(wd0, wd)
    keep = ("00_meta", "01_url_dedup", "02_line_dedup",
            "03_span_dedup", "04_near_dup")
    sealed = _sealed(wd, keep)
    out = assemble_corpus(spark, docs, evals, wd, embeddings=emb,
                          semantic_tau=0.9999999, semantic_k=3,
                          resume=True, **KW)
    # Byte-level dedup passes adopted untouched; semantic reran.
    assert _sealed(wd, keep) == sealed
    # At the raised tau the plant's cosine (~0.99995) no longer
    # clears: 201 survives — proof the stage actually recomputed.
    sem_ids = {r.doc_id for r in
               spark.read.parquet(f"{wd}/04b_semantic").collect()}
    assert {200, 201} <= sem_ids
    fresh = assemble_corpus(spark, docs, evals,
                            str(tmp_path / "fresh"), embeddings=emb,
                            semantic_tau=0.9999999, semantic_k=3,
                            **KW)
    assert out.counters() == fresh.counters()


@pytest.mark.slow
def test_knob_off_layout_and_chain_unchanged(spark, tmp_path):
    """Without embeddings the semantic scope is absent from the
    fingerprint chain: no 04b dir, stage list as before, and the
    report's lineage check stays consistent either way."""
    from lisp_batch_processor_spark.pipelines.report import (
        corpus_report)

    docs, evals = corpus(spark)
    wd = str(tmp_path / "plain")
    out = assemble_corpus(spark, docs, evals, wd, **KW)
    assert [s.name for s in out.stages] == [
        "url_dedup", "line_dedup", "span_dedup", "near_dup",
        "quality", "split", "pack", "shuffle"]
    assert not os.path.exists(os.path.join(wd, "04b_semantic"))
    assert corpus_report(spark, wd, write=False)["funnel"][
        "lineage_consistent"]

    wd2 = str(tmp_path / "sem")
    assemble_corpus(spark, docs, evals, wd2,
                    embeddings=embeddings(spark), semantic_k=3, **KW)
    rep = corpus_report(spark, wd2, write=False)
    assert rep["funnel"]["lineage_consistent"]
    assert any(s["name"] == "semantic" for s in rep["funnel"]["stages"])


@pytest.mark.slow
def test_semantic_and_mixing_compose(spark, tmp_path):
    """The optional stages compose: one assembly with embeddings AND
    mix_alpha — the semantic plant dies before packing, the mixture
    derives from the SEMANTIC survivors' measured tokens, and the
    train order carries copies of everything that survived (never of
    the dropped doc)."""
    docs, evals = corpus(spark)
    out = assemble_corpus(
        spark, docs, evals, str(tmp_path / "w"),
        embeddings=embeddings(spark), semantic_k=3,
        mix_alpha=0.0, mix_token_budget=720,
        pack_budget=64, pack_buckets=2, salt="sem-v1",
        splits=(("train", 1.0),))
    names = [s.name for s in out.stages]
    assert names.index("semantic") == names.index("near_dup") + 1
    order = spark.read.parquet(out.train_order_path)
    ids = {r.doc_id for r in order.select("doc_id").collect()}
    assert 201 not in ids and 200 in ids
    assert "epoch" in order.columns
    # Every surviving doc appears (alpha=0 upsamples every domain to
    # an equal token share; nothing is silently dropped by mixing).
    assert ids == {r.doc_id for r in
                   spark.read.parquet(f"{str(tmp_path / 'w')}/06_split")
                   .select("doc_id").collect()}
