"""Fuzzy (MinHash) benchmark decontamination
(training.fuzzy_contamination): catches an eval item whose verbatim
8-grams were all broken by a light rewrite (exact contamination_flags
provably misses it), never false-flags (every flag re-verified by an
exact Python shingle-Jaccard replay), and leaves unrelated docs
untouched."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lisp_batch_processor_spark.operators.training import (
    contamination_flags, fuzzy_contamination)

# The eval item: five 7-token "sentences". The paraphrased train doc
# reorders the sentences — every 8-token window now crosses a
# boundary that differs, so NO 8-gram survives verbatim, while most
# 3-shingles (the MinHash grain) are preserved.
SENTS = [" ".join(f"s{i}w{j}" for j in range(7)) for i in range(5)]
EVAL_TEXT = " ".join(SENTS)
PARA_TEXT = " ".join([SENTS[2], SENTS[0], SENTS[4], SENTS[1], SENTS[3]])
COPY_TEXT = EVAL_TEXT
OTHER_TEXT = " ".join(f"z{i}" for i in range(40))


def shingles(text: str, n: int = 3) -> set[str]:
    toks = text.lower().split()
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def jacc(a: str, b: str) -> float:
    sa, sb = shingles(a), shingles(b)
    return len(sa & sb) / len(sa | sb)


@pytest.fixture(scope="module")
def frames(spark):
    train = spark.createDataFrame(
        [(1, PARA_TEXT), (2, COPY_TEXT), (3, OTHER_TEXT)],
        "doc_id bigint, text string")
    evals = spark.createDataFrame([(EVAL_TEXT,)], "text string")
    return train, evals


def test_reordered_eval_item_beats_exact_ngrams(spark, frames):
    train, evals = frames
    exact = {r["doc_id"]: r["contaminated"] for r in
             contamination_flags(train, evals).collect()}
    fuzzy = {r["doc_id"]: r["fuzzy_contaminated"] for r in
             fuzzy_contamination(train, evals,
                                 jaccard_num=1, jaccard_den=2)
             .collect()}
    # Sanity on the construction itself: high shingle overlap, and
    # genuinely no 8-gram in common (the exact sweep must miss).
    assert jacc(PARA_TEXT, EVAL_TEXT) >= 0.5
    assert not exact[1]
    assert fuzzy[1]                      # the paraphrase is caught
    assert exact[2] and fuzzy[2]         # verbatim copy: both sweeps
    assert not exact[3] and not fuzzy[3]


def test_no_false_flags_and_counts(spark, frames):
    train, evals = frames
    out = {r["doc_id"]: r for r in
           fuzzy_contamination(train, evals,
                               jaccard_num=1, jaccard_den=2).collect()}
    for did, text in ((1, PARA_TEXT), (2, COPY_TEXT), (3, OTHER_TEXT)):
        if out[did]["fuzzy_contaminated"]:
            assert jacc(text, EVAL_TEXT) >= 0.5   # every flag is true
            assert out[did]["n_eval_matches"] == 1
        else:
            assert out[did]["n_eval_matches"] == 0


def test_threshold_is_integer_exact(spark, frames):
    train, evals = frames
    # At a threshold above the paraphrase's true Jaccard, only the
    # verbatim copy survives verification.
    j = jacc(PARA_TEXT, EVAL_TEXT)
    num = int(j * 100) + 2
    out = {r["doc_id"]: r["fuzzy_contaminated"] for r in
           fuzzy_contamination(train, evals,
                               jaccard_num=num, jaccard_den=100)
           .collect()}
    assert out[2] and not out[1] and not out[3]


@pytest.mark.slow
def test_assembly_knob_drops_the_paraphrase_from_train(spark, tmp_path):
    """decontam_fuzzy in assemble_corpus: the reordered eval item is
    dropped from train (exact-only assembly keeps it), and the knob
    participates in the split stage's fingerprint scope."""
    from lisp_batch_processor_spark.pipelines import assemble_corpus

    def fill(i):
        return " ".join(f"f{i}w{j}" for j in range(30))

    rows = [(i, f"https://d{i}.example.com/", fill(i))
            for i in range(1, 15)]
    rows.append((50, "https://para.example.com/", PARA_TEXT))
    docs = spark.createDataFrame(rows,
                                 "doc_id bigint, url string, text string")
    evals = spark.createDataFrame([(EVAL_TEXT,)], "text string")
    kw = dict(splits=(("train", 1.0),), pack_budget=64,
              pack_buckets=2, salt="fz-e2e")
    exact_only = assemble_corpus(spark, docs, evals,
                                 str(tmp_path / "a"), **kw)
    both = assemble_corpus(spark, docs, evals, str(tmp_path / "b"),
                           decontam_fuzzy=(1, 2), **kw)
    ids = lambda out: {r["doc_id"] for r in spark.read.parquet(
        out.split_path).select("doc_id").collect()}
    assert 50 in ids(exact_only)        # exact 8-grams all broken
    assert 50 not in ids(both)          # fuzzy sweep catches it
    assert both.stage("split").rows_out == \
        exact_only.stage("split").rows_out - 1
