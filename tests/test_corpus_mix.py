"""Domain mixing in the corpus assembly (mix_weights +
mix_token_budget): per-domain epoch rates hit the target token
mixture at the explicit budget, copies ride the pack/shuffle stages
as distinct rows via the power-of-two copy-id encoding, and the whole
mixed assembly stays a pure function of (corpus, knobs, salt)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lisp_batch_processor_spark.pipelines import assemble_corpus

SPLITS = (("train", 1.0),)   # everything trains: isolate the mixing


def base_text(i: int) -> str:
    lines = []
    for j in range(3):
        toks = []
        for k in range(4):
            m = 2 * (j * 4 + k)
            toks += [f"c{m % 8}", f"c{(m + 1) % 8}", f"u{i}x{j}x{k}"]
        lines.append(" ".join(toks))
    return "\n".join(lines)          # 36 whitespace tokens per doc


def corpus(spark):
    rows = [(i, f"https://p{i}.sitea.com/d{i}", base_text(i))
            for i in range(1, 3)]            # sitea.com: 2 docs, 72 tok
    rows += [(i, f"https://p{i}.siteb.org/d{i}", base_text(i))
             for i in range(10, 18)]         # siteb.org: 8 docs, 288 tok
    return spark.createDataFrame(rows, "doc_id bigint, url string, "
                                        "text string")


def evals(spark):
    return spark.createDataFrame(
        [("benchmark only words never in corpus at all today forever",)],
        "text string")


def run(spark, wd, **kw):
    return assemble_corpus(
        spark, corpus(spark), evals(spark), wd, splits=SPLITS,
        pack_budget=64, pack_buckets=2, salt="mix-v1",
        # 0.5/0.5 of 576 tokens: sitea = 288/72 = 4.0 epochs,
        # siteb = 288/288 = 1.0 — integral rates, so the copy set is
        # exact, not fractional-coin dependent.
        mix_weights={"sitea.com": 0.5, "siteb.org": 0.5},
        mix_token_budget=576, **kw)


def test_mixed_assembly_hits_the_target_mixture(spark, tmp_path):
    out = run(spark, str(tmp_path / "w"))
    c = out.counters()
    # pack counters run at COPY grain (dropped stays >= 0); the
    # doc -> copy expansion reads from split.rows_out (10) -> 16
    assert c["split"]["rows_out"] == 10
    assert (c["pack"]["rows_in"], c["pack"]["rows_out"]) == (16, 16)
    assert c["shuffle"]["rows_out"] == 16
    order = spark.read.parquet(out.train_order_path)
    assert "epoch" in order.columns
    rows = order.collect()
    assert len(rows) == 16
    copies = {(r.doc_id, r.epoch) for r in rows}
    assert len(copies) == 16                      # each copy exactly once
    for i in (1, 2):                              # sitea: 4 epochs each
        assert {e for d, e in copies if d == i} == {0, 1, 2, 3}
    for i in range(10, 18):                       # siteb: 1 epoch each
        assert {e for d, e in copies if d == i} == {0}
    # exact 50/50 token mixture at the budget
    toks = {d: sum(r.n_tokens for r in rows if str(r.doc_id) == d or
                   (d == "a" and r.doc_id < 10) or
                   (d == "b" and r.doc_id >= 10))
            for d in ("a", "b")}
    assert toks["a"] == toks["b"] == 288
    # budget respected at copy grain
    over = (order.groupBy("pack_id").agg(F.sum("n_tokens").alias("t"))
            .filter(F.col("t") > 64).count())
    assert over == 0
    # every copy of a doc carries the doc's tokens (span_dedup
    # reassembles at token grain, so newlines normalize to spaces)
    assert all(r.text.split() == base_text(r.doc_id).split()
               for r in rows)


@pytest.mark.slow
def test_mixed_assembly_is_deterministic(spark, tmp_path):
    def order_rows(tag):
        out = run(spark, str(tmp_path / tag))
        return sorted((r.shuffle_key, r.pack_id, r.pos, r.doc_id,
                       r.epoch, r.n_tokens)
                      for r in spark.read.parquet(
                          out.train_order_path).collect())
    assert order_rows("a") == order_rows("b")


def test_mix_knobs_must_come_together(spark, tmp_path):
    with pytest.raises(ValueError, match="mix_token_budget"):
        assemble_corpus(spark, corpus(spark), evals(spark),
                        str(tmp_path / "w"), splits=SPLITS,
                        mix_weights={"sitea.com": 1.0})
    with pytest.raises(ValueError, match="mix_token_budget"):
        assemble_corpus(spark, corpus(spark), evals(spark),
                        str(tmp_path / "w2"), splits=SPLITS,
                        mix_alpha=0.5)
    with pytest.raises(ValueError, match="not both"):
        assemble_corpus(spark, corpus(spark), evals(spark),
                        str(tmp_path / "w3"), splits=SPLITS,
                        mix_weights={"sitea.com": 1.0}, mix_alpha=0.5,
                        mix_token_budget=576)


@pytest.mark.slow
def test_mix_alpha_equals_manual_weights_path(spark, tmp_path):
    """mix_alpha derives the target mixture from the MEASURED domain
    tokens (w ∝ tokens^alpha): at alpha=0.5 over sitea=72 /
    siteb=288 tokens the weights are 1:2 — the assembly must be
    row-identical to the manual mix_weights={1/3, 2/3} run."""
    def order_rows(out):
        return sorted((r.shuffle_key, r.pack_id, r.pos, r.doc_id,
                       r.epoch, r.n_tokens)
                      for r in spark.read.parquet(
                          out.train_order_path).collect())

    auto = assemble_corpus(
        spark, corpus(spark), evals(spark), str(tmp_path / "auto"),
        splits=SPLITS, pack_budget=64, pack_buckets=2, salt="mix-v1",
        mix_alpha=0.5, mix_token_budget=576)
    manual = assemble_corpus(
        spark, corpus(spark), evals(spark), str(tmp_path / "manual"),
        splits=SPLITS, pack_budget=64, pack_buckets=2, salt="mix-v1",
        mix_weights={"sitea.com": 1 / 3, "siteb.org": 2 / 3},
        mix_token_budget=576)
    assert order_rows(auto) == order_rows(manual)


@pytest.mark.slow
def test_mix_alpha_zero_flattens_one_keeps_natural(spark, tmp_path):
    """alpha=0 targets a uniform mixture (each domain 288 of 576:
    sitea upsampled 4x), alpha=1 keeps the natural distribution
    (every doc exactly once at budget == corpus tokens)."""
    def domain_tokens(out):
        rows = spark.read.parquet(out.train_order_path).collect()
        a = sum(r.n_tokens for r in rows if r.doc_id < 10)
        b = sum(r.n_tokens for r in rows if r.doc_id >= 10)
        return a, b, len(rows)

    flat = assemble_corpus(
        spark, corpus(spark), evals(spark), str(tmp_path / "flat"),
        splits=SPLITS, pack_budget=64, pack_buckets=2, salt="mix-v1",
        mix_alpha=0.0, mix_token_budget=576)
    a, b, n = domain_tokens(flat)
    assert (a, b, n) == (288, 288, 16)   # sitea x4, siteb x1

    nat = assemble_corpus(
        spark, corpus(spark), evals(spark), str(tmp_path / "nat"),
        splits=SPLITS, pack_budget=64, pack_buckets=2, salt="mix-v1",
        mix_alpha=1.0, mix_token_budget=360)
    a, b, n = domain_tokens(nat)
    assert (a, b, n) == (72, 288, 10)    # natural: every doc once
