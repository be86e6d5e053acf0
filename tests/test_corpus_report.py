"""Corpus data card (pipelines/report.corpus_report): the funnel is
exactly the assembly's own counters read back from the sidecars, the
split/domain/pack token accounting matches direct recomputation, the
mixed assembly surfaces its epoch histogram, and the report is
readable from the persisted JSON artifact."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from lisp_batch_processor_spark.operators.text import tokens_col
from lisp_batch_processor_spark.pipelines import (
    assemble_corpus, corpus_report)

SPLITS = (("train", 0.8), ("val", 0.2))


def base_text(i: int) -> str:
    lines = []
    for j in range(3):
        toks = []
        for k in range(4):
            m = 2 * (j * 4 + k)
            toks += [f"c{m % 8}", f"c{(m + 1) % 8}", f"u{i}x{j}x{k}"]
        lines.append(" ".join(toks))
    return "\n".join(lines)          # 36 tokens per doc


def corpus(spark):
    rows = [(i, f"https://p{i}.sitea.com/d{i}", base_text(i))
            for i in range(1, 4)]            # sitea.com: 3 docs
    rows += [(i, f"https://p{i}.siteb.org/d{i}", base_text(i))
             for i in range(10, 19)]         # siteb.org: 9 docs
    rows += [(30, None, base_text(30))]      # unparseable URL domain
    return spark.createDataFrame(rows, "doc_id bigint, url string, "
                                        "text string")


def evals(spark):
    return spark.createDataFrame(
        [("benchmark only words never in corpus at all today forever",)],
        "text string")


def run(spark, wd, **kw):
    kw.setdefault("splits", SPLITS)
    return assemble_corpus(
        spark, corpus(spark), evals(spark), wd,
        pack_budget=64, pack_buckets=2, salt="report-v1", **kw)


@pytest.fixture(scope="module")
def assembled(spark, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("rep") / "w")
    out = run(spark, wd)
    rep = corpus_report(spark, wd)
    return wd, out, rep


def test_funnel_is_the_assemblys_own_accounting(assembled):
    _, out, rep = assembled
    got = {s["name"]: (s["rows_in"], s["rows_out"], s["n_err"])
           for s in rep["funnel"]["stages"]}
    want = {s.name: (s.rows_in, s.rows_out, s.n_err)
            for s in out.stages}
    assert got == want
    assert rep["funnel"]["lineage_consistent"]
    assert all(s["dropped"] >= 0 for s in rep["funnel"]["stages"])


def test_funnel_flags_a_broken_lineage_link(spark, assembled, tmp_path):
    import shutil
    wd0, *_ = assembled
    wd = str(tmp_path / "w")
    shutil.copytree(wd0, wd)
    import json as _json
    from lisp_batch_processor_spark.pipelines.corpus import _STAGE_DONE
    p = f"{wd}/05_quality/{_STAGE_DONE}"
    with open(p) as f:
        sc = _json.load(f)
    sc["parent"] = "not-the-near-dup-fingerprint"
    with open(p, "w") as f:
        _json.dump(sc, f)
    # Hadoop's local FS checksums reads: drop the stale .crc so the
    # hand-edited sidecar reads as CONTENT, not as a torn file.
    import os
    crc = f"{wd}/05_quality/.{_STAGE_DONE}.crc"
    if os.path.exists(crc):
        os.remove(crc)
    rep = corpus_report(spark, wd, write=False)
    assert not rep["funnel"]["lineage_consistent"]


def test_split_and_domain_token_accounting_matches_recount(
        spark, assembled):
    wd, out, rep = assembled
    split_df = spark.read.parquet(f"{wd}/06_split")
    direct = {r["split"]: (int(r["d"]), int(r["t"])) for r in
              split_df.groupBy("split")
              .agg(F.count("*").alias("d"),
                   F.sum(F.size(tokens_col())).alias("t")).collect()}
    assert {k: (v["docs"], v["tokens"])
            for k, v in rep["splits"].items()} == direct
    assert sum(v["docs"] for v in rep["splits"].values()) \
        == out.stage("split").rows_out
    # Domain shares cover the whole corpus and sum to 1.
    assert abs(sum(d["token_share"] for d in rep["domains"]) - 1.0) < 1e-6
    by_dom = {d["domain"]: d for d in rep["domains"]}
    assert set(by_dom) <= {"sitea.com", "siteb.org", "unknown", "(other)"}
    assert by_dom["sitea.com"]["tokens"] + by_dom["siteb.org"]["tokens"] \
        + by_dom.get("unknown", {"tokens": 0})["tokens"] \
        == sum(v["tokens"] for v in rep["splits"].values())


def test_domain_truncation_rolls_up_into_other(spark, assembled):
    wd, _, _ = assembled
    rep = corpus_report(spark, wd, top_domains=1, write=False)
    doms = [d["domain"] for d in rep["domains"]]
    assert doms[0] == "siteb.org" and doms[-1] == "(other)"
    assert abs(sum(d["token_share"] for d in rep["domains"]) - 1.0) < 1e-6


def test_pack_section_matches_pack_frame(spark, assembled):
    wd, _, rep = assembled
    pk = spark.read.parquet(f"{wd}/07_pack")
    assert rep["packs"]["tokens"] == \
        pk.agg(F.sum("n_tokens")).first()[0]
    assert rep["packs"]["n_packs"] == \
        pk.select("pack_id").distinct().count()
    assert rep["packs"]["fill_p50_p95_max"][-1] <= 64
    assert "epochs" not in rep           # unmixed: no epoch column


def test_report_json_artifact_round_trips(spark, assembled):
    wd, _, rep = assembled
    with open(f"{wd}/_corpus_report.json") as f:
        assert json.load(f)["splits"] == rep["splits"]


def test_mixed_assembly_reports_epoch_histogram(spark, tmp_path):
    wd = str(tmp_path / "w")
    out = run(spark, wd, splits=(("train", 1.0),),
              # sitea 3*36=108 tok, siteb 9*36=324, unknown 36:
              # equal-weight targets at a 432-token budget -> sitea
              # repeats (2.0), siteb downsamples; unknown dropped.
              mix_weights={"sitea.com": 0.5, "siteb.org": 0.5},
              mix_token_budget=432)
    rep = corpus_report(spark, wd)
    assert sum(rep["epochs"].values()) == out.stage("pack").rows_out
    assert max(rep["epochs"]) >= 1      # some domain really repeated


def test_report_requires_a_committed_split_stage(spark, tmp_path):
    with pytest.raises(ValueError, match="split stage"):
        corpus_report(spark, str(tmp_path / "empty"))


def test_redacted_assembly_reports_per_kind_totals(spark, tmp_path):
    wd = str(tmp_path / "w")
    docs = corpus(spark).unionByName(spark.createDataFrame(
        [(40, "https://p40.sitea.com/d40",
          base_text(40) + "\nmail bob@x.io and carol@y.io at 10.0.0.9")],
        "doc_id bigint, url string, text string"))
    from lisp_batch_processor_spark.pipelines import assemble_corpus
    out = assemble_corpus(spark, docs, evals(spark), wd, splits=SPLITS,
                          pack_budget=64, pack_buckets=2,
                          salt="report-v1",
                          redact_kinds=("email", "ipv4"))
    rep = corpus_report(spark, wd, write=False)
    assert rep["redactions"] == {"email": 2, "ipv4": 1}
    texts = " ".join(r["text"] for r in
                     spark.read.parquet(out.split_path).collect())
    assert "bob@x.io" not in texts and "[EMAIL]" in texts


def test_unredacted_assembly_has_no_redaction_section(assembled):
    *_, rep = assembled
    assert "redactions" not in rep


def test_corpus_diff_isolates_a_knob_change(spark, assembled, tmp_path):
    """Diff the baseline assembly against a stricter-quality rerun:
    the funnel delta localizes to quality->shuffle, the churn is
    removals only (a stricter filter never adds docs), and the
    removed examples are exactly the newly-dropped ids."""
    from lisp_batch_processor_spark.pipelines import corpus_diff

    wd_a, out_a, _ = assembled
    wd_b = str(tmp_path / "b")
    out_b = run(spark, wd_b, ppl_max=1e9)   # LM filter ON (huge cap:
    #                                         same survivors, new path)
    d = corpus_diff(spark, wd_a, wd_b)
    assert d["funnel"]["url_dedup"]["delta"] == 0
    assert d["churn"]["added"] == 0 and d["churn"]["moved"] == 0
    assert d["churn"]["removed"] == \
        out_a.stage("split").rows_out - out_b.stage("split").rows_out
    assert d["churn"]["unchanged"] == out_b.stage("split").rows_out
    assert len(d["examples"]["removed"]) == d["churn"]["removed"]
    tot_a = sum(v.get("docs_a", 0) for v in d["splits"].values())
    assert tot_a == out_a.stage("split").rows_out
