"""Scale measurement for the end-to-end corpus assembly
(pipelines/corpus.assemble_corpus): wall time per stage at sf0.1
(5k docs) and at the x10 blow-up (50k docs, scale_slope.py's
token-suffixed replicas — duplicate density per replica constant,
so the slope measures corpus growth, not dup-density growth).

URLs are synthesized per doc (`https://<source>.example.com/<id>`,
unique — stage 1 still pays its full agg + join); the eval corpus is
a fixed 50-doc set at both scales (its grams broadcast, so the
decontamination side is scale-constant by design). The LM-perplexity
path runs (ppl_max huge, self-trained) so the quality stage carries
its full cost.

Per scale: 1 discarded warmup pass + N timed passes
($CORPUS_SCALE_PASSES, default 2) to fresh work dirs, min per stage.
Per-stage wall time comes from the completion-sidecar mtime deltas —
each stage writes its sidecar strictly after its parquet commit, so
consecutive sidecars bracket exactly one stage's work (stage 1's
time is measured from the pass start).

Writes SCALE_CORPUS_r07.json; exponent ln(t_x10/t_sf0.1)/ln(10),
<= ~1.15 reads as linear.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lisp_batch_processor_spark.pipelines import assemble_corpus  # noqa: E402
from lisp_batch_processor_spark.pipelines.corpus import (  # noqa: E402
    _STAGE_DONE)
from lisp_batch_processor_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
X10 = "/root/repo/.scale/x10"
STAGES = ["url_dedup", "line_dedup", "span_dedup", "near_dup",
          "quality", "split", "pack", "shuffle"]
DIRS = ["01_url_dedup", "02_line_dedup", "03_span_dedup", "04_near_dup",
        "05_quality", "06_split", "07_pack", "08_train_order"]


def one_pass(spark, docs, evals, wd: str, **mix_kw) -> tuple[dict, dict, float]:
    t0 = time.time()  # wall clock throughout: the marks are mtimes
    out = assemble_corpus(spark, docs, evals, wd,
                          ppl_max=1e9, salt="scale-corpus", **mix_kw)
    total = time.time() - t0
    # Sidecar mtimes bracket each stage; the 00_meta side table is
    # written BETWEEN stage 1's sidecar and stage 2's work, so it
    # gets its own bracket (its _SUCCESS mtime) rather than silently
    # inflating line_dedup.
    marks = [("url_dedup", os.path.getmtime(
                  os.path.join(wd, DIRS[0], _STAGE_DONE))),
             ("meta", os.path.getmtime(
                  os.path.join(wd, "00_meta", "_SUCCESS")))]
    marks += [(name, os.path.getmtime(os.path.join(wd, d, _STAGE_DONE)))
              for name, d in zip(STAGES[1:], DIRS[1:])]
    stage_secs = {}
    prevm = t0
    for name, m in marks:
        stage_secs[name] = round(m - prevm, 3)
        prevm = m
    rows = {s.name: s.rows_out for s in out.stages}
    return stage_secs, rows, round(total, 3)


def main() -> None:
    passes = int(os.environ.get("CORPUS_SCALE_PASSES", "2"))
    spark = get_spark("scale-corpus", cpus=8, shuffle_partitions=8)
    if not os.path.isdir(f"{X10}/documents.parquet"):
        sys.exit(f"blow-up missing at {X10} — run scale_slope.py once")

    evals = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
             .limit(50).select("text"))
    evals = spark.createDataFrame(evals.collect(), "text string")

    result = {}
    base = "/tmp/scale_corpus"
    shutil.rmtree(base, ignore_errors=True)
    for tag, src in (("sf0.1", SF01), ("x10", X10)):
        docs = (spark.read.parquet(f"{src}/documents.parquet")
                .select("doc_id",
                        F.concat(F.lit("https://"), F.col("source"),
                                 F.lit(".example.com/"),
                                 F.col("doc_id").cast("string"))
                        .alias("url"),
                        "text"))
        n_docs = docs.count()
        best_stages: dict[str, float] = {}
        best_total = float("inf")
        rows = {}
        for p in range(-1, passes):  # pass -1 = discarded warmup
            wd = f"{base}/{tag}_p{p}"
            stage_secs, rows, total = one_pass(spark, docs, evals, wd)
            print(f"# {tag} pass{p}: total={total}s "
                  f"{json.dumps(stage_secs)}", file=sys.stderr)
            if p < 0:
                continue
            best_total = min(best_total, total)
            for k, v in stage_secs.items():
                best_stages[k] = min(best_stages.get(k, v), v)
        result[tag] = {"docs": n_docs, "total_sec": round(best_total, 3),
                       "stages_sec": best_stages, "rows_out": rows}

        # -- domain-mixing variant: same corpus, per-source registrable
        # domains (`<source>-site.org`) so epoch_rates sees 20 real
        # domains, 5 of them double-weighted, at a 1.3x token budget
        # (rates straddle 1 — some domains repeat, some downsample).
        # The pack bracket here includes the driver-side rate
        # derivation (domain token agg + max-id scan), which is the
        # honest cost of turning mixing on. JVM is warm from the
        # unmixed passes; same pass count, min per stage.
        from lisp_batch_processor_spark.operators.text import tokens_col
        # Underscores are invalid hostname chars (normalize_url nulls
        # them -> domain "unknown"), and the x10 blow-up's replica
        # sources are `srcN_rM` — sanitize to hyphens for the host.
        host = F.regexp_replace(F.col("source"), "_", "-")
        mdocs = (spark.read.parquet(f"{src}/documents.parquet")
                 .select("doc_id",
                         F.concat(F.lit("https://"), host,
                                  F.lit("-site.org/"),
                                  F.col("doc_id").cast("string"))
                         .alias("url"),
                         "text", "source"))
        sources = sorted(r[0] for r in
                         mdocs.select("source").distinct().collect())
        weights = {f"{s.replace('_', '-')}-site.org":
                   (2.0 if i < 5 else 1.0)
                   for i, s in enumerate(sources)}
        n_tok = mdocs.select(
            F.sum(F.size(tokens_col()))).first()[0]
        mkw = dict(mix_weights=weights,
                   mix_token_budget=int(1.3 * n_tok))
        m_stages: dict[str, float] = {}
        m_total = float("inf")
        m_rows = {}
        for p in range(passes):
            wd = f"{base}/{tag}_mix_p{p}"
            stage_secs, m_rows, total = one_pass(
                spark, mdocs.drop("source"), evals, wd, **mkw)
            print(f"# {tag} mix pass{p}: total={total}s "
                  f"{json.dumps(stage_secs)}", file=sys.stderr)
            m_total = min(m_total, total)
            for k, v in stage_secs.items():
                m_stages[k] = min(m_stages.get(k, v), v)
        result[tag]["mix"] = {
            "total_sec": round(m_total, 3),
            "pack_sec_incl_derive": m_stages["pack"],
            "shuffle_sec": m_stages["shuffle"],
            "copies_out": m_rows["pack"],
            "docs_in": m_rows["split"]}

    a, b = result["sf0.1"], result["x10"]
    ratio = b["docs"] / a["docs"]
    summary = {
        "docs": {"sf0.1": a["docs"], "x10": b["docs"]},
        "total_sec": {"sf0.1": a["total_sec"], "x10": b["total_sec"]},
        "total_exp": round(math.log(b["total_sec"] / a["total_sec"])
                           / math.log(ratio), 2),
        "stage_exp": {
            s: round(math.log(max(b["stages_sec"][s], 1e-3)
                              / max(a["stages_sec"][s], 1e-3))
                     / math.log(ratio), 2)
            for s in STAGES},
        "mix_exp": {
            k: round(math.log(max(b["mix"][k], 1e-3)
                              / max(a["mix"][k], 1e-3))
                     / math.log(ratio), 2)
            for k in ("total_sec", "pack_sec_incl_derive",
                      "shuffle_sec")},
        "mix_copies": {t: result[t]["mix"]["copies_out"]
                       for t in ("sf0.1", "x10")},
    }
    with open("SCALE_CORPUS_r07.json", "w") as f:
        json.dump({"summary": summary, "points": result}, f, indent=1)
    print(json.dumps(summary))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
