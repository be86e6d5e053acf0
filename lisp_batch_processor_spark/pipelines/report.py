"""Corpus data card — one read-only report over an assembled corpus
(`pipelines.corpus.assemble_corpus` work dir) answering the questions
a training run's data review actually asks:

  - funnel     what each stage dropped (read back from the durable
               stage sidecars — zero recomputation)
  - splits     docs / tokens / contamination per split
  - quality    perplexity percentiles of the surviving corpus
  - domains    token share by registrable domain (top-N + "(other)")
  - packs      pack count, fill percentiles
  - epochs     copy counts per mixing epoch (mixed assemblies only)

This is the observability artifact the reference's summary dialog
approximates at item grain (`Batch Processor.py:420-425` — processed/
succeeded/failed counts after a batch) re-expressed at corpus grain.

Scale notes (100 TB): every section collects a BOUNDED summary —
O(#stages) sidecar dicts, O(#splits) rows, O(top_domains) after an
in-engine tokens-desc truncation, O(#epochs <= mix cap) — never rows
of the corpus. The corpus text is tokenized exactly ONCE (a single
(split, domain)-grain aggregation serves both the splits and domains
sections; the ppl percentiles read only their own column);
percentiles use `percentile_approx` (GK sketch, mergeable map-side),
so no section materializes a global sort. The report never blocks the
pipeline: it reads only committed stage dirs.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lisp_batch_processor_spark.functions.urls import registered_domain
from lisp_batch_processor_spark.operators.text import tokens_col
from lisp_batch_processor_spark.pipelines.corpus import _STAGE_DONE

# Stage dirs in pipeline order (corpus.assemble_corpus's layout).
_STAGE_DIRS = (
    ("url_dedup", "01_url_dedup"),
    ("line_dedup", "02_line_dedup"),
    ("span_dedup", "03_span_dedup"),
    ("near_dup", "04_near_dup"),
    ("semantic", "04b_semantic"),  # optional (embeddings= knob)
    ("quality", "05_quality"),
    ("split", "06_split"),
    ("pack", "07_pack"),
    ("shuffle", "08_train_order"),
)
_REPORT_FILE = "_corpus_report.json"


def _read_sidecar(spark: SparkSession, path: str) -> dict | None:
    """Raw stage-sidecar JSON, or None when absent/torn. The report
    deliberately skips `_stage_done_read`'s fingerprint enforcement —
    it documents whatever is on disk; lineage consistency is instead
    REPORTED (see `funnel.lineage_consistent`) so a mixed-lineage
    work dir is visible rather than fatal."""
    from lisp_batch_processor_spark.sources.writers import read_json_file
    return read_json_file(spark, path.rstrip("/") + "/" + _STAGE_DONE)


def _tokens(text: str = "text"):
    return F.size(tokens_col(text))


def corpus_report(spark: SparkSession, work_dir: str, *,
                  top_domains: int = 20,
                  write: bool = True) -> dict:
    """Build the data card for the assembly staged under `work_dir`
    and (by default) persist it as `<work_dir>/_corpus_report.json`
    (underscore name — invisible to parquet readers of the dir).

    Requires at least the split stage (06) to be committed; pack /
    epoch sections appear only when their stages exist, so the report
    also works on a mid-crash work dir as a forensic summary.
    """
    wd = work_dir.rstrip("/")

    # -- funnel: the sidecars ARE the accounting ----------------------
    # Lineage check: each sidecar records its parent stage's
    # knob-scoped fingerprint; adjacent present stages whose link
    # doesn't match were produced by different runs whose shared
    # prefix diverged — a forensic signal, not an error here.
    stages = []
    links_ok = True
    prev_fp = None
    for name, d in _STAGE_DIRS:
        sc = _read_sidecar(spark, f"{wd}/{d}")
        if sc is None or sc.get("name") != name:
            # An absent OPTIONAL stage (semantic runs only with the
            # embeddings knob) is not a lineage break — the chain
            # links straight across it, exactly as the fingerprint
            # chain omits its scope when it is off.
            if name != "semantic":
                prev_fp = None
            continue
        # Pre-link-era sidecars carry no "parent": unchecked, not
        # inconsistent (old work dirs must not cry wolf).
        if prev_fp is not None and "parent" in sc \
                and sc.get("parent") != prev_fp:
            links_ok = False
        prev_fp = sc.get("fingerprint")
        stages.append({
            "name": name,
            "rows_in": int(sc["rows_in"]),
            "rows_out": int(sc["rows_out"]),
            "dropped": int(sc["rows_in"]) - int(sc["rows_out"]),
            "n_err": int(sc["n_err"]),
        })
    report: dict = {
        "work_dir": wd,
        "funnel": {
            "stages": stages,
            "lineage_consistent": links_ok,
        },
    }
    if not any(s["name"] == "split" for s in stages):
        raise ValueError(
            f"no committed split stage under {wd} — "
            "corpus_report needs at least stages 1-6 of "
            "assemble_corpus to have finished")

    # -- redactions: per-kind totals from the stage-1 audit map -------
    if any(s["name"] == "url_dedup" for s in stages):
        s1 = spark.read.parquet(f"{wd}/01_url_dedup")
        if "redactions" in s1.columns:
            per_kind = (s1.select(F.explode("redactions")
                                  .alias("kind", "hits"))
                        .groupBy("kind").agg(F.sum("hits").alias("n"))
                        .collect())           # O(#kinds)
            report["redactions"] = {r["kind"]: int(r["n"])
                                    for r in per_kind}

    # -- splits + domains: ONE corpus-text aggregation -----------------
    # Tokenization dominates the report's cost, so the corpus text is
    # scanned and tokenized exactly once, at (split, domain) grain —
    # an engine-side frame of #splits x #domains rows that both
    # sections roll up from (persisted across its two consumers, tiny
    # relative to the corpus). Truncation for the domains section
    # happens IN the engine (tokens-desc limit): only top-N rows
    # reach the driver, the remainder folds into one "(other)" line
    # from the split totals.
    split_df = spark.read.parquet(f"{wd}/06_split")
    meta = spark.read.parquet(f"{wd}/00_meta").select("doc_id", "norm_url")
    grain = (split_df.select("split", "doc_id", "text", "contaminated")
             .join(meta, "doc_id", "left")
             .withColumn("_domain",
                         F.coalesce(registered_domain("norm_url"),
                                    F.lit("unknown")))
             .groupBy("split", "_domain")
             .agg(F.count("*").alias("docs"),
                  F.sum(_tokens()).alias("tokens"),
                  F.sum(F.col("contaminated").cast("long"))
                  .alias("contaminated"))
             .persist())
    per_split = (grain.groupBy("split")
                 .agg(F.sum("docs").alias("docs"),
                      F.sum("tokens").alias("tokens"),
                      F.sum("contaminated").alias("contaminated"))
                 .collect())
    report["splits"] = {
        r["split"]: {"docs": int(r["docs"]),
                     "tokens": int(r["tokens"] or 0),
                     "contaminated": int(r["contaminated"] or 0)}
        for r in per_split}
    # Perplexity percentiles: a separate, column-PRUNED scan (reads
    # only the ppl column — no tokenization, no text bytes).
    ppl_q = (split_df.filter(F.col("split") == "train")
             .agg(F.percentile_approx("ppl", [0.5, 0.9, 0.99])
                  .alias("q")).first()["q"])
    report["quality"] = {
        "train_ppl_p50_p90_p99":
            [round(float(x), 3) for x in ppl_q] if ppl_q else None}

    # -- domains: token share by registrable domain -------------------
    dom = (grain.groupBy("_domain")
           .agg(F.sum("docs").alias("docs"),
                F.sum("tokens").alias("tokens"))
           .orderBy(F.desc("tokens"), F.asc("_domain"))
           .limit(top_domains)
           .collect())
    grain.unpersist()
    tok_total = sum(s["tokens"] for s in report["splits"].values())
    top = [{"domain": r["_domain"], "docs": int(r["docs"]),
            "tokens": int(r["tokens"]),
            "token_share": round(int(r["tokens"]) / tok_total, 6)
            if tok_total else 0.0}
           for r in dom]
    rest_toks = tok_total - sum(d["tokens"] for d in top)
    rest_docs = (sum(s["docs"] for s in report["splits"].values())
                 - sum(d["docs"] for d in top))
    if rest_docs > 0:
        top.append({"domain": "(other)", "docs": int(rest_docs),
                    "tokens": int(rest_toks),
                    "token_share": round(rest_toks / tok_total, 6)
                    if tok_total else 0.0})
    report["domains"] = top

    # -- packs: fill statistics from the pack frame -------------------
    if any(s["name"] == "pack" for s in stages):
        pk = spark.read.parquet(f"{wd}/07_pack")
        per_pack = pk.groupBy("pack_id").agg(
            F.sum("n_tokens").alias("fill"))
        row = per_pack.agg(
            F.count("*").alias("n_packs"),
            F.sum("fill").alias("tokens"),
            F.percentile_approx("fill", [0.5, 0.95]).alias("fill_q"),
            F.max("fill").alias("fill_max")).first()
        report["packs"] = {
            "n_packs": int(row["n_packs"]),
            "tokens": int(row["tokens"] or 0),
            "fill_p50_p95_max": [int(row["fill_q"][0]),
                                 int(row["fill_q"][1]),
                                 int(row["fill_max"])]
            if row["fill_q"] else None,
        }

    # -- epochs: mixing copy histogram (mixed assemblies only) --------
    if any(s["name"] == "shuffle" for s in stages):
        order = spark.read.parquet(f"{wd}/08_train_order")
        if "epoch" in order.columns:
            eh = (order.groupBy("epoch").count()
                  .orderBy("epoch").collect())
            report["epochs"] = {int(r["epoch"]): int(r["count"])
                                for r in eh}

    if write:
        from lisp_batch_processor_spark.sources.writers import _hadoop_fs
        jvm, fs, _ = _hadoop_fs(spark, wd)
        p = jvm.org.apache.hadoop.fs.Path(wd + "/" + _REPORT_FILE)
        out = fs.create(p, True)
        try:
            out.write(bytearray(json.dumps(report, indent=1).encode()))
        finally:
            out.close()
    return report


def corpus_diff(spark: SparkSession, work_dir_a: str, work_dir_b: str,
                *, examples: int = 10) -> dict:
    """What changed between two assemblies of the same corpus — the
    companion to knob-scoped resume: after a filter sweep produces a
    second work dir (or the same one re-resumed), answer "what did
    that knob actually do" without reading either corpus end to end.

    Returns per-stage rows_out deltas (from the sidecars — zero
    recomputation), per-split doc counts for both sides, and the
    doc-grain churn between the two split outputs: `added` (in B
    only), `removed` (in A only), `moved` (present in both, different
    split), `unchanged` — plus up to `examples` removed/added doc ids
    for spot-checking. The churn is ONE full-outer join of two
    (doc_id, split) projections; everything collected is bounded
    (counts + example ids).
    """
    a_wd, b_wd = work_dir_a.rstrip("/"), work_dir_b.rstrip("/")
    funnel = {}
    for name, d in _STAGE_DIRS:
        sa = _read_sidecar(spark, f"{a_wd}/{d}")
        sb = _read_sidecar(spark, f"{b_wd}/{d}")
        if sa is None and sb is None:
            continue
        funnel[name] = {
            "rows_out_a": sa and int(sa["rows_out"]),
            "rows_out_b": sb and int(sb["rows_out"]),
            "delta": (int(sb["rows_out"]) - int(sa["rows_out"]))
            if sa and sb else None}

    a = (spark.read.parquet(f"{a_wd}/06_split")
         .select("doc_id", F.col("split").alias("_split_a")))
    b = (spark.read.parquet(f"{b_wd}/06_split")
         .select("doc_id", F.col("split").alias("_split_b")))
    j = a.join(b, "doc_id", "full_outer")
    churn_rows = (j.groupBy()
                  .agg(F.sum(F.col("_split_a").isNull().cast("long"))
                       .alias("added"),
                       F.sum(F.col("_split_b").isNull().cast("long"))
                       .alias("removed"),
                       F.sum((F.col("_split_a").isNotNull()
                              & F.col("_split_b").isNotNull()
                              & (F.col("_split_a") != F.col("_split_b")))
                             .cast("long")).alias("moved"),
                       F.sum((F.col("_split_a") == F.col("_split_b"))
                             .cast("long")).alias("unchanged"))
                  .first())
    ex_removed = [int(r["doc_id"]) for r in
                  j.filter(F.col("_split_b").isNull())
                  .orderBy("doc_id").limit(examples).collect()]
    ex_added = [int(r["doc_id"]) for r in
                j.filter(F.col("_split_a").isNull())
                .orderBy("doc_id").limit(examples).collect()]
    per_split = {}
    for tag, df, col in (("a", a, "_split_a"), ("b", b, "_split_b")):
        for r in df.groupBy(col).count().collect():
            per_split.setdefault(r[col], {})[f"docs_{tag}"] = \
                int(r["count"])
    return {
        "work_dir_a": a_wd, "work_dir_b": b_wd,
        "funnel": funnel,
        "splits": per_split,
        "churn": {k: int(churn_rows[k] or 0)
                  for k in ("added", "removed", "moved", "unchanged")},
        "examples": {"removed": ex_removed, "added": ex_added},
    }
