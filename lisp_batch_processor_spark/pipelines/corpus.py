"""End-to-end LLM training-corpus assembly — the product-shaped
composition of the engine's data-pipeline operators in the order a
real pretraining ingest runs them:

    1. url_dedup   canonical-URL exact dedup + ingest hygiene
                   (functions.urls.normalize_url)
    2. line_dedup  corpus-wide boilerplate line removal
                   (operators.dedup.line_dedup)
    3. span_dedup  exact token-window substring removal
                   (operators.dedup.span_dedup)
    4. near_dup    MinHash+LSH document near-dup, keep representatives
                   (minhash_signatures -> lsh_candidate_pairs ->
                    verify_jaccard -> assignment)
    5. quality     Gopher repetition filter + optional bigram-LM
                   perplexity filter (gopher_repetition_filter,
                   ngram_lm_train/ngram_lm_score)
    6. split       decontamination flags vs the eval corpus, leak-free
                   split assignment, contaminated TRAIN docs dropped
                   (contamination_flags, split_assign)
    7. pack        train docs packed into fixed token-budget sequences
                   (pack_sequences)
    8. shuffle     deterministic global training order at pack grain
                   (shuffle_deterministic, packs kept contiguous)

Every stage writes its survivors to ``<work_dir>/<NN_stage>/`` and the
next stage reads that parquet — the shape a 100 TB run needs anyway
(stage boundaries are restart points; no lineage re-computation across
stages; each stage's shuffles size independently). Row accounting
rides each stage's ONE write action via `quality.run_counters`
(Catalyst CollectMetrics): `StageResult.rows_in/rows_out` cost no
extra pass, and chain exactly — stage N's rows_in is stage N-1's
rows_out because the input IS the previous output file set, which the
integration test (tests/test_corpus_pipeline.py) asserts.

This is the Spark-first expression of the reference's whole reason to
exist — an ordered, observable batch pipeline over a document corpus
(ordered enable/disable pipeline + live counters + per-item fault
isolation, `Batch Processor.py:306-350, 420-425`) — at the grain a
training-data system needs.

Scale notes (100 TB): no stage collects anything but CollectMetrics
rows; URL dedup is one agg + one semi-join on the canonical key; the
dedup stages are the measured sublinear operators (SCALE.md); the
eval-gram side of decontamination broadcasts; packing's Arrow stage
sees (bucket, id, len) only; the final order is one range shuffle.
Intermediate stage dirs are plain overwrite-once parquet (each stage
writes a NEW directory, never rewrites a live one), so object-store
rename caveats don't apply; delete `work_dir` when done or keep it as
the audit trail.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lisp_batch_processor_spark.functions.urls import normalize_url
from lisp_batch_processor_spark.operators.dedup import (
    assignment,
    line_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    span_dedup,
    verify_jaccard,
)
from lisp_batch_processor_spark.operators.quality import run_counters
from lisp_batch_processor_spark.operators.text import (
    gopher_repetition_filter,
    ngram_lm_score,
    ngram_lm_train,
)
from lisp_batch_processor_spark.operators.training import (
    DECONTAM_NGRAM,
    contamination_flags,
    pack_sequences,
    shuffle_deterministic,
    split_assign,
)


@dataclass(frozen=True)
class StageResult:
    """One pipeline stage's durable output + its ride-along counters.

    rows_in/rows_out are Observation (CollectMetrics) values harvested
    from the stage's single write action; n_ok/n_err split rows_out by
    the stage's health predicate (e.g. url_dedup: rows whose URL was
    unparseable survive but count as n_err)."""

    name: str
    path: str
    rows_in: int
    rows_out: int
    n_ok: int
    n_err: int

    @property
    def dropped(self) -> int:
        return self.rows_in - self.rows_out


@dataclass
class CorpusAssembly:
    """Everything `assemble_corpus` produced: the per-stage audit
    trail plus the three consumer artifacts (split corpus, packed
    deterministic train order, URL metadata side table)."""

    work_dir: str
    stages: list[StageResult] = field(default_factory=list)
    meta_path: str = ""
    split_path: str = ""        # partitioned by split=train/val/test
    train_order_path: str = ""  # (shuffle_key, pack_id, pos, doc_id,
                                #  n_tokens, text) in training order

    def stage(self, name: str) -> StageResult:
        for s in self.stages:
            if s.name == name:
                return s
        raise KeyError(name)

    def counters(self) -> dict[str, dict[str, int]]:
        return {s.name: {"rows_in": s.rows_in, "rows_out": s.rows_out,
                         "n_ok": s.n_ok, "n_err": s.n_err}
                for s in self.stages}


def _write_stage(assembly: CorpusAssembly, name: str, observed_in,
                 out_df: DataFrame, path: str,
                 ok=None, partition_by: Sequence[str] = ()) -> None:
    """Write one stage's output and harvest both observations from
    that single action. `observed_in` is (obs, static_rows): stages
    whose input is exactly the previous stage's file set pass the
    already-known count instead of a second observe node."""
    out, obs_out = run_counters(out_df, ok=ok, name=f"corpus.{name}.out")
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    m = obs_out.get
    rows_in = (observed_in if isinstance(observed_in, int)
               else int(observed_in.get["n_rows"]))
    assembly.stages.append(StageResult(
        name=name, path=path, rows_in=rows_in,
        rows_out=int(m["n_rows"]), n_ok=int(m["n_ok"] or 0),
        n_err=int(m["n_err"] or 0)))


def assemble_corpus(
    spark: SparkSession,
    docs: DataFrame,
    eval_docs: DataFrame,
    work_dir: str,
    *,
    id_col: str = "doc_id",
    url_col: str = "url",
    text_col: str = "text",
    min_chars: int = 1,
    line_min_repeat: int = 2,
    span_window: int = 20,
    span_min_repeat: int = 2,
    jaccard_num: int = 7,
    jaccard_den: int = 10,
    gopher_thresholds: Mapping[str, float] | None = None,
    ppl_max: float | None = None,
    lm_ref: DataFrame | None = None,
    decontam_n: int = DECONTAM_NGRAM,
    splits: Sequence[tuple[str, float]] = (
        ("train", 0.98), ("val", 0.01), ("test", 0.01)),
    pack_budget: int = 2048,
    pack_buckets: int = 64,
    salt: str = "corpus-v1",
) -> CorpusAssembly:
    """Run the full corpus-assembly pipeline over `docs`
    (id_col, url_col, text_col) against the benchmark corpus
    `eval_docs` (text_col), staging every intermediate under
    `work_dir`. Returns the `CorpusAssembly` audit object.

    Knobs map 1:1 onto the underlying operators; `ppl_max=None` skips
    LM training/scoring entirely (the quality stage is then Gopher
    rules only), `lm_ref=None` trains the bigram model on the
    Gopher-surviving docs themselves — the self-trained configuration
    that flags high-perplexity outliers (gibberish, non-language)
    against the corpus's own register.

    Determinism: every stage is a pure function of (inputs, knobs,
    salt) — URL winners and near-dup representatives are min-id, the
    split/pack/shuffle stages hash (salt, id) — so a rerun over the
    same corpus reproduces every artifact bit-for-bit, and `salt`
    versions the whole assembly.
    """
    wd = work_dir.rstrip("/")
    out = CorpusAssembly(work_dir=wd)
    canon = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(url_col).alias("url"),
        F.col(text_col).alias("text"))
    evals = eval_docs.select(F.col(text_col).alias("text"))

    # -- 1. ingest hygiene + canonical-URL exact dedup ----------------
    observed, obs_in = run_counters(canon, name="corpus.url_dedup.in")
    clean = observed.filter(
        F.col("text").isNotNull() & (F.length("text") >= min_chars))
    keyed = clean.withColumn("norm_url", normalize_url("url"))
    # Deterministic winner per canonical URL: the min doc_id (the
    # same rule every dedup stage uses). One agg + one semi-shaped
    # inner join on the key; unparseable URLs can't be keyed and all
    # survive (counted as n_err for the audit).
    winners = (keyed.filter(F.col("norm_url").isNotNull())
               .groupBy("norm_url")
               .agg(F.min("doc_id").alias("doc_id")))
    url_deduped = (
        keyed.join(winners, ["norm_url", "doc_id"], "inner")
        .unionByName(keyed.filter(F.col("norm_url").isNull()))
        .select("doc_id", "url", "norm_url", "text"))
    p1 = f"{wd}/01_url_dedup"
    _write_stage(out, "url_dedup", obs_in, url_deduped, p1,
                 ok=F.col("norm_url").isNotNull())
    # URL metadata side table: the text stages below deliberately
    # carry only (doc_id, text) through their shuffles; consumers
    # rejoin provenance from here by doc_id.
    out.meta_path = f"{wd}/00_meta"
    (spark.read.parquet(p1).select("doc_id", "url", "norm_url")
     .write.mode("overwrite").parquet(out.meta_path))
    prev = out.stages[-1]

    # -- 2. corpus-wide line dedup ------------------------------------
    s1 = spark.read.parquet(p1).select("doc_id", "text")
    ld = (line_dedup(s1, min_repeat=line_min_repeat)
          .filter(F.length("text") > 0))
    p2 = f"{wd}/02_line_dedup"
    _write_stage(out, "line_dedup", prev.rows_out, ld, p2,
                 ok=F.col("lines_kept") == F.col("lines_total"))
    prev = out.stages[-1]

    # -- 3. exact token-window (span) dedup ---------------------------
    s2 = spark.read.parquet(p2).select("doc_id", "text")
    sd = (span_dedup(s2, window=span_window, min_repeat=span_min_repeat)
          .filter(F.length("text") > 0))
    p3 = f"{wd}/03_span_dedup"
    _write_stage(out, "span_dedup", prev.rows_out, sd, p3,
                 ok=F.col("tokens_kept") == F.col("tokens_total"))
    prev = out.stages[-1]

    # -- 4. MinHash+LSH near-dup, keep min-id representatives ---------
    s3 = spark.read.parquet(p3).select("doc_id", "text")
    sig = minhash_signatures(s3)
    pairs = lsh_candidate_pairs(sig)
    confirmed = verify_jaccard(s3, pairs).filter(
        F.col("inter") * jaccard_den >= F.col("uni") * jaccard_num)
    asg = assignment(s3.select("doc_id"), "doc_id",
                     confirmed, "doc_a", "doc_b")
    survivors = s3.join(
        asg.filter(~F.col("is_dup")).select("doc_id"),
        "doc_id", "left_semi")
    p4 = f"{wd}/04_near_dup"
    _write_stage(out, "near_dup", prev.rows_out, survivors, p4)
    prev = out.stages[-1]

    # -- 5. quality: Gopher repetition rules (+ optional LM ppl) ------
    s4 = spark.read.parquet(p4)
    gop = gopher_repetition_filter(s4, thresholds=dict(gopher_thresholds)
                                   if gopher_thresholds else None)
    kept = s4.join(gop.filter("keep").select("doc_id"),
                   "doc_id", "left_semi")
    if ppl_max is not None:
        ref = lm_ref.select(F.col(text_col).alias("text")) \
            if lm_ref is not None else kept
        bigrams, unigrams, vocab = ngram_lm_train(ref)
        scored = ngram_lm_score(kept, bigrams, unigrams, vocab)
        kept = (kept.join(scored.select("doc_id", "ppl"), "doc_id")
                .filter(F.col("ppl").isNull()
                        | (F.col("ppl") <= F.lit(float(ppl_max)))))
    else:
        kept = kept.withColumn("ppl", F.lit(None).cast("double"))
    p5 = f"{wd}/05_quality"
    _write_stage(out, "quality", prev.rows_out, kept, p5)
    prev = out.stages[-1]

    # -- 6. decontaminate-train + leak-free split ---------------------
    s5 = spark.read.parquet(p5)
    flags = contamination_flags(s5, evals, n=decontam_n)
    split = (split_assign(s5.join(flags, "doc_id"),
                          splits=splits, salt=f"{salt}/split")
             .filter(~(F.col("contaminated") & (F.col("split") == "train"))))
    p6 = f"{wd}/06_split"
    # Partitioned by split so train-only downstream reads prune to
    # the train directories at the scan.
    _write_stage(out, "split", prev.rows_out, split, p6,
                 ok=~F.col("contaminated"), partition_by=("split",))
    out.split_path = p6

    # -- 7. pack train docs into fixed token budgets ------------------
    train = (spark.read.parquet(p6)
             .filter(F.col("split") == "train")
             .select("doc_id", "text"))
    tr_obs, obs_tr = run_counters(train, name="corpus.pack.in")
    packs = pack_sequences(tr_obs, budget=pack_budget,
                           n_buckets=pack_buckets, salt=f"{salt}/pack")
    p7 = f"{wd}/07_pack"
    _write_stage(out, "pack", obs_tr, packs, p7,
                 ok=F.col("n_tokens") < F.lit(pack_budget))

    # -- 8. deterministic training order at pack grain ----------------
    # Rejoin text (one doc_id-keyed shuffle), then one range shuffle
    # on the hashed pack key; each pack's docs stay contiguous in
    # `pos` order, so reading the files in key order IS the epoch.
    packed = (spark.read.parquet(p7)
              .join(spark.read.parquet(p6)
                    .filter(F.col("split") == "train")
                    .select("doc_id", "text"), "doc_id"))
    ordered = shuffle_deterministic(
        packed, salt=f"{salt}/shuffle", id_col="pack_id",
        order_within=("pos",)).select(
        "shuffle_key", "pack_id", "pos", "doc_id", "n_tokens", "text")
    p8 = f"{wd}/08_train_order"
    _write_stage(out, "shuffle", out.stages[-1].rows_out, ordered, p8)
    out.train_order_path = p8
    return out
