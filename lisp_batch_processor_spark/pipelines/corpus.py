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
    4b. semantic   OPTIONAL embedding-space near-dup (SemDeDup shape,
                   operators.dedup.semantic_dedup) over an
                   ``embeddings=`` side table — catches paraphrases
                   MinHash misses; docs without embeddings pass
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

import hashlib
import json
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


def url_dedup_min_id(docs: DataFrame, min_chars: int = 1) -> DataFrame:
    """Ingest hygiene + canonical-URL exact dedup over
    (doc_id, url, text): drop NULL/short texts, keep the MIN doc_id
    per canonical URL (the same deterministic winner rule every dedup
    stage uses), keep every unparseable-URL row (they cannot be
    keyed; flag, never drop). Returns (doc_id, url, norm_url, text).

    The ONE implementation of the winner rule — stage 1 of
    `assemble_corpus`, the per-epoch ingest (`pipelines.ingest`), and
    its batch reference all call this, so the streaming/batch
    equality pin can never drift on URL semantics. One agg + one
    semi-shaped inner join on the key."""
    clean = docs.filter(
        F.col("text").isNotNull() & (F.length("text") >= min_chars))
    keyed = clean.withColumn("norm_url", normalize_url("url"))
    winners = (keyed.filter(F.col("norm_url").isNotNull())
               .groupBy("norm_url")
               .agg(F.min("doc_id").alias("doc_id")))
    return (keyed.join(winners, ["norm_url", "doc_id"], "inner")
            .unionByName(keyed.filter(F.col("norm_url").isNull()))
            .select("doc_id", "url", "norm_url", "text"))


# Stage-completion sidecar: a tiny underscore-file written INSIDE the
# stage dir strictly AFTER its parquet write commits, carrying the
# stage's counters, its KNOB-SCOPED fingerprint, and its parent
# stage's fingerprint (the lineage link `corpus_report` audits).
# Underscore names are invisible to Spark's readers; a crash
# mid-stage leaves no sidecar (or a torn one, which reads as absent),
# so resume reruns exactly the incomplete stage; a fingerprint
# mismatch (this stage's or an upstream knob changed — fingerprints
# chain) likewise reruns from that stage. Every stage is a pure
# function of (inputs, knobs, salt), so a resumed run's artifacts
# are bit-identical to an uninterrupted one's.
_STAGE_DONE = "_stage_counters.json"


def _stage_done_write(spark: SparkSession, sr: StageResult,
                      fingerprint: str, parent: str = "") -> None:
    from lisp_batch_processor_spark.sources.writers import write_json_file
    write_json_file(spark, sr.path.rstrip("/") + "/" + _STAGE_DONE,
                    {"name": sr.name, "rows_in": sr.rows_in,
                     "rows_out": sr.rows_out, "n_ok": sr.n_ok,
                     "n_err": sr.n_err, "fingerprint": fingerprint,
                     "parent": parent})


def _stage_done_read(spark: SparkSession, name: str, path: str,
                     fingerprint: str) -> StageResult | None:
    """The stage's completed prior result, or None when it must run
    (absent, torn, or produced under a different knob-scoped
    fingerprint — see `_stage_done_write` for the chain that makes
    mismatch-means-rerun safe)."""
    from lisp_batch_processor_spark.sources.writers import read_json_file
    # Torn or corrupt sidecar from a crash (bad JSON, or a checksum/
    # read failure on the file itself) reads as None: the stage never
    # completed — rerun it. The rerun's overwrite replaces the sidecar.
    d = read_json_file(spark, path.rstrip("/") + "/" + _STAGE_DONE)
    if d is None:
        return None
    if d.get("name") != name:
        return None
    if d.get("fingerprint") != fingerprint:
        # Produced under different knobs (this stage's or an
        # upstream stage's — the fingerprints CHAIN). Rerun, which
        # deterministically overwrites the dir: with knob-scoped
        # chained fingerprints an adopted prefix is
        # consistent-by-construction, so a mismatch is simply "work
        # resumes HERE", never a mixing hazard.
        return None
    return StageResult(name=name, path=path, rows_in=int(d["rows_in"]),
                       rows_out=int(d["rows_out"]), n_ok=int(d["n_ok"]),
                       n_err=int(d["n_err"]))


def _dir_complete(spark: SparkSession, path: str) -> bool:
    """Whether a plain (non-stage) output dir finished writing —
    Spark's job-commit `_SUCCESS` marker."""
    from lisp_batch_processor_spark.sources.writers import _hadoop_fs
    jvm, fs, _ = _hadoop_fs(spark, path)
    return fs.exists(jvm.org.apache.hadoop.fs.Path(
        path.rstrip("/") + "/_SUCCESS"))


def _write_stage(assembly: CorpusAssembly, name: str, observed_in,
                 out_df: DataFrame, path: str,
                 ok=None, partition_by: Sequence[str] = (),
                 fingerprint: str = "", parent: str = "") -> None:
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
    sr = StageResult(
        name=name, path=path, rows_in=rows_in,
        rows_out=int(m["n_rows"]), n_ok=int(m["n_ok"] or 0),
        n_err=int(m["n_err"] or 0))
    _stage_done_write(out_df.sparkSession, sr, fingerprint, parent)
    assembly.stages.append(sr)


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
    embeddings: DataFrame | None = None,
    semantic_tau: float = 0.95,
    semantic_k: int = 64,
    semantic_iters: int = 1,
    gopher_thresholds: Mapping[str, float] | None = None,
    ppl_max: float | None = None,
    lm_ref: DataFrame | None = None,
    decontam_n: int = DECONTAM_NGRAM,
    decontam_fuzzy: tuple[int, int] | None = None,
    splits: Sequence[tuple[str, float]] = (
        ("train", 0.98), ("val", 0.01), ("test", 0.01)),
    pack_budget: int = 2048,
    pack_buckets: int = 64,
    mix_weights: Mapping[str, float] | None = None,
    mix_alpha: float | None = None,
    mix_token_budget: int | None = None,
    redact_kinds: Sequence[str] | None = None,
    salt: str = "corpus-v1",
    resume: bool = False,
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

    ``embeddings`` (a (id_col, embedding) side table) inserts the
    semantic-dedup stage 4b between near-dup and quality:
    `operators.dedup.semantic_dedup` with ``semantic_tau`` /
    ``semantic_k`` / ``semantic_iters`` — IVF cells over the
    survivors' embeddings, within-cell exact cosine >= tau, min-id
    representatives kept, flagged dups dropped. Docs without an
    embedding row always survive the stage. The stage carries its
    own chained fingerprint, so ``resume=True`` after a tau change
    reruns exactly semantic -> shuffle and adopts the byte-level
    dedup passes (the embeddings frame's identity is the caller's
    contract, like docs/eval_docs/lm_ref).

    ``mix_weights`` + ``mix_token_budget`` switch on DOMAIN MIXING at
    the pack stage: train docs get a domain (the registrable eTLD+1
    of their canonical URL; unparseable → "unknown"), per-domain
    fractional epoch counts come from `training.epoch_rates` (target
    token shares at the explicit budget — rates > 1 repeat small
    high-quality domains, the regime every real pretraining mix
    hits), copies materialize via `training.domain_upsample`
    (deterministic fractional coin), and packing/shuffle treat each
    (doc, epoch) copy as its own row through an integral
    copy id = doc_id·cap + epoch (cap a power of two above the max
    epoch count; doc ids must stay below 2^63/cap). Domains absent
    from ``mix_weights`` are DROPPED (rate 0); the final training
    order then carries an extra ``epoch`` column. With the knobs
    unset (default), packing is exactly the one-copy-per-doc path.
    ``mix_alpha`` is the convenience form: instead of a precomputed
    ``mix_weights`` map, the target mixture derives from the MEASURED
    per-domain token totals via `training.temperature_weights`
    (w_d ∝ tokens_d^alpha — alpha=1 natural, alpha=0 uniform);
    mutually exclusive with ``mix_weights``, same budget knob.

    ``decontam_fuzzy=(num, den)`` adds the MinHash near-dup
    decontamination sweep (`training.fuzzy_contamination`, integer
    Jaccard threshold num/den) alongside the exact n-gram sweep; the
    split stage's `contaminated` flag becomes their OR, so a
    paraphrased eval item with no verbatim 8-gram still never
    reaches train.

    ``redact_kinds`` switches on the PII/secret scrub
    (`functions.redact.redact_documents`) inside stage 1, after URL
    winner selection and before every text-dedup stage; the per-row
    per-kind `redactions` audit map lands in the stage-1 output and
    `corpus_report` totals it. The streaming ingest twin accepts the
    same knob.

    ``resume=True`` restarts a crashed run AND is the
    filter-iteration workflow: stages whose dir carries a completion
    sidecar (written strictly after the stage's parquet commit) with
    a matching KNOB-SCOPED fingerprint are adopted — counters read
    back, computation and write skipped — and work restarts at the
    first stage that is incomplete or whose (own or upstream) knobs
    changed. Fingerprints chain per stage over only the knobs that
    stage depends on, so rerunning with a new `ppl_max` adopts
    stages 1-4 (the expensive dedup passes) and recomputes exactly
    quality -> shuffle; a new `salt` recomputes only split ->
    shuffle. The identity of `docs`/`eval_docs`/`lm_ref` is the
    caller's contract (fingerprints cover knobs, not data).
    Determinism makes a resumed run's artifacts bit-identical to an
    uninterrupted run with the same final knobs. At 100 TB this is
    the point of the staged layout: a crash in stage 6 — or a
    quality-threshold sweep — costs stage 6, not the dedup passes.
    """
    wd = work_dir.rstrip("/")
    out = CorpusAssembly(work_dir=wd)
    # Knob-SCOPED stage fingerprints, chained: each stage's
    # fingerprint hashes only the knobs its own computation (and
    # anything upstream, via the chain) depends on. Changing a
    # downstream knob therefore leaves every upstream sidecar valid —
    # `resume=True` after a ppl_max change adopts the expensive dedup
    # passes and reruns exactly stages 5-8. That makes resume the
    # filter-iteration workflow, not just crash recovery: at 100 TB
    # the dedup passes dominate, and re-sweeping quality thresholds
    # must not pay them again. Stages 1-5 are salt-free by
    # construction (their operators take no salt), so `salt` enters
    # the chain at split.
    _scopes = (
        ("url_dedup", {"v": 2, "id_col": id_col, "url_col": url_col,
                       "text_col": text_col, "min_chars": min_chars,
                       "redact_kinds": sorted(redact_kinds)
                       if redact_kinds else None}),
        ("line_dedup", {"line_min_repeat": line_min_repeat}),
        ("span_dedup", {"span_window": span_window,
                        "span_min_repeat": span_min_repeat}),
        ("near_dup", {"jaccard_num": jaccard_num,
                      "jaccard_den": jaccard_den}),
        # Present in the chain ONLY when the stage runs: with no
        # embeddings the fingerprints (and sidecar parent links) are
        # exactly the stage-1..8 chain, so existing work dirs resume
        # unchanged; toggling the knob on/off or changing tau/k/iters
        # shifts every downstream fingerprint and reruns from here.
        # The embeddings DataFrame itself is DATA, covered by the
        # same caller contract as docs/eval_docs/lm_ref.
        *(() if embeddings is None else
          (("semantic", {"tau": float(semantic_tau),
                         "k": int(semantic_k),
                         "iters": int(semantic_iters)}),)),
        ("quality", {"gopher_thresholds": dict(gopher_thresholds)
                     if gopher_thresholds else None,
                     "ppl_max": ppl_max,
                     "self_trained_lm": lm_ref is None}),
        ("split", {"decontam_n": decontam_n,
                   "decontam_fuzzy": list(decontam_fuzzy)
                   if decontam_fuzzy else None,
                   "splits": [list(s) for s in splits], "salt": salt}),
        ("pack", {"pack_budget": pack_budget,
                  "pack_buckets": pack_buckets,
                  "mix_weights": sorted(mix_weights.items())
                  if mix_weights else None,
                  "mix_alpha": mix_alpha,
                  "mix_token_budget": mix_token_budget}),
        ("shuffle", {}),
    )
    fps: dict[str, str] = {}
    parents: dict[str, str] = {}
    _h = ""
    for _name, _knobs in _scopes:
        parents[_name] = _h
        _h = hashlib.md5(
            (_h + json.dumps(_knobs, sort_keys=True)).encode()).hexdigest()
        fps[_name] = _h
    if mix_weights is not None and mix_alpha is not None:
        raise ValueError("pass mix_weights OR mix_alpha, not both "
                         "(mix_alpha derives the weights from the "
                         "measured domain tokens)")
    mixing = mix_weights is not None or mix_alpha is not None
    if mixing != (mix_token_budget is not None):
        raise ValueError("domain mixing needs mix_weights or "
                         "mix_alpha AND mix_token_budget (or none)")

    def done(name: str, path: str) -> StageResult | None:
        if not resume:
            return None
        sr = _stage_done_read(spark, name, path, fps[name])
        if sr is not None:
            out.stages.append(sr)
        return sr
    canon = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(url_col).alias("url"),
        F.col(text_col).alias("text"))
    evals = eval_docs.select(F.col(text_col).alias("text"))

    # -- 1. ingest hygiene + canonical-URL exact dedup ----------------
    p1 = f"{wd}/01_url_dedup"
    if done("url_dedup", p1) is None:
        observed, obs_in = run_counters(canon, name="corpus.url_dedup.in")
        # Unparseable URLs survive but count as n_err for the audit.
        url_deduped = url_dedup_min_id(observed, min_chars)
        if redact_kinds is not None:
            # Scrub at the ingest boundary, AFTER winner selection
            # (the scrub never changes which doc wins) and BEFORE the
            # text-dedup stages (unified placeholders make scrubbed
            # boilerplate dedup BETTER). The per-row `redactions`
            # audit map persists in this stage's output — downstream
            # stages select (doc_id, text) and never carry it;
            # corpus_report sums it from here.
            from lisp_batch_processor_spark.functions.redact import (
                redact_documents)
            url_deduped = redact_documents(url_deduped,
                                           kinds=redact_kinds)
        _write_stage(out, "url_dedup", obs_in, url_deduped, p1,
                     ok=F.col("norm_url").isNotNull(),
                     fingerprint=fps["url_dedup"],
                     parent=parents["url_dedup"])
    # URL metadata side table: the text stages below deliberately
    # carry only (doc_id, text) through their shuffles; consumers
    # rejoin provenance from here by doc_id. Derived from the durable
    # stage-1 output, so a resume just rebuilds it if its own write
    # never committed.
    out.meta_path = f"{wd}/00_meta"
    if not (resume and _dir_complete(spark, out.meta_path)):
        (spark.read.parquet(p1).select("doc_id", "url", "norm_url")
         .write.mode("overwrite").parquet(out.meta_path))
    prev = out.stages[-1]

    # -- 2. corpus-wide line dedup ------------------------------------
    p2 = f"{wd}/02_line_dedup"
    if done("line_dedup", p2) is None:
        s1 = spark.read.parquet(p1).select("doc_id", "text")
        ld = (line_dedup(s1, min_repeat=line_min_repeat)
              .filter(F.length("text") > 0))
        _write_stage(out, "line_dedup", prev.rows_out, ld, p2,
                     ok=F.col("lines_kept") == F.col("lines_total"),
                     fingerprint=fps["line_dedup"],
                     parent=parents["line_dedup"])
    prev = out.stages[-1]

    # -- 3. exact token-window (span) dedup ---------------------------
    p3 = f"{wd}/03_span_dedup"
    if done("span_dedup", p3) is None:
        s2 = spark.read.parquet(p2).select("doc_id", "text")
        sd = (span_dedup(s2, window=span_window,
                         min_repeat=span_min_repeat)
              .filter(F.length("text") > 0))
        _write_stage(out, "span_dedup", prev.rows_out, sd, p3,
                     ok=F.col("tokens_kept") == F.col("tokens_total"),
                     fingerprint=fps["span_dedup"],
                     parent=parents["span_dedup"])
    prev = out.stages[-1]

    # -- 4. MinHash+LSH near-dup, keep min-id representatives ---------
    p4 = f"{wd}/04_near_dup"
    if done("near_dup", p4) is None:
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
        _write_stage(out, "near_dup", prev.rows_out, survivors, p4,
                     fingerprint=fps["near_dup"],
                     parent=parents["near_dup"])
    prev = out.stages[-1]

    # -- 4b. semantic (embedding) near-dup, optional -------------------
    # SemDeDup-shaped cell-scoped cosine dedup (operators.dedup.
    # semantic_dedup) over the ``embeddings`` side table, between the
    # byte-level near-dup pass and quality: catches paraphrased /
    # re-rendered duplicates whose shingle sets no longer collide.
    # Docs WITHOUT an embedding pass through (flag-never-drop, like
    # unparseable URLs); min-id representatives keep the winner rule
    # every dedup stage uses. Its own sidecar fingerprint makes
    # resume/filter-iteration hold: a tau/k change reruns from HERE.
    p4b = f"{wd}/04b_semantic"
    q_in = p4
    if embeddings is not None:
        q_in = p4b
        if done("semantic", p4b) is None:
            from lisp_batch_processor_spark.operators.dedup import (
                semantic_dedup)
            s4 = spark.read.parquet(p4)
            emb = (embeddings
                   .select(F.col(id_col).alias("doc_id"), "embedding")
                   .join(s4.select("doc_id"), "doc_id", "left_semi"))
            asg = semantic_dedup(emb, k=semantic_k,
                                 tau=semantic_tau,
                                 id_col="doc_id",
                                 iters=semantic_iters)
            drops = asg.filter(F.col("is_dup")).select("doc_id")
            survivors = s4.join(drops, "doc_id", "left_anti")
            _write_stage(out, "semantic", prev.rows_out, survivors,
                         p4b, fingerprint=fps["semantic"],
                         parent=parents["semantic"])
        prev = out.stages[-1]

    # -- 5. quality: Gopher repetition rules (+ optional LM ppl) ------
    p5 = f"{wd}/05_quality"
    if done("quality", p5) is None:
        s4 = spark.read.parquet(q_in)
        gop = gopher_repetition_filter(
            s4, thresholds=dict(gopher_thresholds)
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
        _write_stage(out, "quality", prev.rows_out, kept, p5,
                     fingerprint=fps["quality"],
                     parent=parents["quality"])
    prev = out.stages[-1]

    # -- 6. decontaminate-train + leak-free split ---------------------
    p6 = f"{wd}/06_split"
    if done("split", p6) is None:
        s5 = spark.read.parquet(p5)
        flags = contamination_flags(s5, evals, n=decontam_n)
        if decontam_fuzzy is not None:
            # Both sweeps: exact n-gram catches verbatim leaks the
            # fuzzy LSH tail can miss; fuzzy catches paraphrased/
            # reordered eval items with no surviving n-gram. The
            # persisted `contaminated` flag is their OR.
            from lisp_batch_processor_spark.operators.training import (
                fuzzy_contamination)
            fnum, fden = decontam_fuzzy
            fz = fuzzy_contamination(s5, evals, jaccard_num=int(fnum),
                                     jaccard_den=int(fden))
            flags = (flags.join(
                fz.select("doc_id", "fuzzy_contaminated"), "doc_id")
                .withColumn("contaminated",
                            F.col("contaminated")
                            | F.col("fuzzy_contaminated"))
                .drop("fuzzy_contaminated"))
        split = (split_assign(s5.join(flags, "doc_id"),
                              splits=splits, salt=f"{salt}/split")
                 .filter(~(F.col("contaminated")
                           & (F.col("split") == "train"))))
        # Partitioned by split so train-only downstream reads prune
        # to the train directories at the scan.
        _write_stage(out, "split", prev.rows_out, split, p6,
                     ok=~F.col("contaminated"), partition_by=("split",),
                     fingerprint=fps["split"],
                     parent=parents["split"])
    out.split_path = p6

    # -- 7. pack train docs into fixed token budgets ------------------
    # With mixing on, (rates, cap) derive deterministically from the
    # split output + knobs OUTSIDE the stage guards, so a resume that
    # adopts the pack stage can still decode copy ids in stage 8 —
    # but a resume that adopts BOTH consumers skips the derivation's
    # train-split scan entirely.
    p7 = f"{wd}/07_pack"
    p8 = f"{wd}/08_train_order"
    mix_cap = None
    if mixing and not (
            resume
            and _stage_done_read(spark, "pack", p7, fps["pack"]) is not None
            and _stage_done_read(spark, "shuffle", p8,
                                 fps["shuffle"]) is not None):
        from lisp_batch_processor_spark.functions.urls import (
            registered_domain)
        from lisp_batch_processor_spark.operators.text import tokens_col
        from lisp_batch_processor_spark.operators.training import (
            domain_upsample, epoch_rates)
        # The text stages carry only (doc_id, text); provenance lives
        # in the 00_meta side table — rejoin it for the domain key.
        meta_urls = (spark.read.parquet(out.meta_path)
                     .select("doc_id", "norm_url"))
        domained = (spark.read.parquet(p6)
                    .filter(F.col("split") == "train")
                    .select("doc_id", "text")
                    .join(meta_urls, "doc_id", "left")
                    .withColumn("_domain",
                                F.coalesce(registered_domain("norm_url"),
                                           F.lit("unknown")))
                    .drop("norm_url"))
        dom_stats = (domained.groupBy("_domain")
                     .agg(F.sum(F.size(tokens_col())).alias("t"),
                          F.max(F.abs("doc_id")).alias("m"))
                     .collect())  # O(#domains) driver state
        dom_tokens = {r["_domain"]: int(r["t"]) for r in dom_stats}
        if mix_alpha is not None:
            # Convenience knob: temperature-flatten the MEASURED
            # domain token distribution (w_d ∝ tokens_d^alpha,
            # operators.training.temperature_weights) instead of
            # requiring the caller to precompute the target mixture.
            # Domains with zero tokens can't occur here (every
            # grouped domain has >= 1 doc with >= min_chars text).
            from lisp_batch_processor_spark.operators.training import (
                temperature_weights)
            target = temperature_weights(dom_tokens, float(mix_alpha))
        else:
            target = dict(mix_weights)
        rates = epoch_rates(dom_tokens, target, int(mix_token_budget))
        mix_cap = 1 << max(int(e) + 1 for e in rates.values()).bit_length()
        # Fail fast instead of letting copy_id = doc_id*cap + epoch
        # wrap int64 (a wrapped id decodes to a nonexistent doc and
        # the stage-8 rejoin silently drops the copy).
        max_id = max((int(r["m"]) for r in dom_stats if r["m"] is not None),
                     default=0)
        if max_id >= (1 << 62) // mix_cap:
            raise ValueError(
                f"doc ids up to {max_id} are too large for the copy-id "
                f"encoding at {mix_cap} epochs per doc (needs "
                f"|doc_id| < 2^62/{mix_cap}); factorize ids to a "
                "dense range before mixing")
    if done("pack", p7) is None:
        if mixing:
            copies = (domain_upsample(domained, rates,
                                      domain_col="_domain",
                                      salt=f"{salt}/mix")
                      .withColumn("copy_id",
                                  F.col("doc_id") * F.lit(mix_cap)
                                  + F.col("epoch")))
            # Counters at COPY grain (rows_in == rows_out == copies),
            # keeping StageResult.dropped >= 0 like every other
            # stage; the doc-grain input is the split stage's
            # rows_out, so the doc -> copy expansion stays readable
            # from the chain.
            tr_obs, obs_tr = run_counters(copies, name="corpus.pack.in")
            packs = pack_sequences(tr_obs, budget=pack_budget,
                                   id_col="copy_id",
                                   n_buckets=pack_buckets,
                                   salt=f"{salt}/pack")
        else:
            train = (spark.read.parquet(p6)
                     .filter(F.col("split") == "train")
                     .select("doc_id", "text"))
            tr_obs, obs_tr = run_counters(train, name="corpus.pack.in")
            packs = pack_sequences(tr_obs, budget=pack_budget,
                                   n_buckets=pack_buckets,
                                   salt=f"{salt}/pack")
        _write_stage(out, "pack", obs_tr, packs, p7,
                     ok=F.col("n_tokens") < F.lit(pack_budget),
                     fingerprint=fps["pack"],
                     parent=parents["pack"])

    # -- 8. deterministic training order at pack grain ----------------
    # Rejoin text (one doc_id-keyed shuffle), then one range shuffle
    # on the hashed pack key; each pack's docs stay contiguous in
    # `pos` order, so reading the files in key order IS the epoch.
    if done("shuffle", p8) is None:
        pk = spark.read.parquet(p7)
        txt = (spark.read.parquet(p6)
               .filter(F.col("split") == "train")
               .select("doc_id", "text"))
        sel = ["shuffle_key", "pack_id", "pos", "doc_id",
               "n_tokens", "text"]
        if mixing:
            # The pack frame's doc_id column carries copy ids —
            # decode (orig doc, epoch) with the power-of-two cap.
            pk = (pk.withColumnRenamed("doc_id", "_copy_id")
                  .withColumn("doc_id",
                              F.shiftright("_copy_id",
                                           mix_cap.bit_length() - 1))
                  .withColumn("epoch", F.col("_copy_id")
                              .bitwiseAND(F.lit(mix_cap - 1)))
                  .drop("_copy_id"))
            sel.insert(4, "epoch")
        packed = pk.join(txt, "doc_id")
        ordered = shuffle_deterministic(
            packed, salt=f"{salt}/shuffle", id_col="pack_id",
            order_within=("pos",)).select(*sel)
        _write_stage(out, "shuffle", out.stages[-1].rows_out, ordered,
                     p8, fingerprint=fps["shuffle"],
                     parent=parents["shuffle"])
    out.train_order_path = p8
    return out
