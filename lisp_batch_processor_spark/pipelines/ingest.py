"""Streaming corpus ingest — the continuous twin of the batch
assembly's ingest-side stages (pipelines/corpus.py stages 1/2/4/5):
documents arrive in micro-batches and each epoch is deduplicated
against EVERYTHING ingested before it through persisted stores,
never a corpus re-scan:

    hygiene + URL dedup   within-batch min-id winner per canonical
                          URL, then an anti-join against the
                          epoch-tagged URL-key membership store
    line dedup            `streaming.dedup.line_dedup_ingest_epoch`
                          against the persisted line-digest store
    near-dup              `streaming.dedup.near_dup_ingest_epoch`
                          against the persisted signature index +
                          shingle store (appends survivors' state)
    semantic (optional)   `streaming.dedup.semantic_ingest_epoch`
                          against the seed-trained cell model +
                          celled survivor store (the assembly's
                          stage 4b, composed into the same loop via
                          the ``embeddings`` side input)
    quality               Gopher repetition rules (stateless)

The per-epoch work item is `corpus_ingest_epoch`, with
`streaming_corpus_ingest` as the foreachBatch wrapper that also
appends each epoch's survivors epoch-tagged to a durable corpus dir
(`start_corpus_ingest` is the documented way to START it — one
checkpoint_dir becomes both the checkpointLocation and the lineage
token, the strong contract by default), and `corpus_ingest_batch`
as the equality-pinned batch reference:
with ingest-ordered doc ids, the concatenation of every epoch's
output EQUALS the batch run over the full corpus (the same
first-occurrence/min-id argument as the line and near-dup twins,
pinned in tests/test_corpus_ingest.py). One documented exception:
a transitive near-dup CHAIN that straddles epochs (C similar only
to B, B already dropped in an earlier epoch as a dup of A) keeps C,
where the batch run would drop it via the B-pair — dropped docs'
signatures are deliberately not indexed. This is the standard
incremental-dedup semantics (only survivors define the corpus), and
within a single epoch the batch-vs-batch self-join sees every doc,
so chains resolve exactly as in batch.

Replay safety (crash between an epoch's store appends and its
checkpoint commit) holds per store: the URL and line stores are
EPOCH-TAGGED and membership reads filter to strictly-earlier epochs,
so a replay excludes its own prior append and recomputes identical
output; the near-dup stores tolerate their own append (self-pairs
resolve to rep = self — see near_dup_ingest_epoch); the corpus dir's
re-append writes duplicate rows of a DETERMINISTIC epoch output,
which `corpus_read`'s doc_id dedup collapses.

Composition with training-time assembly: the ingested corpus is a
valid `docs` input to `pipelines.corpus.assemble_corpus` — its URL /
line / near-dup stages become cheap no-op passes over the already-
deduped corpus (each stage is idempotent) and the span-dedup /
LM-quality / decontamination / split / pack / shuffle stages, which
are training-run decisions rather than ingest state, run there.
Exact token-window (span) dedup is deliberately NOT in the ingest
path: its overlapping-window strip is not expressible over an
append-only membership store without corpus-order context — run it
at assembly time.

Scale notes (100 TB corpus, GB-sized epochs): every per-epoch cost
is O(batch + candidates) — URL and line membership are anti-joins of
batch keys against key-only stores (128-bit digests, never text),
near-dup is the measured flat-per-batch incremental operator
(SCALE.md's incremental table), and the stores stay bounded via
`line_store_compact` / `sources.writers.compact` from the same
single-writer maintenance window. `backend="versioned"` publishes
all stores through pointer-committed version dirs (appends are
new-files-only either way) for object-store deployments.

Reference parity: the reference's whole product is ordered batch
ingest with dedup-on-insert and per-item fault isolation
(`Batch Processor.py:306-350`, R1-R7) — this module is that loop,
continuous and distributed.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lisp_batch_processor_spark.operators.text import (
    gopher_repetition_filter,
)

_URL_SCHEMA = "url_key string, epoch_id long"


def _paths(state_dir: str) -> dict[str, str]:
    sd = state_dir.rstrip("/")
    return {"url": f"{sd}/url_store", "line": f"{sd}/line_store",
            "index": f"{sd}/nd_index", "shingles": f"{sd}/nd_shingles"}


def _sem_present(spark: SparkSession, state_dir: str) -> bool:
    """Whether `streaming.dedup.semantic_store_seed` stores live under
    ``state_dir`` — the semantic axis is optional, so the maintenance
    and report passes auto-include it only when seeded."""
    from lisp_batch_processor_spark.sources.writers import _hadoop_fs
    from lisp_batch_processor_spark.streaming.dedup import (
        semantic_store_roots)
    cent_path, _ = semantic_store_roots(spark, state_dir)
    jvm, fs, _ = _hadoop_fs(spark, cent_path)
    return fs.exists(jvm.org.apache.hadoop.fs.Path(cent_path))


def corpus_ingest_init(spark: SparkSession, state_dir: str,
                       backend: str = "swap") -> None:
    """Create the four empty ingest stores under ``state_dir``:
    the epoch-tagged URL-key membership store, the line-digest store,
    and the near-dup signature index + shingle store. Seed corpus
    state may be appended afterwards (URL/line rows with any
    ``epoch_id < 0``; index/shingle rows untagged)."""
    from lisp_batch_processor_spark.operators.dedup import (
        banded_signatures, minhash_signatures, shingle_store)
    from lisp_batch_processor_spark.sources.writers import (
        store_append, versioned_store_init)
    from lisp_batch_processor_spark.streaming.dedup import line_store_init

    if backend not in ("swap", "versioned"):
        raise ValueError(f"backend must be 'swap' or 'versioned', "
                         f"got {backend!r}")
    # No lineage-meta reset here: the meta lives INSIDE state_dir, so
    # the legitimate fresh-dir path never has one, and re-init over a
    # LIVE state_dir must not weaken the monotonic-epoch guard
    # (`streaming.dedup.ingest_lineage_check`) — the appends below
    # don't clear the stores it protects.
    p = _paths(state_dir)
    if backend == "versioned":
        for path in (p["url"], p["index"], p["shingles"]):
            versioned_store_init(spark, path)
    store_append(spark.createDataFrame([], _URL_SCHEMA), p["url"])
    line_store_init(spark, p["line"], backend=backend)
    empty_docs = spark.createDataFrame([], "doc_id bigint, text string")
    store_append(banded_signatures(minhash_signatures(empty_docs)),
                 p["index"])
    store_append(shingle_store(empty_docs), p["shingles"])


def corpus_ingest_seed(seed_docs: DataFrame, state_dir: str, *,
                       min_chars: int = 1,
                       embeddings: DataFrame | None = None,
                       semantic_k: int = 64,
                       semantic_iters: int = 1) -> None:
    """Seed freshly-initialized ingest stores from an EXISTING corpus
    (doc_id, url, text) — the migration path from batch assembly to
    continuous ingest: every later epoch then dedups against the
    seeded history exactly as against prior epochs. URL keys and line
    digests land at epoch −1 (< any stream epoch, so every epoch's
    strictly-earlier membership filter admits them) — line digests
    WITH their seed-corpus occurrence counts, so later epochs at any
    ``line_min_repeat`` (including > 2, the counts path) see exact
    priors; the near-dup index + shingle store take the seed docs'
    signatures untagged (the stores' usual shape). The seed corpus
    should itself be deduped (e.g. `corpus_read` output or a batch
    assembly's survivors) — seeding does not dedup it. Seed a FRESH
    store only (the compaction fold assumes one epoch −1 row per
    key) — MACHINE-CHECKED (round 11): seeding over a state_dir
    whose URL or line store already holds committed rows (a live
    stream's history, or a previous seed) raises instead of silently
    double-seeding membership and breaking the fold's
    one-base-row-per-key assumption. Two limit-1 reads at seed time.

    ``embeddings`` (doc_id, embedding — the seed docs' vectors)
    additionally seeds the SEMANTIC stores
    (`streaming.dedup.semantic_store_seed`: the generation-0 IVF
    cell model trained on these vectors at ``semantic_k`` /
    ``semantic_iters``, plus the celled survivor store), so the
    migrated stream can pass ``embeddings`` to
    `streaming_corpus_ingest` and dedup semantically against the
    seeded history from its first epoch."""
    from lisp_batch_processor_spark.functions.urls import normalize_url
    from lisp_batch_processor_spark.operators.dedup import (
        banded_signatures, minhash_signatures, shingle_store)
    from lisp_batch_processor_spark.sources.writers import (
        _hadoop_fs, store_append, store_data_path)
    from lisp_batch_processor_spark.streaming.dedup import (
        _LINE_SCHEMA, line_digest_keys)

    p = _paths(state_dir)
    spark = seed_docs.sparkSession
    # FRESH-STORE guard: the epoch −1 base rows written below must be
    # the ONLY base rows (the compaction fold collapses to one row
    # per key at −1), and seeded membership must not silently stack
    # on a live stream's history — committed rows in either
    # epoch-tagged store refuse the seed.
    for label, root, schema in (("URL", p["url"], _URL_SCHEMA),
                                ("line", p["line"], _LINE_SCHEMA)):
        dp = store_data_path(spark, root)
        if dp is None:
            continue
        jvm, fs, _ = _hadoop_fs(spark, dp)
        if not fs.exists(jvm.org.apache.hadoop.fs.Path(dp)):
            continue
        if spark.read.schema(schema).parquet(dp).head(1):
            raise ValueError(
                f"{label} store under {state_dir} already holds "
                "committed rows (a live stream's history or a "
                "previous seed); seeding would double membership "
                "state and break the compaction fold's one-base-"
                "row-per-key assumption — seed a FRESH state_dir")
    seed = seed_docs.filter(
        F.col("text").isNotNull() & (F.length("text") >= min_chars))
    store_append(seed.select(F.md5(normalize_url("url"))
                             .alias("url_key"))
                 .filter(F.col("url_key").isNotNull()).distinct()
                 .withColumn("epoch_id", F.lit(-1).cast("long")),
                 p["url"])
    # LINE keying must match the epoch path exactly
    # (line_dedup_ingest_epoch keys every line >= 1 char — the
    # ``min_chars`` knob above is DOC hygiene, not line exemption),
    # or seeded membership diverges from epoch-written membership.
    store_append(line_digest_keys(seed, line_min_chars=1, counts=True)
                 .withColumn("epoch_id", F.lit(-1).cast("long"))
                 .select("line_key", "epoch_id", "n"),
                 p["line"])
    docs = seed.select("doc_id", "text")
    store_append(banded_signatures(minhash_signatures(docs)), p["index"])
    store_append(shingle_store(docs), p["shingles"])
    if embeddings is not None:
        from lisp_batch_processor_spark.sources.writers import (
            store_is_versioned)
        from lisp_batch_processor_spark.streaming.dedup import (
            semantic_store_seed)
        # Inherit the state_dir's backend (corpus_ingest_init tagged
        # the URL store): a versioned deployment — the object-store
        # mode that opted OUT of rename-based swaps — must not get
        # swap-published semantic stores on the side.
        semantic_store_seed(
            embeddings.select(F.col("doc_id").alias("vec_id"),
                              "embedding")
            .join(seed.select(F.col("doc_id").alias("vec_id")),
                  "vec_id", "left_semi"),
            state_dir, k=semantic_k, iters=semantic_iters,
            backend=("versioned"
                     if store_is_versioned(seed_docs.sparkSession,
                                           p["url"])
                     else "swap"))


def corpus_ingest_epoch(batch_df: DataFrame, state_dir: str,
                        epoch_id: int, *,
                        min_chars: int = 1,
                        line_min_repeat: int = 2,
                        redact_kinds=None,
                        jaccard_num: int = 7, jaccard_den: int = 10,
                        embeddings: DataFrame | None = None,
                        semantic_tau: float = 0.95,
                        semantic_centroids: list[list[float]]
                        | None = None,
                        semantic_gen: int | None = None,
                        gopher_thresholds: dict | None = None,
                        lineage: str | None = None,
                        funnel_sink: Callable[[dict], None]
                        | None = None
                        ) -> DataFrame:
    """One ingest epoch over ``batch_df`` (doc_id, url, text): apply
    hygiene + URL dedup + line dedup + near-dup (+ optional semantic
    dedup) against the persisted stores, append the new state, and
    return the epoch's surviving (doc_id, url, norm_url, text) rows,
    eagerly materialized.

    ``line_min_repeat`` > 2 uses the line store's epoch-tagged
    occurrence counts (prefix policy — the first k-1 corpus-wide
    occurrences of a line survive; see
    `streaming.dedup.line_dedup_ingest_epoch`); keep it constant per
    state_dir (counts saturate at the k they were recorded under).

    ``embeddings`` (doc_id, embedding — the epoch's docs' vectors, a
    doc_id-keyed side frame) switches on the SEMANTIC stage between
    near-dup and the Gopher rules — the same slot the batch
    assembly's stage 4b occupies — running
    `streaming.dedup.semantic_ingest_epoch` against the
    `semantic_store_seed` stores under the SAME ``state_dir`` (seed
    them first). Docs without an embedding pass through
    (flag-never-drop, the stage-4b convention); semantic survivors'
    vectors append so later epochs dedup against them.
    ``semantic_centroids``/``semantic_gen`` are the long-lived
    caller's pass-throughs (the streaming wrapper's per-generation
    centroid cache and replay generation pin — see
    `streaming.dedup.semantic_ingest_epoch`).

    ``funnel_sink`` (optional) receives this epoch's per-stage
    counter dict — the continuous twin of the batch assembly's
    CollectMetrics stage funnel and the reference's per-item
    success/error counters (R16-R18, `Batch Processor.py:311-330`):
    ``{"epoch", "hygiene_url_survivors", "line_rebuilt",
    "near_dup_survivors", "semantic_survivors", "survivors"}``
    (each the row count LEAVING that stage; ``semantic_survivors``
    == ``near_dup_survivors`` when no embeddings are passed).
    Cost when requested: one count job per stage over MATERIALIZED
    frames only — the near-dup and semantic survivor frames are
    localCheckpoint'ed when the funnel is on, so no stage's join
    ever executes twice for a counter (pinned by a task-count
    assertion in tests) — and skipped entirely when None, so the
    hot path is unchanged.

    Store appends happen inside; the caller owns durable output (see
    `streaming_corpus_ingest`). Replay-safe per the module docstring.

    MONOTONIC EPOCHS / ONE LINEAGE PER STATE_DIR — machine-checked
    (round 10): every membership read filters to strictly-earlier
    epochs, so the epoch ids must be monotonic within one stream
    lineage. `streaming.dedup.ingest_lineage_check` records a
    high-water epoch (and the optional ``lineage`` token — pass the
    checkpoint location) in ``state_dir``'s meta and RAISES on an
    epoch regression or a foreign lineage (a new checkpoint
    restarting at 0 over old state) instead of silently re-admitting
    every previously-seen key. Replays (epoch == high-water) pass.
    """
    from lisp_batch_processor_spark.sources.writers import (
        store_append, store_data_path)
    from lisp_batch_processor_spark.streaming.dedup import (
        ingest_lineage_check, line_dedup_ingest_epoch,
        near_dup_ingest_epoch)

    spark = batch_df.sparkSession
    p = _paths(state_dir)
    e = int(epoch_id)
    ingest_lineage_check(spark, state_dir, e, lineage)

    # -- hygiene + URL dedup ------------------------------------------
    # Within-batch winners via the SHARED rule (pipelines.corpus.
    # url_dedup_min_id — one implementation across batch and
    # streaming), then the cross-epoch anti-join below.
    from lisp_batch_processor_spark.pipelines.corpus import (
        url_dedup_min_id)
    deduped = url_dedup_min_id(batch_df, min_chars)
    if redact_kinds is not None:
        # Same placement as assemble_corpus stage 1: after winner
        # selection, before any text keying (line digests hash the
        # SCRUBBED text — seeds and epochs must agree on that).
        from lisp_batch_processor_spark.functions.redact import (
            redact_documents)
        deduped = redact_documents(deduped, kinds=redact_kinds,
                                   counts=False)
    deduped = deduped.localCheckpoint(eager=True)  # feeds 3 plans below
    in_batch = (deduped.filter(F.col("norm_url").isNotNull())
                .withColumn("_url_key", F.md5("norm_url")))
    url_dp = store_data_path(spark, p["url"])
    if url_dp is None:
        raise ValueError(f"URL store at {p['url']} has no committed "
                         "data; create it with corpus_ingest_init")
    seen = (spark.read.schema(_URL_SCHEMA).parquet(url_dp)
            .filter(F.col("epoch_id") < F.lit(e))
            .select("url_key"))
    novel = in_batch.join(seen, in_batch["_url_key"] == seen["url_key"],
                          "left_anti")
    survivors = (novel.select("doc_id", "url", "norm_url", "text")
                 .unionByName(deduped.filter(F.col("norm_url").isNull()))
                 .localCheckpoint(eager=True))  # snapshot pre-append
    store_append(novel.select(F.col("_url_key").alias("url_key"))
                 .distinct()
                 .withColumn("epoch_id", F.lit(e).cast("long")),
                 p["url"])

    # -- line dedup vs the persisted digest store ---------------------
    rebuilt = (line_dedup_ingest_epoch(
        survivors.select("doc_id", "text"), p["line"], e,
        min_repeat=line_min_repeat)
        .filter(F.length("text") > 0)
        .select("doc_id", "text"))
    staged = (rebuilt.join(survivors.select("doc_id", "url", "norm_url"),
                           "doc_id")
              .localCheckpoint(eager=True))

    # -- near-dup vs the persisted index (appends survivors' state) ---
    asg = near_dup_ingest_epoch(staged.select("doc_id", "text"),
                                p["index"], p["shingles"],
                                threshold_num=jaccard_num,
                                threshold_den=jaccard_den)
    non_dups = staged.join(asg.filter(~F.col("is_dup"))
                           .select("doc_id"), "doc_id", "left_semi")
    if funnel_sink is not None:
        # Counter WITHOUT replay: snapshot the frame once, so the
        # near-dup semi-join executes exactly as often as with the
        # funnel off (the count below and every downstream stage read
        # the snapshot) — pinned by the task-count assertion in
        # tests/test_corpus_ingest.py.
        non_dups = non_dups.localCheckpoint(eager=True)
    nd_count = non_dups.count() if funnel_sink is not None else None

    # -- semantic (embedding) dedup vs the persisted cell store --------
    # Optional stage 4b, same slot as assemble_corpus: catches
    # paraphrased/re-rendered duplicates whose shingle sets no longer
    # collide. Incremental against the seed-trained model + celled
    # survivor store; docs without an embedding pass through.
    if embeddings is not None:
        from lisp_batch_processor_spark.streaming.dedup import (
            semantic_ingest_epoch)
        batch_emb = (embeddings
                     .select(F.col("doc_id").alias("vec_id"),
                             "embedding")
                     .join(non_dups.select(
                         F.col("doc_id").alias("vec_id")),
                         "vec_id", "left_semi"))
        sem = semantic_ingest_epoch(batch_emb, state_dir,
                                    tau=semantic_tau,
                                    centroids=semantic_centroids,
                                    gen=semantic_gen,
                                    epoch=e)
        non_dups = non_dups.join(
            sem.filter(F.col("is_dup"))
               .select(F.col("vec_id").alias("doc_id")),
            "doc_id", "left_anti")
        if funnel_sink is not None:
            # Same discipline for the semantic stage's counter: the
            # anti-join runs once whether or not the funnel is on.
            non_dups = non_dups.localCheckpoint(eager=True)

    # -- Gopher repetition rules (stateless) ---------------------------
    gop = gopher_repetition_filter(non_dups,
                                   thresholds=gopher_thresholds)
    out = (non_dups.join(gop.filter("keep").select("doc_id"),
                         "doc_id", "left_semi")
           .select("doc_id", "url", "norm_url", "text")
           .localCheckpoint(eager=True))
    if funnel_sink is not None:
        funnel_sink({"epoch": e,
                     "hygiene_url_survivors": survivors.count(),
                     "line_rebuilt": staged.count(),
                     "near_dup_survivors": nd_count,
                     "semantic_survivors": (nd_count
                                            if embeddings is None
                                            else non_dups.count()),
                     "survivors": out.count()})
    return out


def corpus_ingest_compact(spark: SparkSession, state_dir: str,
                          corpus_path: str | None = None, *,
                          keep_live: int = 1,
                          target_file_bytes: int = 128 * 1024 * 1024
                          ) -> dict:
    """One maintenance pass over every persisted ingest store — the
    fold `ingest_report`'s file-count signal calls for, packaged so
    the ingest loop can self-schedule it (the `compact_every` hook
    in `streaming_corpus_ingest`, matching the sketch/CDC/SCD2
    appliers):

    - line store: `streaming.dedup.line_store_compact` — epochs
      below the ``keep_live`` newest fold to the epoch −1 base
      (counts summed), preserving the strictly-earlier replay filter;
    - URL store: the same epoch fold at membership grain — folded
      epochs' keys collapse to DISTINCT url_keys at epoch −1 (< any
      live epoch, so every later epoch's ``epoch_id < e`` filter
      still admits them and a live epoch's replay still excludes its
      own re-append);
    - near-dup index + shingle store and (when given) the corpus
      dir: `sources.writers.compact` size-targeted rewrites — their
      reads tolerate duplicate rows, so a plain rewrite preserves
      semantics while folding per-epoch file accretion;
    - semantic stores, AUTO-INCLUDED when seeded under this
      ``state_dir`` (`streaming.dedup.semantic_store_seed`):
      `streaming.dedup.semantic_store_compact` rewrites the current
      generation's vector store the same way (duplicate survivor
      vectors never move the min-id assignment).

    Every rewrite publishes through the store's own backend
    (recoverable staged swap, or the next pointer-committed version
    for a versioned store — tag ``corpus_path`` with
    `versioned_store_init` for object-store deployments, the ingest
    appends route by the tag either way). Single-writer window
    required — which the foreachBatch hook IS. Returns a dict of
    per-store results (epochs folded for the epoch-tagged stores,
    files written for the rewrites)."""
    from lisp_batch_processor_spark.sources.writers import (
        _hadoop_fs, compact, store_data_path, store_publish_rewrite)
    from lisp_batch_processor_spark.streaming.dedup import (
        line_store_compact)

    if keep_live < 1:
        raise ValueError(f"keep_live must be >= 1, got {keep_live}")
    p = _paths(state_dir)
    report: dict = {}
    report["line_epochs_folded"] = line_store_compact(
        spark, p["line"], keep_live=keep_live,
        target_file_bytes=target_file_bytes)

    # URL store: membership fold, the line store's discipline minus
    # counts (URL dedup is pure membership).
    url_root = p["url"].rstrip("/")
    dp = store_data_path(spark, url_root)
    folded_epochs = 0
    if dp is not None:
        df = spark.read.schema(_URL_SCHEMA).parquet(dp)
        # O(#distinct epochs) driver rows — bounded by the fold
        # itself: everything below the keep_live newest epochs
        # collapses to the single -1 base each pass, so the listing
        # never exceeds keep_live + epochs-since-last-compaction + 1.
        eps = sorted(r[0] for r in
                     df.select("epoch_id").distinct().collect())
        live = set(eps[-keep_live:])
        foldable = [e for e in eps if e not in live]
        if len(foldable) >= 2:
            base = (df.filter(F.col("epoch_id").isin(foldable))
                    .select("url_key").distinct()
                    .withColumn("epoch_id", F.lit(-1).cast("long")))
            folded = base.unionByName(
                df.filter(~F.col("epoch_id").isin(foldable))
                  .dropDuplicates(["url_key", "epoch_id"]))
            jvm, fs, _ = _hadoop_fs(spark, url_root)
            size = fs.getContentSummary(
                jvm.org.apache.hadoop.fs.Path(dp)).getLength()
            n_files = max(1, -(-size // target_file_bytes))
            store_publish_rewrite(spark, folded, url_root, n_files)
            folded_epochs = len(foldable)
    report["url_epochs_folded"] = folded_epochs

    report["index_files"] = compact(
        spark, p["index"], target_file_bytes=target_file_bytes)
    report["shingles_files"] = compact(
        spark, p["shingles"], target_file_bytes=target_file_bytes)
    if corpus_path is not None:
        report["corpus_files"] = compact(
            spark, corpus_path, target_file_bytes=target_file_bytes)
    if _sem_present(spark, state_dir):
        from lisp_batch_processor_spark.streaming.dedup import (
            semantic_store_compact)
        report["semantic"] = semantic_store_compact(
            spark, state_dir, target_file_bytes=target_file_bytes)
    return report


def streaming_corpus_ingest(stream_docs: DataFrame, state_dir: str,
                            corpus_path: str, *,
                            min_chars: int = 1,
                            line_min_repeat: int = 2,
                            redact_kinds=None,
                            jaccard_num: int = 7, jaccard_den: int = 10,
                            embeddings: DataFrame
                            | Callable[[SparkSession, int], DataFrame]
                            | None = None,
                            semantic_tau: float = 0.95,
                            semantic_reseed_max_cell: int | None = None,
                            semantic_reseed_target_cell: int
                            | None = None,
                            semantic_reseed_iters: int = 1,
                            gopher_thresholds: dict | None = None,
                            compact_every: int | None = None,
                            compact_target_bytes: int
                            = 128 * 1024 * 1024,
                            sink: Callable[[DataFrame, int], None]
                            | None = None,
                            lineage: str | None = None,
                            funnel_sink: Callable[[dict], None]
                            | None = None):
    """foreachBatch wrapper: run `corpus_ingest_epoch` per micro-batch
    and append the survivors EPOCH-TAGGED to ``corpus_path`` (read
    back with `corpus_read`). Returns the DataStreamWriter — caller
    starts it with a checkpointLocation. ``sink(out, epoch_id)``, if
    given, additionally receives each epoch's survivor frame.

    ``embeddings`` composes the SEMANTIC axis into the same loop (no
    second, separately-stateful stream): a doc_id-keyed side frame —
    static, or a ``callable(spark, epoch_id)`` for sources that grow
    with the stream — whose vectors drive `corpus_ingest_epoch`'s
    stage 4b against `semantic_store_seed` stores under this
    ``state_dir``. The ingested corpus then satisfies the
    ingest ≡ assembly composition contract INCLUDING the semantic
    stage (assemble_corpus's 4b over it is a no-op pass). The
    centroid model is cached per GENERATION (one driver collect per
    generation, not per epoch), and ``semantic_reseed_max_cell``
    closes the drift loop exactly as in
    `streaming.dedup.streaming_semantic_ingest`: when the O(k)
    occupancy signal (`semantic_cell_occupancy_fast` over the
    per-epoch cell-count ledger; full-scan fallback for adopted
    pre-r10 state) exceeds it after an epoch's appends,
    `streaming.dedup.semantic_reseed` commits a new generation
    tagged with the epoch id — a checkpoint replay of that epoch
    reuses the generation AND pins its semantic stage back to the
    previous generation's model for byte-identical output.

    ``lineage`` (pass the checkpoint location) strengthens the
    machine-checked monotonic-epoch / one-lineage contract
    (`corpus_ingest_epoch`): with it, a DIFFERENT stream resuming at
    a higher epoch over this state_dir raises too, not just an
    epoch regression. Prefer `start_corpus_ingest`, which threads ONE
    ``checkpoint_dir`` into both this token and the
    ``checkpointLocation`` option so the strong contract is the
    default rather than a remembered kwarg.

    ``funnel_sink`` receives each epoch's per-stage counter dict
    (see `corpus_ingest_epoch` — the reference's R16-R18 per-item
    counters, continuous): wire it to your metrics system for a
    live ingest funnel; costs one snapshot + count job per stage per
    epoch only when set — never a recomputation of the stage's join
    (see `corpus_ingest_epoch`).

    ``compact_every=N`` runs :func:`corpus_ingest_compact` after
    every Nth epoch — inside foreachBatch IS the single-writer
    maintenance window the folds require (the same self-scheduling
    hook as the sketch/CDC/SCD2 appliers), so file counts across all
    stores — the semantic pair included, when seeded — stay bounded
    over stream lifetime with no external scheduler. Replay-safe:
    the folds preserve the strictly-earlier membership/count
    semantics (epoch −1 base), so a replayed epoch recomputes
    identical output whether it lands before or after a compaction;
    a replay that re-compacts performs a no-op-shaped rewrite at
    worst."""
    from lisp_batch_processor_spark.sources.writers import store_append

    if compact_every is not None and compact_every < 1:
        raise ValueError(f"compact_every must be >= 1, "
                         f"got {compact_every}")
    if (semantic_reseed_max_cell is not None
            and semantic_reseed_max_cell < 1):
        raise ValueError(f"semantic_reseed_max_cell must be >= 1, "
                         f"got {semantic_reseed_max_cell}")

    sem_cache: dict = {"gen": None, "cents": None}

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        emb = (embeddings(spark, int(epoch_id))
               if callable(embeddings) else embeddings)
        use_gen = None
        replayed_trigger = False
        if emb is not None:
            from lisp_batch_processor_spark.streaming.dedup import (
                _sem_epoch_model)
            use_gen, _, replayed_trigger = _sem_epoch_model(
                spark, state_dir, int(epoch_id), sem_cache)
        out = corpus_ingest_epoch(
            batch_df, state_dir, epoch_id, min_chars=min_chars,
            line_min_repeat=line_min_repeat,
            redact_kinds=redact_kinds,
            jaccard_num=jaccard_num, jaccard_den=jaccard_den,
            embeddings=emb, semantic_tau=semantic_tau,
            semantic_centroids=sem_cache["cents"]
            if emb is not None else None,
            semantic_gen=use_gen,
            gopher_thresholds=gopher_thresholds,
            lineage=lineage,
            funnel_sink=funnel_sink)
        store_append(out.withColumn("epoch_id",
                                    F.lit(int(epoch_id)).cast("long")),
                     corpus_path)
        if sink is not None:
            sink(out, int(epoch_id))
        if compact_every and (int(epoch_id) + 1) % compact_every == 0:
            corpus_ingest_compact(
                spark, state_dir, corpus_path,
                target_file_bytes=compact_target_bytes)
        if (emb is not None and semantic_reseed_max_cell is not None
                and not replayed_trigger):
            from lisp_batch_processor_spark.streaming.dedup import (
                _sem_reseed_if_due)
            _sem_reseed_if_due(spark, state_dir, int(epoch_id),
                               semantic_reseed_max_cell,
                               semantic_reseed_target_cell,
                               semantic_reseed_iters)

    return stream_docs.writeStream.foreachBatch(_process)


def start_corpus_ingest(stream_docs: DataFrame, state_dir: str,
                        corpus_path: str, checkpoint_dir: str, *,
                        query_name: str | None = None,
                        trigger: dict | None = None,
                        **knobs):
    """THE documented way to start the composed ingest loop — the
    strong form of the monotonic-epoch / one-lineage contract, by
    default instead of by remembered kwarg: ``checkpoint_dir`` is
    threaded into BOTH the stream's ``checkpointLocation`` option and
    the contract's ``lineage`` token, so a SECOND stream resuming
    over this ``state_dir`` from a DIFFERENT checkpoint raises even
    when its epoch ids happen to be higher (with only the epoch check,
    that case passes silently — `streaming_corpus_ingest` returns a
    DataStreamWriter and cannot see the checkpointLocation the caller
    sets later, which is why the one-value threading lives here).

    ``**knobs`` pass through to `streaming_corpus_ingest` unchanged
    (``embeddings``, ``semantic_reseed_max_cell``, ``compact_every``,
    ``funnel_sink``, ``sink``, ...); ``trigger`` (e.g.
    ``{"availableNow": True}`` or ``{"processingTime": "10 seconds"}``)
    and ``query_name`` forward to the writer. Returns the STARTED
    `StreamingQuery`.

    Prefer this over hand-wiring the writer; the raw wrapper stays
    public for callers composing their own writer options, who then
    own passing ``lineage=`` themselves (the weaker, epoch-only
    contract otherwise). Delegates to the loop-agnostic
    `streaming.dedup.start_ingest_stream` — the same one-value
    threading serves the standalone line/semantic twins."""
    from lisp_batch_processor_spark.streaming.dedup import (
        start_ingest_stream)
    if "lineage" in knobs:
        raise ValueError(
            "start_corpus_ingest derives lineage from checkpoint_dir "
            "(that is its point); do not pass lineage separately — "
            "use streaming_corpus_ingest directly to decouple them")
    return start_ingest_stream(
        streaming_corpus_ingest, stream_docs, state_dir, corpus_path,
        checkpoint_dir=checkpoint_dir, query_name=query_name,
        trigger=trigger, **knobs)


def corpus_read(spark: SparkSession, corpus_path: str) -> DataFrame:
    """The ingested corpus: every epoch's survivors, with replay
    duplicates collapsed (a replayed epoch re-appends identical rows;
    doc_id is unique across epochs by the dedup itself)."""
    from lisp_batch_processor_spark.sources.writers import store_data_path
    dp = store_data_path(spark, corpus_path.rstrip("/"))
    if dp is None:
        raise ValueError(f"no committed corpus at {corpus_path}")
    return (spark.read.parquet(dp)
            .dropDuplicates(["doc_id"])
            .drop("epoch_id"))


def corpus_ingest_batch(docs: DataFrame, *,
                        min_chars: int = 1,
                        line_min_repeat: int = 2,
                        redact_kinds=None,
                        jaccard_num: int = 7, jaccard_den: int = 10,
                        embeddings: DataFrame | None = None,
                        semantic_tau: float = 0.95,
                        semantic_centroids: list[list[float]]
                        | None = None,
                        gopher_thresholds: dict | None = None
                        ) -> DataFrame:
    """The batch reference the streaming ingest is pinned against:
    the same stages in the same order over the full corpus at once —
    hygiene, min-id URL dedup, corpus-wide line dedup (the PREFIX
    policy, which at the default min_repeat=2 IS the winner
    semantics), full MinHash+LSH near-dup with min-id
    representatives, optional semantic dedup, Gopher rules. With
    ingest-ordered ids the epoch concatenation equals this exactly.
    For the semantic stage the pin needs the SAME fixed cell model
    the epochs used: pass ``semantic_centroids`` =
    `streaming.dedup.semantic_read_centroids` of the ingest
    state_dir, and include the seed docs (+ their ``embeddings``
    rows) in ``docs`` exactly as for the other stores."""
    from lisp_batch_processor_spark.operators.dedup import (
        assignment, line_dedup, lsh_candidate_pairs, minhash_signatures,
        verify_jaccard)
    from lisp_batch_processor_spark.pipelines.corpus import (
        url_dedup_min_id)

    url_deduped = url_dedup_min_id(docs, min_chars)
    if redact_kinds is not None:
        from lisp_batch_processor_spark.functions.redact import (
            redact_documents)
        url_deduped = redact_documents(url_deduped, kinds=redact_kinds,
                                       counts=False)
    ld = (line_dedup(url_deduped.select("doc_id", "text"),
                     min_repeat=line_min_repeat, policy="prefix")
          .filter(F.length("text") > 0)
          .select("doc_id", "text")
          .join(url_deduped.select("doc_id", "url", "norm_url"),
                "doc_id"))
    s = ld.select("doc_id", "text")
    pairs = lsh_candidate_pairs(minhash_signatures(s))
    confirmed = verify_jaccard(s, pairs).filter(
        F.col("inter") * jaccard_den >= F.col("uni") * jaccard_num)
    asg = assignment(s.select("doc_id"), "doc_id",
                     confirmed, "doc_a", "doc_b")
    non_dups = ld.join(asg.filter(~F.col("is_dup")).select("doc_id"),
                       "doc_id", "left_semi")
    if embeddings is not None:
        from lisp_batch_processor_spark.operators.dedup import (
            semantic_dedup)
        emb = (embeddings.select("doc_id", "embedding")
               .join(non_dups.select("doc_id"), "doc_id", "left_semi"))
        sem = semantic_dedup(emb, tau=semantic_tau, id_col="doc_id",
                             centroids=semantic_centroids)
        non_dups = non_dups.join(
            sem.filter(F.col("is_dup")).select("doc_id"),
            "doc_id", "left_anti")
    gop = gopher_repetition_filter(non_dups,
                                   thresholds=gopher_thresholds)
    return (non_dups.join(gop.filter("keep").select("doc_id"),
                          "doc_id", "left_semi")
            .select("doc_id", "url", "norm_url", "text"))


def ingest_report(spark: SparkSession, state_dir: str,
                  corpus_path: str | None = None) -> dict:
    """Observability over the persisted ingest state — the streaming
    side's counterpart to `pipelines.report.corpus_report`: per store
    (URL keys, line digests, near-dup index, shingle sets, the
    SEMANTIC pair when seeded under ``state_dir`` — current
    generation's centroid + vector stores, auto-included — and the
    corpus dir when given) its committed row count, epoch span
    (epoch-tagged stores; −1 rows are migrated seed state), parquet
    FILE count — the number that tells the single-writer maintenance
    window when `line_store_compact` / `sources.writers.compact` is
    due — its backend (with the committed version count for
    versioned stores), and, on swap stores, any LIVE writer lease
    (between epochs that means a maintenance writer crashed less
    than a TTL ago; maintenance inside the loop always releases).
    With semantic stores present the report also carries
    ``sem_cells`` = `streaming.dedup.semantic_cell_occupancy`
    (generation, k, survivors, max/mean vectors per cell — the
    reseed-due signal, one bounded k-row aggregate).

    Every number is a bounded aggregate (counts, min/max) or a
    driver-side file listing; nothing row-sized is collected. Reads
    only committed state (`store_data_path` resolves versioned
    pointers and repairs crashed swaps), so it is safe to run between
    epochs; like every store read, do not race a live writer's
    apply/compact on the swap backend."""
    from lisp_batch_processor_spark.sources.writers import (
        _hadoop_fs, store_data_path)

    def _n_files(path: str) -> int:
        jvm, fs, _ = _hadoop_fs(spark, path)
        it = fs.listFiles(jvm.org.apache.hadoop.fs.Path(path), True)
        n = 0
        while it.hasNext():
            if it.next().getPath().getName().endswith(".parquet"):
                n += 1
        return n

    from lisp_batch_processor_spark.sources.writers import (
        _versions, lease_holder, store_is_versioned)

    report: dict = {}
    targets = dict(_paths(state_dir))
    # The recorded stream identity (round 10's machine-checked
    # monotonic-epoch / one-lineage contract): high-water epoch and,
    # when the stream passed one, its lineage token — the first
    # thing to look at when an ingest raises the lineage error.
    from lisp_batch_processor_spark.sources.writers import (
        read_json_file)
    from lisp_batch_processor_spark.streaming.dedup import (
        _ingest_lineage_path)
    lin = read_json_file(spark, _ingest_lineage_path(state_dir),
                         default=None, absent=None)
    if isinstance(lin, dict):
        report["lineage"] = lin
    if corpus_path is not None:
        targets["corpus"] = corpus_path
    if _sem_present(spark, state_dir):
        from lisp_batch_processor_spark.streaming.dedup import (
            _sem_counts_data_path, _sem_counts_path,
            semantic_cell_occupancy, semantic_current_gen,
            semantic_store_roots)
        cent_path, vec_path = semantic_store_roots(spark, state_dir)
        targets["sem_centroids"] = cent_path
        targets["sem_vectors"] = vec_path
        # The report's occupancy stays the EXACT full-scan signal —
        # it is on-demand observability, and disagreement with the
        # per-epoch ledger signal would itself be worth seeing.
        report["sem_cells"] = semantic_cell_occupancy(spark, state_dir)
        gen = semantic_current_gen(spark, state_dir)["gen"]
        if _sem_counts_data_path(spark, state_dir, gen) is not None:
            targets["sem_cellcounts"] = _sem_counts_path(
                state_dir, gen)
            report["sem_occupancy_path"] = "ledger"
        else:
            # An adopted pre-ledger dir: the per-epoch reseed trigger
            # pays a full survivor scan (measured growing 2.5x across
            # the SCALE_SEMANTIC_r11 survivor decades) until
            # `streaming.dedup.semantic_counts_seed` backfills the
            # baseline or the first reseed writes one — worth a
            # glance in any report.
            report["sem_occupancy_path"] = "full_scan"
    for name, root in targets.items():
        r_ = root.rstrip("/")
        versioned = store_is_versioned(spark, r_)
        backend_entry: dict = {"backend":
                               "versioned" if versioned else "swap"}
        if versioned:
            jvm, fs, _ = _hadoop_fs(spark, r_)
            backend_entry["versions"] = len(
                _versions(fs, jvm, r_, pointed_only=True))
        else:
            holder = lease_holder(spark, r_)
            if holder is not None:
                # A live lease between epochs means a writer crashed
                # mid-maintenance less than a TTL ago (the loop's own
                # maintenance always releases) — worth surfacing.
                backend_entry["lease_holder"] = holder
        dp = store_data_path(spark, r_)
        if dp is None:
            report[name] = {"rows": 0, "files": 0, **backend_entry}
            continue
        df = spark.read.parquet(dp)
        aggs = [F.count("*").alias("rows")]
        if "epoch_id" in df.columns:
            aggs += [F.min("epoch_id").alias("e0"),
                     F.max("epoch_id").alias("e1"),
                     F.count_distinct("epoch_id").alias("ne")]
        r = df.agg(*aggs).first()
        entry = {"rows": int(r["rows"]), "files": _n_files(dp),
                 **backend_entry}
        if "epoch_id" in df.columns and r["ne"]:
            entry["epochs"] = {"min": int(r["e0"]), "max": int(r["e1"]),
                               "distinct": int(r["ne"])}
        report[name] = entry
    return report
