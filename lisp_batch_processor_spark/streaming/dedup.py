"""Streaming dedup — the reference's dedup-on-insert (R4/R6,
`Batch Processor.py:231, 240`) as an incremental operator.

Batch dedup keeps all keys forever; a stream can't. Two honest
variants:

- `dedup_within_watermark`: drops duplicate event_ids whose
  duplicates arrive within the watermark horizon — state is evicted
  once the watermark passes, so memory is bounded by (arrival rate x
  watermark), the standard at-least-once -> effectively-once fix.
- `dedup_exact_unbounded`: exact forever-dedup via dropDuplicates on
  a keyed stream — state grows with distinct keys; only for bounded
  key domains (documented trade-off, same as any engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_within_watermark(events: DataFrame,
                           watermark: str = "1 hour") -> DataFrame:
    """Keep the first arrival of each event_id; suppress duplicates
    arriving within the watermark horizon. State for an id is evicted
    once the watermark passes its event time."""
    return (events.withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["event_id"]))


def dedup_exact_unbounded(events: DataFrame) -> DataFrame:
    """Exact streaming dedup on event_id with unbounded state —
    correct for key domains that fit in the state store."""
    return events.dropDuplicates(["event_id"])


def streaming_near_dup_ingest(stream_docs: DataFrame, index_path: str,
                              store_path: str, sink,
                              threshold_num: int = 7,
                              threshold_den: int = 10):
    """Streaming ingest with ever-growing near-dup suppression — the
    streaming twin of `operators.dedup.incremental_near_dups`, and
    the reference's dedup-on-insert (R4/R6) generalized from exact
    path-string dedup to MinHash near-dup at corpus scale.

    Each micro-batch of (doc_id, text) is assigned against the
    PERSISTED corpus stores (banded-signature index at `index_path`,
    shingle verify store at `store_path` — `banded_signatures` /
    `shingle_store` parquet, seeded from the initial corpus), then
    the batch's survivors append their own signatures + shingle sets
    to both stores, so later micro-batches also dedup against every
    earlier survivor. `sink(assignment_df, epoch_id)` receives each
    epoch's (doc_id, rep_id, is_dup) rows.

    Why foreachBatch and not a pure stream-static plan: the per-doc
    min-neighbor reduction would be an unbounded-state streaming
    aggregation, and the store append is a batch write — exactly the
    two things Structured Streaming's foreachBatch escape hatch is
    for. The per-epoch work item is the batch operator itself, so
    batch and streaming can't drift.

    Ordering inside the epoch matters: the epoch's assignment is
    eagerly materialized BEFORE the appends run — both read the
    stores lazily, so appending first would let a doc match its own
    just-appended signature. Returns the DataStreamWriter (caller
    picks trigger/start); use a checkpointLocation for exactly-once
    epoch replay — reprocessing an epoch re-appends its survivors,
    which the min-id assignment tolerates (duplicate index rows
    produce the same candidates).

    No epoch/lineage pin here, deliberately (contrast the line
    store's `_line_check_meta` and `ingest_lineage_check`): these
    stores are UNTAGGED and self-pair-tolerant, so even the
    restarted-checkpoint operator error is benign — re-ingested docs
    meet their own stored signatures as self-pairs (rep = self, not
    dup) and new docs still dedup against everything stored; nothing
    is silently re-admitted or dropped.
    """
    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        out = near_dup_ingest_epoch(batch_df, index_path, store_path,
                                    threshold_num=threshold_num,
                                    threshold_den=threshold_den)
        sink(out, epoch_id)

    return stream_docs.writeStream.foreachBatch(_process)


def near_dup_ingest_epoch(batch_df: DataFrame, index_path: str,
                          store_path: str, threshold_num: int = 7,
                          threshold_den: int = 10) -> DataFrame:
    """One epoch of incremental near-dup ingest against the persisted
    stores: assign the batch (eagerly materialized), then append the
    survivors' signatures + shingle sets. The per-epoch work item of
    `streaming_near_dup_ingest`, exposed for direct use and for the
    replay pin.

    REPLAY-SAFE WITHOUT epoch tags (unlike the line store — contrast
    line_dedup_ingest_epoch): a replay that runs after its own append
    finds each batch doc's own signature in the index, producing only
    (a) self-pairs, which assignment resolves to rep = self exactly
    as a no-neighbor doc resolves, and (b) duplicate index/store
    rows, which change candidate multiplicity but never the min-id
    assignment. Pinned by
    tests/test_streaming_dedup.py::test_near_dup_epoch_replay.
    """
    from pyspark.sql import functions as F

    from lisp_batch_processor_spark.operators.dedup import (
        banded_signatures, incremental_near_dups, minhash_signatures,
        shingle_store)

    spark = batch_df.sparkSession
    batch = batch_df.localCheckpoint(eager=True)
    # Resolve both stores through their backend: a swap store gets a
    # crashed `sources.writers.compact` repaired first (both are safe
    # to compact from the maintenance window: duplicate rows are
    # tolerated per this docstring, so a plain size-targeted rewrite
    # preserves semantics); a versioned store resolves its pointer.
    from lisp_batch_processor_spark.sources.writers import (
        store_data_path)
    idx_dp = store_data_path(spark, index_path.rstrip("/"))
    st_dp = store_data_path(spark, store_path.rstrip("/"))
    if idx_dp is None or st_dp is None:
        raise ValueError("near-dup stores have no committed data "
                         f"(index={index_path}, store={store_path}); "
                         "seed them from the initial corpus first")
    idx = spark.read.parquet(idx_dp)
    store = spark.read.parquet(st_dp)
    out = (incremental_near_dups(None, batch,
                                 corpus_index=idx,
                                 verify_store=store,
                                 threshold_num=threshold_num,
                                 threshold_den=threshold_den)
           .localCheckpoint(eager=True))  # snapshot pre-append
    survivors = (batch.join(out.filter(~F.col("is_dup"))
                            .select("doc_id"), "doc_id")
                 .localCheckpoint(eager=True))
    from lisp_batch_processor_spark.sources.writers import store_append
    store_append(banded_signatures(minhash_signatures(survivors)),
                 index_path)
    store_append(shingle_store(survivors), store_path)
    return out


def line_digest_keys(docs: DataFrame, text_col: str = "text",
                     delim: str = "\n",
                     line_min_chars: int = 1,
                     counts: bool = False) -> DataFrame:
    """The line store's digest keying, as ONE definition: split on
    the re-escaped delimiter, md5 every line of >= ``line_min_chars``
    chars (shorter lines are exempt from keying — same exemption as
    `line_dedup_ingest_epoch`'s inline construction, which this must
    stay in lockstep with). Returns distinct (line_key) rows — or,
    with ``counts=True``, (line_key, n) carrying each line's
    occurrence count across ``docs`` — the shapes seed migrations
    (`pipelines.ingest.corpus_ingest_seed`) append at epoch −1
    (counts make a seeded store exact for ``min_repeat > 2``
    ingest, not just the membership lower bound)."""
    import re as _re

    from pyspark.sql import functions as F

    lines = docs.select(
        F.explode(F.split(F.col(text_col), _re.escape(delim), -1))
        .alias("_l"))
    keyed = (lines.filter(F.length("_l") >= line_min_chars)
             .select(F.md5("_l").alias("line_key")))
    if counts:
        return keyed.groupBy("line_key").agg(
            F.count(F.lit(1)).cast("long").alias("n"))
    return keyed.distinct()


# ---------------------------------------------------------------------------
# Monotonic-epoch / one-lineage-per-state contract — MACHINE-CHECKED.
#
# Every epoch-tagged store here (line store, URL store, the semantic
# generation marker's epoch tag) assumes epochs are MONOTONIC within
# one stream lineage: membership/count reads filter to strictly-
# earlier epochs, and the reseed marker's replayed-trigger detection
# compares raw epoch ids. A NEW checkpoint restarting at epoch 0 over
# an OLD state dir silently violates both — epoch 0's
# ``epoch_id < 0`` filter excludes the entire prior lineage (seen
# keys re-admit), and its id can collide with the old lineage's
# reseed tag. What round 9 did for the line store's min_repeat
# (a meta pin that raises on mismatch) round 10 does for this
# contract: a lineage token + high-water epoch recorded in meta,
# with an epoch REGRESSION or a FOREIGN lineage raising instead of
# silently corrupting membership semantics.
# ---------------------------------------------------------------------------


def _check_epoch_lineage(meta: dict, epoch_id: int,
                         lineage: str | None, what: str) -> bool:
    """The shared pure-dict rule body — ONE implementation, in
    `sources.writers` (the sketch stores' store-scoped
    `check_store_epoch_lineage` enforces the same contract there)."""
    from lisp_batch_processor_spark.sources.writers import (
        _check_epoch_lineage as impl)
    return impl(meta, epoch_id, lineage, what)


def _ingest_lineage_path(state_dir: str) -> str:
    return f"{state_dir.rstrip('/')}/_ingest_lineage.json"


def ingest_lineage_check(spark, state_dir: str, epoch_id: int,
                         lineage: str | None = None) -> None:
    """The state_dir-scoped contract check (one meta file shared by
    every store under ``state_dir`` — they all ride the SAME stream):
    record/advance the high-water epoch and optional lineage token
    (pass the checkpoint location), raising on regression or a
    foreign token per `_check_epoch_lineage`. One tiny JSON get per
    epoch plus one PUT per PROGRESSING epoch (replays re-read only).
    A torn meta (crash mid-PUT) reads as absent and re-records —
    fail-open, like the min_repeat meta: the contract's target is
    the operator error (restarted checkpoint over live state), where
    the meta is intact."""
    from lisp_batch_processor_spark.sources.writers import (
        read_json_file, write_json_file)
    mp = _ingest_lineage_path(state_dir)
    meta = read_json_file(spark, mp, default=None, absent=None)
    if not isinstance(meta, dict):
        meta = {}
    if _check_epoch_lineage(meta, epoch_id, lineage,
                            f"ingest state at {state_dir}"):
        write_json_file(spark, mp, meta)


def ingest_lineage_reset(spark, state_dir: str) -> None:
    """Forget the recorded lineage/high-water — what a SEED does:
    seeding declares a fresh lineage over a fresh state dir
    (`semantic_store_seed` calls this for STANDALONE semantic dirs
    only — over a state_dir shared with URL/line/near-dup stores the
    one meta guards every store riding the stream, and a semantic
    (re)seed must not erase the pin for stores it does not clear;
    `corpus_ingest_init` deliberately never calls it — re-init over
    a live state_dir must not weaken the guard, and the fresh-dir
    path has no meta to reset: it lives inside the state_dir), so
    the first stream over the seeded state records cleanly. To
    restart a SHARED state_dir wholesale, clear every store and call
    this explicitly."""
    from lisp_batch_processor_spark.sources.writers import _hadoop_fs
    jvm, fs, _ = _hadoop_fs(spark, state_dir)
    fs.delete(jvm.org.apache.hadoop.fs.Path(
        _ingest_lineage_path(state_dir)), False)


def _lineage_token(checkpoint_dir: str) -> str:
    """Normalize a checkpoint location into the lineage token
    `start_ingest_stream` records, so the SAME physical checkpoint
    respelled across restarts — trailing slash, ``file://`` URI,
    relative vs absolute local path — does not read as a foreign
    lineage and fail a legitimate resume (Spark resolves all those
    spellings to one checkpointLocation; the recorded token must
    too). Local/file paths normalize to an absolute POSIX path;
    other schemes (hdfs://, s3a://, ...) keep their ORIGINAL URI
    minus any trailing slash. Scheme aliases (s3/s3a/s3n, gs/gcs)
    are deliberately NOT rewritten here (round 13, ADVICE — reverting
    half of round 12): `_lineage_canon` already applies the alias map
    at COMPARISON time on both sides, so a respelled resume matches
    either way, and recording the original spelling keeps the token a
    PROBEABLE path — typical Hadoop deployments mount s3a:// but not
    s3://, so a generation-side rewrite made
    `_counts_seed_probe_checkpoint` throw on the recorded token and
    silently skip the uncommitted-epoch crash-window check for
    exactly the object-store checkpoints it matters most for.

    A RELATIVE local path additionally warns: it resolves against the
    driver's cwd here, but Spark resolves a schemeless
    checkpointLocation against the Hadoop default FS (not local on
    real clusters), and a restart from a different cwd tokenizes to a
    different — falsely foreign — lineage. Fails safe (raise, never
    silent pass), but pass absolute or fully-qualified checkpoint
    URIs to avoid the confusing refusal."""
    import os as _os
    from urllib.parse import urlparse

    s = str(checkpoint_dir).rstrip("/") or "/"
    u = urlparse(s)
    if u.scheme in ("", "file"):
        p = u.path if u.scheme == "file" else s
        if not _os.path.isabs(p):
            import warnings
            warnings.warn(
                f"relative checkpoint path {checkpoint_dir!r} tokenizes "
                "against the driver cwd — a restart from another cwd "
                "(or a cluster whose default FS is not local) reads as "
                "a foreign lineage and refuses a legitimate resume; "
                "pass an absolute or fully-qualified checkpoint URI",
                stacklevel=2)
        return _os.path.abspath(p)
    return s


def start_ingest_stream(writer_fn, *args, checkpoint_dir: str,
                        query_name: str | None = None,
                        trigger: dict | None = None, **knobs):
    """Start ANY lineage-bearing streaming ingest loop with the
    STRONG monotonic-epoch / one-lineage contract by default: ONE
    ``checkpoint_dir`` is threaded into both the wrapper's
    ``lineage=`` token and the writer's ``checkpointLocation``
    option, so a second stream resuming over the same persisted
    state from a foreign checkpoint raises even when its epoch ids
    do not regress — the case the epoch-only check passes silently
    (a fresh checkpoint restarting at an epoch equal to the recorded
    high-water looks exactly like a replay).

    ``writer_fn(*args, lineage=..., **knobs)`` must return a
    `DataStreamWriter` — `streaming_line_dedup_ingest` and
    `streaming_semantic_ingest` here, and
    `pipelines.ingest.streaming_corpus_ingest` (whose
    `start_corpus_ingest` convenience delegates to this) all
    qualify. ``trigger`` (e.g. ``{"availableNow": True}``) and
    ``query_name`` forward to the writer. Returns the STARTED
    `StreamingQuery`. The raw wrappers stay public for callers
    composing their own writer options, who then own ``lineage=``
    themselves (the weaker, epoch-only contract otherwise)."""
    if "lineage" in knobs:
        raise ValueError(
            "start_ingest_stream derives lineage from checkpoint_dir "
            "(that is its point); do not pass lineage separately — "
            "call the wrapper directly to decouple them")
    writer = writer_fn(*args, lineage=_lineage_token(checkpoint_dir),
                       **knobs)
    writer = writer.option("checkpointLocation", str(checkpoint_dir))
    if query_name is not None:
        writer = writer.queryName(query_name)
    if trigger is not None:
        writer = writer.trigger(**trigger)
    return writer.start()


_LINE_SCHEMA = "line_key string, epoch_id long, n long"


def _line_meta_path(line_store_path: str) -> str:
    from lisp_batch_processor_spark.sources.writers import (
        _hidden_sibling)
    return _hidden_sibling(line_store_path, "meta")


def _line_check_meta(spark, line_store_path: str, min_repeat: int,
                     epoch_id: int, lineage: str | None = None) -> None:
    """Machine-check BOTH per-store contracts in one meta read/write:

    ONE min_repeat per store: counts stop accruing at saturation
    (``prior >= min_repeat - 1``), so a store built at k silently
    UNDERCOUNTS for any k' > k — what used to be a docstring warning
    is now an error. The store's ``min_repeat`` is recorded in a
    hidden-sibling meta file at first use (or at `line_store_init`
    when passed there); every later epoch must match.

    MONOTONIC EPOCHS / ONE LINEAGE (round 10, same pin): the meta
    also carries the high-water epoch and an optional lineage token
    — an epoch regression or a foreign lineage raises per
    `_check_epoch_lineage` instead of silently re-admitting every
    previously-seen line (the ``epoch_id < e`` membership filter
    over a restarted-at-0 stream sees only seed rows).

    A torn meta file (crash mid-PUT) reads as absent and re-records
    — the recording epoch's own semantics are unaffected either way.

    ADOPTION caveat: a pre-meta store (built before this check
    existed) that already ran stream epochs is adopted at THIS
    epoch's threshold — its historical counts saturated at whatever
    threshold wrote them, which is unknowable now, so continuation
    at a DIFFERENT k than the store's past silently undercounts for
    the historical keys exactly as before. The meta records
    ``adopted_with_history: true`` for such stores so the adoption
    is auditable; raising instead would break the legitimate
    same-k upgrade path. Stores needing a threshold change should
    be rebuilt (re-seeded) either way. The high-water epoch adopts
    at this epoch for the same reason.

    STALE-META ADOPTION (round 11, the sketch stores' rule): the
    meta sidecar lives OUTSIDE the store dir and survives store
    deletion, so a violation against a store with NO committed rows
    is phantom history from a deleted store, not a live-store
    hazard — the meta resets and this epoch adopts as fresh (the
    row probe is paid only on the would-raise path; steady state
    stays one JSON get). For a THRESHOLD conflict the adoption
    additionally requires recorded epoch history
    (``high_water_epoch``): a rowless meta WITHOUT it is a
    deliberate `line_store_init(min_repeat=)` pin on a
    not-yet-written store, which must keep raising — only init
    itself may re-pin an empty store."""
    from pyspark.sql import functions as F

    from lisp_batch_processor_spark.sources.writers import (
        read_json_file, write_json_file)
    mp = _line_meta_path(line_store_path)
    meta = read_json_file(spark, mp, default=None, absent=None)
    changed = False

    def _rowless() -> bool:
        return not _line_store_has_rows(spark, line_store_path)

    if (isinstance(meta, dict) and "min_repeat" in meta
            and int(meta["min_repeat"]) != int(min_repeat)
            and "high_water_epoch" in meta and _rowless()):
        # Threshold pin from a (presumed) deleted store: adopt the new
        # threshold — nothing was counted under the old one — but KEEP
        # the lineage/high-water pin (round 12, ADVICE): a LIVE store
        # that has only processed empty batches is also rowless with a
        # recorded high_water, and dropping its pin here would let a
        # restarted-at-0 foreign checkpoint slip under the guard. If
        # the pin really is phantom (deleted store), the epoch/lineage
        # check below raises and ITS rowless adoption clears it.
        meta = {k: meta[k] for k in ("lineage", "high_water_epoch")
                if k in meta}
        changed = True
    if not isinstance(meta, dict) or "min_repeat" not in meta:
        meta = meta if isinstance(meta, dict) else {}
        meta["min_repeat"] = int(min_repeat)
        changed = True
        try:
            dp = _line_store_data_path(spark, line_store_path)
            if spark.read.schema(_LINE_SCHEMA).parquet(dp) \
                    .filter(F.col("epoch_id") >= 0).head(1):
                meta["adopted_with_history"] = True
        except ValueError:
            pass  # store not committed yet: truly fresh
    elif int(meta["min_repeat"]) != int(min_repeat):
        raise ValueError(
            f"line store at {line_store_path} was built with "
            f"min_repeat={int(meta['min_repeat'])} but this epoch "
            f"passed min_repeat={min_repeat}: occurrence counts "
            "saturate at the threshold they were recorded under, so "
            "mixing thresholds silently undercounts — use one "
            "min_repeat per store (seed a new store to change it)")
    try:
        changed |= _check_epoch_lineage(
            meta, epoch_id, lineage, f"line store at {line_store_path}")
    except ValueError:
        if not _rowless():
            raise
        keep = {"min_repeat": meta["min_repeat"]}
        meta = keep   # phantom epoch/lineage pin: adopt fresh
        _check_epoch_lineage(meta, epoch_id, lineage,
                             f"line store at {line_store_path}")
        changed = True
    if changed:
        write_json_file(spark, mp, meta)


def _line_store_has_rows(spark, line_store_path: str) -> bool:
    """Whether any committed row backs the line store's meta pin —
    the 'is this pin guarding anything real' probe behind the
    stale-meta adoption above (a deleted store's surviving sidecar
    must not brick the rebuild)."""
    try:
        dp = _line_store_data_path(spark, line_store_path)
    except ValueError:
        return False
    from pyspark.errors import AnalysisException
    try:
        return bool(spark.read.schema(_LINE_SCHEMA).parquet(dp)
                    .head(1))
    except AnalysisException:
        return False


def line_store_init(spark, line_store_path: str,
                    backend: str = "swap",
                    min_repeat: int | None = None) -> None:
    """Create an empty epoch-tagged line-digest store — the persisted
    state `streaming_line_dedup_ingest` and `line_dedup_ingest_epoch`
    maintain: (line_key, epoch_id, n) where ``n`` is the line's
    occurrence count recorded by that epoch (rows written before
    round 8 — and seed rows — lack the column and read as n=1, a
    documented membership lower bound). Seed corpus digests may be
    appended afterwards with any ``epoch_id < 0``, to a FRESH store
    only (folded base rows and seed rows share the −1 tag; the
    compaction fold assumes at most one of them per key).
    ``backend="versioned"`` publishes through pointer-committed
    version dirs instead of the root + staged swap (`sources.writers`
    store backends) — the object-store-safe mode; all
    ingest/compact/read semantics are identical.

    ``min_repeat`` (optional) pins the store's threshold up front —
    otherwise the first `line_dedup_ingest_epoch` records the one it
    was called with; either way, later epochs at a DIFFERENT
    min_repeat raise instead of silently undercounting (counts
    saturate at the recorded threshold)."""
    from lisp_batch_processor_spark.sources.writers import (
        store_append, versioned_store_init)

    if backend not in ("swap", "versioned"):
        raise ValueError(f"backend must be 'swap' or 'versioned', "
                         f"got {backend!r}")
    if backend == "versioned":
        versioned_store_init(spark, line_store_path)
    empty = spark.createDataFrame([], _LINE_SCHEMA)
    store_append(empty, line_store_path)
    if min_repeat is not None:
        if min_repeat < 2:
            raise ValueError(
                f"min_repeat must be >= 2, got {min_repeat}")
        from lisp_batch_processor_spark.sources.writers import (
            read_json_file, write_json_file)
        # MERGE into any existing meta, never replace the file: the
        # same sidecar carries the high_water_epoch/lineage pin, and
        # a re-init over a live store (store_append of the empty
        # frame above does not clear committed epoch rows) must not
        # silently erase the restart-at-0 guard. A CONFLICTING
        # min_repeat is the undercount hazard `_line_check_meta`
        # raises on — raise here too rather than flip the threshold.
        mp = _line_meta_path(line_store_path)
        meta = read_json_file(spark, mp, default=None, absent=None)
        meta = meta if isinstance(meta, dict) else {}
        if ("min_repeat" in meta
                and int(meta["min_repeat"]) != int(min_repeat)):
            if _line_store_has_rows(spark, line_store_path):
                raise ValueError(
                    f"line store at {line_store_path} was built with "
                    f"min_repeat={int(meta['min_repeat'])} but "
                    f"re-init passed min_repeat={min_repeat}: "
                    "occurrence counts saturate at the threshold "
                    "they were recorded under, so mixing thresholds "
                    "silently undercounts — seed a new store to "
                    "change it")
            # Rowless store behind the meta: the sidecar outlived a
            # deleted store (it lives outside the dir) — a REBUILD
            # may pick any threshold, and its phantom epoch/lineage
            # pin resets with it (the sketch stores' init rule).
            meta = {}
        meta["min_repeat"] = int(min_repeat)
        write_json_file(spark, mp, meta)


def _line_store_data_path(spark, line_store_path: str) -> str:
    from lisp_batch_processor_spark.sources.writers import (
        store_data_path)
    dp = store_data_path(spark, line_store_path.rstrip("/"))
    if dp is None:
        raise ValueError(f"line store at {line_store_path} has no "
                         "committed data (create with line_store_init)")
    return dp


def line_store_compact(spark, line_store_path: str,
                       keep_live: int = 1,
                       target_file_bytes: int = 128 * 1024 * 1024
                       ) -> int:
    """Fold the line store's per-epoch appends into a bounded base —
    the maintenance pass for the ingest loop's file accretion (one
    appended file-set per micro-batch forever; the membership join
    re-reads them all each epoch). Same epoch discipline as
    `operators.sketches.sketch_store_compact`: everything except the
    ``keep_live`` highest epoch ids folds to ONE row per line key
    tagged epoch −1 carrying the SUM of the folded counts (< any
    live epoch, so every later epoch's ``epoch_id < e``
    membership/count filter still admits the base, and a replay of
    the live epoch still EXCLUDES its own re-appended rows — the
    exactly-once mechanism is untouched). Seed rows (epoch < 0) fold
    too (count 1 each — membership lower bound). Duplicate
    (line_key, epoch) rows from past replays carry identical counts
    and collapse in the fold's per-epoch dedup BEFORE the sum, so a
    replay can never double-count. Returns the number of epochs
    folded; published through the store's backend (staged swap, or
    the next pointer-committed version for a versioned store);
    single-writer window required.
    """
    from pyspark.sql import functions as F

    from lisp_batch_processor_spark.sources.writers import (
        _hadoop_fs, store_publish_rewrite)

    if keep_live < 1:
        raise ValueError(f"keep_live must be >= 1, got {keep_live}")
    root = line_store_path.rstrip("/")
    data_path = _line_store_data_path(spark, root)
    if "epoch_id" not in spark.read.parquet(data_path).columns:
        raise ValueError(
            f"line store at {root} lacks the epoch_id column "
            "(create with line_store_init)")
    # Declared-schema read upcasts pre-r6 int32 epoch files and
    # yields NULL counts (-> 1) for pre-r8/seed rows; the rewrite
    # below then normalizes the whole store.
    df = spark.read.schema(_LINE_SCHEMA).parquet(data_path)
    epochs = sorted(r[0] for r in
                    df.select("epoch_id").distinct().collect())
    live = set(epochs[-keep_live:])
    foldable = [e for e in epochs if e not in live]
    if len(foldable) < 2:
        return 0
    base = (df.filter(F.col("epoch_id").isin(foldable))
            .dropDuplicates(["line_key", "epoch_id"])
            .groupBy("line_key")
            .agg(F.sum(F.coalesce("n", F.lit(1)))
                 .cast("long").alias("n"))
            .withColumn("epoch_id", F.lit(-1).cast("long"))
            .select("line_key", "epoch_id", "n"))
    folded = base.unionByName(
        df.filter(~F.col("epoch_id").isin(foldable))
          .dropDuplicates(["line_key", "epoch_id"])
          .select("line_key", "epoch_id",
                  F.coalesce("n", F.lit(1)).cast("long").alias("n")))
    jvm, fs, _ = _hadoop_fs(spark, root)
    size = fs.getContentSummary(
        jvm.org.apache.hadoop.fs.Path(data_path)).getLength()
    n_files = max(1, -(-size // target_file_bytes))
    store_publish_rewrite(spark, folded, root, n_files)
    return len(foldable)


def line_dedup_ingest_epoch(batch_df: DataFrame, line_store_path: str,
                            epoch_id: int, delim: str = "\n",
                            min_chars: int = 1,
                            min_repeat: int = 2,
                            lineage: str | None = None) -> DataFrame:
    """One epoch of incremental line dedup against the persisted
    digest store: rebuild the batch's docs with every over-threshold
    line removed, append the epoch's digest counts (tagged with
    ``epoch_id``), and return the epoch's
    (doc_id, text, lines_total, lines_kept) rows, eagerly
    materialized.

    ``min_repeat`` semantics are the PREFIX policy
    (`operators.dedup.line_dedup(policy="prefix")`): the first
    ``min_repeat - 1`` corpus-wide occurrences of a line survive and
    every later one is stripped — the only semantics an
    emit-immediately stream can compute (the batch default "winner"
    policy retroactively strips occurrences that earlier epochs
    already durably emitted; the two coincide exactly at the default
    min_repeat=2). Occurrence counts accrue per (line_key, epoch):
    the store read sums strictly-earlier epochs' counts per key, the
    batch's occurrences rank against the remaining slots, and keys
    already at the threshold stop accruing rows (so the store stays
    ~one row per distinct line per epoch it was still novel in).
    ONE min_repeat per store — MACHINE-CHECKED: counts stop at
    saturation, so a store built at k undercounts for any k' > k;
    the store's threshold is recorded in its meta sidecar at first
    use (or at `line_store_init`) and a mismatching epoch raises
    instead of silently undercounting. The same meta pins the
    MONOTONIC-EPOCH / ONE-LINEAGE contract (round 10): an epoch
    below the recorded high-water mark, or a ``lineage`` token
    (pass the checkpoint location) differing from the recorded one,
    raises instead of silently re-admitting every seen line — see
    `_check_epoch_lineage`. Rows written before round 8
    (and seed rows) lack the count column and read as n=1 — a
    documented membership lower bound, exact at min_repeat=2.

    REPLAY-SAFE BY EPOCH TAG: the count read filters the store to
    ``epoch_id < this epoch`` and collapses duplicate
    (line_key, epoch) rows before summing, so a replay that runs
    AFTER its own prior append (crash between the append and the
    epoch commit) excludes exactly that append and recomputes the
    identical output — without the tag, the replayed docs were
    deduped against their own lines and the durable output stripped
    every line to ''. Pinned by
    tests/test_streaming_dedup.py::test_line_dedup_epoch_replay.
    """
    import re as _re

    from pyspark.sql import functions as F

    if min_repeat < 2:
        raise ValueError(f"min_repeat must be >= 2, got {min_repeat}")
    spark = batch_df.sparkSession
    _line_check_meta(spark, line_store_path, min_repeat,
                     epoch_id, lineage)
    batch = batch_df.localCheckpoint(eager=True)
    # Resolve the store's data through its backend (repairs a crashed
    # compact on a swap store; resolves the committed pointer on a
    # versioned one).
    data_path = _line_store_data_path(spark, line_store_path)
    # Layout check against the FILE-INFERRED schema — the declared
    # read below always yields an epoch_id column (a legacy store
    # without one reads all-NULL epochs; the `epoch_id < e` filter
    # then drops every row and silently re-admits seen lines), so
    # the guard must probe the files, as line_store_compact does.
    if "epoch_id" not in spark.read.parquet(data_path).columns:
        raise ValueError(
            f"line store at {line_store_path} lacks the epoch_id "
            "column; create it with line_store_init (pre-r5 stores: "
            "rewrite once with epoch_id = -1)")
    # Explicit schema: epochs written before round 6 landed as int32
    # (F.lit of a small Python int) while init/compact write int64,
    # and pre-r8 rows lack the count column — the declared read
    # upcasts/NULL-fills the legacy files.
    store_df = spark.read.schema(_LINE_SCHEMA).parquet(data_path)
    earlier = store_df.filter(
        F.col("epoch_id") < F.lit(int(epoch_id)))
    did, pos, line = (F.col("_sl_did"), F.col("_sl_pos"),
                      F.col("_sl_line"))
    lines = (batch.select(
        F.col("doc_id").alias("_sl_did"),
        F.posexplode(F.split(F.col("text"), _re.escape(delim), -1))
         .alias("_sl_pos", "_sl_line"))
        .withColumn("_sl_key",
                    F.when(F.length(line) >= min_chars,
                           F.md5(line)))
        .localCheckpoint(eager=True))
    keyed = lines.filter(F.col("_sl_key").isNotNull())
    if min_repeat == 2:
        # Membership fast path: one anti-join against the key-only
        # store, min-struct winner per novel key (skew-free — the
        # agg has map-side partial combine, no ranking window).
        novel = keyed.join(earlier.select("line_key"),
                           keyed["_sl_key"] == F.col("line_key"),
                           "left_anti")
        winners = (novel.groupBy("_sl_key")
                   .agg(F.min(F.struct(did.alias("d"), pos.alias("p")))
                         .alias("_sl_w"),
                        F.count(F.lit(1)).alias("_sl_cnt")))
        kept_keyed = (novel.join(winners, "_sl_key")
                      .filter((F.col("_sl_w.d") == did)
                              & (F.col("_sl_w.p") == pos))
                      .select("_sl_did", "_sl_pos", "_sl_line"))
        appends = winners.select(
            F.col("_sl_key").alias("line_key"),
            F.lit(int(epoch_id)).cast("long").alias("epoch_id"),
            F.col("_sl_cnt").cast("long").alias("n"))
    else:
        # Count path: prior occurrences per key from the store
        # (replay-deduped per epoch, then summed), remaining slots =
        # min_repeat-1 - prior; keys whose batch count fits keep all
        # occurrences with no ranking, only keys CROSSING the
        # threshold this epoch pay a row_number window (bounded by
        # the epoch batch, and only in the one epoch they cross).
        from pyspark.sql import Window

        prior = (earlier.dropDuplicates(["line_key", "epoch_id"])
                 .groupBy("line_key")
                 .agg(F.sum(F.coalesce("n", F.lit(1)))
                      .alias("_sl_prior")))
        stats = (keyed.groupBy("_sl_key")
                 .agg(F.count(F.lit(1)).alias("_sl_cnt"))
                 .join(prior, F.col("_sl_key") == F.col("line_key"),
                       "left")
                 .select("_sl_key", "_sl_cnt",
                         F.coalesce("_sl_prior", F.lit(0))
                          .alias("_sl_prior"))
                 .withColumn("_sl_slots",
                             F.lit(min_repeat - 1)
                             - F.col("_sl_prior")))
        joined = keyed.join(stats, "_sl_key")
        keep_all = joined.filter(F.col("_sl_cnt")
                                 <= F.col("_sl_slots"))
        w = Window.partitionBy("_sl_key").orderBy(did.asc(),
                                                  pos.asc())
        ranked = (joined.filter((F.col("_sl_slots") >= 1)
                                & (F.col("_sl_cnt")
                                   > F.col("_sl_slots")))
                  .withColumn("_sl_rn", F.row_number().over(w))
                  .filter(F.col("_sl_rn") <= F.col("_sl_slots"))
                  .drop("_sl_rn"))
        kept_keyed = (keep_all.unionByName(ranked)
                      .select("_sl_did", "_sl_pos", "_sl_line"))
        # Saturated keys (prior already >= min_repeat-1) stop
        # accruing rows — their sum can only stay >= the threshold.
        appends = (stats.filter(F.col("_sl_prior")
                                < F.lit(min_repeat - 1))
                   .select(F.col("_sl_key").alias("line_key"),
                           F.lit(int(epoch_id)).cast("long")
                            .alias("epoch_id"),
                           F.col("_sl_cnt").cast("long").alias("n")))
    kept = (lines.filter(F.col("_sl_key").isNull())
            .select("_sl_did", "_sl_pos", "_sl_line")
            .unionByName(kept_keyed))
    rebuilt = (kept.groupBy("_sl_did")
               .agg(F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct(pos.alias("p"),
                                         line.alias("l")))),
                            lambda s: s["l"]),
                        delim).alias("_sl_text"),
                    F.count(F.lit(1)).alias("lines_kept")))
    totals = batch.select(
        "doc_id", F.col("text").alias("_sl_orig"),
        F.size(F.split(F.col("text"), _re.escape(delim), -1))
         .alias("lines_total"))
    out = (totals
           .join(rebuilt, totals["doc_id"] == rebuilt["_sl_did"],
                 "left")
           .select("doc_id",
                   F.when(F.col("_sl_orig").isNull(), F.lit(None))
                    .otherwise(F.coalesce("_sl_text", F.lit("")))
                    .alias("text"),
                   F.when(F.col("_sl_orig").isNull(), F.lit(None))
                    .otherwise(F.col("lines_total"))
                    .alias("lines_total"),
                   F.when(F.col("_sl_orig").isNull(), F.lit(None))
                    .otherwise(F.coalesce("lines_kept", F.lit(0)))
                    .alias("lines_kept"))
           .localCheckpoint(eager=True))  # materialize pre-append
    from lisp_batch_processor_spark.sources.writers import store_append
    store_append(appends, line_store_path)
    return out


def streaming_line_dedup_ingest(stream_docs: DataFrame,
                                line_store_path: str, sink,
                                delim: str = "\n",
                                min_chars: int = 1,
                                min_repeat: int = 2,
                                lineage: str | None = None):
    """Streaming ingest with ever-growing LINE-level boilerplate
    suppression — the streaming twin of `operators.dedup.line_dedup`
    with the PREFIX policy: each micro-batch of (doc_id, text) docs
    is one :func:`line_dedup_ingest_epoch` — rebuilt with every line
    whose corpus-wide occurrence index reaches ``min_repeat``
    removed (ordered by epoch, then (doc_id, position)), the epoch's
    digest counts appended epoch-tagged so later micro-batches count
    against them. Lines shorter than ``min_chars`` are exempt, as in
    the batch operator. ``sink(docs_df, epoch_id)`` receives each
    epoch's (doc_id, text, lines_total, lines_kept) rows. Seed the
    store with :func:`line_store_init`. ``lineage`` (pass the
    checkpoint location) strengthens the store's machine-checked
    monotonic-epoch / one-lineage pin — see
    `line_dedup_ingest_epoch`.

    With batch doc_ids ordered across epochs, replaying the epochs
    is EXACTLY the batch operator over the concatenated corpus —
    ``line_dedup(min_repeat=2)`` at the default (where the winner
    and prefix policies coincide), ``line_dedup(min_repeat=k,
    policy="prefix")`` above it (the batch "winner" default
    retroactively strips occurrences an emit-immediately stream has
    already durably emitted, so no stream can match it — the honest
    trade is pinned, not papered over). Both pinned by
    tests/test_streaming_dedup.py.

    Same foreachBatch rationale as `streaming_near_dup_ingest`;
    checkpointed epoch REPLAY is safe in both crash windows: the
    output materializes before the append, and the epoch-tagged
    membership filter means a replay arriving after its own append
    still recomputes the identical rows (see line_dedup_ingest_epoch
    — without the tag, a replayed epoch deduped docs against their
    own just-appended lines and durably emitted stripped text).

    Scale notes: per epoch this is one posexplode, one broadcast-or-
    hash left-anti-shaped membership join against the store keyed on
    the 128-bit digest, one in-batch winner agg, and one groupBy(doc)
    reassembly — the store contributes only its digest column, never
    line text, so per-epoch cost grows with the DISTINCT-line corpus
    slowly and the join stays digest-bucketed.
    """
    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        out = line_dedup_ingest_epoch(batch_df, line_store_path,
                                      epoch_id, delim=delim,
                                      min_chars=min_chars,
                                      min_repeat=min_repeat,
                                      lineage=lineage)
        sink(out, epoch_id)

    return stream_docs.writeStream.foreachBatch(_process)


# ---------------------------------------------------------------------------
# Streaming semantic (embedding) dedup — the fourth incremental dedup
# axis, completing URL / line / MinHash near-dup: SemDeDup against a
# persisted cell store, with the IVF cell model trained ONCE on the
# seed corpus so every epoch cells identically — until a GENERATIONAL
# re-seed (`semantic_reseed`) retrains it from the current survivors
# and re-cells them engine-side, committing (centroids, vectors)
# atomically under one generation-marker PUT.
# ---------------------------------------------------------------------------

import re as _re_mod

# Legacy single-file marker (early round 9): read-only back-compat.
_SEM_GEN_FILE = "_sem_gen.json"
_SEM_GEN_RE = _re_mod.compile(r"_sem_gen_(\d+)\.json")


def _sem_gen_marker(sd: str, gen: int) -> str:
    """Generation ``gen``'s marker file. Markers are SEQUENCE-NAMED
    and never overwritten (the `operators.cdc` manifest discipline):
    each reseed commits by creating a NEW ``_sem_gen_<g>.json``, so
    there is no truncate-then-write window on the committed state —
    a torn top marker (crash mid-create) is invalid JSON that the
    reader's walk steps past, landing on the previous generation."""
    return f"{sd.rstrip('/')}/_sem_gen_{int(gen)}.json"


def _sem_marker_gens(spark, sd: str) -> list[int]:
    """Generation numbers of every marker FILE under ``sd`` (valid or
    torn) — one driver-side listing."""
    from lisp_batch_processor_spark.sources.writers import _hadoop_fs
    jvm, fs, _ = _hadoop_fs(spark, sd)
    jsd = jvm.org.apache.hadoop.fs.Path(sd.rstrip("/"))
    if not fs.exists(jsd):
        return []
    out = []
    for st in fs.listStatus(jsd):
        m = _SEM_GEN_RE.fullmatch(st.getPath().getName())
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _sem_paths(sd: str, gen: int) -> tuple[str, str]:
    """(centroid store, vector store) roots for generation ``gen``.
    Generation 0 is the flat seed layout (backward compatible with
    pre-generation state dirs); later generations are suffixed
    sibling stores, so a generation switch is ONE marker-file PUT
    and readers of the previous generation keep resolving complete
    stores until the next reseed vacuums them."""
    sd = sd.rstrip("/")
    if int(gen) == 0:
        return f"{sd}/sem_centroids", f"{sd}/sem_vectors"
    return f"{sd}/sem_centroids_g{int(gen)}", \
        f"{sd}/sem_vectors_g{int(gen)}"


_SEM_COUNTS_SCHEMA = "cell int, epoch_id long, n long"


def _sem_counts_path(sd: str, gen: int) -> str:
    """Generation ``gen``'s cell-count store root — the O(k)-per-epoch
    occupancy ledger behind `semantic_cell_occupancy_fast`: one
    (cell, epoch_id, n) row per occupied cell per epoch, appended
    from the SAME celled-survivor frame the vector store receives
    (seed and reseed baselines land at epoch −1). Same generation
    suffixing as `_sem_paths`."""
    sd = sd.rstrip("/")
    if int(gen) == 0:
        return f"{sd}/sem_cellcounts"
    return f"{sd}/sem_cellcounts_g{int(gen)}"


def _sem_counts_data_path(spark, sd: str, gen: int) -> str | None:
    """The counts store's committed data dir, or None when the store
    does not exist — pre-r10 state dirs have no counts store until
    their first `semantic_reseed` writes the next generation's
    baseline; callers fall back to the full occupancy scan."""
    from lisp_batch_processor_spark.sources.writers import (
        _hadoop_fs, store_data_path)
    dp = store_data_path(spark, _sem_counts_path(sd, gen))
    if dp is None:
        return None
    jvm, fs, _ = _hadoop_fs(spark, dp)
    if not fs.exists(jvm.org.apache.hadoop.fs.Path(dp)):
        return None
    return dp


def _sem_counts_reconciled_path(sd: str, gen: int) -> str:
    """The one-time reconciliation's DONE marker, a separate sibling
    of the meta sidecar: the reconcile must not rewrite the
    horizon-bearing meta in place (a crash mid-overwrite would tear
    the JSON, silently dropping `baseline_through_epoch` AND the
    armed flag — the fast signal loses its mask and the check that
    exists to catch exactly that never fires). A torn or absent
    marker merely re-runs the idempotent reconciliation."""
    return _sem_counts_meta_path(sd, gen) + ".reconciled"


def _sem_counts_meta_path(sd: str, gen: int) -> str:
    """The counts store's hidden meta sidecar — carries the BACKFILL
    HORIZON `semantic_counts_seed` records (see `_sem_counts_frame`).
    Absent for seed/reseed-written ledgers, which need none. Written
    exactly once per backfill and never rewritten in place; the
    reconcile's flag lives in `_sem_counts_reconciled_path`."""
    from lisp_batch_processor_spark.sources.writers import (
        _hidden_sibling)
    return _hidden_sibling(_sem_counts_path(sd, gen), "meta")


def _sem_counts_frame(spark, sd: str, gen: int):
    """The ledger's committed rows with replay duplicates collapsed
    AND any backfill horizon applied — the ONE read both
    `semantic_cell_occupancy_fast` and the compact fold go through.
    `semantic_counts_seed` builds its epoch −1 baseline from the
    vector store as of high-water epoch H, so a checkpoint REPLAY of
    an epoch <= H (the crashed-before-commit epoch whose vectors the
    baseline already counted) appends tagged rows the (cell, epoch)
    dedup cannot collapse — without the horizon they would double-
    count in the fast signal. Rows tagged in (−1, H] are therefore
    excluded when the sidecar records H; a reseed-written baseline
    needs no horizon (the generation bump isolates it — the replayed
    trigger epoch re-runs under the PREVIOUS generation's ledger).
    Returns None when the ledger is absent."""
    from pyspark.sql import functions as F

    from lisp_batch_processor_spark.sources.writers import (
        read_json_file)
    dp = _sem_counts_data_path(spark, sd, gen)
    if dp is None:
        return None
    df = (spark.read.schema(_SEM_COUNTS_SCHEMA).parquet(dp)
          .dropDuplicates(["cell", "epoch_id"]))
    meta = read_json_file(spark, _sem_counts_meta_path(sd, gen),
                          default=None, absent=None)
    if isinstance(meta, dict) and "baseline_through_epoch" in meta:
        h = int(meta["baseline_through_epoch"])
        df = df.filter((F.col("epoch_id") == -1)
                       | (F.col("epoch_id") > F.lit(h)))
    return df


def _sem_counts_append(celled_survivors, cc_path: str,
                       epoch_id: int) -> None:
    """Append one epoch's (cell, epoch, n) occupancy rows — a k-row
    map-side-combined aggregate over the already-materialized celled
    survivor frame, the sketch stores' additive pattern. Replay-safe
    by epoch tag: a replayed epoch re-appends IDENTICAL rows (the
    assignment is pinned deterministic), and every read collapses
    duplicate (cell, epoch) rows before summing."""
    from pyspark.sql import functions as F

    from lisp_batch_processor_spark.sources.writers import store_append
    store_append(
        celled_survivors.groupBy("cell")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("epoch_id", F.lit(int(epoch_id)).cast("long"))
        .select("cell", "epoch_id", "n"),
        cc_path)


def semantic_current_gen(spark, state_dir: str) -> dict:
    """The committed semantic-store generation: ``{"gen": g, "k": k,
    "epoch": e}`` from the highest VALID sequence-named marker, or
    the implicit ``{"gen": 0, "k": None, "epoch": None}`` when no
    reseed has ever committed (the seed layout). A torn top marker
    (crash mid-create) is invalid JSON and the walk steps DOWN to
    the previous committed generation — whose stores the reseed
    vacuum's one-generation grace keeps — so a crashed commit can
    never strand readers on a vacuumed generation 0 (markers are
    never overwritten in place; see `_sem_gen_marker`)."""
    from lisp_batch_processor_spark.sources.writers import (
        read_json_file)
    sd = state_dir.rstrip("/")
    for g in reversed(_sem_marker_gens(spark, sd)):
        d = read_json_file(spark, _sem_gen_marker(sd, g),
                           default=None, absent=None)
        if isinstance(d, dict) and "gen" in d:
            return {"gen": int(d["gen"]), "k": d.get("k"),
                    "epoch": d.get("epoch")}
    # Back-compat: the early-round-9 single overwritten marker.
    d = read_json_file(spark, f"{sd}/{_SEM_GEN_FILE}",
                       default=None, absent=None)
    if isinstance(d, dict) and "gen" in d:
        return {"gen": int(d["gen"]), "k": d.get("k"),
                "epoch": d.get("epoch")}
    return {"gen": 0, "k": None, "epoch": None}


def semantic_store_roots(spark, state_dir: str) -> tuple[str, str]:
    """The CURRENT generation's (centroid store, vector store) roots
    — what `ingest_report` and maintenance passes should target."""
    g = semantic_current_gen(spark, state_dir)["gen"]
    return _sem_paths(state_dir, g)


def _foreign_ingest_stores_present(spark, sd: str) -> bool:
    """Whether any NON-semantic store dir lives under ``sd`` — i.e.
    the state_dir is SHARED with a composed ingest loop's URL / line /
    near-dup stores (`pipelines.ingest._paths` children, or any other
    epoch-tagged store a caller parked there). Detection is by
    EXCLUSION so no pipeline names leak into this layer: a visible
    child DIRECTORY whose name is not ``sem_*`` counts (markers and
    meta are files; leases/staging/backups are dot- or
    underscore-prefixed). One driver-side listing, paid only at seed
    time. Consequence of erring on the safe side: any unrelated
    visible dir parked inside a STANDALONE semantic state_dir (a
    checkpoint dir, scratch output) makes it look shared and the
    seed then PRESERVES the lineage pin — keep checkpoints outside
    the state_dir (every documented layout does), or clear the pin
    explicitly with `ingest_lineage_reset` when a re-seed really
    does restart the stream."""
    from lisp_batch_processor_spark.sources.writers import _hadoop_fs
    jvm, fs, _ = _hadoop_fs(spark, sd)
    jsd = jvm.org.apache.hadoop.fs.Path(sd.rstrip("/"))
    if not fs.exists(jsd):
        return False
    for st in fs.listStatus(jsd):
        name = st.getPath().getName()
        if (st.isDirectory() and not name.startswith((".", "_"))
                and not name.startswith("sem_")):
            return True
    return False


def semantic_store_seed(seed_emb, state_dir: str, *,
                        k: int = 64, iters: int = 1,
                        backend: str = "swap",
                        id_col: str = "vec_id") -> None:
    """Create the two semantic-ingest stores under ``state_dir`` from
    the seed corpus's (id_col, embedding) rows: the CENTROID store
    (`similarity.ivf_train` on the seed — the fixed cell model every
    later epoch shares; cell id = row position) and the celled
    VECTOR store holding the seed vectors as the initial survivors.
    The seed should itself be semantically deduped (e.g.
    `operators.dedup.semantic_dedup` survivors) — seeding does not
    dedup it. Seeding starts generation 0 as a declared FRESH START:
    any stale generation markers and previous gen-0 semantic stores
    in the same dir are removed first (the appends below would
    otherwise silently MIX two seeds' vectors and ledger baselines),
    and — for a STANDALONE semantic state_dir only — the recorded
    lineage/high-water meta resets too. Over a state_dir SHARED with
    a composed ingest loop's URL/line/near-dup stores
    (`pipelines.ingest`), the one `_ingest_lineage.json` guards every
    epoch-tagged store riding the stream, so a semantic (re)seed
    leaves it alone: the live stream's epochs keep progressing under
    the recorded lineage, and a NEW checkpoint restarting at 0 still
    raises for the stores the seed did not clear — exactly the
    window the guard exists to close.
    Retraining the model mid-stream is `semantic_reseed` — a NEW
    GENERATION trained from the current survivors, re-celled
    engine-side and committed atomically. Both stores tolerate
    `sources.writers.compact` from the maintenance window (duplicate
    vector rows from replays never change the min-id assignment) —
    `semantic_store_compact` packages that fold, and
    `streaming_semantic_ingest`'s ``compact_every`` hook
    self-schedules it, since the vector store's appends accrete one
    file set per epoch like every other ingest store."""
    from pyspark.sql import functions as F

    from lisp_batch_processor_spark.functions.vectors import dot
    from lisp_batch_processor_spark.operators.similarity import (
        _ivf_cells_udf, ivf_train)
    from lisp_batch_processor_spark.sources.writers import (
        _hadoop_fs, store_append, versioned_store_init)

    if backend not in ("swap", "versioned"):
        raise ValueError(f"backend must be 'swap' or 'versioned', "
                         f"got {backend!r}")
    spark = seed_emb.sparkSession
    sd = state_dir.rstrip("/")
    jvm, fs, _ = _hadoop_fs(spark, sd)
    # Fresh lineage: generation 0 — remove every stale marker, and
    # (STANDALONE dirs only) the recorded lineage/high-water meta: a
    # seed declares a new stream, but on a SHARED state_dir the one
    # meta also pins the URL/line/near-dup stores this seed does not
    # clear, and erasing it would re-open the restart-at-0 window
    # the guard exists to close (see the docstring).
    for g in _sem_marker_gens(spark, sd):
        fs.delete(jvm.org.apache.hadoop.fs.Path(
            _sem_gen_marker(sd, g)), False)
    fs.delete(jvm.org.apache.hadoop.fs.Path(
        f"{sd}/{_SEM_GEN_FILE}"), False)
    if not _foreign_ingest_stores_present(spark, sd):
        ingest_lineage_reset(spark, sd)
    cent_path, vec_path = _sem_paths(sd, 0)
    cc_path = _sem_counts_path(sd, 0)
    # ... and remove stale generation-0 stores from a previous seed
    # in the same dir: store_append below APPENDS, so leftovers would
    # silently MIX two seeds' vectors and ledger baselines (both
    # membership and the occupancy signal would be corrupt). A seed
    # is a declared fresh start; make it one. The ledger's backfill-
    # horizon sidecar goes too — it described the deleted ledger.
    for pth in (cent_path, vec_path, cc_path,
                _sem_counts_meta_path(sd, 0)):
        fs.delete(jvm.org.apache.hadoop.fs.Path(pth), True)
    if backend == "versioned":
        versioned_store_init(spark, cent_path)
        versioned_store_init(spark, vec_path)
        versioned_store_init(spark, cc_path)
    nz = (seed_emb.select(F.col(id_col).alias("vec_id"), "embedding")
          .filter(dot(F.col("embedding"), F.col("embedding")) > 0)
          .localCheckpoint(eager=True))  # feeds train AND the cell UDF
    cents = ivf_train(nz, k=k, iters=iters)
    store_append(
        spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
            "cell int, embedding array<double>"),
        cent_path)
    one_cell = _ivf_cells_udf(cents, 1)
    celled = (nz.select("vec_id",
                        one_cell("embedding")[0].alias("cell"),
                        "embedding")
              .localCheckpoint(eager=True))  # one matmul pass, 2 writes
    store_append(celled, vec_path)
    # Seed baseline of the O(k) occupancy ledger, at epoch −1.
    _sem_counts_append(celled, cc_path, -1)


def semantic_read_centroids(spark, state_dir: str,
                            gen: int | None = None
                            ) -> list[list[float]]:
    """The persisted cell model (CURRENT generation, or an explicit
    ``gen``), in cell-id order — bounded O(k x dim) driver/model
    state, the one collect this path does."""
    from lisp_batch_processor_spark.sources.writers import (
        store_data_path)
    if gen is None:
        cent_path, _ = semantic_store_roots(spark, state_dir)
    else:
        cent_path, _ = _sem_paths(state_dir, gen)
    dp = store_data_path(spark, cent_path)
    if dp is None:
        raise ValueError(f"no centroid store under {state_dir} "
                         "(create with semantic_store_seed)")
    rows = spark.read.parquet(dp).collect()
    return [list(r.embedding) for r in
            sorted(rows, key=lambda r: r.cell)]


def semantic_ingest_epoch(batch_emb, state_dir: str,
                          tau: float = 0.95,
                          id_col: str = "vec_id",
                          centroids: list[list[float]] | None = None,
                          gen: int | None = None,
                          epoch: int | None = None,
                          lineage: str | None = None):
    """One epoch of incremental semantic dedup against the persisted
    stores (CURRENT generation): assign the batch's vectors against
    the fixed centroid model + the celled survivor store
    (`operators.dedup.incremental_semantic_dups`), append the
    SURVIVORS' celled vectors, and return the epoch's
    (id_col, rep_id, is_dup) rows, eagerly materialized.
    ``centroids`` lets a long-lived caller (the streaming twin's
    per-generation cache) skip the per-epoch centroid collect — it
    MUST be the targeted generation's model, the one
    `semantic_read_centroids` would return. ``gen`` pins the epoch
    to an explicit generation instead of the marker's current one —
    the replay path for the epoch whose trigger COMMITTED a reseed
    (its assignment originally ran under the previous generation,
    whose stores the reseed's one-generation vacuum grace keeps;
    see `streaming_semantic_ingest`). ``epoch`` (the stream's epoch
    id) turns on the two per-epoch contracts the streaming loops
    always use: the lineage/high-water check
    (`ingest_lineage_check`, with the optional ``lineage`` token)
    and the O(k) occupancy-ledger append that keeps
    `semantic_cell_occupancy_fast` exact — an UNTAGGED call
    (epoch=None, the pre-r10 shape) instead DROPS any present ledger
    so it can never silently understate (full-scan reseed signal
    until the next reseed re-baselines it; a present ledger is
    always complete).

    With ingest-ordered ids the epoch concatenation equals
    `semantic_dedup(seed ∪ epochs, centroids=the seed-trained model)`
    restricted to the epoch ids (pinned by
    tests/test_streaming_dedup.py), up to the survivor-only
    transitive-chain exception every incremental dedup documents;
    across a `semantic_reseed`, each generation's epoch segment
    equals the batch twin against THAT generation's model over
    (its survivors ∪ its epochs).
    REPLAY-SAFE WITHOUT epoch tags, like the near-dup twin: a replay
    after its own append meets its own stored vectors as self-pairs,
    which the min-id fold resolves to rep = self; the duplicate
    survivor rows it re-appends change candidate multiplicity, never
    the min-id assignment."""
    from pyspark.sql import functions as F

    from lisp_batch_processor_spark.operators.dedup import (
        incremental_semantic_dups)
    from lisp_batch_processor_spark.sources.writers import (
        store_append, store_data_path)

    spark = batch_emb.sparkSession
    sd = state_dir.rstrip("/")
    if epoch is not None:
        ingest_lineage_check(spark, sd, int(epoch), lineage)
    use_gen = (semantic_current_gen(spark, sd)["gen"]
               if gen is None else int(gen))
    _, vec_path = _sem_paths(sd, use_gen)
    cents = (centroids if centroids is not None
             else semantic_read_centroids(spark, sd, gen=use_gen))
    vec_dp = store_data_path(spark, vec_path)
    if vec_dp is None:
        raise ValueError(f"no vector store under {state_dir} "
                         "(create with semantic_store_seed)")
    store = spark.read.parquet(vec_dp)
    asg, celled = incremental_semantic_dups(
        batch_emb, cents, store, tau=tau, id_col=id_col)
    asg = asg.localCheckpoint(eager=True)  # snapshot pre-append
    surv = (celled.join(asg.filter(~F.col("is_dup"))
                        .select(F.col(id_col).alias("vec_id")),
                        "vec_id", "left_semi")
            .localCheckpoint(eager=True))  # one pass, two appends

    def _appends() -> None:
        store_append(surv, vec_path)
        if _sem_counts_data_path(spark, sd, use_gen) is not None:
            if epoch is not None:
                # O(k) occupancy-ledger append — the reseed-due
                # signal's input. Gated on the ledger EXISTING: an
                # adopted pre-r10 state dir has none, and appending a
                # partial history would silently understate the fast
                # signal (it falls back to the full scan instead,
                # until the first reseed writes the next generation's
                # complete baseline).
                _sem_counts_append(surv, _sem_counts_path(sd, use_gen),
                                   int(epoch))
                _sem_counts_reconcile_once(spark, sd, use_gen)
            else:
                # INVARIANT: a present ledger is COMPLETE. An untagged
                # ingest (epoch=None, the pre-r10 call shape) can't
                # ledger its counts, so drop the ledger rather than
                # leave it silently understating — the fast signal
                # then falls back to the full scan until the next
                # reseed re-baselines it.
                from lisp_batch_processor_spark.sources.writers import (
                    _hadoop_fs)
                jvm, fs, _ = _hadoop_fs(spark, sd)
                fs.delete(jvm.org.apache.hadoop.fs.Path(
                    _sem_counts_path(sd, use_gen)), True)

    if epoch is not None:
        # MACHINE-CHECKED single-writer window (round 12): the epoch's
        # store mutations hold the semantic maintenance lease — the
        # same dest `semantic_counts_seed` leases for its whole
        # backfill — so a backfill racing a live stream's appends
        # raises on one side instead of relying on the backfill
        # docstring's "run it between epochs". Role-scoped owner (see
        # `_acquire_role_lease`): a replay after a hard crash adopts
        # its dead predecessor's lease instead of wedging on it for
        # the TTL, while a live backfill's lease still raises.
        # Driver-side cost: ~5 tiny FS ops per epoch.
        from lisp_batch_processor_spark.sources.writers import (
            release_lease)
        dest = _sem_counts_path(sd, use_gen)
        owner = _acquire_role_lease(spark, dest, "sem-epoch-")
        try:
            _appends()
        finally:
            release_lease(spark, dest, owner)
    else:
        _appends()
    return asg


def _sem_counts_reconcile_once(spark, sd: str, gen: int) -> None:
    """ONE-TIME fast-vs-full occupancy reconciliation after a
    probe-skipped backfill (round 13, closing round 12's
    opaque-legacy-token residual): when `semantic_counts_seed` could
    not probe the checkpoint for the uncommitted-high-water crash
    window (opaque or unreachable lineage token), the first tagged
    epoch after the backfill compares `semantic_cell_occupancy_fast`
    against the full scan. A divergence means the window fired — the
    baseline was taken BEFORE the crashed epoch's replay landed its
    vectors, and the horizon masks that epoch's ledger rows, so the
    fast signal undercounts it permanently — and raises with the
    remedy (the replay has committed by now, so deleting the ledger
    root and re-running the backfill heals the dir). A match writes
    the DONE marker (`_sem_counts_reconciled_path` — a separate
    sibling, so the horizon-bearing meta is never rewritten in place
    and cannot be torn by a crash here) and the check never runs
    again. Steady-state cost on armed dirs: one tiny JSON get per
    epoch until the first reconciliation, then one meta get + one
    marker get; un-armed dirs (verified probe, or no backfill) pay
    the meta get only — within the epoch path's documented ~5 tiny
    FS ops."""
    from lisp_batch_processor_spark.sources.writers import (
        read_json_file, write_json_file)
    mp = _sem_counts_meta_path(sd, gen)
    meta = read_json_file(spark, mp, default=None, absent=None)
    if not (isinstance(meta, dict) and meta.get("probe_skipped")):
        return
    marker = read_json_file(spark, _sem_counts_reconciled_path(sd, gen),
                            default=None, absent=None)
    if isinstance(marker, dict) and marker.get("reconciled"):
        return
    if semantic_current_gen(spark, sd)["gen"] != gen:
        # A replay pinned to a pre-reseed generation: the occupancy
        # views below read the CURRENT generation, whose reseed-built
        # baseline has no backfill residual — nothing to reconcile
        # against here; the armed generation's flag stays for its own
        # current-gen epochs (and dies with the generation's vacuum).
        return
    fast = semantic_cell_occupancy_fast(spark, sd)
    full = semantic_cell_occupancy(spark, sd)
    if fast != full:
        raise ValueError(
            f"occupancy ledger at {sd} (gen {gen}) disagrees with the "
            f"full survivor scan (fast={fast}, full={full}): the "
            "backfilled baseline was taken inside the uncommitted-"
            "high-water crash window behind an unprobeable lineage "
            "token — the fast signal permanently undercounts the "
            "replayed epoch. The replay has committed now: delete the "
            "ledger root and re-run semantic_counts_seed to rebuild "
            "the baseline over the complete store")
    # A torn marker (crash mid-create) reads as not-reconciled and
    # re-runs the idempotent check; the meta stays untouched.
    write_json_file(spark, _sem_counts_reconciled_path(sd, gen),
                    {"reconciled": True})


# How long a same-role lease must sit UNREFRESHED before another
# writer may adopt it. A same-host pid probe can prove DEATH (adopt
# immediately); everything else — foreign host, legacy token, or a
# same-host pid that merely EXISTS (it could be recycled, or a
# zombie) — gates on this horizon. Deliberately much shorter than
# the lease TTL (3600 s): the horizon is "has the holder heartbeat
# recently", not "has the whole window elapsed".
SEM_LEASE_ADOPT_MIN_AGE_S = 300.0


def _lease_file_mtime(spark, dest: str) -> float | None:
    """The lease file's modification time (epoch seconds), or None if
    it vanished — the holder's last heartbeat (acquire/refresh both
    rewrite the file)."""
    from py4j.protocol import Py4JJavaError

    from lisp_batch_processor_spark.sources.writers import (
        _hadoop_fs, lease_path)
    lp = lease_path(dest)
    jvm, fs, _ = _hadoop_fs(spark, lp)
    try:
        return (fs.getFileStatus(jvm.org.apache.hadoop.fs.Path(lp))
                .getModificationTime() / 1000.0)
    except Py4JJavaError:
        return None


def _token_host_pid(holder: str) -> tuple[str | None, int | None]:
    """(host, pid) parsed from an ``...@host:pid`` owner token, or
    (None, None) for legacy tokens without one."""
    if "@" in holder:
        loc = holder.rsplit("@", 1)[1]
        if ":" in loc:
            h, p = loc.rsplit(":", 1)
            if p.isdigit():
                return h, int(p)
    return None, None


def _holder_plausibly_alive(spark, dest: str, holder: str) -> bool:
    """Is the recorded same-role holder plausibly still running?
    Owner tokens carry ``@host:pid`` (round 13): on the SAME host a
    pid probe can prove DEATH — ProcessLookupError is a hard crash
    and adopts immediately. It cannot prove life: a recycled pid is
    an unrelated process and a zombie keeps its slot until reaped
    (os.kill(pid, 0) succeeds for both), so existence falls through
    to the heartbeat horizon rather than wedging recovery for the
    full lease TTL. There and for unprobeable holders (foreign host,
    legacy token) the lease file's mtime stands in as a heartbeat:
    younger than `SEM_LEASE_ADOPT_MIN_AGE_S` reads as alive
    (refuse — a genuinely live writer refreshes its lease), older
    means the holder has not refreshed within the horizon and has
    forfeited the window — the TTL-expiry semantics on a shorter
    clock."""
    import os as _os
    import socket as _socket
    import time as _time

    host, pid = _token_host_pid(holder)
    if host == _socket.gethostname() and pid is not None:
        try:
            _os.kill(pid, 0)
        except ProcessLookupError:
            return False        # provably dead: hard crash
        except PermissionError:
            pass                # exists under another uid: unprovable
    mtime = _lease_file_mtime(spark, dest)
    return (mtime is not None
            and _time.time() < mtime + SEM_LEASE_ADOPT_MIN_AGE_S)


def _remove_dead_lease(spark, dest: str, expected_owner: str) -> None:
    """Atomically remove a not-plausibly-alive holder's lease file so
    the adopter can contend through a create-exclusive of its OWN.
    Rename-to-tombstone first (exactly one of several racing adopters
    wins the rename), then verify the tombstoned content really is
    the corpse that was read — a fresh lease created by a racer in
    the read-to-rename window is renamed back (or, if the racer
    already re-created, their new file keeps exclusion) and the
    adoption raises instead of clobbering it."""
    import uuid as _uuid

    from lisp_batch_processor_spark.sources.writers import (
        LeaseHeldError, _hadoop_fs, lease_path, read_json_file)
    lp = lease_path(dest)
    jvm, fs, _ = _hadoop_fs(spark, lp)
    jlp = jvm.org.apache.hadoop.fs.Path(lp)
    tomb = f"{lp}.tomb.{_uuid.uuid4().hex[:8]}"
    jtomb = jvm.org.apache.hadoop.fs.Path(tomb)
    if not fs.rename(jlp, jtomb):
        raise LeaseHeldError(
            f"{dest}: dead same-role lease vanished mid-adoption "
            "(a racing adopter won); wait for its release or expiry")
    d = read_json_file(spark, tomb, default="_torn_", absent=None)
    if isinstance(d, dict) and d.get("owner") == expected_owner:
        fs.delete(jtomb, False)
        return
    # Not the corpse we read: a racer's fresh lease landed between
    # the read and the rename. Restore it (or defer to their already
    # re-created file) and fail safe.
    if not fs.rename(jtomb, jlp):
        fs.delete(jtomb, False)
    raise LeaseHeldError(
        f"{dest} was re-leased concurrently during same-role "
        "adoption; wait for the holder's release or expiry")


def _acquire_role_lease(spark, dest: str, role: str) -> str:
    """Acquire the semantic maintenance lease on ``dest`` for a ROLE
    (``"sem-epoch-"`` for tagged ingest epochs, ``"counts-seed-"``
    for the ledger backfill). A live lease held by the OTHER role
    raises `LeaseHeldError` — the stream-vs-backfill exclusion the
    lease exists for. A lease held by the SAME role is ADOPTED only
    when its holder is not plausibly alive (round 13 — previously any
    same-role lease adopted unconditionally, silently admitting two
    concurrent same-role writers): a hard crash (dead pid on this
    host, or no heartbeat within `SEM_LEASE_ADOPT_MIN_AGE_S` for an
    unprobeable holder) leaves the file behind, and making the replay
    or rerun wait out the full TTL would wedge exactly the recovery
    path the epoch stores are designed around — while a LIVE
    same-role writer raises like the other role, keeping the
    exclusion real within a role too. Our own recorded ``host:pid``
    is a same-process retry and refreshes reentrantly under the
    recorded token.

    Adoption acquires under a FRESH token, never the corpse's (round
    13, second pass): reusing the recorded token let two adopters
    racing the same dead holder both take acquire_lease's reentrant
    refresh path and both "win". Now the corpse is first removed via
    an atomic rename-and-verify (`_remove_dead_lease` — exactly one
    racing adopter's rename succeeds) and the adopter then contends
    through the ordinary create-exclusive with its own token, so
    every path to "acquired" is a create this owner won. The residual
    is a live writer stalled past the heartbeat horizon without
    refreshing — which by the lease's own contract has forfeited the
    window, the same semantics TTL expiry applies on a longer
    clock."""
    import os as _os
    import socket as _socket
    import uuid as _uuid

    from lisp_batch_processor_spark.sources.writers import (
        LeaseHeldError, acquire_lease, lease_holder)
    holder = lease_holder(spark, dest)
    if isinstance(holder, str) and holder.startswith(role):
        if (_token_host_pid(holder)
                == (_socket.gethostname(), _os.getpid())):
            return acquire_lease(spark, dest, owner=holder)
        if _holder_plausibly_alive(spark, dest, holder):
            raise LeaseHeldError(
                f"{dest} is leased by a plausibly-live same-role "
                f"writer {holder!r}; wait for its release, its "
                f"heartbeat horizon "
                f"({SEM_LEASE_ADOPT_MIN_AGE_S:.0f}s), or lease expiry")
        _remove_dead_lease(spark, dest, holder)
    me = (f"{role}{_uuid.uuid4().hex[:12]}"
          f"@{_socket.gethostname()}:{_os.getpid()}")
    return acquire_lease(spark, dest, owner=me)


def semantic_store_compact(spark, state_dir: str,
                           target_file_bytes: int = 128 * 1024 * 1024
                           ) -> dict:
    """Fold the CURRENT generation's semantic stores' per-epoch file
    accretion — the maintenance pass the vector store's append
    discipline calls for (`sources.writers.compact` size-targeted
    rewrites; both stores tolerate duplicate rows, so a plain
    rewrite preserves semantics — duplicate survivor vectors from
    replays never change the min-id assignment, and the centroid
    store is one tiny file set that compact skips below its
    min-files floor). The cell-count ledger (when present) gets the
    LINE STORE's epoch fold instead of a plain rewrite: every epoch
    below the newest folds to one summed row per cell at epoch −1,
    keeping the newest epoch live so a replayed epoch's re-append
    still collapses in the read-side (cell, epoch) dedup — rows AND
    files stay bounded. Single-writer window required — which the
    ``compact_every`` hook in `streaming_semantic_ingest` IS.
    Returns {"vector_files": n, "centroid_files": n,
    "cellcount_epochs_folded": n} (files written / epochs folded;
    0 = nothing to fold)."""
    from pyspark.sql import functions as F

    from lisp_batch_processor_spark.sources.writers import (
        _hadoop_fs, compact, store_publish_rewrite)
    gen = semantic_current_gen(spark, state_dir)["gen"]
    cent_path, vec_path = _sem_paths(state_dir, gen)
    out = {
        "vector_files": compact(spark, vec_path,
                                target_file_bytes=target_file_bytes),
        "centroid_files": compact(spark, cent_path,
                                  target_file_bytes=target_file_bytes),
        "cellcount_epochs_folded": 0,
    }
    # The fold consumes the SAME filtered frame the fast signal
    # reads (`_sem_counts_frame`: replay dedup + any backfill
    # horizon), so a replayed-epoch re-append behind a
    # `semantic_counts_seed` horizon is dropped from the rewrite
    # rather than summed into the base.
    df = _sem_counts_frame(spark, state_dir, gen)
    if df is not None:
        cc_dp = _sem_counts_data_path(spark, state_dir, gen)
        epochs = sorted(r[0] for r in
                        df.select("epoch_id").distinct().collect())
        foldable = [e for e in epochs if e not in set(epochs[-1:])]
        if len(foldable) >= 2:
            base = (df.filter(F.col("epoch_id").isin(foldable))
                    .groupBy("cell")
                    .agg(F.sum("n").cast("long").alias("n"))
                    .withColumn("epoch_id", F.lit(-1).cast("long"))
                    .select("cell", "epoch_id", "n"))
            folded = base.unionByName(
                df.filter(~F.col("epoch_id").isin(foldable)))
            cc_root = _sem_counts_path(state_dir, gen)
            jvm, fs, _ = _hadoop_fs(spark, cc_root)
            size = fs.getContentSummary(
                jvm.org.apache.hadoop.fs.Path(cc_dp)).getLength()
            store_publish_rewrite(
                spark, folded, cc_root,
                max(1, -(-size // target_file_bytes)))
            out["cellcount_epochs_folded"] = len(foldable)
    return out


def semantic_cell_occupancy(spark, state_dir: str) -> dict:
    """The EXACT re-seed-due signal: per-cell survivor counts of the
    CURRENT generation's vector store, reduced to ``{"gen", "k",
    "cells_occupied", "vectors", "max_cell", "mean_cell"}`` — one
    k-row aggregate whose INPUT is a full survivor-store scan
    (distinct vec_id per cell, so replay duplicates don't inflate
    the signal). Right for on-demand observability (`ingest_report`)
    and one-off sizing; the PER-EPOCH trigger in the streaming loops
    uses `semantic_cell_occupancy_fast` instead — same numbers from
    the O(k)-per-epoch count ledger, no O(corpus) pass. ``k`` is the MODEL's cell
    count (the marker's recorded k, else the centroid store's row
    count — NOT the number of occupied cells, which is reported
    separately: an operator sizing ``target_cell`` from this report
    must see the real k even when many cells are empty), and
    ``mean_cell`` = vectors / k for the same reason. At a fixed cell
    model, occupancy grows linearly with survivors and the
    within-cell verify term with its square — when ``max_cell``
    drifts far above the seed's cell size, schedule
    `semantic_reseed` (the ``reseed_max_cell`` hook in
    `streaming_semantic_ingest` does exactly this)."""
    from pyspark.sql import functions as F

    from lisp_batch_processor_spark.sources.writers import (
        store_data_path)
    gen = semantic_current_gen(spark, state_dir)
    cent_path, vec_path = _sem_paths(state_dir, gen["gen"])
    dp = store_data_path(spark, vec_path)
    if dp is None:
        raise ValueError(f"no vector store under {state_dir} "
                         "(create with semantic_store_seed)")
    occ = (spark.read.parquet(dp)
           .groupBy("cell")
           .agg(F.count_distinct("vec_id").alias("n"))
           .agg(F.count(F.lit(1)).alias("occ"),
                F.sum("n").alias("total"),
                F.max("n").alias("mx"))
           .first())
    if gen.get("k") is not None:
        k = int(gen["k"])
    else:
        cdp = store_data_path(spark, cent_path)
        k = spark.read.parquet(cdp).count() if cdp else 0
    total = int(occ["total"] or 0)
    return {"gen": gen["gen"], "k": int(k),
            "cells_occupied": int(occ["occ"] or 0),
            "vectors": total,
            "max_cell": int(occ["mx"] or 0),
            "mean_cell": (total / k) if k else 0.0}


def semantic_cell_occupancy_fast(spark, state_dir: str) -> dict | None:
    """`semantic_cell_occupancy` from the per-epoch cell-count ledger
    instead of a survivor-store scan — the O(k)-per-epoch reseed-due
    signal the streaming loops poll (round 10; the full scan was the
    only O(corpus)-per-epoch term left in the ingest loop when the
    drift hook was on). Each epoch appended its own (cell, epoch, n)
    counts from the SAME celled-survivor frame the vector store
    received, so folding the ledger — duplicate (cell, epoch) rows
    from replays collapse first, exactly the line store's read
    discipline — reproduces the exact signal: sums per cell over a
    k x epochs ledger, never the survivors themselves. Returns None
    when the ledger is absent (a pre-r10 state dir, or epochs run
    without ``epoch=``) — callers fall back to the full scan; the
    first `semantic_reseed` writes the next generation's complete
    baseline and the fast path takes over, or `semantic_counts_seed`
    backfills the CURRENT generation's baseline up front (one
    survivor scan) so adopted dirs never pay the per-epoch scan."""
    from pyspark.sql import functions as F

    from lisp_batch_processor_spark.sources.writers import (
        store_data_path)
    gen = semantic_current_gen(spark, state_dir)
    df = _sem_counts_frame(spark, state_dir, gen["gen"])
    if df is None:
        return None
    occ = (df
           .groupBy("cell")
           .agg(F.sum("n").alias("n"))
           .agg(F.count(F.lit(1)).alias("occ"),
                F.sum("n").alias("total"),
                F.max("n").alias("mx"))
           .first())
    if gen.get("k") is not None:
        k = int(gen["k"])
    else:
        cdp = store_data_path(
            spark, _sem_paths(state_dir, gen["gen"])[0])
        k = spark.read.parquet(cdp).count() if cdp else 0
    total = int(occ["total"] or 0)
    return {"gen": gen["gen"], "k": int(k),
            "cells_occupied": int(occ["occ"] or 0),
            "vectors": total,
            "max_cell": int(occ["mx"] or 0),
            "mean_cell": (total / k) if k else 0.0}


def semantic_counts_seed(spark, state_dir: str) -> bool:
    """Backfill the O(k) occupancy ledger for an ADOPTED pre-r10
    semantic state dir: ONE survivor-store scan writes the CURRENT
    generation's complete epoch −1 baseline (the same k-row aggregate
    a reseed writes), so `semantic_cell_occupancy_fast` takes over
    immediately instead of the dir paying the full scan every epoch
    until its first drift-triggered reseed. Returns True when the
    baseline was written, False when the ledger already exists — a
    present ledger is COMPLETE by invariant (`semantic_ingest_epoch`
    drops it on any untagged epoch), so re-seeding it would double
    the baseline. Replay duplicates in the vector store collapse on
    distinct vec_id, matching the full scan. Single-writer window —
    MACHINE-CHECKED (round 12): the backfill holds the maintenance
    lease on the ledger root for its whole scan+append+meta window,
    the same dest every ``epoch=``-tagged `semantic_ingest_epoch`
    leases across its appends, so racing a live stream raises
    `sources.writers.LeaseHeldError` on one side instead of relying
    on this paragraph; subsequent ``epoch=``-tagged epochs append to
    the backfilled ledger exactly as to a reseed-written one.

    REPLAY-SAFE VIA A HORIZON: the baseline counts the vector store
    as of NOW — which includes the vectors of a crashed-before-
    commit epoch whose checkpoint REPLAY will re-run and append its
    own tagged ledger rows (new rows: the ledger did not exist when
    the epoch first ran, so the (cell, epoch) dedup cannot collapse
    them). The backfill therefore records the state_dir's recorded
    high-water epoch H as ``baseline_through_epoch`` in the ledger's
    meta sidecar, and every ledger read (`_sem_counts_frame`)
    excludes tagged rows <= H — monotonic epochs guarantee all
    POST-backfill epochs tag > H, so only the replay's double-count
    window is masked.

    THE HORIZON'S RESIDUAL WINDOW, DETECTED WHERE POSSIBLE (round 12,
    ADVICE): H is recorded at epoch START, so a crash between that
    meta PUT and the epoch's vector-store append leaves H recorded
    with NO vectors behind it — a backfill then masks rows <= H while
    the replay's vectors land after the baseline, permanently
    undercounting that epoch in the fast signal. Whether epoch H
    committed is decidable from the stream's checkpoint (offsets/H
    without commits/H = the crash window), and the recorded lineage
    token IS the checkpoint location under the `start_ingest_stream`
    strong default — so when the token resolves, the backfill probes
    it and REFUSES the crash window (restart the stream so the replay
    commits, then backfill). A legacy opaque token can't be probed;
    the residual window stays documented-only there."""
    from lisp_batch_processor_spark.sources.writers import (
        read_json_file, release_lease, store_data_path,
        store_is_versioned, versioned_store_init, write_json_file)
    sd = state_dir.rstrip("/")
    gen = semantic_current_gen(spark, sd)["gen"]
    if _sem_counts_data_path(spark, sd, gen) is not None:
        return False
    _, vec_path = _sem_paths(sd, gen)
    vec_dp = store_data_path(spark, vec_path)
    if vec_dp is None:
        raise ValueError(f"no vector store under {state_dir} "
                         "(create with semantic_store_seed)")
    cc_path = _sem_counts_path(sd, gen)
    lin = read_json_file(spark, _ingest_lineage_path(sd),
                         default=None, absent=None)
    horizon = (int(lin["high_water_epoch"])
               if isinstance(lin, dict)
               and lin.get("high_water_epoch") is not None else -1)
    probed = True
    if horizon >= 0 and isinstance(lin, dict):
        probed = _counts_seed_probe_checkpoint(
            spark, sd, lin.get("lineage"), horizon)
    owner = _acquire_role_lease(spark, cc_path, "counts-seed-")
    try:
        if store_is_versioned(spark, vec_path):
            versioned_store_init(spark, cc_path)
        survivors = (spark.read.parquet(vec_dp)
                     .select("vec_id", "cell")
                     .dropDuplicates(["vec_id"]))
        _sem_counts_append(survivors, cc_path, -1)
        # probe_skipped arms the ONE-TIME post-backfill reconciliation
        # (round 13, closing the opaque-token residual): when the
        # crash-window probe could not run, the first tagged epoch
        # after this backfill compares the fast signal against the
        # full scan once and raises on divergence instead of leaving
        # the uncommitted-high-water undercount silent forever.
        write_json_file(spark, _sem_counts_meta_path(sd, gen),
                        {"baseline_through_epoch": horizon,
                         "probe_skipped": (not probed and horizon >= 0)})
        # A fresh backfill re-arms the check: a DONE marker left by a
        # PREVIOUS backfill's reconciliation must not disarm this
        # one's (this ledger has a new residual to verify).
        from lisp_batch_processor_spark.sources.writers import (
            _hadoop_fs)
        jvm, fs, _ = _hadoop_fs(spark, sd)
        fs.delete(jvm.org.apache.hadoop.fs.Path(
            _sem_counts_reconciled_path(sd, gen)), False)
    finally:
        release_lease(spark, cc_path, owner)
    return True


def _counts_seed_probe_checkpoint(spark, sd: str,
                                  lineage, horizon: int) -> bool:
    """Refuse `semantic_counts_seed` when the stream's checkpoint
    shows the recorded high-water epoch H STARTED but never COMMITTED
    (offsets/H present, commits/H absent): in that window the
    backfill cannot know whether H's vectors reached the store, and
    recording horizon H over a not-yet-landed epoch permanently
    undercounts it in the fast signal (see the caller's docstring).
    Only probes when the lineage token resolves to a readable
    checkpoint layout — the `start_ingest_stream` default. Returns
    True when the probe VERIFIED epoch H committed, False when it
    could not decide (opaque token, unreachable path, no offsets
    entry) — the caller then arms the one-time post-backfill
    reconciliation instead of leaving the residual documented-only
    (round 13)."""
    if not lineage:
        return False
    from py4j.protocol import Py4JJavaError

    from lisp_batch_processor_spark.sources.writers import _hadoop_fs
    ckpt = str(lineage).rstrip("/")
    try:
        jvm, fs, _ = _hadoop_fs(spark, ckpt)
        mkpath = jvm.org.apache.hadoop.fs.Path
        if not fs.exists(mkpath(f"{ckpt}/offsets/{horizon}")):
            return False  # not a checkpoint layout (or cleaned up)
        committed = fs.exists(mkpath(f"{ckpt}/commits/{horizon}"))
    except (Py4JJavaError, ValueError):
        return False  # unreachable/foreign-scheme token: can't probe
    if not committed:
        raise ValueError(
            f"ingest state at {sd} records high-water epoch "
            f"{horizon}, but its checkpoint ({ckpt}) shows that "
            "batch started and never committed — the backfill can't "
            "know whether the epoch's vectors reached the store, and "
            "a wrong horizon would permanently undercount it in the "
            "fast occupancy signal. Restart the stream so the replay "
            "commits epoch "
            f"{horizon}, then run semantic_counts_seed")
    return True


def semantic_reseed(spark, state_dir: str, *,
                    k: int | None = None,
                    target_cell: int | None = None,
                    iters: int = 1,
                    epoch: int | None = None) -> int:
    """Retrain the semantic cell model as a NEW GENERATION — the
    drift loop for the fixed-IVF trade (`semantic_store_seed` trains
    once; at fixed k, cell occupancy grows linearly with survivors
    and the within-cell verify term with its square — re-sizing k at
    re-seed is the knob, mirroring the quantile stores' generational
    retrain, operators/sketches.py):

    1. read the CURRENT generation's survivors (one distinct-vec_id
       pass over the vector store — replay duplicates collapse),
    2. train gen g+1 centroids on them (`similarity.ivf_train`;
       ``k`` explicit, or derived as ceil(survivors / target_cell),
       or carried over from the current model),
    3. re-cell the survivors ENGINE-SIDE against the new model (one
       Arrow matmul scan — vectors are re-celled, never re-embedded),
    4. write both gen-(g+1) stores plus the gen-(g+1) cell-count
       ledger's complete epoch −1 baseline (suffixed sibling roots,
       same backend as the current generation), then COMMIT with one
       generation-marker PUT — the atomic switch: a crash anywhere
       before the PUT leaves readers on generation g with both of
       its stores intact (stale g+1 dirs are overwritten by the
       retry), and the marker carries ``epoch`` so a REPLAYED reseed
       (same triggering epoch) reuses its generation instead of
       training g+2,
    5. vacuum generations OLDER than g (readers get one full
       generation of grace, the vacuum_keep=2 discipline).

    Returns the committed generation id. Single-writer window
    required (the ``reseed_max_cell`` hook in
    `streaming_semantic_ingest` runs it inside foreachBatch, which
    IS that window). Dedup semantics across the switch: already-
    emitted assignments are never retracted; later epochs dedup
    against the SAME survivor set under the new model — each
    generation's epoch segment stays pinned to the batch twin with
    that generation's centroids."""
    from pyspark.sql import functions as F

    from lisp_batch_processor_spark.operators.similarity import (
        _ivf_cells_udf, ivf_train)
    from lisp_batch_processor_spark.sources.writers import (
        _hadoop_fs, store_append, store_data_path, store_is_versioned,
        versioned_store_init, write_json_file)

    if k is not None and k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if target_cell is not None and target_cell < 1:
        raise ValueError(f"target_cell must be >= 1, got {target_cell}")
    sd = state_dir.rstrip("/")
    cur = semantic_current_gen(spark, sd)
    g = cur["gen"]
    if (epoch is not None and cur.get("epoch") is not None
            and int(cur["epoch"]) == int(epoch)):
        # Replayed trigger: this epoch's reseed already committed.
        return g
    cent_path, vec_path = _sem_paths(sd, g)
    vec_dp = store_data_path(spark, vec_path)
    if vec_dp is None:
        raise ValueError(f"no vector store under {state_dir} "
                         "(create with semantic_store_seed)")
    survivors = (spark.read.parquet(vec_dp)
                 .select("vec_id", "embedding")
                 .dropDuplicates(["vec_id"])
                 .localCheckpoint(eager=True))  # feeds train + re-cell
    if k is None:
        if target_cell is not None:
            n = survivors.count()
            k = max(1, -(-n // int(target_cell)))
        else:
            k = len(semantic_read_centroids(spark, sd))
    cents = ivf_train(survivors, k=int(k), iters=iters)
    new_g = g + 1
    ncent, nvec = _sem_paths(sd, new_g)
    ncc = _sem_counts_path(sd, new_g)
    versioned = store_is_versioned(spark, vec_path)
    jvm, fs, _ = _hadoop_fs(spark, sd)
    for pth in (ncent, nvec, ncc):  # stale dirs from a crashed attempt
        fs.delete(jvm.org.apache.hadoop.fs.Path(pth), True)
        if versioned:
            versioned_store_init(spark, pth)
    # The new generation's ledger is reseed-written (complete by
    # construction, isolated by the generation bump) — no backfill
    # horizon applies; clear any stale sidecar from a crashed attempt.
    fs.delete(jvm.org.apache.hadoop.fs.Path(
        _sem_counts_meta_path(sd, new_g)), False)
    fs.delete(jvm.org.apache.hadoop.fs.Path(
        _sem_counts_reconciled_path(sd, new_g)), False)
    store_append(
        spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
            "cell int, embedding array<double>"),
        ncent)
    one_cell = _ivf_cells_udf(cents, 1)
    recelled = (survivors.select(
        "vec_id", one_cell("embedding")[0].alias("cell"), "embedding")
        .localCheckpoint(eager=True))  # one matmul pass, two writes
    store_append(recelled, nvec)
    # The new generation's COMPLETE occupancy baseline at epoch −1 —
    # also the ADOPTION path: a pre-r10 state dir gains its first
    # ledger here and `semantic_cell_occupancy_fast` takes over.
    _sem_counts_append(recelled, ncc, -1)
    # COMMIT: one NEW sequence-named marker file switches readers to
    # (centroids, vectors) of generation new_g together. Never an
    # in-place overwrite — a torn create is invalid JSON that
    # semantic_current_gen's walk steps past (back to gen g, whose
    # stores are intact); a torn leftover from a crashed attempt of
    # THIS generation is deleted before the fresh create.
    jm = jvm.org.apache.hadoop.fs.Path(_sem_gen_marker(sd, new_g))
    fs.delete(jm, False)
    write_json_file(spark, _sem_gen_marker(sd, new_g),
                    {"gen": new_g, "k": len(cents),
                     "epoch": None if epoch is None else int(epoch)})
    # Vacuum generations older than the PREVIOUS one — stores,
    # markers (the legacy single-file marker is superseded too), and
    # any backfill-horizon sidecar of the vacuumed ledger.
    for og in range(0, g):
        for pth in (*_sem_paths(sd, og), _sem_counts_path(sd, og)):
            fs.delete(jvm.org.apache.hadoop.fs.Path(pth), True)
        fs.delete(jvm.org.apache.hadoop.fs.Path(
            _sem_gen_marker(sd, og)), False)
        fs.delete(jvm.org.apache.hadoop.fs.Path(
            _sem_counts_meta_path(sd, og)), False)
        fs.delete(jvm.org.apache.hadoop.fs.Path(
            _sem_counts_reconciled_path(sd, og)), False)
    fs.delete(jvm.org.apache.hadoop.fs.Path(
        f"{sd}/{_SEM_GEN_FILE}"), False)
    return new_g


def streaming_semantic_ingest(stream_emb, state_dir: str, sink,
                              tau: float = 0.95,
                              id_col: str = "vec_id",
                              compact_every: int | None = None,
                              compact_target_bytes: int
                              = 128 * 1024 * 1024,
                              reseed_max_cell: int | None = None,
                              reseed_target_cell: int | None = None,
                              reseed_iters: int = 1,
                              lineage: str | None = None):
    """foreachBatch wrapper over `semantic_ingest_epoch` — the
    streaming twin of the SemDeDup assembly stage, against stores
    seeded by `semantic_store_seed`. ``sink(asg, epoch_id)`` receives
    each epoch's (id_col, rep_id, is_dup) rows. Same foreachBatch
    rationale and checkpointed-replay story as the near-dup twin.

    The centroid model is CACHED across epochs per generation (one
    driver collect per generation, not per epoch — the marker read
    that guards the cache is one tiny JSON get).

    ``compact_every=N`` folds the semantic stores' per-epoch file
    accretion after every Nth epoch (`semantic_store_compact` —
    inside foreachBatch IS the single-writer maintenance window),
    the same self-scheduling hook as every other ingest store.

    ``reseed_max_cell=M`` closes the drift loop: after each epoch's
    append, the O(k)-per-epoch occupancy signal
    (`semantic_cell_occupancy_fast` over the cell-count ledger each
    epoch also appends; full-scan fallback for adopted pre-r10
    state) runs, and when the fullest cell exceeds M survivors,
    `semantic_reseed` commits a new generation (k re-derived from
    ``reseed_target_cell`` when given, else sized from the trigger)
    tagged with this epoch id. ONE STREAM LINEAGE PER STATE_DIR —
    MACHINE-CHECKED since round 10 (`ingest_lineage_check`): the
    reseed tag is matched against raw epoch ids and every membership
    filter assumes monotonic epochs, so an epoch regression (a new
    checkpoint restarting at 0 over old state) or a foreign
    ``lineage`` token (pass the checkpoint location) raises instead
    of silently corrupting either.
    Checkpoint replay of the TRIGGERING epoch is byte-identical
    twice over: the epoch id
    in the marker makes the reseed itself a no-op (no generation
    g+2), and the replayed ASSIGNMENT is pinned back to the previous
    generation — the one it originally ran under, whose stores the
    reseed's one-generation vacuum grace keeps — so the durably
    emitted rows recompute exactly. The cache picks each new model
    up through the marker read."""
    if compact_every is not None and compact_every < 1:
        raise ValueError(f"compact_every must be >= 1, "
                         f"got {compact_every}")
    if reseed_max_cell is not None and reseed_max_cell < 1:
        raise ValueError(f"reseed_max_cell must be >= 1, "
                         f"got {reseed_max_cell}")
    cache: dict = {"gen": None, "cents": None}

    def _process(batch_df, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        use_gen, cents, replayed_trigger = _sem_epoch_model(
            spark, state_dir, int(epoch_id), cache)
        out = semantic_ingest_epoch(batch_df, state_dir, tau=tau,
                                    id_col=id_col,
                                    centroids=cents,
                                    gen=use_gen,
                                    epoch=int(epoch_id),
                                    lineage=lineage)
        sink(out, int(epoch_id))
        if compact_every and (int(epoch_id) + 1) % compact_every == 0:
            semantic_store_compact(
                spark, state_dir,
                target_file_bytes=compact_target_bytes)
        if reseed_max_cell is not None and not replayed_trigger:
            _sem_reseed_if_due(spark, state_dir, int(epoch_id),
                               reseed_max_cell, reseed_target_cell,
                               reseed_iters)

    return stream_emb.writeStream.foreachBatch(_process)


def _sem_epoch_model(spark, state_dir: str, epoch_id: int,
                     cache: dict) -> tuple[int, list, bool]:
    """The shared per-epoch generation resolution for both streaming
    loops: read the marker once, detect the REPLAYED-TRIGGER case
    (the marker's epoch tag equals this epoch — its first run
    committed a reseed AFTER its assignment, so the replay must
    recompute under the PREVIOUS generation, kept by the vacuum
    grace), and serve the centroid model from the per-generation
    ``cache`` (one driver collect per generation, not per epoch).
    Returns (use_gen, centroids, replayed_trigger)."""
    cur = semantic_current_gen(spark, state_dir)
    use_gen = cur["gen"]
    replayed_trigger = (cur.get("epoch") is not None
                        and int(cur["epoch"]) == int(epoch_id))
    if replayed_trigger:
        use_gen = cur["gen"] - 1
    if cache.get("gen") != use_gen:
        cache["cents"] = semantic_read_centroids(spark, state_dir,
                                                 gen=use_gen)
        cache["gen"] = use_gen
    return use_gen, cache["cents"], replayed_trigger


def _sem_reseed_if_due(spark, state_dir: str, epoch_id: int,
                       max_cell: int, target_cell: int | None,
                       iters: int) -> None:
    """The shared occupancy-trigger body for both streaming loops
    (`streaming_semantic_ingest` and
    `pipelines.ingest.streaming_corpus_ingest`): read the occupancy
    signal — the O(k) ledger fold (`semantic_cell_occupancy_fast`)
    when the ledger exists, else the full survivor scan (adopted
    pre-r10 state, until its first reseed writes a baseline) — and
    commit a reseed when the fullest cell exceeds ``max_cell``.
    With no explicit ``target_cell`` the
    reseed aims for a MEAN occupancy of ``max_cell // 2`` — carrying
    k over instead would be degenerate: once survivors exceed
    k * max_cell, the mean (hence the max) can never drop below the
    threshold at the same k, and the trigger would fire a full
    retrain + re-cell after EVERY epoch."""
    occ = semantic_cell_occupancy_fast(spark, state_dir)
    if occ is None:
        occ = semantic_cell_occupancy(spark, state_dir)
    if occ["max_cell"] > max_cell:
        semantic_reseed(spark, state_dir,
                        target_cell=(target_cell if target_cell
                                     is not None
                                     else max(1, max_cell // 2)),
                        iters=iters,
                        epoch=epoch_id)
