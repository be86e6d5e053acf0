"""Type-1 CDC materialization — "latest value wins, no history" —
the upsert companion to `operators.scd`'s type-2 history, persisted
with BUCKETED dynamic overwrite so per-epoch writes are
O(touched buckets), not O(table).

Layout at ``path`` (swap backend)::

    current/_ub=<b>/...   the materialized table, hash-partitioned on
                          pmod(xxhash64(key), n_buckets)
    current/_cdc_epoch    last fully-applied epoch id (exactly-once)
    _upsert_meta.json     n_buckets + key columns + backend, written
                          at init — every apply validates against it
                          (a bucket count change would scatter keys)

Versioned backend (object-store-safe)::

    current/e_<seq>/_pb=<b>/...  immutable bucket data written by
                                 commit <seq> (apply or compaction)
    current/_m_<seq>.json        manifest: full bucket -> dir map +
                                 last-applied epoch id; the single
                                 PUT of this file IS the commit

One manifest PUT commits a whole epoch — data, bucket map, and epoch
marker atomically — regardless of how many buckets it touched, and
readers resolve the highest valid manifest with no repair step.

Why type-1 can rewrite buckets in place where type-2 cannot: an
SCD2 epoch derives NEW rows (the closed versions) from the
PRE-epoch state, so replaying from a half-applied state would lose
them — scd2_split_apply therefore stages and swaps the whole open
slice. A type-1 upsert's post-state per key is a pure function of
(pre-state key row, update row) where the update row simply WINS:
recomputing any bucket from a half-applied state converges to the
same result (already-applied keys are overwritten with the identical
update row). So a crash mid-apply needs no rollback — the epoch
replay re-derives and rewrites the touched buckets idempotently, and
the epoch marker (written only after every bucket committed) makes a
completed epoch's replay a pure skip.

The bucket rewrite itself goes through the recoverable staged swap
(`sources.writers.staged_swap`), one swap per touched bucket dir:
the new contents of every touched bucket materialize in a hidden
staging sibling FIRST, then each bucket dir renames in. Dynamic
partition overwrite would be the built-in alternative, but its
commit deletes each target dir and then renames the staged one
non-atomically (driver-side, per partition) — a crash between the
two leaves that bucket EMPTY, and the marker-less replay would
rebuild it from the update rows alone, silently dropping every
non-updated key in the bucket. With per-bucket swaps every crash
window leaves each touched bucket complete at its canonical or
backup path; the replay repairs it (`recover_swap` over the same
touched set, which is a pure function of the checkpointed batch)
before re-deriving, so the crash unit really is "some buckets new,
some old" — exactly the state the convergence argument covers.

Scale notes: per epoch this reads the touched buckets once (bucket
pruning via the ``_ub`` partition filter), anti-joins them against
the batch on the key (null-safe — NULL is a valid key), unions the
batch, and rewrites ONLY those bucket directories. With B sized so
a bucket ≈ a few HDFS blocks, a small batch against a huge table
writes a small constant share of it. Compact buckets on a schedule
(`sources.writers.compact` per bucket dir) as epochs accrete files.
"""

from __future__ import annotations

import json
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lisp_batch_processor_spark.sources.writers import (
    _hadoop_fs, backup_path, read_epoch_marker, recover_swap,
    staged_swap, staging_path, write_epoch_marker,
)

_MARKER = "_cdc_epoch"
BUCKET_COL = "_ub"


def _recover_bucket_swaps(spark: SparkSession, cur: str,
                          owner: str | None = None) -> bool:
    """Repair any bucket-dir swap a crashed apply left half-done:
    every ``._old_<bucket>`` sibling under ``cur`` is a backup from
    an interrupted :func:`sources.writers.staged_swap` — recover its
    destination. Driver-side listing of one directory (O(n_buckets)
    entries max); idempotent. The writer lease lives at the ``cur``
    level (one apply window covers every touched bucket): repair is
    REFUSED (returns False) while a foreign lease is live — a crash
    leaves no live lease, so post-crash repair always proceeds."""
    from lisp_batch_processor_spark.sources.writers import lease_holder
    holder = lease_holder(spark, cur)
    if holder is not None and holder != owner:
        return False
    jvm, fs, jcur = _hadoop_fs(spark, cur)
    if not fs.exists(jcur):
        return True
    prefix = backup_path(f"{cur}/x").rsplit("/", 1)[1][:-1]  # "._old_"
    for st in fs.listStatus(jcur):
        name = st.getPath().getName()
        if name.startswith(prefix):
            recover_swap(spark, f"{cur}/{name[len(prefix):]}")
    return True


def _bucket_col(keys: Sequence[str], n_buckets: int):
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]),
                  F.lit(n_buckets))


def _meta_path(path: str) -> str:
    return path.rstrip("/") + "/_upsert_meta.json"


def _read_meta(spark: SparkSession, path: str) -> dict:
    jvm, fs, _ = _hadoop_fs(spark, path)
    p = jvm.org.apache.hadoop.fs.Path(_meta_path(path))
    if not fs.exists(p):
        raise ValueError(f"no upsert table at {path} "
                         "(create with upsert_init)")
    stream = fs.open(p)
    try:
        data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    return json.loads(bytes(data).decode())


def _stage_bucketed(df: DataFrame, stage: str) -> None:
    """One partitioned write splitting `df` by bucket into
    ``stage/_pb=<b>/`` dirs, with :data:`BUCKET_COL` kept as a DATA
    column (partitionBy drops its column from the files, so the
    split key is a shadow copy)."""
    (df.withColumn("_pb", F.col(BUCKET_COL))
     .write.mode("overwrite").partitionBy("_pb").parquet(stage))


# ---------------------------------------------------------------------------
# Manifest commits — the versioned backend's publication record.
#
# One epoch = one JSON manifest ``current/_m_<seq>.json`` holding the
# FULL bucket -> data-dir map plus the last-applied epoch id; the
# single-object PUT of that file is the commit point (atomic on every
# store), exactly the discipline `operators.scd.scd2_split_apply`
# uses for its one open-slice pointer. Data dirs ``current/e_<seq>/
# _pb=<b>`` are immutable once written and invisible until a manifest
# references them. This replaces the round-7 per-bucket versioned
# roots (one pointer PUT + init + vacuum PER TOUCHED BUCKET per
# epoch), whose driver round-trips cost 1.52x the swap backend and
# whose keep-2-per-bucket retention held ~2x the files
# (SCALE_VERSIONED_r07) — the manifest commit is O(1) FS operations
# per epoch regardless of touched-bucket count, the epoch id rides
# the manifest (no separate marker PUT, no marker crash window), and
# vacuum reclaims every dir unreferenced by the kept manifests.
# ---------------------------------------------------------------------------

import re as _re_mod

_MANIFEST_RE = _re_mod.compile(r"_m_(\d+)\.json")


def _manifest_seqs(spark: SparkSession, cur: str) -> list[int]:
    """Sequence numbers of every manifest FILE under ``cur`` (valid
    or torn) — one driver-side listing."""
    jvm, fs, jcur = _hadoop_fs(spark, cur)
    if not fs.exists(jcur):
        return []
    out = []
    for st in fs.listStatus(jcur):
        m = _MANIFEST_RE.fullmatch(st.getPath().getName())
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _manifest_latest(spark: SparkSession, cur: str):
    """(seq, manifest) of the highest VALID manifest, or None. A torn
    top manifest (crash mid-PUT — possible only on stores without
    atomic single-object PUT) reads as absent and the walk steps down
    to the previous commit.

    Raises a MIGRATION error instead of returning None when ``cur``
    holds the pre-manifest versioned layout (round-7 per-bucket
    ``b=<n>/v_<k>`` pointer roots): without the check, an old table
    read under the manifest code failed with the misleading "no
    committed buckets (initialized from an empty snapshot?)"."""
    from lisp_batch_processor_spark.sources.writers import read_json_file
    seqs = _manifest_seqs(spark, cur)
    for seq in reversed(seqs):
        d = read_json_file(spark, f"{cur}/_m_{seq}.json")
        if isinstance(d, dict) and "buckets" in d:
            return seq, d
    if not seqs:
        jvm, fs, jcur = _hadoop_fs(spark, cur)
        if fs.exists(jcur):
            for st in fs.listStatus(jcur):
                name = st.getPath().getName()
                if st.isDirectory() and _re_mod.fullmatch(
                        r"b=\d+", name):
                    raise ValueError(
                        f"versioned upsert table at {cur} uses the "
                        "pre-manifest layout (per-bucket b=<n>/v_<k> "
                        "pointer roots); rebuild it with upsert_init "
                        "from a current read of the old table, or "
                        "migrate its bucket dirs into one e_<seq> "
                        "dir plus a _m_<seq>.json manifest")
    return None


def _next_seq(spark: SparkSession, cur: str) -> int:
    """The next unused sequence number: above every manifest file AND
    every ``e_<k>`` data dir, so a crashed commit's orphan dir is
    never reused by the replay."""
    jvm, fs, jcur = _hadoop_fs(spark, cur)
    hi = -1
    if fs.exists(jcur):
        for st in fs.listStatus(jcur):
            name = st.getPath().getName()
            m = _MANIFEST_RE.fullmatch(name)
            if m:
                hi = max(hi, int(m.group(1)))
            elif name.startswith("e_"):
                try:
                    hi = max(hi, int(name[2:]))
                except ValueError:
                    pass
    return hi + 1


def _manifest_commit(spark: SparkSession, cur: str, seq: int,
                     buckets: dict, epoch: int) -> None:
    from lisp_batch_processor_spark.sources.writers import write_json_file
    write_json_file(spark, f"{cur}/_m_{seq}.json",
                    {"epoch": int(epoch), "buckets": buckets})


def _manifest_vacuum(spark: SparkSession, cur: str,
                     keep: int = 2) -> int:
    """Reclaim everything the ``keep`` highest valid manifests no
    longer reference: older/torn manifest files, data dirs superseded
    by later rewrites of their bucket, and orphan ``e_<k>`` dirs from
    crashed commits. ``keep=2`` (upsert_init's ``vacuum_keep``
    default) pins the previous commit's dirs for a reader that
    resolved its manifest just before the current PUT (the
    `sources.writers.versioned_vacuum` contract — the concurrent-
    reader mode); ``keep=1`` holds files at swap parity but makes
    reads single-reader-window (the previous commit's dirs vanish
    the moment the new manifest is durable). Both are crash-safe for
    the single writer (vacuum runs only after the new manifest is
    durable). Returns the number of paths deleted; single-writer
    window only."""
    from lisp_batch_processor_spark.sources.writers import read_json_file
    if keep < 1:
        raise ValueError(f"keep must be >= 1, got {keep}")
    seqs = _manifest_seqs(spark, cur)
    kept_refs: set[str] = set()
    kept_seqs: list[int] = []
    for seq in reversed(seqs):
        if len(kept_seqs) == keep:
            break
        d = read_json_file(spark, f"{cur}/_m_{seq}.json")
        if isinstance(d, dict) and "buckets" in d:
            kept_seqs.append(seq)
            kept_refs.update(d["buckets"].values())
    if not kept_seqs:
        return 0
    jvm, fs, jcur = _hadoop_fs(spark, cur)
    removed = 0
    for st in fs.listStatus(jcur):
        name = st.getPath().getName()
        m = _MANIFEST_RE.fullmatch(name)
        if m and int(m.group(1)) not in kept_seqs:
            # Superseded commits below the keep window AND torn
            # files from crashed PUTs (the single-writer window
            # means nothing above the writer's own commit is live).
            fs.delete(st.getPath(), False)
            removed += 1
        elif (st.isDirectory() and name.startswith("e_")):
            live = 0
            for ch in fs.listStatus(st.getPath()):
                cname = ch.getPath().getName()
                if not cname.startswith("_pb="):
                    continue
                if f"{name}/{cname}" in kept_refs:
                    live += 1
                else:
                    fs.delete(ch.getPath(), True)
                    removed += 1
            if live == 0:
                fs.delete(st.getPath(), True)
    return removed


def upsert_init(snapshot: DataFrame, path: str,
                key: str | Sequence[str],
                n_buckets: int = 64,
                backend: str = "swap",
                vacuum_keep: int = 2) -> None:
    """Materialize the initial table state, hash-bucketed on the key.

    ``backend`` picks the publication mechanics (recorded in the
    store meta; every later apply/read routes by it):

    - ``"swap"`` (default): hive-partitioned ``current/_ub=<b>``
      dirs rewritten through per-bucket recoverable staged swaps —
      HDFS/local-FS correct; reads must not race a live writer
      (see upsert_read).
    - ``"versioned"``: immutable data dirs ``current/e_<seq>/_pb=<b>``
      (bucket id kept as a data column) published under ONE
      manifest-file PUT per epoch (``current/_m_<seq>.json`` — the
      full bucket -> dir map plus the applied epoch id, the same
      single-pointer commit discipline as `operators.scd`'s open
      slice). No rename atomicity is load-bearing and commit cost is
      O(1) FS operations per epoch regardless of touched-bucket
      count, so this is the object-store mode; readers resolve the
      highest valid manifest and never repair.

    ``vacuum_keep`` (versioned only) is how many committed manifests
    each apply's vacuum retains. The default 2 is the CONCURRENT-
    READER mode the backend is for: the previous commit's dirs
    survive one full apply, so a reader (or a lazily-evaluated
    DataFrame upsert_read already returned) that resolved its
    manifest just before the writer's PUT still opens live files —
    at up to 2x file retention when an epoch touches every bucket.
    ``vacuum_keep=1`` keeps on-disk files at parity with the swap
    backend (everything unreferenced by the CURRENT manifest is
    reclaimed right after the commit) and remains fully crash-safe
    for the single writer — but it deletes the previous commit's
    dirs immediately, so reads are then only safe BETWEEN applies
    (single-reader-window, same contract as the swap backend).
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if backend not in ("swap", "versioned"):
        raise ValueError(f"backend must be 'swap' or 'versioned', "
                         f"got {backend!r}")
    if vacuum_keep < 1:
        raise ValueError(f"vacuum_keep must be >= 1, got {vacuum_keep}")
    keys = [key] if isinstance(key, str) else list(key)
    spark = snapshot.sparkSession
    root = path.rstrip("/")
    cur = f"{root}/current"
    bucketed = snapshot.withColumn(BUCKET_COL,
                                   _bucket_col(keys, n_buckets))
    jvm, fs, _ = _hadoop_fs(spark, root)
    if backend == "versioned":
        stage = staging_path(cur)
        jstage = jvm.org.apache.hadoop.fs.Path(stage)
        if fs.exists(jstage):
            fs.delete(jstage, True)
        _stage_bucketed(bucketed, stage)
        fs.mkdirs(jvm.org.apache.hadoop.fs.Path(cur))
        if not fs.rename(jstage,
                         jvm.org.apache.hadoop.fs.Path(f"{cur}/e_0")):
            raise IOError(f"rename {stage} -> {cur}/e_0 failed")
        bmap = {}
        for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(
                f"{cur}/e_0")):
            name = st.getPath().getName()
            if name.startswith("_pb="):
                bmap[name[len("_pb="):]] = f"e_0/{name}"
        _manifest_commit(spark, cur, 0, bmap, -1)
    else:
        bucketed.write.partitionBy(BUCKET_COL).parquet(cur)
        write_epoch_marker(spark, cur, -1, name=_MARKER)
    out = fs.create(jvm.org.apache.hadoop.fs.Path(_meta_path(root)), True)
    try:
        out.write(bytearray(json.dumps(
            {"n_buckets": n_buckets, "key": keys,
             "backend": backend,
             "vacuum_keep": int(vacuum_keep)}).encode()))
    finally:
        out.close()


def upsert_read(spark: SparkSession, path: str) -> DataFrame:
    """The current table state (bucket column dropped). Repairs any
    bucket swap a crashed apply left mid-flight first, so a reader
    arriving inside the crash window still sees every bucket.

    SWAP backend: a read arriving while a live apply/compact holds
    the table's writer lease raises
    `sources.writers.LeaseHeldError` instead of racing the swap
    window (a mid-swap listing could silently miss a bucket, and
    reader-side repair could nest the in-flight staged dir — the
    lease machine-checks the single-writer contract; retry after
    the writer releases). Post-crash reads see no live lease
    (crashed writers' leases expire) and repair as before.
    VERSIONED backend: reads resolve the committed manifest and
    never repair — safe concurrently with a live apply WHEN the
    table was initialized with ``vacuum_keep >= 2`` (the default):
    the previous commit's dirs survive one full apply, so a reader
    that resolved its manifest just before the writer's PUT still
    opens live files. ``vacuum_keep=1`` (the swap-file-parity mode)
    reclaims the previous commit's dirs immediately after each
    manifest PUT, so a concurrent reader — or a lazily-evaluated
    DataFrame this function already returned — can fail mid-job
    with FileNotFoundException; treat keep=1 tables as
    single-reader-window, same as the swap backend."""
    meta = _read_meta(spark, path)  # existence check, clear error
    cur = path.rstrip("/") + "/current"
    if meta.get("backend", "swap") == "versioned":
        latest = _manifest_latest(spark, cur)
        if latest is None or not latest[1]["buckets"]:
            # An empty-snapshot init commits an empty bucket map;
            # spark.read.parquet() with zero paths would raise an
            # opaque schema-inference error here.
            raise ValueError(
                f"versioned upsert table at {path} has no committed "
                "buckets (initialized from an empty snapshot and "
                "never applied to?) — apply a non-empty epoch first")
        paths = [f"{cur}/{rel}" for rel in latest[1]["buckets"].values()]
        return spark.read.parquet(*paths).drop(BUCKET_COL)
    from lisp_batch_processor_spark.sources.writers import (
        LeaseHeldError, lease_holder)
    holder = lease_holder(spark, cur)
    if holder is not None:
        raise LeaseHeldError(
            f"upsert table at {path} is mid-apply (lease held by "
            f"{holder!r}); retry after the writer releases, or use "
            "the versioned backend for concurrent reads")
    if not _recover_bucket_swaps(spark, cur):
        # A writer acquired the lease between the check above and
        # the repair call — silently skipping repair here would let
        # the read proceed mid-apply and miss a bucket.
        raise LeaseHeldError(
            f"upsert table at {path} went mid-apply during read "
            "setup (a writer acquired the lease); retry after the "
            "writer releases")
    return spark.read.parquet(cur).drop(BUCKET_COL)


def upsert_apply(spark: SparkSession, path: str, updates: DataFrame,
                 epoch_id: int = 0,
                 lineage: str | None = None) -> bool:
    """One upsert epoch: every update row replaces the current row
    with its key (or inserts). ``updates`` carries the table schema
    with AT MOST one row per key (resolve intra-batch order upstream,
    as in scd2_stream_apply's latest-per-key window). Returns True if
    applied, False if the epoch marker shows it already was.

    Exactly-once per the module docstring: marker skip for completed
    epochs, convergent idempotent rewrite for interrupted ones —
    the touched buckets' new contents stage to a hidden sibling and
    swap in dir-by-dir via the recoverable staged swap, so no crash
    window ever leaves a bucket empty or half-written.

    Durability note (cluster deployments): the ``localCheckpoint``
    below snapshots the update batch to EXECUTOR-LOCAL storage so
    the three downstream plans (touched-bucket collect, anti-join,
    union) share one computation. Losing an executor mid-epoch then
    fails the write job — an availability cost, not a correctness
    one: the epoch marker hasn't advanced, so the caller's replay
    re-applies convergently. Pipelines that can't afford the retry
    should swap in a reliable ``df.checkpoint()`` (HDFS-backed via
    ``sparkContext.setCheckpointDir``) at a latency cost.

    ``lineage`` (opt-in, round 10 — pass the checkpoint location)
    machine-checks the monotonic-epoch contract the marker skip
    assumes: a NEW checkpoint restarting at epoch 0 over this table
    would have its epochs silently SKIPPED as already-applied until
    they pass the old marker. With a token recorded, an epoch
    regression or a foreign lineage raises
    (`sources.writers.check_store_epoch_lineage`) before the marker
    read; tokenless callers keep the exact documented skip behavior.
    """
    if lineage is not None:
        from lisp_batch_processor_spark.sources.writers import (
            check_store_epoch_lineage)
        check_store_epoch_lineage(spark, path.rstrip("/"),
                                  int(epoch_id), lineage)
    meta = _read_meta(spark, path)
    keys, n_buckets = meta["key"], meta["n_buckets"]
    versioned = meta.get("backend", "swap") == "versioned"
    root = path.rstrip("/")
    cur = f"{root}/current"
    if versioned:
        latest = _manifest_latest(spark, cur)
        if latest is None:
            raise ValueError(f"versioned upsert table at {path} has "
                             "no committed manifest (create with "
                             "upsert_init)")
        mf = latest[1]
        if int(mf.get("epoch", -1)) >= int(epoch_id):
            return False
    else:
        marker = read_epoch_marker(spark, cur, name=_MARKER)
        if marker is not None and marker >= int(epoch_id):
            return False

    upd = (updates.withColumn(BUCKET_COL,
                              _bucket_col(keys, n_buckets))
           .localCheckpoint(eager=True))  # snapshot: feeds 3 plans
    touched = [r[BUCKET_COL]
               for r in upd.select(BUCKET_COL).distinct().collect()]
    if versioned:
        # Derive the touched buckets' new contents from the CURRENT
        # manifest's dirs (a bucket first touched this epoch has no
        # entry yet — it simply contributes no kept rows), stage them
        # in one partitioned write, move the stage to an immutable
        # e_<seq> dir, and commit the whole epoch under ONE manifest
        # PUT carrying the epoch id. A crashed prior attempt left at
        # most an orphaned e_<k> dir (and possibly a torn manifest),
        # which the valid-manifest walk never resolves — no repair
        # step, and the replay is a pure function of the previous
        # committed state. The vacuum call keeps the previous
        # commit's dirs for any in-flight reader and reclaims
        # everything older, so file counts track the swap backend's.
        bmap = dict(mf["buckets"])
        if touched:
            paths = [f"{cur}/{bmap[str(int(b))]}" for b in touched
                     if str(int(b)) in bmap]
            upd_keys = upd.select(
                *[F.col(k).alias(f"_cdc_{k}") for k in keys])
            cond = [F.col(k).eqNullSafe(F.col(f"_cdc_{k}"))
                    for k in keys]
            if paths:
                tcur = spark.read.parquet(*paths)
                kept = tcur.join(upd_keys, cond, "left_anti")
                new = kept.unionByName(upd.select(*kept.columns))
            else:
                new = upd
            stage = staging_path(cur)
            jvm, fs, _ = _hadoop_fs(spark, cur)
            jstage = jvm.org.apache.hadoop.fs.Path(stage)
            if fs.exists(jstage):
                fs.delete(jstage, True)  # stale crashed attempt
            _stage_bucketed(new, stage)
            seq = _next_seq(spark, cur)
            if not fs.rename(jstage, jvm.org.apache.hadoop.fs.Path(
                    f"{cur}/e_{seq}")):
                raise IOError(f"rename {stage} -> {cur}/e_{seq} failed")
            for b in touched:  # pmod(xxhash64(...)) is never NULL
                bmap[str(int(b))] = f"e_{seq}/_pb={int(b)}"
            _manifest_commit(spark, cur, seq, bmap, int(epoch_id))
        else:
            # Empty batch: record epoch progression under the same
            # single-PUT commit (unchanged bucket map).
            _manifest_commit(spark, cur, _next_seq(spark, cur),
                             bmap, int(epoch_id))
        _manifest_vacuum(spark, cur,
                         keep=int(meta.get("vacuum_keep", 2)))
        return True
    if touched:
        # Writer lease across the whole multi-bucket window: readers
        # and their repair calls refuse to touch the table while it
        # is live (upsert_read raises; _recover_bucket_swaps skips),
        # which machine-checks the single-writer contract that used
        # to be documentation only. Per-call token; a hard-crashed
        # writer's lease expires, after which post-crash repair and
        # replay proceed as before.
        import uuid as _uuid

        from lisp_batch_processor_spark.sources.writers import (
            acquire_lease, release_lease)
        owner = acquire_lease(
            spark, cur, owner=f"upsert-{_uuid.uuid4().hex[:12]}",
            ttl_s=3600.0)
        try:
            # Repair bucket swaps a crashed replay of this (or any
            # prior uncommitted) epoch left half-done, BEFORE
            # reading state.
            _recover_bucket_swaps(spark, cur, owner=owner)
            current = spark.read.parquet(cur)
            tcur = current.filter(F.col(BUCKET_COL).isin(touched))
            # Null-safe anti-join: a NULL key is a real key and its
            # row must be REPLACED, not duplicated.
            upd_keys = upd.select(
                *[F.col(k).alias(f"_cdc_{k}") for k in keys])
            cond = [F.col(k).eqNullSafe(F.col(f"_cdc_{k}"))
                    for k in keys]
            kept = tcur.join(upd_keys, cond, "left_anti")
            # Stage the touched buckets' full new contents to a
            # hidden sibling (one partitioned write; every touched
            # bucket gets a dir — each has >= 1 update row), then
            # swap each bucket dir in. A stale stage from a crashed
            # attempt is overwritten.
            stage = staging_path(cur)
            jvm, fs, _ = _hadoop_fs(spark, cur)
            (kept.unionByName(upd.select(*kept.columns))
             .write.mode("overwrite").partitionBy(BUCKET_COL)
             .parquet(stage))
            for b in touched:  # pmod(xxhash64(...)) is never NULL
                bucket = f"{BUCKET_COL}={b}"
                staged_swap(spark, f"{stage}/{bucket}",
                            f"{cur}/{bucket}")
            fs.delete(jvm.org.apache.hadoop.fs.Path(stage), True)
            # Marker LAST: it becomes durable only after every
            # touched bucket committed, so a crash anywhere above
            # replays the epoch.
            write_epoch_marker(spark, cur, int(epoch_id),
                               name=_MARKER)
        finally:
            release_lease(spark, cur, owner)
    else:
        write_epoch_marker(spark, cur, int(epoch_id), name=_MARKER)
    return True


def _bucket_dirs(spark: SparkSession, path: str) -> list[str]:
    """Every bucket's current data directory: ``current/_ub=<b>``
    dirs for the swap layout (one listing), the latest manifest's
    referenced dirs for the versioned one (one manifest read)."""
    meta = _read_meta(spark, path)
    cur = path.rstrip("/") + "/current"
    if meta.get("backend", "swap") == "versioned":
        latest = _manifest_latest(spark, cur)
        if latest is None:
            return []
        return [f"{cur}/{rel}"
                for rel in sorted(latest[1]["buckets"].values())]
    jvm, fs, jcur = _hadoop_fs(spark, cur)
    if not fs.exists(jcur):
        return []
    out = []
    for st in fs.listStatus(jcur):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith(f"{BUCKET_COL}="):
            out.append(f"{cur}/{name}")
    return out


def upsert_compact(spark: SparkSession, path: str,
                   target_file_bytes: int = 128 * 1024 * 1024,
                   min_files: int = 2) -> int:
    """Fold each bucket of the upsert table into size-targeted files
    — the maintenance pass the module docstring schedules ("compact
    buckets as epochs accrete files"): every apply rewrites its
    touched buckets as one file PER WRITE TASK, so a bucket touched
    by wide shuffles carries up to `spark.sql.shuffle.partitions`
    small files until compacted. Swap buckets route through
    `sources.writers.compact` (recoverable staged swap per bucket);
    versioned buckets rewrite into a fresh ``e_<seq>`` dir and
    commit under ONE manifest PUT for the whole pass, same as an
    apply. Buckets whose data path already holds fewer than
    ``min_files`` data files are skipped — repeated maintenance
    passes over a quiet table cost one listing, not a rewrite.
    Returns the number of buckets rewritten. Single-writer window
    only (same contract as upsert_apply; the stream applier's
    ``compact_every`` hook runs it inside its own foreachBatch,
    which IS that window).
    """
    from lisp_batch_processor_spark.sources.writers import (
        compact, store_data_path)

    def _n_data_files(dp: str) -> int:
        jvm, fs, jdp = _hadoop_fs(spark, dp)
        n = 0
        for st in fs.listStatus(jdp):
            if not st.getPath().getName().startswith(("_", ".")):
                n += 1
        return n

    meta = _read_meta(spark, path)
    if meta.get("backend", "swap") == "versioned":
        cur = path.rstrip("/") + "/current"
        latest = _manifest_latest(spark, cur)
        if latest is None:
            return 0
        bmap = dict(latest[1]["buckets"])
        todo = [(b, f"{cur}/{rel}") for b, rel in sorted(bmap.items())
                if _n_data_files(f"{cur}/{rel}") >= min_files]
        if not todo:
            return 0
        jvm, fs, _ = _hadoop_fs(spark, cur)
        stage = staging_path(cur)
        jstage = jvm.org.apache.hadoop.fs.Path(stage)
        if fs.exists(jstage):
            fs.delete(jstage, True)
        for b, dp in todo:
            size = fs.getContentSummary(
                jvm.org.apache.hadoop.fs.Path(dp)).getLength()
            n_files = max(1, -(-size // target_file_bytes))
            (spark.read.parquet(dp).repartition(n_files)
             .write.parquet(f"{stage}/_pb={b}"))
        seq = _next_seq(spark, cur)
        if not fs.rename(jstage, jvm.org.apache.hadoop.fs.Path(
                f"{cur}/e_{seq}")):
            raise IOError(f"rename {stage} -> {cur}/e_{seq} failed")
        for b, _dp in todo:
            bmap[b] = f"e_{seq}/_pb={b}"
        # Compaction advances the manifest, never the epoch id.
        _manifest_commit(spark, cur, seq, bmap,
                         int(latest[1].get("epoch", -1)))
        _manifest_vacuum(spark, cur,
                         keep=int(meta.get("vacuum_keep", 2)))
        return len(todo)

    # Hold the TABLE-level lease across the per-bucket pass: a
    # reader checking the table lease must see the whole compaction
    # as one writer window, not fall between two bucket rewrites
    # (each inner `compact` additionally takes its own bucket-level
    # lease via store_publish_rewrite — harmlessly nested).
    import uuid as _uuid

    from lisp_batch_processor_spark.sources.writers import (
        acquire_lease, release_lease)
    cur = path.rstrip("/") + "/current"
    owner = acquire_lease(spark, cur,
                          owner=f"compact-{_uuid.uuid4().hex[:12]}",
                          ttl_s=3600.0)
    done = 0
    try:
        for broot in _bucket_dirs(spark, path):
            dp = store_data_path(spark, broot)
            if dp is None:
                continue
            if _n_data_files(dp) < min_files:
                continue
            compact(spark, broot, target_file_bytes=target_file_bytes)
            done += 1
    finally:
        release_lease(spark, cur, owner)
    return done


def upsert_stream_apply(update_stream: DataFrame, path: str,
                        order_col: str,
                        tiebreak: Sequence[str] = (),
                        compact_every: int | None = None,
                        lineage: str | None = None):
    """Streaming type-1 maintenance: each micro-batch upserts into
    the persisted table, latest-per-key within the batch decided by
    ``order_col`` (desc, NULLs last) then ``tiebreak``. Returns the
    DataStreamWriter; use a checkpointLocation — epoch replay is a
    marker skip or a convergent rewrite (see upsert_apply).

    ``compact_every=N`` runs :func:`upsert_compact` after every Nth
    epoch — inside foreachBatch IS the single-writer maintenance
    window the compactor requires (the same self-scheduling hook as
    the sketch/line stores), so per-bucket file counts stay bounded
    over stream lifetime with no external scheduler. Replay-safe:
    compaction rewrites identical rows, and a replayed epoch whose
    marker already advanced skips the apply but may re-compact —
    a no-op rewrite at worst.
    """
    if compact_every is not None and compact_every < 1:
        raise ValueError(f"compact_every must be >= 1, "
                         f"got {compact_every}")

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        from pyspark.sql import Window

        spark = batch_df.sparkSession
        keys = _read_meta(spark, path)["key"]
        w = Window.partitionBy(*keys).orderBy(
            F.col(order_col).desc_nulls_last(),
            *[F.col(t).desc_nulls_last() for t in tiebreak])
        latest = (batch_df
                  .withColumn("_cdc_rn", F.row_number().over(w))
                  .filter(F.col("_cdc_rn") == 1).drop("_cdc_rn"))
        upsert_apply(spark, path, latest, epoch_id=epoch_id,
                     lineage=lineage)
        if compact_every and (int(epoch_id) + 1) % compact_every == 0:
            upsert_compact(spark, path)

    return update_stream.writeStream.foreachBatch(_process)
