"""Type-1 CDC materialization — "latest value wins, no history" —
the upsert companion to `operators.scd`'s type-2 history, persisted
with BUCKETED dynamic overwrite so per-epoch writes are
O(touched buckets), not O(table).

Layout at ``path``::

    current/_ub=<b>/...   the materialized table, hash-partitioned on
                          pmod(xxhash64(key), n_buckets)
    current/_cdc_epoch    last fully-applied epoch id (exactly-once)
    _upsert_meta.json     n_buckets + key columns, written at init —
                          every apply validates against it (a bucket
                          count change would scatter keys)

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


def _recover_bucket_swaps(spark: SparkSession, cur: str) -> None:
    """Repair any bucket-dir swap a crashed apply left half-done:
    every ``._old_<bucket>`` sibling under ``cur`` is a backup from
    an interrupted :func:`sources.writers.staged_swap` — recover its
    destination. Driver-side listing of one directory (O(n_buckets)
    entries max); idempotent."""
    jvm, fs, jcur = _hadoop_fs(spark, cur)
    if not fs.exists(jcur):
        return
    prefix = backup_path(f"{cur}/x").rsplit("/", 1)[1][:-1]  # "._old_"
    for st in fs.listStatus(jcur):
        name = st.getPath().getName()
        if name.startswith(prefix):
            recover_swap(spark, f"{cur}/{name[len(prefix):]}")


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


def _bucket_root(cur: str, b: int) -> str:
    """A versioned-backend bucket's own versioned root. Plain `b=`
    naming (not the hive `_ub=` syntax): the bucket id travels as a
    DATA column in this layout and reads resolve explicit version
    paths, so partition discovery never walks these dirs."""
    return f"{cur}/b={int(b)}"


def _stage_bucketed(df: DataFrame, stage: str) -> None:
    """One partitioned write splitting `df` by bucket into
    ``stage/_pb=<b>/`` dirs, with :data:`BUCKET_COL` kept as a DATA
    column (partitionBy drops its column from the files, so the
    split key is a shadow copy)."""
    (df.withColumn("_pb", F.col(BUCKET_COL))
     .write.mode("overwrite").partitionBy("_pb").parquet(stage))


def _versioned_bucket_paths(spark: SparkSession, cur: str,
                            buckets=None) -> list[str]:
    """Current committed version dir of each (requested) bucket —
    one driver-side listing per bucket, O(n_buckets) total."""
    from lisp_batch_processor_spark.sources.writers import (
        store_data_path)
    jvm, fs, jcur = _hadoop_fs(spark, cur)
    if not fs.exists(jcur):
        return []
    want = None if buckets is None else {int(b) for b in buckets}
    out = []
    for st in fs.listStatus(jcur):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("b=")):
            continue
        if want is not None and int(name[2:]) not in want:
            continue
        dp = store_data_path(spark, f"{cur}/{name}")
        if dp is not None:
            out.append(dp)
    return out


def upsert_init(snapshot: DataFrame, path: str,
                key: str | Sequence[str],
                n_buckets: int = 64,
                backend: str = "swap") -> None:
    """Materialize the initial table state, hash-bucketed on the key.

    ``backend`` picks the publication mechanics (recorded in the
    store meta; every later apply/read routes by it):

    - ``"swap"`` (default): hive-partitioned ``current/_ub=<b>``
      dirs rewritten through per-bucket recoverable staged swaps —
      HDFS/local-FS correct; reads must not race a live writer
      (see upsert_read).
    - ``"versioned"``: each bucket is its own pointer-committed
      versioned root ``current/b=<n>/v_<k>`` with the bucket id as
      a data column. An apply stages all touched buckets in ONE
      partitioned write, then commits each bucket dir under a
      single pointer PUT (`sources.writers.versioned_commit`) — no
      rename atomicity load-bearing, so this is the object-store
      mode, and readers resolve pointers without repair (safe
      concurrently with a live apply).
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if backend not in ("swap", "versioned"):
        raise ValueError(f"backend must be 'swap' or 'versioned', "
                         f"got {backend!r}")
    keys = [key] if isinstance(key, str) else list(key)
    spark = snapshot.sparkSession
    root = path.rstrip("/")
    cur = f"{root}/current"
    bucketed = snapshot.withColumn(BUCKET_COL,
                                   _bucket_col(keys, n_buckets))
    jvm, fs, _ = _hadoop_fs(spark, root)
    if backend == "versioned":
        from lisp_batch_processor_spark.sources.writers import (
            versioned_commit, versioned_store_init)
        stage = staging_path(cur)
        _stage_bucketed(bucketed, stage)
        jstage = jvm.org.apache.hadoop.fs.Path(stage)
        for st in fs.listStatus(jstage):
            name = st.getPath().getName()
            if not name.startswith("_pb="):
                continue
            b = int(name[len("_pb="):])
            versioned_store_init(spark, _bucket_root(cur, b))
            versioned_commit(spark, _bucket_root(cur, b),
                             f"{stage}/{name}")
        fs.delete(jstage, True)
    else:
        bucketed.write.partitionBy(BUCKET_COL).parquet(cur)
    write_epoch_marker(spark, cur, -1, name=_MARKER)
    out = fs.create(jvm.org.apache.hadoop.fs.Path(_meta_path(root)), True)
    try:
        out.write(bytearray(json.dumps(
            {"n_buckets": n_buckets, "key": keys,
             "backend": backend}).encode()))
    finally:
        out.close()


def upsert_read(spark: SparkSession, path: str) -> DataFrame:
    """The current table state (bucket column dropped). Repairs any
    bucket swap a crashed apply left mid-flight first, so a reader
    arriving inside the crash window still sees every bucket.

    SWAP backend: do NOT call concurrently with a live
    apply/compact — the repair step can race an in-flight
    staged_swap and invisibly nest the staged dir (silent loss of
    that bucket's epoch; see `sources.writers.recover_swap`'s
    concurrency contract). Repair is for post-crash reads, when no
    writer is live by definition. VERSIONED backend: reads resolve
    each bucket's committed pointer and never repair — safe
    concurrently with a live apply."""
    meta = _read_meta(spark, path)  # existence check, clear error
    cur = path.rstrip("/") + "/current"
    if meta.get("backend", "swap") == "versioned":
        paths = _versioned_bucket_paths(spark, cur)
        if not paths:
            # An empty-snapshot init creates no bucket stores;
            # spark.read.parquet() with zero paths would raise an
            # opaque schema-inference error here.
            raise ValueError(
                f"versioned upsert table at {path} has no committed "
                "buckets (initialized from an empty snapshot and "
                "never applied to?) — apply a non-empty epoch first")
        return spark.read.parquet(*paths).drop(BUCKET_COL)
    _recover_bucket_swaps(spark, cur)
    return spark.read.parquet(cur).drop(BUCKET_COL)


def upsert_apply(spark: SparkSession, path: str, updates: DataFrame,
                 epoch_id: int = 0) -> bool:
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
    """
    meta = _read_meta(spark, path)
    keys, n_buckets = meta["key"], meta["n_buckets"]
    versioned = meta.get("backend", "swap") == "versioned"
    root = path.rstrip("/")
    cur = f"{root}/current"
    marker = read_epoch_marker(spark, cur, name=_MARKER)
    if marker is not None and marker >= int(epoch_id):
        return False

    upd = (updates.withColumn(BUCKET_COL,
                              _bucket_col(keys, n_buckets))
           .localCheckpoint(eager=True))  # snapshot: feeds 3 plans
    touched = [r[BUCKET_COL]
               for r in upd.select(BUCKET_COL).distinct().collect()]
    if touched and versioned:
        # Read the touched buckets' CURRENT committed versions (a
        # bucket first touched this epoch has no dir yet — it simply
        # contributes no kept rows). A crashed prior attempt of this
        # epoch left only orphaned uncommitted version dirs, which
        # the pointer resolution never sees — no repair step.
        paths = _versioned_bucket_paths(spark, cur, buckets=touched)
        upd_keys = upd.select(
            *[F.col(k).alias(f"_cdc_{k}") for k in keys])
        cond = [F.col(k).eqNullSafe(F.col(f"_cdc_{k}")) for k in keys]
        if paths:
            tcur = spark.read.parquet(*paths)
            kept = tcur.join(upd_keys, cond, "left_anti")
            new = kept.unionByName(upd.select(*kept.columns))
        else:
            new = upd
        stage = staging_path(cur)
        jvm, fs, _ = _hadoop_fs(spark, cur)
        _stage_bucketed(new, stage)
        from lisp_batch_processor_spark.sources.writers import (
            versioned_commit, versioned_store_init, versioned_vacuum)
        for b in touched:  # pmod(xxhash64(...)) is never NULL
            broot = _bucket_root(cur, b)
            versioned_store_init(spark, broot)  # no-op if present
            versioned_commit(spark, broot, f"{stage}/_pb={b}")
            # Keep 2 committed versions per bucket: the new one plus
            # the previous, covering a reader that resolved its
            # pointer just before this commit.
            versioned_vacuum(spark, broot, keep=2)
        fs.delete(jvm.org.apache.hadoop.fs.Path(stage), True)
    elif touched:
        # Repair bucket swaps a crashed replay of this (or any prior
        # uncommitted) epoch left half-done, BEFORE reading state.
        _recover_bucket_swaps(spark, cur)
        current = spark.read.parquet(cur)
        tcur = current.filter(F.col(BUCKET_COL).isin(touched))
        # Null-safe anti-join: a NULL key is a real key and its row
        # must be REPLACED, not duplicated.
        upd_keys = upd.select(
            *[F.col(k).alias(f"_cdc_{k}") for k in keys])
        cond = [F.col(k).eqNullSafe(F.col(f"_cdc_{k}")) for k in keys]
        kept = tcur.join(upd_keys, cond, "left_anti")
        # Stage the touched buckets' full new contents to a hidden
        # sibling (one partitioned write; every touched bucket gets a
        # dir — each has >= 1 update row), then swap each bucket dir
        # in. A stale stage from a crashed attempt is overwritten.
        stage = staging_path(cur)
        jvm, fs, _ = _hadoop_fs(spark, cur)
        (kept.unionByName(upd.select(*kept.columns))
         .write.mode("overwrite").partitionBy(BUCKET_COL)
         .parquet(stage))
        for b in touched:  # pmod(xxhash64(...)) is never NULL
            bucket = f"{BUCKET_COL}={b}"
            staged_swap(spark, f"{stage}/{bucket}", f"{cur}/{bucket}")
        fs.delete(jvm.org.apache.hadoop.fs.Path(stage), True)
    # Marker LAST: it becomes durable only after every touched
    # bucket committed, so a crash anywhere above replays the epoch.
    write_epoch_marker(spark, cur, int(epoch_id), name=_MARKER)
    return True


def _bucket_dirs(spark: SparkSession, path: str) -> list[str]:
    """Every bucket directory ROOT of the table (backend-appropriate
    naming): ``current/_ub=<b>`` for the swap layout, ``current/b=<n>``
    (each its own versioned store root) for the versioned one. One
    driver-side listing, O(n_buckets) entries."""
    meta = _read_meta(spark, path)
    cur = path.rstrip("/") + "/current"
    prefix = ("b=" if meta.get("backend", "swap") == "versioned"
              else f"{BUCKET_COL}=")
    jvm, fs, jcur = _hadoop_fs(spark, cur)
    if not fs.exists(jcur):
        return []
    out = []
    for st in fs.listStatus(jcur):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith(prefix):
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
    small files until compacted. Each bucket routes through
    `sources.writers.compact`, which resolves the bucket's backend
    itself (plain swap dir vs pointer-committed versioned root), so
    the crash-safety story is the backend's own. Buckets whose data
    path already holds fewer than ``min_files`` data files are
    skipped — repeated maintenance passes over a quiet table cost
    one listing, not a rewrite. Returns the number of buckets
    rewritten. Single-writer window only (same contract as
    upsert_apply; the stream applier's ``compact_every`` hook runs
    it inside its own foreachBatch, which IS that window).
    """
    from lisp_batch_processor_spark.sources.writers import (
        compact, store_data_path)

    done = 0
    for broot in _bucket_dirs(spark, path):
        dp = store_data_path(spark, broot)
        if dp is None:
            continue
        jvm, fs, jdp = _hadoop_fs(spark, dp)
        n_data = 0
        for st in fs.listStatus(jdp):
            if not st.getPath().getName().startswith(("_", ".")):
                n_data += 1
        if n_data < min_files:
            continue
        compact(spark, broot, target_file_bytes=target_file_bytes)
        done += 1
    return done


def upsert_stream_apply(update_stream: DataFrame, path: str,
                        order_col: str,
                        tiebreak: Sequence[str] = (),
                        compact_every: int | None = None):
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
        upsert_apply(spark, path, latest, epoch_id=epoch_id)
        if compact_every and (int(epoch_id) + 1) % compact_every == 0:
            upsert_compact(spark, path)

    return update_stream.writeStream.foreachBatch(_process)
