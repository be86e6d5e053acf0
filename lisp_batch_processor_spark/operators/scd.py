"""Slowly-changing-dimension type-2 history maintenance, Spark-first.

Dimension tables change slowly (a supplier moves, a part is
re-priced) and analytics needs BOTH the current value and the value
as-of any past date. Without a transactional table format, Spark has
no MERGE — but SCD2 doesn't need one: each apply is a pure
DataFrame-to-DataFrame transform of (history, updates) → new
history, written via the usual staged overwrite (see
`sources.writers.compact` for the swap pattern). This is the
reference's save-with-verify sink discipline (R22) applied to
versioned rows instead of files.

History schema contract: the caller's key + attribute columns plus
  - ``effective_from`` timestamp — when this version became true
  - ``effective_to``   timestamp — when it stopped (NULL = open)
  - ``is_current``     boolean
As-of lookups are then a plain range predicate
(``effective_from <= t AND (effective_to IS NULL OR t <
effective_to)``) — the `q_join_range` family's shape — and the
current view is ``is_current`` (partition the table on it so the
common case prunes to the open slice).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_init(snapshot: DataFrame, effective_from,
              key: str | Sequence[str] = "key") -> DataFrame:
    """Open a fresh history from an initial snapshot: every row
    becomes the current version effective at `effective_from` (a
    timestamp literal or Column)."""
    eff = (effective_from if isinstance(effective_from, F.Column)
           else F.lit(effective_from).cast("timestamp"))
    return (snapshot
            .withColumn("effective_from", eff)
            .withColumn("effective_to",
                        F.lit(None).cast("timestamp"))
            .withColumn("is_current", F.lit(True)))


def _scd2_merge_frames(open_rows: DataFrame, updates: DataFrame,
                       keys: Sequence[str], attrs: Sequence[str],
                       effective_from: str,
                       share_join: bool = False
                       ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The SCD2 merge core: one full-outer equi-join of the OPEN
    slice against the update batch, split three ways —
    (kept_open, now_closed, inserts). `share_join=True` lazily
    localCheckpoints the joined frame so callers that consume the
    three outputs in SEPARATE write jobs (the split-path layout)
    compute the join once instead of per branch; pure-transform
    callers leave it off to keep the full plan visible."""
    keys = list(keys)
    upd = updates.select(
        *[F.col(c).alias(f"_scd_{c}") for c in keys],
        *[F.col(c).alias(f"_scd_{c}") for c in attrs],
        F.col(effective_from).alias("_scd_eff"))
    cond = [open_rows[k].eqNullSafe(F.col(f"_scd_{k}")) for k in keys]
    # full-outer: open-only rows (no update) pass through; matched
    # rows split on changed; update-only rows are inserts. Presence
    # on each side is decided by never-null markers (is_current /
    # _scd_eff), not key nullability — eqNullSafe lets NULL keys
    # match their own update.
    joined = open_rows.join(upd, cond, "full_outer")
    if share_join:
        joined = joined.localCheckpoint(eager=False)
    marker_open = joined["is_current"].isNotNull()
    marker_upd = F.col("_scd_eff").isNotNull()

    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~joined[a].eqNullSafe(F.col(f"_scd_{a}"))

    hist_cols = list(open_rows.columns)

    kept_open = (joined
                 .filter(marker_open & (~marker_upd | ~changed))
                 .select(*[joined[c] for c in hist_cols]))
    # Close changed rows with the update's timestamp as the end.
    now_closed = (joined
                  .filter(marker_open & marker_upd & changed)
                  .select(
                      *[joined[c] for c in hist_cols
                        if c not in ("effective_to", "is_current")],
                      F.col("_scd_eff").alias("effective_to"),
                      F.lit(False).alias("is_current"))
                  .select(*hist_cols))
    inserts = (joined
               .filter(marker_upd & (~marker_open | changed))
               .select(
                   *[F.col(f"_scd_{k}").alias(k) for k in keys],
                   *[F.col(f"_scd_{a}").alias(a) for a in attrs],
                   F.col("_scd_eff").alias("effective_from"),
                   F.lit(None).cast("timestamp").alias("effective_to"),
                   F.lit(True).alias("is_current"))
               .select(*hist_cols))
    return kept_open, now_closed, inserts


def scd2_apply(history: DataFrame, updates: DataFrame,
               key: str | Sequence[str],
               attrs: Sequence[str],
               effective_from: str = "effective_from") -> DataFrame:
    """Merge a batch of updates into an SCD2 history:

    - a key whose attrs CHANGED: the open row closes
      (``effective_to`` = the update's effective timestamp,
      ``is_current`` = false) and a new open row is inserted;
    - a key whose attrs are UNCHANGED: no-op (idempotent — replaying
      the same batch is a no-op, the retry story for a failed write);
    - a NEW key: inserted as an open row;
    - closed (historical) rows: untouched, by construction.

    ``updates`` carries key + attrs + a NON-NULL ``effective_from``
    (it doubles as the update-side presence marker). Attribute
    comparison is null-safe (NULL == NULL is "unchanged"). With
    multiple updates for one key in a batch, pass the LATEST per key
    (enforce upstream with a row_number window); this function
    asserts nothing about intra-batch ordering.

    Plan shape at scale: ONE equi-join of the open slice against the
    batch (both sides hashed on the key; the open slice is the only
    part of history read — partition the table by ``is_current`` so
    the closed majority is pruned at the scan), then unions. No
    window functions, no shuffle of the closed history.
    """
    keys = [key] if isinstance(key, str) else list(key)
    open_rows = history.filter(F.col("is_current"))
    closed_rows = history.filter(~F.col("is_current"))
    kept_open, now_closed, inserts = _scd2_merge_frames(
        open_rows, updates, keys, attrs, effective_from)
    return (closed_rows
            .unionByName(kept_open)
            .unionByName(now_closed)
            .unionByName(inserts))


def scd2_as_of(history: DataFrame, at) -> DataFrame:
    """The dimension as it was at timestamp `at`: one row per key
    that existed then — the range-predicate read the history layout
    is designed for."""
    t = at if isinstance(at, F.Column) else F.lit(at).cast("timestamp")
    return (history
            .filter((F.col("effective_from") <= t)
                    & (F.col("effective_to").isNull()
                       | (t < F.col("effective_to"))))
            .drop("effective_to", "is_current"))


# ---------------------------------------------------------------------------
# Persisted split-path layout: closed history appends, open slice swaps.
# ---------------------------------------------------------------------------
#
#   <path>/open/              the current open slice (one row per live
#                             key), replaced per apply via the
#                             recoverable staged swap; carries a
#                             `_scd2_epoch` marker file = the last
#                             applied epoch id (exactly-once replay)
#   <path>/closed/epoch_<e>/  the rows CLOSED by epoch e, written once
#                             and never rewritten (append-only history)
#
# Per-epoch bytes written = O(open slice + batch), independent of how
# deep the closed history has grown — the single-path layout rewrote
# the ENTIRE history every epoch, which is O(epochs) per epoch and the
# scale-killer for long-lived dimensions (measured: SCALE.md's SCD2
# table; the closed slice dominates a dimension's footprint ~always).


def _write_epoch_marker(spark, open_path: str, epoch_id: int) -> None:
    from lisp_batch_processor_spark.sources.writers import (
        write_epoch_marker)
    write_epoch_marker(spark, open_path, epoch_id, name="_scd2_epoch")


def _read_epoch_marker(spark, open_path: str) -> int | None:
    from lisp_batch_processor_spark.sources.writers import (
        read_epoch_marker)
    return read_epoch_marker(spark, open_path, name="_scd2_epoch")


def _has_data_files(spark, path: str) -> bool:
    from lisp_batch_processor_spark.sources.writers import _hadoop_fs
    _, fs, jpath = _hadoop_fs(spark, path)
    if not fs.exists(jpath):
        return False
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        name = it.next().getPath().getName()
        if not name.startswith(("_", ".")):
            return True
    return False


def _require_split_layout(spark, root: str) -> None:
    """Raise a clear migration error when ``root`` holds a legacy
    SINGLE-PATH history (data files at the root, no ``open/`` dir —
    the layout scd2_apply callers persisted before the split-path
    store) instead of an opaque 'path does not exist' parquet error
    from deep inside the apply. Same versioned-store discipline as
    the line-dedup store's layout check."""
    from lisp_batch_processor_spark.sources.writers import _hadoop_fs
    jvm, fs, _ = _hadoop_fs(spark, root)
    has_open = fs.exists(
        jvm.org.apache.hadoop.fs.Path(f"{root}/open"))
    if not has_open and _has_data_files(spark, root):
        raise ValueError(
            f"legacy single-path SCD2 history at {root}: the "
            "split-path operators need an open/ + closed/ layout. "
            "Migrate once with scd2_split_init(open_slice, ...) on "
            "the is_current rows plus an append of the closed rows "
            "to <path>/closed/epoch_-1, or keep using scd2_apply "
            "on the old layout.")
    if not has_open:
        raise ValueError(
            f"no split-path SCD2 history at {root} "
            "(seed with scd2_split_init)")


def _scd2_is_versioned(spark, root: str) -> bool:
    from lisp_batch_processor_spark.sources.writers import (
        store_is_versioned)
    return store_is_versioned(spark, f"{root.rstrip('/')}/open")


def _scd2_data_paths(spark, root: str) -> tuple[str, str]:
    """(open_data_path, closed_data_path) through the layout's
    backend: committed version dirs for a versioned history (no
    repair — readers resolve pointers), the plain dirs after swap
    repair otherwise. The epoch marker lives INSIDE the open data
    path either way (for a versioned history it therefore commits
    atomically with the slice, under the one pointer PUT)."""
    from lisp_batch_processor_spark.sources.writers import (
        store_data_path)
    r = root.rstrip("/")
    open_dp = store_data_path(spark, f"{r}/open")
    closed_dp = store_data_path(spark, f"{r}/closed")
    if open_dp is None or closed_dp is None:
        raise ValueError(f"versioned SCD2 history at {r} has no "
                         "committed open/closed data "
                         "(seed with scd2_split_init)")
    return open_dp, closed_dp


def scd2_split_init(snapshot: DataFrame, effective_from, path: str,
                    key: str | Sequence[str] = "key",
                    backend: str = "swap") -> None:
    """Seed a split-path SCD2 history at ``path`` from an initial
    snapshot: the whole snapshot becomes the open slice; the closed
    history starts empty.

    ``backend="versioned"`` publishes the open slice and the closed
    tree through pointer-committed version dirs
    (`sources.writers` store backends) instead of plain dirs + the
    recoverable staged swap: each apply's new open slice (with its
    epoch marker inside) becomes visible under ONE pointer PUT, so
    no rename atomicity is load-bearing — the object-store-safe
    mode, and reads never repair (safe concurrently with a live
    apply). ``"swap"`` (default) keeps the HDFS/local-FS layout.
    """
    if backend not in ("swap", "versioned"):
        raise ValueError(f"backend must be 'swap' or 'versioned', "
                         f"got {backend!r}")
    spark = snapshot.sparkSession
    root = path.rstrip("/")
    open_path = f"{root}/open"
    opened = scd2_init(snapshot, effective_from, key)
    from lisp_batch_processor_spark.sources.writers import _hadoop_fs
    jvm, fs, _ = _hadoop_fs(spark, root)
    if backend == "versioned":
        from lisp_batch_processor_spark.sources.writers import (
            versioned_commit, versioned_publish, versioned_store_init)
        versioned_store_init(spark, open_path)
        versioned_publish(
            spark, opened, open_path,
            finalize=lambda d: _write_epoch_marker(spark, d, -1))
        # The closed tree starts as an EMPTY committed version (epoch
        # dirs append inside the current version between compactions).
        versioned_store_init(spark, f"{root}/closed")
        tmp = f"{root}/._closed_init"
        fs.mkdirs(jvm.org.apache.hadoop.fs.Path(tmp))
        versioned_commit(spark, f"{root}/closed", tmp)
        return
    opened.write.parquet(open_path)
    _write_epoch_marker(spark, open_path, -1)
    fs.mkdirs(jvm.org.apache.hadoop.fs.Path(f"{root}/closed"))


def scd2_read(spark, path: str) -> DataFrame:
    """The full history (closed ∪ open) of a split-path layout — what
    `spark.read.parquet(history_path)` returned for the single-path
    one. Repairs an interrupted open-slice (or closed-tree
    compaction) swap first, so a reader arriving after a crash still
    sees a complete history.

    Closed rows carry the epoch that closed them (``_scd2_epoch``)
    and the read keeps only ``epoch <= marker``: an epoch that
    crashed AFTER writing its closed dir but BEFORE swapping the
    open slice leaves rows for keys that are still open — without
    the filter a reader in that window saw a key both open and
    closed at once. The residue is invisible until the replay
    completes, at which point the marker admits it.
    """
    root = path.rstrip("/")
    # Backend-routed: swap repairs crashed swaps and reads the plain
    # dirs; versioned resolves each side's committed pointer (no
    # repair — safe concurrently with a live apply). Repair runs
    # BEFORE the layout check: mid-crash, `open/` may sit at the
    # backup path and the check would misread the store as legacy.
    open_path, closed_root = _scd2_data_paths(spark, root)
    _require_split_layout(spark, root)
    open_df = spark.read.parquet(open_path)
    if not _has_data_files(spark, closed_root):
        return open_df
    marker = _read_epoch_marker(spark, open_path)
    marker = -1 if marker is None else marker
    closed_df = (spark.read.option("recursiveFileLookup", "true")
                 .option("mergeSchema", "true")
                 .parquet(closed_root))
    if "_scd2_epoch" in closed_df.columns:
        closed_df = (closed_df
                     # NULL = rows written before epoch tagging (or
                     # by scd2_apply-era layouts): always visible.
                     .filter(F.col("_scd2_epoch").isNull()
                             | (F.col("_scd2_epoch") <= F.lit(marker)))
                     .drop("_scd2_epoch"))
    return closed_df.unionByName(open_df)


def scd2_split_apply(spark, path: str, updates: DataFrame,
                     key: str | Sequence[str], attrs: Sequence[str],
                     effective_from: str = "effective_from",
                     epoch_id: int = 0,
                     lineage: str | None = None) -> bool:
    """One SCD2 merge step against the persisted split-path layout —
    same per-key semantics as :func:`scd2_apply`, but the write is
    O(open + batch): the rows this epoch closes APPEND (as
    ``closed/epoch_<id>/``, written before the open slice moves) and
    the new open slice staged-swaps in; the accumulated closed
    history is never read or rewritten.

    Exactly-once under checkpointed epoch replay, by write order:

    1. repair any interrupted swap, read the epoch marker — if
       ``marker >= epoch_id`` the epoch fully applied before the
       crash (the marker travels inside the swapped open dir, so it
       advances only when step 3 completed): skip, return False;
    2. overwrite ``closed/epoch_<id>/`` — replay before the swap
       recomputes the identical frame from the unchanged open slice,
       so the overwrite is idempotent;
    3. write the new open slice + marker to a hidden staging sibling,
       then :func:`sources.writers.staged_swap` it in — a crash
       inside the swap leaves a complete open slice at the canonical
       or backup path (recovered in step 1 next time).

    Monotonically increasing ``epoch_id`` per apply is the caller's
    contract (foreachBatch provides it; batch callers count).
    Returns True if the epoch was applied, False if it already was.

    ``lineage`` (opt-in, round 10 — pass the checkpoint location)
    machine-checks that contract: the marker-skip above cannot tell
    a legitimate replay from a NEW checkpoint restarting at epoch 0
    over this dimension, whose epochs would be silently SKIPPED as
    already-applied until they pass the old high-water mark. With a
    token recorded, an epoch regression or a foreign lineage raises
    (`sources.writers.check_store_epoch_lineage`) BEFORE the marker
    read; tokenless callers keep the exact documented skip behavior.
    """
    from lisp_batch_processor_spark.sources.writers import (
        check_store_epoch_lineage, staged_swap, staging_path,
        versioned_publish, versioned_vacuum)

    keys = [key] if isinstance(key, str) else list(key)
    root = path.rstrip("/")
    if lineage is not None:
        check_store_epoch_lineage(spark, root, int(epoch_id), lineage)
    open_path = f"{root}/open"
    versioned = _scd2_is_versioned(spark, root)
    # Resolves both data paths (and, for a swap layout, repairs any
    # crashed open-slice or closed-tree compaction swap first).
    open_dp, closed_dp = _scd2_data_paths(spark, root)
    _require_split_layout(spark, root)
    marker = _read_epoch_marker(spark, open_dp)
    if marker is not None and marker >= epoch_id:
        return False
    open_rows = spark.read.parquet(open_dp)
    kept_open, now_closed, inserts = _scd2_merge_frames(
        open_rows, updates, keys, attrs, effective_from,
        share_join=True)
    (now_closed
     # Epoch tag: scd2_read shows a closed row only once its epoch's
     # marker is durable (see scd2_read), and scd2_compact_closed
     # folds dirs by it. For a versioned layout the epoch dir lands
     # INSIDE the current closed version (append-only mutation of a
     # committed version — readers see a grow-only set, and the
     # marker filter hides the rows until the open slice commits).
     .withColumn("_scd2_epoch", F.lit(int(epoch_id)))
     .write.mode("overwrite").parquet(
         f"{closed_dp}/epoch_{int(epoch_id)}"))
    new_open = kept_open.unionByName(inserts)
    if versioned:
        # Slice + marker commit together under the one pointer PUT;
        # a crash anywhere before it leaves an orphaned invisible
        # version and the replay re-derives from the previous one.
        versioned_publish(
            spark, new_open, open_path,
            finalize=lambda d: _write_epoch_marker(spark, d, epoch_id))
        versioned_vacuum(spark, open_path, keep=2)
        return True
    # Writer lease across the open-slice swap window: concurrent
    # `scd2_read`/`store_data_path` callers skip repair and resolve
    # the old committed slice (backup path) instead of racing the
    # swap (`sources.writers.recover_swap`'s machine-checked
    # contract). Per-call token; a crashed writer's lease expires.
    import uuid as _uuid

    from lisp_batch_processor_spark.sources.writers import (
        acquire_lease, release_lease)
    owner = acquire_lease(spark, open_path,
                          owner=f"scd2-{_uuid.uuid4().hex[:12]}",
                          ttl_s=3600.0)
    try:
        tmp = staging_path(open_path)
        new_open.write.mode("overwrite").parquet(tmp)
        _write_epoch_marker(spark, tmp, epoch_id)
        staged_swap(spark, tmp, open_path)
    finally:
        release_lease(spark, open_path, owner)
    return True


def scd2_compact_closed(spark, path: str,
                        target_file_bytes: int = 128 * 1024 * 1024
                        ) -> int:
    """Fold the accreted ``closed/epoch_<e>/`` dirs into one
    size-targeted dir — the maintenance pass the append-only layout
    needs (one dir per epoch is exactly the small-file accretion
    `sources.writers.compact` exists for, at the directory grain).
    Returns the number of dirs folded. Run from the single writer's
    maintenance window — never concurrently with an apply.

    Only dirs whose epochs are fully applied fold (epoch <= the open
    slice's marker; ``compact_*`` dirs from earlier passes always
    qualify). A dir from an in-flight/crashed epoch (> marker) is
    carried into the new tree UNCHANGED via rename, so the epoch's
    replay still overwrites it at the same path. The new closed tree
    builds in a hidden staging sibling and swaps in via
    `staged_swap` — every crash window leaves a complete tree at the
    canonical or backup path, repaired by the recover_swap calls in
    scd2_read / scd2_split_apply. Rows keep their ``_scd2_epoch``
    tag, so the marker-filtered read is unaffected.
    """
    import re as _re

    from lisp_batch_processor_spark.sources.writers import (
        _hadoop_fs, staged_swap, staging_path, versioned_commit,
        versioned_vacuum)

    root = path.rstrip("/")
    closed_root = f"{root}/closed"
    versioned = _scd2_is_versioned(spark, root)
    open_dp, closed_dp = _scd2_data_paths(spark, root)
    marker = _read_epoch_marker(spark, open_dp)
    marker = -1 if marker is None else marker

    jvm, fs, _ = _hadoop_fs(spark, closed_root)
    jclosed = jvm.org.apache.hadoop.fs.Path(closed_dp)
    foldable, carry = [], []
    for st in fs.listStatus(jclosed):
        if not st.isDirectory():
            continue
        name = st.getPath().getName()
        m = _re.fullmatch(r"epoch_(-?\d+)", name)
        if name.startswith("compact_") or (
                m and int(m.group(1)) <= marker):
            if _has_data_files(spark, f"{closed_dp}/{name}"):
                foldable.append(name)
        else:
            carry.append(name)
    if len(foldable) < 2:
        return 0  # nothing worth folding

    tmp = staging_path(closed_root)
    jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
    if fs.exists(jtmp):
        fs.delete(jtmp, True)
    folded = (spark.read.option("recursiveFileLookup", "true")
              .option("mergeSchema", "true")
              .parquet(*[f"{closed_dp}/{n}" for n in foldable]))
    size = sum(fs.getContentSummary(
        jvm.org.apache.hadoop.fs.Path(f"{closed_dp}/{n}"))
        .getLength() for n in foldable)
    n_files = max(1, -(-size // target_file_bytes))
    (folded.repartition(n_files)
     .write.parquet(f"{tmp}/compact_{int(marker)}"))
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    for name in carry:
        # Unapplied residue rides along unchanged; invisible to
        # readers either way (marker filter). Versioned: COPY, not
        # rename — the committed version must stay complete until
        # the new tree's pointer lands (a crash after a rename-out
        # would otherwise have mutilated the current version).
        src = jvm.org.apache.hadoop.fs.Path(f"{closed_dp}/{name}")
        dst = jvm.org.apache.hadoop.fs.Path(f"{tmp}/{name}")
        if versioned:
            jvm.org.apache.hadoop.fs.FileUtil.copy(
                fs, src, fs, dst, False, conf)
        else:
            fs.rename(src, dst)
    if versioned:
        versioned_commit(spark, closed_root, tmp)
        versioned_vacuum(spark, closed_root, keep=2)
    else:
        # Same machine-checked writer window as the open-slice swap.
        import uuid as _uuid

        from lisp_batch_processor_spark.sources.writers import (
            acquire_lease, release_lease)
        owner = acquire_lease(
            spark, closed_root,
            owner=f"scd2c-{_uuid.uuid4().hex[:12]}",
            ttl_s=3600.0)
        try:
            staged_swap(spark, tmp, closed_root)
        finally:
            release_lease(spark, closed_root, owner)
    return len(foldable)


def scd2_stream_apply(update_stream: DataFrame, history_path: str,
                      key: str | Sequence[str],
                      attrs: Sequence[str],
                      effective_from: str = "effective_from",
                      compact_every: int | None = None,
                      lineage: str | None = None):
    """Streaming dimension maintenance over the SPLIT-PATH layout
    (seed with :func:`scd2_split_init`, read with :func:`scd2_read`):
    each micro-batch of updates is one :func:`scd2_split_apply` epoch,
    so per-epoch bytes written are O(open slice + batch) while the
    closed history grows append-only — the previous single-path form
    rewrote the FULL history every micro-batch, O(total epochs) per
    epoch on a long-lived dimension.

    The per-epoch work item IS the batch operator, so batch and
    streaming cannot drift (same contract as
    streaming_near_dup_ingest / streaming_line_dedup_ingest). With
    multiple updates for one key in one micro-batch, the LATEST per
    key (by ``effective_from``, ties by attrs) is applied — a batch
    is one merge step, matching scd2_apply's documented contract.

    Returns the DataStreamWriter (caller picks trigger/start and a
    checkpointLocation). Epoch replay after a crash is EXACTLY-ONCE,
    not merely idempotent-by-no-op: the epoch marker inside the open
    slice tells a replay whether the epoch's swap completed (see
    scd2_split_apply's ordering contract), and the swap itself is
    the recoverable rename-aside pattern — every crash window leaves
    a complete open slice readable at the canonical or backup path.

    ``compact_every=N`` runs :func:`scd2_compact_closed` after every
    Nth epoch — inside foreachBatch IS the single-writer maintenance
    window the compactor requires (the same self-scheduling hook as
    the sketch/line stores and the CDC applier), so the closed tree's
    one-dir-per-epoch accretion stays bounded over stream lifetime.
    Replay-safe: only fully-applied epochs fold (epoch <= the open
    slice's marker) and unapplied residue is carried unchanged, so a
    replayed epoch still finds or overwrites its own dir.
    """
    from pyspark.sql import Window

    keys = [key] if isinstance(key, str) else list(key)
    if compact_every is not None and compact_every < 1:
        raise ValueError(f"compact_every must be >= 1, "
                         f"got {compact_every}")

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        # Latest update per key within the micro-batch.
        w = Window.partitionBy(*keys).orderBy(
            F.col(effective_from).desc(),
            *[F.col(a).desc_nulls_last() for a in attrs])
        latest = (batch_df
                  .withColumn("_scd_rn", F.row_number().over(w))
                  .filter(F.col("_scd_rn") == 1).drop("_scd_rn"))
        scd2_split_apply(spark, history_path, latest, keys, attrs,
                         effective_from=effective_from,
                         epoch_id=epoch_id, lineage=lineage)
        if compact_every and (int(epoch_id) + 1) % compact_every == 0:
            scd2_compact_closed(spark, history_path)

    return update_stream.writeStream.foreachBatch(_process)
