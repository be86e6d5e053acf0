"""Writers — the reference's sink surface, Spark-first.

The reference saves each file with QSAVE + CLOSE + a hand-rolled
poll-and-retry verify (`Batch Processor.py:347-374`, R22). Spark's
commit protocol (stage to _temporary, rename on task/job commit)
replaces all of that machinery; what remains worth engineering is
LAYOUT — partitioning and bucketing decide whether downstream reads
prune and whether downstream joins shuffle.
"""

from __future__ import annotations

import posixpath
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


# ---------------------------------------------------------------------------
# Recoverable staged swap — the rewrite-in-place discipline shared by
# `compact` and `operators.scd.scd2_stream_apply`.
# ---------------------------------------------------------------------------

def _hadoop_fs(spark: SparkSession, path: str):
    """(jvm, fs, jpath) for a path string via the JVM Hadoop FS API —
    driver-side metadata operations only."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, jpath.getFileSystem(conf), jpath


def _hidden_sibling(path: str, tag: str) -> str:
    """A dot-prefixed sibling of `path` (`parent/._<tag>_<basename>`).
    Dot-prefixed names are invisible to Spark's file listing AND are
    never mistaken for a hive partition directory — staging as
    `table/date=x._compacting` (a sibling whose name extends the
    partition value) made in-flight output discoverable and could
    break partition-value parsing for readers of the table root."""
    p = path.rstrip("/")
    parent, base = posixpath.split(p)
    return posixpath.join(parent, f"._{tag}_{base}")


def staging_path(path: str) -> str:
    """Where a staged rewrite of `path` materializes before the swap."""
    return _hidden_sibling(path, "staging")


def backup_path(path: str) -> str:
    """Where the previous copy of `path` lives during the swap window."""
    return _hidden_sibling(path, "old")


def write_json_file(spark: SparkSession, path: str, obj) -> None:
    """Write `obj` as one small JSON file at `path` (driver-side
    Hadoop FS create, overwrite) — THE sidecar/manifest writer, so
    the create/write idiom exists once."""
    import json as _json
    jvm, fs, _ = _hadoop_fs(spark, path)
    out = fs.create(jvm.org.apache.hadoop.fs.Path(path), True)
    try:
        out.write(bytearray(_json.dumps(obj).encode()))
    finally:
        out.close()


def read_json_file(spark: SparkSession, path: str,
                   default=None, absent=None):
    """Read a small JSON file written by `write_json_file`. Returns
    `absent` when the file does not exist and `default` when it
    exists but is torn/corrupt (partial crash write, bad checksum) —
    distinct sentinels because callers treat "never written" and
    "crashed mid-write" differently."""
    import json as _json
    from py4j.protocol import Py4JJavaError
    jvm, fs, _ = _hadoop_fs(spark, path)
    p = jvm.org.apache.hadoop.fs.Path(path)
    if not fs.exists(p):
        return absent
    try:
        stream = fs.open(p)
        try:
            data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        finally:
            stream.close()
        return _json.loads(bytes(data).decode())
    except (ValueError, Py4JJavaError):
        return default


# Interchangeable object-store scheme spellings addressing the SAME
# physical location: Hadoop's s3/s3a/s3n connectors all resolve
# s3*://bucket/key to one S3 object space, and gs/gcs both name Google
# Cloud Storage. wasb/abfs address DIFFERENT services and are not
# aliased. Used by the lineage comparison below and by
# `streaming.dedup._lineage_token` so a resume respelling only the
# scheme never reads as a foreign lineage (round 12).
_SCHEME_ALIASES = {"s3a": "s3", "s3n": "s3", "gcs": "gs"}


def _lineage_canon(token: str) -> str:
    """Scheme-alias-insensitive form of a lineage token for EQUALITY
    comparison: URI spellings map scheme aliases to one canonical
    scheme and drop a trailing slash; anything else (opaque tokens,
    local paths — already canonicalized at token-generation time)
    compares as itself. Comparison-side canonicalization, not just
    token-generation-side, so a token RECORDED before the alias map
    existed (e.g. ``s3a://b/ckpt``) still matches the same location's
    new canonical spelling instead of falsely raising on upgrade."""
    from urllib.parse import urlparse
    t = str(token).rstrip("/") or str(token)
    u = urlparse(t)
    if u.scheme in ("", "file") or not u.netloc:
        return t
    sch = _SCHEME_ALIASES.get(u.scheme.lower(), u.scheme.lower())
    return f"{sch}://{u.netloc}{u.path}"


def _check_epoch_lineage(meta: dict, epoch_id: int,
                         lineage: str | None, what: str) -> bool:
    """Enforce the monotonic-epoch / one-lineage contract against
    (and update) a store's ``meta`` dict in place; returns True when
    the caller must persist the updated meta. Rules: a recorded
    lineage only ever matches itself (a caller passing None skips
    the token comparison — back-compat for direct epoch calls — but
    never weakens the epoch check); the epoch must be >= the
    recorded high-water mark (EQUAL is the checkpoint-replay path,
    strictly greater is progress). Every epoch-tagged store here
    assumes this contract — strictly-earlier membership filters,
    replay dedup on epoch tags, and epoch-tagged generation markers
    are all silently corrupted by a NEW checkpoint restarting at
    epoch 0 over OLD state, which is exactly the operator error this
    turns into an error."""
    changed = False
    rec = meta.get("lineage")
    if lineage is not None:
        if rec is None:
            meta["lineage"] = str(lineage)
            changed = True
        elif _lineage_canon(rec) != _lineage_canon(lineage):
            raise ValueError(
                f"{what} belongs to stream lineage {rec!r} but this "
                f"epoch was tagged lineage {lineage!r}: one stream "
                "lineage per state — a new checkpoint over old state "
                "violates the strictly-earlier epoch semantics every "
                "epoch-tagged store assumes (seed a fresh state dir, "
                "or resume the original checkpoint)")
    hw = meta.get("high_water_epoch")
    e = int(epoch_id)
    if hw is None or e > int(hw):
        meta["high_water_epoch"] = e
        changed = True
    elif e < int(hw):
        raise ValueError(
            f"{what} already ingested up to epoch {int(hw)} but this "
            f"epoch is {e}: an epoch regression means a NEW checkpoint "
            "is restarting over OLD state — its strictly-earlier "
            "membership filters would silently re-admit every "
            "previously-seen key (seed a fresh state dir, or resume "
            "the original checkpoint)")
    return changed


def check_store_epoch_lineage(spark: SparkSession, store_root: str,
                              epoch_id: int,
                              lineage: str | None = None,
                              on_adopt=None) -> bool:
    """The STORE-scoped monotonic-epoch / one-lineage check: meta in
    a hidden sibling of ``store_root`` (`_check_epoch_lineage` for
    the rules). One tiny JSON get per epoch plus one PUT per
    PROGRESSING epoch. A torn meta (crash mid-PUT) reads as absent
    and re-records — fail-open, like every meta sidecar here: the
    contract's target is the operator error (restarted checkpoint
    over live state), where the meta is intact.

    STALE-SIDECAR ADOPTION (round 11): the sidecar lives OUTSIDE the
    store dir, so deleting/rebuilding the store at the same path does
    not clear it by itself. A pin that would raise while the store
    has NO committed data files is phantom history from a deleted
    store — the check adopts the new stream as fresh instead of
    raising (one driver-side listing, paid only on the would-raise
    path; steady state stays one JSON get). Deliberate rebuilds can
    also clear the pin up front via :func:`store_lineage_reset` (the
    sketch stores' `operators.sketches.sketch_store_init` does).

    Returns True when the stale-pin adoption path ran (the new stream
    was adopted as fresh over a dataless store), else False — so
    callers with SIBLING state that likewise outlives store deletion
    (the generational bounds store next to a quantile count store)
    can clear that phantom history in the same step; leaving it would
    resume the rebuilt stream under the deleted store's generations
    (round 12, ADVICE).

    ``on_adopt``, when passed, runs at the moment adoption is DECIDED
    but BEFORE the new pin is persisted (round 13, ADVICE): sibling
    phantom-history clears must precede the pin PUT, because a crash
    between the PUT and a post-hoc clear would leave the replayed
    epoch matching the new pin — adoption never re-fires and the
    phantom siblings survive permanently. With the clear inside this
    window, every crash point retries: before the clear nothing is
    persisted (the old pin re-adopts), after it the clear is an
    idempotent delete."""
    mp = _hidden_sibling(store_root.rstrip("/"), "lineage")
    meta = read_json_file(spark, mp, default=None, absent=None)
    if not isinstance(meta, dict):
        meta = {}
    adopted = False
    try:
        changed = _check_epoch_lineage(meta, epoch_id, lineage,
                                       f"store at {store_root}")
    except ValueError:
        if _store_has_data_files(spark, store_root):
            raise
        if on_adopt is not None:
            on_adopt()
        meta = {}
        adopted = True
        changed = _check_epoch_lineage(meta, epoch_id, lineage,
                                       f"store at {store_root}")
    if changed:
        write_json_file(spark, mp, meta)
    return adopted


def _store_has_data_files(spark: SparkSession, root: str) -> bool:
    """Whether the store at ``root`` has any committed, non-hidden
    data file — the 'is this pin guarding anything real' probe behind
    `check_store_epoch_lineage`'s stale-sidecar adoption."""
    dp = store_data_path(spark, root.rstrip("/"))
    if dp is None:
        return False
    jvm, fs, _ = _hadoop_fs(spark, dp)
    jdp = jvm.org.apache.hadoop.fs.Path(dp)
    if not fs.exists(jdp):
        return False
    for st in fs.listStatus(jdp):
        if not st.getPath().getName().startswith((".", "_")):
            return True
    return False


def store_lineage_reset(spark: SparkSession, store_root: str) -> None:
    """Forget a store's recorded epoch/lineage pin (the hidden
    sidecar `check_store_epoch_lineage` maintains). The sidecar lives
    OUTSIDE the store dir precisely so it survives careless store
    deletion — which also means a DELIBERATE rebuild at the same path
    must clear it explicitly; this is the public hook for that
    (`operators.sketches.sketch_store_init` calls it, making init the
    documented rebuild entry point). Never call it over a live store
    mid-stream: the pin IS the restart-at-0 guard there."""
    jvm, fs, _ = _hadoop_fs(spark, store_root.rstrip("/"))
    fs.delete(jvm.org.apache.hadoop.fs.Path(
        _hidden_sibling(store_root.rstrip("/"), "lineage")), False)


def write_epoch_marker(spark: SparkSession, dir_path: str,
                       epoch_id: int,
                       name: str = "_epoch") -> None:
    """Persist the last-applied epoch id as a tiny underscore-file
    inside ``dir_path`` (invisible to Spark's readers) — the
    exactly-once token for epoch-replayed maintenance loops: a
    replay reads it first and skips epochs whose effects are already
    durable. Callers decide WHERE it lives so the marker's
    durability is atomic with the data it describes (e.g. written
    into a staged dir BEFORE the swap that publishes both)."""
    jvm, fs, _ = _hadoop_fs(spark, dir_path)
    p = jvm.org.apache.hadoop.fs.Path(dir_path.rstrip("/") + "/" + name)
    out = fs.create(p, True)
    try:
        out.write(bytearray(str(int(epoch_id)).encode()))
    finally:
        out.close()


def read_epoch_marker(spark: SparkSession, dir_path: str,
                      name: str = "_epoch") -> int | None:
    jvm, fs, _ = _hadoop_fs(spark, dir_path)
    p = jvm.org.apache.hadoop.fs.Path(dir_path.rstrip("/") + "/" + name)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    return int(bytes(data).decode())


class LeaseHeldError(IOError):
    """Another writer holds an unexpired lease on this swap store."""


def lease_path(dest: str) -> str:
    """Where `dest`'s writer-lease file lives during an apply/compact
    window (a dot-prefixed sibling, invisible to Spark readers)."""
    return _hidden_sibling(dest, "lease")


def _default_owner() -> str:
    import os as _os
    import socket as _socket
    return f"{_socket.gethostname()}:{_os.getpid()}"


# Torn-lease fallback expiry must cover the LONGEST window any
# writer acquires (the data-rewrite sites use ttl_s=3600): a lower
# fallback would strip a still-running writer of its exclusion the
# moment its lease file happened to tear.
_LEASE_DEFAULT_TTL_S = 3600.0


def lease_holder(spark: SparkSession, dest: str) -> str | None:
    """The owner of a LIVE (unexpired) lease on `dest`, else None.
    A torn lease file (crash mid-PUT) reads as held by an unknown
    owner until the file's mtime + the default TTL passes — fail
    safe (never repair under doubt) but never wedged forever. The
    fallback TTL equals the largest ttl_s the maintenance writers
    use (3600 s), so a torn file never expires before a live writer's
    declared window would have."""
    import time as _time
    lp = lease_path(dest)
    d = read_json_file(spark, lp, default="_torn_", absent=None)
    if d is None:
        return None
    if not isinstance(d, dict):
        d = {}
    owner = d.get("owner", "<torn-lease>")
    try:
        expires = float(d["expires"])
    except (KeyError, TypeError, ValueError):
        from py4j.protocol import Py4JJavaError
        jvm, fs, _ = _hadoop_fs(spark, lp)
        try:
            expires = (fs.getFileStatus(
                jvm.org.apache.hadoop.fs.Path(lp))
                .getModificationTime() / 1000.0
                + _LEASE_DEFAULT_TTL_S)
        except Py4JJavaError:
            return None  # vanished between reads: released
    return owner if _time.time() < expires else None


def _create_json_exclusive(spark: SparkSession, path: str, obj) -> bool:
    """Create `path` holding `obj` as JSON iff it does not already
    exist (``fs.create(path, overwrite=False)`` — atomic
    create-exclusive on HDFS; the local filesystem raises the same
    FileAlreadyExistsException). Returns False when the path exists,
    so a caller racing another creator LOSES instead of silently
    overwriting the winner."""
    import json as _json

    from py4j.protocol import Py4JJavaError
    jvm, fs, _ = _hadoop_fs(spark, path)
    try:
        out = fs.create(jvm.org.apache.hadoop.fs.Path(path), False)
    except Py4JJavaError as e:
        if "AlreadyExists" in str(e) or "already exists" in str(e):
            return False
        raise
    try:
        out.write(bytearray(_json.dumps(obj).encode()))
    finally:
        out.close()
    return True


def acquire_lease(spark: SparkSession, dest: str,
                  owner: str | None = None,
                  ttl_s: float = 3600.0) -> str:
    """Take the single-writer lease on `dest` for ``ttl_s`` seconds
    and return the owner token. Reentrant per owner (the default
    owner is host:pid, so a writer retrying after an in-process
    failure reacquires its own lease); an unexpired FOREIGN lease
    raises :class:`LeaseHeldError` — the caller must wait for expiry
    or for the other writer's release. An expired lease (its writer
    crashed and never released) is stolen.

    ATOMICITY: the lease file is written with create-exclusive
    (never an overwriting PUT), so two writers racing an absent
    lease cannot both "acquire" — exactly one create succeeds and
    the loser re-reads the winner and raises. Stealing an expired
    lease first removes the dead file via an atomic RENAME to a
    unique tombstone (only one stealer's rename succeeds), then
    verifies the tombstoned content really was the dead lease it
    read — a fresh lease created by a racer in the read-to-rename
    window is renamed back (or, if the racer already re-created,
    their new file keeps exclusion) and the steal raises. Every
    path to "acquired" therefore passes through a create-exclusive
    this owner won.

    Pair with :func:`release_lease` in a try/finally. Size
    ``ttl_s`` to the window's WORST CASE (the maintenance writers
    here use 1h for data rewrites): an expired lease is stealable,
    so a still-running writer whose lease lapsed loses its
    exclusion. A long writer can refresh by reacquiring with its
    own owner token mid-window. This is the machine-checked form of
    the single-writer window every swap-store maintenance writer
    already required by contract: :func:`recover_swap` refuses
    reader-side repair while a foreign lease is live, closing the
    repair-vs-live-writer nesting race documented there."""
    import time as _time
    import uuid as _uuid
    me = owner or _default_owner()
    lp = lease_path(dest)
    jvm, fs, _ = _hadoop_fs(spark, dest)
    jlp = jvm.org.apache.hadoop.fs.Path(lp)
    for _ in range(3):
        holder = lease_holder(spark, dest)
        if holder is not None and holder != me:
            raise LeaseHeldError(
                f"{dest} is leased by {holder!r}; wait for its "
                "release or expiry before writing")
        if holder == me:
            # Mid-window refresh of my own LIVE lease: overwrite in
            # place. The rename-away path below would leave the file
            # transiently ABSENT — a window where a concurrent
            # reader's recover_swap sees no holder and repairs inside
            # my live rewrite, the exact race the lease closes. An
            # overwrite's worst crash state is a torn file, which
            # reads fail-safe as held; and no one steals a live
            # lease, so nothing can be clobbered.
            write_json_file(spark, lp,
                            {"owner": me,
                             "expires": _time.time() + ttl_s})
            return me
        if fs.exists(jlp):
            # Residual DEAD file (expired, or torn past the mtime
            # TTL — lease_holder returned None for it). Remove it
            # atomically via rename so two stealers cannot both
            # clear-and-recreate.
            tomb = f"{lp}.tomb.{_uuid.uuid4().hex[:8]}"
            jtomb = jvm.org.apache.hadoop.fs.Path(tomb)
            if not fs.rename(jlp, jtomb):
                continue  # another steal got there first; re-read
            d = read_json_file(spark, tomb, default="_torn_",
                               absent=None)
            fresh_foreign = False
            if d == "_torn_":
                # Can't prove the renamed file is the dead one we
                # read (a racer's fresh create could have landed in
                # between, torn only by ITS in-flight write). The
                # file's mtime disambiguates — rename preserves it:
                # older than the fallback TTL means the long-dead
                # torn lease we decided to steal (delete it — the
                # old overwrite semantics; a torn file must not
                # wedge the store forever once expired); recent
                # means possibly a racer's mid-write file — restore
                # and fail safe.
                from py4j.protocol import Py4JJavaError
                try:
                    mtime = (fs.getFileStatus(jtomb)
                             .getModificationTime() / 1000.0)
                    fresh_foreign = (_time.time()
                                     < mtime + _LEASE_DEFAULT_TTL_S)
                except Py4JJavaError:
                    fresh_foreign = True
            elif isinstance(d, dict):
                try:
                    live = _time.time() < float(d["expires"])
                except (KeyError, TypeError, ValueError):
                    live = False
                fresh_foreign = live and d.get("owner") != me
            if fresh_foreign:
                if not fs.rename(jtomb, jlp):
                    # The racer already re-created their lease; their
                    # exclusion is intact — drop our tombstone.
                    fs.delete(jtomb, False)
                raise LeaseHeldError(
                    f"{dest} was leased concurrently; wait for the "
                    "holder's release or expiry before writing")
            fs.delete(jtomb, False)
        if _create_json_exclusive(
                spark, lp, {"owner": me,
                            "expires": _time.time() + ttl_s}):
            return me
        # Lost the create race — loop to read the winner and raise.
    raise LeaseHeldError(
        f"could not acquire lease on {dest}: repeated contention")


def release_lease(spark: SparkSession, dest: str, owner: str) -> None:
    """Release `owner`'s lease on `dest` (no-op if absent or held by
    someone else — a stolen-after-expiry lease must not be deleted
    by the crashed original writer's late release).

    Removal is rename-then-verify, not read-then-delete: a stealer
    replacing the file between this owner's read and its delete
    would otherwise lose ITS live lease to the late release (the
    same race shape acquire_lease closes). The tombstoned content is
    checked — anyone else's lease is renamed back (or, if the other
    writer already re-created, left to their new file) and only this
    owner's file is actually removed."""
    import uuid as _uuid
    lp = lease_path(dest)
    d = read_json_file(spark, lp, default={})
    if d is None or d.get("owner") != owner:
        return
    jvm, fs, _ = _hadoop_fs(spark, dest)
    jlp = jvm.org.apache.hadoop.fs.Path(lp)
    tomb = f"{lp}.tomb.{_uuid.uuid4().hex[:8]}"
    jtomb = jvm.org.apache.hadoop.fs.Path(tomb)
    if not fs.rename(jlp, jtomb):
        return  # already released or replaced — nothing of ours left
    d2 = read_json_file(spark, tomb, default=None, absent=None)
    if not (isinstance(d2, dict) and d2.get("owner") == owner):
        # We grabbed someone else's (or a torn) lease — restore it.
        if not fs.rename(jtomb, jlp):
            fs.delete(jtomb, False)
        return
    fs.delete(jtomb, False)


def recover_swap(spark: SparkSession, dest: str,
                 owner: str | None = None) -> bool:
    """Repair an interrupted :func:`staged_swap` on `dest`:

    - dest missing, backup present  -> rename the backup in (the
      crash hit between rename-aside and rename-in);
    - dest present, backup present  -> the crash hit after rename-in;
      the backup is a stale previous copy — delete it.

    Idempotent; call before any read or rewrite of a swap-managed
    dataset (compact and scd2_stream_apply both do). Returns True
    when the path is repaired (or needed no repair), False when
    repair was REFUSED because a live foreign writer lease exists.

    CONCURRENCY: repair is only safe when no writer is live. A
    reader's recover_swap racing a LIVE writer's staged_swap can
    restore the backup between the writer's rename-aside and
    rename-in; the writer's rename then moves the staged dir INSIDE
    the restored dest (Hadoop rename-into-existing-dir semantics,
    returns true) — invisible nesting, silent data loss. That
    contract is now MACHINE-CHECKED: writers hold a lease
    (:func:`acquire_lease`) across the window, and this function
    skips repair while a foreign lease is live (``owner`` lets the
    lease holder itself repair). A backup found with no live lease
    is a real crash residue (writers release only after deleting the
    backup; a crashed writer's lease expires) — repair proceeds.
    Readers needing full concurrency with maintenance should still
    prefer the versioned backend (:func:`versioned_publish` —
    readers never repair, so there is no race to have).
    """
    jvm, fs, jdest = _hadoop_fs(spark, dest)
    jold = jvm.org.apache.hadoop.fs.Path(backup_path(dest))
    if fs.exists(jold):
        holder = lease_holder(spark, dest)
        if holder is not None and holder != owner:
            # owner=None (a reader) never repairs under ANY live
            # lease; a writer repairs only under its own.
            return False
        if fs.exists(jdest):
            fs.delete(jold, True)
        else:
            fs.rename(jold, jdest)
    return True


def staged_swap(spark: SparkSession, tmp: str, dest: str) -> None:
    """Swap a fully-written staged dir into place:
    rename dest -> backup, rename tmp -> dest, delete backup.

    NOT atomic as a sequence (each HDFS rename is, the triple is
    not), but every crash window leaves a COMPLETE copy at either
    `dest` or :func:`backup_path`, which :func:`recover_swap`
    restores — the previous delete-then-rename order had a window
    with nothing readable at the canonical path. On object stores
    directory rename is copy+delete (neither atomic nor cheap); use
    :func:`versioned_publish` (rename-free pointer-file commits) or
    a manifest-committing table format there instead of this.
    """
    jvm, fs, jdest = _hadoop_fs(spark, dest)
    jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
    jold = jvm.org.apache.hadoop.fs.Path(backup_path(dest))
    if fs.exists(jold):
        fs.delete(jold, True)  # stale leftover from a repaired crash
    if fs.exists(jdest):
        if not fs.rename(jdest, jold):
            raise IOError(f"rename {dest} -> {backup_path(dest)} failed")
    if not fs.rename(jtmp, jdest):
        raise IOError(f"rename {tmp} -> {dest} failed")
    fs.delete(jold, True)


# ---------------------------------------------------------------------------
# Versioned publication — the object-store-safe alternative to
# staged_swap. HDFS renames are atomic; object-store "renames" are
# copy+delete, so every rename-based swap has a non-atomic window
# there (the staged_swap docstring's caveat). This primitive uses NO
# renames: each publish writes a fresh immutable version dir and then
# creates one pointer file, and readers resolve the highest pointer.
# A single-object PUT is atomic on every store.
#
#   <table>/v_<n>/        immutable data of version n
#   <table>/_v_<n>.ptr    created only after version n's write
#                         committed — the existence of the pointer IS
#                         the commit record
#
# Crash windows: during the data write -> no pointer, invisible;
# between data commit and pointer create -> an orphaned version dir,
# invisible to readers, reclaimed by vacuum. Readers never see a
# partial table and never need repair calls.
# ---------------------------------------------------------------------------

import re as _re_mod


def _versions(fs, jvm, root: str, pointed_only: bool) -> list[int]:
    jroot = jvm.org.apache.hadoop.fs.Path(root)
    if not fs.exists(jroot):
        return []
    out = []
    for st in fs.listStatus(jroot):
        name = st.getPath().getName()
        m = (_re_mod.fullmatch(r"_v_(\d+)\.ptr", name)
             if pointed_only else
             _re_mod.fullmatch(r"v_(\d+)", name))
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def versioned_publish(spark: SparkSession, df: DataFrame, path: str,
                      fmt: str = "parquet", finalize=None) -> int:
    """Publish `df` as the next version of the table at `path` and
    return the version number. The version becomes visible to
    :func:`versioned_read` only when the pointer file lands — after
    Spark's job commit — so a crash mid-write leaves readers on the
    previous version with no repair step. Single-writer discipline
    per table (same contract as every maintenance writer here);
    concurrent READERS are always safe.

    ``finalize(version_dir)``, if given, runs after the data write
    and BEFORE the pointer lands — anything it places inside the
    version dir (e.g. an epoch-marker file) commits atomically WITH
    the data under the one pointer PUT. A crash inside finalize
    leaves an orphaned, invisible version dir, same as a crash in
    the data write.
    """
    jvm, fs, _ = _hadoop_fs(spark, path)
    root = path.rstrip("/")
    seen = _versions(fs, jvm, root, pointed_only=False)
    n = (seen[-1] if seen else -1) + 1
    df.write.format(fmt).save(f"{root}/v_{n}")
    if finalize is not None:
        finalize(f"{root}/v_{n}")
    out = fs.create(jvm.org.apache.hadoop.fs.Path(
        f"{root}/_v_{n}.ptr"), True)
    try:
        out.write(bytearray(str(n).encode()))
    finally:
        out.close()
    return n


def versioned_commit(spark: SparkSession, root: str, src_dir: str,
                     finalize=None) -> int:
    """Commit an ALREADY-WRITTEN directory as the next version of the
    table at ``root``: move ``src_dir`` to ``v_<n>``, run ``finalize``
    (if any), PUT the pointer. The staged-dir counterpart of
    :func:`versioned_publish`, for writers that materialize several
    tables in one partitioned Spark job (e.g. the CDC upsert's
    per-bucket staging) and then commit each dir separately.

    The move uses a Hadoop rename, but its ATOMICITY is not
    load-bearing — on an object store a dir "rename" is copy+delete,
    and that's fine here: nothing under ``v_<n>`` is visible until
    the single pointer PUT, and a crash mid-move leaves an orphaned
    partial version dir that readers never resolve and vacuum
    reclaims. Contrast :func:`staged_swap`, whose crash-safety
    argument DOES depend on each rename being atomic.
    """
    jvm, fs, _ = _hadoop_fs(spark, root)
    r = root.rstrip("/")
    if not fs.exists(jvm.org.apache.hadoop.fs.Path(r)):
        fs.mkdirs(jvm.org.apache.hadoop.fs.Path(r))
    seen = _versions(fs, jvm, r, pointed_only=False)
    n = (seen[-1] if seen else -1) + 1
    if not fs.rename(jvm.org.apache.hadoop.fs.Path(src_dir),
                     jvm.org.apache.hadoop.fs.Path(f"{r}/v_{n}")):
        raise IOError(f"rename {src_dir} -> {r}/v_{n} failed")
    if finalize is not None:
        finalize(f"{r}/v_{n}")
    out = fs.create(jvm.org.apache.hadoop.fs.Path(
        f"{r}/_v_{n}.ptr"), True)
    try:
        out.write(bytearray(str(n).encode()))
    finally:
        out.close()
    return n


def versioned_read(spark: SparkSession, path: str,
                   fmt: str = "parquet") -> DataFrame:
    """The latest COMMITTED version (highest pointer file). Raises a
    clear error when nothing has been published."""
    jvm, fs, _ = _hadoop_fs(spark, path)
    root = path.rstrip("/")
    committed = _versions(fs, jvm, root, pointed_only=True)
    if not committed:
        raise ValueError(f"no published version at {root} "
                         "(publish with versioned_publish)")
    return spark.read.format(fmt).load(f"{root}/v_{committed[-1]}")


def versioned_vacuum(spark: SparkSession, path: str,
                     keep: int = 2) -> int:
    """Reclaim old and orphaned versions: keeps the ``keep`` highest
    committed versions (always including the current one) and
    deletes everything else — superseded versions AND orphaned dirs
    from crashed publishes (version < current with no pointer; a
    dir ABOVE the highest pointer is an in-flight publish and is
    left alone). Returns the number of versions deleted. Run from
    the single writer; readers racing a vacuum can only lose
    versions older than the ``keep`` window — pin ``keep`` to cover
    the longest reader."""
    if keep < 1:
        raise ValueError(f"keep must be >= 1, got {keep}")
    jvm, fs, _ = _hadoop_fs(spark, path)
    root = path.rstrip("/")
    committed = _versions(fs, jvm, root, pointed_only=True)
    if not committed:
        return 0
    current = committed[-1]
    keep_set = set(committed[-keep:])
    removed = 0
    for n in _versions(fs, jvm, root, pointed_only=False):
        if n in keep_set or n > current:
            continue
        fs.delete(jvm.org.apache.hadoop.fs.Path(
            f"{root}/_v_{n}.ptr"), False)
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{root}/v_{n}"),
                  True)
        removed += 1
    return removed


# ---------------------------------------------------------------------------
# Store backends — one switch for every persisted maintenance store
# (sketch stores, line store, CDC upsert, split-path SCD2).
#
# "swap" (default): data lives at the store root; rewrites go through
# the recoverable staged_swap. Correct on HDFS/local FS, where dir
# renames are atomic; documented-unsafe on object stores, and
# reader-side repair must not race a live writer (recover_swap's
# concurrency contract).
#
# "versioned": the root is tagged with a `_versioned_store` file and
# data lives in pointer-committed `v_<n>` dirs. Appends land as new
# files inside the CURRENT version (object-store safe: new objects
# only); rewrites publish the NEXT version under a single pointer
# PUT; readers resolve the highest pointer and never repair, so
# concurrent reads during maintenance are safe. The tag makes stores
# self-describing — every reader/writer routes through
# store_data_path/store_append/store_publish_rewrite and existing
# swap-backed stores keep working unchanged.
# ---------------------------------------------------------------------------

_VERSIONED_TAG = "_versioned_store"


def versioned_store_init(spark: SparkSession, root: str) -> None:
    """Mark the store at ``root`` as versioned-backend (creates the
    dir and the tag file; data arrives via store_append /
    store_publish_rewrite)."""
    jvm, fs, _ = _hadoop_fs(spark, root)
    r = root.rstrip("/")
    fs.mkdirs(jvm.org.apache.hadoop.fs.Path(r))
    out = fs.create(jvm.org.apache.hadoop.fs.Path(
        f"{r}/{_VERSIONED_TAG}"), True)
    out.close()


def store_is_versioned(spark: SparkSession, root: str) -> bool:
    jvm, fs, _ = _hadoop_fs(spark, root)
    return fs.exists(jvm.org.apache.hadoop.fs.Path(
        root.rstrip("/") + "/" + _VERSIONED_TAG))


def store_data_path(spark: SparkSession, root: str) -> str | None:
    """Where the store's data currently lives: the highest committed
    version dir for a versioned store (None when nothing is committed
    yet), else the root itself after repairing any crashed swap.

    While a live writer LEASE is held on a swap store
    (:func:`acquire_lease`), no repair runs; if the writer is inside
    its swap window (root renamed aside, replacement not yet in),
    the BACKUP path — the old committed copy — is returned, so a
    concurrent reader sees the pre-apply state instead of racing the
    repair (the nesting hazard recover_swap documents)."""
    r = root.rstrip("/")
    if store_is_versioned(spark, r):
        jvm, fs, _ = _hadoop_fs(spark, r)
        committed = _versions(fs, jvm, r, pointed_only=True)
        return f"{r}/v_{committed[-1]}" if committed else None
    if not recover_swap(spark, r):
        jvm, fs, jr = _hadoop_fs(spark, r)
        if not fs.exists(jr) and fs.exists(
                jvm.org.apache.hadoop.fs.Path(backup_path(r))):
            return backup_path(r)
    return r


def store_append(df: DataFrame, root: str,
                 fmt: str = "parquet") -> None:
    """Append a batch of rows to a maintenance store through its
    backend. Versioned: new files into the current version dir (the
    dir stays append-only-mutable between rewrites — readers see a
    grow-only file set, exactly the plain store's contract); the
    FIRST append publishes v_0. Swap: plain append to the root
    (repairing a crashed rewrite first).

    A live foreign writer LEASE on a swap store raises
    :class:`LeaseHeldError`: appending mid-rewrite is wrong in every
    branch — the in-flight staged copy doesn't contain the new rows
    (the swap would drop them), and if the root is renamed aside the
    append would create a FRESH dir that a later repair then treats
    as the current copy, deleting the backup. Appends belong to the
    same single-writer loop as rewrites; after a crash, retry after
    the lease expires (repair then runs first, keeping the rows)."""
    spark = df.sparkSession
    r = root.rstrip("/")
    if store_is_versioned(spark, r):
        cur = store_data_path(spark, r)
        if cur is None:
            versioned_publish(spark, df, r, fmt=fmt)
        else:
            df.write.mode("append").format(fmt).save(cur)
        return
    if not recover_swap(spark, r):
        raise LeaseHeldError(
            f"{r} is mid-rewrite (writer lease live); an append now "
            "would be lost by the swap or corrupt the repair — retry "
            "after the lease is released or expires")
    df.write.mode("append").format(fmt).save(r)


def store_publish_rewrite(spark: SparkSession, df: DataFrame,
                          root: str, n_files: int,
                          fmt: str = "parquet",
                          vacuum_keep: int = 2) -> None:
    """Replace a store's contents with ``df`` (a compaction/fold
    result) through its backend. Versioned: publish as the next
    version + vacuum old ones (``vacuum_keep`` pins how far back a
    concurrent reader may lag). Swap: staged write + recoverable
    staged_swap."""
    r = root.rstrip("/")
    if store_is_versioned(spark, r):
        versioned_publish(spark, df.repartition(n_files), r, fmt=fmt)
        versioned_vacuum(spark, r, keep=vacuum_keep)
        return
    import uuid as _uuid
    # Writer lease across the whole rewrite window (staging read +
    # write + swap): machine-checks the single-writer contract —
    # concurrent store_data_path/recover_swap callers skip repair
    # and resolve the old committed copy instead of nesting the
    # in-flight swap. Per-call token (not host:pid): an in-process
    # retry after a failure reacquires via the finally-release, and
    # a hard-crashed writer's lease simply expires.
    owner = acquire_lease(spark, r,
                          owner=f"rewrite-{_uuid.uuid4().hex[:12]}",
                          ttl_s=3600.0)
    try:
        jvm, fs, _ = _hadoop_fs(spark, r)
        tmp = staging_path(r)
        jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
        if fs.exists(jtmp):
            fs.delete(jtmp, True)
        df.repartition(n_files).write.format(fmt).save(tmp)
        staged_swap(spark, tmp, r)
    finally:
        release_lease(spark, r, owner)


def write_partitioned(df: DataFrame, path: str,
                      partition_by: Sequence[str] = (),
                      mode: str = "overwrite",
                      fmt: str = "parquet") -> None:
    """Write with hive-style directory partitioning.

    Partition columns become directories (`col=value/`), so any
    downstream filter on them prunes at file-listing time — the write
    side of predicate pushdown. Keep partition cardinality bounded
    (dates, categories): a high-cardinality partition column means
    millions of tiny files at 100 TB.
    """
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_bucketed(df: DataFrame, table: str,
                   bucket_by: Sequence[str], n_buckets: int,
                   sort_by: Sequence[str] = (),
                   mode: str = "overwrite") -> None:
    """Write a bucketed (and optionally sorted) managed table.

    Two tables bucketed on the same key with the same bucket count
    join WITHOUT a shuffle — at 100 TB, pre-bucketing fact tables on
    their join key converts every recurring join's exchange into a
    local zip of bucket files. Requires saveAsTable (bucket metadata
    lives in the catalog, not the files).
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def compact(spark: SparkSession, path: str,
            target_file_bytes: int = 128 * 1024 * 1024,
            fmt: str = "parquet") -> int:
    """Rewrite a dataset into files of ~``target_file_bytes`` each —
    the standard table-maintenance pass for incremental pipelines.
    Every micro-batch/append-style writer (streaming_near_dup_ingest,
    overwrite_partitions_dynamic per-day reruns) accretes small
    files, and at 100 TB a million 1 MB files costs more in listing,
    open() round-trips, and lost column-chunk locality than the data
    itself; readers want files near the HDFS-block/row-group sweet
    spot. Returns the number of files written.

    File count = ceil(on-disk bytes / target): sized from the data's
    COMPRESSED footprint (Hadoop FS listing, driver-side metadata
    only — no data pass), so the output lands near the target
    regardless of the input's compression ratio. The rewrite is one
    round-robin repartition (no key skew possible) and one write
    through Spark's commit protocol, staged to a HIDDEN sibling dir
    (dot-prefixed: invisible to Spark file listing and partition
    discovery, so readers of the table root never see in-flight
    output) and swapped in via :func:`staged_swap` only after the
    job commits — a failed write leaves the original untouched, and
    a crash inside the swap itself leaves a complete copy at either
    the canonical or the backup path, repaired by
    :func:`recover_swap` on the next compact (or by any reader that
    calls it).

    Scale notes: compact PER PARTITION DIRECTORY (pass the partition
    path) on a schedule, not the whole table at once — the rewrite
    reads and writes the full partition, so this is a bandwidth
    pass; the win is paid back by every subsequent read. For
    bucketed tables, compact via write_bucketed instead (bucket
    count fixes file count; plain repartition would destroy bucket
    metadata).

    Backend-routed: a dataset living under a versioned store root
    (`versioned_store_init` tag) publishes the rewrite as the next
    pointer-committed version instead of swapping — object-store
    safe; a plain path keeps the staged-swap behavior above.
    """
    jvm, fs, _ = _hadoop_fs(spark, path)
    data_path = store_data_path(spark, path)
    if data_path is None:
        return 0  # versioned store with nothing committed yet
    size = fs.getContentSummary(
        jvm.org.apache.hadoop.fs.Path(data_path)).getLength()
    n_files = max(1, -(-size // target_file_bytes))
    df = spark.read.format(fmt).load(data_path)
    store_publish_rewrite(spark, df, path, n_files, fmt=fmt)
    return n_files


def overwrite_partitions_dynamic(spark: SparkSession, df: DataFrame,
                                 path: str,
                                 partition_by: Sequence[str]) -> None:
    """Overwrite only the partitions present in `df` (dynamic
    partition overwrite) — the idempotent re-run primitive for
    incremental pipelines: reprocessing one day replaces that day's
    directory and touches nothing else.

    The mode is set per-write (the DataFrameWriter option overrides
    the session conf), so no session-global state mutates — a
    concurrent partitioned overwrite elsewhere in the session keeps
    its own semantics. Note the dynamic-overwrite commit deletes
    each target partition dir before renaming the staged one in
    (non-atomic, driver-side): idempotent re-runs tolerate that
    window, but for state whose replay derives from the PRE-write
    contents, use per-bucket staged swaps as
    `operators.cdc.upsert_apply` does.
    """
    (df.write.mode("overwrite").format("parquet")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy(*partition_by).save(path))


ZORDER_BITS = 10  # 1024 rank buckets per column — file-level
# pruning needs bucket counts comparable to file counts, not row
# counts, and the quantile model (and its approxQuantile cost) grows
# with 2^bits: 10 bits keeps the driver-side model at ~1k boundaries
# per column while supporting thousands of output files.


def morton_interleave(bucket_cols, bits: int = ZORDER_BITS):
    """Morton (Z-order) code of already-bucketed integer columns:
    bit i of column j lands at output bit i*len(cols)+j. Pure JVM
    bit arithmetic (one shift/mask/or chain, fully codegen'd); with
    the default 16 bits and up to 4 columns the code fits a long.
    """
    from pyspark.sql import functions as F

    n = len(bucket_cols)
    if not 1 <= n <= 4:
        raise ValueError(f"morton_interleave takes 1-4 columns, got {n}")
    if bits * n > 63:
        raise ValueError(f"{bits} bits x {n} cols overflows a long")
    code = F.lit(0).cast("long")
    for j, c in enumerate(bucket_cols):
        cl = c.cast("long")
        for i in range(bits):
            code = code.bitwiseOR(
                F.shiftleft(
                    F.shiftright(cl, i).bitwiseAND(F.lit(1)),
                    i * n + j))
    return code


def zorder_write(df, path: str, cols, n_files: int,
                 fmt: str = "parquet", bits: int = ZORDER_BITS,
                 mode: str = "overwrite") -> None:
    """Write `df` clustered on the Z-order (Morton) curve of `cols`
    — the multi-column data-skipping layout: sorting on (a, b)
    clusters only `a`; interleaving the columns' rank bits clusters
    BOTH, so each output file covers a small hyper-rectangle of the
    (a, b) space and parquet min/max footer stats prune files for
    predicates on EITHER column (or both). The standard lakehouse
    layout pass for fact tables queried along several dimensions.

    Ranks come from `approxQuantile` boundaries (driver-side model
    state: 2^bits numbers per column, corpus-size independent)
    applied via `ml.feature.Bucketizer` (JVM binary search over the
    broadcast splits), so SKEW cannot starve the curve: buckets are
    equi-populated by construction even for pathological value
    distributions, where value-uniform bucketing would collapse a
    heavy-hitter range into one cell. The clustered write is one
    `repartitionByRange` on the code (sampled range partitioner —
    balanced files) with an in-partition sort so row groups within a
    file stay tight too.

    Columns must be numeric (rankable; cast dates/timestamps, hash
    or dictionary-encode strings). Verified by tests/test_sources.py:
    per-file bounding boxes shrink on BOTH columns vs the
    one-column-sorted layout, and a point predicate on either column
    prunes to a strict file subset.
    """
    from pyspark.ml.feature import Bucketizer
    from pyspark.sql import functions as F

    n_buckets = 1 << bits
    quantiles = [i / n_buckets for i in range(1, n_buckets)]
    work = df
    bucket_cols = []
    for idx, c in enumerate(cols):
        # relativeError 1/(4*buckets): boundary wobble stays well
        # inside a bucket; the result is still a valid clustering
        # (wrong-by-one bucket edges cost locality, never rows).
        bounds = df.approxQuantile(c, quantiles, 1.0 / (4 * n_buckets))
        splits = ([float("-inf")] + sorted(set(bounds))
                  + [float("inf")])
        raw, b = f"_zr{idx}", f"_zb{idx}"
        work = Bucketizer(
            splits=splits, inputCol=raw, outputCol=b,
            handleInvalid="keep",  # NULLs -> extra last bucket
        ).transform(work.withColumn(raw, F.col(c).cast("double")))
        bucket_cols.append(F.col(b))
    code = morton_interleave(bucket_cols, bits)
    (work.withColumn("_zorder", code)
         .repartitionByRange(n_files, "_zorder")
         .sortWithinPartitions("_zorder")
         .drop("_zorder",
               *[f"_zr{i}" for i in range(len(cols))],
               *[f"_zb{i}" for i in range(len(cols))])
         .write.mode(mode).format(fmt).save(path))
