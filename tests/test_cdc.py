"""Type-1 CDC upsert materialization: dict-oracle replay, NULL keys,
exactly-once epoch markers, crash-replay convergence, and the
O(touched-buckets) write guarantee."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lisp_batch_processor_spark.operators.cdc import (
    BUCKET_COL, upsert_apply, upsert_init, upsert_read,
)

SCHEMA = "k long, city string, tier string"


def _state(spark, path):
    return {r.k: (r.city, r.tier)
            for r in upsert_read(spark, path).collect()}


def test_upsert_chain_matches_dict_oracle(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t1")
    snap = [(1, "lyon", "gold"), (2, "oslo", "silver"),
            (None, "x", "t")]
    upsert_init(spark.createDataFrame(snap, SCHEMA), path, key="k",
                n_buckets=8)
    oracle = {k: (c, t) for k, c, t in snap}
    assert _state(spark, path) == oracle

    batches = [
        [(1, "paris", "gold"),            # change
         (4, "kyiv", "gold"),             # insert
         (None, "y", "t")],               # NULL key REPLACED, not dup
        [(2, "oslo", "silver"),           # no-op overwrite
         (4, None, "gold")],              # change to NULL attr
    ]
    for e, rows in enumerate(batches):
        assert upsert_apply(spark, path,
                            spark.createDataFrame(rows, SCHEMA),
                            epoch_id=e)
        for k, c, t in rows:
            oracle[k] = (c, t)
        assert _state(spark, path) == oracle

    # One row per key — the NULL key did not duplicate.
    df = upsert_read(spark, path)
    assert df.count() == df.select("k").distinct().count() == 4


def test_upsert_epoch_replay_and_crash_convergence(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t1")
    upsert_init(spark.createDataFrame([(1, "a", "t")], SCHEMA), path,
                key="k", n_buckets=4)
    upd = spark.createDataFrame([(1, "b", "t"), (2, "c", "u")], SCHEMA)

    assert upsert_apply(spark, path, upd, epoch_id=0)
    after = _state(spark, path)
    # Completed-epoch replay: marker skip, nothing changes.
    assert not upsert_apply(spark, path, upd, epoch_id=0)
    assert _state(spark, path) == after

    # Crash after the bucket rewrites but BEFORE the marker: delete
    # the marker and replay — the rewrite is convergent, the state
    # identical.
    os.remove(os.path.join(path, "current", "_cdc_epoch"))
    assert upsert_apply(spark, path, upd, epoch_id=0)
    assert _state(spark, path) == after


def test_upsert_writes_only_touched_buckets(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t1")
    snap = [(i, f"c{i}", "t") for i in range(200)]
    upsert_init(spark.createDataFrame(snap, SCHEMA), path, key="k",
                n_buckets=16)
    cur = os.path.join(path, "current")

    def bucket_files():
        out = {}
        for d in os.listdir(cur):
            if d.startswith(f"{BUCKET_COL}="):
                files = {}
                for f in os.listdir(os.path.join(cur, d)):
                    fp = os.path.join(cur, d, f)
                    files[f] = (os.path.getsize(fp),
                                os.path.getmtime(fp))
                out[d] = files
        return out

    before = bucket_files()
    upd = spark.createDataFrame([(7, "new", "t")], SCHEMA)
    assert upsert_apply(spark, path, upd, epoch_id=0)
    after = bucket_files()

    touched = spark.createDataFrame([(7, "x", "y")], SCHEMA).select(
        F.pmod(F.xxhash64("k"), F.lit(16)).alias("b")).collect()[0].b
    touched_dir = f"{BUCKET_COL}={touched}"
    assert after[touched_dir] != before[touched_dir]
    for d in before:
        if d != touched_dir:
            assert after[d] == before[d], f"untouched {d} was rewritten"
    assert _state(spark, path)[7] == ("new", "t")


@pytest.mark.slow
def test_upsert_stream_apply_matches_sequential(spark, tmp_path):
    from lisp_batch_processor_spark.operators.cdc import (
        upsert_stream_apply)

    path = os.path.join(str(tmp_path), "t1")
    up_schema = SCHEMA + ", seq long"
    upsert_init(spark.createDataFrame([(1, "lyon", "gold", 0)],
                                      up_schema),
                path, key="k", n_buckets=4)
    src = os.path.join(str(tmp_path), "in")
    spark.createDataFrame(
        [(1, "paris", "gold", 10), (3, "kyiv", "gold", 11)],
        up_schema).coalesce(1).write.parquet(os.path.join(src, "b=0"))
    # Batch 2: duplicate key 1 — the higher-seq row must win.
    spark.createDataFrame(
        [(1, "nice", "gold", 21), (1, "bad", "gold", 20)],
        up_schema).coalesce(1).write.parquet(os.path.join(src, "b=1"))

    stream = (spark.readStream.schema(up_schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "b=*")))
    q = upsert_stream_apply(stream, path, order_col="seq").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.k: (r.city, r.tier, r.seq)
           for r in upsert_read(spark, path).collect()}
    assert got == {1: ("nice", "gold", 21),
                   3: ("kyiv", "gold", 11)}


def test_upsert_crash_window_inside_bucket_swap(spark, tmp_path):
    """The dynamic-overwrite hazard this layout exists to avoid: a
    crash mid-publish must never lose a bucket's non-updated keys.
    Simulate both staged_swap crash windows on a touched bucket and
    assert (a) a reader still sees every key, (b) the marker-less
    replay converges to the same state."""
    import shutil

    from lisp_batch_processor_spark.sources.writers import backup_path

    path = os.path.join(str(tmp_path), "t1")
    # Keys 0..49 with 1 bucket: every key shares the updated row's
    # bucket, so a lost bucket would lose 49 innocent keys.
    snap = [(i, f"c{i}", "t") for i in range(50)]
    upsert_init(spark.createDataFrame(snap, SCHEMA), path, key="k",
                n_buckets=1)
    upd = spark.createDataFrame([(7, "new", "t")], SCHEMA)
    assert upsert_apply(spark, path, upd, epoch_id=0)
    want = _state(spark, path)
    assert want[7] == ("new", "t") and len(want) == 50

    bucket_dir = os.path.join(path, "current", f"{BUCKET_COL}=0")
    bak = backup_path(bucket_dir)

    # Window 1: crash between rename-aside and rename-in — the
    # canonical dir is MISSING, the complete previous copy sits at
    # the backup path. (Under dynamic overwrite this window left the
    # bucket empty with no backup at all.)
    os.rename(bucket_dir, bak)
    os.remove(os.path.join(path, "current", "_cdc_epoch"))
    assert _state(spark, path) == want          # reader repairs
    assert upsert_apply(spark, path, upd, epoch_id=0)  # replay
    assert _state(spark, path) == want

    # Window 2: crash between rename-in and delete-backup — new dir
    # in place, stale backup still present.
    shutil.copytree(bucket_dir, bak)
    os.remove(os.path.join(path, "current", "_cdc_epoch"))
    assert upsert_apply(spark, path, upd, epoch_id=0)
    assert _state(spark, path) == want
    assert not os.path.exists(bak)


def test_upsert_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="upsert_init"):
        upsert_read(spark, os.path.join(str(tmp_path), "nope"))
    with pytest.raises(ValueError, match="n_buckets"):
        upsert_init(spark.createDataFrame([], SCHEMA),
                    os.path.join(str(tmp_path), "t"), key="k",
                    n_buckets=0)


@pytest.mark.slow
def test_fuzz_upsert_lifecycle_with_crashes(spark, tmp_path):
    """Randomized upsert chain with injected crash windows — marker
    loss, bucket swap window 1 (dest renamed aside), window 2 (stale
    backup) — replaying after every crash; the table must equal a
    dict oracle after every epoch. Covers crash+replay interleavings
    the crafted tests don't."""
    import random
    import shutil

    from lisp_batch_processor_spark.sources.writers import backup_path

    rng = random.Random(617)
    path = os.path.join(str(tmp_path), "t1")
    n_buckets = 4
    snap = [(k, f"c{k}", "t") for k in range(20)] + [(None, "n", "t")]
    upsert_init(spark.createDataFrame(snap, SCHEMA), path, key="k",
                n_buckets=n_buckets)
    oracle = {k: (c, t) for k, c, t in snap}

    def touched_buckets(rows):
        df = spark.createDataFrame(rows, SCHEMA).select(
            F.pmod(F.xxhash64("k"), F.lit(n_buckets)).alias("b"))
        return sorted({r.b for r in df.distinct().collect()})

    for epoch in range(8):
        rows, seen = [], set()
        for _ in range(rng.randint(1, 6)):
            k = rng.choice([None] + list(range(30)))
            if k in seen:
                continue
            seen.add(k)
            rows.append((k, f"v{epoch}_{rng.randint(0, 99)}",
                         rng.choice(["t", "u"])))
        upd = spark.createDataFrame(rows, SCHEMA)
        assert upsert_apply(spark, path, upd, epoch_id=epoch)
        for k, c, t in rows:
            oracle[k] = (c, t)

        crash = rng.random()
        marker = os.path.join(path, "current", "_cdc_epoch")
        if crash < 0.3:
            # Crash before the marker: plain replay, converges.
            os.remove(marker)
            assert upsert_apply(spark, path, upd, epoch_id=epoch)
        elif crash < 0.6 and rows:
            # Swap window 1 on a touched bucket: dest missing,
            # complete copy at the backup path; replay repairs.
            b = rng.choice(touched_buckets(rows))
            bdir = os.path.join(path, "current", f"{BUCKET_COL}={b}")
            os.rename(bdir, backup_path(bdir))
            os.remove(marker)
            assert upsert_apply(spark, path, upd, epoch_id=epoch)
        elif crash < 0.8 and rows:
            # Swap window 2: stale backup beside the new dir.
            b = rng.choice(touched_buckets(rows))
            bdir = os.path.join(path, "current", f"{BUCKET_COL}={b}")
            shutil.copytree(bdir, backup_path(bdir))
            os.remove(marker)
            assert upsert_apply(spark, path, upd, epoch_id=epoch)
        # else: clean epoch.

        got = _state(spark, path)
        assert got == oracle, f"epoch {epoch}"
        # Completed-epoch replay is always a pure skip.
        assert not upsert_apply(spark, path, upd, epoch_id=epoch)


def _manifests(cur):
    import re
    return sorted(int(re.fullmatch(r"_m_(\d+)\.json", f).group(1))
                  for f in os.listdir(cur)
                  if re.fullmatch(r"_m_(\d+)\.json", f))


def _manifest(cur, seq):
    import json
    with open(os.path.join(cur, f"_m_{seq}.json")) as f:
        return json.load(f)


def _latest_valid(cur):
    import json
    for seq in reversed(_manifests(cur)):
        try:
            return _manifest(cur, seq)
        except json.JSONDecodeError:
            continue
    raise AssertionError("no valid manifest")


def _disk_bucket_dirs(cur):
    out = set()
    for d in os.listdir(cur):
        if d.startswith("e_") and os.path.isdir(os.path.join(cur, d)):
            for c in os.listdir(os.path.join(cur, d)):
                if c.startswith("_pb="):
                    out.add(f"{d}/{c}")
    return out


def test_upsert_versioned_backend_lifecycle(spark, tmp_path):
    """The versioned backend (immutable e_<seq>/_pb=<b> data dirs
    committed under ONE manifest PUT per epoch, bucket id as a data
    column) matches the swap backend state for state, epoch-skip, and
    crash-replay — with no rename atomicity load-bearing: an orphaned
    e_<k> dir (crash between the staged move and the manifest PUT) is
    invisible, a torn manifest reads as absent, and vacuum keeps the
    on-disk dir set exactly the union of the two newest manifests'
    references."""
    import shutil

    swap = os.path.join(str(tmp_path), "swap")
    ver = os.path.join(str(tmp_path), "ver")
    snap = [(1, "lyon", "gold"), (2, "oslo", "silver"), (None, "x", "t")]
    # vacuum_keep=2: the crash simulations below delete the top
    # manifest, which models a crash BEFORE the PUT — the previous
    # commit's dirs must still exist, which is exactly the one-commit
    # reader grace keep=2 buys (a REAL crash-before-PUT leaves them
    # at any keep, since vacuum runs only after the commit).
    upsert_init(spark.createDataFrame(snap, SCHEMA), swap, key="k",
                n_buckets=8, backend="swap")
    upsert_init(spark.createDataFrame(snap, SCHEMA), ver, key="k",
                n_buckets=8, backend="versioned", vacuum_keep=2)
    assert _state(spark, ver) == _state(spark, swap)

    batches = [
        [(1, "paris", "gold"), (4, "kyiv", "gold"), (None, "y", "t")],
        [(2, "oslo", "silver"), (4, None, "gold")],
    ]
    for e, rows in enumerate(batches):
        upd = spark.createDataFrame(rows, SCHEMA)
        assert upsert_apply(spark, swap, upd, epoch_id=e)
        assert upsert_apply(spark, ver, upd, epoch_id=e)
        assert _state(spark, ver) == _state(spark, swap)

    after = _state(spark, ver)
    cur = os.path.join(ver, "current")
    upd = spark.createDataFrame(batches[1], SCHEMA)
    # Completed-epoch replay: pure skip via the manifest's epoch id
    # (no separate marker file exists to lose independently).
    assert not upsert_apply(spark, ver, upd, epoch_id=1)
    assert _state(spark, ver) == after

    # Crash before the manifest PUT == the epoch never happened:
    # delete the top manifest; the table reverts to the previous
    # commit and the replay re-derives from it.
    top = _manifests(cur)[-1]
    os.remove(os.path.join(cur, f"_m_{top}.json"))
    assert upsert_apply(spark, ver, upd, epoch_id=1)
    assert _state(spark, ver) == after

    # Vacuum bound: at most 2 manifests on disk, and the data dirs
    # are exactly what those manifests reference.
    assert len(_manifests(cur)) <= 2
    kept = _manifests(cur)[-2:]
    refs = set()
    for s in kept:
        refs.update(_manifest(cur, s)["buckets"].values())
    assert _disk_bucket_dirs(cur) == refs

    # Orphaned e_<k> dir (crash between move and manifest PUT):
    # invisible to reads; the next commit numbers above it.
    top = _manifests(cur)[-1]
    ref0 = sorted(_manifest(cur, top)["buckets"].values())[0]
    shutil.copytree(os.path.join(cur, ref0.split("/")[0]),
                    os.path.join(cur, f"e_{top + 7}"))
    assert _state(spark, ver) == after

    # Torn manifest above the valid one: reads step down to the
    # previous valid commit.
    with open(os.path.join(cur, f"_m_{top + 8}.json"), "w") as f:
        f.write('{"bro')
    crc = os.path.join(cur, f"._m_{top + 8}.json.crc")
    if os.path.exists(crc):
        os.remove(crc)
    assert _state(spark, ver) == after

    # Touched-bucket isolation: an update hitting one bucket changes
    # exactly that bucket's manifest entry (plus the epoch id).
    before = _latest_valid(cur)["buckets"]
    assert upsert_apply(spark, ver,
                        spark.createDataFrame([(1, "nice", "gold")],
                                              SCHEMA), epoch_id=2)
    now = _latest_valid(cur)["buckets"]
    assert sorted(now) == sorted(before)
    changed = [b for b in now if now[b] != before[b]]
    assert len(changed) == 1
    assert _state(spark, ver)[1] == ("nice", "gold")
    # The orphan and the torn manifest were reclaimed by the
    # commit's vacuum.
    assert not os.path.exists(os.path.join(cur, f"e_{top + 7}"))
    assert _disk_bucket_dirs(cur) == {
        rel for s in _manifests(cur)[-2:]
        for rel in _manifest(cur, s)["buckets"].values()}


def test_upsert_versioned_vacuum_keep1_file_parity(spark, tmp_path):
    """With ``vacuum_keep=1`` (the opt-in swap-file-parity mode —
    the default is 2, the concurrent-reader mode), each apply's
    vacuum reclaims everything the current manifest doesn't
    reference: exactly one manifest on disk, data dirs == its
    references."""
    path = os.path.join(str(tmp_path), "t")
    snap = [(k, f"c{k}", "t") for k in range(12)]
    upsert_init(spark.createDataFrame(snap, SCHEMA), path, key="k",
                n_buckets=4, backend="versioned", vacuum_keep=1)
    oracle = {k: (c, t) for k, c, t in snap}
    cur = os.path.join(path, "current")
    for e in range(4):
        rows = [(k, f"v{e}", "u") for k in range(e, 12, 3)]
        assert upsert_apply(spark, path,
                            spark.createDataFrame(rows, SCHEMA),
                            epoch_id=e)
        for k, c, t in rows:
            oracle[k] = (c, t)
        assert _state(spark, path) == oracle
        ms = _manifests(cur)
        assert len(ms) == 1
        assert _disk_bucket_dirs(cur) == set(
            _manifest(cur, ms[0])["buckets"].values())


@pytest.mark.slow
def test_fuzz_upsert_versioned_lifecycle_with_crashes(spark, tmp_path):
    """Randomized upsert chain on the VERSIONED (manifest) backend
    with its own crash grammar — lost top manifest (the epoch never
    committed; replay re-derives from the previous commit), orphaned
    e_<k> dirs (staged data moved in, manifest never PUT), torn
    manifests, and stale staging leftovers — replaying after every
    crash; the table must equal a dict oracle after every epoch, and
    the on-disk dir set must stay exactly the kept manifests'
    references."""
    import random
    import shutil

    rng = random.Random(719)
    path = os.path.join(str(tmp_path), "t1")
    snap = [(k, f"c{k}", "t") for k in range(20)] + [(None, "n", "t")]
    # vacuum_keep=2 for the same reason as the lifecycle test: the
    # lost-manifest crash arms model crash-before-PUT by deleting a
    # manifest whose vacuum already ran.
    upsert_init(spark.createDataFrame(snap, SCHEMA), path, key="k",
                n_buckets=4, backend="versioned", vacuum_keep=2)
    oracle = {k: (c, t) for k, c, t in snap}
    cur = os.path.join(path, "current")

    for epoch in range(8):
        rows, seen = [], set()
        for _ in range(rng.randint(1, 6)):
            k = rng.choice([None] + list(range(30)))
            if k in seen:
                continue
            seen.add(k)
            rows.append((k, f"v{epoch}_{rng.randint(0, 99)}",
                         rng.choice(["t", "u"])))
        upd = spark.createDataFrame(rows, SCHEMA)
        assert upsert_apply(spark, path, upd, epoch_id=epoch)
        for k, c, t in rows:
            oracle[k] = (c, t)

        crash = rng.random()
        if crash < 0.35:
            # Crash before the manifest PUT: the epoch is invisible;
            # the replay re-derives it from the previous commit.
            top = _manifests(cur)[-1]
            os.remove(os.path.join(cur, f"_m_{top}.json"))
            assert upsert_apply(spark, path, upd, epoch_id=epoch)
        elif crash < 0.6:
            # Orphaned e_<k> dir (move done, manifest never PUT) +
            # lost manifest: replay numbers above the orphan.
            top = _manifests(cur)[-1]
            ref = sorted(_manifest(cur, top)["buckets"].values())[0]
            shutil.copytree(os.path.join(cur, ref.split("/")[0]),
                            os.path.join(cur, f"e_{top + 3}"))
            os.remove(os.path.join(cur, f"_m_{top}.json"))
            assert upsert_apply(spark, path, upd, epoch_id=epoch)
        elif crash < 0.75:
            # Torn manifest from a mid-PUT crash: reads step down,
            # the replay commits above it.
            top = _manifests(cur)[-1]
            os.remove(os.path.join(cur, f"_m_{top}.json"))
            with open(os.path.join(cur, f"_m_{top}.json"), "w") as f:
                f.write('{"epoch": ')
            crc = os.path.join(cur, f"._m_{top}.json.crc")
            if os.path.exists(crc):
                os.remove(crc)
            assert upsert_apply(spark, path, upd, epoch_id=epoch)
        elif crash < 0.8:
            # Stale staging dir from a crashed attempt: the replay
            # must clear it, not commit it.
            stage = os.path.join(path, "._staging_current", "_pb=0")
            os.makedirs(stage, exist_ok=True)
            with open(os.path.join(stage, "junk"), "w") as f:
                f.write("stale")
            top = _manifests(cur)[-1]
            os.remove(os.path.join(cur, f"_m_{top}.json"))
            assert upsert_apply(spark, path, upd, epoch_id=epoch)
        elif crash < 0.9:
            # Maintenance interleaves: a compaction pass mid-chain
            # must preserve state and the retention invariant.
            from lisp_batch_processor_spark.operators.cdc import (
                upsert_compact)
            upsert_compact(spark, path, min_files=1)
        # else: clean epoch.

        assert _state(spark, path) == oracle, f"epoch {epoch}"
        assert not upsert_apply(spark, path, upd, epoch_id=epoch)
        # Retention invariant: <= 2 manifests, disk dirs == their refs.
        ms = _manifests(cur)
        assert len(ms) <= 2
        refs = {rel for s in ms
                for rel in _manifest(cur, s)["buckets"].values()}
        assert _disk_bucket_dirs(cur) == refs, f"epoch {epoch}"


def _bucket_file_counts(spark, path):
    """Data files currently visible per bucket, through the backend's
    own path resolution."""
    from lisp_batch_processor_spark.operators.cdc import _bucket_dirs
    from lisp_batch_processor_spark.sources.writers import store_data_path

    out = {}
    for broot in _bucket_dirs(spark, path):
        dp = store_data_path(spark, broot)
        out[broot.rsplit("/", 1)[1]] = (
            0 if dp is None else
            len([f for f in os.listdir(dp)
                 if not f.startswith(("_", "."))]))
    return out


@pytest.mark.parametrize("backend", ["swap", "versioned"])
def test_upsert_compact_folds_bucket_files(spark, tmp_path, backend):
    """upsert_compact folds every accreted bucket to size-targeted
    files (one, at test scale), preserves the table state exactly,
    and skips already-compact buckets on the next pass."""
    from lisp_batch_processor_spark.operators.cdc import upsert_compact

    path = os.path.join(str(tmp_path), "t")
    upsert_init(spark.createDataFrame([(0, "seed", "t")], SCHEMA),
                path, key="k", n_buckets=2, backend=backend)
    # A many-partition update: the staged partitionBy write emits one
    # file per task per bucket, so buckets accrete several files.
    upd = spark.createDataFrame(
        [(k, f"c{k}", "t") for k in range(1, 25)], SCHEMA).repartition(8)
    assert upsert_apply(spark, path, upd, epoch_id=0)
    before_state = _state(spark, path)
    before_files = _bucket_file_counts(spark, path)
    assert max(before_files.values()) > 1, before_files

    assert upsert_compact(spark, path) >= 1
    after_files = _bucket_file_counts(spark, path)
    assert all(n == 1 for n in after_files.values()), after_files
    assert _state(spark, path) == before_state

    # Second pass: nothing left to fold (min_files gate).
    assert upsert_compact(spark, path) == 0
    # And the table still applies + reads normally afterwards.
    assert upsert_apply(spark, path,
                        spark.createDataFrame([(1, "new", "t")], SCHEMA),
                        epoch_id=1)
    assert _state(spark, path)[1] == ("new", "t")


@pytest.mark.slow
@pytest.mark.parametrize("backend", ["swap", "versioned"])
def test_upsert_stream_compact_every_bounds_files(spark, tmp_path,
                                                  backend):
    """The compact_every hook self-schedules upsert_compact inside
    the stream's own foreachBatch: the final state matches a plain
    sequential run and every bucket ends at one data file."""
    from lisp_batch_processor_spark.operators.cdc import (
        upsert_stream_apply)

    up_schema = SCHEMA + ", seq long"
    hooked = os.path.join(str(tmp_path), "hooked")
    plain = os.path.join(str(tmp_path), "plain")
    seed = spark.createDataFrame([(1, "lyon", "gold", 0)], up_schema)
    for p in (hooked, plain):
        upsert_init(seed, p, key="k", n_buckets=2, backend=backend)

    src = os.path.join(str(tmp_path), "in")
    batches = [
        spark.createDataFrame(
            [(k, f"c{e}_{k}", "gold", 10 * e + k) for k in range(5)],
            up_schema)
        for e in range(4)]
    for e, b in enumerate(batches):
        b.coalesce(1).write.parquet(os.path.join(src, f"b={e}"))
        upsert_apply(spark, plain, b, epoch_id=e)

    stream = (spark.readStream.schema(up_schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "b=*")))
    q = upsert_stream_apply(stream, hooked, order_col="seq",
                            compact_every=2).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    want = {r.k: (r.city, r.tier, r.seq)
            for r in upsert_read(spark, plain).collect()}
    got = {r.k: (r.city, r.tier, r.seq)
           for r in upsert_read(spark, hooked).collect()}
    assert got == want
    # Epoch 3 triggered the final compaction: every bucket is one file.
    files = _bucket_file_counts(spark, hooked)
    assert all(n == 1 for n in files.values()), files


def test_upsert_versioned_concurrent_reader_survives_apply(
        spark, tmp_path):
    """The default ``vacuum_keep=2`` is the concurrent-reader mode:
    a lazily-evaluated DataFrame returned by upsert_read BEFORE an
    apply (it resolved the previous manifest) still collects after
    the apply commits and vacuums — the previous commit's dirs
    survive one full apply. Round 7 kept two versions per bucket for
    exactly this; the manifest backend's default must too."""
    path = os.path.join(str(tmp_path), "t")
    snap = [(k, f"c{k}", "t") for k in range(12)]
    upsert_init(spark.createDataFrame(snap, SCHEMA), path, key="k",
                n_buckets=4, backend="versioned")
    before = upsert_read(spark, path)  # lazy: resolves manifest NOW
    # Touch EVERY bucket so the old commit's dirs are all superseded.
    upsert_apply(spark, path,
                 spark.createDataFrame(
                     [(k, f"v{k}", "u") for k in range(12)], SCHEMA),
                 epoch_id=0)
    # The pre-apply frame still reads its resolved files.
    assert {r.k: r.city for r in before.collect()} \
        == {k: f"c{k}" for k in range(12)}
    # And a fresh read sees the new state.
    assert _state(spark, path) == {k: (f"v{k}", "u")
                                   for k in range(12)}


def test_upsert_versioned_legacy_layout_raises_migration_error(
        spark, tmp_path):
    """A round-7 pre-manifest versioned table (per-bucket b=<n>/v_<k>
    pointer roots) must fail with an explicit migration error, not
    the misleading 'no committed buckets' message."""
    path = os.path.join(str(tmp_path), "t")
    upsert_init(spark.createDataFrame([(1, "a", "t")], SCHEMA), path,
                key="k", n_buckets=2, backend="versioned")
    cur = os.path.join(path, "current")
    # Rewrite the dir into the legacy shape: bucket-pointer roots,
    # no manifest files.
    import shutil
    for f in os.listdir(cur):
        p = os.path.join(cur, f)
        shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
    os.makedirs(os.path.join(cur, "b=0", "v_0"))
    with pytest.raises(ValueError, match="pre-manifest"):
        upsert_read(spark, path)
    with pytest.raises(ValueError, match="pre-manifest"):
        upsert_apply(spark, path,
                     spark.createDataFrame([(1, "b", "t")], SCHEMA),
                     epoch_id=0)


def test_upsert_read_raises_when_lease_lands_mid_setup(
        spark, tmp_path, monkeypatch):
    """A writer acquiring the table lease BETWEEN upsert_read's
    holder check and its repair call must surface as LeaseHeldError,
    not a silent repair skip followed by a mid-apply read."""
    from lisp_batch_processor_spark.sources import writers as W

    path = os.path.join(str(tmp_path), "t")
    upsert_init(spark.createDataFrame([(1, "a", "t")], SCHEMA), path,
                key="k", n_buckets=2)
    cur = os.path.join(path, "current")
    # The lease exists for the WHOLE call, but the first holder
    # check is blinded once — simulating the race where the writer's
    # acquire lands between the two checks.
    W.acquire_lease(spark, cur, owner="racer", ttl_s=60)
    real = W.lease_holder
    state = {"first": True}

    def blinded(spark_, dest):
        if state["first"]:
            state["first"] = False
            return None
        return real(spark_, dest)

    monkeypatch.setattr(W, "lease_holder", blinded)
    with pytest.raises(W.LeaseHeldError, match="mid-apply"):
        upsert_read(spark, path)
    monkeypatch.undo()
    W.release_lease(spark, cur, "racer")
    assert _state(spark, path) == {1: ("a", "t")}


def test_upsert_lineage_guard_opt_in(spark, tmp_path):
    """The opt-in monotonic-epoch / one-lineage check (round 10): a
    tokened applier raises on an epoch regression or a foreign
    lineage — the marker skip alone would silently SKIP a new
    checkpoint's epochs as already-applied — while tokenless callers
    keep the exact documented skip behavior."""
    path = os.path.join(str(tmp_path), "t1")
    upsert_init(spark.createDataFrame([(1, "a", "t")], SCHEMA), path,
                key="k", n_buckets=4)
    upd = lambda rows: spark.createDataFrame(rows, SCHEMA)

    assert upsert_apply(spark, path, upd([(1, "b", "t")]),
                        epoch_id=0, lineage="ckptA")
    assert upsert_apply(spark, path, upd([(2, "c", "u")]),
                        epoch_id=1, lineage="ckptA")
    # Replay of the completed epoch: passes the check, marker skips.
    assert not upsert_apply(spark, path, upd([(2, "c", "u")]),
                            epoch_id=1, lineage="ckptA")
    with pytest.raises(ValueError, match="epoch regression"):
        upsert_apply(spark, path, upd([(9, "x", "y")]),
                     epoch_id=0, lineage="ckptA")
    with pytest.raises(ValueError, match="lineage"):
        upsert_apply(spark, path, upd([(9, "x", "y")]),
                     epoch_id=2, lineage="ckptB")
    # Tokenless: documented skip semantics, unchanged.
    assert not upsert_apply(spark, path, upd([(9, "x", "y")]),
                            epoch_id=0)
    assert _state(spark, path) == {1: ("b", "t"), 2: ("c", "u")}
