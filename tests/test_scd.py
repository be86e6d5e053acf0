"""SCD2 history maintenance: change/no-op/insert split, idempotent
replay, NULL attrs and NULL keys, multi-batch chains, as-of reads."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from lisp_batch_processor_spark.operators.scd import (
    scd2_apply, scd2_as_of, scd2_init)

T0 = datetime(2025, 1, 1)
T1 = datetime(2025, 2, 1)
T2 = datetime(2025, 3, 1)


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, city string, tier string")


def _upd(spark, rows, eff):
    return spark.createDataFrame(
        [(k, c, t, eff) for k, c, t in rows],
        "k long, city string, tier string, effective_from timestamp")


def _hist_set(h):
    return {(r.k, r.city, r.tier, r.effective_from, r.effective_to,
             r.is_current) for r in h.collect()}


def test_scd2_change_noop_insert_and_asof(spark):
    hist = scd2_init(_snap(spark, [
        (1, "lyon", "gold"),
        (2, "oslo", "silver"),
        (3, None, "bronze"),          # NULL attr
    ]), T0, key="k")

    h1 = scd2_apply(hist, _upd(spark, [
        (1, "paris", "gold"),         # changed
        (2, "oslo", "silver"),        # no-op
        (3, None, "bronze"),          # no-op with NULL attr
        (4, "kyiv", "gold"),          # new key
    ], T1), key="k", attrs=["city", "tier"])

    assert _hist_set(h1) == {
        (1, "lyon", "gold", T0, T1, False),
        (1, "paris", "gold", T1, None, True),
        (2, "oslo", "silver", T0, None, True),
        (3, None, "bronze", T0, None, True),
        (4, "kyiv", "gold", T1, None, True),
    }

    # Idempotency: replaying the same batch changes nothing.
    h1b = scd2_apply(h1, _upd(spark, [
        (1, "paris", "gold"), (2, "oslo", "silver"),
        (3, None, "bronze"), (4, "kyiv", "gold"),
    ], T1), key="k", attrs=["city", "tier"])
    assert _hist_set(h1b) == _hist_set(h1)

    # Second batch chains: key 1 changes again, key 2 goes NULL city.
    h2 = scd2_apply(h1, _upd(spark, [
        (1, "paris", "platinum"),
        (2, None, "silver"),
    ], T2), key="k", attrs=["city", "tier"])
    assert _hist_set(h2) == {
        (1, "lyon", "gold", T0, T1, False),
        (1, "paris", "gold", T1, T2, False),
        (1, "paris", "platinum", T2, None, True),
        (2, "oslo", "silver", T0, T2, False),
        (2, None, "silver", T2, None, True),
        (3, None, "bronze", T0, None, True),
        (4, "kyiv", "gold", T1, None, True),
    }

    # As-of reads: between T1 and T2 key 1 is paris/gold; at T2 the
    # boundary belongs to the NEW version (effective_to exclusive).
    mid = {(r.k, r.city, r.tier)
           for r in scd2_as_of(h2, datetime(2025, 2, 15)).collect()}
    assert mid == {(1, "paris", "gold"), (2, "oslo", "silver"),
                   (3, None, "bronze"), (4, "kyiv", "gold")}
    at_t2 = {(r.k, r.city, r.tier)
             for r in scd2_as_of(h2, T2).collect()}
    assert (1, "paris", "platinum") in at_t2
    before = {(r.k,) for r in scd2_as_of(h2, datetime(2024, 1, 1)).collect()}
    assert before == set()


def test_scd2_null_key_matches_itself(spark):
    hist = scd2_init(_snap(spark, [(None, "x", "t")]), T0, key="k")
    h1 = scd2_apply(hist, _upd(spark, [(None, "y", "t")], T1),
                    key="k", attrs=["city", "tier"])
    assert _hist_set(h1) == {
        (None, "x", "t", T0, T1, False),
        (None, "y", "t", T1, None, True),
    }


def test_scd2_plan_shape(spark):
    """scd2_apply must plan as equi-joins only — the eqNullSafe key
    condition still hash-joins (NULL-safe equality is a valid hash
    key); a cartesian/BNLJ here would melt on a wide dimension."""
    from lisp_batch_processor_spark.plans import assert_no_cartesian

    hist = scd2_init(_snap(spark, [(1, "a", "t")]), T0, key="k")
    upd = _upd(spark, [(1, "b", "t")], T1)
    assert_no_cartesian(scd2_apply(hist, upd, key="k",
                                   attrs=["city", "tier"]))


@pytest.mark.slow
def test_scd2_stream_apply_matches_sequential_batches(spark, tmp_path):
    """Two micro-batches of updates through scd2_stream_apply must
    leave the persisted history identical to applying the same
    batches sequentially with the batch operator — including an
    intra-batch duplicate key resolved to its latest update."""
    import os

    from lisp_batch_processor_spark.operators.scd import (
        scd2_read, scd2_split_init, scd2_stream_apply)

    hist_path = os.path.join(str(tmp_path), "dim_history")
    scd2_split_init(
        _snap(spark, [(1, "lyon", "gold"), (2, "oslo", "silver")]),
        T0, hist_path, key="k")

    ub1 = [(1, "paris", "gold"), (3, "kyiv", "gold")]
    # Batch 2 carries TWO updates for key 1; the later (T2-stamped
    # row carries a different city) must win.
    src = os.path.join(str(tmp_path), "updates_in")
    _upd(spark, ub1, T1).coalesce(1) \
        .write.parquet(os.path.join(src, "batch=0"))
    (_upd(spark, [(1, "nice", "gold")], T2)
     .unionByName(_upd(spark, [(1, "paris", "platinum")],
                       datetime(2025, 2, 15)))
     .coalesce(1).write.parquet(os.path.join(src, "batch=1")))

    schema = "k long, city string, tier string, effective_from timestamp"
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "batch=*")))
    q = scd2_stream_apply(stream, hist_path, key="k",
                          attrs=["city", "tier"]).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _hist_set(scd2_read(spark, hist_path))

    want_hist = scd2_init(
        _snap(spark, [(1, "lyon", "gold"), (2, "oslo", "silver")]),
        T0, key="k")
    want_hist = scd2_apply(want_hist, _upd(spark, ub1, T1),
                           key="k", attrs=["city", "tier"])
    want_hist = scd2_apply(want_hist, _upd(spark, [(1, "nice", "gold")], T2),
                           key="k", attrs=["city", "tier"])
    assert got == _hist_set(want_hist)
    # The T2 'nice' row won over the mid-Feb 'paris platinum' one.
    assert (1, "nice", "gold", T2, None, True) in got
    # No staging/backup leftovers around the open slice.
    from lisp_batch_processor_spark.sources.writers import (
        backup_path, staging_path)
    open_path = os.path.join(hist_path, "open")
    assert not os.path.exists(staging_path(open_path))
    assert not os.path.exists(backup_path(open_path))
    # Closed history is append-only epoch dirs; the open slice holds
    # exactly the current rows.
    assert {r.k for r in spark.read.parquet(open_path).collect()} \
        == {1, 2, 3}


def test_scd2_split_apply_equals_batch_chain(spark, tmp_path):
    """The split-path persisted history after N epochs must equal the
    pure scd2_apply chain over the same batches — including a NULL
    key and NULL attrs."""
    import os

    from lisp_batch_processor_spark.operators.scd import (
        scd2_read, scd2_split_apply, scd2_split_init)

    path = os.path.join(str(tmp_path), "dim")
    snap = [(1, "lyon", "gold"), (2, "oslo", "silver"), (None, "x", "t")]
    scd2_split_init(_snap(spark, snap), T0, path, key="k")

    batches = [
        ([(1, "paris", "gold"), (4, "kyiv", "gold"), (None, "y", "t")],
         T1),
        ([(1, "paris", "platinum"), (2, "oslo", "silver"),  # 2: no-op
          (4, None, "gold")], T2),
    ]
    want = scd2_init(_snap(spark, snap), T0, key="k")
    for e, (rows, eff) in enumerate(batches):
        applied = scd2_split_apply(
            spark, path, _upd(spark, rows, eff), key="k",
            attrs=["city", "tier"], epoch_id=e)
        assert applied
        want = scd2_apply(want, _upd(spark, rows, eff), key="k",
                          attrs=["city", "tier"])
    assert _hist_set(scd2_read(spark, path)) == _hist_set(want)


def test_scd2_split_apply_epoch_replay_is_exactly_once(spark, tmp_path):
    """Replaying an already-applied epoch is a SKIP (marker check),
    and replaying after a crash that wrote the closed dir but not the
    swap converges to the same history."""
    import os
    import shutil

    from lisp_batch_processor_spark.operators.scd import (
        scd2_read, scd2_split_apply, scd2_split_init)

    path = os.path.join(str(tmp_path), "dim")
    scd2_split_init(_snap(spark, [(1, "lyon", "gold")]), T0, path,
                    key="k")
    upd = _upd(spark, [(1, "paris", "gold")], T1)

    assert scd2_split_apply(spark, path, upd, key="k",
                            attrs=["city", "tier"], epoch_id=0)
    after_first = _hist_set(scd2_read(spark, path))

    # Full replay of epoch 0 (crash after swap, before checkpoint
    # commit): the marker says applied -> skip, history unchanged.
    assert not scd2_split_apply(spark, path, upd, key="k",
                                attrs=["city", "tier"], epoch_id=0)
    assert _hist_set(scd2_read(spark, path)) == after_first

    # Crash BEFORE the swap: epoch 1's closed dir exists (possibly
    # partial) but the open slice and marker never moved. A replay
    # must recompute from the unchanged open slice and converge.
    upd2 = _upd(spark, [(1, "nice", "gold")], T2)
    closed_dir = os.path.join(path, "closed", "epoch_1")
    os.makedirs(closed_dir, exist_ok=True)  # partial garbage dir
    assert scd2_split_apply(spark, path, upd2, key="k",
                            attrs=["city", "tier"], epoch_id=1)
    got = _hist_set(scd2_read(spark, path))
    assert (1, "nice", "gold", T2, None, True) in got
    assert (1, "paris", "gold", T1, T2, False) in got
    assert len(got) == 3

    # Closed epoch dirs never shrink the union on replay: replaying
    # epoch 1 after completion is again a skip.
    assert not scd2_split_apply(spark, path, upd2, key="k",
                                attrs=["city", "tier"], epoch_id=1)
    assert _hist_set(scd2_read(spark, path)) == got
    shutil.rmtree(path)


def test_scd2_crashed_epoch_residue_invisible(spark, tmp_path):
    """An epoch that crashed AFTER writing its closed dir but BEFORE
    the open-slice swap must leave NO trace in scd2_read: without
    the epoch-tag filter a reader in that window saw the same key
    open and closed at once."""
    import os

    from lisp_batch_processor_spark.operators.scd import (
        scd2_read, scd2_split_apply, scd2_split_init)
    from pyspark.sql import functions as F

    path = os.path.join(str(tmp_path), "dim")
    scd2_split_init(_snap(spark, [(1, "lyon", "gold")]), T0, path,
                    key="k")
    assert scd2_split_apply(spark, path,
                            _upd(spark, [(1, "paris", "gold")], T1),
                            key="k", attrs=["city", "tier"],
                            epoch_id=0)
    clean = _hist_set(scd2_read(spark, path))

    # Simulate epoch 1 crashing between its closed write and the
    # swap: write the closed dir it would have written, marker
    # still at 0.
    residue = (spark.createDataFrame(
        [(1, "paris", "gold", T1, T2, False)],
        "k long, city string, tier string, effective_from timestamp, "
        "effective_to timestamp, is_current boolean")
        .withColumn("_scd2_epoch", F.lit(1)))
    residue.write.parquet(os.path.join(path, "closed", "epoch_1"))

    # Invisible: the read equals the pre-crash history exactly.
    assert _hist_set(scd2_read(spark, path)) == clean

    # The replay completes epoch 1 -> its rows become visible.
    assert scd2_split_apply(spark, path,
                            _upd(spark, [(1, "nice", "gold")], T2),
                            key="k", attrs=["city", "tier"],
                            epoch_id=1)
    got = _hist_set(scd2_read(spark, path))
    assert (1, "paris", "gold", T1, T2, False) in got
    assert (1, "nice", "gold", T2, None, True) in got


def test_scd2_compact_closed_folds_epoch_dirs(spark, tmp_path):
    """Compaction folds the applied epoch dirs into one, preserves
    the history bit-for-bit, carries unapplied residue unchanged,
    and later applies + replays still work."""
    import os

    from lisp_batch_processor_spark.operators.scd import (
        scd2_compact_closed, scd2_read, scd2_split_apply,
        scd2_split_init)
    from pyspark.sql import functions as F

    path = os.path.join(str(tmp_path), "dim")
    scd2_split_init(_snap(spark, [(1, "a", "t"), (2, "b", "t")]), T0,
                    path, key="k")
    effs = [T1, datetime(2025, 2, 15), T2, datetime(2025, 3, 15)]
    for e, eff in enumerate(effs):
        scd2_split_apply(spark, path,
                         _upd(spark, [(1, f"c{e}", "t")], eff),
                         key="k", attrs=["city", "tier"], epoch_id=e)
    before = _hist_set(scd2_read(spark, path))
    closed = os.path.join(path, "closed")
    assert len([d for d in os.listdir(closed)
                if d.startswith("epoch_")]) == 4

    # Unapplied residue (epoch 9 > marker 3) must be carried, not
    # folded.
    (spark.createDataFrame([(2, "zz", "t", T2, None, False)],
                           "k long, city string, tier string, "
                           "effective_from timestamp, effective_to "
                           "timestamp, is_current boolean")
     .withColumn("_scd2_epoch", F.lit(9))
     .write.parquet(os.path.join(closed, "epoch_9")))

    assert scd2_compact_closed(spark, path) == 4
    dirs = sorted(d for d in os.listdir(closed)
                  if not d.startswith("."))
    assert dirs == ["compact_3", "epoch_9"]
    assert _hist_set(scd2_read(spark, path)) == before

    # A second compaction folds the compact dir itself only when a
    # partner exists; alone (epoch_9 still > marker) it is a no-op.
    assert scd2_compact_closed(spark, path) == 0

    # Post-compaction applies write fresh epoch dirs and read stays
    # consistent; the epoch-9 replay overwrites its carried dir.
    assert scd2_split_apply(spark, path,
                            _upd(spark, [(2, "b2", "t")],
                                 datetime(2025, 4, 1)),
                            key="k", attrs=["city", "tier"],
                            epoch_id=9)
    got = _hist_set(scd2_read(spark, path))
    assert (2, "b2", "t", datetime(2025, 4, 1), None, True) in got
    assert (2, "zz", "t", T2, None, False) not in got  # residue gone
    assert scd2_compact_closed(spark, path) == 2  # compact_3 + epoch_9
    assert _hist_set(scd2_read(spark, path)) == got


def test_scd2_split_rejects_legacy_single_path_layout(spark, tmp_path):
    """A pre-split-path history (data files at the root, no open/
    dir) must fail with a migration message, not an opaque parquet
    path error — and a missing store gets its own clear error."""
    import os

    from lisp_batch_processor_spark.operators.scd import (
        scd2_read, scd2_split_apply)

    legacy = os.path.join(str(tmp_path), "old_hist")
    scd2_init(_snap(spark, [(1, "lyon", "gold")]), T0) \
        .write.parquet(legacy)
    upd = _upd(spark, [(1, "paris", "gold")], T1)
    with pytest.raises(ValueError, match="legacy single-path"):
        scd2_split_apply(spark, legacy, upd, key="k",
                         attrs=["city", "tier"], epoch_id=0)
    with pytest.raises(ValueError, match="legacy single-path"):
        scd2_read(spark, legacy)

    empty = os.path.join(str(tmp_path), "nothing")
    os.makedirs(empty)
    with pytest.raises(ValueError, match="scd2_split_init"):
        scd2_split_apply(spark, empty, upd, key="k",
                         attrs=["city", "tier"], epoch_id=0)


@pytest.mark.slow
def test_scd2_versioned_backend_matches_swap(spark, tmp_path):
    """The versioned split-path layout (pointer-committed open-slice
    versions with the epoch marker INSIDE the version dir; closed
    tree versioned across compactions) matches the swap layout at
    every step — applies, replays, compaction, and crash windows
    where no pointer landed."""
    import os
    import shutil

    from lisp_batch_processor_spark.operators.scd import (
        scd2_compact_closed, scd2_read, scd2_split_apply,
        scd2_split_init)

    swap = os.path.join(str(tmp_path), "swap")
    ver = os.path.join(str(tmp_path), "ver")
    snap = _snap(spark, [(1, "lyon", "gold"), (2, "oslo", "silver")])
    scd2_split_init(snap, T0, swap, key="k")
    scd2_split_init(snap, T0, ver, key="k", backend="versioned")
    assert _hist_set(scd2_read(spark, ver)) == \
        _hist_set(scd2_read(spark, swap))

    batches = [
        _upd(spark, [(1, "paris", "gold"), (3, "kyiv", "gold")], T1),
        _upd(spark, [(2, "bern", "silver"), (3, "kyiv", "gold")], T2),
    ]
    for e, upd in enumerate(batches):
        assert scd2_split_apply(spark, swap, upd, key="k",
                                attrs=["city", "tier"], epoch_id=e)
        assert scd2_split_apply(spark, ver, upd, key="k",
                                attrs=["city", "tier"], epoch_id=e)
        assert _hist_set(scd2_read(spark, ver)) == \
            _hist_set(scd2_read(spark, swap))

    after = _hist_set(scd2_read(spark, ver))
    # Completed-epoch replay: marker (inside the committed open
    # version) skips.
    assert not scd2_split_apply(spark, ver, batches[1], key="k",
                                attrs=["city", "tier"], epoch_id=1)
    assert _hist_set(scd2_read(spark, ver)) == after

    # Crash window: an open-slice version written WITHOUT its pointer
    # (clone the current version as the next number) is invisible —
    # reads and the marker stay on the committed version.
    committed = sorted(int(d[2:]) for d in os.listdir(
        os.path.join(ver, "open")) if d.startswith("v_"))
    shutil.copytree(
        os.path.join(ver, "open", f"v_{committed[-1]}"),
        os.path.join(ver, "open", f"v_{committed[-1] + 1}"))
    assert _hist_set(scd2_read(spark, ver)) == after

    # Compaction of the closed tree: versioned commit, read equality.
    assert scd2_compact_closed(spark, swap,
                               target_file_bytes=1) > 0
    assert scd2_compact_closed(spark, ver,
                               target_file_bytes=1) > 0
    assert _hist_set(scd2_read(spark, ver)) == \
        _hist_set(scd2_read(spark, swap)) == after

    # Post-compaction epochs keep flowing into the new closed version.
    upd3 = _upd(spark, [(1, "nice", "gold")],
                datetime(2025, 4, 1))
    assert scd2_split_apply(spark, ver, upd3, key="k",
                            attrs=["city", "tier"], epoch_id=2)
    assert scd2_split_apply(spark, swap, upd3, key="k",
                            attrs=["city", "tier"], epoch_id=2)
    assert _hist_set(scd2_read(spark, ver)) == \
        _hist_set(scd2_read(spark, swap))

    # Version bound: open/ and closed/ each hold <= 2 committed
    # versions after vacuum.
    for side in ("open", "closed"):
        vs = [d for d in os.listdir(os.path.join(ver, side))
              if d.startswith("v_")]
        assert len(vs) <= 2, (side, vs)


@pytest.mark.slow
def test_scd2_stream_compact_every_bounds_closed_dirs(spark, tmp_path):
    """The compact_every hook self-schedules scd2_compact_closed
    inside the stream's own foreachBatch: after N epochs the closed
    tree is a bounded dir set while the history matches an un-hooked
    sequential chain (which accretes one dir per epoch)."""
    import os

    from lisp_batch_processor_spark.operators.scd import (
        scd2_read, scd2_split_apply, scd2_split_init, scd2_stream_apply)

    plain = os.path.join(str(tmp_path), "plain")
    hooked = os.path.join(str(tmp_path), "hooked")
    seed = [(1, "lyon", "gold"), (2, "oslo", "silver")]
    for p in (plain, hooked):
        scd2_split_init(_snap(spark, seed), T0, p, key="k")

    src = os.path.join(str(tmp_path), "in")
    for e in range(6):
        upd = _upd(spark, [(1, f"c{e}", "gold")], datetime(2025, 2, 1 + e))
        upd.coalesce(1).write.parquet(os.path.join(src, f"batch={e}"))
        scd2_split_apply(spark, plain, upd, key="k",
                         attrs=["city", "tier"], epoch_id=e)

    schema = "k long, city string, tier string, effective_from timestamp"
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "batch=*")))
    q = scd2_stream_apply(stream, hooked, key="k",
                          attrs=["city", "tier"],
                          compact_every=2).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert _hist_set(scd2_read(spark, hooked)) == \
        _hist_set(scd2_read(spark, plain))
    plain_dirs = [d for d in os.listdir(os.path.join(plain, "closed"))
                  if not d.startswith((".", "_"))]
    hooked_dirs = [d for d in os.listdir(os.path.join(hooked, "closed"))
                   if not d.startswith((".", "_"))]
    # Un-hooked: one closed dir per epoch that closed a row. Hooked:
    # the final fold (after epoch 5, marker 5) left one compact base
    # plus at most compact_every not-yet-folded epoch dirs.
    assert len(plain_dirs) >= 6
    assert len(hooked_dirs) <= 3, sorted(hooked_dirs)


def test_scd2_split_apply_lineage_guard_opt_in(spark, tmp_path):
    """The opt-in monotonic-epoch / one-lineage check (round 10): a
    tokened applier raises on an epoch regression or a foreign
    lineage — the marker skip alone would silently SKIP a new
    checkpoint's epochs as already-applied — while tokenless callers
    keep the exact documented skip-and-return-False behavior."""
    import os

    from lisp_batch_processor_spark.operators.scd import (
        scd2_split_apply, scd2_split_init)

    path = os.path.join(str(tmp_path), "dim")
    scd2_split_init(_snap(spark, [(1, "lyon", "gold")]), T0, path,
                    key="k")
    up = lambda rows, eff: _upd(spark, rows, eff)

    assert scd2_split_apply(spark, path, up([(1, "paris", "gold")], T1),
                            key="k", attrs=["city", "tier"],
                            epoch_id=0, lineage="ckptA")
    assert scd2_split_apply(spark, path, up([(2, "kyiv", "gold")], T2),
                            key="k", attrs=["city", "tier"],
                            epoch_id=1, lineage="ckptA")
    # Replay of the completed epoch: passes the check, marker skips.
    assert not scd2_split_apply(
        spark, path, up([(2, "kyiv", "gold")], T2), key="k",
        attrs=["city", "tier"], epoch_id=1, lineage="ckptA")
    with pytest.raises(ValueError, match="epoch regression"):
        scd2_split_apply(spark, path, up([(9, "x", "y")], T2),
                         key="k", attrs=["city", "tier"],
                         epoch_id=0, lineage="ckptA")
    with pytest.raises(ValueError, match="lineage"):
        scd2_split_apply(spark, path, up([(9, "x", "y")], T2),
                         key="k", attrs=["city", "tier"],
                         epoch_id=2, lineage="ckptB")
    # Tokenless: documented skip semantics, unchanged.
    assert not scd2_split_apply(spark, path, up([(9, "x", "y")], T2),
                                key="k", attrs=["city", "tier"],
                                epoch_id=0)
