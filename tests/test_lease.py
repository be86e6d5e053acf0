"""Writer lease on swap stores (VERDICT r7 ask #4): the documented
reader-repair-vs-live-writer race contract is now machine-checked —
recover_swap refuses repair while a foreign lease is live, readers
mid-window resolve the old committed copy (or get a clear retryable
error for the bucketed CDC layout), expired leases from crashed
writers are stolen, and the maintenance writers hold leases across
their swap windows."""

from __future__ import annotations

import os
import time

import pytest

from lisp_batch_processor_spark.sources.writers import (
    LeaseHeldError,
    acquire_lease,
    backup_path,
    lease_holder,
    lease_path,
    recover_swap,
    release_lease,
    store_data_path,
)


def _write_rows(spark, path, rows):
    spark.createDataFrame(rows, "k long, v string").coalesce(1) \
        .write.mode("overwrite").parquet(path)


def _read_rows(spark, path):
    return sorted((r.k, r.v) for r in spark.read.parquet(path).collect())


def test_lease_acquire_release_expiry(spark, tmp_path):
    d = os.path.join(str(tmp_path), "store")
    os.makedirs(d)

    owner = acquire_lease(spark, d, owner="w1", ttl_s=60)
    assert owner == "w1"
    assert lease_holder(spark, d) == "w1"
    # Reentrant for the same owner; foreign acquire raises.
    assert acquire_lease(spark, d, owner="w1", ttl_s=60) == "w1"
    with pytest.raises(LeaseHeldError):
        acquire_lease(spark, d, owner="w2")
    # Release by a non-owner is a no-op; by the owner, frees it.
    release_lease(spark, d, "w2")
    assert lease_holder(spark, d) == "w1"
    release_lease(spark, d, "w1")
    assert lease_holder(spark, d) is None

    # A crashed writer's lease (never released) expires and is stolen.
    acquire_lease(spark, d, owner="crashed", ttl_s=0.2)
    time.sleep(0.3)
    assert lease_holder(spark, d) is None
    assert acquire_lease(spark, d, owner="w3", ttl_s=60) == "w3"
    # ... and the crashed writer's late release must NOT delete the
    # stolen lease.
    release_lease(spark, d, "crashed")
    assert lease_holder(spark, d) == "w3"
    release_lease(spark, d, "w3")


def test_recover_swap_refuses_under_foreign_lease(spark, tmp_path):
    """The exact race from the old documented contract: a reader's
    recover_swap arriving between a live writer's rename-aside and
    rename-in used to restore the backup (and the writer's rename
    then nested the staged dir inside it). With the lease held, the
    reader's repair is refused, store_data_path resolves the backup
    (the old committed state), and the writer's window completes
    unharmed."""
    import shutil

    d = os.path.join(str(tmp_path), "store")
    _write_rows(spark, d, [(1, "old")])
    old_rows = _read_rows(spark, d)

    # Writer takes the lease and renames dest aside (mid-window).
    owner = acquire_lease(spark, d, owner="writer", ttl_s=60)
    shutil.move(d, backup_path(d))

    # Reader: no repair happens, and the resolved path is the backup
    # — the old committed copy.
    assert recover_swap(spark, d) is False
    assert not os.path.exists(d)
    dp = store_data_path(spark, d)
    assert dp == backup_path(d)
    assert _read_rows(spark, dp) == old_rows

    # The writer itself MAY repair under its own lease (crash-retry
    # within the window) ...
    assert recover_swap(spark, d, owner="writer") is True
    assert os.path.exists(d)
    # ... then completes: stage the new copy, swap, release.
    from lisp_batch_processor_spark.sources.writers import (
        staged_swap, staging_path)
    _write_rows(spark, staging_path(d), [(2, "new")])
    staged_swap(spark, staging_path(d), d)
    release_lease(spark, d, owner)
    assert _read_rows(spark, store_data_path(spark, d)) == [(2, "new")]

    # Post-release (or post-crash, once expired): reader repair works.
    shutil.move(d, backup_path(d))
    assert recover_swap(spark, d) is True
    assert _read_rows(spark, d) == [(2, "new")]


def test_upsert_read_waits_out_a_live_apply(spark, tmp_path):
    """Bucketed CDC swap layout: a reader arriving while the table
    lease is live gets a clear retryable LeaseHeldError instead of a
    mid-swap listing; after release it reads normally."""
    from lisp_batch_processor_spark.operators.cdc import (
        upsert_init, upsert_read)

    path = os.path.join(str(tmp_path), "t")
    upsert_init(spark.createDataFrame([(1, "a")], "k long, v string"),
                path, key="k", n_buckets=2)
    cur = path.rstrip("/") + "/current"
    acquire_lease(spark, cur, owner="apply", ttl_s=60)
    with pytest.raises(LeaseHeldError):
        upsert_read(spark, path)
    release_lease(spark, cur, "apply")
    assert {r.k: r.v for r in upsert_read(spark, path).collect()} \
        == {1: "a"}


def test_maintenance_writers_hold_and_release_leases(spark, tmp_path):
    """compact/store_publish_rewrite and the CDC/SCD2 appliers wrap
    their swap windows in a lease and always release it — after any
    successful maintenance pass no lease file remains."""
    from lisp_batch_processor_spark.operators.cdc import (
        upsert_apply, upsert_init)
    from lisp_batch_processor_spark.operators.scd import (
        scd2_split_apply, scd2_split_init)
    from lisp_batch_processor_spark.sources.writers import compact

    # compact
    d = os.path.join(str(tmp_path), "plain")
    _write_rows(spark, d, [(i, "x") for i in range(10)])
    assert compact(spark, d) >= 1
    assert not os.path.exists(lease_path(d))
    assert lease_holder(spark, d) is None

    # CDC swap apply
    t = os.path.join(str(tmp_path), "cdc")
    upsert_init(spark.createDataFrame([(1, "a")], "k long, v string"),
                t, key="k", n_buckets=2)
    assert upsert_apply(spark, t,
                        spark.createDataFrame([(2, "b")],
                                              "k long, v string"),
                        epoch_id=0)
    cur = t.rstrip("/") + "/current"
    assert lease_holder(spark, cur) is None
    assert not os.path.exists(lease_path(cur))

    # SCD2 swap apply
    from datetime import datetime
    h = os.path.join(str(tmp_path), "scd2")
    scd2_split_init(
        spark.createDataFrame([(1, "a")], "key long, attr string"),
        datetime(2025, 1, 1), h, key="key")
    assert scd2_split_apply(
        spark, h,
        spark.createDataFrame([(1, "b", datetime(2025, 2, 1))],
                              "key long, attr string, "
                              "effective_from timestamp"),
        key="key", attrs=["attr"], epoch_id=0)
    assert lease_holder(spark, os.path.join(h, "open")) is None
    assert not os.path.exists(lease_path(os.path.join(h, "open")))


def test_store_append_refuses_mid_rewrite(spark, tmp_path):
    """An append arriving while a foreign rewrite lease is live gets
    LeaseHeldError — in the mid-swap window a blind append created a
    FRESH root dir, and the later repair then deleted the backup (the
    whole store). After release, appends work and repair keeps rows."""
    import shutil

    d = os.path.join(str(tmp_path), "store")
    _write_rows(spark, d, [(1, "old")])
    acquire_lease(spark, d, owner="rewriter", ttl_s=60)
    shutil.move(d, backup_path(d))  # writer mid-window

    from lisp_batch_processor_spark.sources.writers import store_append
    with pytest.raises(LeaseHeldError):
        store_append(spark.createDataFrame([(2, "new")],
                                           "k long, v string"), d)
    # Nothing was created at the root; the backup is intact.
    assert not os.path.exists(d)
    assert _read_rows(spark, backup_path(d)) == [(1, "old")]

    # Lease released (or expired): repair-then-append keeps all rows.
    release_lease(spark, d, "rewriter")
    store_append(spark.createDataFrame([(2, "new")],
                                       "k long, v string"), d)
    assert _read_rows(spark, d) == [(1, "old"), (2, "new")]


def test_torn_lease_expires_from_file_mtime(spark, tmp_path):
    """A lease file torn by a crash mid-PUT reads as held by an
    unknown owner (fail safe: no repair under doubt) until its mtime
    + the default TTL passes — never wedged forever."""
    import shutil

    d = os.path.join(str(tmp_path), "store")
    _write_rows(spark, d, [(1, "old")])
    shutil.move(d, backup_path(d))  # crash mid-swap...
    with open(lease_path(d), "w") as f:
        f.write('{"owner": "wr')   # ...with a torn lease PUT
    crc = os.path.join(os.path.dirname(lease_path(d)),
                       "." + os.path.basename(lease_path(d)) + ".crc")
    if os.path.exists(crc):
        os.remove(crc)

    assert lease_holder(spark, d) == "<torn-lease>"
    assert recover_swap(spark, d) is False          # fail safe
    # The torn writer is long dead: age the file past the TTL.
    os.utime(lease_path(d), (1, 1))
    assert lease_holder(spark, d) is None
    assert recover_swap(spark, d) is True           # repair proceeds
    assert _read_rows(spark, d) == [(1, "old")]


def test_acquire_lease_is_create_exclusive(spark, tmp_path):
    """Acquisition goes through an atomic create-exclusive, never an
    overwriting PUT: with a live foreign lease file present, a racer
    whose holder read was stale (simulated by blinding lease_holder
    once) must still LOSE — either the tombstone verify or the
    create-exclusive stops it — and the winner's lease survives."""
    from lisp_batch_processor_spark.sources import writers as W

    d = os.path.join(str(tmp_path), "store")
    os.makedirs(d)
    acquire_lease(spark, d, owner="winner", ttl_s=60)

    real = W.lease_holder
    state = {"first": True}

    def stale_read(spark_, dest):
        # The racer read the lease BEFORE the winner's create landed.
        if state["first"]:
            state["first"] = False
            return None
        return real(spark_, dest)

    import pytest as _pytest
    orig = W.lease_holder
    W.lease_holder = stale_read
    try:
        with _pytest.raises(LeaseHeldError):
            acquire_lease(spark, d, owner="racer", ttl_s=60)
    finally:
        W.lease_holder = orig
    # The winner's lease is intact (not overwritten by the loser),
    # and no tombstone residue remains.
    assert lease_holder(spark, d) == "winner"
    assert not [f for f in os.listdir(str(tmp_path))
                if ".tomb." in f]
    leftovers = [f for f in os.listdir(str(tmp_path))
                 if f.startswith("._lease_") and ".tomb." in f]
    assert leftovers == []
    release_lease(spark, d, "winner")


def test_acquire_lease_steal_leaves_no_tombstone(spark, tmp_path):
    """Stealing an expired lease routes through rename-to-tombstone +
    verify + create-exclusive and cleans the tombstone up."""
    d = os.path.join(str(tmp_path), "store")
    os.makedirs(d)
    acquire_lease(spark, d, owner="crashed", ttl_s=0.05)
    time.sleep(0.1)
    assert lease_holder(spark, d) is None
    assert acquire_lease(spark, d, owner="thief", ttl_s=60) == "thief"
    assert lease_holder(spark, d) == "thief"
    assert not [f for f in os.listdir(str(tmp_path))
                if ".tomb." in f]
    release_lease(spark, d, "thief")
    assert lease_holder(spark, d) is None


def test_release_lease_never_deletes_a_stealers_fresh_lease(
        spark, tmp_path):
    """The release-side race twin of the acquire fix: an owner whose
    read saw its own (expired) lease must not delete a stealer's
    replacement that landed between the read and the removal —
    removal is rename-then-verify, so the foreign lease is restored
    and stays live."""
    from lisp_batch_processor_spark.sources import writers as W

    d = os.path.join(str(tmp_path), "store")
    os.makedirs(d)
    acquire_lease(spark, d, owner="old", ttl_s=60)

    # Blind the release's initial read once: it sees "old" (the state
    # before the steal), then the steal happens, then release runs
    # its removal against the stealer's file.
    real = W.read_json_file
    state = {"first": True}

    def stale_read(spark_, path, default=None, absent=None):
        if state["first"] and path == lease_path(d):
            state["first"] = False
            # Steal happens "now": replace with thief's lease.
            real_d = real(spark_, path, default=default, absent=absent)
            W.write_json_file(spark_, path,
                              {"owner": "thief",
                               "expires": time.time() + 60})
            return real_d
        return real(spark_, path, default=default, absent=absent)

    W.read_json_file = stale_read
    try:
        release_lease(spark, d, "old")
    finally:
        W.read_json_file = real
    # The thief's lease survived the old owner's late release.
    assert lease_holder(spark, d) == "thief"
    assert not [f for f in os.listdir(str(tmp_path))
                if ".tomb." in f]
    release_lease(spark, d, "thief")
    assert lease_holder(spark, d) is None


def test_torn_expired_lease_is_stealable(spark, tmp_path):
    """A lease file torn by a crash mid-PUT must not wedge the store
    forever: once its mtime + the fallback TTL passes, acquire_lease
    steals it (the tombstone's preserved mtime proves it is the
    long-dead file, not a racer's fresh mid-write lease)."""
    d = os.path.join(str(tmp_path), "store")
    os.makedirs(d)
    with open(lease_path(d), "w") as f:
        f.write('{"owner": "wr')   # torn mid-PUT
    crc = os.path.join(os.path.dirname(lease_path(d)),
                       "." + os.path.basename(lease_path(d)) + ".crc")
    if os.path.exists(crc):
        os.remove(crc)
    # Fresh torn file: fail safe — held by an unknown owner.
    assert lease_holder(spark, d) == "<torn-lease>"
    with pytest.raises(LeaseHeldError):
        acquire_lease(spark, d, owner="w1")
    # Aged past the fallback TTL: dead — steal succeeds.
    os.utime(lease_path(d), (1, 1))
    assert lease_holder(spark, d) is None
    assert acquire_lease(spark, d, owner="w1", ttl_s=60) == "w1"
    assert lease_holder(spark, d) == "w1"
    assert not [f for f in os.listdir(str(tmp_path)) if ".tomb." in f]
    release_lease(spark, d, "w1")


def test_fuzz_epoch_lineage_contract_vs_python_oracle(spark, tmp_path):
    """Property-fuzz the round-10 monotonic-epoch / one-lineage rule
    body through its persisted store-scoped form
    (`check_store_epoch_lineage`): random sequences of progressing /
    replayed / regressing epochs, matching / foreign / absent
    lineage tokens, torn-meta injections, meta resets, and (round
    11) store deletions/rebuilds, against a pure-python oracle of
    the documented rules — pass iff the epoch is >= the (surviving)
    high-water mark AND the token matches or either side is absent;
    a torn meta forgets everything recorded (fail-open); on every
    pass the high-water advances and an unrecorded token records.
    Round-11 refinement: a violation is only an ERROR while the
    store has committed data behind the pin — over a deleted store
    the pin is phantom history and the check ADOPTS the stream as
    fresh (meta resets to this epoch/token)."""
    import json
    import random
    import shutil

    from lisp_batch_processor_spark.sources.writers import (
        _hidden_sibling, check_store_epoch_lineage)

    rng = random.Random(1010)
    store = os.path.join(str(tmp_path), "store")
    meta_file = _hidden_sibling(store, "lineage")

    def write_data():
        spark.range(1).coalesce(1).write.mode("overwrite") \
            .parquet(store)

    write_data()
    has_data = True    # whether committed files back the pin
    hw = None          # the oracle's surviving high-water mark
    rec = None         # the oracle's surviving recorded token
    for step in range(200):
        roll = rng.random()
        if roll < 0.08:
            # Torn meta: crash mid-PUT. Reader fails open — the
            # recorded state is forgotten on BOTH sides.
            with open(meta_file, "w") as f:
                f.write('{"lineage": "ck')
            crc = os.path.join(os.path.dirname(meta_file),
                               "." + os.path.basename(meta_file)
                               + ".crc")
            if os.path.exists(crc):
                os.remove(crc)
            hw = rec = None
            continue
        if roll < 0.12:
            # Seed-style reset: the meta is deleted outright.
            if os.path.exists(meta_file):
                os.remove(meta_file)
            hw = rec = None
            continue
        if roll < 0.16:
            # Store deleted in place (the sidecar survives): the pin
            # is now phantom history on the oracle side too.
            if has_data:
                shutil.rmtree(store, ignore_errors=True)
                has_data = False
            continue
        if roll < 0.20 and not has_data:
            # Rebuilt store recommits data under whatever the meta
            # currently records (the tokenless-rebuild continuation).
            write_data()
            has_data = True
            continue
        e = (hw if hw is not None and rng.random() < 0.3
             else rng.randint(0, 30))
        lineage = rng.choice([None, "ckA", "ckB"])
        rule_pass = ((hw is None or e >= hw)
                     and (lineage is None or rec is None
                          or lineage == rec))
        if rule_pass:
            check_store_epoch_lineage(spark, store, e, lineage)
            hw = e if hw is None else max(hw, e)
            if lineage is not None and rec is None:
                rec = lineage
        elif not has_data:
            # Round 11: phantom pin over a deleted store — the check
            # adopts this stream as FRESH instead of raising.
            check_store_epoch_lineage(spark, store, e, lineage)
            hw, rec = e, lineage
        else:
            with pytest.raises(ValueError,
                               match="epoch regression|lineage"):
                check_store_epoch_lineage(spark, store, e, lineage)
            # A refused epoch records NOTHING.
            if os.path.exists(meta_file):
                with open(meta_file) as f:
                    disk = json.load(f)
                assert disk.get("high_water_epoch") == hw, (step, disk)
                assert disk.get("lineage") == rec, (step, disk)
            continue
        # The persisted meta mirrors the oracle exactly.
        with open(meta_file) as f:
            disk = json.load(f)
        assert disk.get("high_water_epoch") == hw, (step, disk)
        assert disk.get("lineage") == rec, (step, disk)
