"""HLL sketch rollups: merge-of-parts equals sketch-of-whole, and
estimates stay inside the published error bound of exact distinct
counts through a persist/reload cycle."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lisp_batch_processor_spark.operators.sketches import (
    LG_K, hll_build, hll_estimate, hll_rollup)


def _users(spark, day, start, n):
    return spark.range(start, start + n).select(
        F.lit(day).alias("day"),
        F.concat(F.lit("u"), F.col("id")).alias("user"))


def test_hll_rollup_matches_exact_within_bound(spark, tmp_path):
    # Three "days" with overlapping user populations.
    d0 = _users(spark, "d0", 0, 4000)
    d1 = _users(spark, "d1", 2000, 4000)   # 2000 overlap with d0
    d2 = _users(spark, "d2", 5000, 2000)   # 1000 overlap with d1
    events = d0.unionByName(d1).unionByName(d2)

    # Build per-day sketches once; persist and reload (the pattern
    # under test — sketches must survive parquet round-trips).
    path = os.path.join(str(tmp_path), "daily_sketches")
    hll_build(events, ["day"], "user").write.parquet(path)
    daily = spark.read.parquet(path)

    # Per-day estimates within ~1.6% rse (4 sigma slack).
    per_day = {r.day: r.n_distinct
               for r in hll_estimate(daily).collect()}
    for day, exact in (("d0", 4000), ("d1", 4000), ("d2", 2000)):
        assert abs(per_day[day] - exact) <= exact * 0.065, (day, per_day)

    # All-time rollup: merge the three persisted sketches — never
    # re-reading the events — and land within the bound of the true
    # union (7000 distinct users: 0..6999; d1 overlaps both).
    total = (hll_rollup(daily.withColumn("all", F.lit(1)), ["all"])
             .collect()[0].n_distinct)
    assert abs(total - 7000) <= 7000 * 0.065

    # Merge-of-parts == sketch-of-whole (identical estimate, not just
    # close: union of HLLs at the same lg_k is lossless w.r.t. the
    # sketch state for identical inputs).
    whole = (hll_build(events.withColumn("all", F.lit(1)), ["all"], "user")
             .select(F.hll_sketch_estimate("sketch").alias("e"))
             .collect()[0].e)
    assert total == whole

    # A coarser grouping without re-scan: weekend vs weekday style
    # regroup of the persisted daily sketches.
    grouped = hll_rollup(
        daily.withColumn("bucket",
                         F.when(F.col("day") == "d2", "small")
                          .otherwise("big")), ["bucket"])
    got = {r.bucket: r.n_distinct for r in grouped.collect()}
    assert abs(got["small"] - 2000) <= 2000 * 0.065
    assert abs(got["big"] - 6000) <= 6000 * 0.065


# ---------------------------------------------------------------------------
# Mergeable quantile histograms
# ---------------------------------------------------------------------------

def _qh_data(spark):
    # Deterministic skewed-ish distribution, 3 groups.
    return spark.range(0, 20000).selectExpr(
        "id % 3 AS g",
        "CAST((id * 37) % 10007 AS DOUBLE) AS v",
        "id % 4 AS day")


def test_quantile_hist_merge_equals_whole(spark):
    from lisp_batch_processor_spark.operators.sketches import (
        quantile_bins_train, quantile_hist_build, quantile_hist_merge)

    df = _qh_data(spark)
    splits = quantile_bins_train(df, "v", n_buckets=64)
    whole = quantile_hist_build(df, ["g"], "v", splits)
    # Per-day sketches persisted, then rolled up: counts must ADD to
    # the single-pass result exactly.
    daily = quantile_hist_build(df, ["g", "day"], "v", splits)
    merged = quantile_hist_merge(daily.drop("day"), ["g"])
    assert (merged.exceptAll(whole).count() == 0
            and whole.exceptAll(merged).count() == 0)


def test_quantile_hist_estimate_brackets_true_quantile(spark):
    from lisp_batch_processor_spark.operators.sketches import (
        quantile_bins_train, quantile_hist_build,
        quantile_hist_estimate)

    df = _qh_data(spark)
    n_buckets = 64
    splits = quantile_bins_train(df, "v", n_buckets=n_buckets)
    hist = quantile_hist_build(df, ["g"], "v", splits)
    qs = [0.1, 0.5, 0.9, 0.99, 1.0]
    est = {(r.g, r.q): (r.value, r.bucket_mass)
           for r in quantile_hist_estimate(hist, ["g"], splits,
                                           qs).collect()}

    import math
    rows = [(r.g, r.v) for r in df.collect()]
    by_g: dict = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        vals.sort()
        for q in qs:
            true_v = vals[math.ceil(q * len(vals)) - 1]
            true_bucket = sum(1 for s in splits if s <= true_v)
            got_v, mass = est[(g, q)]
            # The reported value is the lower boundary of the TRUE
            # quantile's bucket (first split for the open bucket 0).
            want_v = splits[max(true_bucket, 1) - 1]
            assert got_v == want_v, (g, q, got_v, want_v)
            # Equi-populated training buckets: the answer bucket
            # holds ~1/B of the group's mass (generous 6x slack —
            # per-group distributions differ from the pooled
            # training distribution).
            assert 0 < mass <= 6.0 / n_buckets, (g, q, mass)


def test_quantile_hist_validation(spark):
    import pytest

    from lisp_batch_processor_spark.operators.sketches import (
        quantile_bins_train, quantile_hist_build,
        quantile_hist_estimate)

    df = _qh_data(spark)
    with pytest.raises(ValueError, match="n_buckets"):
        quantile_bins_train(df, "v", n_buckets=1)
    with pytest.raises(ValueError, match="splits"):
        quantile_hist_build(df, ["g"], "v", [])
    with pytest.raises(ValueError, match="sorted"):
        quantile_hist_build(df, ["g"], "v", [2.0, 1.0])
    h = quantile_hist_build(df, ["g"], "v", [1.0, 2.0])
    with pytest.raises(ValueError, match="quantiles"):
        quantile_hist_estimate(h, ["g"], [1.0, 2.0], [0.0])


@pytest.mark.slow
def test_quantile_hist_stream_store_matches_batch(spark, tmp_path):
    """Two micro-batches append epoch-tagged histograms; the merged
    store equals the single-pass histogram over all rows, and a
    replayed epoch append (crash before commit) changes nothing."""
    import os

    from lisp_batch_processor_spark.operators.sketches import (
        quantile_hist_build, quantile_hist_store_read,
        quantile_hist_stream_apply)
    from pyspark.sql import functions as F

    splits = [100.0, 500.0, 2000.0]
    src = os.path.join(str(tmp_path), "in")
    b0 = spark.range(0, 1000).selectExpr(
        "id % 2 AS g", "CAST((id * 7) % 3000 AS DOUBLE) AS v")
    b1 = spark.range(1000, 2500).selectExpr(
        "id % 2 AS g", "CAST((id * 7) % 3000 AS DOUBLE) AS v")
    b0.coalesce(1).write.parquet(os.path.join(src, "b=0"))
    b1.coalesce(1).write.parquet(os.path.join(src, "b=1"))

    store = os.path.join(str(tmp_path), "hist_store")
    stream = (spark.readStream.schema("g long, v double")
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "b=*")))
    q = quantile_hist_stream_apply(stream, store, ["g"], "v",
                                   splits).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    whole = {(r.g, r.bucket): r.cnt
             for r in quantile_hist_build(
                 b0.unionByName(b1), ["g"], "v", splits).collect()}
    got = {(r.g, r.bucket): r.cnt
           for r in quantile_hist_store_read(spark, store,
                                             ["g"]).collect()}
    assert got == whole

    # Replay epoch 0's append (crash between append and commit):
    # identical rows re-append; the store read must not double-count.
    (quantile_hist_build(b0, ["g"], "v", splits)
     .withColumn("epoch_id", F.lit(0))
     .write.mode("append").parquet(store))
    again = {(r.g, r.bucket): r.cnt
             for r in quantile_hist_store_read(spark, store,
                                               ["g"]).collect()}
    assert again == whole


def _qh_epoch_append(df, store, splits, epoch):
    from lisp_batch_processor_spark.operators.sketches import (
        quantile_hist_build)
    (quantile_hist_build(df, ["g"], "v", splits)
     .withColumn("epoch_id", F.lit(epoch))
     .write.mode("append").parquet(store))


def _data_files(root):
    out = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames
                       if not d.startswith((".", "_"))]
        out += [os.path.join(dirpath, f) for f in filenames
                if not f.startswith((".", "_"))]
    return out


def test_quantile_store_compact_read_equal_and_bounded(spark,
                                                       tmp_path):
    """Folding committed epochs into the sentinel base leaves every
    read answer hash-equal, bounds the file count, and keeps the
    replay-dedup contract for the live epoch."""
    from lisp_batch_processor_spark.operators.sketches import (
        COMPACT_EPOCH, quantile_hist_store_read, sketch_store_compact)

    splits = [100.0, 500.0, 2000.0]
    store = os.path.join(str(tmp_path), "qh_store")
    batches = [spark.range(i * 500, (i + 1) * 500).selectExpr(
        "id % 2 AS g", "CAST((id * 7) % 3000 AS DOUBLE) AS v")
        for i in range(5)]
    for e, b in enumerate(batches):
        _qh_epoch_append(b, store, splits, e)
    # A pre-compaction replay duplicate of a committed epoch: the
    # fold must dedup it before summing, exactly as the read does.
    _qh_epoch_append(batches[2], store, splits, 2)

    def read():
        return {(r.g, r.bucket): r.cnt
                for r in quantile_hist_store_read(
                    spark, store, ["g"]).collect()}

    before = read()
    files_before = len(_data_files(store))
    assert sketch_store_compact(spark, store) == 4  # distinct epochs 0-3
    assert read() == before
    assert len(_data_files(store)) < files_before
    epochs = {r[0] for r in spark.read.parquet(store)
              .select("epoch_id").distinct().collect()}
    assert epochs == {COMPACT_EPOCH, 4}

    # Replay of the LIVE epoch after compaction: dedup still holds.
    _qh_epoch_append(batches[4], store, splits, 4)
    assert read() == before

    # Nothing foldable besides the base -> no-op.
    assert sketch_store_compact(spark, store) == 0

    # Another epoch arrives; the next fold absorbs base + epoch 4.
    b5 = spark.range(9000, 9800).selectExpr(
        "id % 2 AS g", "CAST((id * 7) % 3000 AS DOUBLE) AS v")
    _qh_epoch_append(b5, store, splits, 5)
    want = read()
    assert sketch_store_compact(spark, store) == 2
    assert read() == want


def test_hll_store_compact_estimate_equal(spark, tmp_path):
    """The HLL fold is total (union idempotence): one row per group
    afterwards, every rollup estimate unchanged, replay-safe."""
    from lisp_batch_processor_spark.operators.sketches import (
        hll_build, hll_rollup, hll_store_read, sketch_store_compact)

    store = os.path.join(str(tmp_path), "hll_store")
    batches = [spark.range(i * 400, i * 400 + 1000).selectExpr(
        "id % 2 AS g", "CAST(id % 900 AS STRING) AS u")
        for i in range(4)]
    for b in batches:
        hll_build(b, ["g"], "u").write.mode("append").parquet(store)

    def roll():
        return {r.g: r.n_distinct for r in hll_rollup(
            hll_store_read(spark, store), ["g"]).collect()}

    before = roll()
    assert sketch_store_compact(spark, store) > 0
    assert roll() == before
    assert hll_store_read(spark, store).count() == 2  # 1 row/group
    # Replayed append of the last epoch cannot move the estimates.
    hll_build(batches[-1], ["g"], "u") \
        .write.mode("append").parquet(store)
    assert roll() == before


def test_sketch_store_compact_crash_windows(spark, tmp_path):
    """Both staged_swap crash windows leave a readable store: the
    reads repair window 1 (store missing, backup complete); the next
    compact clears window 2 (store new, stale backup)."""
    import shutil

    from lisp_batch_processor_spark.operators.sketches import (
        quantile_hist_store_read, sketch_store_compact)
    from lisp_batch_processor_spark.sources.writers import backup_path

    splits = [100.0, 500.0]
    store = os.path.join(str(tmp_path), "qh_store")
    for e in range(3):
        _qh_epoch_append(
            spark.range(e * 300, (e + 1) * 300).selectExpr(
                "id % 2 AS g", "CAST(id AS DOUBLE) AS v"),
            store, splits, e)

    def read():
        return {(r.g, r.bucket): r.cnt
                for r in quantile_hist_store_read(
                    spark, store, ["g"]).collect()}

    want = read()
    bak = backup_path(store)
    # Window 1: crash between rename-aside and rename-in.
    os.rename(store, bak)
    assert read() == want
    # Window 2: crash between rename-in and delete-backup.
    shutil.copytree(store, bak)
    assert sketch_store_compact(spark, store) == 2
    assert read() == want
    assert not os.path.exists(bak)


def test_quantile_hist_drift_scores(spark):
    """Stationary data scores near 0 against its own trained splits;
    shifted data concentrates mass and the TVD rises; the exact TVD
    (incl. empty trained buckets) matches a Python replay."""
    from lisp_batch_processor_spark.operators.sketches import (
        quantile_bins_train, quantile_hist_build, quantile_hist_drift)

    ref = _qh_data(spark)
    n_buckets = 32
    splits = quantile_bins_train(ref, "v", n_buckets=n_buckets)
    b = len(splits) + 1

    # Stationary: the same distribution it was trained on.
    h_same = quantile_hist_build(ref, ["g"], "v", splits)
    same = {r.g: (r.drift, r.max_bucket_mass)
            for r in quantile_hist_drift(h_same, ["g"],
                                         len(splits)).collect()}
    for g, (d, m) in same.items():
        assert 0.0 <= d < 0.15, (g, d)
        assert m < 4.0 / b, (g, m)

    # Drifted: everything collapses into the top value range.
    drifted = spark.range(0, 6000).selectExpr(
        "id % 3 AS g", "CAST(9900 + id % 100 AS DOUBLE) AS v")
    h_drift = quantile_hist_build(drifted, ["g"], "v", splits)
    moved = {r.g: (r.drift, r.max_bucket_mass)
             for r in quantile_hist_drift(h_drift, ["g"],
                                          len(splits)).collect()}
    for g, (d, m) in moved.items():
        assert d > 0.8, (g, d)
        assert m > 0.5, (g, m)

    # Exact replay of the TVD for one group, empty buckets included.
    rows = {r.bucket: r.cnt
            for r in h_same.filter(F.col("g") == 0).collect()}
    n = sum(rows.values())
    tvd = (sum(abs(c / n - 1 / b) for c in rows.values())
           + (b - len(rows)) / b) / 2
    got = [r.drift for r in quantile_hist_drift(
        h_same, ["g"], len(splits)).filter(F.col("g") == 0).collect()]
    import math
    assert math.isclose(got[0], tvd, rel_tol=1e-9)

    with pytest.raises(ValueError, match="n_splits"):
        quantile_hist_drift(h_same, ["g"], 0)


def test_sketch_store_compact_validation(spark, tmp_path):
    from lisp_batch_processor_spark.operators.sketches import (
        sketch_store_compact)

    from lisp_batch_processor_spark.operators.sketches import (
        hll_stream_apply)

    bad = os.path.join(str(tmp_path), "not_a_store")
    spark.range(3).write.parquet(bad)
    with pytest.raises(ValueError, match="schema"):
        sketch_store_compact(spark, bad)
    with pytest.raises(ValueError, match="keep_live"):
        sketch_store_compact(spark, bad, keep_live=0)
    with pytest.raises(ValueError, match="compact_every"):
        hll_stream_apply(spark.readStream.format("rate").load(),
                         bad, ["value"], "value", compact_every=-1)


@pytest.mark.slow
def test_stream_apply_with_inline_compaction(spark, tmp_path):
    """compact_every: the stream folds its own store every N epochs
    inside foreachBatch — read equals the single-pass batch result,
    file count stays bounded, and a replayed last-epoch append after
    the fold still dedups."""
    from lisp_batch_processor_spark.operators.sketches import (
        COMPACT_EPOCH, quantile_hist_build, quantile_hist_store_read,
        quantile_hist_stream_apply)

    splits = [100.0, 500.0, 2000.0]
    src = os.path.join(str(tmp_path), "in")
    batches = [spark.range(i * 600, (i + 1) * 600).selectExpr(
        "id % 2 AS g", "CAST((id * 7) % 3000 AS DOUBLE) AS v")
        for i in range(4)]
    for i, b in enumerate(batches):
        b.coalesce(1).write.parquet(os.path.join(src, f"b={i}"))

    store = os.path.join(str(tmp_path), "hist_store")
    stream = (spark.readStream.schema("g long, v double")
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "b=*")))
    q = quantile_hist_stream_apply(stream, store, ["g"], "v", splits,
                                   compact_every=2).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    whole = batches[0]
    for b in batches[1:]:
        whole = whole.unionByName(b)
    want = {(r.g, r.bucket): r.cnt
            for r in quantile_hist_build(whole, ["g"], "v",
                                         splits).collect()}
    got = {(r.g, r.bucket): r.cnt
           for r in quantile_hist_store_read(spark, store,
                                             ["g"]).collect()}
    assert got == want
    # Folds ran: epochs 0-2 are folded into the base, epoch 3 live.
    epochs = {r[0] for r in spark.read.parquet(store)
              .select("epoch_id").distinct().collect()}
    assert epochs == {COMPACT_EPOCH, 3}
    assert len(_data_files(store)) <= 2
    # Replay of the live epoch after the inline fold: still dedups.
    (quantile_hist_build(batches[3], ["g"], "v", splits)
     .withColumn("epoch_id", F.lit(3))
     .write.mode("append").parquet(store))
    again = {(r.g, r.bucket): r.cnt
             for r in quantile_hist_store_read(spark, store,
                                               ["g"]).collect()}
    assert again == want

    with pytest.raises(ValueError, match="compact_every"):
        quantile_hist_stream_apply(stream, store, ["g"], "v", splits,
                                   compact_every=0)


@pytest.mark.slow
def test_hll_stream_store_matches_batch_and_replay(spark, tmp_path):
    """Stream-maintained HLL store rolls up to the single-pass
    estimate, and a replayed epoch append cannot move it (HLL union
    is idempotent per register)."""
    import os

    from lisp_batch_processor_spark.operators.sketches import (
        hll_build, hll_rollup, hll_stream_apply)

    src = os.path.join(str(tmp_path), "in")
    b0 = spark.range(0, 3000).selectExpr(
        "id % 2 AS g", "CAST(id % 700 AS STRING) AS u")
    b1 = spark.range(0, 4000).selectExpr(
        "id % 2 AS g", "CAST(id % 900 AS STRING) AS u")
    b0.coalesce(1).write.parquet(os.path.join(src, "b=0"))
    b1.coalesce(1).write.parquet(os.path.join(src, "b=1"))

    store = os.path.join(str(tmp_path), "hll_store")
    stream = (spark.readStream.schema("g long, u string")
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "b=*")))
    q = hll_stream_apply(stream, store, ["g"], "u").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # The store's rollup lands inside the published error bound of
    # the exact distinct counts. (No cross-path byte equality claim:
    # a sketch's serialized mode — exact coupon list vs dense
    # registers, HIP vs composite estimator — depends on how the
    # build was partitioned, so sketch(b0)-built-in-stream and
    # sketch(b0)-built-in-batch may estimate a few counts apart while
    # both honor the bound.)
    got = {r.g: r.n_distinct
           for r in hll_rollup(spark.read.parquet(store),
                               ["g"]).collect()}
    exact = {r.g: r.d for r in
             b0.unionByName(b1).groupBy("g")
             .agg(F.countDistinct("u").alias("d")).collect()}
    assert set(got) == set(exact)
    for g, d in exact.items():
        assert abs(got[g] - d) <= d * 0.065, (g, got[g], d)

    # Replay epoch 0 exactly as the stream would run it (same
    # single-partition batch): the duplicate sketch appends, and the
    # rollup estimate must be unchanged — distinct-value coupons are
    # deterministic, so re-merging the same value set is a no-op.
    hll_build(b0.coalesce(1), ["g"], "u") \
        .write.mode("append").parquet(store)
    again = {r.g: r.n_distinct
             for r in hll_rollup(spark.read.parquet(store),
                                 ["g"]).collect()}
    assert again == got


def test_fuzz_quantile_store_lifecycle(spark, tmp_path):
    """Randomized store lifecycle: interleaved epoch appends,
    duplicate replays of the latest epoch, and compactions at random
    points — the store read must equal a Python dict oracle after
    every compaction and at the end. Exercises interleavings the
    crafted tests don't (compact-after-replay, back-to-back folds,
    fold-then-immediately-append)."""
    import random

    from lisp_batch_processor_spark.operators.sketches import (
        quantile_hist_build, quantile_hist_store_read,
        sketch_store_compact)

    rng = random.Random(613)
    splits = [50.0, 200.0, 800.0]
    store = os.path.join(str(tmp_path), "qh_fuzz")

    def build_batch(e):
        n = rng.randint(50, 300)
        lo = rng.randint(0, 500)
        return spark.range(lo, lo + n).selectExpr(
            "id % 3 AS g", f"CAST((id * 13 + {e}) % 1000 AS DOUBLE) AS v")

    oracle: dict = {}   # (g, bucket) -> cnt, from APPLIED epochs only
    applied = []        # epoch ids in order
    last_batch = None

    def apply_epoch(e, batch):
        rows = {(r.g, r.bucket): r.cnt
                for r in quantile_hist_build(batch, ["g"], "v",
                                             splits).collect()}
        for k, c in rows.items():
            oracle[k] = oracle.get(k, 0) + c
        (quantile_hist_build(batch, ["g"], "v", splits)
         .withColumn("epoch_id", F.lit(e))
         .write.mode("append").parquet(store))

    def read():
        return {(r.g, r.bucket): r.cnt
                for r in quantile_hist_store_read(spark, store,
                                                  ["g"]).collect()}

    e = 0
    for _ in range(18):
        op = rng.random()
        if not applied or op < 0.55:
            b = build_batch(e).localCheckpoint(eager=True)
            apply_epoch(e, b)
            applied.append(e)
            last_batch = (e, b)
            e += 1
        elif op < 0.8 and last_batch is not None:
            # Replay the LATEST epoch's append (the only epoch Spark
            # can ever replay): oracle unchanged.
            le, lb = last_batch
            (quantile_hist_build(lb, ["g"], "v", splits)
             .withColumn("epoch_id", F.lit(le))
             .write.mode("append").parquet(store))
        else:
            sketch_store_compact(spark, store)
            assert read() == oracle, f"after compact at epoch {e}"
    assert read() == oracle
    sketch_store_compact(spark, store)
    assert read() == oracle


def test_sketch_store_versioned_backend_lifecycle(spark, tmp_path):
    """A versioned-backend sketch store answers identically to the
    swap-backed one across append → replay-dup → compact → append:
    appends land inside the current pointer-committed version, folds
    publish the next version (no renames load-bearing), and an
    orphaned version dir from a crashed fold is invisible to reads."""
    import shutil

    from lisp_batch_processor_spark.operators.sketches import (
        quantile_hist_build, quantile_hist_store_read,
        sketch_store_compact, sketch_store_init)
    from lisp_batch_processor_spark.sources.writers import store_append

    splits = [100.0, 500.0, 2000.0]
    swap = os.path.join(str(tmp_path), "qh_swap")
    ver = os.path.join(str(tmp_path), "qh_ver")
    sketch_store_init(spark, ver, backend="versioned")
    batches = [spark.range(i * 500, (i + 1) * 500).selectExpr(
        "id % 2 AS g", "CAST((id * 7) % 3000 AS DOUBLE) AS v")
        for i in range(4)]
    for e, b in enumerate(batches):
        hist = (quantile_hist_build(b, ["g"], "v", splits)
                .withColumn("epoch_id", F.lit(e)))
        store_append(hist, swap)
        store_append(hist, ver)
    # Replay duplicate of a committed epoch on both.
    dup = (quantile_hist_build(batches[1], ["g"], "v", splits)
           .withColumn("epoch_id", F.lit(1)))
    store_append(dup, swap)
    store_append(dup, ver)

    def read(store):
        return {(r.g, r.bucket): r.cnt
                for r in quantile_hist_store_read(
                    spark, store, ["g"]).collect()}

    want = read(swap)
    assert read(ver) == want

    # Orphaned version dir (crash between fold write and pointer
    # PUT): clone v_0 as v_1 with no pointer — reads stay on v_0.
    shutil.copytree(os.path.join(ver, "v_0"), os.path.join(ver, "v_1"))
    assert read(ver) == want

    # Fold: publishes the NEXT version (skipping the orphan's
    # number), read unchanged, store bounded to vacuum_keep versions.
    assert sketch_store_compact(spark, ver) == 3  # epochs 0-2 fold
    assert read(ver) == want
    vdirs = sorted(d for d in os.listdir(ver) if d.startswith("v_"))
    ptrs = sorted(d for d in os.listdir(ver) if d.endswith(".ptr"))
    assert vdirs == ["v_0", "v_2"] and ptrs == ["_v_0.ptr", "_v_2.ptr"]

    # Post-fold appends land in the new current version; a replay of
    # the live epoch (identical rows, per the determinism contract)
    # still dedups.
    replay3 = (quantile_hist_build(batches[3], ["g"], "v", splits)
               .withColumn("epoch_id", F.lit(3)))
    b4 = (quantile_hist_build(batches[0], ["g"], "v", splits)
          .withColumn("epoch_id", F.lit(4)))
    for st in (ver, swap):
        store_append(replay3, st)
        store_append(b4, st)
    assert read(ver) == read(swap)


def _drift_batch(spark, lo, n=2000, width=3000):
    return spark.range(0, n).selectExpr(
        "id % 2 AS g",
        f"CAST({lo} + (id * 7) % {width} AS DOUBLE) AS v")


@pytest.mark.slow
def test_quantile_drift_retrain_loop(spark, tmp_path):
    """The closed drift loop: a distribution shift triggers EXACTLY
    one retrain across three shifted epochs, estimates after the
    switch bracket the true quantile under the new boundaries, and
    compaction preserves the generational read."""
    import os

    from lisp_batch_processor_spark.operators.sketches import (
        quantile_bins_train, quantile_bounds_read,
        quantile_hist_stream_apply, quantile_store_estimate,
        sketch_store_compact)

    splits = quantile_bins_train(_drift_batch(spark, 0), "v",
                                 n_buckets=8)
    src = os.path.join(str(tmp_path), "in")
    batches = [_drift_batch(spark, 0), _drift_batch(spark, 0)] + [
        _drift_batch(spark, 100000) for _ in range(3)]
    for i, b in enumerate(batches):
        b.coalesce(1).write.parquet(os.path.join(src, f"b={i}"))

    store = os.path.join(str(tmp_path), "store")
    stream = (spark.readStream.schema("g long, v double")
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "b=*")))
    q = quantile_hist_stream_apply(stream, store, ["g"], "v", splits,
                                   retrain_tvd=0.5,
                                   retrain_min_rows=100).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    gens = quantile_bounds_read(spark, store)
    # Exactly ONE retrain: the first shifted epoch (2) trained gen 1;
    # epochs 3-4, drawn from the same shifted distribution, did not.
    assert set(gens) == {0, 1}
    assert gens[1][1] == 2
    assert gens[0][0] == splits

    est = {(r.g, r.q): (r.value, r.bucket_mass)
           for r in quantile_store_estimate(
               spark, store, ["g"], [0.5]).collect()}
    # True p50 of the shifted stream is ~101497 (lo + median of
    # (id*7)%3000). The estimate is the containing bucket's lower
    # boundary under gen-1 splits (bucket width ~375), and the
    # adapted boundaries keep the error certificate near 1/8 — a
    # pre-retrain read would have all mass in one bucket (mass 1.0).
    for (g, _), (value, mass) in est.items():
        assert 100000 <= value <= 103000
        assert abs(value - 101497) < 1000
        assert mass < 0.3

    # Compaction folds the gen-tagged store without mixing
    # generations: estimates are unchanged.
    assert sketch_store_compact(spark, store) >= 2
    est2 = {(r.g, r.q): (r.value, r.bucket_mass)
            for r in quantile_store_estimate(
                spark, store, ["g"], [0.5]).collect()}
    assert est2 == est


def test_quantile_retrain_replay_and_crash_windows(spark, tmp_path):
    """Exactly-once retrain under epoch replay, and the orphan-bounds
    crash window: boundaries committed without counts leave readers
    on the previous populated generation until the replay fills it."""
    import os

    from lisp_batch_processor_spark.operators.sketches import (
        _bounds_append, quantile_bins_train, quantile_bounds_read,
        quantile_hist_retrain_epoch, quantile_store_current,
        quantile_store_estimate)

    store = os.path.join(str(tmp_path), "store")
    b0 = _drift_batch(spark, 0)
    b1 = _drift_batch(spark, 100000)
    splits = quantile_bins_train(b0, "v", n_buckets=8)

    assert quantile_hist_retrain_epoch(
        b0, store, ["g"], "v", splits, retrain_tvd=0.5,
        retrain_min_rows=100, epoch_id=0) == 0
    est0 = {(r.g, r.q): r.value
            for r in quantile_store_estimate(
                spark, store, ["g"], [0.5]).collect()}

    # Crash window: epoch 1's retrain published gen-1 bounds but died
    # before any gen-1 count row. Readers stay on gen 0.
    crash_splits = quantile_bins_train(b1, "v", n_buckets=8)
    _bounds_append(spark, store, 1, crash_splits, 1)
    gen, cur, _ = quantile_store_current(spark, store, ["g"])
    assert gen == 0 and cur == splits
    assert {(r.g, r.q): r.value
            for r in quantile_store_estimate(
                spark, store, ["g"], [0.5]).collect()} == est0

    # The replay of epoch 1 finds its own trained_epoch tag: it
    # REUSES gen 1 instead of training gen 2, and fills its counts.
    assert quantile_hist_retrain_epoch(
        b1, store, ["g"], "v", splits, retrain_tvd=0.5,
        retrain_min_rows=100, epoch_id=1) == 1
    assert set(quantile_bounds_read(spark, store)) == {0, 1}
    gen, cur, _ = quantile_store_current(spark, store, ["g"])
    assert gen == 1 and cur == crash_splits

    # A SECOND replay of the completed epoch appends identical rows;
    # the (keys, bucket, epoch_id) dedup keeps estimates fixed.
    est1 = {(r.g, r.q): r.value
            for r in quantile_store_estimate(
                spark, store, ["g"], [0.5]).collect()}
    assert quantile_hist_retrain_epoch(
        b1, store, ["g"], "v", splits, retrain_tvd=0.5,
        retrain_min_rows=100, epoch_id=1) == 1
    assert set(quantile_bounds_read(spark, store)) == {0, 1}
    assert {(r.g, r.q): r.value
            for r in quantile_store_estimate(
                spark, store, ["g"], [0.5]).collect()} == est1

    # Small batches never trigger: a 20-row flush from yet another
    # distribution stays on gen 1.
    tiny = _drift_batch(spark, 500000, n=20)
    assert quantile_hist_retrain_epoch(
        tiny, store, ["g"], "v", splits, retrain_tvd=0.5,
        retrain_min_rows=100, epoch_id=2) == 1
    assert set(quantile_bounds_read(spark, store)) == {0, 1}


def test_retrain_refuses_fixed_splits_store(spark, tmp_path):
    """Enabling retraining on a store that already holds gen-less
    (fixed-splits) count files must raise, not append gen-tagged rows
    next to them — a mixed store's reads are footer-sample
    nondeterministic (counts cross-summed under different boundaries,
    or the pre-enable history dropped as gen=NULL)."""
    from lisp_batch_processor_spark.operators.sketches import (
        quantile_hist_build, quantile_hist_retrain_epoch,
        sketch_store_init)
    from lisp_batch_processor_spark.sources.writers import store_append

    path = os.path.join(str(tmp_path), "qh_fixed")
    sketch_store_init(spark, path)
    b = spark.range(1000).selectExpr("id % 4 AS g",
                                     "CAST(id AS DOUBLE) AS v")
    splits = [250.0, 500.0, 750.0]
    store_append(quantile_hist_build(b, ["g"], "v", splits)
                 .withColumn("epoch_id", F.lit(0)), path)
    with pytest.raises(ValueError, match="gen-less"):
        quantile_hist_retrain_epoch(b, path, ["g"], "v", splits,
                                    retrain_tvd=0.5,
                                    retrain_min_rows=10, epoch_id=1)
    # The refused call must not have half-bootstrapped generational
    # bounds next to the fixed-splits data.
    from lisp_batch_processor_spark.operators.sketches import (
        quantile_bounds_read)
    assert quantile_bounds_read(spark, path) == {}


@pytest.mark.slow
def test_retrain_and_compaction_compose(spark, tmp_path):
    """The drift loop and the store fold run in one maintenance
    window: folding a generational store groups by gen (no cross-
    generation count mixing), the bounds sibling survives the
    rewrite, and the read side answers identically to an uncompacted
    control store."""
    from lisp_batch_processor_spark.operators.sketches import (
        quantile_bounds_read, quantile_hist_retrain_epoch,
        quantile_store_current, sketch_store_compact, sketch_store_init)

    a = os.path.join(str(tmp_path), "qh_cmp")   # compacted
    b = os.path.join(str(tmp_path), "qh_ctl")   # control
    sketch_store_init(spark, a)
    sketch_store_init(spark, b)
    splits = [float(s) for s in range(500, 10000, 500)]

    def batch(e):
        off = 0 if e < 3 else 20000
        return spark.range(e * 5000, (e + 1) * 5000).selectExpr(
            "id % 4 AS g",
            f"CAST((id * 37) % 10007 + {off} AS DOUBLE) AS v")

    for e in range(6):
        gens = []
        for p in (a, b):
            gens.append(quantile_hist_retrain_epoch(
                batch(e), p, ["g"], "v", splits, retrain_tvd=0.25,
                retrain_min_rows=100, epoch_id=e))
        assert gens[0] == gens[1]
        if e % 2 == 1:
            sketch_store_compact(spark, a)

    ga, sa, ha = quantile_store_current(spark, a, ["g"])
    gb, sb, hb = quantile_store_current(spark, b, ["g"])
    assert ga == gb == 1                     # the shift retrained once
    assert sa == sb                          # same trained boundaries
    rows = lambda h: sorted((r.g, r.bucket, r.cnt) for r in h.collect())
    assert rows(ha) == rows(hb)              # fold moved no count
    assert quantile_bounds_read(spark, a) == quantile_bounds_read(spark, b)
    # The fold actually folded: the compacted store's data carries the
    # sentinel base epoch, the control's does not.
    from lisp_batch_processor_spark.operators.sketches import (
        COMPACT_EPOCH, _store_data_path_strict)
    ea = {r[0] for r in spark.read.parquet(
        _store_data_path_strict(spark, a)).select("epoch_id")
        .distinct().collect()}
    assert COMPACT_EPOCH in ea


def test_sketch_store_epoch_lineage_guard(spark, tmp_path):
    """The quantile store's monotonic-epoch / one-lineage contract is
    machine-checked (round 10): its (keys, bucket, epoch_id) replay
    dedup and trained_epoch generation reuse compare raw epoch ids,
    so a new checkpoint restarting at 0 over the store would have
    its counts silently DROPPED as presumed replays — an epoch
    regression or a foreign lineage token raises instead; replays
    (equal epoch) and same-lineage progress pass."""
    import os

    import pytest as _pytest

    from lisp_batch_processor_spark.operators.sketches import (
        quantile_bins_train, quantile_hist_retrain_epoch)

    store = os.path.join(str(tmp_path), "store")
    b = _drift_batch(spark, 0)
    splits = quantile_bins_train(b, "v", n_buckets=8)

    def run(eid, lineage=None):
        return quantile_hist_retrain_epoch(
            b, store, ["g"], "v", splits, retrain_tvd=0.5,
            retrain_min_rows=100, epoch_id=eid, lineage=lineage)

    run(0, lineage="ckptA")
    run(1, lineage="ckptA")
    run(1, lineage="ckptA")          # replay: equal epoch passes
    run(2)                           # tokenless same lineage: passes
    with _pytest.raises(ValueError, match="epoch regression"):
        run(0)
    with _pytest.raises(ValueError, match="lineage"):
        run(3, lineage="ckptB")


def test_sketch_store_rebuild_adopts_fresh_lineage(spark, tmp_path):
    """Rebuilding a sketch store in place must not inherit the
    DELETED store's epoch/lineage pin (round 11, ADVICE): the pin's
    sidecar lives outside the store dir and survives store deletion.
    Two rebuild paths work: `sketch_store_init` clears the pin
    explicitly (the documented entry point), and even a tokenless
    legacy rebuild is adopted as fresh — a pin with no committed
    data behind it is phantom history, not a restart-at-0 stream.
    The pin over LIVE data still raises, and init over live data
    does not weaken it."""
    import os
    import shutil

    import pytest as _pytest

    from lisp_batch_processor_spark.operators.sketches import (
        quantile_bins_train, quantile_hist_retrain_epoch,
        sketch_store_init)

    store = os.path.join(str(tmp_path), "store")
    b = _drift_batch(spark, 0)
    splits = quantile_bins_train(b, "v", n_buckets=8)

    def run(eid, lineage=None):
        return quantile_hist_retrain_epoch(
            b, store, ["g"], "v", splits, retrain_tvd=0.5,
            retrain_min_rows=100, epoch_id=eid, lineage=lineage)

    run(0, lineage="ckptA")
    run(1, lineage="ckptA")
    # Init over LIVE data leaves the pin alone...
    sketch_store_init(spark, store)
    with _pytest.raises(ValueError, match="epoch regression"):
        run(0, lineage="ckptA")

    # ... but a real rebuild (store + bounds deleted) starts fresh
    # even tokenless: the stale sidecar is phantom history.
    shutil.rmtree(store)
    shutil.rmtree(store + "__bounds")
    run(0, lineage="ckptB")          # foreign token AND regression: ok
    run(1, lineage="ckptB")
    with _pytest.raises(ValueError, match="epoch regression"):
        run(0)                       # live again: guard re-armed

    # Explicit-init rebuild clears the pin AND the stale bounds
    # sibling up front (phantom generations would otherwise reuse
    # old splits and trained_epoch tags) — only the store dir itself
    # needs deleting.
    shutil.rmtree(store)
    sketch_store_init(spark, store)
    assert not os.path.exists(store + "__bounds")
    run(0)
    run(1)
    with _pytest.raises(ValueError, match="epoch regression"):
        run(0)


def test_sketch_rebuild_adoption_clears_stale_bounds(spark, tmp_path):
    """An operator who deletes ONLY the count store dir and restarts
    WITHOUT `sketch_store_init` must not resume under the deleted
    store's generations (round 12, ADVICE): the bounds sibling
    survives store deletion like the lineage sidecar does, and a
    phantom generation whose trained_epoch collides with a new epoch
    id silently skips that epoch's retrain while reusing dead splits.
    The lineage check's adopt-as-fresh path now clears the stale
    bounds in the same step, so the rebuilt stream bootstraps
    generation 0 from ITS OWN splits."""
    import os
    import shutil

    from lisp_batch_processor_spark.operators.sketches import (
        quantile_bins_train, quantile_bounds_read,
        quantile_hist_retrain_epoch)

    store = os.path.join(str(tmp_path), "store")
    b0 = _drift_batch(spark, 0)
    splits = quantile_bins_train(b0, "v", n_buckets=8)

    def run(batch, eid, lineage):
        return quantile_hist_retrain_epoch(
            batch, store, ["g"], "v", splits, retrain_tvd=0.2,
            retrain_min_rows=100, epoch_id=eid, lineage=lineage)

    run(b0, 0, "ckptA")
    # A drifted batch trains generation 1, tagged trained_epoch=1 —
    # the tag a rebuilt stream's epoch 1 would collide with.
    assert run(_drift_batch(spark, 100000), 1, "ckptA") == 1
    assert set(quantile_bounds_read(spark, store)) == {0, 1}

    # Delete ONLY the count store; restart from a new checkpoint.
    shutil.rmtree(store)
    assert os.path.exists(store + "__bounds")   # the hazard
    assert run(b0, 0, "ckptB") == 0             # adopted as fresh...
    gens = quantile_bounds_read(spark, store)
    # ... with the phantom generations GONE: only the rebuilt
    # stream's own gen-0 bootstrap exists.
    assert set(gens) == {0}
    assert gens[0][1] == -1
    # Epoch 1 (colliding with the deleted store's trained_epoch=1)
    # now runs its own drift decision instead of silently reusing
    # the phantom generation's splits: the same drifted batch
    # retrains generation 1 FROM THIS STREAM, tagged epoch 1.
    assert run(_drift_batch(spark, 100000), 1, "ckptB") == 1
    assert quantile_bounds_read(spark, store)[1][1] == 1
    # Guard re-armed over the live rebuilt store.
    import pytest as _pytest
    with _pytest.raises(ValueError, match="lineage"):
        run(b0, 2, "ckptC")


def test_bounds_clear_precedes_pin_persist_on_adoption(spark, tmp_path):
    """Round 13 (ADVICE): the adopt-as-fresh bounds clear must run
    BEFORE the adopted lineage pin is persisted. If the pin PUT came
    first, a crash between the two would leave the phantom bounds
    permanent — the replayed epoch matches the new pin, adoption
    never re-fires, and the rebuilt stream silently resumes under the
    deleted store's splits and trained_epoch tags. Pinned by
    injecting a crash AT the pin PUT and asserting the bounds are
    already gone, the old pin is untouched, and the rerun completes
    the adoption cleanly."""
    import os
    import shutil

    import pytest as _pytest

    import lisp_batch_processor_spark.sources.writers as W
    from lisp_batch_processor_spark.operators.sketches import (
        quantile_bins_train, quantile_bounds_read,
        quantile_hist_retrain_epoch)

    store = os.path.join(str(tmp_path), "store")
    b0 = _drift_batch(spark, 0)
    splits = quantile_bins_train(b0, "v", n_buckets=8)

    def run(batch, eid, lineage):
        return quantile_hist_retrain_epoch(
            batch, store, ["g"], "v", splits, retrain_tvd=0.2,
            retrain_min_rows=100, epoch_id=eid, lineage=lineage)

    run(b0, 0, "ckptA")
    assert run(_drift_batch(spark, 100000), 1, "ckptA") == 1
    shutil.rmtree(store)                      # rebuild, bounds survive
    assert os.path.exists(store + "__bounds")

    real = W.write_json_file

    def crash_at_pin_put(spark_, path, obj):
        if "lineage" in path:
            raise RuntimeError("injected: crash at pin PUT")
        return real(spark_, path, obj)

    W.write_json_file = crash_at_pin_put
    try:
        with _pytest.raises(RuntimeError, match="injected"):
            run(b0, 0, "ckptB")
    finally:
        W.write_json_file = real
    # The ordering pin: bounds were cleared BEFORE the (crashed) pin
    # PUT, and the old pin survives, so the rerun re-adopts.
    assert not os.path.exists(store + "__bounds")
    assert run(b0, 0, "ckptB") == 0
    gens = quantile_bounds_read(spark, store)
    assert set(gens) == {0} and gens[0][1] == -1
    # Guard re-armed: the adopted pin now refuses a third lineage.
    with _pytest.raises(ValueError, match="lineage"):
        run(b0, 1, "ckptC")
