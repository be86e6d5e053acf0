"""Mergeable-sketch rollups — the incremental-analytics pattern that
makes "distinct users per X" affordable at 100 TB.

Exact COUNT(DISTINCT) over a petabyte re-shuffles the key universe
on every question. The production pattern is to aggregate each
partition/day/batch ONCE into a binary Datasketches HLL sketch,
PERSIST the sketches (kilobytes each), and answer every subsequent
rollup — any grouping, any date range, all-time — by merging
sketches instead of touching rows. Merging is associative and
lossless w.r.t. the sketch, so daily sketches roll up to monthly to
all-time with no re-scan; that is what `approx_count_distinct`
(a one-shot estimate) cannot do.

This generalizes the reference's running success counters
(`Batch Processor.py:85, 312`, R16-R18) to the distinct-counting
regime: keep a tiny mergeable summary per unit of work, combine
summaries for the report.

Engine note: sketch BYTES are Datasketches-implementation-specific
(engine-portable across Spark/Druid/Hive/DuckDB-with-extension, but
not hash-replayable in plain SQL), so these ship as library
operators with property tests — estimates vs exact within the
published HLL error bound — rather than driver-gate hash oracles,
the same rows-only stance as q_agg_approx.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# log2(k) for the HLL sketch: 12 -> 4096 buckets, ~1.6% relative
# standard error, ~2 KB per sketch — the standard accuracy/size
# trade-off point.
LG_K = 12


def hll_build(df: DataFrame, keys: Sequence[str], col: str,
              lg_k: int = LG_K) -> DataFrame:
    """One binary HLL sketch of ``col``'s distinct values per
    ``keys`` group: ``keys... , sketch``. This is the scan that runs
    ONCE per batch/partition/day; persist its output next to the
    data. Map-side partial aggregation applies — a billion rows per
    group reach the reducer as one sketch per map partition.
    """
    return (df.groupBy(*keys)
            .agg(F.hll_sketch_agg(F.col(col), F.lit(lg_k))
                 .alias("sketch")))


def hll_rollup(sketches: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Merge persisted sketches down to a coarser grouping (drop any
    columns not in ``keys`` first — e.g. daily → monthly by grouping
    on month): ``keys..., n_distinct``. No row data is touched; the
    shuffle carries kilobyte sketches.
    """
    out = (sketches.groupBy(*keys)
           .agg(F.hll_union_agg("sketch").alias("_merged")))
    return out.select(
        *keys, F.hll_sketch_estimate("_merged").alias("n_distinct"))


def hll_estimate(sketches: DataFrame) -> DataFrame:
    """Per-row estimate of an existing sketch column — the cheap
    read path for already-rolled-up sketch tables."""
    return sketches.withColumn(
        "n_distinct", F.hll_sketch_estimate("sketch"))


# ---------------------------------------------------------------------------
# Mergeable quantile histograms — the percentile counterpart of the
# HLL rollups: per-batch bucket counts against FIXED trained
# boundaries, merged by addition, quantiles answered from kilobytes.
# ---------------------------------------------------------------------------
#
# Exact percentiles over a petabyte re-sort the column per question;
# approx_percentile is one-shot (its internal GK summaries never
# persist). The mergeable pattern: train B equi-populated bucket
# boundaries ONCE on a reference sample (driver model: B doubles),
# then reduce each batch/day/partition to exact per-bucket counts —
# counts add, so daily histograms roll up to monthly to all-time with
# no re-scan, any grouping. Rank error is bounded by the occupancy of
# the answer bucket: ~1/B of the mass for stationary data (the
# boundaries were equi-populated), degrading gracefully — and
# measurably, via the returned bucket mass — under drift, never
# wrong about which bucket holds the quantile (counts are exact).

QHIST_BUCKETS = 256


def quantile_bins_train(df: DataFrame, col: str,
                        n_buckets: int = QHIST_BUCKETS,
                        relative_error: float | None = None
                        ) -> list[float]:
    """Train the shared bucket boundaries: (n_buckets - 1) interior
    splits at the reference data's equi-populated quantiles (the
    zorder_write rank-bucket construction). Persist the returned
    list alongside the sketch table — every build and every estimate
    must use the same boundaries, or merges are meaningless."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    err = (1.0 / (4 * n_buckets) if relative_error is None
           else relative_error)
    return sorted(set(df.approxQuantile(col, qs, err)))


def quantile_hist_build(df: DataFrame, keys: Sequence[str], col: str,
                        splits: list[float]) -> DataFrame:
    """Exact per-bucket counts of ``col`` per ``keys`` group against
    the trained ``splits``: ``keys..., bucket, cnt`` with bucket i
    covering [splits[i-1], splits[i]) (0 = below the first split,
    len(splits) = at/above the last; NULLs are excluded). JVM binary
    search via the Bucketizer pattern is overkill for a histogram —
    a broadcast of B boundaries into `width_bucket`-style range
    lookup compiles to one codegen'd expression; counts combine
    map-side, so the shuffle carries <= B rows per map partition."""
    if not splits:
        raise ValueError("splits must be non-empty "
                         "(train with quantile_bins_train)")
    if sorted(splits) != list(splits):
        raise ValueError("splits must be sorted ascending")
    arr = F.array(*[F.lit(float(s)) for s in splits])
    c = F.col(col).cast("double")
    # Number of boundaries <= value == the 0-based bucket index.
    bucket = F.size(F.filter(arr, lambda s: s <= c))
    return (df.filter(c.isNotNull())
            .groupBy(*keys, bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def quantile_hist_merge(hists: DataFrame,
                        keys: Sequence[str]) -> DataFrame:
    """Roll persisted histograms to a coarser grouping: counts ADD
    (drop the finer columns first, e.g. daily -> monthly). The
    shuffle carries <= B rows per input group."""
    return (hists.groupBy(*keys, "bucket")
            .agg(F.sum("cnt").alias("cnt")))


def quantile_hist_estimate(hist: DataFrame, keys: Sequence[str],
                           splits: list[float],
                           qs: Sequence[float]) -> DataFrame:
    """Per-group quantile estimates from a (merged) histogram:
    ``keys..., q, value, bucket_mass``. The estimate is the LOWER
    boundary of the bucket containing rank ceil(q*N) (clamped to the
    split range for the open-ended edge buckets); ``bucket_mass`` is
    that bucket's share of the group's rows — the per-answer error
    certificate (the true quantile lies within the reported bucket,
    whose boundaries are adjacent splits).

    Plan: one cumulative-sum window per group over <= B+1 rows, then
    a bounded explode of the requested q's — no row data touched.
    """
    from pyspark.sql import Window

    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantiles must be in (0, 1], got {q}")
    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy("bucket") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot = Window.partitionBy(*keys)
    arr = F.array(*[F.lit(float(s)) for s in splits])
    cum = (hist
           .withColumn("_qh_cum", F.sum("cnt").over(w))
           .withColumn("_qh_n", F.sum("cnt").over(tot)))
    qcol = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    hit = (cum.select(*keys, "bucket", "cnt", "_qh_cum", "_qh_n", qcol)
           # First bucket whose cumulative count reaches rank
           # ceil(q * N): the one containing the quantile.
           .filter(F.col("_qh_cum") >= F.ceil(F.col("q") * F.col("_qh_n")))
           .groupBy(*keys, "q")
           .agg(F.min(F.struct("bucket", "cnt", "_qh_n")).alias("_qh")))
    b = F.col("_qh.bucket")
    return hit.select(
        *keys, "q",
        # Lower boundary of the bucket; bucket 0 has no lower split,
        # report the first split (the known upper bound) instead.
        F.element_at(arr, F.greatest(b, F.lit(1)).cast("int"))
         .alias("value"),
        (F.col("_qh.cnt").cast("double") / F.col("_qh._qh_n"))
         .alias("bucket_mass"))


def sketch_store_init(spark, store_path: str,
                      backend: str = "swap") -> None:
    """Declare a stream-maintained sketch store's publication backend
    BEFORE the first append. ``"swap"`` (the default, and what an
    un-inited store gets implicitly): data at the root, compactions
    via the recoverable staged swap — HDFS/local-FS correct,
    documented-unsafe on object stores. ``"versioned"``: pointer-
    committed version dirs (`sources.writers` store backends) —
    appends land as new objects in the current version, compactions
    publish the next version under one pointer PUT, readers resolve
    the pointer and never repair, so this is the object-store-safe
    and concurrent-reader-safe mode. Same store semantics (epoch
    replay, folds, reads) either way — the backend only decides how
    bytes become visible.

    Init also clears any recorded epoch/lineage pin for the path
    (`sources.writers.store_lineage_reset`): the pin's sidecar lives
    outside the store dir and survives store deletion, so init is the
    documented entry point for REBUILDING a store in place — without
    it, the first epoch of the rebuilt stream would raise on the
    deleted store's phantom high-water (a pin with no committed data
    behind it is also adopted as fresh automatically, so tokenless
    legacy rebuilds keep working; init just makes the declaration
    explicit). A rebuild's init also removes any STALE BOUNDS store
    left by a deleted generational (retraining) store — bounds are a
    sibling dir that likewise survives store deletion, and a rebuilt
    stream resuming under phantom generations would reuse their old
    splits and trained_epoch tags (silently skipping retrains whose
    epoch ids collide). Init over a store that still HAS committed
    data leaves BOTH alone — re-declaring a backend must not weaken
    the restart-at-0 guard or drop live generations."""
    if backend not in ("swap", "versioned"):
        raise ValueError(f"backend must be 'swap' or 'versioned', "
                         f"got {backend!r}")
    from lisp_batch_processor_spark.sources.writers import (
        _hadoop_fs, _store_has_data_files, store_lineage_reset)
    if not _store_has_data_files(spark, store_path):
        store_lineage_reset(spark, store_path)
        jvm, fs, _ = _hadoop_fs(spark, store_path)
        fs.delete(jvm.org.apache.hadoop.fs.Path(
            _bounds_path(store_path)), True)
    if backend == "versioned":
        from lisp_batch_processor_spark.sources.writers import (
            versioned_store_init)
        versioned_store_init(spark, store_path)


def _store_data_path_strict(spark, store_path: str) -> str:
    from lisp_batch_processor_spark.sources.writers import (
        store_data_path)
    dp = store_data_path(spark, store_path.rstrip("/"))
    if dp is None:
        raise ValueError(f"sketch store at {store_path} has no "
                         "committed data yet (append first)")
    return dp


def quantile_hist_store_read(spark, store_path: str,
                             keys: Sequence[str]) -> DataFrame:
    """Merge a persisted stream-maintained histogram store down to
    ``keys..., bucket, cnt``. Exact-once under epoch replay WITHOUT
    coordination: per-epoch rows are deterministic, so a replayed
    append writes byte-identical rows and the
    (keys, bucket, epoch_id) dropDuplicates collapses them before
    counts sum — the membership-set trick adapted to additive state.
    Compacted base rows (:func:`sketch_store_compact`) carry the
    sentinel epoch and are unique per (keys, bucket), so the same
    read serves compacted and raw stores. Backend-routed: a swap
    store repairs an interrupted compaction first; a versioned store
    resolves the committed pointer and never repairs.

    Drift-aware stores (a ``gen`` column from
    :func:`quantile_hist_retrain_epoch`) restrict to the highest
    generation present — counts measured against different
    boundaries must never sum (prefer
    :func:`quantile_store_estimate`, which also pairs the splits).
    """
    df = spark.read.parquet(_store_data_path_strict(spark, store_path))
    if "gen" in df.columns:
        top = df.agg(F.max("gen")).collect()[0][0]
        df = df.filter(F.col("gen") == top).drop("gen")
    return quantile_hist_merge(
        df.dropDuplicates([*keys, "bucket", "epoch_id"])
          .drop("epoch_id"), keys)


# ---------------------------------------------------------------------------
# Drift-triggered boundary retraining — the loop that keeps a
# long-lived quantile store accurate under distribution shift.
#
# Boundaries are trained once, so a shifted stream concentrates its
# mass into few buckets and the estimate's error bound
# (max_bucket_mass) degrades. quantile_hist_drift computes the
# retrain signal; the generational store CONSUMES it: boundaries live
# in a sibling backend-routed store as (gen, idx, value,
# trained_epoch) rows, count rows carry the gen they were built
# under, and a retrain opens the next generation — counts never mix
# across generations (they are measured against different splits).
#
# Atomic (boundaries, counts) pairing is by WRITE ORDER, not a
# transaction: gen g's boundary rows commit BEFORE any gen-g count
# row exists, and generations only grow — so any gen a reader finds
# in the count store already has its boundaries readable. Exactly-
# once retrain under epoch replay: the boundary rows record the
# epoch that trained them, and a replayed epoch finds its own
# trained_epoch tag and reuses that generation instead of training
# another.
# ---------------------------------------------------------------------------

def _bounds_path(store_path: str) -> str:
    return store_path.rstrip("/") + "__bounds"


def _bounds_append(spark, store_path: str, gen: int,
                   splits: Sequence[float],
                   trained_epoch: int) -> None:
    df = spark.createDataFrame(
        [(int(gen), i, float(v), int(trained_epoch))
         for i, v in enumerate(splits)],
        "gen int, idx int, value double, trained_epoch long")
    from lisp_batch_processor_spark.sources.writers import store_append
    store_append(df.coalesce(1), _bounds_path(store_path))


def quantile_bounds_read(spark, store_path: str
                         ) -> dict[int, tuple[list[float], int]]:
    """Every generation's trained boundaries for the store at
    ``store_path``: ``{gen: (splits, trained_epoch)}`` (empty dict =
    no generational bounds — a fixed-splits store). Driver-side
    state is O(generations x n_splits) floats — kilobytes."""
    from lisp_batch_processor_spark.sources.writers import (
        _hadoop_fs, store_data_path)
    bp = _bounds_path(store_path)
    dp = store_data_path(spark, bp)
    if dp is None:
        return {}
    jvm, fs, jdp = _hadoop_fs(spark, dp)
    if not fs.exists(jdp):
        return {}
    # A replayed bootstrap/retrain may have double-appended identical
    # rows; (gen, idx) is the identity.
    rows = (spark.read.parquet(dp)
            .dropDuplicates(["gen", "idx"]).collect())
    out: dict[int, tuple[list[float], int]] = {}
    for gen in {r.gen for r in rows}:
        g = sorted((r for r in rows if r.gen == gen),
                   key=lambda r: r.idx)
        out[gen] = ([r.value for r in g], g[0].trained_epoch)
    return out


def quantile_hist_retrain_epoch(batch_df: DataFrame, store_path: str,
                                keys: Sequence[str], col: str,
                                splits: list[float],
                                retrain_tvd: float,
                                retrain_min_rows: int,
                                epoch_id: int,
                                lineage: str | None = None) -> int:
    """One epoch of drift-aware histogram maintenance — the per-epoch
    work item :func:`quantile_hist_stream_apply` runs when retraining
    is enabled (public so batch replays and tests share the exact
    streaming semantics, the near_dup_ingest_epoch convention).
    Returns the generation the epoch's counts were appended under.

    Steps: (1) bootstrap gen 0 from the caller's ``splits`` if no
    bounds exist; (2) if a generation already records THIS epoch as
    its trainer, the epoch is a replay of a retrain — reuse it,
    train nothing (exactly-once); (3) otherwise build the batch's
    histogram under the current generation's splits and compute its
    GLOBAL drift (TVD vs the trained equi-populated expectation,
    :func:`quantile_hist_drift` with no keys — group-level retrain
    policies can layer on top); (4) when drift exceeds
    ``retrain_tvd`` and the batch has at least ``retrain_min_rows``
    rows (small flush batches must not trigger), train fresh
    boundaries FROM THE BATCH (the data exhibiting the shift),
    publish them as the next generation tagged with this epoch, and
    rebuild the batch's histogram against them; (5) append the
    counts gen-tagged. Boundary rows commit before any count row of
    their generation (the ordering that makes (boundaries, counts)
    pairs atomic for readers); a crash between the two leaves an
    orphan generation whose replay finds the tag and fills it.

    Scale notes: the drift check aggregates the batch's histogram
    rows (<= B per group — kilobytes); a retrain is one extra
    approxQuantile pass over the batch only, never the store.

    MONOTONIC EPOCHS / ONE LINEAGE — machine-checked (round 10,
    `sources.writers.check_store_epoch_lineage`): the replay dedup
    on (keys, bucket, epoch_id) and the trained_epoch generation
    reuse both compare raw epoch ids, so a NEW checkpoint restarting
    at 0 over this store would have its counts silently DROPPED as
    presumed replays (and could resurrect a foreign generation); an
    epoch regression or a foreign ``lineage`` token raises instead.
    """
    from lisp_batch_processor_spark.sources.writers import (
        _hadoop_fs, check_store_epoch_lineage, store_append,
        store_data_path, store_is_versioned)

    spark = batch_df.sparkSession
    e = int(epoch_id)

    def _clear_phantom_bounds():
        # The lineage pin is adopting this stream as fresh over a
        # DATALESS count store — a rebuild after store deletion. The
        # sibling bounds store survives deletion exactly like the
        # pin's sidecar, and resuming under its phantom generations
        # would reuse the deleted store's splits and trained_epoch
        # tags (a new epoch colliding with a stale tag silently skips
        # its retrain) — clear it BEFORE the new pin persists
        # (round 13, ADVICE: a crash between the pin PUT and a
        # post-hoc clear would leave the phantoms permanent, because
        # the replayed epoch then matches the new pin and adoption
        # never re-fires), as `sketch_store_init` does on the
        # declared-rebuild path.
        jvm, fs, _ = _hadoop_fs(spark, store_path)
        fs.delete(jvm.org.apache.hadoop.fs.Path(
            _bounds_path(store_path)), True)

    check_store_epoch_lineage(spark, store_path, e, lineage,
                              on_adopt=_clear_phantom_bounds)
    gens = quantile_bounds_read(spark, store_path)
    if not gens:
        # Legacy-layout guard at ENABLE time (no bounds yet — once a
        # generation exists, enablement already passed this check, so
        # steady-state epochs never pay the store listing): a store
        # maintained fixed-splits (retrain_tvd=None) holds gen-LESS
        # count files, and appending gen-tagged rows next to them
        # makes every later read nondeterministic — the parquet
        # footer sample decides whether `gen` exists, so reads either
        # cross-sum counts measured under different boundaries or
        # silently drop the whole pre-enable history as gen=NULL.
        # Probe the file-inferred schema and refuse (the line store's
        # epoch_id precedent, streaming/dedup.py). Only the expected
        # nothing-to-read analysis errors pass — anything else (a
        # transient listing/IO failure) re-raises rather than letting
        # the append irreversibly mix the store.
        from pyspark.errors import AnalysisException
        dp = store_data_path(spark, store_path.rstrip("/"))
        if dp is not None:
            try:
                legacy_cols = spark.read.parquet(dp).columns
            except AnalysisException:  # no files yet: nothing to mix
                legacy_cols = []
            if legacy_cols and "gen" not in legacy_cols:
                raise ValueError(
                    f"quantile store at {store_path} holds fixed-"
                    "splits (gen-less) count files; enabling "
                    "retraining on it would mix generations — "
                    "rewrite it once with gen = 0 (and append its "
                    "splits as generation 0 via quantile_bounds "
                    "boot) or start a fresh store")
        if store_is_versioned(spark, store_path.rstrip("/")):
            from lisp_batch_processor_spark.sources.writers import (
                versioned_store_init)
            versioned_store_init(spark, _bounds_path(store_path))
        _bounds_append(spark, store_path, 0, splits, -1)
        gens = {0: (list(splits), -1)}

    replayed = [g for g, (_, te) in gens.items() if te == e]
    if replayed:
        # Exactly-once: this epoch already trained a generation on a
        # previous (crashed) attempt — reuse its splits, train nothing.
        gen = replayed[0]
        hist = quantile_hist_build(batch_df, keys, col, gens[gen][0])
    else:
        gen = max(gens)
        cur = gens[gen][0]
        # The batch histogram feeds two actions (drift collect +
        # append) — persist so the batch is scanned once on the
        # no-retrain path.
        probe = quantile_hist_build(batch_df, keys, col, cur).persist()
        try:
            row = (quantile_hist_drift(
                quantile_hist_merge(probe, []), [], len(cur))
                .collect())[0]
            n, drift = row["n"], row["drift"]
            hist = probe
            if (drift is not None and drift > retrain_tvd
                    and n is not None and n >= retrain_min_rows):
                new_splits = quantile_bins_train(
                    batch_df, col, n_buckets=len(cur) + 1)
                gen += 1
                _bounds_append(spark, store_path, gen, new_splits, e)
                hist = quantile_hist_build(batch_df, keys, col,
                                           new_splits)
            store_append(
                hist.withColumn("epoch_id", F.lit(e))
                    .withColumn("gen", F.lit(int(gen))), store_path)
        finally:
            probe.unpersist()
        return gen
    store_append(hist.withColumn("epoch_id", F.lit(e))
                 .withColumn("gen", F.lit(int(gen))), store_path)
    return gen


def quantile_store_current(spark, store_path: str,
                           keys: Sequence[str]
                           ) -> tuple[int, list[float], DataFrame]:
    """The latest generation's ``(gen, splits, merged histogram)`` of
    a drift-aware store — the read side of the retrain loop. The
    generation is the highest one present in the COUNT store (any
    such gen's boundaries are already committed, by the write-order
    contract), so a crash that published boundaries but no counts
    yet leaves readers on the previous, populated generation."""
    gens = quantile_bounds_read(spark, store_path)
    if not gens:
        raise ValueError(
            f"no generational bounds at {_bounds_path(store_path)} "
            "(maintained by quantile_hist_retrain_epoch; for "
            "fixed-splits stores use quantile_hist_store_read)")
    df = spark.read.parquet(_store_data_path_strict(spark, store_path))
    if "gen" in df.columns:
        gen = df.agg(F.max("gen")).collect()[0][0]
        gen = max(gens) if gen is None else int(gen)
        df = df.filter(F.col("gen") == gen).drop("gen")
    else:
        gen = max(gens)
    hist = quantile_hist_merge(
        df.dropDuplicates([*keys, "bucket", "epoch_id"])
          .drop("epoch_id"), keys)
    return gen, gens[gen][0], hist


def quantile_store_estimate(spark, store_path: str,
                            keys: Sequence[str],
                            qs: Sequence[float]) -> DataFrame:
    """Per-group quantile estimates from a drift-aware store's latest
    generation — :func:`quantile_hist_estimate` over the atomic
    (boundaries, counts) pair :func:`quantile_store_current`
    resolves."""
    _, splits, hist = quantile_store_current(spark, store_path, keys)
    return quantile_hist_estimate(hist, keys, splits, qs)


def quantile_hist_stream_apply(stream_df: DataFrame, store_path: str,
                               keys: Sequence[str], col: str,
                               splits: list[float],
                               compact_every: int | None = None,
                               retrain_tvd: float | None = None,
                               retrain_min_rows: int = 1000,
                               lineage: str | None = None):
    """Streaming percentile maintenance: each micro-batch reduces to
    its exact per-bucket counts (<= B rows per group) which append
    EPOCH-TAGGED to the store — row data is touched once, at arrival;
    every later quantile question reads only kilobyte histogram rows
    via :func:`quantile_hist_store_read` +
    :func:`quantile_hist_estimate`. Returns the DataStreamWriter
    (use a checkpointLocation; replay safety per store_read).

    ``compact_every=N`` folds the store via
    :func:`sketch_store_compact` after every Nth epoch's append —
    inside foreachBatch IS the single-writer maintenance window the
    compactor requires, so the store stays bounded with no external
    scheduler. Replay-safe in both orders: a replayed epoch's
    re-append lands AFTER the fold and dedups against the kept live
    rows, and a replayed fold re-folds the already-compacted base
    (idempotent; the live tail is preserved by keep_live).

    The additive-sketch analog of the HLL rollups, with the same
    trained-boundaries contract as every quantile_hist_* operator:
    one `splits` list per store, forever — UNLESS ``retrain_tvd`` is
    set, which closes the drift loop: each epoch runs
    :func:`quantile_hist_retrain_epoch` instead, so when the batch's
    global TVD against the current boundaries exceeds the trigger
    (and the batch has >= ``retrain_min_rows`` rows), fresh
    boundaries train from the batch and publish as the next
    generation in the sibling bounds store; ``splits`` then only
    seeds generation 0. Read a retraining store with
    :func:`quantile_store_estimate` (generation-paired boundaries +
    counts), not the fixed-splits reader.
    """
    splits = list(splits)
    if compact_every is not None and compact_every < 1:
        raise ValueError(f"compact_every must be >= 1, "
                         f"got {compact_every}")
    if retrain_tvd is not None and not 0.0 < retrain_tvd < 1.0:
        raise ValueError(f"retrain_tvd must be in (0, 1), "
                         f"got {retrain_tvd}")
    if retrain_tvd is None:
        # The mirror of quantile_hist_retrain_epoch's enable-time
        # guard: a store that already has trained generations holds
        # gen-TAGGED count files, and this path's gen-less appends
        # next to them would make reads footer-sample
        # nondeterministic. Checked once at writer construction —
        # bounds can only appear via a retraining writer, and
        # single-writer discipline rules out one running concurrently.
        sess = stream_df.sparkSession
        if quantile_bounds_read(sess, store_path):
            raise ValueError(
                f"quantile store at {store_path} is generational "
                "(trained bounds exist); maintaining it fixed-splits "
                "would mix gen-less rows into it — keep "
                "retrain_tvd set, or start a fresh store")

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        from lisp_batch_processor_spark.sources.writers import (
            check_store_epoch_lineage, store_append)
        if retrain_tvd is not None:
            quantile_hist_retrain_epoch(
                batch_df, store_path, keys, col, splits,
                retrain_tvd=retrain_tvd,
                retrain_min_rows=retrain_min_rows,
                epoch_id=int(epoch_id), lineage=lineage)
        else:
            # Same contract as the retrain path: the read-side
            # (keys, bucket, epoch_id) replay dedup silently drops a
            # restarted-at-0 lineage's counts as presumed replays.
            check_store_epoch_lineage(spark, store_path,
                                      int(epoch_id), lineage)
            store_append(
                quantile_hist_build(batch_df, keys, col, splits)
                .withColumn("epoch_id", F.lit(int(epoch_id))),
                store_path)
        if compact_every and (int(epoch_id) + 1) % compact_every == 0:
            sketch_store_compact(spark, store_path)

    return stream_df.writeStream.foreachBatch(_process)


def hll_stream_apply(stream_df: DataFrame, store_path: str,
                     keys: Sequence[str], col: str,
                     lg_k: int = LG_K,
                     compact_every: int | None = None):
    """Streaming distinct-count maintenance: each micro-batch reduces
    to one HLL sketch per group (kilobytes) appended to the store;
    answer any later rollup with :func:`hll_rollup` over the store.
    Returns the DataStreamWriter (use a checkpointLocation).

    Epoch replay is safe WITHOUT epoch tags, by a different mechanism
    than the quantile store: a replayed epoch re-runs the identical
    deterministic build over the identical checkpointed batch, and
    HLL union is idempotent over a sketch's value set (per-value
    coupons/registers are hash-deterministic), so the duplicate
    append cannot move the rollup. Pinned in tests/test_sketches.py.
    Caveat kept honest: two sketches of the same rows built under
    DIFFERENT partitionings may serialize in different modes (exact
    coupon list vs dense registers) and estimate a few counts apart
    — the store's accuracy contract is the published error bound,
    not cross-build byte equality.

    ``compact_every=N`` folds the store after every Nth epoch's
    append (see quantile_hist_stream_apply — same single-writer
    window argument; the HLL fold is total and replay-safe by union
    idempotence).
    """
    if compact_every is not None and compact_every < 1:
        raise ValueError(f"compact_every must be >= 1, "
                         f"got {compact_every}")

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        from lisp_batch_processor_spark.sources.writers import (
            store_append)
        store_append(hll_build(batch_df, keys, col, lg_k=lg_k),
                     store_path)
        if compact_every and (int(epoch_id) + 1) % compact_every == 0:
            sketch_store_compact(spark, store_path)

    return stream_df.writeStream.foreachBatch(_process)


def hll_store_read(spark, store_path: str) -> DataFrame:
    """The persisted sketch rows of a stream-maintained HLL store
    (feed to :func:`hll_rollup`). Backend-routed: a swap store
    repairs an interrupted :func:`sketch_store_compact` first, so a
    post-crash reader still sees a complete store; a versioned store
    resolves the committed pointer (no repair, concurrent-read
    safe)."""
    return spark.read.parquet(_store_data_path_strict(spark, store_path))


def quantile_hist_drift(hist: DataFrame, keys: Sequence[str],
                        n_splits: int) -> DataFrame:
    """Per-group drift score of a (merged) histogram against its
    trained equi-populated expectation: ``keys..., n, drift,
    max_bucket_mass``. The boundaries were trained so every bucket
    holds ~1/B of the REFERENCE mass; on stationary data the
    observed masses stay near that, under drift they concentrate.
    ``drift`` is the total variation distance between the observed
    bucket-mass vector and uniform (0 = exactly the training
    distribution, → 1 as the mass collapses into few buckets) —
    with B buckets, TVD = ½ Σ |mass_i − 1/B|, counting trained
    buckets with no rows. ``max_bucket_mass`` is the per-answer
    error bound quantile_hist_estimate reports, summarized at the
    group grain — when it grows past a few multiples of 1/B,
    retrain the splits (`quantile_bins_train`) and open a new
    store.

    Plan: one groupBy over the histogram rows (≤ B+1 per group) —
    kilobyte work regardless of the row corpus; the empty-bucket
    correction is arithmetic on the aggregates, no explode.
    """
    from pyspark.sql import Window

    if n_splits < 1:
        raise ValueError(f"n_splits must be >= 1, got {n_splits}")
    keys = list(keys)
    # B trained buckets = n_splits + 1 cells (below-first ... at/above
    # -last). Buckets absent from the histogram hold zero mass and
    # contribute |0 - 1/B| each to the TVD sum.
    b = n_splits + 1
    w = Window.partitionBy(*keys)
    mass = (F.col("cnt").cast("double")
            / F.sum("cnt").over(w))
    agg = (hist.withColumn("_qd_mass", mass)
           .groupBy(*keys)
           .agg(F.sum("cnt").alias("n"),
                F.count(F.lit(1)).alias("_present"),
                F.sum(F.abs(F.col("_qd_mass") - 1.0 / b))
                 .alias("_tvd_present"),
                F.max("_qd_mass").alias("max_bucket_mass")))
    return agg.select(
        *keys, "n",
        ((F.col("_tvd_present")
          + (b - F.col("_present")) * (1.0 / b)) / 2.0).alias("drift"),
        "max_bucket_mass")


# Epoch tag on compacted quantile-histogram base rows: strictly below
# any live foreachBatch epoch (those are >= 0), so a base row can
# never collide with a replayed epoch's rows in the store read's
# (keys, bucket, epoch_id) dedup.
COMPACT_EPOCH = -1


def sketch_store_compact(spark, store_path: str, keep_live: int = 1,
                         target_file_bytes: int = 128 * 1024 * 1024
                         ) -> int:
    """Fold a stream-maintained sketch store's accreted per-epoch
    appends into a bounded base — the maintenance pass that keeps
    per-question read cost flat over stream lifetime (each
    micro-batch of :func:`quantile_hist_stream_apply` /
    :func:`hll_stream_apply` appends one file-set forever; without
    this, every ``store_read`` re-lists and re-reads them all).
    Returns the number of units folded (0 = nothing worth folding).
    Run from the single writer's maintenance window — never
    concurrently with the stream's own appends (same contract as
    ``scd2_compact_closed``).

    Store type is detected from the schema:

    - **HLL store** (``..., sketch``): every group's sketches union
      into ONE row. Folding even the newest epoch is replay-safe —
      a replayed append re-unions the same value set, which cannot
      move any register (the store's existing replay argument) —
      so the fold is total. Returns the number of data files folded.
    - **Quantile-histogram store** (``..., bucket, cnt, epoch_id``):
      counts are NOT idempotent under replay, so only epochs that
      can no longer replay fold: everything except the
      ``keep_live`` highest epoch ids (Spark commits epoch N's
      offsets before running N+1, so once epoch N+1 has appended,
      N is committed; ``keep_live=1`` is therefore sufficient —
      raise it only for exotic checkpoint surgery). Folded rows
      dedup exactly as the store read does, then sum into one base
      row per (keys, bucket) tagged :data:`COMPACT_EPOCH`; live
      epochs' rows ride along unchanged, so a post-compaction
      replay still collapses against them. Returns the number of
      epochs folded.

    The rewrite publishes through the store's backend
    (`sources.writers.store_publish_rewrite`): a swap store builds
    in a hidden staging sibling and swaps in via the recoverable
    ``staged_swap`` (every crash window leaves a complete store at
    the canonical or backup path, repaired by the store reads); a
    versioned store publishes the fold as the next pointer-committed
    version and vacuums superseded ones — no renames load-bearing,
    object-store safe. Output file count is sized from the store's
    on-disk bytes (an upper bound on the folded result) against
    ``target_file_bytes``.
    """
    from lisp_batch_processor_spark.sources.writers import (
        _hadoop_fs, store_publish_rewrite)

    if keep_live < 1:
        raise ValueError(f"keep_live must be >= 1, got {keep_live}")
    root = store_path.rstrip("/")
    data_path = _store_data_path_strict(spark, root)
    df = spark.read.parquet(data_path)
    cols = df.columns
    jvm, fs, _ = _hadoop_fs(spark, root)
    jdata = jvm.org.apache.hadoop.fs.Path(data_path)
    size = fs.getContentSummary(jdata).getLength()
    n_files = max(1, -(-size // target_file_bytes))

    if "sketch" in cols:
        it = fs.listFiles(jdata, True)
        n_data = 0
        while it.hasNext():
            name = it.next().getPath().getName()
            if not name.startswith(("_", ".")):
                n_data += 1
        if n_data < 2:
            return 0
        keys = [c for c in cols if c != "sketch"]
        folded = (df.groupBy(*keys)
                  .agg(F.hll_union_agg("sketch").alias("sketch"))
                  .select(*cols))
        n_folded = n_data
    elif {"bucket", "cnt", "epoch_id"} <= set(cols):
        keys = [c for c in cols
                if c not in ("bucket", "cnt", "epoch_id")]
        # Driver state: one long per distinct epoch in the store —
        # the very quantity compaction bounds.
        epochs = sorted(r[0] for r in
                        df.select("epoch_id").distinct().collect())
        live = set(epochs[-keep_live:])
        foldable = [e for e in epochs if e not in live]
        if len(foldable) < 2:
            return 0
        deduped = df.dropDuplicates([*keys, "bucket", "epoch_id"])
        base = (deduped.filter(F.col("epoch_id").isin(foldable))
                .groupBy(*keys, "bucket")
                .agg(F.sum("cnt").alias("cnt"))
                .withColumn("epoch_id", F.lit(COMPACT_EPOCH)
                            .cast(dict(df.dtypes)["epoch_id"])))
        folded = (base.select(*cols)
                  .unionByName(
                      deduped.filter(~F.col("epoch_id").isin(foldable))
                      .select(*cols)))
        n_folded = len(foldable)
    else:
        raise ValueError(
            f"unrecognized sketch store schema at {root}: {cols} "
            "(expected an HLL store with a 'sketch' column or a "
            "quantile-histogram store with bucket/cnt/epoch_id)")

    store_publish_rewrite(spark, folded, root, n_files)
    return n_folded
