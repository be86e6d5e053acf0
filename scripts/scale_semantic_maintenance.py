"""Measure the semantic-maintenance loop (touched operators only,
not the full sweep):

1. Semantic-store compaction (`streaming.dedup.semantic_store_compact`
   via `streaming_semantic_ingest`'s `compact_every` hook): E epochs
   of `semantic_ingest_epoch` with and without the hook — per-epoch
   cost trend (first-third vs last-third medians: the raw loop's
   store read degrades with one appended file set per epoch, the
   hooked loop's stays flat), final vector-store file counts, and
   the fold's own cost.

2. Generational reseed (`streaming.dedup.semantic_reseed`): after the
   hooked run, one reseed with k re-derived from a target cell size —
   its cost as a multiple of the median epoch, occupancy before and
   after (max_cell must drop), and the first post-reseed epoch's cost
   vs the pre-reseed median (the re-celled store must not be slower).

3. The reseed-due signal (round 10): every hooked epoch also reads
   BOTH occupancy signals — the O(k)-per-epoch ledger fold
   (`semantic_cell_occupancy_fast`) and the full survivor scan
   (`semantic_cell_occupancy`) — asserting identical numbers (so the
   trigger decisions match at every epoch, including across
   compactions) and recording each signal's median cost. The fast
   one is what `_sem_reseed_if_due` polls; the full scan was the
   only O(corpus)-per-epoch term left in the ingest loop.

4. The O(k)-vs-O(corpus) claim BY MEASUREMENT (round 11): the same
   two signals timed across survivor stores a decade apart in size
   (fixed k, fixed ledger epochs — only the survivor count moves).
   The full scan's median must grow with survivors while the ledger
   fold's stays flat; decisions are asserted equal at every scale.
   At r10's 5.6k survivors both signals were job-overhead-bound, so
   the claim was argued from design — this run demonstrates it.

Run:  python scripts/scale_semantic_maintenance.py
      SEM_CORPUS=4000 SEM_EPOCHS=16 SEM_BATCH=500 to override;
      SEM_SCALES=6000,60000,600000,3000000 for experiment 4's
      survivor sizes.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lisp_batch_processor_spark.session import get_spark  # noqa: E402
from lisp_batch_processor_spark.streaming.dedup import (  # noqa: E402
    semantic_cell_occupancy, semantic_cell_occupancy_fast,
    semantic_ingest_epoch, semantic_read_centroids, semantic_reseed,
    semantic_store_compact, semantic_store_seed, semantic_store_roots)


def median(v):
    s = sorted(v)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def _seed(spark, n, dim=32):
    # i.i.d. hash-uniform components (see scale_ingest._emb_docs for
    # why correlated components degenerate the cell join).
    return spark.range(n).selectExpr(
        "id AS vec_id",
        f"transform(sequence(0, {dim - 1}), j -> "
        " CAST(pmod(xxhash64(id, j), 2001) - 1000 AS DOUBLE)"
        " / 1000.0) AS embedding")


def _batch(spark, e, rows, corpus_n, dim=32, novel_every=10):
    # Mostly dups of seed vectors (the store grows ~rows/novel_every
    # per epoch, so per-cell occupancy — the join's cost term — stays
    # near-constant and the FILE-ACCRETION term is what the raw-vs-
    # hooked comparison isolates); novel ids are epoch-unique.
    return spark.range(rows).selectExpr(
        f"id + {corpus_n + e * rows} AS vec_id",
        f"CASE WHEN id % {novel_every} != 0 THEN"
        f" transform(sequence(0, {dim - 1}),"
        f" j -> CAST(pmod(xxhash64(pmod(id + {e}, {corpus_n}), j),"
        " 2001) - 1000 AS DOUBLE) / 1000.0 * 1.0001)"
        f" ELSE transform(sequence(0, {dim - 1}), j ->"
        f" CAST(pmod(xxhash64(id + {10 * corpus_n} + {e * rows}, j),"
        " 2001) - 1000 AS DOUBLE) / 1000.0) END AS embedding"
    ).repartition(8)  # several files per append — the accretion


def _n_files(path):
    return len([f for f in os.listdir(path) if f.endswith(".parquet")])


def maintenance_experiment(spark, base, corpus_n, epochs, batch_rows,
                           compact_every):
    out = {}
    per_epoch_hooked = []
    # Untimed warmup on a throwaway store: JVM/codegen warmup
    # otherwise lands entirely in the first mode's first-third.
    wsd = f"{base}/sem_warmup"
    semantic_store_seed(_seed(spark, corpus_n // 4), wsd, k=4)
    for e in range(2):
        semantic_ingest_epoch(_batch(spark, e, 100, corpus_n // 4),
                              wsd, tau=0.95)
    # Three modes decompose the maintenance hook's per-epoch cost:
    # raw (pre-r10: no ledger, no folds), ledger (the O(k) count
    # append only), hooked (ledger + compact_every folds) — so the
    # raw-vs-hooked delta attributes to its two components instead
    # of reading as one opaque overhead.
    for mode in ("raw", "ledger", "hooked"):
        sd = f"{base}/sem_{mode}"
        semantic_store_seed(_seed(spark, corpus_n), sd,
                            k=max(2, corpus_n // 128))
        cents = semantic_read_centroids(spark, sd)
        per_epoch, folds = [], []
        fast_s, full_s = [], []
        signals_equal = True
        for e in range(epochs):
            batch = _batch(spark, e, batch_rows, corpus_n)
            t0 = time.perf_counter()
            # ledger/hooked pass the epoch id, as the streaming
            # wrappers do — the O(k) occupancy-ledger append is part
            # of their per-epoch cost; the raw loop stays pre-r10.
            semantic_ingest_epoch(batch, sd, tau=0.95, centroids=cents,
                                  epoch=(None if mode == "raw"
                                         else e))
            per_epoch.append(time.perf_counter() - t0)
            if mode == "hooked":
                # Both reseed-due signals, timed OUTSIDE the epoch
                # timer: the ledger fold the trigger polls, and the
                # full survivor scan it replaced — numbers must
                # match at every epoch (same trigger decisions),
                # including across the compaction folds below.
                t0 = time.perf_counter()
                occ_fast = semantic_cell_occupancy_fast(spark, sd)
                fast_s.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                occ_full = semantic_cell_occupancy(spark, sd)
                full_s.append(time.perf_counter() - t0)
                if occ_fast != occ_full:
                    signals_equal = False
                    print(f"SIGNAL MISMATCH at epoch {e}: "
                          f"fast={occ_fast} full={occ_full}")
            if mode == "hooked" and (e + 1) % compact_every == 0:
                t0 = time.perf_counter()
                semantic_store_compact(spark, sd)
                folds.append(time.perf_counter() - t0)
        third = max(1, epochs // 3)
        _, vec_path = semantic_store_roots(spark, sd)
        out[mode] = {
            "epoch_first_third_median_sec":
                round(median(per_epoch[:third]), 3),
            "epoch_last_third_median_sec":
                round(median(per_epoch[-third:]), 3),
            "vector_files": _n_files(vec_path),
        }
        if folds:
            out[mode]["fold_median_sec"] = round(median(folds), 3)
        if mode == "hooked":
            per_epoch_hooked = per_epoch
            out["trigger_signal"] = {
                "decisions_equal_all_epochs": signals_equal,
                "fast_median_sec": round(median(fast_s), 3),
                "full_scan_median_sec": round(median(full_s), 3),
            }
    out["file_ratio_raw_over_hooked"] = round(
        out["raw"]["vector_files"]
        / max(1, out["hooked"]["vector_files"]), 2)
    return out, per_epoch_hooked


def reseed_experiment(spark, base, corpus_n, batch_rows,
                      epoch_median_sec):
    sd = f"{base}/sem_hooked"  # continue from the hooked run's state
    occ_before = semantic_cell_occupancy(spark, sd)
    t0 = time.perf_counter()
    gen = semantic_reseed(spark, sd,
                          target_cell=128, epoch=10_000)
    reseed_sec = time.perf_counter() - t0
    occ_after = semantic_cell_occupancy(spark, sd)
    # The reseed wrote the new generation's complete ledger baseline:
    # the fast signal must agree with the full scan immediately.
    occ_after_fast = semantic_cell_occupancy_fast(spark, sd)
    # First post-reseed epoch: cost against the re-celled store —
    # with the centroid model pre-collected OUTSIDE the timed
    # region, exactly like every pre-reseed epoch (the streaming
    # loop's per-generation cache), so the comparison isolates the
    # store shape rather than an extra driver collect.
    cents_new = semantic_read_centroids(spark, sd)
    batch = _batch(spark, 999, batch_rows, corpus_n)
    t0 = time.perf_counter()
    # epoch passed, like every timed pre-reseed epoch (the ledger
    # append is part of the per-epoch cost being compared).
    semantic_ingest_epoch(batch, sd, tau=0.95, centroids=cents_new,
                          epoch=10_001)
    post_epoch_sec = time.perf_counter() - t0
    return {
        "gen": gen,
        "occupancy_before": occ_before,
        "occupancy_after": occ_after,
        "post_reseed_fast_signal_equal": occ_after_fast == occ_after,
        "reseed_sec": round(reseed_sec, 3),
        "reseed_over_median_epoch": round(
            reseed_sec / max(1e-9, epoch_median_sec), 2),
        "post_reseed_epoch_sec": round(post_epoch_sec, 3),
        "pre_reseed_epoch_median_sec": round(epoch_median_sec, 3),
    }


def occupancy_scaling_experiment(spark, base, scales, reps=9,
                                 epochs=3, batch_rows=200):
    """Experiment 4: both reseed-due signals timed at survivor-store
    sizes a decade apart. Each scale seeds a FRESH store of n
    survivors at the SAME k (so the ledger's size — k x epochs rows —
    is constant across scales and only the survivor count moves),
    runs a few tagged epochs so the ledger has live epoch rows like a
    real loop's would, then times `semantic_cell_occupancy_fast` (the
    ledger fold) and `semantic_cell_occupancy` (the full survivor
    scan) ``reps`` times interleaved, reporting medians and the
    decisions-equal assertion per scale."""
    out = []
    for n in scales:
        sd = f"{base}/sem_occ_{n}"
        semantic_store_seed(_seed(spark, n), sd, k=64)
        cents = semantic_read_centroids(spark, sd)
        for e in range(epochs):
            semantic_ingest_epoch(_batch(spark, e, batch_rows, n),
                                  sd, tau=0.95, centroids=cents,
                                  epoch=e)
        fast_s, full_s, equal = [], [], True
        for _ in range(reps):
            t0 = time.perf_counter()
            occ_fast = semantic_cell_occupancy_fast(spark, sd)
            fast_s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            occ_full = semantic_cell_occupancy(spark, sd)
            full_s.append(time.perf_counter() - t0)
            if occ_fast != occ_full:
                equal = False
                print(f"SIGNAL MISMATCH at n={n}: "
                      f"fast={occ_fast} full={occ_full}")
        out.append({
            "survivors": occ_full["vectors"],
            "k": occ_full["k"],
            "fast_median_sec": round(median(fast_s), 3),
            "full_scan_median_sec": round(median(full_s), 3),
            "decisions_equal": equal,
        })
        print(json.dumps(out[-1]))
    if len(out) >= 2:
        a, b = out[0], out[-1]
        g = lambda r, k: max(1e-9, r[k])
        return {
            "scales": out,
            "survivor_ratio": round(b["survivors"] / a["survivors"], 1),
            "full_scan_ratio": round(
                g(b, "full_scan_median_sec")
                / g(a, "full_scan_median_sec"), 2),
            "fast_ratio": round(
                g(b, "fast_median_sec") / g(a, "fast_median_sec"), 2),
        }
    return {"scales": out}


def main() -> None:
    corpus_n = int(os.environ.get("SEM_CORPUS", "4000"))
    epochs = int(os.environ.get("SEM_EPOCHS", "32"))
    batch_rows = int(os.environ.get("SEM_BATCH", "500"))
    compact_every = int(os.environ.get("SEM_COMPACT_EVERY", "8"))
    scales = [int(s) for s in os.environ.get(
        "SEM_SCALES", "6000,60000,600000,3000000").split(",")]
    out_path = os.environ.get("SEM_OUT", "SCALE_SEMANTIC_r11.json")

    spark = get_spark("scale-semantic", cpus=8, shuffle_partitions=8)
    base = "/tmp/scale_semantic"
    shutil.rmtree(base, ignore_errors=True)

    maint, per_epoch_hooked = maintenance_experiment(
        spark, base, corpus_n, epochs, batch_rows, compact_every)
    result = {
        "params": {"corpus_n": corpus_n, "epochs": epochs,
                   "batch_rows": batch_rows,
                   "compact_every": compact_every,
                   "occupancy_scales": scales},
        "semantic_maintenance": maint,
        "semantic_reseed": reseed_experiment(
            spark, base, corpus_n, batch_rows,
            median(per_epoch_hooked)),
        "occupancy_scaling": occupancy_scaling_experiment(
            spark, base, scales),
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({
        "raw_last_third_sec":
            maint["raw"]["epoch_last_third_median_sec"],
        "hooked_last_third_sec":
            maint["hooked"]["epoch_last_third_median_sec"],
        "file_ratio_raw_over_hooked":
            maint["file_ratio_raw_over_hooked"],
        "reseed_over_median_epoch":
            result["semantic_reseed"]["reseed_over_median_epoch"],
        "max_cell_before":
            result["semantic_reseed"]["occupancy_before"]["max_cell"],
        "max_cell_after":
            result["semantic_reseed"]["occupancy_after"]["max_cell"],
        "occupancy_full_scan_ratio":
            result["occupancy_scaling"].get("full_scan_ratio"),
        "occupancy_fast_ratio":
            result["occupancy_scaling"].get("fast_ratio"),
    }))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
