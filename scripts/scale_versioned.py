"""Measure what the round-7 persistence changes cost: the versioned
(pointer-committed) store backend vs the default rename-swap backend,
and the drift-triggered retrain inside the quantile-store loop.

Three experiments, one JSON artifact (SCALE_VERSIONED_r07.json):

1. Sketch store, swap vs versioned: E append epochs with a
   `compact_every`-style fold at checkpoints, per-epoch append time,
   fold time, post-fold read time, file/version counts, and a final
   exact-equality check between the two backends' read results. The
   versioned fold writes the SAME folded frame and replaces a rename
   pair with one pointer PUT + vacuum — overhead should be file-ops
   noise, not a multiple.

2. CDC upsert, swap vs versioned: an initialized N-row table across
   B buckets takes E update epochs (each touching a handful of
   buckets); per-epoch apply time and read time per backend, final
   state equality. Since round 8 the versioned backend commits each
   epoch under ONE manifest PUT (stage move + manifest + vacuum —
   O(1) FS ops per epoch, epoch id inside the manifest) instead of
   round 7's per-bucket pointer PUTs, so the target is parity with
   the swap's per-bucket renames, not the measured 1.52x of
   SCALE_VERSIONED_r07.

3. Drift retrain: quantile_hist_retrain_epoch over E epochs with a
   distribution shift injected mid-stream — exactly one retrain must
   fire, and its epoch's wall cost is reported against the median
   no-retrain epoch (the retrain adds ONE approxQuantile pass over
   the batch only, never the store).

Verdict criteria: versioned/swap per-epoch medians within ~1.5x
(both are small-file metadata ops at this scale), equality exact,
retrain count == 1, retrain epoch <= a few x the median epoch.

Run:  python scripts/scale_versioned.py
      VER_EPOCHS=40 VER_ROWS=20000 to override.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lisp_batch_processor_spark.operators.cdc import (  # noqa: E402
    upsert_apply, upsert_init, upsert_read)
from lisp_batch_processor_spark.operators.sketches import (  # noqa: E402
    quantile_hist_build, quantile_hist_retrain_epoch,
    quantile_hist_store_read, quantile_store_current, sketch_store_compact,
    sketch_store_init)
from lisp_batch_processor_spark.session import get_spark  # noqa: E402
from lisp_batch_processor_spark.sources.writers import (  # noqa: E402
    store_append, versioned_store_init)


def n_files(root: str) -> int:
    # Descend into `_ub=<n>`-style partition dirs (the CDC swap
    # layout's bucket col is underscore-named) but not hidden staging
    # (`.`-prefixed); count data files only (markers/pointers are
    # `_`/`.`-prefixed files).
    total = 0
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if not d.startswith(".")
                       and not (d.startswith("_") and "=" not in d)]
        total += sum(1 for f in filenames if not f.startswith((".", "_")))
    return total


def median(v):
    s = sorted(v)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def sketch_experiment(spark, base, epochs, rows, groups, compact_every):
    splits = [float(s) for s in range(500, 10000, 500)]

    def batch(e):
        return spark.range(e * rows, (e + 1) * rows).selectExpr(
            f"id % {groups} AS g",
            "CAST((id * 37) % 10007 AS DOUBLE) AS v")

    out = {}
    reads = {}
    for backend in ("swap", "versioned"):
        path = f"{base}/sketch_{backend}"
        sketch_store_init(spark, path, backend=backend)
        appends, folds = [], []
        for e in range(epochs):
            hist = (quantile_hist_build(batch(e), ["g"], "v", splits)
                    .withColumn("epoch_id", F.lit(e)))
            t0 = time.perf_counter()
            store_append(hist, path)
            appends.append(time.perf_counter() - t0)
            if (e + 1) % compact_every == 0:
                t0 = time.perf_counter()
                sketch_store_compact(spark, path)
                folds.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        rows_out = quantile_hist_store_read(spark, path, ["g"]).collect()
        read_sec = time.perf_counter() - t0
        reads[backend] = {(r.g, r.bucket): r.cnt for r in rows_out}
        out[backend] = {
            "append_median_sec": round(median(appends), 3),
            "fold_median_sec": round(median(folds), 3),
            "read_sec": round(read_sec, 3),
            "files": n_files(path),
        }
    assert reads["swap"] == reads["versioned"], "backend results diverge"
    out["equal"] = True
    out["append_overhead_x"] = round(
        out["versioned"]["append_median_sec"]
        / out["swap"]["append_median_sec"], 2)
    out["fold_overhead_x"] = round(
        out["versioned"]["fold_median_sec"]
        / out["swap"]["fold_median_sec"], 2)
    return out


def cdc_experiment(spark, base, n_rows, n_buckets, epochs, upd_rows):
    out = {}
    finals = {}
    for backend in ("swap", "versioned"):
        path = f"{base}/cdc_{backend}"
        snap = spark.range(n_rows).selectExpr(
            "id AS k", "CAST(id % 97 AS STRING) AS v")
        upsert_init(snap, path, key="k", n_buckets=n_buckets,
                    backend=backend)
        applies = []
        for e in range(epochs):
            # Half updates (keys inside the initial range), half
            # inserts (keys past it — each epoch's are new, so the
            # versioned backend's first-touch bucket creation and the
            # swap's new-key path are both exercised), touching a
            # changing key subset each epoch.
            upd = spark.range(upd_rows).selectExpr(
                f"CASE WHEN id < {upd_rows // 2} "
                f"  THEN id * {epochs} + {e} "
                f"  ELSE {n_rows} + id * {epochs} + {e} END AS k",
                f"CAST({e} AS STRING) AS v")
            t0 = time.perf_counter()
            assert upsert_apply(spark, path, upd, epoch_id=e)
            applies.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        rows_out = upsert_read(spark, path).collect()
        read_sec = time.perf_counter() - t0
        finals[backend] = {r.k: r.v for r in rows_out}
        out[backend] = {
            "apply_median_sec": round(median(applies), 3),
            "read_sec": round(read_sec, 3),
            "files": n_files(path),
        }
    assert finals["swap"] == finals["versioned"], "backend states diverge"
    out["equal"] = True
    out["apply_overhead_x"] = round(
        out["versioned"]["apply_median_sec"]
        / out["swap"]["apply_median_sec"], 2)
    return out


def retrain_experiment(spark, base, epochs, rows, groups):
    path = f"{base}/drift_store"
    versioned_store_init(spark, path)
    splits = [float(s) for s in range(500, 10000, 500)]
    shift_at = epochs // 2

    def batch(e):
        # Uniform over [0, 10007) before the shift; afterwards the
        # mass moves to [20000, 30007) — every trained bucket but the
        # last empties, TVD jumps far above the trigger.
        off = 0 if e < shift_at else 20000
        return spark.range(e * rows, (e + 1) * rows).selectExpr(
            f"id % {groups} AS g",
            f"CAST((id * 37) % 10007 + {off} AS DOUBLE) AS v")

    per_epoch, gens = [], []
    for e in range(epochs):
        t0 = time.perf_counter()
        gen = quantile_hist_retrain_epoch(
            batch(e), path, ["g"], "v", splits,
            retrain_tvd=0.25, retrain_min_rows=100, epoch_id=e)
        per_epoch.append(time.perf_counter() - t0)
        gens.append(gen)
    retrain_epochs = [e for e in range(1, epochs)
                      if gens[e] != gens[e - 1]]
    gen, cur_splits, _hist = quantile_store_current(spark, path, ["g"])
    normal = [dt for e, dt in enumerate(per_epoch)
              if e not in retrain_epochs and e > 0]
    med = median(normal)
    return {
        "epochs": epochs,
        "retrains": len(retrain_epochs),
        "retrain_at": retrain_epochs,
        "final_gen": gen,
        # The retrained boundaries must actually track the shifted
        # distribution: their median should land in the new range.
        "retrained_mid_split": cur_splits[len(cur_splits) // 2],
        "median_epoch_sec": round(med, 3),
        "retrain_epoch_sec": round(per_epoch[retrain_epochs[0]], 3)
        if retrain_epochs else None,
        "retrain_overhead_x": round(per_epoch[retrain_epochs[0]] / med, 2)
        if retrain_epochs else None,
    }


def main() -> None:
    epochs = int(os.environ.get("VER_EPOCHS", "40"))
    rows = int(os.environ.get("VER_ROWS", "20000"))
    groups = int(os.environ.get("VER_GROUPS", "64"))
    out_path = os.environ.get("VER_OUT", "SCALE_VERSIONED_r08.json")

    spark = get_spark("scale-versioned", cpus=8, shuffle_partitions=8)
    base = "/tmp/scale_versioned"
    shutil.rmtree(base, ignore_errors=True)

    result = {
        "params": {"epochs": epochs, "rows_per_epoch": rows,
                   "groups": groups},
        "sketch": sketch_experiment(spark, base, epochs, rows, groups,
                                    compact_every=10),
        "cdc": cdc_experiment(spark, base, n_rows=200_000, n_buckets=32,
                              epochs=max(10, epochs // 2), upd_rows=2000),
        "retrain": retrain_experiment(spark, base, epochs, rows, groups),
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({
        "sketch_append_overhead_x": result["sketch"]["append_overhead_x"],
        "sketch_fold_overhead_x": result["sketch"]["fold_overhead_x"],
        "cdc_apply_overhead_x": result["cdc"]["apply_overhead_x"],
        "retrains": result["retrain"]["retrains"],
        "retrain_overhead_x": result["retrain"]["retrain_overhead_x"],
    }))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
