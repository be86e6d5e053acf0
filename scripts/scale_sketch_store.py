"""Measure what sketch_store_compact buys: per-question read cost of
the streaming sketch stores as the epoch count grows, with and
without compaction.

The round-5 stores appended one file-set per micro-batch forever, so
quantile_hist_store_read re-listed and re-read E epochs for every
question — per-question cost grew linearly with stream lifetime (the
last unbounded-growth path in the repo). The fold bounds it: counts
add / sketches union into a sentinel-tagged base, live epochs ride
along, so a post-compaction read touches O(groups x buckets) rows
regardless of E.

This script drives E append epochs into fresh quantile-histogram and
HLL stores and records, at checkpoints:

- read_raw_sec:       store read with NO compaction (grows with E)
- compact_sec:        one fold at that point (bounded by store size)
- read_compacted_sec: the same read after the fold (flat)
- files_raw / files_compacted: the file-count story behind it

Verdict criterion: read_compacted flat (last/first ~1x) while
read_raw grows with E, and compacted file count is O(1) vs E.

Run:  python scripts/scale_sketch_store.py   (writes SCALE_SKETCH_r06.json)
      SKETCH_EPOCHS=100 SKETCH_ROWS=20000 to override.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lisp_batch_processor_spark.operators.sketches import (  # noqa: E402
    hll_build, hll_rollup, hll_store_read, quantile_hist_build,
    quantile_hist_store_read, sketch_store_compact)
from lisp_batch_processor_spark.session import get_spark  # noqa: E402


def n_files(root: str) -> int:
    total = 0
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames
                       if not d.startswith((".", "_"))]
        total += sum(1 for f in filenames
                     if not f.startswith((".", "_")))
    return total


def timed(fn, passes: int = 3) -> float:
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    epochs = int(os.environ.get("SKETCH_EPOCHS", "200"))
    rows = int(os.environ.get("SKETCH_ROWS", "20000"))
    groups = int(os.environ.get("SKETCH_GROUPS", "128"))
    out_path = os.environ.get("SKETCH_OUT", "SCALE_SKETCH_r06.json")
    report_at = sorted({10, 25, 50, 100, epochs} & set(
        range(1, epochs + 1))) or [epochs]

    spark = get_spark("scale-sketch", cpus=8, shuffle_partitions=8)
    base = "/tmp/scale_sketch_store"
    shutil.rmtree(base, ignore_errors=True)
    qh_raw, qh_cmp = f"{base}/qh_raw", f"{base}/qh_cmp"
    hll_raw, hll_cmp = f"{base}/hll_raw", f"{base}/hll_cmp"
    splits = [float(s) for s in range(500, 10000, 500)]

    def batch(e: int):
        # Enough groups that the raw store accretes real row volume
        # (groups x buckets rows per epoch): the linear read-cost
        # term must be visible above job fixed overhead.
        return spark.range(e * rows, (e + 1) * rows).selectExpr(
            f"id % {groups} AS g",
            "CAST((id * 37) % 10007 AS DOUBLE) AS v",
            "CAST(id % 4096 AS STRING) AS u")

    checkpoints = []
    for e in range(epochs):
        b = batch(e).localCheckpoint(eager=True)
        qh = (quantile_hist_build(b, ["g"], "v", splits)
              .withColumn("epoch_id", F.lit(e)))
        for dest in (qh_raw, qh_cmp):
            qh.write.mode("append").parquet(dest)
        hl = hll_build(b, ["g"], "u")
        for dest in (hll_raw, hll_cmp):
            hl.write.mode("append").parquet(dest)
        if (e + 1) in report_at:
            point = {"epochs": e + 1}
            point["qh_read_raw_sec"] = timed(
                lambda: quantile_hist_store_read(
                    spark, qh_raw, ["g"]).collect())
            point["qh_files_raw"] = n_files(qh_raw)
            t0 = time.perf_counter()
            point["qh_folded"] = sketch_store_compact(spark, qh_cmp)
            point["qh_compact_sec"] = round(time.perf_counter() - t0, 3)
            point["qh_read_compacted_sec"] = timed(
                lambda: quantile_hist_store_read(
                    spark, qh_cmp, ["g"]).collect())
            point["qh_files_compacted"] = n_files(qh_cmp)
            point["hll_read_raw_sec"] = timed(
                lambda: hll_rollup(hll_store_read(spark, hll_raw),
                                   ["g"]).collect())
            point["hll_files_raw"] = n_files(hll_raw)
            t0 = time.perf_counter()
            point["hll_folded"] = sketch_store_compact(spark, hll_cmp)
            point["hll_compact_sec"] = round(time.perf_counter() - t0, 3)
            point["hll_read_compacted_sec"] = timed(
                lambda: hll_rollup(hll_store_read(spark, hll_cmp),
                                   ["g"]).collect())
            point["hll_files_compacted"] = n_files(hll_cmp)
            # Equivalence spot-check at every checkpoint: compaction
            # must not move a single count/estimate.
            raw = {(r.g, r.bucket): r.cnt
                   for r in quantile_hist_store_read(
                       spark, qh_raw, ["g"]).collect()}
            cmp_ = {(r.g, r.bucket): r.cnt
                    for r in quantile_hist_store_read(
                        spark, qh_cmp, ["g"]).collect()}
            assert raw == cmp_, f"qh mismatch at {e + 1}"
            hraw = {r.g: r.n_distinct
                    for r in hll_rollup(hll_store_read(spark, hll_raw),
                                        ["g"]).collect()}
            hcmp = {r.g: r.n_distinct
                    for r in hll_rollup(hll_store_read(spark, hll_cmp),
                                        ["g"]).collect()}
            assert hraw == hcmp, f"hll mismatch at {e + 1}"
            checkpoints.append(point)
            print(f"# {json.dumps(point)}", file=sys.stderr)

    first, last = checkpoints[0], checkpoints[-1]
    summary = {
        "epochs": epochs, "rows_per_epoch": rows,
        "groups": groups,
        "qh_read_raw_growth":
            round(last["qh_read_raw_sec"] / first["qh_read_raw_sec"], 2),
        "qh_read_compacted_growth":
            round(last["qh_read_compacted_sec"]
                  / first["qh_read_compacted_sec"], 2),
        "hll_read_raw_growth":
            round(last["hll_read_raw_sec"] / first["hll_read_raw_sec"], 2),
        "hll_read_compacted_growth":
            round(last["hll_read_compacted_sec"]
                  / first["hll_read_compacted_sec"], 2),
        "qh_files_raw_last": last["qh_files_raw"],
        "qh_files_compacted_last": last["qh_files_compacted"],
        "hll_files_raw_last": last["hll_files_raw"],
        "hll_files_compacted_last": last["hll_files_compacted"],
    }
    with open(out_path, "w") as f:
        json.dump({"summary": summary, "checkpoints": checkpoints},
                  f, indent=1)
    print(json.dumps(summary))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
