"""Measure SCD2 per-epoch write cost as the closed history grows.

The round-4 single-path `scd2_stream_apply` rewrote the ENTIRE
history every micro-batch, so per-epoch bytes written grew with the
number of past epochs — the flagged scale-killer for long-lived
dimensions. The round-5 split-path layout appends the rows an epoch
closes and staged-swaps only the open slice, so per-epoch bytes are
O(open + batch) regardless of history depth.

This script drives E epochs over a fixed key set where EVERY epoch
changes every key (the fastest possible history growth: closed/open
ratio reaches E:1), and records per epoch:

- split_write_bytes:      closed/epoch_<e> + the new open slice —
                          what the split-path layout actually wrote
- singlepath_write_bytes: total history footprint after the epoch —
                          what the old layout would have rewritten
- apply_sec:              wall time of the split apply

Verdict criterion: split_write_bytes flat (last/first ~1x) while
singlepath_write_bytes grows ~linearly (last/first ~E x) and the
closed history reaches two decades over the open slice.

Run:  python scripts/scale_scd2.py            (writes SCALE_SCD2_r05.json)
      SCD2_KEYS=2000 SCD2_EPOCHS=100 to override.
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime, timedelta

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lisp_batch_processor_spark.operators.scd import (
    scd2_read, scd2_split_apply, scd2_split_init)
from lisp_batch_processor_spark.session import get_spark


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    keys = int(os.environ.get("SCD2_KEYS", "2000"))
    epochs = int(os.environ.get("SCD2_EPOCHS", "100"))
    out_path = os.environ.get("SCD2_OUT", "SCALE_SCD2_r05.json")
    report_at = sorted({1, 2, 5, 10, 20, 50, epochs} & set(
        range(1, epochs + 1))) or [epochs]

    spark = get_spark("scale-scd2", cpus=8, shuffle_partitions=8)
    import tempfile
    workdir = tempfile.mkdtemp(prefix="scd2_scale_")
    path = os.path.join(workdir, "dim")
    t0 = datetime(2020, 1, 1)

    snap = spark.range(keys).select(
        F.col("id").alias("k"),
        F.lit("v0").alias("val"),
        F.lit("tier0").alias("tier"))
    scd2_split_init(snap, t0, path, key="k")
    open_path = os.path.join(path, "open")

    rows = []
    for e in range(epochs):
        eff = t0 + timedelta(days=e + 1)
        upd = spark.range(keys).select(
            F.col("id").alias("k"),
            F.lit(f"v{e + 1}").alias("val"),
            F.lit(f"tier{(e + 1) % 3}").alias("tier"),
            F.lit(eff).cast("timestamp").alias("effective_from"))
        t_start = time.perf_counter()
        applied = scd2_split_apply(spark, path, upd, key="k",
                                   attrs=["val", "tier"], epoch_id=e)
        dt = time.perf_counter() - t_start
        assert applied
        if (e + 1) in report_at:
            closed_e = dir_bytes(
                os.path.join(path, "closed", f"epoch_{e}"))
            open_b = dir_bytes(open_path)
            closed_total = dir_bytes(os.path.join(path, "closed"))
            rows.append({
                "epoch": e + 1,
                "split_write_bytes": closed_e + open_b,
                "singlepath_write_bytes": closed_total + open_b,
                "closed_over_open": round(closed_total / max(open_b, 1), 2),
                "apply_sec": round(dt, 3),
            })
            print(f"# epoch {e + 1}: split={closed_e + open_b} "
                  f"single={closed_total + open_b} "
                  f"ratio={rows[-1]['closed_over_open']} "
                  f"t={dt:.2f}s", file=sys.stderr)

    # Correctness spot-check: history row count is exactly
    # keys * (epochs + 1) (every epoch closes every key once).
    n = scd2_read(spark, path).count()
    assert n == keys * (epochs + 1), (n, keys, epochs)

    first, last = rows[0], rows[-1]
    summary = {
        "keys": keys,
        "epochs": epochs,
        "history_rows": n,
        "split_growth": round(
            last["split_write_bytes"] / first["split_write_bytes"], 2),
        "singlepath_growth": round(
            last["singlepath_write_bytes"]
            / first["singlepath_write_bytes"], 2),
        "final_closed_over_open": last["closed_over_open"],
        "per_epoch": rows,
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items()
                      if k != "per_epoch"}))
    import shutil
    shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
