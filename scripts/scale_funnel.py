"""Measure the opt-in ingest funnel's per-epoch cost AFTER the
round-11 no-replay fix (pipelines/ingest.py: with ``funnel_sink``
set, the near-dup/semantic survivor frames are localCheckpoint'ed
before counting, so no stage's join executes twice for a counter —
the structural pin is the count-plan spy in
tests/test_corpus_ingest.py; this run prices what remains: the
snapshot plus one count job per stage).

Two modes over identical fresh stores — funnel off (the hot path)
and funnel on — E epochs each, same synthetic mostly-novel docs as
scale_ingest (boilerplate line + ~2% cross-epoch URL repeats), one
untimed warmup epoch per mode on a throwaway state dir. Reports
per-epoch medians and the on/off ratio, at EACH requested batch size
(round 12: the r11 single-size run measured 0.93× — funnel-on
FASTER — which SCALE.md attributed to the snapshot materializing a
frame downstream stages reuse; running two sizes separates that
reuse effect from measurement noise and prices the true overhead
where the per-epoch Spark work dominates the snapshot).

Run:  python scripts/scale_funnel.py
      FUN_EPOCHS=8 FUN_DOCS=2000,10000 to override (comma list).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lisp_batch_processor_spark.pipelines.ingest import (  # noqa: E402
    corpus_ingest_epoch, corpus_ingest_init)
from lisp_batch_processor_spark.session import get_spark  # noqa: E402
from scale_ingest import _epoch_docs, median  # noqa: E402


def funnel_experiment(spark, base, epochs, docs_per_epoch):
    out = {}
    for mode in ("off", "on"):
        wsd = f"{base}/warm_{mode}"
        corpus_ingest_init(spark, wsd)
        sink = (None if mode == "off"
                else (lambda d: None))
        corpus_ingest_epoch(_epoch_docs(spark, 0, docs_per_epoch),
                            wsd, 0, funnel_sink=sink)
        sd = f"{base}/state_{mode}"
        corpus_ingest_init(spark, sd)
        counters = []
        per_epoch = []
        real_sink = (None if mode == "off" else counters.append)
        for e in range(epochs):
            batch = _epoch_docs(spark, e, docs_per_epoch)
            t0 = time.perf_counter()
            corpus_ingest_epoch(batch, sd, e, funnel_sink=real_sink)
            per_epoch.append(time.perf_counter() - t0)
        out[mode] = {"epoch_median_sec": round(median(per_epoch), 3),
                     "epoch_min_sec": round(min(per_epoch), 3)}
        if mode == "on":
            # Sanity: the counters came through for every epoch and
            # the tail stage saw the mostly-novel corpus shape.
            assert len(counters) == epochs
            out["sample_funnel"] = counters[-1]
    out["on_over_off_median"] = round(
        out["on"]["epoch_median_sec"]
        / max(1e-9, out["off"]["epoch_median_sec"]), 3)
    return out


def main() -> None:
    epochs = int(os.environ.get("FUN_EPOCHS", "8"))
    sizes = [int(s) for s in
             os.environ.get("FUN_DOCS", "2000,10000").split(",")]
    out_path = os.environ.get("FUN_OUT", "SCALE_FUNNEL_r12.json")

    spark = get_spark("scale-funnel", cpus=8, shuffle_partitions=8)
    result = {"params": {"epochs": epochs, "docs_per_epoch": sizes},
              "funnel_by_batch_size": {}}
    for docs in sizes:
        base = f"/tmp/scale_funnel_{docs}"
        shutil.rmtree(base, ignore_errors=True)
        result["funnel_by_batch_size"][str(docs)] = funnel_experiment(
            spark, base, epochs, docs)
        shutil.rmtree(base, ignore_errors=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: {"on_over_off_median":
                          v["on_over_off_median"]}
                      for k, v in
                      result["funnel_by_batch_size"].items()}))


if __name__ == "__main__":
    main()
