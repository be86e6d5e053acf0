"""Scale slopes for the round-7 library additions: semantic_dedup
and write_training_shards at sf0.1 vs the x10 blow-up.

Both operators are sized the way a real deployment sizes them —
model/shard parameters grow WITH the corpus (k cells ∝ N keeps cell
population constant; num_shards ∝ N keeps rows/shard constant), so
the exponent measures corpus growth at constant per-unit work, the
regime that matters at 100 TB.

Per scale: 1 discarded warmup + N timed passes ($OPS_SCALE_PASSES,
default 2), min reported. Writes SCALE_OPS_r07.json; exponent
ln(t10/t1)/ln(10), <= ~1.15 reads as linear.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lisp_batch_processor_spark.operators.dedup import (  # noqa: E402
    semantic_dedup)
from lisp_batch_processor_spark.operators.training import (  # noqa: E402
    shuffle_deterministic)
from lisp_batch_processor_spark.session import get_spark  # noqa: E402
from lisp_batch_processor_spark.sources.shards import (  # noqa: E402
    write_training_shards)

SF01 = "/root/testdata/sf0.1"
X10 = "/root/repo/.scale/x10"


def time_min(fn, passes: int) -> float:
    best = float("inf")
    fn()                                  # warmup (discarded)
    for _ in range(passes):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    passes = int(os.environ.get("OPS_SCALE_PASSES", "2"))
    spark = get_spark("scale-ops", cpus=8, shuffle_partitions=8)
    if not os.path.isdir(f"{X10}/embeddings.parquet"):
        sys.exit(f"blow-up missing at {X10} — run scale_slope.py once")

    result: dict = {}
    base = "/tmp/scale_ops"
    shutil.rmtree(base, ignore_errors=True)
    for tag, src, mult in (("sf0.1", SF01, 1), ("x10", X10, 10)):
        emb = spark.read.parquet(f"{src}/embeddings.parquet")
        n_vec = emb.count()
        k = 16 * mult                      # cells ∝ N: ~125 vecs/cell

        def run_semantic():
            semantic_dedup(emb, k=k, tau=0.95, iters=1) \
                .agg(F.sum(F.col("is_dup").cast("long"))).collect()

        docs = (spark.read.parquet(f"{src}/documents.parquet")
                .select("doc_id", F.length("text").alias("n_tokens"),
                        "text"))
        order = shuffle_deterministic(docs, salt="ops-scale")
        n_doc = docs.count()
        shard_dir = f"{base}/{tag}"

        def run_shards():
            write_training_shards(order, shard_dir,
                                  num_shards=8 * mult,
                                  order_within=())

        result[tag] = {
            "vectors": n_vec, "k_cells": k,
            "semantic_dedup_sec": time_min(run_semantic, passes),
            "docs": n_doc, "num_shards": 8 * mult,
            "write_shards_sec": time_min(run_shards, passes),
        }
        print(f"# {tag}: {json.dumps(result[tag])}", file=sys.stderr)

    a, b = result["sf0.1"], result["x10"]
    summary = {
        "semantic_dedup": {
            "sf0.1_sec": a["semantic_dedup_sec"],
            "x10_sec": b["semantic_dedup_sec"],
            "exp": round(math.log(b["semantic_dedup_sec"]
                                  / a["semantic_dedup_sec"])
                         / math.log(10), 2)},
        "write_training_shards": {
            "sf0.1_sec": a["write_shards_sec"],
            "x10_sec": b["write_shards_sec"],
            "exp": round(math.log(b["write_shards_sec"]
                                  / a["write_shards_sec"])
                         / math.log(10), 2)},
    }
    with open("SCALE_OPS_r07.json", "w") as f:
        json.dump({"summary": summary, "points": result}, f, indent=1)
    print(json.dumps(summary))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
