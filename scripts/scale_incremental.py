"""Incremental batch-vs-corpus dedup scale measurement: the
production-shaped companion to scale_slope.py.

Measures `dedup.incremental_near_dups` assigning a FIXED 500-doc
batch (sf0.01 documents, ids shifted into a fresh key range) against
corpora of growing size (sf0.1 and the x10 blow-up), with the corpus
signature index PERSISTED to parquet first — the amortized production
configuration, where per-batch work must not grow with the corpus.

Consumption is a `noop` datasource write, never count(): the operator
returns an assignment (left outer join on an aggregated min-neighbor
key), which Catalyst join-eliminates under a column-less count — see
bench.py's module docstring for the round-4 discovery.

Per (corpus, config): 1 discarded warmup + N timed passes
($SPARK_GRAFT_SCALE_PASSES, default 3), min reported. Also reports
the index-rebuild cost per corpus (the amortized-away part) so the
flat-batch claim is shown against the cost it avoids.

Writes SCALE_INC_r04.json and prints a markdown table for SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lisp_batch_processor_spark.operators.bloom import (  # noqa: E402
    bloom_build, bloom_parameters)
from lisp_batch_processor_spark.operators.dedup import (  # noqa: E402
    banded_signatures, incremental_near_dups, minhash_signatures,
    shingle_store)
from lisp_batch_processor_spark.session import get_spark  # noqa: E402
from scripts.scale_slope import SF01, build_blowup  # noqa: E402

SF001 = "/root/testdata/sf0.01"
BATCH_SHIFT = 5 * 10**12  # far above any corpus/replica key range


def main() -> None:
    n_passes = max(1, int(os.environ.get("SPARK_GRAFT_SCALE_PASSES", "3")))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    spark = get_spark("scale-incremental", cpus=cpus, shuffle_partitions=cpus)

    blow_dir = "/root/repo/.scale/x10"
    if not os.path.isdir(os.path.join(blow_dir, "documents.parquet")):
        print("# building x10 blow-up ...", file=sys.stderr)
        build_blowup(spark, blow_dir, {"documents"})

    batch = (spark.read.parquet(f"{SF001}/documents.parquet")
             .withColumn("doc_id", F.col("doc_id") + F.lit(BATCH_SHIFT)))
    batch_n = batch.count()

    corpora = [("sf0.1", f"{SF01}/documents.parquet"),
               ("x10", f"{blow_dir}/documents.parquet")]
    # Second decade when the x100 corpus is already materialized (the
    # scale_slope x100 run builds it); 500k docs, index ~2M rows.
    # Honor the same dir override scale_slope uses for REPLICAS=100,
    # so a corpus built elsewhere isn't silently skipped.
    x100_dir = os.environ.get("SPARK_GRAFT_SCALE_X100_DIR",
                              os.environ.get("SPARK_GRAFT_SCALE_DIR",
                                             "/root/repo/.scale/x100"))
    x100_docs = os.path.join(x100_dir, "documents.parquet")
    if os.path.isdir(x100_docs):
        corpora.append(("x100", x100_docs))
    else:
        print(f"# x100 corpus not found at {x100_docs}; "
              "run scale_slope with SPARK_GRAFT_SCALE_REPLICAS=100 "
              "first for the second decade", file=sys.stderr)
    results: dict[str, dict] = {}
    for label, path in corpora:
        corpus = spark.read.parquet(path)
        idx_path = f"/root/repo/.scale/inc_index_{label}.parquet"

        t0 = time.perf_counter()
        (banded_signatures(minhash_signatures(corpus))
         .write.mode("overwrite").parquet(idx_path))
        idx_build_sec = time.perf_counter() - t0

        index = spark.read.parquet(idx_path)
        idx_rows = index.count()
        out_n = incremental_near_dups(corpus, batch,
                                      corpus_index=index).count()

        # The fully-persisted production configuration additionally
        # keeps shingle_store(corpus) on disk, so the verify stage
        # joins candidates into the compact precomputed store instead
        # of re-reading + re-shingling corpus text per batch.
        store_path = f"/root/repo/.scale/inc_store_{label}.parquet"
        t0 = time.perf_counter()
        shingle_store(corpus).write.mode("overwrite").parquet(store_path)
        store_build_sec = time.perf_counter() - t0
        store = spark.read.parquet(store_path)

        # Third config: the persisted stores PLUS a corpus-band Bloom
        # prefilter, so the (mostly novel) batch's band rows skip the
        # corpus-index join unless their bucket provably has a corpus
        # occupant. The filter is built once per corpus and persisted
        # next to the index; per-batch cost is its broadcast probe.
        bloom_path = f"/root/repo/.scale/inc_bloom_{label}.parquet"
        m, k = bloom_parameters(max(idx_rows, 1), 0.01)
        t0 = time.perf_counter()
        (bloom_build(index, ["band_idx", "band_key"], m, k)
         .write.mode("overwrite").parquet(bloom_path))
        bloom_build_sec = time.perf_counter() - t0
        band_bloom = spark.read.parquet(bloom_path)
        bloom_kw = {"verify_store": store, "corpus_band_bloom": band_bloom,
                    "bloom_bits": m, "bloom_hashes": k}
        bloom_out_n = incremental_near_dups(
            corpus, batch, corpus_index=index, **bloom_kw).count()
        assert bloom_out_n == out_n, (bloom_out_n, out_n)

        times: dict[str, list[float]] = {"text": [], "store": [],
                                         "bloom": []}
        for p in range(-1, n_passes):  # pass -1 = discarded warmup
            for cfg, kw in (("text", {}), ("store", {"verify_store": store}),
                            ("bloom", bloom_kw)):
                t0 = time.perf_counter()
                (incremental_near_dups(corpus, batch, corpus_index=index,
                                       **kw)
                 .write.format("noop").mode("overwrite").save())
                dt = time.perf_counter() - t0
                if p >= 0:
                    times[cfg].append(dt)
                print(f"# {label} pass{p} [{cfg}]: {dt:.2f}s "
                      f"({out_n} out rows)", file=sys.stderr)
        results[label] = {
            "corpus_rows": corpus.count(),
            "index_rows": idx_rows,
            "index_build_sec": round(idx_build_sec, 3),
            "store_build_sec": round(store_build_sec, 3),
            "batch_rows": batch_n,
            "batch_out_rows": out_n,
            "per_batch_sec": round(min(times["text"]), 3),
            "per_batch_store_sec": round(min(times["store"]), 3),
            "bloom_build_sec": round(bloom_build_sec, 3),
            "per_batch_bloom_sec": round(min(times["bloom"]), 3),
        }

    payload = {
        "metric": "scale_incremental_dedup",
        "stat": f"min_of_{n_passes}_after_warmup",
        "consume": "noop_write",
        "corpora": results,
    }
    with open("/root/repo/SCALE_INC_r04.json", "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload))

    print("\n| corpus | index rows | index+store+bloom build | per-batch "
          "(text verify) | per-batch (store verify) | per-batch "
          "(store+bloom) | batch out rows |")
    print("|---|---|---|---|---|---|---|")
    for label, r in results.items():
        print(f"| {label} ({r['corpus_rows']} docs) | {r['index_rows']:,} "
              f"| {r['index_build_sec']}s + {r['store_build_sec']}s "
              f"+ {r['bloom_build_sec']}s "
              f"| {r['per_batch_sec']}s | {r['per_batch_store_sec']}s "
              f"| {r['per_batch_bloom_sec']}s "
              f"| {r['batch_out_rows']} |")


if __name__ == "__main__":
    main()
