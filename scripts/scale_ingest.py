"""Measure the round-8 additions' scale behavior (VERDICT r7 ask #7
— touched operators only, not the full sweep):

1. Ingest-loop compaction (`pipelines.ingest.corpus_ingest_compact`
   via the `compact_every` hook): E epochs with and without the hook
   — per-epoch cost trend (first-third vs last-third medians: the
   uncompacted loop's membership reads degrade with file accretion,
   the hooked loop's stay flat), final per-store file counts, and
   the compaction pass's own cost.

2. The semantic assembly stage (assemble_corpus stage 4b body:
   survivor-scoped semantic_dedup + anti-join + write) at N and
   10N vectors with cells ∝ N — the stage's slope should track the
   operator's (SCALE_OPS_r07: 0.30), the composition adding only
   the semi/anti joins.

Run:  python scripts/scale_ingest.py
      ING_EPOCHS=24 ING_DOCS=400 SEM_N=4000 to override.
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

from lisp_batch_processor_spark.pipelines.ingest import (  # noqa: E402
    corpus_ingest_compact, corpus_ingest_epoch, corpus_ingest_init,
    ingest_report)
from lisp_batch_processor_spark.session import get_spark  # noqa: E402


def median(v):
    s = sorted(v)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def _epoch_docs(spark, e: int, docs_per_epoch: int):
    # Mostly-novel docs (30 per-doc-unique tokens per body line, so
    # no two docs near-dup) with a recurring boilerplate line and
    # ~2% cross-epoch URL repeats, at ingest-ordered ids. The 8-way
    # repartition makes every store append land as several files —
    # the accretion the compaction hook exists to bound.
    return spark.range(e * docs_per_epoch,
                       (e + 1) * docs_per_epoch).selectExpr(
        "id AS doc_id",
        f"concat('https://h', CAST(CASE WHEN id % 53 = 7 AND "
        f" id >= {docs_per_epoch} THEN id - {docs_per_epoch} "
        " ELSE id END AS STRING), '.example.com/p') AS url",
        "concat(concat_ws(' ', transform(sequence(0, 29), j -> "
        " concat('w', CAST(id AS STRING), 'x', CAST(j AS STRING)))),"
        " '\\nshared banner line for every page\\n',"
        " 'tail', CAST(id AS STRING), ' end', CAST(id AS STRING))"
        " AS text").repartition(8)


def ingest_experiment(spark, base, epochs, docs_per_epoch,
                      compact_every):
    out = {}
    for mode in ("raw", "hooked"):
        sd = f"{base}/state_{mode}"
        corpus = f"{base}/corpus_{mode}"
        corpus_ingest_init(spark, sd)
        per_epoch, folds = [], []
        from lisp_batch_processor_spark.sources.writers import (
            store_append)
        for e in range(epochs):
            batch = _epoch_docs(spark, e, docs_per_epoch)
            t0 = time.perf_counter()
            surv = corpus_ingest_epoch(batch, sd, e)
            store_append(surv.withColumn(
                "epoch_id", F.lit(e).cast("long")), corpus)
            per_epoch.append(time.perf_counter() - t0)
            if mode == "hooked" and (e + 1) % compact_every == 0:
                t0 = time.perf_counter()
                corpus_ingest_compact(spark, sd, corpus)
                folds.append(time.perf_counter() - t0)
        rep = ingest_report(spark, sd, corpus)
        third = max(1, epochs // 3)
        out[mode] = {
            "epoch_first_third_median_sec":
                round(median(per_epoch[:third]), 3),
            "epoch_last_third_median_sec":
                round(median(per_epoch[-third:]), 3),
            "files": {k: v["files"] for k, v in rep.items()},
            "rows": {k: v["rows"] for k, v in rep.items()},
        }
        if folds:
            out[mode]["fold_median_sec"] = round(median(folds), 3)
    out["file_ratio_raw_over_hooked"] = round(
        sum(out["raw"]["files"].values())
        / max(1, sum(out["hooked"]["files"].values())), 2)
    return out


def _emb_docs(spark, n, dim=32, dup_frac=0.05):
    # i.i.d. hash-uniform components in [-1, 1] per (id, j): pairwise
    # cosines concentrate at 0 ± 1/sqrt(dim), so nothing clears tau
    # by accident (a shared DC offset — or correlated sin-of-integer
    # components — made every pair a "dup" and degenerated the cell
    # pair join to all-pairs). A dup_frac tail of scaled copies of
    # the first vectors (cosine exactly 1 with their base) gives the
    # stage real work.
    comp = ("CAST(pmod(xxhash64({idx}, j), 2001) - 1000 AS DOUBLE)"
            " / 1000.0")
    base = spark.range(n).selectExpr(
        "id AS doc_id",
        "concat('sem doc ', CAST(id AS STRING), ' uniq',"
        " CAST(id AS STRING)) AS text",
        f"transform(sequence(0, {dim - 1}), j -> "
        + comp.format(idx="id") + ") AS embedding")
    dups = spark.range(int(n * dup_frac)).selectExpr(
        f"id + {n} AS doc_id",
        "concat('sem dup ', CAST(id AS STRING)) AS text",
        f"transform(sequence(0, {dim - 1}), j -> "
        + comp.format(idx="id") + " * 1.0001) AS embedding")
    return base.unionByName(dups)


def semantic_stage_experiment(spark, base, n):
    from lisp_batch_processor_spark.operators.dedup import semantic_dedup
    out = {}
    for scale, label in ((1, "n"), (10, "n_x10")):
        rows = n * scale
        df = _emb_docs(spark, rows).localCheckpoint(eager=True)
        docs = df.select("doc_id", "text")
        emb = df.select("doc_id", "embedding")
        k = max(2, rows // 128)          # cells ∝ N, ~128/cell (the
        # SCALE_OPS_r07 operator-measurement regime; the within-cell
        # exact-cosine verify is Σ|cell|² = N x cell_size, so cell
        # size is the knob that trades recall vs verify cost)
        t0 = time.perf_counter()
        surv_emb = emb.join(docs.select("doc_id"), "doc_id",
                            "left_semi")
        asg = semantic_dedup(surv_emb, k=k, tau=0.95,
                             id_col="doc_id")
        survivors = docs.join(asg.filter(F.col("is_dup"))
                              .select("doc_id"), "doc_id", "left_anti")
        survivors.write.mode("overwrite").parquet(
            f"{base}/sem_{label}")
        dt = time.perf_counter() - t0
        n_out = spark.read.parquet(f"{base}/sem_{label}").count()
        out[label] = {"rows_in": rows + rows // 20, "rows_out": n_out,
                      "k": k, "sec": round(dt, 3)}
    out["exp"] = round(
        math.log10(out["n_x10"]["sec"] / out["n"]["sec"]), 2)
    return out


def semantic_ingest_experiment(spark, base, n, batch_rows=1000):
    """Per-epoch cost of the STREAMING semantic twin vs corpus size:
    one equal-sized epoch against a seed of N and of 10N vectors,
    with cells ∝ corpus (k = N/128) so per-cell occupancy — the term
    the batch-vs-store join actually pays, O(batch × corpus/k) — is
    held constant. Flat epoch cost here is the honest scale claim:
    the knob that keeps a growing corpus flat is re-sizing k (re-seed
    /split cells), not magic."""
    from lisp_batch_processor_spark.streaming.dedup import (
        semantic_ingest_epoch, semantic_store_seed)
    out = {}
    for scale, label in ((1, "corpus_n"), (10, "corpus_n_x10")):
        rows = n * scale
        sd = f"{base}/sem_ingest_{label}"
        seed = _emb_docs(spark, rows, dup_frac=0.0) \
            .select("doc_id", "embedding") \
            .withColumnRenamed("doc_id", "vec_id")
        semantic_store_seed(seed, sd, k=max(2, rows // 128))
        # The epoch: half novel vectors, half dups of seed vectors.
        batch = spark.range(batch_rows).selectExpr(
            f"id + {20 * n} AS vec_id",
            f"CASE WHEN id % 2 = 0 THEN transform(sequence(0, 31), "
            f" j -> CAST(pmod(xxhash64(id % {rows}, j), 2001) - 1000"
            "  AS DOUBLE) / 1000.0 * 1.0001) "
            f"ELSE transform(sequence(0, 31), j -> "
            f" CAST(pmod(xxhash64(id + {30 * n}, j), 2001) - 1000"
            "  AS DOUBLE) / 1000.0) END AS embedding")
        t0 = time.perf_counter()
        asg = semantic_ingest_epoch(batch, sd, tau=0.95)
        dups = asg.filter("is_dup").count()
        dt = time.perf_counter() - t0
        out[label] = {"corpus": rows, "k": max(2, rows // 128),
                      "batch": batch_rows, "dups": dups,
                      "epoch_sec": round(dt, 3)}
    out["epoch_ratio_x10_over_x1"] = round(
        out["corpus_n_x10"]["epoch_sec"]
        / out["corpus_n"]["epoch_sec"], 2)
    return out


def main() -> None:
    epochs = int(os.environ.get("ING_EPOCHS", "24"))
    docs_per_epoch = int(os.environ.get("ING_DOCS", "400"))
    sem_n = int(os.environ.get("SEM_N", "4000"))
    out_path = os.environ.get("ING_OUT", "SCALE_INGEST_r08.json")

    spark = get_spark("scale-ingest", cpus=8, shuffle_partitions=8)
    base = "/tmp/scale_ingest"
    shutil.rmtree(base, ignore_errors=True)

    result = {
        "params": {"epochs": epochs, "docs_per_epoch": docs_per_epoch,
                   "compact_every": 8, "sem_n": sem_n},
        "ingest_compaction": ingest_experiment(
            spark, base, epochs, docs_per_epoch, compact_every=8),
        "semantic_stage": semantic_stage_experiment(spark, base, sem_n),
        "semantic_ingest": semantic_ingest_experiment(spark, base,
                                                      sem_n),
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    ic = result["ingest_compaction"]
    print(json.dumps({
        "raw_last_third_sec": ic["raw"]["epoch_last_third_median_sec"],
        "hooked_last_third_sec":
            ic["hooked"]["epoch_last_third_median_sec"],
        "file_ratio_raw_over_hooked":
            ic["file_ratio_raw_over_hooked"],
        "semantic_stage_exp": result["semantic_stage"]["exp"],
        "semantic_ingest_epoch_ratio":
            result["semantic_ingest"]["epoch_ratio_x10_over_x1"],
    }))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
