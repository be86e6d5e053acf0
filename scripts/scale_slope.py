"""Scale-slope measurement: converts the operators' "scale notes"
docstring claims into evidence.

Runs the most expensive queries at sf0.01, sf0.1, and a x10 synthetic
blow-up of sf0.1 (union of 10 replicas with shifted keys; replica
token-suffixing keeps replicas textually DISJOINT so near-dup density
per block stays constant and only corpus size grows — measuring
corpus scaling, not dup-density scaling). /root/testdata is
read-only, so the blow-up is materialized once under
$SPARK_GRAFT_SCALE_DIR (default /root/repo/.scale/x10).

Streaming twins (q_stream_sessions, q_stream_dedup) blow up too:
events replicate with shifted event/user ids (per-user session
shapes stay original-sized, user count grows 10x) into a multi-file
directory, which read_events_stream now feeds directly — so the
REAL streaming engine is measured at every scale point, multi-file
micro-batching included.

Per (query, scale): 1 discarded warmup pass + N timed passes
($SPARK_GRAFT_SCALE_PASSES, default 2), min reported. The slope
exponent between scales a and b is ln(t_b/t_a) / ln(rows_b/rows_a);
<= ~1.15 reads as linear. The sf0.01 point is fixed-overhead
dominated (sub-second job latency), so the sf0.1 -> x10 exponent is
the load-bearing number.

Writes SCALE_r04.json and prints a markdown table (pasted into
SCALE.md).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lisp_batch_processor_spark import all_queries  # noqa: E402
from lisp_batch_processor_spark.session import get_spark  # noqa: E402

SF001 = "/root/testdata/sf0.01"
SF01 = "/root/testdata/sf0.1"
# x10 by default; SPARK_GRAFT_SCALE_REPLICAS=100 adds a second decade
# (the blow-up materializes under .scale/x<n>).
REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "10"))
KEY_SHIFT = 10**9

# query -> driving table for the rows metric; every query gets the
# blow-up scale point.
QUERIES = {
    "q_dedup_connected": "documents",
    "q_dedup_ngram": "documents",
    "q_dedup_minhash": "documents",
    "q_dedup_simhash": "documents",
    "q_exists_decorrelated": "lineitem",
    "q_stream_sessions": "events",
    "q_stream_dedup": "events",
    "q_similarity_topk": "embeddings",
    "q_similarity_ann": "embeddings",
    "q_similarity_ann_collapsed": "embeddings",
    "q_dedup_embedding": "embeddings",
    "q_line_dedup": "documents",
    "q_span_dedup": "documents",
    "q_funnel": "events",
    "q_stream_funnel": "events",
    "q_similarity_ivf": "embeddings",
    # Round 5 library operators.
    "q_chunk": "documents",
    "q_ngram_lm": "documents",
    "q_stratified": "documents",
    "q_attribution": "events",
    # Round 6 model variants: first_touch (forward as-of) and
    # all_touches (bucketed range_join pairs).
    "q_attribution_first": "events",
    "q_attribution_all": "events",
    "q_attribution_credit": "events",
}


def _extra_queries() -> dict:
    """Library operators measured alongside the registry queries:
    the duplicate-collapse ANN (no registry row — the driver gate is
    capped at 50) wrapped to the (spark, sf_dir) shape. The blow-up's
    identical-copy replicas are exactly the adversarial case it
    exists to fix, so its scale point belongs next to
    q_similarity_ann's."""
    from lisp_batch_processor_spark.catalog import load
    from lisp_batch_processor_spark.operators.events import funnel
    from lisp_batch_processor_spark.operators.dedup import (
        line_dedup, span_dedup)
    from lisp_batch_processor_spark.operators.similarity import (
        ann_topk_collapsed, ivf_topk, ivf_train)
    return {
        "q_similarity_ann_collapsed":
            lambda spark, sf_dir: ann_topk_collapsed(
                load(spark, sf_dir, "embeddings")),
        # Sub-document global dedup passes: the x10 replicas are
        # token-suffixed (disjoint vocabularies), so duplicate
        # density per replica stays constant and the slope measures
        # corpus growth, the same property the near-dup queries rely
        # on.
        "q_line_dedup":
            lambda spark, sf_dir: line_dedup(
                load(spark, sf_dir, "documents")),
        "q_span_dedup":
            lambda spark, sf_dir: span_dedup(
                load(spark, sf_dir, "documents")),
        # IVF end-to-end: train (collect is O(k x dim), corpus-size
        # independent) + assign/probe — the timing includes training,
        # the honest whole-index cost at each corpus size.
        "q_similarity_ivf":
            lambda spark, sf_dir: (lambda e: ivf_topk(
                e, ivf_train(e)))(load(spark, sf_dir, "embeddings")),
        # The events blow-up shifts user_id per replica, so the user
        # population (per-user array width stays original-sized)
        # grows with the corpus — exactly funnel's scale axis.
        "q_funnel":
            lambda spark, sf_dir: funnel(
                load(spark, sf_dir, "events"),
                ["view", "click", "purchase"], horizon_s=24 * 3600),
        # The REAL streaming engine: per-file micro-batches through
        # the watermark-buffered stateful walk (same harness basis
        # as q_stream_sessions/q_stream_dedup).
        "q_stream_funnel": _stream_funnel,
        # Round 5: chunking, LM scoring (whole train+score
        # lifecycle, the q_similarity_ivf convention), exact-k
        # stratified sampling, attribution join.
        "q_chunk": lambda spark, sf_dir: __import__(
            "lisp_batch_processor_spark.operators.text",
            fromlist=["chunk_documents"]).chunk_documents(
                load(spark, sf_dir, "documents")),
        "q_ngram_lm": _ngram_lm_lifecycle,
        "q_stratified": lambda spark, sf_dir: __import__(
            "lisp_batch_processor_spark.operators.training",
            fromlist=["stratified_sample_exact"]
        ).stratified_sample_exact(
            load(spark, sf_dir, "documents"), "lang", 100),
        "q_attribution": lambda spark, sf_dir: __import__(
            "lisp_batch_processor_spark.operators.events",
            fromlist=["attribution_join"]).attribution_join(
                load(spark, sf_dir, "events")),
        "q_attribution_first": lambda spark, sf_dir: __import__(
            "lisp_batch_processor_spark.operators.events",
            fromlist=["attribution_join"]).attribution_join(
                load(spark, sf_dir, "events"), model="first_touch"),
        "q_attribution_all": lambda spark, sf_dir: __import__(
            "lisp_batch_processor_spark.operators.events",
            fromlist=["attribution_join"]).attribution_join(
                load(spark, sf_dir, "events"), model="all_touches"),
        # Credit weighting composed over the pair expansion (the
        # whole-lifecycle convention, like q_similarity_ivf).
        "q_attribution_credit": _attribution_credit_lifecycle,
    }


def _attribution_credit_lifecycle(spark, sf_dir: str):
    from lisp_batch_processor_spark.catalog import load
    from lisp_batch_processor_spark.operators.events import (
        attribution_credit, attribution_join)

    pairs = attribution_join(load(spark, sf_dir, "events"),
                             model="all_touches")
    return attribution_credit(pairs, model="position_based")


def _ngram_lm_lifecycle(spark, sf_dir: str):
    from lisp_batch_processor_spark.catalog import load
    from lisp_batch_processor_spark.operators.text import (
        ngram_lm_score, ngram_lm_train)

    docs = load(spark, sf_dir, "documents")
    bi, uni, v = ngram_lm_train(docs)
    return ngram_lm_score(docs, bi, uni, v)


def _stream_funnel(spark, sf_dir: str):
    from lisp_batch_processor_spark.operators.streaming_twins import (
        _run_to_memory)
    from lisp_batch_processor_spark.streaming.funnel import (
        streaming_funnel)
    from lisp_batch_processor_spark.streaming.windows import (
        read_events_stream)

    out = streaming_funnel(read_events_stream(spark, sf_dir),
                           ["view", "click", "purchase"],
                           horizon_s=24 * 3600)
    return _run_to_memory(spark, out, "stream_funnel")


def build_blowup(spark, out_dir: str,
                 tables: set[str] | None = None) -> None:
    """Materialize the x10 blow-up of sf0.1 (documents + orders +
    lineitem), deterministic so reruns reuse it.

    documents: doc_id shifted per replica; source suffixed (replica
    blocks stay original-sized); every TOKEN suffixed with the
    replica tag, so replica vocabularies are disjoint — no
    cross-replica shingle/minhash/simhash collisions, corpus 10x.
    orders/lineitem: order keys shifted per replica (new orders, same
    supplier/part dims — per-order groups stay original-sized).
    events: event_id AND user_id shifted per replica — per-user
    session shapes stay original-sized while the user population
    (streaming state width) grows 10x; written as a handful of part
    files so the streaming source's per-file micro-batching is
    exercised for real.
    embeddings: vec_id and label shifted per replica (label blocks
    stay original-sized); vectors are IDENTICAL copies, which is the
    dense-region stress case for SRP buckets — bucket population and
    per-query candidates grow with the corpus, exactly what a 10x
    denser real corpus does. The bounded query sets (vec_id < 10)
    keep only the replica-0 originals, so per-query work isolates
    corpus growth.
    """
    tables = tables or {"documents", "orders", "lineitem", "events",
                        "embeddings"}
    if "documents" in tables:
        docs = spark.read.parquet(f"{SF01}/documents.parquet")
        parts = []
        for i in range(REPLICAS):
            d = (docs
                 .withColumn("doc_id", F.col("doc_id") + F.lit(i * KEY_SHIFT))
                 .withColumn("source",
                             F.concat_ws("_", "source", F.lit(f"r{i}"))))
            if i > 0:
                d = d.withColumn(
                    "text",
                    F.regexp_replace("text", "([a-zA-Z0-9]+)", f"$1q{i}x"))
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    for tbl, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        if tbl not in tables:
            continue
        t = spark.read.parquet(f"{SF01}/{tbl}.parquet")
        reps = [t.withColumn(key, F.col(key) + F.lit(i * KEY_SHIFT))
                for i in range(REPLICAS)]
        u = reps[0]
        for p in reps[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{out_dir}/{tbl}.parquet")

    if "events" in tables:
        from lisp_batch_processor_spark.catalog import load

        ev = load(spark, SF01, "events")  # ts normalized to micros
        reps = [ev.withColumn("event_id", F.col("event_id")
                              + F.lit(i * KEY_SHIFT))
                  .withColumn("user_id", F.col("user_id")
                              + F.lit(i * KEY_SHIFT))
                for i in range(REPLICAS)]
        u = reps[0]
        for p in reps[1:]:
            u = u.unionByName(p)
        # A handful of part files: each is a streaming micro-batch at
        # maxFilesPerTrigger=1, so the blow-up exercises multi-batch
        # state handling without thousands of trigger round-trips.
        # Range-partitioned by ts so each file is a time slice ...
        (u.repartitionByRange(8, "ts", "event_id").write
          .mode("overwrite").parquet(f"{out_dir}/events.parquet"))
        # ... and mtime-stamped in slice order: FileStreamSource picks
        # oldest-mtime-first, so micro-batches replay in event-time
        # order. Without this, a random later file would be entirely
        # "late" past the watermark and the stateful operators would
        # do less work than the corpus implies.
        import glob
        parts = sorted(glob.glob(f"{out_dir}/events.parquet/part-*"))
        base = time.time() - len(parts)
        for i, pth in enumerate(parts):
            os.utime(pth, (base + i, base + i))

    if "embeddings" in tables:
        emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
        reps = [emb.withColumn("vec_id", F.col("vec_id")
                               + F.lit(i * KEY_SHIFT))
                   .withColumn("label", (F.col("label")
                                         + F.lit(i * 1_000_000))
                               .cast("int"))
                for i in range(REPLICAS)]
        u = reps[0]
        for p in reps[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")


def main() -> None:
    blow_dir = os.environ.get("SPARK_GRAFT_SCALE_DIR",
                              f"/root/repo/.scale/x{REPLICAS}")
    only = os.environ.get("SPARK_GRAFT_SCALE_QUERIES")
    queries = {k: v for k, v in QUERIES.items()
               if only is None or k in only.split(",")}
    n_passes = max(1, int(os.environ.get("SPARK_GRAFT_SCALE_PASSES", "2")))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    spark = get_spark("scale-slope", cpus=cpus, shuffle_partitions=cpus)
    qs = {**all_queries(), **_extra_queries()}

    xlabel = f"x{REPLICAS}"
    need_tables = set(queries.values())
    missing = {t for t in need_tables
               if not os.path.isdir(os.path.join(blow_dir, f"{t}.parquet"))}
    if missing:
        print(f"# building {xlabel} blow-up for {sorted(missing)} ...",
              file=sys.stderr)
        build_blowup(spark, blow_dir, missing)

    rows_cache: dict[tuple[str, str], int] = {}

    def nrows(sf_dir: str, table: str) -> int:
        key = (sf_dir, table)
        if key not in rows_cache:
            rows_cache[key] = (spark.read
                               .parquet(f"{sf_dir}/{table}.parquet").count())
        return rows_cache[key]

    results: dict[str, dict] = {}
    for name, table in queries.items():
        scales = [("sf0.01", SF001), ("sf0.1", SF01), (xlabel, blow_dir)]
        per_scale = {}
        for label, sf_dir in scales:
            # Out-row count taken OUTSIDE the timing loop, for the
            # did-the-workload-really-scale cross-check only.
            out_n = qs[name](spark, sf_dir).count()
            times = []
            for p in range(-1, n_passes):  # pass -1 = discarded warmup
                t0 = time.perf_counter()
                # noop write: forces every row through every operator.
                # count() is pruned by Catalyst for assignment-shaped
                # plans (outer join on aggregate key) — see bench.py.
                qs[name](spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                dt = time.perf_counter() - t0
                if p >= 0:
                    times.append(dt)
                print(f"# {name} {label} pass{p}: {dt:.2f}s "
                      f"({out_n} out rows)", file=sys.stderr)
            per_scale[label] = {
                "sec": round(min(times), 3),
                "input_rows": nrows(sf_dir, table),
            }
        slopes = {}
        labels = [s[0] for s in scales]
        for lo, hi in zip(labels, labels[1:]):
            t1, t2 = per_scale[lo]["sec"], per_scale[hi]["sec"]
            n1, n2 = (per_scale[lo]["input_rows"],
                      per_scale[hi]["input_rows"])
            slopes[f"{lo}->{hi}"] = round(
                math.log(t2 / t1) / math.log(n2 / n1), 2)
        results[name] = {"scales": per_scale, "slope_exponents": slopes}

    suffix = "" if REPLICAS == 10 else f"_x{REPLICAS}"
    round_tag = os.environ.get("SPARK_GRAFT_SCALE_ROUND", "r05")
    out_path = f"/root/repo/SCALE_{round_tag}{suffix}.json"
    # Partial runs (SPARK_GRAFT_SCALE_QUERIES) merge into the existing
    # results file instead of clobbering the queries they didn't run.
    merged = dict(results)
    if os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f).get("queries", {})
        merged = {**prior, **results}
    payload = {
        "metric": "scale_slope",
        "stat": f"min_of_{n_passes}_after_warmup",
        "replicas": REPLICAS,
        "queries": merged,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload))

    # Markdown table for SCALE.md
    print(f"\n| query | sf0.01 | sf0.1 | {xlabel} | exp(0.01->0.1) | "
          f"exp(0.1->{xlabel}) |")
    print("|---|---|---|---|---|---|")
    for name, r in results.items():
        s = r["scales"]
        e = r["slope_exponents"]
        print(f"| {name} | {s['sf0.01']['sec']}s | {s['sf0.1']['sec']}s "
              f"| {s[xlabel]['sec']}s | {e['sf0.01->sf0.1']} "
              f"| {e[f'sf0.1->{xlabel}']} |")


if __name__ == "__main__":
    main()
