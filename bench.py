"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is timed as plan-build + full execution; results are
consumed via a `noop` datasource write, which forces every operator
to produce every row without collecting anything to the driver.
count() is NOT a valid consumption for benchmarking this engine:
under a count that reads no columns, Catalyst eliminates left-outer
joins whose right side is an aggregate (provably unique join key), so
the assignment-shaped dedup queries (q_dedup_minhash / simhash /
embedding) collapsed to bare scans — discovered in round 4 when their
x100 blow-up timings came back flat. Pre-r4 BENCH totals undercount
those queries; per-query numbers for everything else are continuous.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lisp_batch_processor_spark import all_queries
from lisp_batch_processor_spark.session import get_spark

HEADLINE = [
    "q_agg_groupby",
    "q_join_inner",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tpch_q17",
    "q_join_outer",
    "q_join_asof",
    "q_join_range",
    "q_window_rank",
    "q_window_running",
    "q_dedup_exact",
    "q_event_sessionize",
    "q_set_ops",
    "q_rollup_cube",
    "q_pivot",
    "q_text_analysis",
    "q_text_quality",
    "q_dedup_minhash",
    "q_dedup_ngram",
    "q_similarity_topk",
    "q_similarity_ann",
    "q_quality_audit",
    "q_json_map",
    # Added in round 2 (totals are not comparable to BENCH_r01;
    # per-query timings are):
    "q_dedup_simhash",
    "q_dedup_connected",
    "q_dedup_embedding",
    "q_multimodal_decode",
    "q_stream_sessions",
    "q_agg_quantiles",
    "q_multimodal_frames",
    "q_stream_dedup",
    # Round 3: q_agg_collect/q_window_range_frame/q_cube merged into
    # q_agg_distinct/q_window_running/q_rollup_cube (their work is now
    # timed inside the absorbing queries); q_agg_distinct and
    # q_window_tumbling added to keep the merged workloads measured.
    "q_agg_distinct",
    "q_window_tumbling",
    "q_skew_join",
    "q_skew_agg",
    "q_tpch_q18",
    "q_exists_decorrelated",
    # Round 4: sub-document global dedup passes (library operators —
    # the 50-slot registry is full, so they enter the bench through
    # the same wrapper mechanism scale_slope.py uses).
    "q_line_dedup",
    "q_span_dedup",
    "q_funnel",
]


# What the bench actually executes — the paths whose git tree state
# defines "same code" for cross-HEAD attribution. The single source
# of truth: scripts/bench_noise_band.py imports it, so the band's
# recorded hash list and this gate can never drift apart (a length
# mismatch would silently refuse every future band).
BENCHED_PATHS = ("lisp_batch_processor_spark", "bench.py",
                 "__spark_entry__.py")


def _git_code_tree() -> list[str] | None:
    """Git object ids of the BENCHED code paths at this tree's HEAD
    (the package, bench.py, the entry), or None outside git — the
    attribution the interleaved-delta quote requires: the band's
    recorded A-side code tree must be THIS code. Tree hashes, not the
    commit id, so docs-only commits after the band session don't
    orphan a still-valid band; a dirty benched path at band time
    already disqualifies it via head_dirty."""
    import subprocess
    repo = os.path.dirname(os.path.abspath(__file__))
    out = []
    for p in BENCHED_PATHS:
        try:
            r = subprocess.run(
                ["git", "-C", repo, "rev-parse", f"HEAD:{p}"],
                capture_output=True, text=True)
        except OSError:
            return None
        if r.returncode != 0:
            return None
        out.append(r.stdout.strip())
    return out


def _benched_paths_dirty() -> bool | None:
    """True when any benched path differs from HEAD in THIS working
    tree (None outside git): HEAD's object ids then describe code the
    bench is not actually running, so the interleaved quote must
    refuse — the same honesty the band session applies to its own
    side via head_dirty."""
    import subprocess
    repo = os.path.dirname(os.path.abspath(__file__))
    try:
        r = subprocess.run(
            ["git", "-C", repo, "status", "--porcelain", "--"]
            + list(BENCHED_PATHS),
            capture_output=True, text=True)
    except OSError:
        return None
    if r.returncode != 0:
        return None
    return bool(r.stdout.strip())


def _extra_queries() -> dict:
    """Library operators timed alongside the registered queries."""
    from lisp_batch_processor_spark.catalog import load
    from lisp_batch_processor_spark.operators.dedup import (
        line_dedup, span_dedup)
    from lisp_batch_processor_spark.operators.events import funnel
    return {
        "q_line_dedup":
            lambda spark, sf_dir: line_dedup(
                load(spark, sf_dir, "documents")),
        "q_span_dedup":
            lambda spark, sf_dir: span_dedup(
                load(spark, sf_dir, "documents")),
        "q_funnel":
            lambda spark, sf_dir: funnel(
                load(spark, sf_dir, "events"),
                ["view", "click", "purchase"], horizon_s=24 * 3600),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    spark = get_spark("bench", cpus=cpus, shuffle_partitions=cpus)
    qs = {**all_queries(), **_extra_queries()}

    # Warm the JVM/codegen paths (parquet reader, hash agg, joins)
    # on the tiny sf so per-query timings measure the engine at the
    # target sf, not first-job JIT startup.
    spark.range(1).count()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for wq in ("q_agg_groupby", "q_join_inner"):
            qs[wq](spark, warm_dir).count()

    # WARMUP POLICY (round 4): one full discarded pass over the suite
    # at the TARGET sf before the timed passes. The tiny-sf warmup
    # above covers codegen, but the first target-sf pass still pays
    # page-cache population and per-query JIT tiers — on sub-second
    # queries that cold pass inflated 3-pass MEANS ~1.7× on flat
    # medians in rounds 2-3 (false regression alarms). Disable with
    # SPARK_GRAFT_BENCH_WARMUP=0.
    n_warmup = max(0, int(os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1")))

    # Per-query MIN over FIVE full passes (round 12 — raised from
    # three: two consecutive rounds produced ±15-18 % min-of-3 totals
    # with zero benched-code changes, and NOISE_BAND measured
    # same-code single-pass total spreads of 24-35 %, so min-of-3
    # could not adjudicate its own deltas): the box is a shared VM
    # and host contention windows stall execution for minutes at a
    # time; a full-suite pass spaces the measurements of each query
    # far apart so one window can't poison them all. Min measures
    # the engine, not the neighbor's workload. Median, mean, and a
    # TRIMMED mean (worst pass dropped — the statistic least coupled
    # to stall windows while still averaging real variance) are
    # reported alongside; every cross-HEAD delta is read against the
    # measured same-code band NOISE_BAND.json quotes for the SAME
    # statistic.
    n_passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "5")))
    passes: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for pass_no in range(-n_warmup, n_passes):
        warm = pass_no < 0
        for name in HEADLINE:
            fn = qs[name]
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if not warm:
                passes[name].append(dt)
            tag = "warmup" if warm else f"pass{pass_no}"
            print(f"# {tag} {name}: {dt:.3f}s", file=sys.stderr)

    def _median(v: list[float]) -> float:
        s = sorted(v)
        n = len(s)
        # True median: average the two middle elements on even counts
        # (sorted(v)[n//2] alone is the upper median).
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    def _trimmed_mean(v: list[float]) -> float:
        # Drop the single worst pass (host stall windows make one
        # pass in N read multiples of the rest); with < 3 passes
        # there is nothing statistically safe to trim.
        keep = sorted(v)[:-1] if len(v) >= 3 else v
        return sum(keep) / len(keep)

    timings = {k: round(min(v), 3) for k, v in passes.items()}
    timings_median = {k: round(_median(v), 3) for k, v in passes.items()}
    timings_mean = {k: round(sum(v) / len(v), 3) for k, v in passes.items()}
    timings_trimmed = {k: round(_trimmed_mean(v), 3)
                       for k, v in passes.items()}

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    # Per-query median/mean dicts go to STDERR: the driver records
    # only the TAIL (~2 KB) of stdout, and round 4's single stdout
    # line carrying all three 40-query dicts overflowed it — the
    # artifact came back "parsed": null with the headline min dict
    # truncated away. The final stdout line carries the min dict +
    # scalar totals only and must stay well under the capture window.
    print("# queries_median " + json.dumps(timings_median)
          + " # total_median %s" % round(sum(timings_median.values()), 3),
          file=sys.stderr)
    print("# queries_mean " + json.dumps(timings_mean)
          + " # total_mean %s" % round(sum(timings_mean.values()), 3),
          file=sys.stderr)
    print("# queries_trimmed_mean " + json.dumps(timings_trimmed),
          file=sys.stderr)

    # total_median/total_mean live on stderr only (above): the final
    # stdout line must stay under the driver's ~2 KB tail capture,
    # and the trimmed mean is the spread statistic the protocol
    # actually adjudicates with.
    payload = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "total_trimmed_mean": round(sum(timings_trimmed.values()), 3),
        "passes": n_passes,
        "warmup_passes": n_warmup,
        "consume": "noop_write",
        "stat": f"min_of_{n_passes}",
        "sf": sf_val,
        # Round 14 (VERDICT r13 #8): at these fixture SFs the suite
        # is per-job fixed-latency bound, so low-vs-high core-count
        # ratios near 1 measure scheduler/GC/micro-batch constants,
        # NOT serial operators — read the plan audit for structure.
        "scaling_floor": "sub-second jobs at this sf: core ratios ~1 "
                         "reflect job-latency floor, not serialism",
    }
    # Same-host cross-round series: scripts/bench_prev_head.py benches
    # the previous round's HEAD on THIS host and writes
    # BENCH_PREV_HEAD.json (full per-query mins). Only the compact
    # summary rides along here — archived BENCH_r{N}.json files are
    # cross-host incomparable, this pair is not.
    prev_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_PREV_HEAD.json")
    if os.path.isfile(prev_path):
        try:
            with open(prev_path) as f:
                prev = json.load(f)
            summary = {
                "commit": prev.get("commit"),
                "total_min": prev.get("total_min"),
                "sf": prev.get("sf"),
            }
            # Equal-N per-query deltas: the prev side is min-of-K, so
            # compare it against THIS run's min over its first K
            # passes (passes are chronological; truncation reproduces
            # exactly the statistic a K-pass run would have printed).
            # Without this, min-of-5 vs min-of-3 reads as a ~few-%
            # improvement that is pure sampling, and the reverse as a
            # regression (the r6 q_stream_sessions +25% artifact).
            # Cross-SF comparisons are meaningless — only delta
            # against a prev file recorded at THIS run's scale.
            prev_q = (prev.get("queries") or {}) \
                if prev.get("sf") == sf_val else {}
            prev_n = prev.get("passes")
            # Equalization truncates THIS run's passes down to the
            # prev side's count; the reverse is impossible (the prev
            # file stores only mins, not per-pass data), so a prev
            # recorded with MORE passes can't be compared honestly —
            # skip the deltas rather than label a min-of-3-vs-min-of-5
            # comparison "equal-N".
            if prev_n and prev_n > n_passes:
                print(f"# prev_head has {prev_n} passes > this run's "
                      f"{n_passes}; per-query deltas skipped",
                      file=sys.stderr)
                prev_q = {}
            k = min(prev_n, n_passes) if prev_n else n_passes
            eq = {name: min(v[:k]) for name, v in passes.items()}
            deltas = {
                q: round((eq[q] - prev_q[q]) / prev_q[q], 3)
                for q in eq if prev_q.get(q)}
            if deltas:
                print("# queries_delta_vs_prev_head(equal_n=%s) %s"
                      % (k, json.dumps(deltas)), file=sys.stderr)
                cur_tot = sum(eq[q] for q in deltas)
                prev_tot = sum(prev_q[q] for q in deltas)
                worst = sorted(deltas, key=lambda q: -abs(deltas[q]))[:2]
                # None = prev file predates the passes field; the
                # delta is then best-effort, not equal-N.
                summary["equal_n"] = k if prev_n else None
                summary["total_delta_rel"] = round(cur_tot / prev_tot - 1, 4)
                summary["worst"] = {q: deltas[q] for q in worst}
            # Trimmed-mean total delta (round 12): the min statistic
            # is one order statistic of a 24-35 %-spread sample; the
            # worst-pass-trimmed mean averages the remaining passes,
            # so the pair adjudicates what min-of-N alone could not.
            # Equal-N like the min: trim over this run's first k
            # passes vs the prev artifact's same-count trimmed means.
            prev_t = (prev.get("queries_trimmed") or {}) \
                if prev.get("sf") == sf_val else {}
            if prev_t and not (prev_n and prev_n > n_passes):
                def _tm(v):
                    keep = sorted(v)[:-1] if len(v) >= 3 else v
                    return sum(keep) / len(keep)
                eq_t = {name: _tm(v[:k]) for name, v in passes.items()}
                common = [q for q in eq_t if prev_t.get(q)]
                if common:
                    ct = sum(eq_t[q] for q in common)
                    pt = sum(prev_t[q] for q in common)
                    summary["trimmed_delta_rel"] = round(ct / pt - 1, 4)
            # INTERLEAVED cross-HEAD deltas (round 12): the deltas
            # above compare THIS sequential session against a prev
            # artifact recorded in an EARLIER session, so they fold
            # inter-session host drift into the signal (rounds 10-12
            # each saw ±15-25 % sequential swings that the same-
            # session interleaved comparison contradicted). When
            # NOISE_BAND was generated against this same prev commit,
            # its A/B totals ARE the drift-immune comparison — every
            # A pass ran next to a B pass under the same conditions —
            # so quote them here as the authoritative cross-HEAD
            # signal; the sequential deltas then mostly measure how
            # the host changed between sessions. BOTH sides must be
            # attributable (round 13, ADVICE): the band's recorded
            # A-side CODE TREE (the benched paths' git object ids)
            # must equal this tree's, and the benched paths must have
            # been clean at band time — else a band generated over
            # different code would be silently quoted as this HEAD's
            # delta. Tree hashes, not the commit id, so a docs-only
            # commit does not orphan a still-valid band.
            try:
                nbp = os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "NOISE_BAND.json")
                with open(nbp) as f:
                    nbs = json.load(f)["summary"]
                cur_tree = _git_code_tree()
                cur_dirty = _benched_paths_dirty()
                if (nbs.get("ref_commit") == prev.get("commit")
                        and prev.get("sf") == sf_val
                        and nbs.get("head_code_tree") is not None
                        and nbs.get("head_code_tree") == cur_tree
                        and not nbs.get("head_dirty")
                        # A dirty benched path HERE means this run
                        # executes code HEAD's object ids do not
                        # describe — the band matched the wrong side.
                        and cur_dirty is False):
                    summary["interleaved_total_delta"] = \
                        nbs.get("total_delta_rel")
                    summary["interleaved_trimmed_delta"] = \
                        nbs.get("total_trimmed_delta_rel")
                    summary["interleaved_pairwise_delta"] = \
                        nbs.get("total_pairwise_median_delta")
                elif nbs.get("ref_commit") == prev.get("commit"):
                    # Say WHICH attribution leg failed — a wrong
                    # diagnosis (e.g. blaming the code tree for an sf
                    # mismatch) sends the reader down the wrong hole.
                    if prev.get("sf") != sf_val:
                        why = (f"prev sf {prev.get('sf')!r} != this "
                               f"run's {sf_val!r}")
                    elif cur_dirty:
                        why = "benched paths are dirty in this tree"
                    elif nbs.get("head_dirty"):
                        why = "benched paths were dirty at band time"
                    else:
                        why = (f"band A-side code tree "
                               f"{nbs.get('head_code_tree')!r} != "
                               f"this tree {cur_tree!r}")
                    print(f"# NOISE_BAND not attributable: {why}; "
                          "interleaved deltas not quoted",
                          file=sys.stderr)
            except (OSError, ValueError, KeyError):
                pass
            payload["prev_head"] = summary
        except (OSError, ValueError) as e:
            print(f"# prev_head unreadable: {e}", file=sys.stderr)
    # Measured noise band (scripts/bench_noise_band.py, interleaved
    # same-host A/B passes): the yardstick for reading any per-query
    # delta in this artifact — a delta inside the band is run noise.
    nb_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "NOISE_BAND.json")
    if os.path.isfile(nb_path):
        try:
            with open(nb_path) as f:
                nb = json.load(f)["summary"]
            payload["noise_band"] = {
                # SAME-CODE spreads, the yardstick for every delta in
                # this artifact: per-query single-pass band (raw /
                # worst-pass-trimmed, p50 across queries) and each
                # side's same-code TOTAL spread across its interleaved
                # passes. A sequential prev_head delta inside these is
                # host scatter; the interleaved_* deltas under
                # prev_head are the drift-immune cross-HEAD signal.
                "single_pass_p50": nb.get("per_query_band_p50"),
                "trimmed_p50": nb.get("per_query_trimmed_band_p50"),
                "total_band_a": nb.get("total_band_a"),
                "total_band_b": nb.get("total_band_b"),
                "pairs": nb.get("pairs"),
            }
        except (OSError, ValueError, KeyError) as e:
            print(f"# noise_band unreadable: {e}", file=sys.stderr)
    line = json.dumps(payload)
    if len(line) > 1800:
        print(f"# WARNING: final JSON line is {len(line)} chars; the "
              "driver's tail capture holds ~2000 — trim fields",
              file=sys.stderr)
    print(line)


if __name__ == "__main__":
    main()
