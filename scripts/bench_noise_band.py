"""Measured per-query noise band for the bench series: interleave
A/B bench passes (current HEAD vs a reference commit, alternating
subprocesses in one session on one host, >= 5 pairs) and record how
much a query's single-pass timing moves when the CODE DOES NOT
CHANGE. Rounds 4-5 judged cross-HEAD deltas (+3.5 % total, +21 % on
an untouched query) as noise by inference; this makes the band
measured.

Interleaving matters: host speed drifts over minutes (shared VM), so
A A A A B B B B would fold drift into the A-vs-B delta. A B A B ...
places every A next to a B under the same conditions.

Writes NOISE_BAND.json:
  - per-query timing lists for both sides,
  - per-query relative band  (max-min)/median  within each side,
  - the cross-side delta of per-query MINs, comparable against the
    band (a delta inside the band is noise, not regression),
  - the cross-side deltas of BOTH total statistics bench.py reports
    (min-of-N and worst-pass-trimmed mean) — same-code anchors for
    reading bench.py's total_delta_rel / trimmed_delta_rel,
and BENCH_PREV_HEAD.json (per-query mins AND trimmed means over the
B passes — the same artifact bench_prev_head.py produces, from more
passes).

Usage: python scripts/bench_noise_band.py <ref_commit> [n_pairs]
Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as bench.py. Run alone —
never concurrently with pytest or another bench (contamination
inflates timings 2-4x; see SCALE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def _median(v):
    s = sorted(v)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# The paths whose git tree state defines "same code" for cross-HEAD
# attribution — imported from bench.py (the consumer of the recorded
# hashes) so the two lists cannot drift: a silent length mismatch
# would refuse every future band.
from bench import BENCHED_PATHS as _BENCHED_PATHS  # noqa: E402


def _code_tree(repo: str, rev: str = "HEAD") -> list[str]:
    """Git object ids of the benched code paths at ``rev`` — equal
    lists mean the benched code is byte-identical, whatever the
    commit ids say."""
    out = []
    for p in _BENCHED_PATHS:
        r = subprocess.run(
            ["git", "-C", repo, "rev-parse", f"{rev}:{p}"],
            capture_output=True, text=True)
        out.append(r.stdout.strip() if r.returncode == 0 else f"?{p}")
    return out


def run_bench(cwd: str) -> dict:
    """One bench subprocess with a single timed pass (plus the
    standard warmup pass); returns the per-query timing dict."""
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_PASSES"] = "1"
    proc = subprocess.run(
        [sys.executable, "bench.py"], cwd=cwd, env=env,
        capture_output=True, text=True, check=True)
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("{")][-1]
    return json.loads(line)["queries"]


def _recompute() -> None:
    """Re-derive every summary/per-query statistic from the raw
    per-pass lists an existing NOISE_BAND.json already records —
    attribution fields and BENCH_PREV_HEAD are preserved untouched.
    Lets a statistic added after a (75-minute) band session apply to
    it without re-benching; the raw lists are the artifact of record."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "NOISE_BAND.json")
    with open(path) as f:
        old = json.load(f)
    qs = old["queries"]
    n = len(next(iter(qs.values()))["a"])
    a_runs = [{q: v["a"][i] for q, v in qs.items()} for i in range(n)]
    b_runs = [{q: v["b"][i] for q, v in qs.items()} for i in range(n)]
    per_query, stats = _summarize(a_runs, b_runs)
    keep = ("pairs", "ref_commit", "head_commit", "head_code_tree",
            "head_dirty", "stat")
    summary = {k: old["summary"][k] for k in keep
               if k in old["summary"]}
    summary.update(stats)
    with open(path, "w") as f:
        json.dump({"summary": summary, "queries": per_query}, f,
                  indent=1)
    print(json.dumps(summary))


def main() -> None:
    if sys.argv[1:2] == ["--recompute"]:
        _recompute()
        return
    if len(sys.argv) not in (2, 3):
        sys.exit("usage: bench_noise_band.py <ref_commit> [n_pairs] "
                 "| --recompute")
    ref = sys.argv[1]
    # Default 10 pairs (round 13, raised from 5): the per-query
    # trimmed band drops the worst 20 % of passes, so 10 passes keep
    # 8 — two independent stall windows no longer define the band,
    # which is what held the r12 per-query p90 at 60 %.
    n_pairs = int(sys.argv[2]) if len(sys.argv) == 3 else 10
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # Attribute the A side to an exact CODE state (round 13, ADVICE):
    # without this, a band generated at an earlier HEAD silently
    # reads as "same-code" for whatever HEAD bench.py currently
    # measures; bench.py refuses to quote interleaved deltas unless
    # the band's recorded code-tree hashes match its own and the
    # benched paths were clean. Tree hashes of the BENCHED paths, not
    # the commit id, so a docs-only commit after the band session
    # does not orphan a still-valid band.
    head = subprocess.run(
        ["git", "-C", repo, "rev-parse", "HEAD"],
        capture_output=True, text=True, check=True).stdout.strip()
    code_tree = _code_tree(repo)
    dirty = bool(subprocess.run(
        ["git", "-C", repo, "status", "--porcelain", "--"]
        + list(_BENCHED_PATHS),
        capture_output=True, text=True, check=True).stdout.strip())
    wt = f"/tmp/noise_ref_{ref[:12]}"
    subprocess.run(["git", "-C", repo, "worktree", "add", "--force",
                    wt, ref], check=True)
    a_runs: list[dict] = []
    b_runs: list[dict] = []
    try:
        for i in range(n_pairs):
            # Alternate within-pair order (round 13): a fixed A-then-B
            # order hands one side a systematic edge (page cache
            # warmed by the other side's identical reads, JIT-tiered
            # neighbors, drift within the pair window) — the r12
            # same-code control read −4 % for the side that ran
            # first. Even pairs run A first, odd pairs B first, so
            # the bias cancels in every cross-side statistic.
            legs = ([("A (HEAD)", repo, a_runs),
                     (f"B ({ref[:12]})", wt, b_runs)])
            if i % 2:
                legs.reverse()
            for tag, cwd, sink in legs:
                print(f"# pair {i + 1}/{n_pairs}: {tag}",
                      file=sys.stderr, flush=True)
                sink.append(run_bench(cwd))
    finally:
        subprocess.run(["git", "-C", repo, "worktree", "remove",
                        "--force", wt], check=False)

    per_query, stats = _summarize(a_runs, b_runs)
    summary = {
        "pairs": n_pairs,
        "ref_commit": ref,
        "head_commit": head,
        "head_code_tree": code_tree,
        "head_dirty": dirty,
        "stat": "single-pass timings, interleaved A/B",
    }
    summary.update(stats)
    _write_artifacts(repo, summary, per_query, n_pairs, ref)


def _summarize(a_runs: list[dict], b_runs: list[dict]):
    """(per_query, summary_stats) from raw per-pass timing dicts —
    shared by the live band session and --recompute."""
    names = sorted(set(a_runs[0]) & set(b_runs[0]))
    per_query = {}
    for q in names:
        a = [r[q] for r in a_runs]
        b = [r[q] for r in b_runs]

        def band(v):
            return (max(v) - min(v)) / _median(v) if _median(v) else 0.0

        # Trimmed band drops each side's worst 20 % of passes (1 in
        # 5, 2 in 10): the host stalls for multi-second windows (a
        # 1 s query can read 19 s once in 5 passes), and a couple of
        # stalls otherwise ARE the band. The trimmed figure is the
        # noise floor min-of-N actually competes against; the raw
        # per-pass lists above document the stalls and let any later
        # reader recompute either statistic.
        drop = max(1, len(a) // 5)
        ta, tb = sorted(a)[:-drop], sorted(b)[:-drop]
        delta = ((min(a) - min(b)) / min(b)) if min(b) else 0.0
        # Per-PAIR median delta (round 13): each pair's A and B ran
        # adjacent under the same host conditions, so (a_i-b_i)/b_i
        # is drift-free per pair, and the MEDIAN over pairs shrugs
        # off stall windows that poison min/mean statistics — the
        # statistic that resolves per-query deltas the 45-65 %
        # trimmed band cannot.
        pair_deltas = [(x - y) / y for x, y in zip(a, b) if y]
        per_query[q] = {
            "a": [round(x, 3) for x in a],
            "b": [round(x, 3) for x in b],
            "band_a": round(band(a), 3),
            "band_b": round(band(b), 3),
            "trimmed_band_a": round(band(ta), 3),
            "trimmed_band_b": round(band(tb), 3),
            "min_delta_rel": round(delta, 3),
            "pairwise_median_delta": round(
                _median(pair_deltas), 3) if pair_deltas else None,
        }
    bands = sorted(max(v["band_a"], v["band_b"])
                   for v in per_query.values())
    tbands = sorted(max(v["trimmed_band_a"], v["trimmed_band_b"])
                    for v in per_query.values())
    totals_a = [sum(r[q] for q in names) for r in a_runs]
    totals_b = [sum(r[q] for q in names) for r in b_runs]
    trimmed_tot_a = {q: _tmean([r[q] for r in a_runs]) for q in names}
    trimmed_tot_b = {q: _tmean([r[q] for r in b_runs]) for q in names}
    ta_sum = sum(trimmed_tot_a.values())
    tb_sum = sum(trimmed_tot_b.values())
    stats = {
        # Per-query relative band (same-code max-min over median):
        # the yardstick for judging any cross-round per-query delta.
        "per_query_band_p50": round(_median(bands), 3),
        "per_query_band_p90": round(
            bands[min(len(bands) - 1, int(0.9 * len(bands)))], 3),
        "per_query_trimmed_band_p50": round(_median(tbands), 3),
        "per_query_trimmed_band_p90": round(
            tbands[min(len(tbands) - 1, int(0.9 * len(tbands)))], 3),
        "total_band_a": round(
            (max(totals_a) - min(totals_a)) / _median(totals_a), 3),
        "total_band_b": round(
            (max(totals_b) - min(totals_b)) / _median(totals_b), 3),
        "total_min_a": round(min(totals_a), 3),
        "total_min_b": round(min(totals_b), 3),
        "total_delta_rel": round(
            (min(totals_a) - min(totals_b)) / min(totals_b), 3),
        "total_trimmed_a": round(ta_sum, 3),
        "total_trimmed_b": round(tb_sum, 3),
        "total_trimmed_delta_rel": round(ta_sum / tb_sum - 1, 3),
        # Median over pairs of the per-pair TOTAL ratio — the
        # drift-free, stall-robust total verdict (see per-query
        # pairwise_median_delta).
        # `if y` guards a degenerate all-zero pass (same as the
        # per-query twin): losing a 75-minute session's summary to a
        # ZeroDivisionError in the last line would be absurd.
        "total_pairwise_median_delta": round(_median(
            [(x - y) / y for x, y in zip(totals_a, totals_b) if y]
            or [0.0]), 3),
    }
    return per_query, stats


def _tmean(v):
    # Worst-pass-trimmed mean — bench.py's second headline
    # statistic; its same-code cross-HEAD delta is the yardstick
    # for the trimmed_delta_rel bench.py reports.
    keep = sorted(v)[:-1] if len(v) >= 3 else v
    return sum(keep) / len(keep)


def _write_artifacts(repo: str, summary: dict, per_query: dict,
                     n_pairs: int, ref: str) -> None:
    with open(os.path.join(repo, "NOISE_BAND.json"), "w") as f:
        json.dump({"summary": summary, "queries": per_query}, f,
                  indent=1)
    # The B side doubles as the same-host prev-HEAD artifact. EQUAL
    # SAMPLE COUNTS with bench.py's headline statistic (round-6
    # verdict nit: a min-of-5 baseline vs a min-of-3 headline makes
    # per-query deltas look worse than the same-code spread): only
    # the first `n_prev` B passes feed the prev artifact, matching
    # SPARK_GRAFT_BENCH_PASSES (bench.py's default 3).
    n_prev = min(n_pairs,
                 int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "5")))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    prev_queries = {q: min(v["b"][:n_prev])
                    for q, v in per_query.items()}
    prev_trimmed = {q: round(_tmean(v["b"][:n_prev]), 3)
                    for q, v in per_query.items()}
    prev = {
        "commit": ref,
        "total_min": round(sum(prev_queries.values()), 3),
        "total_trimmed": round(sum(prev_trimmed.values()), 3),
        "sf": float(sf),
        "stat": f"min_of_{n_prev}_interleaved",
        "consume": "noop_write",
        # bench.py equalizes its own min to this count before
        # reporting deltas — omitting it forfeits the equal-N
        # guarantee this script exists to provide.
        "passes": n_prev,
        "queries": prev_queries,
        # Worst-pass-trimmed means over the SAME n_prev passes — the
        # prev side of bench.py's trimmed_delta_rel.
        "queries_trimmed": prev_trimmed,
    }
    with open(os.path.join(repo, "BENCH_PREV_HEAD.json"), "w") as f:
        json.dump(prev, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
