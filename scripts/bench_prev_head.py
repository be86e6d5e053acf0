"""Same-host cross-round bench series: run the PREVIOUS round's HEAD
bench in a git worktree on THIS host and record its per-query mins to
BENCH_PREV_HEAD.json, which bench.py then summarizes into its final
JSON line as "prev_head".

Why: archived BENCH_r{N}.json files are cross-host (each round may
run on a freshly booted VM with different effective CPU speed) and
round 3→4 also changed the consumption method, so the only honest
code-regression signal is benching BOTH HEADs in one session on one
host. Run this BEFORE the current round's own bench, never
concurrently with any other Spark process (contamination inflates
even min-of-3 by 2-4x — see SCALE.md).

Usage: python scripts/bench_prev_head.py <prev_commit>
Env: same knobs as bench.py (SPARK_GRAFT_SF_DIR/CPUS/BENCH_PASSES).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def main() -> None:
    if len(sys.argv) != 2:
        sys.exit("usage: bench_prev_head.py <prev_commit>")
    commit = sys.argv[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wt = f"/tmp/prev_head_{commit[:12]}"
    subprocess.run(["git", "-C", repo, "worktree", "add", "--force",
                    wt, commit], check=True)
    try:
        env = dict(os.environ)
        proc = subprocess.run(
            [sys.executable, "bench.py"], cwd=wt, env=env,
            capture_output=True, text=True, check=True)
        # The bench JSON is the last non-comment stdout line; parsed
        # from the FULL stdout here, so the old giant-line format is
        # fine too.
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("{")][-1]
        prev = json.loads(line)
        out = {
            "commit": commit,
            "total_min": prev["value"],
            "sf": prev["sf"],
            "stat": prev.get("stat"),
            "consume": prev.get("consume"),
            # Sample count behind every min below — bench.py equalizes
            # its own min to this N before reporting deltas, so a
            # min-of-3 vs min-of-5 sampling artifact can't read as a
            # code regression.
            "passes": prev.get("passes"),
            "queries": prev["queries"],
        }
        # Worst-pass-trimmed means (round 12): reconstructed from the
        # per-pass stderr lines every bench.py version prints
        # ("# passN q_name: X.XXXs"), so prev HEADs that predate the
        # trimmed statistic still feed bench.py's trimmed_delta_rel.
        import re
        per_pass: dict[str, list[float]] = {}
        for ln in proc.stderr.splitlines():
            m = re.match(r"# pass\d+ (\S+): ([\d.]+)s$", ln)
            if m:
                per_pass.setdefault(m.group(1), []).append(
                    float(m.group(2)))
        if per_pass:
            def _tmean(v):
                keep = sorted(v)[:-1] if len(v) >= 3 else v
                return sum(keep) / len(keep)
            out["queries_trimmed"] = {
                q: round(_tmean(v), 3) for q, v in per_pass.items()}
            out["total_trimmed"] = round(
                sum(out["queries_trimmed"].values()), 3)
        path = os.path.join(repo, "BENCH_PREV_HEAD.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {path}: total_min={out['total_min']}s "
              f"at sf{out['sf']} for {commit[:12]}")
    finally:
        subprocess.run(["git", "-C", repo, "worktree", "remove",
                        "--force", wt], check=False)


if __name__ == "__main__":
    main()
