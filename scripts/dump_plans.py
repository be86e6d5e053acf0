"""Dump `.explain("formatted")` for registered queries (and the
line/span bench extras) to files.

Usage:
    python scripts/dump_plans.py <out_dir> <suffix> [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query (default: all
registered + q_line_dedup/q_span_dedup). Run from the tree whose
plans you want — e.g. a git worktree of the previous round's HEAD for
the `before` side.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lisp_batch_processor_spark import all_queries
from lisp_batch_processor_spark.catalog import load
from lisp_batch_processor_spark.plans import physical_plan
from lisp_batch_processor_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _extras():
    from lisp_batch_processor_spark.operators.dedup import (
        line_dedup, span_dedup)
    return {
        "q_line_dedup":
            lambda spark, sf: line_dedup(load(spark, sf, "documents")),
        "q_span_dedup":
            lambda spark, sf: span_dedup(load(spark, sf, "documents")),
    }


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    qs = {**all_queries(), **_extras()}
    names = sys.argv[3:] or list(qs)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans", cpus=CPUS, shuffle_partitions=CPUS)
    for name in names:
        try:
            plan = physical_plan(qs[name](spark, SF_DIR))
        except Exception as e:  # noqa: BLE001
            plan = f"PLAN FAILED: {type(e).__name__}: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan if plan.endswith("\n") else plan + "\n")
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
