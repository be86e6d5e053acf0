"""Plan audit: print red flags in every registered query's physical
plan — cartesian products, broadcast nested loops, global sorts that
aren't top-k, scans with no pushed filters where the query filters,
and row-at-a-time Python UDFs (BatchEvalPython).

Usage: python scripts/audit_plans.py [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lisp_batch_processor_spark import all_queries
from lisp_batch_processor_spark.plans import (
    disallowed_nested_loops,
    physical_plan,
)
from lisp_batch_processor_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_SF_DIR", "/root/testdata/sf0.01")

# Documented exceptions: flags that are the intended design.
ALLOWED = {
    # Brute-force exact top-k broadcasts the BOUNDED query set (10
    # rows) and nested-loops over corpus partitions — a map-side scan
    # with no corpus shuffle. The scale path is q_similarity_ann.
    ("q_similarity_topk", "BNLJ"),
}


def main() -> int:
    names = sys.argv[1:] or list(all_queries())
    qs = all_queries()
    spark = get_spark("audit_plans", cpus=8)
    bad = 0
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            plan = physical_plan(df)
            # Structural, not textual: a BNLJ whose broadcast side is
            # PROVABLY <= 1 row (the data-derived flag/scalar pattern,
            # e.g. q_dedup_ngram's injectivity gate) is O(rows) with
            # no shuffle and is not flagged; every cartesian and every
            # BNLJ over an unbounded build side still is.
            loops = disallowed_nested_loops(df)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: PLAN FAILED {type(e).__name__}: {e}")
            bad += 1
            continue
        flags = []
        if "CartesianProduct" in loops:
            flags.append("CARTESIAN")
        if "BroadcastNestedLoopJoin" in loops:
            flags.append("BNLJ")
        if "BatchEvalPython" in plan:
            flags.append("ROW_PYTHON_UDF")
        n_exchanges = plan.count("+- Exchange") + plan.count(":- Exchange")
        has_global_sort = ("Sort " in plan and "TakeOrderedAndProject"
                          not in plan and "global=true" in plan.lower())
        if has_global_sort:
            flags.append("GLOBAL_SORT")
        allowed = [f for f in flags if (name, f) in ALLOWED]
        flags = [f for f in flags if (name, f) not in ALLOWED]
        status = " ".join(flags) if flags else "ok"
        if allowed:
            status += " (allowed: " + " ".join(allowed) + ")"
        print(f"{name}: {status} (exchanges={n_exchanges})")
        if flags:
            bad += 1
    print(f"\n{bad} queries flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
