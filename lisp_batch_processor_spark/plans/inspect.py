"""Physical-plan assertions.

"The plan you'd want, not the first one that passed": these helpers
let tests pin the properties that matter at 100 TB — filters reaching
the parquet scan, scans reading only referenced columns, no
accidental cartesian/broadcast-nested-loop joins — so a refactor that
silently de-optimizes a query fails CI, not a production run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted")


def _scan_blocks(plan: str) -> list[str]:
    """Split a formatted plan into its node blocks (blank-line
    separated) and keep the parquet scans."""
    return [b for b in plan.split("\n\n") if "Scan parquet" in b]


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert each fragment appears in a scan's PushedFilters list."""
    plan = physical_plan(df)
    pushed = "\n".join(ln for ln in plan.splitlines()
                       if "PushedFilters" in ln)
    for frag in fragments:
        assert frag in pushed, (
            f"filter {frag!r} not pushed to any scan.\n"
            f"PushedFilters lines:\n{pushed}\nfull plan:\n{plan}")


def assert_read_schema_pruned(df: DataFrame, table_fragment: str,
                              max_columns: int) -> None:
    """Assert the scan whose Location matches `table_fragment` reads
    at most `max_columns` columns (column pruning reached the reader)."""
    plan = physical_plan(df)
    for block in _scan_blocks(plan):
        if table_fragment not in block:
            continue
        for ln in block.splitlines():
            if "ReadSchema" in ln:
                ncols = ln.split("struct<", 1)[-1].count(":")
                assert ncols <= max_columns, (
                    f"scan of {table_fragment} reads {ncols} columns, "
                    f"expected <= {max_columns}:\n{ln}")
                return
    raise AssertionError(
        f"no parquet scan matching {table_fragment!r} found in plan:\n{plan}")


def assert_no_cartesian(df: DataFrame) -> None:
    """Assert the plan contains no cartesian product and no
    broadcast-nested-loop join — the two shapes that melt at scale."""
    plan = physical_plan(df)
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan, f"{bad} in plan:\n{plan}"
