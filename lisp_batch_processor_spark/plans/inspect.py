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


# Single-child physical nodes that PROVABLY preserve or reduce row
# count. A WHITELIST, not a Generate/Expand blacklist: row-EXPANDING
# single-child nodes also exist outside those two (MapInPandas /
# FlatMapGroupsInPandas / UDTF evals can fan one row out to many), and
# an audit whose job is catching unbounded broadcast build sides must
# not "prove" one small through a node it doesn't know.
_ROW_PRESERVING = ("Project", "Filter", "Exchange", "BroadcastExchange",
                   "ReusedExchange", "AQEShuffleRead", "Sort",
                   "LocalLimit", "GlobalLimit", "Coalesce",
                   "ColumnarToRow", "RowToColumnar", "InputAdapter",
                   "WholeStageCodegen", "Subquery")


def _subtree_max_one_row(jnode) -> bool:
    """True when a physical subtree PROVABLY produces <= 1 row: a
    keyless (global) aggregate, reached through single-child nodes
    KNOWN to preserve or reduce row count (`_ROW_PRESERVING`).
    Anything unrecognized — including Generate/Expand and the
    row-expanding Python evals — is not proven and returns False."""
    name = jnode.nodeName()
    if "Aggregate" in name:
        try:
            return bool(jnode.groupingExpressions().isEmpty())
        except Exception:  # noqa: BLE001 — unknown agg node: not proven
            return False
    children = jnode.children()
    if (children.size() == 1
            and any(name == w or name.startswith(w + " ")
                    for w in _ROW_PRESERVING)):
        return _subtree_max_one_row(children.apply(0))
    return False


def disallowed_nested_loops(df: DataFrame) -> list[str]:
    """Node names of the joins in the physical plan that would melt
    at scale: every CartesianProduct, and every
    BroadcastNestedLoopJoin EXCEPT the one-row-broadcast pattern — a
    build side the planner can prove is <= 1 row (a keyless
    aggregate), e.g. a broadcast config/flag row joined onto a big
    frame. That shape is O(rows · 1) with no shuffle — it is how a
    data-derived scalar enters a plan without a driver action — while
    a BNLJ over an unbounded build side is quadratic; the audit keeps
    flagging the latter. Walks the pre-AQE physical tree (the same
    plan explainString formats), INCLUDING subquery plans: a scalar /
    IN-subquery's plan is not among `children()`, and before
    PlanSubqueries runs (executedPlan-time) a physical node surfaces
    it as a LOGICAL plan — so each one is re-planned through the
    session's planner and walked like the main tree, keeping the
    melt-at-scale shapes visible where they actually hide (e.g. a
    cartesian inside a scalar subquery)."""
    bad: list[str] = []
    jspark = df.sparkSession._jsparkSession  # type: ignore[attr-defined]
    jvm = df.sparkSession._jvm  # type: ignore[attr-defined]

    def walk(jnode) -> None:
        name = jnode.nodeName()
        if name == "CartesianProduct":
            bad.append(name)
        elif name == "BroadcastNestedLoopJoin":
            children = jnode.children()
            build = (children.apply(1)
                     if "BuildRight" in jnode.buildSide().toString()
                     else children.apply(0))
            if not _subtree_max_one_row(build):
                bad.append(name)
        children = jnode.children()
        for i in range(children.size()):
            walk(children.apply(i))
        subs = jnode.subqueries()
        for i in range(subs.size()):
            walk(jvm.org.apache.spark.sql.classic.Dataset
                 .ofRows(jspark, subs.apply(i))
                 .queryExecution().sparkPlan())

    walk(df._jdf.queryExecution().sparkPlan())
    return bad


def assert_no_cartesian(df: DataFrame) -> None:
    """Assert the plan contains no join shape that melts at scale: no
    cartesian product and no broadcast-nested-loop join over a build
    side that can exceed one row (a PROVABLY <= 1-row broadcast — the
    flag/config-scalar pattern — is O(rows) and allowed; see
    disallowed_nested_loops)."""
    bad = disallowed_nested_loops(df)
    assert not bad, f"{bad} in plan:\n{physical_plan(df)}"
