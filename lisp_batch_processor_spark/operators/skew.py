"""Skew mitigation: salted joins and two-phase aggregation.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`) handles
most skew at runtime; these utilities are the explicit, plan-time
version for the cases AQE can't fix — a single hot key whose hash
bucket exceeds one executor's memory, or a first-stage aggregation
whose hot group bottlenecks a task. Both are pure DataFrame
rewrites: results are provably identical to the unsalted plan
(tests/test_skew.py asserts equality row-for-row).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(left: DataFrame, right: DataFrame,
                keys: Sequence[str], n_salts: int = 8,
                how: str = "inner") -> DataFrame:
    """Equi-join where `left` has skewed keys: spread each left key
    over `n_salts` sub-keys, replicate `right` once per salt, join on
    (keys + salt). The hot key's rows land in n_salts tasks instead
    of one.

    Correctness does not depend on WHICH salt a left row gets (the
    right side is replicated to every salt), only that each row gets
    exactly one — so any spreader works; crc32 over a unique id
    spreads evenly even when all key values are identical.
    Replication multiplies the right side's shuffle volume by
    n_salts: use for dimension-sized right sides or after isolating
    the hot keys.

    Only left-preserving join types are supported: with `how` of
    'right'/'full', each unmatched RIGHT row appears once per salt
    replica, emitting n_salts duplicated null-extended rows.
    """
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports left-preserving joins {sorted(allowed)}, "
            f"got how={how!r}: right/full would duplicate unmatched right "
            f"rows once per salt")
    keys = list(keys)
    spreader = F.crc32(F.concat_ws("\x00", *[F.col(k).cast("string")
                                             for k in keys],
                                   F.monotonically_increasing_id()
                                    .cast("string")))
    lsalted = left.withColumn(SALT_COL, (spreader % n_salts).cast("int"))
    rsalted = right.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = lsalted.join(rsalted, keys + [SALT_COL], how)
    return out.drop(SALT_COL)


def two_phase_agg(df: DataFrame, keys: Sequence[str],
                  aggs: dict[str, tuple[str, str]],
                  n_salts: int = 8) -> DataFrame:
    """Two-phase (salted) aggregation for hot groups: partial agg on
    (keys + salt), then final agg on keys. Supports the decomposable
    aggregates {sum, count, min, max}: `aggs` maps output column ->
    (function, input column).

    Spark's hash aggregation already does map-side partials, so this
    only pays off when a single group is so hot its FINAL reduce task
    lags the stage; the salt splits that reduce into n_salts + 1
    smaller ones.
    """
    recombine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for fn, _ in aggs.values():
        if fn not in first:
            raise ValueError(f"{fn!r} is not decomposable; use plain groupBy")
    keys = list(keys)
    salted = df.withColumn(
        SALT_COL,
        (F.crc32(F.monotonically_increasing_id().cast("string"))
         % n_salts).cast("int"))
    partial = salted.groupBy(*keys, SALT_COL).agg(*[
        first[fn](col).alias(out) for out, (fn, col) in aggs.items()])
    return partial.groupBy(*keys).agg(*[
        recombine[fn](out).alias(out) for out, (fn, _) in aggs.items()])
