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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lisp_batch_processor_spark.catalog import load
from lisp_batch_processor_spark.functions.numeric import dsum, sql_dsum
from lisp_batch_processor_spark.registry import query

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
    (function, input column). `("count", "*")` counts ROWS (SQL
    COUNT(*)); `("count", col)` counts non-null values of col — the
    same distinction SQL makes, and one the randomized fuzz pinned
    (the two differ as soon as the column is nullable).

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

    def _partial(fn: str, col: str):
        if fn == "count" and col == "*":
            return F.count(F.lit(1))
        return first[fn](col)

    keys = list(keys)
    salted = df.withColumn(
        SALT_COL,
        (F.crc32(F.monotonically_increasing_id().cast("string"))
         % n_salts).cast("int"))
    partial = salted.groupBy(*keys, SALT_COL).agg(*[
        _partial(fn, col).alias(out) for out, (fn, col) in aggs.items()])
    return partial.groupBy(*keys).agg(*[
        recombine[fn](out).alias(out) for out, (fn, _) in aggs.items()])


_Q_SKEW_JOIN_ORACLE = f"""
SELECT s_nationkey,
  COUNT(*) AS n_items,
  {sql_dsum('l_extendedprice')} AS sum_price
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_nationkey
"""


@query("q_skew_join", oracle=_Q_SKEW_JOIN_ORACLE)
def q_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join under the correctness gate: lineitem joined to
    supplier through salted_join (8 salts, supplier replicated per
    salt), rolled up by supplier nation. The oracle is the PLAIN
    join — passing proves the salting rewrite is result-invariant,
    which is the entire point of the utility.

    Scale notes: salting spreads one hot join key over 8 sub-keys at
    the cost of 8x the (dimension-sized) right side's shuffle — the
    explicit plan-time fix for the single-hot-key case AQE's skew
    split can't break up.
    """
    li = (load(spark, sf_dir, "lineitem")
          .select(F.col("l_suppkey").alias("suppkey"), "l_extendedprice"))
    supp = (load(spark, sf_dir, "supplier")
            .select(F.col("s_suppkey").alias("suppkey"), "s_nationkey"))
    joined = salted_join(li, supp, keys=["suppkey"], n_salts=8)
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum("l_extendedprice").alias("sum_price"))


_Q_SKEW_AGG_ORACLE = f"""
SELECT l_returnflag,
  COUNT(*) AS n_items,
  {sql_dsum('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY l_returnflag
"""


@query("q_skew_agg", oracle=_Q_SKEW_AGG_ORACLE)
def q_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase (salted) aggregation under the correctness gate:
    lineitem rolled up by the 3-value l_returnflag — exactly the
    hot-group shape the utility exists for — via partial agg on
    (key, salt) then final agg on key. The oracle is the plain GROUP
    BY: passing proves the decomposition is result-invariant.

    Scale notes: pays off only when one group's FINAL reduce task
    lags the stage; decimal-exact sums keep the two-phase
    recombination bit-identical to the single-phase plan.
    """
    li = (load(spark, sf_dir, "lineitem")
          .select("l_returnflag",
                  F.col("l_quantity").cast("decimal(18,2)").alias("qdec")))
    agg = two_phase_agg(li, ["l_returnflag"],
                        # count "*" = rows, matching the oracle's
                        # COUNT(*) even when l_quantity is NULL.
                        {"n_items": ("count", "*"),
                         "sum_qty_dec": ("sum", "qdec")},
                        n_salts=8)
    return agg.select(
        "l_returnflag", "n_items",
        F.round(F.col("sum_qty_dec"), 2).cast("double").alias("sum_qty"))


# ---------------------------------------------------------------------------
# Skew diagnostics — measure before you salt.
# ---------------------------------------------------------------------------

def skew_stats(df: DataFrame, keys: Sequence[str],
               top_k: int = 20) -> DataFrame:
    """Heavy-hitter profile of a prospective join/aggregation key:
    the ``top_k`` key values by row count with each one's absolute
    count, share of all rows, and ratio to the MEAN per-key count
    (``x_mean`` — the task-imbalance factor a hash partitioner would
    suffer). Feed the result to a human or a salting policy:
    ``x_mean`` near 1 ⇒ don't salt; a single key holding >> 1/tasks
    of the rows ⇒ `salted_join`/`two_phase_agg` territory, with
    n_salts ≈ ceil(hot-key share × desired tasks).

    Plan: one map-side-combined count per key, one global aggregate
    of the (small) per-key counts, one top-k — no row data beyond
    the first count ever shuffles. Rows with NULL keys count as a
    key like any other (NULL is a classic hot key).
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    keys = list(keys)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("_sk_rows"),
        F.count(F.lit(1)).alias("_sk_keys")).localCheckpoint(eager=False)
    return (counts.crossJoin(F.broadcast(totals))
            .select(*keys, "cnt",
                    (F.col("cnt") / F.col("_sk_rows")).alias("share"),
                    (F.col("cnt") * F.col("_sk_keys")
                     / F.col("_sk_rows")).alias("x_mean"))
            .orderBy(F.col("cnt").desc(), *keys)
            .limit(top_k))
