"""Run-status rollup and data-quality audit (SURVEY.md §2.C).

q_status_rollup generalizes the reference's success-count summary
(`Batch Processor.py:85, 312, 329` — R16/R17); q_quality_audit
generalizes its AUDIT pass and error classification
(`lisp/ebind.lsp:5`, `Batch Processor.py:313-320` — R21/R26): a
per-rule violation report instead of a job abort, i.e. the per-row
error-channel pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lisp_batch_processor_spark.catalog import load
from lisp_batch_processor_spark.functions.numeric import (
    dratio, dsum, sql_dratio, sql_dsum,
)
from lisp_batch_processor_spark.registry import query

_Q_STATUS_ROLLUP_ORACLE = f"""
WITH s AS (
  SELECT
    o_orderstatus,
    COUNT(*) AS n_orders,
    CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
         AS BIGINT) AS n_urgent,
    {sql_dsum('o_totalprice')} AS sum_totalprice
  FROM orders
  GROUP BY o_orderstatus
)
SELECT o_orderstatus, n_orders, n_urgent,
  {sql_dratio('n_urgent', 'n_orders')} AS urgent_rate,
  sum_totalprice
FROM s
"""


@query("q_status_rollup", oracle=_Q_STATUS_ROLLUP_ORACLE)
def q_status_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Success/failure-style counts and rates by status group —
    the "k of N processed successfully" summary (R16/R17) as a
    grouped conditional aggregation. The rate is integer-exact
    (functions/numeric.dratio) so the driver's full-precision hash
    matches across engines.
    """
    o = load(spark, sf_dir, "orders")
    urgent = F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0))
    agg = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        urgent.cast("bigint").alias("n_urgent"),
        dsum("o_totalprice").alias("sum_totalprice"),
    )
    return agg.select(
        "o_orderstatus", "n_orders", "n_urgent",
        dratio("n_urgent", "n_orders").alias("urgent_rate"),
        "sum_totalprice",
    )


_Q_QUALITY_AUDIT_ORACLE = """
SELECT 'lineitem_null_quantity' AS rule,
  COUNT(*) FILTER (WHERE l_quantity IS NULL) AS violations,
  COUNT(*) AS checked FROM lineitem
UNION ALL
SELECT 'lineitem_discount_range',
  COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1),
  COUNT(*) FROM lineitem
UNION ALL
SELECT 'lineitem_nonpositive_qty', COUNT(*) FILTER (WHERE l_quantity <= 0),
  COUNT(*) FROM lineitem
UNION ALL
SELECT 'lineitem_tax_range', COUNT(*) FILTER (WHERE l_tax < 0 OR l_tax > 0.08),
  COUNT(*) FROM lineitem
UNION ALL
SELECT 'lineitem_orphan_order', COUNT(*) FILTER (WHERE o_orderkey IS NULL), COUNT(*)
FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
UNION ALL
SELECT 'orders_duplicate_pk', COUNT(*) FILTER (WHERE cnt > 1), COUNT(*)
FROM (SELECT o_orderkey, COUNT(*) AS cnt FROM orders GROUP BY o_orderkey)
UNION ALL
SELECT 'orders_bad_status',
  COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P')),
  COUNT(*) FROM orders
"""


@query("q_quality_audit", oracle=_Q_QUALITY_AUDIT_ORACLE)
def q_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality validation pass: null / range / domain /
    referential-integrity / duplicate-PK rules, each reported as
    (rule, violations, checked) — per-row error channel instead of
    abort (R21/R26 AUDIT analog).

    Scale notes: the four lineitem rules fuse into ONE scan with
    conditional aggregation; the referential rule is a left join
    reduced to counts; both orders rules (duplicate-PK, bad-status)
    share ONE scan and ONE per-key aggregate (round 14 — the plain
    bad-status scan+agg is gone from the plan; FLAT in local A/B
    because the union's branches overlap inside one job on an idle
    box, but one full orders scan fewer is what matters on a busy
    100 TB cluster). Each branch is a separate tiny result unioned
    plan-side.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")

    def rule(name: str, cond) -> list:
        return [F.sum(F.when(cond, 1).otherwise(0)).alias(f"v_{name}")]

    # Four rules in one pass over lineitem.
    li_rules = li.agg(
        *rule("null_quantity", F.col("l_quantity").isNull()),
        *rule("discount_range", (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)),
        *rule("nonpositive_qty", F.col("l_quantity") <= 0),
        *rule("tax_range", (F.col("l_tax") < 0) | (F.col("l_tax") > 0.08)),
        F.count(F.lit(1)).alias("checked"),
    )
    li_long = li_rules.select(F.explode(F.create_map(
        F.lit("lineitem_null_quantity"), F.col("v_null_quantity"),
        F.lit("lineitem_discount_range"), F.col("v_discount_range"),
        F.lit("lineitem_nonpositive_qty"), F.col("v_nonpositive_qty"),
        F.lit("lineitem_tax_range"), F.col("v_tax_range"),
    )).alias("rule", "violations"), F.col("checked"))

    orphans = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left")
        .agg(F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
               .alias("violations"),
             F.count(F.lit(1)).alias("checked"))
        .select(F.lit("lineitem_orphan_order").alias("rule"),
                "violations", "checked"))

    # Both orders rules ride ONE scan + ONE per-key aggregation
    # (round 14, guide §2.4): the duplicate-PK rule needs the per-key
    # counts anyway, and the bad-status totals are recoverable from
    # the same grouped frame (violations = sum of per-key bad counts;
    # checked = sum of per-key row counts) — so the plain-agg second
    # orders pass is gone. `inline` emits both report rows from the
    # single 1-row aggregate, keeping one consumer of the subtree.
    orders_rules = (
        o.groupBy("o_orderkey").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)
                  .otherwise(0)).alias("n_bad"))
        .agg(F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0)).alias("dup_v"),
             F.count(F.lit(1)).alias("dup_c"),
             F.sum("n_bad").alias("bad_v"),
             # coalesce: SUM over zero groups is NULL where the old
             # plain COUNT(*) was 0 — an empty orders table must
             # still report checked=0 (round-14 review finding).
             F.coalesce(F.sum("cnt"), F.lit(0)).alias("bad_c"))
        .select(F.inline(F.array(
            F.struct(F.lit("orders_duplicate_pk").alias("rule"),
                     F.col("dup_v").alias("violations"),
                     F.col("dup_c").alias("checked")),
            F.struct(F.lit("orders_bad_status").alias("rule"),
                     F.col("bad_v").alias("violations"),
                     F.col("bad_c").alias("checked"))))))

    return li_long.unionAll(orphans).unionAll(orders_rules)


def run_counters(df: DataFrame, ok: F.Column | None = None,
                 name: str = "run"):
    """Zero-cost run accounting riding on the query itself — the
    reference's live success counter and final "k of N" summary
    (`Batch Processor.py:85, 312, 329, 420-425`, R16-R18) done the
    Spark way: `Observation` metrics are computed INSIDE the job
    (per-task partial aggregation merged on the driver), so the
    counts cost no second pass, no cache, and no extra action —
    where a naive `df.count()` + `df.filter(ok).count()` would scan
    the data twice more.

    Returns ``(df', observation)``: run any ONE action on ``df'``
    (write, collect, noop), then ``observation.get`` yields
    ``{"n_rows": ..., "n_ok": ..., "n_err": ...}``. ``ok`` is the
    per-row success predicate (default: everything succeeded —
    pure-transform pipelines have no error channel); the error rows
    themselves stay IN the output, per the per-row error-channel
    convention (R21: errors don't abort the batch, q_quality_audit
    reports them).

    Scale notes: observed metrics are Catalyst `CollectMetrics` —
    a streaming-friendly, partial-aggregated side output; at any
    corpus size the driver receives one row of counters.
    """
    from pyspark.sql import Observation

    okc = F.lit(True) if ok is None else ok
    obs = Observation(name)
    out = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(okc.cast("long")).alias("n_ok"),
        F.sum((~okc).cast("long")).alias("n_err"))
    return out, obs
