"""Core relational operators (SURVEY.md §2.C, milestones 0-2).

Scan/project/filter/dedup generalize the reference's list-management
semantics (`Batch Processor.py:228-244, 231, 263-266` — ingest with
extension predicate and dedup-on-insert); aggregation generalizes its
success-count rollup (`Batch Processor.py:85, 312, 329`). Joins,
windows, set ops, and rollup/cube have no reference counterpart
(SURVEY.md §2.B) and are implemented Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lisp_batch_processor_spark.catalog import load, load_broadcast
from lisp_batch_processor_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum
from lisp_batch_processor_spark.registry import query

# ---------------------------------------------------------------------------
# q_agg_groupby — TPC-H Q1 shape: the flagship aggregation.
# ---------------------------------------------------------------------------

_Q_AGG_GROUPBY_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum("l_quantity", 2)} AS sum_qty,
  {sql_dsum("l_extendedprice", 2)} AS sum_base_price,
  {sql_dsum("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price,
  {sql_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge,
  {sql_davg("l_quantity", 2)} AS avg_qty,
  {sql_davg("l_extendedprice", 2)} AS avg_price,
  {sql_davg("l_discount", 2)} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("q_agg_groupby", oracle=_Q_AGG_GROUPBY_ORACLE)
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped aggregation, TPC-H Q1 shape (SURVEY.md §2.C; generalizes
    the reference's scalar success-count aggregation R16/R17).

    Scale notes: filter + projection push into the parquet scan; the
    two-column groupBy is a partial (map-side) agg then a 6-group
    shuffle — no skew possible with bounded group cardinality.
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", 2).alias("sum_qty"),
            dsum("l_extendedprice", 2).alias("sum_base_price"),
            dsum(disc_price, 4).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            davg("l_quantity", 2).alias("avg_qty"),
            davg("l_extendedprice", 2).alias("avg_price"),
            davg("l_discount", 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
