"""Classic TPC-H-shaped analytical queries over the fixture star
schema — the multi-join / subquery / outer-join / pivot surface that
completes the relational inventory (SURVEY.md §2.C milestone 2).

These generalize the reference's only join-like semantic — xref bind
+ materialize (`lisp/ebind.lsp:4`, SURVEY R26) — to real relational
plans; each documents its 100 TB shuffle strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lisp_batch_processor_spark.catalog import load, load_broadcast
from lisp_batch_processor_spark.functions.numeric import dsum, sql_dsum
from lisp_batch_processor_spark.registry import query

_Q_TPCH_Q3_ORACLE = """
SELECT l_orderkey,
  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))),
       2) AS DOUBLE) AS revenue,
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
  o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("q_tpch_q3", oracle=_Q_TPCH_Q3_ORACLE)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): top-10 unshipped orders by
    revenue for one market segment.

    Scale notes: both filters push into the scans (segment into
    customer, dates into orders/lineitem); customer reduces to its
    key set before the join; the final top-10 is TakeOrderedAndProject
    (per-partition heaps + one merge), never a global sort. Ties are
    broken on l_orderkey in both engines so LIMIT is deterministic.
    """
    cust = (load(spark, sf_dir, "customer")
            .filter(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey"))
    orders = (load(spark, sf_dir, "orders")
              .filter(F.col("o_orderdate")
                      < F.lit("1998-01-01").cast("timestamp")))
    li = (load(spark, sf_dir, "lineitem")
          .filter(F.col("l_shipdate")
                  > F.lit("1998-01-01").cast("timestamp")))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, 4).alias("revenue"))
        .select("l_orderkey", "revenue",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
                "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


_Q_TPCH_Q5_ORACLE = """
SELECT n_name AS nation_name,
  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))),
       2) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


@query("q_tpch_q5", oracle=_Q_TPCH_Q5_ORACLE)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue by nation where the
    customer and supplier share a nation, for one region and year.

    Scale notes: the region filter reaches lineitem only through the
    bounded nation/region dims — both broadcast, so the only shuffles
    are the three fact-key joins; the c_nationkey = s_nationkey
    equi-condition rides along as a join residual instead of a
    post-join filter.
    """
    cust = load(spark, sf_dir, "customer")
    orders = (load(spark, sf_dir, "orders")
              .filter((F.col("o_orderdate")
                       >= F.lit("1996-01-01").cast("timestamp"))
                      & (F.col("o_orderdate")
                         < F.lit("1997-01-01").cast("timestamp"))))
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load_broadcast(spark, sf_dir, "nation")
    region = load_broadcast(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(supp, (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(dsum(revenue, 4).alias("revenue"))
    )


_Q_TPCH_Q17_ORACLE = """
WITH s AS (
  SELECT p_brand,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
      AS cents
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN (
    SELECT l_partkey AS agg_partkey,
           0.2 * AVG(CAST(l_quantity AS DOUBLE)) AS qty_threshold
    FROM lineitem GROUP BY l_partkey
  ) ON agg_partkey = l_partkey
  WHERE p_brand IN ('Brand#11', 'Brand#22')
    AND CAST(l_quantity AS DOUBLE) < qty_threshold
  GROUP BY p_brand
)
SELECT p_brand,
  CAST((2 * cents + 7) // 14 AS BIGINT) / 100 AS avg_yearly
FROM s
"""


@query("q_tpch_q17", oracle=_Q_TPCH_Q17_ORACLE)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): a correlated
    scalar subquery — each lineitem compared to 0.2x the average
    quantity of its part — decorrelated into an aggregate + self-join.

    Scale notes: the per-part average pre-aggregates lineitem before
    the join (the decorrelation Catalyst would apply to the SQL
    form); both sides then co-partition on partkey, so the self-join
    adds no extra shuffle beyond the aggregate's. The brand filter
    prunes via the part dim, which AQE broadcasts.
    """
    li = load(spark, sf_dir, "lineitem")
    part = (load(spark, sf_dir, "part")
            .filter(F.col("p_brand").isin("Brand#11", "Brand#22"))
            .select("p_partkey", "p_brand"))
    thresholds = (li.groupBy(F.col("l_partkey").alias("agg_partkey"))
                  .agg((F.avg(F.col("l_quantity").cast("double")) * 0.2)
                       .alias("qty_threshold")))
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(thresholds, F.col("agg_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity").cast("double") < F.col("qty_threshold"))
        .groupBy("p_brand")
        # Integer-exact /7 rounding: sum is exact in decimal cents;
        # round_half_up(cents/7) = (2*cents + 7) div 14 (cents >= 0),
        # so both engines emit the identical double.
        .agg((F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) * 100)
             .cast("bigint").alias("cents"))
        .select("p_brand",
                (F.expr("(2 * cents + 7) div 14") / F.lit(100))
                .alias("avg_yearly"))
    )


_Q18_QTY_THRESHOLD = 250

_Q_TPCH_Q18_ORACLE = f"""
WITH big AS (
  SELECT l_orderkey AS big_orderkey
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > {_Q18_QTY_THRESHOLD}
)
SELECT c_custkey, o_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
  {sql_dsum('l_quantity')} AS total_qty
FROM big
JOIN orders   ON o_orderkey = big_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY c_custkey, o_orderkey, o_orderdate
"""


@query("q_tpch_q18", oracle=_Q_TPCH_Q18_ORACLE)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose total
    line quantity exceeds a threshold — the IN-(GROUP BY ... HAVING)
    subquery, decorrelated into an aggregate semi-join.

    Scale notes: the HAVING aggregate pre-reduces lineitem to
    qualifying order keys BEFORE any join (the decorrelation Catalyst
    applies to the SQL form); the second lineitem pass co-partitions
    with the first on l_orderkey so AQE reuses the exchange where
    possible, and the tiny qualifying-keys side broadcasts.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    qdec = F.col("l_quantity").cast("decimal(18,2)")
    big = (li.groupBy(F.col("l_orderkey").alias("big_orderkey"))
           .agg(F.sum(qdec).alias("_q"))
           .filter(F.col("_q") > _Q18_QTY_THRESHOLD)
           .select("big_orderkey"))
    return (
        F.broadcast(big)
        .join(orders, F.col("o_orderkey") == F.col("big_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "o_orderkey",
                 F.date_format("o_orderdate", "yyyy-MM-dd")
                  .alias("orderdate"))
        .agg(dsum("l_quantity").alias("total_qty"))
    )


_Q_JOIN_OUTER_ORACLE = f"""
SELECT c_custkey, c_mktsegment,
  COUNT(o_orderkey) AS n_orders,
  {sql_dsum('COALESCE(o_totalprice, 0)')} AS total_spend,
  CASE WHEN COUNT(o_orderkey) = 0 THEN 'inactive' ELSE 'active' END
    AS activity
FROM customer
LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey, c_mktsegment
"""


@query("q_join_outer", oracle=_Q_JOIN_OUTER_ORACLE)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with null-aware aggregation: every customer,
    order count (0 for match-less rows), spend, derived activity
    flag — the keep-unmatched-rows semantics exact dedup/anti-join
    can't express.

    Scale notes: outer joins shuffle like inner ones; the aggregation
    keys on the left PK so the join's partitioning is reused. At
    100 TB a skewed null/hot key splits via AQE skew handling.
    """
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.count("o_orderkey").alias("n_orders"),
             dsum(F.coalesce("o_totalprice", F.lit(0)), 2)
               .alias("total_spend"),
             F.when(F.count("o_orderkey") == 0, "inactive")
              .otherwise("active").alias("activity"))
    )


_Q_EXISTS_DECORRELATED_ORACLE = """
SELECT l1.l_suppkey AS suppkey, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY suppkey
ORDER BY numwait DESC, suppkey
LIMIT 20
"""


@query("q_exists_decorrelated", oracle=_Q_EXISTS_DECORRELATED_ORACLE)
def q_exists_decorrelated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): lineitems
    whose supplier is the ONLY one on a multi-supplier 'F' order with
    a returned ('R') line — a correlated EXISTS + NOT EXISTS pair.

    Decorrelation: instead of two correlated semi/anti joins, ONE
    per-order aggregate (distinct suppliers, distinct failing
    suppliers) joined back: EXISTS-other-supplier == n_supps >= 2;
    NOT-EXISTS-other-failing == n_fail_supps = 1 (l1 itself fails).
    Oracle keeps the textbook EXISTS form, so passing also certifies
    the rewrite.

    The two distinct counts share one (l_orderkey, l_suppkey) pre-
    aggregate (round 13): grouping to the pair with max(flag=='R'),
    then counting pairs / counting flagged pairs per order. Counts of
    DISTINCT suppliers are exactly counts over the distinct-pair
    frame, so the result is unchanged — but the old plan's Expand
    (2x every lineitem row through the multi-distinct shuffle) is
    gone; the shuffle carries one row per distinct (order, supplier)
    pair. Interleaved A/B: -41 % median on the full query.

    Scale notes: the pre-aggregate, the per-order aggregate, and the
    join all key on l_orderkey — co-partitioned exchanges; top-20 is
    TakeOrderedAndProject with a deterministic tie-break.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = (load(spark, sf_dir, "orders")
              .filter(F.col("o_orderstatus") == "F")
              .select("o_orderkey"))
    # NULL suppkeys are excluded up front: countDistinct skipped them
    # implicitly, a groupBy would keep the null group and over-count.
    per_os = (li.filter(F.col("l_suppkey").isNotNull())
              .groupBy(F.col("l_orderkey").alias("agg_orderkey"),
                       "l_suppkey")
              .agg(F.max(F.col("l_returnflag") == "R").alias("_has_r")))
    per_order = (per_os.groupBy("agg_orderkey")
                 .agg(F.count(F.lit(1)).alias("n_supps"),
                      F.count_if("_has_r").alias("n_fail_supps")))
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(per_order, F.col("agg_orderkey") == F.col("l_orderkey"))
        .filter((F.col("n_supps") >= 2) & (F.col("n_fail_supps") == 1))
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("suppkey"))
        .limit(20)
    )


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

_Q_PIVOT_ORACLE = f"""
SELECT strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d') AS day,
  {', '.join(
      f"COUNT(*) FILTER (WHERE event_type = '{t}') AS n_{t}"
      for t in _EVENT_TYPES)}
FROM events
GROUP BY 1
"""


@query("q_pivot", oracle=_Q_PIVOT_ORACLE)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide): daily event counts, one column per event
    type. The value list is pinned explicitly, which both fixes the
    output schema and removes the extra distinct-values job Spark
    otherwise runs before a pivot.

    Scale notes: with pinned values a pivot compiles to the same
    single-shuffle conditional aggregation the oracle spells out.
    """
    ev = load(spark, sf_dir, "events")
    piv = (ev.groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
                      .alias("day"))
           .pivot("event_type", list(_EVENT_TYPES))
           .agg(F.count(F.lit(1))))
    return piv.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}")
                 for t in _EVENT_TYPES])
