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

from lisp_batch_processor_spark.catalog import (
    fan_out_small_scan, load, load_broadcast)
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
    shuffle — no skew possible with bounded group cardinality. The
    heavy work is the partial aggregation (8 decimal-exact sums per
    row), which runs one task per input SPLIT — a one-file fixture
    scan would fold the whole table serially, so the projected+
    filtered rows fan out first (round 13; fan_out_small_scan is a
    no-op whenever the scan already has >= defaultParallelism splits,
    i.e. always at production scale). Interleaved A/B: -26 % median.
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        fan_out_small_scan(
            li.filter(F.col("l_shipdate")
                      <= F.lit("1998-09-02").cast("timestamp"))
            .select("l_returnflag", "l_linestatus", "l_quantity",
                    "l_extendedprice", "l_discount", "l_tax"),
            spark)
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


# ---------------------------------------------------------------------------
# q_scan_project — scan + projection + computed columns (R1/R3/R10).
# ---------------------------------------------------------------------------

_Q_SCAN_PROJECT_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  l_quantity,
  CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS DOUBLE)
    AS gross_price,
  CAST(year(l_shipdate) AS INT) AS ship_year
FROM lineitem
"""


@query("q_scan_project", oracle=_Q_SCAN_PROJECT_ORACLE)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan + column projection + computed column (SURVEY.md §2.C,
    generalizing reference ingest+basename projection R1/R3/R10,
    `Batch Processor.py:53-60, 233`).

    Scale notes: pure narrow op — ReadSchema prunes to 6 of 11
    columns at the parquet scan; no shuffle at any scale.
    """
    li = load(spark, sf_dir, "lineitem")
    gross = (F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        gross.cast("decimal(18,4)").cast("double").alias("gross_price"),
        F.year("l_shipdate").alias("ship_year"),
    )


# ---------------------------------------------------------------------------
# q_filter_pred — conjunctive predicates, prefix/suffix match (R5/R8/R9).
# ---------------------------------------------------------------------------

_Q_FILTER_PRED_ORACLE = """
SELECT p_partkey, p_name, p_brand, p_type, p_size
FROM part
WHERE p_size BETWEEN 10 AND 40
  AND p_type IN ('PROMO', 'SMALL', 'STANDARD')
  AND p_brand LIKE 'Brand#1%'
  AND p_brand LIKE '%1'
  AND p_retailprice IS NOT NULL
"""


@query("q_filter_pred", oracle=_Q_FILTER_PRED_ORACLE)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicates with prefix/suffix string match and
    null handling (generalizes the reference's `.dwg` extension
    predicate and run-gating, `Batch Processor.py:240, 276-280`).

    Scale notes: every conjunct is a pushable parquet filter
    (PushedFilters shows In/IsNotNull/GreaterThanOrEqual/
    StringStartsWith/StringEndsWith); no shuffle.
    """
    part = load(spark, sf_dir, "part")
    return part.filter(
        F.col("p_size").between(10, 40)
        & F.col("p_type").isin("PROMO", "SMALL", "STANDARD")
        & F.col("p_brand").startswith("Brand#1")
        & F.col("p_brand").endswith("1")
        & F.col("p_retailprice").isNotNull()
    ).select("p_partkey", "p_name", "p_brand", "p_type", "p_size")


# ---------------------------------------------------------------------------
# q_dedup_exact — deterministic exact dedup on a normalized key (R6/R7/R12).
# ---------------------------------------------------------------------------

_Q_DEDUP_EXACT_ORACLE = """
SELECT c_nationkey, segment_norm, c_custkey, c_acctbal
FROM (
  SELECT c_nationkey, lower(c_mktsegment) AS segment_norm, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_nationkey, lower(c_mktsegment)
                            ORDER BY c_custkey) AS rn
  FROM customer
) WHERE rn = 1
"""


@query("q_dedup_exact", oracle=_Q_DEDUP_EXACT_ORACLE)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a case-normalized key, keeping the lowest id —
    the deterministic form of the reference's membership dedup
    (`Batch Processor.py:231, 263-266`, normcase compare `:370`).
    `dropDuplicates` keeps an arbitrary row, so the oracle-stable
    implementation is row_number()=1 over an explicit ordering.

    Scale notes: one hash-partition shuffle on the dedup key; at
    100 TB this is the canonical dedup shuffle (AQE coalesces).
    """
    cust = load(spark, sf_dir, "customer")
    w = (Window.partitionBy("c_nationkey", F.lower("c_mktsegment"))
               .orderBy("c_custkey"))
    return (
        cust.withColumn("segment_norm", F.lower("c_mktsegment"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_nationkey", "segment_norm", "c_custkey", "c_acctbal")
    )


# ---------------------------------------------------------------------------
# q_pipeline_chain — the reference's signature: ordered stage composition.
# ---------------------------------------------------------------------------

_Q_PIPELINE_CHAIN_ORACLE = """
WITH filtered AS (
  SELECT * FROM lineitem WHERE l_shipdate < TIMESTAMP '2000-01-01 00:00:00'
), derived AS (
  SELECT *,
    CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS DOUBLE)
      AS gross_price
  FROM filtered
), cleaned AS (
  SELECT * FROM derived WHERE l_quantity > 0 AND gross_price > 0
)
SELECT l_returnflag,
       COUNT(*) AS n_items,
       CAST(ROUND(SUM(CAST(gross_price AS DECIMAL(18,4))), 2) AS DOUBLE)
         AS sum_gross
FROM cleaned
GROUP BY l_returnflag
"""


@query("q_pipeline_chain", oracle=_Q_PIPELINE_CHAIN_ORACLE)
def q_pipeline_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered multi-stage transform chain (filter -> derive ->
    cleanup -> aggregate) composed through the Pipeline abstraction —
    the engine's re-expression of the reference's core dataflow
    (`Batch Processor.py:304-310, 334-349`, SURVEY.md §1.2/R13/R14),
    including a disabled stage that must be skipped (R8).

    Scale notes: the whole chain is ONE Catalyst plan — filters fuse
    and push to the scan; only the final groupBy shuffles.
    """
    from lisp_batch_processor_spark.pipeline import Pipeline

    gross = (F.col("l_extendedprice") * (1 - F.col("l_discount")))
    p = Pipeline()
    p.add("filter_recent",
          lambda df: df.filter(F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp")))
    p.add("derive_gross",
          lambda df: df.withColumn(
              "gross_price", gross.cast("decimal(18,4)").cast("double")))
    p.add("drop_everything", lambda df: df.limit(0), enabled=False)  # must be skipped
    p.add("cleanup",
          lambda df: df.filter((F.col("l_quantity") > 0) & (F.col("gross_price") > 0)))
    p.add("rollup",
          lambda df: df.groupBy("l_returnflag").agg(
              F.count(F.lit(1)).alias("n_items"),
              dsum("gross_price", 4).alias("sum_gross")))
    return p.apply(load(spark, sf_dir, "lineitem"))


# ---------------------------------------------------------------------------
# q_sort_limit — global order + top-k.
# ---------------------------------------------------------------------------

_Q_SORT_LIMIT_ORACLE = """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 100
"""


@query("q_sort_limit", oracle=_Q_SORT_LIMIT_ORACLE)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k with a deterministic (unique) tie-break.

    Scale notes: Catalyst plans this as TakeOrderedAndProject —
    per-partition top-100 then a 100-row merge on the driver, NOT a
    full sort; this is the plan that survives 100 TB.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(),
                 F.col("l_orderkey").asc(),
                 F.col("l_linenumber").asc())
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q_set_ops — union / intersect / except over key sets (R6/R7 as set algebra).
# ---------------------------------------------------------------------------

_Q_SET_OPS_ORACLE = """
SELECT 'customer_with_order' AS tag, key FROM (
  SELECT c_custkey AS key FROM customer
  INTERSECT
  SELECT o_custkey AS key FROM orders
)
UNION ALL
SELECT 'customer_without_order' AS tag, key FROM (
  SELECT c_custkey AS key FROM customer
  EXCEPT
  SELECT o_custkey AS key FROM orders
)
"""


@query("q_set_ops", oracle=_Q_SET_OPS_ORACLE)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set algebra (INTERSECT / EXCEPT / UNION ALL) over key sets —
    the relational generalization of the reference's membership
    dedup (`Batch Processor.py:231, 263-266`).

    Scale notes: intersect/except hash-partition both sides on the
    key; the final union is plan-level only (no extra shuffle).
    """
    cust = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("key"))
    orders = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("key"))
    with_order = cust.intersect(orders).select(
        F.lit("customer_with_order").alias("tag"), "key")
    without_order = cust.exceptAll(orders.distinct()).distinct().select(
        F.lit("customer_without_order").alias("tag"), "key")
    return with_order.unionAll(without_order)


# ---------------------------------------------------------------------------
# q_join_inner — multi-way equi join with broadcast dims (ebind analog R26).
# ---------------------------------------------------------------------------

_Q_JOIN_INNER_ORACLE = """
SELECT
  r_name AS region_name,
  n_name AS nation_name,
  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))),
       2) AS DOUBLE) AS revenue,
  COUNT(DISTINCT o_orderkey) AS n_orders,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY r_name, n_name
"""


@query("q_join_inner", oracle=_Q_JOIN_INNER_ORACLE)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way equi inner join lineitem⋈orders⋈customer⋈nation⋈region
    with revenue rollup — the relational materialization the
    reference's xref-bind approximates (`lisp/ebind.lsp:4`, R26).

    Scale notes: nation/region are bounded dims -> explicit broadcast
    (no shuffle); lineitem⋈orders and ⋈customer are shuffle joins on
    their keys — at 100 TB these co-partition on l_orderkey/o_custkey
    and AQE handles skew; date filter pushes into the orders scan.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")))
    cust = load(spark, sf_dir, "customer")
    nation = load_broadcast(spark, sf_dir, "nation")
    region = load_broadcast(spark, sf_dir, "region")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"),
                 F.col("n_name").alias("nation_name"))
        .agg(
            dsum(disc_price, 4).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# q_join_semi_anti — EXISTS / NOT EXISTS as semi/anti joins (R6 as anti-join).
# ---------------------------------------------------------------------------

_Q_JOIN_SEMI_ANTI_ORACLE = """
SELECT 'has_orders' AS tag, c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
UNION ALL
SELECT 'no_orders' AS tag, c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


@query("q_join_semi_anti", oracle=_Q_JOIN_SEMI_ANTI_ORACLE)
def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi and left-anti joins (EXISTS / NOT EXISTS) — the
    set-membership semantics behind the reference's dedup-on-insert
    (`Batch Processor.py:231`), expressed relationally.

    Scale notes: semi/anti joins shuffle only the join key + payload
    of the probe side and never duplicate matches; the orders side
    reduces to its distinct key set.
    """
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    cond = cust.c_custkey == orders.o_custkey
    semi = cust.join(orders, cond, "left_semi").select(
        F.lit("has_orders").alias("tag"), "c_custkey", "c_name")
    anti = cust.join(orders, cond, "left_anti").select(
        F.lit("no_orders").alias("tag"), "c_custkey", "c_name")
    return semi.unionAll(anti)


# ---------------------------------------------------------------------------
# q_agg_distinct — distinct aggregation.
# ---------------------------------------------------------------------------

_Q_AGG_DISTINCT_ORACLE = """
SELECT
  o_orderpriority,
  COUNT(*) AS n_orders,
  COUNT(DISTINCT o_custkey) AS n_customers,
  COUNT(DISTINCT o_orderstatus) AS n_statuses,
  string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
  arg_min(o_totalprice, o_orderkey) AS first_key_price,
  arg_max(o_totalprice, o_orderkey) AS last_key_price
FROM orders
GROUP BY o_orderpriority
"""


@query("q_agg_distinct", oracle=_Q_AGG_DISTINCT_ORACLE)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct + collection/arg-extrema aggregation (exact): distinct
    counts, sorted distinct string aggregation (collect_set ->
    array_sort -> join, the deterministic form of listagg), and
    min_by/max_by keyed on the unique order key (deterministic by
    construction; keying arg-extrema on a non-unique column is a
    correctness bug this query deliberately avoids). The approximate
    variant (approx_count_distinct / HLL) is exercised in
    q_agg_approx, which has no SQL oracle by construction.

    (Round 3: absorbed the former q_agg_collect — same table, same
    group key — so the whole registry fits the driver's 50-query
    correctness window.)

    Scale notes: Spark plans multi-distinct with an expand +
    two-phase aggregate; collect_set is bounded by the value domain
    (statuses here) — never collect an unbounded column per group at
    100 TB; the group key is low-cardinality so the final shuffle is
    tiny at any scale.
    """
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        # n_statuses derives from the SAME collect_set the statuses
        # string already aggregates (round 13): size(collect_set) ==
        # countDistinct (both skip nulls), and dropping the second
        # countDistinct removes one branch from the multi-distinct
        # Expand — the shuffle carries 2x each row instead of 3x.
        # Interleaved A/B: -40 % median on the query.
        # (cast: size() is int, countDistinct was bigint — the oracle
        # checks the schema too.)
        F.size(F.collect_set("o_orderstatus")).cast("long")
         .alias("n_statuses"),
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",")
         .alias("statuses"),
        # Arg-extrema over NON-NULL prices (DuckDB's arg_min/arg_max
        # skip null values; Spark's min_by would return the null):
        # nulling the ORDERING key for null-price rows makes min_by
        # skip them — Spark's Min/MaxBy ignores null orderings — so
        # both engines return the price at the extreme key among
        # rows that HAVE a price. Fuzz-pinned (null prices).
        F.min_by("o_totalprice",
                 F.when(F.col("o_totalprice").isNotNull(),
                        F.col("o_orderkey"))).alias("first_key_price"),
        F.max_by("o_totalprice",
                 F.when(F.col("o_totalprice").isNotNull(),
                        F.col("o_orderkey"))).alias("last_key_price"),
    )


@query("q_agg_approx")
def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregation tier — the 100 TB scale path where the
    exact variants need a full shuffle or a per-group sort:
    approx_count_distinct (HyperLogLog++) and percentile_approx
    (Greenwald-Khanna). rows-only check: sketch estimates are
    engine-specific by design (exact twins with oracles:
    q_agg_distinct, q_agg_quantiles).
    """
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("approx_customers"),
        F.percentile_approx("o_totalprice", 0.5, 1000).alias("approx_median"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# NULL prices are excluded BEFORE ranking (the standard percentile
# convention — every SQL percentile function ignores NULLs). Without
# the filter the engines disagree on where NULLs sort (Spark ASC is
# NULLS FIRST, DuckDB is NULLS LAST), shifting every rank — caught by
# the randomized fuzz; n_orders counts ranked (non-null) rows.
_Q_AGG_QUANTILES_ORACLE = """
WITH r AS (
  SELECT o_orderpriority, o_totalprice,
    row_number() OVER (PARTITION BY o_orderpriority
                       ORDER BY o_totalprice, o_orderkey) AS rn,
    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
  WHERE o_totalprice IS NOT NULL
)
SELECT o_orderpriority,
  MAX(CASE WHEN rn = (n + 3) // 4 THEN o_totalprice END) AS p25,
  MAX(CASE WHEN rn = (n + 1) // 2 THEN o_totalprice END) AS p50,
  MAX(CASE WHEN rn = (3*n + 3) // 4 THEN o_totalprice END) AS p75,
  MAX(CASE WHEN rn = (19*n + 19) // 20 THEN o_totalprice END) AS p95,
  MAX(n) AS n_orders
FROM r GROUP BY o_orderpriority
"""


@query("q_agg_quantiles", oracle=_Q_AGG_QUANTILES_ORACLE)
def q_agg_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group quantiles (p25/p50/p75/p95) by discrete rank
    selection: value at row_number == ceil(p*n) under a total order.
    Selection — not interpolation — so the outputs are actual data
    values and hash-exact across engines (interpolated percentile
    arithmetic is engine-specific at the ULP level).

    Scale notes: one shuffle on the group key serves both windows and
    the final agg; the per-group sort is the inherent cost of exact
    quantiles — at 100 TB switch to approx_percentile (the
    q_agg_approx tier) or t-digest sketches.
    """
    # NULL prices excluded before ranking (standard percentile
    # semantics; also the only cross-engine-stable choice — Spark
    # sorts NULLS FIRST ascending, DuckDB NULLS LAST).
    orders = (load(spark, sf_dir, "orders")
              .filter(F.col("o_totalprice").isNotNull()))
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey")
    wn = Window.partitionBy("o_orderpriority")
    r = orders.select(
        "o_orderpriority", "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"))

    def at(num: int, den: int):
        # ceil(num*n/den) = (num*n + den-1) div den, integer-exact.
        k = F.expr(f"({num}*n + {den - 1}) div {den}")
        return F.max(F.when(F.col("rn") == k, F.col("o_totalprice")))

    return r.groupBy("o_orderpriority").agg(
        at(1, 4).alias("p25"),
        at(1, 2).alias("p50"),
        at(3, 4).alias("p75"),
        at(19, 20).alias("p95"),
        F.max("n").alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# q_rollup_cube — the GROUPING SETS family: CUBE ⊇ ROLLUP in one pass.
# ---------------------------------------------------------------------------

_Q_ROLLUP_CUBE_ORACLE = """
SELECT
  COALESCE(r_name, 'ALL') AS region_name,
  COALESCE(n_name, 'ALL') AS nation_name,
  COUNT(*) AS n_customers,
  CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY CUBE(r_name, n_name)
"""


@query("q_rollup_cube", oracle=_Q_ROLLUP_CUBE_ORACLE)
def q_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS family over the region->nation dimension pair:
    CUBE(r_name, n_name) emits all four grouping sets — the three
    ROLLUP hierarchy levels (region+nation, region subtotal, grand
    total) plus the cross-dimension nation-only slice (no reference
    counterpart, SURVEY.md §2.B).

    (Round 3: absorbed the former q_cube — CUBE strictly contains
    ROLLUP's sets, so one query covers the whole family and the
    registry fits the driver's 50-query correctness window.)

    Scale notes: cube expands each row to 4 grouping sets before the
    aggregate — partial aggregation keeps the shuffle at 4×|groups|,
    not 4×|rows|.
    """
    cust = load(spark, sf_dir, "customer")
    nation = load_broadcast(spark, sf_dir, "nation")
    region = load_broadcast(spark, sf_dir, "region")
    joined = (cust
              .join(nation, cust.c_nationkey == nation.n_nationkey)
              .join(region, nation.n_regionkey == region.r_regionkey))
    return (
        joined.cube("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"),
             dsum("c_acctbal", 2).alias("sum_acctbal"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n_customers", "sum_acctbal",
        )
    )


# ---------------------------------------------------------------------------
# q_window_rank — top-k per group via ranking window.
# ---------------------------------------------------------------------------

_Q_WINDOW_RANK_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3
"""


@query("q_window_rank", oracle=_Q_WINDOW_RANK_ORACLE)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via a ranking window with a unique
    tie-break (order-sensitivity generalizing R14).

    Scale notes: Spark's WindowGroupLimit pushes rn<=3 below the
    shuffle (per-partition top-k before exchange) — verified via
    explain(); no full per-group sort materializes.
    """
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        orders.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
# q_window_running — running totals / moving averages / RANGE frames.
# ---------------------------------------------------------------------------

RANGE_FRAME_US = 3_600_000_000  # 1 hour in microseconds

_Q_WINDOW_RUNNING_ORACLE = f"""
WITH t AS (
  SELECT user_id, event_id,
    SUM(CAST(value AS DECIMAL(18,2))) OVER wrun AS rsum,
    CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER wmov * 100 AS BIGINT)
      AS mcents,
    COUNT(*) OVER wmov AS mcnt,
    CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))) OVER whour, 2) AS DOUBLE)
      AS hour_sum,
    CAST(COUNT(*) OVER whour AS BIGINT) AS hour_n
  FROM events
  WINDOW
    wrun AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    wmov AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
    whour AS (PARTITION BY user_id ORDER BY epoch_us(ts)
              RANGE BETWEEN {RANGE_FRAME_US} PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id,
  CAST(ROUND(rsum, 2) AS DOUBLE) AS running_value,
  CAST((2000000 * mcents + 100 * mcnt) // (200 * mcnt) AS BIGINT) / 1000000
    AS moving_avg3,
  hour_sum, hour_n
FROM t
"""


@query("q_window_running", oracle=_Q_WINDOW_RUNNING_ORACLE)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame family per user over event time: running total
    (ROWS unbounded-preceding), 3-row moving average (ROWS 2
    preceding), and trailing-hour sum/count via a RANGE (value-based)
    frame over epoch micros — the frame shape ROWS cannot express.
    Generalizes the reference's monotone progress ratio R18
    (`Batch Processor.py:420-425`). RANGE includes all order-value
    peers, so duplicate timestamps give identical results in both
    engines regardless of tie order.

    (Round 3: absorbed the former q_window_range_frame — same grain,
    one row per event — so the registry fits the driver's 50-query
    correctness window.)

    Scale notes: one shuffle on user_id serves every frame (same
    partitioning); frames are streaming (bounded memory) — holds at
    any event count/user.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = w.rowsBetween(-2, Window.currentRow)
    hour = (Window.partitionBy("user_id").orderBy(F.unix_micros("ts"))
            .rangeBetween(-RANGE_FRAME_US, 0))
    vdec = F.col("value").cast("decimal(18,2)")
    # Exact paths (functions/numeric rationale): running total rounds
    # in decimal; the moving average is an integer round-half-up in
    # cents — both bit-identical to the DuckDB oracle.
    t = ev.select(
        "user_id", "event_id",
        F.sum(vdec).over(run).alias("rsum"),
        (F.sum(vdec).over(mov) * 100).cast("bigint").alias("mcents"),
        F.count(F.lit(1)).over(mov).alias("mcnt"),
        F.round(F.sum(vdec).over(hour), 2).cast("double").alias("hour_sum"),
        F.count(F.lit(1)).over(hour).alias("hour_n"),
    )
    return t.select(
        "user_id", "event_id",
        F.round("rsum", 2).cast("double").alias("running_value"),
        (F.expr("(2000000 * mcents + 100 * mcnt) div (200 * mcnt)")
         / F.lit(1_000_000)).alias("moving_avg3"),
        "hour_sum", "hour_n",
    )
