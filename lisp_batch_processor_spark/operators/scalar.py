"""Scalar function library + JSON/map extraction (SURVEY.md §2.C).

Generalizes the reference's tiny string-op surface (basename /
replace / normcase / endswith, `Batch Processor.py:233, 339, 370,
240` — R10-R12) and its JSON config round-trip (`:92, 97`) to the
full pyspark.sql.functions scalar library, kept JVM-side (whole-stage
codegen; no Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lisp_batch_processor_spark.catalog import load
from lisp_batch_processor_spark.functions.numeric import dround, sql_dround
from lisp_batch_processor_spark.registry import query

_Q_SCALAR_FUNCS_ORACLE = r"""
SELECT
  o_orderkey,
  CAST(year(o_orderdate) AS INT)    AS order_year,
  CAST(month(o_orderdate) AS INT)   AS order_month,
  CAST(quarter(o_orderdate) AS INT) AS order_quarter,
  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
  upper(o_orderstatus)              AS status_upper,
  substr(o_orderpriority, 1, 1)     AS priority_digit,
  regexp_extract(o_orderpriority, '^([0-9])-(.+)$', 2) AS priority_word,
  -- concat_ws, not concat('/'): Spark's concat_ws SKIPS null
  -- arguments (null status -> just the priority) while concat
  -- null-propagates in Spark and empty-strings in DuckDB — the
  -- randomized fuzz (null statuses) pinned the skip semantics.
  concat_ws('/', o_orderstatus, o_orderpriority) AS status_priority,
  CAST(length(o_orderpriority) AS INT) AS priority_len,
  replace(lower(o_orderpriority), ' ', '_') AS priority_slug,
  CAST(CAST(o_totalprice * 0.1 AS DECIMAL(18,4)) AS DOUBLE)
    AS price_tithe,
  CAST(ceil(o_totalprice) AS BIGINT)  AS price_ceil,
  CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
  {PRICE_SQRT}        AS price_sqrt,
  abs(o_totalprice) AS price_abs
FROM orders
""".replace("{PRICE_SQRT}", sql_dround("sqrt(o_totalprice)", 6))


@query("q_scalar_funcs", oracle=_Q_SCALAR_FUNCS_ORACLE)
def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String / date / math scalar derivations, all JVM-side built-ins
    (generalizes R10-R12). sqrt is IEEE-correctly-rounded so it is
    cross-engine exact; transcendental fns (ln/exp/pow) are kept out
    of oracle-compared outputs because libm results differ by ULPs.

    Case-mapping parity contract: upper()/lower() here keep their
    full SQL Unicode semantics (unlike the tokenizer's deliberate
    ascii_lower, text.py) — cross-engine hash parity therefore holds
    on the 1:1 case-mapping subset (all of ASCII and Latin-1, e.g.
    'ø'→'Ø', 'é'), and is NOT defined for special-casing characters
    (Turkish 'İ', 'ß'→'SS', ligatures) where Java's full mappings and
    utf8proc's simple mappings legitimately differ. Status/priority
    codes are machine-generated ASCII in any TPC-H-shaped schema, so
    the boundary is theoretical for this data model — documented, not
    papered over.

    Scale notes: narrow, codegen'd, zero shuffle at any scale.
    """
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd")
            .alias("month_start"),
        F.upper("o_orderstatus").alias("status_upper"),
        F.substring("o_orderpriority", 1, 1).alias("priority_digit"),
        F.regexp_extract("o_orderpriority", r"^([0-9])-(.+)$", 2)
            .alias("priority_word"),
        F.concat_ws("/", "o_orderstatus", "o_orderpriority")
            .alias("status_priority"),
        F.length("o_orderpriority").alias("priority_len"),
        F.replace(F.lower("o_orderpriority"), F.lit(" "), F.lit("_"))
            .alias("priority_slug"),
        (F.col("o_totalprice") * 0.1).cast("decimal(18,4)").cast("double")
            .alias("price_tithe"),
        F.ceil("o_totalprice").alias("price_ceil"),
        F.floor("o_totalprice").alias("price_floor"),
        dround(F.sqrt("o_totalprice"), 6).alias("price_sqrt"),
        F.abs("o_totalprice").alias("price_abs"),
    )


# json_valid guards: Spark's get_json_object is TOLERANT (malformed
# or empty JSON -> NULL) while DuckDB's json_extract_string ERRORS on
# malformed input — at 100 TB malformed props are a certainty, so the
# tolerant semantics are the contract and the oracle replays them
# (pinned by the randomized fuzz, which plants '', 'not json',
# truncated objects, JSON null, and array documents).
# A VALID document whose k is non-integer ('{"k": "abc"}',
# '{"k": 1.5}') must yield NULL, not a strict-cast error (Spark ANSI
# CAST and DuckDB CAST both throw) — and the two engines' tolerant
# parses ALSO differ: Spark's try_cast is strictly-integer (NULL for
# '1.5') while DuckDB's TRY_CAST parses-and-ROUNDS ('1.5' -> 2), so
# the oracle guards with an integer-shape regex to replay Spark's
# parse exactly. Overflowing integers null out in both.
_Q_JSON_MAP_ORACLE = """
WITH j AS (
  SELECT event_id,
    CASE WHEN json_valid(props)
         THEN json_extract_string(props, '$.k') END AS ks,
    CASE WHEN json_valid(props)
         THEN json_extract_string(props, '$.missing') END AS ms
  FROM events
), k AS (
  SELECT event_id, ms,
    CASE WHEN regexp_matches(trim(ks), '^[+-]?[0-9]+$')
         THEN TRY_CAST(trim(ks) AS INT) END AS k_val
  FROM j
)
SELECT event_id, k_val, k_val % 10 AS k_bucket,
       (ms IS NULL) AS missing_is_null
FROM k
"""


@query("q_json_map", oracle=_Q_JSON_MAP_ORACLE)
def q_json_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the `events.props` string column
    (generalizes the reference's JSON settings round-trip,
    `Batch Processor.py:87-97`), including absent-key null handling.

    Scale notes: get_json_object is a codegen'd JVM expression; at
    scale prefer from_json with an explicit schema once the shape is
    known (single parse, columnar downstream) — both shown in tests.
    """
    ev = load(spark, sf_dir, "events")
    # try_cast, not cast: under ANSI mode a plain cast CRASHES the
    # job on the first '{"k": "abc"}' — tolerant extraction means
    # tolerant parsing too (fuzz plants non-numeric k values).
    k = F.get_json_object("props", "$.k").try_cast("int")
    return ev.select(
        "event_id",
        k.alias("k_val"),
        (k % 10).alias("k_bucket"),
        F.get_json_object("props", "$.missing").isNull()
            .alias("missing_is_null"),
    )
