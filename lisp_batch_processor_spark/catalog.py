"""Table catalog over the driver's parquet fixtures (TESTDATA.md).

Generalizes the reference's ingest surface (``Batch Processor.py:53-60,
228-244`` — directory scan / explicit path-list / incremental append)
to ``spark.read.parquet`` with schema-on-read. Dimension tables that
are *bounded* regardless of scale factor (region=5, nation=25 rows at
every SF, as in TPC-H) are safe to broadcast unconditionally; scaling
tables are left to AQE's size-based broadcast decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Bounded at any scale factor -> always broadcast-safe.
BOUNDED_DIMS = frozenset({"region", "nation"})


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize `events.ts` to session-TZ TimestampType regardless of
    how the fixture was written. Generations of the driver's fixtures
    differ: TIMESTAMP(NANOS) (read as raw-nanos BIGINT under the
    legacy conf, then floor-truncated to µs — the same truncation
    DuckDB applies casting ns to its µs TIMESTAMP; integer division
    because epoch-nanos exceed double's 53-bit mantissa) vs
    TIMESTAMP(MICROS) without UTC adjustment (read natively as
    TIMESTAMP_NTZ; a plain cast is value-preserving under the
    engine's fixed UTC session TZ, session.py). Schema-adaptive so
    either vintage of the fixture loads identically.
    """
    t = df.schema["ts"].dataType
    if isinstance(t, LongType):        # raw nanos via legacy conf
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if isinstance(t, TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df                          # already TimestampType


def read_parquet_nanos_ok(spark: SparkSession, *paths: str) -> DataFrame:
    """``spark.read.parquet`` that also accepts legacy TIMESTAMP(NANOS)
    files (read as raw-nanos BIGINT, the
    ``spark.sql.legacy.parquet.nanosAsLong`` behavior) WITHOUT mutating
    session state: the plain read is tried first — current fixtures are
    TIMESTAMP(MICROS) and never enter the fallback — and only when it
    fails with PARQUET_TYPE_ILLEGAL is the legacy conf set around the
    one read call and restored to its previous value immediately after.
    The illegal-type check is analysis-time only (the resolved LongType
    schema is captured in the plan; execution after the restore
    verified in tests), so the restore cannot break the returned
    frame's later execution, and no concurrent reader in the session
    ever observes the conf flipped."""
    try:
        return spark.read.parquet(*paths)
    except Exception as e:  # AnalysisException: nanos without the conf
        if "PARQUET_TYPE_ILLEGAL" not in str(e):
            raise
    key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    try:
        return spark.read.parquet(*paths)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table; parquet gives pushdown + pruning for
    free. `events.ts` is normalized via normalize_event_ts (fixture
    vintages differ in physical timestamp type)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        df = read_parquet_nanos_ok(spark, f"{sf_dir}/{name}.parquet")
        return normalize_event_ts(df)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_broadcast(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a bounded dimension with an explicit broadcast hint."""
    df = load(spark, sf_dir, name)
    return F.broadcast(df) if name in BOUNDED_DIMS else df


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture as a temp view for SQL-form queries."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def fan_out_small_scan(df: DataFrame, spark: SparkSession,
                       floor: int | None = None) -> DataFrame:
    """Spread a scan across the box when the input has fewer splits
    than cores. A fixture-sized parquet file (one row group) scans as
    ONE task, so a broadcast-join probe straight off the scan runs
    serially no matter how wide the box is — the pair stages of the
    embedding dedup measured 1-task at sf0.1 for exactly this reason.

    Gated: only repartitions when the observed split count is below
    ``floor`` (default: defaultParallelism), so at production scale —
    where inputs always have many splits — this is a no-op and adds
    no shuffle. The explicit numPartitions keeps AQE from coalescing
    the tiny shuffle back down to one partition (coalescing is
    size-based and fixture data is far below the advisory size).
    """
    floor = floor or spark.sparkContext.defaultParallelism
    n = df.rdd.getNumPartitions()
    return df.repartition(floor) if n < floor else df
