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

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Bounded at any scale factor -> always broadcast-safe.
BOUNDED_DIMS = frozenset({"region", "nation"})


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table; parquet gives pushdown + pruning for free.

    `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    read natively; we read it as raw nanos (legacy conf) and truncate
    to microseconds with integer division — the same floor-truncation
    DuckDB applies when it casts ns parquet to its µs TIMESTAMP, so
    the two engines see identical values. (Float division would lose
    precision: epoch-nanos exceed double's 53-bit mantissa.)
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_broadcast(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a bounded dimension with an explicit broadcast hint."""
    df = load(spark, sf_dir, name)
    return F.broadcast(df) if name in BOUNDED_DIMS else df


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture as a temp view for SQL-form queries."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
