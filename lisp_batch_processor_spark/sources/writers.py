"""Writers — the reference's sink surface, Spark-first.

The reference saves each file with QSAVE + CLOSE + a hand-rolled
poll-and-retry verify (`Batch Processor.py:347-374`, R22). Spark's
commit protocol (stage to _temporary, rename on task/job commit)
replaces all of that machinery; what remains worth engineering is
LAYOUT — partitioning and bucketing decide whether downstream reads
prune and whether downstream joins shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str,
                      partition_by: Sequence[str] = (),
                      mode: str = "overwrite",
                      fmt: str = "parquet") -> None:
    """Write with hive-style directory partitioning.

    Partition columns become directories (`col=value/`), so any
    downstream filter on them prunes at file-listing time — the write
    side of predicate pushdown. Keep partition cardinality bounded
    (dates, categories): a high-cardinality partition column means
    millions of tiny files at 100 TB.
    """
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_bucketed(df: DataFrame, table: str,
                   bucket_by: Sequence[str], n_buckets: int,
                   sort_by: Sequence[str] = (),
                   mode: str = "overwrite") -> None:
    """Write a bucketed (and optionally sorted) managed table.

    Two tables bucketed on the same key with the same bucket count
    join WITHOUT a shuffle — at 100 TB, pre-bucketing fact tables on
    their join key converts every recurring join's exchange into a
    local zip of bucket files. Requires saveAsTable (bucket metadata
    lives in the catalog, not the files).
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def overwrite_partitions_dynamic(spark: SparkSession, df: DataFrame,
                                 path: str,
                                 partition_by: Sequence[str]) -> None:
    """Overwrite only the partitions present in `df` (dynamic
    partition overwrite) — the idempotent re-run primitive for
    incremental pipelines: reprocessing one day replaces that day's
    directory and touches nothing else.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (df.write.mode("overwrite").format("parquet")
     .partitionBy(*partition_by).save(path))
