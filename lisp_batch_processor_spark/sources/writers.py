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


def compact(spark: SparkSession, path: str,
            target_file_bytes: int = 128 * 1024 * 1024,
            fmt: str = "parquet") -> int:
    """Rewrite a dataset into files of ~``target_file_bytes`` each —
    the standard table-maintenance pass for incremental pipelines.
    Every micro-batch/append-style writer (streaming_near_dup_ingest,
    overwrite_partitions_dynamic per-day reruns) accretes small
    files, and at 100 TB a million 1 MB files costs more in listing,
    open() round-trips, and lost column-chunk locality than the data
    itself; readers want files near the HDFS-block/row-group sweet
    spot. Returns the number of files written.

    File count = ceil(on-disk bytes / target): sized from the data's
    COMPRESSED footprint (Hadoop FS listing, driver-side metadata
    only — no data pass), so the output lands near the target
    regardless of the input's compression ratio. The rewrite is one
    round-robin repartition (no key skew possible) and one write
    through Spark's commit protocol, staged to a sibling temp dir
    and swapped in only after the job commits — a failed compaction
    leaves the original intact.

    Scale notes: compact PER PARTITION DIRECTORY (pass the partition
    path) on a schedule, not the whole table at once — the rewrite
    reads and writes the full partition, so this is a bandwidth
    pass; the win is paid back by every subsequent read. For
    bucketed tables, compact via write_bucketed instead (bucket
    count fixes file count; plain repartition would destroy bucket
    metadata).
    """
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(conf)
    size = fs.getContentSummary(jpath).getLength()
    n_files = max(1, -(-size // target_file_bytes))
    df = spark.read.format(fmt).load(path)
    tmp = path.rstrip("/") + "._compacting"
    (df.repartition(n_files)
       .write.mode("overwrite").format(fmt).save(tmp))
    jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
    fs.delete(jpath, True)
    fs.rename(jtmp, jpath)
    return n_files


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
