"""Readers — the reference's ingest surface, Spark-first.

Generalizes (SURVEY.md §2.A): the recursive directory scan with a
suffix predicate (`Batch Processor.py:53-60`, R1), explicit path-list
ingest (`:228-235`, R3), and incremental drag-and-drop append with
dedup-on-insert (`:237-244, 231`, R4/R6). The reference walks the
filesystem on the driver; here listing, filtering, and dedup are all
plan-side so a 100 TB directory tree never materializes driver-side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def scan_directory(spark: SparkSession, path: str, fmt: str = "parquet",
                   glob: str | None = None, recursive: bool = True,
                   schema: StructType | None = None) -> DataFrame:
    """Read every matching file under a directory tree.

    `pathGlobFilter` is the declarative twin of the reference's
    suffix predicate (R5): it prunes at file-listing time, before a
    single byte of data is read.
    """
    reader = spark.read.format(fmt)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def read_path_list(spark: SparkSession, paths: Sequence[str],
                   fmt: str = "parquet",
                   schema: StructType | None = None) -> DataFrame:
    """Read an explicit list of files (the file-dialog ingest, R3)."""
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(list(paths))


def incremental_append(existing: DataFrame, batch: DataFrame,
                       key: str | Sequence[str]) -> DataFrame:
    """Append a new batch, skipping rows whose key already exists —
    the reference's dedup-on-insert (`if file not in self.file_list`,
    R4/R6) as a left-anti join plus union.

    The batch also self-dedups first, so the result is key-unique if
    `existing` was. Scale notes: the anti join shuffles only the key
    columns of the (small) batch against existing's keys; when the
    batch is small Spark broadcasts it.
    """
    keys = [key] if isinstance(key, str) else list(key)
    fresh = (batch.dropDuplicates(keys)
             .join(existing.select(*keys), keys, "left_anti"))
    return existing.unionByName(fresh)


def with_ingest_metadata(df: DataFrame) -> DataFrame:
    """Attach source-file provenance columns — the engine's analog of
    the reference's per-file status tracking (R16-R18): every row
    knows which input file produced it.
    """
    return df.withColumn("_source_file", F.input_file_name())


def read_json_with_error_channel(
        spark: SparkSession, path: str, schema: str
) -> tuple[DataFrame, DataFrame]:
    """Read JSONL with malformed lines routed to an ERROR CHANNEL
    instead of silently dropped (DROPMALFORMED) or poisoning the
    batch (FAILFAST) — the reference's per-element fault tolerance
    (R19-R21: an element's failure is recorded and the batch
    continues) applied to ingestion. Returns (good, bad): `good`
    carries the caller's schema for rows that parsed; `bad` carries
    (raw_line, _source_file) for quarantine/replay — the audit trail
    R26 keeps.

    Implementation: one splittable TEXT scan + `from_json` per line —
    NOT the json source's corrupt-record column, which Spark refuses
    to query on its own (QUERY_ONLY_CORRUPT_RECORD_COLUMN: the
    documented workaround is caching the parsed frame, a non-starter
    at corpus scale). The corrupt-record field is declared inside
    the from_json struct instead, so "bad" is a narrow per-row
    predicate and both frames are projections of the same
    single-pass plan — no cache, no second scan, no shuffle. A
    half-parsed row (valid JSON missing fields) is GOOD
    with nulls — schema presence, not completeness, is the parse
    contract (stack `quality.q_quality_audit`-style rules for
    semantic validation); a non-object line (a bare number, a blank
    line) is bad, visibly, rather than silently dropped.

    Quarantine `bad` with its source file for targeted re-ingestion
    once the producer is fixed.
    """
    raw = (spark.read.text(path)
           .withColumn("_source_file", F.input_file_name()))
    # Malformed detection: from_json's PERMISSIVE mode can yield an
    # all-null struct (indistinguishable from a legitimately-null
    # record) for some malformed shapes, so the corrupt-record field
    # is declared IN the struct schema — a malformed line sets it to
    # the raw text; a wholly unparseable/blank line yields a NULL
    # struct. Either routes to `bad`.
    parsed = raw.withColumn(
        "_parsed",
        F.from_json(F.col("value"), f"{schema}, _ec_corrupt STRING",
                    {"mode": "PERMISSIVE",
                     "columnNameOfCorruptRecord": "_ec_corrupt"}))
    is_bad = (F.col("_parsed").isNull()
              | F.col("_parsed._ec_corrupt").isNotNull())
    good = (parsed.filter(~is_bad)
            .select("_parsed.*").drop("_ec_corrupt"))
    bad = (parsed.filter(is_bad)
           .select(F.col("value").alias("raw_line"), "_source_file"))
    return good, bad
