"""Mergeable-sketch rollups — the incremental-analytics pattern that
makes "distinct users per X" affordable at 100 TB.

Exact COUNT(DISTINCT) over a petabyte re-shuffles the key universe
on every question. The production pattern is to aggregate each
partition/day/batch ONCE into a binary Datasketches HLL sketch,
PERSIST the sketches (kilobytes each), and answer every subsequent
rollup — any grouping, any date range, all-time — by merging
sketches instead of touching rows. Merging is associative and
lossless w.r.t. the sketch, so daily sketches roll up to monthly to
all-time with no re-scan; that is what `approx_count_distinct`
(a one-shot estimate) cannot do.

This generalizes the reference's running success counters
(`Batch Processor.py:85, 312`, R16-R18) to the distinct-counting
regime: keep a tiny mergeable summary per unit of work, combine
summaries for the report.

Engine note: sketch BYTES are Datasketches-implementation-specific
(engine-portable across Spark/Druid/Hive/DuckDB-with-extension, but
not hash-replayable in plain SQL), so these ship as library
operators with property tests — estimates vs exact within the
published HLL error bound — rather than driver-gate hash oracles,
the same rows-only stance as q_agg_approx.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# log2(k) for the HLL sketch: 12 -> 4096 buckets, ~1.6% relative
# standard error, ~2 KB per sketch — the standard accuracy/size
# trade-off point.
LG_K = 12


def hll_build(df: DataFrame, keys: Sequence[str], col: str,
              lg_k: int = LG_K) -> DataFrame:
    """One binary HLL sketch of ``col``'s distinct values per
    ``keys`` group: ``keys... , sketch``. This is the scan that runs
    ONCE per batch/partition/day; persist its output next to the
    data. Map-side partial aggregation applies — a billion rows per
    group reach the reducer as one sketch per map partition.
    """
    return (df.groupBy(*keys)
            .agg(F.hll_sketch_agg(F.col(col), F.lit(lg_k))
                 .alias("sketch")))


def hll_rollup(sketches: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Merge persisted sketches down to a coarser grouping (drop any
    columns not in ``keys`` first — e.g. daily → monthly by grouping
    on month): ``keys..., n_distinct``. No row data is touched; the
    shuffle carries kilobyte sketches.
    """
    out = (sketches.groupBy(*keys)
           .agg(F.hll_union_agg("sketch").alias("_merged")))
    return out.select(
        *keys, F.hll_sketch_estimate("_merged").alias("n_distinct"))


def hll_estimate(sketches: DataFrame) -> DataFrame:
    """Per-row estimate of an existing sketch column — the cheap
    read path for already-rolled-up sketch tables."""
    return sketches.withColumn(
        "n_distinct", F.hll_sketch_estimate("sketch"))
