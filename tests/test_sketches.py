"""HLL sketch rollups: merge-of-parts equals sketch-of-whole, and
estimates stay inside the published error bound of exact distinct
counts through a persist/reload cycle."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lisp_batch_processor_spark.operators.sketches import (
    LG_K, hll_build, hll_estimate, hll_rollup)


def _users(spark, day, start, n):
    return spark.range(start, start + n).select(
        F.lit(day).alias("day"),
        F.concat(F.lit("u"), F.col("id")).alias("user"))


def test_hll_rollup_matches_exact_within_bound(spark, tmp_path):
    # Three "days" with overlapping user populations.
    d0 = _users(spark, "d0", 0, 4000)
    d1 = _users(spark, "d1", 2000, 4000)   # 2000 overlap with d0
    d2 = _users(spark, "d2", 5000, 2000)   # 1000 overlap with d1
    events = d0.unionByName(d1).unionByName(d2)

    # Build per-day sketches once; persist and reload (the pattern
    # under test — sketches must survive parquet round-trips).
    path = os.path.join(str(tmp_path), "daily_sketches")
    hll_build(events, ["day"], "user").write.parquet(path)
    daily = spark.read.parquet(path)

    # Per-day estimates within ~1.6% rse (4 sigma slack).
    per_day = {r.day: r.n_distinct
               for r in hll_estimate(daily).collect()}
    for day, exact in (("d0", 4000), ("d1", 4000), ("d2", 2000)):
        assert abs(per_day[day] - exact) <= exact * 0.065, (day, per_day)

    # All-time rollup: merge the three persisted sketches — never
    # re-reading the events — and land within the bound of the true
    # union (7000 distinct users: 0..6999; d1 overlaps both).
    total = (hll_rollup(daily.withColumn("all", F.lit(1)), ["all"])
             .collect()[0].n_distinct)
    assert abs(total - 7000) <= 7000 * 0.065

    # Merge-of-parts == sketch-of-whole (identical estimate, not just
    # close: union of HLLs at the same lg_k is lossless w.r.t. the
    # sketch state for identical inputs).
    whole = (hll_build(events.withColumn("all", F.lit(1)), ["all"], "user")
             .select(F.hll_sketch_estimate("sketch").alias("e"))
             .collect()[0].e)
    assert total == whole

    # A coarser grouping without re-scan: weekend vs weekday style
    # regroup of the persisted daily sketches.
    grouped = hll_rollup(
        daily.withColumn("bucket",
                         F.when(F.col("day") == "d2", "small")
                          .otherwise("big")), ["bucket"])
    got = {r.bucket: r.n_distinct for r in grouped.collect()}
    assert abs(got["small"] - 2000) <= 2000 * 0.065
    assert abs(got["big"] - 6000) <= 6000 * 0.065
