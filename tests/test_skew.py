"""Salted join / two-phase agg: provably identical results to the
unsalted plans, on data with a deliberately hot key."""

from __future__ import annotations

from pyspark.sql import functions as F

from lisp_batch_processor_spark.operators.skew import (
    salted_join, two_phase_agg,
)


def _skewed(spark):
    # 90% of rows share key 0.
    rows = [(i, i % 10 if i % 10 else 0, float(i)) for i in range(1000)]
    hot = [(i + 1000, 0, float(i)) for i in range(2000)]
    return spark.createDataFrame(rows + hot, ["id", "k", "v"])


def test_salted_join_matches_plain_join(spark):
    left = _skewed(spark)
    right = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(10)], ["k", "name"])
    plain = left.join(right, ["k"]).select("id", "k", "v", "name")
    salted = salted_join(left, right, ["k"]).select("id", "k", "v", "name")
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, 10), (2, 20)], ["k", "v"])
    right = spark.createDataFrame([(1, "a")], ["k", "name"])
    out = salted_join(left, right, ["k"], how="left").collect()
    assert len(out) == 2
    assert {r.k: r.name for r in out} == {1: "a", 2: None}


def test_two_phase_agg_matches_plain_agg(spark):
    df = _skewed(spark)
    plain = df.groupBy("k").agg(
        F.sum("v").alias("sv"), F.count("v").alias("cv"),
        F.min("v").alias("mn"), F.max("v").alias("mx"))
    salted = two_phase_agg(df, ["k"], {
        "sv": ("sum", "v"), "cv": ("count", "v"),
        "mn": ("min", "v"), "mx": ("max", "v")})
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.select("k", "sv", "cv", "mn", "mx").collect()))
    assert a == b


def test_skew_stats_profiles_hot_keys(spark):
    from lisp_batch_processor_spark.operators.skew import skew_stats

    # 1000 rows on the hot key, 10 keys with 10 rows, one NULL key
    # with 50 — mean per key = 1150/12.
    df = (spark.range(1000).selectExpr("'hot' AS k")
          .unionByName(spark.range(100).selectExpr(
              "CAST(id % 10 AS STRING) AS k"))
          .unionByName(spark.range(50).selectExpr(
              "CAST(NULL AS STRING) AS k")))
    rows = skew_stats(df, ["k"], top_k=3).collect()
    assert [r.k for r in rows] == ["hot", None, "0"]
    hot = rows[0]
    assert hot.cnt == 1000
    assert hot.share == 1000 / 1150
    assert abs(hot.x_mean - 1000 * 12 / 1150) < 1e-9
    assert rows[1].cnt == 50  # NULL counts as a key
    import pytest as _pytest
    with _pytest.raises(ValueError, match="top_k"):
        skew_stats(df, ["k"], top_k=0)
