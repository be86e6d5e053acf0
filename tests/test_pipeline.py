"""Pipeline abstraction tests — order-sensitivity, enable/disable,
dedup-on-add (reference semantics R13/R14, SURVEY.md §1.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lisp_batch_processor_spark.pipeline import Pipeline


def _base(spark):
    return spark.range(10).withColumnRenamed("id", "x")


def test_stages_compose_in_order(spark):
    # (x+1)*2 vs x*2+1 — a non-commutative chain must respect order.
    p = Pipeline()
    p.add("inc", lambda df: df.withColumn("x", F.col("x") + 1))
    p.add("dbl", lambda df: df.withColumn("x", F.col("x") * 2))
    got = [r.x for r in p.apply(_base(spark)).orderBy("x").collect()]
    assert got == [(i + 1) * 2 for i in range(10)]

    p.move_up("dbl")
    got = [r.x for r in p.apply(_base(spark)).orderBy("x").collect()]
    assert got == [i * 2 + 1 for i in range(10)]


def test_disabled_stage_skipped(spark):
    p = Pipeline()
    p.add("inc", lambda df: df.withColumn("x", F.col("x") + 1))
    p.set_enabled("inc", False)
    got = [r.x for r in p.apply(_base(spark)).orderBy("x").collect()]
    assert got == list(range(10))
    p.remove_disabled()
    assert p.stages == []


def test_dedup_on_add(spark):
    p = Pipeline()
    p.add("inc", lambda df: df.withColumn("x", F.col("x") + 1))
    p.add("inc", lambda df: df.withColumn("x", F.col("x") + 100))
    assert len(p.stages) == 1
    got = [r.x for r in p.apply(_base(spark)).orderBy("x").collect()]
    assert got == list(range(1, 11))


def test_move_down_and_single_plan(spark):
    p = Pipeline()
    p.add("a", lambda df: df.withColumn("x", F.col("x") * 3))
    p.add("b", lambda df: df.filter(F.col("x") > 9))
    p.move_down("a")  # filter first, then scale
    got = sorted(r.x for r in p.apply(_base(spark)).collect())
    assert got == []  # x in 0..9 -> nothing > 9 before scaling
