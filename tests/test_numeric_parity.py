"""Differential micro-tests for the portable-numerics layer
(functions/numeric.py): the same batch of adversarial values pushed
through Spark AND DuckDB must match bit-for-bit, because every
oracle's hash-exactness rests on exactly these helpers. Unlike the
operator-level gate (scripts/check_correctness.py), these isolate the
numeric conventions on inputs CHOSEN to break naive rounding — .5
ties at the rounding digit, shortest-repr traps like 2.675, permuted
summation order."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from lisp_batch_processor_spark.functions.numeric import (
    dratio,
    dround,
    dsum,
    sql_dratio,
    sql_dround,
    sql_dsum,
    sql_isum,
)


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def _write(tmp_path, name, cols: dict) -> str:
    p = str(tmp_path / f"{name}.parquet")
    pq.write_table(pa.table(cols), p)
    return p


def test_dround_parity_with_duckdb(spark, tmp_path, duck):
    rng = np.random.default_rng(3)
    # Known double-ROUND landmines (shortest-repr ties at the target
    # digit) plus a broad random sweep.
    vals = [0.125, 0.1234565, 2.675, 1.0050000000000001, 0.5,
            1e-7, 123456.789, 0.9999995, 0.0000005]
    vals += [float(x) for x in rng.uniform(0, 1000, 5000)]
    vals += [float(x) for x in rng.uniform(0, 1, 5000)]
    p = _write(tmp_path, "dround", {"x": pa.array(vals, pa.float64())})
    got = sorted(r.r for r in spark.read.parquet(p)
                 .select(dround(F.col("x"), 6).alias("r")).collect())
    want = sorted(r[0] for r in duck.execute(
        f"SELECT {sql_dround('x', 6)} AS r FROM read_parquet('{p}')"
    ).fetchall())
    assert got == want  # exact float equality, not approx


def test_dsum_order_insensitive_and_parity(spark, tmp_path, duck):
    rng = np.random.default_rng(11)
    # 2-decimal money-like values — the fixture contract dsum serves.
    vals = [round(float(x), 2) for x in rng.uniform(0, 10000, 20000)]
    p = _write(tmp_path, "dsum", {"x": pa.array(vals, pa.float64())})
    base = spark.read.parquet(p)
    # Three different physical orders must give one bit-identical sum.
    sums = set()
    for df in (base, base.repartition(7), base.sort(F.col("x").desc())):
        sums.add(df.agg(dsum("x", 2).alias("s")).collect()[0].s)
    assert len(sums) == 1
    want = duck.execute(
        f"SELECT {sql_dsum('x', 2)} AS s FROM read_parquet('{p}')"
    ).fetchone()[0]
    assert sums == {want}


def test_dratio_parity_and_half_up(spark, tmp_path, duck):
    rng = np.random.default_rng(7)
    nums = [int(x) for x in rng.integers(0, 10**9, 5000)]
    dens = [int(x) for x in rng.integers(1, 10**6, 5000)]
    # Exact .5-at-digit-6 ties: num/den = k + 0.0000005 exactly.
    nums += [1, 3, 5]
    dens += [2 * 10**6, 2 * 10**6, 2 * 10**6]
    p = _write(tmp_path, "dratio", {"num": pa.array(nums, pa.int64()),
                                    "den": pa.array(dens, pa.int64())})
    got = [r.r for r in spark.read.parquet(p)
           .select(dratio("num", "den", 6).alias("r")).collect()]
    want = [r[0] for r in duck.execute(
        f"SELECT {sql_dratio('num', 'den', 6)} AS r "
        f"FROM read_parquet('{p}')").fetchall()]
    assert sorted(got) == sorted(want)
    # Half-up on the constructed tie: 1/2e6 rounds UP to 1e-6.
    tie = spark.createDataFrame([(1, 2 * 10**6)], "num long, den long") \
        .select(dratio("num", "den", 6).alias("r")).collect()[0].r
    assert tie == 1e-6


def test_sql_isum_pins_pandas_int64(duck, tmp_path):
    """The q_event_sessionize lesson as a unit test: a plain SUM(int)
    canonicalizes to float64 via pandas (HUGEINT), sql_isum to int64."""
    p = _write(tmp_path, "isum", {"g": pa.array([1, 1, 2], pa.int64()),
                                  "x": pa.array([1, 2, 3], pa.int64())})
    plain = duck.execute(
        f"SELECT g, SUM(x) AS s FROM read_parquet('{p}') GROUP BY g").df()
    pinned = duck.execute(
        f"SELECT g, {sql_isum('x')} AS s FROM read_parquet('{p}') GROUP BY g"
    ).df()
    assert str(plain["s"].dtype) == "float64"  # the bug class
    assert str(pinned["s"].dtype) == "int64"   # the convention
