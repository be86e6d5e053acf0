"""Edge-case tests for the round-2 operators (the oracle gate covers
fixture-scale correctness; these pin the boundary semantics)."""

from __future__ import annotations

from pyspark.sql import types as T


def test_quantiles_single_row_group(spark, tmp_path):
    import os

    from lisp_batch_processor_spark.operators.relational import (
        q_agg_quantiles,
    )
    schema = T.StructType([
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_orderpriority", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
    ])
    rows = [(1, "solo", 42.0),
            (2, "pair", 10.0), (3, "pair", 30.0)]
    sf = os.path.join(str(tmp_path), "q")
    spark.createDataFrame(rows, schema).write.parquet(
        os.path.join(sf, "orders.parquet"))
    got = {r.o_orderpriority: r for r in q_agg_quantiles(spark, sf).collect()}
    # n=1: every quantile is the single value.
    assert (got["solo"].p25, got["solo"].p50,
            got["solo"].p75, got["solo"].p95) == (42.0,) * 4
    # n=2: ceil-rank selection -> p25/p50 pick rank 1, p75/p95 rank 2.
    assert (got["pair"].p25, got["pair"].p50) == (10.0, 10.0)
    assert (got["pair"].p75, got["pair"].p95) == (30.0, 30.0)


def test_editdist_identical_and_over_threshold(spark, tmp_path):
    import os

    from lisp_batch_processor_spark.operators.dedup import (
        MAX_EDIT_DIST, q_dedup_editdist,
    )
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("text", T.StringType()),
    ])
    base = "the quick brown fox jumps over the lazy dog " * 3
    rows = [
        (1, "s", base),
        (2, "s", base),                     # identical -> dist 0
        (3, "s", base.replace("quick", "quack")),  # tiny edit
        (4, "s", "z" * len(base)),          # same length, huge distance
        (5, "other", base),                 # different block: never paired
    ]
    sf = os.path.join(str(tmp_path), "e")
    spark.createDataFrame(rows, schema).write.parquet(
        os.path.join(sf, "documents.parquet"))
    got = {(r.doc_a, r.doc_b): r.dist
           for r in q_dedup_editdist(spark, sf).collect()}
    assert got[(1, 2)] == 0
    assert 0 < got[(1, 3)] <= MAX_EDIT_DIST
    assert (1, 4) not in got and (2, 4) not in got
    assert all(5 not in pair for pair in got)


def test_frames_cover_payload_exactly(spark, sf_dir):
    from lisp_batch_processor_spark.operators.multimodal import (
        FRAME_SIZE, FRAME_STRIDE, q_multimodal_frames,
    )
    rows = q_multimodal_frames(spark, sf_dir).collect()
    assert rows
    for r in rows[:200]:
        assert r.frame_idx % FRAME_STRIDE == 0
        assert r.frame_off == r.frame_idx * FRAME_SIZE
        assert 1 <= r.frame_len <= FRAME_SIZE
        assert len(r.frame_md5) == 32


def test_approx_aggregates_within_bounds_of_exact(spark, sf_dir):
    """q_agg_approx is the one rows-only analytics query (sketches are
    engine-specific); give it a correctness signal beyond "it runs":
    approx_count_distinct must land within its configured 2% rsd
    (generous 10% tolerance ~ 5 sigma) of q_agg_distinct's exact
    count, and percentile_approx(0.5, accuracy=1000) must return an
    actual data value whose rank is within the Greenwald-Khanna bound
    of the true median rank."""
    import math
    from collections import defaultdict

    from lisp_batch_processor_spark.catalog import load
    from lisp_batch_processor_spark.operators.relational import (
        q_agg_approx, q_agg_distinct,
    )

    approx = {r.o_orderpriority: r
              for r in q_agg_approx(spark, sf_dir).collect()}
    exact = {r.o_orderpriority: r
             for r in q_agg_distinct(spark, sf_dir).collect()}
    assert set(approx) == set(exact)

    vals = defaultdict(list)
    for r in (load(spark, sf_dir, "orders")
              .select("o_orderpriority", "o_totalprice").collect()):
        vals[r.o_orderpriority].append(r.o_totalprice)

    for key, a in approx.items():
        e = exact[key]
        assert a.n_orders == e.n_orders
        assert abs(a.approx_customers - e.n_customers) <= max(
            2, math.ceil(0.10 * e.n_customers)), key
        v = sorted(vals[key])
        n = len(v)
        # GK with accuracy=1000: rank error <= n/accuracy (>= 1 row).
        eps = max(1, n // 1000)
        k50 = (n + 1) // 2  # 1-based ceil(0.5*n), matches q_agg_quantiles
        lo = v[max(0, k50 - 1 - eps)]
        hi = v[min(n - 1, k50 - 1 + eps)]
        assert lo <= a.approx_median <= hi, (key, lo, a.approx_median, hi)
        assert a.approx_median in v, "approx median must be a data value"


def test_window_running_range_frame_boundaries(spark, tmp_path):
    """Pins the RANGE frame semantics q_window_running absorbed:
    the trailing-hour frame is INCLUSIVE at exactly -1h, exclusive
    beyond it, and includes all order-value peers (duplicate
    timestamps) regardless of tie order."""
    import os

    from lisp_batch_processor_spark.operators.relational import (
        q_window_running,
    )

    h = 3_600
    t0 = 1_700_000_000  # epoch seconds
    rows = [
        (1, (t0) * 10**9, 7, 1.0),            # e1
        (2, (t0 + h) * 10**9, 7, 1.0),        # exactly 1h after e1
        (3, (t0 + 2 * h + 1) * 10**9, 7, 1.0),  # e2 is 1h+1s earlier
        (4, (t0 + 3 * h) * 10**9, 7, 1.0),    # duplicate-ts peers...
        (5, (t0 + 3 * h) * 10**9, 7, 2.0),
    ]
    sf = os.path.join(str(tmp_path), "rf")
    spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, value double"
    ).write.parquet(os.path.join(sf, "events.parquet"))

    got = {r.event_id: r for r in q_window_running(spark, sf).collect()}
    assert (got[1].hour_sum, got[1].hour_n) == (1.0, 1)
    # -1h boundary is inclusive: e1 is in e2's frame.
    assert (got[2].hour_sum, got[2].hour_n) == (2.0, 2)
    # 1h+1s is out: e3 sees only itself.
    assert (got[3].hour_sum, got[3].hour_n) == (1.0, 1)
    # RANGE includes order-value peers: both duplicate-ts rows see
    # each other, plus e3 (3599 s earlier, inside the hour).
    assert (got[4].hour_sum, got[4].hour_n) == (4.0, 3)
    assert (got[5].hour_sum, got[5].hour_n) == (4.0, 3)
    # The ROWS frames still behave: running total over the 5 events.
    assert got[5].running_value == 6.0
