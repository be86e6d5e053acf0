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


def _funnel_replay(rows, steps, horizon_s):
    """Python reference for funnel's earliest-anchor greedy walk."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for eid, us, uid, et in rows:
        if et in steps:
            by_user[uid].append((us, eid, et))
    horizon_us = horizon_s * 1_000_000
    counts = [0] * len(steps)
    for evs in by_user.values():
        m, prev, t1 = 0, None, None
        for us, eid, et in sorted(evs):
            if (m < len(steps) and et == steps[m]
                    and (m == 0 or (us, eid) > prev)
                    and (m == 0 or us <= t1 + horizon_us)):
                m += 1
                prev = (us, eid)
                t1 = us if t1 is None else t1
        for i in range(m):
            counts[i] += 1
    return [(i, steps[i], counts[i]) for i in range(len(steps))]


def test_funnel_matches_python_replay(spark):
    """funnel() vs a Python replay on crafted edges (same-instant
    ties, horizon boundary, repeated steps, non-completers) and on
    random event streams."""
    import random
    from datetime import datetime, timedelta

    from lisp_batch_processor_spark.operators.events import funnel

    base = datetime(2025, 6, 1)
    S = 1_000_000  # one second in microseconds

    def mk(eid, us, uid, et):
        return (eid, base + timedelta(microseconds=us), uid, et)

    crafted = [
        # user 1: clean completion view->click->error
        mk(1, 0, 1, "view"), mk(2, 5 * S, 1, "click"),
        mk(3, 9 * S, 1, "error"),
        # user 2: click precedes view -> stalls at view
        mk(4, 0, 2, "click"), mk(5, 5 * S, 2, "view"),
        # user 3: same-instant view+click — tie order by event_id:
        # click (eid 7) is after view (eid 6), so it counts
        mk(6, 0, 3, "view"), mk(7, 0, 3, "click"),
        # user 4: completes exactly AT the horizon (inclusive)
        mk(8, 0, 4, "view"), mk(9, 3 * S, 4, "click"),
        mk(10, 60 * S, 4, "error"),
        # user 5: last step one microsecond past the horizon
        mk(11, 0, 5, "view"), mk(12, 3 * S, 5, "click"),
        mk(13, 60 * S + 1, 5, "error"),
        # user 6: anchor at its EARLIEST view; completion would only
        # work from the later view -> greedy does not retry
        mk(14, 0, 6, "view"), mk(15, 100 * S, 6, "view"),
        mk(16, 101 * S, 6, "click"), mk(17, 102 * S, 6, "error"),
        # user 7: only noise
        mk(18, 0, 7, "scroll"),
    ]
    steps = ["view", "click", "error"]
    df = spark.createDataFrame(
        crafted, "event_id long, ts timestamp, user_id long, "
                 "event_type string")
    got = [(r.step_idx, r.step, r.n_users)
           for r in funnel(df, steps, horizon_s=60)
           .orderBy("step_idx").collect()]
    rows_us = [(eid, int(ts.timestamp() * 1_000_000), uid, et)
               for eid, ts, uid, et in crafted]
    assert got == _funnel_replay(rows_us, steps, 60)
    # Pin the crafted expectations explicitly: every view-er reaches
    # step 0 (incl. the step-2 staller); clicks = users 1, 3 (tie
    # broken toward the later event_id), 4, 5 (their last steps'
    # horizon fates don't matter here); errors = 1 and 4 (user 4
    # lands exactly AT the horizon — inclusive; user 5 is 1µs past).
    assert got == [(0, "view", 6), (1, "click", 4), (2, "error", 2)]

    rng = random.Random(7)
    types = ["view", "click", "error", "scroll", "buy"]
    fuzz = []
    eid = 100
    for uid in range(30):
        us = rng.randint(0, 10 * S)
        for _ in range(rng.randint(0, 25)):
            us += rng.choice([0, 1, S, 30 * S, 3600 * S])
            fuzz.append(mk(eid, us, uid, rng.choice(types)))
            eid += 1
    dff = spark.createDataFrame(
        fuzz, "event_id long, ts timestamp, user_id long, "
              "event_type string")
    fuzz_us = [(e, int(t.timestamp() * 1_000_000), u, ty)
               for e, t, u, ty in fuzz]
    for steps2, hz in [(["view", "click"], 3600),
                       (["view", "click", "buy"], 120),
                       (["scroll", "error"], 1)]:
        got = [(r.step_idx, r.step, r.n_users)
               for r in funnel(dff, steps2, horizon_s=hz)
               .orderBy("step_idx").collect()]
        assert got == _funnel_replay(fuzz_us, steps2, hz), (steps2, hz)


def test_new_operator_plan_shapes(spark, sf_dir):
    """Physical-plan pins for the round-4 library operators — the
    properties that matter at 100 TB, so a refactor that
    de-optimizes them fails CI:

    - funnel: the step-type predicate reaches the parquet scan, the
      scan reads only the referenced columns, and the whole funnel is
      TWO exchanges (one user_id shuffle + the k-counter global agg);
    - span_dedup: digest-bucketed equi-joins only, no cartesian or
      broadcast-nested-loop shapes anywhere;
    - bloom probe: the word map joins as a broadcast hash join.
    """
    from pyspark.sql import functions as F

    from lisp_batch_processor_spark.catalog import load
    from lisp_batch_processor_spark.operators.bloom import (
        bloom_build, bloom_parameters, bloom_probe)
    from lisp_batch_processor_spark.operators.dedup import span_dedup
    from lisp_batch_processor_spark.operators.events import funnel
    from lisp_batch_processor_spark.plans import (
        assert_no_cartesian, assert_pushed_filters,
        assert_read_schema_pruned, physical_plan)

    fn = funnel(load(spark, sf_dir, "events"),
                ["view", "click", "purchase"])
    assert_no_cartesian(fn)
    assert_pushed_filters(fn, "In(event_type")
    assert_read_schema_pruned(fn, "events.parquet", 4)
    plan = physical_plan(fn)
    n_ex = plan.count("+- Exchange") + plan.count(":- Exchange")
    assert n_ex == 2, f"funnel wants 2 exchanges, got {n_ex}:\n{plan}"

    sd = span_dedup(load(spark, sf_dir, "documents"))
    assert_no_cartesian(sd)

    members = spark.range(0, 100).select(F.col("id").alias("k"))
    m, k = bloom_parameters(100, 0.01)
    probe = bloom_probe(members, bloom_build(members, "k", m, k),
                        "k", m, k)
    assert_no_cartesian(probe)
    assert "BroadcastHashJoin" in physical_plan(probe)


def test_run_counters_ride_the_single_action(spark):
    """run_counters (the R16-R18 Observation analog): one action
    yields the output AND the ok/err accounting, with error rows
    kept in the output per the error-channel convention."""
    from pyspark.sql import functions as F

    from lisp_batch_processor_spark.operators.quality import run_counters

    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 10 != 0).alias("valid"))
    out, obs = run_counters(df, ok=F.col("valid"))
    n = out.count()  # the one action
    assert n == 1000                      # error rows stay in the output
    got = obs.get
    assert got == {"n_rows": 1000, "n_ok": 900, "n_err": 100}


def test_asof_join_library_matches_query_twin(spark, sf_dir):
    """The general asof_join must reproduce q_join_asof exactly when
    configured the same way (strict backward, no tolerance), and its
    tolerance/strictness knobs must behave on crafted instants."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from lisp_batch_processor_spark.catalog import load
    from lisp_batch_processor_spark.operators.events import (
        asof_join, q_join_asof)
    from lisp_batch_processor_spark.plans import assert_no_cartesian

    ev = load(spark, sf_dir, "events")
    errors = (ev.filter(F.col("event_type") == "error")
              .select("event_id", "user_id", "ts"))
    touches = (ev.filter(F.col("event_type").isin("click", "view"))
               .select("event_id", "user_id", "ts", "event_type"))
    joined = asof_join(errors, touches, on="ts", by="user_id")
    assert_no_cartesian(joined)
    got = {(r.event_id, r.user_id,
            r.r_event_id, r.r_event_type)
           for r in joined.filter(F.col("r_event_id").isNotNull())
           .collect()}
    want = {(r.event_id, r.user_id, r.touch_event_id, r.touch_type)
            for r in q_join_asof(spark, sf_dir).collect()}
    assert got == want and got

    # Crafted: strictness and tolerance at exact instants.
    base = datetime(2025, 6, 1)
    L = spark.createDataFrame(
        [(1, 7, base + timedelta(seconds=100))],
        "event_id long, user_id long, ts timestamp")
    R = spark.createDataFrame(
        [(50, 7, base + timedelta(seconds=100), "same-instant"),
         (51, 7, base + timedelta(seconds=40), "older"),
         (52, 8, base + timedelta(seconds=99), "other-user")],
        "event_id long, user_id long, ts timestamp, tag string")

    strict = asof_join(L, R, on="ts", by="user_id").collect()[0]
    assert strict.r_tag == "older"              # same-instant invisible
    loose = asof_join(L, R, on="ts", by="user_id",
                      strict=False).collect()[0]
    assert loose.r_tag == "same-instant"
    tol = asof_join(L, R, on="ts", by="user_id",
                    tolerance_s=30).collect()[0]
    assert tol.r_tag is None                    # 60s gap > 30s tolerance
    tol2 = asof_join(L, R, on="ts", by="user_id",
                     tolerance_s=60).collect()[0]
    assert tol2.r_tag == "older"                # exactly at tolerance


def test_range_join_library_matches_query_twin(spark, sf_dir):
    """The general range_join must reproduce q_join_range when
    aggregated identically, match a Python brute-force interval
    oracle on crafted boundary instants, and plan without cartesian
    or nested-loop shapes."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from lisp_batch_processor_spark.catalog import load
    from lisp_batch_processor_spark.functions.numeric import dsum
    from lisp_batch_processor_spark.operators.events import (
        RANGE_JOIN_WINDOW_S, q_join_range, range_join)
    from lisp_batch_processor_spark.plans import assert_no_cartesian

    ev = load(spark, sf_dir, "events")
    errors = (ev.filter(F.col("event_type") == "error")
              .select("event_id", "user_id", "ts"))
    touches = (ev.filter(F.col("event_type").isin("click", "view"))
               .select("user_id", "ts", "value"))
    pairs = range_join(errors, touches, on="ts", by="user_id",
                       lower_s=-RANGE_JOIN_WINDOW_S, upper_s=0)
    assert_no_cartesian(pairs)
    # q_join_range's residual is half-open (b_us < a_us); align by
    # dropping the same-instant pairs before aggregating.
    got = {(r.event_id, r.user_id): (r.n, float(r.s), r.last)
           for r in pairs
           .filter(F.unix_micros("r_ts") < F.unix_micros("ts"))
           .groupBy("event_id", "user_id")
           .agg(F.count(F.lit(1)).alias("n"),
                dsum("r_value", 2).alias("s"),
                F.max(F.unix_micros("r_ts")).alias("last"))
           .collect()}
    want = {(r.event_id, r.user_id):
            (r.n_touches, float(r.sum_touch_value), r.last_touch_us)
            for r in q_join_range(spark, sf_dir).collect()}
    assert got == want and got

    # Crafted boundary instants vs a brute-force Python oracle.
    base = datetime(2025, 6, 1)

    def t(s):
        return base + timedelta(seconds=s)

    L = [(1, 7, 1000), (2, 7, 2000), (3, 8, 1000)]
    R = [(u, s) for u in (7, 8)
         for s in (399, 400, 700, 999, 1000, 1001, 1400, 1600, 2000)]
    ldf = spark.createDataFrame([(e, u, t(s)) for e, u, s in L],
                                "event_id long, user_id long, ts timestamp")
    rdf = spark.createDataFrame([(u, t(s), float(s)) for u, s in R],
                                "user_id long, ts timestamp, value double")
    lo, up = -600, 0
    got2 = {(r.event_id, int(r.r_value))
            for r in range_join(ldf, rdf, on="ts", by="user_id",
                                lower_s=lo, upper_s=up).collect()}
    want2 = {(e, s) for e, u, ls in L for (ru, s) in R
             if ru == u and ls + lo <= s <= ls + up}
    assert got2 == want2
    # Inclusive at both endpoints: 400 and 1000 match event 1.
    assert (1, 400) in got2 and (1, 1000) in got2
    assert (1, 399) not in got2 and (1, 1001) not in got2


def test_sessionize_library_matches_query_twin(spark, sf_dir):
    """The general sessionize must reproduce q_event_sessionize's
    per-session rollup when aggregated identically, and pin the
    strict-gap boundary (exactly gap stays, gap+1us splits)."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from lisp_batch_processor_spark.catalog import load
    from lisp_batch_processor_spark.functions.numeric import dsum
    from lisp_batch_processor_spark.operators.events import (
        q_event_sessionize, sessionize)

    ev = load(spark, sf_dir, "events")
    got = {(r.user_id, r.session_id): (r.n, float(r.s))
           for r in sessionize(ev)
           .groupBy("user_id", "session_id")
           .agg(F.count(F.lit(1)).alias("n"),
                dsum("value", 2).alias("s"))
           .collect()}
    want = {(r.user_id, r.session_id): (r.n_events, float(r.sum_value))
            for r in q_event_sessionize(spark, sf_dir).collect()}
    assert got == want and got

    base = datetime(2025, 6, 1)
    rows = [(1, 0), (2, 60), (3, 60 + 30 * 60),          # exactly gap
            (4, 60 + 30 * 60 + 30 * 60), (5, 200 * 60 + 1)]
    df = spark.createDataFrame(
        [(e, 9, base + timedelta(seconds=s)) for e, s in rows[:4]]
        + [(5, 9, base + timedelta(seconds=60 + 60 * 60 + 30 * 60,
                                   microseconds=1))],
        "event_id long, user_id long, ts timestamp")
    sid = {r.event_id: r.session_id
           for r in sessionize(df, gap_s=30 * 60).collect()}
    # 1->2 (59s), 2->3 (exactly 30min: stays), 3->4 (exactly again),
    # 4->5 (+1us over the gap: splits). Ids are 1-based.
    assert sid == {1: 1, 2: 1, 3: 1, 4: 1, 5: 2}


def test_attribution_models_plan_shapes(spark):
    """Every attribution model and the credit layer plan without a
    cartesian product or broadcast nested loop — the two shapes that
    melt at 100 TB (the audit discipline, extended to the round-6
    library surface)."""
    from datetime import datetime

    from lisp_batch_processor_spark.operators.events import (
        attribution_credit, attribution_join)
    from lisp_batch_processor_spark.plans import assert_no_cartesian

    events = spark.createDataFrame(
        [(1, datetime(2025, 6, 1), 1, "click"),
         (2, datetime(2025, 6, 1, 0, 5), 1, "purchase")],
        "event_id long, ts timestamp, user_id long, event_type string")
    for model in ("last_touch", "first_touch", "all_touches"):
        for unmatched in (False, True):
            assert_no_cartesian(attribution_join(
                events, model=model, emit_unmatched=unmatched))
    pairs = attribution_join(events, model="all_touches")
    for credit_model in ("linear", "position_based", "time_decay"):
        assert_no_cartesian(attribution_credit(pairs,
                                               model=credit_model))


def test_r13_rewrites_plan_pins(spark, sf_dir):
    """Structural pins for the round-13 aggregation rewrites (VERDICT
    r13 #7): a Catalyst upgrade or refactor that silently reintroduces
    the multi-distinct Expand — which doubles/triples every input row
    through the shuffle — must fail here, not at 100 TB.

    - q_exists_decorrelated: the (orderkey, suppkey) pre-aggregate
      replaced the two countDistincts; ZERO Expand nodes.
    - q_agg_distinct: n_statuses rides the collect_set, leaving one
      distinct column; Catalyst plans it with ZERO Expand nodes.
    - q_dedup_simhash: the fingerprint aggregation runs ONCE behind a
      localCheckpoint — the corpus parquet is scanned exactly once in
      the query plan (the assignment's doc_id projection); without
      the checkpoint all three fingerprint consumers would re-scan.
    """
    from lisp_batch_processor_spark.operators.dedup import q_dedup_simhash
    from lisp_batch_processor_spark.operators.relational import (
        q_agg_distinct)
    from lisp_batch_processor_spark.operators.tpch import (
        q_exists_decorrelated)
    from lisp_batch_processor_spark.plans.inspect import physical_plan

    for q in (q_exists_decorrelated, q_agg_distinct):
        plan = physical_plan(q(spark, sf_dir))
        assert "Expand" not in plan, plan

    plan = physical_plan(q_dedup_simhash(spark, sf_dir))
    n_doc_scans = sum("documents.parquet" in b
                      for b in plan.split("\n\n") if "Scan parquet" in b)
    assert n_doc_scans == 1, plan


def test_r14_closure_and_audit_plan_pins(spark, sf_dir):
    """Structural pins for the round-14 rewrites:

    - q_dedup_connected's FINAL plan reads the corpus parquet exactly
      once (the assignment's doc_id projection) and joins the
      checkpoint-materialized roots with a ShuffledHashJoin — the
      emit_roots + SHUFFLE_HASH shape; a refactor that reintroduces
      the node-universe union+distinct+join or loses the hint puts
      extra scans / SMJ sorts back on the critical path.
    - q_quality_audit scans orders exactly twice (the referential
      join side + the fused duplicate-PK/bad-status per-key
      aggregate); a third scan means the fused orders pass split
      apart again.
    """
    from lisp_batch_processor_spark.operators.dedup import (
        q_dedup_connected)
    from lisp_batch_processor_spark.operators.quality import (
        q_quality_audit)
    from lisp_batch_processor_spark.plans.inspect import physical_plan

    plan = physical_plan(q_dedup_connected(spark, sf_dir))
    scans = [b for b in plan.split("\n\n") if "Scan parquet" in b]
    assert sum("documents.parquet" in b for b in scans) == 1, plan
    assert "ShuffledHashJoin" in plan, plan

    qplan = physical_plan(q_quality_audit(spark, sf_dir))
    qscans = [b for b in qplan.split("\n\n") if "Scan parquet" in b]
    assert sum("orders.parquet" in b for b in qscans) == 2, qplan
