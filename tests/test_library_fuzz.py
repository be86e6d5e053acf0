"""Randomized differential tests for the round-5 library operators:
each one replayed on seeded-random inputs against an independent
pure-Python implementation of its contract (the same discipline
test_differential_fuzz.py applies to the 48 oracled registry
queries). Seeds are fixed, so failures reproduce."""

from __future__ import annotations

import hashlib
import math
import random
import re
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

BASE = datetime(2025, 3, 1)


def _md5_word(salt: str, v) -> int:
    return int(hashlib.md5(f"{salt}:{v}".encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# chunk_documents
# ---------------------------------------------------------------------------

def test_fuzz_chunk_documents(spark):
    from lisp_batch_processor_spark.operators.text import chunk_documents

    rng = random.Random(501)
    vocab = ["alpha", "b", "gamma7", "x"]
    ws = [" ", "  ", "\t", "\n", " \n "]
    rows = []
    for did in range(120):
        if rng.random() < 0.08:
            rows.append((did, None))
            continue
        if rng.random() < 0.08:
            rows.append((did, rng.choice(["", " ", "\t\n"])))
            continue
        n = rng.randint(1, 40)
        text = ""
        if rng.random() < 0.3:
            text += rng.choice(ws)  # leading whitespace
        text += rng.choice(ws).join(rng.choice(vocab) for _ in range(n))
        if rng.random() < 0.3:
            text += rng.choice(ws)
        rows.append((did, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    for window, stride in ((1, 1), (5, 5), (8, 3), (64, 48)):
        got = {(r.doc_id, r.chunk_idx): (r.start_tok, r.n_tokens,
                                         r.chunk_text)
               for r in chunk_documents(docs, window, stride).collect()}
        want = {}
        for did, text in rows:
            if text is None or text.strip() == "":
                continue
            toks = re.split(r"\s+", text.strip())
            n = len(toks)
            s_max = math.ceil(max(n - window, 0) / stride) * stride
            for idx, start in enumerate(range(0, s_max + 1, stride)):
                chunk = toks[start:start + window]
                want[(did, idx)] = (start, len(chunk), " ".join(chunk))
        assert got == want, f"window={window} stride={stride}"


# ---------------------------------------------------------------------------
# stratified_sample_exact
# ---------------------------------------------------------------------------

def test_fuzz_stratified_sample_exact(spark):
    from lisp_batch_processor_spark.operators.training import (
        stratified_sample_exact)

    rng = random.Random(502)
    # Skewed strata: one giant, several small, one singleton; ids
    # sparse and shuffled.
    rows = []
    ids = rng.sample(range(10**6), 800)
    it = iter(ids)
    for _ in range(600):
        rows.append((next(it), "big"))
    for s in ("s1", "s2", "s3"):
        for _ in range(rng.randint(2, 30)):
            rows.append((next(it), s))
    rows.append((next(it), "lone"))
    docs = spark.createDataFrame(rows, "doc_id long, lang string")

    for k in (1, 3, 17):
        got = {(r.lang, r.doc_id)
               for r in stratified_sample_exact(
                   docs, "lang", k, salt="fz", n_buckets=7).collect()}
        by = {}
        for did, lang in rows:
            by.setdefault(lang, []).append((_md5_word("fz", did), did))
        want = {(lang, did)
                for lang, lst in by.items()
                for _, did in sorted(lst)[:k]}
        assert got == want, f"k={k}"


# ---------------------------------------------------------------------------
# attribution_join (batch twin) vs brute force
# ---------------------------------------------------------------------------

def test_fuzz_attribution_join(spark):
    from lisp_batch_processor_spark.operators.events import (
        attribution_join)

    rng = random.Random(503)
    horizon = 300
    rows = []
    eid = 0
    for _ in range(900):
        eid += 1
        uid = rng.randint(1, 25)
        # Coarse time grid forces same-instant collisions and ties.
        us = rng.randint(0, 120) * 10_000_000
        et = rng.choice(["click", "click", "purchase", "noise"])
        rows.append((eid, BASE + timedelta(microseconds=us), uid, et))
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string")

    touches: dict = {}
    for eid_, ts, uid, et in rows:
        if et == "click":
            touches.setdefault(uid, []).append((ts, eid_))

    def cands_for(uid, ts):
        return [(t, i) for t, i in touches.get(uid, [])
                if t <= ts and (ts - t).total_seconds() <= horizon]

    # last/first touch: (ts, id) max/min encode both tie rules —
    # greatest id at the latest instant, smallest at the earliest.
    for model, pick in (("last_touch", max), ("first_touch", min)):
        got = {(r.user_id, r.conversion_id): (r.touch_id, r.touch_ts)
               for r in attribution_join(events, horizon_s=horizon,
                                         model=model).collect()}
        want = {}
        for eid_, ts, uid, et in rows:
            if et != "purchase":
                continue
            cands = cands_for(uid, ts)
            if cands:
                bt, bi = pick(cands)
                want[(uid, eid_)] = (bi, bt)
        assert got == want, model

    got_all = {(r.user_id, r.conversion_id, r.touch_id)
               for r in attribution_join(events, horizon_s=horizon,
                                         model="all_touches").collect()}
    want_all = {(uid, eid_, i)
                for eid_, ts, uid, et in rows if et == "purchase"
                for _, i in cands_for(uid, ts)}
    assert got_all == want_all

    # emit_unmatched parity across models: every conversion appears
    # exactly as often as its matches, or once with a NULL touch.
    n_convs = sum(1 for *_, et in rows if et == "purchase")
    for model, expect in (("last_touch", n_convs),
                          ("first_touch", n_convs),
                          ("all_touches",
                           len(want_all) + sum(
                               1 for eid_, ts, uid, et in rows
                               if et == "purchase"
                               and not cands_for(uid, ts)))):
        out = attribution_join(events, horizon_s=horizon, model=model,
                               emit_unmatched=True).collect()
        assert len(out) == expect, model
        assert ({r.conversion_id for r in out}
                == {e for e, _, _, et in rows if et == "purchase"})

    import pytest
    with pytest.raises(ValueError, match="model"):
        attribution_join(events, model="u_shaped")

    # Credit weighting over the pair set vs a Python oracle.
    import math

    from lisp_batch_processor_spark.operators.events import (
        attribution_credit)

    pairs = attribution_join(events, horizon_s=horizon,
                             model="all_touches")
    by_conv: dict = {}
    for eid_, ts, uid, et in rows:
        if et == "purchase":
            # (touch_ts, touch_id) sort = the operator's total order.
            by_conv[eid_] = (ts, sorted(cands_for(uid, ts)))
    half_life = 600.0
    for model in ("linear", "position_based", "time_decay"):
        got = {(r.conversion_id, r.touch_id): r.credit
               for r in attribution_credit(
                   pairs, model=model,
                   half_life_s=int(half_life)).collect()}
        want = {}
        for cid, (cts, touches) in by_conv.items():
            ncand = len(touches)
            if not ncand:
                continue
            if model == "linear":
                for t, i in touches:
                    want[(cid, i)] = 1.0 / ncand
            elif model == "position_based":
                for k, (t, i) in enumerate(touches):
                    if ncand == 1:
                        c = 1.0
                    elif ncand == 2:
                        c = 0.5
                    elif k in (0, ncand - 1):
                        c = 0.4
                    else:
                        c = 0.2 / (ncand - 2)
                    want[(cid, i)] = c
            else:
                ws = [2 ** (-(cts - t).total_seconds() / half_life)
                      for t, _ in touches]
                tot = sum(ws)
                for (t, i), wgt in zip(touches, ws):
                    want[(cid, i)] = wgt / tot
        assert set(got) == set(want), model
        for k in want:
            assert math.isclose(got[k], want[k],
                                rel_tol=1e-9), (model, k)
        # Per-conversion credits sum to 1 exactly.
        sums: dict = {}
        for (cid, _), c in got.items():
            sums[cid] = sums.get(cid, 0.0) + c
        assert all(math.isclose(s, 1.0, rel_tol=1e-9)
                   for s in sums.values()), model
    with pytest.raises(ValueError, match="model"):
        attribution_credit(pairs, model="u_shaped")
    with pytest.raises(ValueError, match="u_weight"):
        attribution_credit(pairs, model="position_based",
                           u_weight=0.7)


# ---------------------------------------------------------------------------
# ngram LM score vs Counter replay
# ---------------------------------------------------------------------------

def test_fuzz_ngram_lm(spark):
    from collections import Counter

    from lisp_batch_processor_spark.operators.text import (
        ngram_lm_score, ngram_lm_train)

    rng = random.Random(504)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]

    def mk(n_docs, start):
        out = []
        for d in range(n_docs):
            n = rng.randint(0, 25)
            out.append((start + d,
                        " ".join(rng.choice(vocab) for _ in range(n))
                        if n or rng.random() < 0.5 else None))
        return out

    corpus_rows = mk(60, 0)
    doc_rows = mk(40, 1000)
    schema = "doc_id long, text string"
    corpus = spark.createDataFrame(corpus_rows, schema)
    docs = spark.createDataFrame(doc_rows, schema)

    bi, uni, v = ngram_lm_train(corpus)
    got = {r.doc_id: (r.n_bigrams, r.avg_logp)
           for r in ngram_lm_score(docs, bi, uni, v, add_k=0.5).collect()}

    c12: Counter = Counter()
    c1: Counter = Counter()
    for _, text in corpus_rows:
        toks = text.split() if text else []
        c1.update(toks)
        c12.update(zip(toks, toks[1:]))
    assert v == len(c1)
    for did, text in doc_rows:
        n_bi, avg = got[did]
        if text is None:
            assert n_bi is None and avg is None
            continue
        bgs = list(zip(text.split(), text.split()[1:]))
        assert n_bi == len(bgs)
        if not bgs:
            assert avg is None
            continue
        lps = [math.log((c12[bg] + 0.5) / (c1[bg[0]] + 0.5 * v))
               for bg in bgs]
        assert avg == pytest.approx(sum(lps) / len(lps), rel=1e-9)


# ---------------------------------------------------------------------------
# split-path SCD2 vs the pure batch chain, randomized epochs
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_fuzz_scd2_split_equals_batch_chain(spark, tmp_path):
    import os

    from lisp_batch_processor_spark.operators.scd import (
        scd2_apply, scd2_init, scd2_read, scd2_split_apply,
        scd2_split_init)

    rng = random.Random(505)
    keys = list(range(12)) + [None]          # includes a NULL key
    cities = ["lyon", "oslo", "kyiv", None]  # includes NULL attrs
    tiers = ["gold", "silver", None]

    def snap_rows():
        return [(k, rng.choice(cities), rng.choice(tiers))
                for k in rng.sample(keys, 6)]

    schema = "k long, city string, tier string"
    upd_schema = schema + ", effective_from timestamp"
    snap = snap_rows()
    path = os.path.join(str(tmp_path), "dim_fuzz")
    t0 = BASE
    scd2_split_init(spark.createDataFrame(snap, schema), t0, path,
                    key="k")
    want = scd2_init(spark.createDataFrame(snap, schema), t0, key="k")

    for e in range(6):
        eff = BASE + timedelta(days=e + 1)
        batch_keys = rng.sample(keys, rng.randint(1, 8))
        rows = [(k, rng.choice(cities), rng.choice(tiers), eff)
                for k in batch_keys]  # unique per key: caller contract
        upd = spark.createDataFrame(rows, upd_schema)
        assert scd2_split_apply(spark, path, upd, key="k",
                                attrs=["city", "tier"], epoch_id=e)
        want = scd2_apply(want, upd, key="k", attrs=["city", "tier"])

    got = {tuple(r) for r in scd2_read(spark, path).collect()}
    exp = {tuple(r) for r in want.collect()}
    assert got == exp
    assert len(got) == len(scd2_read(spark, path).collect())  # no dups


# ---------------------------------------------------------------------------
# mergeable quantile histogram vs Python replay
# ---------------------------------------------------------------------------

def test_fuzz_quantile_hist(spark):
    from lisp_batch_processor_spark.operators.sketches import (
        quantile_hist_build, quantile_hist_estimate,
        quantile_hist_merge)

    rng = random.Random(506)
    # Heavy repetition + a long tail; arbitrary hand-picked splits
    # (NOT trained) so bucket occupancy is wildly uneven.
    rows = [(rng.choice(["a", "b"]),
             float(rng.choice([1, 1, 1, 5, rng.randint(0, 1000)])),
             rng.randint(0, 3))
            for _ in range(3000)]
    df = spark.createDataFrame(rows, "g string, v double, day long")
    splits = [1.0, 2.0, 50.0, 500.0]

    # Build/merge exactness vs a Python count replay.
    got = {(r.g, r.bucket): r.cnt
           for r in quantile_hist_build(df, ["g"], "v", splits).collect()}
    want: dict = {}
    for g, v, _ in rows:
        b = sum(1 for s in splits if s <= v)
        want[(g, b)] = want.get((g, b), 0) + 1
    assert got == want

    daily = quantile_hist_build(df, ["g", "day"], "v", splits)
    merged = {(r.g, r.bucket): r.cnt
              for r in quantile_hist_merge(daily.drop("day"),
                                           ["g"]).collect()}
    assert merged == want

    # Estimate: reported bucket boundary equals the Python-rank
    # bucket's boundary for every group and q.
    hist = quantile_hist_build(df, ["g"], "v", splits)
    qs = [0.05, 0.4, 0.5, 0.95, 1.0]
    est = {(r.g, r.q): r.value
           for r in quantile_hist_estimate(hist, ["g"], splits,
                                           qs).collect()}
    by_g: dict = {}
    for g, v, _ in rows:
        by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        vals.sort()
        for q in qs:
            true_v = vals[math.ceil(q * len(vals)) - 1]
            tb = sum(1 for s in splits if s <= true_v)
            assert est[(g, q)] == splits[max(tb, 1) - 1], (g, q)


# ---------------------------------------------------------------------------
# type-1 upsert vs a dict replay, randomized epochs
# ---------------------------------------------------------------------------

def test_fuzz_upsert_equals_dict_replay(spark, tmp_path):
    import os

    from lisp_batch_processor_spark.operators.cdc import (
        upsert_apply, upsert_init, upsert_read)

    rng = random.Random(507)
    keys = list(range(30)) + [None]
    cities = ["lyon", "oslo", "kyiv", None]
    schema = "k long, city string, tier string"

    snap = [(k, rng.choice(cities), "t0")
            for k in rng.sample(keys, 12)]
    path = os.path.join(str(tmp_path), "t_fuzz")
    upsert_init(spark.createDataFrame(snap, schema), path, key="k",
                n_buckets=8)
    oracle = {k: (c, t) for k, c, t in snap}

    for e in range(7):
        batch_keys = rng.sample(keys, rng.randint(1, 10))
        rows = [(k, rng.choice(cities), f"t{e + 1}")
                for k in batch_keys]
        assert upsert_apply(spark, path,
                            spark.createDataFrame(rows, schema),
                            epoch_id=e)
        for k, c, t in rows:
            oracle[k] = (c, t)
        # Occasionally replay the epoch (crash-before-commit):
        # marker skip must hold state fixed.
        if rng.random() < 0.4:
            assert not upsert_apply(
                spark, path, spark.createDataFrame(rows, schema),
                epoch_id=e)
        got = {r.k: (r.city, r.tier)
               for r in upsert_read(spark, path).collect()}
        assert got == oracle, f"epoch {e}"

    df = upsert_read(spark, path)
    assert df.count() == df.select("k").distinct().count()


# ---------------------------------------------------------------------------
# asof_join (both directions) vs pandas merge_asof
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_fuzz_asof_join_vs_pandas(spark, direction):
    """asof_join against pandas.merge_asof on random inputs, both
    directions x strict x tolerance. Timestamps are unique per
    (user, side) so the engines' differing TIE conventions (ours:
    extreme right struct; pandas: input order) never engage — tie
    behavior has its own crafted pins in test_streaming_joins."""
    import pandas as pd

    from lisp_batch_processor_spark.operators.events import asof_join

    rng = random.Random(611 if direction == "backward" else 612)
    schema = "user_id long, ts timestamp, payload long"

    def side(n, salt):
        rows, used = [], set()
        for _ in range(n):
            uid = rng.randint(1, 12)
            while True:
                us = rng.randint(0, 5000) * 1_000_000
                if (uid, us) not in used:
                    used.add((uid, us))
                    break
            rows.append((uid, BASE + timedelta(microseconds=us),
                         rng.randint(0, 10**6)))
        return rows

    lrows, rrows = side(400, "l"), side(300, "r")
    left = spark.createDataFrame(lrows, schema)
    right = spark.createDataFrame(rrows, schema)

    for strict in (False, True):
        for tol in (None, 600):
            got = {(r.user_id, r.ts): (r.r_ts, r.r_payload)
                   for r in asof_join(left, right, on="ts",
                                      by="user_id",
                                      tolerance_s=tol, strict=strict,
                                      direction=direction).collect()}
            lpd = pd.DataFrame(lrows, columns=["user_id", "ts",
                                               "payload"]
                               ).sort_values("ts")
            rpd = pd.DataFrame(rrows, columns=["user_id", "r_ts",
                                               "r_payload"]
                               ).sort_values("r_ts")
            m = pd.merge_asof(
                lpd, rpd, left_on="ts", right_on="r_ts",
                left_by="user_id", right_by="user_id",
                direction=direction,
                allow_exact_matches=not strict,
                tolerance=(None if tol is None
                           else pd.Timedelta(seconds=tol)))
            want = {}
            for row in m.itertuples(index=False):
                matched = pd.notna(row.r_ts)
                want[(row.user_id, row.ts.to_pydatetime())] = (
                    (row.r_ts.to_pydatetime(), int(row.r_payload))
                    if matched else (None, None))
            assert got == want, (direction, strict, tol)


@pytest.mark.slow
def test_fuzz_scd2_split_lifecycle_with_crashes(spark, tmp_path):
    """Randomized split-path SCD2 chain with injected crash states —
    crash after the closed-dir write but before the open-slice swap
    (the residue window), both staged_swap windows on the open
    slice, and interleaved closed-tree compactions — replaying after
    every crash; the full history must equal the scd2_apply batch
    chain after every epoch, and the residue window must be
    invisible to readers until its replay completes."""
    import os
    import shutil

    from lisp_batch_processor_spark.operators.scd import (
        scd2_apply, scd2_compact_closed, scd2_init, scd2_read,
        scd2_split_apply, scd2_split_init)
    from lisp_batch_processor_spark.sources.writers import backup_path

    rng = random.Random(619)
    keys = list(range(10)) + [None]
    cities = ["lyon", "oslo", None]
    tiers = ["gold", None]
    schema = "k long, city string, tier string"
    upd_schema = schema + ", effective_from timestamp"

    snap = [(k, rng.choice(cities), rng.choice(tiers))
            for k in rng.sample(keys, 5)]
    path = os.path.join(str(tmp_path), "dim_crash_fuzz")
    open_dir = os.path.join(path, "open")
    scd2_split_init(spark.createDataFrame(snap, schema), BASE, path,
                    key="k")
    want_df = scd2_init(spark.createDataFrame(snap, schema), BASE,
                        key="k")

    def read_set():
        return {tuple(r) for r in scd2_read(spark, path).collect()}

    def want_set():
        return {tuple(r) for r in want_df.collect()}

    for e in range(7):
        eff = BASE + timedelta(days=e + 1)
        rows = [(k, rng.choice(cities), rng.choice(tiers), eff)
                for k in rng.sample(keys, rng.randint(1, 6))]
        upd = spark.createDataFrame(rows, upd_schema)
        pre = want_set()
        mode = rng.random()
        if mode < 0.3:
            # Residue window: epoch fully applies, then the open
            # slice is rolled back to its pre-epoch copy (crash
            # between the closed write and the swap). The closed
            # epoch-e rows must stay INVISIBLE until replay.
            snap_dir = os.path.join(str(tmp_path), f"open_snap_{e}")
            shutil.copytree(open_dir, snap_dir)
            assert scd2_split_apply(spark, path, upd, key="k",
                                    attrs=["city", "tier"],
                                    epoch_id=e)
            shutil.rmtree(open_dir)
            shutil.move(snap_dir, open_dir)
            assert read_set() == pre, f"residue visible at epoch {e}"
            assert scd2_split_apply(spark, path, upd, key="k",
                                    attrs=["city", "tier"],
                                    epoch_id=e)  # replay
        elif mode < 0.5:
            # Swap window 1 AFTER a completed epoch: open renamed
            # aside; the replay repairs and marker-skips.
            assert scd2_split_apply(spark, path, upd, key="k",
                                    attrs=["city", "tier"],
                                    epoch_id=e)
            os.rename(open_dir, backup_path(open_dir))
            assert not scd2_split_apply(spark, path, upd, key="k",
                                        attrs=["city", "tier"],
                                        epoch_id=e)
        elif mode < 0.7:
            # Swap window 2: stale backup beside the new open slice.
            assert scd2_split_apply(spark, path, upd, key="k",
                                    attrs=["city", "tier"],
                                    epoch_id=e)
            shutil.copytree(open_dir, backup_path(open_dir))
            assert not scd2_split_apply(spark, path, upd, key="k",
                                        attrs=["city", "tier"],
                                        epoch_id=e)
            assert not os.path.exists(backup_path(open_dir))
        else:
            assert scd2_split_apply(spark, path, upd, key="k",
                                    attrs=["city", "tier"],
                                    epoch_id=e)
        # Truncate the oracle chain's lineage — without this the
        # recomputed scd2_apply stack grows superlinearly and the
        # fuzz takes minutes instead of seconds.
        want_df = scd2_apply(want_df, upd, key="k",
                             attrs=["city", "tier"]
                             ).localCheckpoint(eager=True)
        if rng.random() < 0.4:
            scd2_compact_closed(spark, path)
        got = read_set()
        assert got == want_set(), f"epoch {e}"


@pytest.mark.slow
def test_fuzz_line_store_lifecycle_with_compaction(spark, tmp_path):
    """Randomized line-dedup ingest chain — epoch appends, replay of
    the latest epoch (which must exclude its OWN digests), and
    compactions at random points — against a pure-Python oracle of
    the store's membership semantics (key visible to epoch e iff
    recorded under any epoch < e; compaction folds all but the
    keep_live highest epochs to sentinel −1). Every epoch's rebuilt
    docs must match the oracle's replay."""
    import hashlib as _hl
    import os

    from lisp_batch_processor_spark.streaming.dedup import (
        line_dedup_ingest_epoch, line_store_compact, line_store_init)

    rng = random.Random(621)
    vocab = ["alpha beta", "shared banner", "gamma", "delta four",
             "epsilon", "zeta six", "eta", "theta eight", ""]
    schema = "doc_id long, text string"
    store = os.path.join(str(tmp_path), "lines_fuzz")
    line_store_init(spark, store)

    # Oracle store state: line_key -> set of epochs it is recorded
    # under (replay re-appends are set-idempotent, like the real
    # store's duplicate rows are dedup'd by the reader's semantics).
    okeys: dict = {}

    def key(line):
        return _hl.md5(line.encode()).hexdigest()

    def visible_before(e):
        return {k for k, eps in okeys.items()
                if any(x < e for x in eps)}

    def oracle_epoch(batch_rows, e, commit):
        seen = visible_before(e)
        winners = {}
        for did, text in sorted(batch_rows):
            for pos, line in enumerate(text.split("\n")):
                if len(line) < 1:
                    continue
                k = key(line)
                if k in seen:
                    continue
                if k not in winners or (did, pos) < winners[k]:
                    winners[k] = (did, pos)
        out = {}
        for did, text in batch_rows:
            kept = []
            for pos, line in enumerate(text.split("\n")):
                if len(line) < 1:
                    kept.append(line)
                    continue
                k = key(line)
                if k not in seen and winners.get(k) == (did, pos):
                    kept.append(line)
            out[did] = "\n".join(kept)
        if commit:
            for k in winners:
                okeys.setdefault(k, set()).add(e)
        return out

    next_doc = 100
    last = None
    for e in range(10):
        rows = []
        for _ in range(rng.randint(1, 3)):
            n = rng.randint(1, 4)
            rows.append((next_doc,
                         "\n".join(rng.choice(vocab)
                                   for _ in range(n))))
            next_doc += 1
        batch = spark.createDataFrame(rows, schema)
        want = oracle_epoch(rows, e, commit=True)
        got = {r.doc_id: r.text
               for r in line_dedup_ingest_epoch(batch, store,
                                                e).collect()}
        assert got == want, f"epoch {e}"
        last = (e, rows, batch, want)

        if rng.random() < 0.4:
            # Replay the latest epoch (its own digests excluded).
            le, lrows, lbatch, lwant = last
            again = {r.doc_id: r.text
                     for r in line_dedup_ingest_epoch(lbatch, store,
                                                      le).collect()}
            assert again == lwant, f"replay at epoch {le}"
        if rng.random() < 0.4:
            folded = line_store_compact(spark, store)
            if folded:
                # Oracle mirror: all but the highest epoch fold to -1.
                eps = sorted({x for s in okeys.values() for x in s})
                live = set(eps[-1:])
                for k, s in okeys.items():
                    below = {x for x in s if x not in live}
                    if below:
                        s.difference_update(below)
                        s.add(-1)


def test_attribution_zero_horizon_consistent_across_models(spark):
    """horizon_s=0 means same-instant attribution for ALL models
    (round-6 advice: all_touches raised range_join's generic bound
    error while last/first accepted 0): at a shared instant the pair
    set is the equi-match, last resolves to the greatest touch id,
    first to the smallest; negative horizons raise everywhere."""
    from lisp_batch_processor_spark.operators.events import (
        attribution_join)

    rows = [
        # (event_id, ts, user_id, event_type)
        (1, BASE, 1, "click"),
        (2, BASE, 1, "click"),
        (3, BASE, 1, "purchase"),
        (4, BASE + timedelta(seconds=5), 1, "purchase"),  # no match
        (5, BASE, 2, "purchase"),                          # no match
        (6, BASE + timedelta(seconds=1), 2, "click"),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string")
    got_all = {(r.conversion_id, r.touch_id)
               for r in attribution_join(
                   events, horizon_s=0, model="all_touches").collect()}
    assert got_all == {(3, 1), (3, 2)}
    got_last = {(r.conversion_id, r.touch_id)
                for r in attribution_join(
                    events, horizon_s=0, model="last_touch").collect()}
    assert got_last == {(3, 2)}
    got_first = {(r.conversion_id, r.touch_id)
                 for r in attribution_join(
                     events, horizon_s=0, model="first_touch").collect()}
    assert got_first == {(3, 1)}
    for model in ("last_touch", "first_touch", "all_touches"):
        with pytest.raises(ValueError, match="horizon_s"):
            attribution_join(events, horizon_s=-1, model=model)


# ---------------------------------------------------------------------------
# redact_documents vs a Python `re` chain replay, randomized text
# ---------------------------------------------------------------------------

def test_fuzz_redact_documents(spark):
    """Random documents salted with PII-shaped fragments at random
    positions: the Spark regexp chain must equal a Python `re.sub`
    replay of the exact same KINDS order, and every per-kind count
    must equal the Python findall count on the original text."""
    from lisp_batch_processor_spark.functions.redact import (
        KINDS, redact_documents)

    rng = random.Random(701)
    frags = [
        lambda: f"u{rng.randrange(999)}@ex{rng.randrange(99)}.com",
        lambda: ".".join(str(rng.randrange(256)) for _ in range(4)),
        lambda: "-".join(["4111", "1111", "1111",
                          str(rng.randrange(1000, 9999))]),
        lambda: f"({rng.randrange(100, 999)}) "
                f"{rng.randrange(100, 999)}-{rng.randrange(1000, 9999)}",
        lambda: str(rng.randrange(10 ** 8, 10 ** 13)),
        lambda: "tok" + "".join(rng.choice("abc123") for _ in range(33)),
        lambda: " ".join("word%d" % rng.randrange(50)
                         for _ in range(rng.randrange(1, 6))),
        lambda: "v%d.%d.%d" % (rng.randrange(9), rng.randrange(99),
                               rng.randrange(99)),
    ]
    docs = []
    for i in range(120):
        parts = [rng.choice(frags)() for _ in range(rng.randrange(1, 7))]
        docs.append((i, " ".join(parts)))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in redact_documents(df).collect()}
    for i, text in docs:
        expect = text
        for _k, rx, tok in KINDS:
            expect = re.sub(rx, tok, expect)
        assert got[i]["text"] == expect, text
        for k, rx, _tok in KINDS:
            assert got[i]["redactions"][k] == len(re.findall(rx, text)), \
                (k, text)


# ---------------------------------------------------------------------------
# write_training_shards manifest invariants, randomized orders
# ---------------------------------------------------------------------------

def test_fuzz_training_shards(spark, tmp_path):
    """Random order frames (sizes, shard counts, duplicate keys, null
    tokens): the manifest accounts for every row, key ranges stay
    inside their arithmetic windows and disjoint, the full read-back
    is the key-sorted input, and verify passes clean."""
    from lisp_batch_processor_spark.operators.training import (
        shuffle_deterministic)
    from lisp_batch_processor_spark.sources.shards import (
        KEY_BITS, read_training_shards, write_training_shards)

    rng = random.Random(702)
    for case in range(4):
        n = rng.randrange(5, 160)
        shards = rng.choice([1, 3, 8, 32])
        rows = [(i, rng.randrange(1, 50)
                 if rng.random() > 0.1 else None, f"t{i}")
                for i in range(n)]
        df = shuffle_deterministic(
            spark.createDataFrame(
                rows, "doc_id bigint, n_tokens int, text string"),
            salt=f"fz-{case}", id_col="doc_id")
        p = str(tmp_path / f"s{case}")
        m = write_training_shards(df, p, num_shards=shards,
                                  order_within=())
        assert m["rows"] == n
        assert sum(s["rows"] for s in m["shards"]) == n
        assert m["tokens"] == sum(t or 0 for _, t, _ in rows)
        stride = -(-(1 << KEY_BITS) // shards)
        prev = -1
        for s in sorted(m["shards"], key=lambda s: s["shard"]):
            assert s["shard"] * stride <= s["key_min"] \
                <= s["key_max"] < (s["shard"] + 1) * stride
            assert s["key_min"] > prev
            prev = s["key_max"]
        got = [r["doc_id"] for r in
               read_training_shards(spark, p, verify=True)
               .select("doc_id").collect()]
        want = [d for _, d in sorted(
            (_md5_word(f"fz-{case}", d), d) for d, _, _ in rows)]
        assert got == want


# ---------------------------------------------------------------------------
# fuzzy_contamination vs a full Python LSH + exact-Jaccard replay
# ---------------------------------------------------------------------------

def test_fuzz_fuzzy_contamination(spark):
    """Random train corpora with planted eval copies/mutations: the
    flag set equals a full Python replay — md5-mix minhash (the
    pinned hash family), 8 bands of width 2, exact shingle-set
    Jaccard >= 1/2 on candidates — so candidate recall AND verify
    agree with the engine exactly, not just directionally."""
    from lisp_batch_processor_spark.operators.training import (
        fuzzy_contamination)

    P = 2305843009213693951
    rng = random.Random(703)
    vocab = [f"w{i}" for i in range(60)]

    def sig16(text: str) -> list[int]:
        toks = text.split()
        sh = ({" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
              if len(toks) >= 3 else {" ".join(toks)})
        out = []
        for s in range(16):
            vals = []
            for x in sh:
                hx = hashlib.md5(x.encode()).hexdigest()
                vals.append((int(hx[:15], 16)
                             + s * int(hx[15:30], 16)) % P)
            out.append(min(vals))
        return out

    def shset(text: str) -> set[str]:
        toks = text.split()
        return ({" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
                if len(toks) >= 3 else {" ".join(toks)})

    evals = [" ".join(rng.choice(vocab) for _ in range(25))
             for _ in range(3)]
    train = []
    for i in range(40):
        kind = rng.random()
        if kind < 0.2:                     # verbatim eval copy
            train.append((i, rng.choice(evals)))
        elif kind < 0.5:                   # mutated eval item
            toks = rng.choice(evals).split()
            for _ in range(rng.randrange(1, 8)):
                toks[rng.randrange(len(toks))] = rng.choice(vocab)
            train.append((i, " ".join(toks)))
        else:                              # unrelated
            train.append((i, " ".join(rng.choice(vocab)
                                       for _ in range(25))))
    got = {r["doc_id"]: r["fuzzy_contaminated"] for r in
           fuzzy_contamination(
               spark.createDataFrame(train,
                                     "doc_id bigint, text string"),
               spark.createDataFrame([(t,) for t in evals],
                                     "text string"),
               jaccard_num=1, jaccard_den=2).collect()}
    esigs = [sig16(t) for t in set(evals)]
    esets = [shset(t) for t in set(evals)]
    for i, text in train:
        tsig, tset = sig16(text), shset(text)
        want = False
        for es, eset in zip(esigs, esets):
            bands_hit = any(
                tsig[2 * b:2 * b + 2] == es[2 * b:2 * b + 2]
                for b in range(8))
            inter = len(tset & eset)
            uni = len(tset | eset)
            if bands_hit and 2 * inter >= uni:
                want = True
        assert got[i] == want, (i, text)


# ---------------------------------------------------------------------------
# semantic_dedup vs a numpy replay, randomized corpora and knobs
# ---------------------------------------------------------------------------

def test_fuzz_semantic_dedup(spark):
    """Random embedding corpora (clustered + uniform noise + zero
    vectors) under random (k, tau): the full output equals a numpy
    replay from the SAME trained centroids — cell argmax, within-cell
    pairs, min-rep fold — so clustering, thresholding, and the rep
    rule all agree with the engine exactly."""
    import numpy as np

    from lisp_batch_processor_spark.operators.dedup import semantic_dedup
    from lisp_batch_processor_spark.operators.similarity import ivf_train

    rng = np.random.default_rng(704)
    for case in range(3):
        dim = int(rng.integers(6, 12))
        k = int(rng.integers(2, 6))
        tau = float(rng.uniform(0.6, 0.95))
        rows = []
        vid = 0
        for c in range(int(rng.integers(2, 5))):     # clusters
            base = rng.standard_normal(dim)
            base /= np.linalg.norm(base)
            for _ in range(int(rng.integers(3, 10))):
                v = base + 0.15 * rng.standard_normal(dim)
                rows.append((vid, [float(x) for x in v]))
                vid += 1
        for _ in range(4):                           # uniform noise
            rows.append((vid, [float(x)
                               for x in rng.standard_normal(dim)]))
            vid += 1
        rows.append((vid, [0.0] * dim))              # zero vector
        emb = spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>")
        got = {r["vec_id"]: (r["rep_id"], r["is_dup"]) for r in
               semantic_dedup(emb, k=k, tau=tau, iters=1).collect()}

        cents = np.array(ivf_train(
            emb.filter("aggregate(transform(embedding, x -> x*x), "
                       "0.0D, (a, x) -> a + x) > 0"), k=k, iters=1))
        cents = cents / np.maximum(
            np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
        cells: dict[int, list[int]] = {}
        unit = {}
        for i, v in rows:
            a = np.array(v)
            n = np.linalg.norm(a)
            if n == 0:
                continue
            u = a / n
            # argsort(-sims, stable)[0] mirrors the engine's probe
            # (ties to the LOWEST cell index, unlike argmax on some
            # negative-zero edge cases — keep the same construction).
            sims = cents @ u
            cells.setdefault(
                int(np.argsort(-sims, kind="stable")[0]), []).append(i)
            unit[i] = u
        want = {i: (i, False) for i, _ in rows}
        nbr: dict[int, int] = {}
        for members in cells.values():
            for x in members:
                for y in members:
                    if x < y and float(unit[x] @ unit[y]) >= tau:
                        nbr[y] = min(nbr.get(y, x), x)
        for y, x in nbr.items():
            want[y] = (x, True)
        assert got == want, (case, k, tau)
