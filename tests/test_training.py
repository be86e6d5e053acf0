"""Training-data assembly operators: differential and invariant tests.

- split_assign is replayed bit-exactly in DuckDB (cross-engine).
- domain_mix is replayed bit-exactly in Python hashlib (the md5
  bucket construction is engine-portable by design).
- pack_sequences is checked against its combinatorial invariants
  (exactly-once, budget, the first-fit half-full bound, determinism).
- redact_pii is compared byte-for-byte against a Python `re` oracle.
"""

from __future__ import annotations

import hashlib
import os
import re

import duckdb
import pytest

from pyspark.sql import functions as F

from lisp_batch_processor_spark.operators.training import (
    PII_PATTERNS, SPLIT_BUCKETS, contamination_flags, decontaminate,
    domain_mix, domain_upsample, epoch_rates, hash_bucket, mix_rates,
    pack_sequences, redact_pii, shuffle_deterministic, split_assign,
    split_thresholds,
)

SF01 = "/root/testdata/sf0.01"


def _py_bucket(salt: str, key, n_buckets: int = SPLIT_BUCKETS) -> int:
    h = hashlib.md5(f"{salt}:{key}".encode()).hexdigest()
    return int(h[:15], 16) % n_buckets


# ---------------------------------------------------------------------------
# split_assign
# ---------------------------------------------------------------------------

def test_split_thresholds_validate():
    with pytest.raises(ValueError):
        split_thresholds((("train", 0.5), ("val", 0.4)))  # sums to 0.9
    bounds = split_thresholds((("a", 0.25), ("b", 0.25), ("c", 0.5)))
    assert bounds == [("a", 25_000), ("b", 50_000), ("c", SPLIT_BUCKETS)]


def test_split_assign_duckdb_replay_and_stability(spark):
    docs = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
    got = {r.doc_id: r.split
           for r in split_assign(docs).select("doc_id", "split").collect()}

    con = duckdb.connect()
    oracle = {r[0]: r[1] for r in con.sql(f"""
        SELECT doc_id,
          CASE WHEN b < 98000 THEN 'train'
               WHEN b < 99000 THEN 'val' ELSE 'test' END AS split
        FROM (SELECT doc_id,
                CAST(('0x' || substr(md5(concat_ws(':', 'split-v1',
                     CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)
                  % {SPLIT_BUCKETS} AS b
              FROM read_parquet('{SF01}/documents.parquet'))
    """).fetchall()}
    assert got == oracle

    # Partitioning-independence: same assignment after a reshuffle.
    re7 = {r.doc_id: r.split
           for r in split_assign(docs.repartition(7))
           .select("doc_id", "split").collect()}
    assert re7 == got

    # Exhaustive + roughly proportional (98/1/1 over 500 docs).
    counts = {s: 0 for s in ("train", "val", "test")}
    for s in got.values():
        counts[s] += 1
    assert sum(counts.values()) == len(got)
    assert counts["train"] > 0.9 * len(got)


def test_split_salt_draws_independent_split(spark):
    docs = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
    a = {r.doc_id: r.split for r in
         split_assign(docs, salt="s-a").select("doc_id", "split").collect()}
    b = {r.doc_id: r.split for r in
         split_assign(docs, salt="s-b").select("doc_id", "split").collect()}
    assert a != b  # 500 docs; P[identical] is negligible


# ---------------------------------------------------------------------------
# domain_mix
# ---------------------------------------------------------------------------

def test_mix_rates_hits_target_mixture_exactly():
    tokens = {"web": 1_000_000, "code": 200_000, "books": 50_000}
    target = {"web": 0.5, "code": 0.3, "books": 0.2}
    rates = mix_rates(tokens, target)
    assert all(0 < r <= 1.0 for r in rates.values())
    assert max(rates.values()) == 1.0  # a binding domain exists
    kept = {d: tokens[d] * rates[d] for d in rates}
    total = sum(kept.values())
    for d, w in target.items():
        assert abs(kept[d] / total - w) < 1e-12


def test_mix_rates_rejects_empty_domains():
    with pytest.raises(ValueError):
        mix_rates({"web": 100}, {"web": 0.5, "missing": 0.5})
    with pytest.raises(ValueError):
        mix_rates({"web": 100}, {"web": 0.0})


def test_domain_mix_python_replay(spark):
    docs = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
    target = {"src0": 0.5, "src1": 0.3, "src2": 0.2}  # drops src3+
    out = domain_mix(docs, target, salt="mix-t")
    got = {r.doc_id for r in out.select("doc_id").collect()}

    # Replay: identical aggregate -> identical rates -> identical coin.
    from lisp_batch_processor_spark.operators.text import tokens_col
    stats_rows = (docs.select("source",
                              F.size(tokens_col()).cast("bigint").alias("n"))
                  .groupBy("source").agg(F.sum("n").alias("t")).collect())
    rates = mix_rates({r.source: r.t for r in stats_rows}, target)
    thr = {d: int(round(r * SPLIT_BUCKETS)) for d, r in rates.items()}
    expect = {r.doc_id for r in docs.select("doc_id", "source").collect()
              if r.source in thr
              and _py_bucket("mix-t", r.doc_id) < thr[r.source]}
    assert got == expect
    assert got  # sanity: mixing keeps something


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------

def test_pack_sequences_invariants(spark):
    docs = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
    budget = 64
    out = pack_sequences(docs, budget=budget, n_buckets=8).collect()

    # Exactly-once.
    ids = [r.doc_id for r in out]
    assert len(ids) == len(set(ids)) == docs.count()

    packs: dict[int, list] = {}
    for r in out:
        packs.setdefault(r.pack_id, []).append(r)
        assert r.pack_id >> 32 == r.bucket
    for rows in packs.values():
        fill = sum(r.n_tokens for r in rows)
        assert fill <= budget
        assert sorted(r.pos for r in rows) == list(range(len(rows)))

    # First-fit bound: at most one pack per bucket is <= half full.
    by_bucket: dict[int, list[int]] = {}
    for pid, rows in packs.items():
        by_bucket.setdefault(rows[0].bucket, []).append(
            sum(r.n_tokens for r in rows))
    for bucket, fills in by_bucket.items():
        assert sum(1 for f in fills if f <= budget // 2) <= 1, \
            f"bucket {bucket} wastes space: {sorted(fills)}"


def test_pack_sequences_clamps_overlong_and_is_deterministic(spark):
    rows = [(i, ln) for i, ln in enumerate([200, 130, 64, 40, 30, 20, 10, 3])]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    out1 = sorted(map(tuple, pack_sequences(
        df, budget=64, token_len=F.col("n"), n_buckets=2).collect()))
    out2 = sorted(map(tuple, pack_sequences(
        df, budget=64, token_len=F.col("n"), n_buckets=2).collect()))
    assert out1 == out2
    assert all(r[4] <= 64 for r in out1)  # overlong docs clamped
    with pytest.raises(ValueError):
        pack_sequences(df, budget=0, token_len=F.col("n"))


# ---------------------------------------------------------------------------
# redact_pii
# ---------------------------------------------------------------------------

def test_redact_pii_matches_re_oracle(spark):
    samples = [
        "contact bob.smith+spam@example.co.uk or 10.0.255.1 today",
        "card 4111111111111111 ssn 123456789 short 12345678 ok",
        "ip 1.2.3.4 then email a@b.io then 192.168.0.100:8080",
        "no pii here at all",
        "edge a@b.c at 999.999.999.999 run 1234567890123456789",
        "",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "text string")
    got = [r.red for r in
           df.select(redact_pii("text").alias("red")).collect()]

    def oracle(s: str) -> str:
        for pat, repl in PII_PATTERNS:
            s = re.sub(pat, repl, s)
        return s

    assert got == [oracle(s) for s in samples]
    assert "<EMAIL>" in got[0] and "<IP>" in got[0]
    assert got[1].count("<ID>") == 2 and "12345678 ok" in got[1]


def test_redact_pii_idempotent_on_clean_corpus(spark):
    docs = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
    changed = (docs.select(
        (F.col("text") != redact_pii("text")).alias("c"))
        .filter("c").count())
    assert changed == 0  # fixture corpus contains no PII shapes


# ---------------------------------------------------------------------------
# hash_bucket is the shared primitive — pin it cross-engine.
# ---------------------------------------------------------------------------

def test_hash_bucket_python_replay(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "k long")
    got = {r.k: r.b for r in
           df.select("k", hash_bucket("k", "pin", 97).alias("b")).collect()}
    assert got == {i: _py_bucket("pin", i, 97) for i in range(100)}


# ---------------------------------------------------------------------------
# contamination_flags / decontaminate
# ---------------------------------------------------------------------------

def _py_tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _py_grams(text: str, n: int) -> set[str]:
    toks = _py_tokens(text)
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def test_contamination_flags_python_replay(spark):
    docs = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
    rows = docs.select("doc_id", "text").orderBy("doc_id").limit(6).collect()
    n = 8
    # Eval set: an 8-token window lifted from two fixture docs (must
    # flag exactly those containing the window), plus a gram no doc
    # contains.
    ev_texts = []
    for r in rows[:2]:
        toks = _py_tokens(r.text)
        assert len(toks) >= n, "fixture doc too short for the test"
        ev_texts.append(" ".join(toks[3:3 + n]))
    ev_texts.append("zz yy xx ww vv uu tt ss")
    eval_df = spark.createDataFrame([(t,) for t in ev_texts], "text string")

    got = {r.doc_id: (r.n_eval_grams, r.contaminated)
           for r in contamination_flags(docs, eval_df, n=n).collect()}

    ev_grams = set()
    for t in ev_texts:
        ev_grams |= _py_grams(t, n)
    expect = {}
    for r in docs.select("doc_id", "text").collect():
        hits = len(_py_grams(r.text, n) & ev_grams)
        expect[r.doc_id] = (hits, hits > 0)
    assert got == expect
    # The two lifted windows each flag at least their source doc.
    assert got[rows[0].doc_id][1] and got[rows[1].doc_id][1]

    kept = decontaminate(docs, eval_df, n=n)
    assert {r.doc_id for r in kept.select("doc_id").collect()} == \
        {d for d, (_, c) in expect.items() if not c}


def test_contamination_clean_eval_flags_nothing(spark):
    docs = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
    eval_df = spark.createDataFrame(
        [("qq ww ee rr tt yy uu ii oo pp",)], "text string")
    out = contamination_flags(docs, eval_df)
    assert out.filter("contaminated").count() == 0
    assert out.count() == docs.count()  # one row per input doc


# ---------------------------------------------------------------------------
# epoch_rates / domain_upsample
# ---------------------------------------------------------------------------

def test_epoch_rates_allows_upsampling():
    tokens = {"web": 1_000_000, "books": 10_000}
    target = {"web": 0.7, "books": 0.3}
    budget = 500_000
    e = epoch_rates(tokens, target, budget)
    assert abs(e["web"] - 0.35) < 1e-12
    assert abs(e["books"] - 15.0) < 1e-12  # upsampled 15 epochs
    # Token mixture at the budget is exact.
    out = {d: tokens[d] * e[d] for d in e}
    assert abs(sum(out.values()) - budget) < 1e-6
    assert abs(out["books"] / budget - 0.3) < 1e-12
    with pytest.raises(ValueError):
        epoch_rates(tokens, target, 0)
    with pytest.raises(ValueError):
        epoch_rates({"web": 0}, {"web": 1.0}, 100)


def test_temperature_weights_flatten_toward_uniform():
    from lisp_batch_processor_spark.operators.training import (
        temperature_weights)
    tokens = {"web": 1_000_000, "books": 10_000, "wiki": 100_000}
    nat = temperature_weights(tokens, 1.0)
    assert abs(nat["web"] - 1_000_000 / 1_110_000) < 1e-12
    uni = temperature_weights(tokens, 0.0)
    assert all(abs(w - 1 / 3) < 1e-12 for w in uni.values())
    half = temperature_weights(tokens, 0.5)
    # Flattening is monotone: small domains gain, big ones give up.
    assert uni["books"] > half["books"] > nat["books"]
    assert uni["web"] < half["web"] < nat["web"]
    assert abs(sum(half.values()) - 1.0) < 1e-12
    # Composes with epoch_rates: the mixture realized at the budget
    # IS the temperature mixture.
    e = epoch_rates(tokens, half, 500_000)
    out = {d: tokens[d] * e[d] for d in e}
    assert abs(out["books"] / 500_000 - half["books"]) < 1e-9
    with pytest.raises(ValueError):
        temperature_weights(tokens, 1.5)
    with pytest.raises(ValueError):
        temperature_weights({"a": 0}, 0.5)


def test_domain_upsample_python_replay(spark):
    docs = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
    epochs = {"src0": 2.5, "src1": 1.0, "src2": 0.25}  # drops src3+
    out = domain_upsample(docs, epochs, salt="ep-t")
    got = sorted((r.doc_id, r.epoch) for r in
                 out.select("doc_id", "epoch").collect())

    expect = []
    for r in docs.select("doc_id", "source").collect():
        if r.source not in epochs:
            continue
        e = epochs[r.source]
        reps = int(e)
        if _py_bucket("ep-t", r.doc_id) < int(round((e - int(e))
                                                    * SPLIT_BUCKETS)):
            reps += 1
        expect.extend((r.doc_id, k) for k in range(reps))
    assert got == sorted(expect)
    # src1 docs appear exactly once; some src0 doc appears 3 times.
    per_doc = {}
    for d, _ in got:
        per_doc[d] = per_doc.get(d, 0) + 1
    src = {r.doc_id: r.source for r in
           docs.select("doc_id", "source").collect()}
    assert all(per_doc[d] == 1 for d in per_doc if src[d] == "src1")
    assert any(c == 3 for d, c in per_doc.items() if src[d] == "src0")
    with pytest.raises(ValueError):
        domain_upsample(docs, {"src0": -1.0})


# ---------------------------------------------------------------------------
# shuffle_deterministic
# ---------------------------------------------------------------------------

def test_shuffle_deterministic_order_and_stability(spark):
    docs = spark.read.parquet(os.path.join(SF01, "documents.parquet"))

    def order(df):
        return [r.doc_id for r in
                shuffle_deterministic(df, salt="sh-t", num_partitions=4)
                .select("doc_id").toLocalIterator()]

    got = order(docs)
    # Python replay: sort by (md5 word, doc_id).
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    keyed = sorted(
        ids, key=lambda d: (int(hashlib.md5(
            f"sh-t:{d}".encode()).hexdigest()[:15], 16), d))
    assert got == keyed
    assert got != sorted(ids)  # it actually shuffles
    # Stable under input partitioning.
    assert order(docs.repartition(13)) == got
    # A different salt draws a different order.
    other = [r.doc_id for r in
             shuffle_deterministic(docs, salt="sh-u", num_partitions=4)
             .select("doc_id").toLocalIterator()]
    assert other != got


# ---------------------------------------------------------------------------
# ffd_pack pure-core property suite (no SparkSession needed).
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

from lisp_batch_processor_spark.operators.training import ffd_pack


@settings(max_examples=300, deadline=None)
@given(
    lens=st.lists(st.integers(min_value=1, max_value=300), max_size=120),
    budget=st.integers(min_value=1, max_value=200),
)
def test_ffd_pack_properties(lens, budget):
    docs = list(enumerate(lens))  # doc_id = index, unique
    rows = ffd_pack(7, docs, budget)

    # Exactly-once, clamped lengths.
    assert sorted(r[2] for r in rows) == sorted(d for d, _ in docs)
    assert all(r[4] == min(lens[r[2]], budget) for r in rows)

    packs: dict[int, list] = {}
    for r in rows:
        assert r[0] == 7 and r[1] >> 32 == 7
        packs.setdefault(r[1], []).append(r)
    for rs in packs.values():
        assert sum(r[4] for r in rs) <= budget
        assert sorted(r[3] for r in rs) == list(range(len(rs)))

    # First-fit bound: at most one pack at most half full.
    fills = [sum(r[4] for r in rs) for rs in packs.values()]
    assert sum(1 for f in fills if f <= budget // 2) <= 1

    # Determinism under input order.
    assert ffd_pack(7, reversed(docs), budget) == rows


# ---------------------------------------------------------------------------
# mix_rates / epoch_rates pure-core property suite.
# ---------------------------------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(
    tokens=st.dictionaries(
        st.sampled_from(["a", "b", "c", "d", "e"]),
        st.integers(min_value=1, max_value=10**9),
        min_size=1, max_size=5),
    weights=st.lists(st.floats(min_value=0.01, max_value=10.0,
                               allow_nan=False), min_size=1, max_size=5),
)
def test_mix_and_epoch_rates_properties(tokens, weights):
    domains = sorted(tokens)
    target = {d: w for d, w in zip(domains, weights)}

    # mix_rates: never upsamples, at least one domain binds at 1.0,
    # and the kept token mixture is exactly the normalized target.
    rates = mix_rates(tokens, target)
    assert set(rates) == set(target)
    assert all(0 < r <= 1.0 for r in rates.values())
    assert any(abs(r - 1.0) < 1e-9 for r in rates.values())
    kept = {d: tokens[d] * rates[d] for d in rates}
    total = sum(kept.values())
    norm = sum(target.values())
    for d in rates:
        assert abs(kept[d] / total - target[d] / norm) < 1e-9

    # epoch_rates at the mix_rates-implied budget reproduces
    # mix_rates exactly (the no-upsampling boundary), and any larger
    # budget scales every epoch count proportionally.
    budget = int(total)
    if budget > 0:
        e1 = epoch_rates(tokens, target, budget)
        for d in e1:
            assert abs(e1[d] - rates[d] * (budget / total)) < 1e-6
        e2 = epoch_rates(tokens, target, budget * 3)
        for d in e2:
            assert abs(e2[d] / e1[d] - 3) < 1e-6


@settings(max_examples=200, deadline=None)
@given(
    tokens=st.dictionaries(
        st.sampled_from(["a", "b", "c", "d", "e"]),
        st.integers(min_value=1, max_value=10**9),
        min_size=1, max_size=5),
    alpha=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
def test_temperature_weights_properties(tokens, alpha):
    from lisp_batch_processor_spark.operators.training import (
        temperature_weights)
    w = temperature_weights(tokens, alpha)
    assert set(w) == set(tokens)
    assert abs(sum(w.values()) - 1.0) < 1e-9
    assert all(v > 0 for v in w.values())
    # Order-preserving: a domain with more tokens never gets LESS
    # weight, and at alpha=0 every weight is uniform.
    doms = sorted(tokens, key=tokens.get)
    for x, y in zip(doms, doms[1:]):
        assert w[x] <= w[y] + 1e-12
    if alpha == 0.0:
        assert all(abs(v - 1 / len(tokens)) < 1e-9 for v in w.values())
    # Composes with epoch_rates: realized token shares at any budget
    # equal the temperature mixture.
    e = epoch_rates(tokens, w, 10**6)
    out = {d: tokens[d] * e[d] for d in e}
    tot = sum(out.values())
    for d in w:
        assert abs(out[d] / tot - w[d]) < 1e-9


# ---------------------------------------------------------------------------
# stratified_sample_exact
# ---------------------------------------------------------------------------

def _md5_word(salt: str, v) -> int:
    h = hashlib.md5(f"{salt}:{v}".encode()).hexdigest()
    return int(h[:15], 16)


def test_stratified_sample_exact_counts_and_replay(spark):
    from lisp_batch_processor_spark.operators.training import (
        stratified_sample_exact)

    docs = spark.read.parquet(f"{SF01}/documents.parquet") \
        .select("doc_id", "lang")
    k = 7
    got = stratified_sample_exact(docs, "lang", k, id_col="doc_id",
                                  salt="s1")
    rows = [(r.lang, r.doc_id) for r in got.collect()]

    # Exact budget: min(k, |stratum|) per lang; no duplicates.
    sizes = {r.lang: r.n for r in
             docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    per = {}
    for lang, did in rows:
        per[lang] = per.get(lang, 0) + 1
    assert per == {lang: min(k, n) for lang, n in sizes.items()}
    assert len(rows) == len(set(rows))

    # Python hashlib replay: the k smallest (md5word, id) per lang.
    all_rows = [(r.lang, r.doc_id) for r in docs.collect()]
    want = set()
    by_lang: dict = {}
    for lang, did in all_rows:
        by_lang.setdefault(lang, []).append((_md5_word("s1", did), did))
    for lang, lst in by_lang.items():
        for _, did in sorted(lst)[:k]:
            want.add((lang, did))
    assert set(rows) == want


def test_stratified_sample_exact_bucket_invariance(spark):
    """The two-phase skew-safe plan must return EXACTLY the naive
    single-window result for every bucket count."""
    from lisp_batch_processor_spark.operators.training import (
        stratified_sample_exact)

    docs = spark.read.parquet(f"{SF01}/documents.parquet") \
        .select("doc_id", "lang")
    base = {(r.lang, r.doc_id)
            for r in stratified_sample_exact(
                docs, "lang", 5, n_buckets=1).collect()}
    for b in (2, 32, 101):
        got = {(r.lang, r.doc_id)
               for r in stratified_sample_exact(
                   docs, "lang", 5, n_buckets=b).collect()}
        assert got == base, f"n_buckets={b} diverged"


def test_stratified_sample_exact_validation(spark):
    from lisp_batch_processor_spark.operators.training import (
        stratified_sample_exact)

    docs = spark.range(3).select(F.col("id").alias("doc_id"),
                                 F.lit("x").alias("lang"))
    with pytest.raises(ValueError, match="k must"):
        stratified_sample_exact(docs, "lang", 0)
    with pytest.raises(ValueError, match="n_buckets"):
        stratified_sample_exact(docs, "lang", 1, n_buckets=0)


def test_rate_delivery_paths_agree_above_the_map_literal_cap(spark):
    """domain_upsample / domain_mix switch from literal create_map to
    a broadcast rates join above _MAP_LITERAL_MAX domains; both paths
    must produce identical rows. Forced by monkeypatching the cap
    down so the small fixture exercises the join path."""
    import lisp_batch_processor_spark.operators.training as T

    docs = spark.createDataFrame(
        [(i, f"dom{i % 7}", "tok " * (3 + i % 5)) for i in range(60)],
        "doc_id bigint, source string, text string")
    eps = {f"dom{d}": 0.5 + d * 0.4 for d in range(7)}  # frac + >1
    tgt = {f"dom{d}": 1.0 for d in range(7)}
    lit_up = sorted(map(tuple, T.domain_upsample(
        docs, eps, salt="cap-t").select("doc_id", "epoch").collect()))
    lit_mix = sorted(r[0] for r in T.domain_mix(
        docs, tgt, salt="cap-t").select("doc_id").collect())
    cap0 = T._MAP_LITERAL_MAX
    T._MAP_LITERAL_MAX = 3
    try:
        join_up = sorted(map(tuple, T.domain_upsample(
            docs, eps, salt="cap-t").select("doc_id", "epoch")
            .collect()))
        join_mix = sorted(r[0] for r in T.domain_mix(
            docs, tgt, salt="cap-t").select("doc_id").collect())
    finally:
        T._MAP_LITERAL_MAX = cap0
    assert join_up == lit_up
    assert join_mix == lit_mix
