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
    PII_PATTERNS, SPLIT_BUCKETS, domain_mix, hash_bucket, mix_rates,
    pack_sequences, redact_pii, split_assign, split_thresholds,
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
