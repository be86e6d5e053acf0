"""Property tests for the fuzzy-dedup family on constructed
near-duplicates (the fixture corpus is random text with no dups, so
recall must be proven on inputs where dups exist by construction)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lisp_batch_processor_spark.operators.dedup import (
    assignment,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash_fingerprints,
    verify_jaccard,
)

BASE = ("the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep dark forest to find some food for the long winter")


@pytest.fixture(scope="module")
def dup_docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),                                  # exact dup
        (2, BASE.replace("winter", "summer")),      # near dup (1 token)
        (3, "completely different text about spark dataframes and shuffles "
            "partitions executors catalyst tungsten codegen arrow pandas"),
        (4, "another unrelated document mentioning databases indexes btrees "
            "transactions locks logs checkpoints recovery buffers pages"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_finds_near_dups_not_distinct(spark, dup_docs):
    sig = minhash_signatures(dup_docs)
    pairs = lsh_candidate_pairs(sig)
    confirmed = verify_jaccard(dup_docs, pairs).filter(F.col("jaccard") >= 0.7)
    got = {(r.doc_a, r.doc_b) for r in confirmed.collect()}
    assert (0, 1) in got                  # exact dup must be found
    assert (0, 2) in got or (1, 2) in got  # near dup should band-collide
    assert not any(3 in p or 4 in p for p in got)


def test_assignment_shape(spark, dup_docs):
    sig = minhash_signatures(dup_docs)
    confirmed = verify_jaccard(
        dup_docs, lsh_candidate_pairs(sig)).filter(F.col("jaccard") >= 0.7)
    out = assignment(dup_docs.select("doc_id"), "doc_id",
                     confirmed, "doc_a", "doc_b").collect()
    by_id = {r.doc_id: r for r in out}
    assert len(out) == 5                      # one row per input, always
    assert by_id[0].rep_id == 0 and not by_id[0].is_dup
    assert by_id[1].rep_id == 0 and by_id[1].is_dup
    assert by_id[3].rep_id == 3 and not by_id[3].is_dup


def test_simhash_exact_dup_distance_zero(spark, dup_docs):
    fp = {r.doc_id: r.simhash for r in simhash_fingerprints(dup_docs).collect()}
    assert fp[0] == fp[1]
    ham_near = bin(fp[0] ^ fp[2]).count("1")
    ham_far = bin(fp[0] ^ fp[3]).count("1")
    assert ham_near < ham_far
    assert ham_far > 3


def test_minhash_signature_deterministic(spark, dup_docs):
    a = minhash_signatures(dup_docs).orderBy("doc_id").collect()
    b = minhash_signatures(dup_docs).orderBy("doc_id").collect()
    assert a == b


def test_minhash_signatures_match_formula_exactly(spark, dup_docs):
    """Pin the overflow-free BIGINT Mersenne fold to the documented
    hash family h_s = (b1 + s*b2) mod 2^61-1, replayed in exact
    Python integers over the same md5-derived words. This is the
    contract the DuckDB oracle's HUGEINT replay and any persisted
    signature index depend on — candidate sets are only 'identical by
    construction' if the signatures are. (Caught a real bug: a fold
    that used coefficient 2 for the high word — the 32-bit-split
    identity, not the 31-bit split's 2^61 ≡ 1 — passed every
    downstream test because exact-Jaccard verification masks
    candidate-set differences.)"""
    import hashlib as hl
    import re as _re
    import string as _string

    P = 2305843009213693951
    got = {r.doc_id: [r[f"mh{s}"] for s in range(16)]
           for r in minhash_signatures(dup_docs).collect()}

    # ASCII-only casing, mirroring text.ascii_lower — Python's full
    # .lower() would diverge on special-casing chars (Turkish İ).
    _ascii = str.maketrans(_string.ascii_uppercase,
                           _string.ascii_lowercase)
    for doc_id, text in [(r.doc_id, r.text) for r in dup_docs.collect()]:
        toks = [t for t in
                _re.split(r"[^a-z0-9]+", text.translate(_ascii)) if t]
        if len(toks) >= 3:
            shingles = {" ".join(toks[i:i + 3])
                        for i in range(len(toks) - 2)}
        else:
            shingles = {" ".join(toks)}
        expect = []
        for s in range(16):
            vals = []
            for sh in shingles:
                hx = hl.md5(sh.encode()).hexdigest()
                b1, b2 = int(hx[:15], 16), int(hx[15:30], 16)
                vals.append((b1 + s * b2) % P)
            expect.append(min(vals))
        assert got[doc_id] == expect, f"doc {doc_id} signature drift"


def test_connected_components_chain_and_triangle(spark):
    from lisp_batch_processor_spark.operators.dedup import connected_components
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 9),          # chain 1-2-3-9
         (5, 6), (6, 7), (5, 7)],         # triangle 5-6-7
        ["doc_a", "doc_b"])
    got = {r.node: r.component
           for r in connected_components(pairs, "doc_a", "doc_b").collect()}
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5, 7: 5}


def test_dedup_connected_closure_idempotent(spark, sf_dir):
    from lisp_batch_processor_spark.operators.dedup import q_dedup_connected
    out = q_dedup_connected(spark, sf_dir).collect()
    rep = {r.doc_id: r.rep_id for r in out}
    # One row per doc; every rep is its own rep (closure reached).
    assert len(rep) == len(out)
    for doc, r in rep.items():
        assert rep[r] == r, f"rep {r} of {doc} is not a fixpoint"
        assert r <= doc


def test_editdist_verifier_composes_with_lsh_candidates(spark, tmp_path):
    """The q_dedup_editdist docstring promises the thresholded-
    Levenshtein verifier drops into LSH candidate pairs at scale.
    Prove the composition on a corpus with constructed near-dups:
    LSH candidates -> (same-source, length-bound, lev<=k) residual
    must equal the length-banded join restricted to the same
    candidate pairs — same pairs, same integer distances."""
    import os

    from lisp_batch_processor_spark.operators.dedup import (
        MAX_EDIT_DIST, MAX_LEN_DIFF, q_dedup_editdist,
    )

    long_base = " ".join(
        f"token{i} word{i % 7} item{i % 5}" for i in range(40))
    rows = [
        (0, "web", long_base),
        (1, "web", long_base.replace("token3", "tokenX")),   # tiny edit
        (2, "web", long_base.replace("word", "wyrd")),       # many small edits
        (3, "books", long_base),                             # cross-source twin
        (4, "web", "a completely different short document about engines"),
        (5, "web", "a completely different short document about turbines"),
    ]
    sf = os.path.join(str(tmp_path), "corpus")
    spark.createDataFrame(rows, "doc_id long, source string, text string") \
        .write.parquet(os.path.join(sf, "documents.parquet"))

    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    cands = lsh_candidate_pairs(minhash_signatures(docs))
    side = lambda tag: docs.select(  # noqa: E731
        F.col("doc_id").alias(f"doc_{tag}"),
        F.col("source").alias(f"src_{tag}"),
        F.col("text").alias(f"text_{tag}"),
        F.length("text").alias(f"len_{tag}"))
    dist = F.levenshtein("text_a", "text_b", MAX_EDIT_DIST)
    composed = (cands.join(side("a"), "doc_a").join(side("b"), "doc_b")
                .filter((F.col("src_a") == F.col("src_b"))
                        & (F.abs(F.col("len_a") - F.col("len_b"))
                           <= MAX_LEN_DIFF)
                        & (dist >= 0) & (dist <= MAX_EDIT_DIST))
                .select("doc_a", "doc_b", dist.alias("dist")))
    got = {(r.doc_a, r.doc_b, r.dist) for r in composed.collect()}

    banded = q_dedup_editdist(spark, sf)
    want = {(r.doc_a, r.doc_b, r.dist)
            for r in banded.join(cands, ["doc_a", "doc_b"], "left_semi")
                           .collect()}
    assert got == want
    assert got, "constructed near-dups must survive both paths"
    # The cross-source twin is an LSH candidate but not an editdist
    # pair (same-source contract) — both paths must exclude it.
    cand_set = {(r.doc_a, r.doc_b) for r in cands.collect()}
    assert (0, 3) in cand_set
    assert all(p != (0, 3) for p in {(a, b) for a, b, _ in got})


def test_srp_cosine_pairs_matches_brute_force(spark, sf_dir):
    """The unlabeled-corpus embedding dedup (SRP bucket blocking) must
    find exactly the brute-force cosine>=threshold pairs. The fixture
    corpus has no dup-grade pairs (equality is checked and holds
    vacuously there), so recall is proven on constructed near-dups —
    at cosine ~0.999 a 16-band miss has probability ~6e-15."""
    import numpy as np

    from lisp_batch_processor_spark.catalog import load
    from lisp_batch_processor_spark.functions.vectors import cosine as vcos
    from lisp_batch_processor_spark.operators.dedup import srp_cosine_pairs

    def brute_pairs(df):
        a, b = df.alias("a"), df.alias("b")
        brute = (a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
                 .select(F.col("a.vec_id").alias("vec_a"),
                         F.col("b.vec_id").alias("vec_b"),
                         vcos(F.col("a.embedding"),
                              F.col("b.embedding")).alias("cos"))
                 .filter(F.col("cos") >= 0.99))
        return {(r.vec_a, r.vec_b) for r in brute.collect()}

    # Fixture: equality against brute force (currently both empty —
    # i.e. no false positives survive the exact verify).
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    got = {(r.vec_a, r.vec_b) for r in srp_cosine_pairs(emb).collect()}
    assert got == brute_pairs(emb)

    # Constructed corpus: 8 bases, each with a near-dup (tiny
    # perturbation -> cosine ~0.9999), plus 8 unrelated vectors.
    rng = np.random.default_rng(42)
    rows = []
    for i in range(8):
        base = rng.normal(size=64)
        near = base + 1e-3 * rng.normal(size=64)
        rows.append((2 * i, [float(x) for x in base]))
        rows.append((2 * i + 1, [float(x) for x in near]))
    for i in range(8):
        rows.append((100 + i, [float(x) for x in rng.normal(size=64)]))
    built = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>")
    got_b = {(r.vec_a, r.vec_b) for r in srp_cosine_pairs(built).collect()}
    want_b = brute_pairs(built)
    assert got_b == want_b
    assert {(2 * i, 2 * i + 1) for i in range(8)} <= got_b


def test_connected_components_steps_per_sync_path_graph(spark):
    """Pin convergence detection when steps_per_sync > 1 (the `orig`
    label-carrier trick, dedup.py): on an odd-diameter path graph the
    last sync does one useful step plus one no-op step, so the
    carrier must still report that sync as 'changed' and require one
    clean extra sync to detect the fixpoint.

    Path 1-2-3-4-5-6-7-8: diameter 7 (odd). Min-label propagation
    needs 7 steps; with steps_per_sync=2 that is 4 changing syncs
    plus 1 clean detection sync.
    """
    import warnings

    from lisp_batch_processor_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], ["doc_a", "doc_b"])
    want = {i: 1 for i in range(1, 9)}  # recursive-closure answer

    # Enough budget (5 syncs x 2 steps >= 7 + detection): converged,
    # exact labels, NO warning.
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        got = {r.node: r.component
               for r in connected_components(
                   pairs, "doc_a", "doc_b",
                   max_iter=5, steps_per_sync=2).collect()}
    assert got == want

    # Budget below the diameter (3 syncs x 2 steps = 6 < 7): labels
    # are NOT the closure and the non-convergence warning MUST fire.
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got_short = {r.node: r.component
                     for r in connected_components(
                         pairs, "doc_a", "doc_b",
                         max_iter=3, steps_per_sync=2).collect()}
    assert any("not converged" in str(x.message) for x in w)
    assert got_short != want
    # Propagation is still monotone: 6 of the 7 hops completed.
    assert got_short[7] == 1 and got_short[8] == 2


def test_connected_components_zero_max_iter_warns(spark):
    """max_iter <= 0 on a non-empty graph must warn (no propagation
    ran; singletons are not converged) — and stay silent on an empty
    graph, where singletons ARE the fixpoint."""
    import warnings

    from lisp_batch_processor_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame([(1, 2)], ["doc_a", "doc_b"])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = {r.node: r.component
               for r in connected_components(
                   pairs, "doc_a", "doc_b", max_iter=0).collect()}
    assert got == {1: 1, 2: 2}  # untouched singletons
    assert any("no propagation ran" in str(x.message) for x in w)

    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        assert connected_components(
            empty, "doc_a", "doc_b", max_iter=0).count() == 0


def test_incremental_near_dups_equals_full_self_join(spark):
    """incremental_near_dups must assign new docs exactly what the
    full self-join over (corpus ∪ batch) assigns them — proven on a
    corpus with an internal dup cluster plus a batch containing a
    corpus near-dup, an exact corpus dup, a batch-internal dup pair,
    and a novel doc."""
    from lisp_batch_processor_spark.operators.dedup import (
        banded_signatures,
        incremental_near_dups,
        lsh_candidate_pairs,
        minhash_signatures,
        verify_jaccard,
    )

    other = ("spark catalyst tungsten codegen arrow shuffle partition "
             "executor broadcast join aggregate window stream state "
             "watermark checkpoint parquet column prune filter push")
    corpus_rows = [
        (10, BASE),
        (11, BASE),                                   # corpus-internal dup
        (12, other),
        (13, "databases indexes btrees transactions locks logs pages "
             "buffers recovery checkpoints undo redo vacuum stats "
             "planner optimizer executor storage compression bloom"),
    ]
    batch_rows = [
        (20, BASE.replace("winter", "summer")),       # near-dup of corpus 10/11
        (21, other),                                  # exact dup of corpus 12
        (22, "totally novel text about mountains rivers valleys and "
             "glaciers carving stone over ten thousand slow years"),
        (23, "totally novel text about mountains rivers valleys and "
             "glaciers carving stone over ten thousand fast years"),  # dup of 22
    ]
    schema = "doc_id long, text string"
    corpus = spark.createDataFrame(corpus_rows, schema)
    batch = spark.createDataFrame(batch_rows, schema)

    got = {(r.doc_id, r.rep_id, r.is_dup)
           for r in incremental_near_dups(corpus, batch).collect()}

    union = corpus.unionByName(batch)
    sig = minhash_signatures(union)
    confirmed = verify_jaccard(union, lsh_candidate_pairs(sig)).filter(
        F.col("inter") * 10 >= F.col("uni") * 7)
    from lisp_batch_processor_spark.operators.dedup import assignment
    full = assignment(union.select("doc_id"), "doc_id",
                      confirmed, "doc_a", "doc_b")
    want = {(r.doc_id, r.rep_id, r.is_dup)
            for r in full.filter(F.col("doc_id") >= 20).collect()}

    assert got == want
    by_id = {d: (r, dup) for d, r, dup in got}
    assert by_id[20] == (10, True)     # near-dup -> earliest corpus rep
    assert by_id[21] == (12, True)     # exact dup -> corpus rep
    assert by_id[22] == (22, False)    # novel, first of its pair
    assert by_id[23] == (22, True)     # batch-internal dup -> batch rep

    # The persisted-index path must agree with the rebuild path.
    idx = banded_signatures(minhash_signatures(corpus))
    got_idx = {(r.doc_id, r.rep_id, r.is_dup)
               for r in incremental_near_dups(
                   corpus, batch, corpus_index=idx).collect()}
    assert got_idx == want

    # ... and the fully-persisted production configuration (signature
    # index + precomputed shingle verify store, corpus text never
    # touched) must agree too. Passing a poisoned corpus_docs proves
    # the per-batch plan really reads only the two stores.
    from lisp_batch_processor_spark.operators.dedup import shingle_store
    store = shingle_store(corpus)
    poisoned = corpus.withColumn(
        "text", F.lit("poisoned - must never be shingled"))
    got_store = {(r.doc_id, r.rep_id, r.is_dup)
                 for r in incremental_near_dups(
                     poisoned, batch, corpus_index=idx,
                     verify_store=store).collect()}
    assert got_store == want


def test_contraction_matches_label_propagation(spark):
    """Star-contraction CC must produce identical (node, component)
    labels to min-label propagation (the oracle twin) — on the
    chain+triangle fixture, a deep path, and a random graph — while
    converging in O(log n) rounds where propagation needs O(diameter)
    syncs."""
    import random

    from lisp_batch_processor_spark.operators.dedup import (
        connected_components,
        connected_components_contraction,
    )

    def labels(df):
        return {r.node: r.component for r in df.collect()}

    fixture = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 9), (5, 6), (6, 7), (5, 7)],
        ["doc_a", "doc_b"])
    assert (labels(connected_components_contraction(
                fixture, "doc_a", "doc_b"))
            == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5, 7: 5})

    # Deep path: 65 nodes, diameter 64. Label prop at 2 steps/sync
    # needs 32+ syncs; contraction must finish in O(log n) rounds.
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 65)], ["doc_a", "doc_b"])
    stats = {}
    got = labels(connected_components_contraction(
        path, "doc_a", "doc_b", stats=stats))
    assert got == {i: 1 for i in range(1, 66)}
    assert stats["rounds"] <= 10, f"too many rounds: {stats['rounds']}"

    # Random graph: contraction == propagation label-for-label.
    rng = random.Random(11)
    rand_edges = [(rng.randrange(200), rng.randrange(200))
                  for _ in range(120)]
    rand_edges = [(u, v) for u, v in rand_edges if u != v]
    rdf = spark.createDataFrame(rand_edges, ["doc_a", "doc_b"])
    assert (labels(connected_components_contraction(rdf, "doc_a", "doc_b"))
            == labels(connected_components(rdf, "doc_a", "doc_b",
                                           max_iter=50)))


def test_contraction_driver_sync_budget(spark):
    """Round 13: contraction pays exactly ONE driver result action
    per BURST of `rounds_per_probe` rounds (the star-forest probe,
    which doubles as the lazy checkpoints' materializer) and nothing
    else — no pre-probe of the input (a round is the identity on a
    star forest, so probing the OUTPUT is always sound), no
    count()/exceptAll/confirmation round. Pinned by counting
    DataFrame result actions during a run: a 2-round graph at the
    default rounds_per_probe=2 must fire exactly ONE first() call
    (down from 3 in the pre-burst shape) and zero count()/isEmpty()
    calls; at rounds_per_probe=1 the same graph fires one probe per
    round."""
    from lisp_batch_processor_spark.operators.dedup import (
        connected_components_contraction,
    )

    # Patch the RUNTIME class (pyspark.sql.DataFrame is an abstract
    # base in Spark 4; classic instances resolve methods on their own
    # class, so patching the base intercepts nothing).
    DataFrame = type(spark.range(1))
    calls = {"first": 0, "count": 0, "isEmpty": 0}
    saved = {n: getattr(DataFrame, n) for n in calls}

    def _wrap(name):
        def _counted(self, *a, **k):
            calls[name] += 1
            return saved[name](self, *a, **k)
        return _counted

    # Path of length 4: not a star forest, converges in 2 rounds.
    path = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], ["doc_a", "doc_b"])
    for n in calls:
        setattr(DataFrame, n, _wrap(n))
    try:
        stats = {}
        got = connected_components_contraction(
            path, "doc_a", "doc_b", stats=stats)
        labels = {r.node: r.component for r in got.collect()}
        burst_first = calls["first"]

        calls["first"] = 0
        stats1 = {}
        got1 = connected_components_contraction(
            path, "doc_a", "doc_b", stats=stats1, rounds_per_probe=1)
        labels1 = {r.node: r.component for r in got1.collect()}
        per_round_first = calls["first"]
    finally:
        for n, fn in saved.items():
            setattr(DataFrame, n, fn)
    want = {i: 1 for i in range(1, 6)}
    assert labels == want and labels1 == want
    assert calls["count"] == 0 and calls["isEmpty"] == 0
    # Default burst (2 rounds/probe): the whole 2-round convergence
    # rides ONE probe; the padded-identity invariant means no extra
    # probe is ever needed for the input.
    assert stats == {"rounds": 2, "probes": 1}, stats
    assert burst_first == stats["probes"] == 1, (burst_first, stats)
    # Per-round probing: one action per round, still no pre-probe.
    assert stats1 == {"rounds": 2, "probes": 2}, stats1
    assert per_round_first == stats1["probes"] == 2, (per_round_first,
                                                      stats1)


def test_library_operator_plans_are_scale_safe(spark, sf_dir):
    """Extend the registered-query plan audit to the round-4 LIBRARY
    operators: incremental batch-vs-corpus dedup must generate
    candidates via equi-joins only (no cartesian / broadcast nested
    loop) and stay JVM-side (no row-at-a-time Python eval)."""
    from lisp_batch_processor_spark.catalog import load
    from lisp_batch_processor_spark.operators.dedup import (
        incremental_near_dups,
    )
    from lisp_batch_processor_spark.plans.inspect import (
        assert_no_cartesian,
        physical_plan,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    out = incremental_near_dups(corpus, batch)
    assert_no_cartesian(out)
    assert "BatchEvalPython" not in physical_plan(out)


def test_ngram_verify_hashed_sets_preserve_decisions(spark, sf_dir):
    """The hashed-id verify path (round 12) must be a pure
    re-encoding: under an injective hash, pairwise intersection
    sizes — hence the >= 0.8 decision AND the reported jaccard — are
    identical to the string verify, and the operator must not DEPEND
    on the hashed path (the collision branch carries string sets).
    Pinned by (a) output equality between the current operator and a
    collision-forced run, (b) a direct check that the helper's hashed
    sets intersect exactly like the strings they encode."""
    from lisp_batch_processor_spark.catalog import load
    from lisp_batch_processor_spark.operators import dedup as D

    docs = load(spark, sf_dir, "documents")
    cur = D.ngram_jaccard_pairs(docs)

    # Force the collision branch (string verify): a real xxhash64
    # collision is not constructible on demand, so flip the in-plan
    # flag the way a colliding vocabulary would.
    real = D._hash_injective_flag
    D._hash_injective_flag = lambda freq: freq.agg(
        (F.count(F.lit(1)) < 0).alias("hash_ok"))
    try:
        fb = D.ngram_jaccard_pairs(docs)
        assert cur.exceptAll(fb).count() == 0
        assert fb.exceptAll(cur).count() == 0
    finally:
        D._hash_injective_flag = real

    # Direct helper check: on an injective vocabulary the hashed sets
    # (set_h, long arrays) are populated, the string sets are NULL,
    # and pairwise intersection sizes equal the strings'.
    t = (docs.limit(50)
         .select("doc_id", F.array_distinct(
             F.split(F.lower("text"), "[^a-z0-9]+")).alias("tok_set"))
         .withColumn("tok_set", F.filter("tok_set", lambda x: x != ""))
         .withColumn("sz", F.size("tok_set")))
    freq = (t.select(F.explode("tok_set").alias("tok"))
            .groupBy("tok").agg(F.count(F.lit(1)).alias("df")))
    hashed = D._verify_token_sets(t, freq)
    assert dict(hashed.dtypes)["set_h"] == "array<bigint>"
    assert dict(hashed.dtypes)["set_s"] == "array<string>"
    a = {r.doc_id: set(r.tok_set) for r in t.collect()}
    rows = hashed.collect()
    assert all(r.set_s is None for r in rows)
    b = {r.doc_id: set(r.set_h) for r in rows}
    ids = sorted(a)
    for i in ids[:10]:
        for jj in ids:
            if jj <= i:
                continue
            assert len(a[i] & a[jj]) == len(b[i] & b[jj])


def test_ngram_verify_gate_fires_no_job_at_build_time(spark, sf_dir):
    """Round 13 (round-12 What's-wrong #1): the injectivity gate is
    part of the query's dataflow, not a blocking driver action —
    BUILDING q_dedup_ngram must run zero driver-side RESULT actions
    (the old gate ran a vocab-wide aggregate via .first() on every
    invocation; the lazy localCheckpoints' stage materializations
    under AQE are not result actions and return no rows), and the
    1-row broadcast flag join must be the ONLY nested-loop shape,
    which the structural audit admits while still flagging unbounded
    BNLJs and cartesians."""
    from lisp_batch_processor_spark.catalog import load
    from lisp_batch_processor_spark.operators import dedup as D
    from lisp_batch_processor_spark.plans.inspect import (
        disallowed_nested_loops,
        physical_plan,
    )

    docs = load(spark, sf_dir, "documents")
    # The RUNTIME class — patching the pyspark.sql.DataFrame abstract
    # base intercepts nothing on Spark 4's classic instances.
    DataFrame = type(docs)

    def _banned(name):
        def _raise(self, *a, **k):
            raise AssertionError(
                f"plan build ran a driver result action: {name}")
        return _raise

    saved = {n: getattr(DataFrame, n)
             for n in ("first", "head", "take", "collect", "count",
                       "toPandas", "isEmpty")}
    for n in saved:
        setattr(DataFrame, n, _banned(n))
    try:
        pairs = D.ngram_jaccard_pairs(docs)
        plan = physical_plan(pairs)  # analysis/planning only
    finally:
        for n, fn in saved.items():
            setattr(DataFrame, n, fn)

    # The flag enters as a 1-row broadcast: a BNLJ the structural
    # audit can PROVE is O(rows · 1), so it is not flagged...
    assert "BroadcastNestedLoopJoin" in plan
    assert disallowed_nested_loops(pairs) == []
    # ...while a genuine unbounded BNLJ / cartesian still is.
    big_a = spark.range(100)
    big_b = spark.range(100).withColumnRenamed("id", "id2")
    assert disallowed_nested_loops(big_a.crossJoin(big_b)) != []
    # A melt-at-scale join HIDDEN IN A SCALAR SUBQUERY is flagged too:
    # physical nodes surface subqueries as logical plans pre-
    # PlanSubqueries, so the audit re-plans and walks them (round 13 —
    # the structural walk previously stopped at children()).
    sub_cross = spark.sql(
        "SELECT id, (SELECT max(a.id * b.id) "
        "FROM range(100) a CROSS JOIN range(100) b) m FROM range(10)")
    assert disallowed_nested_loops(sub_cross) != []
    # ...without flagging a bounded (<= 1 row build) subquery shape.
    sub_ok = spark.sql(
        "SELECT id, (SELECT max(id) FROM range(100)) m FROM range(10)")
    assert disallowed_nested_loops(sub_ok) == []
    # A keyless aggregate reached through a ROW-EXPANDING node is NOT
    # "provably one row": the pass-through set is a whitelist, so a
    # fan-out (explode) between the aggregate and the join keeps the
    # BNLJ flagged.
    fan = (spark.range(1).agg(F.count(F.lit(1)).alias("n"))
           .select(F.explode(F.array(F.lit(1), F.lit(2))).alias("x")))
    assert disallowed_nested_loops(big_a.crossJoin(fan)) != []


def test_simhash_fingerprint_plan_is_one_shuffle(spark, sf_dir):
    """The round-12 fix pinned structurally: the fingerprint plan has
    exactly ONE exchange (the per-doc vote aggregation) — the old
    string-keyed (doc_id, token) tf groupBy added a second, which is
    the shuffle the occurrence-vote identity removed. Regressing to
    two exchanges would silently re-pay a tokenized-corpus-sized
    string shuffle at 100 TB."""
    from lisp_batch_processor_spark.catalog import load
    from lisp_batch_processor_spark.operators.dedup import (
        simhash_fingerprints)
    from lisp_batch_processor_spark.plans.inspect import physical_plan

    docs = load(spark, sf_dir, "documents")
    plan = physical_plan(simhash_fingerprints(docs))
    # Count HASH-partitioned exchanges in the node details (the data
    # shuffles); the one RoundRobinPartitioning exchange is
    # fan_out_small_scan's deliberate small-fixture fan-out, not a
    # keyed shuffle, and disappears on multi-split inputs.
    n_hash = plan.count("hashpartitioning")
    assert n_hash == 1, plan


def test_simhash_scaled_band_width_formula():
    """Width grows with log2(N) and clamps to the md5 2-word range."""
    from lisp_batch_processor_spark.operators.dedup import (
        SIMHASH_MAX_BAND_WIDTH, simhash_band_width)

    assert simhash_band_width(1) == 15
    assert simhash_band_width(10_000) == 15          # baseline regime
    assert simhash_band_width(10**6) == 19
    assert simhash_band_width(10**9) == 29
    assert simhash_band_width(10**14) == SIMHASH_MAX_BAND_WIDTH
    widths = [simhash_band_width(10**k) for k in range(2, 13)]
    assert widths == sorted(widths)                   # monotone in N


def test_simhash_scaled_near_dups(spark):
    """The corpus-size-scaled SimHash must (a) catch exact dups at
    every width (hamming 0), (b) catch a light token edit, (c) admit
    FEWER random band collisions at wider bands — the property the
    width formula exists to buy."""
    import random

    from lisp_batch_processor_spark.operators.dedup import (
        simhash_candidate_pairs_scaled, simhash_fingerprints_wide,
        simhash_near_dups_scaled)

    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(4000)]
    rows = [(i, " ".join(rng.sample(vocab, 40))) for i in range(400)]
    rows.append((1000, rows[3][1]))                  # exact dup of 3
    # Near-dup pair: a 1-token edit of a LONG doc — SimHash's
    # hamming<=3 contract is a high-similarity bar, and a 1-in-40
    # token change flips too many near-zero vote sums (measured
    # hamming 5-7); 1-in-400 flips ~1 bit at either width.
    long_base = " ".join(rng.sample(vocab, 400))
    toks = long_base.split()
    toks[7] = "zzzedit"
    rows.append((2000, long_base))
    rows.append((2001, " ".join(toks)))              # 1-token edit of 2000
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    for width in (15, 25):
        out = {r.doc_id: (r.rep_id, r.is_dup)
               for r in simhash_near_dups_scaled(
                   docs, band_width=width).collect()}
        assert len(out) == len(rows)
        assert out[1000] == (3, True), f"exact dup missed at width {width}"
        assert out[2001] == (2000, True), f"near dup missed at width {width}"

    # Random-collision suppression: candidate pairs (pre-hamming
    # filter) at width 25 must be a subset-sized fraction of width 15.
    cands = {}
    for width in (15, 25):
        fp = simhash_fingerprints_wide(docs, width)
        cands[width] = simhash_candidate_pairs_scaled(fp, width).count()
    # Both widths contain the constructed pairs; the rest are random
    # collisions, which 10 more bits per band must crush.
    assert cands[25] < cands[15], cands
    assert cands[25] <= 2 + max(2, cands[15] // 4), cands
    assert cands[25] >= 2, cands  # the real pairs still collide


def test_incremental_index_append_stays_equal_to_full_recompute(spark):
    """The 'incremental forever' claim: after day-2's batch is
    assigned, appending its non-dup docs' signatures + shingle sets
    to the two persisted stores must make day-3's incremental run
    equal a full self-join recompute over everything kept so far —
    no drift as the stores grow by append instead of rebuild. Both
    day-2 and day-3 pass poisoned corpus text, so the whole chain
    provably runs off the stores alone."""
    from lisp_batch_processor_spark.operators.dedup import (
        assignment, banded_signatures, incremental_near_dups,
        lsh_candidate_pairs, minhash_signatures, shingle_store,
        verify_jaccard)

    base_a = BASE
    base_b = ("spark catalyst tungsten codegen arrow shuffle partition "
              "executor broadcast join aggregate window stream state "
              "watermark checkpoint parquet column prune filter push")
    novel_c = ("totally novel text about mountains rivers valleys and "
               "glaciers carving stone over ten thousand slow years")
    schema = "doc_id long, text string"
    corpus = spark.createDataFrame(
        [(10, base_a), (11, base_b)], schema)
    day2 = spark.createDataFrame(
        [(20, base_a.replace("winter", "summer")),   # dup of 10
         (21, novel_c)], schema)                     # novel -> kept
    day3 = spark.createDataFrame(
        [(30, novel_c.replace("slow", "fast")),      # dup of day-2's 21
         (31, base_a.replace("quick", "rapid")),     # dup of day-1's 10
         (32, "entirely fresh content on tide pools barnacles kelp "
              "anemones urchins and the patient rhythm of the moon")],
        schema)

    def poisoned(df):
        return df.withColumn("text", F.lit("poisoned"))

    idx = banded_signatures(minhash_signatures(corpus))
    store = shingle_store(corpus)

    out2 = incremental_near_dups(poisoned(corpus), day2,
                                 corpus_index=idx, verify_store=store)
    kept2_ids = {r.doc_id for r in out2.filter(~F.col("is_dup")).collect()}
    assert kept2_ids == {21}
    day2_kept = day2.join(
        out2.filter(~F.col("is_dup")).select("doc_id"), "doc_id")

    # Append day-2 survivors to both stores (union, no rebuild).
    idx2 = idx.unionByName(banded_signatures(minhash_signatures(day2_kept)))
    store2 = store.unionByName(shingle_store(day2_kept))
    corpus2 = corpus.unionByName(day2_kept)

    got = {(r.doc_id, r.rep_id, r.is_dup)
           for r in incremental_near_dups(
               poisoned(corpus2), day3,
               corpus_index=idx2, verify_store=store2).collect()}

    union = corpus2.unionByName(day3)
    confirmed = verify_jaccard(
        union, lsh_candidate_pairs(minhash_signatures(union))).filter(
        F.col("inter") * 10 >= F.col("uni") * 7)
    full = assignment(union.select("doc_id"), "doc_id",
                      confirmed, "doc_a", "doc_b")
    want = {(r.doc_id, r.rep_id, r.is_dup)
            for r in full.filter(F.col("doc_id") >= 30).collect()}

    assert got == want
    by_id = {d: (r, dup) for d, r, dup in got}
    assert by_id[30] == (21, True)    # matched via the APPENDED index rows
    assert by_id[31] == (10, True)    # matched via the day-1 index rows
    assert by_id[32] == (32, False)   # novel


def test_new_library_operator_plans_have_no_scale_killers(spark):
    """The plan-audit bar the 50 registered queries already pass,
    applied to the round-4 library operators: no cartesian product,
    no broadcast-nested-loop join anywhere in the collapsed-ANN,
    scaled-SimHash, or store-backed incremental-dedup plans."""
    import numpy as np

    from lisp_batch_processor_spark.operators.dedup import (
        banded_signatures, incremental_near_dups, line_dedup,
        minhash_signatures, shingle_store, simhash_near_dups_scaled)
    from lisp_batch_processor_spark.operators.similarity import (
        ann_topk_collapsed)
    from lisp_batch_processor_spark.operators.text import repetition_stats
    from lisp_batch_processor_spark.plans.inspect import assert_no_cartesian

    docs = spark.createDataFrame(
        [(i, f"some text number {i} with shared tokens alpha beta gamma")
         for i in range(30)], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(100 + i, f"fresh batch text {i} delta epsilon zeta")
         for i in range(5)], "doc_id long, text string")
    rng = np.random.default_rng(5)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=64).astype(np.float32)])
         for i in range(40)], "vec_id long, embedding array<float>")

    assert_no_cartesian(simhash_near_dups_scaled(docs, band_width=20))
    assert_no_cartesian(ann_topk_collapsed(emb))
    assert_no_cartesian(line_dedup(docs))
    assert_no_cartesian(repetition_stats(docs))
    assert_no_cartesian(incremental_near_dups(
        docs, batch,
        corpus_index=banded_signatures(minhash_signatures(docs)),
        verify_store=shingle_store(docs)))


def test_line_dedup_matches_duckdb_window_oracle(spark):
    """Global line-level dedup (C4-style boilerplate removal) vs an
    independent DuckDB window-function formulation: first corpus-wide
    occurrence by (doc_id, pos) survives, short lines are exempt,
    min_repeat gates what counts as boilerplate, empty docs rebuild
    to '' and NULL text stays NULL."""
    import duckdb

    from lisp_batch_processor_spark.operators.dedup import line_dedup

    rows = [
        (0, "alpha one\nshared banner line\nbeta two"),
        (1, "shared banner line\ngamma three\n--"),          # banner dup
        (2, "gamma three\nshared banner line\nalpha one"),   # all dups
        (3, ""),                                             # empty doc
        (4, None),                                           # null text
        (5, "--\n--\nunique tail"),                          # short exempt
        (6, "twice only\ndelta four"),
        (7, "twice only\nepsilon five"),                     # 2-occurrence
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    for min_chars, min_repeat in [(1, 2), (3, 2), (1, 3)]:
        got = {r["doc_id"]: (r["text"], r["lines_total"], r["lines_kept"])
               for r in line_dedup(docs, min_chars=min_chars,
                                   min_repeat=min_repeat).collect()}

        con = duckdb.connect()
        con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
        want = {r[0]: (r[1], r[2], r[3]) for r in con.execute(f"""
            WITH lines AS (
              -- two unnests in one SELECT are zipped in DuckDB
              SELECT doc_id,
                unnest(generate_series(1,
                    len(str_split(text, chr(10))))) - 1 AS pos,
                unnest(str_split(text, chr(10))) AS line
              FROM docs
            ), marked AS (
              SELECT doc_id, pos, line,
                CASE WHEN length(line) < {min_chars} THEN TRUE
                     WHEN COUNT(*) OVER (PARTITION BY line)
                          < {min_repeat} THEN TRUE
                     WHEN ROW_NUMBER() OVER (PARTITION BY line
                          ORDER BY doc_id, pos) = 1 THEN TRUE
                     ELSE FALSE END AS keep
              FROM lines
            ), rebuilt AS (
              SELECT doc_id,
                COALESCE(STRING_AGG(line, chr(10) ORDER BY pos)
                         FILTER (WHERE keep), '') AS text,
                COUNT(*) AS lines_total,
                COUNT(*) FILTER (WHERE keep) AS lines_kept
              FROM marked GROUP BY doc_id
            )
            SELECT d.doc_id, r.text, r.lines_total, r.lines_kept
            FROM docs d LEFT JOIN rebuilt r USING (doc_id)
        """).fetchall()}
        con.close()

        assert got == want, (min_chars, min_repeat)

    # Spot-check the default config's semantics directly.
    got = {r["doc_id"]: r["text"]
           for r in line_dedup(docs).collect()}
    assert got[0] == "alpha one\nshared banner line\nbeta two"
    # banner removed; "--" kept: it's doc 1's first corpus occurrence.
    assert got[1] == "gamma three\n--"
    assert got[2] == ""                          # every line seen earlier
    assert got[3] == ""
    assert got[4] is None


def test_span_dedup_matches_python_sliding_window_oracle(spark):
    """span_dedup (exact-substring token-window dedup) must equal a
    direct Python replay of its contract: md5-keyed W-token sliding
    windows, global first occurrence by (doc_id, pos) survives, all
    tokens covered by any other occurrence of a >=min_repeat window
    are stripped, survivors re-joined with single spaces."""
    from lisp_batch_processor_spark.operators.dedup import span_dedup

    boiler = ("all rights reserved no part of this page may be "
              "reproduced without the written permission of the owner")
    rows = [
        (0, "intro text for the very first document " + boiler +
            " and a unique closing remark about tide pools"),
        (1, "a different page entirely " + boiler +
            " followed by words never seen elsewhere in the corpus"),
        (2, boiler + " " + boiler),         # internal repetition
        (3, "short doc"),                    # < window tokens
        (4, None),                           # NULL passthrough
        (5, "  spaced    out\ttokens\nacross   lines  "),
        (6, ""),                             # empty
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    for window, min_repeat in [(8, 2), (8, 3), (12, 2)]:
        got = {r["doc_id"]: (r["text"], r["tokens_total"],
                             r["tokens_kept"])
               for r in span_dedup(docs, window=window,
                                   min_repeat=min_repeat).collect()}

        # --- Python replay ---
        toks = {d: (t.split() if t is not None else None)
                for d, t in rows}
        occ = {}   # key -> list of (doc, pos) in scan order
        for d, tk in sorted(toks.items()):
            if tk is None or len(tk) < window:
                continue
            for p in range(len(tk) - window + 1):
                occ.setdefault(" ".join(tk[p:p + window]), []).append(
                    (d, p))
        covered = {d: set() for d, _ in rows}
        for key, places in occ.items():
            if len(places) < min_repeat:
                continue
            winner = min(places)
            for d, p in places:
                if (d, p) != winner:
                    covered[d].update(range(p, p + window))
        want = {}
        for d, tk in toks.items():
            if tk is None:
                want[d] = (None, None, None)
                continue
            keep = [t for i, t in enumerate(tk) if i not in covered[d]]
            want[d] = (" ".join(keep), len(tk), len(keep))
        assert got == want, (window, min_repeat)

    # Default-config spot checks: boilerplate survives only in doc 0.
    got = {r["doc_id"]: r["text"]
           for r in span_dedup(docs, window=8).collect()}
    assert boiler in got[0]
    assert boiler not in got[1]
    assert "followed by words never seen elsewhere" in got[1]
    assert got[2] == ""          # both copies covered by doc 0's win
    assert got[3] == "short doc"
    assert got[4] is None
    assert got[5] == "spaced out tokens across lines"
    assert got[6] == ""


def _span_dedup_replay(rows, window, min_repeat):
    """Python reference for span_dedup's contract (shared by the
    fixture test above and the random-corpus fuzz below)."""
    toks = {d: (t.split() if t is not None else None) for d, t in rows}
    occ = {}
    for d, tk in sorted(toks.items()):
        if tk is None or len(tk) < window:
            continue
        for p in range(len(tk) - window + 1):
            occ.setdefault(" ".join(tk[p:p + window]), []).append((d, p))
    covered = {d: set() for d, _ in rows}
    for places in occ.values():
        if len(places) < min_repeat:
            continue
        winner = min(places)
        for d, p in places:
            if (d, p) != winner:
                covered[d].update(range(p, p + window))
    out = {}
    for d, tk in toks.items():
        if tk is None:
            out[d] = (None, None, None)
            continue
        keep = [t for i, t in enumerate(tk) if i not in covered[d]]
        out[d] = (" ".join(keep), len(tk), len(keep))
    return out


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_span_dedup_fuzz_random_corpus(spark, seed):
    """span_dedup on random corpora with heavy cross-doc window
    collisions (tiny vocabulary + planted shared passages) must equal
    the Python replay exactly — including overlapping spans, docs
    that are pure repetition, and winner ties at position grain."""
    import random

    from lisp_batch_processor_spark.operators.dedup import span_dedup

    rng = random.Random(seed)
    vocab = [f"t{i}" for i in range(12)]  # tiny: collisions abound
    passage = " ".join(rng.choice(vocab) for _ in range(9))
    rows = []
    for d in range(40):
        k = rng.randint(0, 30)
        words = [rng.choice(vocab) for _ in range(k)]
        if rng.random() < 0.4:
            ins = rng.randint(0, len(words))
            words[ins:ins] = passage.split()
        text = " ".join(words)
        if rng.random() < 0.1:
            text = text.replace(" ", "   ", 1)
        rows.append((d, text))
    rows += [(40, None), (41, ""), (42, passage + " " + passage)]

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for window, min_repeat in [(5, 2), (5, 3), (7, 2)]:
        got = {r["doc_id"]: (r["text"], r["tokens_total"],
                             r["tokens_kept"])
               for r in span_dedup(docs, window=window,
                                   min_repeat=min_repeat).collect()}
        assert got == _span_dedup_replay(rows, window, min_repeat), (
            seed, window, min_repeat)


def test_span_and_line_dedup_mega_self_repeating_doc(spark):
    """The pathological strip tail (round 14, VERDICT r13 #5): a
    fully-self-repeating mega-document — every window a duplicate of
    the winner, every occurrence removed — must still reassemble
    correctly, and cheaply: the merged-interval strip collapses its
    whole coverage to ONE interval (O(tokens) per row) where the old
    covered-position set paid O(tokens^2). Same for a document made
    of thousands of identical lines."""
    from lisp_batch_processor_spark.operators.dedup import (
        line_dedup, span_dedup)

    n = 5000
    rows = [(0, " ".join(["tok"] * n)),          # pure self-repetition
            (1, "a few honest distinct words here")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["text"], r["tokens_total"], r["tokens_kept"])
           for r in span_dedup(docs, window=8).collect()}
    assert got == _span_dedup_replay(rows, 8, 2)
    # Only the winner's first token survives: every later occurrence
    # is removed, and their coverage [1, n-1] blankets the rest of
    # the winner window itself.
    assert got[0] == ("tok", n, 1)
    assert got[1][0] == rows[1][1]

    lrows = [(0, "\n".join(["same line of boilerplate"] * 4000)),
             (1, "same line of boilerplate\nplus a novel one")]
    ldocs = spark.createDataFrame(lrows, "doc_id long, text string")
    lgot = {r["doc_id"]: (r["text"], r["lines_total"], r["lines_kept"])
            for r in line_dedup(ldocs).collect()}
    assert lgot[0] == ("same line of boilerplate", 4000, 1)
    assert lgot[1] == ("plus a novel one", 2, 1)


def test_round7_operators_never_go_cartesian(spark):
    """Plan pins for the round-7 additions: fuzzy decontamination is
    a band-bucket equi-join (eval side broadcast), semantic dedup's
    pair generation is a cell equi-join — neither may degrade to a
    cartesian/BNLJ under refactors."""
    import numpy as np

    from lisp_batch_processor_spark.operators.dedup import semantic_dedup
    from lisp_batch_processor_spark.operators.training import (
        fuzzy_contamination)
    from lisp_batch_processor_spark.plans.inspect import (
        assert_no_cartesian, physical_plan)

    docs = spark.createDataFrame(
        [(i, f"body text {i} shared alpha beta gamma delta")
         for i in range(30)], "doc_id long, text string")
    evals = spark.createDataFrame(
        [("shared alpha beta gamma delta epsilon",)], "text string")
    fz = fuzzy_contamination(docs, evals)
    assert_no_cartesian(fz)
    assert "BroadcastHashJoin" in physical_plan(fz)  # eval side small

    rng = np.random.default_rng(9)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=16)])
         for i in range(40)], "vec_id long, embedding array<double>")
    assert_no_cartesian(semantic_dedup(emb, k=4, iters=0))


def test_line_dedup_prefix_policy_matches_python_oracle(spark):
    """policy='prefix' keeps the first min_repeat-1 occurrences of a
    crossing line (corpus order by (doc_id, pos)) and everything
    under the threshold — checked against a counting Python oracle;
    and at min_repeat=2 prefix == winner exactly."""
    from lisp_batch_processor_spark.operators.dedup import line_dedup

    docs = [(0, "A\nB"), (1, "A\nC"), (2, "A\nB\nA"), (3, None),
            (4, "")]
    schema = "doc_id long, text string"
    df = spark.createDataFrame(docs, schema)

    def oracle(k):
        seen: dict = {}
        out = {}
        for d, t in sorted(docs):
            if t is None:
                out[d] = (None, None, None)
                continue
            lines = t.split("\n")
            kept = []
            for ln in lines:
                seen[ln] = seen.get(ln, 0) + 1
                kept.append((ln, seen[ln]))
            out[d] = (lines, kept)
        total = seen
        res = {}
        for d, t in sorted(docs):
            if t is None:
                res[d] = (None, None, None)
                continue
            lines, kept = out[d]
            surv = [ln for ln, idx in kept
                    if total[ln] < k or idx <= k - 1]
            res[d] = ("\n".join(surv), len(lines), len(surv))
        return res

    got = {r.doc_id: (r.text, r.lines_total, r.lines_kept)
           for r in line_dedup(df, min_repeat=3,
                               policy="prefix").collect()}
    assert got == oracle(3)
    # The crossing line specifically: A keeps its first TWO
    # occurrences under prefix (winner would keep one).
    assert got[2] == ("B", 3, 1)
    assert got[0] == ("A\nB", 2, 2)
    assert got[1] == ("A\nC", 2, 2)

    # prefix == winner at min_repeat=2.
    p2 = {r.doc_id: (r.text, r.lines_total, r.lines_kept)
          for r in line_dedup(df, min_repeat=2,
                              policy="prefix").collect()}
    w2 = {r.doc_id: (r.text, r.lines_total, r.lines_kept)
          for r in line_dedup(df, min_repeat=2).collect()}
    assert p2 == w2

    with pytest.raises(ValueError, match="policy"):
        line_dedup(df, policy="nope").collect()


def test_incremental_semantic_plan_has_no_cartesian(spark):
    """The streaming semantic twin's per-epoch plan: both candidate
    joins (batch-vs-store and batch-vs-batch) are cell-keyed
    equi-joins — never a cartesian/BNLJ — and the prefix-policy
    line_dedup keeps the same guarantee."""
    import numpy as np

    from lisp_batch_processor_spark.operators.dedup import (
        incremental_semantic_dups, line_dedup)
    from lisp_batch_processor_spark.operators.similarity import ivf_train
    from lisp_batch_processor_spark.plans.inspect import (
        assert_no_cartesian)

    rng = np.random.default_rng(11)
    mk = lambda ids: spark.createDataFrame(  # noqa: E731
        [(i, [float(x) for x in rng.normal(size=16)]) for i in ids],
        "vec_id long, embedding array<double>")
    corpus = mk(range(30))
    cents = ivf_train(corpus, k=3)
    from lisp_batch_processor_spark.operators.similarity import (
        _ivf_cells_udf)
    one_cell = _ivf_cells_udf(cents, 1)
    store = corpus.select("vec_id",
                          one_cell("embedding")[0].alias("cell"),
                          "embedding")
    asg, _celled = incremental_semantic_dups(mk(range(100, 110)),
                                             cents, store)
    assert_no_cartesian(asg)
    docs = spark.createDataFrame(
        [(i, f"line a{i}\nline b{i}") for i in range(10)],
        "doc_id long, text string")
    assert_no_cartesian(line_dedup(docs, min_repeat=3,
                                   policy="prefix"))
