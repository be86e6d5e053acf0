"""End-to-end corpus-assembly pipeline (pipelines/corpus.py).

One seeded corpus with a planted artifact for every stage — an exact
URL duplicate, corpus-wide boilerplate lines, a verbatim 25-token
passage pasted into two docs, a MinHash near-dup pair, a Gopher
repetition violator, hygiene rejects (empty/NULL text), and
benchmark-contaminated docs engineered (by split-hash probing) to
land one in train and one in val — then end-state assertions: every
plant removed at exactly its stage, per-stage CollectMetrics counters
chain, no contaminated doc in train, pack budgets respected, and the
whole assembly is a pure function of (corpus, knobs, salt).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lisp_batch_processor_spark.operators.training import split_assign
from lisp_batch_processor_spark.pipelines import assemble_corpus

SALT = "corpus-e2e"
SPLITS = (("train", 0.8), ("val", 0.1), ("test", 0.1))
COMMON = ["alpha", "beta", "gamma", "delta",
          "epsilon", "zeta", "eta", "theta"]
BOILERPLATE = "please subscribe to the newsletter today friends ok"
PASSAGE = " ".join(f"pass{k}" for k in range(25))
EVAL_PASSAGE = ("quantum turbines hum beneath the ancient "
                "observatory deck tonight stars")


def base_text(i: int) -> str:
    """3 lines x 12 tokens; every 3rd token is doc-unique, so no two
    docs share ANY 3-shingle (near-dup-inert) or 20-window
    (span-inert), and every line is corpus-unique (line-inert), while
    the scaffold bigrams repeat corpus-wide (LM-trainable)."""
    lines = []
    for j in range(3):
        toks = []
        for k in range(4):
            m = 2 * (j * 4 + k)
            toks += [COMMON[m % 8], COMMON[(m + 1) % 8], f"u{i}x{j}x{k}"]
        lines.append(" ".join(toks))
    return "\n".join(lines)


def neardup_text(doc: int) -> str:
    """Four 20-token periods: 19 tokens shared between docs 80/81 +
    1 doc-unique token, so no 20-token window is shared (span-safe)
    while 3-shingle Jaccard is 66/90 = 0.733 (caught by LSH and
    confirmed at the test's 0.6 threshold)."""
    periods = []
    for p in range(4):
        run = [f"nd{p}w{k}" for k in range(19)] + [f"u{doc}p{p}"]
        periods.append(" ".join(run))
    return " ".join(periods[:2]) + "\n" + " ".join(periods[2:])


def seed_corpus(spark, train_id: int, val_id: int):
    rows = []
    for i in range(1, 41):                    # base docs
        rows.append((i, f"https://site{i}.example.com/p", base_text(i)))
    # exact canonical-URL duplicate pair: 50 (min id) survives
    rows.append((50, "https://WWW.Example.com:443/article?utm_source=tw&id=7",
                 base_text(50)))
    rows.append((51, "https://example.com/article?id=7", base_text(51)))
    # corpus-wide boilerplate line: first occurrence (doc 60) keeps it
    for i in range(60, 65):
        rows.append((i, f"https://b{i}.example.com/", base_text(i)
                     + "\n" + BOILERPLATE))
    # verbatim 25-token passage pasted mid-line into two docs:
    # doc 70's occurrence is first, doc 71's gets stripped
    rows.append((70, "https://s70.example.com/",
                 f"intro70a intro70b {PASSAGE} outro70a outro70b\n"
                 + base_text(70)))
    rows.append((71, "https://s71.example.com/",
                 f"intro71a intro71b {PASSAGE} outro71a outro71b\n"
                 + base_text(71)))
    # near-dup pair: doc 81 assigned rep 80, dropped
    rows.append((80, "https://s80.example.com/", neardup_text(80)))
    rows.append((81, "https://s81.example.com/", neardup_text(81)))
    # Gopher violator: one bigram covers ~70% of chars (18 tokens --
    # too short for the 20-token span window to touch)
    rows.append((90, "https://s90.example.com/",
                 "click here " * 9 + "\nending90 unique90a unique90b"))
    # ingest hygiene: empty text, NULL text, unparseable URL
    rows.append((95, "https://s95.example.com/", ""))
    rows.append((96, "https://s96.example.com/", None))
    rows.append((97, "notaurl", base_text(97)))
    # benchmark-contaminated docs: one split-hashed to train (must be
    # dropped), one to val (kept, flagged)
    for i in (train_id, val_id):
        rows.append((i, f"https://c{i}.example.com/",
                     base_text(i) + f"\nprefix{i} {EVAL_PASSAGE} suffix{i}"))
    return spark.createDataFrame(rows, "doc_id bigint, url string, text string")


def probe_split(spark, want: str, salt: str) -> int:
    """Smallest doc_id in [200, 400) that split_assign hashes to
    `want` under the pipeline's derived split salt — deterministic."""
    probe = spark.range(200, 400).withColumnRenamed("id", "doc_id")
    hit = (split_assign(probe, splits=SPLITS, salt=salt)
           .filter(F.col("split") == want)
           .agg(F.min("doc_id")).first()[0])
    assert hit is not None
    return int(hit)


@pytest.fixture(scope="module")
def assembly(spark, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("corpus_e2e"))
    train_id = probe_split(spark, "train", f"{SALT}/split")
    val_id = probe_split(spark, "val", f"{SALT}/split")
    docs = seed_corpus(spark, train_id, val_id)
    eval_docs = spark.createDataFrame(
        [(f"report says {EVAL_PASSAGE} end",),
         ("unrelated benchmark prompt with its own distinct words",)],
        "text string")
    out = assemble_corpus(
        spark, docs, eval_docs, wd,
        jaccard_num=3, jaccard_den=5,   # 0.6: margin over the 0.733 plant
        ppl_max=1e9,                    # exercise the LM path, drop nothing
        splits=SPLITS, pack_budget=64, pack_buckets=4, salt=SALT)
    return out, train_id, val_id


@pytest.mark.slow
def test_stage_counters_chain(assembly):
    out, train_id, val_id = assembly
    c = out.counters()
    assert list(c) == ["url_dedup", "line_dedup", "span_dedup", "near_dup",
                       "quality", "split", "pack", "shuffle"]
    # ingest saw all 57 docs; dropped the URL dup + empty + NULL text
    assert c["url_dedup"] == {"rows_in": 57, "rows_out": 54,
                              "n_ok": 53, "n_err": 1}  # err: unparseable URL
    # line dedup drops no DOC; 4 docs lost their boilerplate copy
    assert c["line_dedup"] == {"rows_in": 54, "rows_out": 54,
                               "n_ok": 50, "n_err": 4}
    # span dedup strips exactly doc 71's pasted passage
    assert c["span_dedup"] == {"rows_in": 54, "rows_out": 54,
                               "n_ok": 53, "n_err": 1}
    # near-dup drops doc 81 (rep 80); quality drops the Gopher violator
    assert (c["near_dup"]["rows_in"], c["near_dup"]["rows_out"]) == (54, 53)
    assert (c["quality"]["rows_in"], c["quality"]["rows_out"]) == (53, 52)
    # split drops the train-assigned contaminated doc, flags the val one
    assert c["split"] == {"rows_in": 52, "rows_out": 51,
                          "n_ok": 50, "n_err": 1}
    # pack/shuffle: every train doc exactly once, no row lost
    assert c["pack"]["rows_out"] == c["pack"]["rows_in"]
    assert c["shuffle"] == {"rows_in": c["pack"]["rows_out"],
                            "rows_out": c["pack"]["rows_out"],
                            "n_ok": c["pack"]["rows_out"], "n_err": 0}


def test_planted_artifacts_removed_at_their_stage(spark, assembly):
    out, train_id, val_id = assembly
    ids = lambda p: {r.doc_id for r in
                     spark.read.parquet(p).select("doc_id").collect()}
    s1 = ids(out.stage("url_dedup").path)
    assert 50 in s1 and 51 not in s1 and 95 not in s1 and 96 not in s1
    assert 97 in s1                      # unparseable URL survives, flagged
    # boilerplate: doc 60 keeps the line, 61-64 lose it, all survive
    ld = {r.doc_id: r for r in
          spark.read.parquet(out.stage("line_dedup").path).collect()}
    assert BOILERPLATE in ld[60].text
    for i in range(61, 65):
        assert BOILERPLATE not in ld[i].text
        assert (ld[i].lines_total, ld[i].lines_kept) == (4, 3)
    # span: doc 70 keeps the passage, doc 71 loses exactly its tokens
    sd = {r.doc_id: r for r in
          spark.read.parquet(out.stage("span_dedup").path).collect()}
    assert PASSAGE in sd[70].text and PASSAGE not in sd[71].text
    assert sd[71].tokens_total - sd[71].tokens_kept == 25
    # near-dup: 81 gone, 80 kept; quality: 90 gone
    s4 = ids(out.stage("near_dup").path)
    assert 80 in s4 and 81 not in s4 and 90 in s4
    s5 = ids(out.stage("quality").path)
    assert 90 not in s5
    # LM path ran: every surviving doc has a finite perplexity
    q = spark.read.parquet(out.stage("quality").path)
    assert q.filter(F.col("ppl").isNull()).count() == 0


def test_no_contaminated_doc_in_train(spark, assembly):
    out, train_id, val_id = assembly
    split = spark.read.parquet(out.split_path)
    assert split.filter((F.col("split") == "train")
                        & F.col("contaminated")).count() == 0
    rows = {r.doc_id: r for r in split
            .filter(F.col("doc_id").isin(train_id, val_id)).collect()}
    assert train_id not in rows          # dropped from train
    assert rows[val_id].split == "val" and rows[val_id].contaminated
    # and the final training order never saw it either
    order_ids = {r.doc_id for r in spark.read
                 .parquet(out.train_order_path).select("doc_id").collect()}
    assert train_id not in order_ids
    for gone in (51, 81, 90, 95, 96):
        assert gone not in order_ids


def test_pack_budget_and_coverage(spark, assembly):
    out, _, _ = assembly
    train_ids = {r.doc_id for r in spark.read.parquet(out.split_path)
                 .filter(F.col("split") == "train")
                 .select("doc_id").collect()}
    packs = spark.read.parquet(out.stage("pack").path)
    assert {r.doc_id for r in packs.select("doc_id").collect()} == train_ids
    assert packs.count() == len(train_ids)          # each doc exactly once
    over = (packs.groupBy("pack_id").agg(F.sum("n_tokens").alias("t"))
            .filter(F.col("t") > 64).count())
    assert over == 0
    # final order: packs contiguous, docs in pos order inside each pack
    ordered = spark.read.parquet(out.train_order_path).collect()
    seen, last = {}, None
    for r in sorted(ordered, key=lambda r: (r.shuffle_key, r.pack_id, r.pos)):
        if r.pack_id != last:
            assert r.pack_id not in seen, "pack split across the order"
            seen[r.pack_id] = -1
            last = r.pack_id
        assert r.pos == seen[r.pack_id] + 1
        seen[r.pack_id] = r.pos


def test_meta_side_table_rejoins(spark, assembly):
    out, _, _ = assembly
    meta = spark.read.parquet(out.meta_path)
    assert set(meta.columns) == {"doc_id", "url", "norm_url"}
    # provenance for every final doc is recoverable
    order = spark.read.parquet(out.train_order_path).select("doc_id")
    assert order.join(meta, "doc_id", "left_anti").count() == 0


@pytest.mark.slow
def test_assembly_is_deterministic(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"https://d{i}.example.com/", base_text(i))
         for i in range(1, 16)],
        "doc_id bigint, url string, text string")
    evals = spark.createDataFrame(
        [("benchmark only words never in corpus at all today forever",)],
        "text string")

    def run(tag, salt):
        out = assemble_corpus(spark, docs, evals, str(tmp_path / tag),
                              pack_budget=64, pack_buckets=2, salt=salt)
        rows = spark.read.parquet(out.train_order_path).collect()
        return sorted((r.shuffle_key, r.pack_id, r.pos, r.doc_id,
                       r.n_tokens, r.text) for r in rows)

    a = run("a", "det-v1")
    b = run("b", "det-v1")
    assert a == b                        # bit-identical rerun
    c = run("c", "det-v2")
    assert [t[3] for t in a] != [t[3] for t in c]   # fresh order per salt
