"""Streaming corpus ingest (pipelines/ingest.py): epoch concatenation
equals the batch reference on ingest-ordered ids, epochs are
replay-safe against their own store appends, the foreachBatch wrapper
round-trips through a real stream, and both store backends agree.

Planted artifacts, one per dedup axis and epoch relationship:
cross-epoch and within-epoch canonical-URL dups, a cross-epoch
boilerplate line, cross-epoch and within-epoch MinHash near-dup
pairs, a Gopher violator, hygiene rejects, and an unparseable URL
that must survive (flagged, never dropped).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lisp_batch_processor_spark.pipelines import (
    corpus_ingest_batch, corpus_ingest_epoch, corpus_ingest_init,
    corpus_read, start_corpus_ingest, streaming_corpus_ingest)

SCHEMA = "doc_id bigint, url string, text string"
BOILER = "please subscribe to the newsletter today friends ok"


pytestmark = pytest.mark.slow  # whole-module streaming-lifecycle tier


def base_text(i: int) -> str:
    lines = []
    for j in range(3):
        toks = []
        for k in range(4):
            m = 2 * (j * 4 + k)
            toks += [f"c{m % 8}", f"c{(m + 1) % 8}", f"u{i}x{j}x{k}"]
        lines.append(" ".join(toks))
    return "\n".join(lines)


def neardup_text(tag: str, doc: int) -> str:
    periods = []
    for p in range(4):
        run = [f"{tag}{p}w{k}" for k in range(19)] + [f"u{doc}p{p}"]
        periods.append(" ".join(run))
    return " ".join(periods[:2]) + "\n" + " ".join(periods[2:])


def epochs(spark):
    e0 = [(1, "https://example.com/a?utm_source=x&id=1", base_text(1)),
          (2, "https://dup.example.com/page?id=2", base_text(2)),
          (3, "https://DUP.example.com:443/page?id=2", base_text(3)),
          (4, "https://s4.example.com/", base_text(4) + "\n" + BOILER),
          (5, "https://s5.example.com/", neardup_text("nda", 5)),
          (6, "notaurl", base_text(6))]
    e1 = [(20, "https://s20.example.com/", base_text(20) + "\n" + BOILER),
          (21, "https://s21.example.com/", neardup_text("nda", 21)),
          (22, "https://s22.example.com/", neardup_text("ndb", 22)),
          (23, "https://s23.example.com/", neardup_text("ndb", 23))]
    e2 = [(30, "https://WWW.Example.com/a?id=1", base_text(30)),
          (31, "https://s31.example.com/",
           "click here " * 9 + "\nending31 unique31a unique31b"),
          (32, "https://s32.example.com/", ""),
          (33, "https://s33.example.com/", None),
          (34, "https://s34.example.com/", base_text(34))]
    mk = lambda rows: spark.createDataFrame(rows, SCHEMA)
    return mk(e0), mk(e1), mk(e2), mk(e0 + e1 + e2)


def rows_of(df):
    return sorted((r.doc_id, r.url, r.norm_url, r.text)
                  for r in df.collect())


@pytest.fixture(scope="module")
def batch_reference(spark):
    *_, full = epochs(spark)
    return rows_of(corpus_ingest_batch(full))


def test_epoch_concat_equals_batch(spark, tmp_path, batch_reference):
    sd = str(tmp_path / "state")
    corpus_ingest_init(spark, sd)
    e0, e1, e2, _full = epochs(spark)
    outs = [corpus_ingest_epoch(b, sd, e)
            for e, b in enumerate((e0, e1, e2))]
    got = sorted(sum((rows_of(o) for o in outs), []))
    assert got == batch_reference
    ids = {t[0] for t in got}
    assert 3 not in ids        # within-epoch URL dup of doc 2
    assert 30 not in ids       # cross-epoch URL dup of doc 1
    assert 21 not in ids       # cross-epoch near-dup of doc 5
    assert 23 not in ids       # within-epoch near-dup of doc 22
    assert 31 not in ids       # Gopher violator
    assert not {32, 33} & ids  # hygiene rejects
    assert 6 in ids            # unparseable URL survives
    by_id = {t[0]: t for t in got}
    assert by_id[6][2] is None                 # ... flagged by NULL key
    # cross-epoch boilerplate: doc 4 keeps the line, doc 20 lost it
    assert BOILER in by_id[4][3] and BOILER not in by_id[20][3]


def test_epoch_replay_is_identical(spark, tmp_path, batch_reference):
    sd = str(tmp_path / "state")
    corpus_ingest_init(spark, sd)
    e0, e1, e2, _full = epochs(spark)
    out0 = rows_of(corpus_ingest_epoch(e0, sd, 0))
    out1 = rows_of(corpus_ingest_epoch(e1, sd, 1))
    # Crash between epoch 1's store appends and its commit: the
    # replay must recompute the identical output against stores that
    # already contain its own appends.
    replayed = rows_of(corpus_ingest_epoch(e1, sd, 1))
    assert replayed == out1
    out2 = rows_of(corpus_ingest_epoch(e2, sd, 2))
    assert sorted(out0 + replayed + out2) == batch_reference


def test_streaming_twin_round_trips(spark, tmp_path, batch_reference):
    sd = str(tmp_path / "state")
    corpus_ingest_init(spark, sd)
    e0, e1, e2, _full = epochs(spark)
    src = os.path.join(str(tmp_path), "docs_in")
    for i, b in enumerate((e0, e1, e2)):
        b.coalesce(1).write.parquet(os.path.join(src, f"batch={i}"))
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "batch=*")))
    corpus = os.path.join(str(tmp_path), "corpus")
    seen: dict[int, int] = {}
    # Through the documented entry point: one checkpoint_dir becomes
    # BOTH the checkpointLocation and the lineage token, and the
    # epoch-concat == batch pin must hold through it unchanged.
    q = start_corpus_ingest(
        stream, sd, corpus, os.path.join(str(tmp_path), "ckpt"),
        sink=lambda out, eid: seen.setdefault(eid, out.count()))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(seen) == 3
    assert rows_of(corpus_read(spark, corpus)) == batch_reference
    # the durable corpus is epoch-tagged
    tags = {r.epoch_id for r in spark.read.parquet(corpus)
            .select("epoch_id").distinct().collect()}
    assert tags == {0, 1, 2}


def test_versioned_backend_agrees(spark, tmp_path, batch_reference):
    sd = str(tmp_path / "state_v")
    corpus_ingest_init(spark, sd, backend="versioned")
    e0, e1, e2, _full = epochs(spark)
    got = sorted(sum((rows_of(corpus_ingest_epoch(b, sd, e))
                      for e, b in enumerate((e0, e1, e2))), []))
    assert got == batch_reference
    # state really lives in pointer-committed version dirs
    assert os.path.exists(os.path.join(sd, "url_store",
                                       "_versioned_store"))


def test_ingested_corpus_feeds_batch_assembly(spark, tmp_path,
                                              batch_reference):
    """The composition contract: corpus_read output is a valid docs
    input to assemble_corpus, whose ingest-side stages become no-ops
    (already deduped) — rows_in == rows_out for stages 1/2/4."""
    from lisp_batch_processor_spark.pipelines import assemble_corpus
    sd = str(tmp_path / "state")
    corpus_ingest_init(spark, sd)
    e0, e1, e2, _full = epochs(spark)
    parts = [corpus_ingest_epoch(b, sd, e)
             for e, b in enumerate((e0, e1, e2))]
    ingested = parts[0]
    for p in parts[1:]:
        ingested = ingested.unionByName(p)
    evals = spark.createDataFrame(
        [("benchmark only words never in corpus at all today forever",)],
        "text string")
    out = assemble_corpus(spark, ingested.select("doc_id", "url", "text"),
                          evals, str(tmp_path / "asm"),
                          pack_budget=64, pack_buckets=2,
                          salt="ingest-asm")
    c = out.counters()
    n = len(batch_reference)
    assert c["url_dedup"] == {"rows_in": n, "rows_out": n,
                              "n_ok": n - 1, "n_err": 1}
    assert (c["line_dedup"]["rows_in"], c["line_dedup"]["rows_out"]) \
        == (n, n)
    assert c["line_dedup"]["n_err"] == 0      # no line re-stripped
    assert (c["near_dup"]["rows_in"], c["near_dup"]["rows_out"]) \
        == (n, n)
    assert (c["quality"]["rows_in"], c["quality"]["rows_out"]) == (n, n)


def test_seeded_stores_suppress_history_dups(spark, tmp_path):
    """corpus_ingest_seed migrates an existing corpus into the
    stores: a later epoch's URL dup, boilerplate line, and near-dup
    OF THE SEED are all suppressed, while novel docs pass."""
    from lisp_batch_processor_spark.pipelines import corpus_ingest_seed

    sd = str(tmp_path / "state")
    corpus_ingest_init(spark, sd)
    seed = spark.createDataFrame(
        [(1, "https://seeded.example.com/a?utm_source=x", base_text(1)),
         (2, "https://s2.example.com/", base_text(2) + "\n" + BOILER),
         (3, "https://s3.example.com/", neardup_text("nda", 3))],
        SCHEMA)
    corpus_ingest_seed(seed, sd)
    batch = spark.createDataFrame(
        [(10, "https://SEEDED.example.com/a", base_text(10)),  # URL dup
         (11, "https://s11.example.com/", base_text(11) + "\n" + BOILER),
         (12, "https://s12.example.com/", neardup_text("nda", 12)),
         (13, "https://s13.example.com/", base_text(13))],     # novel
        SCHEMA)
    out = {r.doc_id: r for r in
           corpus_ingest_epoch(batch, sd, 0).collect()}
    assert set(out) == {11, 13}            # 10 = seed URL, 12 = seed near-dup
    assert BOILER not in out[11].text      # seed line stripped
    assert out[13].text == base_text(13)   # novel doc untouched


def test_redacted_ingest_epoch_concat_equals_batch(spark, tmp_path):
    """`redact_kinds` threads through both twins at the same point
    (after URL winner selection, before line keying) — the epoch
    concatenation still equals the batch reference, and the scrub is
    visible in the surviving text."""
    e0, e1, e2, full = epochs(spark)
    mail = spark.createDataFrame(
        [(40, "https://s40.example.com/",
          base_text(40) + "\nwrite to alice@example.org or 10.0.0.7")],
        SCHEMA)
    e2m, fullm = e2.unionByName(mail), full.unionByName(mail)
    kinds = ("email", "ipv4")
    ref = rows_of(corpus_ingest_batch(fullm, redact_kinds=kinds))
    sd = str(tmp_path / "state")
    corpus_ingest_init(spark, sd)
    outs = [corpus_ingest_epoch(b, sd, e, redact_kinds=kinds)
            for e, b in enumerate((e0, e1, e2m))]
    got = sorted(sum((rows_of(o) for o in outs), []))
    assert got == ref
    by_id = {t[0]: t for t in got}
    assert "[EMAIL]" in by_id[40][3] and "[IPV4]" in by_id[40][3]
    assert "alice@example.org" not in by_id[40][3]


def test_ingest_report_accounts_for_store_state(spark, tmp_path):
    from lisp_batch_processor_spark.pipelines import ingest_report

    sd = str(tmp_path / "state")
    cp = str(tmp_path / "corpus")
    corpus_ingest_init(spark, sd)
    from lisp_batch_processor_spark.sources.writers import (
        versioned_store_init)
    versioned_store_init(spark, cp)
    e0, e1, _e2, _full = epochs(spark)
    outs = [corpus_ingest_epoch(b, sd, e)
            for e, b in enumerate((e0, e1))]
    from lisp_batch_processor_spark.sources.writers import store_append
    for e, o in enumerate(outs):
        store_append(o.withColumn("epoch_id", F.lit(e).cast("long")), cp)
    rep = ingest_report(spark, sd, corpus_path=cp)
    assert set(rep) == {"url", "line", "index", "shingles", "corpus",
                        "lineage"}
    # The recorded stream identity (round-10 contract): these
    # tokenless epochs pinned the high-water mark only.
    assert rep["lineage"]["high_water_epoch"] == 1
    assert "lineage" not in rep["lineage"]
    assert rep["corpus"]["rows"] == sum(o.count() for o in outs)
    assert rep["corpus"]["epochs"] == {"min": 0, "max": 1, "distinct": 2}
    assert rep["url"]["epochs"]["max"] == 1
    # URL store holds one key per surviving canonical URL.
    assert rep["url"]["rows"] == spark.read.parquet(
        f"{sd}/url_store").count()
    assert all(v["files"] >= 1 for k, v in rep.items()
               if k != "lineage")
    # Backend observability: the mixed deployment is visible — swap
    # stores report their backend (no live lease between epochs),
    # the versioned corpus reports its committed version count.
    assert rep["url"]["backend"] == "swap"
    assert "lease_holder" not in rep["url"]
    assert rep["corpus"]["backend"] == "versioned"
    assert rep["corpus"]["versions"] >= 1
    # A live lease (crashed maintenance writer) is surfaced.
    from lisp_batch_processor_spark.sources.writers import (
        acquire_lease, release_lease)
    acquire_lease(spark, f"{sd}/line_store", owner="crashed", ttl_s=60)
    assert ingest_report(spark, sd)["line"]["lease_holder"] == "crashed"
    release_lease(spark, f"{sd}/line_store", "crashed")
    # An empty (never-appended) store reads as zeros, not an error.
    sd2 = str(tmp_path / "state2")
    corpus_ingest_init(spark, sd2)
    rep2 = ingest_report(spark, sd2)
    assert rep2["url"]["rows"] == 0 and "epochs" not in rep2["url"]

    # With semantic stores present the report names the occupancy
    # path the reseed trigger would take: "ledger" when the O(k)
    # cell-count store exists, "full_scan" for an adopted pre-ledger
    # dir (run semantic_counts_seed) — and flips once backfilled.
    import shutil

    from lisp_batch_processor_spark.streaming.dedup import (
        semantic_counts_seed, semantic_store_seed)
    semantic_store_seed(
        spark.createDataFrame([(1, _e(0)), (2, _e(1))],
                              "vec_id long, embedding array<double>"),
        sd2, k=1)
    rep3 = ingest_report(spark, sd2)
    assert rep3["sem_occupancy_path"] == "ledger"
    assert "sem_cellcounts" in rep3
    shutil.rmtree(os.path.join(sd2, "sem_cellcounts"))
    rep4 = ingest_report(spark, sd2)
    assert rep4["sem_occupancy_path"] == "full_scan"
    assert "sem_cellcounts" not in rep4
    semantic_counts_seed(spark, sd2)
    assert ingest_report(spark, sd2)["sem_occupancy_path"] == "ledger"


@pytest.mark.parametrize("backend", ["swap", "versioned"])
def test_compact_every_bounds_files_and_preserves_equality(
        spark, tmp_path, batch_reference, backend):
    """The self-scheduled maintenance hook (VERDICT r7 ask #1): with
    compact_every=1 every epoch is followed by a full store fold, on
    both backends — the epoch concatenation must STILL equal the
    batch reference, a replay landing AFTER a compaction boundary
    must still be identical, and every store ends at a bounded file
    count (vs the uncompacted twin's per-epoch accretion)."""
    from lisp_batch_processor_spark.pipelines import (
        corpus_ingest_compact, ingest_report)

    e0, e1, e2, _full = epochs(spark)
    batches = (e0, e1, e2)

    # Uncompacted twin for the file-count comparison.
    sd_raw = str(tmp_path / f"raw_{backend}")
    corpus_ingest_init(spark, sd_raw, backend=backend)
    raw_outs = [rows_of(corpus_ingest_epoch(b, sd_raw, e))
                for e, b in enumerate(batches)]

    sd = str(tmp_path / f"hooked_{backend}")
    corpus = os.path.join(str(tmp_path), f"corpus_{backend}")
    corpus_ingest_init(spark, sd, backend=backend)
    from lisp_batch_processor_spark.sources.writers import store_append
    outs = []
    for e, b in enumerate(batches):
        out = corpus_ingest_epoch(b, sd, e)
        store_append(out.withColumn("epoch_id",
                                    F.lit(e).cast("long")), corpus)
        outs.append(rows_of(out))
        # The compact_every=1 schedule, as the foreachBatch hook
        # runs it (inside the single-writer window).
        corpus_ingest_compact(spark, sd, corpus)
    assert sorted(sum(outs, [])) == batch_reference
    assert [rows_of(corpus_read(spark, corpus))] == \
        [sorted(batch_reference)]
    assert outs == raw_outs  # per-epoch outputs unaffected by folds

    # Replay across a compaction boundary: epoch 2 re-runs AFTER its
    # own appends were folded/compacted — identical rows.
    replay = rows_of(corpus_ingest_epoch(e2, sd, 2))
    assert replay == outs[2]

    # Bounded files: each store's committed file count stays at or
    # below the uncompacted twin's, and the epoch-tagged stores fold
    # to (base + live) epochs only.
    hooked = ingest_report(spark, sd, corpus)
    raw = ingest_report(spark, sd_raw)
    for store in ("url", "line", "index", "shingles"):
        assert hooked[store]["files"] <= raw[store]["files"], store
        assert hooked[store]["files"] <= 2, store  # size-targeted
    assert hooked["url"]["epochs"]["distinct"] <= 2
    assert hooked["line"]["epochs"]["distinct"] <= 2
    assert hooked["corpus"]["files"] <= 2


def test_streaming_hook_self_schedules_compaction(spark, tmp_path,
                                                  batch_reference):
    """compact_every wired through the real foreachBatch wrapper:
    3 epochs with compact_every=1 -> the epoch-2 pass has >= 2
    foldable epochs and folds them; results equal the batch
    reference and the line/URL stores show the fold (epoch -1 base
    present)."""
    from lisp_batch_processor_spark.pipelines import ingest_report

    sd = str(tmp_path / "state")
    corpus_ingest_init(spark, sd)
    e0, e1, e2, _full = epochs(spark)
    src = os.path.join(str(tmp_path), "docs_in")
    for i, b in enumerate((e0, e1, e2)):
        b.coalesce(1).write.parquet(os.path.join(src, f"batch={i}"))
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "batch=*")))
    corpus = os.path.join(str(tmp_path), "corpus")
    writer = streaming_corpus_ingest(stream, sd, corpus,
                                     compact_every=1)
    q = writer.option("checkpointLocation",
                      os.path.join(str(tmp_path), "ckpt")).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert rows_of(corpus_read(spark, corpus)) == batch_reference
    # The epoch-2 fold ran: epochs {0,1} collapsed to the -1 base.
    rep = ingest_report(spark, sd, corpus)
    assert rep["url"]["epochs"]["min"] == -1
    assert rep["line"]["epochs"]["min"] == -1


def test_line_min_repeat3_epoch_concat_equals_batch(spark, tmp_path):
    """The line_min_repeat knob composes through the ingest pipeline:
    at k=3 (epoch-tagged COUNTS, prefix policy) a line planted once
    per epoch keeps its first two occurrences and loses the third —
    and the epoch concatenation still equals the batch reference."""
    sd = str(tmp_path / "state")
    corpus_ingest_init(spark, sd)
    e0, e1, e2, _full = epochs(spark)
    # Plant the boilerplate line into one *surviving* doc per epoch:
    # docs 4 (e0) and 20 (e1) already carry it; add it to doc 34 (e2).
    e2b = e2.withColumn(
        "text",
        F.when(F.col("doc_id") == 34,
               F.concat(F.col("text"), F.lit("\n" + BOILER)))
        .otherwise(F.col("text")))
    outs = [corpus_ingest_epoch(b, sd, e, line_min_repeat=3)
            for e, b in enumerate((e0, e1, e2b))]
    got = sorted(sum((rows_of(o) for o in outs), []))
    full = e0.unionByName(e1).unionByName(e2b)
    want = sorted(rows_of(corpus_ingest_batch(full, line_min_repeat=3)))
    assert got == want
    by_id = {t[0]: t for t in got}
    # First two occurrences survive (docs 4 and 20), third stripped.
    assert BOILER in by_id[4][3]
    assert BOILER in by_id[20][3]
    assert BOILER not in by_id[34][3]


def test_seeded_counts_make_min_repeat3_exact(spark, tmp_path):
    """corpus_ingest_seed records line COUNTS (not just membership),
    so a min_repeat=3 ingest continuing from a seeded corpus sees
    exact priors: a line occurring twice in the seed is saturated
    (stripped from epoch docs), a line occurring once keeps exactly
    one more occurrence — and the epoch output equals the batch
    reference over seed + epoch at ingest-ordered ids."""
    from lisp_batch_processor_spark.pipelines import corpus_ingest_seed

    sd = str(tmp_path / "state")
    corpus_ingest_init(spark, sd)
    TWICE = "twice seeded banner line alpha beta gamma"
    ONCE = "once seeded banner line delta epsilon zeta"
    seed = spark.createDataFrame(
        [(1, "https://s1.example.com/", base_text(1) + "\n" + TWICE),
         (2, "https://s2.example.com/",
          base_text(2) + "\n" + TWICE + "\n" + ONCE)],
        SCHEMA)
    corpus_ingest_seed(seed, sd)

    batch = spark.createDataFrame(
        [(10, "https://s10.example.com/",
          base_text(10) + "\n" + TWICE + "\n" + ONCE),
         (11, "https://s11.example.com/", base_text(11) + "\n" + ONCE)],
        SCHEMA)
    out = {r.doc_id: r.text for r in
           corpus_ingest_epoch(batch, sd, 0,
                               line_min_repeat=3).collect()}
    # TWICE is saturated by the seed; ONCE had one seed occurrence,
    # so doc 10's copy (first in the epoch) survives and doc 11's is
    # the corpus-wide third -> stripped.
    assert TWICE not in out[10]
    assert ONCE in out[10]
    assert ONCE not in out[11]
    # And the epoch equals the batch reference restricted to epoch
    # docs (ids ordered seed < epoch).
    full = seed.unionByName(batch)
    want = {r.doc_id: r.text for r in
            corpus_ingest_batch(full, line_min_repeat=3).collect()
            if r.doc_id >= 10}
    assert {d: t for d, t in out.items()} == want


def _e(i, dim=8, scale=1.0):
    v = [0.0] * dim
    v[i] = scale
    return v


def test_semantic_axis_composes_into_ingest(spark, tmp_path):
    """The semantic axis runs INSIDE the ingest loop (no second,
    separately-stateful stream): an ``embeddings`` side input drives
    stage 4b of each epoch against semantic stores seeded under the
    same state_dir — a tau-level pair whose texts never MinHash-
    collide dies there, cross-epoch and within-epoch; docs without
    an embedding pass through; the epoch concatenation equals
    corpus_ingest_batch with the SAME seed-trained centroids; the
    report and compact passes auto-include the semantic pair; and
    assemble_corpus's own stage 4b over the ingested corpus is a
    no-op."""
    from lisp_batch_processor_spark.pipelines import (
        assemble_corpus, corpus_ingest_compact, ingest_report)
    from lisp_batch_processor_spark.streaming.dedup import (
        semantic_read_centroids, semantic_store_seed)

    sd = str(tmp_path / "state")
    corpus_ingest_init(spark, sd)
    # Semantic-store seed on axes e6/e7 — off the epochs' axes, so
    # the seed provides only the fixed cell model + history that
    # nothing collides with (the URL/line/near-dup stores saw no
    # seed docs, and the batch twin must agree).
    semantic_store_seed(
        spark.createDataFrame([(9001, _e(6)), (9002, _e(7))],
                              "vec_id long, embedding array<double>"),
        sd, k=2)
    cents = semantic_read_centroids(spark, sd)

    e0 = [(1, "https://s1.example.com/", base_text(1)),
          (2, "https://s2.example.com/", base_text(2)),
          (4, "https://s4.example.com/", base_text(4))]
    e1 = [(20, "https://s20.example.com/", base_text(20)),
          (21, "https://s21.example.com/", base_text(21)),
          (22, "https://s22.example.com/", base_text(22)),
          (23, "https://s23.example.com/", base_text(23)),
          (24, "https://s24.example.com/", base_text(24))]
    emb = spark.createDataFrame(
        [(1, _e(0)), (2, _e(1)), (4, _e(2)),
         (20, _e(0, scale=1.001)),   # semantic dup of epoch-0 doc 1
         (21, _e(3)),
         (22, _e(3, scale=0.999)),   # within-epoch dup of doc 21
         (23, _e(4))],               # doc 24 has NO embedding
        "doc_id bigint, embedding array<double>")
    mk = lambda rows: spark.createDataFrame(rows, SCHEMA)

    outs = [corpus_ingest_epoch(mk(b), sd, e, embeddings=emb)
            for e, b in enumerate((e0, e1))]
    got = sorted(sum((rows_of(o) for o in outs), []))
    ids = {t[0] for t in got}
    assert 20 not in ids   # cross-epoch semantic dup (of survivor 1)
    assert 22 not in ids   # within-epoch semantic dup (of 21)
    assert {1, 2, 4, 21, 23, 24} == ids  # 24: no embedding, passes

    want = rows_of(corpus_ingest_batch(mk(e0 + e1), embeddings=emb,
                                       semantic_centroids=cents))
    assert got == want

    # Replay of epoch 1 after its own semantic-store append: the
    # replayed stage meets its survivors as self-pairs only.
    assert rows_of(corpus_ingest_epoch(mk(e1), sd, 1,
                                       embeddings=emb)) \
        == rows_of(outs[1])

    # Observability + maintenance auto-include the semantic pair.
    rep = ingest_report(spark, sd)
    assert rep["sem_centroids"]["rows"] == 2
    assert rep["sem_cells"]["gen"] == 0 and rep["sem_cells"]["k"] == 2
    # seed 2 + survivors-with-embeddings {1, 2, 4, 21, 23}
    assert rep["sem_cells"]["vectors"] == 7
    assert rep["sem_vectors"]["files"] >= 3   # seed + 2 epochs + replay
    comp = corpus_ingest_compact(spark, sd)
    assert comp["semantic"]["vector_files"] >= 1
    assert ingest_report(spark, sd)["sem_vectors"]["files"] \
        == comp["semantic"]["vector_files"]

    # Composition contract extends to the semantic stage: assembly's
    # stage 4b over the ingested corpus is a no-op pass.
    ingested = outs[0]
    for p in outs[1:]:
        ingested = ingested.unionByName(p)
    evals = spark.createDataFrame(
        [("benchmark only words never in corpus at all today forever",)],
        "text string")
    out = assemble_corpus(spark,
                          ingested.select("doc_id", "url", "text"),
                          evals, str(tmp_path / "asm"),
                          embeddings=emb, pack_budget=64,
                          pack_buckets=2, salt="sem-ingest")
    c = out.counters()
    n = len(got)
    assert (c["semantic"]["rows_in"], c["semantic"]["rows_out"]) \
        == (n, n)
    assert (c["near_dup"]["rows_in"], c["near_dup"]["rows_out"]) \
        == (n, n)


@pytest.mark.slow
def test_streaming_ingest_with_embeddings_round_trips(spark, tmp_path):
    """The foreachBatch wrapper takes the embeddings side input and
    the compact hook folds the semantic stores too: a real stream
    with compact_every=1 lands the same corpus as the batch twin
    with the same centroids."""
    from lisp_batch_processor_spark.pipelines import ingest_report
    from lisp_batch_processor_spark.streaming.dedup import (
        semantic_read_centroids, semantic_store_seed)

    sd = str(tmp_path / "state")
    corpus_ingest_init(spark, sd)
    semantic_store_seed(
        spark.createDataFrame([(9001, _e(6)), (9002, _e(7))],
                              "vec_id long, embedding array<double>"),
        sd, k=2)
    cents = semantic_read_centroids(spark, sd)
    e0 = [(1, "https://s1.example.com/", base_text(1)),
          (2, "https://s2.example.com/", base_text(2))]
    e1 = [(20, "https://s20.example.com/", base_text(20)),
          (21, "https://s21.example.com/", base_text(21))]
    emb = spark.createDataFrame(
        [(1, _e(0)), (2, _e(1)),
         (20, _e(0, scale=1.001)),   # semantic dup of doc 1
         (21, _e(3))],
        "doc_id bigint, embedding array<double>")
    src = os.path.join(str(tmp_path), "docs_in")
    mk = lambda rows: spark.createDataFrame(rows, SCHEMA)
    for i, b in enumerate((e0, e1)):
        mk(b).coalesce(1).write.parquet(os.path.join(src, f"batch={i}"))
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "batch=*")))
    corpus = os.path.join(str(tmp_path), "corpus")
    q = start_corpus_ingest(stream, sd, corpus,
                            os.path.join(str(tmp_path), "ckpt"),
                            embeddings=emb, compact_every=1)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = rows_of(corpus_read(spark, corpus))
    assert {t[0] for t in got} == {1, 2, 21}   # 20 died semantically
    assert got == rows_of(corpus_ingest_batch(
        mk(e0 + e1), embeddings=emb, semantic_centroids=cents))
    # The hook's final pass folded the semantic vector store too.
    assert ingest_report(spark, sd)["sem_vectors"]["files"] <= 2


@pytest.mark.slow
def test_composed_ingest_reseeds_mid_stream(spark, tmp_path):
    """The composed loop closes the semantic drift loop too: with a
    small seed model (k=1) and a low occupancy trigger, the stream
    commits a new generation mid-run, later epochs dedup against the
    re-celled survivors, and the per-generation centroid cache +
    marker reads keep the loop correct end to end."""
    from lisp_batch_processor_spark.streaming.dedup import (
        semantic_current_gen, semantic_store_seed)

    sd = str(tmp_path / "state")
    corpus_ingest_init(spark, sd)
    semantic_store_seed(
        spark.createDataFrame([(9001, _e(6)), (9002, _e(7))],
                              "vec_id long, embedding array<double>"),
        sd, k=1)
    # Epochs 0-1 add novel directions (occupancy climbs past the
    # trigger in k=1's single cell); epoch 2 lands a semantic dup of
    # an epoch-0 survivor — caught only through the re-celled store.
    e0 = [(1, "https://s1.example.com/", base_text(1)),
          (2, "https://s2.example.com/", base_text(2))]
    e1 = [(10, "https://s10.example.com/", base_text(10)),
          (11, "https://s11.example.com/", base_text(11))]
    e2 = [(20, "https://s20.example.com/", base_text(20)),
          (21, "https://s21.example.com/", base_text(21))]
    emb = spark.createDataFrame(
        [(1, _e(0)), (2, _e(1)), (10, _e(2)), (11, _e(3)),
         (20, _e(0, scale=1.001)),   # semantic dup of doc 1
         (21, _e(4))],
        "doc_id bigint, embedding array<double>")
    src = os.path.join(str(tmp_path), "docs_in")
    mk = lambda rows: spark.createDataFrame(rows, SCHEMA)
    for i, b in enumerate((e0, e1, e2)):
        mk(b).coalesce(1).write.parquet(os.path.join(src, f"batch={i}"))
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "batch=*")))
    corpus = os.path.join(str(tmp_path), "corpus")
    q = (streaming_corpus_ingest(
            stream, sd, corpus, embeddings=emb,
            semantic_reseed_max_cell=5,
            semantic_reseed_target_cell=3)
         .option("checkpointLocation",
                 os.path.join(str(tmp_path), "ckpt")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # 2 seed + 4 survivors by epoch 1 > trigger 5 -> reseed fired.
    assert semantic_current_gen(spark, sd)["gen"] >= 1
    got_ids = {t[0] for t in rows_of(corpus_read(spark, corpus))}
    assert got_ids == {1, 2, 10, 11, 21}  # 20 died post-reseed


def test_seed_with_embeddings_suppresses_semantic_history_dups(
        spark, tmp_path):
    """corpus_ingest_seed(embeddings=) also seeds the semantic
    stores, so the migrated stream's first epoch already dedups
    semantically against the seeded history — a doc whose text never
    MinHash-collides with the seed but whose vector does is dropped,
    and the generation-0 model is the seed-trained one."""
    from lisp_batch_processor_spark.pipelines import (
        corpus_ingest_seed, ingest_report)
    from lisp_batch_processor_spark.streaming.dedup import (
        semantic_read_centroids)

    sd = str(tmp_path / "state")
    corpus_ingest_init(spark, sd)
    seed = spark.createDataFrame(
        [(1, "https://s1.example.com/", base_text(1)),
         (2, "https://s2.example.com/", base_text(2))], SCHEMA)
    seed_emb = spark.createDataFrame(
        [(1, _e(0)), (2, _e(1)),
         (999, _e(5))],   # not a seed doc: semi-join drops it
        "doc_id bigint, embedding array<double>")
    corpus_ingest_seed(seed, sd, embeddings=seed_emb, semantic_k=2)
    assert len(semantic_read_centroids(spark, sd)) == 2
    assert ingest_report(spark, sd)["sem_cells"]["vectors"] == 2

    batch = spark.createDataFrame(
        [(10, "https://s10.example.com/", base_text(10)),   # sem dup
         (11, "https://s11.example.com/", base_text(11))],  # novel
        SCHEMA)
    emb = spark.createDataFrame(
        [(10, _e(0, scale=1.001)),   # vector-dup of SEED doc 1
         (11, _e(3))],
        "doc_id bigint, embedding array<double>")
    out = {r.doc_id for r in
           corpus_ingest_epoch(batch, sd, 0, embeddings=emb).collect()}
    assert out == {11}


def test_seed_over_live_store_is_refused(spark, tmp_path):
    """`corpus_ingest_seed`'s 'seed a FRESH store only' is an error,
    not a docstring (round 11): over a state_dir with committed
    URL/line history — a live stream's epochs, or a previous seed —
    the seed raises instead of silently double-writing epoch −1 base
    rows (the compaction fold assumes one base row per key)."""
    from lisp_batch_processor_spark.pipelines import corpus_ingest_seed

    e0, *_ = epochs(spark)
    seed = spark.createDataFrame(
        [(900, "https://seed.example.com/", base_text(900))], SCHEMA)

    # Over live stream history: refused.
    sd = str(tmp_path / "state_live")
    corpus_ingest_init(spark, sd)
    corpus_ingest_epoch(e0, sd, 0)
    with pytest.raises(ValueError, match="FRESH"):
        corpus_ingest_seed(seed, sd)

    # Over a previous seed: refused (double-seeding stacks -1 rows).
    sd2 = str(tmp_path / "state_seeded")
    corpus_ingest_init(spark, sd2)
    corpus_ingest_seed(seed, sd2)
    with pytest.raises(ValueError, match="FRESH"):
        corpus_ingest_seed(seed, sd2)

    # The fresh path is untouched: seeded history suppresses dups
    # (the deep pin lives in test_seeded_stores_suppress_history_dups).
    out = corpus_ingest_epoch(
        spark.createDataFrame(
            [(10, "https://seed.example.com/?utm_source=x",
              base_text(10))], SCHEMA), sd2, 0)
    assert out.count() == 0   # URL-dup of the seeded doc


def test_corpus_ingest_lineage_contract(spark, tmp_path):
    """The composed loop's monotonic-epoch / one-lineage contract is
    machine-checked at the state_dir (round 10): an epoch regression
    (a new checkpoint restarting at 0 over old state — its
    strictly-earlier membership filters would re-admit every seen
    URL/line key) or a foreign ``lineage`` token raises; replays and
    same-lineage progress pass."""
    sd = str(tmp_path / "state")
    corpus_ingest_init(spark, sd)
    e0, e1, e2, _full = epochs(spark)
    corpus_ingest_epoch(e0, sd, 0, lineage="ckptA")
    out1 = rows_of(corpus_ingest_epoch(e1, sd, 1, lineage="ckptA"))
    # Replay (crash pre-commit): equal epoch passes, output identical.
    assert rows_of(corpus_ingest_epoch(e1, sd, 1,
                                       lineage="ckptA")) == out1
    with pytest.raises(ValueError, match="epoch regression"):
        corpus_ingest_epoch(e2, sd, 0)
    with pytest.raises(ValueError, match="lineage"):
        corpus_ingest_epoch(e2, sd, 2, lineage="ckptB")
    corpus_ingest_epoch(e2, sd, 2, lineage="ckptA")  # progress: fine


@pytest.mark.slow
@pytest.mark.parametrize("backend,crash_point",
                         [("swap", "before_marker"),
                          ("versioned", "after_reseed")])
def test_fuzz_composed_ingest_semantic_lifecycle(spark, tmp_path,
                                                 backend, crash_point):
    """End-to-end lifecycle fuzz of the COMPOSED loop (VERDICT r9 ask
    #5): `streaming_corpus_ingest(embeddings=…,
    semantic_reseed_max_cell=…)` driven through a real checkpointed
    stream whose mid-run reseed CRASHES — either before the marker
    PUT (generation never committed; the restarted stream replays
    the epoch under gen 0 and the retried reseed commits) or right
    after the reseed committed but before the epoch's checkpoint
    commit (the replay must pin its semantic stage back to the
    previous generation for byte-identical output) — on both store
    backends. Every epoch's surviving doc set must match the same
    numpy oracle the axis-level generation fuzz uses (single-hop
    min-id dedup from the generation's collected centroids + the
    pre-epoch survivor mirror), with the generation each epoch ran
    under recovered from the sink-time marker snapshot exactly as
    `_sem_epoch_model` resolves it. Doc texts are unique and
    Gopher-clean, so the semantic stage is the only one dropping
    docs — the oracle is the semantic oracle."""
    import numpy as np

    from lisp_batch_processor_spark.sources import writers as W
    from lisp_batch_processor_spark.streaming import dedup as SD
    from lisp_batch_processor_spark.streaming.dedup import (
        semantic_cell_occupancy, semantic_cell_occupancy_fast,
        semantic_current_gen, semantic_read_centroids,
        semantic_store_seed)

    DIM, TAU = 16, 0.95
    nprng = np.random.default_rng(7)

    def unit():
        v = nprng.standard_normal(DIM)
        return [float(x) for x in v / np.linalg.norm(v)]

    def oracle_epoch(cents, store_vecs, batch):
        """Same single-hop min-id oracle as the axis fuzz
        (test_streaming_dedup.test_fuzz_semantic_generation_lifecycle):
        store_vecs {id: unit}, batch [(id, vec)] with ids > store's."""
        c = np.array(cents, dtype=np.float64)
        c = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True),
                           1e-12)
        cell_of, unit_of = {}, {}
        for i, v in sorted(store_vecs.items()):
            cell_of[i] = int(np.argmax(c @ v))
            unit_of[i] = v
        for i, v in batch:
            u = np.asarray(v, dtype=np.float64)
            u = u / np.linalg.norm(u)
            cell_of[i] = int(np.argmax(c @ u))
            unit_of[i] = u
        out = {}
        for i, _ in batch:
            partners = [j for j in cell_of
                        if j < i and cell_of[j] == cell_of[i]
                        and float(unit_of[j] @ unit_of[i]) >= TAU]
            out[i] = (min(partners), True) if partners else (i, False)
        border = min(i for i, _ in batch)
        survivors = {i: np.asarray(unit_of[i]) for i, _ in batch
                     if not out[i][1] and i >= border}
        return out, survivors

    sd = str(tmp_path / "state")
    corpus_ingest_init(spark, sd, backend=backend)
    seed_vecs = {1: unit(), 2: unit()}
    semantic_store_seed(
        spark.createDataFrame(sorted(seed_vecs.items()),
                              "vec_id long, embedding array<double>"),
        sd, k=1, backend=backend)

    # Vectors per epoch: dups at x1.0001 of a prior survivor, novel
    # otherwise. k=1 puts everything in one cell, so occupancy = all
    # survivors and the trigger epoch is deterministic.
    vecs = {100: unit(), 101: unit(), 102: unit()}
    vecs.update({110: [x * 1.0001 for x in vecs[100]],   # dup of 100
                 111: unit(), 112: unit()})
    vecs.update({120: unit(), 121: unit(), 122: unit()})
    vecs.update({130: [x * 1.0001 for x in seed_vecs[1]],  # dup of seed
                 131: [x * 1.0001 for x in vecs[120]],     # dup of 120
                 132: unit()})
    batches = [[100, 101, 102], [110, 111, 112],
               [120, 121, 122], [130, 131, 132]]
    emb = spark.createDataFrame(
        sorted(vecs.items()), "doc_id bigint, embedding array<double>")
    mk = lambda ids: spark.createDataFrame(
        [(i, f"https://s{i}.example.com/", base_text(i)) for i in ids],
        SCHEMA)
    src = os.path.join(str(tmp_path), "docs_in")
    for e, ids in enumerate(batches):
        mk(ids).coalesce(1).write.parquet(
            os.path.join(src, f"batch={e}"))
    corpus = os.path.join(str(tmp_path), "corpus")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    deliveries: list[tuple[int, frozenset, dict]] = []
    funnels: list[dict] = []

    def sink(out, eid):
        deliveries.append((int(eid),
                           frozenset(r.doc_id for r in out.collect()),
                           semantic_current_gen(spark, sd)))

    def start():
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", 1)
                  .parquet(os.path.join(src, "batch=*")))
        return (streaming_corpus_ingest(
            stream, sd, corpus, embeddings=emb,
            semantic_reseed_max_cell=8,
            semantic_reseed_target_cell=4,
            lineage=ckpt, sink=sink,
            funnel_sink=funnels.append)
            .option("checkpointLocation", ckpt).start())

    # --- first run, with the injected crash armed --------------------
    if crash_point == "before_marker":
        real_put = W.write_json_file

        def torn_put(spark_, path, obj):
            if "/_sem_gen" in path:
                raise IOError("injected crash before marker commit")
            real_put(spark_, path, obj)

        W.write_json_file = torn_put
        unpatch = lambda: setattr(W, "write_json_file", real_put)
    else:
        real_reseed = SD.semantic_reseed

        def exploding_reseed(*args, **kwargs):
            real_reseed(*args, **kwargs)
            raise IOError("injected crash after reseed commit")

        SD.semantic_reseed = exploding_reseed
        unpatch = lambda: setattr(SD, "semantic_reseed", real_reseed)

    q = start()
    try:
        err = None
        try:
            q.processAllAvailable()
            err = q.exception()
        except Exception as ex:      # noqa: BLE001 — asserted below
            err = ex
        assert err is not None and "injected" in str(err), err
    finally:
        q.stop()
        unpatch()

    # The crash landed where intended.
    mid = semantic_current_gen(spark, sd)
    if crash_point == "before_marker":
        assert mid["gen"] == 0, mid           # never committed
    else:
        assert mid["gen"] == 1, mid           # committed, epoch tagged
        assert mid["epoch"] is not None

    # --- restart on the same checkpoint: replay + finish -------------
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    cur = semantic_current_gen(spark, sd)
    assert cur["gen"] == 1 and cur["epoch"] == 2, cur  # one reseed

    # Duplicate deliveries of the crashed epoch are byte-identical.
    by_epoch: dict[int, list] = {}
    for eid, ids, snap in deliveries:
        by_epoch.setdefault(eid, []).append((ids, snap))
    assert sorted(by_epoch) == [0, 1, 2, 3]
    assert len(by_epoch[2]) == 2               # crashed epoch replayed
    assert by_epoch[2][0][0] == by_epoch[2][1][0]

    # --- numpy oracle over the recovered per-epoch generations -------
    cents_by_gen = {g: semantic_read_centroids(spark, sd, gen=g)
                    for g in (0, 1)}
    store = {i: np.asarray(v) / np.linalg.norm(v)
             for i, v in seed_vecs.items()}
    expected_ids: set[int] = set()
    for e, ids in enumerate(batches):
        last_ids, snap = by_epoch[e][-1]
        use_gen = (snap["gen"] - 1
                   if snap.get("epoch") == e else snap["gen"])
        want, new_surv = oracle_epoch(
            cents_by_gen[use_gen], store, [(i, vecs[i]) for i in ids])
        survive = {i for i in ids if not want[i][1]}
        for ids_got, _ in by_epoch[e]:
            assert ids_got == frozenset(survive), (e, ids_got, want)
        expected_ids |= survive
        store.update(new_surv)

    # Planted artifacts resolved as designed.
    assert expected_ids == {100, 101, 102, 111, 112,
                            120, 121, 122, 132}
    assert {t[0] for t in rows_of(corpus_read(spark, corpus))} \
        == expected_ids

    # The O(k) ledger signal still mirrors the full scan at the end.
    assert semantic_cell_occupancy_fast(spark, sd) \
        == semantic_cell_occupancy(spark, sd)

    # The funnel rides the same replay contract: every attempt of an
    # epoch (including the crashed one's replay) delivered IDENTICAL
    # per-stage counts, and the tail count equals the delivered
    # survivor set.
    fun_by_ep: dict[int, list] = {}
    for f in funnels:
        fun_by_ep.setdefault(f["epoch"], []).append(f)
    assert sorted(fun_by_ep) == [0, 1, 2, 3]
    assert len(fun_by_ep[2]) >= 2          # crashed epoch replayed
    for e, fs_ in fun_by_ep.items():
        assert all(f == fs_[0] for f in fs_), (e, fs_)
        assert fs_[0]["survivors"] == len(by_epoch[e][-1][0])


def test_ingest_funnel_counters_match_planted_artifacts(
        spark, tmp_path):
    """The opt-in per-epoch funnel (the reference's R16-R18 per-item
    counters, continuous): each stage's surviving row count matches
    the planted artifacts of the standard epoch fixtures, the
    semantic slot mirrors near-dup when no embeddings are passed,
    and the sink stays silent when not requested (hot path
    unchanged)."""
    sd = str(tmp_path / "state")
    corpus_ingest_init(spark, sd)
    e0, e1, e2, _full = epochs(spark)
    funnels: list[dict] = []
    outs = [corpus_ingest_epoch(b, sd, e, funnel_sink=funnels.append)
            for e, b in enumerate((e0, e1, e2))]
    assert [f["epoch"] for f in funnels] == [0, 1, 2]
    # Epoch 0: 6 docs; doc 3 is a within-epoch URL dup -> 5 through
    # hygiene+URL; no line/near-dup/gopher losses in epoch 0.
    assert funnels[0] == {"epoch": 0, "hygiene_url_survivors": 5,
                          "line_rebuilt": 5, "near_dup_survivors": 5,
                          "semantic_survivors": 5, "survivors": 5}
    # Epoch 1: 4 docs in; 21 dies as a cross-epoch near-dup of 5 and
    # 23 as a within-epoch near-dup of 22.
    assert funnels[1]["hygiene_url_survivors"] == 4
    assert funnels[1]["near_dup_survivors"] == 2
    assert funnels[1]["survivors"] == 2
    # Epoch 2: 5 docs; 32/33 hygiene rejects and 30 a cross-epoch URL
    # dup -> 2; doc 31 then dies on the Gopher rules.
    assert funnels[2]["hygiene_url_survivors"] == 2
    assert funnels[2]["near_dup_survivors"] == 2
    assert funnels[2]["survivors"] == 1
    # Funnel tails equal the actual epoch outputs.
    assert [f["survivors"] for f in funnels] \
        == [o.count() for o in outs]


def test_funnel_counts_never_replan_the_joins(spark, tmp_path):
    """Enabling the funnel must add NO recomputation of the near-dup
    (or semantic) stage (round 11): with ``funnel_sink`` set, the
    survivor frames are snapshotted before counting, so every count
    job the epoch runs is a scan of a materialized snapshot — its
    optimized plan contains no Join and no store scan. Also pins the
    hot path: with the funnel off, the epoch runs zero count jobs at
    all."""
    # The concrete class whose `count` actually runs (pyspark 4 keeps
    # an abstract base in pyspark.sql.dataframe).
    import pyspark.sql.classic.dataframe as D

    counted_plans: list[str] = []
    orig_count = D.DataFrame.count

    def spy_count(self):
        counted_plans.append(
            self._jdf.queryExecution().optimizedPlan().toString())
        return orig_count(self)

    e0, *_ = epochs(spark)

    sd_off = str(tmp_path / "state_off")
    corpus_ingest_init(spark, sd_off)
    D.DataFrame.count = spy_count
    try:
        corpus_ingest_epoch(e0, sd_off, 0)
    finally:
        D.DataFrame.count = orig_count
    assert counted_plans == []      # funnel off: no count jobs, period

    sd_on = str(tmp_path / "state_on")
    corpus_ingest_init(spark, sd_on)
    sink: list[dict] = []
    D.DataFrame.count = spy_count
    try:
        corpus_ingest_epoch(e0, sd_on, 0, funnel_sink=sink.append)
    finally:
        D.DataFrame.count = orig_count
    # One count per stage, except semantic REUSES the near-dup count
    # when no embeddings are passed (no fifth job).
    assert len(counted_plans) == 4
    for plan in counted_plans:
        # A recomputation would re-plan the anti/semi joins (and the
        # nd_index/shingle store scans) under the count; a snapshot
        # count is a bare LogicalRDD scan.
        assert "Join" not in plan, plan
        assert "Relation" not in plan, plan
        assert "LogicalRDD" in plan, plan
    assert sink[0]["survivors"] == 5


def test_start_corpus_ingest_rejects_foreign_checkpoint(spark,
                                                        tmp_path):
    """`start_corpus_ingest` makes the STRONG lineage contract the
    default (round 11): checkpoint_dir is threaded into both the
    checkpointLocation and the lineage token, so a second stream
    resuming over the same state_dir from a DIFFERENT checkpoint
    raises EVEN when its epoch does not regress (a fresh checkpoint
    restarts at epoch 0 == the recorded high-water after one epoch —
    the exact case the epoch-only check passes silently)."""
    from pyspark.errors import StreamingQueryException

    e0, e1, _e2, _full = epochs(spark)
    sd = str(tmp_path / "state")
    corpus_ingest_init(spark, sd)

    def read_src(tag):
        return (spark.readStream.schema(SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(os.path.join(str(tmp_path), f"docs_{tag}",
                                      "batch=*")))

    for tag, batch in (("a", e0), ("b", e1)):
        batch.coalesce(1).write.parquet(
            os.path.join(str(tmp_path), f"docs_{tag}", "batch=0"))

    corpus = os.path.join(str(tmp_path), "corpus")
    q = start_corpus_ingest(read_src("a"), sd, corpus,
                            os.path.join(str(tmp_path), "ckptA"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # Foreign checkpoint, same state_dir: its epoch 0 EQUALS the
    # recorded high-water (the replay-shaped case), so only the
    # lineage token catches it — and through the convenience it does.
    q2 = start_corpus_ingest(read_src("b"), sd, corpus,
                             os.path.join(str(tmp_path), "ckptB"))
    try:
        with pytest.raises(StreamingQueryException, match="lineage"):
            q2.processAllAvailable()
    finally:
        q2.stop()

    # The original checkpoint resumes fine afterwards (pin intact) —
    # even RESPELLED (trailing slash): the recorded token is the
    # canonical path, not the raw string.
    q3 = start_corpus_ingest(read_src("a"), sd, corpus,
                             os.path.join(str(tmp_path), "ckptA")
                             + "/")
    try:
        q3.processAllAvailable()
    finally:
        q3.stop()
    assert {t[0] for t in rows_of(corpus_read(spark, corpus))} \
        == {1, 2, 4, 5, 6}

    # Decoupling lineage from the checkpoint defeats the point —
    # refused, use the raw wrapper for that.
    with pytest.raises(ValueError, match="lineage"):
        start_corpus_ingest(read_src("a"), sd, corpus,
                            os.path.join(str(tmp_path), "ckptC"),
                            lineage="something-else")


def test_semantic_seed_over_shared_state_dir_preserves_pin(
        spark, tmp_path):
    """Seeding the SEMANTIC axis over a state_dir shared with the
    composed loop's URL/line/near-dup stores must not erase the
    state_dir's lineage/high-water pin (round 11, ADVICE): the one
    meta guards every store riding the stream, and the seed clears
    only the semantic stores. A standalone semantic dir keeps the
    seed-resets-lineage behavior (pinned in test_streaming_dedup)."""
    from lisp_batch_processor_spark.sources.writers import (
        read_json_file)
    from lisp_batch_processor_spark.streaming.dedup import (
        _ingest_lineage_path, semantic_store_seed)

    sd = str(tmp_path / "state")
    corpus_ingest_init(spark, sd)
    e0, e1, e2, _full = epochs(spark)
    corpus_ingest_epoch(e0, sd, 0, lineage="ckptA")
    corpus_ingest_epoch(e1, sd, 1, lineage="ckptA")

    # Add the semantic axis mid-life (the documented 'seed them first
    # under the SAME state_dir' setup, arriving late). Seed vec_ids
    # below the stream's doc ids — min-id representative semantics,
    # the ingest-ordered-ids convention.
    semantic_store_seed(
        spark.createDataFrame([(1, _e(6)), (2, _e(7))],
                              "vec_id long, embedding array<double>"),
        sd, k=1)
    meta = read_json_file(spark, _ingest_lineage_path(sd),
                          default=None, absent=None)
    assert meta == {"lineage": "ckptA", "high_water_epoch": 1}

    # The restart-at-0 window stays CLOSED for the stores the seed
    # did not clear...
    with pytest.raises(ValueError, match="epoch regression"):
        corpus_ingest_epoch(e2, sd, 0)
    with pytest.raises(ValueError, match="lineage"):
        corpus_ingest_epoch(e2, sd, 2, lineage="ckptB")
    # ... and the SAME stream continues, semantic stage now active:
    # doc 34 — the one doc of e2 that survives every other stage (see
    # test_epoch_concat_equals_batch) — dies as a vector-dup of the
    # seeded history.
    emb = spark.createDataFrame(
        [(34, _e(6, scale=1.001))],   # vector-dup of seed vec 1
        "doc_id bigint, embedding array<double>")
    out = {r.doc_id for r in
           corpus_ingest_epoch(e2, sd, 2, lineage="ckptA",
                               embeddings=emb).collect()}
    assert out == set()
