"""Streaming dedup: duplicate event_ids injected into the stream are
suppressed; result matches batch dropDuplicates."""

from __future__ import annotations

import os

import pytest

from lisp_batch_processor_spark.catalog import load
from lisp_batch_processor_spark.streaming.dedup import dedup_within_watermark


@pytest.mark.slow
def test_streaming_dedup_within_watermark(spark, sf_dir, tmp_path):
    # Build a source dir whose single file contains each event twice.
    ev = load(spark, sf_dir, "events").limit(500)
    doubled = ev.unionByName(ev)
    src = os.path.join(str(tmp_path), "dup_events")
    doubled.write.parquet(src)

    # Spark wrote the file, so ts is a real timestamp (not the
    # fixture's raw nanos): stream with the written schema.
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    out = dedup_within_watermark(stream)
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName("dedup_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_out"
    ).collect()[0]
    assert got.n == 500
    assert got.d == 500


@pytest.mark.slow
def test_streaming_near_dup_ingest_grows_the_index(spark, tmp_path):
    """Two micro-batches through streaming_near_dup_ingest: batch 1
    contains a corpus dup and a novel doc; batch 2 contains a dup of
    batch 1's SURVIVOR — catchable only because epoch 1 appended its
    survivors to the persisted stores. Assignments must equal running
    incremental_near_dups sequentially with manual appends."""
    from pyspark.sql import functions as F

    from lisp_batch_processor_spark.operators.dedup import (
        banded_signatures, minhash_signatures, shingle_store)
    from lisp_batch_processor_spark.streaming.dedup import (
        streaming_near_dup_ingest)

    base_a = ("the quick brown fox jumps over the lazy dog and runs far "
              "away into the deep dark forest to find some food for the "
              "long winter")
    novel_c = ("totally novel text about mountains rivers valleys and "
               "glaciers carving stone over ten thousand slow years")
    schema = "doc_id long, text string"
    corpus = spark.createDataFrame([(10, base_a)], schema)

    index_path = os.path.join(str(tmp_path), "index.parquet")
    store_path = os.path.join(str(tmp_path), "store.parquet")
    banded_signatures(minhash_signatures(corpus)).write.parquet(index_path)
    shingle_store(corpus).write.parquet(store_path)

    # Two source files -> two micro-batches (maxFilesPerTrigger=1).
    # File names order the epochs (file source lists in path order).
    src = os.path.join(str(tmp_path), "incoming")
    spark.createDataFrame(
        [(20, base_a.replace("winter", "summer")),   # dup of corpus 10
         (21, novel_c)], schema                      # novel -> survivor
    ).coalesce(1).write.parquet(os.path.join(src, "batch=0"))
    spark.createDataFrame(
        [(30, novel_c.replace("slow", "fast")),      # dup of epoch-1's 21
         (31, "entirely fresh content on tide pools barnacles kelp "
              "anemones urchins and the patient rhythm of the moon")],
        schema).coalesce(1).write.parquet(os.path.join(src, "batch=1"))

    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "batch=*")))
    epochs: dict[int, set] = {}
    writer = streaming_near_dup_ingest(
        stream, index_path, store_path,
        lambda out, eid: epochs.setdefault(
            eid, {(r.doc_id, r.rep_id, r.is_dup) for r in out.collect()}))
    q = writer.start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = set().union(*epochs.values())
    assert len(epochs) == 2
    assert got == {(20, 10, True),    # corpus dup, via the seeded index
                   (21, 21, False),   # novel survivor, appended
                   (30, 21, True),    # caught by epoch-1's appended rows
                   (31, 31, False)}
    # The stores grew by exactly the survivors (21 then 31).
    idx_ids = {r.doc_id for r in spark.read.parquet(index_path)
               .select("doc_id").distinct().collect()}
    store_ids = {r.doc_id for r in spark.read.parquet(store_path)
                 .select("doc_id").distinct().collect()}
    assert idx_ids == store_ids == {10, 21, 31}


@pytest.mark.slow
def test_streaming_line_dedup_matches_batch_replay(spark, tmp_path):
    """Two micro-batches through streaming_line_dedup_ingest: batch 2
    must lose lines first seen in batch 1 (catchable only via the
    persisted digest store), and the concatenated epochs must equal
    the batch line_dedup over the full corpus (ids ordered across
    epochs ⇒ identical first-occurrence winners)."""
    from lisp_batch_processor_spark.operators.dedup import line_dedup
    from lisp_batch_processor_spark.streaming.dedup import (
        line_store_init, streaming_line_dedup_ingest)

    schema = "doc_id long, text string"
    b0 = [(0, "alpha one\nshared banner line\nbeta two"),
          (1, "gamma three\nshared banner line\n--"),
          (2, None)]
    b1 = [(10, "shared banner line\ndelta four\n--"),
          (11, "delta four\nepsilon five")]

    store = os.path.join(str(tmp_path), "lines.parquet")
    line_store_init(spark, store)

    src = os.path.join(str(tmp_path), "docs_in")
    spark.createDataFrame(b0, schema).coalesce(1) \
        .write.parquet(os.path.join(src, "batch=0"))
    spark.createDataFrame(b1, schema).coalesce(1) \
        .write.parquet(os.path.join(src, "batch=1"))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "batch=*")))
    epochs: dict[int, dict] = {}
    writer = streaming_line_dedup_ingest(
        stream, store,
        lambda out, eid: epochs.setdefault(
            eid, {r.doc_id: (r.text, r.lines_total, r.lines_kept)
                  for r in out.collect()}))
    q = writer.start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert len(epochs) == 2
    got = {}
    for e in epochs.values():
        got.update(e)

    want = {r.doc_id: (r.text, r.lines_total, r.lines_kept)
            for r in line_dedup(
                spark.createDataFrame(b0 + b1, schema)).collect()}
    assert got == want
    # The cross-epoch catch specifically: doc 10 loses BOTH its
    # banner line and its "--" (each first seen in epoch 1, caught
    # only via the persisted store), and doc 11 loses "delta four"
    # (first seen earlier IN the same epoch, in doc 10).
    assert got[10] == ("delta four", 3, 1)
    assert got[11] == ("epsilon five", 2, 1)
    # Store holds one digest per distinct line (5 from epoch 1 +
    # 2 novel in epoch 2), append-grown and epoch-tagged.
    store_df = spark.read.parquet(store)
    assert store_df.select("line_key").distinct().count() \
        == store_df.count() == 7
    from pyspark.sql import functions as F
    assert {r.epoch_id for r in
            store_df.select("epoch_id").distinct().collect()} == {0, 1}
    assert store_df.filter(F.col("epoch_id") == 0).count() == 5


@pytest.mark.slow
def test_line_dedup_epoch_replay(spark, tmp_path):
    """Crash-replay safety (ADVICE r4): an epoch replayed AFTER its
    own store append (crash between append and epoch commit) must
    emit the identical rows — the epoch-tag filter excludes the
    epoch's own digests from the membership read. Without it, the
    replay deduped docs against their own lines and emitted ''."""
    from lisp_batch_processor_spark.streaming.dedup import (
        line_dedup_ingest_epoch, line_store_init)

    schema = "doc_id long, text string"
    store = os.path.join(str(tmp_path), "lines.parquet")
    line_store_init(spark, store)

    batch = spark.createDataFrame(
        [(0, "alpha one\nshared banner\nbeta two"),
         (1, "gamma three\nshared banner")], schema)

    first = {r.doc_id: (r.text, r.lines_total, r.lines_kept)
             for r in line_dedup_ingest_epoch(batch, store, 0).collect()}
    assert first[0] == ("alpha one\nshared banner\nbeta two", 3, 3)
    assert first[1] == ("gamma three", 2, 1)

    # Replay epoch 0: the store already holds epoch-0 digests, yet
    # the output must be byte-identical, and the duplicate re-append
    # must not change membership semantics for later epochs.
    replay = {r.doc_id: (r.text, r.lines_total, r.lines_kept)
              for r in line_dedup_ingest_epoch(batch, store, 0).collect()}
    assert replay == first

    later = spark.createDataFrame(
        [(5, "shared banner\nfresh line")], schema)
    out2 = {r.doc_id: (r.text, r.lines_total, r.lines_kept)
            for r in line_dedup_ingest_epoch(later, store, 1).collect()}
    assert out2[5] == ("fresh line", 2, 1)


@pytest.mark.slow
def test_near_dup_epoch_replay(spark, tmp_path):
    """Replaying a near-dup ingest epoch AFTER its own store append
    (crash between append and commit) must produce identical
    assignments: a doc's own just-appended signature yields only a
    self-pair, which assignment resolves to rep = self."""
    from lisp_batch_processor_spark.operators.dedup import (
        banded_signatures, minhash_signatures, shingle_store)
    from lisp_batch_processor_spark.streaming.dedup import (
        near_dup_ingest_epoch)

    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep dark forest to find some food for the "
            "long winter")
    schema = "doc_id long, text string"
    corpus = spark.createDataFrame([(10, base)], schema)
    index_path = os.path.join(str(tmp_path), "index.parquet")
    store_path = os.path.join(str(tmp_path), "store.parquet")
    banded_signatures(minhash_signatures(corpus)).write.parquet(index_path)
    shingle_store(corpus).write.parquet(store_path)

    batch = spark.createDataFrame(
        [(20, base.replace("winter", "summer")),  # corpus dup
         (21, "totally novel text about mountains rivers valleys and "
              "glaciers carving stone over ten thousand slow years")],
        schema)

    first = {(r.doc_id, r.rep_id, r.is_dup)
             for r in near_dup_ingest_epoch(batch, index_path,
                                            store_path).collect()}
    assert first == {(20, 10, True), (21, 21, False)}

    # Replay: index/store now already contain doc 21's rows.
    replay = {(r.doc_id, r.rep_id, r.is_dup)
              for r in near_dup_ingest_epoch(batch, index_path,
                                             store_path).collect()}
    assert replay == first
    # And a later epoch still dedups against the (now twice-
    # appended) survivor exactly once.
    later = spark.createDataFrame(
        [(30, "totally novel text about mountains rivers valleys and "
              "glaciers carving stone over ten thousand fast years")],
        schema)
    out3 = {(r.doc_id, r.rep_id, r.is_dup)
            for r in near_dup_ingest_epoch(later, index_path,
                                           store_path).collect()}
    assert out3 == {(30, 21, True)}


@pytest.mark.slow
def test_line_store_compact_preserves_membership_and_replay(
        spark, tmp_path):
    """Folding committed epochs into the epoch −1 base changes no
    future epoch's output and keeps the live epoch's replay
    exactly-once; file count folds; crash windows repair."""
    import shutil

    from pyspark.sql import functions as F

    from lisp_batch_processor_spark.sources.writers import backup_path
    from lisp_batch_processor_spark.streaming.dedup import (
        line_dedup_ingest_epoch, line_store_compact, line_store_init)

    schema = "doc_id long, text string"
    store = os.path.join(str(tmp_path), "lines.parquet")
    line_store_init(spark, store)
    # Seed digests (epoch < 0) fold too.
    spark.createDataFrame([("seedkey", -7)],
                          "line_key string, epoch_id long") \
        .write.mode("append").parquet(store)

    batches = [
        spark.createDataFrame(
            [(0, "alpha one\nshared banner\nbeta two")], schema),
        spark.createDataFrame(
            [(1, "gamma three\nshared banner\ndelta four")], schema),
        spark.createDataFrame(
            [(2, "beta two\nepsilon five")], schema),
    ]
    line_dedup_ingest_epoch(batches[0], store, 0)
    line_dedup_ingest_epoch(batches[1], store, 1)
    # A replay duplicate of epoch 1's append (crash pre-commit) —
    # BEFORE epoch 2, the only ordering a real stream can produce
    # (and the only one the round-10 high-water check admits).
    line_dedup_ingest_epoch(batches[1], store, 1)
    line_dedup_ingest_epoch(batches[2], store, 2)

    # Uncompacted twin decides the expected future behavior.
    twin = os.path.join(str(tmp_path), "lines_twin.parquet")
    shutil.copytree(store, twin)

    def files(root):
        return sum(1 for dp, dn, fn in os.walk(root)
                   for f in fn if not f.startswith((".", "_")))

    before_files = files(store)
    assert line_store_compact(spark, store) == 3  # epochs -7, 0, 1
    epochs = {r[0] for r in spark.read.parquet(store)
              .select("epoch_id").distinct().collect()}
    assert epochs == {-1, 2}
    assert files(store) < before_files

    # Replay of the LIVE epoch (2) against the compacted store must
    # still exclude its own digests: byte-identical output.
    replay = {r.doc_id: (r.text, r.lines_kept)
              for r in line_dedup_ingest_epoch(batches[2], store,
                                               2).collect()}
    assert replay[2] == ("epsilon five", 1)

    # Future epoch: identical output on compacted vs twin store.
    nxt = spark.createDataFrame(
        [(9, "shared banner\nepsilon five\nzeta six\nseed line")],
        schema)
    got = {r.doc_id: (r.text, r.lines_kept)
           for r in line_dedup_ingest_epoch(nxt, store, 3).collect()}
    want = {r.doc_id: (r.text, r.lines_kept)
            for r in line_dedup_ingest_epoch(nxt, twin, 3).collect()}
    assert got == want

    # Crash windows on the swap.
    bak = backup_path(store)
    os.rename(store, bak)  # window 1: dest missing
    out = {r.doc_id: r.text
           for r in line_dedup_ingest_epoch(
               spark.createDataFrame([(20, "zeta six\nnew tail")],
                                     schema), store, 4).collect()}
    assert out[20] == "new tail"
    shutil.copytree(store, bak)  # window 2: stale backup
    spark.createDataFrame([("k2", 10)],
                          "line_key string, epoch_id long") \
        .write.mode("append").parquet(store)
    assert line_store_compact(spark, store) > 0
    assert not os.path.exists(bak)

    with pytest.raises(ValueError, match="keep_live"):
        line_store_compact(spark, store, keep_live=0)
    bad = os.path.join(str(tmp_path), "bad.parquet")
    spark.createDataFrame([("x",)], "line_key string") \
        .write.parquet(bad)
    with pytest.raises(ValueError, match="epoch_id"):
        line_store_compact(spark, bad)


@pytest.mark.slow
def test_near_dup_stores_tolerate_compaction(spark, tmp_path):
    """sources.writers.compact on the signature index and shingle
    store between epochs changes no later assignment (duplicate rows
    are tolerated, so a plain size-targeted rewrite is semantics-
    preserving — the docstring claim, pinned)."""
    import shutil

    from lisp_batch_processor_spark.operators.dedup import (
        banded_signatures, minhash_signatures, shingle_store)
    from lisp_batch_processor_spark.sources.writers import compact
    from lisp_batch_processor_spark.streaming.dedup import (
        near_dup_ingest_epoch)

    base_a = ("the quick brown fox jumps over the lazy dog and runs "
              "far away into the deep dark forest to find some food "
              "for the long winter")
    novel = ("totally novel text about mountains rivers valleys and "
             "glaciers carving stone over ten thousand slow years")
    schema = "doc_id long, text string"
    corpus = spark.createDataFrame([(10, base_a)], schema)

    idx = os.path.join(str(tmp_path), "index.parquet")
    store = os.path.join(str(tmp_path), "store.parquet")
    banded_signatures(minhash_signatures(corpus)).write.parquet(idx)
    shingle_store(corpus).write.parquet(store)

    b1 = spark.createDataFrame(
        [(20, base_a.replace("winter", "summer")), (21, novel)], schema)
    near_dup_ingest_epoch(b1, idx, store)

    # Twin stores WITHOUT compaction decide the expected output.
    idx2 = os.path.join(str(tmp_path), "index2.parquet")
    store2 = os.path.join(str(tmp_path), "store2.parquet")
    shutil.copytree(idx, idx2)
    shutil.copytree(store, store2)
    compact(spark, idx)
    compact(spark, store)

    b2 = spark.createDataFrame(
        [(30, novel.replace("slow", "fast")),
         (31, "entirely fresh content on tide pools barnacles kelp "
              "anemones urchins and the patient rhythm of the moon")],
        schema)
    got = {(r.doc_id, r.rep_id, r.is_dup)
           for r in near_dup_ingest_epoch(b2, idx, store).collect()}
    want = {(r.doc_id, r.rep_id, r.is_dup)
            for r in near_dup_ingest_epoch(b2, idx2, store2).collect()}
    assert got == want
    assert got == {(30, 21, True), (31, 31, False)}


def test_line_dedup_legacy_store_raises(spark, tmp_path):
    """A pre-epoch line store (no epoch_id column) raises the
    migration error instead of silently re-admitting seen lines: the
    guard probes the FILE schema, because the declared-schema read
    the membership join uses fills a missing column with NULLs and
    the `epoch_id < e` filter would drop every row (round-6 advice:
    the old post-read guard was dead code)."""
    from lisp_batch_processor_spark.streaming.dedup import (
        line_dedup_ingest_epoch)

    store = os.path.join(str(tmp_path), "legacy_lines")
    spark.createDataFrame([("k1",)], "line_key string") \
        .write.parquet(store)
    docs = spark.createDataFrame([(1, "a\nb")], "doc_id long, text string")
    with pytest.raises(ValueError, match="epoch_id"):
        line_dedup_ingest_epoch(docs, store, epoch_id=0)


@pytest.mark.slow
def test_line_store_versioned_backend_matches_swap(spark, tmp_path):
    """A versioned-backend line store yields identical epoch outputs
    and identical membership across ingest → compact → ingest: the
    digests append inside the current pointer-committed version, the
    fold publishes the next version, and an orphaned fold (no
    pointer) is invisible."""
    import shutil

    from lisp_batch_processor_spark.streaming.dedup import (
        line_dedup_ingest_epoch, line_store_compact, line_store_init)

    swap = os.path.join(str(tmp_path), "lines_swap")
    ver = os.path.join(str(tmp_path), "lines_ver")
    line_store_init(spark, swap)
    line_store_init(spark, ver, backend="versioned")

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    epochs = [
        docs([(1, "alpha\nbeta"), (2, "beta\ngamma")]),
        docs([(3, "alpha\ndelta"), (4, "delta\nepsilon")]),
        docs([(5, "gamma\nzeta")]),
        docs([(6, "zeta\nalpha\neta")]),
    ]

    def run(store, e, batch):
        return {(r.doc_id, r.text, r.lines_total, r.lines_kept)
                for r in line_dedup_ingest_epoch(
                    batch, store, epoch_id=e).collect()}

    for e, b in enumerate(epochs[:3]):
        assert run(swap, e, b) == run(ver, e, b)

    # Orphaned fold: clone the current version with no pointer.
    committed = sorted(int(d[2:]) for d in os.listdir(ver)
                       if d.startswith("v_"))
    shutil.copytree(os.path.join(ver, f"v_{committed[-1]}"),
                    os.path.join(ver, f"v_{committed[-1] + 1}"))

    assert line_store_compact(spark, ver) == \
        line_store_compact(spark, swap) > 0
    # Membership identical post-fold: the next epoch dedups the same.
    assert run(swap, 3, epochs[3]) == run(ver, 3, epochs[3])

    # Bounded: at most 2 committed versions remain.
    vs = [d for d in os.listdir(ver) if d.startswith("v_")]
    assert len(vs) <= 2


def test_streaming_line_dedup_min_repeat3_matches_batch_prefix(
        spark, tmp_path):
    """min_repeat=3 via epoch-tagged COUNTS: the epoch concatenation
    equals line_dedup(min_repeat=3, policy='prefix') over the full
    corpus — first 2 occurrences of every line survive, the 3rd and
    later strip, across epochs (persisted counts), within an epoch
    (batch ranking), and within a doc."""
    from lisp_batch_processor_spark.operators.dedup import line_dedup
    from lisp_batch_processor_spark.streaming.dedup import (
        line_dedup_ingest_epoch, line_store_init)

    schema = "doc_id long, text string"
    store = os.path.join(str(tmp_path), "lines3.parquet")
    line_store_init(spark, store)

    batches = [
        # A twice across docs (fills both slots), B/C once.
        [(0, "AAA\nBBB"), (1, "AAA\nCCC")],
        # A saturated -> stripped; D novel.
        [(10, "AAA\nDDD")],
        # D at prior=1: one slot left, in-batch cnt=2 -> rank keeps
        # the first occurrence only; E novel.
        [(20, "DDD\nEEE\nDDD")],
    ]

    got = {}
    for e, rows in enumerate(batches):
        out = line_dedup_ingest_epoch(
            spark.createDataFrame(rows, schema), store, e,
            min_repeat=3)
        got.update({r.doc_id: (r.text, r.lines_total, r.lines_kept)
                    for r in out.collect()})

    full = spark.createDataFrame(
        [r for b in batches for r in b], schema)
    want = {r.doc_id: (r.text, r.lines_total, r.lines_kept)
            for r in line_dedup(full, min_repeat=3,
                                policy="prefix").collect()}
    assert got == want
    # The load-bearing rows, explicitly.
    assert got[0] == ("AAA\nBBB", 2, 2)
    assert got[1] == ("AAA\nCCC", 2, 2)
    assert got[10] == ("DDD", 2, 1)        # AAA = 3rd occurrence
    assert got[20] == ("DDD\nEEE", 3, 2)   # DDD slot left: first
    #                                        in-batch occurrence
    #                                        kept, second stripped

    # Saturated keys stop accruing store rows.
    from pyspark.sql import functions as F
    store_df = spark.read.schema(
        "line_key string, epoch_id long, n long").parquet(store)
    per_key = {r.k: r.s for r in
               store_df.groupBy(F.col("line_key").alias("k"))
               .agg(F.sum("n").alias("s")).collect()}
    import hashlib
    key = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert per_key[key("AAA")] == 2   # epoch 1 appended nothing
    assert per_key[key("DDD")] == 3   # 1 (e1) + 2 (e2, crossing)


def test_line_dedup_min_repeat3_replay_exactly_once(spark, tmp_path):
    """A min_repeat=3 epoch replayed AFTER its own count append must
    emit identical rows AND not double-count: the strictly-earlier
    filter excludes the replay's own rows, and duplicate
    (line_key, epoch) rows collapse before the sum for later epochs."""
    from lisp_batch_processor_spark.streaming.dedup import (
        line_dedup_ingest_epoch, line_store_init)

    schema = "doc_id long, text string"
    store = os.path.join(str(tmp_path), "lines3r.parquet")
    line_store_init(spark, store)

    batch = spark.createDataFrame([(0, "XXX\nYYY"), (1, "XXX")], schema)
    first = {r.doc_id: (r.text, r.lines_total, r.lines_kept)
             for r in line_dedup_ingest_epoch(
                 batch, store, 0, min_repeat=3).collect()}
    assert first == {0: ("XXX\nYYY", 2, 2), 1: ("XXX", 1, 1)}
    replay = {r.doc_id: (r.text, r.lines_total, r.lines_kept)
              for r in line_dedup_ingest_epoch(
                  batch, store, 0, min_repeat=3).collect()}
    assert replay == first

    # Later epoch sees prior(XXX) = 2 exactly once (not 4 — but the
    # real probe is YYY: prior must be 1, leaving one slot).
    later = spark.createDataFrame([(5, "YYY\nXXX\nZZZ")], schema)
    out = {r.doc_id: (r.text, r.lines_total, r.lines_kept)
           for r in line_dedup_ingest_epoch(
               later, store, 1, min_repeat=3).collect()}
    assert out[5] == ("YYY\nZZZ", 3, 2)


@pytest.mark.slow
def test_line_store_compact_folds_counts(spark, tmp_path):
    """Compaction at min_repeat=3: folding epochs into the −1 base
    SUMS their per-key counts, so post-fold epochs see the same
    priors as an uncompacted twin — outputs stay identical."""
    from lisp_batch_processor_spark.streaming.dedup import (
        line_dedup_ingest_epoch, line_store_compact, line_store_init)

    schema = "doc_id long, text string"
    a = os.path.join(str(tmp_path), "fold_a")
    b = os.path.join(str(tmp_path), "fold_b")
    line_store_init(spark, a)
    line_store_init(spark, b)

    epochs = [
        [(0, "PPP\nQQQ")],
        [(10, "PPP\nRRR")],          # PPP now at 2 occurrences
        [(20, "QQQ\nSSS")],          # QQQ at 2
    ]

    def run(store, e, rows):
        return {(r.doc_id, r.text, r.lines_total, r.lines_kept)
                for r in line_dedup_ingest_epoch(
                    spark.createDataFrame(rows, schema), store, e,
                    min_repeat=3).collect()}

    for e, rows in enumerate(epochs):
        assert run(a, e, rows) == run(b, e, rows)

    assert line_store_compact(spark, a) == 2  # epochs 0,1 fold

    # Post-fold epoch: PPP and QQQ are saturated (prior=2, summed
    # across the folded base and the live tail) -> stripped in BOTH;
    # RRR/SSS at prior=1 keep their second occurrence.
    probe = [(30, "PPP\nRRR\nTTT"), (31, "QQQ\nSSS")]
    assert run(a, 3, probe) == run(b, 3, probe) == {
        (30, "RRR\nTTT", 3, 2), (31, "SSS", 2, 1)}


@pytest.mark.slow
def test_fuzz_streaming_line_dedup_counts_vs_python_oracle(
        spark, tmp_path):
    """Randomized epochs/replays/compactions at random min_repeat:
    the streaming line dedup over the persisted count store must
    match a pure-Python occurrence-counting oracle (prefix policy:
    occurrence index <= k-1 kept) on every epoch's rebuilt text, a
    replayed epoch must be byte-identical without double-counting,
    and a mid-stream fold must change nothing downstream."""
    import random

    from lisp_batch_processor_spark.streaming.dedup import (
        line_dedup_ingest_epoch, line_store_compact, line_store_init)

    rng = random.Random(4242)
    schema = "doc_id long, text string"
    vocab = [f"line L{i} body" for i in range(10)]  # small => collisions

    for trial in range(3):
        k = rng.choice([2, 3, 4])
        store = os.path.join(str(tmp_path), f"s{trial}")
        line_store_init(spark, store)
        counts: dict[str, int] = {}
        next_id = 0
        for e in range(4):
            docs = []
            for _ in range(rng.randint(1, 5)):
                n_lines = rng.randint(0, 4)
                text = "\n".join(rng.choice(vocab)
                                 for _ in range(n_lines))
                docs.append((next_id, text))
                next_id += 1
            batch = spark.createDataFrame(docs, schema)
            got = {r.doc_id: (r.text, r.lines_total, r.lines_kept)
                   for r in line_dedup_ingest_epoch(
                       batch, store, e, min_repeat=k).collect()}
            if rng.random() < 0.4:
                replay = {r.doc_id: (r.text, r.lines_total,
                                     r.lines_kept)
                          for r in line_dedup_ingest_epoch(
                              batch, store, e, min_repeat=k).collect()}
                assert replay == got, (trial, e, k, "replay")
            # Python oracle (batch order = (doc_id, pos); empty-split
            # lines are len 0 < min_chars=1 -> exempt, always kept).
            for d, text in docs:
                kept = []
                total = 0
                for line in text.split("\n"):
                    total += 1
                    if len(line) >= 1:
                        counts[line] = counts.get(line, 0) + 1
                        if counts[line] <= k - 1:
                            kept.append(line)
                    else:
                        kept.append(line)
                assert got[d] == ("\n".join(kept), total, len(kept)), \
                    (trial, e, k, d)
            if rng.random() < 0.5:
                line_store_compact(spark, store)


def _axis(i, dim=8, scale=1.0):
    v = [0.0] * dim
    v[i] = scale
    return v


@pytest.mark.slow
def test_semantic_ingest_epoch_concat_equals_batch(spark, tmp_path):
    """Streaming semantic dedup (the fourth incremental axis): two
    epochs against seed-trained centroids + the celled survivor
    store — dups of the seed, of an earlier epoch's survivor, and
    within-epoch are all caught; the epoch concatenation equals
    semantic_dedup over seed ∪ epochs with the SAME centroids,
    restricted to epoch ids; zero-norm vectors pass through; the
    store grows by exactly the survivors."""
    from lisp_batch_processor_spark.operators.dedup import (
        semantic_dedup)
    from lisp_batch_processor_spark.streaming.dedup import (
        semantic_ingest_epoch, semantic_read_centroids,
        semantic_store_seed)

    schema = "vec_id long, embedding array<double>"
    sd = str(tmp_path / "state")
    seed_rows = [(i, _axis(i - 1)) for i in range(1, 7)]  # axes e0..e5
    semantic_store_seed(spark.createDataFrame(seed_rows, schema), sd,
                        k=3)
    cents = semantic_read_centroids(spark, sd)
    assert len(cents) == 3 and len(cents[0]) == 8

    e0 = [(10, _axis(1, scale=1.001)),   # dup of seed id 2
          (11, _axis(6)),                # novel direction
          (12, _axis(6, scale=0.999))]   # within-epoch dup of 11
    e1 = [(20, _axis(6, scale=1.002)),   # dup of epoch-0 SURVIVOR 11
          (21, _axis(6, scale=0.998)),   # ~= dropped 12: still rep 11
          (22, _axis(7)),                # novel
          (23, [0.0] * 8)]               # zero-norm: pass-through
    got = {}
    for e, rows in enumerate((e0, e1)):
        out = semantic_ingest_epoch(
            spark.createDataFrame(rows, schema), sd, tau=0.95)
        got.update({r.vec_id: (r.rep_id, r.is_dup)
                    for r in out.collect()})

    assert got == {10: (2, True), 11: (11, False), 12: (11, True),
                   20: (11, True), 21: (11, True), 22: (22, False),
                   23: (23, False)}

    # Batch twin over seed ∪ epochs with the SAME centroids.
    full = spark.createDataFrame(seed_rows + e0 + e1, schema)
    want = {r.vec_id: (r.rep_id, r.is_dup)
            for r in semantic_dedup(full, tau=0.95,
                                    centroids=cents).collect()
            if r.vec_id >= 10}
    assert got == want

    # Store grew by exactly the survivors (11 and 22; never 23 —
    # zero-norm is not celled).
    ids = {r.vec_id for r in
           spark.read.parquet(f"{sd}/sem_vectors").collect()}
    assert ids == {1, 2, 3, 4, 5, 6, 11, 22}

    # Replay of epoch 1 AFTER its own append: identical rows (its
    # stored copies are self-pairs, resolved to rep = self).
    replay = {r.vec_id: (r.rep_id, r.is_dup)
              for r in semantic_ingest_epoch(
                  spark.createDataFrame(e1, schema), sd,
                  tau=0.95).collect()}
    assert replay == {k: v for k, v in got.items() if k >= 20}


@pytest.mark.slow
def test_streaming_semantic_ingest_round_trips(spark, tmp_path):
    """The foreachBatch wrapper drives the same epochs through a real
    stream with a checkpoint; assignments match the direct calls."""
    from lisp_batch_processor_spark.streaming.dedup import (
        semantic_store_seed, streaming_semantic_ingest)

    schema = "vec_id long, embedding array<double>"
    sd = str(tmp_path / "state")
    semantic_store_seed(
        spark.createDataFrame([(i, _axis(i - 1)) for i in range(1, 7)],
                              schema), sd, k=3)
    src = os.path.join(str(tmp_path), "vecs_in")
    spark.createDataFrame([(10, _axis(1, scale=1.001)),
                           (11, _axis(6))], schema).coalesce(1) \
        .write.parquet(os.path.join(src, "batch=0"))
    spark.createDataFrame([(20, _axis(6, scale=1.002)),
                           (21, _axis(7))], schema).coalesce(1) \
        .write.parquet(os.path.join(src, "batch=1"))
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "batch=*")))
    seen: dict[int, dict] = {}
    writer = streaming_semantic_ingest(
        stream, sd,
        lambda out, eid: seen.setdefault(
            eid, {r.vec_id: (r.rep_id, r.is_dup)
                  for r in out.collect()}))
    q = writer.option("checkpointLocation",
                      os.path.join(str(tmp_path), "ckpt")).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(seen) == 2
    merged = {}
    for d in seen.values():
        merged.update(d)
    assert merged == {10: (2, True), 11: (11, False),
                      20: (11, True), 21: (21, False)}


@pytest.mark.slow
def test_semantic_store_compact_bounds_files(spark, tmp_path):
    """The semantic stores joined the maintenance loop: per-epoch
    vector-store appends accrete one file set per epoch; a
    `semantic_store_compact` pass folds them to the size target and
    changes NOTHING downstream — the next epoch's assignment is
    byte-identical to the uncompacted twin's."""
    from lisp_batch_processor_spark.streaming.dedup import (
        semantic_ingest_epoch, semantic_store_compact,
        semantic_store_seed)

    schema = "vec_id long, embedding array<double>"
    seeds = [(i, _axis(i - 1)) for i in range(1, 5)]
    epochs = [[(10 + e * 10 + j, _axis((e + j) % 8, scale=1.0 + 0.001 * j))
               for j in range(3)] for e in range(4)]
    probe = [(90, _axis(0, scale=1.0005)), (91, _axis(7, scale=0.35))]

    outs = {}
    for variant, do_compact in (("plain", False), ("folded", True)):
        sd = str(tmp_path / variant)
        semantic_store_seed(spark.createDataFrame(seeds, schema), sd,
                            k=3)
        for e, rows in enumerate(epochs):
            semantic_ingest_epoch(spark.createDataFrame(rows, schema),
                                  sd, tau=0.95)
        if do_compact:
            rep = semantic_store_compact(spark, sd)
            assert rep["vector_files"] >= 1
            n_files = len([f for f in os.listdir(f"{sd}/sem_vectors")
                           if f.endswith(".parquet")])
            assert n_files == rep["vector_files"] <= 2
        outs[variant] = {
            r.vec_id: (r.rep_id, r.is_dup)
            for r in semantic_ingest_epoch(
                spark.createDataFrame(probe, schema), sd,
                tau=0.95).collect()}
    assert outs["folded"] == outs["plain"]


@pytest.mark.slow
def test_semantic_reseed_generation_switch(spark, tmp_path):
    """Generational re-seed (the drift loop): a new centroid model
    trains from the CURRENT survivors, the survivors re-cell
    engine-side, and (centroids, vectors) commit atomically under
    one marker PUT — readers before the PUT stay on the old
    generation, a replayed reseed reuses its generation, post-switch
    epochs stay pinned to the batch twin under the NEW model, and
    the vacuum keeps exactly one generation of grace."""
    from lisp_batch_processor_spark.operators.dedup import (
        semantic_dedup)
    from lisp_batch_processor_spark.streaming.dedup import (
        semantic_cell_occupancy, semantic_current_gen,
        semantic_ingest_epoch, semantic_read_centroids,
        semantic_reseed, semantic_store_seed)

    schema = "vec_id long, embedding array<double>"
    sd = str(tmp_path / "state")
    seeds = [(i, _axis(i - 1)) for i in range(1, 5)]  # axes e0..e3
    semantic_store_seed(spark.createDataFrame(seeds, schema), sd, k=2)
    assert semantic_current_gen(spark, sd) == \
        {"gen": 0, "k": None, "epoch": None}

    # A stale next-gen dir from a "crashed" earlier attempt (vectors
    # written, marker never PUT) is invisible to readers...
    os.makedirs(f"{sd}/sem_vectors_g1")
    with open(f"{sd}/sem_vectors_g1/garbage.txt", "w") as f:
        f.write("torn")
    assert semantic_current_gen(spark, sd)["gen"] == 0
    cents_g0 = semantic_read_centroids(spark, sd)
    assert len(cents_g0) == 2

    # Grow the corpus so k=2 cells are crowded (ids 10-13 duplicate
    # the seeds; 14/15 are novel axes e4/e5 — axes e6/e7 stay free
    # for the post-switch epoch), then reseed with a target cell
    # size — k re-derives from the survivor count.
    epoch0 = [(10 + j, _axis(j)) for j in range(6)]
    semantic_ingest_epoch(spark.createDataFrame(epoch0, schema), sd,
                          tau=0.999)
    occ0 = semantic_cell_occupancy(spark, sd)
    assert occ0["gen"] == 0 and occ0["k"] == 2
    assert occ0["vectors"] == 6  # seeds 1-4 + novel 14, 15
    assert occ0["max_cell"] >= occ0["vectors"] / 2

    g = semantic_reseed(spark, sd, target_cell=2, epoch=0)
    assert g == 1
    marker = semantic_current_gen(spark, sd)
    assert marker["gen"] == 1 and marker["epoch"] == 0
    # k = ceil(survivors / 2); the crashed attempt's dir was replaced.
    n_surv = occ0["vectors"]
    assert marker["k"] == -(-n_surv // 2)
    assert not os.path.exists(f"{sd}/sem_vectors_g1/garbage.txt")
    cents_g1 = semantic_read_centroids(spark, sd)
    assert len(cents_g1) == marker["k"]

    # Survivor SET is preserved across the re-cell (ids, no dups).
    import collections
    g1_ids = [r.vec_id for r in
              spark.read.parquet(f"{sd}/sem_vectors_g1").collect()]
    g0_ids = {r.vec_id for r in
              spark.read.parquet(f"{sd}/sem_vectors").collect()}
    assert collections.Counter(g1_ids) == \
        {i: 1 for i in g0_ids}

    # Replayed reseed (same triggering epoch) reuses generation 1.
    assert semantic_reseed(spark, sd, target_cell=2, epoch=0) == 1
    assert semantic_current_gen(spark, sd)["gen"] == 1
    assert not os.path.exists(f"{sd}/sem_vectors_g2")

    # Post-switch epoch: pinned to the batch twin under the NEW
    # model over (survivors ∪ epoch). Snapshot the survivor store
    # BEFORE the epoch appends to it.
    pre_epoch = [(int(r.vec_id), [float(x) for x in r.embedding])
                 for r in
                 spark.read.parquet(f"{sd}/sem_vectors_g1").collect()]
    epoch1 = [(30, _axis(0, scale=1.0001)),  # dup of survivor 1
              (31, _axis(6))]                 # novel (e6 unused)
    got = {r.vec_id: (r.rep_id, r.is_dup)
           for r in semantic_ingest_epoch(
               spark.createDataFrame(epoch1, schema), sd,
               tau=0.95).collect()}
    full = spark.createDataFrame(pre_epoch + epoch1, schema)
    want = {r.vec_id: (r.rep_id, r.is_dup)
            for r in semantic_dedup(full, tau=0.95,
                                    centroids=cents_g1).collect()
            if r.vec_id >= 30}
    assert got == want
    assert got[31] == (31, False)

    # Second reseed (manual, untagged): gen 2 commits and the vacuum
    # removes generation 0, keeping generation 1 as the grace copy.
    assert semantic_reseed(spark, sd) == 2
    assert os.path.exists(f"{sd}/sem_vectors_g2")
    assert os.path.exists(f"{sd}/sem_vectors_g1")
    assert not os.path.exists(f"{sd}/sem_vectors")
    assert not os.path.exists(f"{sd}/sem_centroids")
    # Carried-over k (no target): same k as generation 1.
    assert semantic_current_gen(spark, sd)["k"] == marker["k"]


def test_semantic_reseed_replayed_trigger_epoch_is_identical(
        spark, tmp_path):
    """The replay pin across a generation switch: the epoch whose
    trigger committed a reseed recomputes BYTE-IDENTICALLY when
    replayed — the streaming hook pins its assignment back to the
    previous generation (kept by the vacuum grace), and the reseed
    itself no-ops on the marker's epoch tag."""
    from lisp_batch_processor_spark.streaming.dedup import (
        semantic_current_gen, semantic_ingest_epoch,
        semantic_read_centroids, semantic_reseed, semantic_store_seed)

    schema = "vec_id long, embedding array<double>"
    sd = str(tmp_path / "state")
    semantic_store_seed(
        spark.createDataFrame([(i, _axis(i - 1)) for i in range(1, 5)],
                              schema), sd, k=2)
    cents_g0 = semantic_read_centroids(spark, sd)

    # Epoch 7 runs under gen 0, then its trigger commits a reseed.
    e7 = [(70, _axis(0, scale=1.0004)), (71, _axis(5))]
    first = {r.vec_id: (r.rep_id, r.is_dup)
             for r in semantic_ingest_epoch(
                 spark.createDataFrame(e7, schema), sd, tau=0.95,
                 centroids=cents_g0, gen=0).collect()}
    assert semantic_reseed(spark, sd, epoch=7) == 1

    # Crash before the checkpoint commit; epoch 7 replays. The hook's
    # logic: marker epoch == 7 -> use gen 0 for the assignment and
    # skip the reseed.
    cur = semantic_current_gen(spark, sd)
    assert cur["epoch"] == 7
    use_gen = cur["gen"] - 1
    replay = {r.vec_id: (r.rep_id, r.is_dup)
              for r in semantic_ingest_epoch(
                  spark.createDataFrame(e7, schema), sd, tau=0.95,
                  centroids=semantic_read_centroids(spark, sd,
                                                    gen=use_gen),
                  gen=use_gen).collect()}
    assert replay == first
    assert semantic_reseed(spark, sd, epoch=7) == 1  # still gen 1


@pytest.mark.slow
def test_streaming_semantic_ingest_hooks(spark, tmp_path):
    """The foreachBatch twin self-maintains: compact_every bounds the
    vector store's files, and the occupancy trigger commits a new
    generation mid-stream whose later epochs dedup correctly against
    the re-celled survivors."""
    from lisp_batch_processor_spark.streaming.dedup import (
        semantic_current_gen, semantic_store_seed,
        streaming_semantic_ingest)

    schema = "vec_id long, embedding array<double>"
    sd = str(tmp_path / "state")
    semantic_store_seed(
        spark.createDataFrame([(i, _axis(i - 1)) for i in range(1, 3)],
                              schema), sd, k=1)
    src = os.path.join(str(tmp_path), "vecs_in")
    # Epochs 0-2 pile distinct directions into k=1's single cell
    # (occupancy rises past the trigger); epoch 3 lands dups.
    batches = [
        [(10, _axis(2)), (11, _axis(3))],
        [(20, _axis(4)), (21, _axis(5))],
        [(30, _axis(6)), (31, _axis(7))],
        [(40, _axis(6, scale=1.0003)),   # dup of 30 (post-reseed)
         (41, _axis(2, scale=0.9996))],  # dup of 10
    ]
    for e, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.parquet(os.path.join(src, f"batch={e}"))
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "batch=*")))
    seen: dict[int, dict] = {}
    writer = streaming_semantic_ingest(
        stream, sd,
        lambda out, eid: seen.setdefault(
            eid, {r.vec_id: (r.rep_id, r.is_dup)
                  for r in out.collect()}),
        compact_every=2, reseed_max_cell=5, reseed_target_cell=3)
    q = writer.option("checkpointLocation",
                      os.path.join(str(tmp_path), "ckpt")).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(seen) == 4
    # All pre-reseed epochs were novel directions.
    for e in range(3):
        assert all(not d for _, d in seen[e].values()), seen[e]
    # The occupancy trigger fired mid-stream (8 survivors > 5 in the
    # single k=1 cell) and epoch 3's dups resolve against re-celled
    # survivors under the new generation.
    assert semantic_current_gen(spark, sd)["gen"] >= 1
    assert seen[3] == {40: (30, True), 41: (10, True)}


def test_line_store_min_repeat_contract_is_machine_checked(
        spark, tmp_path):
    """ONE min_repeat per store, enforced: the threshold records in
    the store meta at first use (or at init), and a later epoch at a
    different k raises instead of silently undercounting against
    saturated counts."""
    from lisp_batch_processor_spark.streaming.dedup import (
        line_dedup_ingest_epoch, line_store_init)

    schema = "doc_id long, text string"
    b0 = spark.createDataFrame([(1, "aa\nbb"), (2, "aa\ncc")], schema)
    b1 = spark.createDataFrame([(3, "aa\ndd")], schema)

    # First-use recording.
    s1 = os.path.join(str(tmp_path), "s1")
    line_store_init(spark, s1)
    line_dedup_ingest_epoch(b0, s1, 0, min_repeat=3)
    line_dedup_ingest_epoch(b1, s1, 1, min_repeat=3)  # same k: fine
    with pytest.raises(ValueError, match="min_repeat=3"):
        line_dedup_ingest_epoch(b1, s1, 2, min_repeat=2)

    # Init-time pinning.
    s2 = os.path.join(str(tmp_path), "s2")
    line_store_init(spark, s2, min_repeat=2)
    with pytest.raises(ValueError, match="min_repeat=2"):
        line_dedup_ingest_epoch(b0, s2, 0, min_repeat=4)
    out = {r.doc_id: r.text
           for r in line_dedup_ingest_epoch(b0, s2, 0,
                                            min_repeat=2).collect()}
    assert out == {1: "aa\nbb", 2: "cc"}

    with pytest.raises(ValueError, match="min_repeat must be >= 2"):
        line_store_init(spark, os.path.join(str(tmp_path), "s3"),
                        min_repeat=1)


@pytest.mark.slow
def test_fuzz_semantic_generation_lifecycle(spark, tmp_path):
    """Randomized epochs / replays / compactions / generational
    reseeds (including a crash-injected marker PUT) over the
    persisted semantic stores, against a numpy oracle: every epoch's
    assignment must match single-hop min-id dedup recomputed from
    the CURRENT generation's collected centroids + the pre-epoch
    survivor set; replays after the store append are byte-identical;
    compaction and committed reseeds never change later assignments;
    a reseed that crashes before the marker PUT leaves readers on
    the previous generation; the survivor ID set survives every
    re-cell exactly."""
    import random

    import numpy as np

    from lisp_batch_processor_spark.sources import writers as W
    from lisp_batch_processor_spark.streaming.dedup import (
        semantic_cell_occupancy, semantic_cell_occupancy_fast,
        semantic_current_gen, semantic_ingest_epoch,
        semantic_read_centroids, semantic_reseed, semantic_store_compact,
        semantic_store_seed, semantic_store_roots)

    DIM, TAU = 16, 0.95
    schema = "vec_id long, embedding array<double>"

    def _unit(rng):
        v = rng.standard_normal(DIM)
        return v / np.linalg.norm(v)

    def oracle_epoch(cents, store_vecs, batch):
        """store_vecs: {id: np.unit}; batch: [(id, list)] with ids >
        every store id. Returns {id: (rep, is_dup)} + survivors."""
        c = np.array(cents, dtype=np.float64)
        c = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True),
                           1e-12)
        cell_of, unit_of = {}, {}
        for i, v in sorted(store_vecs.items()):
            cell_of[i] = int(np.argmax(c @ v))
            unit_of[i] = v
        border = min(i for i, _ in batch)
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
        survivors = {i: unit_of[i] for i, _ in batch
                     if not out[i][1] and i >= border}
        return out, survivors

    rng = random.Random(9090)
    nprng = np.random.default_rng(909)
    sd = str(tmp_path / "state")
    seed_vecs = {i: _unit(nprng) for i in range(12)}
    semantic_store_seed(
        spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in seed_vecs.items()],
            schema), sd, k=4)
    cents = semantic_read_centroids(spark, sd)
    store = dict(seed_vecs)   # the oracle's survivor mirror
    next_id = 100

    for e in range(8):
        # Build a batch: each vector a dup of a random survivor or a
        # novel direction (cosines sit far from tau either way).
        batch = []
        for _ in range(rng.randint(2, 6)):
            if store and rng.random() < 0.4:
                base = store[rng.choice(sorted(store))]
                batch.append((next_id,
                              [float(x) * 1.0001 for x in base]))
            else:
                batch.append((next_id,
                              [float(x) for x in _unit(nprng)]))
            next_id += 1
        want, new_surv = oracle_epoch(cents, store, batch)

        bdf = spark.createDataFrame(batch, schema)
        got = {r.vec_id: (r.rep_id, r.is_dup)
               for r in semantic_ingest_epoch(bdf, sd, tau=TAU,
                                              epoch=e).collect()}
        assert got == want, (e, "oracle")
        if rng.random() < 0.4:   # replay after the append
            replay = {r.vec_id: (r.rep_id, r.is_dup)
                      for r in semantic_ingest_epoch(
                          bdf, sd, tau=TAU, epoch=e).collect()}
            assert replay == got, (e, "replay")
        store.update(new_surv)

        # The persisted survivor set mirrors the oracle's exactly.
        _, vec_path = semantic_store_roots(spark, sd)
        disk_ids = {r.vec_id for r in spark.read.parquet(
            W.store_data_path(spark, vec_path)).select("vec_id")
            .distinct().collect()}
        assert disk_ids == set(store), (e, "store-mirror")

        # The O(k) ledger signal mirrors the full scan at every
        # random lifecycle point — replays, compactions, committed
        # AND crashed reseeds below all preserve the equality.
        assert semantic_cell_occupancy_fast(spark, sd) \
            == semantic_cell_occupancy(spark, sd), (e, "fast-signal")

        if rng.random() < 0.4:
            semantic_store_compact(spark, sd)
        if rng.random() < 0.4:
            g_before = semantic_current_gen(spark, sd)["gen"]
            if rng.random() < 0.5:
                # Crash INSIDE the commit: the marker PUT raises.
                real_put = W.write_json_file

                def torn_put(spark_, path, obj):
                    if "/_sem_gen" in path:
                        raise IOError("injected crash before commit")
                    real_put(spark_, path, obj)

                W.write_json_file = torn_put
                try:
                    with pytest.raises(IOError, match="injected"):
                        semantic_reseed(spark, sd,
                                        target_cell=rng.choice([3, 5]))
                finally:
                    W.write_json_file = real_put
                # Readers stay on the previous generation — both of
                # its stores intact, centroids unchanged.
                assert semantic_current_gen(spark, sd)["gen"] \
                    == g_before, (e, "crash-gen")
                assert semantic_read_centroids(spark, sd) == cents, \
                    (e, "crash-cents")
            else:
                g = semantic_reseed(spark, sd,
                                    target_cell=rng.choice([3, 5]))
                assert g == g_before + 1, (e, "gen-advance")
                cents = semantic_read_centroids(spark, sd)
                _, vec_path = semantic_store_roots(spark, sd)
                recelled = {r.vec_id for r in spark.read.parquet(
                    W.store_data_path(spark, vec_path))
                    .select("vec_id").distinct().collect()}
                assert recelled == set(store), (e, "reseed-mirror")


@pytest.mark.slow
def test_semantic_generations_on_the_versioned_backend(spark, tmp_path):
    """The semantic stores' whole lifecycle — seed, epochs, compact,
    generational reseed — on the versioned (pointer-committed)
    backend: every generation's stores carry the backend tag, reads
    resolve pointers, compaction publishes a new version, and the
    reseed's new-generation stores inherit the backend."""
    from lisp_batch_processor_spark.sources.writers import (
        store_is_versioned)
    from lisp_batch_processor_spark.streaming.dedup import (
        semantic_current_gen, semantic_ingest_epoch, semantic_reseed,
        semantic_store_compact, semantic_store_roots,
        semantic_store_seed)

    schema = "vec_id long, embedding array<double>"
    sd = str(tmp_path / "state")
    semantic_store_seed(
        spark.createDataFrame([(i, _axis(i - 1)) for i in range(1, 5)],
                              schema), sd, k=2, backend="versioned")
    cent0, vec0 = semantic_store_roots(spark, sd)
    assert store_is_versioned(spark, vec0)
    assert store_is_versioned(spark, cent0)

    got = {r.vec_id: (r.rep_id, r.is_dup)
           for r in semantic_ingest_epoch(
               spark.createDataFrame(
                   [(10, _axis(0, scale=1.001)),  # dup of seed 1
                    (11, _axis(5))], schema), sd, tau=0.95,
               epoch=0).collect()}
    assert got == {10: (1, True), 11: (11, False)}
    semantic_ingest_epoch(
        spark.createDataFrame([(12, _axis(7))], schema), sd,
        tau=0.95, epoch=1)   # axis 7: free (6 is epoch-2's novelty)

    rep = semantic_store_compact(spark, sd)
    assert rep["vector_files"] >= 1   # versioned rewrite published
    # The cell-count ledger folds through the versioned backend too
    # (epochs −1 and 0 below the kept-newest epoch 1), and the O(k)
    # signal still mirrors the full scan afterwards.
    from lisp_batch_processor_spark.streaming.dedup import (
        semantic_cell_occupancy, semantic_cell_occupancy_fast)
    assert rep["cellcount_epochs_folded"] == 2
    assert semantic_cell_occupancy_fast(spark, sd) \
        == semantic_cell_occupancy(spark, sd)

    g = semantic_reseed(spark, sd, target_cell=2)
    assert g == 1 and semantic_current_gen(spark, sd)["gen"] == 1
    cent1, vec1 = semantic_store_roots(spark, sd)
    assert vec1.endswith("_g1") and store_is_versioned(spark, vec1)
    assert store_is_versioned(spark, cent1)

    # Post-switch epoch still dedups against the re-celled survivors.
    got2 = {r.vec_id: (r.rep_id, r.is_dup)
            for r in semantic_ingest_epoch(
                spark.createDataFrame(
                    [(20, _axis(5, scale=0.999)),  # dup of survivor 11
                     (21, _axis(6))], schema), sd, tau=0.95).collect()}
    assert got2 == {20: (11, True), 21: (21, False)}


def test_torn_generation_marker_steps_down_not_to_gen0(
        spark, tmp_path):
    """Markers are sequence-named commits, never overwritten: a torn
    top marker (crash mid-create during a reseed) must resolve to
    the PREVIOUS committed generation — whose stores the vacuum
    grace keeps — never to a long-vacuumed generation 0; the next
    reseed deletes the torn leftover and commits cleanly."""
    from lisp_batch_processor_spark.streaming.dedup import (
        semantic_current_gen, semantic_ingest_epoch,
        semantic_read_centroids, semantic_reseed, semantic_store_seed)

    schema = "vec_id long, embedding array<double>"
    sd = str(tmp_path / "state")
    semantic_store_seed(
        spark.createDataFrame([(i, _axis(i - 1)) for i in range(1, 5)],
                              schema), sd, k=2)
    assert semantic_reseed(spark, sd, target_cell=2) == 1
    assert semantic_current_gen(spark, sd)["gen"] == 1

    # Crash mid-create of generation 2's marker: torn JSON on disk.
    with open(os.path.join(sd, "_sem_gen_2.json"), "w") as f:
        f.write('{"gen": 2, "k"')
    crc = os.path.join(sd, "._sem_gen_2.json.crc")
    if os.path.exists(crc):
        os.remove(crc)
    cur = semantic_current_gen(spark, sd)
    assert cur["gen"] == 1                       # stepped DOWN, not 0
    assert len(semantic_read_centroids(spark, sd)) == 2  # gen-1 model
    # Epochs still run against generation 1's stores.
    got = {r.vec_id: r.is_dup for r in semantic_ingest_epoch(
        spark.createDataFrame([(10, _axis(0, scale=1.001))], schema),
        sd, tau=0.95).collect()}
    assert got == {10: True}

    # The retry reseed clears the torn leftover and commits gen 2.
    assert semantic_reseed(spark, sd, target_cell=2) == 2
    assert semantic_current_gen(spark, sd)["gen"] == 2
    assert os.path.exists(os.path.join(sd, "sem_vectors_g2"))


@pytest.mark.slow
def test_epoch_lineage_contract_is_machine_checked(spark, tmp_path):
    """The monotonic-epoch / one-lineage contract every epoch-tagged
    store assumes is now an error, not a docstring (round 10, the
    min_repeat pin's shape): an epoch REGRESSION (a new checkpoint
    restarting at 0 over old state) or a FOREIGN lineage token
    raises; replays (epoch == high-water) and same-lineage resumes
    pass; a torn meta fails open and re-records; a seed resets."""
    from lisp_batch_processor_spark.streaming.dedup import (
        _ingest_lineage_path, semantic_ingest_epoch,
        semantic_store_seed)

    schema = "vec_id long, embedding array<double>"
    sd = str(tmp_path / "state")
    semantic_store_seed(
        spark.createDataFrame([(1, _axis(0)), (2, _axis(1))], schema),
        sd, k=2)

    def run(eid, ids_axes, lineage=None):
        return semantic_ingest_epoch(
            spark.createDataFrame(
                [(i, _axis(a)) for i, a in ids_axes], schema),
            sd, tau=0.95, epoch=eid, lineage=lineage)

    run(0, [(10, 2)], lineage="ckptA").collect()
    run(1, [(11, 3)], lineage="ckptA").collect()   # progress
    run(1, [(11, 3)], lineage="ckptA").collect()   # replay: equal ok
    run(2, [(12, 4)]).collect()                    # tokenless: ok

    with pytest.raises(ValueError, match="epoch regression"):
        run(0, [(13, 5)])
    with pytest.raises(ValueError, match="lineage"):
        run(3, [(13, 5)], lineage="ckptB")         # foreign token

    # Torn meta (crash mid-PUT): fail-open — re-records and carries on.
    mp = _ingest_lineage_path(sd)
    with open(mp, "w") as f:
        f.write('{"lineage": "ck')
    crc = os.path.join(os.path.dirname(mp),
                       "." + os.path.basename(mp) + ".crc")
    if os.path.exists(crc):
        os.remove(crc)
    run(3, [(13, 5)], lineage="ckptB").collect()
    with pytest.raises(ValueError, match="lineage"):
        run(4, [(14, 6)], lineage="ckptA")         # B now recorded

    # A fresh SEED declares a new lineage: the meta resets AND the
    # previous gen-0 stores are removed (appends would otherwise mix
    # two seeds' vectors and ledger baselines).
    from lisp_batch_processor_spark.sources import writers as W
    from lisp_batch_processor_spark.streaming.dedup import (
        semantic_store_roots)
    semantic_store_seed(
        spark.createDataFrame([(1, _axis(0)), (2, _axis(1))], schema),
        str(tmp_path / "state"), k=2)
    _, vp = semantic_store_roots(spark, sd)
    assert {r.vec_id for r in
            spark.read.parquet(W.store_data_path(spark, vp))
            .select("vec_id").distinct().collect()} == {1, 2}
    run(0, [(20, 2)], lineage="ckptC").collect()


def test_line_store_epoch_lineage_guard(spark, tmp_path):
    """The line store's meta sidecar pins the same contract: an epoch
    below the recorded high-water mark, or a foreign lineage token,
    raises — the restarted-at-0 stream would otherwise see only seed
    rows through its `epoch_id < 0` filter and silently re-admit
    every previously-seen line."""
    from lisp_batch_processor_spark.streaming.dedup import (
        line_dedup_ingest_epoch, line_store_init)

    schema = "doc_id long, text string"
    store = os.path.join(str(tmp_path), "lines.parquet")
    line_store_init(spark, store)
    b = lambda i: spark.createDataFrame([(i, f"x{i}\nshared")], schema)
    line_dedup_ingest_epoch(b(0), store, 0, lineage="ck1")
    line_dedup_ingest_epoch(b(1), store, 1, lineage="ck1")
    line_dedup_ingest_epoch(b(1), store, 1, lineage="ck1")  # replay
    with pytest.raises(ValueError, match="epoch regression"):
        line_dedup_ingest_epoch(b(9), store, 0)
    with pytest.raises(ValueError, match="lineage"):
        line_dedup_ingest_epoch(b(9), store, 2, lineage="ck2")
    # Same lineage, progressing epoch: fine.
    out = {r.doc_id: r.text
           for r in line_dedup_ingest_epoch(b(2), store, 2,
                                            lineage="ck1").collect()}
    assert out == {2: "x2"}   # 'shared' stripped: membership intact


@pytest.mark.slow
def test_semantic_fast_occupancy_matches_exact(spark, tmp_path):
    """The O(k)-per-epoch reseed-due signal
    (`semantic_cell_occupancy_fast` over the cell-count ledger) must
    reproduce the full-scan signal exactly at every lifecycle point:
    after seed, after each epoch (epochs pass ``epoch=``), after a
    replayed epoch (duplicate ledger rows collapse), across a
    compaction fold, and across a generational reseed (which writes
    the next generation's complete baseline). A state dir whose
    ledger is absent returns None — the full-scan fallback."""
    import shutil

    from lisp_batch_processor_spark.streaming.dedup import (
        semantic_cell_occupancy, semantic_cell_occupancy_fast,
        semantic_ingest_epoch, semantic_reseed, semantic_store_compact,
        semantic_store_seed)

    schema = "vec_id long, embedding array<double>"
    sd = str(tmp_path / "state")
    semantic_store_seed(
        spark.createDataFrame([(i, _axis(i - 1)) for i in range(1, 4)],
                              schema), sd, k=2)

    def both():
        fast = semantic_cell_occupancy_fast(spark, sd)
        full = semantic_cell_occupancy(spark, sd)
        assert fast == full, (fast, full)
        return full

    assert both()["vectors"] == 3

    batches = [
        [(10, _axis(3)), (11, _axis(4)),
         (12, _axis(0, scale=1.001))],      # dup of seed 1: no append
        [(20, _axis(5)), (21, _axis(3, scale=0.999))],  # dup of 10
        [(30, _axis(6))],
    ]
    for e, rows in enumerate(batches):
        bdf = spark.createDataFrame(rows, schema)
        semantic_ingest_epoch(bdf, sd, tau=0.95, epoch=e)
        if e == 1:   # replay after the append: ledger rows collapse
            semantic_ingest_epoch(bdf, sd, tau=0.95, epoch=e)
        occ = both()
        if e == 1:
            semantic_store_compact(spark, sd)     # fold the ledger
            assert both() == occ                  # fold changes nothing
    assert both()["vectors"] == 3 + 2 + 1 + 1     # survivors only

    # Generational reseed: new ledger baseline, signals still agree.
    semantic_reseed(spark, sd, target_cell=3)
    post = both()
    assert post["gen"] == 1 and post["vectors"] == 7

    # Adopted pre-r10 state: no ledger -> None (full-scan fallback).
    sd2 = str(tmp_path / "state2")
    semantic_store_seed(
        spark.createDataFrame([(1, _axis(0))], schema), sd2, k=1)
    shutil.rmtree(os.path.join(sd2, "sem_cellcounts"))
    assert semantic_cell_occupancy_fast(spark, sd2) is None
    assert semantic_cell_occupancy(spark, sd2)["vectors"] == 1
    # ... and its first reseed writes the baseline: fast takes over.
    semantic_reseed(spark, sd2, target_cell=1)
    fast2 = semantic_cell_occupancy_fast(spark, sd2)
    assert fast2 is not None
    assert fast2 == semantic_cell_occupancy(spark, sd2)

    # A present ledger is COMPLETE, as an invariant: an UNTAGGED
    # ingest (epoch=None, the pre-r10 call shape) can't ledger its
    # counts, so it DROPS the ledger — fast falls back to the full
    # scan instead of silently understating.
    semantic_ingest_epoch(
        spark.createDataFrame([(50, _axis(1))], schema), sd2,
        tau=0.95)
    assert semantic_cell_occupancy_fast(spark, sd2) is None
    assert semantic_cell_occupancy(spark, sd2)["vectors"] == 2


@pytest.mark.slow
def test_semantic_counts_seed_backfills_adopted_dir(spark, tmp_path):
    """`semantic_counts_seed` migrates an ADOPTED ledger-less state
    dir to the O(k) occupancy path up front (round 11): one survivor
    scan writes the current generation's epoch −1 baseline, the fast
    signal flips from None to exactly the full scan, later tagged
    epochs append to the backfilled ledger as to a reseed-written
    one, and a second call is a no-op (a present ledger is complete
    by invariant — re-seeding would double the baseline)."""
    import os
    import shutil

    from lisp_batch_processor_spark.streaming.dedup import (
        semantic_cell_occupancy, semantic_cell_occupancy_fast,
        semantic_counts_seed, semantic_ingest_epoch,
        semantic_store_seed)

    schema = "vec_id long, embedding array<double>"
    sd = str(tmp_path / "state")
    semantic_store_seed(
        spark.createDataFrame([(1, _axis(0)), (2, _axis(1))], schema),
        sd, k=2)
    # Simulate the pre-r10 dir: history ran, no ledger survives.
    semantic_ingest_epoch(
        spark.createDataFrame([(10, _axis(2)), (11, _axis(3))],
                              schema), sd, tau=0.95)  # untagged: drops
    shutil.rmtree(os.path.join(sd, "sem_cellcounts"),
                  ignore_errors=True)
    assert semantic_cell_occupancy_fast(spark, sd) is None

    assert semantic_counts_seed(spark, sd) is True
    full = semantic_cell_occupancy(spark, sd)
    assert semantic_cell_occupancy_fast(spark, sd) == full
    assert full["vectors"] == 4

    # No-op on a ledgered dir (idempotent adoption).
    assert semantic_counts_seed(spark, sd) is False
    assert semantic_cell_occupancy_fast(spark, sd) == full

    # Tagged epochs append to the backfilled ledger seamlessly —
    # including a replay, whose duplicate rows collapse.
    b = spark.createDataFrame([(20, _axis(4)),
                               (21, _axis(2, scale=1.001))], schema)
    semantic_ingest_epoch(b, sd, tau=0.95, epoch=7)
    semantic_ingest_epoch(b, sd, tau=0.95, epoch=7)
    fast = semantic_cell_occupancy_fast(spark, sd)
    assert fast == semantic_cell_occupancy(spark, sd)
    assert fast["vectors"] == 5   # 21 died as a dup of 10


@pytest.mark.slow
def test_counts_seed_backfill_is_replay_safe(spark, tmp_path):
    """The backfill's crash window (round 11): an epoch whose
    vector-store append committed but whose checkpoint did NOT is
    already counted in a between-restarts backfill baseline — its
    REPLAY then appends tagged ledger rows the (cell, epoch) dedup
    cannot collapse. The recorded ``baseline_through_epoch`` horizon
    masks exactly that window: fast == full through the replay,
    through later epochs, and through a compaction fold."""
    import os
    import shutil

    from lisp_batch_processor_spark.streaming.dedup import (
        semantic_cell_occupancy, semantic_cell_occupancy_fast,
        semantic_counts_seed, semantic_ingest_epoch,
        semantic_store_compact, semantic_store_seed)

    schema = "vec_id long, embedding array<double>"
    sd = str(tmp_path / "state")
    semantic_store_seed(
        spark.createDataFrame([(1, _axis(0)), (2, _axis(1))], schema),
        sd, k=2)
    shutil.rmtree(os.path.join(sd, "sem_cellcounts"))  # adopted dir

    # Epoch 9 commits its vectors, then "crashes" before the
    # checkpoint commit (no ledger existed, so it ledgered nothing).
    b9 = spark.createDataFrame([(30, _axis(5)), (31, _axis(6))],
                               schema)
    semantic_ingest_epoch(b9, sd, tau=0.95, epoch=9)

    # Operator backfills between restarts: baseline includes epoch
    # 9's survivors; the horizon records high-water 9.
    assert semantic_counts_seed(spark, sd) is True
    full = semantic_cell_occupancy(spark, sd)
    assert semantic_cell_occupancy_fast(spark, sd) == full
    assert full["vectors"] == 4

    # The restarted stream REPLAYS epoch 9 — now the ledger exists,
    # so the replay appends (cell, 9, n) rows; the horizon keeps the
    # fast signal exact instead of double-counting.
    semantic_ingest_epoch(b9, sd, tau=0.95, epoch=9)
    assert semantic_cell_occupancy_fast(spark, sd) \
        == semantic_cell_occupancy(spark, sd)

    # Progress past the horizon counts normally...
    semantic_ingest_epoch(
        spark.createDataFrame([(40, _axis(7))], schema), sd,
        tau=0.95, epoch=10)
    fast = semantic_cell_occupancy_fast(spark, sd)
    assert fast == semantic_cell_occupancy(spark, sd)
    assert fast["vectors"] == 5
    # ... and the compaction fold consumes the same filtered frame,
    # so the replay rows never fold into the base either.
    semantic_store_compact(spark, sd)
    assert semantic_cell_occupancy_fast(spark, sd) \
        == semantic_cell_occupancy(spark, sd)


@pytest.mark.slow
def test_counts_seed_single_writer_window_is_leased(spark, tmp_path):
    """The backfill's single-writer window is MACHINE-CHECKED
    (round 12): `semantic_counts_seed` and every ``epoch=``-tagged
    `semantic_ingest_epoch` contend on one maintenance lease over the
    ledger root, so a backfill racing a live stream's appends raises
    `LeaseHeldError` on one side instead of relying on the docstring.
    The backfill's own lease releases on success AND on failure."""
    import os

    from lisp_batch_processor_spark.sources.writers import (
        LeaseHeldError, acquire_lease, lease_holder, release_lease)
    from lisp_batch_processor_spark.streaming.dedup import (
        semantic_cell_occupancy_fast, semantic_counts_seed,
        semantic_ingest_epoch, semantic_store_seed)
    import lisp_batch_processor_spark.streaming.dedup as sdmod

    schema = "vec_id long, embedding array<double>"
    sd = str(tmp_path / "state")
    semantic_store_seed(
        spark.createDataFrame([(1, _axis(0)), (2, _axis(1))], schema),
        sd, k=2)
    import shutil
    shutil.rmtree(os.path.join(sd, "sem_cellcounts"))  # adopted dir
    cc = os.path.join(sd, "sem_cellcounts")

    # A held ingest lease makes the backfill refuse — and write
    # NOTHING (the ledger stays absent, so a retry is clean).
    owner = acquire_lease(spark, cc, owner="ingest-epoch-live")
    with pytest.raises(LeaseHeldError):
        semantic_counts_seed(spark, sd)
    assert semantic_cell_occupancy_fast(spark, sd) is None
    # ... and the held lease symmetrically refuses a tagged epoch's
    # appends (the other side of the race).
    with pytest.raises(LeaseHeldError):
        semantic_ingest_epoch(
            spark.createDataFrame([(10, _axis(2))], schema), sd,
            tau=0.95, epoch=3)
    release_lease(spark, cc, owner)

    # Failure path: the backfill's lease releases even when the
    # baseline append blows up mid-window.
    real_append = sdmod._sem_counts_append

    def boom(*a, **k):
        raise RuntimeError("injected")

    sdmod._sem_counts_append = boom
    try:
        with pytest.raises(RuntimeError, match="injected"):
            semantic_counts_seed(spark, sd)
    finally:
        sdmod._sem_counts_append = real_append
    assert lease_holder(spark, cc) is None

    # Success path: backfill completes and releases; the next tagged
    # epoch acquires the lease cleanly and appends.
    assert semantic_counts_seed(spark, sd) is True
    assert lease_holder(spark, cc) is None
    semantic_ingest_epoch(
        spark.createDataFrame([(10, _axis(2))], schema), sd,
        tau=0.95, epoch=4)
    assert lease_holder(spark, cc) is None
    from lisp_batch_processor_spark.streaming.dedup import (
        semantic_cell_occupancy)
    assert semantic_cell_occupancy_fast(spark, sd) \
        == semantic_cell_occupancy(spark, sd)

    # ROLE ADOPTION: a HARD-crashed writer leaves its unexpired lease
    # behind (no in-process finally ran) — the same role's retry must
    # ADOPT it rather than wedge on its own corpse for the TTL, while
    # the OTHER role still refuses it. Round 13: adoption requires
    # the predecessor to be PROVABLY not alive — here a dead pid on
    # this host. Back to the adopted-dir shape (ledger absent; the
    # lease sidecar survives the rmtree).
    import socket
    import subprocess

    proc = subprocess.Popen(["true"])
    proc.wait()
    dead = f"@{socket.gethostname()}:{proc.pid}"
    shutil.rmtree(cc)
    acquire_lease(spark, cc, owner=f"sem-epoch-deadbeef{dead}")
    with pytest.raises(LeaseHeldError):
        semantic_counts_seed(spark, sd)   # other role: refused
    semantic_ingest_epoch(
        spark.createDataFrame([(11, _axis(3))], schema), sd,
        tau=0.95, epoch=5)   # same role, dead pid: adopts + releases
    assert lease_holder(spark, cc) is None
    # Symmetrically for a hard-crashed backfill's lease.
    acquire_lease(spark, cc, owner=f"counts-seed-deadbeef{dead}")
    with pytest.raises(LeaseHeldError):
        semantic_ingest_epoch(
            spark.createDataFrame([(12, _axis(4))], schema), sd,
            tau=0.95, epoch=6)            # other role: refused
    assert semantic_counts_seed(spark, sd) is True  # adopts, completes
    assert lease_holder(spark, cc) is None
    assert semantic_cell_occupancy_fast(spark, sd) \
        == semantic_cell_occupancy(spark, sd)


def test_same_role_lease_adoption_has_staleness_horizon(spark, tmp_path):
    """Round 13 (round-12 What's-missing #2): same-role adoption only
    fires for a predecessor that is provably not alive — a LIVE pid
    on this host with a fresh heartbeat refuses like the other role
    (two concurrent same-role writers now collide instead of silently
    sharing the lease), a DEAD pid adopts immediately, our own pid is
    reentrant, and an unprobeable holder (foreign host / legacy
    token / live-but-unverifiable pid, which could be recycled or a
    zombie) adopts only once the lease file has gone unrefreshed past
    the heartbeat horizon. Adoption acquires under a FRESH token —
    reusing the corpse's token let two racing adopters both take the
    reentrant-refresh path and both win — and the corpse removal is
    rename-and-verify, so a racer's fresh lease landing between the
    read and the rename is restored, not clobbered."""
    import os
    import socket
    import subprocess
    import time

    from lisp_batch_processor_spark.sources.writers import (
        LeaseHeldError, acquire_lease, lease_holder, lease_path,
        release_lease)
    from lisp_batch_processor_spark.streaming.dedup import (
        SEM_LEASE_ADOPT_MIN_AGE_S, _acquire_role_lease)

    dest = str(tmp_path / "store")
    host = socket.gethostname()

    # LIVE same-role holder (this very process): refuse... unless it
    # is literally our own pid, which is a same-process retry.
    mine = f"sem-epoch-aaaa@{host}:{os.getpid()}"
    acquire_lease(spark, dest, owner=mine)
    got = _acquire_role_lease(spark, dest, "sem-epoch-")
    assert got == mine                       # reentrant adoption
    release_lease(spark, dest, got)

    # LIVE same-role holder, another pid on this host: collide.
    live = subprocess.Popen(["sleep", "30"])
    try:
        other = f"sem-epoch-bbbb@{host}:{live.pid}"
        acquire_lease(spark, dest, owner=other)
        with pytest.raises(LeaseHeldError, match="same-role"):
            _acquire_role_lease(spark, dest, "sem-epoch-")
        # ... and the other role refuses it too (unchanged).
        with pytest.raises(LeaseHeldError):
            _acquire_role_lease(spark, dest, "counts-seed-")
    finally:
        live.kill()
        live.wait()
    # The holder's process just died (hard crash): adopt immediately,
    # under a FRESH token (never the corpse's).
    got = _acquire_role_lease(spark, dest, "sem-epoch-")
    assert got != other and got.startswith("sem-epoch-")
    assert got.endswith(f"@{host}:{os.getpid()}")
    assert lease_holder(spark, dest) == got
    release_lease(spark, dest, got)

    # Unprobeable holder (foreign host): a YOUNG lease refuses...
    foreign = "sem-epoch-cccc@elsewhere:12345"
    acquire_lease(spark, dest, owner=foreign)
    with pytest.raises(LeaseHeldError, match="same-role"):
        _acquire_role_lease(spark, dest, "sem-epoch-")
    # ... and one unrefreshed past the horizon adopts (age the file).
    lp = lease_path(dest)
    old = time.time() - SEM_LEASE_ADOPT_MIN_AGE_S - 5
    os.utime(lp, (old, old))
    got = _acquire_role_lease(spark, dest, "sem-epoch-")
    assert got != foreign and got.startswith("sem-epoch-")
    release_lease(spark, dest, got)

    # Legacy token (no @host:pid) follows the same mtime horizon.
    acquire_lease(spark, dest, owner="sem-epoch-legacy")
    with pytest.raises(LeaseHeldError, match="same-role"):
        _acquire_role_lease(spark, dest, "sem-epoch-")
    os.utime(lp, (old, old))
    got = _acquire_role_lease(spark, dest, "sem-epoch-")
    assert got != "sem-epoch-legacy" and got.startswith("sem-epoch-")
    release_lease(spark, dest, got)
    assert lease_holder(spark, dest) is None

    # A LIVE-but-unverifiable same-host pid (could be recycled or a
    # zombie) does NOT wedge recovery for the lease TTL: it follows
    # the same heartbeat horizon as an unprobeable holder.
    live2 = subprocess.Popen(["sleep", "30"])
    try:
        stalled = f"sem-epoch-dddd@{host}:{live2.pid}"
        acquire_lease(spark, dest, owner=stalled)
        with pytest.raises(LeaseHeldError, match="same-role"):
            _acquire_role_lease(spark, dest, "sem-epoch-")
        os.utime(lp, (old, old))
        got = _acquire_role_lease(spark, dest, "sem-epoch-")
        assert got != stalled and got.startswith("sem-epoch-")
        release_lease(spark, dest, got)
    finally:
        live2.kill()
        live2.wait()

    # Corpse removal is rename-and-verify: a racer's fresh lease
    # landing between the holder read and the rename is restored and
    # the adoption raises instead of clobbering the racer.
    from lisp_batch_processor_spark.streaming.dedup import (
        _remove_dead_lease)
    racer = f"sem-epoch-eeee@{host}:{os.getpid()}"
    acquire_lease(spark, dest, owner=racer)
    with pytest.raises(LeaseHeldError, match="re-leased"):
        _remove_dead_lease(spark, dest, "sem-epoch-the-corpse-we-read")
    assert lease_holder(spark, dest) == racer
    release_lease(spark, dest, racer)


def test_counts_seed_refuses_uncommitted_high_water_epoch(
        spark, tmp_path):
    """The horizon's residual crash window is DETECTED when the
    lineage token resolves to a checkpoint (round 12, ADVICE):
    high_water H is recorded at epoch START, so `offsets/H` without
    `commits/H` means the backfill cannot know whether H's vectors
    landed — recording horizon H over a not-yet-landed epoch would
    permanently undercount it in the fast signal. The backfill
    refuses that state and proceeds once the checkpoint shows H
    committed."""
    import os

    from lisp_batch_processor_spark.streaming.dedup import (
        ingest_lineage_check, semantic_counts_seed,
        semantic_store_seed)

    schema = "vec_id long, embedding array<double>"
    sd = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    semantic_store_seed(
        spark.createDataFrame([(1, _axis(0)), (2, _axis(1))], schema),
        sd, k=2)
    import shutil
    shutil.rmtree(os.path.join(sd, "sem_cellcounts"))  # adopted dir

    # Epoch 9 STARTED (offsets file + high-water PUT) but never
    # committed — the crash window between the meta PUT and the
    # vector append.
    os.makedirs(os.path.join(ckpt, "offsets"))
    open(os.path.join(ckpt, "offsets", "9"), "w").write("v1")
    ingest_lineage_check(spark, sd, 9, lineage=ckpt)
    with pytest.raises(ValueError, match="never committed"):
        semantic_counts_seed(spark, sd)

    # The replay commits epoch 9: the probe passes and the backfill
    # records horizon 9 as before.
    os.makedirs(os.path.join(ckpt, "commits"))
    open(os.path.join(ckpt, "commits", "9"), "w").write("v1")
    assert semantic_counts_seed(spark, sd) is True


def test_counts_seed_opaque_token_reconciles_after_first_epoch(
        spark, tmp_path):
    """Round 13 (round-12 What's-missing #3): a state_dir whose
    lineage token names no checkpoint can still backfill inside the
    uncommitted-high-water window — undetectably at backfill time —
    so the FIRST tagged epoch after a probe-skipped backfill
    reconciles the fast occupancy signal against the full scan once:
    the planted window raises at that reconciliation with the
    delete-and-reseed remedy, and after the remedy the next epoch
    reconciles clean and disarms the check."""
    import json
    import os
    import shutil

    from lisp_batch_processor_spark.streaming.dedup import (
        _sem_counts_meta_path, ingest_lineage_check,
        semantic_cell_occupancy, semantic_cell_occupancy_fast,
        semantic_counts_seed, semantic_ingest_epoch,
        semantic_store_seed)

    schema = "vec_id long, embedding array<double>"
    sd = str(tmp_path / "state")
    semantic_store_seed(
        spark.createDataFrame([(1, _axis(0)), (2, _axis(1))], schema),
        sd, k=2)
    shutil.rmtree(os.path.join(sd, "sem_cellcounts"))  # adopted dir

    # Epoch 9 STARTED (high-water PUT) but its vectors never landed,
    # behind an OPAQUE token the probe cannot resolve.
    ingest_lineage_check(spark, sd, 9, lineage="opaque-job-42")
    assert semantic_counts_seed(spark, sd) is True     # probe skipped
    meta = json.load(open(_sem_counts_meta_path(sd, 0)))
    assert meta["probe_skipped"] is True
    assert "reconciled" not in meta

    # The stream restarts and REPLAYS epoch 9: its vectors land after
    # the baseline while its ledger rows are horizon-masked — the
    # undercount the reconciliation exists to catch.
    with pytest.raises(ValueError, match="disagrees with the full"):
        semantic_ingest_epoch(
            spark.createDataFrame([(10, _axis(2))], schema), sd,
            tau=0.95, epoch=9, lineage="opaque-job-42")

    # Remedy (from the raise message): the replay has committed, so
    # rebuild the baseline over the now-complete store.
    shutil.rmtree(os.path.join(sd, "sem_cellcounts"))
    assert semantic_counts_seed(spark, sd) is True
    # The next epoch reconciles CLEAN and disarms the check — via a
    # separate DONE marker: the horizon-bearing meta is never
    # rewritten in place (a crash mid-overwrite would tear it,
    # dropping the mask and the armed flag together).
    from lisp_batch_processor_spark.streaming.dedup import (
        _sem_counts_reconciled_path)
    semantic_ingest_epoch(
        spark.createDataFrame([(11, _axis(3))], schema), sd,
        tau=0.95, epoch=10, lineage="opaque-job-42")
    meta = json.load(open(_sem_counts_meta_path(sd, 0)))
    assert meta["probe_skipped"] is True
    assert "reconciled" not in meta          # meta written once, ever
    marker = json.load(open(_sem_counts_reconciled_path(sd, 0)))
    assert marker["reconciled"] is True
    assert semantic_cell_occupancy_fast(spark, sd) \
        == semantic_cell_occupancy(spark, sd)


def test_start_ingest_stream_rejects_foreign_checkpoint(spark,
                                                        tmp_path):
    """The loop-agnostic starter gives the STANDALONE twins the same
    strong default `start_corpus_ingest` gives the composed loop
    (round 11): one checkpoint_dir becomes both checkpointLocation
    and the lineage token, so a foreign checkpoint resuming over the
    same state raises even at the replay-shaped epoch the epoch-only
    check passes silently."""
    from pyspark.errors import StreamingQueryException

    from lisp_batch_processor_spark.streaming.dedup import (
        semantic_store_seed, start_ingest_stream,
        streaming_semantic_ingest)

    schema = "vec_id long, embedding array<double>"
    sd = str(tmp_path / "state")
    semantic_store_seed(
        spark.createDataFrame([(1, _axis(0))], schema), sd, k=1)

    def write_src(tag, rows):
        (spark.createDataFrame(rows, schema).coalesce(1)
         .write.parquet(os.path.join(str(tmp_path), f"emb_{tag}",
                                     "b=0")))

    def read_src(tag):
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(os.path.join(str(tmp_path), f"emb_{tag}",
                                      "b=*")))

    write_src("a", [(10, _axis(1))])
    write_src("b", [(20, _axis(2))])
    got: list[tuple[int, int]] = []
    q = start_ingest_stream(
        streaming_semantic_ingest, read_src("a"), sd,
        lambda out, eid: got.append((int(eid), out.count())),
        checkpoint_dir=os.path.join(str(tmp_path), "ckptA"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert got == [(0, 1)]

    # Foreign checkpoint at epoch 0 == high-water: only the threaded
    # lineage token catches it.
    q2 = start_ingest_stream(
        streaming_semantic_ingest, read_src("b"), sd,
        lambda out, eid: None,
        checkpoint_dir=os.path.join(str(tmp_path), "ckptB"))
    try:
        with pytest.raises(StreamingQueryException, match="lineage"):
            q2.processAllAvailable()
    finally:
        q2.stop()

    # Decoupling lineage from the checkpoint is refused.
    with pytest.raises(ValueError, match="lineage"):
        start_ingest_stream(
            streaming_semantic_ingest, read_src("a"), sd,
            lambda out, eid: None,
            checkpoint_dir=os.path.join(str(tmp_path), "ckptC"),
            lineage="something-else")


def test_lineage_token_canonicalizes_checkpoint_spellings():
    """The recorded lineage token must be spelling-independent
    (round 11): Spark resolves '/a/b', '/a/b/', and 'file:///a/b'
    to the SAME checkpointLocation, so a resume respelling the path
    must not read as a foreign lineage. Non-file schemes keep their
    URI minus any trailing slash."""
    from lisp_batch_processor_spark.streaming.dedup import (
        _lineage_token)

    assert _lineage_token("/a/b") == "/a/b"
    assert _lineage_token("/a/b/") == "/a/b"
    assert _lineage_token("file:///a/b") == "/a/b"
    assert _lineage_token("file:///a/b/") == "/a/b"
    assert _lineage_token("hdfs://nn:8020/a/b/") == "hdfs://nn:8020/a/b"
    # Object-store scheme ALIASES (round 12, reworked round 13 per
    # ADVICE): the token keeps its ORIGINAL spelling — so it stays a
    # probeable path on deployments that mount only s3a:// — and the
    # alias map applies at COMPARISON time via _lineage_canon, so a
    # respelled resume of the SAME checkpoint still matches...
    from lisp_batch_processor_spark.sources.writers import _lineage_canon
    assert _lineage_token("s3a://bucket/ckpt") == "s3a://bucket/ckpt"
    assert (_lineage_canon(_lineage_token("s3://bucket/ckpt"))
            == _lineage_canon(_lineage_token("s3a://bucket/ckpt"))
            == _lineage_canon(_lineage_token("s3n://bucket/ckpt/"))
            == "s3://bucket/ckpt")
    assert (_lineage_canon(_lineage_token("gs://bkt/ck"))
            == _lineage_canon(_lineage_token("gcs://bkt/ck"))
            == "gs://bkt/ck")
    # ... while genuinely different buckets/services stay distinct.
    assert (_lineage_canon(_lineage_token("s3://b1/ckpt"))
            != _lineage_canon(_lineage_token("s3://b2/ckpt")))
    assert (_lineage_canon(_lineage_token("wasb://b/c"))
            != _lineage_canon(_lineage_token("abfs://b/c")))
    # Relative spellings resolve against the cwd, like Spark's own
    # checkpoint resolution of a schemeless relative path — with a
    # warning, since a restart from another cwd reads falsely foreign.
    import os
    import warnings
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert _lineage_token("rel/ckpt") == os.path.abspath("rel/ckpt")
    assert any("relative checkpoint path" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        _lineage_token("/abs/ckpt")
    assert not w


def test_lineage_comparison_adopts_scheme_aliases():
    """The alias map must apply at COMPARISON time, not only at
    token-generation time: a lineage recorded as ``s3a://...`` by a
    pre-alias round must keep matching the same location's new
    canonical ``s3://...`` token — canonicalizing only new tokens
    would turn the upgrade itself into a false foreign-lineage raise."""
    import pytest

    from lisp_batch_processor_spark.sources.writers import (
        _check_epoch_lineage)

    meta = {"lineage": "s3a://bucket/ckpt", "high_water_epoch": 3}
    # Same location, canonical spelling: passes (and does not rewrite).
    assert _check_epoch_lineage(meta, 3, "s3://bucket/ckpt", "t") is False
    assert meta["lineage"] == "s3a://bucket/ckpt"
    # A genuinely different bucket still raises.
    with pytest.raises(ValueError, match="lineage"):
        _check_epoch_lineage(meta, 4, "s3://other/ckpt", "t")
    # Opaque (non-URI) tokens compare as themselves.
    meta2 = {"lineage": "ck1", "high_water_epoch": 0}
    with pytest.raises(ValueError, match="lineage"):
        _check_epoch_lineage(meta2, 1, "ck2", "t")
    assert _check_epoch_lineage(meta2, 1, "ck1", "t") is True


def test_line_store_reinit_merges_meta_not_clobbers(spark, tmp_path):
    """`line_store_init(min_repeat=...)` over a store whose meta
    already records lineage/high-water must MERGE, not replace
    (round 11, ADVICE): re-init previously rewrote the sidecar to
    `{"min_repeat": k}` wholesale, silently erasing the restart-at-0
    guard. A conflicting threshold raises (the undercount hazard),
    matching the per-epoch check."""
    import os

    from lisp_batch_processor_spark.streaming.dedup import (
        line_dedup_ingest_epoch, line_store_init)

    schema = "doc_id long, text string"
    store = os.path.join(str(tmp_path), "lines.parquet")
    line_store_init(spark, store, min_repeat=3)
    b = lambda i: spark.createDataFrame([(i, f"x{i}\nshared")], schema)
    line_dedup_ingest_epoch(b(0), store, 0, min_repeat=3,
                            lineage="ck1")
    line_dedup_ingest_epoch(b(1), store, 1, min_repeat=3,
                            lineage="ck1")

    # Re-init at the same threshold: the pin survives the merge.
    line_store_init(spark, store, min_repeat=3)
    with pytest.raises(ValueError, match="epoch regression"):
        line_dedup_ingest_epoch(b(9), store, 0, min_repeat=3)
    with pytest.raises(ValueError, match="lineage"):
        line_dedup_ingest_epoch(b(9), store, 2, min_repeat=3,
                                lineage="ck2")
    line_dedup_ingest_epoch(b(2), store, 2, min_repeat=3,
                            lineage="ck1")   # same stream: fine

    # A conflicting threshold is refused outright.
    with pytest.raises(ValueError, match="min_repeat"):
        line_store_init(spark, store, min_repeat=2)


def test_line_threshold_adoption_preserves_lineage_pin(spark, tmp_path):
    """A LIVE store that has only processed EMPTY batches is rowless
    with a recorded high_water — exactly the shape the rowless
    threshold adoption reads as a deleted store (round 12, ADVICE).
    Adopting the new threshold there is fine (nothing was counted
    under the old one), but the lineage/high-water pin must SURVIVE
    the adoption: a TOKENLESS adoption call used to rewrite the meta
    wholesale, erasing the live stream's lineage token forever — the
    next foreign checkpoint then recorded its own token unopposed."""
    import os

    from lisp_batch_processor_spark.streaming.dedup import (
        line_dedup_ingest_epoch, line_store_init)

    schema = "doc_id long, text string"
    store = os.path.join(str(tmp_path), "lines.parquet")
    b = lambda i: spark.createDataFrame([(i, f"x{i}\nshared")], schema)
    empty = spark.createDataFrame([], schema)

    line_store_init(spark, store, min_repeat=3)
    line_dedup_ingest_epoch(empty, store, 0, min_repeat=3,
                            lineage="ck1")   # live, rowless, pinned
    # Conflicting threshold, TOKENLESS call: threshold adopts, pin
    # survives (this epoch appends the store's first rows).
    line_dedup_ingest_epoch(b(1), store, 1, min_repeat=2)
    # The preserved ck1 pin still guards the (now row-bearing) store.
    with pytest.raises(ValueError, match="lineage"):
        line_dedup_ingest_epoch(b(2), store, 2, min_repeat=2,
                                lineage="ck2")
    line_dedup_ingest_epoch(b(2), store, 2, min_repeat=2,
                            lineage="ck1")   # the live stream: fine
    with pytest.raises(ValueError, match="epoch regression"):
        line_dedup_ingest_epoch(b(9), store, 1, min_repeat=2,
                                lineage="ck1")


def test_line_store_rebuild_adopts_fresh_meta(spark, tmp_path):
    """Deleting a line store must not brick its rebuild (round 11,
    the sketch stores' stale-sidecar rule brought to the line
    store): the meta sidecar lives outside the store dir and
    survives deletion, so a threshold conflict or an epoch/lineage
    violation against a store with NO committed rows adopts as
    fresh instead of raising on phantom history — while a live
    store's guard stays armed."""
    import os
    import shutil

    from lisp_batch_processor_spark.streaming.dedup import (
        line_dedup_ingest_epoch, line_store_init)

    schema = "doc_id long, text string"
    store = os.path.join(str(tmp_path), "lines.parquet")
    b = lambda i: spark.createDataFrame([(i, f"x{i}\nshared")], schema)

    line_store_init(spark, store, min_repeat=3)
    line_dedup_ingest_epoch(b(0), store, 0, min_repeat=3,
                            lineage="ck1")
    line_dedup_ingest_epoch(b(1), store, 1, min_repeat=3,
                            lineage="ck1")

    # Rebuild at a NEW threshold: init over the rowless path adopts
    # (old meta recorded min_repeat=3, hw=1, lineage ck1 — all
    # phantom now).
    shutil.rmtree(store)
    line_store_init(spark, store, min_repeat=2)
    line_dedup_ingest_epoch(b(0), store, 0, min_repeat=2,
                            lineage="ck2")
    line_dedup_ingest_epoch(b(1), store, 1, min_repeat=2,
                            lineage="ck2")
    with pytest.raises(ValueError, match="epoch regression"):
        line_dedup_ingest_epoch(b(9), store, 0, min_repeat=2)

    # Rebuild where the CONFLICT only surfaces at epoch time (init
    # without a threshold): the rowless store adopts the new
    # threshold and lineage in one step.
    shutil.rmtree(store)
    line_store_init(spark, store)
    out = {r.doc_id: r.text
           for r in line_dedup_ingest_epoch(
               b(5), store, 0, min_repeat=3,
               lineage="ck3").collect()}
    assert out == {5: "x5\nshared"}   # fresh store: nothing stripped
    with pytest.raises(ValueError, match="min_repeat"):
        line_dedup_ingest_epoch(b(6), store, 1, min_repeat=2)  # live
