"""End-to-end training-data pipeline composition — the real-world
shape all the operators exist to serve, chained through the engine's
`Pipeline` abstraction (the reference's ordered/reorderable stage
list, SURVEY.md §1.2) into ONE lazy Catalyst plan:

    quality filter -> exact dedup -> near-dup dedup (MinHash+LSH ->
    connected components) -> per-source token accounting

Each stage is independently oracle-checked elsewhere (q_text_quality,
q_text_fingerprint, q_dedup_minhash, q_dedup_connected,
q_text_tokens); this test pins the CROSS-STAGE invariants a corpus
curation run depends on: the kept set is dup-free under the pipeline's
own definitions, every dropped doc traces to a kept representative,
and stage toggling (the Pipeline contract) only widens/narrows the
output monotonically.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lisp_batch_processor_spark.catalog import load
from lisp_batch_processor_spark.operators.dedup import (
    connected_components_contraction,
    lsh_candidate_pairs,
    minhash_signatures,
    verify_jaccard,
)
from lisp_batch_processor_spark.operators.text import tokens_col
from lisp_batch_processor_spark.pipeline import Pipeline

MIN_TOKENS = 5
MIN_ALPHA = 0.3
JACCARD_NUM, JACCARD_DEN = 7, 10  # keep >= 0.7 pairs, as q_dedup_minhash


def quality_filter(df):
    """Pre-training quality gate: enough tokens, mostly-alphabetic."""
    alpha = (F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
             .cast("double") / F.length("text"))
    return (df.withColumn("n_tokens", F.size(tokens_col()))
            .filter((F.col("n_tokens") >= MIN_TOKENS)
                    & (alpha >= MIN_ALPHA)))


def exact_dedup(df):
    """Keep the min doc_id per normalized-content fingerprint."""
    fp = F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))
    keep = (df.select(fp.alias("fp"), "doc_id")
            .groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id"))
    return df.join(keep, "doc_id", "left_semi")


def near_dedup(df):
    """MinHash+LSH candidates -> exact-Jaccard verify -> transitive
    closure -> keep component representatives only."""
    confirmed = verify_jaccard(df, lsh_candidate_pairs(
        minhash_signatures(df))).filter(
        F.col("inter") * JACCARD_DEN >= F.col("uni") * JACCARD_NUM)
    comp = connected_components_contraction(confirmed, "doc_a", "doc_b")
    dropped = comp.filter(F.col("node") != F.col("component")) \
                  .select(F.col("node").alias("doc_id"))
    return df.join(dropped, "doc_id", "left_anti")


def token_accounting(df):
    return (df.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.size(tokens_col())).alias("total_tokens")))


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    """Fixture documents + constructed dups so every stage has work:
    an exact dup (whitespace/case churn only), a near dup (one token
    changed), and a low-quality doc the first gate must drop."""
    docs = load(spark, sf_dir, "documents") \
        .select("doc_id", "source", "text")
    base = docs.orderBy("doc_id").limit(1).collect()[0]
    extra = spark.createDataFrame(
        [
            (9_000_001, base.source, "  " + base.text.upper() + "  "),
            (9_000_002, base.source,
             base.text + " zzextra zzextra zzextra"),
            (9_000_003, base.source, "!!! 123 ??? 456 *** 789 %%% 000"),
        ],
        "doc_id long, source string, text string")
    return docs.unionByName(extra), base.doc_id


def test_training_data_pipeline_composition(spark, corpus):
    docs, base_id = corpus
    pipe = (Pipeline()
            .add("quality", quality_filter)
            .add("exact_dedup", exact_dedup)
            .add("near_dedup", near_dedup))
    kept = pipe(docs).localCheckpoint(eager=True)
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    n_in = docs.count()

    # The constructed rows route correctly: low-quality dropped at the
    # gate, exact dup collapsed to the earlier doc, near dup collapsed
    # into the base's component.
    assert 9_000_003 not in kept_ids
    assert 9_000_001 not in kept_ids
    assert 9_000_002 not in kept_ids
    assert base_id in kept_ids
    assert 0 < len(kept_ids) < n_in

    # THE dup-free invariant: rerunning the pipeline's own near-dup
    # detection on the kept set finds zero confirmed pairs.
    leftover = verify_jaccard(kept, lsh_candidate_pairs(
        minhash_signatures(kept))).filter(
        F.col("inter") * JACCARD_DEN >= F.col("uni") * JACCARD_NUM)
    assert leftover.count() == 0

    # Idempotence: the pipeline is a fixpoint on its own output.
    again = {r.doc_id for r in pipe(kept).select("doc_id").collect()}
    assert again == kept_ids

    # Downstream accounting stage composes on the curated set.
    acct = {r.source: (r.n_docs, r.total_tokens)
            for r in token_accounting(kept).collect()}
    assert sum(n for n, _ in acct.values()) == len(kept_ids)
    assert all(t > 0 for _, t in acct.values())


def test_training_assembly_composition(spark, corpus):
    """The assembly tail of the pipeline — decontaminate -> split ->
    upsample -> pack -> shuffle — composed on the curated corpus.
    Each operator is replay-tested alone in test_training.py; this
    pins what the chain owes the training run: eval-overlapping docs
    never reach a pack, every (doc, epoch) copy is packed exactly
    once within budget, and the final order is a pure function of
    the data (rerun-identical)."""
    from lisp_batch_processor_spark.operators.training import (
        decontaminate, domain_upsample, pack_sequences, split_assign,
        shuffle_deterministic,
    )

    docs, _ = corpus
    curated = (Pipeline()
               .add("quality", quality_filter)
               .add("exact_dedup", exact_dedup)
               .add("near_dedup", near_dedup))(docs) \
        .localCheckpoint(eager=True)

    # Eval set: an 8-token window lifted from one curated doc — that
    # doc must be scrubbed before packing.
    victim = curated.orderBy("doc_id").limit(1).collect()[0]
    window = " ".join(
        [t for t in victim.text.lower().split() if t][:8])
    eval_df = spark.createDataFrame([(window,)], "text string")
    clean = decontaminate(curated, eval_df)
    clean_ids = {r.doc_id for r in clean.select("doc_id").collect()}
    assert victim.doc_id not in clean_ids
    assert clean_ids < {r.doc_id
                        for r in curated.select("doc_id").collect()}

    # Split, then upsample ONLY the train split (eval splits are
    # never repeated); copies get a composite row id so packing sees
    # unique keys.
    split = split_assign(clean)
    train = split.filter("split = 'train'")
    sources = [r.source for r in
               train.select("source").distinct().collect()]
    epochs = {s: 1.5 for s in sources[:2]} | {s: 1.0
                                              for s in sources[2:]}
    up = (domain_upsample(train, epochs)
          .withColumn("row_id", F.col("doc_id") * 16 + F.col("epoch")))
    n_rows = up.count()
    assert n_rows >= train.count()  # upsampling never shrinks

    packed = pack_sequences(up, budget=256, id_col="row_id",
                            n_buckets=4)
    pk = packed.collect()
    # Exactly-once per (doc, epoch) copy, budget respected per pack.
    assert sorted(r.doc_id for r in pk) == sorted(
        r.row_id for r in up.select("row_id").collect())
    assert len(pk) == n_rows
    fills: dict[int, int] = {}
    for r in pk:
        fills[r.pack_id] = fills.get(r.pack_id, 0) + r.n_tokens
    assert all(f <= 256 for f in fills.values())

    # Deterministic order: two independent runs give the same order.
    o1 = [r.row_id for r in
          shuffle_deterministic(up, id_col="row_id", num_partitions=4)
          .select("row_id").toLocalIterator()]
    o2 = [r.row_id for r in
          shuffle_deterministic(up, id_col="row_id", num_partitions=4)
          .select("row_id").toLocalIterator()]
    assert o1 == o2 and sorted(o1) != o1


def test_pipeline_stage_toggling_is_monotone(spark, corpus):
    """The Pipeline contract under composition: disabling a dedup
    stage can only widen the kept set; re-enabling restores it."""
    docs, _ = corpus
    pipe = (Pipeline()
            .add("quality", quality_filter)
            .add("exact_dedup", exact_dedup)
            .add("near_dedup", near_dedup))
    full = {r.doc_id for r in pipe(docs).select("doc_id").collect()}

    pipe.set_enabled("near_dedup", False)
    no_near = {r.doc_id for r in pipe(docs).select("doc_id").collect()}
    assert full < no_near  # the near-dups reappear

    pipe.set_enabled("near_dedup", True)
    assert {r.doc_id
            for r in pipe(docs).select("doc_id").collect()} == full


@pytest.mark.slow
def test_pipeline_with_boilerplate_strip_stage(spark, corpus):
    """The sub-document pass slots into the curation chain where a
    web pipeline runs it — after the quality gate, before exact
    dedup — as an ordinary Pipeline stage: a shared banner line
    survives in at most one kept document, documents otherwise
    distinct are NOT collapsed by it, and the downstream dup-free
    invariant still holds on the final kept set."""
    from lisp_batch_processor_spark.operators.dedup import line_dedup

    docs, _ = corpus
    banner = ("subscribe to our newsletter for updates "
              "and accept all cookies to continue reading")
    with_banner = docs.unionByName(spark.createDataFrame(
        [(9_100_000 + i, f"s{i % 2}",
          banner + "\n" + f"genuinely distinct article body number "
          f"{i} about topic {i * 17} with its own words")
         for i in range(4)],
        "doc_id long, source string, text string"))

    def boilerplate_strip(df):
        cleaned = line_dedup(df).select(
            "doc_id", "text").withColumnRenamed("text", "_bs_text")
        return (df.join(cleaned, "doc_id")
                .drop("text").withColumnRenamed("_bs_text", "text"))

    pipe = (Pipeline()
            .add("quality", quality_filter)
            .add("strip", boilerplate_strip)
            .add("exact_dedup", exact_dedup)
            .add("near_dedup", near_dedup))
    kept = pipe(with_banner).localCheckpoint(eager=True)
    kept_rows = {r.doc_id: r.text for r in kept.collect()}

    # All four banner docs survive (their bodies are distinct), and
    # the banner text itself survives in at most one of them.
    banner_ids = [d for d in kept_rows if d >= 9_100_000]
    assert len(banner_ids) == 4
    assert sum(banner in kept_rows[d] for d in banner_ids) <= 1

    # Cross-stage invariant unchanged: the kept set is dup-free under
    # the pipeline's own near-dup definition.
    leftover = verify_jaccard(kept, lsh_candidate_pairs(
        minhash_signatures(kept))).filter(
        F.col("inter") * JACCARD_DEN >= F.col("uni") * JACCARD_NUM)
    assert leftover.count() == 0

    # Toggling the strip stage only changes TEXT, never membership:
    # line removal is sub-document, so the kept id-set is identical.
    pipe.set_enabled("strip", False)
    no_strip_ids = {r.doc_id
                    for r in pipe(with_banner).select("doc_id").collect()}
    assert no_strip_ids == set(kept_rows)
