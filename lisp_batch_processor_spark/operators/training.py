"""Training-data assembly operators — the last mile of an LLM data
pipeline after dedup/quality filtering: deterministic leak-free
train/val/test splits, weighted domain mixing under a token budget,
sequence packing into fixed-budget contexts, and PII redaction.

These are library operators (the driver's correctness gate caps the
registry at 50 queries, all taken); each is differentially tested in
tests/test_training.py — the split against a DuckDB bit-exact replay,
packing against its combinatorial invariants, redaction against a
Python `re` oracle.

Reference parity: the reference (`Batch Processor.py:304-350`) applies
an ordered pipeline to a deduplicated collection and reports counts;
these operators generalize its "prepare the work list" phase to the
shapes a 100 TB corpus needs before training — which docs go to which
split, in what mixture, packed how.

Scale design (100 TB):
- Every assignment here is a pure per-row hash of the DOCUMENT KEY —
  no global sort, no sampling pass, no driver state. Adding data
  never reshuffles earlier assignments (splits are stable under
  corpus growth), and the operators are order- and partitioning-
  independent by construction.
- The only driver-side state is O(#domains) mixing rates and the
  packing bucket count — never O(rows).
- Packing is the one genuinely non-relational step: it runs
  first-fit-decreasing per hash bucket via applyInPandas, and ONLY
  (id, length) cross the wire — the text itself is re-joined by
  pack assignment afterwards, so the Python stage moves ~16 bytes a
  document, not the corpus.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType, IntegerType, LongType, ShortType, StructField, StructType,
)

from lisp_batch_processor_spark.operators.text import tokens_col

# Buckets for all hash->fraction decisions: fine enough that a 0.01%
# split weight is representable, coarse enough that thresholds are
# exact integers (no float boundary ambiguity cross-engine).
SPLIT_BUCKETS = 100_000

# Above this many domains, per-domain rates travel as a broadcast
# join instead of a literal create_map — literal maps are O(#domains)
# IN THE SERIALIZED PLAN, which web-scale domain counts would bloat.
_MAP_LITERAL_MAX = 256


def hash_bucket(id_col: Column | str, salt: str,
                n_buckets: int = SPLIT_BUCKETS) -> Column:
    """Deterministic bucket in [0, n_buckets) from (salt, id) — the
    portable md5 construction every dedup operator here uses
    (dedup.py:62 family): first 60 hex bits of md5, exact BIGINT.

    DuckDB replay (bit-exact):
        CAST(('0x' || substr(md5(concat_ws(':', '<salt>',
             CAST(id AS VARCHAR))), 1, 15)) AS BIGINT) % n_buckets

    Salt is part of the hash input, so independent decisions (split
    vs mix vs pack bucketing) are independent hash functions — a doc
    landing in `val` says nothing about its mixing coin flip.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(_hash_word(salt, c), F.lit(n_buckets))


def _hash_word(salt: str, c: Column) -> Column:
    """The shared 60-bit salted md5 word: md5('<salt>:<id>') first 15
    hex chars as BIGINT. One definition so hash_bucket and
    shuffle_deterministic can never drift apart — the construction is
    a cross-engine replay contract (DuckDB/hashlib oracles hardcode
    it in tests)."""
    hexs = F.md5(F.encode(F.concat_ws(":", F.lit(salt),
                                      c.cast("string")), "UTF-8"))
    return F.conv(F.substring(hexs, 1, 15), 16, 10).cast("bigint")


def split_thresholds(splits: Sequence[tuple[str, float]],
                     n_buckets: int = SPLIT_BUCKETS) -> list[tuple[str, int]]:
    """Cumulative integer upper bounds per split name. Weights must
    sum to 1 (±1e-9); the last split absorbs rounding so the table
    is exhaustive by construction."""
    total = sum(w for _, w in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    if any(w < 0 for _, w in splits):
        raise ValueError("split weights must be non-negative")
    bounds, acc = [], 0.0
    for name, w in splits:
        acc += w
        bounds.append((name, round(acc * n_buckets)))
    bounds[-1] = (bounds[-1][0], n_buckets)
    return bounds


def split_assign(docs: DataFrame, id_col: str = "doc_id",
                 splits: Sequence[tuple[str, float]] = (
                     ("train", 0.98), ("val", 0.01), ("test", 0.01)),
                 salt: str = "split-v1") -> DataFrame:
    """Add a `split` column: leak-free deterministic train/val/test
    assignment by hashed document key.

    Leak-free means membership depends ONLY on (salt, id): the same
    document lands in the same split across reruns, repartitionings,
    engine versions, and corpus growth — the property that keeps
    eval sets uncontaminated as the corpus is re-ingested. Changing
    `salt` draws a fresh independent split.

    Scale notes: one projection, zero shuffles, zero driver state;
    the assignment column is a narrow dependency so Catalyst pushes
    any downstream split filter straight into the scan.
    """
    bounds = split_thresholds(splits)
    b = hash_bucket(id_col, salt)
    # First threshold that exceeds the bucket wins; last is the default.
    expr: Column = F.lit(bounds[-1][0])
    for name, hi in reversed(bounds[:-1]):
        expr = F.when(b < F.lit(hi), F.lit(name)).otherwise(expr)
    return docs.withColumn("split", expr)


def mix_rates(domain_tokens: Mapping[str, int],
              target: Mapping[str, float]) -> dict[str, float]:
    """Per-domain acceptance rates achieving the target token mixture
    at the LARGEST feasible total budget (no upsampling: every rate
    <= 1, and at least one binding domain samples at rate 1).

    Pure driver-side arithmetic over O(#domains) aggregates.
    Domains absent from `target` get rate 0 (dropped); target weights
    are normalized so callers can pass unnormalized priorities.
    """
    tw = {d: w for d, w in target.items() if w > 0}
    norm = sum(tw.values())
    if norm <= 0:
        raise ValueError("target mixture has no positive weights")
    tw = {d: w / norm for d, w in tw.items()}
    missing = [d for d in tw if domain_tokens.get(d, 0) <= 0]
    if missing:
        raise ValueError(f"target domains with no corpus tokens: {missing}")
    budget = min(domain_tokens[d] / w for d, w in tw.items())
    return {d: min(1.0, w * budget / domain_tokens[d]) for d, w in tw.items()}


def domain_mix(docs: DataFrame, target: Mapping[str, float],
               domain_col: str = "source", id_col: str = "doc_id",
               token_len: Column | None = None,
               salt: str = "mix-v1") -> DataFrame:
    """Down-sample each domain by a deterministic per-document coin so
    the surviving corpus approximates the target TOKEN mixture at the
    largest feasible budget (no domain oversampled past rate 1).

    Two-step plan: (1) an O(#domains) aggregate of token totals is
    collected to the driver (the only collect — model state, not
    data); (2) a per-row hash-threshold filter applies the computed
    rates. Adding documents changes rates only via the aggregate —
    the per-document coin itself never flips for existing docs with
    the same salt, so incremental re-mixing is stable.

    Scale notes: step 1 is a map-side-combined agg over #domains
    groups; step 2 is a scan-local filter — no joins, no shuffle of
    the corpus itself.
    """
    n = token_len if token_len is not None else F.size(tokens_col())
    stats = {r["d"]: r["t"] for r in
             docs.select(F.col(domain_col).alias("d"),
                         n.cast("bigint").alias("n"))
                 .groupBy("d").agg(F.sum("n").alias("t")).collect()}
    rates = mix_rates(stats, target)
    # Integer thresholds; rate 1.0 keeps every bucket. Same
    # literal-map-vs-broadcast-join switch as domain_upsample (see
    # _MAP_LITERAL_MAX): identical rows either way.
    thrs = {d: int(round(r * SPLIT_BUCKETS))
            for d, r in sorted(rates.items())}
    b = hash_bucket(id_col, salt)
    if len(thrs) <= _MAP_LITERAL_MAX:
        thr_map = F.create_map(*[x for d, t in thrs.items()
                                 for x in (F.lit(d), F.lit(t))])
        staged = docs.withColumn("_mix_thr", thr_map[F.col(domain_col)])
    else:
        tdf = docs.sparkSession.createDataFrame(
            list(thrs.items()), f"{domain_col} string, _mix_thr int")
        staged = docs.join(F.broadcast(tdf), domain_col, "left")
    return (staged
            .filter(F.col("_mix_thr").isNotNull() & (b < F.col("_mix_thr")))
            .drop("_mix_thr"))


# ---------------------------------------------------------------------------
# Sequence packing — first-fit-decreasing per hash bucket.
# ---------------------------------------------------------------------------

_PACK_SCHEMA = StructType([
    StructField("bucket", LongType()),
    StructField("pack_id", LongType()),
    StructField("doc_id", LongType()),
    StructField("pos", LongType()),
    StructField("n_tokens", LongType()),
])


def pack_sequences(docs: DataFrame, budget: int, id_col: str = "doc_id",
                   token_len: Column | None = None, n_buckets: int = 64,
                   salt: str = "pack-v1") -> DataFrame:
    """Pack documents into fixed token-budget training sequences via
    first-fit-decreasing within hash buckets. Returns one row per
    document: (bucket, pack_id, doc_id, pos, n_tokens) where pack_id
    is globally unique (bucket << 32 | local index) and pos is the
    document's order inside its pack.

    Invariants (tested): every input doc appears exactly once; no
    pack exceeds `budget` tokens; first-fit guarantees at most ONE
    pack per bucket is <= half full — i.e. utilization > 50% minus
    one tail pack per bucket, and in practice FFD lands >90%. Docs
    longer than `budget` are clamped to `budget` (their own pack,
    flagged downstream by n_tokens == budget).

    Determinism: bucket choice hashes the doc key; within a bucket
    docs are packed in (length desc, id asc) order — bit-stable
    output for a given (corpus, budget, n_buckets, salt).

    Scale notes: the Arrow stage sees ONLY (bucket, id, len) — ~16
    bytes/doc, not text. Choose n_buckets so a bucket's (id, len)
    array fits executor memory: at 100 TB / ~100 B docs * 1e9 docs,
    n_buckets = 65536 puts ~15k docs (~240 KB) in a bucket. Packing
    quality is unaffected by bucketing because token lengths are
    i.i.d. across hash buckets; cross-bucket packs never exist, which
    also means bucket reruns are independently retryable (the
    reference's per-item fault isolation, Batch Processor.py:306-350,
    at bucket granularity).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    # Fail fast on non-integral ids: the slim (bucket, id, len) frame
    # carries the id as bigint, and a silent cast would turn string/
    # UUID ids into nulls that only crash deep inside the Arrow stage.
    id_type = docs.schema[id_col].dataType
    if not isinstance(id_type, (ByteType, ShortType, IntegerType,
                                LongType)):
        raise TypeError(
            f"pack_sequences needs an integral {id_col!r} (got "
            f"{id_type.simpleString()}); hash or factorize string ids "
            "to bigint first")
    n = token_len if token_len is not None else F.size(tokens_col())
    slim = docs.select(
        hash_bucket(id_col, salt, n_buckets).alias("bucket"),
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.least(n.cast("bigint"), F.lit(budget)).alias("n_tokens"))

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf["bucket"].iloc[0]) if len(pdf) else 0
        rows = ffd_pack(bucket, zip(pdf["doc_id"], pdf["n_tokens"]), budget)
        return pd.DataFrame(rows, columns=[f.name for f in _PACK_SCHEMA])

    return slim.groupBy("bucket").applyInPandas(ffd, _PACK_SCHEMA)


def ffd_pack(bucket: int, docs, budget: int) -> list[tuple]:
    """Pure first-fit-decreasing core (one bucket): docs is an
    iterable of (doc_id, n_tokens); returns (bucket, pack_id, doc_id,
    pos, n_tokens) rows. Split out from the Arrow stage so its
    invariants are property-testable without a SparkSession
    (tests/test_training.py hypothesis suite)."""
    items = sorted(((int(ln), int(doc)) for doc, ln in docs),
                   key=lambda t: (-t[0], t[1]))
    remaining: list[int] = []   # free space per open pack
    counts: list[int] = []      # docs already in pack -> next pos
    rows: list[tuple] = []
    for ln, doc in items:
        ln = min(ln, budget)
        for i, free in enumerate(remaining):
            if free >= ln:
                idx = i
                break
        else:
            idx = len(remaining)
            remaining.append(budget)
            counts.append(0)
        rows.append((bucket, (bucket << 32) | idx, doc, counts[idx], ln))
        counts[idx] += 1
        remaining[idx] -= ln
    return rows


# ---------------------------------------------------------------------------
# PII redaction — moved to functions/redact.py (which adds the typed
# `redact_documents` audit variant); re-exported here for the
# existing import surface.
# ---------------------------------------------------------------------------

from lisp_batch_processor_spark.functions.redact import (  # noqa: E402,F401
    PII_PATTERNS,
    redact_pii,
)


# ---------------------------------------------------------------------------
# Benchmark decontamination — n-gram overlap with an eval set.
# ---------------------------------------------------------------------------

DECONTAM_NGRAM = 8


def contamination_flags(train_docs: DataFrame, eval_docs: DataFrame,
                        n: int = DECONTAM_NGRAM,
                        id_col: str = "doc_id") -> DataFrame:
    """Flag training documents that share any n-token shingle with an
    evaluation/benchmark corpus — the standard pre-training
    decontamination sweep (exact n-gram collision, the GPT-3/C4
    recipe shape). Returns one row per training doc:
    (id_col, n_eval_grams, contaminated) where n_eval_grams counts
    DISTINCT eval n-grams found in the doc.

    Both sides tokenize with the engine's shared tokenizer
    (text.tokens_col) and shingle with the dedup module's zip-shift
    builder (dedup._shingles), so decontamination, MinHash, and
    n-gram dedup all agree on what a "token window" is. Docs shorter
    than n tokens contribute their whole token sequence as one gram
    (the _shingles fallback) — a short eval doc therefore only
    matches training docs that contain it as their ENTIRE token
    sequence; standard practice is to drop sub-n eval rows before
    the sweep, which callers control.

    Scale notes: the eval gram set is tiny relative to the corpus
    (benchmarks are MBs, corpora are TBs) and is broadcast — the
    training side is scanned once, exploded to distinct grams per
    doc, and hash-joined map-side with NO shuffle of the corpus;
    the only reduce is the per-doc hit count. At 100 TB the explode
    carries (doc_id, gram) for ~doc_len grams per doc; to shrink it
    further hash grams to bigints (xxhash64) — collisions only
    over-flag, which is the safe direction for decontamination.
    """
    from lisp_batch_processor_spark.operators.dedup import _shingles

    tr = train_docs.select(F.col(id_col), tokens_col().alias("tk"))
    tr_grams = tr.select(
        id_col,
        F.explode(F.array_distinct(_shingles(F.col("tk"), n)))
         .alias("gram"))
    ev = eval_docs.select(tokens_col().alias("tk"))
    ev_grams = (ev.select(
        F.explode(F.array_distinct(_shingles(F.col("tk"), n)))
         .alias("gram"))
        .distinct())
    hits = (tr_grams.join(F.broadcast(ev_grams), "gram")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_eval_grams")))
    return (train_docs.select(id_col)
            .join(hits, id_col, "left")
            .select(
                id_col,
                F.coalesce("n_eval_grams", F.lit(0)).alias("n_eval_grams"))
            .withColumn("contaminated", F.col("n_eval_grams") > 0))


def decontaminate(train_docs: DataFrame, eval_docs: DataFrame,
                  n: int = DECONTAM_NGRAM,
                  id_col: str = "doc_id") -> DataFrame:
    """Drop contaminated training docs (the filter materialization of
    contamination_flags): left-anti join on the flagged id set, so
    the corpus itself never shuffles — only ids move."""
    bad = (contamination_flags(train_docs, eval_docs, n, id_col)
           .filter("contaminated").select(id_col))
    return train_docs.join(bad, id_col, "left_anti")


def fuzzy_contamination(train_docs: DataFrame, eval_docs: DataFrame,
                        jaccard_num: int = 1, jaccard_den: int = 2,
                        id_col: str = "doc_id") -> DataFrame:
    """Near-duplicate benchmark decontamination — the paraphrase
    complement to `contamination_flags`: exact n-gram collision
    misses an eval item that was lightly rewritten before landing in
    the training corpus, MinHash shingle-set Jaccard does not.
    Returns one row per training doc:
    (id_col, n_eval_matches, fuzzy_contaminated) where a match is an
    eval doc whose exact 3-shingle Jaccard clears
    jaccard_num/jaccard_den (integer-exact threshold, the dedup
    module's convention).

    Candidate generation is the SAME banded-MinHash machinery as
    near-dup dedup (`minhash_signatures`/`banded_signatures`), joined
    ACROSS the two corpora but banded NARROW (8 bands of width 2):
    recall is the LSH band curve 1-(1-j^r)^b, and decontamination is
    recall-critical with a tiny broadcast side, so the asymmetric
    sweep buys recall 0.90 at Jaccard 0.5 (vs 0.23 at the symmetric
    4x4 banding) with extra candidates that the exact verify
    discards. False flags: none (every flag re-verified exactly);
    misses: the remaining LSH tail, which the exact n-gram sweep
    catches whenever any 8-gram survives verbatim — run BOTH.
    Eval docs are keyed by xxhash64(text); a hash collision can only
    merge two eval identities, which at worst inflates
    n_eval_matches by one — flags stay correct.

    Scale notes (100 TB): the eval side is tiny (benchmarks are MBs)
    — its banded signatures and shingle sets broadcast; the training
    side is scanned once for signatures and once for verify shingle
    sets, with candidate volume bounded by band collisions against a
    broadcast index. Nothing corpus-sized shuffles."""
    from lisp_batch_processor_spark.operators.dedup import (
        banded_signatures, minhash_signatures, shingle_store)

    t = train_docs.select(F.col(id_col).alias("doc_id"), "text")
    e = eval_docs.select(
        F.xxhash64("text").alias("doc_id"), "text").distinct()
    bt = banded_signatures(minhash_signatures(t), n_bands=8)
    be = banded_signatures(minhash_signatures(e), n_bands=8)
    cand = (bt.join(F.broadcast(be.withColumnRenamed("doc_id", "_ev")),
                    ["band_idx", "band_key"])
            .select("doc_id", "_ev").distinct())
    st = shingle_store(t)
    se = F.broadcast(shingle_store(e)
                     .select(F.col("doc_id").alias("_ev"),
                             F.col("sh_set").alias("_ev_sh")))
    inter = F.size(F.array_intersect("sh_set", "_ev_sh"))
    uni = F.size("sh_set") + F.size("_ev_sh") - inter
    hits = (cand.join(st, "doc_id").join(se, "_ev")
            .filter(inter * F.lit(int(jaccard_den))
                    >= uni * F.lit(int(jaccard_num)))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_eval_matches"))
            .select(F.col("doc_id").alias("_fc_id"), "n_eval_matches"))
    return (train_docs.select(F.col(id_col))
            .join(hits, F.col(id_col) == F.col("_fc_id"), "left")
            .select(F.col(id_col),
                    F.coalesce("n_eval_matches", F.lit(0))
                    .alias("n_eval_matches"))
            .withColumn("fuzzy_contaminated",
                        F.col("n_eval_matches") > 0))


# ---------------------------------------------------------------------------
# Fractional-epoch upsampling — domain mixing with rates above 1.
# ---------------------------------------------------------------------------

def epoch_rates(domain_tokens: Mapping[str, int],
                target: Mapping[str, float],
                budget_tokens: int) -> dict[str, float]:
    """Per-domain epoch counts achieving the target token mixture at
    an EXPLICIT total budget — the upsampling generalization of
    mix_rates: epochs_d = w_d * budget / tokens_d may exceed 1
    (domain repeated), the regime every real pretraining mix hits
    for small high-quality domains (books, wiki).

    Pure driver arithmetic over O(#domains) aggregates; pair with
    domain_upsample to apply."""
    tw = {d: w for d, w in target.items() if w > 0}
    norm = sum(tw.values())
    if norm <= 0:
        raise ValueError("target mixture has no positive weights")
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    tw = {d: w / norm for d, w in tw.items()}
    missing = [d for d in tw if domain_tokens.get(d, 0) <= 0]
    if missing:
        raise ValueError(f"target domains with no corpus tokens: {missing}")
    return {d: w * budget_tokens / domain_tokens[d] for d, w in tw.items()}


def temperature_weights(domain_tokens: Mapping[str, int],
                        alpha: float) -> dict[str, float]:
    """Temperature-flattened mixture weights: w_d ∝ tokens_d^alpha,
    normalized to sum 1 — the standard multi-source rebalancing rule
    (alpha = 1 keeps the natural distribution, alpha = 0 is uniform,
    between them small domains are boosted smoothly). Feed the result
    straight into `epoch_rates` as the target mixture.

    Pure driver arithmetic over the O(#domains) token totals."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    pos = {d: t for d, t in domain_tokens.items() if t > 0}
    if not pos:
        raise ValueError("no domain has positive tokens")
    raw = {d: t ** alpha for d, t in pos.items()}
    norm = sum(raw.values())
    return {d: w / norm for d, w in raw.items()}


def domain_upsample(docs: DataFrame, epochs: Mapping[str, float],
                    domain_col: str = "source", id_col: str = "doc_id",
                    salt: str = "epoch-v1") -> DataFrame:
    """Repeat each domain's documents `epochs[domain]` times in
    expectation: floor(e) full copies per doc plus one extra copy iff
    the doc's deterministic coin lands under the fractional part.
    Adds an `epoch` column (0..reps-1) so downstream packing/shuffle
    can treat copies as distinct rows; domains absent from `epochs`
    are dropped (rate 0).

    Deterministic per (salt, id): rerunning, repartitioning, or
    growing the corpus never flips which docs carry the fractional
    extra copy — same stability contract as split_assign/domain_mix.

    Scale notes: a scan-local explode of a 0..reps-1 sequence — no
    shuffle, no driver state beyond the O(#domains) epoch map. Output
    volume is sum_d(epochs_d * tokens_d) by construction, i.e. the
    budget handed to epoch_rates. Rate delivery adapts to the domain
    count: a literal `create_map` below `_MAP_LITERAL_MAX` domains
    (pure projection, zero joins), a BROADCAST equi-join above it —
    at web scale (10^5-10^6 registrable domains) a literal map would
    bloat the serialized plan itself, while a broadcast of
    (domain, full, frac) rows is exactly the small-dim join Spark is
    built for. Both paths compute identical rows (equality-tested).
    """
    if any(e < 0 for e in epochs.values()):
        raise ValueError("epoch counts must be non-negative")
    full = {d: int(e) for d, e in epochs.items()}
    frac_thr = {d: int(round((e - int(e)) * SPLIT_BUCKETS))
                for d, e in epochs.items()}
    b = hash_bucket(id_col, salt)
    if len(epochs) <= _MAP_LITERAL_MAX:
        m_full = F.create_map(*[x for d in sorted(epochs)
                                for x in (F.lit(d), F.lit(full[d]))])
        m_frac = F.create_map(*[x for d in sorted(epochs)
                                for x in (F.lit(d), F.lit(frac_thr[d]))])
        staged = docs.withColumn(
            "_reps", m_full[F.col(domain_col)]
            + (b < m_frac[F.col(domain_col)]).cast("int"))
    else:
        rates = docs.sparkSession.createDataFrame(
            [(d, full[d], frac_thr[d]) for d in sorted(epochs)],
            f"{domain_col} string, _du_full int, _du_frac int")
        staged = (docs.join(F.broadcast(rates), domain_col, "left")
                  .withColumn("_reps", F.col("_du_full")
                              + (b < F.col("_du_frac")).cast("int"))
                  .drop("_du_full", "_du_frac"))
    return (staged
            .filter(F.col("_reps").isNotNull() & (F.col("_reps") > 0))
            .withColumn("epoch", F.explode(
                F.sequence(F.lit(0), F.col("_reps") - 1)))
            .drop("_reps"))


# ---------------------------------------------------------------------------
# Deterministic global shuffle — training order without a random seed
# race.
# ---------------------------------------------------------------------------

def shuffle_deterministic(docs: DataFrame, salt: str = "shuffle-v1",
                          id_col: str = "doc_id",
                          num_partitions: int | None = None,
                          order_within: Sequence[str] = ()) -> DataFrame:
    """Order the corpus by a deterministic hash of (salt, id) — the
    global training-order shuffle. Adds `shuffle_key` (the 60-bit md5
    word) and returns the frame range-partitioned and sorted by it,
    ready for a partitioned write whose files ARE the training order.

    Unlike orderBy(rand()), the order is a pure function of (salt,
    id): reruns and retried tasks produce identical output (rand()
    re-rolls per task attempt — a real nondeterminism bug at scale),
    and a changed salt is a fresh epoch-level reshuffle.

    When copies exist (domain_upsample output with an `epoch`
    column), pass a composite id or salt per epoch so copies spread
    through the order instead of clustering.

    ``order_within``: extra sort columns appended AFTER (shuffle_key,
    id) — for inputs where several rows share an id and must stay in
    a fixed internal order through the shuffle (pack_sequences output
    shuffled at pack grain keeps each pack's documents in `pos`
    order: ``id_col="pack_id", order_within=("pos",)``). Same single
    range shuffle; the extra keys only extend the within-partition
    sort.

    Scale notes: one range shuffle — exactly the cost of any global
    sort, with boundaries from Spark's range sampler; no driver-side
    ordering state. At 100 TB prefer writing bucketed-by-key files
    and streaming them in key order if a single total order is not
    required.
    """
    out = docs.withColumn("shuffle_key",
                          _hash_word(salt, F.col(id_col)))
    parts = num_partitions or out.sparkSession.sparkContext.defaultParallelism
    return (out.repartitionByRange(parts, "shuffle_key", F.col(id_col))
            .sortWithinPartitions("shuffle_key", id_col, *order_within))


# ---------------------------------------------------------------------------
# Exact-k stratified sampling — fixed per-stratum budgets for eval
# sets and ablation corpora.
# ---------------------------------------------------------------------------

def stratified_sample_exact(df: DataFrame, strata: str | Sequence[str],
                            k: int, id_col: str = "doc_id",
                            salt: str = "strata-v1",
                            n_buckets: int = 32) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, chosen
    deterministically: rows rank by the salted 60-bit md5 word of
    their id (`_hash_word`, the repo-wide portable hash) and the k
    smallest win. A pure function of (salt, id) — reruns,
    repartitionings, and other engines replay the identical sample
    (DuckDB twin: ``ROW_NUMBER() OVER (PARTITION BY strata ORDER BY
    hash, id) <= k`` with the documented md5 construction) — unlike
    ``df.sampleBy``, which is seed-and-partitioning dependent and
    only approximates the fraction.

    Versus `split_assign` (hash-THRESHOLD sampling): thresholds give
    append-stable membership but only approximate counts; exact-k
    gives a fixed budget but adding corpus rows can displace earlier
    picks (a row's rank is relative). Pick per use case: eval split
    -> thresholds; "exactly 10k docs per language for the ablation"
    -> this.

    Scale notes — skew-safe two-phase top-k (the `skew.py` two-phase
    agg pattern applied to ORDER statistics): a naive per-stratum
    window sorts every row of the largest stratum in one task. Phase
    1 ranks within (stratum, pmod(hash, n_buckets)) — at most B
    bounded sorts per stratum, each over ~1/B of it — and keeps
    bucket-local top-k, which PROVABLY contains the stratum top-k
    (any global top-k row has < k stratum rows hashed below it, so
    at most k-1 in its own bucket). Phase 2 re-ranks the <= B*k
    survivors per stratum exactly. Result is n_buckets-invariant
    (pinned in tests) — B only caps the biggest single-task sort.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    keys = [strata] if isinstance(strata, str) else list(strata)
    work = df.withColumn("_ss_h", _hash_word(salt, F.col(id_col)))
    if n_buckets > 1:
        w1 = Window.partitionBy(
            *keys, F.pmod(F.col("_ss_h"), F.lit(n_buckets))
        ).orderBy("_ss_h", id_col)
        work = (work.withColumn("_ss_rn", F.row_number().over(w1))
                .filter(F.col("_ss_rn") <= k).drop("_ss_rn"))
    w2 = Window.partitionBy(*keys).orderBy("_ss_h", id_col)
    return (work.withColumn("_ss_rn", F.row_number().over(w2))
            .filter(F.col("_ss_rn") <= k)
            .drop("_ss_h", "_ss_rn"))
