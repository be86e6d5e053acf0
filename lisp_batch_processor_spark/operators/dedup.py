"""Fuzzy / near-duplicate detection — north-star dedup operators
(SURVEY.md §2.C q_dedup_fuzzy, BASELINE.json north_star): MinHash+LSH,
SimHash, n-gram Jaccard, and embedding-cosine near-dup. All are
DataFrame-native (hash/array built-ins; no Python UDFs, no
cartesian products — every candidate generation is a bounded
equi-join on a bucket key).

Output convention: dedup queries return an ASSIGNMENT — one row per
input (id, rep_id, is_dup) — so results are non-empty even on a
corpus with no near-dups, and downstream `filter(~is_dup)` is the
keep-one materialization. rep_id is the min id among LSH-confirmed
neighbors in one pass (production runs the pass to fixpoint for full
transitive closure; one pass is the per-round unit of work at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lisp_batch_processor_spark.catalog import load
from lisp_batch_processor_spark.functions.vectors import cosine
from lisp_batch_processor_spark.operators.text import tokens_col
from lisp_batch_processor_spark.registry import query

NUM_MINHASHES = 16
MINHASH_BANDS = 4  # 4 bands x 4 rows: catches jaccard >~ 0.7
SHINGLE_WORDS = 3


def _shingles() -> F.Column:
    """3-word shingles of the token array; short docs fall back to the
    whole token sequence as one shingle."""
    toks = tokens_col()
    n = F.size(toks)
    make = F.transform(
        F.sequence(F.lit(0), n - SHINGLE_WORDS),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, SHINGLE_WORDS)))
    whole = F.array(F.concat_ws(" ", toks))
    return F.when(n >= SHINGLE_WORDS, make).otherwise(whole)


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, mh0..mh{n-1}): column-wise MinHash over distinct
    shingles. One explode + one groupBy — the shuffle carries
    (doc_id, shingle) pairs; signatures aggregate map-side."""
    sh = (docs.select("doc_id", F.explode(_shingles()).alias("shingle"))
          .dropDuplicates(["doc_id", "shingle"]))
    aggs = [F.min(F.xxhash64(F.lit(s), F.col("shingle"))).alias(f"mh{s}")
            for s in range(NUM_MINHASHES)]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(sig: DataFrame) -> DataFrame:
    """Band the signature and self-join on (band_idx, band_hash) —
    candidates only ever meet inside a bucket, never via cross join."""
    rows_per_band = NUM_MINHASHES // MINHASH_BANDS
    bands = F.array(*[
        F.xxhash64(*[F.col(f"mh{b * rows_per_band + r}")
                     for r in range(rows_per_band)])
        for b in range(MINHASH_BANDS)
    ])
    banded = sig.select(
        "doc_id", F.posexplode(bands).alias("band_idx", "band_hash"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
                  & (F.col("a.band_hash") == F.col("b.band_hash"))
                  & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )


def verify_jaccard(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (|candidates| is
    LSH-bounded, so carrying both shingle sets through the join is
    proportional to candidates, not to the corpus)."""
    sets_ = docs.select("doc_id",
                        F.array_distinct(_shingles()).alias("sh_set"))
    j = (pairs
         .join(sets_.withColumnRenamed("doc_id", "doc_a")
                    .withColumnRenamed("sh_set", "sh_a"), "doc_a")
         .join(sets_.withColumnRenamed("doc_id", "doc_b")
                    .withColumnRenamed("sh_set", "sh_b"), "doc_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.size("sh_a") + F.size("sh_b")).cast("double") - inter
    return j.select("doc_a", "doc_b",
                    F.round(inter / union, 6).alias("jaccard"))


def assignment(ids: DataFrame, id_col: str,
               dup_pairs: DataFrame, a: str, b: str) -> DataFrame:
    """Turn confirmed dup pairs into a one-row-per-input assignment:
    rep_id = min(self, confirmed neighbors)."""
    neighbor_min = (
        dup_pairs.select(F.col(b).alias(id_col), F.col(a).alias("nbr"))
        .groupBy(id_col).agg(F.min("nbr").alias("min_nbr")))
    return (
        ids.join(neighbor_min, id_col, "left")
        .select(
            F.col(id_col),
            F.least(F.col(id_col), F.coalesce("min_nbr", F.col(id_col)))
                .alias("rep_id"))
        .withColumn("is_dup", F.col(id_col) != F.col("rep_id"))
    )


def connected_components(pairs: DataFrame, a: str, b: str,
                         max_iter: int = 25) -> DataFrame:
    """(node, component) for every node in `pairs`, where component
    is the min node id reachable through any chain of pairs — the
    transitive closure the one-pass rep assignment approximates.

    Iterative min-label propagation: each round every node takes the
    min of its own label and its neighbors' labels; converged when no
    label changes. Rounds = graph diameter (dedup graphs are shallow:
    near-dup clusters are cliques or short chains).

    Scale notes: each round is one equi-join + one groupBy on the
    edge list — all shuffles on node id, reusable partitioning. The
    label frame is localCheckpoint'ed each round: without it the
    lineage doubles per iteration and Catalyst re-analyzes an
    exponentially growing plan (the classic iterative-algorithm
    trap). Convergence is detected with a count() per round, which
    also materializes the checkpoint.
    """
    edges = (pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
             .unionAll(pairs.select(F.col(b).alias("src"),
                                    F.col(a).alias("dst")))
             .dropDuplicates(["src", "dst"]))
    labels = (edges.select(F.col("src").alias("node"))
              .distinct()
              .withColumn("component", F.col("node")))
    labels = labels.localCheckpoint(eager=True)
    changed = -1
    for _ in range(max_iter):
        via_edges = (edges.join(labels, edges.src == labels.node)
                     .select(F.col("dst").alias("node"), "component"))
        new_labels = (labels.unionAll(via_edges)
                      .groupBy("node")
                      .agg(F.min("component").alias("component"))
                      .localCheckpoint(eager=True))
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "node")
                   .filter(F.col("n.component") != F.col("o.component"))
                   .count())
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # Diameter > max_iter: labels are NOT a fixpoint. Surface it
        # loudly instead of silently returning partial components.
        import warnings

        warnings.warn(
            f"connected_components: {changed} labels still changing "
            f"after max_iter={max_iter}; result is not converged "
            f"(graph diameter exceeds the round budget)",
            RuntimeWarning, stacklevel=2)
    return labels


@query("q_dedup_connected")
def q_dedup_connected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full transitive-closure dedup assignment: MinHash-LSH
    confirmed pairs -> connected components -> one row per document
    with its component representative (min doc_id reachable through
    any near-dup chain). rows-only check; closure properties are
    tested in tests/test_dedup.py.
    """
    docs = load(spark, sf_dir, "documents")
    sig = minhash_signatures(docs)
    pairs = lsh_candidate_pairs(sig)
    confirmed = verify_jaccard(docs, pairs).filter(F.col("jaccard") >= 0.7)
    comp = connected_components(confirmed, "doc_a", "doc_b")
    return (docs.select("doc_id")
            .join(comp, F.col("doc_id") == F.col("node"), "left")
            .select("doc_id",
                    F.coalesce("component", F.col("doc_id")).alias("rep_id"))
            .withColumn("is_dup", F.col("doc_id") != F.col("rep_id")))


@query("q_dedup_minhash")
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-duplicate detection over `documents`:
    shingle -> 16 minhashes -> 4 LSH bands -> bucket equi-join ->
    exact-Jaccard verify (>= 0.7) -> per-doc rep assignment.

    rows-only check (LSH banding is not SQL-expressible); recall and
    precision are property-tested on constructed near-dups in
    tests/test_dedup.py.

    Scale notes: cost is O(|docs| * shingles) + O(candidates); the
    band join is an equi-join on a 64-bit bucket hash, uniformly
    distributed -> no skew at 100 TB. No cross join anywhere.
    """
    docs = load(spark, sf_dir, "documents")
    sig = minhash_signatures(docs)
    pairs = lsh_candidate_pairs(sig)
    confirmed = verify_jaccard(docs, pairs).filter(F.col("jaccard") >= 0.7)
    return assignment(docs.select("doc_id"), "doc_id",
                      confirmed, "doc_a", "doc_b")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 64
SIMHASH_BANDS = 4  # 4 x 16-bit bands: catches hamming distance <= 3
HAMMING_MAX = 3


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): 64-bit SimHash over token frequencies.
    Each bit of xxhash64(token) votes +count/-count; the sign of the
    per-bit total is the fingerprint bit. Bit-position adds never
    overlap, so summing shifted bits reassembles the word exactly."""
    tf = (docs.select("doc_id", F.explode(tokens_col()).alias("tok"))
          .groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("cnt"))
          .withColumn("h", F.xxhash64("tok")))
    bit_sums = tf.groupBy("doc_id").agg(*[
        F.sum(F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1,
                     F.col("cnt")).otherwise(-F.col("cnt"))).alias(f"s{i}")
        for i in range(SIMHASH_BITS)
    ])
    fp = None
    for i in range(SIMHASH_BITS):
        bit = F.shiftleft(F.when(F.col(f"s{i}") > 0, F.lit(1))
                          .otherwise(F.lit(0)).cast("bigint"), i)
        fp = bit if fp is None else fp + bit
    return bit_sums.select("doc_id", fp.alias("simhash"))


@query("q_dedup_simhash")
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate detection: 64-bit fingerprint -> 4
    16-bit bands (any pair within hamming distance 3 shares at least
    one exact band) -> bucket equi-join -> bit_count(xor) verify ->
    per-doc rep assignment plus the fingerprint itself.

    rows-only check (bit-level hashing is engine-specific); hamming
    recall is property-tested in tests/test_dedup.py.

    Scale notes: fingerprints aggregate map-side; the band join is
    an equi-join on 16-bit buckets — at extreme corpus sizes bucket
    population grows, which is the known SimHash trade-off (use more
    bands/bits), documented here rather than hidden.
    """
    docs = load(spark, sf_dir, "documents")
    fp = simhash_fingerprints(docs)
    band_width = SIMHASH_BITS // SIMHASH_BANDS
    mask = (1 << band_width) - 1
    bands = F.array(*[
        F.shiftright("simhash", b * band_width).bitwiseAND(F.lit(mask))
        for b in range(SIMHASH_BANDS)])
    banded = fp.select(
        "doc_id", "simhash", F.posexplode(bands).alias("band_idx", "band_key"))
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
                  & (F.col("a.band_key") == F.col("b.band_key"))
                  & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
                    .alias("hamming"))
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= HAMMING_MAX))
    # Assign over ALL doc ids (not just fingerprinted ones):
    # zero-token documents produce no tf rows and hence no
    # fingerprint, but the module's one-row-per-input convention
    # still owes them a (doc_id, rep_id=self, is_dup=false) row —
    # with a null simhash, which is honest (nothing was hashed).
    docs_ids = docs.select("doc_id")
    return (assignment(docs_ids, "doc_id", pairs, "doc_a", "doc_b")
            .join(fp, "doc_id", "left")
            .select("doc_id", "simhash", "rep_id", "is_dup"))


# ---------------------------------------------------------------------------
# n-gram (token-set) Jaccard — SQL-expressible, source-blocked.
# ---------------------------------------------------------------------------

_Q_DEDUP_NGRAM_ORACLE = """
WITH t AS (
  SELECT doc_id, source,
         list_distinct(list_filter(
           regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> ''))
           AS tok_set
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  ROUND(CAST(len(list_filter(a.tok_set, x -> list_contains(b.tok_set, x)))
             AS DOUBLE)
        / (len(a.tok_set) + len(b.tok_set)
           - len(list_filter(a.tok_set, x -> list_contains(b.tok_set, x)))),
        6) AS jaccard
FROM t a JOIN t b
  ON a.source = b.source AND a.doc_id < b.doc_id
WHERE CAST(len(list_filter(a.tok_set, x -> list_contains(b.tok_set, x)))
           AS DOUBLE)
      / (len(a.tok_set) + len(b.tok_set)
         - len(list_filter(a.tok_set, x -> list_contains(b.tok_set, x))))
      >= 0.8
"""


@query("q_dedup_ngram", oracle=_Q_DEDUP_NGRAM_ORACLE)
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard >= 0.8 within source blocks — the
    brute-force-within-block baseline the LSH variants approximate,
    and (unlike them) fully SQL-expressible for the oracle.

    Scale notes: blocking on `source` bounds the quadratic term to
    block size; this is the honest "small blocks only" variant — at
    100 TB unblocked corpora use q_dedup_minhash instead.
    """
    docs = load(spark, sf_dir, "documents")
    t = (docs.select("doc_id", "source",
                     F.array_distinct(tokens_col()).alias("tok_set"))
         .withColumn("sz", F.size("tok_set")))
    # Inverted-index set-similarity join: explode to (doc, token)
    # postings, equi-join postings on (source, token), count matched
    # tokens per pair = |A∩B|. This replaces the naive all-pairs
    # array_intersect plan, which Catalyst pulls into the join
    # condition (evaluating the O(|A|*|B|) intersect twice per pair,
    # before the cheap predicates) and which parallelizes only by
    # block key. Here the join key (source, token) is high-
    # cardinality -> full shuffle parallelism; the count aggregates
    # map-side; no array op ever runs per pair.
    tok = t.select("doc_id", "source", "sz",
                   F.explode("tok_set").alias("tok"))
    a, b = tok.alias("a"), tok.alias("b")
    # Size-ratio prune (integer-exact): jaccard >= 0.8 implies
    # 5*min(|A|,|B|) >= 4*max(|A|,|B|); evaluated per posting match,
    # it keeps incompatible pairs out of the aggregation entirely.
    size_ok = (F.least(F.col("a.sz"), F.col("b.sz")) * 5
               >= F.greatest(F.col("a.sz"), F.col("b.sz")) * 4)
    inter = F.count(F.lit(1))
    union = F.col("sz_a") + F.col("sz_b") - F.col("inter")
    return (
        a.join(b, (F.col("a.source") == F.col("b.source"))
                  & (F.col("a.tok") == F.col("b.tok"))
                  & (F.col("a.doc_id") < F.col("b.doc_id"))
                  & size_ok)
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"),
                 F.col("a.sz").alias("sz_a"), F.col("b.sz").alias("sz_b"))
        .agg(inter.alias("inter"))
        # Integer-exact threshold (inter*5 >= union*4); the rounded
        # double is only the reported value, never the decision.
        .filter(F.col("inter") * 5 >= union * 4)
        .select("doc_a", "doc_b",
                F.round(F.col("inter").cast("double") / union, 6)
                 .alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup.
# ---------------------------------------------------------------------------

COSINE_DUP_THRESHOLD = 0.99


@query("q_dedup_embedding")
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection over `embeddings`:
    label-blocked pair generation -> exact cosine >= 0.99 ->
    per-vector rep assignment.

    rows-only check; cosine math is property-tested against numpy in
    tests/test_similarity.py.

    Scale notes: blocking on `label` (a cluster/category id) bounds
    the pair count; for unlabeled corpora swap the block key for the
    SRP-LSH bucket of q_similarity_ann — same downstream plan.
    """
    emb = load(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", "label", "embedding")
    a, b = e.alias("a"), e.alias("b")
    pairs = (
        a.join(b, (F.col("a.label") == F.col("b.label"))
                  & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"),
                cosine(F.col("a.embedding"), F.col("b.embedding"))
                    .alias("cos"))
        .filter(F.col("cos") >= COSINE_DUP_THRESHOLD))
    return assignment(e.select("vec_id"), "vec_id", pairs, "vec_a", "vec_b")
