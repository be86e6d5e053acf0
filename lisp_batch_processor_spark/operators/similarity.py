"""Similarity search over the `embeddings` table — north-star ANN
operators (SURVEY.md §2.C q_similarity_topk): exact brute-force
cosine top-k as the correctness baseline, and a deterministic
signed-random-projection (SRP) LSH variant as the 100 TB scale path.
All vector math is JVM-side (functions/vectors.py).
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lisp_batch_processor_spark.catalog import load
from lisp_batch_processor_spark.functions.numeric import dround, sql_dround
from lisp_batch_processor_spark.functions.vectors import (
    cosine, dot, sql_cosine, sql_dot)
from lisp_batch_processor_spark.registry import query

N_QUERY_VECS = 10
TOP_K = 5

# Portable 6-dp rounding of the cosine (see functions/numeric.dround).
_DR_COS = sql_dround("cos", 6)

# Zero-norm guards on both sides: cosine with a zero vector is 0/0 —
# Spark's ANSI division errors and DuckDB's NaN would rank first, so
# such vectors are excluded from ranking by contract (fuzz-pinned).
_Q_SIMILARITY_TOPK_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id < {N_QUERY_VECS}
    AND {sql_dot('embedding', 'embedding')} > 0
), pairs AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
    list_reduce(list_transform(generate_series(1, len(q.qe)),
      i -> CAST(q.qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
      (x, y) -> x + y)
    / (sqrt(list_reduce(list_transform(generate_series(1, len(q.qe)),
        i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)),
        (x, y) -> x + y))
       * sqrt(list_reduce(list_transform(generate_series(1, len(e.embedding)),
        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
        (x, y) -> x + y))) AS cos
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id
   AND {sql_dot('e.embedding', 'e.embedding')} > 0
), ranked AS (
  SELECT query_id, neighbor_id, {_DR_COS} AS cos_sim,
    row_number() OVER (PARTITION BY query_id
                       ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, cos_sim, rank
FROM ranked WHERE rank <= {TOP_K}
"""


@query("q_similarity_topk", oracle=_Q_SIMILARITY_TOPK_ORACLE)
def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k: a bounded query set (vec_id <
    10) against the whole corpus; per-query top-5 with deterministic
    tie-break. Both engines fold the dot product left-to-right in
    double, so even the floating cosine hash-matches.

    Scale notes: the query set is broadcast (bounded), so this is a
    map-side nested loop over corpus partitions — no shuffle of the
    corpus; the per-query top-k is a WindowGroupLimit, not a global
    sort. Brute force is the 100%-recall baseline; the scale path is
    q_similarity_ann.
    """
    emb = load(spark, sf_dir, "embeddings")
    # Zero-norm vectors have no cosine: dropped from both sides (the
    # ANSI division would error; NaN would outrank every real score).
    nz = emb.filter(dot(F.col("embedding"), F.col("embedding")) > 0)
    queries = (nz.filter(F.col("vec_id") < N_QUERY_VECS)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("qe")))
    corpus = nz.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    pairs = (F.broadcast(queries).crossJoin(corpus)
             .filter(F.col("neighbor_id") != F.col("query_id"))
             .select("query_id", "neighbor_id",
                     cosine(F.col("qe"), F.col("embedding")).alias("cos")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "neighbor_id",
                    dround(F.col("cos"), 6).alias("cos_sim"), "rank"))


# ---------------------------------------------------------------------------
# Banded SRP-LSH approximate nearest neighbors — the scale path.
# ---------------------------------------------------------------------------

N_BANDS = 16         # independent hash tables (OR-amplification: recall)
BITS_PER_BAND = 3    # hyperplanes per table (AND-amplification: precision)
EMBED_DIM = 64


def _srp_planes(n_planes: int = N_BANDS * BITS_PER_BAND,
                dim: int = EMBED_DIM) -> list[list[float]]:
    """Deterministic ±1 hyperplanes derived from md5 — no RNG state,
    so signatures are stable across sessions and cluster restarts."""
    planes = []
    for p in range(n_planes):
        row = []
        for j in range(dim):
            h = hashlib.md5(f"srp:{p}:{j}".encode()).digest()
            row.append(1.0 if h[0] & 1 else -1.0)
        planes.append(row)
    return planes


def _srp_keys_udf():
    """Arrow-batched SRP signatures: ONE vectorized pass computes all
    N_BANDS*BITS_PER_BAND projections per batch (numpy accumulation
    over dimensions) instead of 32 interpreted higher-order folds per
    row — the per-row constant that dominated the interpreted plan.

    The accumulation loops over DIMENSIONS (acc += v_j * p_j), so
    every scalar projection folds left-to-right exactly like
    F.aggregate and DuckDB's list_reduce — the sign bits, and hence
    the bucket keys, are bit-identical across all three.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    planes = np.array(_srp_planes(), dtype=np.float64).T  # (dim, planes)

    @pandas_udf("array<int>")
    def srp_keys(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:  # empty Arrow batch (e.g. AQE-empty partition)
            return pd.Series([], dtype=object)
        mat = np.stack(emb.to_numpy()).astype(np.float64)  # (n, dim)
        acc = np.zeros((mat.shape[0], planes.shape[1]))
        for j in range(planes.shape[0]):
            acc += mat[:, j:j + 1] * planes[j:j + 1, :]
        bits = (acc > 0).astype(np.int32)
        keys = np.zeros((mat.shape[0], N_BANDS), dtype=np.int32)
        for b in range(N_BANDS):
            for j in range(BITS_PER_BAND):
                keys[:, b] += bits[:, b * BITS_PER_BAND + j] << j
        return pd.Series(list(keys))

    return srp_keys


def _sql_srp_key(band: int) -> str:
    """DuckDB twin of one band's bucket key, planes inlined as list
    literals (same md5-derived constants, same fold order)."""
    planes = _srp_planes()
    bits = []
    for j in range(BITS_PER_BAND):
        plane = planes[band * BITS_PER_BAND + j]
        # The {x:.1f} rendering is lossless ONLY for the current ±1.0
        # plane scheme — assert that, so a future plane change can't
        # silently desynchronize the oracle from the UDF (use repr /
        # %.17g formatting if planes ever become non-trivial floats).
        assert all(x in (1.0, -1.0) for x in plane), \
            "non-±1 SRP planes need full-precision oracle literals"
        lit = "[" + ", ".join(f"{x:.1f}" for x in plane) + "]"
        d = (f"list_reduce(list_transform(generate_series(1, {EMBED_DIM}), "
             f"i -> CAST(embedding[i] AS DOUBLE) * ({lit}[i])), "
             f"(x, y) -> x + y)")
        bits.append(f"(CASE WHEN {d} > 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def _ann_oracle_sql() -> str:
    key_cols = ",\n    ".join(f"{_sql_srp_key(b)} AS k{b}"
                              for b in range(N_BANDS))
    band_rows = "\n  UNION ALL\n  ".join(
        f"SELECT vec_id, {b} AS band, k{b} AS key FROM base"
        for b in range(N_BANDS))
    return f"""
WITH base AS (
  SELECT vec_id,
    {key_cols}
  FROM embeddings
  -- zero-norm vectors are excluded from the index and from querying:
  -- their cosine is 0/0 (same convention as q_similarity_topk).
  WHERE {sql_dot('embedding', 'embedding')} > 0
), sig AS (
  {band_rows}
), q AS (
  SELECT vec_id AS query_id, band, key FROM sig WHERE vec_id < {N_QUERY_VECS}
), cand AS (
  SELECT DISTINCT q.query_id, s.vec_id AS neighbor_id
  FROM q JOIN sig s ON s.band = q.band AND s.key = q.key
  WHERE s.vec_id <> q.query_id
), pairs AS (
  SELECT c.query_id, c.neighbor_id,
    {sql_cosine('eq.embedding', 'en.embedding')} AS cos
  FROM cand c
  JOIN embeddings eq ON eq.vec_id = c.query_id
  JOIN embeddings en ON en.vec_id = c.neighbor_id
), ranked AS (
  SELECT query_id, neighbor_id, {_DR_COS} AS cos_sim,
    row_number() OVER (PARTITION BY query_id
                       ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, cos_sim, rank
FROM ranked WHERE rank <= {TOP_K}
"""


@query("q_similarity_ann", oracle=_ann_oracle_sql())
def q_similarity_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: banded SRP-LSH (N_BANDS=16 tables x
    BITS_PER_BAND=3 deterministic hyperplanes), exact cosine re-rank
    over the union of colliding candidates.

    Hash-checked: signatures come from a vectorized Arrow pandas_udf
    whose per-dimension accumulation preserves the left-to-right fold,
    so the DuckDB oracle (planes inlined as literals) reproduces every
    bucket key and the exact re-ranked answer. Recall vs brute force
    is additionally property-tested in tests/test_similarity.py.

    Scale notes: the bounded query set (exploded to N_BANDS keys) is
    broadcast, so candidate generation is a map-side equi-join on
    (band, key) — the corpus is scanned once, never shuffled; the
    dedup + per-query top-k shuffles only the candidate set, which is
    ~N_BANDS/2^BITS_PER_BAND of the corpus per query. Tune
    BITS_PER_BAND ~ log2(corpus/bucket_target) as the corpus grows;
    the band count, not the corpus, bounds recall. Signature cost is
    one (batch x dim)·(dim x planes) numpy pass per Arrow batch.
    """
    return srp_ann_topk(load(spark, sf_dir, "embeddings"))


def srp_ann_topk(emb: DataFrame, n_query: int = N_QUERY_VECS,
                 top_k: int = TOP_K) -> DataFrame:
    """The plain SRP-LSH path as a library operator over any
    (vec_id, embedding) frame — q_similarity_ann's body, reusable so
    tests and the collapsed variant can run both paths on one corpus."""
    srp_keys = _srp_keys_udf()
    # Zero-norm vectors are excluded from the index and the query set
    # (no cosine; same convention as q_similarity_topk).
    nz = emb.filter(dot(F.col("embedding"), F.col("embedding")) > 0)
    sig = (nz.select("vec_id", "embedding",
                     F.posexplode(srp_keys("embedding"))
                      .alias("band", "key")))
    queries = (sig.filter(F.col("vec_id") < n_query)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("qe"), "band", "key"))
    cand = (F.broadcast(queries)
            .join(sig, ["band", "key"])
            .filter(F.col("vec_id") != F.col("query_id"))
            .select("query_id", "qe",
                    F.col("vec_id").alias("neighbor_id"), "embedding")
            .dropDuplicates(["query_id", "neighbor_id"]))
    pairs = cand.select(
        "query_id", "neighbor_id",
        cosine(F.col("qe"), F.col("embedding")).alias("cos"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select("query_id", "neighbor_id",
                    dround(F.col("cos"), 6).alias("cos_sim"), "rank"))


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the centroid-partitioned scale path.
# ---------------------------------------------------------------------------
#
# SURVEY.md names two ANN scale paths: LSH-bucketed (q_similarity_ann,
# above, under the correctness gate) and IVF. This is the IVF variant
# as a library operator: deterministic k-means-style cells, nprobe
# probing, exact re-rank. It has no registry row (the driver gate is
# capped at 50 queries); its recall contract is enforced in
# tests/test_similarity.py instead.

IVF_CELLS = 16        # nlist; at corpus scale use ~sqrt(N)
IVF_NPROBE = 4        # cells probed per query (recall/cost dial)
IVF_LLOYD_ITERS = 2   # refinement rounds over the seed centroids


def _ivf_seed_centroids(emb: DataFrame, k: int) -> list[list[float]]:
    """Deterministic k-seed selection without RNG state: the k vectors
    with the smallest md5(vec_id) — a uniform, reproducible sample
    (same portability rationale as the md5-derived SRP planes).
    Collecting k×dim floats to the driver is model state, not data:
    the centroids ARE the index parameters, exactly what a production
    IVF trains on a sample and broadcasts."""
    seeded = (emb.select("vec_id", "embedding",
                         F.md5(F.col("vec_id").cast("string")).alias("h"))
              .orderBy("h").limit(k))          # TakeOrderedAndProject
    return [list(map(float, r.embedding)) for r in seeded.collect()]


def _ivf_cells_udf(centroids: list[list[float]], nprobe: int):
    """Arrow-batched cell assignment: one (batch×dim)·(dim×k) matmul
    per batch, then the nprobe most-cosine-similar centroids (both
    sides unit-normalized, so the dot product ranks by cosine)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    c = np.array(centroids, dtype=np.float64)
    c = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    ct = c.T

    @pandas_udf("array<int>")
    def cells(emb_s: pd.Series) -> pd.Series:
        if len(emb_s) == 0:  # empty Arrow batch
            return pd.Series([], dtype=object)
        m = np.stack(emb_s.to_numpy()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(m @ ct), kind="stable", axis=1)
        return pd.Series(list(order[:, :nprobe].astype(np.int32)))

    return cells


def ivf_train(emb: DataFrame, k: int = IVF_CELLS,
              iters: int = IVF_LLOYD_ITERS) -> list[list[float]]:
    """Seed-deterministic IVF training: md5-seeded centroids refined
    by Lloyd rounds expressed as DataFrame aggregations (assign =
    Arrow matmul UDF; update = posexplode → per-(cell, dim) avg).
    Each round is one shuffle of (cell, dim, value) triples — k×dim
    results, independent of corpus size, so the collect is O(model).

    "Seed-deterministic", not bit-deterministic: the SEEDS are exact
    (md5 order), but the Lloyd update's F.avg over doubles depends on
    partition/reduction order, so refined centroids can differ by
    ULPs across partitionings and argsort ties near cell boundaries
    could flip an assignment. IVF is an approximate index — recall
    contracts (tests/test_similarity.py) are the right invariant,
    not centroid bits. For bit-stable centroids, sum in decimal and
    divide (functions/numeric.dsum pattern).

    Scale notes: at 100 TB train on a deterministic sample (e.g.
    `WHERE md5(vec_id) < p`), then assign the full corpus once with
    the broadcast centroid matrix — the standard IVF split of tiny
    training from embarrassingly-parallel assignment. Empty cells
    keep their previous centroid (no respawn heuristic: determinism
    beats marginal balance here)."""
    cents = _ivf_seed_centroids(emb, k)
    # A corpus smaller than k seeds fewer than k centroids; clamp so
    # the refresh comprehension below can't index past the seed list.
    k = len(cents)
    if k == 0:
        raise ValueError("ivf_train: empty corpus, no centroids to seed")
    for _ in range(iters):
        one_cell = _ivf_cells_udf(cents, 1)
        assign = emb.select(one_cell("embedding")[0].alias("cell"),
                            "embedding")
        means = (assign
                 .select("cell", F.posexplode("embedding").alias("dim", "v"))
                 .groupBy("cell", "dim").agg(F.avg("v").alias("m"))
                 .groupBy("cell")
                 .agg(F.array_sort(F.collect_list(F.struct("dim", "m")))
                       .alias("dm")))
        new = {r.cell: [float(x.m) for x in r.dm] for r in means.collect()}
        cents = [new.get(i, cents[i]) for i in range(k)]
    return cents


def ivf_topk(emb: DataFrame, centroids: list[list[float]],
             n_query: int = N_QUERY_VECS, nprobe: int = IVF_NPROBE,
             top_k: int = TOP_K) -> DataFrame:
    """IVF query path: corpus vectors live in exactly one cell; each
    query probes its nprobe nearest cells and exact-cosine re-ranks
    the union — (query_id, neighbor_id, cos_sim, rank), same output
    contract as q_similarity_topk / q_similarity_ann.

    Scale notes: the corpus is scanned once to tag cells (narrow, no
    shuffle — the centroid matrix is broadcast inside the UDF); the
    bounded query set explodes to nprobe rows and broadcasts, so
    candidate generation is a map-side equi-join on `cell`. Cell
    population ~N/nlist bounds per-query candidate volume; nprobe/
    nlist is the recall dial, verified against brute force in tests.
    """
    # Zero-norm vectors have no cosine — excluded from index and
    # queries (same convention as the other similarity operators).
    nz = emb.filter(dot(F.col("embedding"), F.col("embedding")) > 0)
    corpus = nz.select(
        F.col("vec_id").alias("neighbor_id"), "embedding",
        _ivf_cells_udf(centroids, 1)("embedding")[0].alias("cell"))
    probe = _ivf_cells_udf(centroids, nprobe)
    queries = (nz.filter(F.col("vec_id") < n_query)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("qe"),
                       F.explode(probe("embedding")).alias("cell")))
    # A corpus vector sits in ONE cell, so a (query, neighbor) pair
    # meets at most once even across nprobe probes — no dedup needed.
    pairs = (F.broadcast(queries).join(corpus, "cell")
             .filter(F.col("neighbor_id") != F.col("query_id"))
             .select("query_id", "neighbor_id",
                     cosine(F.col("qe"), F.col("embedding")).alias("cos")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select("query_id", "neighbor_id",
                    dround(F.col("cos"), 6).alias("cos_sim"), "rank"))


# ---------------------------------------------------------------------------
# Duplicate-vector collapse — the identical-copy mitigation.
# ---------------------------------------------------------------------------
#
# SCALE.md's adversarial blow-up (identical vector copies per replica)
# measured SRP ANN growing near-linearly (exp 0.87): every copy lands
# in every bucket its twin occupies, so candidate generation degrades
# toward brute force inside the hit buckets. Real corpora ARE like
# this wherever exact re-posts/mirrors survive upstream dedup. The
# standard fix: search over DISTINCT vectors, then expand each
# retrieved vector into its member ids — candidate work scales with
# unique vectors, not copies, and the expansion is bounded by k.


def collapse_duplicate_vectors(emb: DataFrame) -> DataFrame:
    """(vec_id, embedding, members, n_members): one row per DISTINCT
    embedding array; vec_id is the min member id (the group rep),
    members the sorted id list sharing that exact vector. One
    hash-agg shuffle on the vector bytes; at 100 TB group on
    xxhash64(embedding-bytes) first and verify equality inside the
    bucket if vector payloads are too wide to shuffle as keys."""
    return (emb.groupBy("embedding")
            .agg(F.min("vec_id").alias("vec_id"),
                 F.sort_array(F.collect_list("vec_id")).alias("members"),
                 F.count(F.lit(1)).alias("n_members"))
            .select("vec_id", "embedding", "members", "n_members"))


def ann_topk_collapsed(emb: DataFrame, n_query: int = N_QUERY_VECS,
                       top_k: int = TOP_K) -> DataFrame:
    """SRP-LSH top-k over the duplicate-collapsed corpus, expanded
    back to per-id results — same output contract as q_similarity_ann
    (query_id, neighbor_id, cos_sim, rank), but index/candidate cost
    scales with UNIQUE vectors while answers still rank every copy.

    Exactness of the expansion: copies of one vector share its cosine
    and sit in one group, so expanding groups in (cos desc, id asc)
    order and re-ranking ids reproduces the uncollapsed ranking. The
    group cut keeps a group iff fewer than top_k + 1 member ids
    precede it (cumulative count), +1 because the query's own id is
    dropped post-expansion; distinct-vector cos ties at the cut
    boundary follow group-rep order (with continuous embeddings such
    cross-group exact-double ties don't occur in practice — the
    common tie source, identical vectors, is inside one group by
    construction).

    Scale notes: identical-copy mass multiplies bucket populations
    for the plain SRP path but leaves the collapsed path's candidate
    count unchanged; the expansion explode is bounded by ~(top_k+1)
    ids per kept group per query. Measured in SCALE.md (collapsed row
    of the similarity table)."""
    srp_keys = _srp_keys_udf()
    nz = emb.filter(dot(F.col("embedding"), F.col("embedding")) > 0)
    uniq = collapse_duplicate_vectors(nz)
    sig = (uniq.select("vec_id", "embedding", "members", "n_members",
                       F.posexplode(srp_keys("embedding"))
                        .alias("band", "key")))
    queries = (nz.filter(F.col("vec_id") < n_query)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("qe"),
                       F.posexplode(srp_keys("embedding"))
                        .alias("band", "key")))
    cand = (F.broadcast(queries)
            .join(sig, ["band", "key"])
            .select("query_id", "qe",
                    F.col("vec_id").alias("rep_id"),
                    "embedding", "members", "n_members")
            .dropDuplicates(["query_id", "rep_id"]))
    scored = cand.select(
        "query_id", "rep_id", "members", "n_members",
        cosine(F.col("qe"), F.col("embedding")).alias("cos"))
    wg = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("rep_id").asc())
    kept = (scored
            .withColumn(
                "prior_members",
                F.coalesce(
                    F.sum("n_members").over(
                        wg.rowsBetween(Window.unboundedPreceding, -1)),
                    F.lit(0)))
            .filter(F.col("prior_members") < top_k + 1))
    expanded = (kept
                .select("query_id", "cos",
                        F.explode("members").alias("neighbor_id"))
                .filter(F.col("neighbor_id") != F.col("query_id")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (expanded.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select("query_id", "neighbor_id",
                    dround(F.col("cos"), 6).alias("cos_sim"), "rank"))
