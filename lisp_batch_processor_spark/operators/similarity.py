"""Similarity search over the `embeddings` table — north-star ANN
operators (SURVEY.md §2.C q_similarity_topk): exact brute-force
cosine top-k as the correctness baseline, and a deterministic
signed-random-projection (SRP) LSH variant as the 100 TB scale path.
All vector math is JVM-side (functions/vectors.py).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lisp_batch_processor_spark.catalog import load
from lisp_batch_processor_spark.functions.vectors import cosine, dot, unit
from lisp_batch_processor_spark.registry import query

N_QUERY_VECS = 10
TOP_K = 5

_Q_SIMILARITY_TOPK_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id < {N_QUERY_VECS}
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
), ranked AS (
  SELECT query_id, neighbor_id, ROUND(cos, 6) AS cos_sim,
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
    queries = (emb.filter(F.col("vec_id") < N_QUERY_VECS)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("qe")))
    corpus = emb.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    pairs = (F.broadcast(queries).crossJoin(corpus)
             .filter(F.col("neighbor_id") != F.col("query_id"))
             .select("query_id", "neighbor_id",
                     cosine(F.col("qe"), F.col("embedding")).alias("cos")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "neighbor_id",
                    F.round("cos", 6).alias("cos_sim"), "rank"))


# ---------------------------------------------------------------------------
# Banded SRP-LSH approximate nearest neighbors — the scale path.
# ---------------------------------------------------------------------------

N_BANDS = 8          # independent hash tables (OR-amplification: recall)
BITS_PER_BAND = 4    # hyperplanes per table (AND-amplification: precision)
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


def srp_bands(vec_col: F.Column) -> F.Column:
    """array<struct<band:int, key:int>> — one bucket key per band.

    Each band packs BITS_PER_BAND sign(plane·v) bits; a candidate
    pair only needs to collide in ONE band (OR over bands), which is
    what keeps recall high while each band stays selective.
    """
    planes = _srp_planes()
    bands = []
    for b in range(N_BANDS):
        key = F.lit(0)
        for j in range(BITS_PER_BAND):
            plane = planes[b * BITS_PER_BAND + j]
            d = dot(vec_col, F.array(*[F.lit(x) for x in plane]))
            key = key + F.shiftleft(
                F.when(d > 0, F.lit(1)).otherwise(F.lit(0)), j)
        bands.append(F.struct(F.lit(b).alias("band"), key.alias("key")))
    return F.array(*bands)


@query("q_similarity_ann")
def q_similarity_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: banded SRP-LSH (8 tables x 4 deterministic
    hyperplanes), exact cosine re-rank over the union of colliding
    candidates. rows-only check; recall vs the brute-force baseline
    is property-tested in tests/test_similarity.py.

    Scale notes: the bounded query set (exploded to 8 band keys) is
    broadcast, so candidate generation is a map-side equi-join on
    (band, key) — the corpus is scanned once, never shuffled; the
    dedup + per-query top-k shuffles only the candidate set, which is
    ~N_BANDS/2^BITS_PER_BAND of the corpus per query. Tune
    BITS_PER_BAND ~ log2(corpus/bucket_target) as the corpus grows;
    the band count, not the corpus, bounds recall.
    """
    emb = load(spark, sf_dir, "embeddings")
    sig = (emb.select("vec_id", "embedding",
                      F.explode(srp_bands(F.col("embedding"))).alias("bk"))
           .select("vec_id", "embedding",
                   F.col("bk.band").alias("band"), F.col("bk.key").alias("key")))
    queries = (sig.filter(F.col("vec_id") < N_QUERY_VECS)
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
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "neighbor_id",
                    F.round("cos", 6).alias("cos_sim"), "rank"))
