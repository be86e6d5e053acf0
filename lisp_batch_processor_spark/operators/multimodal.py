"""Multimodal columns — opaque binary payloads with typed metadata,
plus vector-column transforms (SURVEY.md §2.C q_multimodal_cols,
north star). The reference's whole data model is "opaque element
processed by an external tool" (`Batch Processor.py:67, 340-342`);
here that becomes BinaryType columns flowing through Arrow-batched
mapInPandas decoders.

The container has no image/audio codecs, so `decode_features` is a
deterministic fake decoder (byte-histogram moments) behind the real
Spark plumbing — schema, batching, partitioning are all genuine; swap
the inner function for PIL/librosa in production.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lisp_batch_processor_spark.catalog import load
from lisp_batch_processor_spark.functions.numeric import dround, sql_dround
from lisp_batch_processor_spark.functions.vectors import l2_norm
from lisp_batch_processor_spark.registry import query

_SQL_L2 = ("sqrt(list_reduce(list_transform(generate_series(1, "
           "len(embedding)), i -> CAST(embedding[i] AS DOUBLE) "
           "* CAST(embedding[i] AS DOUBLE)), (x, y) -> x + y))")
_SQL_MEAN = ("list_reduce(list_transform(generate_series(1, "
             "len(embedding)), i -> CAST(embedding[i] AS DOUBLE)), "
             "(x, y) -> x + y) / len(embedding)")

_Q_MULTIMODAL_COLS_ORACLE = f"""
SELECT
  vec_id,
  label,
  CAST(len(embedding) AS INT) AS dim,
  {sql_dround(_SQL_L2, 6)} AS l2_norm,
  {sql_dround(_SQL_MEAN, 6)} AS mean_val,
  CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive,
  {sql_dround('CAST(embedding[1] AS DOUBLE)', 6)} AS first_val
FROM embeddings
"""


@query("q_multimodal_cols", oracle=_Q_MULTIMODAL_COLS_ORACLE)
def q_multimodal_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-column transforms with higher-order functions: carry an
    ArrayType(FloatType) column through per-row math (norm, mean,
    sign census) without ever leaving the JVM. Left-to-right folds
    keep even the floating outputs oracle-exact.

    Scale notes: map-only; fuses with the scan at any corpus size.
    """
    emb = load(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    sum_ = F.aggregate(e, F.lit(0.0), lambda acc, x: acc + x.cast("double"))
    return emb.select(
        "vec_id", "label",
        F.size(e).alias("dim"),
        dround(l2_norm(e), 6).alias("l2_norm"),
        dround(sum_ / F.size(e), 6).alias("mean_val"),
        F.size(F.filter(e, lambda x: x > 0)).alias("n_positive"),
        dround(F.element_at(e, 1).cast("double"), 6).alias("first_val"),
    )


# ---------------------------------------------------------------------------
# Binary modality pipeline: pack -> decode (stub) -> features.
# ---------------------------------------------------------------------------

FEATURE_DIM = 8

# Features are emitted as FLAT scalar columns f0..f7 (not one
# ArrayType column): downstream engines and the driver's
# canonicalizer treat fixed-width features as plain columns; the
# array packing, when needed, is one F.array(*cols) away.
_DECODE_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()),
     T.StructField("modality", T.StringType()),
     T.StructField("byte_len", T.IntegerType())]
    + [T.StructField(f"f{i}", T.DoubleType()) for i in range(FEATURE_DIM)]
)


def decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched fake decoder: real image/audio decode is
    unavailable in this container (no codecs installed), so features
    are deterministic byte-histogram moments. The mapInPandas batch
    shape, schema, and partitioning are the production article —
    replace the body with PIL.Image.open / soundfile.read in a real
    deployment (raise NotImplementedError there for codecs you don't
    ship).
    """
    import numpy as np

    for pdf in batches:
        feats = []
        for payload in pdf["payload"]:
            arr = np.frombuffer(bytes(payload), dtype=np.uint8)
            n = max(arr.size, 1)
            # 8 deterministic moments over byte-value buckets,
            # vectorized (the whole point of Arrow batches is that
            # the Python loop runs per ROW GROUP, not per byte).
            buckets = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM)
            feats.append([round(float(c) / n, 9) for c in buckets])
        out = pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "modality": pdf["modality"],
            "byte_len": pdf["byte_len"],
        })
        fmat = np.array(feats, dtype=float).reshape(len(feats), FEATURE_DIM)
        for i in range(FEATURE_DIM):
            out[f"f{i}"] = fmat[:, i]
        yield out


@query("q_multimodal_decode")
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary modality pipeline: pack text into a BinaryType
    payload with typed metadata (modality tag + byte length), run an
    Arrow-batched mapInPandas decoder, return fixed-width features as
    flat f0..f7 doubles. rows-only check (byte-level decode is not
    SQL-expressible); determinism is asserted in
    tests/test_multimodal.py.

    Scale notes: mapInPandas streams Arrow batches per partition —
    constant memory per task; the decode stage is embarrassingly
    parallel and scales linearly with executors.
    """
    docs = load(spark, sf_dir, "documents")
    packed = docs.select(
        "doc_id",
        F.lit("text/plain").alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
        F.octet_length(F.encode("text", "UTF-8")).alias("byte_len"),
    )
    return packed.mapInPandas(decode_features, schema=_DECODE_SCHEMA)


# ---------------------------------------------------------------------------
# Frame sampling: 1 -> N explosion over an opaque byte stream.
# ---------------------------------------------------------------------------

FRAME_SIZE = 128     # bytes per "frame" of the opaque payload
FRAME_STRIDE = 2     # keep every 2nd frame (temporal subsampling)

_FRAMES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_off", T.LongType()),
    T.StructField("frame_len", T.IntegerType()),
    T.StructField("frame_md5", T.StringType()),
])

_Q_MULTIMODAL_FRAMES_ORACLE = f"""
WITH f AS (
  SELECT doc_id, text, length(text) AS n,
    unnest(generate_series(0, CAST((length(text) - 1) // {FRAME_SIZE} AS INT),
                           {FRAME_STRIDE})) AS frame_idx
  FROM documents WHERE length(text) > 0
)
SELECT doc_id,
  CAST(frame_idx AS INT) AS frame_idx,
  CAST(frame_idx * {FRAME_SIZE} AS BIGINT) AS frame_off,
  CAST(LEAST({FRAME_SIZE}, n - frame_idx * {FRAME_SIZE}) AS INT) AS frame_len,
  md5(substr(text, frame_idx * {FRAME_SIZE} + 1, {FRAME_SIZE})) AS frame_md5
FROM f
"""


def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched frame sampler: slice the opaque payload into
    FRAME_SIZE-byte frames, keep every FRAME_STRIDE-th, fingerprint
    each — the 1->N video/audio frame-sample plumbing with a
    deterministic stand-in for the real decoder (swap the slicing for
    av.open/decord in production; the batch shape, explosion, and
    per-frame metadata schema are the production article).
    """
    import hashlib

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            data = bytes(payload)
            n = len(data)
            if n == 0:
                continue
            for i in range(0, (n - 1) // FRAME_SIZE + 1, FRAME_STRIDE):
                chunk = data[i * FRAME_SIZE:(i + 1) * FRAME_SIZE]
                rows.append((int(doc_id), i, i * FRAME_SIZE, len(chunk),
                             hashlib.md5(chunk).hexdigest()))
        if rows:
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_off",
                               "frame_len", "frame_md5"])


@query("q_multimodal_frames", oracle=_Q_MULTIMODAL_FRAMES_ORACLE)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over an opaque binary column: each payload
    explodes into every-2nd 128-byte frame with offset, length, and
    md5 fingerprint. Hash-checked: the fixture text is pure ASCII, so
    the oracle's character slicing equals the UDF's byte slicing and
    both engines' md5 agree.

    Scale notes: mapInPandas streams Arrow batches — the 1->N
    explosion happens executor-side with constant memory (frames of
    one batch at a time), never through a driver collect; output
    partitioning follows the input scan, so a downstream per-frame
    stage needs no shuffle.
    """
    docs = load(spark, sf_dir, "documents")
    packed = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return packed.mapInPandas(sample_frames, schema=_FRAMES_SCHEMA)
