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
    LongType, StructField, StructType,
)

from lisp_batch_processor_spark.operators.text import tokens_col

# Buckets for all hash->fraction decisions: fine enough that a 0.01%
# split weight is representable, coarse enough that thresholds are
# exact integers (no float boundary ambiguity cross-engine).
SPLIT_BUCKETS = 100_000


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
    hexs = F.md5(F.encode(F.concat_ws(":", F.lit(salt),
                                      c.cast("string")), "UTF-8"))
    word = F.conv(F.substring(hexs, 1, 15), 16, 10).cast("bigint")
    return F.pmod(word, F.lit(n_buckets))


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
    # Integer thresholds; rate 1.0 keeps every bucket.
    thr = F.create_map(*[x for d, r in sorted(rates.items())
                         for x in (F.lit(d),
                                   F.lit(int(round(r * SPLIT_BUCKETS))))])
    b = hash_bucket(id_col, salt)
    return (docs
            .withColumn("_mix_thr", thr[F.col(domain_col)])
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
# PII redaction — JVM-side regexp chain.
# ---------------------------------------------------------------------------

# Order matters: IPv4 before bare digit runs, email first (an email
# can contain digit runs). Patterns are deliberately restricted to a
# regex subset with identical semantics in Java regex, Python `re`,
# and RE2-style engines (no backrefs, no lookaround).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{9,19}\b", "<ID>"),
)


def redact_pii(text: Column | str = "text") -> Column:
    """Chain of regexp_replace calls masking emails, IPv4 addresses,
    and long digit runs (SSN/card/phone-shaped) — the standard
    pre-training scrub pass.

    Scale notes: pure JVM expression chain inside whole-stage
    codegen; no Python in the path. Differential oracle: the same
    patterns via Python `re.sub` (tests/test_training.py) — kept to
    the engine-portable regex subset so both agree byte-for-byte.
    """
    c = F.col(text) if isinstance(text, str) else text
    for pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c
