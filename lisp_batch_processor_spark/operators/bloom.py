"""DataFrame-native Bloom filter — broadcastable approximate
membership for incremental pipelines.

PySpark exposes no public Bloom filter builder (the JVM
`stat.bloomFilter` never crossed the Python bridge in 4.x), and the
driver-side sketch it would build is the wrong shape anyway: at
corpus scale the bitmap must be built BY the cluster, not collected
THROUGH the driver. Here the filter is an ordinary DataFrame —
``(word_idx int, bits long)``, one row per non-zero 64-bit word of
the bitmap — built with a single map-side-combined ``bit_or``
aggregation and probed with a broadcast equi-join. No UDFs, no
driver materialization, nothing leaves the JVM.

Why this matters at 100 TB: the most common incremental-ingest
question is "which of these batch keys are NOT already in the
corpus?" A plain left-anti join answers it exactly but shuffles the
batch against the FULL corpus key index on every batch. A Bloom
prefilter answers "definitely new" for the (typically dominant)
novel fraction using a structure of a few hundred MB per ~1e9 keys
(10 bits/key at 1% fpp) that is built once, persisted, and
broadcast — only the "maybe present" sliver (true dups + fpp
false positives) pays the exact anti-join. `incremental_append_bloom`
composes exactly that and returns bit-identical results to the plain
`sources.readers.incremental_append` (pinned by tests/test_bloom.py).

Hashing: double hashing g_i(x) = h1 + i*h2 (mod m) over two
xxhash64 words (Kirsch & Mitzenmacher: two base hashes suffice for
the classic fpp bound). All arithmetic is exact 64-bit with pmod,
so build and probe agree bit-for-bit on any partitioning.

Sizing: `bloom_parameters(n, fpp)` gives the textbook optimum
m = -n·ln p/ln²2, k = (m/n)·ln 2. A filter too big to broadcast as
one piece shards naturally: partition both sides by
``pmod(word_idx, S)`` and the probe join stays co-located — the
bitmap is just rows.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_parameters(expected_items: int, fpp: float = 0.01
                     ) -> tuple[int, int]:
    """Optimal (num_bits, num_hashes) for `expected_items` keys at
    false-positive rate `fpp`. num_bits is rounded up to a multiple
    of 64 (whole words); num_hashes at least 1."""
    if expected_items <= 0:
        raise ValueError(f"expected_items must be > 0, got {expected_items}")
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = max(64, -expected_items * math.log(fpp) / (math.log(2) ** 2))
    m = int(math.ceil(m / 64.0) * 64)
    k = max(1, round(m / expected_items * math.log(2)))
    return m, k


def _positions(key_cols: list[F.Column], num_bits: int,
               num_hashes: int) -> F.Column:
    """Array of `num_hashes` bit positions for one key via double
    hashing. Both base hashes are reduced mod m BEFORE combining so
    h1m + i*h2m stays far inside long range under ANSI arithmetic
    (i ≤ k ~ 30, m ≤ 2^40 ⇒ products ≤ 2^45). h2 is forced odd and m
    is a multiple of 64 (even), so h2m stays odd — never zero, never
    collapsing the probe sequence to one cell."""
    if num_bits < 64 or num_bits % 64:
        raise ValueError(
            f"num_bits must be a positive multiple of 64 "
            f"(bloom_parameters guarantees it), got {num_bits}")
    if num_hashes < 1:
        raise ValueError(f"num_hashes must be >= 1, got {num_hashes}")
    h1m = F.pmod(F.xxhash64(*key_cols), F.lit(num_bits))
    h2m = F.pmod(
        F.xxhash64(F.lit(0x9E3779B9), *key_cols).bitwiseOR(F.lit(1)),
        F.lit(num_bits))
    return F.array(*[
        F.pmod(h1m + F.lit(i) * h2m, F.lit(num_bits))
        for i in range(num_hashes)
    ])


def _key_cols(key: str | Sequence[str]) -> list[str]:
    return [key] if isinstance(key, str) else list(key)


def bloom_build(df: DataFrame, key: str | Sequence[str],
                num_bits: int, num_hashes: int) -> DataFrame:
    """Build the filter over `df`'s key column(s): explode each key's
    probe positions into (word_idx, single-bit mask) and OR them per
    word. The groupBy is map-side combined, so the shuffle carries at
    most min(rows·k, m/64) partially-ORed words per input partition;
    the result has one row per NON-ZERO word (sparse when oversized).

    Persist the result and `bloom_union` new batches into it — OR is
    associative, so the filter is append-forever.
    """
    cols = _key_cols(key)
    pos = F.explode(
        _positions([F.col(c) for c in cols], num_bits, num_hashes)
    ).alias("pos")
    return (df.select(pos)
            .select(
                (F.col("pos") / 64).cast("int").alias("word_idx"),
                # F.shiftleft only accepts a literal shift; the SQL
                # form takes a column.
                F.expr("shiftleft(CAST(1 AS BIGINT), "
                       "CAST(pmod(pos, 64) AS INT))").alias("mask"))
            .groupBy("word_idx")
            .agg(F.bit_or("mask").alias("bits")))


def bloom_union(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR two filters built with identical (num_bits, num_hashes) —
    the incremental-append path for the persisted corpus filter."""
    return (a.unionByName(b)
            .groupBy("word_idx")
            .agg(F.bit_or("bits").alias("bits")))


def bloom_probe(batch: DataFrame, bloom: DataFrame,
                key: str | Sequence[str], num_bits: int, num_hashes: int,
                flag_col: str = "maybe_present") -> DataFrame:
    """`batch` plus a boolean `flag_col`: False means DEFINITELY not
    in the filtered set (Bloom filters have no false negatives);
    True means present-or-false-positive at the filter's fpp.

    Plan shape: distinct batch keys explode to k probe rows, joined
    against the (broadcast) word map; a key is "maybe" iff every
    probe found its bit set — `min(hit)` over k rows. The word map is
    ≤ m/64 rows regardless of corpus size, which is what makes this
    the cheap side of the join at any scale.
    """
    cols = _key_cols(key)
    probes = (batch.select(*cols).distinct()
              .withColumn("pos", F.explode(_positions(
                  [F.col(c) for c in cols], num_bits, num_hashes)))
              .withColumn("word_idx", (F.col("pos") / 64).cast("int"))
              .withColumn("mask", F.expr(
                  "shiftleft(CAST(1 AS BIGINT), "
                  "CAST(pmod(pos, 64) AS INT))")))
    hits = (probes.join(F.broadcast(bloom), "word_idx", "left")
            .withColumn("hit",
                        F.coalesce(F.col("bits"), F.lit(0))
                        .bitwiseAND(F.col("mask")) != 0)
            .groupBy(*cols)
            .agg(F.min("hit").alias(flag_col)))
    # Join the flag back NULL-SAFELY: xxhash64 hashes NULL keys to a
    # deterministic position set (build and probe agree), and groupBy
    # keeps NULL as a group — but a name-list equi-join would never
    # match the NULL-key group back to its batch rows, leaving their
    # flag NULL (and silently dropping them from BOTH branches of
    # incremental_append_bloom, breaking the bit-identical contract
    # with the plain anti-join). Rename the grouped keys so the
    # eqNullSafe condition is unambiguous despite shared lineage.
    hits_r = hits.select(
        *[F.col(c).alias(f"_bp_{c}") for c in cols], flag_col)
    cond = [F.col(c).eqNullSafe(F.col(f"_bp_{c}")) for c in cols]
    return (batch.join(hits_r, cond, "left")
            .drop(*[f"_bp_{c}" for c in cols]))


def prefilter_members(batch: DataFrame, bloom: DataFrame,
                      key: str | Sequence[str],
                      num_bits: int, num_hashes: int) -> DataFrame:
    """Keep only batch rows whose key MIGHT be in the filtered set —
    the prefilter shape for joins whose right side is a huge
    persisted index. No false negatives ⇒ dropping the "definitely
    absent" rows never changes the subsequent equi-join's result;
    it only shrinks the probe side to (true matches + fpp).

    `dedup.incremental_near_dups` accepts a filter built over the
    corpus LSH index's (band_idx, band_key) exactly this way."""
    flag = "_bloom_maybe"
    return (bloom_probe(batch, bloom, key, num_bits, num_hashes, flag)
            .filter(F.col(flag)).drop(flag))


def incremental_append_bloom(existing: DataFrame, batch: DataFrame,
                             key: str | Sequence[str],
                             bloom: DataFrame,
                             num_bits: int, num_hashes: int) -> DataFrame:
    """`sources.readers.incremental_append` with a Bloom prefilter:
    batch keys the corpus filter rejects skip the exact anti-join
    entirely (no false negatives ⇒ they are provably new); only the
    "maybe present" sliver joins against `existing`'s key index.
    Result is bit-identical to the plain anti-join + union (pinned by
    tests/test_bloom.py::test_incremental_append_bloom_equals_plain).

    `bloom` must cover every key in `existing` (build once with
    `bloom_build`, extend per batch with `bloom_union`); pass the
    persisted frame so the filter is not rebuilt per batch.
    """
    keys = _key_cols(key)
    flagged = (bloom_probe(batch.dropDuplicates(keys), bloom, keys,
                           num_bits, num_hashes, flag_col="_maybe")
               # Feeds both branches below; without it the probe
               # join runs twice.
               .localCheckpoint(eager=False))
    definitely_new = flagged.filter(~F.col("_maybe")).drop("_maybe")
    maybe = flagged.filter(F.col("_maybe")).drop("_maybe")
    confirmed_new = maybe.join(existing.select(*keys), keys, "left_anti")
    return existing.unionByName(definitely_new.unionByName(confirmed_new))
