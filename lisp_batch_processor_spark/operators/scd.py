"""Slowly-changing-dimension type-2 history maintenance, Spark-first.

Dimension tables change slowly (a supplier moves, a part is
re-priced) and analytics needs BOTH the current value and the value
as-of any past date. Without a transactional table format, Spark has
no MERGE — but SCD2 doesn't need one: each apply is a pure
DataFrame-to-DataFrame transform of (history, updates) → new
history, written via the usual staged overwrite (see
`sources.writers.compact` for the swap pattern). This is the
reference's save-with-verify sink discipline (R22) applied to
versioned rows instead of files.

History schema contract: the caller's key + attribute columns plus
  - ``effective_from`` timestamp — when this version became true
  - ``effective_to``   timestamp — when it stopped (NULL = open)
  - ``is_current``     boolean
As-of lookups are then a plain range predicate
(``effective_from <= t AND (effective_to IS NULL OR t <
effective_to)``) — the `q_join_range` family's shape — and the
current view is ``is_current`` (partition the table on it so the
common case prunes to the open slice).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_init(snapshot: DataFrame, effective_from,
              key: str | Sequence[str] = "key") -> DataFrame:
    """Open a fresh history from an initial snapshot: every row
    becomes the current version effective at `effective_from` (a
    timestamp literal or Column)."""
    eff = (effective_from if isinstance(effective_from, F.Column)
           else F.lit(effective_from).cast("timestamp"))
    return (snapshot
            .withColumn("effective_from", eff)
            .withColumn("effective_to",
                        F.lit(None).cast("timestamp"))
            .withColumn("is_current", F.lit(True)))


def scd2_apply(history: DataFrame, updates: DataFrame,
               key: str | Sequence[str],
               attrs: Sequence[str],
               effective_from: str = "effective_from") -> DataFrame:
    """Merge a batch of updates into an SCD2 history:

    - a key whose attrs CHANGED: the open row closes
      (``effective_to`` = the update's effective timestamp,
      ``is_current`` = false) and a new open row is inserted;
    - a key whose attrs are UNCHANGED: no-op (idempotent — replaying
      the same batch is a no-op, the retry story for a failed write);
    - a NEW key: inserted as an open row;
    - closed (historical) rows: untouched, by construction.

    ``updates`` carries key + attrs + a NON-NULL ``effective_from``
    (it doubles as the update-side presence marker). Attribute
    comparison is null-safe (NULL == NULL is "unchanged"). With
    multiple updates for one key in a batch, pass the LATEST per key
    (enforce upstream with a row_number window); this function
    asserts nothing about intra-batch ordering.

    Plan shape at scale: ONE equi-join of the open slice against the
    batch (both sides hashed on the key; the open slice is the only
    part of history read — partition the table by ``is_current`` so
    the closed majority is pruned at the scan), then unions. No
    window functions, no shuffle of the closed history.
    """
    keys = [key] if isinstance(key, str) else list(key)
    open_rows = history.filter(F.col("is_current"))
    closed_rows = history.filter(~F.col("is_current"))

    upd = updates.select(
        *[F.col(c).alias(f"_scd_{c}") for c in keys],
        *[F.col(c).alias(f"_scd_{c}") for c in attrs],
        F.col(effective_from).alias("_scd_eff"))
    cond = [open_rows[k].eqNullSafe(F.col(f"_scd_{k}")) for k in keys]
    # full-outer: open-only rows (no update) pass through; matched
    # rows split on changed; update-only rows are inserts. Presence
    # on each side is decided by never-null markers (is_current /
    # _scd_eff), not key nullability — eqNullSafe lets NULL keys
    # match their own update.
    joined = open_rows.join(upd, cond, "full_outer")
    marker_open = joined["is_current"].isNotNull()
    marker_upd = F.col("_scd_eff").isNotNull()

    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~open_rows[a].eqNullSafe(F.col(f"_scd_{a}"))

    hist_cols = list(history.columns)

    kept_open = (joined
                 .filter(marker_open & (~marker_upd | ~changed))
                 .select(*[open_rows[c] for c in hist_cols]))
    # Close changed rows with the update's timestamp as the end.
    now_closed = (joined
                  .filter(marker_open & marker_upd & changed)
                  .select(
                      *[open_rows[c] for c in hist_cols
                        if c not in ("effective_to", "is_current")],
                      F.col("_scd_eff").alias("effective_to"),
                      F.lit(False).alias("is_current"))
                  .select(*hist_cols))
    inserts = (joined
               .filter(marker_upd & (~marker_open | changed))
               .select(
                   *[F.col(f"_scd_{k}").alias(k) for k in keys],
                   *[F.col(f"_scd_{a}").alias(a) for a in attrs],
                   F.col("_scd_eff").alias("effective_from"),
                   F.lit(None).cast("timestamp").alias("effective_to"),
                   F.lit(True).alias("is_current"))
               .select(*hist_cols))
    return (closed_rows
            .unionByName(kept_open)
            .unionByName(now_closed)
            .unionByName(inserts))


def scd2_as_of(history: DataFrame, at) -> DataFrame:
    """The dimension as it was at timestamp `at`: one row per key
    that existed then — the range-predicate read the history layout
    is designed for."""
    t = at if isinstance(at, F.Column) else F.lit(at).cast("timestamp")
    return (history
            .filter((F.col("effective_from") <= t)
                    & (F.col("effective_to").isNull()
                       | (t < F.col("effective_to"))))
            .drop("effective_to", "is_current"))


def scd2_stream_apply(update_stream: DataFrame, history_path: str,
                      key: str | Sequence[str],
                      attrs: Sequence[str],
                      effective_from: str = "effective_from"):
    """Streaming dimension maintenance: each micro-batch of updates
    merges into the PERSISTED SCD2 history at ``history_path`` via
    :func:`scd2_apply`, written with the staged-swap discipline (the
    `sources.writers.compact` pattern): the new history materializes
    to a sibling temp dir while the old one is still readable, then
    swaps in atomically — a failed epoch leaves the previous history
    intact, and `scd2_apply`'s idempotent no-op on replayed batches
    makes checkpointed epoch re-delivery safe.

    The per-epoch work item IS the batch operator, so batch and
    streaming cannot drift (same contract as
    streaming_near_dup_ingest / streaming_line_dedup_ingest). With
    multiple updates for one key in one micro-batch, the LATEST per
    key (by ``effective_from``, ties by attrs) is applied — a batch
    is one merge step, matching scd2_apply's documented contract.

    Returns the DataStreamWriter (caller picks trigger/start and a
    checkpointLocation for exactly-once epoch replay).

    Scale notes: per epoch this is one open-slice equi-join plus a
    rewrite of the history — partition the persisted table by
    ``is_current`` so the closed majority is read and rewritten
    only as pass-through file copies... or, for very large
    dimensions, keep the closed slice in a separate append-only
    path and swap only the open slice (same operators, two paths).
    """
    from pyspark.sql import Window

    keys = [key] if isinstance(key, str) else list(key)

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        # Latest update per key within the micro-batch.
        w = Window.partitionBy(*keys).orderBy(
            F.col(effective_from).desc(),
            *[F.col(a).desc_nulls_last() for a in attrs])
        latest = (batch_df
                  .withColumn("_scd_rn", F.row_number().over(w))
                  .filter(F.col("_scd_rn") == 1).drop("_scd_rn"))
        history = spark.read.parquet(history_path)
        merged = scd2_apply(history, latest, key=keys, attrs=attrs,
                            effective_from=effective_from)
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        jpath = jvm.org.apache.hadoop.fs.Path(history_path)
        fs = jpath.getFileSystem(conf)
        tmp = history_path.rstrip("/") + "._merging"
        merged.write.mode("overwrite").parquet(tmp)
        fs.delete(jpath, True)
        fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), jpath)

    return update_stream.writeStream.foreachBatch(_process)
