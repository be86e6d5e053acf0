"""Training-shard writer/reader (sources/shards.py): arithmetic shard
boundaries partition the key space disjointly, each shard dir holds
exactly one key-sorted file, the read-back manifest accounts for
every row and token, subset reads prune at the scan, verification
catches a rewritten shard, and the whole artifact is bit-deterministic
across reruns."""

from __future__ import annotations

import glob
import json

import pytest
from pyspark.sql import functions as F

from lisp_batch_processor_spark.operators.training import (
    shuffle_deterministic)
from lisp_batch_processor_spark.sources.shards import (
    KEY_BITS, read_manifest, read_training_shards, shard_of,
    write_training_shards)

N_DOCS = 120
N_SHARDS = 8


def ordered(spark):
    """A train-order-shaped frame: (pack_id, pos, doc_id, n_tokens,
    text) through shuffle_deterministic at pack grain."""
    rows = [(i // 2, i % 2, i, 10 + i % 7, f"doc {i} body")
            for i in range(N_DOCS)]
    df = spark.createDataFrame(
        rows, "pack_id bigint, pos int, doc_id bigint, "
              "n_tokens int, text string")
    return shuffle_deterministic(df, salt="shards-v1", id_col="pack_id",
                                 order_within=("pos",))


@pytest.fixture(scope="module")
def written(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("sh") / "epoch0")
    m = write_training_shards(ordered(spark), p, num_shards=N_SHARDS)
    return p, m


def test_manifest_accounts_for_every_row_and_token(spark, written):
    p, m = written
    assert m["rows"] == N_DOCS
    assert sum(s["rows"] for s in m["shards"]) == N_DOCS
    assert m["tokens"] == sum(10 + i % 7 for i in range(N_DOCS))
    assert m["num_shards"] == N_SHARDS
    with open(f"{p}/_manifest.json") as f:
        assert json.load(f) == m


def test_shard_key_ranges_are_disjoint_and_arithmetic(written):
    _, m = written
    stride = -(-(1 << KEY_BITS) // N_SHARDS)
    prev_max = -1
    for s in sorted(m["shards"], key=lambda s: s["shard"]):
        lo, hi = s["shard"] * stride, (s["shard"] + 1) * stride
        assert lo <= s["key_min"] <= s["key_max"] < hi
        assert s["key_min"] > prev_max
        prev_max = s["key_max"]


def test_one_key_sorted_file_per_shard(spark, written):
    p, m = written
    for s in m["shards"]:
        files = glob.glob(f"{p}/shard={s['shard']}/*.parquet")
        assert len(files) == 1
        keys = [r[0] for r in
                spark.read.parquet(files[0]).select("shuffle_key")
                .collect()]
        assert keys == sorted(keys)


def test_full_read_is_the_global_training_order(spark, written):
    p, _ = written
    got = read_training_shards(spark, p).select(
        "shuffle_key", "doc_id").collect()
    want = sorted(((r["shuffle_key"], r["doc_id"])
                   for r in ordered(spark).collect()))
    assert [(r["shuffle_key"], r["doc_id"]) for r in got] == want


def test_subset_read_prunes_to_the_requested_shards(spark, written):
    p, m = written
    pick = [m["shards"][0]["shard"], m["shards"][-1]["shard"]]
    df = read_training_shards(spark, p, shard_ids=pick)
    assert df.count() == sum(s["rows"] for s in m["shards"]
                             if s["shard"] in pick)
    # Partition pruning reaches the scan: only the two shard dirs.
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partition filters: [isnotnull(shard" in plan.lower() \
        or "shard#" in plan  # AQE formats vary; count check above is
    #                          the behavioral pin
    with pytest.raises(ValueError, match="unknown shard"):
        read_training_shards(spark, p, shard_ids=[999])


def test_verify_passes_clean_and_catches_a_rewritten_shard(
        spark, tmp_path):
    p = str(tmp_path / "ep")
    m = write_training_shards(ordered(spark), p, num_shards=4)
    read_training_shards(spark, p, verify=True).count()
    victim = m["shards"][1]
    # Rewrite the shard dir with one row missing — counts AND xor
    # both shift; verify must refuse.
    sid = victim["shard"]
    rows = spark.read.parquet(f"{p}/shard={sid}")
    rows.limit(victim["rows"] - 1).write.mode("overwrite").parquet(
        f"{p}/shard={sid}")
    with pytest.raises(ValueError, match=f"shard {sid} fails"):
        read_training_shards(spark, p, verify=True).count()
    # Untouched shards still verify individually.
    ok = [s["shard"] for s in m["shards"] if s["shard"] != sid]
    read_training_shards(spark, p, shard_ids=ok, verify=True).count()


def test_rerun_is_bit_deterministic(spark, tmp_path):
    m1 = write_training_shards(ordered(spark), str(tmp_path / "a"),
                               num_shards=N_SHARDS)
    m2 = write_training_shards(
        ordered(spark).repartition(13), str(tmp_path / "b"),
        num_shards=N_SHARDS)
    assert m1 == m2


def test_shard_of_is_exact_above_double_precision(spark):
    # A key with more significant bits than a double mantissa: float
    # division would land it one shard off at the boundary.
    stride = -(-(1 << KEY_BITS) // 7)
    key = 3 * stride  # exactly the first key of shard 3
    df = spark.range(1).select(F.lit(key).alias("k"))
    assert df.select(shard_of("k", 7)).first()[0] == 3
    df2 = spark.range(1).select(F.lit(key - 1).alias("k"))
    assert df2.select(shard_of("k", 7)).first()[0] == 2


def test_shards_consume_a_mixed_assembly_order(spark, tmp_path):
    """End-to-end handoff: assemble_corpus (mixed) -> 08_train_order
    -> write_training_shards; every (copy) row survives with its
    epoch column, and concatenating shards in manifest order is the
    training order."""
    from lisp_batch_processor_spark.pipelines import assemble_corpus

    def text(i):
        return "\n".join(" ".join(f"c{k} u{i}x{j}x{k}" for k in range(6))
                         for j in range(2))

    docs = spark.createDataFrame(
        [(i, f"https://p{i}.site{'a' if i < 3 else 'b'}.com/d", text(i))
         for i in range(1, 9)],
        "doc_id bigint, url string, text string")
    evals = spark.createDataFrame([("benchmark words only",)],
                                  "text string")
    out = assemble_corpus(
        spark, docs, evals, str(tmp_path / "w"),
        splits=(("train", 1.0),), pack_budget=48, pack_buckets=2,
        mix_weights={"sitea.com": 0.5, "siteb.com": 0.5},
        mix_token_budget=192, salt="sh-e2e")
    order = spark.read.parquet(out.train_order_path)
    p = str(tmp_path / "shards")
    m = write_training_shards(order, p, num_shards=4)
    assert m["rows"] == out.stage("shuffle").rows_out
    back = read_training_shards(spark, p, verify=True)
    assert "epoch" in back.columns
    assert back.count() == m["rows"]
