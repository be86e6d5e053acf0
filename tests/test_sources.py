"""Sources/sinks: directory scan with glob, path-list ingest,
dedup-on-insert append, partitioned write + partition pruning."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lisp_batch_processor_spark.plans import (
    assert_no_cartesian,
    assert_pushed_filters,
    assert_read_schema_pruned,
    physical_plan,
)
from lisp_batch_processor_spark.sources import (
    incremental_append,
    read_path_list,
    scan_directory,
    write_partitioned,
)


def test_scan_directory_glob(spark, sf_dir):
    df = scan_directory(spark, sf_dir, glob="region.parquet")
    assert df.count() == 5
    both = scan_directory(spark, sf_dir, glob="{region,nation}.parquet")
    # region and nation schemas differ; recursive listing still finds
    # only the globbed files (here: schema comes from one of them).
    assert "region.parquet" in "".join(
        r[0] for r in both.select(F.input_file_name()).distinct().collect()) \
        or both.count() > 0


def test_read_path_list(spark, sf_dir):
    df = read_path_list(
        spark, [f"{sf_dir}/region.parquet", f"{sf_dir}/region.parquet"])
    # Same file twice -> rows duplicate (list semantics, no implicit dedup).
    assert df.count() == 10


def test_incremental_append_dedups_on_insert(spark):
    existing = spark.createDataFrame(
        [(1, "a"), (2, "b")], ["id", "val"])
    batch = spark.createDataFrame(
        [(2, "DUP"), (3, "c"), (3, "c2"), (4, "d")], ["id", "val"])
    out = incremental_append(existing, batch, "id").collect()
    ids = sorted(r.id for r in out)
    assert ids == [1, 2, 3, 4]
    # The existing row wins over the incoming duplicate.
    assert {r.val for r in out if r.id == 2} == {"b"}


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    out = os.path.join(str(tmp_path), "orders_by_status")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_partitioned(orders, out, partition_by=["o_orderstatus"])
    # Hive-style layout on disk.
    assert any(d.startswith("o_orderstatus=") for d in os.listdir(out))
    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    plan = physical_plan(back)
    assert "PartitionFilters" in plan
    got = back.count()
    want = orders.filter(F.col("o_orderstatus") == "F").count()
    assert got == want


def test_query_plans_are_scale_safe(spark, sf_dir):
    """Key headline queries: filters pushed, columns pruned, no
    cartesian/BNLJ anywhere."""
    from lisp_batch_processor_spark.operators.relational import (
        q_agg_groupby, q_join_inner)
    from lisp_batch_processor_spark.operators.tpch import q_tpch_q3

    q1 = q_agg_groupby(spark, sf_dir)
    assert_pushed_filters(q1, "l_shipdate")
    assert_no_cartesian(q1)
    # Q1 touches 7 of lineitem's 11 columns.
    assert_read_schema_pruned(q1, "lineitem.parquet", 7)

    j = q_join_inner(spark, sf_dir)
    assert_pushed_filters(j, "o_orderdate")
    assert_no_cartesian(j)
    assert_read_schema_pruned(j, "lineitem.parquet", 3)

    q3 = q_tpch_q3(spark, sf_dir)
    assert_pushed_filters(q3, "c_mktsegment", "l_shipdate")
    assert_no_cartesian(q3)
    assert_read_schema_pruned(q3, "customer.parquet", 2)


def test_csv_json_roundtrip(spark, sf_dir, tmp_path):
    """The generic fmt parameter covers csv/json sources end-to-end."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    csv_dir = os.path.join(str(tmp_path), "nation_csv")
    json_dir = os.path.join(str(tmp_path), "nation_json")
    nation.write.option("header", True).csv(csv_dir)
    nation.write.json(json_dir)

    csv_back = (spark.read.format("csv")
                .option("header", True).schema(nation.schema).load(csv_dir))
    json_back = scan_directory(spark, json_dir, fmt="json",
                               glob="*.json", schema=nation.schema)
    want = sorted(map(tuple, nation.collect()))
    assert sorted(map(tuple, csv_back.collect())) == want
    assert sorted(map(tuple, json_back.collect())) == want


def test_bucketed_tables_join_without_shuffle(spark, sf_dir):
    """The write_bucketed contract: two tables bucketed on the same
    key and count sort-merge-join with NO exchange on either side —
    the layout that converts a recurring 100 TB join's shuffle into a
    local zip of bucket files. Verified on the physical plan, not
    argued: the only Exchange allowed in the plan is the one above
    the join (for the final agg), never between scan and join.
    """
    from lisp_batch_processor_spark.sources import write_bucketed

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    try:
        write_bucketed(orders, "t_orders_b", ["o_orderkey"], 4)
        write_bucketed(lineitem, "t_lineitem_b", ["l_orderkey"], 4)
        # Disable broadcast so the join strategy under test is SMJ.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = (spark.table("t_lineitem_b")
             .join(spark.table("t_orders_b"),
                   F.col("l_orderkey") == F.col("o_orderkey"))
             .select("l_orderkey", "o_orderdate", "l_quantity"))
        plan = physical_plan(j)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # bucket layout reused
        assert j.count() == lineitem.count()

        # Control: the same join on plain parquet DOES shuffle, so
        # the assertion above is meaningful.
        plain = lineitem.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey"))
        assert "Exchange" in physical_plan(plain)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_compact_reduces_files_and_preserves_rows(spark, tmp_path):
    from lisp_batch_processor_spark.sources.writers import compact

    path = str(tmp_path / "frag")
    src = spark.range(0, 10000).select(
        F.col("id"), (F.col("id") * 3).alias("v"))
    # Fragment: 64 files for ~10k rows.
    src.repartition(64).write.parquet(path)
    n_before = len([f for f in os.listdir(path)
                    if f.startswith("part-")])
    assert n_before == 64

    want = {(r.id, r.v) for r in src.collect()}
    n_files = compact(spark, path, target_file_bytes=1 << 30)
    assert n_files == 1
    n_after = len([f for f in os.listdir(path)
                   if f.startswith("part-")])
    assert n_after == 1
    got = {(r.id, r.v) for r in spark.read.parquet(path).collect()}
    assert got == want
    from lisp_batch_processor_spark.sources.writers import (
        backup_path, staging_path)
    assert not os.path.exists(staging_path(path))
    assert not os.path.exists(backup_path(path))

    # A small target splits the rewrite into multiple files.
    src.repartition(32).write.mode("overwrite").parquet(path)
    size = sum(os.path.getsize(os.path.join(path, f))
               for f in os.listdir(path) if f.startswith("part-"))
    n_files = compact(spark, path, target_file_bytes=max(size // 4, 1))
    assert n_files >= 2
    got = {(r.id, r.v) for r in spark.read.parquet(path).collect()}
    assert got == want


def test_staged_swap_crash_windows_recoverable(spark, tmp_path):
    """Kill the swap between each pair of steps: a complete copy must
    be readable from either the canonical or the backup path, and
    recover_swap must restore the canonical path (the pre-r5 order —
    delete dest, then rename tmp in — had a window with NOTHING at
    the canonical path)."""
    import shutil

    from lisp_batch_processor_spark.sources.writers import (
        backup_path, recover_swap, staged_swap, staging_path)

    dest = str(tmp_path / "ds")
    old_rows = spark.range(0, 100).select(F.col("id"))
    new_rows = spark.range(100, 250).select(F.col("id"))
    old_rows.write.parquet(dest)

    # Window A: crash after rename-aside, before rename-in — dest is
    # missing but the backup holds the complete previous copy.
    new_rows.write.parquet(staging_path(dest))
    os.rename(dest, backup_path(dest))
    assert spark.read.parquet(backup_path(dest)).count() == 100
    recover_swap(spark, dest)
    assert spark.read.parquet(dest).count() == 100
    assert not os.path.exists(backup_path(dest))
    shutil.rmtree(staging_path(dest))

    # Window B: crash after rename-in, before backup delete — dest
    # already holds the NEW copy; recover must drop the stale backup,
    # not resurrect it.
    new_rows.write.parquet(staging_path(dest))
    os.rename(dest, backup_path(dest))
    os.rename(staging_path(dest), dest)
    assert spark.read.parquet(dest).count() == 150
    recover_swap(spark, dest)
    assert spark.read.parquet(dest).count() == 150
    assert not os.path.exists(backup_path(dest))

    # The full swap, uninterrupted, converges to the staged copy
    # with no hidden siblings left behind.
    older = spark.read.parquet(dest)
    spark.range(500, 520).write.parquet(staging_path(dest))
    older.count()  # materialize nothing; just assert readable before
    staged_swap(spark, staging_path(dest), dest)
    assert spark.read.parquet(dest).count() == 20
    assert not os.path.exists(staging_path(dest))
    assert not os.path.exists(backup_path(dest))


def test_staging_dir_hidden_from_table_root_readers(spark, tmp_path):
    """In-flight compaction output must be invisible to readers of
    the TABLE ROOT while a partition directory is being compacted —
    the staging name is dot-prefixed, so Spark's file listing skips
    it and partition discovery never sees a malformed value."""
    from lisp_batch_processor_spark.sources.writers import staging_path

    root = str(tmp_path / "tbl")
    df = spark.range(0, 200).select(
        (F.col("id") % 2).cast("string").alias("part"), F.col("id"))
    df.write.partitionBy("part").parquet(root)
    part_dir = os.path.join(root, "part=0")

    # Simulate an in-flight compact of partition part=0: staged data
    # exists as a sibling inside the table root.
    staged = staging_path(part_dir)
    spark.read.parquet(part_dir).write.parquet(staged)
    assert os.path.basename(staged).startswith("._")
    assert spark.read.parquet(root).count() == 200  # not 300
    parts = {r.part for r in
             spark.read.parquet(root).select("part").distinct().collect()}
    assert parts == {0, 1}  # discovery re-infers the value type


def test_zorder_write_clusters_both_dimensions(spark, tmp_path):
    """zorder_write must give every output file a small bounding box
    in BOTH columns (the data-skipping contract), where a plain
    one-column range layout only bounds the sort column; and it must
    preserve rows exactly."""
    import glob

    from lisp_batch_processor_spark.sources.writers import (
        morton_interleave, zorder_write)

    n = 20_000
    df = spark.range(n).select(
        ((F.col("id") * 2654435761) % n).alias("x"),
        ((F.col("id") * 40503) % n).alias("y"),
        F.col("id"))

    zpath = os.path.join(str(tmp_path), "zorder")
    spath = os.path.join(str(tmp_path), "xsorted")
    zorder_write(df, zpath, ["x", "y"], n_files=16)
    df.repartitionByRange(16, "x").write.parquet(spath)

    def boxes(path):
        out = []
        for f in sorted(glob.glob(os.path.join(path, "part-*"))):
            r = (spark.read.parquet(f)
                 .agg(F.min("x"), F.max("x"), F.min("y"), F.max("y"))
                 .collect()[0])
            out.append((r[1] - r[0], r[3] - r[2]))
        return out

    zb, sb = boxes(zpath), boxes(spath)
    assert len(zb) == 16
    z_x = sum(w for w, _ in zb) / len(zb)
    z_y = sum(h for _, h in zb) / len(zb)
    s_y = sum(h for _, h in sb) / len(sb)
    # Z-order bounds BOTH dims (4x4 grid of the space -> extents
    # ~n/4; allow slack for curve boundaries)...
    assert z_x <= 0.45 * n and z_y <= 0.45 * n, (z_x, z_y)
    # ... while the x-sorted layout leaves y unclustered.
    assert s_y >= 0.9 * n

    # A point predicate on EITHER column touches a strict file
    # subset under z-order (file pruning via footer min/max).
    x0, y0 = 137, 4242
    fx = sum(1 for f in sorted(glob.glob(os.path.join(zpath, "part-*")))
             if (lambda r: r[0] <= x0 <= r[1])(
                 spark.read.parquet(f).agg(F.min("x"), F.max("x"))
                 .collect()[0]))
    fy = sum(1 for f in sorted(glob.glob(os.path.join(zpath, "part-*")))
             if (lambda r: r[0] <= y0 <= r[1])(
                 spark.read.parquet(f).agg(F.min("y"), F.max("y"))
                 .collect()[0]))
    assert fx < 16 and fy < 16, (fx, fy)

    # Rows preserved exactly.
    got = spark.read.parquet(zpath)
    assert got.count() == n
    assert got.select(F.sum("id")).collect()[0][0] == n * (n - 1) // 2

    # Morton interleave unit property: bits land at stride positions.
    row = spark.range(1).select(
        morton_interleave([F.lit(0b101), F.lit(0b011)], bits=3)
        .alias("m")).collect()[0]
    # x bits (101) at even positions, y bits (011) at odd:
    # pos0=x0=1, pos1=y0=1, pos2=x1=0, pos3=y1=1, pos4=x2=1, pos5=y2=0
    assert row.m == 0b011011


def test_read_json_with_error_channel(spark, tmp_path):
    """Malformed JSONL lines route to the error channel with their
    source file; parsed rows keep the declared schema; half-parsed
    (schema-subset) rows are good-with-nulls."""
    from lisp_batch_processor_spark.sources.readers import (
        read_json_with_error_channel)

    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join([
        '{"doc_id": 1, "text": "alpha", "lang": "en"}',
        'this is not json at all',
        '{"doc_id": 2, "text": "beta"}',          # missing lang -> null
        '{"doc_id": 3, "text": "gamma", "lang": "de"',  # truncated
        '{"doc_id": 4, "text": null, "lang": "fr"}',
    ]))
    good, bad = read_json_with_error_channel(
        spark, str(p), "doc_id LONG, text STRING, lang STRING")

    rows = {r.doc_id: (r.text, r.lang) for r in good.collect()}
    assert rows == {1: ("alpha", "en"), 2: ("beta", None),
                    4: (None, "fr")}
    assert good.columns == ["doc_id", "text", "lang"]

    bad_rows = bad.collect()
    assert {r.raw_line for r in bad_rows} == {
        "this is not json at all",
        '{"doc_id": 3, "text": "gamma", "lang": "de"'}
    assert all(r._source_file.endswith("docs.jsonl")
               for r in bad_rows)


def test_versioned_publish_read_vacuum(spark, tmp_path):
    """Rename-free versioned publication: readers see only committed
    versions, a crashed publish (data dir, no pointer) is invisible
    and later reclaimed, vacuum keeps the live window."""
    import pytest

    from lisp_batch_processor_spark.sources.writers import (
        versioned_publish, versioned_read, versioned_vacuum)

    path = os.path.join(str(tmp_path), "vtable")
    with pytest.raises(ValueError, match="versioned_publish"):
        versioned_read(spark, path)

    assert versioned_publish(spark, spark.range(0, 5), path) == 0
    assert versioned_read(spark, path).count() == 5
    assert versioned_publish(spark, spark.range(0, 9), path) == 1
    assert versioned_read(spark, path).count() == 9

    # Crashed publish: data committed but the pointer never landed.
    spark.range(0, 99).write.parquet(os.path.join(path, "v_2"))
    assert versioned_read(spark, path).count() == 9  # still v_1
    # The next publish does NOT reuse the orphaned number.
    assert versioned_publish(spark, spark.range(0, 3), path) == 3
    assert versioned_read(spark, path).count() == 3

    # Vacuum: keep the 2 highest committed (1 and 3), reclaim v_0
    # and the orphan v_2; the in-flight case (dir above the highest
    # pointer) is exercised separately below.
    assert versioned_vacuum(spark, path, keep=2) == 2
    assert sorted(d for d in os.listdir(path)
                  if d.startswith("v_")) == ["v_1", "v_3"]
    assert versioned_read(spark, path).count() == 3

    # An in-flight publish above the current pointer survives vacuum.
    spark.range(0, 7).write.parquet(os.path.join(path, "v_4"))
    assert versioned_vacuum(spark, path, keep=1) == 1  # reclaims v_1
    assert sorted(d for d in os.listdir(path)
                  if d.startswith("v_")) == ["v_3", "v_4"]
    assert versioned_read(spark, path).count() == 3

    with pytest.raises(ValueError, match="keep"):
        versioned_vacuum(spark, path, keep=0)


def test_read_parquet_nanos_ok_restores_conf(spark, tmp_path):
    """Legacy TIMESTAMP(NANOS) fixtures read as raw-nanos BIGINT via a
    set-and-restore around the one probe read — no session-global conf
    mutation survives the call, and the returned frame still executes
    after the restore (the illegal-type check is analysis-time only)."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from lisp_batch_processor_spark.catalog import read_parquet_nanos_ok

    key = "spark.sql.legacy.parquet.nanosAsLong"
    nanos = os.path.join(str(tmp_path), "nanos.parquet")
    pq.write_table(
        pa.table({"ts": pa.array(
            [datetime.datetime(2024, 1, 1),
             datetime.datetime(2024, 1, 2)], type=pa.timestamp("ns")),
            "x": [1, 2]}),
        nanos, coerce_timestamps=None, version="2.6")

    assert spark.conf.get(key, None) is None
    df = read_parquet_nanos_ok(spark, nanos)
    # Conf restored immediately — no concurrent reader ever inherits it.
    assert spark.conf.get(key, None) is None
    assert dict(df.dtypes)["ts"] == "bigint"
    assert [r.ts for r in df.orderBy("x").collect()] == [
        1704067200000000000, 1704153600000000000]

    # Modern MICROS files never enter the fallback.
    micros = os.path.join(str(tmp_path), "micros.parquet")
    pq.write_table(
        pa.table({"ts": pa.array([datetime.datetime(2024, 1, 1)],
                                 type=pa.timestamp("us")), "x": [1]}),
        micros, version="2.6")
    assert "timestamp" in dict(
        read_parquet_nanos_ok(spark, micros).dtypes)["ts"]

    # Non-nanos failures still surface.
    import pytest as _pytest
    with _pytest.raises(Exception, match="(?i)path|exist"):
        read_parquet_nanos_ok(
            spark, os.path.join(str(tmp_path), "missing.parquet"))
