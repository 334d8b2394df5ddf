"""Round-10 surfaces: hive-partitioned CONVERT TO DELTA and COPY INTO
on partitioned targets (VERDICT r9 tasks 5 & 6).

Hive layouts drop the partition columns from the data files; the
convert adopts them by hardlink anyway, records each file's
partition-value combo from its ``col=value`` path, and every read
projects the columns back via one broadcast join on ``__file``
(``TxnTable._read_files_meta`` / ``hive_origin``). COPY INTO on a
partitioned target re-stages landing files through the value-pure
partition path ``append`` uses.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable


@pytest.fixture()
def hive_src(spark, tmp_path):
    """A hive-partitioned corpus: 10 rows over parts a(5)/b(5)."""
    src = str(tmp_path / "corpus")
    spark.createDataFrame(
        [Row(k=i, v=f"v{i}", part=("a" if i < 5 else "b")) for i in range(10)]
    ).write.partitionBy("part").parquet(src)
    return src


def test_hive_convert_adopts_and_reads_back(spark, tmp_path, hive_src):
    t = TxnTable.convert_from_parquet(spark, str(tmp_path), "t", hive_src)
    assert t.partition_cols() == ("part",)
    assert t.hive_origin()
    got = {(r.k, r.v, r.part) for r in t.read(spark).collect()}
    want = {
        (i, f"v{i}", "a" if i < 5 else "b") for i in range(10)
    }
    assert got == want
    # hardlinked, not copied
    for f in t.live_files():
        assert os.stat(os.path.join(t.data_dir, f)).st_nlink >= 2
    assert t.count_rows() == 10  # metadata-only


def test_hive_convert_partition_pruning_exact(spark, tmp_path, hive_src):
    t = TxnTable.convert_from_parquet(spark, str(tmp_path), "t", hive_src)
    live = t.live_files()
    pruned = t.prune_files(None, equals={"part": "a"})
    assert 0 < len(pruned) < len(live)
    # every pruned-in file really is part=a (value purity from the
    # hive layout itself)
    stats = t.file_stats()
    for f in pruned:
        assert stats[f]["partitionValues"] == {"part": "a"}
    assert t.read(spark, prune_eq={"part": "a"}).count() == 5


def test_hive_convert_typed_partition_inference(spark, tmp_path):
    src = str(tmp_path / "nums")
    spark.createDataFrame(
        [Row(k=i, bucket=i % 3) for i in range(9)]
    ).write.partitionBy("bucket").parquet(src)
    t = TxnTable.convert_from_parquet(spark, str(tmp_path), "t", src)
    # Spark's partition discovery inferred an integer type; the
    # projection casts the dir-name strings back to it
    [bt] = [
        f.dataType.simpleString()
        for f in t.read(spark).schema.fields
        if f.name == "bucket"
    ]
    assert bt in ("int", "bigint")
    assert t.read(spark).groupBy("bucket").count().count() == 3


def test_hive_convert_partition_schema_override(spark, tmp_path):
    src = str(tmp_path / "nums")
    spark.createDataFrame(
        [Row(k=i, bucket=i % 3) for i in range(9)]
    ).write.partitionBy("bucket").parquet(src)
    t = TxnTable.convert_from_parquet(
        spark, str(tmp_path), "t", src, partition_schema={"bucket": "string"}
    )
    [bt] = [
        f.dataType.simpleString()
        for f in t.read(spark).schema.fields
        if f.name == "bucket"
    ]
    assert bt == "string"
    with pytest.raises(ValueError, match="partition_schema names"):
        TxnTable.convert_from_parquet(
            spark, str(tmp_path), "t2", src, partition_schema={"wrong": "int"}
        )


def test_hive_table_mixed_appends_and_merge(spark, tmp_path, hive_src):
    t = TxnTable.convert_from_parquet(spark, str(tmp_path), "t", hive_src)
    # appends stage REAL columns; reads of the mixed table coalesce
    t.append(spark.createDataFrame([Row(k=100, v="x", part="c")]))
    assert sorted(
        r.part for r in t.read(spark).select("part").distinct().collect()
    ) == ["a", "b", "c"]
    # MERGE rewrites a hive-origin file: the rewritten rows carry the
    # projected value into real columns
    t.merge(
        spark, spark.createDataFrame([Row(k=1, v="UPD", part="a")]), on=["k"]
    )
    assert {(r.k, r.v, r.part) for r in t.read(spark).filter("k = 1").collect()} == {
        (1, "UPD", "a")
    }
    assert t.read(spark).count() == 11


def test_hive_origin_survives_reopen_compact_and_clone(
    spark, tmp_path, hive_src
):
    t = TxnTable.convert_from_parquet(spark, str(tmp_path), "t", hive_src)
    # a bare reopen resolves hive_origin from the log
    t2 = TxnTable(str(tmp_path), "t")
    assert t2.hive_origin()
    assert t2.read(spark).count() == 10
    # compact materializes real columns; reads stay correct (the
    # projection is a no-op coalesce over them)
    t2.compact(spark)
    assert {r.part for r in t2.read(spark).collect()} == {"a", "b"}
    # clone carries the flag and the partitionValues
    c = t2.clone(str(tmp_path / "clones"), "c")
    assert c.hive_origin()
    assert c.read(spark).count() == 10


def test_hive_convert_time_travel(spark, tmp_path, hive_src):
    t = TxnTable.convert_from_parquet(spark, str(tmp_path), "t", hive_src)
    t.delete_where(spark, F.col("part") == "a")
    assert t.read(spark).count() == 5
    assert t.read(spark, at_version=1).count() == 10
    assert {
        r.part for r in t.read(spark, at_version=1).select("part").distinct().collect()
    } == {"a", "b"}


def test_hive_convert_fsck_clean(spark, tmp_path, hive_src):
    t = TxnTable.convert_from_parquet(spark, str(tmp_path), "t", hive_src)
    rep = t.fsck(deep=True)
    assert rep["ok"], rep


def test_hive_convert_inconsistent_layout_refused(spark, tmp_path):
    src = str(tmp_path / "bad")
    spark.createDataFrame([Row(k=1, p="a")]).write.partitionBy("p").parquet(
        src
    )
    # sneak an unpartitioned file into the root
    spark.createDataFrame([Row(k=2)]).coalesce(1).write.parquet(
        str(tmp_path / "flat")
    )
    import shutil

    for f in os.listdir(str(tmp_path / "flat")):
        if f.endswith(".parquet"):
            shutil.copy2(
                os.path.join(str(tmp_path / "flat"), f), os.path.join(src, f)
            )
    with pytest.raises(ValueError, match="inconsistent hive partitioning"):
        TxnTable.convert_from_parquet(spark, str(tmp_path), "t", src)


def test_hive_projection_plan_adds_no_exchange(spark, tmp_path, hive_src):
    """The map-literal projection tier is a pure expression: a full
    hive-table read plans with NO shuffle and NO broadcast — the same
    stage count as a raw parquet scan. (The >10k-file tier trades one
    BroadcastExchange for bounded plan size; pinned implicitly by the
    tier constant.)"""
    t = TxnTable.convert_from_parquet(spark, str(tmp_path), "t", hive_src)
    plan = (
        t.read(spark)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "str_to_map" in plan or "map_from" in plan or "Project" in plan


def test_hive_dv_delete_cdf_images_carry_partition_values(
    spark, tmp_path, hive_src
):
    """Round-10 model-search find: the delete_dv arm of read_changes
    read data files RAW (bypassing the partition-value projection), so
    DV-delete images on hive-origin files carried NULL partition
    columns and a CDF fold diverged. Pinned: fold(read_changes) ==
    final state through a DV delete keyed on data AND grouped by the
    projected partition column."""
    from collections import Counter

    t = TxnTable.convert_from_parquet(spark, str(tmp_path), "t", hive_src)
    t.delete_where_dv(spark, F.col("k") < 3)
    fold: Counter = Counter()
    for r in t.read_changes(spark, 0).collect():
        assert r.part is not None, "change image lost its partition value"
        fold[(r.k, r.part)] += 1 if r._change_type == "insert" else -1
    folded = sorted(k for k, n in fold.items() for _ in range(n))
    want = sorted(
        (r.k, r.part) for r in t.read(spark).collect()
    )
    assert folded == want


def test_connector_projects_hive_partition_values(spark, tmp_path, hive_src):
    """The format('txn') connector reads files per-file with pyarrow
    (absent columns -> NULL), so hive-origin tables need the logged
    partitionValues attached as per-file constants at planning time
    (_attach_read_extras) — batch, pushdown-pruned, streaming, and CDF
    retraction reads all project them (round 10)."""
    from spark_data_engineering_spark.sources.txn_datasource import (
        register_txn,
    )

    register_txn(spark)
    t = TxnTable.convert_from_parquet(spark, str(tmp_path), "t", hive_src)
    path = t.table_dir
    df = spark.read.format("txn").load(path)
    assert sorted({r.part for r in df.collect()}) == ["a", "b"]
    assert df.filter("part = 'a'").count() == 5  # pushdown-pruned scan
    # mixed table: appended files carry real columns, consts win equal
    t.append(spark.createDataFrame([Row(k=100, v="x", part="c")]))
    assert (
        spark.read.format("txn").load(path).filter("part = 'c'").count() == 1
    )
    # CDF stream, one live query: the snapshot phase's insert images
    # must carry the projected part, and a LIVE DV delete's retraction
    # rows (fetched from the original hive files) must too
    import uuid as _uuid

    name = f"hive_cdf_{_uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("txn")
        .option("readChangeFeed", "true")
        .load(path)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        t.delete_where_dv(spark, F.col("k") < 2)
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table(name).collect()
    assert rows and all(r.part is not None for r in rows)
    deletes = [(r.k, r.part) for r in rows if r._change_type == "delete"]
    assert sorted(deletes) == [(0, "a"), (1, "a")]


def test_cdf_retraction_pv_survives_post_delete_compact(
    spark, tmp_path, hive_src
):
    """A DV delete followed by a compact in the SAME planned CDF range:
    the retraction partition references a file the range's end version
    no longer lists — its partitionValues resolve at the partition's
    own commit version (the _attach_read_extras fallback)."""
    import uuid as _uuid

    from spark_data_engineering_spark.sources.txn_datasource import (
        register_txn,
    )

    register_txn(spark)
    t = TxnTable.convert_from_parquet(spark, str(tmp_path), "t", hive_src)
    name = f"hive_cdf2_{_uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("txn")
        .option("readChangeFeed", "true")
        .load(t.table_dir)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        t.delete_where_dv(spark, F.col("k") < 2)
        t.compact(spark)  # removes the DV'd files from the live set
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table(name).collect()
    deletes = [(r.k, r.part) for r in rows if r._change_type == "delete"]
    assert sorted(deletes) == [(0, "a"), (1, "a")]
    assert all(r.part is not None for r in rows)


def test_show_partitions_metadata_only(spark, tmp_path, hive_src):
    t = TxnTable.convert_from_parquet(spark, str(tmp_path), "t", hive_src)
    parts = t.show_partitions()
    assert [(p["values"]["part"], p["num_rows"]) for p in parts] == [
        ("a", 5),
        ("b", 5),
    ]
    # DV delete: counts fold the per-file deleted counts, still no scan
    t.delete_where_dv(spark, F.col("k") < 2)
    parts = t.show_partitions()
    assert [(p["values"]["part"], p["num_rows"]) for p in parts] == [
        ("a", 3),
        ("b", 5),
    ]
    # time travel
    assert [
        p["num_rows"] for p in t.show_partitions(at_version=1)
    ] == [5, 5]


def test_show_partitions_refused_on_unpartitioned(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.createDataFrame([Row(k=1)]))
    with pytest.raises(ValueError, match="not partitioned"):
        t.show_partitions()


# ------------------------------------------------- partitioned COPY INTO


def test_copy_into_partitioned_value_pure(spark, tmp_path):
    land = str(tmp_path / "landing")
    spark.createDataFrame(
        [Row(k=i, part=("a" if i % 2 == 0 else "b")) for i in range(10)]
    ).coalesce(1).write.parquet(land)  # ONE value-impure landing file
    t = TxnTable(str(tmp_path), "t", partition_cols=("part",))
    r = t.copy_into(spark, land)
    assert r["files_loaded"] == 1
    assert t.count_rows() == 10
    # every staged file is value-pure with recorded partitionValues
    stats = t.file_stats()
    assert len(stats) >= 2
    for f, st in stats.items():
        pv = st["partitionValues"]["part"]
        assert pv in ("a", "b")
    assert t.read(spark, prune_eq={"part": "a"}).count() == 5


def test_copy_into_partitioned_ledger_idempotent(spark, tmp_path):
    land = str(tmp_path / "landing")
    spark.createDataFrame(
        [Row(k=i, part="a") for i in range(5)]
    ).coalesce(1).write.parquet(land)
    t = TxnTable(str(tmp_path), "t", partition_cols=("part",))
    r1 = t.copy_into(spark, land)
    r2 = t.copy_into(spark, land)
    assert r1["files_loaded"] == 1
    assert r2 == {
        "version": t.version(),
        "files_loaded": 0,
        "files_skipped": 1,
    }
    assert t.count_rows() == 5
    r3 = t.copy_into(spark, land, force=True)
    assert r3["files_loaded"] == 1
    assert t.count_rows() == 10


def test_hive_stream_partition_values_survive_compact_in_one_batch(
    spark, tmp_path, hive_src
):
    """Regression (round-10 advice): a NON-CDF stream partition carried
    no commit version, so when a hive-origin file (physically missing
    its partition columns) was planned and then compacted away within
    ONE planned batch range, the range-end ``file_stats`` no longer
    listed it, the partition-value fallback never fired, and its
    partition columns streamed as NULL. Every stream partition now
    records its commit version (``stats_version``) and resolves
    partitionValues there. Repro: startingVersion=0 tails the convert
    commit (the hive files) and the compact that removed them in one
    batch."""
    from spark_data_engineering_spark.sources.txn_datasource import (
        TxnDataSource,
    )

    spark.dataSource.register(TxnDataSource)
    t = TxnTable.convert_from_parquet(spark, str(tmp_path), "t", hive_src)
    t.compact(spark)  # removes the hive files from the log (bytes stay)
    q = (
        spark.readStream.format("txn")
        .option("startingVersion", "0")
        .option("ignoreChanges", "true")
        .load(t.table_dir)
        .writeStream.format("memory")
        .queryName("hive_stream_pv")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table("hive_stream_pv").collect()
    # the convert commit's hive files stream with their REAL partition
    # values (each row appears twice — the compact rewrite re-emits
    # under ignoreChanges, documented)
    got = {(r.k, r.part) for r in rows}
    assert got == {(i, "a" if i < 5 else "b") for i in range(10)}, got
    assert all(r.part is not None for r in rows)
