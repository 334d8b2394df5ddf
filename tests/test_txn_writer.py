"""format("txn") write path: df.write.format("txn") appends/overwrites
through the standard API with one atomic log commit per save, schema
enforcement, and abort-safe invisibility of task files."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable
from spark_data_engineering_spark.sources.txn_datasource import TxnDataSource


@pytest.fixture(autouse=True)
def _register(spark):
    spark.dataSource.register(TxnDataSource)


def _ids(spark, t):
    return sorted(r.id for r in t.read(spark).collect())


def test_writer_append_roundtrip(spark, tmp_path):
    d = str(tmp_path / "t")
    df = spark.range(30).withColumn("v", F.col("id") * 2).repartition(3)
    df.write.format("txn").mode("append").save(d)
    t = TxnTable(str(tmp_path), "t")
    assert t.version() == 1  # one atomic commit for the whole save
    assert _ids(spark, t) == list(range(30))
    # second append: another single commit, rows accumulate
    spark.range(30, 40).withColumn("v", F.col("id") * 2).write.format(
        "txn"
    ).mode("append").save(d)
    assert t.version() == 2
    assert _ids(spark, t) == list(range(40))
    # the standard reader sees the written table too
    back = sorted(r.id for r in spark.read.format("txn").load(d).collect())
    assert back == list(range(40))
    # commit-log stats flowed from the executors: metadata-only count
    assert t.count_rows() == 40


def test_writer_overwrite_swaps_live_set(spark, tmp_path):
    d = str(tmp_path / "t")
    spark.range(20).withColumn("v", F.col("id")).write.format("txn").mode(
        "append"
    ).save(d)
    spark.range(100, 105).withColumn("v", F.col("id")).write.format("txn").mode(
        "overwrite"
    ).save(d)
    t = TxnTable(str(tmp_path), "t")
    assert _ids(spark, t) == list(range(100, 105))
    # time travel still reaches the pre-overwrite snapshot
    assert sorted(
        r.id for r in t.read(spark, at_version=1).collect()
    ) == list(range(20))


def test_writer_schema_enforcement(spark, tmp_path):
    d = str(tmp_path / "t")
    spark.range(5).withColumn("v", F.col("id")).write.format("txn").mode(
        "append"
    ).save(d)
    bad = spark.range(5).withColumn("v", F.col("id").cast("string"))
    with pytest.raises(Exception, match="schema enforcement"):
        bad.write.format("txn").mode("append").save(d)
    # refused write left no trace: same version, same rows
    t = TxnTable(str(tmp_path), "t")
    assert t.version() == 1 and t.count_rows() == 5


def test_writer_interops_with_table_features(spark, tmp_path):
    """Rows written through the connector are first-class: DV deletes
    and compaction work on them."""
    d = str(tmp_path / "t")
    spark.range(40).withColumn("v", F.col("id") * 3).repartition(4).write.format(
        "txn"
    ).mode("append").save(d)
    t = TxnTable(str(tmp_path), "t")
    t.delete_where_dv(spark, F.col("id") % 4 == 0)
    assert _ids(spark, t) == [i for i in range(40) if i % 4 != 0]
    t.compact(spark)
    assert _ids(spark, t) == [i for i in range(40) if i % 4 != 0]


def test_vacuum_collects_crashed_writer_orphans(spark, tmp_path):
    """A task that crashes AFTER writing its uniquely-named parquet but
    before the driver commit leaks bytes, never rows — and vacuum is the
    promised GC for those bytes: an orphan data file referenced by no
    commit is removed (once past min_age_s), while every committed file
    survives."""
    import os

    d = str(tmp_path / "t")
    spark.range(10).withColumn("v", F.col("id")).write.format("txn").mode(
        "append"
    ).save(d)
    t = TxnTable(str(tmp_path), "t")
    committed = set(t.live_files())
    # simulate the crashed task's leftover: a well-formed parquet in the
    # data dir that no commit references
    orphan = os.path.join(t.data_dir, "deadbeef-crashed-w0.parquet")
    spark.range(3).toPandas().to_parquet(orphan)
    # an age guard above the orphan's age spares it (in-flight write)
    assert t.vacuum(min_age_s=3600) == []
    removed = t.vacuum(min_age_s=0.0)
    assert removed == ["deadbeef-crashed-w0.parquet"]
    assert set(t.live_files()) == committed and not os.path.exists(orphan)
    assert _ids(spark, t) == list(range(10))


def test_writer_partitioned_value_pure_and_pruned(spark, tmp_path):
    """Partitioned connector writes (round 8): the writer resolves
    partition_cols from the COMMIT LOG (the one durable place — a
    declaration that never committed lives only in the declaring
    process), then each task splits its batches by partition value, so
    connector-staged files are VALUE-PURE with recorded
    partitionValues and prune_files stays exact over connector-written
    data."""
    d = str(tmp_path / "t")
    t = TxnTable(str(tmp_path), "t", partition_cols=("cat",))
    # the library's first commit records the property; from here ANY
    # fresh handle (the connector's included) resolves it
    t.append(
        spark.createDataFrame([(100, "a"), (101, "b")], "id long, cat string")
        .coalesce(1)
    )
    spark.range(6).withColumn(
        "cat", F.when(F.col("id") % 2 == 0, "a").otherwise("b")
    ).repartition(2).write.format("txn").mode("append").save(d)
    assert TxnTable(str(tmp_path), "t").partition_cols() == ("cat",)
    stats = t.file_stats()
    assert len(stats) >= 4  # 2 seed + per-task-per-value connector files
    for name, cols in stats.items():
        pv = cols.get("partitionValues")
        assert pv is not None and set(pv) == {"cat"}, f"{name}: {pv}"
    kept = t.prune_files(None, equals={"cat": "a"})
    assert kept and len(kept) < len(stats)
    assert kept == sorted(
        n for n, c in stats.items() if c["partitionValues"]["cat"] == "a"
    )
    got = sorted(
        r.id
        for r in t.read(spark, prune_eq={"cat": "a"})
        .filter(F.col("cat") == "a")
        .collect()
    )
    assert got == [0, 2, 4, 100]
    # library rewrites interoperate: delete one partition's rows, the
    # survivors stay value-pure
    t.delete_where(spark, F.col("cat") == "b")
    assert sorted(r.id for r in t.read(spark).collect()) == [0, 2, 4, 100]


def test_writer_partitioned_int_and_null_values(spark, tmp_path):
    d = str(tmp_path / "t")
    t = TxnTable(str(tmp_path), "t", partition_cols=("y",))
    t.append(
        spark.createDataFrame([(0, 1994)], "id long, y int").coalesce(1)
    )
    seed = set(t.file_stats())
    df = spark.createDataFrame(
        [(1, 1995), (2, 1996), (3, None), (4, 1995)], "id long, y int"
    ).coalesce(1)
    df.write.format("txn").mode("append").save(d)
    stats = t.file_stats()
    vals = sorted(
        str(c["partitionValues"]["y"])
        for n, c in stats.items()
        if n not in seed
    )
    # int formatting == Spark cast; NULL == hive default (None)
    assert vals == ["1995", "1996", "None"]
    kept = t.prune_files(None, equals={"y": 1995})
    assert len(kept) == 1
    got = sorted(
        r.id
        for r in t.read(spark, prune_eq={"y": 1995})
        .filter(F.col("y") == 1995)
        .collect()
    )
    assert got == [1, 4]


def test_writer_partitioned_refuses_unformattable_types(spark, tmp_path):
    d = str(tmp_path / "t")
    t = TxnTable(str(tmp_path), "t", partition_cols=("ts",))
    t.append(
        spark.createDataFrame([(0, 0.5)], "id long, ts double").coalesce(1)
    )
    df = spark.createDataFrame([(1, 1.5)], "id long, ts double")
    with pytest.raises(Exception, match="cannot format identically"):
        df.write.format("txn").mode("append").save(d)
    # and a missing partition column is refused up front too
    u = TxnTable(str(tmp_path), "u", partition_cols=("cat",))
    u.append(
        spark.createDataFrame([(0, "a")], "id long, cat string").coalesce(1)
    )
    with pytest.raises(Exception, match="missing partition column"):
        spark.range(3).write.format("txn").mode("append").save(
            str(tmp_path / "u")
        )
