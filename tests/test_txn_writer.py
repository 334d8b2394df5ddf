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
