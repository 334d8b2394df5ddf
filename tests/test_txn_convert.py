"""CONVERT TO DELTA analog: TxnTable.convert_from_parquet adopts an
existing parquet file/directory into a new txn table without rewriting
bytes (hardlinks; footer stats computed at convert time; one add-only
'convert' commit triaged as an append by streams and the change feed)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable


@pytest.fixture()
def source_dir(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.range(100).withColumn("v", F.col("id") * 2.0).repartitionByRange(
        3, "id"
    ).write.parquet(src)
    return src


def test_convert_adopts_without_copy(spark, tmp_path, source_dir):
    t = TxnTable.convert_from_parquet(spark, str(tmp_path), "t", source_dir)
    assert t.version() == 1
    got = sorted(r.id for r in t.read(spark).collect())
    assert got == list(range(100))
    # metadata-only count from convert-time footer stats
    assert t.count_rows() == 100
    # hardlinked, not copied: every data file shares its source inode
    for f in t.live_files():
        assert os.stat(os.path.join(t.data_dir, f)).st_nlink >= 2
    # the source is untouched and still readable
    assert spark.read.parquet(source_dir).count() == 100
    # footer min/max landed: range pruning works from v1
    pruned = t.prune_files({"id": (90, None)})
    assert 0 < len(pruned) < len(t.live_files())


def test_converted_table_is_fully_functional(spark, tmp_path, source_dir):
    t = TxnTable.convert_from_parquet(spark, str(tmp_path), "t", source_dir)
    t.append(
        spark.range(200, 203).withColumn("v", F.col("id") * 2.0).coalesce(1)
    )
    t.delete_where_dv(spark, F.col("id") < 5)
    got = sorted(r.id for r in t.read(spark).collect())
    assert got == list(range(5, 100)) + [200, 201, 202]
    assert t.count_rows() == 98
    # change feed: the convert commit is pure inserts
    ch = t.read_changes(spark, 0, 1)
    assert ch.filter(F.col("_change_type") == "insert").count() == 100


def test_convert_streams_as_initial_snapshot_and_tails(spark, tmp_path, source_dir):
    from spark_data_engineering_spark.sources.txn_datasource import register_txn

    register_txn(spark)
    t = TxnTable.convert_from_parquet(spark, str(tmp_path), "t", source_dir)
    q = (
        spark.readStream.format("txn")
        .option("startingVersion", "0")  # per-commit tail hits 'convert'
        .load(t.table_dir)
        .writeStream.format("memory")
        .queryName("conv_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = spark.sql("select count(*) c from conv_stream").first().c
    assert got == 100


def test_convert_refusals(spark, tmp_path, source_dir):
    # existing table
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.range(3))
    with pytest.raises(ValueError, match="already has commits"):
        TxnTable.convert_from_parquet(spark, str(tmp_path), "t", source_dir)
    # empty source
    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    with pytest.raises(ValueError, match="no parquet files"):
        TxnTable.convert_from_parquet(spark, str(tmp_path), "e", empty)


def test_convert_single_file(spark, tmp_path):
    src = str(tmp_path / "one")
    spark.range(7).coalesce(1).write.parquet(src)
    fpath = next(
        os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")
    )
    t = TxnTable.convert_from_parquet(spark, str(tmp_path), "t", fpath)
    assert sorted(r.id for r in t.read(spark).collect()) == list(range(7))
