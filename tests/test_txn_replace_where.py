"""Dynamic partition overwrite (Delta's ``replaceWhere``), DELETE
change-images, and partition-column immutability guards (round 8):

- ``overwrite(df, replace_where={...})`` replaces ONLY the files of
  the matching partition (other partitions byte-identical), refuses
  non-partition keys and out-of-partition rows (nothing committed),
  and an empty frame clears the partition.
- ``delete_where(cdf=True)`` persists the deleted rows as change
  files, so batch CDF reports them image-exact and the STREAMING
  change feed streams a DELETE-heavy table instead of aborting.
- rename/drop of a partition column is refused (partitionValues are
  keyed by name; a rename would silently kill pruning).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable
from spark_data_engineering_spark.sources.txn_datasource import TxnDataSource


@pytest.fixture(autouse=True)
def _register(spark):
    spark.dataSource.register(TxnDataSource)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id bigint, day string, v double")


def _mk(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t", partition_cols=("day",))
    t.append(
        _df(
            spark,
            [
                (1, "d1", 1.0),
                (2, "d1", 2.0),
                (3, "d2", 3.0),
                (4, "d2", 4.0),
                (5, "d3", 5.0),
            ],
        )
    )
    return t


def test_replace_where_swaps_one_partition(spark, tmp_path):
    t = _mk(spark, tmp_path)
    before = {
        n for n, c in t.file_stats().items()
        if c["partitionValues"]["day"] != "d2"
    }
    t.overwrite(
        _df(spark, [(30, "d2", 30.0), (31, "d2", 31.0)]),
        replace_where={"day": "d2"},
    )
    after = t.file_stats()
    # untouched partitions survive byte-identical (same file names)
    assert before <= set(after)
    got = sorted((r.id, r.day) for r in t.read(spark).collect())
    assert got == [(1, "d1"), (2, "d1"), (5, "d3"), (30, "d2"), (31, "d2")]
    # idempotent re-run: same content again, other partitions untouched
    t.overwrite(
        _df(spark, [(30, "d2", 30.0), (31, "d2", 31.0)]),
        replace_where={"day": "d2"},
    )
    assert sorted((r.id, r.day) for r in t.read(spark).collect()) == got


def test_replace_where_refuses_leaked_rows(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v0 = t.version()
    with pytest.raises(ValueError, match="outside the replaced partition"):
        t.overwrite(
            _df(spark, [(30, "d2", 30.0), (99, "d9", 99.0)]),
            replace_where={"day": "d2"},
        )
    assert t.version() == v0  # nothing committed
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2, 3, 4, 5]


def test_replace_where_refuses_non_partition_key(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="not partition columns"):
        t.overwrite(_df(spark, []), replace_where={"id": 1})


def test_replace_where_empty_frame_clears_partition(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.overwrite(
        _df(spark, []).limit(0), replace_where={"day": "d3"}
    )
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2, 3, 4]


def test_delete_cdf_images_batch_and_stream(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v = t.delete_where(spark, F.col("id") % 2 == 0, cdf=True)
    ch = sorted(
        (r.id, r._change_type)
        for r in t.read_changes(spark, v - 1, v).collect()
    )
    assert ch == [(2, "delete"), (4, "delete")]
    # the streaming change feed streams the DELETE instead of aborting
    sign = F.when(F.col("_change_type") == "delete", F.lit(-1)).otherwise(
        F.lit(1)
    )
    q = (
        spark.readStream.format("txn")
        .option("readChangeFeed", "true")
        .option("startingVersion", "0")
        .load(t.table_dir)
        .groupBy("id")
        .agg(F.sum(sign).cast("bigint").alias("n"))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("del_cdf_fold")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    folded = sorted(
        r.id for r in spark.table("del_cdf_fold").collect() if r.n > 0
    )
    assert folded == [1, 3, 5]


def test_partition_column_rename_drop_refused(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="partition column"):
        t.rename_column(spark, "day", "dt")
    with pytest.raises(ValueError, match="partition column"):
        t.drop_column(spark, "day")
    # non-partition columns still evolve freely
    t.rename_column(spark, "v", "val")
    assert [f["name"] for f in t.table_schema() if not f.get("dropped")] == [
        "id",
        "day",
        "val",
    ]
