"""Streaming change-data-feed on format('txn'): readChangeFeed emits
appends as inserts and DV commits as DELETE rows (retractions), skips
compact, aborts-or-skips rewrites; startingVersion tails the log without
the initial snapshot; the stream agrees with batch read_changes."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable
from spark_data_engineering_spark.sources.txn_datasource import TxnDataSource


@pytest.fixture(autouse=True)
def _register(spark):
    spark.dataSource.register(TxnDataSource)


def _collect_cdf(spark, table_dir, tmp_path, starting_version=None, n_batches=1):
    name = f"cdf_{uuid.uuid4().hex[:8]}"
    r = spark.readStream.format("txn").option("readChangeFeed", "true")
    if starting_version is not None:
        r = r.option("startingVersion", str(starting_version))
    q = (
        r.load(table_dir)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def _rows(df):
    return sorted(
        (r.id, r.v, r._change_type, r._commit_version) for r in df.collect()
    )


def test_cdf_stream_matches_batch_read_changes(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.range(10).withColumn("v", F.col("id") * 2).repartition(3))
    t.append(spark.range(10, 15).withColumn("v", F.col("id") * 2))
    t.delete_where_dv(spark, F.col("id") % 3 == 0)
    t.compact(spark)  # net-zero: must appear in NEITHER feed
    got = _rows(_collect_cdf(spark, t.table_dir, tmp_path, starting_version=0))
    want = _rows(t.read_changes(spark, 0))
    assert got == want
    # sanity on the shape itself: 15 inserts and 5 retractions
    assert sum(1 for r in got if r[2] == "insert") == 15
    assert sorted(r[0] for r in got if r[2] == "delete") == [0, 3, 6, 9, 12]


def test_cdf_fresh_stream_snapshot_then_live_delete(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.range(8).withColumn("v", F.lit(1).cast("long")))
    t.delete_where_dv(spark, F.col("id") == 7)  # pre-stream: snapshot-folded
    name = f"cdf_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("txn")
        .option("readChangeFeed", "true")
        .load(t.table_dir)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # a LIVE delete: the CDF stream retracts instead of aborting
        t.delete_where_dv(spark, F.col("id") < 2)
        q.processAllAvailable()
    finally:
        q.stop()
    rows = _rows(spark.table(name))
    # snapshot: 7 inserts (id 7 already deleted at stream start)
    assert sorted(r[0] for r in rows if r[2] == "insert") == list(range(7))
    assert sorted(r[0] for r in rows if r[2] == "delete") == [0, 1]
    # folding the feed reproduces the table: {2..6}
    live = {r[0] for r in rows if r[2] == "insert"} - {
        r[0] for r in rows if r[2] == "delete"
    }
    assert live == set(range(2, 7))


def test_cdf_rewrite_aborts_unless_optin(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.range(5).withColumn("v", F.lit(1).cast("long")))
    t.overwrite(spark.range(3).withColumn("v", F.lit(2).cast("long")))
    with pytest.raises(Exception, match="read_changes|ignoreChanges"):
        _collect_cdf(spark, t.table_dir, tmp_path, starting_version=0)
    # opt-in skips the rewrite commit instead of re-emitting it
    name = f"cdf_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("txn")
        .option("readChangeFeed", "true")
        .option("startingVersion", "0")
        .option("ignoreChanges", "true")
        .load(t.table_dir)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = _rows(spark.table(name))
    assert sorted(r[0] for r in rows) == [0, 1, 2, 3, 4]  # v1 inserts only


def test_starting_version_plain_stream_tails_without_snapshot(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.range(6).withColumn("v", F.lit(1).cast("long")))
    t.append(spark.range(10, 13).withColumn("v", F.lit(2).cast("long")))
    name = f"sv_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("txn")
        .option("startingVersion", "1")
        .load(t.table_dir)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # only the second commit: the first is before startingVersion
    assert sorted(r.id for r in spark.table(name).collect()) == [10, 11, 12]


def test_batch_read_refuses_cdf_option(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.range(3).withColumn("v", F.lit(1).cast("long")))
    with pytest.raises(Exception, match="read_changes"):
        spark.read.format("txn").option("readChangeFeed", "true").load(
            t.table_dir
        ).collect()
