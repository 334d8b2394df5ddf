"""Exactly-once streaming ingest into the transaction-log table
(streaming/events.py:stream_to_txn_table + sources/txn.py:append_idempotent)
— the Delta txnAppId/txnVersion sink pattern: replayed epochs commit
nothing, restarts with the same app_id never duplicate rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable
from spark_data_engineering_spark.streaming import events as SE


@pytest.fixture()
def src_dir(spark, tmp_path):
    path = str(tmp_path / "src")
    spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ).coalesce(2).write.parquet(path)
    return path


def _stream(spark, src_dir):
    return (
        spark.readStream.schema("id long, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )


def test_stream_ingest_lands_all_rows_once(spark, src_dir, tmp_path):
    table = TxnTable(str(tmp_path), "ingest", checkpoint_every=100)
    q = SE.stream_to_txn_table(_stream(spark, src_dir), table, app_id="app1")
    q.awaitTermination(120)
    assert table.read(spark).count() == 100
    # one commit per micro-batch, each carrying its txn watermark
    txns = [c["txn"] for c in table.history() if "txn" in c]
    assert len(txns) >= 2 and all(t["app"] == "app1" for t in txns)


def test_restart_with_fresh_checkpoint_does_not_duplicate(spark, src_dir, tmp_path):
    table = TxnTable(str(tmp_path), "ingest", checkpoint_every=100)
    q1 = SE.stream_to_txn_table(_stream(spark, src_dir), table, app_id="app1")
    q1.awaitTermination(120)
    v = table.version()
    # a brand-new query (fresh checkpoint) re-reads the whole source and
    # replays epochs 0..k — every one must be deduplicated by the log
    q2 = SE.stream_to_txn_table(_stream(spark, src_dir), table, app_id="app1")
    q2.awaitTermination(120)
    assert table.version() == v
    assert table.read(spark).count() == 100


def test_distinct_app_ids_are_independent(spark, src_dir, tmp_path):
    table = TxnTable(str(tmp_path), "ingest", checkpoint_every=100)
    SE.stream_to_txn_table(_stream(spark, src_dir), table, app_id="a").awaitTermination(120)
    SE.stream_to_txn_table(_stream(spark, src_dir), table, app_id="b").awaitTermination(120)
    # different logical streams may legitimately both ingest
    assert table.read(spark).count() == 200


def test_append_idempotent_replay_is_noop_and_leaks_no_files(spark, tmp_path):
    table = TxnTable(str(tmp_path), "t", checkpoint_every=100)
    assert table.append_idempotent(spark.range(5), "app", 0) == 1
    assert table.append_idempotent(spark.range(5, 9), "app", 1) == 2
    # replay of epoch 1: no new version, no new live files
    assert table.append_idempotent(spark.range(99), "app", 1) is None
    assert table.version() == 2
    assert table.read(spark).count() == 9
    assert table.last_epoch("app") == 1
    assert table.last_epoch("other") == -1


def test_epoch_watermark_survives_checkpoint(spark, tmp_path):
    table = TxnTable(str(tmp_path), "t", checkpoint_every=2)
    for e in range(5):
        table.append_idempotent(spark.range(e * 10, e * 10 + 10), "app", e)
    # version 4's checkpoint must carry the txns map; replay from it
    fresh = TxnTable(str(tmp_path), "t", checkpoint_every=2)
    assert fresh.last_epoch("app") == 4
    assert fresh.append_idempotent(spark.range(1), "app", 3) is None
    assert fresh.read(spark).count() == 50


def test_mixed_batch_commits_do_not_reset_epochs(spark, tmp_path):
    # batch commits interleaved with streaming ones (and triggering the
    # plain-_commit checkpoint path) must preserve the epoch watermark
    table = TxnTable(str(tmp_path), "t", checkpoint_every=2)
    table.append_idempotent(spark.range(10), "app", 7)
    table.append(spark.range(100, 105))
    table.compact(spark)  # hits checkpoint_every via _commit's writer
    assert table.last_epoch("app") == 7
    assert table.append_idempotent(spark.range(99), "app", 7) is None
    assert table.read(spark).count() == 15
