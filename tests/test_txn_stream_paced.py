"""maxFilesPerTrigger on the format('txn') STREAM source: the initial
snapshot drains as bounded chunks (never one unbounded epoch), restarts
resume from the checkpointed prefix exactly once, and tailing begins
after the snapshot completes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable
from spark_data_engineering_spark.sources.txn_datasource import TxnDataSource


@pytest.fixture(autouse=True)
def _register(spark):
    spark.dataSource.register(TxnDataSource)


def _src(spark, tmp_path, n_files=6, n_rows=12):
    t = TxnTable(str(tmp_path), "src")
    t.append(
        spark.range(n_rows).withColumn("v", F.col("id") * 2).repartition(n_files)
    )
    return t


def _pipe(spark, src, tmp_path, mft, trigger_once=False):
    q = (
        spark.readStream.format("txn")
        .option("maxFilesPerTrigger", str(mft))
        .load(src.table_dir)
        .writeStream.format("txn")
        .option("txnAppId", "paced")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
    )
    if trigger_once:
        q = q.trigger(once=True)
    started = q.start(str(tmp_path / "dst"))
    try:
        if trigger_once:
            started.awaitTermination(120)
        else:
            started.processAllAvailable()
    finally:
        started.stop()
    return TxnTable(str(tmp_path), "dst")


def test_snapshot_drains_in_bounded_epochs(spark, tmp_path):
    src = _src(spark, tmp_path, n_files=6, n_rows=12)
    dst = _pipe(spark, src, tmp_path, mft=2)
    # every row exactly once
    assert sorted(r.id for r in dst.read(spark).collect()) == list(range(12))
    # the snapshot's 6 files landed as 3 bounded epochs, not one
    data_commits = [
        c for c in dst.history() if c.get("add") and c["action"] != "branch"
    ]
    assert len(data_commits) == 3
    # and no epoch carried more than the cap
    src_files = set(src.live_files())
    for c in data_commits:
        # sink re-stages, so count source rows per epoch via stats
        assert len(c["add"]) <= 32  # one file per sink task; sanity only


def test_paced_restart_resumes_exactly_once(spark, tmp_path):
    src = _src(spark, tmp_path, n_files=4, n_rows=8)
    # first run: a single trigger consumes ONE bounded chunk, then stops
    dst = _pipe(spark, src, tmp_path, mft=1, trigger_once=True)
    n_first = dst.read(spark).count()
    assert 0 < n_first < 8  # genuinely stopped mid-snapshot
    # restart on the same checkpoint: drains the remainder, no dupes
    dst = _pipe(spark, src, tmp_path, mft=1)
    assert sorted(r.id for r in dst.read(spark).collect()) == list(range(8))


def test_paced_stream_tails_after_snapshot(spark, tmp_path):
    src = _src(spark, tmp_path, n_files=3, n_rows=6)
    q = (
        spark.readStream.format("txn")
        .option("maxFilesPerTrigger", "1")
        .load(src.table_dir)
        .writeStream.format("txn")
        .option("txnAppId", "paced")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start(str(tmp_path / "dst"))
    )
    try:
        q.processAllAvailable()
        src.append(spark.range(100, 103).withColumn("v", F.lit(0).cast("long")))
        q.processAllAvailable()
    finally:
        q.stop()
    dst = TxnTable(str(tmp_path), "dst")
    assert sorted(r.id for r in dst.read(spark).collect()) == list(range(6)) + [
        100,
        101,
        102,
    ]


def test_paced_with_starting_version_tails_unpaced(spark, tmp_path):
    """maxFilesPerTrigger + startingVersion: there is no snapshot to
    pace — the stream must tail immediately (regression: the pacing
    pointer used to hand out snapshot offsets the snapshot-less stream
    could never consume, bouncing through empty batches)."""
    src = _src(spark, tmp_path, n_files=4, n_rows=8)
    src.append(spark.range(100, 103).withColumn("v", F.lit(0).cast("long")))
    q = (
        spark.readStream.format("txn")
        .option("maxFilesPerTrigger", "1")
        .option("startingVersion", "1")
        .load(src.table_dir)
        .writeStream.format("txn")
        .option("txnAppId", "svp")
        .option("checkpointLocation", str(tmp_path / "ckpt_sv"))
        .start(str(tmp_path / "dst_sv"))
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    dst = TxnTable(str(tmp_path), "dst_sv")
    assert sorted(r.id for r in dst.read(spark).collect()) == [100, 101, 102]
