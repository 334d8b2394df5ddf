"""Native streaming sink: df.writeStream.format('txn') — one commit per
epoch carrying an (app, batchId) watermark, exactly-once across
restarts, txnAppId required, and the full txn->txn streaming pipe."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable
from spark_data_engineering_spark.sources.txn_datasource import TxnDataSource


@pytest.fixture(autouse=True)
def _register(spark):
    spark.dataSource.register(TxnDataSource)


def _run_sink(spark, src_dir, table_dir, ckpt):
    q = (
        spark.readStream.schema("id bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .writeStream.format("txn")
        .option("txnAppId", "sink-test")
        .option("checkpointLocation", ckpt)
        .start(table_dir)
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_stream_sink_exactly_once_across_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.range(6).repartition(3).write.parquet(src)
    tdir = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    _run_sink(spark, src, tdir, ckpt)
    t = TxnTable(str(tmp_path), "t")
    assert sorted(r.id for r in t.read(spark).collect()) == list(range(6))
    assert t.version() >= 2  # one commit per micro-batch
    marks = [c["txn"] for c in t.history() if c.get("txn")]
    assert all(m["app"] == "sink-test" for m in marks)
    # restart on the SAME checkpoint: everything already committed —
    # no new rows, no new data commits
    v = t.version()
    _run_sink(spark, src, tdir, ckpt)
    assert t.version() == v
    assert sorted(r.id for r in t.read(spark).collect()) == list(range(6))


def test_stream_sink_requires_app_id_and_append_mode(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.range(3).write.parquet(src)
    with pytest.raises(Exception, match="txnAppId"):
        (
            spark.readStream.schema("id bigint")
            .parquet(src)
            .writeStream.format("txn")
            .option("checkpointLocation", str(tmp_path / "c1"))
            .start(str(tmp_path / "t1"))
            .processAllAvailable()
        )


def test_txn_to_txn_streaming_pipe(spark, tmp_path):
    """The connector closes its own loop: a txn table STREAMS into
    another txn table through the standard APIs only (CDC pipe), and
    the sink equals the source's live rows."""
    s = TxnTable(str(tmp_path), "src")
    s.append(spark.range(10).withColumn("v", F.col("id") * 2))
    s.delete_where_dv(spark, F.col("id") == 4)
    q = (
        spark.readStream.format("txn")
        .load(s.table_dir)
        .writeStream.format("txn")
        .option("txnAppId", "pipe")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start(str(tmp_path / "dst"))
    )
    try:
        q.processAllAvailable()
        s.append(spark.range(50, 53).withColumn("v", F.col("id")))
        q.processAllAvailable()
    finally:
        q.stop()
    d = TxnTable(str(tmp_path), "dst")
    assert sorted(r.id for r in d.read(spark).collect()) == [
        i for i in range(10) if i != 4
    ] + [50, 51, 52]


def test_stream_sink_partitioned_value_pure(spark, tmp_path):
    """The streaming sink inherits the batch writer's partition split:
    every epoch's staged files are value-pure with recorded
    partitionValues, so a table fed ONLY by writeStream still prunes."""
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "a"), (3, "b")], "id long, cat string"
    ).coalesce(1).write.parquet(src)
    t = TxnTable(str(tmp_path), "t", partition_cols=("cat",))
    t.append(
        spark.createDataFrame([(100, "a")], "id long, cat string").coalesce(1)
    )
    q = (
        spark.readStream.schema("id long, cat string")
        .parquet(src)
        .writeStream.format("txn")
        .option("txnAppId", "psink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start(t.table_dir)
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    stats = t.file_stats()
    assert all(
        set(c.get("partitionValues") or {}) == {"cat"} for c in stats.values()
    )
    kept = t.prune_files(None, equals={"cat": "a"})
    assert kept and len(kept) < len(stats)
    got = sorted(
        r.id
        for r in t.read(spark, prune_eq={"cat": "a"})
        .filter(F.col("cat") == "a")
        .collect()
    )
    assert got == [0, 2, 100]
