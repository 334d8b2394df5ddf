"""Streaming MERGE upsert sink (round 8): foreachBatch + merge with
the (app, epoch) watermark — keyed state maintained from a stream,
exactly-once under crash redelivery."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable
from spark_data_engineering_spark.streaming.upsert import stream_upsert_to_txn


def _state(spark, t):
    return {r.k: r.v for r in t.read(spark).collect()}


def test_upsert_stream_updates_and_inserts(spark, tmp_path):
    t = TxnTable(str(tmp_path), "state")
    t.append(spark.createDataFrame([(1, 10.0), (2, 20.0)], "k bigint, v double"))
    src = str(tmp_path / "in")
    # two files -> two micro-batches with maxFilesPerTrigger=1: an
    # update for k=1 and an insert for k=3 land in different epochs
    spark.createDataFrame([(1, 11.0)], "k bigint, v double").coalesce(1).write.parquet(
        f"{src}/a"
    )
    spark.createDataFrame([(3, 30.0)], "k bigint, v double").coalesce(1).write.parquet(
        f"{src}/b"
    )
    stream = (
        spark.readStream.schema("k bigint, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = stream_upsert_to_txn(stream, t, "ups", on=["k"])
    q.awaitTermination()
    assert _state(spark, t) == {1: 11.0, 2: 20.0, 3: 30.0}
    # every data epoch carries the watermark
    assert t.last_epoch("ups") >= 1


def test_replayed_epoch_is_noop_and_empty_epoch_advances(spark, tmp_path):
    t = TxnTable(str(tmp_path), "state")
    t.append(spark.createDataFrame([(1, 10.0)], "k bigint, v double"))
    upd = spark.createDataFrame([(1, 99.0)], "k bigint, v double")

    # drive the sink's per-epoch logic directly (foreachBatch's
    # contract: the closure gets (batch_df, epoch_id); replay = same id)
    def run_epoch(df, eid):
        if eid <= t.last_epoch("ups"):
            return
        t.merge(spark, df, on=["k"], txn=("ups", eid))

    run_epoch(upd, 5)
    v_after = t.version()
    assert _state(spark, t) == {1: 99.0}
    # crash redelivery of epoch 5: must commit nothing
    run_epoch(spark.createDataFrame([(1, 7.0)], "k bigint, v double"), 5)
    assert t.version() == v_after
    assert _state(spark, t) == {1: 99.0}
    # empty epoch 6 still advances the watermark (metadata-only merge)
    t.merge(spark, upd.limit(0), on=["k"], txn=("ups", 6))
    assert t.last_epoch("ups") == 6
    assert _state(spark, t) == {1: 99.0}


def test_latest_by_dedupes_within_batch(spark, tmp_path):
    t = TxnTable(str(tmp_path), "state")
    t.append(spark.createDataFrame([(1, 0.0)], "k bigint, v double"))
    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, 5.0, 100), (1, 8.0, 200), (2, 2.0, 50)],
        "k bigint, v double, seq bigint",
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("k bigint, v double, seq bigint").parquet(src)
    q = stream_upsert_to_txn(stream, t, "ups", on=["k"], latest_by="seq")
    q.awaitTermination()
    got = {r.k: (r.v, r.seq) for r in t.read(spark).collect()}
    assert got == {1: (8.0, 200), 2: (2.0, 50)}
