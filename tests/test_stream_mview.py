"""Streaming materialized view (CDF stream -> exactly-once foreachBatch
fold into a persistent txn state table): correct fold with retractions,
restart-replay folds nothing, later source commits fold incrementally."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable
from spark_data_engineering_spark.sources.txn_datasource import TxnDataSource


@pytest.fixture(autouse=True)
def _register(spark):
    spark.dataSource.register(TxnDataSource)


def _run_view(spark, src_dir, state_root, ckpt):
    def fold(batch, batch_id):
        state = TxnTable(state_root, "view")
        if batch_id <= state.last_epoch("mv"):
            return  # crash-replayed epoch: already folded
        sign = F.when(F.col("_change_type") == "delete", F.lit(-1)).otherwise(
            F.lit(1)
        )
        delta = batch.groupBy("k").agg(
            (F.sum(F.col("v") * sign)).cast("bigint").alias("total")
        )
        if state.version() > 0:
            delta = (
                state.read(spark)
                .unionByName(delta)
                .groupBy("k")
                .agg(F.sum("total").cast("bigint").alias("total"))
            )
        state.overwrite(delta.coalesce(1), txn=("mv", batch_id))

    q = (
        spark.readStream.format("txn")
        .option("readChangeFeed", "true")
        .option("startingVersion", "0")
        .load(src_dir)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return TxnTable(state_root, "view")


def test_mview_folds_retractions_then_tails_incrementally(spark, tmp_path):
    src = TxnTable(str(tmp_path), "src")
    rows = spark.range(10).select(
        (F.col("id") % 2).alias("k"), F.col("id").alias("v")
    )
    src.append(rows)
    src.delete_where_dv(spark, F.col("v") >= 8)  # retract 8 (k=0), 9 (k=1)
    state_root = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    view = _run_view(spark, src.table_dir, state_root, ckpt)
    got = {r.k: r.total for r in view.read(spark).collect()}
    assert got == {0: 0 + 2 + 4 + 6, 1: 1 + 3 + 5 + 7}
    # restart on the SAME checkpoint: nothing refolds, state untouched
    v_before = view.version()
    view = _run_view(spark, src.table_dir, state_root, ckpt)
    assert view.version() == v_before
    # a later source commit folds incrementally through the live feed
    src.append(
        spark.createDataFrame([(0, 100), (1, 1000)], "k bigint, v bigint")
    )
    view = _run_view(spark, src.table_dir, state_root, ckpt)
    got = {r.k: r.total for r in view.read(spark).collect()}
    assert got == {0: 12 + 100, 1: 16 + 1000}
    # the state table is itself time-travelable history of the view
    assert view.version() > v_before
