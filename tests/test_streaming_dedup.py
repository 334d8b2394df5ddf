"""Streaming dedup: the first occurrence is emitted, same-batch and
cross-micro-batch duplicates are dropped, distinct keys all survive."""

import pyspark.sql.functions as F

from spark_data_engineering_spark.streaming.dedup import fingerprint_dedup_stream


def test_cross_batch_duplicates_dropped(spark, tmp_path):
    staged = str(tmp_path / "stream_in")
    # batch 1: doc a (+ an in-batch duplicate), doc b   batch 2: dup of a, doc c
    b1 = spark.createDataFrame(
        [(1, "alpha", "2026-01-01 00:00:01"),
         (2, "alpha", "2026-01-01 00:00:02"),
         (3, "beta", "2026-01-01 00:00:03")],
        "doc_id long, text string, ts_s string",
    )
    b2 = spark.createDataFrame(
        [(4, "alpha", "2026-01-01 00:10:00"),
         (5, "gamma", "2026-01-01 00:10:01")],
        "doc_id long, text string, ts_s string",
    )
    for i, b in enumerate((b1, b2)):
        b.withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s").coalesce(1).write.mode(
            "append"
        ).parquet(staged)

    schema = spark.read.parquet(staged).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(staged)
    )
    out = fingerprint_dedup_stream(stream, text_col="text", event_time_col="ts", delay="1 hour")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_unit")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("dedup_unit").select("text").collect()
    texts = sorted(r.text for r in rows)
    assert texts == ["alpha", "beta", "gamma"]  # one row per distinct content
