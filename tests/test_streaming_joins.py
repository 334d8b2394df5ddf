"""Stream-stream interval join (round 8): unit tier for
streaming/joins.py — the gate query streaming_click_purchase_join is
the end-to-end oracle; here the module contract (refusals + pair
semantics across micro-batches) is pinned on a tiny controlled input.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_data_engineering_spark.streaming.joins import interval_join_streams


def test_refuses_batch_frames(spark):
    df = spark.range(3)
    with pytest.raises(ValueError, match="STREAMING"):
        interval_join_streams(df, df, "id", "id", "ts", "ts")


def test_pairs_across_micro_batches(spark, tmp_path):
    # left (clicks) and right (purchases) staged as MULTIPLE files so
    # maxFilesPerTrigger=1 forces the match to straddle micro-batches:
    # the symmetric hash join must hold left state until the right row
    # arrives, and emit each pair exactly once.
    rows = [
        (1, "2024-01-01 10:00:00", "click"),
        (2, "2024-01-01 11:00:00", "click"),
        (1, "2024-01-01 10:30:00", "purchase"),  # inside 1h of u1 click
        (2, "2024-01-01 12:30:00", "purchase"),  # outside 1h of u2 click
        (1, "2024-01-01 09:30:00", "purchase"),  # BEFORE the click
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts string, kind string").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "kind"
    )
    staged = str(tmp_path / "ev")
    df.repartition(5).write.parquet(staged)
    schema = "user_id bigint, ts timestamp, kind string"

    def side(kind, key, tsname):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(staged)
            .filter(F.col("kind") == kind)
            .select(F.col("user_id").alias(key), F.col("ts").alias(tsname))
        )

    joined = interval_join_streams(
        side("click", "cu", "cts"),
        side("purchase", "pu", "pts"),
        "cu", "pu", "cts", "pts",
        max_gap="1 hour",
        watermark="10 days",
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_unit")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = [(r.cu, str(r.pts)) for r in spark.table("ssj_unit").collect()]
    assert got == [(1, "2024-01-01 10:30:00")]
