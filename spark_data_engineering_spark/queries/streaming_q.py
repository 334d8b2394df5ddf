"""Structured-Streaming query under the correctness gate: the streaming
hourly aggregation must hash-match the SAME DuckDB oracle as its batch
twin — end-of-stream (availableNow) state equals the batch answer."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_data_engineering_spark.functions import numeric as NR
from spark_data_engineering_spark.registry import query
from spark_data_engineering_spark.sources import load_table
from spark_data_engineering_spark.streaming.events import EVENT_SCHEMA


@query(
    "streaming_hourly_event_stats",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           FLOOR((SUM(value)) * 100 + 0.5) / 100 AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def streaming_hourly_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the events table through a real streaming query (file
    source, multiple micro-batches, stateful window aggregation in
    COMPLETE mode) and return the end-of-stream state. Complete mode —
    not append — because the gate wants every window, including those a
    watermark would still be holding open at end-of-stream.

    The input is staged once per (session, sf_dir) into a multi-file
    copy so maxFilesPerTrigger yields genuine incremental batches.
    """
    import hashlib

    src = f"{sf_dir}/events.parquet"
    stat = os.stat(src)
    # deterministic digest (Python's hash() is process-salted) keyed on
    # path + source mtime/size so regenerated data invalidates the stage
    digest = hashlib.md5(f"{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}".encode()).hexdigest()[:16]
    staged = f"/tmp/spark_de_stream_input/{digest}"
    if not os.path.isdir(staged):
        load_table(spark, "events", sf_dir).repartition(8).write.mode("overwrite").parquet(staged)
    stream = (
        spark.readStream.schema(EVENT_SCHEMA).option("maxFilesPerTrigger", 2).parquet(staged)
    )
    agg = stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.count("*").alias("n_events"), F.sum("value").alias("sum_value_raw")
    )
    name = "streaming_hourly_gate"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.col("w.start").alias("hour"),
        "event_type",
        "n_events",
        NR.round2(F.col("sum_value_raw")).alias("sum_value"),
    )


@query(
    "streaming_dedup_documents",
    oracle="SELECT DISTINCT md5(text) AS fp FROM documents",
)
def streaming_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the documents table WITH injected content duplicates
    (every 7th doc re-delivered under a new id) through the watermarked
    streaming dedup; the emitted fingerprint set must equal the batch
    ``SELECT DISTINCT md5(text)`` — i.e. every duplicate was dropped
    in-flight, whether it landed in the same micro-batch as its
    original or a later one (maxFilesPerTrigger forces multiple
    batches). Only the fingerprint column is returned: which *row* is
    first-seen depends on arrival order, the fingerprint set does not.
    """
    import hashlib

    from spark_data_engineering_spark.streaming.dedup import fingerprint_dedup_stream

    src = f"{sf_dir}/documents.parquet"
    stat = os.stat(src)
    digest = hashlib.md5(
        f"dedup:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}".encode()
    ).hexdigest()[:16]
    staged = f"/tmp/spark_de_stream_input/{digest}"
    if not os.path.isdir(staged):
        docs = load_table(spark, "documents", sf_dir)
        dupes = docs.filter(F.col("doc_id") % 7 == 0).withColumn(
            "doc_id", F.col("doc_id") + F.lit(10_000_000)
        )
        # synthetic event time: one doc per second from a fixed epoch;
        # re-deliveries arrive 10 minutes after their original, well
        # inside the dedup watermark delay
        full = docs.unionByName(dupes).withColumn(
            "ts",
            F.timestamp_seconds(
                F.lit(1735689600) + (F.col("doc_id") % F.lit(10_000_000)) + F.when(F.col("doc_id") >= 10_000_000, F.lit(600)).otherwise(F.lit(0))
            ),
        )
        full.repartition(8).write.mode("overwrite").parquet(staged)
    schema = spark.read.parquet(staged).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 2).parquet(staged)
    deduped = fingerprint_dedup_stream(stream, text_col="text", event_time_col="ts", delay="2 hours")
    name = "streaming_dedup_gate"
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select("fp")


@query(
    "streaming_sessionize_events",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE OR
                         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    numbered AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           FLOOR((SUM(value)) * 100 + 0.5) / 100 AS session_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def streaming_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sessionization via the built-in session_window state
    (sessions merge across micro-batches), gate-checked against the
    batch lag-gap oracle: session_window's [first_ts, last_ts + gap)
    windows must coincide exactly with gap-based sessionization —
    including sessions the stream saw split across many batches.
    Complete mode (not append) so end-of-stream state includes every
    session, same reasoning as streaming_hourly_event_stats."""
    import hashlib

    src = f"{sf_dir}/events.parquet"
    stat = os.stat(src)
    digest = hashlib.md5(
        f"sess:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}".encode()
    ).hexdigest()[:16]
    staged = f"/tmp/spark_de_stream_input/{digest}"
    if not os.path.isdir(staged):
        load_table(spark, "events", sf_dir).repartition(8).write.mode(
            "overwrite"
        ).parquet(staged)
    stream = (
        spark.readStream.schema(EVENT_SCHEMA).option("maxFilesPerTrigger", 2).parquet(staged)
    )
    agg = stream.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).agg(F.count("*").alias("n_events"), F.sum("value").alias("_raw"))
    name = "streaming_sessionize_gate"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        "user_id",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n_events",
        NR.round2(F.col("_raw")).alias("session_value"),
    )


from spark_data_engineering_spark.streaming.protobuf_compat import ensure_protobuf

if ensure_protobuf():
    # transformWithStateInPandas speaks protobuf to the JVM state server;
    # registration is gated on a usable runtime (present on this host via
    # protobuf_compat's borrowed google-cloud-sdk runtime) so the registry
    # never advertises a query that cannot execute.
    @query(
        "streaming_user_totals_tws",
        oracle="""
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               FLOOR((SUM(value)) * 100 + 0.5) / 100 AS total_value
        FROM events
        GROUP BY user_id
        """,
    )
    def streaming_user_totals_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Per-user running totals on the Spark 4 StatefulProcessor API
        (``transformWithStateInPandas`` + RocksDB state store, see
        streaming/stateful2.py): the stream re-emits each user's refreshed
        state every micro-batch (Update mode); the LAST emission per user
        — selected via max(struct) on the strictly-increasing event count
        — must equal the batch per-user aggregate."""
        import hashlib

        from spark_data_engineering_spark.streaming.stateful2 import (
            running_user_totals,
        )

        src = f"{sf_dir}/events.parquet"
        stat = os.stat(src)
        digest = hashlib.md5(
            f"tws:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}".encode()
        ).hexdigest()[:16]
        staged = f"/tmp/spark_de_stream_input/{digest}"
        if not os.path.isdir(staged):
            load_table(spark, "events", sf_dir).select(
                "user_id", "value", "ts"
            ).repartition(8).write.mode("overwrite").parquet(staged)
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        try:
            stream = (
                spark.readStream.schema("user_id bigint, value double, ts timestamp")
                .option("maxFilesPerTrigger", 2)
                .parquet(staged)
            )
            name = "streaming_tws_gate"
            q = (
                running_user_totals(stream)
                .writeStream.outputMode("update")
                .format("memory")
                .queryName(name)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        last = F.max(F.struct("n_events", "total_value")).alias("s")
        return (
            spark.table(name)
            .groupBy("user_id")
            .agg(last)
            .select(
                "user_id",
                F.col("s.n_events").alias("n_events"),
                NR.round2(F.col("s.total_value")).alias("total_value"),
            )
        )
