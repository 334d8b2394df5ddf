"""Source-format breadth under the correctness gate: the same hourly
aggregation must produce the same hash whether the events arrive as
parquet (the native testdata), JSON-lines (how crawl/event feeds
actually land), or ORC (the other columnar format Spark ships).

Each query stages a one-time converted copy of the events table keyed
on the source file's identity, reads it back with an EXPLICIT schema
(never schema inference — at 100 TB an inference pass is a full extra
scan, and inferred types drift between files), and runs the identical
aggregation. Timestamps cross the JSON boundary as ISO-8601 strings
(JSON has no timestamp type) and are parsed back with to_timestamp —
the gate proves the round-trip is lossless at micros precision."""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_data_engineering_spark.functions import numeric as NR
from spark_data_engineering_spark.registry import query
from spark_data_engineering_spark.sources import load_table

_HOURLY_ORACLE = """
    SELECT date_trunc('hour', ts) AS hour,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           FLOOR((SUM(value)) * 100 + 0.5) / 100 AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """


def _staged(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    src = f"{sf_dir}/events.parquet"
    stat = os.stat(src)
    digest = hashlib.md5(
        f"{fmt}:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}".encode()
    ).hexdigest()[:16]
    staged = f"/tmp/spark_de_fmt/{fmt}/{digest}"
    if not os.path.isdir(staged):
        ev = load_table(spark, "events", sf_dir)
        if fmt in ("json", "csv"):
            # neither format carries a timestamp type: ship ISO strings
            ev = ev.withColumn(
                "ts", F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
            )
        w = ev.repartition(4).write.mode("overwrite")
        if fmt == "csv":
            w = w.option("quote", '"').option("escape", '"')
        w.format(fmt).save(staged)
    return staged


def _hourly(df: DataFrame) -> DataFrame:
    return (
        df.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            NR.round2(F.sum("value")).alias("sum_value"),
        )
    )


@query("jsonl_events_hourly_stats", oracle=_HOURLY_ORACLE)
def jsonl_events_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events round-tripped through JSON-lines (explicit schema, ISO
    timestamp strings parsed back to micros) must aggregate to the same
    hash as the parquet original."""
    staged = _staged(spark, sf_dir, "json")
    schema = (
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string"
    )
    ev = (
        spark.read.schema(schema)
        .json(staged)
        .withColumn("ts", F.to_timestamp("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
    )
    return _hourly(ev)


@query("orc_events_hourly_stats", oracle=_HOURLY_ORACLE)
def orc_events_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same aggregation over an ORC restage — ORC keeps native
    timestamps, so no string round-trip is involved; this pins the
    format-agnostic reader path (predicate/column pushdown works for
    ORC like parquet)."""
    staged = _staged(spark, sf_dir, "orc")
    ev = spark.read.orc(staged)
    return _hourly(ev)


@query("csv_events_hourly_stats", oracle=_HOURLY_ORACLE)
def csv_events_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same aggregation over a CSV restage — quoted fields protect the
    embedded-JSON props column, timestamps travel as ISO strings. CSV is
    the rawest feed format a pipeline meets; explicit schema + explicit
    timestamp format keep the read single-pass and type-stable."""
    staged = _staged(spark, sf_dir, "csv")
    schema = (
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string"
    )
    ev = (
        spark.read.schema(schema)
        .option("header", "false")
        .option("quote", '"')
        .option("escape", '"')
        .csv(staged)
        .withColumn("ts", F.to_timestamp("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
    )
    return _hourly(ev)


@query("xml_events_hourly_stats", oracle=_HOURLY_ORACLE)
def xml_events_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events round-tripped through XML (round 6 — Spark 4's built-in
    XML source, the enterprise-feed format): staged once with
    ``rowTag`` records and ISO timestamp strings (XML carries no
    timestamp type, same contract as the JSON/CSV variants), read back
    with an EXPLICIT schema (inference on XML is an extra full scan
    plus type drift), parsed to micros, and aggregated — must hash the
    same oracle as the parquet original, proving the round-trip
    lossless."""
    src = f"{sf_dir}/events.parquet"
    stat = os.stat(src)
    digest = hashlib.md5(
        f"xml:{sf_dir}:{stat.st_mtime_ns}:{stat.st_size}".encode()
    ).hexdigest()[:16]
    staged = f"/tmp/spark_de_fmt/xml/{digest}"
    if not os.path.isdir(staged):
        ev = load_table(spark, "events", sf_dir).withColumn(
            "ts", F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        )
        (
            ev.repartition(4)
            .write.mode("overwrite")
            .format("xml")
            .option("rootTag", "events")
            .option("rowTag", "event")
            .save(staged)
        )
    schema = (
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string"
    )
    ev = (
        spark.read.schema(schema)
        .format("xml")
        .option("rowTag", "event")
        .load(staged)
        .withColumn("ts", F.to_timestamp("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
    )
    return _hourly(ev)
