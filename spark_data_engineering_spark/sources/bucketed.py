"""Bucketed tables: co-located storage for shuffle-free big-big joins.

At 100 TB the lineitem-orders join is the dominant shuffle in every
report (queries/reports.py, queries/tpch.py). Bucketing both fact tables
by the join key at write time removes that shuffle permanently: Spark's
bucket-aware scan feeds SortMergeJoin directly, partition-for-partition.

This module wraps the write/read pair; the test asserts the join plan
contains no Exchange. The same two-line change applies to any persistent
deployment (Delta/Iceberg keep the semantics with their own clustering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    num_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.
    Sorting within buckets lets SortMergeJoin skip its sort stage too."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_key)
    if sort:
        writer = writer.sortBy(bucket_key)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
