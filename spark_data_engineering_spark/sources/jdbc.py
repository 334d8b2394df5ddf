"""JDBC upstream source — parity with the reference's Postgres extraction
(reference etl/utils/database.py:9-38: one ``spark.read.jdbc`` per table,
connection details from environment variables).

This environment has no JDBC driver or database, so the adapter is
config-construction + a guarded load; the driver testdata path
(sources/tables.py) is the live source. In a real deployment the only
change is setting the UPSTREAM_* environment variables and shipping the
driver jar.

Scale notes the reference ignored (SURVEY.md §4 "Predicate pushdown to
JDBC: not done — full-table JDBC reads"):
- ``partition_column``/``num_partitions`` split the read into parallel
  range queries instead of one connection pulling the whole table.
- Filters applied before an action push down into the generated SQL
  (Catalyst JDBC pushdown), so bronze extraction reads only what the
  pipeline needs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def jdbc_url() -> str:
    host = os.environ.get("UPSTREAM_HOST", "localhost")
    port = os.environ.get("UPSTREAM_PORT", "5432")
    db = os.environ.get("UPSTREAM_DATABASE", "upstream")
    return f"jdbc:postgresql://{host}:{port}/{db}"


def connection_properties() -> dict[str, str]:
    return {
        "user": os.environ.get("UPSTREAM_USERNAME", ""),
        "password": os.environ.get("UPSTREAM_PASSWORD", ""),
        "driver": "org.postgresql.Driver",
    }


def get_upstream_table(
    table_name: str,
    spark: SparkSession,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """Read one upstream table over JDBC (reference database.py:27-38
    signature, plus the parallel-read bounds the reference lacked)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", jdbc_url())
        .option("dbtable", table_name)
        .options(**connection_properties())
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return reader.load()
