"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``spark_data_engineering_spark/queries/*`` and
register themselves into ``spark_data_engineering_spark.registry``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spark_data_engineering_spark import registry

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the daily order report (the reference's primary
    deliverable, reference run_etl.py:9-18) on sf0.001."""
    from spark_data_engineering_spark.queries.reports import daily_order_report

    return daily_order_report(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data extension surface)."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for ops that
    are approximate / not SQL-expressible — rows-only check)."""
    return dict(registry.ORACLES)
