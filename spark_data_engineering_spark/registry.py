"""Query/oracle registry backing ``__spark_entry__.py``.

Each registered query is a callable ``(spark, sf_dir) -> DataFrame``; most
carry an equivalent ANSI-SQL oracle that DuckDB runs on the same parquet
tables (the driver's correctness gate). Queries whose semantics are not
SQL-expressible (LSH bucketing, streaming state) register without an
oracle and get a rows-only check.

Naming contract: every computed column is aliased identically in the Spark
code and the oracle SQL — the driver sorts columns by name before hashing.

Float policy: aggregates over ``double`` columns are rounded (ROUND(x, 2))
on BOTH sides so cross-engine float-summation order can't flip the hash.
Sums of doubles are first cast to DECIMAL where exactness matters.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query (and optional DuckDB oracle SQL) under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side-effects run."""
    from spark_data_engineering_spark.queries import (  # noqa: F401
        dedup,
        events_analytics,
        multimodal,
        pipeline,
        relational,
        reports,
        sampling,
        similarity,
        streaming_q,
        text,
        text2,
        tpch,
        tpch2,
    )
