"""Registry entries that run the full medallion DAG end-to-end — the
pipeline-built reports must hash-match the same SQL the standalone
queries match, proving the DAG runner + node transforms preserve
semantics (reference run_etl.py end-to-end path, SURVEY.md §3 E1)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spark_data_engineering_spark.pipeline import run_reports
from spark_data_engineering_spark.registry import query


@query(
    "pipeline_daily_order_report",
    oracle="""
    SELECT DATE_TRUNC('day', o.o_orderdate) AS "Date",
           FLOOR((SUM(o.o_totalprice)) * 100 + 0.5) / 100 AS "Revenue",
           FLOOR((AVG(o.o_totalprice)) * 100 + 0.5) / 100 AS "Mean Revenue"
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_acctbal > 0
    GROUP BY DATE_TRUNC('day', o.o_orderdate)
    """,
)
def pipeline_daily_order_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship report built through the whole DAG: bronze → fact_orders →
    dim_customer → wide_orders → daily_order_metrics → interface."""
    return run_reports(spark, sf_dir)["daily_order_report"]


@query(
    "pipeline_daily_category_report",
    oracle="""
    SELECT DATE_TRUNC('day', o.o_orderdate) AS "Date",
           p.p_type AS "Product Category",
           FLOOR((AVG(l.l_extendedprice * (1 - l.l_discount) * (1 + l.l_tax)))
               * 100 + 0.5) / 100 AS "Mean Revenue",
           FLOOR((QUANTILE_CONT(
               l.l_extendedprice * (1 - l.l_discount) * (1 + l.l_tax), 0.5))
               * 100 + 0.5) / 100 AS "Median Revenue"
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_acctbal > 0
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY DATE_TRUNC('day', o.o_orderdate), p.p_type
    """,
)
def pipeline_daily_category_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Category report through the DAG incl. the collect_list(struct) →
    explode rollup and the is_active (acctbal > 0) gate."""
    return run_reports(spark, sf_dir)["daily_category_report"]
