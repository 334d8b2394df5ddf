"""TPC-H-shaped benchmark queries adapted to the driver testdata columns.

Public benchmark query shapes (TPC-H specification, tpc.org) — the
standard OLAP plan patterns: scan-heavy multi-agg (Q1), selective
filter-sum (Q6), join + group + top-k (Q3), and a 6-way snowflake join
(Q5). These exercise the optimizer paths that matter at 100 TB:
predicate pushdown into the parquet scan, broadcast vs shuffle join
selection, partial aggregation, and TakeOrderedAndProject for top-k.

Date literals are shifted to this dataset's 1995-2001 order window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_data_engineering_spark.functions import numeric as NR
from spark_data_engineering_spark.registry import query
from spark_data_engineering_spark.sources import load_table


@query(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag AS returnflag,
           l_linestatus AS linestatus,
           FLOOR((SUM(l_quantity)) * 100 + 0.5) / 100 AS sum_qty,
           FLOOR((SUM(l_extendedprice)) * 100 + 0.5) / 100 AS sum_base_price,
           FLOOR((SUM(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS sum_disc_price,
           FLOOR((SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 100 + 0.5) / 100 AS sum_charge,
           FLOOR((AVG(l_quantity)) * 100 + 0.5) / 100 AS avg_qty,
           FLOOR((AVG(l_extendedprice)) * 100 + 0.5) / 100 AS avg_price,
           FLOOR((AVG(l_discount)) * 10000 + 0.5) / 10000 AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1: full-scan multi-aggregate — the partial-aggregation stress
    test. One shuffle of 6 groups x partials; everything else map-side."""
    li = load_table(spark, "lineitem", sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_linestatus").alias("linestatus"),
        )
        .agg(
            NR.round2(F.sum("l_quantity")).alias("sum_qty"),
            NR.round2(F.sum("l_extendedprice")).alias("sum_base_price"),
            NR.round2(F.sum(disc_price)).alias("sum_disc_price"),
            NR.round2(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
            NR.round2(F.avg("l_quantity")).alias("avg_qty"),
            NR.round2(F.avg("l_extendedprice")).alias("avg_price"),
            NR.round4(F.avg("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT FLOOR((COALESCE(SUM(l_extendedprice * l_discount), 0)) * 100 + 0.5) / 100 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: selective filter + global sum — the predicate-pushdown test
    (all four predicates reach the parquet scan as PushedFilters)."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            NR.round2(
                F.coalesce(F.sum(F.col("l_extendedprice") * F.col("l_discount")), F.lit(0.0))
            ).alias("revenue")
        )
    )


@query(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey AS orderkey,
           FLOOR((SUM(l.l_extendedprice * (1 - l.l_discount))) * 100 + 0.5) / 100 AS revenue,
           DATE_TRUNC('day', o.o_orderdate) AS order_date
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, DATE_TRUNC('day', o.o_orderdate)
    ORDER BY revenue DESC, orderkey ASC
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: selective dim filter -> join -> agg -> top-k. customer
    broadcast; orders/lineitem shuffle-join on orderkey; top-k runs as
    TakeOrderedAndProject (no global sort)."""
    c = load_table(spark, "customer", sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey")), o.o_custkey == F.col("c_custkey"))
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.date_trunc("day", F.col("o_orderdate")).alias("order_date"),
        )
        .agg(
            NR.round2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("orderkey").asc())
        .limit(10)
        .select("orderkey", "revenue", "order_date")
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           FLOOR((SUM(l.l_extendedprice * (1 - l.l_discount))) * 100 + 0.5) / 100 AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND c.c_nationkey = s.s_nationkey
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: 6-way snowflake join with a same-nation theta condition.
    region/nation/supplier/customer broadcast; the lineitem-orders join
    is the only shuffle."""
    c = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    return (
        li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r.select("r_regionkey")), n.n_regionkey == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            NR.round2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue")
        )
    )
