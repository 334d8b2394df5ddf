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


@query(
    "tpch_q4_priority_exists",
    oracle="""
    SELECT o.o_orderpriority AS orderpriority,
           CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority
    """,
)
def tpch_q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS decorrelated to a left-semi join (the dataset has
    no commit/receipt dates, so 'late' is adapted to a returned line).
    The semi join shuffles on orderkey but carries only the join key from
    the probe side — at 100 TB the lineitem side is projected to one
    column before the exchange."""
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    returned = (
        load_table(spark, "lineitem", sf_dir)
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(returned, o.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy(F.col("o_orderpriority").alias("orderpriority"))
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_name AS name,
           FLOOR((SUM(l.l_extendedprice * (1 - l.l_discount))) * 100 + 0.5) / 100 AS revenue,
           c.c_acctbal AS acctbal, n.n_name AS nation
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, custkey ASC
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: returned-item revenue per customer, top 20. lineitem⋈orders
    shuffles on orderkey; customer and nation broadcast; the top-k is
    TakeOrderedAndProject (no global sort of the aggregate)."""
    c = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    n = load_table(spark, "nation", sf_dir)
    return (
        li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            NR.round2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("custkey").asc())
        .limit(20)
        .select("custkey", "name", "revenue", "acctbal", "nation")
    )


@query(
    "tpch_q12_priority_classes",
    oracle="""
    SELECT l.l_returnflag AS returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_returnflag
    """,
)
def tpch_q12_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: conditional CASE aggregation after a fact-fact join
    (shipmode column doesn't exist; returnflag is the grouping analog).
    Both CASE sums evaluate in one pass of the joined rows — one hash
    aggregate, no second scan."""
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderpriority")
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.select("l_orderkey", "l_returnflag")
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
          FROM customer c
          LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                            AND o.o_orderpriority <> '5-LOW'
          GROUP BY c.c_custkey) t
    GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: order-count-per-customer histogram via left outer join with
    an ON-clause filter (customers with zero qualifying orders count as
    0, not dropped). Two aggregations: the first shuffles on custkey,
    the second on the tiny count domain."""
    c = load_table(spark, "customer", sf_dir).select("c_custkey")
    o = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderpriority") != "5-LOW")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "tpch_q14_promo_effect",
    oracle="""
    SELECT FLOOR((100.0 * SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                              THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END)
                  / SUM(l.l_extendedprice * (1 - l.l_discount))) * 100 + 0.5) / 100
           AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: promo revenue share for one month. part broadcasts into the
    date-pruned lineitem scan; the ratio is two sums from the same hash
    aggregate (single pass)."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = load_table(spark, "part", sf_dir).select("p_partkey", "p_type")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), disc_price).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            NR.round2(F.lit(100.0) * F.sum(promo) / F.sum(disc_price)).alias(
                "promo_revenue_pct"
            )
        )
    )


@query(
    "tpch_q17_small_qty_revenue",
    oracle="""
    SELECT FLOOR((SUM(l.l_extendedprice) / 7.0) * 100 + 0.5) / 100 AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#11'
      AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = p.p_partkey)
    """,
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: correlated scalar subquery (per-part average quantity)
    decorrelated to an aggregate + broadcast join-back. The brand filter
    cuts parts ~25x before anything touches lineitem, so the per-part
    threshold table is tiny and broadcasts; lineitem is scanned once per
    side but never shuffled. Quantities are integer-valued doubles, so
    the average is bit-identical across engines regardless of partial-
    aggregation order (exact integer sums)."""
    parts = (
        load_table(spark, "part", sf_dir)
        .filter(F.col("p_brand") == "Brand#11")
        .select("p_partkey")
    )
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand_li = li.join(F.broadcast(parts), li.l_partkey == F.col("p_partkey"))
    thresholds = brand_li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        brand_li.join(F.broadcast(thresholds), F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(NR.round2(F.sum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


@query(
    "tpch_q18_volume_customers",
    oracle="""
    SELECT c.c_name AS name, c.c_custkey AS custkey, o.o_orderkey AS orderkey,
           DATE_TRUNC('day', o.o_orderdate) AS order_date,
           o.o_totalprice AS totalprice,
           FLOOR((SUM(l.l_quantity)) * 100 + 0.5) / 100 AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey,
             DATE_TRUNC('day', o.o_orderdate), o.o_totalprice
    ORDER BY totalprice DESC, orderkey ASC
    LIMIT 100
    """,
)
def tpch_q18_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: IN-subquery over a HAVING aggregate. The qualifying-order
    set is tiny after the >300 threshold, so it broadcasts into both the
    orders probe and the lineitem re-read — no full-size shuffle
    anywhere. Quantity sums are exact (integer-valued doubles)."""
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_quantity")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    o = load_table(spark, "orders", sf_dir).join(
        F.broadcast(big_orders), F.col("o_orderkey") == F.col("big_orderkey")
    )
    c = load_table(spark, "customer", sf_dir).select("c_custkey", "c_name")
    joined = (
        li.join(F.broadcast(o.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")),
                li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
    )
    return (
        joined.groupBy(
            F.col("c_name").alias("name"),
            F.col("c_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.date_trunc("day", F.col("o_orderdate")).alias("order_date"),
            F.col("o_totalprice").alias("totalprice"),
        )
        .agg(NR.round2(F.sum("l_quantity")).alias("total_qty"))
        .orderBy(F.col("totalprice").desc(), F.col("orderkey").asc())
        .limit(100)
        .select("name", "custkey", "orderkey", "order_date", "totalprice", "total_qty")
    )


@query(
    "tpch_q19_disjunctive_revenue",
    oracle="""
    SELECT FLOOR((COALESCE(SUM(l.l_extendedprice * (1 - l.l_discount)), 0)) * 100 + 0.5) / 100
           AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: OR-of-ANDs spanning both join sides. Catalyst extracts the
    common single-side implications (brand IN (...) onto the part scan,
    quantity BETWEEN 1 AND 30 onto the lineitem scan) as pushed filters;
    the residual disjunction evaluates post-join in codegen."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).select("p_partkey", "p_brand", "p_size")
    qty, size, brand = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((brand == "Brand#12") & size.between(1, 5) & qty.between(1, 11))
        | ((brand == "Brand#23") & size.between(1, 10) & qty.between(10, 20))
        | ((brand == "Brand#34") & size.between(1, 15) & qty.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            NR.round2(
                F.coalesce(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), F.lit(0.0))
            ).alias("revenue")
        )
    )


@query(
    "tpch_q21_sole_returned_supplier",
    oracle="""
    SELECT s.s_name AS supp_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, supp_name ASC
    LIMIT 10
    """,
)
def tpch_q21_sole_returned_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: correlated EXISTS + NOT EXISTS self-joins on the fact
    table ('late' adapted to returned lines, per-dataset columns) —
    reformulated single-pass. A line qualifies iff its order has >= 2
    distinct suppliers but exactly ONE supplier with returned lines (the
    line's own). So: aggregate lineitem once per (orderkey, suppkey)
    (map-side partial agg shrinks the shuffle to ~one row per
    order-supplier), roll up per order, keep orders with n_supp >= 2 and
    n_ret_supp == 1, and credit that sole supplier with its returned-line
    count. One lineitem scan replaces the previous semi + anti
    self-joins (three scans); measured 4.05s -> ~1s at sf0.1."""
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_suppkey", "l_returnflag")
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    s = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    per_order_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.count(F.when(F.col("l_returnflag") == "R", F.lit(1))).alias("r_lines")
    )
    per_order = per_order_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum((F.col("r_lines") > 0).cast("int")).alias("n_ret_supp"),
        # with n_ret_supp == 1 there is exactly one non-null struct; max picks it
        F.max(
            F.when(F.col("r_lines") > 0, F.struct("l_suppkey", "r_lines"))
        ).alias("sole"),
    )
    qual = (
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_ret_supp") == 1))
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .select(F.col("sole.l_suppkey").alias("l_suppkey"), F.col("sole.r_lines").alias("r_lines"))
    )
    return (
        qual.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy(F.col("s_name").alias("supp_name"))
        .agg(F.sum("r_lines").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("supp_name").asc())
        .limit(10)
    )


@query(
    "tpch_q22_dormant_customers",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           FLOOR((SUM(c.c_acctbal)) * 100 + 0.5) / 100 AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_mktsegment
    """,
)
def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: uncorrelated scalar subquery (average positive
    balance) + NOT EXISTS anti join (no urgent orders; phone-prefix
    filter has no column here, mktsegment is the grouping analog). The
    1-row average cross-joins as a broadcast nested loop — no driver
    collect(); the anti join projects orders to one column pre-shuffle."""
    c = load_table(spark, "customer", sf_dir).select("c_custkey", "c_acctbal", "c_mktsegment")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("avg_positive_bal"))
    )
    urgent = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_positive_bal"))
        .join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("numcust"),
            NR.round2(F.sum("c_acctbal")).alias("totacctbal"),
        )
    )
