"""TPC-H query shapes 2, 7, 8, 9, 11, 15, 16, 20 — completing all 22.

Public benchmark shapes (TPC-H specification, tpc.org) adapted to this
dataset's columns. The testdata has no ``partsupp`` table, so the four
partsupp-centric queries (Q2, Q11, Q16, Q20) derive the part-supplier
relation from ``lineitem`` — each keeps its defining plan shape:

- Q2  : correlated MIN subquery decorrelated to agg + join-back
- Q7  : two-role dimension join (nation as both supplier and customer)
- Q8  : market-share ratio of conditional over total sum, per year
- Q9  : profit expression spanning fact and dim columns, group by
        nation x year
- Q11 : grouped HAVING against an uncorrelated scalar aggregate of the
        same relation
- Q15 : view-style aggregate + scalar MAX subquery join-back
- Q16 : NOT IN exclusion + COUNT(DISTINCT) rollup
- Q20 : nested IN subqueries over a grouped HAVING

Scale notes (100 TB): every query keeps dimension joins broadcast and
fact-fact joins keyed on the natural shuffle key (orderkey /
partkey+suppkey); scalar subqueries are 1-row broadcasts, never driver
collects. Double sums that feed comparisons are either exact (integer-
valued quantities) or rounded to cents on both engines before the
comparison (see functions/numeric.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_data_engineering_spark.functions import numeric as NR
from spark_data_engineering_spark.registry import query
from spark_data_engineering_spark.sources import load_table


def _nation_region(spark: SparkSession, sf_dir: str, region: str) -> DataFrame:
    """Nation keys restricted to one region (tiny: <= 25 rows)."""
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir).filter(F.col("r_name") == region)
    return n.join(F.broadcast(r.select("r_regionkey")), n.n_regionkey == F.col("r_regionkey")).select(
        "n_nationkey", "n_name"
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS supply_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    eu AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE')
    SELECT s.s_acctbal AS acctbal, s.s_name AS supp_name, s.n_name AS nation,
           p.p_partkey AS partkey, p.p_name AS part_name,
           FLOOR((c.supply_cost) * 100 + 0.5) / 100 AS supply_cost
    FROM part p
    JOIN cost c ON c.l_partkey = p.p_partkey
    JOIN eu s ON s.s_suppkey = c.l_suppkey
    WHERE p.p_size <= 10 AND p.p_type = 'LARGE'
      AND c.supply_cost = (SELECT MIN(c2.supply_cost)
                           FROM cost c2 JOIN eu s2 ON s2.s_suppkey = c2.l_suppkey
                           WHERE c2.l_partkey = p.p_partkey)
    ORDER BY acctbal DESC, supp_name ASC, partkey ASC
    LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: cheapest qualifying supplier per part. The per-(part,
    supplier) unit cost comes from lineitem (no partsupp table); the
    correlated MIN decorrelates to a per-part aggregate joined back by
    broadcast. MIN of identical IEEE divisions is order-independent, so
    the equality join is bit-exact across engines. Both the main query
    and the correlated subquery range only over EU-supplier costs of the
    size/type-filtered parts, so BOTH semi-joins push below the cost
    aggregation — at 100 TB the only shuffle is the (partkey, suppkey)
    aggregate over ~0.7% of lineitem instead of all of it."""
    eu = (
        load_table(spark, "supplier", sf_dir)
        .join(
            F.broadcast(_nation_region(spark, sf_dir, "EUROPE")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = (
        load_table(spark, "part", sf_dir)
        .filter((F.col("p_size") <= 10) & (F.col("p_type") == "LARGE"))
        .select("p_partkey", "p_name")
    )
    li = (
        load_table(spark, "lineitem", sf_dir)
        .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
        .join(F.broadcast(parts.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(F.broadcast(eu.select("s_suppkey")), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supply_cost")
    )
    eu_cost = cost.join(F.broadcast(eu), cost.l_suppkey == F.col("s_suppkey")).join(
        F.broadcast(parts), cost.l_partkey == F.col("p_partkey")
    )
    min_cost = eu_cost.groupBy(F.col("l_partkey").alias("m_partkey")).agg(
        F.min("supply_cost").alias("min_cost")
    )
    return (
        eu_cost.join(
            F.broadcast(min_cost),
            (F.col("l_partkey") == F.col("m_partkey"))
            & (F.col("supply_cost") == F.col("min_cost")),
        )
        .select(
            F.col("s_acctbal").alias("acctbal"),
            F.col("s_name").alias("supp_name"),
            F.col("n_name").alias("nation"),
            F.col("p_partkey").alias("partkey"),
            F.col("p_name").alias("part_name"),
            NR.round2(F.col("supply_cost")).alias("supply_cost"),
        )
        .orderBy(F.col("acctbal").desc(), F.col("supp_name").asc(), F.col("partkey").asc())
        .limit(100)
    )


@query(
    "tpch_q7_nation_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(YEAR(l.l_shipdate) AS INT) AS l_year,
           FLOOR((SUM(l.l_extendedprice * (1 - l.l_discount))) * 100 + 0.5) / 100 AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, CAST(YEAR(l.l_shipdate) AS INT)
    """,
)
def tpch_q7_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: bilateral trade volume between two nations by year. nation
    joins twice under different roles (supplier side, customer side) —
    both broadcast, as do supplier and customer after their nation
    filters. The disjunctive nation-pair predicate evaluates post-join
    in codegen; only lineitem x orders shuffles (on orderkey)."""
    n = load_table(spark, "nation", sf_dir).filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    s = (
        load_table(spark, "supplier", sf_dir)
        .join(F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
              F.col("s_nationkey") == F.col("sn_key"))
        .select("s_suppkey", "supp_nation")
    )
    c = (
        load_table(spark, "customer", sf_dir)
        .join(F.broadcast(n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))),
              F.col("c_nationkey") == F.col("cn_key"))
        .select("c_custkey", "cust_nation")
    )
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            NR.round2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue")
        )
    )


@query(
    "tpch_q8_market_share",
    oracle="""
    SELECT CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
           FLOOR((SUM(CASE WHEN n2.n_name = 'NATION_5'
                           THEN l.l_extendedprice * (1 - l.l_discount)
                           ELSE 0.0 END)
                  / SUM(l.l_extendedprice * (1 - l.l_discount))) * 10000 + 0.5) / 10000
           AS mkt_share
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
    JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
    JOIN region r ON n1.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY CAST(YEAR(o.o_orderdate) AS INT)
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: one nation's share of regional order volume per year — a
    conditional-sum / total-sum ratio from a single hash aggregate over
    an 8-way snowflake. Every dimension broadcasts (customer pre-filtered
    to the ASIA region, part to one type); lineitem x orders is the sole
    shuffle. Both sums come from the same pass — no second scan for the
    denominator."""
    asia_cust = (
        load_table(spark, "customer", sf_dir)
        .join(
            F.broadcast(_nation_region(spark, sf_dir, "ASIA")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp_nation = (
        load_table(spark, "supplier", sf_dir)
        .join(
            F.broadcast(load_table(spark, "nation", sf_dir)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    p = load_table(spark, "part", sf_dir).filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir)
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o.select("o_orderkey", "o_custkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(asia_cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            NR.round4(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", volume).otherwise(F.lit(0.0)))
                / F.sum(volume)
            ).alias("mkt_share")
        )
    )


@query(
    "tpch_q9_product_type_profit",
    oracle="""
    SELECT n.n_name AS nation, CAST(YEAR(l.l_shipdate) AS INT) AS o_year,
           FLOOR((SUM(l.l_extendedprice * (1 - l.l_discount)
                      - 0.5 * p.p_retailprice * l.l_quantity)) * 100 + 0.5) / 100 AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, CAST(YEAR(l.l_shipdate) AS INT)
    """,
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit by supplier nation x year for parts matching a
    name pattern. Cost side adapted (no partsupp.ps_supplycost): cost =
    0.5 * p_retailprice per unit. The LIKE-filtered part and the
    supplier->nation chain broadcast into a single lineitem pass — at
    100 TB this is one scan + one small-key shuffle (25 nations x ~7
    years), with partial aggregation doing nearly all the reduction
    map-side. The profit expression is written with identical operation
    order in both engines so the cent-rounding matches."""
    p = (
        load_table(spark, "part", sf_dir)
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    sn = (
        load_table(spark, "supplier", sf_dir)
        .join(
            F.broadcast(load_table(spark, "nation", sf_dir)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount", "l_quantity"
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.5) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(sn), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year"))
        .agg(NR.round2(F.sum(profit)).alias("sum_profit"))
    )


@query(
    "tpch_q11_important_stock",
    oracle="""
    SELECT l.l_partkey AS partkey,
           FLOOR((SUM(l.l_quantity)) * 100 + 0.5) / 100 AS stock_qty
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_3'
    GROUP BY l.l_partkey
    HAVING SUM(l.l_quantity) >
           (SELECT SUM(l2.l_quantity) * 0.001
            FROM lineitem l2
            JOIN supplier s2 ON l2.l_suppkey = s2.s_suppkey
            JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
            WHERE n2.n_name = 'NATION_3')
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose stock held by one nation's suppliers
    exceeds a fraction of that nation's total (partsupp.availqty adapted
    to lineitem quantity). The grouped aggregate and the scalar total
    aggregate the SAME filtered relation — Spark computes the filtered
    lineitem once (it is a broadcast-filtered scan, cheap to repeat; at
    100 TB you would .persist() the filtered frame instead of re-scan).
    Quantities are integer-valued doubles, so both sums are exact and
    the threshold comparison is deterministic across engines."""
    nation_supp = (
        load_table(spark, "supplier", sf_dir)
        .join(
            F.broadcast(
                load_table(spark, "nation", sf_dir).filter(F.col("n_name") == "NATION_3")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = (
        load_table(spark, "lineitem", sf_dir)
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(F.broadcast(nation_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
    )
    total = li.agg((F.sum("l_quantity") * F.lit(0.001)).alias("qty_threshold"))
    return (
        li.groupBy("l_partkey")
        .agg(F.sum("l_quantity").alias("raw_qty"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("raw_qty") > F.col("qty_threshold"))
        .select(
            F.col("l_partkey").alias("partkey"),
            NR.round2(F.col("raw_qty")).alias("stock_qty"),
        )
    )


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey,
             FLOOR((SUM(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey AS suppkey, s.s_name AS supp_name,
           r.total_revenue AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY suppkey
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) with the maximum quarterly revenue — the view +
    scalar-MAX-subquery shape. Revenue is rounded to cents BEFORE the
    max comparison on both engines, so tie/argmax selection is
    deterministic. The revenue aggregate shuffles on suppkey (small key
    domain); the 1-row max broadcasts back; supplier broadcasts."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = li.groupBy("l_suppkey").agg(
        NR.round2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "total_revenue"
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supp_name"),
            "total_revenue",
        )
        .orderBy("suppkey")
    )


@query(
    "tpch_q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand AS brand, p.p_type AS type, p.p_size AS size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'MEDIUM'
      AND p.p_size IN (1, 3, 7, 14, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0.0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, brand ASC, type ASC, size ASC
    """,
)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct-supplier counts per (brand, type, size) with
    a NOT IN supplier exclusion (complaints filter adapted to negative
    account balance). s_suppkey is never null, so NOT IN == left-anti
    join. COUNT(DISTINCT) expands to a two-phase aggregate: dedup on
    (group keys, suppkey) then count — both shuffles are on pruned
    columns only. part's IN-list and inequality filters push to its
    scan; at 100 TB part broadcasts into lineitem."""
    excluded = (
        load_table(spark, "supplier", sf_dir)
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    p = load_table(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "MEDIUM")
        & (F.col("p_size").isin(1, 3, 7, 14, 23, 36, 45, 49))
    )
    li = load_table(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(excluded), li.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(F.broadcast(p.select("p_partkey", "p_brand", "p_type", "p_size")),
              li.l_partkey == F.col("p_partkey"))
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("brand").asc(),
            F.col("type").asc(),
            F.col("size").asc(),
        )
    )


@query(
    "tpch_q20_part_promotion_suppliers",
    oracle="""
    SELECT s.s_name AS supp_name, s.s_acctbal AS acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
       SELECT l_suppkey FROM lineitem
       WHERE l_partkey IN (SELECT p_partkey FROM part
                           WHERE p_name LIKE 'small%')
         AND l_shipdate >= TIMESTAMP '1997-01-01'
         AND l_shipdate < TIMESTAMP '1998-01-01'
       GROUP BY l_suppkey, l_partkey
       HAVING SUM(l_quantity) > 50)
    ORDER BY supp_name
    """,
)
def tpch_q20_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers who moved heavy volume of a name-matched
    part family in one year (availqty threshold adapted to shipped
    quantity — same nested IN-over-grouped-HAVING plan). The part IN-
    list broadcasts as a semi join into the date-pruned lineitem scan;
    the (suppkey, partkey) aggregate shuffles only qualifying rows; the
    surviving supplier keys semi-join supplier. Quantity sums are exact
    integer-valued doubles, so the HAVING cut is deterministic."""
    parts = (
        load_table(spark, "part", sf_dir)
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    heavy_supp = (
        li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, "supplier", sf_dir)
    return (
        s.join(F.broadcast(heavy_supp), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select(F.col("s_name").alias("supp_name"), F.col("s_acctbal").alias("acctbal"))
        .orderBy("supp_name")
    )
