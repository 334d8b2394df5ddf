"""Relational operator coverage — SURVEY.md §2 inventory plus the
extension surface the reference lacks (§2.6: windows, sorts, limits,
set ops, distinct aggs, grouping sets).

Each query maps one or more reference operators (cited) onto the driver
testdata and carries a DuckDB oracle. Column aliases match the oracle
exactly (the driver hashes after sorting columns by name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from spark_data_engineering_spark.functions import numeric as NR
from spark_data_engineering_spark.registry import query
from spark_data_engineering_spark.sources import load_table


# --- P1/P2/P5/P6/P8: projection, rename, arithmetic derive, cast, filter ---
@query(
    "project_derive_filter",
    oracle="""
    SELECT l_orderkey AS orderkey,
           l_linenumber AS linenumber,
           l_quantity AS qty,
           FLOOR((l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100 AS disc_price,
           FLOOR((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100 + 0.5) / 100 AS charge,
           DATE_TRUNC('day', l_shipdate) AS ship_date
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_returnflag = 'R'
    """,
)
def project_derive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit projection + alias renames + decimal-ish arithmetic + cast
    + predicate filter (reference P1 bronze/order_item.py:165-175,
    P2 dim_category_silver.py:133, P5 fact_order_items_silver.py:99-101,
    P6 daily_order_metrics.py:97-99, P8 bronze/orders.py:155-161).
    Filters + projection push down to the parquet scan."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.filter((F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp")) & (F.col("l_returnflag") == "R"))
        .select(
            F.col("l_orderkey").alias("orderkey"),
            F.col("l_linenumber").alias("linenumber"),
            F.col("l_quantity").alias("qty"),
            NR.round2(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
            NR.round2(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).alias("charge"),
            F.date_trunc("day", F.col("l_shipdate")).alias("ship_date"),
        )
    )


# --- J1/J2: inner equi-join with duplicate-key drop (dim_buyer pattern) ---
@query(
    "dim_customer",
    oracle="""
    SELECT c.c_custkey AS custkey,
           c.c_name AS customer_name,
           c.c_mktsegment AS mktsegment,
           c.c_acctbal AS acctbal,
           n.n_name AS nation_name,
           r.r_name AS region_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def dim_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer dim: inner join + left join chain with alias renames —
    the dim_buyer / dim_product pattern (reference dim_buyer_silver.py:126-132
    J1; dim_product_silver.py:148-158 J3+J4). nation/region broadcast."""
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "inner").join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey, "left"
    )
    return joined.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("n_name").alias("nation_name"),
        F.col("r_name").alias("region_name"),
    )


# --- J6/J7: multi-way name-based joins (wide_order_items pattern) ---
@query(
    "wide_lineitem",
    oracle="""
    SELECT l.l_orderkey AS orderkey,
           l.l_linenumber AS linenumber,
           FLOOR((l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5) / 100 AS revenue,
           o.o_orderstatus AS orderstatus,
           DATE_TRUNC('day', o.o_orderdate) AS order_date,
           p.p_name AS part_name,
           p.p_brand AS part_brand,
           s.s_name AS supplier_name,
           n.n_name AS supplier_nation
    FROM lineitem l
    LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    LEFT JOIN part p ON l.l_partkey = p.p_partkey
    LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
    LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
)
def wide_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The wide_order_items gold table analog: fact left-joined to every
    dim (reference wide_order_items_gold.py:110-124, J6/J7). All dims
    broadcast; the only shuffle-join is lineitem-orders (at 100 TB:
    bucket both by orderkey to eliminate it)."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderstatus", "o_orderdate")
    p = load_table(spark, "part", sf_dir).select("p_partkey", "p_name", "p_brand")
    s = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name", "s_nationkey")
    n = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    wide = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey, "left")
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey, "left")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left")
    )
    return wide.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        NR.round2(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.col("o_orderstatus").alias("orderstatus"),
        F.date_trunc("day", F.col("o_orderdate")).alias("order_date"),
        F.col("p_name").alias("part_name"),
        F.col("p_brand").alias("part_brand"),
        F.col("s_name").alias("supplier_name"),
        F.col("n_name").alias("supplier_nation"),
    )


# --- A3 + G1: collect_list(struct) rollup then explode round-trip ---
@query(
    "collect_explode_roundtrip",
    oracle="""
    SELECT l_orderkey AS orderkey,
           l_partkey AS partkey,
           l_linenumber AS linenumber
    FROM lineitem
    """,
)
def collect_explode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-of-structs rollup per order then explode back to rows —
    the categories-array pattern (reference wide_order_items_gold.py:126-128
    A3; daily_category_metrics.py:121 G1). The round-trip makes the output
    flat and order-insensitive so it hash-matches the plain projection."""
    li = load_table(spark, "lineitem", sf_dir)
    rolled = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list(F.struct("l_partkey", "l_linenumber"))).alias("items")
    )
    return rolled.select(
        F.col("l_orderkey").alias("orderkey"),
        F.explode("items").alias("item"),
    ).select(
        "orderkey",
        F.col("item.l_partkey").alias("partkey"),
        F.col("item.l_linenumber").alias("linenumber"),
    )


# --- A1/A5: group-by aggregates incl. struct group key (unpacked) ---
@query(
    "brand_type_metrics",
    oracle="""
    SELECT p_brand AS brand,
           p_type AS type,
           COUNT(*) AS n_parts,
           FLOOR((SUM(p_retailprice)) * 100 + 0.5) / 100 AS sum_price,
           FLOOR((AVG(p_retailprice)) * 100 + 0.5) / 100 AS mean_price,
           FLOOR((MIN(p_retailprice)) * 100 + 0.5) / 100 AS min_price,
           FLOOR((MAX(p_retailprice)) * 100 + 0.5) / 100 AS max_price
    FROM part
    GROUP BY p_brand, p_type
    """,
)
def brand_type_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregation with a struct-valued group key, unpacked after
    grouping (reference A5 daily_category_metrics.py:121-128 groups by an
    exploded struct; we group by struct then project its fields so the
    output is flat)."""
    p = load_table(spark, "part", sf_dir)
    return (
        p.groupBy(F.struct("p_brand", "p_type").alias("cat"))
        .agg(
            F.count("*").alias("n_parts"),
            NR.round2(F.sum("p_retailprice")).alias("sum_price"),
            NR.round2(F.avg("p_retailprice")).alias("mean_price"),
            NR.round2(F.min("p_retailprice")).alias("min_price"),
            NR.round2(F.max("p_retailprice")).alias("max_price"),
        )
        .select(
            F.col("cat.p_brand").alias("brand"),
            F.col("cat.p_type").alias("type"),
            "n_parts",
            "sum_price",
            "mean_price",
            "min_price",
            "max_price",
        )
    )


# --- A4: global scalar max (latest-partition discovery pattern) ---
@query(
    "global_maxima",
    oracle="""
    SELECT MAX(DATE_TRUNC('day', o_orderdate)) AS max_order_date,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           FLOOR((MAX(o_totalprice)) * 100 + 0.5) / 100 AS max_price
    FROM orders
    """,
)
def global_maxima(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global max/count scalars — the latest-partition discovery idiom
    (reference bronze/orders.py:148-153, A4). In the snapshot store this
    is replaced by partition listing (sources/snapshot.py) to avoid a
    full scan; here it demonstrates the one-row global aggregate."""
    o = load_table(spark, "orders", sf_dir)
    return o.agg(
        F.max(F.date_trunc("day", F.col("o_orderdate"))).alias("max_order_date"),
        F.count("*").alias("n_orders"),
        NR.round2(F.max("o_totalprice")).alias("max_price"),
    )


# --- Extension: window functions (absent from reference, SURVEY §2.6) ---
@query(
    "latest_order_per_customer",
    oracle="""
    SELECT custkey, orderkey, order_date FROM (
        SELECT o_custkey AS custkey, o_orderkey AS orderkey,
               DATE_TRUNC('day', o_orderdate) AS order_date,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number window — latest order per customer with deterministic
    tie-break. One shuffle on custkey; at scale the window and any
    subsequent per-customer agg share that partitioning."""
    o = load_table(spark, "orders", sf_dir)
    w = W.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.date_trunc("day", F.col("o_orderdate")).alias("order_date"),
        )
    )


@query(
    "customer_running_revenue",
    oracle="""
    SELECT o_orderkey AS orderkey,
           o_custkey AS custkey,
           FLOOR((SUM(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100 + 0.5) / 100 AS running_revenue
    FROM orders
    """,
)
def customer_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-sum window per customer (frame-based window agg)."""
    o = load_table(spark, "orders", sf_dir)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_custkey").alias("custkey"),
        NR.round2(F.sum("o_totalprice").over(w)).alias("running_revenue"),
    )


# --- Extension: top-k (sort + limit with deterministic tie-break) ---
@query(
    "top10_customers_by_revenue",
    oracle="""
    SELECT o_custkey AS custkey,
           FLOOR((SUM(o_totalprice)) * 100 + 0.5) / 100 AS revenue
    FROM orders
    GROUP BY o_custkey
    ORDER BY revenue DESC, custkey ASC
    LIMIT 10
    """,
)
def top10_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: agg then orderBy+limit. Spark executes this as
    TakeOrderedAndProject — per-partition top-k then a k-row merge on the
    driver; no global sort materializes even at 100 TB."""
    o = load_table(spark, "orders", sf_dir)
    return (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(NR.round2(F.sum("o_totalprice")).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("custkey").asc())
        .limit(10)
    )


# --- Extension: semi / anti joins ---
@query(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS customer_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS)."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.col("c_custkey").alias("custkey"), F.col("c_name").alias("customer_name")
    )


@query(
    "customers_with_high_value_orders",
    oracle="""
    SELECT c_custkey AS custkey, c_mktsegment AS mktsegment
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    """,
)
def customers_with_high_value_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS) with a pushed-down predicate on the probe."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_totalprice") > 300000).select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        F.col("c_custkey").alias("custkey"), F.col("c_mktsegment").alias("mktsegment")
    )


# --- Extension: set operations ---
@query(
    "segment_set_ops",
    oracle="""
    SELECT custkey, CAST(src AS VARCHAR) AS src FROM (
        SELECT c_custkey AS custkey, 'building_or_rich' AS src
        FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT c_custkey, 'building_or_rich' FROM customer WHERE c_acctbal > 5000
        UNION ALL
        SELECT c_custkey, 'building_and_rich' FROM (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            INTERSECT
            SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        )
        UNION ALL
        SELECT c_custkey, 'building_not_rich' FROM (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            EXCEPT
            SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        )
    )
    """,
)
def segment_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union / unionAll / intersect / except in one labeled result."""
    c = load_table(spark, "customer", sf_dir)
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    either = building.union(rich).distinct().withColumn("src", F.lit("building_or_rich"))
    both = building.intersect(rich).withColumn("src", F.lit("building_and_rich"))
    only = building.exceptAll(rich.distinct()).withColumn("src", F.lit("building_not_rich"))
    return (
        either.unionByName(both)
        .unionByName(only)
        .select(F.col("c_custkey").alias("custkey"), "src")
    )


# --- Extension: distinct aggregation ---
@query(
    "distinct_counts",
    oracle="""
    SELECT l_returnflag AS returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(distinct) aggregation (absent from reference, SURVEY §2.4).
    Spark expands multi-distinct into an Expand + two-phase agg."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n_rows"),
    )


@query(
    "approx_distinct_parts",
    oracle="""
    SELECT l_returnflag AS returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS hll_within_2pct
    FROM lineitem
    GROUP BY 1
    """,
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — the scale path for distinct
    counting. The HLL estimate itself is approximate by design, so the
    oracle-checked contract is the rsd guarantee: the query emits the
    exact count plus a boolean asserting the HLL estimate landed within
    2x the requested rsd (1%); the oracle expects TRUE. A sketch whose
    error bound breaks hash-mismatches the gate."""
    li = load_table(spark, "lineitem", sf_dir)
    # Dedup to (flag, partkey) BEFORE aggregating (r13 optimization):
    # combining countDistinct with approx_count_distinct in one aggregate
    # makes the distinct-agg rewrite key the partial HLL sketch by
    # (flag, partkey) — at rsd=0.01 that is a 1639-word (~13 KB) buffer
    # per distinct pair, ~2.6 GB materialized+shuffled for a 10 MB input
    # (plans/r13/approx_distinct_parts_before.txt: Results [1641 cols]).
    # HLL registers are duplicate- and order-insensitive, so the estimate
    # over the distinct set is bit-identical to the multiset's; the exact
    # count is COUNT over the deduped rows. One narrow-row shuffle + 3
    # final sketches instead of 200k.
    dedup = li.select(
        F.col("l_returnflag").alias("returnflag"), "l_partkey"
    ).distinct()
    return dedup.groupBy("returnflag").agg(
        F.count("l_partkey").alias("exact_parts"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey", 0.01) - F.count("l_partkey")
            )
            <= F.lit(0.02) * F.count("l_partkey")
        ).alias("hll_within_2pct"),
    )


# --- Extension: rollup / grouping sets ---
@query(
    "rollup_flag_status",
    oracle="""
    SELECT l_returnflag AS returnflag,
           l_linestatus AS linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           FLOOR((SUM(l_quantity)) * 100 + 0.5) / 100 AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (absent from reference, SURVEY §2.4)."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.rollup(
        F.col("l_returnflag").alias("returnflag"), F.col("l_linestatus").alias("linestatus")
    ).agg(F.count("*").alias("n_rows"), NR.round2(F.sum("l_quantity")).alias("sum_qty"))


# --- Extension: pivot ---
@query(
    "pivot_status_by_flag",
    oracle="""
    SELECT l_returnflag AS returnflag,
           FLOOR((COALESCE(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 0)) * 100 + 0.5) / 100 AS "O",
           FLOOR((COALESCE(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 0)) * 100 + 0.5) / 100 AS "F"
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pivot_status_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (explicit list avoids the
    distinct-scan a dynamic pivot needs — required at scale)."""
    li = load_table(spark, "lineitem", sf_dir)
    pivoted = (
        li.groupBy(F.col("l_returnflag").alias("returnflag"))
        .pivot("l_linestatus", ["O", "F"])
        .sum("l_quantity")
    )
    return pivoted.select(
        "returnflag",
        NR.round2(F.coalesce(F.col("O"), F.lit(0.0))).alias("O"),
        NR.round2(F.coalesce(F.col("F"), F.lit(0.0))).alias("F"),
    )


# --- Extension: JSON extraction (events.props) ---
@query(
    "events_json_extract",
    oracle="""
    SELECT event_id,
           event_type,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE event_type IN ('purchase', 'signup')
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from a string column (semi-structured path;
    absent from reference — no JSON functions used anywhere, SURVEY §2.2)."""
    e = load_table(spark, "events", sf_dir)
    return e.filter(F.col("event_type").isin("purchase", "signup")).select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )


# --- Extension: time-window aggregation over events (batch form) ---
@query(
    "hourly_event_stats",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           FLOOR((SUM(value)) * 100 + 0.5) / 100 AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def hourly_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation in batch form; the streaming variant
    (streaming/events.py) runs the same logical plan with a watermark."""
    e = load_table(spark, "events", sf_dir)
    return e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(F.count("*").alias("n_events"), NR.round2(F.sum("value")).alias("sum_value"))


# --- S6: the SQL-API surface (spark.sql over registered views) ---------
@query(
    "sql_revenue_by_nation",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
           FLOOR((SUM(o.o_totalprice)) * 100 + 0.5) / 100 AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def sql_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same engine, SQL surface: the query is a spark.sql() string over
    registered temp views (reference S6, run_etl.py:18 — its only SQL).
    Catalyst produces the identical plan either way."""
    from spark_data_engineering_spark.sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name AS nation,
               COUNT(DISTINCT c.c_custkey) AS n_customers,
               FLOOR(SUM(o.o_totalprice) * 100 + 0.5) / 100 AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )


# --- window rank suite + non-equi band join -----------------------------
@query(
    "orders_above_customer_avg",
    oracle="""
    SELECT o_orderkey AS orderkey,
           o_custkey AS custkey,
           FLOOR((o_totalprice) * 100 + 0.5) / 100 AS price,
           FLOOR((AVG(o_totalprice) OVER (PARTITION BY o_custkey)) * 100 + 0.5) / 100
               AS cust_avg
    FROM orders
    QUALIFY o_totalprice > AVG(o_totalprice) OVER (PARTITION BY o_custkey)
    """,
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-comparison pattern (each order vs its customer's
    average) as a single window aggregate — no self-join."""
    o = load_table(spark, "orders", sf_dir)
    w = W.partitionBy("o_custkey")
    avg = F.avg("o_totalprice").over(w)
    return (
        o.withColumn("cust_avg_raw", avg)
        .filter(F.col("o_totalprice") > F.col("cust_avg_raw"))
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_custkey").alias("custkey"),
            NR.round2(F.col("o_totalprice")).alias("price"),
            NR.round2(F.col("cust_avg_raw")).alias("cust_avg"),
        )
    )


@query(
    "customer_rank_suite",
    oracle="""
    SELECT c_custkey AS custkey,
           c_mktsegment AS mktsegment,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           FLOOR((PERCENT_RANK() OVER w) * 10000 + 0.5) / 10000 AS prnk
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
    QUALIFY rnk <= 5
    """,
)
def customer_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / percent_rank per segment, top-5 (deterministic
    tie-break on key)."""
    c = load_table(spark, "customer", sf_dir)
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return (
        c.select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_mktsegment").alias("mktsegment"),
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
            NR.round4(F.percent_rank().over(w)).alias("prnk"),
        )
        .filter(F.col("rnk") <= 5)
    )


@query(
    "quantity_band_join",
    oracle="""
    WITH bands(band, lo, hi) AS (
        VALUES ('tiny', 0.0, 10.0), ('small', 10.0, 20.0),
               ('medium', 20.0, 35.0), ('large', 35.0, 51.0)
    )
    SELECT b.band,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           FLOOR((SUM(l.l_extendedprice)) * 100 + 0.5) / 100 AS revenue
    FROM lineitem l
    JOIN bands b ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
    GROUP BY b.band
    """,
)
def quantity_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range/band) join: lineitem quantities into value bands.
    The band table broadcasts -> BroadcastNestedLoopJoin with the range
    predicate evaluated in codegen; at 100 TB the alternative is
    precomputing the band with a CASE expression — this form keeps the
    bands data-driven."""
    li = load_table(spark, "lineitem", sf_dir)
    bands = spark.createDataFrame(
        [("tiny", 0.0, 10.0), ("small", 10.0, 20.0), ("medium", 20.0, 35.0), ("large", 35.0, 51.0)],
        ["band", "lo", "hi"],
    )
    joined = li.join(
        F.broadcast(bands),
        (li.l_quantity >= bands.lo) & (li.l_quantity < bands.hi),
    )
    return joined.groupBy("band").agg(
        F.count("*").alias("n_items"), NR.round2(F.sum("l_extendedprice")).alias("revenue")
    )


@query(
    "cube_flag_status",
    oracle="""
    SELECT l_returnflag AS returnflag,
           l_linestatus AS linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all 4 combinations of the two dimensions)."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.cube(
        F.col("l_returnflag").alias("returnflag"), F.col("l_linestatus").alias("linestatus")
    ).agg(F.count("*").alias("n_rows"))


@query(
    "grouping_sets_flag_status",
    oracle="""
    SELECT l_returnflag AS returnflag,
           l_linestatus AS linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           FLOOR((SUM(l_extendedprice)) * 100 + 0.5) / 100 AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def grouping_sets_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the non-hierarchical combination
    {(returnflag), (linestatus)} that neither rollup nor cube expresses.
    Spark expands this to one Expand node feeding a single hash
    aggregate, so the fact table is scanned once regardless of how many
    sets are requested (same plan shape at 100 TB: Expand multiplies
    rows 2x pre-shuffle, partial aggregation collapses them before the
    exchange). Complements cube_flag_status / rollup_flag_status
    (reference has no multi-set grouping at all, SURVEY.md §2.4)."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.groupingSets(
            [[F.col("l_returnflag")], [F.col("l_linestatus")]],
            F.col("l_returnflag"),
            F.col("l_linestatus"),
        )
        .agg(
            F.count("*").alias("n_rows"),
            NR.round2(F.sum("l_extendedprice")).alias("revenue"),
        )
        .select(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_linestatus").alias("linestatus"),
            "n_rows",
            "revenue",
        )
    )


@query(
    "daily_revenue_gapfilled",
    oracle="""
    WITH bounds AS (
        SELECT DATE_TRUNC('day', MIN(o_orderdate)) AS lo,
               DATE_TRUNC('day', MAX(o_orderdate)) AS hi
        FROM orders
    ),
    spine AS (
        SELECT UNNEST(GENERATE_SERIES(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds
    ),
    daily AS (
        SELECT DATE_TRUNC('day', o_orderdate) AS day,
               FLOOR((SUM(o_totalprice)) * 100 + 0.5) / 100 AS revenue
        FROM orders GROUP BY 1
    )
    SELECT s.day, COALESCE(d.revenue, 0.0) AS revenue,
           (d.day IS NULL) AS is_gap
    FROM spine s LEFT JOIN daily d ON s.day = d.day
    """,
)
def daily_revenue_gapfilled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: generate the full date spine with
    sequence+explode, left-join the actual daily aggregate, zero-fill
    gaps. The spine generation is one row -> explode (no driver loop)."""
    o = load_table(spark, "orders", sf_dir)
    daily = (
        o.groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(NR.round2(F.sum("o_totalprice")).alias("revenue"))
    )
    spine = (
        o.agg(
            F.date_trunc("day", F.min("o_orderdate")).alias("lo"),
            F.date_trunc("day", F.max("o_orderdate")).alias("hi"),
        )
        .select(F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day"))
    )
    return spine.join(daily, "day", "left").select(
        "day",
        F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
        F.col("revenue").isNull().alias("is_gap"),
    )


@query(
    "signup_cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, DATE_TRUNC('day', MIN(ts)) AS cohort_day FROM events GROUP BY user_id
    )
    SELECT f.cohort_day,
           CAST(DATE_DIFF('day', f.cohort_day, DATE_TRUNC('day', e.ts)) AS BIGINT) AS day_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_users
    FROM events e
    JOIN firsts f ON e.user_id = f.user_id
    GROUP BY f.cohort_day, DATE_DIFF('day', f.cohort_day, DATE_TRUNC('day', e.ts))
    """,
)
def signup_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, activity
    counted per day-offset. First-touch via one aggregation, then a
    broadcast join back (cohort table is #users rows)."""
    ev = load_table(spark, "events", sf_dir)
    firsts = ev.groupBy("user_id").agg(F.date_trunc("day", F.min("ts")).alias("cohort_day"))
    return (
        ev.join(F.broadcast(firsts), "user_id")
        .withColumn("day_offset", F.datediff(F.date_trunc("day", "ts"), F.col("cohort_day")).cast("bigint"))
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@query(
    "approx_quantiles_lineitem",
    oracle="""
    SELECT l_returnflag AS returnflag,
           FLOOR(quantile_cont(l_extendedprice, 0.25) * 100 + 0.5) / 100 AS q25,
           FLOOR(quantile_cont(l_extendedprice, 0.50) * 100 + 0.5) / 100 AS q50,
           FLOOR(quantile_cont(l_extendedprice, 0.75) * 100 + 0.5) / 100 AS q75
    FROM lineitem
    GROUP BY 1
    """,
)
def approx_quantiles_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quartiles as scalar columns (SURVEY §2.4 A2 percentile
    semantics). Exact ``percentile`` (linear interpolation — verified
    bit-identical to DuckDB quantile_cont at sf0.01) so the oracle can
    hash-match; ``percentile_approx(col, p, 10000)`` is the documented
    at-scale swap (single-pass GK sketch, no full sort)."""
    li = load_table(spark, "lineitem", sf_dir)
    # r13 optimization (guide §2.3): one array-percentile aggregate
    # instead of three scalar ones — a single counts-map buffer per
    # group/partition is built, serialized, shuffled and merged instead
    # of three identical copies (the partial percentile buffer holds a
    # value->count map of the whole column; it dominates this plan's
    # shuffle). Same exact-percentile algorithm over the same buffer, so
    # each quartile is bit-identical to the scalar form.
    q = li.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.expr("percentile(l_extendedprice, array(0.25D, 0.50D, 0.75D))").alias("_q")
    )
    return q.select(
        "returnflag",
        NR.round2(F.col("_q")[0]).alias("q25"),
        NR.round2(F.col("_q")[1]).alias("q50"),
        NR.round2(F.col("_q")[2]).alias("q75"),
    )


@query(
    "daily_revenue_anomalies",
    oracle="""
    WITH d AS (SELECT DATE_TRUNC('day', o_orderdate) AS day,
                      SUM(o_totalprice) AS rev
               FROM orders GROUP BY 1)
    SELECT day,
           FLOOR(rev * 100 + 0.5) / 100 AS revenue,
           FLOOR(((rev - AVG(rev) OVER ()) / STDDEV_SAMP(rev) OVER ()) * 100 + 0.5) / 100
             AS z_score
    FROM d
    """,
)
def daily_revenue_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monitoring-grade anomaly scoring: z-score of each day's revenue
    against the full history (the check a pipeline runs before
    publishing a daily metric). The global window looks like a red flag,
    but it runs AFTER the per-day aggregation — a few thousand rows no
    matter the input scale, so the single-partition window is fine;
    the heavy lifting (daily sums) shuffles normally."""
    o = load_table(spark, "orders", sf_dir)
    daily = o.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    w = W.partitionBy()
    return daily.select(
        "day",
        NR.round2(F.col("rev")).alias("revenue"),
        NR.round2(
            (F.col("rev") - F.avg("rev").over(w)) / F.stddev_samp("rev").over(w)
        ).alias("z_score"),
    )


@query(
    "customer_value_quartiles",
    oracle="""
    SELECT c_mktsegment AS segment, q AS quartile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           FLOOR((AVG(c_acctbal)) * 100 + 0.5) / 100 AS avg_bal
    FROM (SELECT c_mktsegment, c_acctbal,
                 CAST(NTILE(4) OVER (PARTITION BY c_mktsegment
                                     ORDER BY c_acctbal ASC, c_custkey ASC) AS INT) AS q
          FROM customer) t
    GROUP BY c_mktsegment, q
    """,
)
def customer_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE bucketing: balance quartiles within each market segment,
    then per-quartile stats. The window order includes the unique
    custkey so tile assignment is total-ordered — deterministic across
    engines and partitionings (ntile over a non-unique order is not)."""
    c = load_table(spark, "customer", sf_dir)
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc())
    return (
        c.select(
            F.col("c_mktsegment").alias("segment"),
            "c_acctbal",
            F.ntile(4).over(w).alias("quartile"),
        )
        .groupBy("segment", "quartile")
        .agg(
            F.count("*").alias("n_customers"),
            NR.round2(F.avg("c_acctbal")).alias("avg_bal"),
        )
    )


@query(
    "customer_trailing_7d_revenue",
    oracle="""
    SELECT o_custkey AS custkey,
           DATE_TRUNC('day', o_orderdate) AS order_day,
           FLOOR((SUM(o_totalprice) OVER (
                    PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                    RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)) * 100 + 0.5) / 100
             AS trailing_7d_revenue
    FROM orders
    """,
)
def customer_trailing_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval RANGE frame: per order, the customer's revenue over the
    trailing 7 days — rangeBetween on epoch seconds (time-valued frames
    are the window shape batch feature-engineering pipelines live on).
    One shuffle on custkey, then a single sort feeds the sliding frame;
    frame peers (same timestamp) resolve identically in both engines."""
    o = load_table(spark, "orders", sf_dir)
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-604800, 0)
    )
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.date_trunc("day", "o_orderdate").alias("order_day"),
        NR.round2(F.sum("o_totalprice").over(w)).alias("trailing_7d_revenue"),
    )


# --- Extension: skew-safe aggregation under the gate ---
@query(
    "salted_distinct_customers_by_status",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def salted_distinct_customers_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted COUNT(DISTINCT) per (hot) group key — the skew
    pattern for non-partial-aggregable distincts (operators/skew.py):
    stage 1 counts distincts per (key, salt-of-value), stage 2 sums the
    per-salt partials, so no single reducer ever owns a whole hot key.
    The oracle is the plain COUNT(DISTINCT): salting must be invisible
    in the result, only in the shuffle layout. o_orderstatus has ~3
    values over all orders — a genuinely hot key set."""
    from spark_data_engineering_spark.operators.skew import salted_count_distinct

    o = load_table(spark, "orders", sf_dir)
    return salted_count_distinct(o, "o_orderstatus", "o_custkey").select(
        F.col("o_orderstatus"), F.col("n_distinct").cast("bigint").alias("n_distinct")
    )


@query(
    "bloom_pruned_supplier_revenue",
    oracle="""
    SELECT l_returnflag AS returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           FLOOR((SUM(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS revenue
    FROM lineitem
    WHERE l_suppkey IN (
        SELECT s_suppkey
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
    )
    GROUP BY 1
    """,
)
def bloom_pruned_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter star join (operators/bloom.py): revenue from
    lineitems supplied by one nation's suppliers (NATION_7). The supplier-dim key
    set is aggregated into a Bloom bitmap (one small-side pass,
    driver-merged fixed-size words), the lineitem scan is pruned by a
    vectorized membership test BEFORE any shuffle, and the exact semi
    join afterwards removes bloom false positives — so the oracle is the
    plain IN-subquery semi join. At 100 TB this is ~96% of lineitem rows
    dropped before the exchange (1 nation of 25)."""
    from spark_data_engineering_spark.operators.bloom import bloom_pruned_join

    li = load_table(spark, "lineitem", sf_dir)
    sup = load_table(spark, "supplier", sf_dir)
    nat = load_table(spark, "nation", sf_dir).filter(F.col("n_name") == "NATION_7")
    dim = sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey).select("s_suppkey")
    # expected_items: the UNFILTERED supplier row count — a parquet
    # metadata-only job (no scan) that upper-bounds the filtered dim, so
    # no extra distinct-count pass; the bitmap is merely sized for the
    # bound (still KBs) and observed fpp only improves
    pruned = bloom_pruned_join(
        li, dim, "l_suppkey", "s_suppkey", how="semi", fpp=0.01,
        expected_items=sup.count(),
    )
    return pruned.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.count("*").alias("n_items"),
        NR.round2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "revenue"
        ),
    )


@query(
    "salted_join_brand_quantity",
    oracle="""
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           FLOOR((SUM(l_quantity)) * 100 + 0.5) / 100 AS total_qty
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p_brand
    """,
)
def salted_join_brand_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted equi-join (operators/skew.py::salted_join): the big
    side gets a uniform per-row salt, the modest side replicates once
    per salt bucket, and the join runs on (key, salt) — the layout for
    hot keys when the small side exceeds the broadcast threshold and
    AQE's skew split can't help (e.g. a downstream Arrow stage pins the
    partitioning). Salting must be invisible in the result: the oracle
    is the plain join aggregate."""
    from spark_data_engineering_spark.operators.skew import salted_join

    li = load_table(spark, "lineitem", sf_dir).select("l_partkey", "l_quantity")
    part = load_table(spark, "part", sf_dir).select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    joined = salted_join(li, part, key="l_partkey", buckets=8)
    return joined.groupBy("p_brand").agg(
        F.count("*").alias("n_items"),
        NR.round2(F.sum("l_quantity")).alias("total_qty"),
    )


@query(
    "join_skew_report",
    oracle="""
    WITH k AS (
        SELECT l_partkey AS key, COUNT(*) AS cnt FROM lineitem GROUP BY 1
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(cnt) AS BIGINT) AS n_rows,
               CAST(MAX(cnt) AS BIGINT) AS max_rows,
               FLOOR((MAX(cnt) / (CAST(SUM(cnt) AS DOUBLE) / COUNT(*))) * 100 + 0.5) / 100
                   AS skew_factor
        FROM k
    ),
    top AS (
        SELECT key, CAST(cnt AS BIGINT) AS cnt,
               CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, key ASC) AS BIGINT) AS rnk
        FROM k QUALIFY rnk <= 5
    )
    SELECT 'summary' AS section, CAST(NULL AS BIGINT) AS key,
           n_rows AS cnt, CAST(NULL AS BIGINT) AS rnk,
           CAST(n_keys AS DOUBLE) AS metric
    FROM s
    UNION ALL
    SELECT 'summary_skew', NULL, max_rows, NULL, skew_factor FROM s
    UNION ALL
    SELECT 'top_key', key, cnt, rnk, CAST(NULL AS DOUBLE) FROM top
    """,
)
def join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics — the measurement that decides whether
    a key needs salting (operators/skew.py) or AQE's skew-join handling
    before a big shuffle: per-key cardinality over the fact side's join
    key, summarized as key count / row count / hottest key / skew
    factor (hottest ÷ mean), plus the top-5 keys. One partial-agg
    shuffle on the key + a TakeOrdered for the top keys; the report is
    tiny at any scale. Integer-exact except the round-2 skew ratio."""
    li = load_table(spark, "lineitem", sf_dir)
    k = li.groupBy(F.col("l_partkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    s = k.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_rows"),
        NR.round2(
            F.max("cnt") / (F.sum("cnt").cast("double") / F.count(F.lit(1)))
        ).alias("skew_factor"),
    )
    top = (
        k.withColumn(
            "rnk",
            F.row_number().over(
                W.orderBy(F.col("cnt").desc(), F.col("key").asc())
            ),
        )
        .filter(F.col("rnk") <= 5)
        .select(
            F.lit("top_key").alias("section"),
            F.col("key").cast("bigint").alias("key"),
            F.col("cnt").cast("bigint").alias("cnt"),
            F.col("rnk").cast("bigint").alias("rnk"),
            F.lit(None).cast("double").alias("metric"),
        )
    )
    summary = s.select(
        F.lit("summary").alias("section"),
        F.lit(None).cast("bigint").alias("key"),
        F.col("n_rows").cast("bigint").alias("cnt"),
        F.lit(None).cast("bigint").alias("rnk"),
        F.col("n_keys").cast("double").alias("metric"),
    )
    summary2 = s.select(
        F.lit("summary_skew").alias("section"),
        F.lit(None).cast("bigint").alias("key"),
        F.col("max_rows").cast("bigint").alias("cnt"),
        F.lit(None).cast("bigint").alias("rnk"),
        F.col("skew_factor").alias("metric"),
    )
    return summary.unionByName(summary2).unionByName(top)


@query(
    "winsorized_revenue_by_priority",
    oracle="""
    WITH r AS (
        SELECT o_orderpriority AS priority, o_totalprice AS price,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice, o_orderkey) AS rn,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders
    ),
    h AS (
        SELECT priority, n,
               (n - 1) * CAST(0.05 AS DOUBLE) AS h05,
               (n - 1) * CAST(0.95 AS DOUBLE) AS h95
        FROM r GROUP BY priority, n
    ),
    b AS (
        SELECT h.priority,
               MIN(CASE WHEN r.rn - 1 = FLOOR(h.h05) THEN r.price END)
                 + (MIN(CASE WHEN r.rn - 1 = CEIL(h.h05) THEN r.price END)
                    - MIN(CASE WHEN r.rn - 1 = FLOOR(h.h05) THEN r.price END))
                   * (h.h05 - FLOOR(h.h05)) AS p05,
               MIN(CASE WHEN r.rn - 1 = FLOOR(h.h95) THEN r.price END)
                 + (MIN(CASE WHEN r.rn - 1 = CEIL(h.h95) THEN r.price END)
                    - MIN(CASE WHEN r.rn - 1 = FLOOR(h.h95) THEN r.price END))
                   * (h.h95 - FLOOR(h.h95)) AS p95
        FROM r JOIN h ON r.priority = h.priority
        GROUP BY h.priority, h.h05, h.h95
    )
    SELECT r.priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           FLOOR((CAST(SUM(CAST(LEAST(GREATEST(r.price, b.p05), b.p95)
                                AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*))
                 * 100 + 0.5) / 100 AS winsorized_mean,
           FLOOR(b.p05 * 100 + 0.5) / 100 AS p05,
           FLOOR(b.p95 * 100 + 0.5) / 100 AS p95
    FROM r JOIN b ON r.priority = b.priority
    GROUP BY r.priority, b.p05, b.p95
    """,
)
def winsorized_revenue_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust aggregation: per-priority mean order value with the top
    and bottom 5% WINSORIZED (clipped to the exact p05/p95) — the
    outlier-resistant mean a metrics pipeline reports when a few whale
    orders would otherwise move the average. Percentiles use the same
    manual type-7 interpolation on BOTH sides (``lo + (hi-lo)*frac`` —
    the identical IEEE sequence, like the category report's exact
    median), clipped values quantize to DECIMAL(18,6) before summing
    so the mean is order-independent, and the result rounds to 2
    decimals. One shuffle: the rank window and both follow-up
    aggregations share the priority partitioning."""
    from pyspark.sql import Window as W2

    o = load_table(spark, "orders", sf_dir).select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").alias("price"),
        "o_orderkey",
    )
    w = W2.partitionBy("priority").orderBy("price", "o_orderkey")
    r = o.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(W2.partitionBy("priority"))
    )
    r = (
        r.withColumn("h05", (F.col("n") - 1) * F.lit(0.05))
        .withColumn("h95", (F.col("n") - 1) * F.lit(0.95))
    )
    idx = F.col("rn") - 1

    agg = r.groupBy("priority").agg(
        F.min(F.when(idx == F.floor(F.col("h05")), F.col("price"))).alias("vlo05"),
        F.min(F.when(idx == F.ceil(F.col("h05")), F.col("price"))).alias("vhi05"),
        F.min(F.when(idx == F.floor(F.col("h95")), F.col("price"))).alias("vlo95"),
        F.min(F.when(idx == F.ceil(F.col("h95")), F.col("price"))).alias("vhi95"),
        F.first(F.col("h05") - F.floor(F.col("h05"))).alias("f05"),
        F.first(F.col("h95") - F.floor(F.col("h95"))).alias("f95"),
    )
    b = agg.select(
        "priority",
        (F.col("vlo05") + (F.col("vhi05") - F.col("vlo05")) * F.col("f05")).alias("p05"),
        (F.col("vlo95") + (F.col("vhi95") - F.col("vlo95")) * F.col("f95")).alias("p95"),
    )
    clipped = r.join(F.broadcast(b), "priority").withColumn(
        "cl",
        F.least(F.greatest(F.col("price"), F.col("p05")), F.col("p95")).cast(
            "decimal(18,6)"
        ),
    )
    # group on priority ALONE (p05/p95 are functionally dependent,
    # carried via first()) so the aggregation reuses the rank window's
    # hash partitioning instead of re-shuffling on a wider key
    return clipped.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        NR.round2(F.sum("cl").cast("double") / F.count(F.lit(1))).alias(
            "winsorized_mean"
        ),
        NR.round2(F.first("p05")).alias("p05"),
        NR.round2(F.first("p95")).alias("p95"),
    ).select("priority", "n_orders", "winsorized_mean", "p05", "p95")


@query(
    "fuzzy_part_name_pairs",
    oracle="""
    WITH n AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
    FROM n a, n b
    WHERE a.p_name < b.p_name
      AND levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def fuzzy_part_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact edit-distance join (round 6) over the DISTINCT part-name
    domain — entity resolution canon: fuzzy matching runs on the value
    vocabulary (which grows sublinearly), never the row domain (the
    row-keyed version re-emits every pair once per duplicate-name
    combination — measured 5.5M output rows at sf0.1 where the distinct
    domain yields hundreds). Candidates come from the q-gram count
    filter (operators/fuzzyjoin.py — positional bigram multiset join +
    length band; the O(len^2) levenshtein verify runs on candidates
    only, never the cross product). The oracle IS the distinct-domain
    cross product (DuckDB's levenshtein agrees with Spark's on ASCII),
    so the hash proves the filter lossless end-to-end — the primitive
    behind typo-tolerant dedup of titles/names/brands."""
    from spark_data_engineering_spark.operators.fuzzyjoin import edit_distance_join

    names = load_table(spark, "part", sf_dir).select("p_name").distinct()
    return edit_distance_join(names, "p_name", "p_name", max_dist=2, q=2).select(
        F.col("id_a").alias("name_a"),
        F.col("id_b").alias("name_b"),
        "edit_dist",
    )


_HIER_SQL = """
    WITH RECURSIVE tree(doc_id, n_chars, depth) AS (
        SELECT doc_id, n_chars, 0 AS depth FROM {src} WHERE doc_id <= 1
        UNION ALL
        SELECT d.doc_id, d.n_chars, t.depth + 1
        FROM {src} d JOIN tree t ON CAST(FLOOR(d.doc_id / 2.0) AS BIGINT) = t.doc_id
        WHERE d.doc_id > 1
    )
    SELECT depth,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM tree GROUP BY depth
"""


@query("doc_hierarchy_depths", oracle=_HIER_SQL.format(src="documents"))
def doc_hierarchy_depths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE hierarchy traversal (round 6): the documents form
    an implicit binary tree (parent = doc_id // 2, roots 0 and 1), and
    Spark 4's WITH RECURSIVE walks it to a per-depth rollup — the
    SQL-surface parity item for BOM explosions / org charts /
    category trees. The Spark side and the DuckDB oracle run the SAME
    recursive SQL text over the same view, so the gate checks Spark's
    recursive-CTE execution itself against an independent engine.

    Scale: each recursion level is one equi-join of the frontier
    against the table — the standard iterative-join expansion; depth
    is log2(N) for this tree (e.g. ~34 levels at 10^10 docs)."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "n_chars")
    docs.createOrReplaceTempView("_hier_docs")
    return spark.sql(_HIER_SQL.format(src="_hier_docs"))


@query(
    "k_anonymity_report",
    oracle="""
    WITH classes AS (
        SELECT lang, source, CAST(FLOOR(n_chars / 20.0) AS BIGINT) AS len_bucket,
               CAST(COUNT(*) AS BIGINT) AS class_size
        FROM documents GROUP BY 1, 2, 3
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(MIN(class_size) AS BIGINT) AS min_class_size,
           CAST(SUM(CASE WHEN class_size < 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating_classes,
           CAST(SUM(CASE WHEN class_size < 5 THEN class_size ELSE 0 END) AS BIGINT)
               AS n_docs_at_risk,
           (MIN(class_size) >= 5) AS is_5_anonymous
    FROM classes
    """,
)
def k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (round 6) over the quasi-identifier tuple
    (lang, source, 20-char length bucket): equivalence-class sizes and
    the k=5 verdict — the release-readiness check run before publishing
    any per-document table (Sweeney 2002; the privacy tier next to
    dp_source_counts' noise release: DP protects aggregates, k-anonymity
    audits row-level releases). One partial-aggregated groupBy over the
    quasi-identifiers + a 5-number summary; nothing leaves the JVM."""
    d = load_table(spark, "documents", sf_dir)
    classes = d.groupBy(
        "lang", "source", F.floor(F.col("n_chars") / 20).cast("bigint").alias("len_bucket")
    ).agg(F.count(F.lit(1)).alias("class_size"))
    return classes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("class_size").cast("bigint").alias("min_class_size"),
        F.sum(F.when(F.col("class_size") < 5, 1).otherwise(0))
        .cast("bigint")
        .alias("n_violating_classes"),
        F.sum(F.when(F.col("class_size") < 5, F.col("class_size")).otherwise(0))
        .cast("bigint")
        .alias("n_docs_at_risk"),
        (F.min("class_size") >= 5).alias("is_5_anonymous"),
    )
