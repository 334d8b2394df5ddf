"""The medallion pipeline (bronze → silver → gold → interface) over the
driver testdata — the reference's table graph re-expressed as declarative
nodes (reference layer files etl/layers/{bronze,silver,gold,interface};
graph shape per SURVEY.md §1.4/§3 E1).

Reference → testdata mapping (same as queries/reports.py):
  appuser/buyer dims → customer (+nation/region)   [dim_buyer pattern]
  seller dim         → supplier (+nation)           [dim_seller pattern]
  product/brand/manufacturer → part                 [dim_product pattern]
  orders             → orders; order_item → lineitem
  fact derives: total_price_usd/inr (fact_orders_silver.py:99-110) →
    analog fx-rate derives on o_totalprice; actual_price
    (fact_order_items_silver.py:99-101) → extendedprice*(1-disc)*(1+tax)
  is_active filter   → c_acctbal > 0 ("active account")
  categories array per product (wide_order_items_gold.py:126-128) →
    per-order array of item structs + explode in the metrics node

Quirk resolutions (SURVEY.md §2.8): Q1 wide_orders joins the BUYER dim
(dim_customer) by intent, not dim_seller by letter; Q3 wide_lineitem
carries ``is_active`` so the metrics filter resolves; Q5 one batch
timestamp per run (Runner.batch_ts).

Every node is a pure transform; the whole pipeline is one lazy Catalyst
plan unless a node is materialized through a SnapshotStore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_data_engineering_spark import checks as C
from spark_data_engineering_spark.functions import numeric as NR
from spark_data_engineering_spark.operators.rename import prefix_conflicts
from spark_data_engineering_spark.plans import Node, Registry, Runner
from spark_data_engineering_spark.sources import TABLES, load_table

# FX-rate analogs of the reference's hard-coded conversion literals
# (fact_orders_silver.py:99-110: usd = total * 0.0116, inr = total * 86).
USD_RATE = 0.0116
INR_RATE = 86.0


def build_registry(spark: SparkSession, sf_dir: str) -> Registry:
    reg = Registry()

    # ---- bronze: one source node per upstream table -------------------
    def _bronze(table: str):
        return lambda up: load_table(spark, table, sf_dir)

    for t in TABLES:
        pk = {
            "region": ("r_regionkey",),
            "nation": ("n_nationkey",),
            "customer": ("c_custkey",),
            "supplier": ("s_suppkey",),
            "part": ("p_partkey",),
            "orders": ("o_orderkey",),
            "lineitem": ("l_orderkey", "l_linenumber"),
            "events": ("event_id",),
            "documents": ("doc_id",),
            "embeddings": ("vec_id",),
        }[t]
        # NB: the driver's synthetic lineitem has no unique natural key
        # (duplicate (orderkey, linenumber) pairs exist by construction),
        # so the uniqueness gate applies only where the data contracts it.
        checks = (C.unique(*pk),) if t in ("orders", "events", "documents", "embeddings") else ()
        reg.register(Node(name=f"bronze_{t}", transform=_bronze(t), primary_keys=pk, checks=checks))

    # ---- silver: dims with conflict renames, facts with derives -------
    def dim_customer(up: dict[str, DataFrame]) -> DataFrame:
        c, n, r = up["bronze_customer"], up["bronze_nation"], up["bronze_region"]
        n = prefix_conflicts(n, c, "nation", keep=("n_nationkey",))
        j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "inner").drop(n.n_nationkey)
        j = j.join(F.broadcast(r), j.n_regionkey == r.r_regionkey, "left").drop(r.r_regionkey)
        return j.withColumnRenamed("n_name", "nation_name").withColumnRenamed(
            "r_name", "region_name"
        ).withColumn("is_active", F.col("c_acctbal") > 0)

    reg.register(
        Node(
            name="dim_customer",
            transform=dim_customer,
            deps=("bronze_customer", "bronze_nation", "bronze_region"),
            primary_keys=("c_custkey",),
            checks=(C.unique("c_custkey"), C.not_null("c_custkey")),
        )
    )

    def dim_supplier(up: dict[str, DataFrame]) -> DataFrame:
        s, n = up["bronze_supplier"], up["bronze_nation"]
        n = prefix_conflicts(n, s, "nation", keep=("n_nationkey",))
        return (
            s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left")
            .drop(n.n_nationkey)
            .withColumnRenamed("n_name", "supplier_nation")
        )

    reg.register(
        Node(
            name="dim_supplier",
            transform=dim_supplier,
            deps=("bronze_supplier", "bronze_nation"),
            primary_keys=("s_suppkey",),
            checks=(C.unique("s_suppkey"),),
        )
    )

    reg.register(
        Node(
            name="dim_part",
            transform=lambda up: up["bronze_part"],
            deps=("bronze_part",),
            primary_keys=("p_partkey",),
            checks=(C.unique("p_partkey"),),
        )
    )

    def fact_orders(up: dict[str, DataFrame]) -> DataFrame:
        return (
            up["bronze_orders"]
            .withColumn("total_price_usd", NR.round2(F.col("o_totalprice") * USD_RATE))
            .withColumn("total_price_inr", NR.round2(F.col("o_totalprice") * INR_RATE))
        )

    reg.register(
        Node(
            name="fact_orders",
            transform=fact_orders,
            deps=("bronze_orders",),
            primary_keys=("o_orderkey",),
            checks=(
                C.unique("o_orderkey"),  # reference V3
                C.accepted_values("o_orderstatus", ("O", "F", "P")),
                C.foreign_key(
                    "o_custkey", lambda: load_table(spark, "customer", sf_dir), "c_custkey"
                ),
            ),
        )
    )

    def fact_lineitem(up: dict[str, DataFrame]) -> DataFrame:
        return up["bronze_lineitem"].withColumn(
            "actual_price",
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
        )

    reg.register(
        Node(
            name="fact_lineitem",
            transform=fact_lineitem,
            deps=("bronze_lineitem",),
            primary_keys=("l_orderkey", "l_linenumber"),
        )
    )

    # ---- gold: wide tables + metric tables ----------------------------
    def wide_orders(up: dict[str, DataFrame]) -> DataFrame:
        fo, dc = up["fact_orders"], up["dim_customer"]
        dim = dc.select("c_custkey", "c_name", "c_mktsegment", "nation_name", "is_active")
        return fo.join(F.broadcast(dim), fo.o_custkey == dim.c_custkey, "left")

    reg.register(
        Node(
            name="wide_orders",
            transform=wide_orders,
            deps=("fact_orders", "dim_customer"),
            primary_keys=("o_orderkey",),
            checks=(C.unique("o_orderkey"),),  # README-intended wide check
        )
    )

    def wide_lineitem(up: dict[str, DataFrame]) -> DataFrame:
        fl, dp, ds, fo = (
            up["fact_lineitem"],
            up["dim_part"],
            up["dim_supplier"],
            up["wide_orders"],
        )
        part = dp.select("p_partkey", "p_name", "p_brand", "p_type")
        supp = ds.select("s_suppkey", "s_name", "supplier_nation")
        ords = fo.select("o_orderkey", "o_orderdate", "o_orderstatus", "is_active")
        return (
            fl.join(F.broadcast(part), fl.l_partkey == part.p_partkey, "left")
            .join(F.broadcast(supp), fl.l_suppkey == supp.s_suppkey, "left")
            .join(ords, fl.l_orderkey == ords.o_orderkey, "left")
        )

    reg.register(
        Node(
            name="wide_lineitem",
            transform=wide_lineitem,
            deps=("fact_lineitem", "dim_part", "dim_supplier", "wide_orders"),
            primary_keys=("l_orderkey", "l_linenumber"),
            # no uniqueness gate: see bronze_lineitem note — the synthetic
            # data has duplicate (orderkey, linenumber) pairs by design
        )
    )

    def daily_order_metrics(up: dict[str, DataFrame]) -> DataFrame:
        # reference daily_order_metrics.py:97-106: cast date, filter
        # is_active, sum + mean
        return (
            up["wide_orders"]
            .filter(F.col("is_active"))
            .withColumn("order_date", F.date_trunc("day", F.col("o_orderdate")))
            .groupBy("order_date")
            .agg(
                NR.round2(F.sum("o_totalprice")).alias("total_price_sum"),
                NR.round2(F.avg("o_totalprice")).alias("total_price_mean"),
            )
        )

    reg.register(
        Node(
            name="daily_order_metrics",
            transform=daily_order_metrics,
            deps=("wide_orders",),
            primary_keys=("order_date",),
            # reference V4: unique date + 0 < max(mean) < 100000... the
            # testdata's daily means exceed the reference bound; keep the
            # spirit with a sane ceiling for this corpus.
            checks=(C.unique("order_date"), C.bounds("total_price_mean", lo=0, hi=1_000_000)),
        )
    )

    def daily_category_metrics(up: dict[str, DataFrame]) -> DataFrame:
        # reference daily_category_metrics.py:109-131: explode categories,
        # filter is_active, mean + median per (date, category). The
        # categories array comes from the A3 collect_list(struct) rollup.
        wl = up["wide_lineitem"].filter(F.col("is_active"))
        rolled = wl.groupBy(
            "l_orderkey", "l_linenumber", "actual_price", "o_orderdate"
        ).agg(F.collect_list(F.struct("p_type", "p_brand")).alias("categories"))
        exploded = rolled.select(
            "actual_price",
            F.date_trunc("day", F.col("o_orderdate")).alias("order_date"),
            F.explode("categories").alias("category"),
        )
        return exploded.groupBy("order_date", F.col("category.p_type").alias("category_name")).agg(
            NR.round2(F.avg("actual_price")).alias("mean_actual_price"),
            NR.round2(F.percentile("actual_price", F.lit(0.5))).alias("median_actual_price"),
        )

    reg.register(
        Node(
            name="daily_category_metrics",
            transform=daily_category_metrics,
            deps=("wide_lineitem",),
            primary_keys=("order_date", "category_name"),
            checks=(C.unique("order_date", "category_name"),),
        )
    )

    # ---- interface: consumer-named report views -----------------------
    def daily_order_report(up: dict[str, DataFrame]) -> DataFrame:
        # spaced column names per reference interface/daily_order_report.py:18-24
        return up["daily_order_metrics"].select(
            F.col("order_date").alias("Date"),
            F.col("total_price_sum").alias("Revenue"),
            F.col("total_price_mean").alias("Mean Revenue"),
        )

    reg.register(
        Node(name="daily_order_report", transform=daily_order_report, deps=("daily_order_metrics",))
    )

    def daily_category_report(up: dict[str, DataFrame]) -> DataFrame:
        return up["daily_category_metrics"].select(
            F.col("order_date").alias("Date"),
            F.col("category_name").alias("Product Category"),
            F.col("mean_actual_price").alias("Mean Revenue"),
            F.col("median_actual_price").alias("Median Revenue"),
        )

    reg.register(
        Node(
            name="daily_category_report",
            transform=daily_category_report,
            deps=("daily_category_metrics",),
        )
    )

    return reg


def run_reports(
    spark: SparkSession, sf_dir: str, store=None, register_views: bool = False
) -> dict[str, DataFrame]:
    """Run the full pipeline once (memoized — shared upstreams compute
    once, unlike the reference's per-parent re-execution) and return both
    reports; optionally register them as global temp views (reference
    S5/S6, run_etl.py:17-18,27-28)."""
    runner = Runner(spark, build_registry(spark, sf_dir), store=store)
    out = {
        "daily_order_report": runner.run("daily_order_report"),
        "daily_category_report": runner.run("daily_category_report"),
    }
    if register_views:
        for name, df in out.items():
            df.createOrReplaceGlobalTempView(name)
    return out
