"""Slowly-changing-dimension (type 2) build + point-in-time join.

The reference's dims are full-snapshot reloads (every silver dim is
rebuilt per batch, dim_buyer_silver.py); SCD2 is the warehouse pattern
the snapshot model can't express: one row PER VERSION of a dimension
member with a validity interval, and facts joined to the version valid
AT the fact's timestamp. Built here from first principles on the
testdata: a customer's "tier" changes as cumulative spend crosses
thresholds, change points collapse into [valid_from, valid_to)
intervals, and the point-in-time lookup is exactly an as-of join
(operators/asof.py — latest version with valid_from <= fact ts), which
is the single-shuffle scale path; the naive alternative is a range
join on the interval.

All money arithmetic runs in DECIMAL(18,2): a cumulative-sum window
over doubles is NOT reproducible cross-engine (accumulation strategy
differs), and a tier boundary sitting on a half-ulp would flip the
dimension. Decimal makes every threshold compare exact on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from spark_data_engineering_spark.functions import numeric as NR
from spark_data_engineering_spark.registry import query
from spark_data_engineering_spark.sources import load_table

_TIER_SQL_CASE = """
    CASE WHEN cum < 1000000 THEN 'bronze'
         WHEN cum < 2000000 THEN 'silver'
         ELSE 'gold' END
"""

_SCD2_ORACLE_BODY = """
    daily AS (
        SELECT o_custkey,
               o_orderdate AS eff_ts,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS day_spend
        FROM orders GROUP BY 1, 2
    ),
    cumed AS (
        SELECT o_custkey, eff_ts,
               SUM(day_spend) OVER (PARTITION BY o_custkey ORDER BY eff_ts
                                    ROWS UNBOUNDED PRECEDING) AS cum
        FROM daily
    ),
    tiered AS (
        SELECT o_custkey, eff_ts, {tier} AS tier FROM cumed
    ),
    changes AS (
        SELECT o_custkey, eff_ts, tier
        FROM (
            SELECT o_custkey, eff_ts, tier,
                   LAG(tier) OVER (PARTITION BY o_custkey ORDER BY eff_ts) AS prev
            FROM tiered
        )
        WHERE prev IS NULL OR tier != prev
    ),
    scd2 AS (
        SELECT o_custkey AS custkey, tier,
               eff_ts AS valid_from,
               LEAD(eff_ts) OVER (PARTITION BY o_custkey ORDER BY eff_ts) AS valid_to,
               CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY eff_ts)
                    AS BIGINT) AS version
        FROM changes
    )
""".format(tier=_TIER_SQL_CASE)


def build_scd2_tiers(o: DataFrame) -> DataFrame:
    """SCD2 tier dimension from an orders DataFrame — per-customer
    change-collapse into [valid_from, valid_to) eras (see module
    docstring). Key-local: a customer's eras depend only on that
    customer's rows, which is what makes per-key incremental
    maintenance (pipeline/scd2_incremental.py) exactly equal to a full
    rebuild."""
    # ONE shuffle end-to-end: partition by customer up front — a
    # custkey partitioning satisfies the (custkey, day) aggregation's
    # clustering requirement AND the windows' custkey partitioning, so
    # neither adds an exchange (pinned in test_plan_shapes)
    daily = (
        o.repartition("o_custkey")
        .groupBy("o_custkey", F.col("o_orderdate").alias("eff_ts"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("day_spend"))
    )
    w = W.partitionBy("o_custkey").orderBy("eff_ts")
    cumed = daily.withColumn(
        "cum", F.sum("day_spend").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    )
    tiered = cumed.withColumn(
        "tier",
        F.when(F.col("cum") < 1000000, "bronze")
        .when(F.col("cum") < 2000000, "silver")
        .otherwise("gold"),
    )
    changes = (
        tiered.withColumn("prev", F.lag("tier").over(w))
        .filter(F.col("prev").isNull() | (F.col("tier") != F.col("prev")))
        .select("o_custkey", "eff_ts", "tier")
    )
    return changes.select(
        F.col("o_custkey").alias("custkey"),
        "tier",
        F.col("eff_ts").alias("valid_from"),
        F.lead("eff_ts").over(w).alias("valid_to"),
        F.row_number().over(w).cast("bigint").alias("version"),
    )


@query(
    "scd2_customer_tiers",
    oracle=f"""
    WITH {_SCD2_ORACLE_BODY}
    SELECT custkey, tier, valid_from, valid_to, version FROM scd2
    """,
)
def scd2_customer_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCD2 dimension itself: one row per (customer, tier era) with
    [valid_from, valid_to) validity — consecutive equal tiers collapsed
    via lag-filter, interval close via lead (open-ended current row).
    Two window passes + one partial-agg groupBy, all partitioned on the
    customer key: ONE shuffle end-to-end at any scale."""
    return build_scd2_tiers(load_table(spark, "orders", sf_dir))


@query(
    "scd2_pit_revenue",
    oracle=f"""
    WITH {_SCD2_ORACLE_BODY}
    SELECT s.tier,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           FLOOR((SUM(o.o_totalprice)) * 100 + 0.5) / 100 AS revenue
    FROM orders o
    JOIN scd2 s
      ON o.o_custkey = s.custkey
     AND s.valid_from <= o.o_orderdate
     AND (s.valid_to IS NULL OR o.o_orderdate < s.valid_to)
    GROUP BY s.tier
    """,
)
def scd2_pit_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time fact lookup: each order joined to the tier version
    valid AT its order date, revenue per tier. The PIT lookup is an
    AS-OF join on (custkey, valid_from) — latest version whose
    valid_from <= order date (operators/asof.py window strategy: union
    + one per-key window pass, no interval range join, one shuffle).
    The oracle spells the same thing as the explicit
    [valid_from, valid_to) interval join."""
    from spark_data_engineering_spark.operators.asof import asof_join

    o = load_table(spark, "orders", sf_dir)
    facts = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").alias("ts"),
        "o_totalprice",
    )
    dim = build_scd2_tiers(load_table(spark, "orders", sf_dir)).select(
        "custkey", F.col("valid_from").alias("ts"), "tier"
    )
    joined = asof_join(
        facts, dim, on="ts", by="custkey", right_value_cols=("tier",), suffix="_v"
    )
    return joined.groupBy(F.col("tier_v").alias("tier")).agg(
        F.count("*").alias("n_orders"),
        NR.round2(F.sum("o_totalprice")).alias("revenue"),
    )
