"""SCD2 dimension invariants: intervals tile each member's timeline
with no gaps, no overlaps, exactly one open row; PIT join totals."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from spark_data_engineering_spark.queries.scd2 import (
    scd2_customer_tiers,
    scd2_pit_revenue,
)
from spark_data_engineering_spark.sources import load_table


def test_intervals_tile_timeline(spark, sf_dir):
    dim = scd2_customer_tiers(spark, sf_dir).cache()
    # exactly one open-ended (current) version per customer
    open_rows = dim.filter(F.col("valid_to").isNull()).groupBy("custkey").count()
    assert open_rows.filter(F.col("count") != 1).count() == 0
    assert open_rows.count() == dim.select("custkey").distinct().count()
    # ordered by version: valid_to == next valid_from (no gap, no overlap)
    w = W.partitionBy("custkey").orderBy("version")
    chained = dim.withColumn("next_from", F.lead("valid_from").over(w))
    bad = chained.filter(
        F.col("next_from").isNotNull() & (F.col("valid_to") != F.col("next_from"))
    )
    assert bad.count() == 0
    # versions are 1..n dense
    assert dim.filter(F.col("version") < 1).count() == 0
    # consecutive versions never repeat a tier (collapse worked)
    rep = dim.withColumn("next_tier", F.lead("tier").over(w)).filter(
        F.col("next_tier").isNotNull() & (F.col("tier") == F.col("next_tier"))
    )
    assert rep.count() == 0
    dim.unpersist()


def test_tiers_monotonic_upward(spark, sf_dir):
    """Cumulative spend only grows, so tier versions can only move
    bronze -> silver -> gold."""
    rank = F.when(F.col("tier") == "bronze", 0).when(F.col("tier") == "silver", 1).otherwise(2)
    dim = scd2_customer_tiers(spark, sf_dir).withColumn("r", rank)
    w = W.partitionBy("custkey").orderBy("version")
    bad = dim.withColumn("next_r", F.lead("r").over(w)).filter(
        F.col("next_r").isNotNull() & (F.col("next_r") <= F.col("r"))
    )
    assert bad.count() == 0


def test_pit_join_covers_every_order(spark, sf_dir):
    """Each order matches exactly one version (its date's tier), so the
    PIT revenue total equals the plain orders total."""
    o = load_table(spark, "orders", sf_dir)
    total_orders = o.count()
    out = scd2_pit_revenue(spark, sf_dir)
    assert out.agg(F.sum("n_orders")).collect()[0][0] == total_orders
    got = float(out.agg(F.sum("revenue")).collect()[0][0])
    want = float(
        o.agg(F.round(F.sum("o_totalprice"), 2).alias("r")).collect()[0][0]
    )
    assert abs(got - want) < 1.0  # per-tier rounding only
