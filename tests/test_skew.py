"""Skew operators must be result-equivalent to their naive forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_data_engineering_spark.operators import skew as SK
from spark_data_engineering_spark.sources import load_table


def test_salted_count_distinct_matches_exact(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    naive = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag").agg(F.count_distinct("l_partkey").alias("n")).collect()
    }
    salted = {
        r.l_returnflag: r.n_distinct
        for r in SK.salted_count_distinct(li, "l_returnflag", "l_partkey", buckets=16).collect()
    }
    assert naive == salted


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey", "l_quantity")
    part = load_table(spark, "part", sf_dir).select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    plain = li.join(part, "l_partkey")
    salted = SK.salted_join(li, part, key="l_partkey", buckets=4)
    assert plain.count() == salted.count()
    a = plain.groupBy("p_brand").agg(F.round(F.sum("l_quantity"), 2).alias("q"))
    b = salted.groupBy("p_brand").agg(F.round(F.sum("l_quantity"), 2).alias("q"))
    assert {(r.p_brand, r.q) for r in a.collect()} == {(r.p_brand, r.q) for r in b.collect()}


def test_with_salt_uniformity(spark):
    df = SK.with_salt(spark.range(10000), buckets=8)
    counts = [r.n for r in df.groupBy("_salt").agg(F.count("*").alias("n")).collect()]
    assert len(counts) == 8
    assert max(counts) < 10000 * 0.25  # roughly uniform, no hot bucket
