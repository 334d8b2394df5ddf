"""Schema contracts per medallion node — mirrors the reference's test
strategy of asserting exact output column sets per transform
(SURVEY.md §5: silver tests assert columns incl. prefixed names)."""

from __future__ import annotations

import pytest

from spark_data_engineering_spark.pipeline import build_registry
from spark_data_engineering_spark.plans import Runner

EXPECTED = {
    "dim_customer": {
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
        "nation_name",
        "n_regionkey",
        "region_name",
        "is_active",
    },
    "fact_orders": {
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
        "total_price_usd",
        "total_price_inr",
    },
    "daily_order_metrics": {"order_date", "total_price_sum", "total_price_mean"},
    "daily_category_metrics": {
        "order_date",
        "category_name",
        "mean_actual_price",
        "median_actual_price",
    },
    "daily_order_report": {"Date", "Revenue", "Mean Revenue"},
    "daily_category_report": {"Date", "Product Category", "Mean Revenue", "Median Revenue"},
}


@pytest.fixture(scope="module")
def runner(spark, sf_dir):
    return Runner(spark, build_registry(spark, sf_dir))


@pytest.mark.parametrize("node", sorted(EXPECTED))
def test_node_schema_contract(runner, node):
    assert set(runner.run(node).columns) == EXPECTED[node], node


def test_wide_lineitem_carries_is_active(runner):
    # quirk Q3 resolution: the reference's wide items table lacked
    # is_active and would crash downstream; ours must carry it
    assert "is_active" in runner.run("wide_lineitem").columns


def test_runner_unknown_node_lists_known(spark, sf_dir):
    reg = build_registry(spark, sf_dir)
    with pytest.raises(KeyError, match="registered nodes"):
        reg.node("no_such_table")


def test_persist_shared_counts_once(spark):
    from pyspark.sql import functions as F

    from spark_data_engineering_spark.plans import Node, Registry

    calls: list[str] = []

    def base_t(up):
        calls.append("base")
        return spark.range(10).withColumn("v", F.col("id") * 2)

    reg = Registry()
    reg.register(Node(name="base", transform=base_t))
    reg.register(Node(name="l", transform=lambda up: up["base"].filter("v > 2"), deps=("base",)))
    reg.register(Node(name="r", transform=lambda up: up["base"].filter("v <= 2"), deps=("base",)))
    runner = Runner(spark, reg, persist_shared=True)
    left, right = runner.run("l"), runner.run("r")
    assert left.count() + right.count() == 10
    assert calls.count("base") == 1  # transform built once
    assert runner._persisted  # and its DataFrame was persisted
    runner.unpersist_all()
    assert not runner._persisted
