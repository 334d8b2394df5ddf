"""`daily_category_report_approx` (the at-scale percentile_approx
variant) must track the exact-median report — its correctness evidence,
since an approximate sketch has no cross-engine oracle.

The bound is structural, not a loose epsilon: percentile_approx returns
a TRUE element of the group whose rank is within ~1/accuracy of the
median, and these (day, type) groups are tiny, so the returned element
must be one of the two middle members — i.e. lie in [lo_mid, hi_mid],
the interval the exact variant interpolates inside. (A plain
|approx - exact| bound is dominated by interpolation-vs-member
selection on 2-row groups with wide price spread and says nothing
about the sketch.)"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from spark_data_engineering_spark.queries.reports import (
    daily_category_report,
    daily_category_report_approx,
    order_item_actual_price,
)
from spark_data_engineering_spark.sources import load_table


def _mid_bounds(spark, sf_dir):
    """Per-(Date, Product Category) lower/upper middle elements — the
    interval any rank-correct median estimate must fall in."""
    items = order_item_actual_price(spark, sf_dir)
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    part = load_table(spark, "part", sf_dir).select("p_partkey", "p_type")
    joined = (
        items.join(orders, items.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), items.l_partkey == part.p_partkey)
        .select(
            F.date_trunc("day", F.col("o_orderdate")).alias("Date"),
            F.col("p_type").alias("Product Category"),
            "actual_price",
        )
    )
    keys = ["Date", "Product Category"]
    ranked = joined.select(
        *keys,
        "actual_price",
        F.row_number().over(W.partitionBy(*keys).orderBy("actual_price")).alias("_rn"),
        F.count("*").over(W.partitionBy(*keys)).alias("_n"),
    )
    mid = F.when(
        (F.lit(2) * F.col("_rn") - F.col("_n")).between(0, 2), F.col("actual_price")
    )
    return ranked.groupBy(*keys).agg(
        F.min(mid).alias("lo_mid"), F.max(mid).alias("hi_mid")
    )


def test_approx_report_close_to_exact(spark, sf_dir):
    exact = daily_category_report(spark, sf_dir)
    approx = daily_category_report_approx(spark, sf_dir)
    keys = ["Date", "Product Category"]

    j = exact.alias("e").join(approx.alias("a"), keys, "full_outer")
    # identical group keys on both sides
    assert (
        j.filter(
            F.col("e.`Mean Revenue`").isNull() | F.col("a.`Mean Revenue`").isNull()
        ).count()
        == 0
    )
    # means are computed identically — only rounding noise apart
    mean_dev = j.select(
        F.max(F.abs(F.col("e.`Mean Revenue`") - F.col("a.`Mean Revenue`")))
    ).first()[0]
    assert mean_dev <= 0.01, f"mean deviates: {mean_dev}"

    bounds = _mid_bounds(spark, sf_dir)
    out_of_interval = (
        approx.join(bounds, keys)
        .filter(
            (F.col("`Median Revenue`") < F.col("lo_mid") - 0.01)
            | (F.col("`Median Revenue`") > F.col("hi_mid") + 0.01)
        )
        .count()
    )
    assert out_of_interval == 0, (
        f"{out_of_interval} groups where percentile_approx left the "
        "middle-member interval"
    )


def test_gk_exactness_domain_rank_law(spark):
    """Re-derive from scratch the exactness-domain law the
    daily_category_report_approx oracle relies on: with group size under
    ``accuracy``, percentile_approx(0.5) returns EXACTLY the rank-⌈n/2⌉
    order statistic, for odd and even n, with and without duplicate
    values, under forced partial-sketch merges."""
    import math

    from pyspark.sql import functions as F

    rows = []
    for g, n in [(1, 1), (2, 2), (3, 3), (4, 4), (5, 19), (6, 200), (7, 6)]:
        rows += [(g, float((i % max(1, n // 2)) + 1)) for i in range(n)]  # dups
    df = spark.createDataFrame(rows, "g int, v double").repartition(16)
    got = {
        r.g: r.m
        for r in df.groupBy("g")
        .agg(F.percentile_approx("v", 0.5, 10000).alias("m"))
        .collect()
    }
    vals = {}
    for g, v in rows:
        vals.setdefault(g, []).append(v)
    for g, vs in vals.items():
        want = sorted(vs)[math.ceil(len(vs) / 2) - 1]
        assert got[g] == want, (g, got[g], want)


def test_gk_corpus_inside_exactness_domain(spark, sf_dir):
    """The oracle's validity precondition at the gate's scale: every
    (day, category) group is far below accuracy=10000."""
    from spark_data_engineering_spark.queries.reports import (
        _category_joined,
        order_item_actual_price,
    )
    from spark_data_engineering_spark.sources import load_table

    items = order_item_actual_price(spark, sf_dir)
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    part = load_table(spark, "part", sf_dir).select("p_partkey", "p_type")
    mx = (
        _category_joined(items, orders, part)
        .groupBy("Date", "Product Category")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert mx < 10000
