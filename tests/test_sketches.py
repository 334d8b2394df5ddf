"""Misra-Gries: presence guarantee, bounded size, merge correctness."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from spark_data_engineering_spark.operators.sketches import misra_gries_summary


def _df(spark, items, parts=8):
    return spark.createDataFrame([(x,) for x in items], ["v"]).repartition(parts)


def test_small_domain_is_exact(spark):
    items = ["a"] * 50 + ["b"] * 30 + ["c"] * 20
    s = misra_gries_summary(_df(spark, items), "v", k=10)
    # domain fits in k: nothing is ever decremented, counts are exact
    assert s == {"a": 50, "b": 30, "c": 20}


def test_presence_guarantee_skewed(spark):
    """Every item with tf > n/(k+1) must be present, whatever the
    partition layout; kept counts never overcount."""
    items = (
        ["hot"] * 5000
        + ["warm"] * 800
        + [f"cold{i}" for i in range(4000)]  # 4000 singletons
    )
    truth = Counter(items)
    n, k = len(items), 20
    s = misra_gries_summary(_df(spark, items, parts=16), "v", k=k)
    assert len(s) <= k
    for item, tf in truth.items():
        if tf > n / (k + 1):
            assert item in s, f"{item} (tf={tf}) missing"
    for item, c in s.items():
        assert c <= truth[item]  # lower bounds only
        assert truth[item] - c <= n / (k + 1) + 1  # undercount bound


def test_partition_count_does_not_break_guarantee(spark):
    items = ["x"] * 300 + ["y"] * 200 + [f"z{i % 150}" for i in range(900)]
    n, k = len(items), 12
    for parts in (1, 3, 32):
        s = misra_gries_summary(_df(spark, items, parts=parts), "v", k=k)
        for item in ("x", "y"):
            if Counter(items)[item] > n / (k + 1):
                assert item in s


def test_candidate_recount_matches_exact_topk(spark, sf_dir):
    """The production pattern: sketch candidates -> exact recount must
    reproduce the exact top-10 tokens."""
    from spark_data_engineering_spark.sources import load_table

    d = load_table(spark, "documents", sf_dir)
    tokens = d.select(F.explode(F.split("text", " ")).alias("token"))
    exact = [
        (r.token, r.tf)
        for r in tokens.groupBy("token")
        .agg(F.count("*").alias("tf"))
        .orderBy(F.col("tf").desc(), F.col("token").asc())
        .limit(10)
        .collect()
    ]
    cands = list(misra_gries_summary(tokens, "token", k=100))
    recount = [
        (r.token, r.tf)
        for r in tokens.filter(F.col("token").isin(cands))
        .groupBy("token")
        .agg(F.count("*").alias("tf"))
        .orderBy(F.col("tf").desc(), F.col("token").asc())
        .limit(10)
        .collect()
    ]
    assert recount == exact
