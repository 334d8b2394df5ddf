"""Bloom-pruned joins must be result-identical to unpruned joins, and
the pre-shuffle filter must actually prune."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from spark_data_engineering_spark.operators import bloom as B
from spark_data_engineering_spark.sources import load_table


def test_bloom_params_shape():
    m, k = B.bloom_params(10_000, 0.01)
    assert m % 64 == 0
    # ~9.6 bits/key at 1% fpp
    assert 9 * 10_000 <= m <= 11 * 10_000
    assert 5 <= k <= 9


def test_semi_join_matches_plain(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    sup = load_table(spark, "supplier", sf_dir).filter(F.col("s_nationkey") < 5).select(
        "s_suppkey"
    )
    plain = li.join(sup, li.l_suppkey == sup.s_suppkey, "left_semi")
    pruned = B.bloom_pruned_join(li, sup, "l_suppkey", "s_suppkey", how="semi")
    assert plain.count() == pruned.count()
    a = plain.agg(F.sum("l_quantity")).collect()[0][0]
    b = pruned.agg(F.sum("l_quantity")).collect()[0][0]
    assert float(a) == float(b)


def test_inner_join_matches_plain(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir).filter(
        F.col("c_mktsegment") == F.lit("BUILDING")
    ).select("c_custkey", "c_mktsegment")
    plain = orders.join(cust, orders.o_custkey == cust.c_custkey, "inner")
    pruned = B.bloom_pruned_join(orders, cust, "o_custkey", "c_custkey", how="inner")
    assert plain.count() == pruned.count()


def test_filter_actually_prunes(spark, sf_dir):
    """With a selective dim (1 of 25 nations), the bloom filter alone —
    before the exact join — must drop the vast majority of fact rows:
    survivors <= true matches x (1 + slack for the 1% fpp)."""
    li = load_table(spark, "lineitem", sf_dir)
    sup = load_table(spark, "supplier", sf_dir).filter(F.col("s_nationkey") == 3).select(
        "s_suppkey"
    )
    n_fact = li.count()
    true_matches = li.join(sup, li.l_suppkey == sup.s_suppkey, "left_semi").count()
    bitmap, m, k = B.build_bloom(sup, "s_suppkey", expected_items=max(1, sup.count()))
    survivors = li.filter(B.bloom_might_contain(bitmap, m, k, F.col("l_suppkey"))).count()
    assert survivors >= true_matches  # no false negatives, ever
    assert survivors <= true_matches + int(0.05 * n_fact) + 10


def test_no_false_negatives_exhaustive(spark):
    """Every inserted key must test positive (bloom's hard guarantee)."""
    keys = spark.range(0, 5000).select(F.col("id").alias("k"))
    bitmap, m, k = B.build_bloom(keys, "k", expected_items=5000, fpp=0.01)
    hits = keys.filter(B.bloom_might_contain(bitmap, m, k, F.col("k"))).count()
    assert hits == 5000


def test_fpp_within_bound(spark):
    """Probing 20k keys disjoint from the 5k inserted: observed fpp must
    be within ~3x the requested 1%."""
    keys = spark.range(0, 5000).select(F.col("id").alias("k"))
    bitmap, m, k = B.build_bloom(keys, "k", expected_items=5000, fpp=0.01)
    probes = spark.range(1_000_000, 1_020_000).select(F.col("id").alias("k"))
    fp = probes.filter(B.bloom_might_contain(bitmap, m, k, F.col("k"))).count()
    assert fp / 20_000 <= 0.03


def test_empty_dim_prunes_everything(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    empty = spark.range(0).select(F.col("id").alias("s_suppkey"))
    out = B.bloom_pruned_join(li, empty, "l_suppkey", "s_suppkey", how="semi")
    assert out.count() == 0


def test_rejects_widening_join_types(spark):
    df = spark.range(1).select(F.col("id").alias("a"))
    try:
        B.bloom_pruned_join(df, df, "a", "a", how="left")
    except ValueError:
        pass
    else:
        raise AssertionError("left join must be rejected (pruning would drop rows)")


def test_build_merges_across_partitions(spark):
    """Keys spread over many partitions must all land in the merged
    bitmap (driver OR of per-partition partials)."""
    keys = spark.range(0, 2000).repartition(16).select(F.col("id").alias("k"))
    bitmap, m, k = B.build_bloom(keys, "k", expected_items=2000)
    words = np.frombuffer(bitmap, dtype=np.uint64)
    assert int(np.unpackbits(words.view(np.uint8)).sum()) > 0
    assert keys.filter(B.bloom_might_contain(bitmap, m, k, F.col("k"))).count() == 2000


def test_min_items_skips_bloom_but_matches(spark, sf_dir):
    """Below min_items_for_bloom the operator degrades to the plain join
    — same results, no bitmap jobs."""
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir).filter(
        F.col("c_mktsegment") == F.lit("BUILDING")
    ).select("c_custkey")
    plain = orders.join(cust, orders.o_custkey == cust.c_custkey, "left_semi").count()
    adaptive = B.bloom_pruned_join(
        orders, cust, "o_custkey", "c_custkey", how="semi",
        min_items_for_bloom=10_000_000,
    ).count()
    assert adaptive == plain


def test_large_path_arrow_build_and_probe(spark):
    """Force the large-filter code paths (Arrow partial-bitmap build +
    Arrow membership probe) by sizing for 2M expected keys — the small
    paths (driver position collect, inlined JVM literal) cover the rest
    of the suite."""
    keys = spark.range(0, 5000).repartition(8).select(F.col("id").alias("k"))
    bitmap, m, k = B.build_bloom(keys, "k", expected_items=2_000_000, fpp=0.01)
    assert m // 64 > B._JVM_INLINE_WORDS  # probe must take the Arrow path
    hits = keys.filter(B.bloom_might_contain(bitmap, m, k, F.col("k"))).count()
    assert hits == 5000  # no false negatives on either large path


def test_bloom_prune_matches_column_form(spark, sf_dir):
    """bloom_prune (broadcast-row words) keeps exactly the rows the
    Column-form bloom_might_contain keeps — same bitmap, same keys."""
    li = load_table(spark, "lineitem", sf_dir).select("l_suppkey", "l_quantity")
    sup = load_table(spark, "supplier", sf_dir).filter(
        F.col("s_nationkey") < 5
    ).select("s_suppkey")
    bitmap, m, k = B.build_bloom(sup, "s_suppkey", expected_items=max(1, sup.count()))
    col_rows = li.filter(
        B.bloom_might_contain(bitmap, m, k, F.col("l_suppkey"))
    ).count()
    df_form = B.bloom_prune(li, bitmap, m, k, "l_suppkey")
    assert df_form.count() == col_rows
    # the helper column must not leak into the output schema
    assert df_form.columns == ["l_suppkey", "l_quantity"]


def test_bloom_prune_rejects_words_column_collision(spark, sf_dir):
    """A fact frame that already carries the helper column name must be
    rejected loudly, not silently shadowed/dropped (ADVICE r13)."""
    import pytest

    li = (
        load_table(spark, "lineitem", sf_dir)
        .select("l_suppkey")
        .withColumn(B._WORDS_COL, F.lit(1))
    )
    sup = load_table(spark, "supplier", sf_dir).select("s_suppkey")
    bitmap, m, k = B.build_bloom(sup, "s_suppkey", expected_items=max(1, sup.count()))
    with pytest.raises(ValueError, match="bloom_prune"):
        B.bloom_prune(li, bitmap, m, k, "l_suppkey")
