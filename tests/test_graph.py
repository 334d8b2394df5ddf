"""Fixed-point PageRank: symmetry, hub dominance, probability mass."""

from pyspark.sql import functions as F

from spark_data_engineering_spark.operators.graph import SCALE, pagerank_fixed_point


def _undirected(spark, pairs):
    e = spark.createDataFrame(pairs, "src string, dst string")
    return e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def test_symmetric_pair_equal_ranks(spark):
    ranks = {
        r.node: r.rank_fp
        for r in pagerank_fixed_point(_undirected(spark, [("a", "b")])).collect()
    }
    assert ranks["a"] == ranks["b"]


def test_star_hub_outranks_leaves(spark):
    edges = _undirected(spark, [("hub", f"leaf{i}") for i in range(5)])
    ranks = {r.node: r.rank_fp for r in pagerank_fixed_point(edges).collect()}
    assert all(ranks["hub"] > ranks[f"leaf{i}"] for i in range(5))
    leaf_ranks = {ranks[f"leaf{i}"] for i in range(5)}
    assert len(leaf_ranks) == 1  # symmetric leaves tie exactly


def test_probability_mass_conserved_to_rounding(spark):
    edges = _undirected(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")])
    total = sum(
        r.rank_fp for r in pagerank_fixed_point(edges).collect()
    )
    # floor-rounding only ever loses mass, bounded by (#nodes + 1) units
    # per iteration per term; with SCALE=1e12 the drift is negligible
    assert 0.999 * SCALE <= total <= SCALE
