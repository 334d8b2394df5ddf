"""Iterative graph algorithms as DataFrame loops — fixed-point PageRank.

Complements ``operators/dedup.py::dedup_clusters`` (min-label
propagation): PageRank is the canonical "iterative joins until
convergence" workload, here with a FIXED iteration count so the result
is a pure deterministic function of the edge set — which makes an exact
SQL oracle possible for an algorithm that is normally float-fuzzy.

The determinism trick is fixed-point integer arithmetic: ranks live in
BIGINT micro-units (scale 1e12). Every step is either exact integer
math (sums, integer init) or an identical IEEE double op sequence on
integers < 2^53 (divide by degree, damping multiply, floor) — so Spark
and DuckDB produce bit-identical BIGINT ranks with no tolerance needed.
Floats-summed-in-arbitrary-order never appears: per-node contribution
sums are integer sums, associative and partitioning-independent.

Scale: each iteration is one join edges⋈ranks (shuffle on src — at
cluster scale pre-partition both by src so iterations reuse the
exchange) + one partial-aggregated groupBy(dst). Plans are cut per
iteration with materialize() (spark_data_engineering_spark/materialize
— localCheckpoint by default, SPARK_GRAFT_MATERIALIZE=reliable for a
real checkpoint dir), the same lineage-bounding every iterative Spark
algorithm needs (dedup_clusters does likewise); for billion-edge graphs
set the reliable mode to HDFS and AQE handles the
skewed-celebrity-node partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from spark_data_engineering_spark.materialize import materialize

SCALE = 10**12


def pagerank_fixed_point(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over directed (src, dst) string-id edges; pass both
    directions for an undirected graph (then every node has out-degree
    ≥ 1, so there are no dangling nodes to redistribute). Returns
    (node, rank_fp) with rank_fp in BIGINT micro-units of probability.
    """
    # r14 (guide §2.4): materialize the RAW edge set first — the node
    # derivation and the old post-repartition materialize each re-ran
    # the caller's whole edge pipeline (for the click graph: an events
    # scan + JSON extract + distinct per union branch — four source
    # passes before the loop). Everything below reads this checkpoint.
    edges = edges.transform(materialize)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .transform(materialize)
    )
    n = nodes.count()  # driver scalar: graph metadata, O(1) result
    # size partitions to the graph (tiny-task overhead dominates small
    # graphs — the dedup_clusters lesson); at cluster scale pass a
    # pre-partitioned edge set and this coalesce is a no-op
    p = max(2, min(32, n // 50_000 + 2))
    edges = edges.repartition(p, "src")
    nodes = nodes.repartition(p, "node")
    deg = edges.groupBy("src").agg(F.count("*").cast("bigint").alias("deg"))
    # r13 optimization (guide §2.4): edges ⋈ deg is loop-INVARIANT —
    # computing it inside the loop re-ran the degree aggregate and its
    # join every iteration (5 extra aggs + joins in the unrolled plan).
    # Materialize (src, dst, deg) once; each iteration is then one join
    # against the current ranks + one aggregate + the node left join.
    edges_deg = (
        edges.join(deg, "src").select("src", "dst", "deg").transform(materialize)
    )
    base = int((0.15 * SCALE) / n)  # == FLOOR, same IEEE ops as the SQL oracle
    ranks = nodes.select("node", F.lit(SCALE // n).cast("bigint").alias("rank"))
    for it in range(iterations):
        contrib = (
            edges_deg
            .join(ranks, edges_deg["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.floor(F.col("rank").cast("double") / F.col("deg"))
                .cast("bigint")
                .alias("c"),
            )
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                (
                    F.lit(base).cast("bigint")
                    + F.floor(
                        F.lit(damping) * F.coalesce(F.col("s"), F.lit(0)).cast("double")
                    ).cast("bigint")
                ).alias("rank"),
            )
        )
        # cut lineage every other iteration (and on the last): enough to
        # bound plan growth, half the materialization barriers
        if it % 2 == 1 or it == iterations - 1:
            ranks = ranks.transform(materialize)
    return ranks.select("node", F.col("rank").alias("rank_fp"))
