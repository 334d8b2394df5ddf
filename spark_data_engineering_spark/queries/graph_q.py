"""Graph query under the correctness gate: fixed-point PageRank over the
user↔item click graph, bit-exact against an unrolled SQL replay."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_data_engineering_spark.operators.graph import pagerank_fixed_point
from spark_data_engineering_spark.registry import query
from spark_data_engineering_spark.sources import load_table
from spark_data_engineering_spark.materialize import materialize

_ITERS = 5


def _pagerank_oracle(iters: int = _ITERS) -> str:
    """Unroll the fixed-point iterations as chained CTEs (generated —
    five hand-written join stages would be noise). Every arithmetic step
    mirrors operators/graph.py exactly: BIGINT state, FLOOR(double/deg),
    FLOOR(0.85 * sum), integer base term."""
    sql = """
    WITH ed AS (
        SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS src,
               'i:' || CAST(CAST(json_extract(props, '$.k') AS BIGINT) AS VARCHAR) AS dst
        FROM events
    ),
    e AS (SELECT src, dst FROM ed UNION ALL SELECT dst AS src, src AS dst FROM ed),
    nodes AS (SELECT DISTINCT src AS node FROM e),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
    r0 AS (SELECT node, 1000000000000 // n AS rank FROM nodes, nn)"""
    for i in range(iters):
        sql += f""",
    s{i} AS (
        SELECT e.dst AS node,
               SUM(CAST(FLOOR(CAST(r.rank AS DOUBLE) / d.deg) AS BIGINT)) AS s
        FROM e JOIN r{i} r ON e.src = r.node JOIN deg d ON e.src = d.src
        GROUP BY e.dst
    ),
    r{i + 1} AS (
        SELECT nd.node,
               CAST(FLOOR(0.15 * 1000000000000.0 / nn.n) AS BIGINT)
               + CAST(FLOOR(0.85 * CAST(COALESCE(s{i}.s, 0) AS DOUBLE)) AS BIGINT)
                   AS rank
        FROM nodes nd CROSS JOIN nn LEFT JOIN s{i} ON nd.node = s{i}.node
    )"""
    return sql + f"""
    SELECT node, rank AS rank_fp FROM r{iters}
    """


@query("pagerank_click_graph", oracle=_pagerank_oracle())
def pagerank_click_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (5 iterations, d=0.85) over the undirected bipartite
    user↔item graph from events (item = props.k). Fixed-point BIGINT
    ranks make the iterative float math bit-identical across engines —
    the oracle replays all five iterations as unrolled CTEs and the
    hashes must agree exactly, no tolerance."""
    ev = load_table(spark, "events", sf_dir)
    ed = ev.select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("src"),
        F.concat(
            F.lit("i:"),
            F.get_json_object("props", "$.k").cast("bigint").cast("string"),
        ).alias("dst"),
        # materialize before the direction union: both branches would
        # otherwise re-run the events scan + JSON extract + distinct in
        # one job (guide §2.4 — don't compute things twice)
    ).distinct().transform(materialize)
    edges = ed.union(ed.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return pagerank_fixed_point(edges, iterations=_ITERS)


@query(
    "neardup_triangle_stats",
    oracle="""
    WITH e AS (
        SELECT a.vec_id AS s, b.vec_id AS d
        FROM embeddings a, embeddings b
        WHERE a.vec_id < b.vec_id
          AND FLOOR((LIST_COSINE_SIMILARITY(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[]))) * 10000 + 0.5) / 10000 >= 0.45
    ),
    tri AS (
        SELECT COUNT(*) AS t
        FROM e e1 JOIN e e2 ON e1.d = e2.s JOIN e e3
             ON e3.s = e1.s AND e3.d = e2.d
    ),
    deg AS (
        SELECT v, COUNT(*) AS dg FROM (
            SELECT s AS v FROM e UNION ALL SELECT d FROM e
        ) GROUP BY v
    ),
    wedges AS (SELECT SUM(dg * (dg - 1) / 2) AS w FROM deg)
    SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_vertices,
           CAST((SELECT t FROM tri) AS BIGINT) AS n_triangles,
           CAST((SELECT w FROM wedges) AS BIGINT) AS n_wedges,
           FLOOR((3.0 * (SELECT t FROM tri)
                  / GREATEST((SELECT w FROM wedges), 1)) * 10000 + 0.5)
               / 10000 AS clustering_coefficient
    """,
)
def neardup_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting + global clustering coefficient (round 6) over
    the embedding near-dup graph (cosine >= 0.45 pairs — SPARSE by
    construction: edges exist only between near-duplicates, which is
    what makes triangle enumeration tractable at any corpus size; a
    co-click-style projection was rejected here because hot items make
    it near-complete — measured 2.7B candidate pairs at 10x — and no
    fixed hot-item cap survives this corpus's uniform popularity). The
    count uses the canonical-orientation edge join (s < d everywhere,
    each triangle generated exactly once as s < m < d); clustering
    coefficient = 3*triangles / wedges with exact integer counts, so
    the whole statistic hash-matches the SQL replay. High clustering
    here means near-dup groups are cliques (true duplicate clusters)
    rather than chains (drift) — the audit signal for choosing a
    connected-components vs clique-based dedup policy.

    Scale: edge generation is the adjudicated blocked all-pairs
    (LSH-candidate pairs at corpus scale); both triangle joins are hash
    equi-joins on vertex keys over the sparse edge set."""
    from spark_data_engineering_spark.operators.similarity import (
        cosine_pairs_blocked,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    # the sparse edge set feeds FOUR consumers (three triangle join
    # legs and the degree pass, which also carries the edge count);
    # materialize it once or each re-executes the full blocked
    # all-pairs plan (measured 42 s -> ~8 s at sf0.01) — same eager-cut
    # finding as minhash_lsh_dedup's candidate set
    e = (
        cosine_pairs_blocked(emb, threshold=0.45)
        .select(F.col("id_a").alias("s"), F.col("id_b").alias("d"))
        .transform(materialize)
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri_df = e1.join(e2, F.col("e1.d") == F.col("e2.s")).join(
        e3,
        (F.col("e3.s") == F.col("e1.s")) & (F.col("e3.d") == F.col("e2.d")),
    )
    deg = (
        e.select(F.col("s").alias("v"))
        .unionAll(e.select(F.col("d").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("dg"))
    )
    # r14 (guide §2.4/§2.6): the edge count rides the degree aggregate
    # (sum(dg) is exactly 2|E| — every edge row contributes two degree
    # increments), dropping the third full pass over the checkpointed
    # edge set; the remaining two actions (triangle join, degree stats)
    # are independent, so they run as concurrent driver jobs instead of
    # back to back.
    stats_df = deg.agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.sum(F.col("dg") * (F.col("dg") - 1) / 2).alias("n_wedges"),
        F.sum("dg").alias("deg_total"),
    )
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        tri_f = pool.submit(tri_df.count)
        stats_f = pool.submit(stats_df.first)
        tri, stats = tri_f.result(), stats_f.result()
    import math as _math

    n_edges = int(stats["deg_total"] or 0) // 2
    n_vertices = int(stats["n_vertices"] or 0)
    wedges = int(stats["n_wedges"] or 0)
    cc = _math.floor((3.0 * tri / max(wedges, 1)) * 10000 + 0.5) / 10000
    return spark.createDataFrame(
        [(n_edges, n_vertices, tri, wedges, cc)],
        "n_edges bigint, n_vertices bigint, n_triangles bigint, "
        "n_wedges bigint, clustering_coefficient double",
    )
