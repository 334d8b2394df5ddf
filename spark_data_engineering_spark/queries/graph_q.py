"""Graph query under the correctness gate: fixed-point PageRank over the
user↔item click graph, bit-exact against an unrolled SQL replay."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_data_engineering_spark.operators.graph import pagerank_fixed_point
from spark_data_engineering_spark.registry import query
from spark_data_engineering_spark.sources import load_table

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
    ).distinct()
    edges = ed.union(ed.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return pagerank_fixed_point(edges, iterations=_ITERS)


@query(
    "coclick_triangle_stats",
    oracle="""
    WITH ui AS (
        SELECT DISTINCT user_id AS u,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
        FROM events
        WHERE user_id IS NOT NULL AND json_extract_string(props, '$.k') IS NOT NULL
    ),
    e AS (
        SELECT DISTINCT a.u AS s, b.u AS d
        FROM ui a JOIN ui b ON a.item = b.item AND a.u < b.u
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
           FLOOR((3.0 * (SELECT t FROM tri) / (SELECT w FROM wedges)) * 10000 + 0.5)
               / 10000 AS clustering_coefficient
    """,
)
def coclick_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting + global clustering coefficient (round 6) over
    the user co-click projection (users sharing a clicked item). The
    count uses the canonical-orientation edge join (s < d everywhere,
    so each triangle is generated exactly once as s < m < d — the
    node-iterator family; at production scale the canonical order is by
    (degree, id) so hub vertices never enumerate their full
    neighborhood, same join shape). Clustering coefficient =
    3·triangles / wedges with exact integer counts, so the whole graph
    statistic hash-matches the SQL replay.

    Scale: the projection and both joins are hash equi-joins on vertex
    keys; wedge counts are one degree aggregation. The quadratic
    per-item pair expansion is bounded by item popularity — the skew
    guard at 100 TB is the same hot-key salting the dedup family uses."""
    ev = load_table(spark, "events", sf_dir)
    ui = (
        ev.select(
            F.col("user_id").alias("u"),
            F.get_json_object("props", "$.k").cast("bigint").alias("item"),
        )
        .filter(F.col("u").isNotNull() & F.col("item").isNotNull())
        .distinct()
    )
    a, b = ui.alias("a"), ui.alias("b")
    e = (
        a.join(b, (F.col("a.item") == F.col("b.item")) & (F.col("a.u") < F.col("b.u")))
        .select(F.col("a.u").alias("s"), F.col("b.u").alias("d"))
        .distinct()
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.d") == F.col("e2.s"))
        .join(
            e3,
            (F.col("e3.s") == F.col("e1.s")) & (F.col("e3.d") == F.col("e2.d")),
        )
        .count()
    )
    deg = (
        e.select(F.col("s").alias("v"))
        .unionAll(e.select(F.col("d").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("dg"))
    )
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.sum(F.col("dg") * (F.col("dg") - 1) / 2).alias("n_wedges"),
    ).first()
    import math as _math

    n_edges = e.count()
    wedges = int(stats["n_wedges"])
    cc = _math.floor((3.0 * tri / wedges) * 10000 + 0.5) / 10000 if wedges else 0.0
    return spark.createDataFrame(
        [(n_edges, int(stats["n_vertices"]), tri, wedges, cc)],
        "n_edges bigint, n_vertices bigint, n_triangles bigint, "
        "n_wedges bigint, clustering_coefficient double",
    )
