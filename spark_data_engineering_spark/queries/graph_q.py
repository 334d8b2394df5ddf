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
