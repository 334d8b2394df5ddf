"""Round-6 graph/SQL-surface/privacy additions: triangle counting on a
known graph, the recursive-CTE tree walk, and the k-anonymity audit."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod


def test_triangle_count_on_known_graph(spark):
    """K4 minus one edge has exactly 2 triangles and 8 wedges; replay
    the same canonical-orientation join used by the query."""
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)]  # no (3,4)
    e = spark.createDataFrame(edges, "s bigint, d bigint")
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.d") == F.col("e2.s"))
        .join(e3, (F.col("e3.s") == F.col("e1.s")) & (F.col("e3.d") == F.col("e2.d")))
        .count()
    )
    assert tri == 2  # {1,2,3} and {1,2,4}
    deg = (
        e.select(F.col("s").alias("v"))
        .unionAll(e.select(F.col("d").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("dg"))
    )
    wedges = int(deg.agg(F.sum(F.col("dg") * (F.col("dg") - 1) / 2)).first()[0])
    assert wedges == 8  # deg 3,3,2,2 -> 3+3+1+1
    # global clustering coefficient of this graph is 3*2/8
    assert 3 * tri / wedges == 0.75


def test_triangle_query_internal_consistency(spark, sf_dir):
    r = entrymod.queries()["neardup_triangle_stats"](spark, sf_dir).first()
    assert r.n_vertices > 0 and r.n_edges > 0
    assert 0 <= r.clustering_coefficient <= 1
    # every triangle contributes 3 wedges
    assert 3 * r.n_triangles <= r.n_wedges


def test_hierarchy_depths_form_binary_tree(spark, sf_dir):
    from spark_data_engineering_spark.sources import load_table

    rows = {r.depth: r for r in entrymod.queries()["doc_hierarchy_depths"](spark, sf_dir).collect()}
    n = load_table(spark, "documents", sf_dir).count()
    assert sum(r.n_docs for r in rows.values()) == n  # every doc reached once
    assert rows[0].n_docs == 2 and rows[0].min_doc == 0 and rows[0].max_doc == 1
    # depth d of a binary tree holds doc ids [2^d, 2^(d+1)) (roots 0,1)
    for d, r in rows.items():
        if d == 0:
            continue
        assert r.min_doc >= 2**d and r.max_doc < 2 ** (d + 1)
        assert rows[d - 1].max_doc < r.min_doc


def test_k_anonymity_hand_check(spark, sf_dir):
    from spark_data_engineering_spark.sources import load_table

    got = entrymod.queries()["k_anonymity_report"](spark, sf_dir).first()
    docs = load_table(spark, "documents", sf_dir).select("lang", "source", "n_chars").collect()
    classes: dict[tuple, int] = {}
    for r in docs:
        key = (r.lang, r.source, r.n_chars // 20)
        classes[key] = classes.get(key, 0) + 1
    assert got.n_classes == len(classes)
    assert got.min_class_size == min(classes.values())
    assert got.n_violating_classes == sum(1 for v in classes.values() if v < 5)
    assert got.n_docs_at_risk == sum(v for v in classes.values() if v < 5)
    assert got.is_5_anonymous == (min(classes.values()) >= 5)
