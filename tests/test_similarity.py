"""Unit tests for similarity-search operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_data_engineering_spark.operators import similarity as S
from spark_data_engineering_spark.sources import load_table


def _vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),  # close to 0
        (2, [0.0, 1.0, 0.0, 0.0]),  # orthogonal to 0
        (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite of 0
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_brute_force_knn_ordering(spark):
    vecs = _vecs(spark)
    out = S.brute_force_knn(vecs, vecs.filter(F.col("vec_id") == 0), k=3).collect()
    ranked = [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)]
    assert ranked == [1, 2, 3]  # by descending cosine
    assert all(r.query_id == 0 for r in out)


def test_brute_force_excludes_self(spark):
    vecs = _vecs(spark)
    out = S.brute_force_knn(vecs, vecs, k=10).collect()
    assert all(r.neighbor_id != r.query_id for r in out)


def test_lsh_recall_on_real_embeddings(spark, sf_dir):
    """LSH top-k must be a high-cosine subset: every LSH hit at rank 1
    must appear in the brute-force top-k for the same query."""
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 5)
    bf = {
        (r.query_id, r.neighbor_id)
        for r in S.brute_force_knn(emb, queries, k=50).collect()
    }
    lsh_top = [r for r in S.lsh_knn(emb, queries, k=10).collect() if r.rank == 1]
    assert lsh_top, "LSH returned nothing"
    in_bf = sum(1 for r in lsh_top if (r.query_id, r.neighbor_id) in bf)
    assert in_bf / len(lsh_top) >= 0.5
