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


def _recall_vs_bruteforce(spark, sf_dir, approx_fn, k=10):
    from pyspark.sql import functions as F2

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F2.col("vec_id") < 5)
    bf = {
        (r.query_id, r.neighbor_id)
        for r in S.brute_force_knn(emb, queries, k=k).collect()
    }
    approx = approx_fn(emb, queries)
    hits = sum(1 for r in approx.collect() if (r.query_id, r.neighbor_id) in bf)
    return hits / max(len(bf), 1)


def test_multiprobe_beats_single_probe(spark, sf_dir):
    single = _recall_vs_bruteforce(spark, sf_dir, lambda c, q: S.lsh_knn(c, q, k=10))
    multi = _recall_vs_bruteforce(
        spark, sf_dir, lambda c, q: S.lsh_knn_multiprobe(c, q, k=10, n_probes=9)
    )
    assert multi >= single
    # these embeddings are near-random (max pairwise cosine ~0.5), the
    # hardest regime for hyperplane LSH — multi-probe still triples
    # single-probe recall (measured 0.06 -> 0.20)
    assert multi >= 0.15


def test_ivf_knn_recall_and_shape(spark, sf_dir):
    recall = _recall_vs_bruteforce(
        spark, sf_dir, lambda c, q: S.ivf_knn(c, q, k=10, n_centroids=8, n_probe=4)
    )
    assert recall >= 0.5  # probing half the cells
    out = S.ivf_knn(
        load_table(spark, "embeddings", sf_dir),
        load_table(spark, "embeddings", sf_dir).filter("vec_id < 2"),
        k=5,
        n_centroids=8,
        n_probe=8,  # probe everything -> exact within cells
    ).collect()
    assert {r.query_id for r in out} == {0, 1}
    assert all(1 <= r.rank <= 5 for r in out)
