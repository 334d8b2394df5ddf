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
    single = _recall_vs_bruteforce(
        spark, sf_dir, lambda c, q: S.lsh_knn(c, q, k=10, n_probes=1)
    )
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


def test_cosine_pairs_blocked_matches_collect_path(spark, sf_dir):
    """The distributed block-matrix all-pairs must be bit-identical to
    the (small-N verifier) driver-collect path, across block counts that
    exercise diagonal-only and many-block layouts."""
    emb = load_table(spark, "embeddings", sf_dir)
    expected = {
        (r.id_a, r.id_b, r.cos_sim) for r in S.cosine_pairs(emb, threshold=0.4).collect()
    }
    assert expected  # threshold produces a non-empty answer on this corpus
    for n_blocks in (1, 3, 8):
        got = {
            (r.id_a, r.id_b, r.cos_sim)
            for r in S.cosine_pairs_blocked(emb, threshold=0.4, n_blocks=n_blocks).collect()
        }
        assert got == expected, f"n_blocks={n_blocks}"


def test_cosine_pairs_blocked_plan_is_distributed(spark, sf_dir):
    """The registered near-dup query must not materialize the corpus on
    the driver: its physical plan scores groups via FlatMapGroupsInPandas
    over a parquet scan — no LocalTableScan of corpus size, no collect
    during plan construction."""
    emb = load_table(spark, "embeddings", sf_dir)
    plan = (
        S.cosine_pairs_blocked(emb, threshold=0.4, n_blocks=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FlatMapGroupsInPandas" in plan
    assert "Scan parquet" in plan


def test_int8_knn_recall_vs_exact(spark, sf_dir):
    """Quantization noise must barely perturb the top-10: recall@10 vs
    the exact float kNN stays high (int8 keeps ~2 decimal digits of
    cosine resolution)."""
    from spark_data_engineering_spark.sources import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 5)
    exact = S.brute_force_knn(emb, queries, k=10)
    quant = S.int8_knn(emb, queries, k=10)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    q = {(r.query_id, r.neighbor_id) for r in quant.collect()}
    recall = len(e & q) / len(e)
    assert recall >= 0.8, f"int8 recall@10 = {recall}"


def test_quantize_int8_bounds_and_zero_vector(spark):
    rows = [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r.qvec for r in S.quantize_int8(df).collect()}
    assert out[1] == [64.0, -127.0, 32.0]  # floor(x*127/max_abs + 0.5)
    assert out[2] == [0.0, 0.0, 0.0]
    assert all(-127 <= v <= 127 for v in out[1])


def test_pq_knn_recall_and_shape(spark, sf_dir):
    """PQ recall@10 vs exact brute force: 16 subspaces x 32 codes on
    64-dim embeddings (16x compression), ADC short-list at 4x over-fetch
    then exact re-rank. The synthetic embeddings are near-isotropic —
    the hardest case for PQ — so the bar is 0.7, not the ~0.95 a
    clustered corpus would give; shape/determinism contract matches the
    other kNN variants."""
    recall = _recall_vs_bruteforce(
        spark, sf_dir, lambda c, q: S.pq_knn(c, q, k=10, m=16, n_codes=32)
    )
    assert recall >= 0.7, f"pq recall@10 = {recall}"
    out = S.pq_knn(
        load_table(spark, "embeddings", sf_dir),
        load_table(spark, "embeddings", sf_dir).filter(F.col("vec_id") < 2),
        k=5,
    )
    rows = out.collect()
    assert {r.query_id for r in rows} == {0, 1}
    assert all(1 <= r.rank <= 5 for r in rows)
    assert all(r.neighbor_id != r.query_id for r in rows)
    # deterministic across runs (fixed sample + init)
    again = S.pq_knn(
        load_table(spark, "embeddings", sf_dir),
        load_table(spark, "embeddings", sf_dir).filter(F.col("vec_id") < 2),
        k=5,
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_ivf_low_probe_high_recall_on_clustered_corpus(spark):
    """The testdata embeddings are near-uniform in R^64 (mean pairwise
    cosine ~0.001) — the degenerate regime for IVF, which is why the
    production default needs 12-of-32 probes there (SCALE.md sweep).
    This test pins the operator's behavior in the REALISTIC regime:
    clustered vectors (what trained text/image encoders produce). With
    20 well-separated clusters, probing 4 of 32 cells (12.5% scan
    fraction) must reach recall@10 >= 0.9 vs brute force."""
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(20, 32))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(1000):
        c = i % 20
        v = centers[c] + 0.15 * rng.normal(size=32)
        rows.append((i, [float(x) for x in v]))
    corpus = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    queries = corpus.filter("vec_id < 5")
    bf = {
        (r.query_id, r.neighbor_id)
        for r in S.brute_force_knn(corpus, queries, k=10).collect()
    }
    approx = S.ivf_knn(corpus, queries, k=10, n_centroids=32, n_probe=4)
    hits = sum(1 for r in approx.collect() if (r.query_id, r.neighbor_id) in bf)
    assert hits / len(bf) >= 0.9
