"""SemDeDup invariants + the clustered-regime recall pin."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from spark_data_engineering_spark.operators.semdedup import semantic_dedup
from spark_data_engineering_spark.sources import load_table


def test_verdict_invariants(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    out = semantic_dedup(emb, threshold=0.45, n_clusters=4).cache()
    assert out.count() == emb.count()  # one verdict per vector
    # reps keep themselves; drops point at a smaller kept id
    assert out.filter((F.col("vec_id") == F.col("rep_id")) & ~F.col("keep")).count() == 0
    assert out.filter((F.col("vec_id") != F.col("rep_id")) & F.col("keep")).count() == 0
    assert out.filter(F.col("rep_id") > F.col("vec_id")).count() == 0
    reps = out.select(F.col("rep_id").alias("vec_id")).distinct()
    kept = out.filter(F.col("keep")).select("vec_id")
    assert reps.join(kept, "vec_id", "left_anti").count() == 0
    # every drop is linked into its component at >= threshold
    assert out.filter(~F.col("keep") & (F.col("max_sim") < 0.45)).count() == 0
    out.unpersist()


def test_partitioning_invariance(spark, sf_dir):
    """Verdicts must not depend on the input partitioning (round-4
    similarity rounding happens before thresholding)."""
    emb = load_table(spark, "embeddings", sf_dir)
    a = {
        (r.vec_id, r.rep_id, r.keep)
        for r in semantic_dedup(emb, threshold=0.45, n_clusters=4).collect()
    }
    b = {
        (r.vec_id, r.rep_id, r.keep)
        for r in semantic_dedup(emb.repartition(13), threshold=0.45, n_clusters=4).collect()
    }
    assert a == b


def _clustered_corpus(spark, n_groups=20, dups_per_group=3, dim=32, seed=7):
    """Well-separated groups with exact near-dups inside each: the
    regime real embedding corpora live in."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_groups, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    vid = 0
    for g in range(n_groups):
        for d in range(dups_per_group):
            v = base[g] + rng.normal(scale=0.02, size=dim)  # sim ~0.999
            rows.append((vid, [float(x) for x in v], g))
            vid += 1
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_clustered_regime_full_recall(spark):
    """On separated groups, cluster-bounded dedup must find EVERY exact
    near-dup: drop_recall = 1.0 — the counterpoint to the ~0.79 the
    near-uniform synthetic testdata yields (semantic_dedup_report)."""
    from spark_data_engineering_spark.operators.dedup import dedup_clusters
    from spark_data_engineering_spark.operators.similarity import cosine_pairs_blocked

    emb = _clustered_corpus(spark)
    sem = semantic_dedup(emb, threshold=0.9, n_clusters=8)
    pairs = cosine_pairs_blocked(emb, threshold=0.9)
    exact = dedup_clusters(pairs, emb.select("vec_id"), id_col="vec_id")
    exact_drops = {r.vec_id for r in exact.filter(F.col("vec_id") != F.col("cluster_id")).collect()}
    sem_drops = {r.vec_id for r in sem.filter(~F.col("keep")).collect()}
    assert len(exact_drops) == 20 * 2  # each group keeps one of three
    assert sem_drops == exact_drops


def test_no_dups_no_drops(spark):
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(40, 16))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)], ["vec_id", "embedding"]
    )
    out = semantic_dedup(emb, threshold=0.99, n_clusters=4)
    assert out.filter(~F.col("keep")).count() == 0


def test_overlap2_verdict_invariants_and_recall_lift(spark, sf_dir):
    """epsilon-overlap (top-2 centroid assignment): same verdict
    invariants as single-assignment, drops form a superset regime
    (every single-assignment drop stays or its whole component merges
    under a smaller rep), and on this corpus recall lifts to the exact
    CC result (14 drops vs 11 — the pinned report rows)."""
    emb = load_table(spark, "embeddings", sf_dir)
    out = semantic_dedup(emb, threshold=0.45, n_clusters=4, n_overlap=2).cache()
    assert out.count() == emb.count()
    assert out.filter((F.col("vec_id") == F.col("rep_id")) & ~F.col("keep")).count() == 0
    assert out.filter((F.col("vec_id") != F.col("rep_id")) & F.col("keep")).count() == 0
    assert out.filter(F.col("rep_id") > F.col("vec_id")).count() == 0
    assert out.filter(~F.col("keep") & (F.col("max_sim") < 0.45)).count() == 0
    single_drops = (
        semantic_dedup(emb, threshold=0.45, n_clusters=4)
        .filter(~F.col("keep"))
        .count()
    )
    overlap_drops = out.filter(~F.col("keep")).count()
    assert overlap_drops >= single_drops
    out.unpersist()


def test_overlap2_partitioning_invariance(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    a = {
        (r.vec_id, r.rep_id, r.keep)
        for r in semantic_dedup(
            emb, threshold=0.45, n_clusters=4, n_overlap=2
        ).collect()
    }
    b = {
        (r.vec_id, r.rep_id, r.keep)
        for r in semantic_dedup(
            emb.repartition(13), threshold=0.45, n_clusters=4, n_overlap=2
        ).collect()
    }
    assert a == b


def test_fused_pair_sets_reproduce_both_regimes(spark, sf_dir):
    """overlap_pair_sets (the report's one-pass fusion) must reproduce
    the operator's drop sets exactly for BOTH regimes: CC over the
    both-primary subset == semantic_dedup(n_overlap=1) drops, CC over
    all pairs == semantic_dedup(n_overlap=2) drops."""
    from spark_data_engineering_spark.operators.dedup import dedup_clusters
    from spark_data_engineering_spark.operators.semdedup import overlap_pair_sets

    emb = load_table(spark, "embeddings", sf_dir)
    pairs_all, pairs_primary = overlap_pair_sets(emb, threshold=0.45, n_clusters=4)
    ids = emb.select("vec_id")

    def drops_cc(pairs):
        cc = dedup_clusters(pairs, ids, id_col="vec_id")
        return {r.vec_id for r in cc.filter(F.col("vec_id") != F.col("cluster_id")).collect()}

    def drops_op(n_overlap):
        out = semantic_dedup(emb, threshold=0.45, n_clusters=4, n_overlap=n_overlap)
        return {r.vec_id for r in out.filter(~F.col("keep")).collect()}

    assert drops_cc(pairs_primary) == drops_op(1)
    assert drops_cc(pairs_all) == drops_op(2)
