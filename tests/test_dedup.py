"""Unit tests for dedup operators on small inline DataFrames."""

from __future__ import annotations

from spark_data_engineering_spark.operators import dedup as D


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),  # near dup of 1
        (4, "completely different words appear in this sentence here"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_duplicates(spark):
    out = D.exact_duplicates(_docs(spark)).collect()
    by_copies = {r.keep_id: r.n_copies for r in out}
    assert by_copies[1] == 2  # docs 1 and 2 collapse, min id kept
    assert by_copies[3] == 1
    assert by_copies[4] == 1
    assert len(out) == 3


def test_jaccard_pairs_finds_near_dup(spark):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in D.jaccard_pairs(_docs(spark), threshold=0.5).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
    assert (1, 4) not in pairs


def test_minhash_lsh_matches_exact_on_high_threshold(spark):
    docs = _docs(spark)
    exact = {(r.id_a, r.id_b) for r in D.jaccard_pairs(docs, threshold=0.8).collect()}
    lsh = {(r.id_a, r.id_b) for r in D.minhash_lsh_dedup(docs, threshold=0.8).collect()}
    assert lsh == exact  # identical docs always collide in every band


def test_simhash_identical_docs_same_signature(spark):
    sigs = {r._id: r.simhash for r in D.simhash(_docs(spark)).collect()}
    assert sigs[1] == sigs[2]
    # near-dup should be hamming-close, distinct doc far
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(sigs[1], sigs[3]) <= ham(sigs[1], sigs[4])


def test_simhash_near_pairs(spark):
    pairs = {(r.id_a, r.id_b) for r in D.simhash_near_pairs(_docs(spark), max_hamming=2).collect()}
    assert (1, 2) in pairs
    assert (1, 4) not in pairs


def test_dedup_clusters_transitive(spark):
    # chain 1-2, 2-3 plus isolated 4: one cluster {1,2,3} labeled 1
    pairs = spark.createDataFrame([(1, 2, 1.0), (2, 3, 0.9)], ["id_a", "id_b", "jaccard"])
    ids = spark.createDataFrame([(i,) for i in range(1, 5)], ["doc_id"])
    out = {r.doc_id: r.cluster_id for r in D.dedup_clusters(pairs, ids).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 4}


def test_dedup_clusters_long_chain(spark):
    # 0-1-2-...-9 chain needs multiple propagation rounds
    pairs = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(9)], ["id_a", "id_b", "jaccard"]
    )
    ids = spark.createDataFrame([(i,) for i in range(10)], ["doc_id"])
    out = {r.doc_id: r.cluster_id for r in D.dedup_clusters(pairs, ids).collect()}
    assert all(v == 0 for v in out.values())


def test_dedup_clusters_rejects_string_ids(spark):
    import pytest

    pairs = spark.createDataFrame([("a", "b", 1.0)], ["id_a", "id_b", "jaccard"])
    ids = spark.createDataFrame([("a",), ("b",)], ["doc_id"])
    with pytest.raises(TypeError, match="integral"):
        D.dedup_clusters(pairs, ids)


def test_lsh_rejects_oversized_banding(spark):
    import pytest
    from py4j.protocol import Py4JJavaError

    sigs = D.minhash_signatures(_docs(spark), num_hashes=8)
    with pytest.raises(Exception, match="exceeds signature length"):
        D.lsh_candidate_pairs(sigs, bands=8, rows=4).collect()


def test_containment_scores(spark):
    corpus = spark.createDataFrame(
        [(1, "a b c d e"), (2, "m n o p")], ["doc_id", "text"]
    )
    bench = spark.createDataFrame(
        [
            (100, "a b c d"),        # both 3-grams contained -> 100%
            (101, "a b c x y z"),    # 1 of 4 contained -> 25%
            (102, "p q r s"),        # none contained -> 0%
            (103, "hi"),             # < 3 tokens -> absent
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in D.containment_scores(corpus, bench).collect()}
    assert set(out) == {100, 101, 102}
    assert (out[100].n_shingles, out[100].n_overlap, out[100].contamination_pct) == (2, 2, 100.0)
    assert (out[101].n_shingles, out[101].n_overlap, out[101].contamination_pct) == (4, 1, 25.0)
    assert (out[102].n_shingles, out[102].n_overlap, out[102].contamination_pct) == (2, 0, 0.0)


def test_lsh_bucket_cap_guardrail(spark):
    """A degenerate corpus where every doc shares one signature must not
    produce quadratic candidates when the cap fires; healthy corpora are
    untouched (cap never fires there - asserted by the oracle-matching
    minhash_lsh_pairs query)."""
    from spark_data_engineering_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(i, "the same exact boilerplate text repeated everywhere") for i in range(40)],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(docs)
    uncapped = lsh_candidate_pairs(sigs, max_bucket=None)
    assert uncapped.count() == 40 * 39 // 2  # full pairwise
    capped = lsh_candidate_pairs(sigs, max_bucket=10)
    assert capped.count() == 0  # every band bucket is hot -> dropped


def test_dedup_clusters_driver_and_distributed_paths_agree(spark, monkeypatch):
    """The adaptive small-graph union-find must produce exactly the
    distributed min-label propagation's output (patch the cap to 0 to
    force the big path on the same input)."""
    from spark_data_engineering_spark.operators import dedup as D2

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (3, 20)],
        "id_a bigint, id_b bigint",
    )
    ids = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 20, 21, 22, 99]],
                                "doc_id bigint")
    small = {(r.doc_id, r.cluster_id) for r in D2.dedup_clusters(pairs, ids).collect()}
    monkeypatch.setattr(D2, "_DRIVER_CC_MAX_EDGES", 0)
    big = {(r.doc_id, r.cluster_id) for r in D2.dedup_clusters(pairs, ids).collect()}
    assert small == big
    # min-label semantics: 1-2-3-20-21-22 all label 1; 10-11 label 10
    assert (22, 1) in small and (11, 10) in small and (99, 99) in small


# ---- prefix-filtered exact Jaccard (round 6) ---------------------------


def test_prefix_jaccard_equals_unfiltered(spark, sf_dir):
    from spark_data_engineering_spark.operators.dedup import (
        jaccard_pairs,
        jaccard_pairs_prefix,
    )
    from spark_data_engineering_spark.sources import load_table

    docs = load_table(spark, "documents", sf_dir)
    for t in (0.5, 0.8, 0.95):
        want = sorted(map(tuple, jaccard_pairs(docs, threshold=t).collect()))
        got = sorted(map(tuple, jaccard_pairs_prefix(docs, threshold=t).collect()))
        assert got == want, f"threshold {t}"
    assert want  # the corpus has planted near-dups; non-vacuous


def test_prefix_jaccard_prunes_candidates(spark, sf_dir):
    """The point of the operator: the prefix self-join generates
    strictly fewer candidate pairs than the any-shared-shingle join."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window as W
    from spark_data_engineering_spark.operators.dedup import shingle_index
    from spark_data_engineering_spark.sources import load_table

    docs = load_table(spark, "documents", sf_dir)
    idx = shingle_index(docs, "text", "doc_id", 3).select(
        "_id", F.xxhash64("_shingle").alias("_h")
    )
    a, b = idx.alias("a"), idx.alias("b")
    full_cand = (
        a.join(b, (F.col("a._h") == F.col("b._h")) & (F.col("a._id") < F.col("b._id")))
        .select(F.col("a._id"), F.col("b._id"))
        .distinct()
        .count()
    )
    t = 0.8
    sizes = idx.groupBy("_id").agg(F.count("*").alias("_sz"))
    dfreq = idx.groupBy("_h").agg(F.count("*").alias("_df"))
    ranked = idx.join(dfreq, "_h").join(sizes, "_id")
    w = W.partitionBy("_id").orderBy("_df", "_h")
    prefix = (
        ranked.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("_sz") - F.ceil(F.lit(t) * F.col("_sz")) + 1)
    )
    pa, pb = prefix.alias("pa"), prefix.alias("pb")
    pruned_cand = (
        pa.join(
            pb,
            (F.col("pa._h") == F.col("pb._h")) & (F.col("pa._id") < F.col("pb._id")),
        )
        .select(F.col("pa._id"), F.col("pb._id"))
        .distinct()
        .count()
    )
    assert pruned_cand < full_cand
    # at t=0.8 the prefix is ~20% of each doc; expect a big cut
    assert pruned_cand <= full_cand * 0.5
