"""Streaming near-dup ingest: survivors contain no near-dup pair, every
drop has a surviving near-match, replay commits nothing."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from spark_data_engineering_spark.operators import dedup as D
from spark_data_engineering_spark.sources import load_table
from spark_data_engineering_spark.streaming.neardup import NearDupIngest


@pytest.fixture(scope="module")
def ingested(spark, sf_dir, tmp_path_factory):
    """Stream the documents table (which carries planted near/exact
    duplicate clusters) through the ingest in multiple micro-batches."""
    root = tmp_path_factory.mktemp("neardup")
    staged = str(root / "in")
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    docs.repartition(6).write.mode("overwrite").parquet(staged)
    ing = NearDupIngest(str(root / "tables"))
    stream = (
        spark.readStream.schema(spark.read.parquet(staged).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(staged)
    )
    ing.run(stream, str(root / "ckpt"))
    return ing, docs


def test_no_near_dups_survive(spark, ingested):
    ing, _ = ingested
    kept = ing.docs.read(spark)
    pairs = D.minhash_lsh_dedup(kept, threshold=ing.threshold)
    assert pairs.count() == 0, "near-dup pair survived streaming ingest"


def test_drops_have_a_surviving_near_match(spark, ingested):
    ing, docs = ingested
    kept = ing.docs.read(spark)
    n_docs, n_kept = docs.count(), kept.count()
    assert n_kept < n_docs, "corpus has planted dups; some must drop"
    # every dropped doc near-matches something that survived (checked on
    # the union, restricted to pairs crossing kept/dropped)
    dropped = docs.join(kept.select("doc_id"), "doc_id", "left_anti")
    pairs = D.minhash_lsh_dedup(docs, threshold=ing.threshold)
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    matched_of_dropped = set()
    for r in pairs.collect():
        if r.id_a in kept_ids and r.id_b not in kept_ids:
            matched_of_dropped.add(r.id_b)
        if r.id_b in kept_ids and r.id_a not in kept_ids:
            matched_of_dropped.add(r.id_a)
    dropped_ids = {r.doc_id for r in dropped.select("doc_id").collect()}
    # clique-shaped planted clusters: every drop is adjacent to a keeper
    assert dropped_ids <= matched_of_dropped | set(), (
        f"drops with no surviving match: {sorted(dropped_ids - matched_of_dropped)[:5]}"
    )


def test_bands_index_matches_docs(spark, ingested):
    ing, _ = ingested
    kept_ids = {r.doc_id for r in ing.docs.read(spark).select("doc_id").collect()}
    band_ids = {r._id for r in ing.bands_table.read(spark).select("_id").distinct().collect()}
    assert band_ids == kept_ids


def test_replay_commits_nothing(spark, ingested, tmp_path):
    ing, docs = ingested
    v_docs, v_bands = ing.docs.version(), ing.bands_table.version()
    # fresh checkpoint -> epochs restart at 0 -> every batch is a replay
    staged = str(tmp_path / "in2")
    docs.repartition(6).write.mode("overwrite").parquet(staged)
    stream = (
        spark.readStream.schema(spark.read.parquet(staged).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(staged)
    )
    ing.run(stream, str(tmp_path / "ckpt2"))
    assert ing.docs.version() == v_docs
    assert ing.bands_table.version() == v_bands


def test_crash_between_docs_and_bands_commit_recovers(spark, sf_dir, tmp_path):
    """The double-append is exactly-once PER TABLE: simulate a crash
    after the docs commit but before the bands commit, then replay the
    epoch. The replay must re-derive identical decisions, skip the docs
    append (already committed), land the bands append, and leave the
    index consistent — the claim in streaming/neardup.py's docstring."""
    docs = (
        load_table(spark, "documents", sf_dir)
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 120)
    )
    b1 = docs.filter(F.col("doc_id") < 60)
    b2 = docs.filter(F.col("doc_id") >= 60)
    ing = NearDupIngest(str(tmp_path / "tables"))
    ing.process_batch(b1, 1)

    # crash: bands append raises AFTER the docs append succeeded
    real_append = ing.bands_table.append_idempotent

    def boom(*a, **k):
        raise RuntimeError("simulated crash before bands commit")

    ing.bands_table.append_idempotent = boom
    with pytest.raises(RuntimeError, match="simulated crash"):
        ing.process_batch(b2, 2)
    ing.bands_table.append_idempotent = real_append
    assert ing.docs.last_epoch("neardup:docs") == 2  # half-committed
    assert ing.bands_table.last_epoch("neardup:bands") == 1
    v_docs = ing.docs.version()

    # replay of epoch 2: docs skipped, bands landed, index consistent
    ing.process_batch(b2, 2)
    assert ing.docs.version() == v_docs  # no double doc append
    assert ing.bands_table.last_epoch("neardup:bands") == 2
    doc_ids = {r.doc_id for r in ing.docs.read(spark).select("doc_id").collect()}
    band_ids = {
        r._id for r in ing.bands_table.read(spark).select("_id").distinct().collect()
    }
    assert band_ids == doc_ids  # every surviving doc banded exactly once
    # idempotent: a second replay of the same epoch commits nothing
    v_docs2, v_bands2 = ing.docs.version(), ing.bands_table.version()
    ing.process_batch(b2, 2)
    assert (ing.docs.version(), ing.bands_table.version()) == (v_docs2, v_bands2)


def test_chain_cluster_drop_semantics(spark, tmp_path):
    """Pin the documented drop rule on a CHAIN-shaped cluster (A~B, B~C,
    A!~C at the 0.8 threshold): B drops (A matches it) and C ALSO drops
    (B — itself dropped — near-matched it). Deliberately more aggressive
    than greedy keep-first on chains; never a false keep. Matches the
    oracle's SQL replay of the same rule."""
    words = [f"w{i}" for i in range(100)]
    b_text = " ".join(words)
    a_text = " ".join([f"x{i}" for i in range(6)] + words[6:])
    c_text = " ".join(words[:-6] + [f"y{i}" for i in range(6)])
    docs = spark.createDataFrame(
        [(1, a_text), (2, b_text), (3, c_text)], "doc_id bigint, text string"
    )
    # sanity on the construction: exact Jaccard A~B, B~C >= 0.8 > A~C
    from spark_data_engineering_spark.operators.dedup import jaccard_pairs

    j = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs(docs, threshold=0.0).collect()
    }
    assert j[(1, 2)] >= 0.8 and j[(2, 3)] >= 0.8 and j[(1, 3)] < 0.8

    ing = NearDupIngest(str(tmp_path / "tables"))
    ing.process_batch(docs, 1)
    survivors = {r.doc_id for r in ing.docs.read(spark).collect()}
    assert survivors == {1}
