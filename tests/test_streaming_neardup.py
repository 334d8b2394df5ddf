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
