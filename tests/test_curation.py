"""Sequence-packing and curation semantics (queries/curation.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_data_engineering_spark.queries.curation import (
    SEQ_BUDGET,
    context_length_buckets,
    corpus_curation_counts,
    pack_sequences,
)


def test_pack_sequences_offsets_are_contiguous_per_shard(spark, sf_dir):
    out = pack_sequences(spark, sf_dir).cache()
    rows = out.orderBy("shard", "doc_id").collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) > 1
    for shard_rows in by_shard.values():
        expect = 0
        for r in shard_rows:
            # concat-and-chunk: offsets tile the shard's token stream
            # exactly, no gaps and no overlaps
            assert r.tok_offset == expect
            expect += r.n_tokens
            assert r.seq_first == r.tok_offset // SEQ_BUDGET
            assert r.seq_last == (r.tok_offset + r.n_tokens - 1) // SEQ_BUDGET
            assert r.seq_first <= r.seq_last
    out.unpersist()


def test_pack_sequences_single_shuffle(spark, sf_dir):
    plan = pack_sequences(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_context_length_buckets_cover_all_docs(spark, sf_dir):
    from spark_data_engineering_spark.sources import load_table

    out = context_length_buckets(spark, sf_dir)
    n_docs = out.agg(F.sum("n_docs")).collect()[0][0]
    assert n_docs == load_table(spark, "documents", sf_dir).count()


def test_curation_counts_docs_bounded_by_corpus(spark, sf_dir):
    from spark_data_engineering_spark.sources import load_table

    out = corpus_curation_counts(spark, sf_dir)
    total = out.agg(F.sum("n_docs")).collect()[0][0]
    corpus = load_table(spark, "documents", sf_dir).count()
    # quality filter + dedup can only shrink the corpus; split must not
    # duplicate documents
    assert 0 < total <= corpus
    splits = {r.split for r in out.collect()}
    assert splits <= {"train", "val", "test"}
