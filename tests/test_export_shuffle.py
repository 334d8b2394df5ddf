"""export_shuffled_shards: the deterministic global training order
(VERDICT r5 task 5) — shard stability under corpus growth, disjoint
consecutive rank intervals, and shard-concatenation == global shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from spark_data_engineering_spark.queries.curation import (
    N_SHARDS,
    _SHUF_MOD,
    shuffle_key,
)
from spark_data_engineering_spark.sources import load_table


def _assignment(docs):
    skey = shuffle_key(F.col("doc_id"))
    return docs.select(
        "doc_id",
        skey.alias("skey"),
        ((skey * N_SHARDS) / F.lit(_SHUF_MOD)).cast("bigint").alias("shard"),
    )


def test_shard_assignment_stable_under_growth(spark, sf_dir):
    """A doc's shard and order key are pure functions of doc_id: growing
    or shrinking the corpus never moves existing docs (the property an
    ntile/row_number sharding cannot have)."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    full = {r.doc_id: (r.skey, r.shard) for r in _assignment(docs).collect()}
    half = {
        r.doc_id: (r.skey, r.shard)
        for r in _assignment(docs.filter(F.col("doc_id") % 2 == 0)).collect()
    }
    assert half and all(full[d] == v for d, v in half.items())
    # every shard id is in range
    assert all(0 <= v[1] < N_SHARDS for v in full.values())


def test_manifest_rank_intervals_partition_the_corpus(spark, sf_dir):
    rows = sorted(
        entrymod.queries()["export_shuffled_shards"](spark, sf_dir).collect(),
        key=lambda r: r.shard,
    )
    total = sum(r.n_docs for r in rows)
    expect_lo = 0
    prev_max_key = -1
    for r in rows:
        assert r.rank_lo == expect_lo
        assert r.rank_hi == r.rank_lo + r.n_docs - 1
        expect_lo = r.rank_hi + 1
        # key ranges are ordered and non-overlapping across shards
        assert r.min_key > prev_max_key
        prev_max_key = r.max_key
    assert expect_lo == total == load_table(spark, "documents", sf_dir).count()


def test_shard_concatenation_replays_global_shuffle(spark, sf_dir):
    """Reading shard 0..N-1, each in its internal (skey, doc_id) order,
    must reproduce the single global shuffled order exactly."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    a = _assignment(docs).collect()
    global_order = [r.doc_id for r in sorted(a, key=lambda r: (r.skey, r.doc_id))]
    by_shard = [r for r in sorted(a, key=lambda r: (r.shard, r.skey, r.doc_id))]
    assert [r.doc_id for r in by_shard] == global_order
