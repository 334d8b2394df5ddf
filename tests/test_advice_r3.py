"""Regression tests for the round-3 advisor findings (ADVICE.md):

1. ``append_idempotent`` must fold the CURRENT log-head schema into its
   commit record inside the retry loop (a concurrent column add landing
   between the schema snapshot and the winning commit must survive).
2. ``train_ivf_centroids`` must clamp the centroid count to the sample
   and refuse an empty corpus.
3. ``IVFIndex.search(at_version=...)`` must refuse versions that predate
   the last rebuild (the centroid sidecar no longer describes them).
4. ``lsh_candidate_pairs``' hot-bucket guardrail must be observable
   (warning) and tunable through ``minhash_lsh_dedup``.
5. ``CatalogStore`` schema enforcement must compare types modulo nested
   nullability flags.
"""

from __future__ import annotations

import logging

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_data_engineering_spark.operators.ann_index import IVFIndex
from spark_data_engineering_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_lsh_dedup,
    minhash_signatures,
)
from spark_data_engineering_spark.operators.similarity import train_ivf_centroids
from spark_data_engineering_spark.sources.txn import TxnTable


# ---- 1. append_idempotent schema race ----------------------------------


def test_append_idempotent_keeps_concurrent_column_add(spark, tmp_path):
    table = TxnTable(str(tmp_path), "t")
    table.append(spark.range(3).select(F.col("id").alias("a")))

    incoming = spark.range(3).select(
        F.col("id").alias("a"), F.lit("x").alias("b")
    )

    # Interleave a concurrent writer's column add between append_idempotent's
    # schema snapshot (taken before staging) and its commit: _stage runs
    # exactly in that window, so hooking it is a deterministic race.
    real_stage = table._stage
    racer_done = {"flag": False}

    def staged_with_racer(df):
        out = real_stage(df)
        if not racer_done["flag"]:
            racer_done["flag"] = True
            racer = TxnTable(str(tmp_path), "t")
            racer.append(
                spark.range(2).select(F.col("id").alias("a"), F.lit(1.5).alias("c"))
            )
        return out

    table._stage = staged_with_racer
    try:
        v = table.append_idempotent(incoming, app_id="app", epoch_id=0)
    finally:
        table._stage = real_stage
    assert v is not None

    names = [f["name"] for f in table.table_schema()]
    assert "c" in names, "concurrent writer's column dropped from the log head"
    assert "b" in names
    df = table.read(spark)
    assert set(df.columns) >= {"a", "b", "c"}
    # the racer's data is readable (not hidden by a stale logical schema)
    assert df.filter(F.col("c").isNotNull()).count() == 2


# ---- 2. IVF training guards --------------------------------------------


def test_train_ivf_centroids_clamps_to_sample(spark):
    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)], "vec_id bigint, embedding array<float>"
    )
    cents = train_ivf_centroids(corpus, n_centroids=64)
    assert len(cents) <= 10
    # no duplicate centroids from duplicate linspace indices
    import numpy as np

    assert len(np.unique(cents.round(9), axis=0)) == len(cents)


def test_train_ivf_centroids_empty_corpus_raises(spark):
    empty = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        train_ivf_centroids(empty, n_centroids=4)


# ---- 3. IVFIndex time travel across a rebuild --------------------------


def test_ivf_index_refuses_pre_rebuild_version(spark, tmp_path):
    corpus = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 5), 1.0]) for i in range(64)],
        "vec_id bigint, embedding array<float>",
    )
    idx = IVFIndex.build(spark, corpus, str(tmp_path), n_centroids=4)
    v_before = idx.table.version()
    queries = corpus.limit(2)
    # pre-rebuild: any version >= the build commit is searchable
    assert idx.search(spark, queries, k=3, at_version=v_before).count() > 0

    # pin the pre-rebuild probe-all answer BEFORE the rebuild replaces
    # the centroid sidecar (idx re-reads the sidecar at call time, so a
    # post-rebuild call through this handle would be an approximate
    # 4-of-8 search of the NEW index, not this snapshot's answer)
    want = sorted(
        map(tuple, idx.search(spark, queries, k=3, n_probe=4).collect())
    )

    IVFIndex.build(spark, corpus, str(tmp_path), n_centroids=8)  # rebuild
    idx2 = IVFIndex(str(tmp_path))
    with pytest.raises(ValueError, match="rebuild"):
        idx2.search(spark, queries, k=3, at_version=v_before)
    # probe-ALL time travel is exact regardless of cell layout, so it is
    # allowed (unaccelerated snapshot scan) and matches the pre-rebuild
    # probe-all answer.
    got = sorted(
        map(
            tuple,
            idx2.search(
                spark, queries, k=3, n_probe=8, at_version=v_before
            ).collect(),
        )
    )
    assert got == want
    # current version still fine
    assert idx2.search(spark, queries, k=3).count() > 0


# ---- 4. hot-bucket guardrail observability + passthrough ----------------


def _dup_corpus(spark, n=40):
    # n identical docs -> every band bucket has n members
    return spark.createDataFrame(
        [(i, "the same exact boilerplate text repeated everywhere") for i in range(n)],
        "doc_id bigint, text string",
    )


def test_lsh_guardrail_warns_when_firing(spark, caplog):
    sigs = minhash_signatures(_dup_corpus(spark), num_hashes=32)
    with caplog.at_level(logging.WARNING, "spark_data_engineering_spark.operators.dedup"):
        pairs = lsh_candidate_pairs(sigs, bands=8, rows=4, max_bucket=10)
        assert pairs.count() == 0  # all buckets hot -> all pairs dropped
    assert any("guardrail dropped" in r.message for r in caplog.records)


def test_minhash_lsh_dedup_max_bucket_passthrough(spark):
    docs = _dup_corpus(spark, n=20)
    # guardrail disabled: the 20-clone cluster survives end to end
    out = minhash_lsh_dedup(docs, max_bucket=None)
    assert out.count() == 20 * 19 // 2
    # tight guardrail: the hot cluster is dropped
    assert minhash_lsh_dedup(docs, max_bucket=5).count() == 0


# ---- 5. catalog nullability-insensitive enforcement ---------------------


def test_catalog_accepts_containsnull_narrowing(spark, tmp_path):
    import datetime as dt
    import uuid

    from spark_data_engineering_spark.sources.catalog import CatalogStore

    store = CatalogStore(spark, database=f"advnull{uuid.uuid4().hex[:8]}")
    loose = spark.createDataFrame(
        [(1, [1, None])],
        T.StructType(
            [
                T.StructField("k", T.LongType()),
                T.StructField("xs", T.ArrayType(T.IntegerType(), True)),
            ]
        ),
    )
    store.write("t", loose, dt.datetime(2024, 1, 1))
    tight = spark.createDataFrame(
        [(2, [3, 4])],
        T.StructType(
            [
                T.StructField("k", T.LongType()),
                T.StructField("xs", T.ArrayType(T.IntegerType(), False)),
            ]
        ),
    )
    # containsNull=false incoming vs true declared: write-compatible
    store.write("t", tight, dt.datetime(2024, 1, 2))
    assert store.read_latest(spark, "t").count() == 1
    # a REAL type change still refuses
    bad = spark.createDataFrame([(3, ["s"])], "k bigint, xs array<string>")
    with pytest.raises(ValueError, match="schema enforcement"):
        store.write("t", bad, dt.datetime(2024, 1, 3))
    store.drop("t")
    spark.sql(f"DROP DATABASE IF EXISTS {store.database}")

    # the REVERSE direction is NOT write-compatible: a containsNull=true
    # batch must not pass for a declared containsNull=false column (it
    # could put nulls where the schema promises none). saveAsTable
    # normalizes containsNull to true in the metastore, so the
    # end-to-end path can't exercise this; pin the predicate directly.
    from spark_data_engineering_spark.sources.catalog import _write_compatible

    tight_t = T.ArrayType(T.IntegerType(), False)
    loose_t = T.ArrayType(T.IntegerType(), True)
    assert _write_compatible(tight_t, loose_t)  # stricter into laxer: ok
    assert not _write_compatible(loose_t, tight_t)  # laxer into stricter: no
    assert not _write_compatible(T.ArrayType(T.StringType(), False), tight_t)
    s_tight = T.StructType([T.StructField("a", T.LongType(), False)])
    s_loose = T.StructType([T.StructField("a", T.LongType(), True)])
    assert _write_compatible(s_tight, s_loose)
    assert not _write_compatible(s_loose, s_tight)
    m_tight = T.MapType(T.StringType(), T.LongType(), False)
    m_loose = T.MapType(T.StringType(), T.LongType(), True)
    assert _write_compatible(m_tight, m_loose)
    assert not _write_compatible(m_loose, m_tight)
