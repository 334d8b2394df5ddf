"""Round-7 additions: WebDataset tar shards (byte-level member
round-trip), RRF fusion (hand-checked fusion arithmetic + distributed
top-k plan shape), and the corrupt-record quarantine (every input line
accounted for)."""

from __future__ import annotations

import io
import tarfile

from pyspark.sql import functions as F


def test_webdataset_tar_bytes_deterministic_and_readable():
    from spark_data_engineering_spark.queries.curation import _tar_shard_bytes

    ids = [7, 3, 11]
    texts = ["hello world", "café \U0001f600", 'quotes "q" and\nnewline']
    b1 = _tar_shard_bytes(ids, texts)
    b2 = _tar_shard_bytes(list(reversed(ids)), list(reversed(texts)))
    assert b1 == b2  # member order sorted by doc_id => byte-deterministic
    with tarfile.open(fileobj=io.BytesIO(b1)) as tar:
        names = tar.getnames()
        # per sample: .txt + .json, sorted by doc_id, stems zero-padded
        assert names == [
            "000000000003.txt", "000000000003.json",
            "000000000007.txt", "000000000007.json",
            "000000000011.txt", "000000000011.json",
        ]
        got = {
            int(m.name[:12]): tar.extractfile(m).read().decode("utf-8")
            for m in tar.getmembers()
            if m.name.endswith(".txt")
        }
    assert got == dict(zip(ids, texts))  # byte-exact payload round-trip


def test_webdataset_manifest_matches_source(spark, sf_dir):
    from spark_data_engineering_spark.functions import text as TX
    from spark_data_engineering_spark.queries.curation import (
        N_SHARDS,
        export_webdataset_shards,
    )
    from spark_data_engineering_spark.sources import load_table

    got = {r.shard: (r.n_docs, r.n_tokens) for r in export_webdataset_shards(spark, sf_dir).collect()}
    want = {
        r.shard: (r.n_docs, r.n_tokens)
        for r in load_table(spark, "documents", sf_dir)
        .groupBy((F.col("doc_id") % N_SHARDS).cast("bigint").alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(TX.token_count(F.col("text"))).cast("bigint").alias("n_tokens"),
        )
        .collect()
    }
    assert got == want and len(got) == N_SHARDS


def test_rrf_fusion_arithmetic(spark, sf_dir):
    """A doc ranked r_s sparsely and r_d densely must score exactly
    1/(60+r_s) + 1/(60+r_d); docs found by one system only get the
    single term. Re-derive from the two stage rankings."""
    from spark_data_engineering_spark.functions.vectors import cosine
    from spark_data_engineering_spark.queries.retrieval import (
        _RRF_K0,
        _STAGE1_K,
        _TERMS,
        _built_index,
        rrf_fusion_search,
    )
    from spark_data_engineering_spark.sources import load_table

    sparse = {
        r.doc_id: r.rank
        for r in _built_index(spark, sf_dir).search(spark, _TERMS, k=_STAGE1_K).collect()
    }
    emb = load_table(spark, "embeddings", sf_dir)
    qvec = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("_qvec"))
    dense_rows = (
        emb.crossJoin(F.broadcast(qvec))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(F.col("_qvec"), F.col("embedding")), 4).alias("c"),
        )
        .orderBy(F.col("c").desc(), F.col("doc_id").asc())
        .limit(_STAGE1_K)
        .collect()
    )
    dense = {r.doc_id: i + 1 for i, r in enumerate(dense_rows)}
    expected = {}
    for d in set(sparse) | set(dense):
        score = 0.0
        if d in sparse:
            score += 1.0 / (_RRF_K0 + sparse[d])
        if d in dense:
            score += 1.0 / (_RRF_K0 + dense[d])
        expected[d] = score
    top = sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r.doc_id, r.rrf_score) for r in rrf_fusion_search(spark, sf_dir).orderBy("fused_rank").collect()]
    for (gd, gs), (ed, es) in zip(got, top):
        assert gd == ed
        assert abs(gs - es) < 1e-6


def test_rrf_plan_uses_distributed_topk(spark, sf_dir):
    """The dense top-k must compile to TakeOrderedAndProject (per-
    partition heaps), never a global-window shuffle of the full
    embeddings table."""
    from spark_data_engineering_spark.queries.retrieval import rrf_fusion_search

    plan = (
        rrf_fusion_search(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrdered" in plan


def test_quarantine_accounts_for_every_line(spark, sf_dir):
    from spark_data_engineering_spark.queries.formats import (
        corrupt_record_quarantine,
    )
    from spark_data_engineering_spark.sources import load_table

    row = corrupt_record_quarantine(spark, sf_dir).first()
    n_total = load_table(spark, "documents", sf_dir).count()
    assert row.n_good + row.n_bad == n_total  # no line silently dropped
    assert row.n_quarantined == row.n_bad  # dead-letter sink is complete
    assert row.n_bad > 0  # the injection actually corrupted lines


def test_quarantine_works_under_materialize_none(spark, sf_dir):
    """The dead-letter select carries doc_id beside the corrupt column,
    so the query is correct even with materialization disabled (the
    SPARK-38747 corrupt-column-only restriction never triggers) —
    round-7 review finding."""
    from spark_data_engineering_spark import materialize as M
    from spark_data_engineering_spark.queries.formats import (
        corrupt_record_quarantine,
    )

    base = M.get_mode()
    try:
        M.set_mode("none")
        row = corrupt_record_quarantine(spark, sf_dir).first()
        assert row.n_good + row.n_bad > 0 and row.n_quarantined == row.n_bad
    finally:
        M.set_mode(base)


def test_streaming_txn_source_matches_batch_connector(spark, sf_dir):
    """The format('txn') STREAM read must surface exactly the rows the
    batch connector reads from the same commit log: the registered
    streaming fold's (status, n, revenue) state equals aggregating the
    batch `spark.read.format('txn')` frame directly."""
    from spark_data_engineering_spark.queries.incremental_q import orders_ds_table
    from spark_data_engineering_spark.queries.streaming_q import (
        streaming_txn_source_revenue,
    )

    got = {
        r.o_orderstatus: (r.n_orders, round(r.revenue, 2))
        for r in streaming_txn_source_revenue(spark, sf_dir).collect()
    }
    table = orders_ds_table(spark, sf_dir)
    want = {
        r.o_orderstatus: (r.n_orders, round(r.revenue, 2))
        for r in spark.read.format("txn")
        .load(table.table_dir)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .collect()
    }
    assert got == want and len(got) == 3
