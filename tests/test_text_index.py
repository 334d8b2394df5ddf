"""Persisted inverted index: index search == full scan, incremental
ingest == rebuild, atomic single-commit ingest, exactly-once replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_data_engineering_spark.operators.text_index import TextIndex
from spark_data_engineering_spark.queries.retrieval import (
    _TERMS,
    _TOP,
    bm25_keyword_search,
)
from spark_data_engineering_spark.sources import load_table


def _ranking(df):
    return [(r.doc_id, r.bm25, r.rank) for r in df.orderBy("rank").collect()]


def test_index_search_equals_full_scan(spark, sf_dir, tmp_path):
    docs = load_table(spark, "documents", sf_dir)
    idx = TextIndex.build(docs, str(tmp_path / "ti"))
    got = _ranking(idx.search(spark, _TERMS, k=_TOP))
    want = _ranking(bm25_keyword_search(spark, sf_dir))
    assert got == want


def test_ingest_equals_rebuild(spark, sf_dir, tmp_path):
    docs = load_table(spark, "documents", sf_dir)
    part1 = docs.filter(F.col("doc_id") % 5 != 0)
    part2 = docs.filter(F.col("doc_id") % 5 == 0)
    inc = TextIndex.build(part1, str(tmp_path / "inc"))
    inc.ingest(part2)
    full = TextIndex.build(docs, str(tmp_path / "full"))
    assert _ranking(inc.search(spark, _TERMS, k=_TOP)) == _ranking(
        full.search(spark, _TERMS, k=_TOP)
    )


def test_ingest_is_one_atomic_commit(spark, sf_dir, tmp_path):
    """Postings and length rows land in a SINGLE commit — there is no
    version at which a search could see one without the other."""
    docs = load_table(spark, "documents", sf_dir)
    part1 = docs.filter(F.col("doc_id") % 5 != 0)
    part2 = docs.filter(F.col("doc_id") % 5 == 0)
    idx = TextIndex.build(part1, str(tmp_path / "atomic"))
    v0 = idx.table.version()
    idx.ingest(part2)
    assert idx.table.version() == v0 + 1
    # every version has matched kinds: each doc contributes exactly one
    # 'l' row, and its postings carry the same doc ids
    for v in (v0, v0 + 1):
        snap = idx.table.read(spark, at_version=v)
        l_docs = {r.doc_id for r in snap.filter(F.col("kind") == "l").collect()}
        p_docs = {
            r.doc_id
            for r in snap.filter(F.col("kind") == "p").select("doc_id").distinct().collect()
        }
        assert p_docs <= l_docs and l_docs


def test_ingest_exactly_once(spark, sf_dir, tmp_path):
    docs = load_table(spark, "documents", sf_dir)
    part1 = docs.filter(F.col("doc_id") % 5 != 0)
    part2 = docs.filter(F.col("doc_id") % 5 == 0)
    idx = TextIndex.build(part1, str(tmp_path / "eo"))
    idx.ingest(part2, app_id="stream", epoch_id=1)
    before = _ranking(idx.search(spark, _TERMS, k=_TOP))
    v = idx.table.version()
    idx.ingest(part2, app_id="stream", epoch_id=1)  # replay
    assert idx.table.version() == v
    assert _ranking(idx.search(spark, _TERMS, k=_TOP)) == before


def test_absent_term_scores_zero_contribution(spark, sf_dir, tmp_path):
    docs = load_table(spark, "documents", sf_dir)
    idx = TextIndex.build(docs, str(tmp_path / "abs"))
    with_missing = idx.search(spark, (_TERMS[0], "zz_never_occurs"), k=_TOP)
    only_real = idx.search(spark, (_TERMS[0],), k=_TOP)
    # an absent term contributes exactly 0.0 -> identical ranking/scores
    assert _ranking(with_missing) == _ranking(only_real)


def test_degenerate_terms_rejected(spark, sf_dir, tmp_path):
    docs = load_table(spark, "documents", sf_dir).limit(20)
    idx = TextIndex.build(docs, str(tmp_path / "deg"))
    for bad in ((), ("data", "data")):
        try:
            idx.search(spark, bad)
        except ValueError:
            pass
        else:
            raise AssertionError(f"{bad!r} must be rejected")


def test_search_prunes_postings_files(spark, sf_dir, tmp_path):
    """The term range prune must plan fewer files than the live set for
    a narrow term range (the build clusters by term)."""
    docs = load_table(spark, "documents", sf_dir)
    idx = TextIndex.build(docs, str(tmp_path / "prune"), n_files=16)
    live = len(idx.table.live_files())
    pruned = len(idx.table.prune_files({"term": ("data", "data")}))
    assert pruned < live


def test_foreachbatch_stream_ingest(spark, sf_dir, tmp_path):
    """Feed the index from a real micro-batch stream; end state equals a
    one-shot build over everything."""
    import uuid

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    seed = docs.filter(F.col("doc_id") % 3 == 0)
    rest = docs.filter(F.col("doc_id") % 3 != 0)
    staged = str(tmp_path / "in")
    rest.repartition(2).write.parquet(staged)
    idx = TextIndex.build(seed, str(tmp_path / "sidx"))

    def sink(batch_df, epoch_id):
        idx.ingest(batch_df, app_id="stream", epoch_id=epoch_id)

    q = (
        spark.readStream.schema(rest.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / f"ckpt-{uuid.uuid4().hex}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    full = TextIndex.build(docs, str(tmp_path / "sfull"))
    assert _ranking(idx.search(spark, _TERMS, k=_TOP)) == _ranking(
        full.search(spark, _TERMS, k=_TOP)
    )


def test_hybrid_rerank_composition(spark, sf_dir):
    """Stage-2 output is a subset of stage-1 candidates, ranked purely
    by the dense score; bm25 values survive the pipeline unchanged."""
    from spark_data_engineering_spark.queries.retrieval import (
        _RERANK_K,
        _STAGE1_K,
        hybrid_search_rerank,
    )

    out = hybrid_search_rerank(spark, sf_dir).collect()
    assert 0 < len(out) <= _RERANK_K
    sims = [r.cos_sim for r in sorted(out, key=lambda r: r.final_rank)]
    assert sims == sorted(sims, reverse=True)
    # every result came from the sparse candidate set with its score —
    # via the SAME shared build helper the queries use
    from spark_data_engineering_spark.queries.retrieval import _built_index

    idx = _built_index(spark, sf_dir)
    cand = {
        (r.doc_id, r.bm25) for r in idx.search(spark, _TERMS, k=_STAGE1_K).collect()
    }
    assert {(r.doc_id, r.bm25) for r in out} <= cand


def test_sparse_term_fewer_matches_than_k(spark, tmp_path):
    """The matching-docs-only contract (ADVICE r4): when fewer than k
    docs contain any query term, search returns exactly that many rows
    — and an inline full-scan BM25 restricted the same way (the twins'
    WHERE tf_sum > 0) produces the identical ranking, so the
    hash-match contract holds in the sparse regime too."""
    rows = [
        (1, "zebra runs fast"),
        (2, "the quick brown fox"),
        (3, "zebra stripes are unique"),
        (4, "lazy dogs sleep"),
        (5, "cats and dogs"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    idx = TextIndex.build(docs, str(tmp_path / "sparse"))

    got = idx.search(spark, ("zebra",), k=10).orderBy("rank").collect()
    assert len(got) == 2  # only 2 matching docs, not 10
    assert [r.doc_id for r in got] == [1, 3] or [r.doc_id for r in got] == [3, 1]
    # inline full-scan replica with the twins' matching-docs filter
    from spark_data_engineering_spark.functions.numeric import round4

    toks = F.split(F.col("text"), " ")
    t = docs.select(
        "doc_id",
        F.size(toks).cast("double").alias("dl"),
        F.size(F.filter(toks, lambda x: x == F.lit("zebra")))
        .cast("double")
        .alias("tf0"),
    )
    stats = t.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        F.sum(F.when(F.col("tf0") > 0, 1).otherwise(0)).cast("double").alias("df0"),
    )
    from spark_data_engineering_spark.operators.text_index import _B, _K1

    k1, b = _K1, _B
    j = t.crossJoin(F.broadcast(stats)).filter(F.col("tf0") > 0)
    score = (
        (F.col("n_docs") - F.col("df0") + F.lit(0.5)) / (F.col("df0") + F.lit(0.5))
    ) * (
        F.col("tf0")
        * (k1 + 1.0)
        / (F.col("tf0") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    from pyspark.sql import Window as W

    w = W.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    want = (
        j.select("doc_id", round4(score).alias("bm25"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .orderBy("rank")
        .collect()
    )
    assert [(r.doc_id, r.bm25, r.rank) for r in got] == [
        (r.doc_id, r.bm25, r.rank) for r in want
    ]
