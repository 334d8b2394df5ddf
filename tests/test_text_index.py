"""Persisted inverted index: index search == full scan, incremental
ingest == rebuild, exactly-once replay."""

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
    idx = TextIndex.build(spark, docs, str(tmp_path / "ti"))
    got = _ranking(idx.search(spark, _TERMS, k=_TOP))
    want = _ranking(bm25_keyword_search(spark, sf_dir))
    assert got == want


def test_ingest_equals_rebuild(spark, sf_dir, tmp_path):
    docs = load_table(spark, "documents", sf_dir)
    part1 = docs.filter(F.col("doc_id") % 5 != 0)
    part2 = docs.filter(F.col("doc_id") % 5 == 0)
    inc = TextIndex.build(spark, part1, str(tmp_path / "inc"))
    inc.ingest(spark, part2)
    full = TextIndex.build(spark, docs, str(tmp_path / "full"))
    assert _ranking(inc.search(spark, _TERMS, k=_TOP)) == _ranking(
        full.search(spark, _TERMS, k=_TOP)
    )


def test_ingest_exactly_once(spark, sf_dir, tmp_path):
    docs = load_table(spark, "documents", sf_dir)
    part1 = docs.filter(F.col("doc_id") % 5 != 0)
    part2 = docs.filter(F.col("doc_id") % 5 == 0)
    idx = TextIndex.build(spark, part1, str(tmp_path / "eo"))
    idx.ingest(spark, part2, app_id="stream", epoch_id=1)
    before = _ranking(idx.search(spark, _TERMS, k=_TOP))
    pv, lv = idx.postings.version(), idx.lengths.version()
    idx.ingest(spark, part2, app_id="stream", epoch_id=1)  # replay
    assert idx.postings.version() == pv and idx.lengths.version() == lv
    assert _ranking(idx.search(spark, _TERMS, k=_TOP)) == before


def test_absent_term_scores_zero_contribution(spark, sf_dir, tmp_path):
    docs = load_table(spark, "documents", sf_dir)
    idx = TextIndex.build(spark, docs, str(tmp_path / "abs"))
    with_missing = idx.search(spark, (_TERMS[0], "zz_never_occurs"), k=_TOP)
    only_real = idx.search(spark, (_TERMS[0],), k=_TOP)
    # an absent term contributes exactly 0.0 -> identical ranking/scores
    assert _ranking(with_missing) == _ranking(only_real)


def test_crash_between_double_append_recovers(spark, sf_dir, tmp_path):
    """ingest() commits postings then lengths; a crash between the two
    leaves postings at epoch N with lengths behind. The replayed epoch
    must skip postings (watermark) and land lengths — converging to the
    same state as one clean ingest."""
    docs = load_table(spark, "documents", sf_dir)
    part1 = docs.filter(F.col("doc_id") % 5 != 0)
    part2 = docs.filter(F.col("doc_id") % 5 == 0)
    crashed = TextIndex.build(spark, part1, str(tmp_path / "crash"))
    # simulate the crash: only the postings append of epoch 7 landed
    postings, _lengths = TextIndex._tokenize(part2, "doc_id", "text")
    crashed.postings.append_idempotent(postings, "s:postings", 7)
    # recovery: the stream redelivers epoch 7 through the normal path
    crashed.ingest(spark, part2, app_id="s", epoch_id=7)
    clean = TextIndex.build(spark, part1, str(tmp_path / "clean"))
    clean.ingest(spark, part2, app_id="s", epoch_id=7)
    assert _ranking(crashed.search(spark, _TERMS, k=_TOP)) == _ranking(
        clean.search(spark, _TERMS, k=_TOP)
    )


def test_foreachbatch_stream_ingest(spark, sf_dir, tmp_path):
    """Feed the index from a real micro-batch stream; end state equals a
    one-shot build over everything."""
    import uuid

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    seed = docs.filter(F.col("doc_id") % 3 == 0)
    rest = docs.filter(F.col("doc_id") % 3 != 0)
    staged = str(tmp_path / "in")
    rest.repartition(2).write.parquet(staged)
    idx = TextIndex.build(spark, seed, str(tmp_path / "sidx"))

    def sink(batch_df, epoch_id):
        idx.ingest(
            batch_df.sparkSession, batch_df, app_id="stream", epoch_id=epoch_id
        )

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
    full = TextIndex.build(spark, docs, str(tmp_path / "sfull"))
    assert _ranking(idx.search(spark, _TERMS, k=_TOP)) == _ranking(
        full.search(spark, _TERMS, k=_TOP)
    )
