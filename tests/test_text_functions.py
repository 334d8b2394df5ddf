"""Unit tests for text-analysis functions."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_data_engineering_spark.functions import text as TX


def _df(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "der hund ist nicht der beste"),
        (3, "le chat est une merveille"),
        (4, "xyzzy plugh"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_token_count(spark):
    out = _df(spark).select("doc_id", TX.token_count(F.col("text")).alias("n")).collect()
    by_id = {r.doc_id: r.n for r in out}
    assert by_id == {1: 6, 2: 6, 3: 5, 4: 2}


def test_stopword_count(spark):
    out = _df(spark).select("doc_id", TX.stopword_count(F.col("text")).alias("n")).collect()
    by_id = {r.doc_id: r.n for r in out}
    assert by_id[1] == 2  # 'the' twice
    assert by_id[4] == 0


def test_lang_guess(spark):
    out = _df(spark).select("doc_id", TX.lang_guess(F.col("text")).alias("g")).collect()
    by_id = {r.doc_id: r.g for r in out}
    assert by_id[1] == "en"
    assert by_id[2] == "de"
    assert by_id[3] == "fr"
    assert by_id[4] == "und"


def test_fingerprint_is_md5(spark):
    import hashlib

    out = _df(spark).select("doc_id", TX.fingerprint(F.col("text")).alias("fp")).collect()
    by_id = {r.doc_id: r.fp for r in out}
    assert by_id[1] == hashlib.md5(b"the cat sat on the mat").hexdigest()


def test_quality_score_bounds(spark):
    out = _df(spark).select(TX.quality_score(F.col("text")).alias("q")).collect()
    assert all(0.0 <= r.q <= 1.0 for r in out)


def test_token_run_lengths_constructed(spark, tmp_path):
    from spark_data_engineering_spark.queries.text2 import token_run_lengths

    df = spark.createDataFrame(
        [
            (1, "a a a b c c", "en", "s", 0),       # runs: a x3 @1, c x2 @5
            (2, "x y z", "en", "s", 0),              # no runs
            (3, "q q q q", "en", "s", 0),            # one run x4 @1
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    td = str(tmp_path / "runs")
    df.write.parquet(f"{td}/documents.parquet")
    got = {
        (r.doc_id, r.start_idx, r.run_len, r.token)
        for r in token_run_lengths(spark, td).collect()
    }
    assert got == {(1, 1, 3, "a"), (1, 5, 2, "c"), (3, 1, 4, "q")}
