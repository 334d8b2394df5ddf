"""Misra-Gries: presence guarantee, bounded size, merge correctness."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from spark_data_engineering_spark.operators.sketches import misra_gries_summary


def _df(spark, items, parts=8):
    return spark.createDataFrame([(x,) for x in items], ["v"]).repartition(parts)


def test_small_domain_is_exact(spark):
    items = ["a"] * 50 + ["b"] * 30 + ["c"] * 20
    mg = misra_gries_summary(_df(spark, items), "v", k=10)
    # domain fits in k: nothing is ever decremented, counts are exact
    assert mg.counters == {"a": 50, "b": 30, "c": 20}
    assert mg.n == 100  # row count rides along with the sketch pass


def test_presence_guarantee_skewed(spark):
    """Every item with tf > n/(k+1) must be present, whatever the
    partition layout; kept counts never overcount."""
    items = (
        ["hot"] * 5000
        + ["warm"] * 800
        + [f"cold{i}" for i in range(4000)]  # 4000 singletons
    )
    truth = Counter(items)
    n, k = len(items), 20
    mg = misra_gries_summary(_df(spark, items, parts=16), "v", k=k)
    s = mg.counters
    assert len(s) <= k
    assert mg.n == n
    for item, tf in truth.items():
        if tf > n / (k + 1):
            assert item in s, f"{item} (tf={tf}) missing"
    for item, c in s.items():
        assert c <= truth[item]  # lower bounds only
        assert truth[item] - c <= n / (k + 1) + 1  # undercount bound


def test_partition_count_does_not_break_guarantee(spark):
    items = ["x"] * 300 + ["y"] * 200 + [f"z{i % 150}" for i in range(900)]
    n, k = len(items), 12
    for parts in (1, 3, 32):
        s = misra_gries_summary(_df(spark, items, parts=parts), "v", k=k).counters
        for item in ("x", "y"):
            if Counter(items)[item] > n / (k + 1):
                assert item in s


def test_candidate_recount_matches_exact_topk(spark, sf_dir):
    """The production pattern: sketch candidates -> exact recount must
    reproduce the exact top-10 tokens."""
    from spark_data_engineering_spark.sources import load_table

    d = load_table(spark, "documents", sf_dir)
    tokens = d.select(F.explode(F.split("text", " ")).alias("token"))
    exact = [
        (r.token, r.tf)
        for r in tokens.groupBy("token")
        .agg(F.count("*").alias("tf"))
        .orderBy(F.col("tf").desc(), F.col("token").asc())
        .limit(10)
        .collect()
    ]
    cands = list(misra_gries_summary(tokens, "token", k=100).counters)
    recount = [
        (r.token, r.tf)
        for r in tokens.filter(F.col("token").isin(cands))
        .groupBy("token")
        .agg(F.count("*").alias("tf"))
        .orderBy(F.col("tf").desc(), F.col("token").asc())
        .limit(10)
        .collect()
    ]
    assert recount == exact


def test_null_items_counted(spark):
    """NULL is an item like any other: above the threshold it must be
    present (pandas value_counts drops NaN unless told otherwise)."""
    items = ["a"] * 10 + [None] * 40 + [f"u{i}" for i in range(30)]
    rows = [(x,) for x in items]
    df = spark.createDataFrame(rows, ["v"]).repartition(4)
    mg = misra_gries_summary(df, "v", k=5)
    assert None in mg.counters
    assert mg.counters[None] <= 40
    assert mg.n == 80


def test_flat_distribution_falls_back_to_exact(spark, tmp_path):
    """heavy_hitter_tokens must equal the exact top-20 even when rank 20
    sits below the MG presence bound (near-uniform vocabulary)."""
    import duckdb

    from spark_data_engineering_spark.queries.text2 import heavy_hitter_tokens

    # 5000-token vocabulary, each appearing 2-3 times: rank-20 tf is far
    # under n/201, so the proof check fails and the fallback must kick in
    words = [f"w{i:04d}" for i in range(5000)]
    text_rows = []
    for d in range(100):
        chunk = words[d * 50 : (d + 1) * 50] + words[(d * 37) % 4900 : (d * 37) % 4900 + 50]
        text_rows.append((d, " ".join(chunk), "en", "s", 0))
    df = spark.createDataFrame(
        text_rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    td = str(tmp_path / "flat")
    df.write.parquet(f"{td}/documents.parquet")
    got = [
        (r.token, r.tf)
        for r in heavy_hitter_tokens(spark, td).orderBy(
            F.col("tf").desc(), F.col("token").asc()
        ).collect()
    ]
    want = duckdb.sql(
        f"""SELECT token, CAST(COUNT(*) AS BIGINT) AS tf
            FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token
                  FROM read_parquet('{td}/documents.parquet/*.parquet'))
            GROUP BY token ORDER BY tf DESC, token ASC LIMIT 20"""
    ).fetchall()
    assert got == [(t, n) for t, n in want]


def test_exact_topk_includes_null_heavy_hitter(spark):
    """A NULL heavy hitter must survive the proven path (IN semantics
    never match NULL — the membership test special-cases it)."""
    from spark_data_engineering_spark.operators.sketches import (
        exact_topk_via_sketch,
        misra_gries_summary,
    )

    items = [None] * 500 + [f"t{i % 25}" for i in range(2500)]
    df = spark.createDataFrame([(x,) for x in items], "v string").repartition(4)
    mg = misra_gries_summary(df, "v", k=50)
    base = exact_topk_via_sketch(df, "v", mg, topk=20)
    rows = {(r.v, r.tf) for r in base.collect()}
    assert (None, 500) in rows
