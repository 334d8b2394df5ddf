"""edit_distance_join: q-gram count-filter losslessness (multiset
semantics), the short-string fallback path, and candidate pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_data_engineering_spark.operators.fuzzyjoin import edit_distance_join


def _brute(spark, rows, k):
    df = spark.createDataFrame(rows, "id bigint, s string")
    a, b = df.alias("a"), df.alias("b")
    return sorted(
        map(
            tuple,
            a.join(b, F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.levenshtein("a.s", "b.s").cast("bigint").alias("edit_dist"),
            )
            .filter(F.col("edit_dist") <= k)
            .collect(),
        )
    )


def test_matches_bruteforce_with_repeated_grams(spark):
    """Repeated q-grams are the trap: 'aaaaaaaa' vs 'aaaaaaab' share the
    gram 'aa' many times — the count filter must use multiset (min of
    occurrence counts) semantics or these pairs get wrongly pruned."""
    rows = [
        (1, "aaaaaaaa"),
        (2, "aaaaaaab"),
        (3, "aaaaabab"),
        (4, "banana-band"),
        (5, "banana-bend"),
        (6, "completely-other"),
        (7, "banana-bandz"),
    ]
    df = spark.createDataFrame(rows, "id bigint, s string")
    got = sorted(map(tuple, edit_distance_join(df, "s", "id", max_dist=2).collect()))
    assert got == _brute(spark, rows, 2)
    assert (1, 2, 1) in got and (4, 5, 1) in got


def test_short_string_fallback_is_exact(spark):
    """min length < q + k*q: the gram bound can't prune soundly (ed<=k
    pairs may share zero grams), so the band fallback must engage."""
    rows = [(1, "ab"), (2, "cd"), (3, "abx"), (4, "a")]
    df = spark.createDataFrame(rows, "id bigint, s string")
    got = sorted(map(tuple, edit_distance_join(df, "s", "id", max_dist=2).collect()))
    assert got == _brute(spark, rows, 2)
    # ('ab','cd') is ed=2 with ZERO shared bigrams — only the fallback finds it
    assert (1, 2, 2) in got


def test_count_filter_prunes_candidates(spark, sf_dir):
    """On the part table the gram path engages (min len 7 >= 6) and the
    count filter admits fewer candidates than the length band alone."""
    from spark_data_engineering_spark.sources import load_table

    part = load_table(spark, "part", sf_dir).select("p_partkey", "p_name")
    n = part.count()
    base = part.select(F.col("p_partkey").alias("id"), F.length("p_name").alias("l"))
    a, b = base.alias("a"), base.alias("b")
    band_pairs = a.join(
        b,
        (F.abs(F.col("a.l") - F.col("b.l")) <= 2) & (F.col("a.id") < F.col("b.id")),
    ).count()
    result = edit_distance_join(part, "p_name", "p_partkey", max_dist=2).count()
    # sanity: the result is far below the band cross-join volume, so the
    # verify stage cannot have run on the band product
    assert result < band_pairs * 0.5
    assert 0 < result < n * (n - 1) / 2
