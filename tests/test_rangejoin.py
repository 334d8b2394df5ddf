"""Bucket-replicated interval join: equivalence with the naive
nested-loop predicate, exactly-once pairs, chunk-size invariance."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from spark_data_engineering_spark.operators.rangejoin import interval_overlap_join


def _intervals(spark, rows, prefix):
    base = dt.datetime(2024, 1, 1)
    data = [
        (i, base + dt.timedelta(minutes=s), base + dt.timedelta(minutes=e))
        for i, (s, e) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, [f"{prefix}_id", f"{prefix}_start", f"{prefix}_end"]
    )


def _naive(left, right):
    return left.join(
        right,
        (F.col("a_start") <= F.col("b_end")) & (F.col("b_start") <= F.col("a_end")),
    )


def test_matches_naive_join(spark):
    # mixed lengths: some intervals span many chunks, some are sub-chunk
    a = _intervals(spark, [(0, 30), (45, 400), (500, 505), (1000, 3000)], "a")
    b = _intervals(spark, [(10, 20), (60, 70), (390, 600), (2500, 2600), (4000, 4100)], "b")
    for chunk in (60, 3600, 86400):
        got = {
            (r.a_id, r.b_id)
            for r in interval_overlap_join(
                a, b, "a_start", "a_end", "b_start", "b_end", chunk_seconds=chunk
            ).collect()
        }
        want = {(r.a_id, r.b_id) for r in _naive(a, b).collect()}
        assert got == want, f"chunk={chunk}"


def test_each_pair_exactly_once(spark):
    # both intervals span ~7 chunks at 60 s — without first-shared-chunk
    # dedup the pair would appear 7 times
    a = _intervals(spark, [(0, 7)], "a")
    b = _intervals(spark, [(0, 7)], "b")
    out = interval_overlap_join(
        a, b, "a_start", "a_end", "b_start", "b_end", chunk_seconds=60
    )
    assert out.count() == 1


def test_touching_endpoints_match(spark):
    # closed-interval semantics: end == start overlaps
    a = _intervals(spark, [(0, 10)], "a")
    b = _intervals(spark, [(10, 20)], "b")
    out = interval_overlap_join(
        a, b, "a_start", "a_end", "b_start", "b_end", chunk_seconds=3600
    )
    assert out.count() == 1


def test_disjoint_never_match(spark):
    a = _intervals(spark, [(0, 10)], "a")
    b = _intervals(spark, [(11, 20)], "b")
    out = interval_overlap_join(
        a, b, "a_start", "a_end", "b_start", "b_end", chunk_seconds=60
    )
    assert out.count() == 0


def test_zero_length_intervals(spark):
    # single-event sessions: start == end
    a = _intervals(spark, [(5, 5)], "a")
    b = _intervals(spark, [(0, 10), (5, 5), (6, 9)], "b")
    got = {
        r.b_id
        for r in interval_overlap_join(
            a, b, "a_start", "a_end", "b_start", "b_end", chunk_seconds=60
        ).collect()
    }
    assert got == {0, 1}


def test_extra_condition(spark):
    a = _intervals(spark, [(0, 100)], "a")
    b = _intervals(spark, [(0, 100), (50, 150)], "b")
    out = interval_overlap_join(
        a,
        b,
        "a_start",
        "a_end",
        "b_start",
        "b_end",
        chunk_seconds=60,
        extra_cond=F.col("b_id") > 0,
    )
    assert [r.b_id for r in out.collect()] == [1]


def test_property_random_intervals_match_naive(spark):
    """Randomized cross-check: bucket-replicated results must equal the
    naive nested-loop predicate for arbitrary interval sets and chunk
    sizes (fixed seed — reproducible)."""
    import random

    rng = random.Random(42)
    for trial in range(3):
        a_rows = [
            (s := rng.randint(0, 5000), s + rng.randint(0, 800))
            for _ in range(60)
        ]
        b_rows = [
            (s := rng.randint(0, 5000), s + rng.randint(0, 800))
            for _ in range(60)
        ]
        a = _intervals(spark, a_rows, "a")
        b = _intervals(spark, b_rows, "b")
        chunk = rng.choice([30, 300, 7200])
        got = {
            (r.a_id, r.b_id)
            for r in interval_overlap_join(
                a, b, "a_start", "a_end", "b_start", "b_end", chunk_seconds=chunk
            ).collect()
        }
        want = {(r.a_id, r.b_id) for r in _naive(a, b).collect()}
        assert got == want, f"trial={trial} chunk={chunk}"


def test_hot_chunk_guardrail(spark):
    """Opt-in cap drops only the hot chunk's pairs; pairs sharing a
    cooler first-chunk survive; default (None) stays exact."""
    # 30 right intervals piled into minute 0-1 (one hot 60s chunk),
    # plus one isolated pair far away
    hot_b = [(0, 1)] * 30
    cool_b = [(10_000, 10_050)]
    a = _intervals(spark, [(0, 1), (10_000, 10_020)], "a")
    b = _intervals(spark, hot_b + cool_b, "b")
    exact = interval_overlap_join(
        a, b, "a_start", "a_end", "b_start", "b_end", chunk_seconds=60
    ).count()
    capped = interval_overlap_join(
        a, b, "a_start", "a_end", "b_start", "b_end",
        chunk_seconds=60, max_chunk_rows=10,
    )
    rows = capped.collect()
    assert exact == 31  # 30 hot pairs + 1 cool pair
    assert {r.b_id for r in rows} == {30}  # only the cool pair survives
    assert len(rows) == 1


def test_hot_chunk_pairs_survive_via_cooler_shared_chunk(spark):
    """ADVICE r4: a pair whose FIRST shared chunk is hot but that also
    shares a surviving (cool) chunk must still be emitted exactly once
    — the emit point shifts to the first surviving shared chunk. Only
    pairs ALL of whose shared chunks are hot are lost."""
    # chunk 0 (0-59s) is hot: 30 short right intervals live only there.
    # One long pair spans chunks 0..2 on both sides: its first shared
    # chunk (0) is hot, but chunks 1 and 2 survive.
    hot_b = [(0, 1)] * 30
    long_b = [(0, 170)]
    a = _intervals(spark, [(0, 170)], "a")
    b = _intervals(spark, hot_b + long_b, "b")
    rows = interval_overlap_join(
        a, b, "a_start", "a_end", "b_start", "b_end",
        chunk_seconds=60, max_chunk_rows=10,
    ).collect()
    # the long pair survives (via chunk 1), exactly once; the 30
    # hot-only pairs are lost
    assert [(r.a_id, r.b_id) for r in rows] == [(0, 30)]


def test_all_shared_chunks_hot_pair_lost(spark):
    """The honest residual bound: when every shared chunk is hot, the
    pair is gone (and only then)."""
    hot_b = [(0, 119)] * 30  # both chunks 0 and 1 hot on the right
    a = _intervals(spark, [(30, 90)], "a")  # spans chunks 0-1 only
    b = _intervals(spark, hot_b, "b")
    rows = interval_overlap_join(
        a, b, "a_start", "a_end", "b_start", "b_end",
        chunk_seconds=60, max_chunk_rows=10,
    ).collect()
    assert rows == []
