"""Property-based tests (hypothesis) — randomized semantics checks the
reference never had (SURVEY.md §5 'Absent: no property-based tests').

Each property batches its generated cases into ONE DataFrame so a
property costs one Spark job, not one per example.
"""

from __future__ import annotations

import datetime as dt

import duckdb
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from spark_data_engineering_spark.functions import numeric as NR
from spark_data_engineering_spark.operators.asof import asof_join


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000)),  # (key, seconds)
        min_size=1,
        max_size=30,
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000)),
        min_size=0,
        max_size=30,
    ),
)
def test_asof_window_matches_naive(spark, left_rows, right_rows):
    """The window-strategy as-of join must equal the O(n^2) definition:
    for each left row, max(right.ts) with same key and ts <= left.ts."""
    base = dt.datetime(2024, 1, 1)
    lrows = [
        (i, k, base + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(left_rows)
    ]
    rrows = [(k, base + dt.timedelta(seconds=s)) for k, s in right_rows]
    left = spark.createDataFrame(lrows, ["row_id", "k", "ts"])
    right = (
        spark.createDataFrame(rrows, ["k", "ts"])
        if rrows
        else spark.createDataFrame([], "k bigint, ts timestamp")
    )
    got = {
        r.row_id: r.ts_r
        for r in asof_join(left, right, on="ts", by="k", suffix="_r").collect()
    }
    for row_id, k, ts in lrows:
        expected = max((rts for rk, rts in rrows if rk == k and rts <= ts), default=None)
        assert got[row_id] == expected, (row_id, k, ts)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=50,
    )
)
def test_floor_rounding_matches_duckdb(spark, values):
    """The cross-engine rounding formula must be bit-identical between
    Spark and DuckDB for arbitrary doubles — this is the invariant the
    whole oracle hash-match rests on."""
    sdf = spark.createDataFrame([(v,) for v in values], ["x"])
    got = [
        (r.r2, r.r4)
        for r in sdf.select(
            NR.round2(F.col("x")).alias("r2"), NR.round4(F.col("x")).alias("r4")
        ).collect()
    ]
    con = duckdb.connect()
    want = [
        con.execute(
            "SELECT FLOOR((?::DOUBLE) * 100 + 0.5) / 100, FLOOR((?::DOUBLE) * 10000 + 0.5) / 10000",
            [v, v],
        ).fetchone()
        for v in values
    ]
    assert got == [tuple(w) for w in want]


@settings(max_examples=3, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_minhash_estimates_jaccard(spark, seed):
    """MinHash signature agreement ratio must approximate true Jaccard:
    build two token sets with known overlap, check |estimate - truth|
    within binomial tolerance for 32 hashes."""
    import random

    from spark_data_engineering_spark.operators.dedup import minhash_signatures

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(200)]
    shared = rng.sample(vocab, 60)
    only_a = rng.sample([w for w in vocab if w not in shared], 20)
    only_b = rng.sample([w for w in vocab if w not in shared and w not in only_a], 20)
    # single-token "shingles": build texts with n=1 shingling
    doc_a = " ".join(shared + only_a)
    doc_b = " ".join(shared + only_b)
    true_j = 60 / 100
    df = spark.createDataFrame([(0, doc_a), (1, doc_b)], ["doc_id", "text"])
    sigs = {r._id: r.signature for r in minhash_signatures(df, n=1, num_hashes=32).collect()}
    agree = sum(1 for x, y in zip(sigs[0], sigs[1]) if x == y) / 32
    assert abs(agree - true_j) < 0.30  # ~3.5 sigma for k=32


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(1, 4000)),  # (shard, n_tokens)
        min_size=1,
        max_size=60,
    ),
    st.integers(100, 3000),
)
def test_greedy_pack_matches_reference(spark, rows, budget):
    """greedy_pack must equal the sequential reference recurrence for
    arbitrary shard layouts, sizes (incl. oversized docs), and budgets."""
    from spark_data_engineering_spark.operators.packing import greedy_pack

    data = [(i, shard, size) for i, (shard, size) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id bigint, shard bigint, n_tokens bigint")
    got = {
        r.doc_id: r.pack_no
        for r in greedy_pack(df, budget=budget).collect()
    }
    want = {}
    state: dict[int, tuple[int, int, bool]] = {}  # shard -> (fill, pack, started)
    for i, shard, size in sorted(data):
        fill, pack, started = state.get(shard, (0, 0, False))
        if started and fill + size > budget:
            pack += 1
            fill = 0
        fill += size
        state[shard] = (fill, pack, True)
        want[i] = pack
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=12, max_size=40),
        min_size=2,
        max_size=12,
    ),
    st.sampled_from([0.5, 0.7, 0.9]),
)
def test_prefix_jaccard_lossless_on_random_docs(spark, docs, threshold):
    """jaccard_pairs_prefix == jaccard_pairs on arbitrary documents —
    the prefix filter's losslessness, beyond the fixed corpus."""
    from spark_data_engineering_spark.operators.dedup import (
        jaccard_pairs,
        jaccard_pairs_prefix,
    )

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    want = sorted(map(tuple, jaccard_pairs(df, threshold=threshold).collect()))
    got = sorted(map(tuple, jaccard_pairs_prefix(df, threshold=threshold).collect()))
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.text(alphabet="abcx", min_size=1, max_size=14), min_size=2, max_size=14),
    st.integers(1, 2),
)
def test_edit_distance_join_lossless_on_random_strings(spark, strings, k):
    """edit_distance_join == brute-force levenshtein on arbitrary
    strings — covers both the gram path and the short-string fallback
    (lengths straddle q + k*q)."""
    from spark_data_engineering_spark.operators.fuzzyjoin import edit_distance_join

    rows = [(i, s) for i, s in enumerate(strings)]
    df = spark.createDataFrame(rows, "id bigint, s string")
    got = sorted(map(tuple, edit_distance_join(df, "s", "id", max_dist=k).collect()))
    a, b = df.alias("a"), df.alias("b")
    want = sorted(
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
    assert got == want
