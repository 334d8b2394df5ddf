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


# ---- KMV distinct sketch ----------------------------------------------


def test_kmv_below_k_is_exact_distinct_set(spark):
    from spark_data_engineering_spark.operators.sketches import (
        kmv_group_sketch,
        kmv_hash_col,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", i % 7) for i in range(100)] + [("b", i % 3) for i in range(50)],
        "g string, v int",
    ).repartition(8)
    sk = kmv_group_sketch(df, "g", "v", k=64)
    got = {}
    for r in sk.collect():
        got.setdefault(r.grp, set()).add(r.hv)
    want = {
        r.grp: r.hs
        for r in df.select(
            F.col("g").alias("grp"), kmv_hash_col(F.col("v")).alias("hv")
        )
        .groupBy("grp")
        .agg(F.collect_set("hv").alias("hs"))
        .collect()
    }
    assert got == {g: set(h) for g, h in want.items()}
    assert len(got["a"]) == 7 and len(got["b"]) == 3


def test_kmv_saturated_keeps_k_smallest_and_estimates(spark):
    from spark_data_engineering_spark.operators.sketches import (
        KMV_HASH_SPAN,
        kmv_group_sketch,
        kmv_hash_col,
    )
    from pyspark.sql import functions as F

    n, k = 5000, 64
    df = spark.createDataFrame([("a", i) for i in range(n)], "g string, v int").repartition(16)
    sk = kmv_group_sketch(df, "g", "v", k=k).collect()
    got = sorted(r.hv for r in sk)
    all_h = sorted(
        r.hv
        for r in df.select(kmv_hash_col(F.col("v")).alias("hv")).distinct().collect()
    )
    assert got == all_h[:k]  # exactly the k global minima
    est = (k - 1) * KMV_HASH_SPAN / got[-1]
    assert abs(est - n) / n < 0.35  # standard ~1/sqrt(k) relative error


def test_kmv_merge_equals_single_pass(spark):
    """Union+truncate of per-half sketches == sketch of the whole —
    the lossless-merge property the streaming accumulator relies on."""
    from spark_data_engineering_spark.operators.sketches import kmv_group_sketch

    df = spark.createDataFrame([("a", i) for i in range(2000)], "g string, v int")
    k = 32
    whole = sorted(r.hv for r in kmv_group_sketch(df, "g", "v", k=k).collect())
    h1 = {r.hv for r in kmv_group_sketch(df.filter("v < 1000"), "g", "v", k=k).collect()}
    h2 = {r.hv for r in kmv_group_sketch(df.filter("v >= 1000"), "g", "v", k=k).collect()}
    assert sorted(h1 | h2)[:k] == whole


def test_streaming_kmv_exactly_once_and_k_guard(spark, tmp_path):
    from spark_data_engineering_spark.streaming.kmv import StreamingKMV

    df1 = spark.createDataFrame([("x", i) for i in range(10)], "event_type string, user_id int")
    df2 = spark.createDataFrame([("x", i) for i in range(5, 15)], "event_type string, user_id int")
    acc = StreamingKMV(str(tmp_path), "event_type", "user_id", k=64)
    acc.process_batch(df1, 0)
    acc.process_batch(df2, 1)
    state1 = acc.sketches()
    assert len(state1["x"]) == 15  # union of distincts, below k => exact set
    # replayed batch folds AGAIN but the idempotent union leaves state
    # bit-identical — no epoch watermark (a stale one could silently skip
    # real batches after a rerun resets epoch ids; ADVICE r6)
    acc.process_batch(df1, 0)
    assert acc.sketches() == state1
    # a fresh accumulator instance over the same state dir re-folding an
    # already-seen batch with a RESET epoch id must also be a no-op
    StreamingKMV(str(tmp_path), "event_type", "user_id", k=64).process_batch(df2, 0)
    assert acc.sketches() == state1
    # reopening with a different k is refused
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k=64"):
        StreamingKMV(str(tmp_path), "event_type", "user_id", k=128).process_batch(df1, 2)


def test_kmv_report_fallback_labels_saturated_groups(spark, sf_dir):
    """Force saturation with a tiny k: n_distinct_users must STILL be
    exact (recount fallback) and the row labeled sketch_exact=false."""
    import spark_data_engineering_spark.queries.events_analytics as EA
    from pyspark.sql import functions as F
    from spark_data_engineering_spark.operators.sketches import kmv_group_sketch
    from spark_data_engineering_spark.sources import load_table

    ev = load_table(spark, "events", sf_dir)
    want = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    old_k = EA._KMV_K
    EA._KMV_K = 8
    try:
        sk = kmv_group_sketch(ev, "event_type", "user_id", 8)
        rows = EA._kmv_report(spark, sf_dir, sk).collect()
    finally:
        EA._KMV_K = old_k
    assert rows and all(not r.sketch_exact for r in rows)
    for r in rows:
        assert r.n_distinct_users == want[r.event_type]
        assert r.sketch_size == 8


def test_kmv_overlap_exact_below_k(spark, sf_dir):
    """Below k the sketch overlap equals the exact distinct-user
    intersection per type pair."""
    from itertools import combinations

    import pytest

    import __spark_entry__ as entrymod
    from spark_data_engineering_spark.sources import load_table

    got = {
        (r.type_a, r.type_b): r
        for r in entrymod.queries()["kmv_audience_overlap"](spark, sf_dir).collect()
    }
    ev = load_table(spark, "events", sf_dir).select("event_type", "user_id").collect()
    users: dict[str, set] = {}
    for r in ev:
        if r.user_id is not None:
            users.setdefault(r.event_type, set()).add(r.user_id)
    for ta, tb in combinations(sorted(users), 2):
        g = got[(ta, tb)]
        assert g.exact
        inter = len(users[ta] & users[tb])
        union = len(users[ta] | users[tb])
        assert g.n_common == inter
        assert (g.n_a, g.n_b) == (len(users[ta]), len(users[tb]))
        assert g.jaccard == pytest.approx(inter / union, abs=2e-4)
