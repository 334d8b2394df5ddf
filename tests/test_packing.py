"""Invariants for greedy no-split packing (operators/packing.py)."""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from spark_data_engineering_spark.operators.packing import greedy_pack  # noqa: E402


def _packed(spark, rows, budget):
    df = spark.createDataFrame(rows, "doc_id bigint, shard bigint, n_tokens bigint")
    return {
        (r.doc_id): (r.shard, r.pack_no, r.n_tokens)
        for r in greedy_pack(df, budget=budget).collect()
    }


def test_fill_never_exceeds_budget_except_oversized(spark):
    rows = [(i, i % 2, (i * 37) % 900 + 1) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id bigint, shard bigint, n_tokens bigint")
    out = greedy_pack(df, budget=2048)
    fills = (
        out.groupBy("shard", "pack_no")
        .agg(F.sum("n_tokens").alias("fill"), F.count("*").alias("n"))
        .collect()
    )
    for r in fills:
        assert r.fill <= 2048 or r.n == 1  # oversized docs sit alone


def test_matches_python_replay(spark):
    rows = [(i, 0, t) for i, t in enumerate([100, 2000, 50, 2047, 1, 3000, 10, 10])]
    got = _packed(spark, rows, budget=2048)
    # replay: 100 -> p0(100); 2000 -> p1 (100+2000>2048); 50 -> p1(2050>?? 2000+50=2050>2048 -> p2)...
    fill, pack, want = 0, 0, {}
    for i, (_, _, t) in enumerate(rows):
        if i > 0 and fill + t > 2048:
            pack += 1
            fill = 0
        fill += t
        want[i] = pack
    assert {k: v[1] for k, v in got.items()} == want


def test_oversized_doc_own_pack_and_next_opens_new(spark):
    rows = [(0, 0, 5000), (1, 0, 1)]
    got = _packed(spark, rows, budget=2048)
    assert got[0][1] == 0 and got[1][1] == 1


def test_order_is_deterministic_across_partitions(spark):
    rows = [(i, i % 3, 500) for i in range(30)]
    df = (
        spark.createDataFrame(rows, "doc_id bigint, shard bigint, n_tokens bigint")
        .repartition(7)  # scramble physical order; assignment must not care
    )
    out = {
        (r.doc_id, r.pack_no) for r in greedy_pack(df, budget=2048).collect()
    }
    # 4 x 500 fit per pack; shard s holds doc_ids s, s+3, ... in order
    for i in range(30):
        pos = i // 3  # position within its shard
        assert (i, pos // 4) in out
