"""Hive-style partition columns for TxnTable (VERDICT r7 task 6):
``partition_cols`` declared at creation, recorded in every commit,
value-pure flat files (staged through partitionBy on shadow copies —
the real columns STAY in the data, so no read path changes), per-file
``partitionValues`` in the commit-log stats (Delta's field), and exact
coarse partition pruning in ``prune_files`` before bloom/minmax."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "id bigint, cat string, v double")


ROWS = [
    (1, "a", 1.0),
    (2, "a", 2.0),
    (3, "b", 3.0),
    (4, "b", 4.0),
    (5, "c", 5.0),
]


def test_partitioned_append_value_pure_and_columns_kept(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t", partition_cols=("cat",))
    t.append(_df(spark, ROWS).repartition(2))
    stats = t.file_stats()
    assert stats
    for name, cols in stats.items():
        pv = cols["partitionValues"]
        assert set(pv) == {"cat"} and pv["cat"] in {"a", "b", "c"}
    # one value per file AND the column still readable from the data
    got = sorted((r.id, r.cat, r.v) for r in t.read(spark).collect())
    assert got == sorted(ROWS)
    # value-purity: each file's cat min == max == its partitionValues
    for name, cols in stats.items():
        mm = cols["cat"]
        assert mm[0] == mm[1] == cols["partitionValues"]["cat"]


def test_partition_pruning_exact_with_pinned_file_count(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t", partition_cols=("cat",))
    t.append(_df(spark, ROWS).repartition(2))
    t.append(_df(spark, [(6, "a", 6.0), (7, "c", 7.0)]).repartition(1))
    stats = t.file_stats()
    expect_a = sorted(
        n for n, c in stats.items() if c["partitionValues"]["cat"] == "a"
    )
    kept = t.prune_files(None, equals={"cat": "a"})
    assert kept == expect_a  # the pinned files-read count: exact, no slop
    assert 0 < len(kept) < len(stats)
    got = sorted(
        r.id for r in t.read(spark, prune_eq={"cat": "a"}).filter(F.col("cat") == "a").collect()
    )
    assert got == [1, 2, 6]


def test_partition_cols_persist_and_conflict_refused(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t", partition_cols=("cat",))
    t.append(_df(spark, ROWS))
    # a bare reopen resolves the recorded layout and keeps partitioning
    t2 = TxnTable(str(tmp_path), "t")
    assert t2.partition_cols() == ("cat",)
    t2.append(_df(spark, [(8, "d", 8.0)]))
    assert t2.file_stats()  # new file carries the value
    newest = max(t2.file_stats().items(), key=lambda kv: kv[0])
    # a conflicting re-declaration is refused at first resolution
    t3 = TxnTable(str(tmp_path), "t", partition_cols=("id",))
    with pytest.raises(ValueError, match="immutable"):
        t3.partition_cols()


def test_partitioned_delete_and_compact_keep_purity(spark, tmp_path):
    """The VERDICT-named interaction: partitioned append + delete — the
    copy-on-write rewrite and a later compact must re-stage value-pure
    files with fresh partitionValues, or pruning goes silently stale."""
    t = TxnTable(str(tmp_path), "t", partition_cols=("cat",))
    t.append(_df(spark, ROWS).repartition(2))
    t.delete_where(spark, F.col("id") % 2 == 0)  # rewrites files
    for name, cols in t.file_stats().items():
        assert "partitionValues" in cols, f"rewrite lost partitioning: {name}"
    t.delete_where_dv(spark, F.col("id") == 5)  # merge-on-read
    t.compact(spark, target_file_bytes=1 << 20)  # materializes the DV
    stats = t.file_stats()
    for name, cols in stats.items():
        pv = cols["partitionValues"]["cat"]
        assert cols["cat"][0] == cols["cat"][1] == pv
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 3]
    assert t.prune_files(None, equals={"cat": "c"}) == []  # 5 is gone
    got = t.read(spark, prune_eq={"cat": "b"}).filter(F.col("cat") == "b")
    assert [r.id for r in got.collect()] == [3]


def test_partitioned_merge_stays_pure(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t", partition_cols=("cat",))
    t.append(_df(spark, ROWS))
    t.merge(
        spark,
        _df(spark, [(1, "a", 11.0), (9, "z", 9.0)]),
        on=["id"],
    )
    for name, cols in t.file_stats().items():
        assert cols["cat"][0] == cols["cat"][1] == cols["partitionValues"]["cat"]
    assert t.prune_files(None, equals={"cat": "z"}) != []
    got = sorted((r.id, r.v) for r in t.read(spark, prune_eq={"cat": "a"}).filter(F.col("cat") == "a").collect())
    assert got == [(1, 11.0), (2, 2.0)]


def test_branch_inherits_partitioning(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t", partition_cols=("cat",))
    t.append(_df(spark, ROWS))
    b = t.branch("feat")
    assert b.partition_cols() == ("cat",)
    b.append(_df(spark, [(10, "q", 10.0)]))
    t.merge_branch(b)
    stats = t.file_stats()
    assert any(c["partitionValues"]["cat"] == "q" for c in stats.values())
    assert [r.id for r in t.read(spark, prune_eq={"cat": "q"}).filter(F.col("cat") == "q").collect()] == [10]


def test_int_partition_col_and_nulls(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t", partition_cols=("k",))
    t.append(
        spark.createDataFrame(
            [(1, 10), (2, 10), (3, 20), (4, None)], "id bigint, k int"
        )
    )
    stats = t.file_stats()
    vals = {c["partitionValues"]["k"] for c in stats.values()}
    assert vals == {"10", "20", None}
    # int query value matches its hive string form; NULL files skipped
    kept = t.prune_files(None, equals={"k": 10})
    assert all(stats[f]["partitionValues"]["k"] == "10" for f in kept)
    got = sorted(r.id for r in t.read(spark, prune_eq={"k": 10}).filter(F.col("k") == 10).collect())
    assert got == [1, 2]
    # NULL rows are still readable (no pruning involved)
    assert sorted(
        r.id for r in t.read(spark).filter(F.col("k").isNull()).collect()
    ) == [4]


def test_missing_partition_column_refused(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t", partition_cols=("cat",))
    with pytest.raises(ValueError, match="missing partition column"):
        t.append(spark.createDataFrame([(1,)], "id bigint"))


def test_streaming_bootstrap_records_partition_cols(spark, tmp_path):
    """Round-8 model-search finding: append_idempotent builds its commit
    record by hand (own CAS loop), and when it is the table's FIRST
    commit the record must still carry partition_cols — or every fresh
    handle (branch seed, datasource, vacuum) resolves the table as
    unpartitioned and mixes layouts in one data dir."""
    t = TxnTable(str(tmp_path), "t", partition_cols=("cat",))
    df = spark.createDataFrame([(1, "a")], "id bigint, cat string")
    t.append_idempotent(df, "app", 1)
    fresh = TxnTable(str(tmp_path), "t")
    assert fresh.partition_cols() == ("cat",)
    fresh.append(spark.createDataFrame([(2, "b")], "id bigint, cat string"))
    pv = {
        f: s.get("partitionValues") for f, s in fresh.file_stats().items()
    }
    assert sorted(v["cat"] for v in pv.values()) == ["a", "b"]
