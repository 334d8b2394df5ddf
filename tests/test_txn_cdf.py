"""Change-data feed on the transaction-log table (sources/txn.py
read_changes): inserts/deletes per commit version, merge as
delete+insert, compact invisible — and an incremental consumer that
maintains an aggregate from the feed alone."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable


@pytest.fixture()
def table(tmp_path):
    return TxnTable(str(tmp_path), "t", checkpoint_every=100)


def _rows(spark, pairs):
    return spark.createDataFrame([Row(k=k, v=v) for k, v in pairs], "k int, v string")


def _feed(table, spark, frm, to=None):
    return {
        (r.k, r.v, r._change_type, r._commit_version)
        for r in table.read_changes(spark, frm, to).collect()
    }


def test_appends_stream_as_inserts(spark, table):
    table.append(_rows(spark, [(1, "a")]))
    table.append(_rows(spark, [(2, "b")]))
    assert _feed(table, spark, 0) == {
        (1, "a", "insert", 1),
        (2, "b", "insert", 2),
    }


def test_merge_update_is_delete_plus_insert(spark, table):
    table.append(_rows(spark, [(1, "a"), (2, "b")]))
    table.merge(spark, _rows(spark, [(2, "B")]), on=["k"])
    got = _feed(table, spark, 1)
    assert got == {(2, "b", "delete", 2), (2, "B", "insert", 2)}


def test_delete_where_streams_deletes_only(spark, table):
    table.append(_rows(spark, [(1, "a"), (2, "b"), (3, "c")]))
    table.delete_where(spark, F.col("k") == 2)
    assert _feed(table, spark, 1) == {(2, "b", "delete", 2)}


def test_compact_is_invisible_to_the_feed(spark, table):
    table.append(_rows(spark, [(1, "a"), (2, "b")]))
    table.compact(spark)
    df = table.read_changes(spark, 1)
    assert df.count() == 0
    assert "_change_type" in df.columns


def test_version_range_slices_the_feed(spark, table):
    for i in range(4):
        table.append(_rows(spark, [(i, f"v{i}")]))
    got = _feed(table, spark, 1, 3)
    assert got == {(1, "v1", "insert", 2), (2, "v2", "insert", 3)}
    with pytest.raises(ValueError):
        table.read_changes(spark, 2, 99)


def test_incremental_aggregate_from_feed_matches_full_recompute(spark, table):
    """The point of CDF: maintain SUM(len(v)) GROUP BY k without ever
    re-reading the table — apply +insert/-delete deltas per batch."""
    table.append(_rows(spark, [(1, "aa"), (1, "b"), (2, "cc")]))
    state = {
        r.k: r.s
        for r in table.read(spark)
        .groupBy("k")
        .agg(F.sum(F.length("v")).alias("s"))
        .collect()
    }
    v_consumed = table.version()
    table.merge(spark, _rows(spark, [(1, "XXXX"), (3, "y")]), on=["k"])
    table.delete_where(spark, F.col("k") == 2)
    # consume only the feed since the last consumed version
    deltas = (
        table.read_changes(spark, v_consumed)
        .groupBy("k")
        .agg(
            F.sum(
                F.when(F.col("_change_type") == "insert", F.length("v")).otherwise(
                    -F.length("v")
                )
            ).alias("d")
        )
        .collect()
    )
    for r in deltas:
        state[r.k] = state.get(r.k, 0) + r.d
    state = {k: s for k, s in state.items() if s != 0}
    full = {
        r.k: r.s
        for r in table.read(spark)
        .groupBy("k")
        .agg(F.sum(F.length("v")).alias("s"))
        .collect()
    }
    assert state == full
