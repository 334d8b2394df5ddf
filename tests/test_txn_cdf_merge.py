"""MERGE update-images in the change feed (VERDICT r7 task 3):
``merge(cdf=True)`` persists the row-level change set (Delta's
``_change_data``) atomically with the commit, so batch ``read_changes``
and the streaming change feed report ``update_preimage`` /
``update_postimage`` / ``delete`` / ``insert`` for the merge instead of
a file diff (batch) or an abort (stream). Triage contract (round 7):
the new commit FIELD ``cdf_add`` is dispatched in all three places —
``TxnStreamReader.partitions``, ``read_changes``, and the
``merge_branch`` replay."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable
from spark_data_engineering_spark.sources.txn_datasource import TxnDataSource


@pytest.fixture(autouse=True)
def _register(spark):
    spark.dataSource.register(TxnDataSource)


def _mk(spark, tmp_path, name="t"):
    t = TxnTable(str(tmp_path), name)
    t.append(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
            "id bigint, s string, v double",
        ).repartition(2)
    )
    return t


def _src(spark):
    # updates 1 and 2, deletes 3 (marker), inserts 9
    return spark.createDataFrame(
        [(1, "A", 11.0), (2, "B", 22.0), (3, "DEAD", -1.0), (9, "z", 90.0)],
        "id bigint, s string, v double",
    )


def _changes(t, spark, v):
    rows = (
        t.read_changes(spark, v - 1, v)
        .select("id", "s", "v", "_change_type", "_commit_version")
        .collect()
    )
    return sorted((r.id, r.s, r.v, r._change_type, r._commit_version) for r in rows)


def test_merge_cdf_batch_update_images(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v = t.merge(
        spark,
        _src(spark),
        on=["id"],
        matched_delete_condition=F.col("v") < 0,
        cdf=True,
    )
    assert _changes(t, spark, v) == sorted(
        [
            (1, "a", 10.0, "update_preimage", v),
            (1, "A", 11.0, "update_postimage", v),
            (2, "b", 20.0, "update_preimage", v),
            (2, "B", 22.0, "update_postimage", v),
            (3, "c", 30.0, "delete", v),
            (9, "z", 90.0, "insert", v),
        ]
    )
    # the table state agrees with the change images folded onto v0
    got = sorted((r.id, r.s, r.v) for r in t.read(spark).collect())
    assert got == [(1, "A", 11.0), (2, "B", 22.0), (4, "d", 40.0), (9, "z", 90.0)]


def test_merge_cdf_when_matched_delete(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v = t.merge(
        spark,
        _src(spark).filter(F.col("id") < 3),
        on=["id"],
        when_matched="delete",
        when_not_matched=None,
        cdf=True,
    )
    assert _changes(t, spark, v) == sorted(
        [(1, "a", 10.0, "delete", v), (2, "b", 20.0, "delete", v)]
    )


def test_merge_cdf_duplicate_key_target_multiplicity(spark, tmp_path):
    """The round-7 model-search MERGE contract: duplicate-key target rows
    each update in place — the change feed must carry BOTH pre/post
    pairs, not a collapsed one."""
    t = TxnTable(str(tmp_path), "dup")
    t.append(
        spark.createDataFrame(
            [(1, 10.0), (1, 10.5), (2, 20.0)], "id bigint, v double"
        )
    )
    v = t.merge(
        spark,
        spark.createDataFrame([(1, 99.0)], "id bigint, v double"),
        on=["id"],
        when_not_matched=None,
        cdf=True,
    )
    ch = (
        t.read_changes(spark, v - 1, v)
        .groupBy("_change_type")
        .count()
        .collect()
    )
    assert {r._change_type: r["count"] for r in ch} == {
        "update_preimage": 2,
        "update_postimage": 2,
    }


def _stream_fold(spark, table_dir, tmp_path, name):
    sign = F.when(
        F.col("_change_type").isin("delete", "update_preimage"), F.lit(-1)
    ).otherwise(F.lit(1))
    q = (
        spark.readStream.format("txn")
        .option("readChangeFeed", "true")
        .option("startingVersion", "0")
        .load(table_dir)
        .groupBy("id")
        .agg(
            F.sum(sign).cast("bigint").alias("n"),
            F.sum(F.col("v") * sign).alias("vsum"),
        )
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return sorted(
        (r.id, r.n, round(r.vsum, 6))
        for r in spark.table(name).collect()
        if r.n != 0
    )


def test_merge_cdf_stream_matches_batch_state(spark, tmp_path):
    """Streaming the CDF of a MERGE-heavy table no longer aborts: the
    signed fold over the streamed change rows reproduces the table
    state (the batch/stream agreement pin)."""
    t = _mk(spark, tmp_path)
    t.merge(
        spark,
        _src(spark),
        on=["id"],
        matched_delete_condition=F.col("v") < 0,
        cdf=True,
    )
    folded = _stream_fold(spark, t.table_dir, tmp_path, "cdf_merge_fold")
    state = sorted((r.id, 1, round(r.v, 6)) for r in t.read(spark).collect())
    assert folded == state


def test_merge_without_cdf_still_aborts_cdf_stream(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(spark, _src(spark).filter(F.col("id") == 1), on=["id"])
    with pytest.raises(Exception, match="read_changes|ignoreChanges"):
        _stream_fold(spark, t.table_dir, tmp_path, "cdf_merge_abort")


def test_merge_cdf_survives_branch_merge_replay(spark, tmp_path):
    """Third dispatcher: the replay forwards cdf_add, so the parent's
    change feed reads the merged-in merge as a pure scan with images."""
    t = _mk(spark, tmp_path)
    b = t.branch("feature")
    b.merge(
        spark,
        _src(spark).filter(F.col("id").isin(1, 9)),
        on=["id"],
        cdf=True,
    )
    v = t.merge_branch(b)
    parent_commit = t._read_commit(v)
    assert parent_commit.get("cdf_add"), "replay must forward cdf_add"
    types = sorted(
        r._change_type
        for r in t.read_changes(spark, v - 1, v).collect()
    )
    assert types == ["insert", "update_postimage", "update_preimage"]


def test_merge_cdf_readable_after_compact_vacuum(spark, tmp_path):
    """The persisted change rows outlive the rewritten data files: a
    later compact + vacuum removes the merge's input files, and the
    change feed still reads the merge's images (the file-diff path
    would crash here)."""
    t = _mk(spark, tmp_path)
    v = t.merge(spark, _src(spark).filter(F.col("id") == 1), on=["id"], cdf=True)
    t.compact(spark)
    t.vacuum(min_age_s=0)
    assert [r for r in _changes(t, spark, v) if r[3] == "update_postimage"] == [
        (1, "A", 11.0, "update_postimage", v)
    ]


def test_vacuum_gc_cdf_orphans_keeps_committed(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(spark, _src(spark).filter(F.col("id") == 1), on=["id"], cdf=True)
    committed = set(os.listdir(t.cdf_dir))
    assert committed
    orphan = os.path.join(t.cdf_dir, "deadbeef-orphan.parquet")
    with open(orphan, "wb") as fh:
        fh.write(b"crashed staging")
    old = time.time() - 7200
    os.utime(orphan, (old, old))
    t.vacuum(min_age_s=1.0)
    assert not os.path.exists(orphan)
    assert committed <= set(os.listdir(t.cdf_dir))
