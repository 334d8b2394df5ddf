"""Deletion vectors (merge-on-read DELETE) on TxnTable: read equivalence
with copy-on-write, time travel, metadata-only counts, materialization
by compact/rewrites, change-feed integration, and DV-DV conflicts.

Reference analog: Delta's deletion-vector protocol (public spec) —
position sidecars + metadata commit instead of file rewrites.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import ConcurrentWriteError, TxnTable


def _table(spark, tmp_path, vals, name="t", files=3):
    t = TxnTable(str(tmp_path), name)
    df = spark.createDataFrame([(v,) for v in vals], "val int").repartition(files)
    t.append(df)
    return t


def _vals(spark, t, at_version=None):
    return sorted(r.val for r in t.read(spark, at_version=at_version).collect())


def test_dv_delete_matches_cow_delete(spark, tmp_path):
    vals = list(range(40))
    dv = _table(spark, tmp_path, vals, "dv")
    cow = _table(spark, tmp_path, vals, "cow")
    dv.delete_where_dv(spark, F.col("val") % 3 == 0)
    cow.delete_where(spark, F.col("val") % 3 == 0)
    want = [v for v in vals if v % 3 != 0]
    assert _vals(spark, dv) == want == _vals(spark, cow)
    # DV commit moved no data files
    h = dv.history()[-1]
    assert h["action"] == "delete_dv" and h["add"] == [] and h["remove"] == []


def test_dv_time_travel_and_metadata_count(spark, tmp_path):
    vals = list(range(30))
    t = _table(spark, tmp_path, vals)
    v1 = t.version()
    t.delete_where_dv(spark, F.col("val") < 10)
    assert _vals(spark, t, at_version=v1) == vals  # pre-DV snapshot intact
    assert _vals(spark, t) == list(range(10, 30))
    assert t.count_rows() == 20  # metadata-only, DV-aware
    assert t.count_rows(at_version=v1) == 30


def test_second_dv_and_compact_materializes(spark, tmp_path):
    t = _table(spark, tmp_path, list(range(30)))
    t.delete_where_dv(spark, F.col("val") < 10)
    t.delete_where_dv(spark, F.col("val") >= 25)  # positions disjoint by construction
    assert _vals(spark, t) == list(range(10, 25))
    assert t.count_rows() == 15
    t.compact(spark, target_file_bytes=1 << 20)
    assert _vals(spark, t) == list(range(10, 25))
    # after compact the DV counts are gone (files rewritten), count holds
    assert t.count_rows() == 15
    _, deleted = t.dv_state()
    assert deleted == {}


def test_cow_rewrites_respect_dvs(spark, tmp_path):
    """delete_where / merge reading files with outstanding DVs must not
    resurrect DV-deleted rows into the rewritten files."""
    t = _table(spark, tmp_path, list(range(20)), files=1)
    t.delete_where_dv(spark, F.col("val") < 5)
    t.delete_where(spark, F.col("val") >= 15)  # CoW rewrite of the same file
    assert _vals(spark, t) == list(range(5, 15))
    t2 = _table(spark, tmp_path, list(range(10)), "m", files=1)
    t2.delete_where_dv(spark, F.col("val") == 0)
    src = spark.createDataFrame([(5,)], "val int")
    t2.merge(spark, src, on=["val"])  # rewrites the file containing 5
    assert _vals(spark, t2) == list(range(1, 10))


def test_dv_change_feed(spark, tmp_path):
    t = _table(spark, tmp_path, list(range(12)))
    v1 = t.version()
    t.delete_where_dv(spark, F.col("val") < 4)
    ch = t.read_changes(spark, from_version=v1)
    rows = [(r.val, r._change_type) for r in ch.collect()]
    assert sorted(rows) == [(0, "delete"), (1, "delete"), (2, "delete"), (3, "delete")]
    # a later CoW delete must not re-report the DV-deleted rows
    v2 = t.version()
    t.delete_where(spark, F.col("val") >= 10)
    ch2 = t.read_changes(spark, from_version=v2)
    assert sorted((r.val, r._change_type) for r in ch2.collect()) == [
        (10, "delete"),
        (11, "delete"),
    ]


def test_dv_dv_conflict_detected(spark, tmp_path):
    """A DV commit racing another DV on the same files must abort (the
    metadata counts would double-count overlapping positions)."""
    t = _table(spark, tmp_path, list(range(10)), files=1)
    v0 = t.version()
    # first DV lands normally
    t.delete_where_dv(spark, F.col("val") == 0)
    # simulate a racer that snapshotted at v0: same file, stale base
    import os
    import uuid as _uuid

    meta = t._read_files_meta(spark, t.live_files(v0), at_version=v0)
    hits = meta.filter(F.col("val") == 1).select(
        F.col("__file").alias("file"), F.col("__ridx").alias("row_index")
    )
    name = _uuid.uuid4().hex
    staging = os.path.join(t.dv_dir, f".staging-{name}")
    hits.write.parquet(staging)
    counts = {
        r["file"]: r["n"]
        for r in spark.read.parquet(staging)
        .groupBy("file")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    os.rename(staging, os.path.join(t.dv_dir, name))
    with pytest.raises(ConcurrentWriteError):
        t._commit("delete_dv", [], [], dv_add=name, dv_counts=counts, dv_base_version=v0)


def test_dv_on_empty_and_no_match(spark, tmp_path):
    t = TxnTable(str(tmp_path), "e")
    assert t.delete_where_dv(spark, F.lit(True)) == 0  # never written
    t.append(spark.createDataFrame([(1,)], "val int").coalesce(1))
    v = t.version()
    assert t.delete_where_dv(spark, F.col("val") > 99) == v  # no match: no commit
    # all rows DV-deleted: the files stay live, so the table reads as an
    # EMPTY frame (unlike CoW delete-all, which empties the file set and
    # makes read() raise); metadata count agrees
    t.delete_where_dv(spark, F.lit(True))
    assert t.read(spark).count() == 0
    assert t.count_rows() == 0
    # and it is reusable
    t.append(spark.createDataFrame([(7,)], "val int").coalesce(1))
    assert _vals(spark, t) == [7]


def test_dv_survives_checkpoint_replay(spark, tmp_path):
    """DV state must survive checkpoint compression: with
    checkpoint_every=2 the replay starts AT a checkpoint, so sidecar
    names and deleted counts have to ride in the checkpoint itself."""
    t = TxnTable(str(tmp_path), "cp", checkpoint_every=2)
    t.append(spark.createDataFrame([(v,) for v in range(10)], "val int").coalesce(1))
    t.delete_where_dv(spark, F.col("val") < 3)  # v2 -> checkpoint written
    for i in range(3):  # push more checkpoints past the DV commit
        t.append(spark.createDataFrame([(100 + i,)], "val int").coalesce(1))
    fresh = TxnTable(str(tmp_path), "cp", checkpoint_every=2)
    assert _vals(spark, fresh) == [3, 4, 5, 6, 7, 8, 9, 100, 101, 102]
    assert fresh.count_rows() == 10
