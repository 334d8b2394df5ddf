"""TxnTable branches: zero-copy creation, isolation, DV inheritance,
fast-forward merge (metadata-only), rebase refusal, vacuum ref-roots,
and abandonment."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import ConcurrentWriteError, TxnTable


def _table(spark, tmp_path, n=40):
    t = TxnTable(str(tmp_path), "t")
    t.append(
        spark.range(n).withColumn("v", F.col("id") * 2).repartition(4)
    )
    return t


def _ids(spark, t, **kw):
    return sorted(r.id for r in t.read(spark, **kw).collect())


def test_branch_is_zero_copy_and_isolated(spark, tmp_path):
    t = _table(spark, tmp_path)
    n_files_before = len(os.listdir(t.data_dir))
    b = t.branch("exp")
    assert len(os.listdir(t.data_dir)) == n_files_before  # no byte copied
    assert _ids(spark, b) == _ids(spark, t)
    # branch writes are invisible to the parent, and vice versa
    b.append(spark.range(100, 110).withColumn("v", F.col("id") * 2))
    b.delete_where_dv(spark, F.col("id") < 5)
    assert _ids(spark, b) == list(range(5, 40)) + list(range(100, 110))
    assert _ids(spark, t) == list(range(40))
    t2 = t.branch("exp")  # reopen returns the same branch state
    assert _ids(spark, t2) == _ids(spark, b)


def test_branch_inherits_parent_dv_state(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.delete_where_dv(spark, F.col("id") % 10 == 0)
    b = t.branch("exp")
    # parent-deleted rows must NOT resurrect on the branch
    assert _ids(spark, b) == [i for i in range(40) if i % 10 != 0]
    assert b.count_rows() == 36  # metadata-only count carries the DVs


def test_merge_fast_forward_replays_branch_work(spark, tmp_path):
    t = _table(spark, tmp_path)
    v0 = t.version()
    b = t.branch("fix")
    b.append(spark.range(200, 205).withColumn("v", F.col("id") * 2))
    b.delete_where_dv(spark, F.col("id") % 7 == 0)
    b.compact(spark)  # rewrite on the branch: shared-dir basename swap
    want = _ids(spark, b)
    v = t.merge_branch(b)
    assert v > v0
    assert _ids(spark, t) == want
    assert set(t.live_files()) == set(b.live_files())


def test_merge_refused_when_parent_advanced(spark, tmp_path):
    t = _table(spark, tmp_path)
    b = t.branch("stale")
    b.append(spark.range(300, 305).withColumn("v", F.col("id") * 2))
    t.append(spark.range(400, 405).withColumn("v", F.col("id") * 2))
    with pytest.raises(ConcurrentWriteError, match="fast-forward"):
        t.merge_branch(b)
    # parent unchanged by the refused merge
    assert _ids(spark, t) == list(range(40)) + list(range(400, 405))


def test_merge_refuses_schema_evolution_commits(spark, tmp_path):
    t = _table(spark, tmp_path)
    b = t.branch("schemadrift")
    b.rename_column(spark, "v", "w")
    with pytest.raises(ValueError, match="schema-evolution"):
        t.merge_branch(b)


def test_vacuum_keeps_branch_referenced_files(spark, tmp_path):
    t = _table(spark, tmp_path)
    b = t.branch("keepme")
    b.append(spark.range(500, 510).withColumn("v", F.col("id") * 2))
    # parent rewrite orphans ITS old files but the branch still
    # references them (seed commit) — vacuum must keep every one
    t.overwrite(spark.range(40).withColumn("v", F.col("id") * 3))
    removed = t.vacuum(keep_versions=1)
    assert removed == []  # branch seed holds refs to the old generation
    assert _ids(spark, b) == list(range(40)) + list(range(500, 510))
    # abandon the branch: its refs die; vacuum now collects
    t.drop_branch("keepme")
    removed2 = t.vacuum(keep_versions=1)
    assert removed2  # old generation + branch-only files collected
    assert _ids(spark, t) == list(range(40))


def test_merge_idempotent_epoch_watermarks_replay(spark, tmp_path):
    """A branch built from exactly-once streaming appends merges with
    its (app, epoch) watermarks intact on the parent."""
    t = _table(spark, tmp_path)
    b = t.branch("stream")
    b.append_idempotent(spark.range(600, 605).withColumn("v", F.col("id")), "app1", 1)
    b.append_idempotent(spark.range(605, 610).withColumn("v", F.col("id")), "app1", 2)
    t.merge_branch(b)
    assert t.last_epoch("app1") == 2  # watermark travelled with the merge
    assert _ids(spark, t) == list(range(40)) + list(range(600, 610))


def test_merged_dv_deletes_appear_in_change_feed(spark, tmp_path):
    """Replayed branch commits keep their ORIGINAL action strings, so
    read_changes emits the branch's DV deletes and appends after a
    merge (round-7 review finding: a 'merge-branch:' action prefix made
    the change feed silently drop them)."""
    t = _table(spark, tmp_path)
    v0 = t.version()
    b = t.branch("cdc")
    b.append(spark.range(700, 705).withColumn("v", F.col("id")))
    b.delete_where_dv(spark, F.col("id") < 3)
    t.merge_branch(b)
    changes = t.read_changes(spark, from_version=v0).collect()
    ins = sorted(r.id for r in changes if r._change_type == "insert")
    dels = sorted(r.id for r in changes if r._change_type == "delete")
    assert ins == list(range(700, 705))
    assert dels == [0, 1, 2]
    # provenance recorded without touching the dispatched action
    replayed = [c for c in t.history() if c.get("merged_from")]
    assert replayed and all(c["action"] != "" for c in replayed)
    assert {c["action"] for c in replayed} == {"append", "delete_dv"}
