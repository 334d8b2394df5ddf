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


def test_vacuum_on_a_branch_is_refused(spark, tmp_path):
    """A branch's keep-set misses parent/sibling refs over the SHARED
    data dir — vacuuming from it would delete the owner's live files
    (e.g. anything the parent appended after branching). Refused."""
    t = _table(spark, tmp_path)
    b = t.branch("exp")
    t.append(spark.range(100, 110).withColumn("v", F.col("id")))
    with pytest.raises(ValueError, match="vacuum on a branch"):
        b.vacuum(keep_versions=1)
    # the parent-only files survive and the parent is the GC authority
    assert t.vacuum(keep_versions=1) == []
    assert _ids(spark, t) == list(range(40)) + list(range(100, 110))


def test_parent_vacuum_sees_nested_branch_refs(spark, tmp_path):
    """A branch of a branch is still a ref root over the same shared
    dirs: the one-level walk would miss the grandchild's NEW files and
    delete them. The recursive walk must keep them."""
    t = _table(spark, tmp_path)
    b = t.branch("child")
    g = b.branch("grandchild")
    g.append(spark.range(900, 905).withColumn("v", F.col("id")))
    # parent rewrite: its own old generation is branch-referenced (kept);
    # the grandchild's new file is referenced ONLY by the grandchild head
    t.overwrite(spark.range(10).withColumn("v", F.col("id")))
    removed = t.vacuum(keep_versions=1)
    assert removed == []
    assert _ids(spark, g) == list(range(40)) + list(range(900, 905))
    # dropping the child drops the grandchild with it (rmtree) — both
    # ref lines die and the next vacuum collects old gen + branch files
    t.drop_branch("child")
    assert t.vacuum(keep_versions=1)
    assert _ids(spark, t) == list(range(10))


def test_direct_open_of_branch_resolves_shared_dirs(spark, tmp_path):
    """The persisted branch marker makes a plain TxnTable(...) open of a
    branch path read the parent's shared data/dv dirs — no need to come
    through parent.branch()."""
    t = _table(spark, tmp_path)
    b = t.branch("exp")
    b.append(spark.range(500, 505).withColumn("v", F.col("id")))
    b.delete_where_dv(spark, F.col("id") == 3)
    reopened = TxnTable(os.path.join(str(tmp_path), "t", "_branches"), "exp")
    assert reopened.data_dir == t.data_dir and reopened.dv_dir == t.dv_dir
    assert _ids(spark, reopened) == [i for i in range(40) if i != 3] + list(
        range(500, 505)
    )


def test_parent_vacuum_cleans_crashed_branch_staging(spark, tmp_path):
    """Crashed-stage dirs under a BRANCH table_dir are the parent
    vacuum's job (branch vacuum is refused)."""
    t = _table(spark, tmp_path)
    b = t.branch("exp")
    crashed = os.path.join(b.table_dir, ".staging-deadbeef")
    os.makedirs(crashed)
    assert ".staging-deadbeef" in t.vacuum(keep_versions=1, min_age_s=0.0)
    assert not os.path.isdir(crashed)


def test_format_txn_writer_on_a_branch_path(spark, tmp_path):
    """The branch marker makes the standard df.write.format('txn') API
    compose with branches: a save targeting the branch path stages into
    the SHARED data dir, commits to the branch log only, and the commit
    fast-forward-merges onto the parent."""
    from spark_data_engineering_spark.sources.txn_datasource import TxnDataSource

    spark.dataSource.register(TxnDataSource)
    t = _table(spark, tmp_path)
    b = t.branch("exp")
    bpath = b.table_dir
    spark.range(700, 706).withColumn("v", F.col("id") * 2).write.format(
        "txn"
    ).mode("append").save(bpath)
    # staged into the shared dir, visible on the branch, parent isolated
    assert _ids(spark, b) == list(range(40)) + list(range(700, 706))
    assert _ids(spark, t) == list(range(40))
    assert not os.listdir(os.path.join(bpath, "data"))  # nothing branch-local
    t.merge_branch(b)
    assert _ids(spark, t) == list(range(40)) + list(range(700, 706))


def test_change_feed_over_branch_folds_to_branch_state(spark, tmp_path):
    """read_changes over a BRANCH log: the seed reports the inherited
    snapshot as inserts, the branch-dv consolidation reports the
    parent-deleted rows as deletes (same shape as delete_dv), and branch
    appends follow — so insert-minus-delete folds exactly to the branch
    read."""
    t = _table(spark, tmp_path)
    t.delete_where_dv(spark, F.col("id") % 8 == 0)
    b = t.branch("cdf")
    b.append(spark.range(200, 204).withColumn("v", F.col("id")))
    ch = b.read_changes(spark, 0).select("id", "_change_type").collect()
    ins = sorted(r.id for r in ch if r._change_type == "insert")
    dels = sorted(r.id for r in ch if r._change_type == "delete")
    assert dels == [i for i in range(40) if i % 8 == 0]
    folded = sorted(set(ins) - set(dels))
    assert folded == _ids(spark, b) == [
        i for i in range(40) if i % 8 != 0
    ] + list(range(200, 204))
