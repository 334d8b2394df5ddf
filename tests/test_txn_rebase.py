"""TxnTable.rebase_branch: replay a diverged branch onto the current
parent head — happy path (then fast-forward merge), conflict refusal,
schema-evolution refusal, non-destructive failure, exactly-once
watermark survival, and vacuum collection of abandoned scratch dirs."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import ConcurrentWriteError, TxnTable


def _table(spark, tmp_path, n=40):
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.range(n).withColumn("v", F.col("id") * 2).repartition(4))
    return t


def _ids(spark, t, **kw):
    return sorted(r.id for r in t.read(spark, **kw).collect())


def test_rebase_then_fast_forward_merge(spark, tmp_path):
    t = _table(spark, tmp_path)
    b = t.branch("fix")
    # parent DIVERGES: new load lands after the branch was cut
    t.append(spark.range(100, 110).withColumn("v", F.lit(0).cast("long")))
    # branch work: an append and a merge-on-read delete of seed rows
    b.append(spark.range(200, 205).withColumn("v", F.lit(1).cast("long")))
    b.delete_where_dv(spark, F.col("id") < 5)
    with pytest.raises(ConcurrentWriteError, match="fast-forward"):
        t.merge_branch(b)
    rb = t.rebase_branch(b)
    # the rebased branch sees BOTH lines: parent's new load + branch work
    assert _ids(spark, rb) == list(range(5, 40)) + list(range(100, 110)) + list(
        range(200, 205)
    )
    t.merge_branch(rb)  # now a clean fast-forward
    assert _ids(spark, t) == _ids(spark, rb)
    # provenance: replayed commits carry rebased_from
    assert any(c.get("rebased_from") == "fix" for c in rb.history())


def test_rebase_noop_when_parent_at_base(spark, tmp_path):
    t = _table(spark, tmp_path)
    b = t.branch("fix")
    b.append(spark.range(200, 203).withColumn("v", F.lit(1).cast("long")))
    assert t.rebase_branch(b) is b  # nothing to rebase


def test_rebase_conflict_on_parent_dv_overlap(spark, tmp_path):
    t = _table(spark, tmp_path, n=8)
    t.compact(spark)  # one file => any DV on both lines collides
    b = t.branch("fix")
    t.delete_where_dv(spark, F.col("id") == 1)
    b.delete_where_dv(spark, F.col("id") == 2)
    with pytest.raises(ConcurrentWriteError, match="conflict"):
        t.rebase_branch(b)
    # non-destructive: the original branch is intact and readable
    assert _ids(spark, b) == [0, 1] + list(range(3, 8))
    # and no scratch dir leaked
    leftovers = [
        d
        for d in os.listdir(os.path.join(t.table_dir, "_branches"))
        if d.startswith(".rebase-") or d.startswith(".trash-")
    ]
    assert leftovers == []


def test_rebase_conflict_on_parent_rewrite_of_branch_dv(spark, tmp_path):
    t = _table(spark, tmp_path, n=8)
    b = t.branch("fix")
    b.delete_where_dv(spark, F.col("id") == 2)
    t.compact(spark)  # parent rewrote (removed) the files the branch DV'd
    with pytest.raises(ConcurrentWriteError, match="conflict"):
        t.rebase_branch(b)


def test_rebase_refuses_schema_evolution_either_side(spark, tmp_path):
    t = _table(spark, tmp_path)
    b = t.branch("fix")
    b.append(spark.range(200, 202).withColumn("v", F.lit(1).cast("long")))
    t.rename_column(spark, "v", "w")
    with pytest.raises(ConcurrentWriteError, match="schema"):
        t.rebase_branch(b)
    t2 = _table(spark, tmp_path / "t2")
    b2 = t2.branch("fix")
    b2.rename_column(spark, "v", "w")
    t2.append(spark.range(100, 103).withColumn("v", F.lit(0).cast("long")))
    with pytest.raises(ValueError, match="schema-evolution"):
        t2.rebase_branch(b2)


def test_rebase_preserves_exactly_once_watermark(spark, tmp_path):
    t = _table(spark, tmp_path)
    b = t.branch("fix")
    b.append_idempotent(spark.range(200, 204).withColumn("v", F.lit(1).cast("long")), "app", 7)
    t.append(spark.range(100, 103).withColumn("v", F.lit(0).cast("long")))
    rb = t.rebase_branch(b)
    assert rb.last_epoch("app") == 7
    # a redelivered epoch still commits nothing after the rebase
    assert (
        rb.append_idempotent(
            spark.range(200, 204).withColumn("v", F.lit(1).cast("long")), "app", 7
        )
        is None
    )


def test_vacuum_collects_abandoned_rebase_scratch(spark, tmp_path):
    t = _table(spark, tmp_path)
    b = t.branch("fix")
    b.append(spark.range(200, 203).withColumn("v", F.lit(1).cast("long")))
    # simulate a crashed rebase: scratch dirs left under _branches/
    bdir = os.path.join(t.table_dir, "_branches")
    for d in (".rebase-dead", ".trash-dead"):
        os.makedirs(os.path.join(bdir, d, "_txn_log"), exist_ok=True)
    # min_age_s=0 must NOT collect the scratch (round-7 ADVICE: the
    # .trash-* copy is the only recovery line after a crash mid-swap —
    # a routine zero-retention vacuum right after the crash would
    # destroy it); a positive retention window still collects.
    removed = t.vacuum(min_age_s=0.0)
    assert ".rebase-dead" not in removed and ".trash-dead" not in removed
    import time as _time

    old = _time.time() - 7200
    for d in (".rebase-dead", ".trash-dead"):
        os.utime(os.path.join(bdir, d), (old, old))
    removed = t.vacuum(min_age_s=1.0)
    assert ".rebase-dead" in removed and ".trash-dead" in removed
    # the real branch survived untouched
    assert _ids(spark, t.branch("fix")) == list(range(40)) + [200, 201, 202]


def test_rebase_refuses_branch_overwrite(spark, tmp_path):
    """A branch OVERWRITE replaced the table as the branch saw it;
    replaying it file-wise onto a diverged parent would silently keep
    the parent's post-base rows — refused."""
    t = _table(spark, tmp_path)
    b = t.branch("fix")
    b.overwrite(spark.range(3).withColumn("v", F.lit(9).cast("long")))
    t.append(spark.range(100, 102).withColumn("v", F.lit(0).cast("long")))
    with pytest.raises(ValueError, match="OVERWRITE"):
        t.rebase_branch(b)
