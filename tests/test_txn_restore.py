"""TxnTable.restore: rollback-as-new-commit (Delta RESTORE). Metadata
only, history stays time-travelable, deletion-vector state survives
exactly (counts re-established for re-added files), and the
irreversible cases (post-target DV on a restored file, vacuumed target)
are refused loudly."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable


def _ids(spark, t, **kw):
    return sorted(r.id for r in t.read(spark, **kw).collect())


def test_restore_is_metadata_only_and_time_travelable(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.range(10))
    t.overwrite(spark.range(100, 104))
    n_files = len(os.listdir(t.data_dir))
    v = t.restore(1)
    assert v == 3
    assert len(os.listdir(t.data_dir)) == n_files  # no bytes moved
    assert _ids(spark, t) == list(range(10))
    # the rolled-back state stays time-travelable, and restore composes
    assert _ids(spark, t, at_version=2) == list(range(100, 104))
    t.restore(2)
    assert _ids(spark, t) == list(range(100, 104))
    assert t.count_rows() == 4


def test_restore_refused_when_later_dv_touches_restored_file(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.range(10))
    t.delete_where_dv(spark, F.col("id") < 3)
    with pytest.raises(ValueError, match="deletion-vector commit"):
        t.restore(1)
    # after compact materializes the deletes, the guard clears
    t.compact(spark)
    v = t.version()
    t.append(spark.range(50, 53))
    t.restore(v)
    assert _ids(spark, t) == list(range(3, 10))


def test_restore_preserves_pre_target_dv_state_and_counts(spark, tmp_path):
    """Sidecars at or before the target are RESTORED state: the re-added
    file reads with its deletes applied, and metadata-only count_rows
    stays exact because the commit re-establishes the popped per-file
    deleted counts."""
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.range(10))
    t.delete_where_dv(spark, F.col("id") % 2 == 0)  # v2: 5 deleted
    t.overwrite(spark.range(200, 203))  # v3 pops the counts
    t.restore(2)
    want = [i for i in range(10) if i % 2 != 0]
    assert _ids(spark, t) == want
    assert t.count_rows() == len(want)  # metadata, not a scan
    rec = t._read_commit(t.version())
    assert rec["action"] == "restore" and rec["dv_counts_restore"]


def test_restore_refused_for_vacuumed_versions(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.range(5))
    t.overwrite(spark.range(300, 302))
    t.vacuum(keep_versions=1)
    with pytest.raises(ValueError, match="vacuumed"):
        t.restore(1)


def test_restore_checkpoint_roundtrip(spark, tmp_path):
    """dv_counts_restore must survive the checkpoint replay: state read
    through a checkpoint written AFTER the restore equals the directly
    replayed state."""
    t = TxnTable(str(tmp_path), "t", checkpoint_every=2)
    t.append(spark.range(8))
    t.delete_where_dv(spark, F.col("id") == 0)
    t.overwrite(spark.range(400, 402))
    t.restore(2)
    # drive past the next checkpoint boundary
    t.append(spark.range(500, 502))
    t.append(spark.range(600, 602))
    _, deleted = t.dv_state()
    assert sum(deleted.values()) == 1
    assert _ids(spark, t) == list(range(1, 8)) + [500, 501, 600, 601]
    assert t.count_rows() == 11


def test_branch_side_restore_merges_with_exact_dv_counts(spark, tmp_path):
    """A restore performed ON A BRANCH replays onto the parent with its
    dv_counts_restore intact — dropping the field would desync the
    parent's metadata counts and trip merge_branch's post-merge DV
    verification."""
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.range(10))
    t.delete_where_dv(spark, F.col("id") >= 8)  # 2 deleted, pre-branch
    b = t.branch("exp")
    bv = b.version()
    b.overwrite(spark.range(700, 703))  # pops counts on the branch
    b.restore(bv)  # re-establishes them via dv_counts_restore
    t.merge_branch(b)  # would raise ConcurrentWriteError without the fix
    assert _ids(spark, t) == list(range(8))
    assert t.count_rows() == 8


def test_restore_refuses_unvalidated_constraint(spark, tmp_path):
    """ADVICE r8 medium: delete violating rows -> add_constraint
    (validates only CURRENT data) -> restore to the pre-delete version
    re-adds files the validation never saw. Metadata-only restore must
    refuse; restore(version, spark) re-validates and refuses with the
    violation, keeping the constraint's contract intact."""
    from spark_data_engineering_spark.checks import CheckError

    t = TxnTable(str(tmp_path), "t")
    t.append(spark.range(10))          # v1: ids 0..9
    t.delete_where(spark, F.col("id") >= 5)  # v2: rewrite, 0..4 live
    t.add_constraint(spark, "small", "id < 5")  # v3: passes on 0..4
    with pytest.raises(ValueError, match="small"):
        t.restore(1)
    with pytest.raises(CheckError, match="small"):
        t.restore(1, spark)
    assert _ids(spark, t) == list(range(5))  # refusals were no-ops
    # drop the constraint and the restore goes through
    t.drop_constraint("small")
    t.restore(1)
    assert _ids(spark, t) == list(range(10))


def test_restore_revalidation_passes_when_contract_holds(spark, tmp_path):
    """The re-added files were never validated but DO satisfy the
    constraint: restore(version, spark) re-validates and proceeds."""
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.range(10))                  # v1
    t.delete_where(spark, F.col("id") >= 5)    # v2
    t.add_constraint(spark, "nonneg", "id >= 0")  # v3: 0..9 all satisfy
    with pytest.raises(ValueError, match="nonneg"):
        t.restore(1)  # metadata-only still refuses (never validated)
    t.restore(1, spark)
    assert _ids(spark, t) == list(range(10))


def test_restore_constraint_guard_skips_validated_files(spark, tmp_path):
    """A constraint added while the restored files were still live DID
    validate them — no refusal, no session needed."""
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.range(10))                   # v1
    t.add_constraint(spark, "small", "id < 100")  # v2: saw v1's files
    t.overwrite(spark.range(20, 25))            # v3
    t.restore(1)  # re-added files were live at the constraint's commit
    assert _ids(spark, t) == list(range(10))
