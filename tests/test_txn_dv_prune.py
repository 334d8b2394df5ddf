"""DV-sidecar maintenance: prune_dv_sidecars drops all-dead sidecars
from the probe list (metadata-only, net-zero), vacuum then collects the
unreferenced sidecar files, restore refuses precisely when a rollback
would need pruned positions, streams skip the prune commit, and
merge/rebase refuse branches carrying one."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable
from spark_data_engineering_spark.sources.txn_datasource import TxnDataSource


def _table(spark, tmp_path, n=12):
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.range(n).withColumn("v", F.col("id") * 2).repartition(3))
    return t


def _ids(t, spark):
    return sorted(r.id for r in t.read(spark).collect())


def test_prune_drops_only_dead_sidecars_and_reads_are_identical(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.delete_where_dv(spark, F.col("id") == 1)   # live sidecar
    t.delete_where_dv(spark, F.col("id") == 2)   # live sidecar
    before_live = _ids(t, spark)
    assert t.prune_dv_sidecars() is None  # nothing dead yet
    t.compact(spark)  # materializes the deletes: both sidecars go dead
    sidecars_before, _ = t.dv_state()
    assert len(sidecars_before) == 2
    v = t.prune_dv_sidecars()
    assert v == t.version()
    sidecars_after, deleted_after = t.dv_state()
    assert sidecars_after == []
    assert _ids(t, spark) == before_live  # reads byte-identical
    assert t.count_rows() == len(before_live)  # metadata count intact
    assert t.prune_dv_sidecars() is None  # idempotent


def test_prune_keeps_useful_sidecars(spark, tmp_path):
    # two single-file appends so a CoW delete can rewrite ONE file while
    # the sidecar on the OTHER stays live
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.range(6).withColumn("v", F.col("id") * 2).coalesce(1))
    t.append(
        spark.range(10, 16).withColumn("v", F.col("id") * 2).coalesce(1)
    )
    t.delete_where_dv(spark, F.col("id") == 1)   # sidecar on file A
    t.delete_where(spark, F.col("id") >= 14)     # CoW rewrite of file B
    assert t.prune_dv_sidecars() is None  # the id==1 sidecar still live
    assert _ids(t, spark) == [0] + list(range(2, 6)) + list(range(10, 14))


def test_vacuum_collects_pruned_sidecar_files(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.delete_where_dv(spark, F.col("id") < 3)
    t.compact(spark)
    t.prune_dv_sidecars()

    def sidecars_on_disk():
        return [
            d for d in os.listdir(t.dv_dir) if not d.startswith(".staging-")
        ]

    assert len(sidecars_on_disk()) == 1
    # keep_versions=6 still references the pre-prune state: kept
    t.vacuum(keep_versions=6, min_age_s=0.0)
    assert len(sidecars_on_disk()) == 1
    # keep_versions=1: no retained version lists the sidecar -> collected
    t.vacuum(keep_versions=1, min_age_s=0.0)
    assert sidecars_on_disk() == []
    assert _ids(t, spark) == list(range(3, 12))  # head read unaffected


def test_restore_refuses_when_prune_dropped_needed_positions(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.delete_where_dv(spark, F.col("id") == 5)
    v_dv = t.version()  # state: rows minus id 5, positions in a sidecar
    t.compact(spark)  # materializes; sidecar now dead
    t.prune_dv_sidecars()
    with pytest.raises(ValueError, match="dv-prune"):
        t.restore(v_dv)  # would re-add pre-compact files w/ dv counts
    # an unrelated restore target (no re-added file had DV counts) works
    t2 = _table(spark, tmp_path / "t2")
    v_clean = t2.version()
    t2.delete_where_dv(spark, F.col("id") == 5)
    t2.compact(spark)
    t2.prune_dv_sidecars()
    t2.restore(v_clean)
    assert _ids(t2, spark) == list(range(12))


def test_streams_skip_prune_commits(spark, tmp_path):
    spark.dataSource.register(TxnDataSource)
    t = _table(spark, tmp_path, n=6)
    t.delete_where_dv(spark, F.col("id") == 0)
    t.compact(spark)
    q = (
        spark.readStream.format("txn")
        .load(t.table_dir)
        .writeStream.format("txn")
        .option("txnAppId", "p")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start(str(tmp_path / "dst"))
    )
    try:
        q.processAllAvailable()
        t.prune_dv_sidecars()  # mid-stream maintenance: must not abort
        t.append(spark.range(50, 52).withColumn("v", F.lit(0).cast("long")))
        q.processAllAvailable()
    finally:
        q.stop()
    dst = TxnTable(str(tmp_path), "dst")
    assert sorted(r.id for r in dst.read(spark).collect()) == list(
        range(1, 6)
    ) + [50, 51]


def test_merge_and_rebase_refuse_branch_prune_commits(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.delete_where_dv(spark, F.col("id") == 1)
    b = t.branch("fix")
    b.compact(spark)
    assert b.prune_dv_sidecars() is not None  # branch-side maintenance
    with pytest.raises(ValueError, match="dv-prune"):
        t.merge_branch(b)
    t.append(spark.range(100, 101).withColumn("v", F.lit(0).cast("long")))
    with pytest.raises(ValueError, match="dv-prune"):
        t.rebase_branch(b)


def test_vacuum_dry_run_reports_without_deleting(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.delete_where_dv(spark, F.col("id") < 3)
    t.compact(spark)
    t.prune_dv_sidecars()
    before = sorted(os.listdir(t.data_dir)) + sorted(os.listdir(t.dv_dir))
    planned = t.vacuum(keep_versions=1, min_age_s=0.0, dry_run=True)
    assert planned  # pre-compact data files + the pruned sidecar
    after = sorted(os.listdir(t.data_dir)) + sorted(os.listdir(t.dv_dir))
    assert after == before  # nothing touched
    # the real run deletes exactly what the dry run planned
    assert t.vacuum(keep_versions=1, min_age_s=0.0) == planned
