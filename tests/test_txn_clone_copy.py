"""SHALLOW CLONE + COPY INTO analogs.

- TxnTable.clone: a new fully independent table whose v1 is the source's
  snapshot at a version — data files hardlinked (no rewrite), schema /
  partition / generated / identity / constraints / properties / identity
  watermark / DV state all carried; mutating either side never affects
  the other, and vacuum on either side is safe.
- TxnTable.copy_into: idempotent landing-zone ingestion — each source
  file loads at most once (identity = relpath:size:mtime_ns), ledger
  recorded atomically in the 'copy' commit, hardlink + footer stats,
  CHECK constraints enforced on the staged bytes.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from spark_data_engineering_spark.checks import CheckError
from spark_data_engineering_spark.sources.txn import TxnTable


@pytest.fixture()
def base(spark, tmp_path):
    t = TxnTable(str(tmp_path / "base"), "t")
    t.append(spark.range(100).withColumn("v", F.col("id") * 2.0).coalesce(2))
    return t


# ---------------------------------------------------------------- clone


def test_clone_snapshot_and_independence(spark, tmp_path, base):
    base.delete_where_dv(spark, F.col("id") < 10)  # v2: DV delete
    c = base.clone(str(tmp_path / "c"), "t_clone")
    # clone sees the DV-filtered snapshot
    assert sorted(r.id for r in c.read(spark).collect()) == list(range(10, 100))
    assert c.count_rows() == 90
    # hardlinked, not copied
    assert all(
        os.stat(os.path.join(c.data_dir, f)).st_nlink >= 2
        for f in c.live_files()
    )
    # mutations are isolated both ways
    c.append(spark.range(500, 503).withColumn("v", F.lit(0.0)).coalesce(1))
    base.delete_where_dv(spark, F.col("id") >= 90)
    assert sorted(r.id for r in base.read(spark).collect()) == list(range(10, 90))
    assert sorted(r.id for r in c.read(spark).collect()) == list(
        range(10, 100)
    ) + [500, 501, 502]
    # provenance in the seed commit
    seed = c._read_commit(1)
    assert seed["action"] == "clone"
    assert seed["clone_version"] == 2
    assert seed["clone_source"] == base.table_dir


def test_clone_at_version_and_timestamp(spark, tmp_path, base):
    v1_ts = base._read_commit(1)["ts"]
    base.append(spark.range(100, 120).withColumn("v", F.lit(1.0)).coalesce(1))
    c1 = base.clone(str(tmp_path / "c1"), "c1", at_version=1)
    assert c1.count_rows() == 100
    c2 = base.clone(str(tmp_path / "c2"), "c2", at_timestamp=v1_ts)
    assert c2.count_rows() == 100
    with pytest.raises(ValueError, match="at_version OR at_timestamp"):
        base.clone(str(tmp_path / "c3"), "c3", at_version=1, at_timestamp=v1_ts)
    with pytest.raises(ValueError, match="out of range"):
        base.clone(str(tmp_path / "c4"), "c4", at_version=99)


def test_clone_vacuum_safety_both_ways(spark, tmp_path, base):
    c = base.clone(str(tmp_path / "c"), "t_clone")
    # source rewrites everything, then vacuums its old files away
    base.overwrite(spark.range(5).withColumn("v", F.lit(0.0)).coalesce(1))
    base.vacuum(keep_versions=1)
    # the clone's links keep the bytes alive
    assert sorted(r.id for r in c.read(spark).collect()) == list(range(100))
    # and vice versa: clone compacts + vacuums; source unaffected
    c.compact(spark, target_file_bytes=1 << 30)
    c.vacuum(keep_versions=1)
    assert base.count_rows() == 5


def test_clone_carries_metadata(spark, tmp_path):
    t = TxnTable(str(tmp_path / "m"), "m")
    t.append(
        spark.range(10)
        .withColumn("grp", (F.col("id") % 2).cast("string"))
        .coalesce(1)
    )
    t.add_constraint(spark, "id_nonneg", "id >= 0")
    t.set_properties({"tier": "gold"})
    c = t.clone(str(tmp_path / "mc"), "mc")
    assert c.constraints() == {"id_nonneg": "id >= 0"}
    assert c.properties() == {"tier": "gold"}
    # the constraint is ENFORCED on the clone
    with pytest.raises(CheckError):
        c.append(
            spark.range(1)
            .select((F.col("id") - 5).alias("id"), F.lit("x").alias("grp"))
        )


def test_clone_refuses_nonempty_dest(spark, tmp_path, base):
    base.clone(str(tmp_path / "c"), "t_clone")
    with pytest.raises(ValueError, match="already has commits"):
        base.clone(str(tmp_path / "c"), "t_clone")


def test_clone_streams_and_cdf_like_a_table(spark, tmp_path, base):
    base.delete_where_dv(spark, F.col("id") >= 95)
    c = base.clone(str(tmp_path / "c"), "t_clone")
    ch = c.read_changes(spark, 0)
    rows = ch.collect()
    ins = [r.id for r in rows if r["_change_type"] == "insert"]
    del_ = [r.id for r in rows if r["_change_type"] == "delete"]
    # seed reports the full files as inserts; clone-dv retracts the
    # source-deleted positions -> net change equals the clone read
    assert sorted(ins) == list(range(100))
    assert sorted(del_) == list(range(95, 100))


# ------------------------------------------------------------- copy_into


def _drop(spark, path: str, lo: int, hi: int) -> None:
    spark.range(lo, hi).withColumn("v", F.col("id") * 1.5).coalesce(
        1
    ).write.mode("append").parquet(path)


def test_copy_into_idempotent(spark, tmp_path):
    land = str(tmp_path / "landing")
    _drop(spark, land, 0, 50)
    t = TxnTable(str(tmp_path / "t"), "t")
    r1 = t.copy_into(spark, land)
    assert r1["files_loaded"] >= 1 and r1["files_skipped"] == 0
    # second tick: nothing new
    r2 = t.copy_into(spark, land)
    assert r2["files_loaded"] == 0
    assert t.count_rows() == 50
    # new files land; only they load
    _drop(spark, land, 50, 80)
    r3 = t.copy_into(spark, land)
    assert r3["files_loaded"] >= 1 and r3["files_skipped"] >= 1
    assert sorted(x.id for x in t.read(spark).collect()) == list(range(80))
    # force reloads everything
    r4 = t.copy_into(spark, land, force=True)
    assert r4["files_loaded"] >= 2
    assert t.count_rows() > 80


def test_copy_into_hardlinks_and_stats(spark, tmp_path):
    land = str(tmp_path / "landing")
    _drop(spark, land, 0, 100)
    t = TxnTable(str(tmp_path / "t"), "t")
    t.copy_into(spark, land)
    for f in t.live_files():
        assert os.stat(os.path.join(t.data_dir, f)).st_nlink >= 2
    # footer stats landed: pruning works immediately
    assert t.count_rows() == 100
    c = t._read_commit(t.version())
    assert c["action"] == "copy" and c["copy_sources"]


def test_copy_into_enforces_constraints(spark, tmp_path):
    land = str(tmp_path / "landing")
    _drop(spark, land, 0, 10)
    t = TxnTable(str(tmp_path / "t"), "t")
    t.copy_into(spark, land)
    t.add_constraint(spark, "small", "id < 100")
    _drop(spark, land, 200, 210)  # violates
    before = t.version()
    with pytest.raises(CheckError):
        t.copy_into(spark, land)
    assert t.version() == before
    # staged files were cleaned up: live set still readable + consistent
    assert t.count_rows() == 10


def test_copy_into_refuses_generated(spark, tmp_path):
    # partitioned targets are supported as of round 10 (value-pure
    # re-staging; tests/test_txn_hive_partitioned.py); generated /
    # identity columns still refuse
    land = str(tmp_path / "landing")
    _drop(spark, land, 0, 10)
    tg = TxnTable(
        str(tmp_path / "tg"), "tg", generated_cols={"v2": "v * 2"}
    )
    with pytest.raises(ValueError, match="generated"):
        tg.copy_into(spark, land)


def test_copy_into_ledger_survives_clone(spark, tmp_path):
    land = str(tmp_path / "landing")
    _drop(spark, land, 0, 30)
    t = TxnTable(str(tmp_path / "t"), "t")
    t.copy_into(spark, land)
    c = t.clone(str(tmp_path / "c"), "tc")
    # re-pointing the scheduled COPY INTO at the clone re-ingests nothing
    assert c.copy_into(spark, land)["files_loaded"] == 0
    _drop(spark, land, 30, 40)
    assert c.copy_into(spark, land)["files_loaded"] >= 1
    assert c.count_rows() == 40


def test_copy_into_ledger_survives_branch_merge(spark, tmp_path):
    land = str(tmp_path / "landing")
    _drop(spark, land, 0, 30)
    t = TxnTable(str(tmp_path / "t"), "t")
    t.append(spark.range(-5, 0).withColumn("v", F.lit(0.0)).coalesce(1))
    b = t.branch("ingest")
    assert b.copy_into(spark, land)["files_loaded"] >= 1
    t.merge_branch(b)
    assert sorted(x.id for x in t.read(spark).collect()) == list(range(-5, 30))
    # the merged-in ledger blocks a parent-side re-ingest
    assert t.copy_into(spark, land)["files_loaded"] == 0
