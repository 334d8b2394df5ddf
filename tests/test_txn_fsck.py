"""FSCK detection: the commit log's promises vs the bytes on disk.

fsck() must be green on every healthy table the library itself
produces (appends, DV deletes, compaction, converted/hardlinked
files), and must detect each corruption class: a live file deleted
behind the log's back, a DV sidecar removed while still referenced,
and a live file replaced in-place with different contents (deep row
drift). Degradations (stats/partition gaps) are reported but never
flip ok.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable


def _mk(spark, tmp_path, **kw):
    t = TxnTable(str(tmp_path / "t"), "t", **kw)
    df = spark.range(400).withColumn("x", (F.col("id") * 3 % 50).cast("long"))
    t.append(df.repartition(3))
    t.append(df.withColumn("id", F.col("id") + 400).repartition(2))
    return t


def test_healthy_table_is_ok_shallow_and_deep(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.delete_where_dv(spark, F.col("x") < 5)
    t.compact(spark)  # post-compact: fresh files, DVs materialized
    t.delete_where_dv(spark, F.col("x") > 45)  # outstanding sidecar
    for deep in (False, True):
        rep = t.fsck(deep=deep)
        assert rep["ok"], rep
        assert rep["files_checked"] == len(t.live_files())
        assert rep["missing_files"] == [] and rep["missing_dv"] == []
        assert rep["stats_gaps"] == [] and rep["partition_gaps"] == []


def test_detects_missing_live_file(spark, tmp_path):
    t = _mk(spark, tmp_path)
    victim = t.live_files()[0]
    os.unlink(os.path.join(t.data_dir, victim))
    rep = t.fsck()
    assert not rep["ok"]
    assert rep["missing_files"] == [victim]


def test_detects_missing_dv_sidecar(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.delete_where_dv(spark, F.col("x") == 7)
    sidecars, _ = t.dv_state()
    assert sidecars
    import shutil

    shutil.rmtree(os.path.join(t.dv_dir, sidecars[0]))
    rep = t.fsck()
    assert not rep["ok"]
    assert rep["missing_dv"] == [sidecars[0]]


def test_deep_detects_inplace_replacement(spark, tmp_path):
    t = _mk(spark, tmp_path)
    victim = t.live_files()[0]
    path = os.path.join(t.data_dir, victim)
    # replace the file in-place with a different-rowcount parquet
    spark.range(3).toPandas().to_parquet(path)
    assert t.fsck()["ok"]  # shallow can't see it: the file exists
    rep = t.fsck(deep=True)
    assert not rep["ok"]
    assert [d["file"] for d in rep["row_drift"]] == [victim]
    assert rep["row_drift"][0]["actual"] == 3


def test_partitioned_and_empty_tables(spark, tmp_path):
    t = TxnTable(str(tmp_path / "p"), "p", partition_cols=("s",))
    rep = t.fsck(deep=True)
    assert rep["ok"] and rep["files_checked"] == 0 and rep["version"] == 0
    df = spark.range(100).withColumn(
        "s", F.when(F.col("id") % 2 == 0, "a").otherwise("b")
    )
    t.append(df)
    rep = t.fsck(deep=True)
    assert rep["ok"] and rep["partition_gaps"] == []
