"""REORG TABLE APPLY (PURGE): rewrite only files carrying soft-deleted
state (outstanding DV rows / dropped-or-renamed physical columns);
clean files stay byte-identical, and a second purge is a version-free
no-op."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable


def _two_file_table(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"), "t")
    t.append(
        spark.createDataFrame([(i, i * 2) for i in range(100)], "val int, x int")
        .coalesce(1)
    )
    t.append(
        spark.createDataFrame(
            [(i, i * 2) for i in range(100, 200)], "val int, x int"
        ).coalesce(1)
    )
    return t


def test_purge_rewrites_only_dv_files(spark, tmp_path):
    t = _two_file_table(spark, tmp_path)
    before = set(t.live_files())
    assert len(before) == 2
    t.delete_where_dv(spark, F.col("val") < 10)  # hits file A only
    _, deleted = t.dv_state()
    assert len(deleted) == 1
    (dirty_file,) = deleted
    clean = before - {dirty_file}

    v = t.reorg_purge(spark)
    after = set(t.live_files(v))
    assert clean < after  # the clean file survives untouched
    assert dirty_file not in after
    # the soft-delete is now physical: no outstanding DV rows on live files
    _, deleted2 = t.dv_state()
    assert not (set(deleted2) & after)
    got = sorted(r.val for r in t.read(spark).collect())
    assert got == list(range(10, 200))
    # a second purge finds nothing dirty: version-free no-op
    assert t.reorg_purge(spark) == v


def test_purge_materializes_rename_and_drop(spark, tmp_path):
    t = _two_file_table(spark, tmp_path)
    t.rename_column(spark, "val", "v2")
    t.drop_column(spark, "x")
    v = t.reorg_purge(spark)  # every file holds stale physical bytes
    for f in t.live_files(v):
        names = set(pq.ParquetFile(os.path.join(t.data_dir, f)).schema_arrow.names)
        assert "v2" in names and "val" not in names and "x" not in names
    got = sorted(r.v2 for r in t.read(spark).collect())
    assert got == list(range(200))
    assert t.reorg_purge(spark) == v  # clean now


def test_purge_on_clean_table_is_noop(spark, tmp_path):
    t = _two_file_table(spark, tmp_path)
    v0 = t.version()
    assert t.reorg_purge(spark) == v0
    assert set(t.live_files()) == set(t.live_files(v0))


def test_purge_on_partitioned_table_keeps_value_purity(spark, tmp_path):
    t = TxnTable(str(tmp_path / "p"), "p", partition_cols=("s",))
    df = spark.range(200).withColumn(
        "s", F.when(F.col("id") % 2 == 0, "a").otherwise("b")
    )
    t.append(df.repartition(2))
    t.delete_where_dv(spark, (F.col("s") == "a") & (F.col("id") < 20))
    v = t.reorg_purge(spark)
    stats = t.file_stats(v)
    for f in t.live_files(v):
        pv = (stats.get(f) or {}).get("partitionValues") or {}
        assert pv.get("s") in ("a", "b")
    assert t.read(spark).count() == 190
