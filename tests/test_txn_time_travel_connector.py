"""Time travel through the connector (round 8):
``spark.read.format("txn").option("versionAsOf", N)`` — Delta's batch
option. The reader pins file set, DV snapshot, pruning stats, AND the
logical schema at N (a later rename must not leak into the past)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable
from spark_data_engineering_spark.sources.txn_datasource import TxnDataSource


@pytest.fixture(autouse=True)
def _register(spark):
    spark.dataSource.register(TxnDataSource)


def test_version_as_of_reads_past_snapshot(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.createDataFrame([(1, 10.0), (2, 20.0)], "id bigint, v double"))
    v1 = t.version()
    t.append(spark.createDataFrame([(3, 30.0)], "id bigint, v double"))
    t.delete_where(spark, F.col("id") == 1)
    old = spark.read.format("txn").option("versionAsOf", str(v1)).load(t.table_dir)
    assert sorted(r.id for r in old.collect()) == [1, 2]
    now = spark.read.format("txn").load(t.table_dir)
    assert sorted(r.id for r in now.collect()) == [2, 3]


def test_version_as_of_pins_dv_state(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.createDataFrame([(i,) for i in range(6)], "id bigint"))
    v1 = t.version()
    t.delete_where_dv(spark, F.col("id") < 3)
    old = spark.read.format("txn").option("versionAsOf", str(v1)).load(t.table_dir)
    assert sorted(r.id for r in old.collect()) == list(range(6))
    assert sorted(
        r.id for r in spark.read.format("txn").load(t.table_dir).collect()
    ) == [3, 4, 5]


def test_version_as_of_pins_schema_before_rename(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.createDataFrame([(1, 5.0)], "id bigint, v double"))
    v1 = t.version()
    t.rename_column(spark, "v", "val")
    old = spark.read.format("txn").option("versionAsOf", str(v1)).load(t.table_dir)
    assert old.columns == ["id", "v"]
    assert old.collect()[0].v == 5.0
    assert spark.read.format("txn").load(t.table_dir).columns == ["id", "val"]


def test_version_as_of_out_of_range_refused(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.createDataFrame([(1,)], "id bigint"))
    with pytest.raises(Exception, match="out of range"):
        spark.read.format("txn").option("versionAsOf", "99").load(
            t.table_dir
        ).collect()
