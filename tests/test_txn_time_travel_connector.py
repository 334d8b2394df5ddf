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


def _set_commit_ts(t: TxnTable, ts_by_version: dict[int, float]) -> None:
    """Rewrite committed log entries' ``ts`` to controlled values so
    timestamp-resolution tests are deterministic (no sleeps)."""
    import json
    import os

    for v, ts in ts_by_version.items():
        p = os.path.join(t.log_dir, f"{v:020d}.json")
        with open(p) as f:
            rec = json.load(f)
        rec["ts"] = ts
        with open(p, "w") as f:
            json.dump(rec, f)


def test_version_at_timestamp_resolution(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.createDataFrame([(1,)], "id bigint"))
    t.append(spark.createDataFrame([(2,)], "id bigint"))
    t.append(spark.createDataFrame([(3,)], "id bigint"))
    _set_commit_ts(t, {1: 10.0, 2: 20.0, 3: 30.0})
    assert t.version_at_timestamp(10.0) == 1  # inclusive
    assert t.version_at_timestamp(15.0) == 1
    assert t.version_at_timestamp(20.0) == 2
    assert t.version_at_timestamp(30.0) == 3
    with pytest.raises(ValueError, match="before the table's first"):
        t.version_at_timestamp(9.9)
    with pytest.raises(ValueError, match="after the table's latest"):
        t.version_at_timestamp(31.0)


def test_version_at_timestamp_monotonizes_clock_steps(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    for i in range(3):
        t.append(spark.createDataFrame([(i,)], "id bigint"))
    # wall clock stepped BACKWARDS between v2 and v3: running-max
    # monotonization must treat v3 as committed at 20.0, not 5.0
    _set_commit_ts(t, {1: 10.0, 2: 20.0, 3: 5.0})
    assert t.version_at_timestamp(15.0) == 1
    assert t.version_at_timestamp(20.0) == 3


def test_version_at_timestamp_mtime_fallback(spark, tmp_path):
    import json
    import os

    t = TxnTable(str(tmp_path), "t")
    t.append(spark.createDataFrame([(1,)], "id bigint"))
    p = os.path.join(t.log_dir, f"{1:020d}.json")
    with open(p) as f:
        rec = json.load(f)
    del rec["ts"]  # legacy commit predating the ts field
    with open(p, "w") as f:
        json.dump(rec, f)
    os.utime(p, (100.0, 100.0))
    assert t.version_at_timestamp(100.0) == 1


def test_read_at_timestamp_and_connector_option(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.createDataFrame([(1,)], "id bigint"))
    t.append(spark.createDataFrame([(2,)], "id bigint"))
    t.delete_where(spark, F.col("id") == 1)
    _set_commit_ts(t, {1: 10.0, 2: 20.0, 3: 30.0})
    assert sorted(
        r.id for r in t.read(spark, at_timestamp=15.0).collect()
    ) == [1]
    with pytest.raises(ValueError, match="at most one|not both"):
        t.read(spark, at_version=1, at_timestamp=15.0)
    old = (
        spark.read.format("txn")
        .option("timestampAsOf", "20.0")
        .load(t.table_dir)
    )
    assert sorted(r.id for r in old.collect()) == [1, 2]


def test_connector_timestamp_iso_string(spark, tmp_path):
    from datetime import datetime

    t = TxnTable(str(tmp_path), "t")
    t.append(spark.createDataFrame([(1,)], "id bigint"))
    t.append(spark.createDataFrame([(2,)], "id bigint"))
    iso = "2026-01-02 03:04:05"
    epoch = datetime.fromisoformat(iso).timestamp()
    _set_commit_ts(t, {1: epoch - 5.0, 2: epoch + 5.0})
    old = (
        spark.read.format("txn")
        .option("timestampAsOf", iso)
        .load(t.table_dir)
    )
    assert sorted(r.id for r in old.collect()) == [1]
    with pytest.raises(Exception, match="not both"):
        spark.read.format("txn").option("timestampAsOf", iso).option(
            "versionAsOf", "1"
        ).load(t.table_dir).collect()
