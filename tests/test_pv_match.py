"""Partition-value matching must agree with Spark's cast-to-string.

Recorded ``partitionValues`` are Spark renderings (hive staging dir
names): bool -> 'true'/'false', double -> '1.0E20', date ISO. Python's
``str()`` disagrees (``'True'``, ``'1e+20'``), so query-side equality
is decided in the value domain (``txn._pv_match``) — the r8 ADVICE
high: the old ``str(val)`` compare silently pruned EVERY file of a
boolean partition, returning empty results through ``prune_eq`` and
the connector's pushFilters, and made ``replace_where`` replace
nothing (then refuse its own staged files as leaks)."""

from __future__ import annotations

import datetime
import decimal

import pytest
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable, _pv_match


def test_pv_match_value_domain():
    assert _pv_match(True, "true") and _pv_match(False, "false")
    assert not _pv_match(True, "false")
    assert not _pv_match(True, "True")  # only Spark's rendering is recorded
    assert _pv_match(1e20, "1.0E20")  # Spark double rendering round-trips
    assert _pv_match(0.1, "0.1") and not _pv_match(0.1, "0.2")
    assert _pv_match(7, "7") and not _pv_match(7, "8")
    assert _pv_match("a", "a") and not _pv_match("a", "b")
    assert _pv_match(datetime.date(2024, 1, 5), "2024-01-05")
    assert _pv_match(
        datetime.datetime(2024, 1, 5, 12, 30), "2024-01-05 12:30:00"
    )
    assert _pv_match(decimal.Decimal("1E+2"), "100")
    assert _pv_match(None, None) and not _pv_match(None, "x")
    assert not _pv_match(True, None)
    assert not _pv_match(5, "not-a-number")  # unparseable: no match


@pytest.fixture()
def bool_table(spark, tmp_path):
    t = TxnTable(str(tmp_path), "b", partition_cols=("flag",))
    rows = [(i, i % 3 == 0, float(i)) for i in range(12)]
    t.append(
        spark.createDataFrame(rows, "id bigint, flag boolean, v double")
        .repartition(2)
    )
    return t


def test_bool_partition_prunes_and_reads(spark, bool_table):
    t = bool_table
    stats = t.file_stats()
    true_files = {
        n for n, c in stats.items() if c["partitionValues"]["flag"] == "true"
    }
    assert 0 < len(true_files) < len(stats)
    assert set(t.prune_files(None, equals={"flag": True})) == true_files
    got = sorted(
        r.id for r in t.read(spark, prune_eq={"flag": True}).collect()
    )
    assert got == [i for i in range(12) if i % 3 == 0]


def test_bool_partition_through_connector_pushdown(spark, bool_table):
    from spark_data_engineering_spark.sources.txn_datasource import register_txn

    register_txn(spark)
    df = spark.read.format("txn").load(bool_table.table_dir)
    got = sorted(r.id for r in df.filter(F.col("flag")).collect())
    assert got == [i for i in range(12) if i % 3 == 0]
    got2 = sorted(r.id for r in df.filter(~F.col("flag")).collect())
    assert got2 == [i for i in range(12) if i % 3 != 0]


def test_replace_where_bool_partition(spark, bool_table):
    t = bool_table
    new = spark.createDataFrame(
        [(100, True, 1.0), (101, True, 2.0)],
        "id bigint, flag boolean, v double",
    ).coalesce(1)
    t.overwrite(new, replace_where={"flag": True})
    got = sorted(r.id for r in t.read(spark).collect())
    assert got == [i for i in range(12) if i % 3 != 0] + [100, 101]


def test_double_partition_noncanonical_float(spark, tmp_path):
    t = TxnTable(str(tmp_path), "d", partition_cols=("bucket",))
    rows = [(i, 1e20 if i < 4 else 2.5) for i in range(8)]
    t.append(
        spark.createDataFrame(rows, "id bigint, bucket double").repartition(2)
    )
    pv = {c["partitionValues"]["bucket"] for c in t.file_stats().values()}
    assert "1.0E20" in pv  # Spark's rendering, NOT Python's '1e+20'
    got = sorted(r.id for r in t.read(spark, prune_eq={"bucket": 1e20}).collect())
    assert got == [0, 1, 2, 3]
    got2 = sorted(r.id for r in t.read(spark, prune_eq={"bucket": 2.5}).collect())
    assert got2 == [4, 5, 6, 7]


def test_date_partition(spark, tmp_path):
    t = TxnTable(str(tmp_path), "dt", partition_cols=("d",))
    rows = [(i, datetime.date(2024, 1, 1 + i % 2)) for i in range(6)]
    t.append(spark.createDataFrame(rows, "id bigint, d date").repartition(2))
    got = sorted(
        r.id
        for r in t.read(
            spark, prune_eq={"d": datetime.date(2024, 1, 2)}
        ).collect()
    )
    assert got == [1, 3, 5]
