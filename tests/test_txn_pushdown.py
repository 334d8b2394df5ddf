"""Filter pushdown through ``format("txn")`` (Spark 4.1
``DataSourceReader.pushFilters``): equality / range / IN predicates
prune the connector's planned file set from commit-log metadata
(partitionValues, footer min/max, stage-time blooms) — data skipping
for ANY Spark job that only knows ``spark.read.format("txn")``. All
filters are returned to Spark (exact predicates re-applied), so
pruning can only shrink the scan, never change an answer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan, In, LessThanOrEqual, StringContains
from pyspark.sql.types import StructType

from spark_data_engineering_spark.sources.txn import TxnTable
from spark_data_engineering_spark.sources.txn_datasource import (
    TxnBatchReader,
    TxnDataSource,
)


@pytest.fixture(autouse=True)
def _register(spark):
    spark.dataSource.register(TxnDataSource)


def _mk(spark, tmp_path, partition=True):
    t = TxnTable(
        str(tmp_path),
        "t",
        partition_cols=("cat",) if partition else (),
        bloom_cols=("id",) if not partition else (),
    )
    rows = [(i, "abc"[i % 3], float(i)) for i in range(30)]
    t.append(
        spark.createDataFrame(rows, "id bigint, cat string, v double").repartition(3)
    )
    return t


def _reader(t, spark):
    schema = StructType.fromDDL(
        "id bigint, cat string, v double"
    )
    return TxnBatchReader(t.table_dir, schema)


def test_equality_prunes_to_partition(spark, tmp_path):
    t = _mk(spark, tmp_path)
    r = _reader(t, spark)
    flt = [EqualTo(("cat",), "a")]
    returned = list(r.pushFilters(flt))
    assert returned == flt  # every filter handed back for exact re-apply
    parts = r.partitions()
    stats = t.file_stats()
    expect = {n for n, c in stats.items() if c["partitionValues"]["cat"] == "a"}
    assert len(parts) == len(expect) > 0
    assert len(parts) < len(stats)


def test_range_prunes_by_minmax(spark, tmp_path):
    # range-clustered files => tight disjoint [min,max] id boxes
    t = TxnTable(str(tmp_path), "t")
    rows = [(i, "abc"[i % 3], float(i)) for i in range(30)]
    t.append(
        spark.createDataFrame(
            rows, "id bigint, cat string, v double"
        ).repartitionByRange(3, "id")
    )
    r = _reader(t, spark)
    list(r.pushFilters([GreaterThan(("id",), 27), LessThanOrEqual(("id",), 29)]))
    parts = r.partitions()
    assert 0 < len(parts) < len(t.live_files())


def test_in_prunes_union_of_members(spark, tmp_path):
    t = _mk(spark, tmp_path)
    r = _reader(t, spark)
    list(r.pushFilters([In(("cat",), ("a", "c"))]))
    parts = r.partitions()
    stats = t.file_stats()
    expect = {
        n for n, c in stats.items() if c["partitionValues"]["cat"] in ("a", "c")
    }
    assert len(parts) == len(expect) > 0
    assert len(parts) < len(stats)


def test_unsupported_filters_ignored_and_returned(spark, tmp_path):
    t = _mk(spark, tmp_path)
    r = _reader(t, spark)
    flt = [StringContains(("cat",), "a")]
    assert list(r.pushFilters(flt)) == flt
    assert len(r.partitions()) == len(t.live_files())  # nothing pruned


def test_end_to_end_results_identical_with_filters(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.delete_where_dv(spark, F.col("id") == 3)  # DV must still apply
    df = spark.read.format("txn").load(t.table_dir)
    got = sorted(
        r.id for r in df.filter(F.col("cat") == "a").collect()
    )
    expect = sorted(i for i in range(30) if "abc"[i % 3] == "a" and i != 3)
    assert got == expect
    # range + equality conjunction through real SQL planning
    got2 = sorted(
        r.id
        for r in df.filter((F.col("cat") == "b") & (F.col("id") > 20)).collect()
    )
    assert got2 == [i for i in range(21, 30) if "abc"[i % 3] == "b"]


def test_pruned_to_nothing_returns_empty(spark, tmp_path):
    t = _mk(spark, tmp_path)
    df = spark.read.format("txn").load(t.table_dir)
    assert df.filter(F.col("cat") == "zzz").count() == 0


def test_conf_off_crashes_then_register_txn_fixes(spark, tmp_path):
    """The r8 driver bug: Spark 4.1 refuses a pushFilters reader when
    spark.sql.python.filterPushdown.enabled is false (the default on
    sessions this library didn't build). register_txn must make the
    same read work by enabling the runtime conf at registration."""
    from spark_data_engineering_spark.sources.txn_datasource import register_txn

    t = _mk(spark, tmp_path)
    conf = "spark.sql.python.filterPushdown.enabled"
    prev = spark.conf.get(conf)
    try:
        spark.conf.set(conf, "false")
        with pytest.raises(Exception, match="PUSHDOWN_DISABLED|pushFilters|filterPushdown"):
            spark.read.format("txn").load(t.table_dir).collect()
        register_txn(spark)
        assert spark.conf.get(conf) == "true"
        got = sorted(r.id for r in spark.read.format("txn").load(t.table_dir).collect())
        assert got == list(range(30))
    finally:
        spark.conf.set(conf, prev)


def test_pushdown_false_option_degrades_gracefully(spark, tmp_path):
    """.option('pushdown','false') returns a reader WITHOUT pushFilters
    (identity-reset to the base class), so reads plan even under
    conf=false — no pruning, identical answers."""
    from pyspark.sql.datasource import DataSourceReader

    from spark_data_engineering_spark.sources.txn_datasource import (
        _TxnBatchReaderNoPushdown,
    )

    assert (
        _TxnBatchReaderNoPushdown.pushFilters is DataSourceReader.pushFilters
    )  # the exact identity Spark's planning worker checks
    t = _mk(spark, tmp_path)
    conf = "spark.sql.python.filterPushdown.enabled"
    prev = spark.conf.get(conf)
    try:
        spark.conf.set(conf, "false")
        df = (
            spark.read.format("txn")
            .option("pushdown", "false")
            .load(t.table_dir)
        )
        got = sorted(r.id for r in df.filter(F.col("cat") == "a").collect())
        assert got == [i for i in range(30) if "abc"[i % 3] == "a"]
    finally:
        spark.conf.set(conf, prev)
