"""CatalogStore: pipeline layers as metastore-registered partitioned
tables — named SQL access, metadata-only latest-batch lookup, partition
time travel, idempotent batch replacement, cross-session visibility."""

from __future__ import annotations

import datetime as dt
import uuid

import pytest
from pyspark.sql import functions as F

from spark_data_engineering_spark.pipeline import build_registry
from spark_data_engineering_spark.plans import Runner
from spark_data_engineering_spark.sources.catalog import CatalogStore
from spark_data_engineering_spark.sources.snapshot import SnapshotStore


@pytest.fixture()
def store(spark):
    s = CatalogStore(spark, database=f"t{uuid.uuid4().hex[:10]}")
    yield s
    for t in spark.catalog.listTables(s.database):
        s.drop(t.name)
    spark.sql(f"DROP DATABASE IF EXISTS {s.database}")


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def test_batches_and_latest(spark, store):
    store.write("t", _df(spark, [(1, "a")]), dt.datetime(2024, 1, 1, 12))
    store.write("t", _df(spark, [(2, "b"), (3, "c")]), dt.datetime(2024, 1, 2, 12))
    assert len(store.batches("t")) == 2
    assert store.read_latest(spark, "t").select("k").rdd.map(tuple).collect() != []
    got = {r.k for r in store.read_latest(spark, "t").collect()}
    assert got == {2, 3}
    first = store.batches("t")[0]
    assert {r.k for r in store.read_batch(spark, "t", first).collect()} == {1}


def test_rewrite_same_batch_replaces_partition(spark, store):
    ts = dt.datetime(2024, 1, 1, 12)
    store.write("t", _df(spark, [(1, "a"), (2, "b")]), ts)
    store.write("t", _df(spark, [(9, "z")]), ts)  # re-run of the same batch
    assert len(store.batches("t")) == 1
    assert {r.k for r in store.read_latest(spark, "t").collect()} == {9}


def test_sql_by_name_and_cross_session_visibility(spark, store):
    store.write("t", _df(spark, [(1, "a")]), dt.datetime(2024, 1, 1, 12))
    # named SQL access in this session
    n = spark.sql(f"SELECT COUNT(*) AS n FROM {store.database}.t").first().n
    assert n == 1
    # a NEW session object shares the catalog (metastore-backed metadata
    # outlives the session; temp views would not)
    other = spark.newSession()
    assert other.sql(f"SELECT COUNT(*) AS n FROM {store.database}.t").first().n == 1


def test_pipeline_same_results_on_catalog_backend(spark, sf_dir, tmp_path, store):
    def _run(s):
        reg = build_registry(spark, sf_dir)
        reg.node("daily_order_report").materialize = True
        return Runner(spark, reg, store=s, batch_ts=dt.datetime(2024, 1, 1, 12)).run(
            "daily_order_report"
        )

    snap = _run(SnapshotStore(str(tmp_path / "snap")))
    cat = _run(store)
    a = {tuple(r) for r in snap.drop("etl_inserted").collect()}
    b = {tuple(r) for r in cat.drop("etl_inserted").collect()}
    assert a == b, "report differs between storage backends"
    # and the report is addressable by NAME for any SQL consumer
    assert (
        spark.table(f"{store.database}.daily_order_report").count() == len(a)
    )


def test_read_latest_prunes_partitions(spark, store):
    """The latest-batch read must plan as a partition-pruned scan (the
    metastore filter reaches PartitionFilters), never a full-table scan
    filtered afterwards."""
    import datetime as dt

    store.write("t", _df(spark, [(1, "a")]), dt.datetime(2024, 1, 1, 12))
    store.write("t", _df(spark, [(2, "b")]), dt.datetime(2024, 1, 2, 12))
    df = store.read_latest(spark, "t")
    scan = df._jdf.queryExecution().toString()
    assert "PartitionFilters" in scan and "etl_inserted" in scan
    assert df.count() == 1
