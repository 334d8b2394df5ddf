"""Medallion pipeline on the transaction-log backend (TxnStore): same
results as the snapshot backend, plus commit history and time travel."""

from __future__ import annotations

import datetime as dt

from spark_data_engineering_spark.pipeline import build_registry
from spark_data_engineering_spark.plans import Runner
from spark_data_engineering_spark.sources.snapshot import SnapshotStore
from spark_data_engineering_spark.sources.txn import TxnStore


def _run(spark, sf_dir, store):
    reg = build_registry(spark, sf_dir)
    reg.node("daily_order_report").materialize = True
    runner = Runner(spark, reg, store=store, batch_ts=dt.datetime(2024, 1, 1, 12))
    return runner.run("daily_order_report")


def test_pipeline_same_results_on_txn_backend(spark, sf_dir, tmp_path):
    snap = _run(spark, sf_dir, SnapshotStore(str(tmp_path / "snap")))
    txn_store = TxnStore(str(tmp_path / "txn"))
    txn = _run(spark, sf_dir, txn_store)
    a = {tuple(r) for r in snap.drop("etl_inserted").collect()}
    b = {tuple(r) for r in txn.drop("etl_inserted").collect()}
    assert a == b, "report differs between storage backends"
    # the materialized layer committed exactly once, atomically
    hist = txn_store.history("daily_order_report")
    assert [c["action"] for c in hist] == ["overwrite"]


def test_txn_backend_time_travel_across_batches(spark, sf_dir, tmp_path):
    store = TxnStore(str(tmp_path))

    def run_at(ts):
        reg = build_registry(spark, sf_dir)
        reg.node("daily_order_report").materialize = True
        return Runner(spark, reg, store=store, batch_ts=ts).run("daily_order_report")

    first = run_at(dt.datetime(2024, 1, 1, 12)).count()
    v1 = store._table("daily_order_report").version()
    run_at(dt.datetime(2024, 1, 2, 12))
    latest = store.read_latest(spark, "daily_order_report")
    assert latest.select("etl_inserted").distinct().count() == 1
    assert latest.select("etl_inserted").first()[0].startswith("20240102")
    # the first batch's snapshot is still readable at its version
    old = store.read_version(spark, "daily_order_report", v1)
    assert old.count() == first
    assert old.select("etl_inserted").first()[0].startswith("20240101")
