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


def test_multi_table_snapshot_isolation(spark, tmp_path):
    """A pinned snapshot keeps cross-table reads consistent while later
    batches land: joins over the pin see one coherent batch."""
    from spark_data_engineering_spark.sources.txn import TxnStore

    store = TxnStore(str(tmp_path / "store"))
    import datetime as dt

    ts1, ts2 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)
    orders = spark.createDataFrame([(1, 10.0), (2, 20.0)], "ok bigint, amt double")
    cust = spark.createDataFrame([(1, "a"), (2, "b")], "ok bigint, seg string")
    store.write("orders", orders, ts1)
    store.write("cust", cust, ts1)
    pin = store.snapshot(["orders", "cust"])
    # a later batch rewrites both tables
    store.write("orders", spark.createDataFrame([(9, 99.0)], "ok bigint, amt double"), ts2)
    store.write("cust", spark.createDataFrame([(9, "z")], "ok bigint, seg string"), ts2)
    o = store.read_at(spark, pin, "orders")
    c = store.read_at(spark, pin, "cust")
    joined = {(r.ok, r.amt, r.seg) for r in o.join(c, "ok").collect()}
    assert joined == {(1, 10.0, "a"), (2, 20.0, "b")}  # batch-1 only, both sides
    # unpinned reads see batch 2
    assert {r.ok for r in store.read_latest(spark, "orders").collect()} == {9}
