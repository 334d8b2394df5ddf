"""IncrementalSCD2: per-key partial recompute equals full rebuild,
exactly-once watermark, untouched keys stable."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from spark_data_engineering_spark.pipeline.scd2_incremental import IncrementalSCD2
from spark_data_engineering_spark.queries.scd2 import build_scd2_tiers
from spark_data_engineering_spark.sources.txn import TxnTable


def _orders(spark, rows):
    data = [
        (ok, ck, dt.datetime(2024, 1, d), float(p)) for ok, ck, d, p in rows
    ]
    return spark.createDataFrame(
        data, "o_orderkey bigint, o_custkey bigint, o_orderdate timestamp, o_totalprice double"
    )


def _dim_rows(view, spark):
    return {
        (r.custkey, r.tier, r.valid_from, r.valid_to, r.version)
        for r in view.read(spark).collect()
    }


def _mk(tmp_path):
    root = str(tmp_path / "scd2")
    base = TxnTable(root, "base")
    view = IncrementalSCD2(
        base, TxnTable(root, "dim"), build=build_scd2_tiers,
        key="custkey", base_key="o_custkey",
    )
    return base, view


def test_incremental_equals_full_rebuild(spark, tmp_path):
    base, view = _mk(tmp_path)
    b1 = [(1, 1, 1, 600_000), (2, 1, 5, 600_000), (3, 2, 2, 2_500_000)]
    b2 = [(4, 1, 9, 1_000_000), (5, 3, 3, 100_000)]
    base.append(_orders(spark, b1))
    view.refresh(spark)
    base.append(_orders(spark, b2))
    view.refresh(spark)
    got = _dim_rows(view, spark)
    want = {
        (r.custkey, r.tier, r.valid_from, r.valid_to, r.version)
        for r in build_scd2_tiers(_orders(spark, b1 + b2)).collect()
    }
    assert got == want
    # customer 1 crossed bronze -> silver -> gold across the two batches
    assert {t for c, t, *_ in got if c == 1} == {"bronze", "silver", "gold"}


def test_delete_rewrites_touched_history_only(spark, tmp_path):
    base, view = _mk(tmp_path)
    rows = [
        (1, 1, 1, 900_000), (2, 1, 5, 900_000),      # cust 1: bronze->silver
        (3, 2, 2, 1_500_000), (4, 2, 8, 1_500_000),  # cust 2: silver->gold
    ]
    base.append(_orders(spark, rows))
    view.refresh(spark)
    before = _dim_rows(view, spark)
    base.delete_where(spark, F.col("o_orderkey") == 2)  # only cust 1 touched
    view.refresh(spark)
    after = _dim_rows(view, spark)
    # untouched customer's eras identical
    assert {r for r in before if r[0] == 2} == {r for r in after if r[0] == 2}
    # touched customer's history rewritten: stays bronze forever now
    assert {t for c, t, *_ in after if c == 1} == {"bronze"}
    want = {
        (r.custkey, r.tier, r.valid_from, r.valid_to, r.version)
        for r in build_scd2_tiers(
            _orders(spark, [r for r in rows if r[0] != 2])
        ).collect()
    }
    assert after == want


def test_replayed_refresh_is_noop(spark, tmp_path):
    base, view = _mk(tmp_path)
    base.append(_orders(spark, [(1, 1, 1, 500_000)]))
    assert view.refresh(spark) == 1
    v = view.dim.version()
    assert view.refresh(spark) is None  # already current
    assert view.dim.version() == v  # no extra commit
    assert view.last_refreshed_version() == 1


def test_refresh_on_empty_base_is_noop(spark, tmp_path):
    base, view = _mk(tmp_path)
    assert view.refresh(spark) is None


def test_full_purge_empties_dimension(spark, tmp_path):
    base, view = _mk(tmp_path)
    base.append(_orders(spark, [(1, 1, 1, 500_000), (2, 2, 2, 700_000)]))
    view.refresh(spark)
    assert view.read(spark).count() == 2
    base.delete_where(spark, F.lit(True))  # GDPR-style full purge
    assert view.refresh(spark) is not None
    assert view.read(spark).count() == 0
    # and the loop keeps working afterwards
    base.append(_orders(spark, [(3, 3, 3, 100_000)]))
    view.refresh(spark)
    assert {r.custkey for r in view.read(spark).collect()} == {3}


def test_compact_only_range_skips_rewrite(spark, tmp_path):
    base, view = _mk(tmp_path)
    base.append(_orders(spark, [(1, 1, 1, 500_000)]))
    base.append(_orders(spark, [(2, 2, 2, 700_000)]))
    view.refresh(spark)
    v = view.dim.version()
    base.compact(spark)
    assert view.refresh(spark) is None  # logical no-op: no dim commit
    assert view.dim.version() == v
