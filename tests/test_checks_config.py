"""Round-trip: a JSON-declared check suite gates a snapshot write — the
reference's edit-a-config-file validation workflow (GE suite JSON loaded
at runtime, reference etl/utils/base_table.py:140-196) on this repo's
single-pass runner."""

from __future__ import annotations

import json

import pytest

from spark_data_engineering_spark import checks as C
from spark_data_engineering_spark.checks_config import (
    SuiteConfigError,
    load_suite,
    validate_with_suite,
)
from spark_data_engineering_spark.sources.snapshot import SnapshotStore

SUITE = {
    "table": "daily_metrics",
    "checks": [
        {"type": "unique", "columns": ["day"]},
        {"type": "not_null", "columns": ["day", "revenue"]},
        {"type": "bounds", "column": "revenue", "lo": 0, "hi": 100000, "strict": True},
        {"type": "row_count_min", "n": 1},
        {"type": "accepted_values", "column": "status", "values": ["ok", "late"]},
    ],
}


def _good(spark):
    return spark.createDataFrame(
        [("2024-01-01", 10.0, "ok"), ("2024-01-02", 20.0, "late")],
        "day string, revenue double, status string",
    )


def test_suite_roundtrip_file(spark, tmp_path):
    path = tmp_path / "daily_metrics.json"
    path.write_text(json.dumps(SUITE))
    suite = load_suite(path)
    assert len(suite) == len(SUITE["checks"])
    assert C.run_checks(_good(spark), suite) == []


def test_suite_gates_snapshot_write(spark, tmp_path):
    """The config-declared suite must block the bad write and admit the
    good one — end to end through the snapshot store."""
    import datetime as dt

    store = SnapshotStore(str(tmp_path / "store"))
    path = tmp_path / "daily_metrics.json"
    path.write_text(json.dumps(SUITE))

    bad = spark.createDataFrame(
        [("2024-01-01", 10.0, "ok"), ("2024-01-01", -5.0, "bogus")],
        "day string, revenue double, status string",
    )
    with pytest.raises(C.CheckError) as err:
        validate_with_suite(bad, path)
        store.write("daily_metrics", bad, dt.datetime(2024, 1, 2))
    assert "duplicate" in str(err.value) or "outside accepted" in str(err.value)
    assert not (tmp_path / "store" / "daily_metrics").exists()

    good = _good(spark)
    validate_with_suite(good, path)
    store.write("daily_metrics", good, dt.datetime(2024, 1, 2))
    assert store.read_latest(spark, "daily_metrics").count() == 2


def test_suite_foreign_key_resolves_lazily(spark, sf_dir):
    from spark_data_engineering_spark.sources import load_table

    suite = {
        "checks": [
            {
                "type": "foreign_key",
                "column": "o_custkey",
                "ref_table": "customer",
                "ref_column": "c_custkey",
            }
        ]
    }
    orders = load_table(spark, "orders", sf_dir)
    resolve = lambda name: load_table(spark, name, sf_dir)
    assert C.run_checks(orders, load_suite(suite, resolve)) == []
    orphan = orders.limit(1).withColumn(
        "o_custkey", orders.o_custkey * 0 - 999_999
    )
    assert C.run_checks(orphan, load_suite(suite, resolve)) != []


def test_suite_fails_fast_on_bad_config():
    with pytest.raises(SuiteConfigError, match="unknown check type"):
        load_suite({"checks": [{"type": "no_such_check"}]})
    with pytest.raises(SuiteConfigError, match="missing field"):
        load_suite({"checks": [{"type": "bounds"}]})
    with pytest.raises(SuiteConfigError, match="non-empty"):
        load_suite({"checks": []})
    with pytest.raises(SuiteConfigError, match="resolve"):
        load_suite(
            {"checks": [{"type": "foreign_key", "column": "x", "ref_table": "t", "ref_column": "y"}]}
        )
