"""As-of join: window strategy vs pandas merge_asof strategy must agree."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from spark_data_engineering_spark.operators.asof import asof_join
from spark_data_engineering_spark.sources import load_table


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _inline(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T10:00:00")),
            (2, 10, _ts("2024-01-01T11:00:00")),
            (3, 20, _ts("2024-01-01T09:00:00")),  # no prior right row
        ],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T09:30:00"), 1.0),
            (10, _ts("2024-01-01T10:30:00"), 2.0),
            (10, _ts("2024-01-01T11:00:00"), 3.0),  # ties left row 2 exactly
            (20, _ts("2024-01-01T09:30:00"), 4.0),  # after left row 3
        ],
        ["user_id", "ts", "value"],
    )
    return left, right


def test_asof_window_semantics(spark):
    left, right = _inline(spark)
    out = {
        r.event_id: (r.ts_r, r.value_r)
        for r in asof_join(left, right, on="ts", by="user_id", right_value_cols=("value",), suffix="_r").collect()
    }
    assert out[1] == (_ts("2024-01-01T09:30:00"), 1.0)  # latest <= 10:00
    assert out[2] == (_ts("2024-01-01T11:00:00"), 3.0)  # equal ts matches (>=)
    assert out[3] == (None, None)  # left row with no prior right


def test_asof_strategies_agree_inline(spark):
    left, right = _inline(spark)
    kw = dict(on="ts", by="user_id", right_value_cols=("value",), suffix="_r")
    a = {(r.event_id, r.ts_r, r.value_r) for r in asof_join(left, right, strategy="window", **kw).collect()}
    b = {(r.event_id, r.ts_r, r.value_r) for r in asof_join(left, right, strategy="pandas", **kw).collect()}
    assert a == b


def test_asof_strategies_agree_on_events(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    kw = dict(on="ts", by="user_id", suffix="_c")
    a = {(r.event_id, r.ts_c) for r in asof_join(purchases, clicks, strategy="window", **kw).collect()}
    b = {(r.event_id, r.ts_c) for r in asof_join(purchases, clicks, strategy="pandas", **kw).collect()}
    assert a == b
    assert len(a) == purchases.count()
