"""MERGE source-broadcast size gate (round 10; VERDICT r9 finding #1).

Round 9's ``when_not_matched_by_source`` snapshot-sync merges have a
source that is by definition table-sized, yet every merge join hinted
``F.broadcast`` on the source side — impossible at 100 TB. The gate
(``TxnTable._merge_src_hint``) keeps the broadcast for CDC micro-batches
(streaming/upsert.py's plan) and degrades to plain equi-joins above a
byte threshold, letting AQE pick the physical strategy. All gated joins
are equi-joins, so the answer never changes — pinned here by running the
same merges in both regimes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import (
    TxnTable,
    _est_row_bytes,
    _size_bytes,
)

THRESH = "spark.spark_graft.merge.broadcastThreshold"


def _rows(spark, pairs):
    return spark.createDataFrame(
        [Row(k=k, v=v) for k, v in pairs], "k int, v string"
    )


@pytest.fixture()
def gate_conf(spark):
    """Restore both threshold confs after each test."""
    auto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", auto)
    spark.conf.unset(THRESH)


def test_size_bytes_parses_spark_conf_forms():
    assert _size_bytes("10485760") == 10 * 1024 * 1024
    assert _size_bytes("10485760b") == 10 * 1024 * 1024
    assert _size_bytes("64MB") == 64 * 1024 * 1024
    assert _size_bytes("1g") == 1024**3
    assert _size_bytes("-1") == -1
    assert _size_bytes("garbage") == -1  # unknown form => disabled


def test_est_row_bytes_orders_of_magnitude(spark):
    df = _rows(spark, [(1, "a")])
    w = _est_row_bytes(df.schema)  # int(4) + string(20)
    assert w == 24


def test_hint_is_broadcast_below_threshold(gate_conf):
    spark = gate_conf
    src = _rows(spark, [(1, "a")])
    hint = TxnTable._merge_src_hint(spark, src, n_rows=10)
    assert hint is F.broadcast


def test_hint_is_identity_above_threshold(gate_conf):
    spark = gate_conf
    src = _rows(spark, [(1, "a")])
    spark.conf.set(THRESH, "1")  # 1 byte: any non-empty source is "big"
    hint = TxnTable._merge_src_hint(spark, src, n_rows=10)
    assert hint is not F.broadcast
    out = hint(src)
    assert out is src  # identity, no hint node


def test_hint_respects_session_broadcast_disable(gate_conf):
    spark = gate_conf
    src = _rows(spark, [(1, "a")])
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    hint = TxnTable._merge_src_hint(spark, src, n_rows=1)
    assert hint is not F.broadcast


def test_custom_threshold_overrides_session_threshold(gate_conf):
    spark = gate_conf
    src = _rows(spark, [(1, "a")])
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(THRESH, "1048576")  # merge knob wins over session -1
    hint = TxnTable._merge_src_hint(spark, src, n_rows=10)
    assert hint is F.broadcast


def test_gated_plan_has_no_source_broadcast_exchange(gate_conf, tmp_path):
    """The exact join shape merge builds (target ⋈ source keys), with the
    gate OFF, contains no BroadcastExchange — the plain shuffle join AQE
    would re-plan at scale. With the gate ON, the hint lands."""
    spark = gate_conf
    # disable Spark's own auto-broadcast so only the explicit hint can
    # introduce a BroadcastExchange on this tiny test data
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    t = TxnTable(str(tmp_path), "t")
    t.append(_rows(spark, [(1, "a"), (2, "b")]))
    tgt = t.read(spark)
    src = _rows(spark, [(2, "B"), (3, "C")])

    spark.conf.set(THRESH, "1")  # gate off (source "too big")
    hint = TxnTable._merge_src_hint(spark, src, n_rows=2)
    plan = (
        tgt.join(hint(src.select("k").distinct()), ["k"], "left_semi")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" not in plan

    spark.conf.set(THRESH, "1048576")  # gate on (micro-batch regime)
    hint = TxnTable._merge_src_hint(spark, src, n_rows=2)
    plan = (
        tgt.join(hint(src.select("k").distinct()), ["k"], "left_semi")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan


def _sync_state(spark, tmp_path, sub):
    """Run the snapshot-sync merge (by-source delete + upsert) and
    return the final table state."""
    t = TxnTable(str(tmp_path / sub), "t")
    t.append(_rows(spark, [(1, "a"), (2, "b"), (3, "c")]).coalesce(1))
    t.append(_rows(spark, [(10, "x"), (11, "y")]).coalesce(1))
    src = _rows(spark, [(2, "B"), (4, "D"), (10, "x")])
    t.merge(spark, src, on=["k"], when_not_matched_by_source="delete")
    return {r.k: r.v for r in t.read(spark).collect()}


def test_sync_merge_answer_identical_without_broadcast(gate_conf, tmp_path):
    spark = gate_conf
    spark.conf.set(THRESH, "1048576")
    with_bcast = _sync_state(spark, tmp_path, "bcast")
    spark.conf.set(THRESH, "1")
    without = _sync_state(spark, tmp_path, "plain")
    assert with_bcast == without == {2: "B", 4: "D", 10: "x"}


def test_update_and_cdf_merge_survive_gate_off(gate_conf, tmp_path):
    spark = gate_conf
    spark.conf.set(THRESH, "1")  # every join in the merge un-hinted
    t = TxnTable(str(tmp_path), "t")
    t.append(_rows(spark, [(1, "a"), (2, "b")]))
    t.merge(
        spark,
        _rows(spark, [(2, "B"), (4, "D")]),
        on=["k"],
        cdf=True,
    )
    assert {r.k: r.v for r in t.read(spark).collect()} == {
        1: "a",
        2: "B",
        4: "D",
    }
    kinds = {
        r._change_type
        for r in t.read_changes(
            spark, t.version() - 1, t.version()
        ).collect()
    }
    assert kinds == {"insert", "update_preimage", "update_postimage"}
