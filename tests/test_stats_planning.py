"""ANALYZE stats as a planning input (VERDICT r10 task 3 + the round-10
advice on the merge count probe).

The committed stats surface gets consumers: ``TxnTable.analyzed_rows``
(fresh-only row counts from the commit log), the MERGE broadcast gate's
zero-job tier (an untransformed txn read carries a breadcrumb the gate
resolves against fresh stats instead of running ``src.count()``), the
``probe=False`` regime for snapshot-sync merges (a table-sized
``when_not_matched_by_source`` source never pays a count job just to
learn "don't broadcast"), and ``plans.advisor.join_size_advisor`` (a
broadcast/skew verdict per table from metadata alone).
"""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

from spark_data_engineering_spark.plans.advisor import join_size_advisor
from spark_data_engineering_spark.sources.txn import TxnTable, _est_row_bytes

THRESH = "spark.spark_graft.merge.broadcastThreshold"


def _rows(spark, pairs):
    return spark.createDataFrame(
        [Row(k=k, v=v) for k, v in pairs], "k int, v string"
    )


@pytest.fixture()
def gate_conf(spark):
    yield spark
    spark.conf.unset(THRESH)


@pytest.fixture()
def no_count(monkeypatch):
    """Any .count() on any DataFrame fails the test."""

    def boom(self):
        raise AssertionError("count() job ran — the gate was not zero-job")

    # Spark 4: the session builds pyspark.sql.classic.dataframe.DataFrame,
    # which overrides count() — patch the concrete class too, or the
    # patch on the abstract base never intercepts
    monkeypatch.setattr(DataFrame, "count", boom)
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _CDF

        monkeypatch.setattr(_CDF, "count", boom)
    except ImportError:
        pass


def test_analyzed_rows_fresh_stale_and_row_neutral(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(_rows(spark, [(1, "a"), (2, "b"), (3, "c")]))
    assert t.analyzed_rows() is None  # never analyzed
    t.analyze(spark, columns=["k"])
    # the analyze commit itself is row-neutral: stats stay fresh
    assert t.analyzed_rows() == 3
    # metadata-only commits keep them fresh
    t.set_properties({"owner": "me"})
    t.add_column(spark, "w", "int")
    assert t.analyzed_rows() == 3
    # a data commit invalidates them
    t.append(_rows(spark, [(4, "d")]).withColumn("w", F.lit(None).cast("int")))
    assert t.analyzed_rows() is None
    # re-analyze restores; compact is row-neutral by construction
    t.analyze(spark, columns=["k"])
    assert t.analyzed_rows() == 4
    t.compact(spark)
    assert t.analyzed_rows() == 4
    # DV delete changes visible rows -> stale again
    t.delete_where_dv(spark, F.col("k") == 1)
    assert t.analyzed_rows() is None


def test_merge_gate_sizes_analyzed_source_with_zero_jobs(
    gate_conf, tmp_path, no_count
):
    """The gate decision on a fresh-analyzed txn source runs NO Spark
    job: plan stats over-estimate (parquet file bytes > threshold), the
    breadcrumb resolves analyzed_rows from the commit log, and rows x
    row-width fits — broadcast, with count() patched to fail the test."""
    spark = gate_conf
    t = TxnTable(str(tmp_path), "src")
    # long string payloads: the plan-stats estimate tracks REAL bytes
    # while the gate's width model charges a flat 20 per string, so the
    # two tiers provably disagree and only tier 2 can say "small"
    t.append(
        _rows(spark, [(i, "x" * 500) for i in range(10)]).coalesce(1)
    )
    t.analyze(spark, columns=["k"])
    src = t.read(spark)
    est = int(
        str(src._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    )
    need = 10 * _est_row_bytes(src.schema)
    assert est > need, (est, need)  # plan stats DO over-estimate here
    spark.conf.set(THRESH, str(est - 1))  # tier 1 can't say "small"
    hint = TxnTable._merge_src_hint(spark, src)
    assert hint is F.broadcast  # decided by analyzed_rows, zero jobs


def test_merge_gate_stale_stats_do_not_decide(gate_conf, tmp_path, no_count):
    spark = gate_conf
    t = TxnTable(str(tmp_path), "src")
    t.append(_rows(spark, [(1, "a")]).coalesce(1))
    t.analyze(spark, columns=["k"])
    t.append(_rows(spark, [(2, "b")]).coalesce(1))  # stats now stale
    src = t.read(spark)
    est = int(
        str(src._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    )
    spark.conf.set(THRESH, str(est - 1))
    # probe forbidden + no fresh stats -> identity, still zero jobs
    hint = TxnTable._merge_src_hint(spark, src, probe=False)
    assert hint is not F.broadcast
    # probe allowed -> it needs the count, which this fixture forbids
    with pytest.raises(AssertionError, match="zero-job"):
        TxnTable._merge_src_hint(spark, src)


def test_by_source_merge_never_pays_a_count_probe(
    gate_conf, tmp_path, no_count
):
    """A when_not_matched_by_source merge whose source defeats the cheap
    tiers goes identity WITHOUT evaluating the source (round-10 advice:
    the probe added one full extra evaluation per snapshot-sync)."""
    spark = gate_conf
    t = TxnTable(str(tmp_path), "t")
    t.append(_rows(spark, [(1, "a"), (2, "b"), (3, "c")]).coalesce(1))
    s = TxnTable(str(tmp_path), "s")  # txn-read source, never analyzed
    s.append(_rows(spark, [(2, "B"), (4, "D")]).coalesce(1))
    src = s.read(spark)
    est = int(
        str(src._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    )
    spark.conf.set(THRESH, str(max(est - 1, 1)))
    t.merge(spark, src, on=["k"], when_not_matched_by_source="delete")
    assert {r.k: r.v for r in t.read(spark).collect()} == {2: "B", 4: "D"}


def test_merge_gate_breadcrumb_survives_defaults(gate_conf, tmp_path, no_count):
    """_with_defaults adds columns (never rows), so merge re-attaches
    the source breadcrumb across it and the zero-job tier still fires
    on a CDC merge into a defaulted target."""
    spark = gate_conf
    t = TxnTable(str(tmp_path), "t")
    t.append(_rows(spark, [(1, "a")]))
    t.add_column(spark, "channel", "string", default="store")
    s = TxnTable(str(tmp_path), "s")
    s.append(_rows(spark, [(1, "A"), (2, "B")]).coalesce(1))
    s.analyze(spark, columns=["k"])
    src = s.read(spark)  # lacks 'channel': merge materializes the default
    est = int(
        str(src._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    )
    spark.conf.set(THRESH, str(est - 1))
    t.merge(spark, src, on=["k"])
    got = {(r.k, r.v, r.channel) for r in t.read(spark).collect()}
    assert got == {(1, "A", "store"), (2, "B", "store")}


def test_join_size_advisor_metadata_only(spark, tmp_path, no_count):
    dim = TxnTable(str(tmp_path), "dim")
    dim.append(
        spark.createDataFrame(
            [Row(k=i, name=f"n{i}") for i in range(20)]
        ).coalesce(1)
    )
    dim.analyze(spark)
    fact = TxnTable(str(tmp_path), "fact")
    fact.append(
        spark.createDataFrame(
            [Row(k=i % 2, x=i) for i in range(100)]
        ).coalesce(1)
    )
    out = join_size_advisor(
        {"dim": dim, "fact": fact},
        join_keys={"dim": "k", "fact": "k"},
        threshold="10mb",
    )
    by = {r["table"]: r for r in out}
    d = by["dim"]
    assert d["rows"] == 20 and d["broadcast"] is True
    assert d["key_ndv"] == 20 and d["skewed"] is False
    f = by["fact"]
    assert f["rows"] is None and f["broadcast"] is None  # needs ANALYZE
    assert "ANALYZE" in f["reason"]
    # analyze the fact: 100 rows over 2 key values -> skew flag
    fact.analyze(spark)
    f2 = join_size_advisor(
        {"fact": fact}, join_keys={"fact": "k"}, threshold="10mb"
    )[0]
    assert f2["broadcast"] is True  # tiny in absolute bytes
    assert f2["key_ndv"] == 2 and f2["rows_per_key"] == 50.0
    assert f2["skewed"] is True and "salt" in f2["reason"]
    # threshold -1: Spark's disable convention
    assert (
        join_size_advisor({"dim": dim}, threshold=-1)[0]["broadcast"] is False
    )


def test_estimate_range_rows_tiers(spark, tmp_path, no_count):
    from spark_data_engineering_spark.plans.advisor import (
        estimate_range_rows,
    )

    t = TxnTable(str(tmp_path), "t")
    t.append(
        spark.createDataFrame([Row(k=i) for i in range(100)]).coalesce(1)
    )
    assert estimate_range_rows(t, "k", 0, 10) is None  # never analyzed
    t.analyze(
        spark, columns=["k"], histogram_bins=4, equi_height_bins=4
    )
    # equi-height tier preferred; uniform data -> near-exact estimates
    full = estimate_range_rows(t, "k")
    assert full["tier"] == "equi_height"
    assert full["rows"] == pytest.approx(100, abs=1)
    assert full["selectivity"] == pytest.approx(1.0, abs=0.01)
    half = estimate_range_rows(t, "k", 0, 49)
    assert half["rows"] == pytest.approx(50, abs=3)
    point = estimate_range_rows(t, "k", 200, 300)  # outside the range
    assert point["rows"] == 0.0
    # equi-width fallback when no equi-height tier was committed
    t2 = TxnTable(str(tmp_path), "t2")
    t2.append(
        spark.createDataFrame([Row(k=i) for i in range(100)]).coalesce(1)
    )
    t2.analyze(spark, columns=["k"], histogram_bins=4)
    ew = estimate_range_rows(t2, "k", 0, 49)
    assert ew["tier"] == "equi_width"
    assert ew["rows"] == pytest.approx(50, abs=5)
    # min/max-only fallback
    t3 = TxnTable(str(tmp_path), "t3")
    t3.append(
        spark.createDataFrame([Row(k=i) for i in range(100)]).coalesce(1)
    )
    t3.analyze(spark, columns=["k"])
    mm = estimate_range_rows(t3, "k", 0, 49)
    assert mm["tier"] == "min_max_uniform"
    assert mm["rows"] == pytest.approx(50, abs=5)
    # SKEWED data: equi-height tracks the mass, min/max-uniform cannot
    t4 = TxnTable(str(tmp_path), "t4")
    vals = [0] * 90 + list(range(1, 11))
    t4.append(spark.createDataFrame([Row(k=v) for v in vals]).coalesce(1))
    t4.analyze(spark, columns=["k"], equi_height_bins=5)
    sk = estimate_range_rows(t4, "k", 0, 0)
    assert sk["rows"] >= 60  # most buckets are the point bucket [0, 0]


def test_estimate_range_rows_fractional_and_legacy(
    spark, tmp_path, no_count
):
    """ADVICE r11 (advisor.py equi-width tier): fractional columns used
    to crash on int("123.5") and would have been misbinned by the
    integer width-first reconstruction; payloads without the formula
    marker (committed by pre-marker code) could silently misbin. The
    fractional tier now replays the float-floor bounds the analyze expr
    used; unmarked payloads fall through to min/max uniform."""
    from spark_data_engineering_spark.plans.advisor import (
        estimate_range_rows,
    )

    # fractional column: 100 doubles uniform on [0.5, 99.5]
    t = TxnTable(str(tmp_path), "t")
    t.append(
        spark.createDataFrame(
            [Row(k=float(i) + 0.5) for i in range(100)]
        ).coalesce(1)
    )
    t.analyze(spark, columns=["k"], histogram_bins=4)
    st = t.column_stats()["columns"]["k"]
    assert st["histogram"]["formula"] == "float_floor"
    ew = estimate_range_rows(t, "k", 0.0, 49.9)  # ~half the mass
    assert ew["tier"] == "equi_width"
    assert ew["rows"] == pytest.approx(50, abs=5)
    # integer columns keep the int_width_first marker
    t2 = TxnTable(str(tmp_path), "t2")
    t2.append(
        spark.createDataFrame([Row(k=i) for i in range(100)]).coalesce(1)
    )
    t2.analyze(spark, columns=["k"], histogram_bins=4)
    assert (
        t2.column_stats()["columns"]["k"]["histogram"]["formula"]
        == "int_width_first"
    )
    # legacy payload without the marker: skip the histogram, use min/max
    import json as _json
    import glob as _glob
    import os as _os

    log = sorted(_glob.glob(_os.path.join(t2.table_dir, "_txn_log", "*.json")))
    for p in reversed(log):
        with open(p) as fh:
            c = _json.load(fh)
        cs = c.get("column_stats")
        if cs and "k" in cs:
            del cs["k"]["histogram"]["formula"]
            with open(p, "w") as fh:
                _json.dump(c, fh)
            break
    t2b = TxnTable(str(tmp_path), "t2")  # fresh handle, no stats cache
    legacy = estimate_range_rows(t2b, "k", 0, 49)
    assert legacy["tier"] == "min_max_uniform"


def test_advisor_equiheight_skew_and_salt_factor(spark, tmp_path, no_count):
    """VERDICT r11 task 6: the skew verdict consumes equi-height
    buckets — a hot key a global rows/NDV average hides still flags,
    with a concrete power-of-two salting factor from the worst
    bucket's count/NDV — zero Spark jobs (no_count trap)."""
    from spark_data_engineering_spark.plans.advisor import (
        join_size_advisor,
    )

    # 500 rows of one hot key + 400 distinct cold keys: global average
    # = 900/401 ~ 2.2 rows/key (far under the 16x bar), hot key = 500
    t = TxnTable(str(tmp_path), "t")
    vals = [0] * 500 + list(range(1, 401))
    t.append(spark.createDataFrame([Row(k=v) for v in vals]).coalesce(1))
    t.analyze(spark, columns=["k"], equi_height_bins=8)
    rec = join_size_advisor({"t": t}, join_keys={"t": "k"})[0]
    assert rec["rows_per_key"] < 16  # the flat average misses it
    assert rec["skewed"] is True  # the equi-height tier catches it
    assert rec["max_rows_per_key"] >= 100
    assert rec["salt_factor"] in (32, 64)
    assert "salt by" in rec["reason"]
    # uniform table: equi-height present, no skew, no salt advice
    t2 = TxnTable(str(tmp_path), "t2")
    t2.append(
        spark.createDataFrame([Row(k=i) for i in range(400)]).coalesce(1)
    )
    t2.analyze(spark, columns=["k"], equi_height_bins=8)
    rec2 = join_size_advisor({"t2": t2}, join_keys={"t2": "k"})[0]
    assert rec2["skewed"] is False
    assert rec2["max_rows_per_key"] <= 2
    assert "salt_factor" not in rec2
