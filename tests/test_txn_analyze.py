"""ANALYZE TABLE (round 10): one-pass column statistics committed as a
metadata-only 'analyze' record, read back via column_stats() with no
data scan; net-zero for CDF and streams."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable


@pytest.fixture()
def table(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(
        spark.createDataFrame(
            [Row(k=i, s=("x" if i % 3 == 0 else None)) for i in range(30)]
        )
    )
    return t


def test_analyze_exact_stats(spark, table):
    stats = table.analyze(spark)
    assert stats["k"] == {
        "num_nulls": 0,
        "distinct_count": 30,
        "min": "0",
        "max": "29",
    }
    assert stats["s"]["num_nulls"] == 20
    assert stats["s"]["distinct_count"] == 1
    # metadata read-back without a scan
    cs = table.column_stats()
    assert cs["columns"] == stats
    assert cs["rows"] == 30 and cs["approx"] is False
    assert cs["snapshot"] == 1


def test_analyze_approx_tier(spark, table):
    stats = table.analyze(spark, columns=["k"], approx=True)
    # HLL at rsd 1%: exact at this cardinality, and flagged approx
    assert abs(stats["k"]["distinct_count"] - 30) <= 1
    assert table.column_stats()["approx"] is True


def test_analyze_unknown_column_refused(spark, table):
    with pytest.raises(ValueError, match="no such column"):
        table.analyze(spark, columns=["nope"])


def test_analyze_is_net_zero_for_cdf_and_resolution(spark, table):
    v_before = table.version()
    table.analyze(spark, columns=["k"])
    assert table.version() == v_before + 1
    # CDF across the analyze commit: no row changes
    assert table.read_changes(spark, v_before, table.version()).count() == 0
    # newest analyze wins; survives later data commits
    table.append(spark.createDataFrame([Row(k=100, s="y")]))
    cs = table.column_stats()
    assert cs["columns"]["k"]["max"] == "29"  # stats are a snapshot
    assert cs["snapshot"] == v_before
    # re-analyze folds the new data
    table.analyze(spark, columns=["k"])
    assert table.column_stats()["columns"]["k"]["max"] == "100"


def test_analyze_histogram_integer_exact(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.createDataFrame([Row(k=i) for i in range(100)]))
    stats = t.analyze(spark, columns=["k"], histogram_bins=4)
    h = stats["k"]["histogram"]
    # (k - 0) div 25 (w = 99 div 4 + 1): exactly 25 per bucket
    assert h == {
        "bins": 4,
        "formula": "int_width_first",
        "counts": [25, 25, 25, 25],
    }
    # committed and read back without a scan
    assert (
        t.column_stats()["columns"]["k"]["histogram"]["counts"]
        == [25, 25, 25, 25]
    )


def test_analyze_histogram_near_int64_range_no_overflow(spark, tmp_path):
    """Regression (round-10 advice): the multiply-form bucket
    expression ((x - lo) * N) div (hi - lo + 1) wraps bigint silently
    (ANSI off) when the column range is near int64 — 64-bit hash/id
    columns — producing negative bucket keys that zero-fill, so the
    committed histogram summed to fewer than the row count. The
    width-first formula routes the subtraction through decimal(38,0)
    and never multiplies."""
    vals = [-(2**63), -(2**61), 0, 2**61, 2**62, 2**63 - 1]
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.createDataFrame([Row(k=v) for v in vals]))
    stats = t.analyze(spark, columns=["k"], histogram_bins=8)
    h = stats["k"]["histogram"]
    assert sum(h["counts"]) == len(vals), h  # every row landed in a bucket
    assert len(h["counts"]) == 8
    # replay the formula driver-side (python ints are exact)
    lo, hi = -(2**63), 2**63 - 1
    w = (hi - lo) // 8 + 1
    want = [0] * 8
    for v in vals:
        want[(v - lo) // w] += 1
    assert h["counts"] == want, (h["counts"], want)


def test_analyze_histogram_double_and_skip_strings(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(
        spark.createDataFrame(
            [Row(x=float(i), s=str(i)) for i in range(10)]
        )
    )
    stats = t.analyze(spark, histogram_bins=5)
    h = stats["x"]["histogram"]
    assert sum(h["counts"]) == 10 and len(h["counts"]) == 5
    assert h["counts"][-1] >= 2  # top edge clamped into the last bin
    assert "histogram" not in stats["s"]  # strings: no histogram


def test_analyze_empty_table_raises_by_read_contract(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    with pytest.raises(FileNotFoundError):
        t.analyze(spark)


def test_analyze_equiheight_exact_ranks_and_ties(spark, tmp_path):
    """Equi-height tier (VERDICT r10 task 7): rank-keyed buckets —
    0-based rank q lands in bucket (q*bins) div n — replayed here
    driver-side over the sorted multiset, ties included."""
    vals = [1, 1, 1, 1, 5, 5, 7, 8, 9, 9, 9, 12]  # n=12, ties across edges
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.createDataFrame([Row(k=v) for v in vals]))
    stats = t.analyze(spark, columns=["k"], equi_height_bins=4)
    eh = stats["k"]["histogram_eh"]
    assert eh["bins"] == 4
    # driver-side replay (python ints exact)
    svals = sorted(vals)
    want = {}
    for q, v in enumerate(svals):
        b = (q * 4) // len(svals)
        e = want.setdefault(b, {"bucket": b, "count": 0, "lo": v, "hi": v, "ndv": set()})
        e["count"] += 1
        e["hi"] = max(e["hi"], v)
        e["lo"] = min(e["lo"], v)
        e["ndv"].add(v)
    expect = [
        {"bucket": b, "count": e["count"], "lo": str(e["lo"]),
         "hi": str(e["hi"]), "ndv": len(e["ndv"])}
        for b, e in sorted(want.items())
    ]
    assert eh["buckets"] == expect, (eh["buckets"], expect)
    # committed + read back without a scan
    assert t.column_stats()["columns"]["k"]["histogram_eh"] == eh


def test_analyze_equiheight_sparse_when_rows_lt_bins(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.createDataFrame([Row(k=10), Row(k=20)]))
    eh = t.analyze(spark, columns=["k"], equi_height_bins=8)["k"][
        "histogram_eh"
    ]
    # ids are sparse: q=0 -> bucket 0, q=1 -> bucket 4
    assert [b["bucket"] for b in eh["buckets"]] == [0, 4]
    assert all(b["count"] == 1 for b in eh["buckets"])


def test_analyze_equiheight_skips_strings_and_keeps_widths_separate(
    spark, tmp_path
):
    t = TxnTable(str(tmp_path), "t")
    t.append(
        spark.createDataFrame([Row(x=float(i), s=str(i)) for i in range(10)])
    )
    stats = t.analyze(spark, histogram_bins=5, equi_height_bins=5)
    assert "histogram_eh" not in stats["s"]
    assert "histogram" in stats["x"] and "histogram_eh" in stats["x"]
    assert [b["count"] for b in stats["x"]["histogram_eh"]["buckets"]] == [
        2, 2, 2, 2, 2,
    ]


def test_analyze_equiheight_approx_tier(spark, tmp_path):
    """approx=True + equi_height_bins: bounds from approxQuantile (no
    NDV frame, no sort — the 100 TB tier for near-unique keys), counts
    EXACT for the chosen bounds, payload flagged approx."""
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.createDataFrame([Row(k=i) for i in range(1000)]))
    eh = t.analyze(
        spark, columns=["k"], approx=True, equi_height_bins=4
    )["k"]["histogram_eh"]
    assert eh["approx"] is True and eh["bins"] == 4
    assert sum(b["count"] for b in eh["buckets"]) == 1000
    # near-uniform data + 0.1% error: every bucket holds ~250
    for b in eh["buckets"]:
        assert 200 <= b["count"] <= 300, eh["buckets"]
    # per-bucket lo/hi bound the bucket's actual values
    for b in eh["buckets"]:
        assert int(b["lo"]) <= int(b["hi"])
    # the exact tier stays the default (no approx flag)
    t.analyze(spark, columns=["k"], equi_height_bins=4)
    eh2 = t.column_stats()["columns"]["k"]["histogram_eh"]
    assert "approx" not in eh2
