"""queries/profiling.py — from-first-principles checks independent of the
DuckDB oracles: degenerate key domains for the bucket-offset row-id
scheme, a pandas re-derivation of the column profile, and a hashlib
re-derivation of the epoch-diff class counts."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

import __spark_entry__ as entrymod
from spark_data_engineering_spark.queries.profiling import (
    _DIFF_SEED,
    assign_row_ids,
)


def _ids(spark, keys, n_buckets=8):
    df = spark.createDataFrame([(int(k),) for k in keys], "k bigint")
    out = assign_row_ids(df, "k", n_buckets=n_buckets).toPandas()
    return dict(zip(out["k"], out["row_id"]))


def test_row_ids_match_rank(spark):
    keys = [5, -3, 1000, 7, 0, 999, 42, -100, 8, 6]
    got = _ids(spark, keys)
    expect = {k: r + 1 for r, k in enumerate(sorted(keys))}
    assert got == expect


def test_row_ids_single_row_and_single_bucket(spark):
    # N < buckets, and a key domain so narrow every row lands in bucket 0.
    assert _ids(spark, [7]) == {7: 1}
    assert _ids(spark, [3, 4, 5], n_buckets=64) == {3: 1, 4: 2, 5: 3}


def test_row_ids_clustered_domain(spark):
    # All keys cluster into the top bucket (offsets for empty buckets
    # must not shift the ranks).
    keys = [10_000_000 + i for i in range(20)] + [0]
    got = _ids(spark, keys, n_buckets=4)
    expect = {k: r + 1 for r, k in enumerate(sorted(keys))}
    assert got == expect


def test_row_ids_contiguous_at_sf(spark, sf_dir):
    # Unfiltered assignment over real orders: ids are exactly 1..N.
    from spark_data_engineering_spark.sources import load_table

    src = load_table(spark, "orders", sf_dir).select("o_orderkey")
    out = assign_row_ids(src, "o_orderkey").toPandas()
    n = len(out)
    assert sorted(out["row_id"]) == list(range(1, n + 1))
    ordered = out.sort_values("o_orderkey")["row_id"].tolist()
    assert ordered == list(range(1, n + 1))


def test_column_stats_vs_pandas(spark, sf_dir):
    got = (
        entrymod.queries()["column_stats_report"](spark, sf_dir)
        .toPandas()
        .set_index("column_name")
    )
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    for col in ("l_orderkey", "l_quantity"):
        row = got.loc[col]
        assert row["n_nonnull"] == li[col].notna().sum()
        assert row["ndv"] == li[col].nunique()
        assert row["min_num"] == pytest.approx(float(li[col].min()), abs=0.01)
        assert row["max_num"] == pytest.approx(float(li[col].max()), abs=0.01)
    flag = got.loc["l_returnflag"]
    assert flag["min_str"] == li["l_returnflag"].min()
    assert flag["max_str"] == li["l_returnflag"].max()
    assert pd.isna(flag["min_num"])
    ship = got.loc["l_shipdate"]
    assert ship["min_ts"] == li["l_shipdate"].min()
    assert ship["max_ts"] == li["l_shipdate"].max()


def _bucket(doc_id: int) -> int:
    h = hashlib.md5(f"{_DIFF_SEED}{doc_id}".encode()).hexdigest()[:8]
    return int(h, 16) % 20


def test_snapshot_diff_vs_hashlib(spark, sf_dir):
    got = (
        entrymod.queries()["corpus_snapshot_diff"](spark, sf_dir)
        .toPandas()
        .set_index("change_class")
    )
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    buckets = docs["doc_id"].map(_bucket)
    n_removed = int((buckets == 0).sum())
    n_changed = int(buckets.isin([1, 2]).sum())
    n_added = int((buckets == 3).sum())
    n_unchanged = len(docs) - n_removed - n_changed
    assert got.loc["removed", "n_docs"] == n_removed
    assert got.loc["changed", "n_docs"] == n_changed
    assert got.loc["added", "n_docs"] == n_added
    assert got.loc["unchanged", "n_docs"] == n_unchanged
    # changed docs grew by exactly len(' [rev2]') chars each
    assert (
        got.loc["changed", "chars_after"] - got.loc["changed", "chars_before"]
        == 7 * n_changed
    )
    # removed docs have no 'after' side; added docs no 'before' side
    assert got.loc["removed", "chars_after"] == 0
    assert got.loc["added", "chars_before"] == 0
