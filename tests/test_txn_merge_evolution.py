"""MERGE schema evolution (VERDICT r10 task 5 — Delta 2.3's
``withSchemaEvolution()``): without the flag the source must carry
exactly the target's live columns; with it, extra source columns evolve
the table in the merge's own commit (pre-existing rows read NULL) and
source-missing columns keep the target's values on updated rows / NULL
on inserted ones (Delta's updateAll rule — the old behavior silently
NULL-overwrote them, a data loss vs Delta). Type conflicts are refused
in both regimes.
"""

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
            [Row(k=1, v="a", w=10), Row(k=2, v="b", w=20)],
            "k int, v string, w int",
        )
    )
    return t


def _src(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl)


def test_mismatch_refused_without_flag(spark, table):
    extra = _src(
        spark, [(2, "B", 20, "x")], "k int, v string, w int, extra string"
    )
    with pytest.raises(ValueError, match="schema_evolution"):
        table.merge(spark, extra, on=["k"])
    missing = _src(spark, [(2, "B")], "k int, v string")
    with pytest.raises(ValueError, match="missing columns \\['w'\\]"):
        table.merge(spark, missing, on=["k"])
    # nothing committed, nothing changed
    assert table.version() == 1
    assert {r.k: (r.v, r.w) for r in table.read(spark).collect()} == {
        1: ("a", 10),
        2: ("b", 20),
    }


def test_extra_column_evolves_with_null_history(spark, table):
    src = _src(
        spark,
        [(2, "B", 21, "web"), (3, "C", 30, "api")],
        "k int, v string, w int, channel string",
    )
    table.merge(spark, src, on=["k"], schema_evolution=True)
    assert [f["name"] for f in table.table_schema()] == [
        "k",
        "v",
        "w",
        "channel",
    ]
    got = {
        r.k: (r.v, r.w, r.channel) for r in table.read(spark).collect()
    }
    # untouched pre-evolution row reads NULL for the new column
    assert got == {
        1: ("a", 10, None),
        2: ("B", 21, "web"),
        3: ("C", 30, "api"),
    }


def test_missing_columns_preserved_on_update_null_on_insert(spark, table):
    src = _src(spark, [(2, "B"), (3, "C")], "k int, v string")
    table.merge(spark, src, on=["k"], schema_evolution=True)
    got = {r.k: (r.v, r.w) for r in table.read(spark).collect()}
    # updated row 2 KEEPS w=20 (Delta updateAll: only source columns
    # are SET); inserted row 3 gets NULL
    assert got == {1: ("a", 10), 2: ("B", 20), 3: ("C", None)}


def test_type_conflict_refused_even_with_flag(spark, table):
    src = _src(spark, [(2, 99, 20)], "k int, v bigint, w int")
    with pytest.raises(ValueError, match="schema enforcement"):
        table.merge(spark, src, on=["k"], schema_evolution=True)


def test_evolution_with_cdf_and_by_source(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(
        spark.createDataFrame(
            [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=9, v="z")],
            "k int, v string",
        )
    )
    src = spark.createDataFrame(
        [(2, "B", "web"), (3, "C", "api")], "k int, v string, channel string"
    )
    t.merge(
        spark,
        src,
        on=["k"],
        when_not_matched_by_source="delete",
        schema_evolution=True,
        cdf=True,
    )
    got = {(r.k, r.v, r.channel) for r in t.read(spark).collect()}
    assert got == {(2, "B", "web"), (3, "C", "api")}
    ch = t.read_changes(spark, from_version=1)
    kinds = sorted(
        (r.k, r._change_type) for r in ch.collect() if r.k in (1, 9)
    )
    assert kinds == [(1, "delete"), (9, "delete")]


def test_defaults_fill_before_mismatch_check(spark, table):
    # a column omitted by the writer but carrying a DEFAULT is not
    # "missing": _with_defaults materializes it first
    table.set_column_default(spark, "w", 77)
    src = _src(spark, [(3, "C")], "k int, v string")
    table.merge(spark, src, on=["k"])  # no flag needed
    assert {r.k: r.w for r in table.read(spark).collect()} == {
        1: 10,
        2: 20,
        3: 77,
    }
