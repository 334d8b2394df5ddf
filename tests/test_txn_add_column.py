"""ALTER TABLE ADD COLUMN [DEFAULT <literal>] (round 10): one metadata
commit; Delta/SQL semantics exactly — rows from before the add read
NULL (their files lack the column), writes after the add that omit the
column get the default MATERIALIZED into their staged files
(_with_defaults). Read-time defaulting is deliberately absent: a merged
scan cannot tell a file-lacks-column NULL from an explicit one.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable


@pytest.fixture()
def table(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="b")]))
    return t


def test_add_column_pre_add_rows_read_null(spark, table):
    v0 = table.version()
    table.add_column(spark, "w", "int")
    table.add_column(spark, "channel", "string", default="store")
    assert table.version() == v0 + 2  # metadata-only commits
    rows = {r.k: (r.w, r.channel) for r in table.read(spark).collect()}
    # Delta's rule: existing rows NULL, even with a default declared
    assert rows == {1: (None, None), 2: (None, None)}
    # old snapshots don't have the columns at all
    assert "channel" not in table.read(spark, at_version=v0).columns
    assert table.column_defaults() == {"channel": "store"}


def test_default_materializes_on_later_writes(spark, table):
    table.add_column(spark, "channel", "string", default="store")
    table.append(spark.createDataFrame([Row(k=3, v="c", channel="web")]))
    table.append(spark.createDataFrame([Row(k=4, v="d")]))  # omits it
    rows = {r.k: r.channel for r in table.read(spark).collect()}
    assert rows == {1: None, 2: None, 3: "web", 4: "store"}
    # the default is PHYSICAL in k=4's file, not a read-time projection
    raw = spark.read.option("mergeSchema", "true").parquet(
        *[os.path.join(table.data_dir, f) for f in table.live_files()]
    )
    assert raw.filter("k = 4").collect()[0].channel == "store"


def test_explicit_null_is_kept(spark, table):
    table.add_column(spark, "channel", "string", default="store")
    table.append(
        spark.createDataFrame(
            [Row(k=5, v="e", channel=None)],
            "k bigint, v string, channel string",
        )
    )
    assert (
        table.read(spark).filter("k = 5").collect()[0].channel is None
    )


def test_default_in_merge_source(spark, table):
    table.add_column(spark, "tier", "string", default="bronze")
    table.merge(
        spark,
        spark.createDataFrame([Row(k=2, v="B2"), Row(k=9, v="i")]),
        on=["k"],
    )
    rows = {r.k: (r.v, r.tier) for r in table.read(spark).collect()}
    # updated + inserted rows take the write-time default; untouched
    # pre-add rows keep NULL
    assert rows == {
        1: ("a", None),
        2: ("B2", "bronze"),
        9: ("i", "bronze"),
    }


def test_add_column_typed_default(spark, table):
    table.add_column(spark, "score", "double", default=1.5)
    table.append(spark.createDataFrame([Row(k=3, v="c")]))
    got = {r.k: r.score for r in table.read(spark).collect()}
    assert got == {1: None, 2: None, 3: 1.5}
    assert (
        table.read(spark).schema["score"].dataType.simpleString() == "double"
    )


def test_add_column_refusals(spark, table):
    with pytest.raises(ValueError, match="already exists"):
        table.add_column(spark, "v", "string")
    table.drop_column(spark, "v")
    with pytest.raises(ValueError, match="already exists"):
        table.add_column(spark, "v", "string")  # tombstone owns the bytes
    with pytest.raises(ValueError, match="literal"):
        table.add_column(spark, "x", "int", default=[1])


def test_add_column_constraint_on_default(spark, table):
    table.add_column(spark, "tier", "string", default="bronze")
    # pre-add rows are NULL and NULL passes CHECK (SQL rule), so the
    # constraint validates; later default-omitting appends stage the
    # physical value and pass too
    table.add_constraint(spark, "tier_known", "tier IN ('bronze','gold')")
    table.append(spark.createDataFrame([Row(k=9, v="z")]))
    assert (
        table.read(spark).filter("k = 9").collect()[0].tier == "bronze"
    )


def test_add_column_connector_matches_jvm_read(spark, table):
    from spark_data_engineering_spark.sources.txn_datasource import (
        register_txn,
    )

    register_txn(spark)
    table.add_column(spark, "channel", "string", default="store")
    table.append(spark.createDataFrame([Row(k=3, v="c", channel="web")]))
    table.append(spark.createDataFrame([Row(k=4, v="d")]))
    want = {
        (r.k, r.channel) for r in table.read(spark).collect()
    }
    got = {
        (r.k, r.channel)
        for r in spark.read.format("txn").load(table.table_dir).collect()
    }
    assert got == want == {(1, None), (2, None), (3, "web"), (4, "store")}


def test_add_column_cdf_and_branch_triage(spark, table):
    v0 = table.version()
    table.add_column(spark, "w", "int", default=7)
    # CDF: the DDL commit itself moves no rows
    assert table.read_changes(spark, v0, table.version()).count() == 0
    # branch replay refuses schema evolution (same rule as rename/drop)
    b = table.branch("b1")
    b.add_column(spark, "z", "int")
    with pytest.raises(ValueError, match="schema-evolution"):
        table.merge_branch(b)
    table.drop_branch("b1")


def test_set_and_drop_column_default(spark, table):
    table.add_column(spark, "channel", "string", default="store")
    table.append(spark.createDataFrame([Row(k=3, v="c")]))   # -> store
    table.set_column_default(spark, "channel", "web")
    table.append(spark.createDataFrame([Row(k=4, v="d")]))   # -> web
    table.drop_column_default(spark, "channel")
    table.append(spark.createDataFrame([Row(k=5, v="e")]))   # -> NULL
    got = {r.k: r.channel for r in table.read(spark).collect()}
    assert got == {1: None, 2: None, 3: "store", 4: "web", 5: None}
    # purely prospective: earlier rows kept their physical values
    with pytest.raises(ValueError, match="no default"):
        table.drop_column_default(spark, "channel")


def test_set_default_introduces_one_on_plain_column(spark, table):
    # SET DEFAULT on a column that never had one (Delta allows this)
    table.set_column_default(spark, "v", "filler")
    table.append(spark.createDataFrame([Row(k=6)], "k bigint"))
    assert (
        table.read(spark).filter("k = 6").collect()[0].v == "filler"
    )
    with pytest.raises(ValueError, match="no such column"):
        table.set_column_default(spark, "nope", 1)


def test_generated_column_may_read_defaulted_column_on_append(spark, tmp_path):
    """Regression (round-10 advice): append/overwrite/streaming applied
    _with_generated BEFORE _with_defaults while merge deliberately
    applied defaults first — so a generation expression referencing a
    column given a default via set_column_default resolved on merge but
    raised on append. All write sites now use merge's ordering."""
    t = TxnTable(
        str(tmp_path),
        "t",
        generated_cols={"tag": "concat(channel, '-', cast(k as string))"},
    )
    t.append(
        spark.createDataFrame([Row(k=1, channel="web")])
    )  # generated from an explicit value
    t.set_column_default(spark, "channel", "store")
    # writer omits the defaulted column: generation must see the default
    t.append(spark.createDataFrame([Row(k=2)]))
    got = {(r.k, r.channel, r.tag) for r in t.read(spark).collect()}
    assert got == {(1, "web", "web-1"), (2, "store", "store-2")}, got
