"""Schema evolution end-to-end across all three storage backends: a
later batch carries an extra column (the reference's mergeSchema=true
write path, base_table.py:211-217) and (a) read-latest returns the
merged schema with the new column populated, (b) old batches stay
readable with the new column as NULL, (c) a following batch that drops
the column again still reads cleanly."""

from __future__ import annotations

import datetime as dt
import uuid

import pytest
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.catalog import CatalogStore
from spark_data_engineering_spark.sources.snapshot import SnapshotStore
from spark_data_engineering_spark.sources.txn import TxnStore, TxnTable

TS1 = dt.datetime(2024, 1, 1, 12)
TS2 = dt.datetime(2024, 1, 2, 12)
TS3 = dt.datetime(2024, 1, 3, 12)


def _v1(spark):
    return spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")


def _v2(spark):
    # same columns plus a new one
    return spark.createDataFrame(
        [(3, "c", 0.5), (4, "d", 1.5)], "k int, v string, score double"
    )


def _check_store(spark, store, name="evolving"):
    store.write(name, _v1(spark), TS1)
    store.write(name, _v2(spark), TS2)

    latest = store.read_latest(spark, name)
    assert "score" in latest.columns
    got = {(r.k, r.score) for r in latest.select("k", "score").collect()}
    assert got == {(3, 0.5), (4, 1.5)}

    # a batch WITHOUT the new column, written after it exists
    store.write(name, _v1(spark), TS3)
    latest3 = store.read_latest(spark, name)
    assert "score" in latest3.columns
    assert {r.score for r in latest3.select("score").collect()} == {None}


def test_snapshot_store_merges_schema(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "snap"))
    _check_store(spark, store)
    # full-table read surfaces the union schema; pre-evolution rows NULL
    batches = store.batches("evolving")
    b1 = store.read_batch(spark, "evolving", batches[0])
    assert "score" in b1.columns
    assert {r.score for r in b1.select("score").collect()} == {None}


def test_txn_store_merges_schema(spark, tmp_path):
    _check_store(spark, TxnStore(str(tmp_path / "txn")))


def test_txn_append_merges_schema(spark, tmp_path):
    """Append-mode evolution: files of different schemas live in one
    version; mergeSchema read unions them."""
    t = TxnTable(str(tmp_path), "evolve_append")
    t.append(_v1(spark))
    t.append(_v2(spark))
    df = t.read(spark)
    assert "score" in df.columns
    got = {(r.k, r.score) for r in df.select("k", "score").collect()}
    assert got == {(1, None), (2, None), (3, 0.5), (4, 1.5)}
    # time travel to the pre-evolution version keeps the old schema
    v1 = t.read(spark, at_version=1)
    assert "score" not in v1.columns


def test_catalog_store_evolves_declared_schema(spark):
    store = CatalogStore(spark, database=f"t{uuid.uuid4().hex[:10]}")
    try:
        _check_store(spark, store)
        # old batch re-read through the metastore: new column NULL
        first = store.batches("evolving")[0]
        b1 = store.read_batch(spark, "evolving", first)
        assert "score" in b1.columns
        assert {r.score for r in b1.select("score").collect()} == {None}
        # declared schema includes the evolved column for plain SQL users
        cols = [
            f.name for f in spark.table(f"{store.database}.evolving").schema.fields
        ]
        assert "score" in cols
    finally:
        for t in spark.catalog.listTables(store.database):
            store.drop(t.name)
        spark.sql(f"DROP DATABASE IF EXISTS {store.database}")


def test_txn_merge_on_evolved_table(spark, tmp_path):
    """MERGE against a table whose matched keys live in pre-evolution
    files must conform those files and declare source-added columns —
    under the opt-in (round 11, Delta's withSchemaEvolution rule:
    without the flag a source-added column is a loud refusal, not an
    implicit evolution)."""
    t = TxnTable(str(tmp_path), "m_evolve")
    t.append(_v1(spark))  # (k, v)
    src = spark.createDataFrame(
        [(1, "A", 9.5), (9, "new", 0.5)], "k int, v string, score double"
    )
    with pytest.raises(ValueError, match="schema_evolution"):
        t.merge(spark, src, on=["k"])  # strict by default (Delta)
    t.merge(spark, src, on=["k"], schema_evolution=True)
    out = {(r.k, r.v, r.score) for r in t.read(spark).collect()}
    assert out == {(1, "A", 9.5), (2, "b", None), (9, "new", 0.5)}


def test_txn_read_changes_across_evolution(spark, tmp_path):
    """The change feed must survive a rewrite commit that removes
    pre-evolution files while adding post-evolution ones."""
    t = TxnTable(str(tmp_path), "cdf_evolve")
    t.append(_v1(spark))  # v1: (k, v)
    t.overwrite(_v2(spark))  # v2: (k, v, score) replacing v1 files
    ch = t.read_changes(spark, from_version=1)
    assert "score" in ch.columns
    ins = {(r.k, r.score) for r in ch.filter("_change_type = 'insert'").collect()}
    dels = {(r.k, r.score) for r in ch.filter("_change_type = 'delete'").collect()}
    assert ins == {(3, 0.5), (4, 1.5)}
    assert dels == {(1, None), (2, None)}


def test_txn_legacy_table_keeps_undeclared_columns(spark, tmp_path):
    """First schema-tracked commit on a table whose history predates
    schema tracking must seed from the physical schema, not hide
    legacy columns."""
    t = TxnTable(str(tmp_path), "legacy")
    # simulate a legacy commit: append, then strip the schema key
    import json as _json
    import os as _os

    t.append(_v1(spark))
    cpath = _os.path.join(t.log_dir, f"{1:020d}.json")
    rec = _json.load(open(cpath))
    del rec["schema"]
    with open(cpath, "w") as f:
        _json.dump(rec, f)
    # new-style append with a DIFFERENT column set
    t.append(spark.createDataFrame([(5, 1.5)], "k int, score double"))
    df = t.read(spark)
    assert set(df.columns) == {"k", "v", "score"}
    got = {(r.k, r.v, r.score) for r in df.collect()}
    assert got == {(1, "a", None), (2, "b", None), (5, None, 1.5)}


def test_txn_type_change_refused(spark, tmp_path):
    t = TxnTable(str(tmp_path), "enforce")
    t.append(_v1(spark))
    with pytest.raises(ValueError, match="schema enforcement"):
        t.append(spark.createDataFrame([(1, 2)], "k int, v int"))


def test_catalog_type_change_refused(spark):
    import uuid as _uuid

    store = CatalogStore(spark, database=f"t{_uuid.uuid4().hex[:10]}")
    try:
        store.write("t", _v1(spark), TS1)
        with pytest.raises(ValueError, match="schema enforcement"):
            store.write("t", spark.createDataFrame([(1, 2)], "k int, v int"), TS2)
    finally:
        for t in spark.catalog.listTables(store.database):
            store.drop(t.name)
        spark.sql(f"DROP DATABASE IF EXISTS {store.database}")


def test_streaming_idempotent_append_evolves_schema(spark, tmp_path):
    """Schema evolution through the exactly-once streaming path: a
    mid-stream epoch adds a column via append_idempotent; the log-head
    schema evolves, earlier epochs read back NULL-filled, and a replay
    of the evolving epoch commits nothing (no schema double-merge)."""
    t = TxnTable(str(tmp_path), "stream_evolve")
    t.append_idempotent(spark.createDataFrame([(1,)], "id bigint"), "app", 0)
    t.append_idempotent(
        spark.createDataFrame([(2, "x")], "id bigint, tag string"), "app", 1
    )
    assert {f["name"] for f in t.table_schema()} == {"id", "tag"}
    got = {(r.id, r.tag) for r in t.read(spark).collect()}
    assert got == {(1, None), (2, "x")}
    v = t.version()
    # replay of the evolving epoch: skipped, schema unchanged
    t.append_idempotent(
        spark.createDataFrame([(2, "x")], "id bigint, tag string"), "app", 1
    )
    assert t.version() == v
    assert {f["name"] for f in t.table_schema()} == {"id", "tag"}
