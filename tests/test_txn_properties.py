"""User table properties (Delta TBLPROPERTIES) + RESTORE TIMESTAMP AS OF.

Properties are a log property like constraints: the latest commit
carrying a ``properties`` field holds the full map, pure metadata,
versioned with the log. The new action strings are triaged in all
three dispatchers (TxnStreamReader.partitions skips, read_changes
skips, merge_branch replay forwards the snapshot; rebase refuses
branch-side properties DDL)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable


def test_properties_roundtrip_and_versioning(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.range(5))                       # v1
    assert t.properties() == {}
    v2 = t.set_properties({"owner": "etl", "tier": "gold"})
    assert v2 == 2
    assert t.properties() == {"owner": "etl", "tier": "gold"}
    t.set_properties({"tier": "silver"})           # v3: merge, not replace
    assert t.properties() == {"owner": "etl", "tier": "silver"}
    t.unset_properties(["owner"])                  # v4
    assert t.properties() == {"tier": "silver"}
    # time-travel resolution
    assert t.properties(1) == {}
    assert t.properties(2) == {"owner": "etl", "tier": "gold"}
    assert t.properties(3)["tier"] == "silver"
    with pytest.raises(ValueError, match="no such propert"):
        t.unset_properties(["nope"])
    # values stored as strings (Delta's rule)
    t.set_properties({"retention_days": 30})
    assert t.properties()["retention_days"] == "30"
    # data reads are unaffected by the DDL commits
    assert sorted(r.id for r in t.read(spark).collect()) == list(range(5))
    assert t.detail()["properties"]["tier"] == "silver"


def test_properties_ddl_is_net_zero_for_changes_and_streams(spark, tmp_path):
    from spark_data_engineering_spark.sources.txn_datasource import register_txn

    t = TxnTable(str(tmp_path), "t")
    t.append(spark.range(3))          # v1
    t.set_properties({"a": "1"})      # v2
    t.append(spark.range(10, 13))     # v3
    # read_changes walks straight past the DDL commit
    ch = t.read_changes(spark, 0)
    assert sorted(r.id for r in ch.collect()) == [0, 1, 2, 10, 11, 12]
    # a format("txn") stream over the same history neither aborts nor
    # double-emits (the DDL commit plans zero partitions)
    register_txn(spark)
    got = []
    q = (
        spark.readStream.format("txn")
        .option("startingVersion", "0")
        .load(t.table_dir)
        .writeStream.format("memory")
        .queryName("props_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = sorted(r.id for r in spark.sql("select * from props_stream").collect())
    assert got == [0, 1, 2, 10, 11, 12]


def test_branch_inherits_and_merge_forwards_properties(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.range(4))
    t.set_properties({"env": "prod"})
    b = t.branch("dev")
    assert b.properties() == {"env": "prod"}  # seed carries the snapshot
    b.set_properties({"env": "dev", "note": "x"})
    b.append(spark.range(100, 102))
    t.merge_branch(b)
    t.drop_branch("dev")
    # fast-forward replay forwarded the branch's snapshot verbatim
    assert t.properties() == {"env": "dev", "note": "x"}
    assert sorted(r.id for r in t.read(spark).collect()) == [0, 1, 2, 3, 100, 101]


def test_rebase_refuses_branch_side_properties_ddl(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.range(3))
    b = t.branch("dev")
    t.append(spark.range(10, 12))     # parent diverges
    b.set_properties({"stale": "map"})
    with pytest.raises(ValueError, match="TBLPROPERTIES"):
        t.rebase_branch(b)
    t.drop_branch("dev")
    # parent-side properties changes do NOT block a rebase
    b2 = t.branch("dev2")
    t.set_properties({"env": "prod"})  # parent-side DDL after the base
    b2.append(spark.range(50, 52))
    rb = t.rebase_branch(b2)
    t.merge_branch(rb)
    t.drop_branch("dev2")
    assert t.properties() == {"env": "prod"}
    assert sorted(r.id for r in t.read(spark).collect()) == [
        0, 1, 2, 10, 11, 50, 51,
    ]


def test_restore_timestamp_as_of(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.range(5))          # v1
    time.sleep(0.05)
    mid = time.time()
    time.sleep(0.05)
    t.overwrite(spark.range(100, 102))  # v2
    t.restore(at_timestamp=mid)       # resolves to v1
    assert sorted(r.id for r in t.read(spark).collect()) == list(range(5))
    with pytest.raises(ValueError, match="version OR at_timestamp"):
        t.restore()
    with pytest.raises(ValueError, match="version OR at_timestamp"):
        t.restore(1, at_timestamp=mid)
