"""CHECK constraints (round 8): Delta's ALTER TABLE ADD CONSTRAINT as
a log property, enforced against the STAGED BYTES of every
row-introducing write (refuse-before-commit, staged files cleaned).
SQL CHECK semantics: NULL passes, only FALSE violates."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from spark_data_engineering_spark.checks import CheckError
from spark_data_engineering_spark.sources.txn import ConcurrentWriteError, TxnTable


def _mk(spark, tmp_path, rows=((1, 10.0), (2, 20.0))):
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.createDataFrame(list(rows), "id bigint, v double"))
    return t


def test_violating_append_refused_and_staged_cleaned(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_constraint(spark, "v_pos", "v > 0")
    v0 = t.version()
    n_files = len(os.listdir(t.data_dir))
    with pytest.raises(CheckError, match="v_pos"):
        t.append(spark.createDataFrame([(3, -1.0)], "id bigint, v double"))
    assert t.version() == v0  # nothing committed
    assert len(os.listdir(t.data_dir)) == n_files  # staged bytes cleaned
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2]


def test_null_passes_sql_check_semantics(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_constraint(spark, "v_pos", "v > 0")
    t.append(
        spark.createDataFrame([(3, None)], "id bigint, v double")
    )  # NULL is not a violation
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2, 3]


def test_add_constraint_validates_existing_data(spark, tmp_path):
    t = _mk(spark, tmp_path, rows=((1, 10.0), (2, -5.0)))
    with pytest.raises(CheckError, match="existing data"):
        t.add_constraint(spark, "v_pos", "v > 0")
    assert t.constraints() == {}


def test_drop_constraint_and_duplicates(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_constraint(spark, "v_pos", "v > 0")
    with pytest.raises(ValueError, match="already exists"):
        t.add_constraint(spark, "v_pos", "v > 1")
    with pytest.raises(ValueError, match="no constraint"):
        t.drop_constraint("nope")
    t.drop_constraint("v_pos")
    t.append(spark.createDataFrame([(3, -1.0)], "id bigint, v double"))
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2, 3]


def test_constraints_time_travel(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v1 = t.version()
    t.add_constraint(spark, "v_pos", "v > 0")
    v2 = t.version()
    t.drop_constraint("v_pos")
    assert t.constraints(v1) == {}
    assert t.constraints(v2) == {"v_pos": "v > 0"}
    assert t.constraints() == {}


def test_update_and_merge_enforced(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_constraint(spark, "v_pos", "v > 0")
    with pytest.raises(CheckError, match="v_pos"):
        t.update_where(spark, F.col("id") == 1, {"v": F.lit(-9.0)})
    src = spark.createDataFrame([(2, -7.0)], "id bigint, v double")
    with pytest.raises(CheckError, match="v_pos"):
        t.merge(spark, src, on=["id"])
    assert sorted((r.id, r.v) for r in t.read(spark).collect()) == [
        (1, 10.0),
        (2, 20.0),
    ]


def test_missing_constrained_column_refused_and_cleaned(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_constraint(spark, "v_pos", "v > 0")
    n_files = len(os.listdir(t.data_dir))
    with pytest.raises(Exception):
        t.append(spark.createDataFrame([(9,)], "id bigint"))
    assert len(os.listdir(t.data_dir)) == n_files


def test_branch_inherits_and_merge_forwards_ddl(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_constraint(spark, "v_pos", "v > 0")
    b = t.branch("fix")
    assert b.constraints() == {"v_pos": "v > 0"}
    with pytest.raises(CheckError, match="v_pos"):
        b.append(spark.createDataFrame([(3, -1.0)], "id bigint, v double"))
    b.add_constraint(spark, "id_pos", "id > 0")
    b.append(spark.createDataFrame([(3, 3.0)], "id bigint, v double"))
    t.merge_branch(b)
    assert t.constraints() == {"v_pos": "v > 0", "id_pos": "id > 0"}
    with pytest.raises(CheckError, match="id_pos"):
        t.append(spark.createDataFrame([(-4, 4.0)], "id bigint, v double"))


def test_rebase_refuses_constraint_ddl_both_directions(spark, tmp_path):
    # branch carries DDL
    t = _mk(spark, tmp_path)
    b = t.branch("fix")
    b.add_constraint(spark, "v_pos", "v > 0")
    t.append(spark.createDataFrame([(3, 30.0)], "id bigint, v double"))
    with pytest.raises(ValueError, match="CHECK-constraint DDL"):
        t.rebase_branch(b)
    # parent changed constraints after the base
    t2 = _mk(spark, tmp_path / "p2")
    b2 = t2.branch("fix")
    b2.append(spark.createDataFrame([(3, 3.0)], "id bigint, v double"))
    t2.add_constraint(spark, "v_pos", "v > 0")
    with pytest.raises(ValueError, match="changed CHECK constraints"):
        t2.rebase_branch(b2)


def test_read_changes_skips_constraint_commits(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v0 = t.version()
    t.add_constraint(spark, "v_pos", "v > 0")
    t.append(spark.createDataFrame([(3, 3.0)], "id bigint, v double"))
    ch = t.read_changes(spark, v0).collect()
    assert [(r.id, r._change_type) for r in ch] == [(3, "insert")]


def test_connector_writer_refuses_constrained_table(spark, tmp_path):
    # the connector's commit hook runs in a Python worker with no live
    # SparkSession — it cannot scan staged bytes, so rather than
    # silently bypassing the table's contract the write is REFUSED at
    # plan time, pointing at the enforced library paths
    from spark_data_engineering_spark.sources.txn_datasource import TxnDataSource

    spark.dataSource.register(TxnDataSource)
    t = _mk(spark, tmp_path)
    df = spark.createDataFrame([(5, 2.0)], "id bigint, v double")
    df.write.format("txn").mode("append").save(t.table_dir)  # no constraints: fine
    t.add_constraint(spark, "v_pos", "v > 0")
    v0 = t.version()
    with pytest.raises(Exception, match="cannot enforce"):
        df.write.format("txn").mode("append").save(t.table_dir)
    assert t.version() == v0
    t.drop_constraint("v_pos")
    df.write.format("txn").mode("append").save(t.table_dir)
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2, 5, 5]


def test_stream_source_skips_constraint_commits(spark, tmp_path):
    from spark_data_engineering_spark.sources.txn_datasource import TxnDataSource

    spark.dataSource.register(TxnDataSource)
    t = _mk(spark, tmp_path)
    t.add_constraint(spark, "v_pos", "v > 0")
    t.append(spark.createDataFrame([(3, 3.0)], "id bigint, v double"))
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("txn")
        .load(t.table_dir)
        .writeStream.format("memory")
        .queryName("cons_stream_gate")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sorted(
        r.id for r in spark.table("cons_stream_gate").collect()
    ) == [1, 2, 3]
