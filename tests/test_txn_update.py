"""``TxnTable.update_where`` — UPDATE ... SET as copy-on-write (Delta
UPDATE, round 8): only files containing matching rows are rewritten,
NULL-predicate rows are not updated, partition-column assignment is
refused, and ``cdf=True`` persists update_preimage/update_postimage
images so the change feed stays streamable."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable
from spark_data_engineering_spark.sources.txn_datasource import TxnDataSource


@pytest.fixture(autouse=True)
def _register(spark):
    spark.dataSource.register(TxnDataSource)


def _mk(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0), (4, "d", 40.0)],
            "id bigint, s string, v double",
        ).repartition(2)
    )
    return t


def test_update_applies_set_and_keeps_others(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v0 = t.version()
    t.update_where(
        spark, F.col("id") <= 2, {"v": F.col("v") * 2, "s": F.upper("s")}
    )
    got = sorted((r.id, r.s, r.v) for r in t.read(spark).collect())
    assert got == [(1, "A", 20.0), (2, "B", 40.0), (3, None, 30.0), (4, "d", 40.0)]
    # time travel: the pre-update snapshot is intact
    old = sorted((r.id, r.v) for r in t.read(spark, at_version=v0).collect())
    assert old == [(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)]


def test_update_null_predicate_rows_not_updated(spark, tmp_path):
    t = _mk(spark, tmp_path)
    # s = NULL on id=3: `s != 'zz'` is NULL there -> row NOT updated
    t.update_where(spark, F.col("s") != "zz", {"v": F.lit(0.0)})
    got = sorted((r.id, r.v) for r in t.read(spark).collect())
    assert got == [(1, 0.0), (2, 0.0), (3, 30.0), (4, 0.0)]


def test_update_only_rewrites_hit_files(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "id bigint, v double"
    )
    t.append(df.repartitionByRange(4, "id"))
    before = set(t.live_files())
    t.update_where(spark, F.col("id") == 0, {"v": F.lit(-1.0)})
    after = set(t.live_files())
    # only the one file containing id=0 was replaced
    assert len(before - after) == 1 and len(after - before) == 1


def test_update_refuses_partition_and_unknown_columns(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t", partition_cols=("s",))
    t.append(
        spark.createDataFrame([(1, "a", 1.0)], "id bigint, s string, v double")
    )
    with pytest.raises(ValueError, match="partition column"):
        t.update_where(spark, F.col("id") == 1, {"s": F.lit("b")})
    with pytest.raises(ValueError, match="no such column"):
        t.update_where(spark, F.col("id") == 1, {"nope": F.lit(1)})
    # non-partition update on a partitioned table keeps value purity
    t.update_where(spark, F.col("id") == 1, {"v": F.lit(9.0)})
    stats = t.file_stats()
    for cols in stats.values():
        assert cols["s"][0] == cols["s"][1] == cols["partitionValues"]["s"]


def test_update_cdf_images_and_stream(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v = t.update_where(
        spark, F.col("id") == 2, {"v": F.col("v") + 5}, cdf=True
    )
    ch = sorted(
        (r.id, r.v, r._change_type)
        for r in t.read_changes(spark, v - 1, v).collect()
    )
    assert ch == [(2, 20.0, "update_preimage"), (2, 25.0, "update_postimage")]
    # streaming CDF consumes the update as images, not an abort
    sign = F.when(
        F.col("_change_type").isin("delete", "update_preimage"), F.lit(-1)
    ).otherwise(F.lit(1))
    q = (
        spark.readStream.format("txn")
        .option("readChangeFeed", "true")
        .option("startingVersion", "0")
        .load(t.table_dir)
        .groupBy("id")
        .agg(F.sum(F.col("v") * sign).alias("vs"))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("upd_cdf_fold")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    folded = {r.id: r.vs for r in spark.table("upd_cdf_fold").collect()}
    state = {r.id: r.v for r in t.read(spark).collect()}
    assert folded == state


def test_update_sql_string_expressions(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.update_where(spark, F.col("id") == 4, {"v": "v * 10"})
    assert {r.id: r.v for r in t.read(spark).collect()}[4] == 400.0
