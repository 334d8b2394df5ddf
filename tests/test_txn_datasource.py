"""format("txn") Python data source: batch snapshot reads, streaming
commit-log tail, non-append abort + ignoreChanges escape hatch."""

import pytest
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable
from spark_data_engineering_spark.sources.txn_datasource import TxnDataSource


@pytest.fixture(autouse=True)
def _register(spark):
    spark.dataSource.register(TxnDataSource)


def test_batch_read_matches_table(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.range(5).withColumn("v", F.col("id") * 2.0))
    t.append(spark.range(5, 8).withColumn("v", F.col("id") * 2.0))
    df = spark.read.format("txn").load(t.table_dir)
    got = {(r.id, r.v) for r in df.collect()}
    want = {(r.id, r.v) for r in t.read(spark).collect()}
    assert got == want and len(got) == 8


def test_stream_tails_appends(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.range(3))
    q = (
        spark.readStream.format("txn")
        .load(t.table_dir)
        .writeStream.format("memory")
        .queryName("txn_tail")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert {r.id for r in spark.table("txn_tail").collect()} == {0, 1, 2}
        t.append(spark.range(10, 12))
        q.processAllAvailable()
        assert {r.id for r in spark.table("txn_tail").collect()} == {0, 1, 2, 10, 11}
    finally:
        q.stop()


def test_stream_aborts_on_rewrite_without_escape_hatch(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.range(4))
    q = (
        spark.readStream.format("txn")
        .load(t.table_dir)
        .writeStream.format("memory")
        .queryName("txn_abort")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        t.delete_where(spark, F.col("id") == 1)  # a rewrite commit
        with pytest.raises(Exception, match="ignoreChanges|StreamingQueryException|not an append"):
            q.processAllAvailable()
    finally:
        q.stop()


def test_batch_read_applies_deletion_vectors(spark, tmp_path):
    """format('txn') must not resurrect DV-deleted rows: the connector
    snapshots the dv sidecar set with the file set and drops positions
    executor-side."""
    from pyspark.sql import functions as F

    from spark_data_engineering_spark.sources.txn import TxnTable

    t = TxnTable(str(tmp_path), "dvds")
    t.append(
        spark.createDataFrame([(i, i * 10.0) for i in range(40)], "k bigint, x double")
        .repartition(3)
    )
    t.delete_where_dv(spark, F.col("k") % 4 == 0)
    got = sorted(
        r.k for r in spark.read.format("txn").load(str(tmp_path / "dvds")).collect()
    )
    want = sorted(r.k for r in t.read(spark).collect())
    assert got == want == [k for k in range(40) if k % 4 != 0]
