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


def test_stream_initial_snapshot_applies_existing_dvs(spark, tmp_path):
    """A stream STARTED AFTER a merge-on-read delete must not resurrect
    the deleted rows: the stream-start dv snapshot applies to the files
    it replays as the initial snapshot (batch-read parity), and the
    delete_dv commit itself is skipped, not aborted on."""
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.range(20).repartition(2))
    t.delete_where_dv(spark, F.col("id") % 5 == 0)
    q = (
        spark.readStream.format("txn")
        .load(t.table_dir)
        .writeStream.format("memory")
        .queryName("txn_dv_snap")
        .option("checkpointLocation", str(tmp_path / "ckpt_dv"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(r.id for r in spark.table("txn_dv_snap").collect())
    finally:
        q.stop()
    want = sorted(r.id for r in t.read(spark).collect())
    assert got == want == [i for i in range(20) if i % 5 != 0]


def test_stream_aborts_on_mid_stream_dv_delete(spark, tmp_path):
    """A delete_dv AFTER stream start deletes rows the stream already
    emitted — abort (restart-or-optin), mirroring the rewrite rule."""
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.range(10))
    q = (
        spark.readStream.format("txn")
        .load(t.table_dir)
        .writeStream.format("memory")
        .queryName("txn_dv_abort")
        .option("checkpointLocation", str(tmp_path / "ckpt_dva"))
        .start()
    )
    try:
        q.processAllAvailable()
        t.delete_where_dv(spark, F.col("id") == 1)
        with pytest.raises(
            Exception, match="ignoreChanges|StreamingQueryException|row-deletion"
        ):
            q.processAllAvailable()
    finally:
        q.stop()


def test_stream_over_a_branch_matches_batch(spark, tmp_path):
    """Streaming a BRANCH path: the seed commit is the line's initial
    snapshot (allowed — nothing re-emitted), inherited dv positions
    apply, and branch appends tail in; end state == batch read."""
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.range(30).repartition(2))
    t.delete_where_dv(spark, F.col("id") % 10 == 0)  # inherited deletes
    b = t.branch("exp")
    b.append(spark.range(100, 105))
    q = (
        spark.readStream.format("txn")
        .load(b.table_dir)
        .writeStream.format("memory")
        .queryName("txn_branch_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt_b"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(r.id for r in spark.table("txn_branch_stream").collect())
    finally:
        q.stop()
    want = sorted(r.id for r in b.read(spark).collect())
    assert got == want == [i for i in range(30) if i % 10 != 0] + list(
        range(100, 105)
    )


def test_fresh_stream_over_rewritten_history_is_initial_snapshot(spark, tmp_path):
    """A FRESH stream over a table whose log contains rewrites
    (overwrite, compact, restore) must emit the live state at stream
    start — initial-snapshot semantics, not a log replay — with no
    ignoreChanges opt-in, no aborts, and no double emission. Mid-stream
    appends still tail in."""
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.range(10))
    t.overwrite(spark.range(100, 105))
    t.compact(spark)
    t.restore(2)  # back to the overwrite state
    q = (
        spark.readStream.format("txn")
        .load(t.table_dir)
        .writeStream.format("memory")
        .queryName("txn_snapshot_mode")
        .option("checkpointLocation", str(tmp_path / "ckpt_snap"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert sorted(r.id for r in spark.table("txn_snapshot_mode").collect()) == list(
            range(100, 105)
        )
        t.append(spark.range(7, 9))
        q.processAllAvailable()
        got = sorted(r.id for r in spark.table("txn_snapshot_mode").collect())
    finally:
        q.stop()
    assert got == [7, 8] + list(range(100, 105))


def test_restarted_stream_aborts_on_delete_landed_while_down(spark, tmp_path):
    """Regression (round-7 review): a DV delete committed while the
    stream was DOWN deletes rows the previous incarnation already
    emitted — the restart must abort-or-optin, not silently skip it
    because the restart-time snapshot version already covers it."""
    spark.dataSource.register(TxnDataSource)
    t = TxnTable(str(tmp_path), "t")
    t.append(spark.range(6).withColumn("v", F.lit(1).cast("long")))

    def run():
        q = (
            spark.readStream.format("txn")
            .load(t.table_dir)
            .writeStream.format("txn")
            .option("txnAppId", "r")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start(str(tmp_path / "dst"))
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run()  # snapshot emitted
    t.delete_where_dv(spark, F.col("id") == 3)  # lands while down
    with pytest.raises(Exception, match="retract"):
        run()
    # opt-in keeps going (documented: no retraction)
    q = (
        spark.readStream.format("txn")
        .option("ignoreChanges", "true")
        .load(t.table_dir)
        .writeStream.format("txn")
        .option("txnAppId", "r")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start(str(tmp_path / "dst"))
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    dst = TxnTable(str(tmp_path), "dst")
    assert sorted(r.id for r in dst.read(spark).collect()) == list(range(6))


def test_reader_splits_large_files_by_row_group(spark, tmp_path):
    """Scan parallelism is bounded by bytes, not file count: a file
    larger than maxPartitionBytes splits into row-group chunks at
    planning time, deletion-vector positions (file-global) rebase per
    chunk, and the result is identical to the whole-file read."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_data_engineering_spark.sources.txn import TxnTable
    from spark_data_engineering_spark.sources.txn_datasource import (
        TxnBatchReader,
    )

    t = TxnTable(str(tmp_path), "t")
    t.append(
        spark.range(10_000).withColumn("v", F.col("id") * 2).coalesce(1)
    )
    # rewrite the single data file with SMALL row groups (the staged
    # file is one rg; real 1 GB files carry ~8) — same bytes, same name
    import os

    name = t.live_files()[0]
    path = os.path.join(t.data_dir, name)
    tbl = pq.read_table(path)
    pq.write_table(tbl, path, row_group_size=1000)
    # DV-delete a stripe spanning several row groups
    t.delete_where_dv(spark, (F.col("id") >= 1500) & (F.col("id") < 3500))

    reader = TxnBatchReader(t.table_dir, t.read(spark).schema, split_bytes=1)
    parts = reader.partitions()
    assert len(parts) == 10  # one per row group at split_bytes=1
    offs = sorted(p.row_offset for p in parts)
    assert offs == [i * 1000 for i in range(10)]

    spark.dataSource.register(__import__(
        "spark_data_engineering_spark.sources.txn_datasource",
        fromlist=["TxnDataSource"],
    ).TxnDataSource)
    got = (
        spark.read.format("txn")
        .option("maxPartitionBytes", "1")
        .load(t.table_dir)
    )
    assert got.rdd.getNumPartitions() == 10
    ids = sorted(r.id for r in got.collect())
    assert ids == [i for i in range(10_000) if not (1500 <= i < 3500)]
    # and the default (no option): one partition, same answer
    whole = sorted(
        r.id for r in spark.read.format("txn").load(t.table_dir).collect()
    )
    assert whole == ids
