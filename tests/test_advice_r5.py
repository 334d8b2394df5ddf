"""Regression tests for the round-5 ADVICE findings (all in the txn
table format / datasource):

1. (high) Rewrite-vs-DV conflict must be checked in BOTH directions: a
   deletion vector landing between a rewrite's snapshot read and its
   commit must abort the rewrite — otherwise the rewrite re-emits the
   DV-deleted rows from its pre-DV survivor set and the remove pops the
   DV's counts (silent un-delete).
2. (medium) rename_column must refuse a target name that collides with
   a dropped column's tombstone or a prior rename's physical name —
   old files still hold bytes under those names and _conform's coalesce
   reads the physical name first (stale-value resurrection).
3. (low) _bloom_might_contain must conservatively keep (not crash) on a
   point-lookup value outside int64 range.
4. (low) format("txn") must apply the LOGICAL schema (renames coalesce
   prev_names, dropped columns never surface), matching TxnTable.read.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import (
    ConcurrentWriteError,
    TxnTable,
    _bloom_might_contain,
    _file_bloom,
)
from spark_data_engineering_spark.sources.txn_datasource import TxnDataSource


def _table(spark, tmp_path, name, n=30, files=3):
    t = TxnTable(str(tmp_path), name)
    t.append(spark.range(n).withColumn("v", F.col("id") * 2).repartition(files))
    return t


# ---- 1. rewrite-vs-DV write skew ---------------------------------------


def test_rewrite_refused_when_dv_lands_after_its_snapshot(spark, tmp_path):
    t = _table(spark, tmp_path, "skew")
    v0 = t.version()
    live_at_v0 = t.live_files(v0)
    # a DV delete lands AFTER the rewrite's snapshot read...
    t.delete_where_dv(spark, F.col("id") < 5)
    # ...so a rewrite whose survivors were computed at v0 must abort:
    # its output predates the DV and would resurrect the deleted rows
    with pytest.raises(ConcurrentWriteError, match="deletion.*vector"):
        t._commit("delete", [], live_at_v0, {}, base_version=v0)
    # the DV's effect is intact
    assert t.read(spark).count() == 25


def test_rewrite_sees_dv_landed_before_its_snapshot(spark, tmp_path):
    # sequential DV -> rewrite is legal: the rewrite's snapshot already
    # filters the DV positions, nothing resurrects
    t = _table(spark, tmp_path, "seq")
    t.delete_where_dv(spark, F.col("id") < 5)
    t.delete_where(spark, F.col("id") >= 25)  # rewrite at fresh snapshot
    assert sorted(r.id for r in t.read(spark).collect()) == list(range(5, 25))
    # compact (also a rewrite) materializes the DV without conflict
    t.compact(spark)
    assert sorted(r.id for r in t.read(spark).collect()) == list(range(5, 25))


def test_merge_refused_when_dv_lands_after_its_snapshot(spark, tmp_path, monkeypatch):
    t = _table(spark, tmp_path, "mskew", n=10, files=1)
    src = spark.createDataFrame([(3, 999)], "id bigint, v bigint")
    # interleave: let merge pin its snapshot, then land a DV before the
    # commit by hooking the staging step (runs after snapshot, before
    # _commit)
    orig_stage = t._stage_nonempty
    fired = {}

    def stage_then_dv(df):
        out = orig_stage(df)
        if not fired:
            fired["x"] = True
            t.delete_where_dv(spark, F.col("id") == 7)
        return out

    monkeypatch.setattr(t, "_stage_nonempty", stage_then_dv)
    with pytest.raises(ConcurrentWriteError, match="deletion.*vector"):
        t.merge(spark, src, on=["id"])
    # the DV delete survived; the merge did not land
    ids = sorted(r.id for r in t.read(spark).collect())
    assert ids == [0, 1, 2, 3, 4, 5, 6, 8, 9]


# ---- 2. rename collisions with dead physical names ---------------------


def test_rename_onto_dropped_tombstone_refused(spark, tmp_path):
    t = TxnTable(str(tmp_path), "ren")
    t.append(spark.range(5).select("id", F.lit(1).alias("a"), F.lit(2).alias("b")))
    t.drop_column(spark, "a")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column(spark, "b", "a")
    # and reads never see a phantom duplicate
    assert set(t.read(spark).columns) == {"id", "b"}


def test_rename_onto_prior_physical_name_refused(spark, tmp_path):
    t = TxnTable(str(tmp_path), "ren2")
    t.append(spark.range(5).select("id", F.lit(1).alias("a"), F.lit(2).alias("c")))
    t.rename_column(spark, "a", "b")  # physical 'a' bytes live in old files
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column(spark, "c", "a")
    # legal rename to a fresh name still works and reads old bytes
    t.rename_column(spark, "c", "d")
    row = t.read(spark).select("b", "d").first()
    assert (row.b, row.d) == (1, 2)


# ---- 3. bloom point lookup outside int64 -------------------------------


def test_bloom_out_of_range_value_is_conservative_keep(spark, tmp_path):
    t = TxnTable(str(tmp_path), "bl", bloom_cols=("id",))
    t.append(spark.range(100))
    # beyond int64: no stored value can match, but the probe must not
    # crash — conservative keep, exact filter still applies
    huge = 2**64 + 17
    # footer min/max legitimately prunes the out-of-range literal; the
    # point is that the path must not crash in the bloom probe
    t.prune_files(None, equals={"id": huge})
    # (Spark itself cannot build a >int64 literal for the exact filter;
    # the contract under test is only that pruning doesn't crash)
    t.read(spark, prune_eq={"id": huge})
    # unit-level: the probe itself returns True for both signs
    path = [p for p in __import__("os").listdir(t.data_dir)][0]
    entry = _file_bloom(__import__("os").path.join(t.data_dir, path), "id")
    assert entry is not None and entry[2] == "sm64"
    assert _bloom_might_contain(entry, huge) is True
    assert _bloom_might_contain(entry, -(2**70)) is True


# ---- 4. datasource reads the logical schema ----------------------------


def test_datasource_matches_table_read_after_rename_and_drop(spark, tmp_path):
    spark.dataSource.register(TxnDataSource)
    t = TxnTable(str(tmp_path), "evo")
    t.append(spark.range(4).select("id", (F.col("id") * 10).alias("amt"), F.lit("x").alias("junk")))
    t.rename_column(spark, "amt", "amount")
    t.drop_column(spark, "junk")
    # post-evolution append writes the NEW physical name
    t.append(
        spark.createDataFrame([(100, 1000)], "id bigint, amount bigint")
    )
    via_ds = spark.read.format("txn").load(t.table_dir)
    via_tbl = t.read(spark)
    assert via_ds.columns == via_tbl.columns == ["id", "amount"]
    got = sorted((r.id, r.amount) for r in via_ds.collect())
    want = sorted((r.id, r.amount) for r in via_tbl.collect())
    assert got == want
    assert (100, 1000) in got and (0, 0) in got


def test_datasource_stream_applies_logical_schema(spark, tmp_path):
    spark.dataSource.register(TxnDataSource)
    t = TxnTable(str(tmp_path), "sevo")
    t.append(spark.range(3).select("id", (F.col("id") * 10).alias("amt")))
    t.rename_column(spark, "amt", "amount")
    # post-rename appends write the new physical name; the stream must
    # surface BOTH generations under the logical name
    t.append(spark.createDataFrame([(50, 500)], "id bigint, amount bigint"))
    q = (
        spark.readStream.format("txn")
        .load(t.table_dir)
        .writeStream.format("memory")
        .queryName("txn_evo_tail")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
        rows = {(r.id, r.amount) for r in spark.table("txn_evo_tail").collect()}
    finally:
        q.stop()
    assert rows == {(0, 0), (1, 10), (2, 20), (50, 500)}
