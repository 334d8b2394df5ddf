"""Log-level column rename/drop: metadata-only ALTER TABLE with
per-version schema replay (Delta column-mapping semantics, by name)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable


def _t(spark, tmp_path, name="t"):
    t = TxnTable(str(tmp_path), name)
    t.append(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0)], "id bigint, tag string, amt double"
        ).coalesce(1)
    )
    return t


def test_rename_is_metadata_only_and_versioned(spark, tmp_path):
    t = _t(spark, tmp_path)
    v1 = t.version()
    files_before = t.live_files()
    t.rename_column(spark, "tag", "label")
    assert t.live_files() == files_before  # no file touched
    assert t.read(spark).columns == ["id", "label", "amt"]
    assert sorted(r.label for r in t.read(spark).collect()) == ["a", "b"]
    # the old snapshot still speaks the old schema
    assert t.read(spark, at_version=v1).columns == ["id", "tag", "amt"]


def test_rename_then_append_new_name_coalesces(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.rename_column(spark, "tag", "label")
    t.append(
        spark.createDataFrame(
            [(3, "c", 30.0)], "id bigint, label string, amt double"
        ).coalesce(1)
    )
    rows = {(r.id, r.label) for r in t.read(spark).collect()}
    assert rows == {(1, "a"), (2, "b"), (3, "c")}  # old files via prev_names


def test_append_with_old_name_maps_to_renamed_entry(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.rename_column(spark, "tag", "label")
    # a stale writer still emitting 'tag' must not re-add a dead column
    t.append(
        spark.createDataFrame(
            [(4, "d", 40.0)], "id bigint, tag string, amt double"
        ).coalesce(1)
    )
    df = t.read(spark)
    assert df.columns == ["id", "label", "amt"]
    assert (4, "d") in {(r.id, r.label) for r in df.collect()}


def test_drop_hides_column_and_blocks_readd(spark, tmp_path):
    t = _t(spark, tmp_path)
    v1 = t.version()
    t.drop_column(spark, "tag")
    assert t.read(spark).columns == ["id", "amt"]
    assert t.read(spark, at_version=v1).columns == ["id", "tag", "amt"]
    with pytest.raises(ValueError, match="dropped"):
        t.append(
            spark.createDataFrame(
                [(9, "zzz", 1.0)], "id bigint, tag string, amt double"
            ).coalesce(1)
        )
    # appending WITHOUT the dropped column is normal life
    t.append(spark.createDataFrame([(5, 50.0)], "id bigint, amt double").coalesce(1))
    assert t.read(spark).count() == 3


def test_rename_missing_and_conflicts(spark, tmp_path):
    t = _t(spark, tmp_path)
    with pytest.raises(ValueError, match="no column"):
        t.rename_column(spark, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column(spark, "tag", "amt")
    with pytest.raises(ValueError, match="no column"):
        t.drop_column(spark, "nope")


def test_rename_interacts_with_compact_and_dv(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.rename_column(spark, "tag", "label")
    t.delete_where_dv(spark, F.col("label") == "a")
    t.compact(spark, target_file_bytes=1 << 20)
    # compacted files are written under the NEW physical name
    assert sorted((r.id, r.label) for r in t.read(spark).collect()) == [(2, "b")]
