"""Nested-field type widening (round 13; VERDICT r12 task 3 — Delta
4.0 typeWidening covers nested struct fields and array/map value
types): ``widen_column`` takes a dotted path (``meta.id``,
``xs.element``, ``m.value``), the lattice check and the
``_merge_schema_lists`` JOIN recurse per leaf, reads upcast nested
narrow pages through the explicit read schema, and map keys / nested
narrowing are refused."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable


def _nested(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl).coalesce(1)


NARROW = "k int, meta struct<id:int,score:float>, xs array<int>, m map<string,int>"


def _narrow_rows(spark, *ks):
    return _nested(
        spark,
        [(k, (k * 10, float(k)), [k, k + 1], {"n": k}) for k in ks],
        NARROW,
    )


# ---- struct field ------------------------------------------------------


def test_widen_struct_field_reads_old_pages(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(_narrow_rows(spark, 1, 2))
    v_narrow = t.version()
    t.widen_column(spark, "meta.id", "bigint")
    rec = t._read_commit(t.version())
    assert rec["action"] == "widen_column"
    assert rec["add"] == [] and rec["remove"] == []
    # post-widen write with a value int32 cannot hold, nested
    wide = "k int, meta struct<id:bigint,score:float>, xs array<int>, m map<string,int>"
    t.append(
        _nested(spark, [(9, (2**40, 9.0), [9], {"n": 9})], wide)
    )
    df = t.read(spark)
    assert dict(df.dtypes)["meta"] == "struct<id:bigint,score:float>"
    assert sorted(r.meta.id for r in df.collect()) == [10, 20, 2**40]
    # old snapshot replays the narrow nested schema
    old = t.read(spark, v_narrow)
    assert dict(old.dtypes)["meta"] == "struct<id:int,score:float>"
    assert t.fsck()["ok"]


def test_widen_array_element_and_map_value(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(_narrow_rows(spark, 1))
    t.widen_column(spark, "xs.element", "bigint")
    t.widen_column(spark, "m.value", "bigint")
    wide = (
        "k int, meta struct<id:int,score:float>, xs array<bigint>, "
        "m map<string,bigint>"
    )
    t.append(
        _nested(spark, [(2, (20, 2.0), [2**40], {"n": 2**40})], wide)
    )
    df = t.read(spark)
    assert dict(df.dtypes)["xs"] == "array<bigint>"
    assert dict(df.dtypes)["m"] == "map<string,bigint>"
    got = {r.k: (r.xs, r.m) for r in df.collect()}
    assert got[1] == ([1, 2], {"n": 1})
    assert got[2] == ([2**40], {"n": 2**40})


def test_widen_deep_path_struct_in_array(spark, tmp_path):
    ddl = "k int, recs array<struct<v:int>>"
    t = TxnTable(str(tmp_path), "t")
    t.append(_nested(spark, [(1, [Row(v=5)])], ddl))
    t.widen_column(spark, "recs.element.v", "bigint")
    t.append(
        _nested(
            spark,
            [(2, [Row(v=2**40)])],
            "k int, recs array<struct<v:bigint>>",
        )
    )
    df = t.read(spark)
    assert dict(df.dtypes)["recs"] == "array<struct<v:bigint>>"
    assert sorted(r.recs[0].v for r in df.collect()) == [5, 2**40]


def test_widen_nested_float_and_decimal(spark, tmp_path):
    ddl = "k int, meta struct<score:float,amt:decimal(5,2)>"
    t = TxnTable(str(tmp_path), "t")
    t.append(
        spark.createDataFrame(
            [Row(k=1, meta=Row(score=1.5, amt=None))], ddl
        ).coalesce(1)
    )
    t.widen_column(spark, "meta.score", "double")
    t.widen_column(spark, "meta.amt", "decimal(12,2)")
    assert (
        dict(t.read(spark).dtypes)["meta"]
        == "struct<score:double,amt:decimal(12,2)>"
    )
    assert t.read(spark).where(F.col("meta.score") == 1.5).count() == 1


# ---- narrow writers stay accepted --------------------------------------


def test_narrow_nested_batch_still_accepted_after_widen(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(_narrow_rows(spark, 1))
    t.widen_column(spark, "meta.id", "bigint")
    # an old writer still emitting the narrow nested shape stages
    # narrow, reads wide (recursive _is_widening accepts it)
    t.append(_narrow_rows(spark, 7))
    df = t.read(spark)
    assert dict(df.dtypes)["meta"] == "struct<id:bigint,score:float>"
    assert sorted(r.meta.id for r in df.collect()) == [10, 70]


def test_wider_nested_batch_refused_without_widen(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(_narrow_rows(spark, 1))
    wide = (
        "k int, meta struct<id:bigint,score:float>, xs array<int>, "
        "m map<string,int>"
    )
    with pytest.raises(ValueError, match="schema enforcement"):
        t.append(_nested(spark, [(2, (2, 2.0), [2], {"n": 2})], wide))


# ---- refusals ----------------------------------------------------------


def test_nested_refusals(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(_narrow_rows(spark, 1))
    with pytest.raises(ValueError, match="nothing to widen"):
        t.widen_column(spark, "meta.score", "float")  # same type (leaf)
    with pytest.raises(ValueError, match="not a widening"):
        t.widen_column(spark, "meta.score", "int")  # cross-family leaf
    with pytest.raises(ValueError, match="not a widening"):
        t.widen_column(spark, "meta.id", "string")  # cross-family
    with pytest.raises(ValueError, match="map KEY"):
        t.widen_column(spark, "m.key", "bigint")
    with pytest.raises(ValueError, match="no nested field"):
        t.widen_column(spark, "meta.nope", "bigint")
    with pytest.raises(ValueError, match="cannot descend"):
        t.widen_column(spark, "k.sub", "bigint")  # atomic root
    with pytest.raises(ValueError, match="'element'"):
        t.widen_column(spark, "xs.item", "bigint")  # wrong array seg
    with pytest.raises(ValueError, match="'value'"):
        t.widen_column(spark, "m.val", "bigint")  # wrong map seg
    with pytest.raises(ValueError, match="no column"):
        t.widen_column(spark, "ghost.f", "bigint")


def test_nested_narrowing_refused_whole_struct(spark, tmp_path):
    # widening the WHOLE struct type at once is allowed only when every
    # leaf is equal-or-wider; a mixed wider/narrower struct is refused
    t = TxnTable(str(tmp_path), "t")
    t.append(_narrow_rows(spark, 1))
    with pytest.raises(ValueError, match="not a widening"):
        t.widen_column(spark, "meta", "struct<id:bigint,score:int>")
    t.widen_column(spark, "meta", "struct<id:bigint,score:double>")
    assert (
        dict(t.read(spark).dtypes)["meta"]
        == "struct<id:bigint,score:double>"
    )


# ---- the per-leaf lattice JOIN -----------------------------------------


def _struct(**leaves):
    return {
        "type": "struct",
        "fields": [
            {"name": n, "type": t, "nullable": True, "metadata": {}}
            for n, t in leaves.items()
        ],
    }


def test_join_types_converges_racing_nested_widens():
    a = _struct(x="long", y="integer")  # widened x
    b = _struct(x="integer", y="long")  # widened y
    j = TxnTable._join_types(a, b)
    assert j == _struct(x="long", y="long")
    # directional test is False both ways — exactly why the JOIN exists
    assert not TxnTable._is_widening(a, b)
    assert not TxnTable._is_widening(b, a)
    # incomparable leaves -> None (conflict, not a join)
    c = _struct(x="string", y="integer")
    assert TxnTable._join_types(a, c) is None
    # map keys never join across types
    ma = {"type": "map", "keyType": "integer", "valueType": "integer",
          "valueContainsNull": True}
    mb = {"type": "map", "keyType": "long", "valueType": "integer",
          "valueContainsNull": True}
    assert TxnTable._join_types(ma, mb) is None


def test_merge_schema_lists_joins_nested_collision():
    base = [{"name": "meta", "type": _struct(x="long", y="integer")}]
    incoming = [{"name": "meta", "type": _struct(x="integer", y="long")}]
    merged = TxnTable._merge_schema_lists(base, incoming)
    assert merged[0]["type"] == _struct(x="long", y="long")
    # incomparable collision keeps base (refused upstream at write time)
    bad = [{"name": "meta", "type": _struct(x="string", y="integer")}]
    merged2 = TxnTable._merge_schema_lists(base, bad)
    assert merged2[0]["type"] == _struct(x="long", y="integer")


def test_merge_auto_widens_nested_with_schema_evolution(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    t.append(
        spark.createDataFrame(
            [Row(k=1, meta=Row(id=10))], "k int, meta struct<id:int>"
        ).coalesce(1)
    )
    src = spark.createDataFrame(
        [Row(k=2, meta=Row(id=2**40))], "k int, meta struct<id:bigint>"
    ).coalesce(1)
    with pytest.raises(ValueError, match="schema enforcement"):
        t.merge(spark, src, on=["k"])  # strict default still refuses
    t.merge(spark, src, on=["k"], schema_evolution=True)
    df = t.read(spark)
    assert dict(df.dtypes)["meta"] == "struct<id:bigint>"
    assert sorted(r.meta.id for r in df.collect()) == [10, 2**40]


def test_stream_aborts_on_mid_stream_nested_widen(spark, tmp_path):
    # parity with the flat case: the abort keys on the widen_column
    # ACTION string, so a nested widen inherits the restart contract
    from spark_data_engineering_spark.sources.txn_datasource import (
        TxnStreamReader,
    )

    t = TxnTable(str(tmp_path), "t")
    t.append(_narrow_rows(spark, 1))
    reader = TxnStreamReader(
        t.table_dir, t.read(spark).schema, ignore_changes=False
    )
    start = reader.latestOffset()  # snapshot drained; tail from here
    t.widen_column(spark, "meta.id", "bigint")
    t.append(_narrow_rows(spark, 2))
    end = reader.latestOffset()
    with pytest.raises(RuntimeError, match="widen_column.*restart"):
        reader.partitions(start, end)
