"""Z-ORDER typed ranks + liquid-clustering analog.

- _zrank: string columns rank by their first 6 UTF-8 bytes (preserves
  lexicographic byte order — the order string min/max pruning uses);
  dates/timestamps rank as epoch offsets; unsupported types refuse
  loudly instead of silently producing an unclustered table.
- cluster_by TBLPROPERTY: compact() and compact_small() apply the
  declared clustering automatically when no explicit zorder_by is given.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable


@pytest.fixture()
def strings_table(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"), "t")
    # 26 prefixes x 40 rows, shuffled across input files so pre-compact
    # files span the whole alphabet (no accidental clustering)
    df = (
        spark.range(1040)
        .withColumn("s", F.concat(F.chr(F.lit(97) + F.col("id") % 26), F.lit("_doc")))
        .withColumn("x", (F.col("id") * 37 % 1000).cast("long"))
        .repartition(8)
    )
    t.append(df)
    return t


def test_zorder_on_string_column_prunes(spark, strings_table):
    t = strings_table
    before = len(t.prune_files({"s": ("m", "n")}))
    t.compact(spark, target_file_bytes=4096, zorder_by=["s"])
    live = t.live_files()
    pruned = t.prune_files({"s": ("m", "n")})
    # clustering by the string column makes range pruning selective
    assert len(pruned) < len(live)
    assert len(live) > 3  # the bar means something: several output files
    # correctness: the clustered table reads back identically
    assert t.read(spark).count() == 1040
    got = sorted(
        r.s for r in t.read(spark).filter(F.col("s").startswith("m")).collect()
    )
    assert got == ["m_doc"] * 40


def test_zrank_string_preserves_byte_order(spark):
    df = spark.createDataFrame(
        [("abc",), ("b",), ("ab",), ("z",), ("",)], ["s"]
    )
    ranks = {
        r.s: r.rank
        for r in df.select("s", TxnTable._zrank(df, "s").alias("rank")).collect()
    }
    # lexicographic byte order must survive the numeric proxy —
    # in particular "b" > "abc" even though it is shorter
    assert ranks[""] < ranks["ab"] < ranks["abc"] < ranks["b"] < ranks["z"]


def test_zorder_refuses_unsupported_type(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"), "t")
    t.append(
        spark.range(10).withColumn("arr", F.array(F.col("id"))).coalesce(1)
    )
    with pytest.raises(ValueError, match="unsupported type"):
        t.compact(spark, zorder_by=["arr"])
    with pytest.raises(ValueError, match="unknown columns"):
        t.compact(spark, zorder_by=["nope"])


def test_cluster_by_property_drives_compact(spark, strings_table):
    t = strings_table
    t.set_properties({"cluster_by": "x"})
    t.compact(spark, target_file_bytes=4096)  # no explicit zorder_by
    live = t.live_files()
    pruned = t.prune_files({"x": (100, 150)})
    assert len(pruned) < len(live)
    assert t.read(spark).count() == 1040


def test_cluster_by_property_drives_compact_small(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"), "t")
    t.set_properties({"cluster_by": "id"})
    # many small appends (a streaming sink's file pattern)
    for lo in range(0, 1000, 100):
        t.append(
            spark.range(lo, lo + 100)
            .withColumn("v", F.col("id") * 1.0)
            .coalesce(1)
        )
    t.compact_small(spark, small_bytes=1 << 20, min_files=4, target_file_bytes=8192)
    live = t.live_files()
    pruned = t.prune_files({"id": (0, 50)})
    # hygiene pass applied the declared clustering: range pruning works
    assert len(pruned) < len(live)
    assert sorted(r.id for r in t.read(spark).collect()) == list(range(1000))
