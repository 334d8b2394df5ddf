"""Per-file bloom index in the commit log: point-lookup data skipping
with zero false negatives (Delta/Iceberg bloom-filter-index analog)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable


def _table(spark, tmp_path, n=600, files=6):
    t = TxnTable(str(tmp_path), "b", bloom_cols=("k",))
    # keys deliberately interleaved so every file's [min,max] spans the
    # whole domain — range stats prune NOTHING, only the bloom can
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(n)], "k bigint, v string"
    ).repartition(files)
    t.append(df)
    return t


def test_point_lookup_skips_files_no_false_negatives(spark, tmp_path):
    t = _table(spark, tmp_path)
    all_files = t.live_files()
    assert len(all_files) == 6
    # range stats alone keep (nearly) everything — hash-interleaved keys
    # make every file's [min,max] span most of the domain
    assert len(t.prune_files({"k": (17, 17)})) >= len(all_files) - 1
    skipped_any = False
    for k in range(0, 600, 37):  # present keys: never a false negative
        files = t.prune_files(None, equals={"k": k})
        rows = (
            t.read(spark, prune_eq={"k": k}).filter(F.col("k") == k).collect()
        )
        assert [r.v for r in rows] == [f"v{k}"]
        if len(files) < len(all_files):
            skipped_any = True
    assert skipped_any, "bloom never pruned a file"
    # absent keys: typically every file pruned (fpp-bounded)
    pruned_all = sum(
        1
        for k in range(10_000, 10_050)
        if t.prune_files(None, equals={"k": k}) == []
    )
    assert pruned_all >= 45  # k=4, ~16 bits/key -> fpp well under 10%


def test_string_bloom_and_absent_column(spark, tmp_path):
    t = TxnTable(str(tmp_path), "s", bloom_cols=("name", "missing"))
    t.append(
        spark.createDataFrame(
            [(i, f"user{i}") for i in range(100)], "id bigint, name string"
        ).repartition(4)
    )
    assert t.prune_files(None, equals={"name": "user7"}) != []
    assert (
        t.read(spark, prune_eq={"name": "user7"})
        .filter(F.col("name") == "user7")
        .count()
        == 1
    )
    assert t.prune_files(None, equals={"name": "nobody-here"}) == []
    # a column with no bloom recorded: conservatively kept
    assert t.prune_files(None, equals={"id": 5}) != []


def test_bloom_survives_compact_and_dv(spark, tmp_path):
    t = _table(spark, tmp_path, n=200, files=4)
    t.delete_where_dv(spark, F.col("k") < 10)
    t.compact(spark, target_file_bytes=1 << 20)
    # compact restaged the files -> fresh blooms over surviving rows
    assert t.prune_files(None, equals={"k": 150}) != []
    got = t.read(spark, prune_eq={"k": 150}).filter(F.col("k") == 150).collect()
    assert [r.v for r in got] == ["v150"]
    # DV-deleted keys are physically gone post-compact; their bloom
    # entries may or may not fire (fpp), but the read is empty
    assert (
        t.read(spark, prune_eq={"k": 3}).filter(F.col("k") == 3).count() == 0
    )
