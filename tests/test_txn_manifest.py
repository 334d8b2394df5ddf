"""GENERATE symlink_format_manifest: external engines read a pinned
snapshot through newline-delimited absolute file paths, without the
commit log. Outstanding DVs refuse (an external reader can't apply
them); partitioned tables get hive col=value manifest dirs; the
manifest swap is atomic per call."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable


def _paths(mdir):
    out = []
    for dirpath, _dirs, files in os.walk(mdir):
        for f in files:
            if f == "manifest":
                with open(os.path.join(dirpath, f)) as fh:
                    out.extend(p for p in fh.read().splitlines() if p)
    return out


def test_manifest_reads_back_exactly(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"), "t")
    df = spark.range(500).withColumn("x", (F.col("id") % 7).cast("long"))
    t.append(df.repartition(3))
    t.delete_where(spark, F.col("id") < 50)  # copy-on-write: no DVs
    mdir = t.generate_manifest()
    paths = _paths(mdir)
    assert paths and all(os.path.isabs(p) for p in paths)
    got = spark.read.parquet(*paths)
    assert got.count() == 450
    assert sorted(r.id for r in got.collect()) == list(range(50, 500))


def test_manifest_refuses_outstanding_dvs_then_purge_unblocks(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"), "t")
    t.append(spark.range(100).withColumn("x", F.lit(1)).coalesce(1))
    t.delete_where_dv(spark, F.col("id") < 10)
    with pytest.raises(ValueError, match="deletion-vector"):
        t.generate_manifest()
    t.reorg_purge(spark)
    paths = _paths(t.generate_manifest())
    assert spark.read.parquet(*paths).count() == 90


def test_partitioned_manifest_uses_hive_dirs(spark, tmp_path):
    t = TxnTable(str(tmp_path / "p"), "p", partition_cols=("s",))
    df = spark.range(200).withColumn(
        "s", F.when(F.col("id") % 2 == 0, "a").otherwise("b")
    )
    t.append(df)
    mdir = t.generate_manifest()
    assert os.path.isfile(os.path.join(mdir, "s=a", "manifest"))
    assert os.path.isfile(os.path.join(mdir, "s=b", "manifest"))
    only_a = _paths(os.path.join(mdir, "s=a"))
    got = spark.read.parquet(*only_a)
    assert got.filter(F.col("s") != "a").count() == 0
    assert got.count() == 100


def test_manifest_rebuild_tracks_versions(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"), "t")
    t.append(spark.range(10).withColumn("x", F.lit(1)).coalesce(1))
    v1_paths = set(_paths(t.generate_manifest()))
    t.append(spark.range(10, 30).withColumn("x", F.lit(1)).coalesce(1))
    head_paths = set(_paths(t.generate_manifest()))
    assert v1_paths < head_paths
    # pinned older snapshot: regenerate at v1
    old_paths = set(_paths(t.generate_manifest(at_version=1)))
    assert old_paths == v1_paths


def test_manifest_readable_by_external_engine(spark, tmp_path):
    """True cross-engine interop (round 10): DuckDB — a log-oblivious
    reader that knows nothing about the commit protocol — consumes the
    symlink manifest's file list directly and must reproduce the exact
    snapshot Spark reads through the log, including through a rewrite
    (the manifest pins the files, not the table)."""
    import os

    import duckdb

    from pyspark.sql import Row

    t = TxnTable(str(tmp_path), "t")
    t.append(
        spark.createDataFrame([Row(k=i, v=i * 2.0) for i in range(50)])
    )
    t.delete_where(spark, F.col("k") >= 40)  # rewrite: 40..49 gone
    path = t.generate_manifest()
    files = [
        ln
        for ln in open(os.path.join(path, "manifest")).read().splitlines()
        if ln
    ]
    con = duckdb.connect()
    got = con.execute(
        "SELECT k, v FROM read_parquet($1) ORDER BY k", [files]
    ).fetchall()
    want = sorted(
        (r.k, r.v) for r in t.read(spark).collect()
    )
    assert got == [tuple(r) for r in want]
    assert len(got) == 40


def test_hive_origin_partitioned_manifest_external_read(spark, tmp_path):
    """A hive-origin table's data files LACK the partition columns, and
    that is fine for symlink-manifest consumers BY DESIGN: the manifest
    is laid out as hive ``col=value`` dirs, so an external engine
    derives the partition value from the manifest path — the same
    discovery it runs on any hive layout. Pinned with DuckDB playing
    the external engine."""
    import os

    import duckdb

    from pyspark.sql import Row

    corpus = str(tmp_path / "corpus")
    spark.createDataFrame(
        [Row(k=i, part=("a" if i % 2 == 0 else "b")) for i in range(20)]
    ).write.partitionBy("part").parquet(corpus)
    t = TxnTable.convert_from_parquet(spark, str(tmp_path), "t", corpus)
    root = t.generate_manifest()
    con = duckdb.connect()
    got = []
    for d in sorted(os.listdir(root)):
        mf = os.path.join(root, d, "manifest")
        if not os.path.isfile(mf):
            continue
        pv = d.split("=", 1)[1]  # external partition discovery
        files = [ln for ln in open(mf).read().splitlines() if ln]
        got += [
            (k, pv)
            for (k,) in con.execute(
                "SELECT k FROM read_parquet($1)", [files]
            ).fetchall()
        ]
    want = sorted((r.k, r.part) for r in t.read(spark).collect())
    assert sorted(got) == want
