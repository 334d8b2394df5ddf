"""Partition evolution (VERDICT r10 task 6 — Iceberg spec-v2
semantics): ``set_partitioning`` re-declares the layout at vN as ONE
metadata commit; files keep the partitionValues their own commits
recorded, reads prune each file against its own scheme (the per-scheme
prunes union), hive projection serves per-file recorded columns, FSCK
understands both schemes, and only new writes stage under the new one.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "k int, p string, q string"
    ).coalesce(1)


@pytest.fixture()
def evolved(spark, tmp_path):
    """v1: two appends under scheme (p); v2: evolve to (q); v3: append
    under (q). Distinct value domains so pruning assertions are exact:
    old rows have q='zz', new rows have p='mm'."""
    t = TxnTable(str(tmp_path), "t", partition_cols=("p",))
    t.append(_df(spark, [(1, "a", "zz"), (2, "b", "zz")]))
    t.set_partitioning(spark, ("q",))
    t.append(_df(spark, [(3, "mm", "x"), (4, "mm", "y")]))
    return t


def test_evolution_lifecycle_and_time_travel(spark, evolved):
    t = evolved
    assert t.partition_cols() == ("q",)
    assert t.partition_cols(at_version=1) == ("p",)  # old scheme at v1
    got = {(r.k, r.p, r.q) for r in t.read(spark).collect()}
    assert got == {
        (1, "a", "zz"),
        (2, "b", "zz"),
        (3, "mm", "x"),
        (4, "mm", "y"),
    }
    # a reopened bare handle resolves the evolved scheme from the log
    t2 = TxnTable(t.table_dir.rsplit("/", 1)[0], "t")
    assert t2.partition_cols() == ("q",)
    # files keep their OWN recorded values
    pv = {
        f: st.get("partitionValues")
        for f, st in t.file_stats().items()
    }
    schemes = {tuple(sorted(v)) for v in pv.values()}
    assert schemes == {("p",), ("q",)}


def test_per_scheme_exact_pruning_unions(spark, evolved):
    t = evolved
    old_files = {
        f
        for f, st in t.file_stats().items()
        if "p" in (st.get("partitionValues") or {})
    }
    new_files = {
        f
        for f, st in t.file_stats().items()
        if "q" in (st.get("partitionValues") or {})
    }
    # prune on the OLD scheme column: old files prune exactly by value
    # (p='a' keeps one of two); new files are all p='mm', so min/max
    # stats exclude them too — exact per-scheme union
    kept = set(t.prune_files(None, equals={"p": "a"}))
    assert kept & old_files == {
        f
        for f in old_files
        if (t.file_stats()[f]["partitionValues"]).get("p") == "a"
    }
    assert not kept & new_files
    # prune on the NEW scheme column: new files prune exactly by value,
    # old files are all q='zz' and excluded by stats
    kept_q = set(t.prune_files(None, equals={"q": "x"}))
    assert kept_q & new_files == {
        f
        for f in new_files
        if (t.file_stats()[f]["partitionValues"]).get("q") == "x"
    }
    assert not kept_q & old_files
    # read-through equivalence
    assert {r.k for r in t.read(spark, prune_eq={"p": "a"}).collect()} == {1}
    assert {r.k for r in t.read(spark, prune_eq={"q": "x"}).collect()} == {3}


def test_fsck_understands_both_schemes(spark, evolved):
    rep = evolved.fsck(deep=True)
    assert rep["ok"], rep
    assert rep["partition_gaps"] == []  # old-scheme files are NOT gaps


def test_replace_where_refuses_mixed_then_compact_unblocks(spark, evolved):
    t = evolved
    with pytest.raises(ValueError, match="predate partitioning"):
        t.overwrite(
            _df(spark, [(9, "mm", "x")]), replace_where={"q": "x"}
        )
    t.compact(spark)  # migrates every file into the current scheme
    t.overwrite(_df(spark, [(9, "mm", "x")]), replace_where={"q": "x"})
    got = {(r.k, r.q) for r in t.read(spark).collect()}
    assert got == {(1, "zz"), (2, "zz"), (4, "y"), (9, "x")}


def test_refusals_and_unpartition(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t", partition_cols=("p",))
    t.append(_df(spark, [(1, "a", "z")]))
    with pytest.raises(ValueError, match="already partitioned"):
        t.set_partitioning(spark, ("p",))
    with pytest.raises(ValueError, match="no such column"):
        t.set_partitioning(spark, ("nope",))
    t.set_partitioning(spark, ())  # remove partitioning
    assert t.partition_cols() == ()
    t.append(_df(spark, [(2, "b", "y")]))
    with pytest.raises(ValueError, match="not partitioned"):
        t.show_partitions()
    # evolution is row-neutral: streams/CDF dispatchers accept it
    ch = t.read_changes(spark, from_version=0)
    assert sorted(r.k for r in ch.collect()) == [1, 2]


def test_hive_origin_files_keep_projecting_after_evolution(
    spark, tmp_path
):
    src = str(tmp_path / "corpus")
    spark.createDataFrame(
        [Row(k=i, q=f"q{i}", p="a" if i < 2 else "b") for i in range(4)]
    ).write.partitionBy("p").parquet(src)
    t = TxnTable.convert_from_parquet(spark, str(tmp_path), "t", src)
    assert t.hive_origin()
    t.set_partitioning(spark, ("q",))
    t.append(
        spark.createDataFrame([Row(k=9, q="qq", p="c")]).coalesce(1)
    )
    # the hive files physically LACK p; after evolving away from p they
    # must still project it from their own recorded values
    got = {(r.k, r.p, r.q) for r in t.read(spark).collect()}
    assert got == {
        (0, "a", "q0"),
        (1, "a", "q1"),
        (2, "b", "q2"),
        (3, "b", "q3"),
        (9, "c", "qq"),
    }
    # connector parity
    from spark_data_engineering_spark.sources.txn_datasource import (
        TxnDataSource,
    )

    spark.dataSource.register(TxnDataSource)
    via = spark.read.format("txn").load(t.table_dir)
    assert {(r.k, r.p, r.q) for r in via.collect()} == got


def test_detail_reports_evolution_and_stats_freshness(spark, evolved):
    d = evolved.detail()
    assert d["partition_evolved"] is True
    assert d["partition_cols"] == ["q"]  # the CURRENT scheme
    assert d["analyze_fresh"] is False  # never analyzed
    evolved.analyze(spark, columns=["k"])
    d2 = evolved.detail()
    assert d2["analyze_fresh"] is True
    assert d2["analyzed_snapshot"] is not None


def test_hive_projection_survives_unpartitioning(spark, tmp_path):
    """Regression (round-11 model-search find, 40-example deep run):
    the JVM read and CDF gates required partition_cols() to be
    NON-EMPTY before projecting hive-origin partition values — so
    evolving a hive-converted table to UNPARTITIONED (()) made every
    adopted file read NULL for its original partition column. The
    gates now key on hive_origin alone; the projection serves each
    file's own recorded values regardless of the current scheme."""
    src = str(tmp_path / "corpus")
    spark.createDataFrame(
        [Row(k=i, pad=i * 10, val="a" if i < 2 else "b") for i in range(4)]
    ).write.partitionBy("val").parquet(src)
    t = TxnTable.convert_from_parquet(spark, str(tmp_path), "t", src)
    t.set_partitioning(spark, ())  # remove partitioning entirely
    t.append(spark.createDataFrame([Row(k=9, pad=90, val="c")]).coalesce(1))
    got = {(r.k, r.val) for r in t.read(spark).collect()}
    assert got == {(0, "a"), (1, "a"), (2, "b"), (3, "b"), (9, "c")}, got
    # CDF fold sees the same values
    ch = t.read_changes(spark, from_version=0)
    assert {(r.k, r.val) for r in ch.collect()} == got


def test_stale_handle_commit_does_not_revert_evolution(spark, tmp_path):
    """Lost-DDL race (round 11): the head caches for partition_cols /
    hive_origin assumed immutability, so a handle that resolved the
    scheme BEFORE another handle's set_partitioning would re-STAMP the
    old scheme into its next commit record — and latest-commit
    resolution would silently revert the evolution. The caches are now
    version-keyed and refresh incrementally from the commits that
    landed since."""
    a = TxnTable(str(tmp_path), "t", partition_cols=("p",))
    a.append(_df(spark, [(1, "a", "z")]))
    assert a.partition_cols() == ("p",)  # a's cache is now filled
    b = TxnTable(str(tmp_path), "t")  # a second handle (other process)
    b.set_partitioning(spark, ("q",))
    # the STALE handle commits next: its record must stamp the evolved
    # scheme, not re-assert the cached old one
    a.append(_df(spark, [(2, "mm", "y")]))
    fresh = TxnTable(str(tmp_path), "t")
    assert fresh.partition_cols() == ("q",), "evolution was reverted"
    assert a.partition_cols() == ("q",)
    # and the stale handle even STAGED under the new scheme (it
    # re-resolves before partitioning the write)
    pv = {
        f: st.get("partitionValues", {})
        for f, st in fresh.file_stats().items()
    }
    assert any(v.get("q") == "y" for v in pv.values()), pv


def test_reopened_old_param_handle_cannot_revert_unpartitioning(
    spark, tmp_path
):
    """ADVICE r11 (txn.py pcols cache): after ``set_partitioning(())``
    the explicit empty scheme is falsy, so ``found or _pcols_param``
    used to fall back to a reopened handle's stale constructor param
    and skip the immutability guard — its next commit re-stamped the
    dropped scheme (the same lost-DDL class as the round-11 race).
    An explicit empty scheme must (a) refuse a conflicting constructor
    param outright and (b) resolve to () for a param-less handle."""
    t = TxnTable(str(tmp_path), "t", partition_cols=("p",))
    t.append(_df(spark, [(1, "a", "z")]))
    t.set_partitioning(spark, ())  # explicit unpartitioning
    # (a) reopening with the OLD constructor param is refused, not
    # silently honored
    stale = TxnTable(str(tmp_path), "t", partition_cols=("p",))
    with pytest.raises(ValueError, match="refused"):
        stale.partition_cols()
    # (b) a param-less handle resolves the explicit empty scheme and
    # its commits keep stamping it
    clean = TxnTable(str(tmp_path), "t")
    assert clean.partition_cols() == ()
    clean.append(_df(spark, [(2, "b", "y")]))
    fresh = TxnTable(str(tmp_path), "t")
    assert fresh.partition_cols() == (), "unpartitioning was reverted"


def test_partition_evolved_is_a_stamped_log_property(spark, evolved):
    """ADVICE r11 (table_info O(commits)): partition_evolved resolves
    like other log properties — set_partitioning stamps it and every
    later commit re-stamps it, so resolution terminates at the head
    instead of re-reading the whole log per table_info call."""
    t = evolved
    assert t.partition_evolved() is True
    # a later unrelated commit re-stamps the sticky flag (the O(1) path)
    t.append(_df(spark, [(9, "mm", "w")]))
    head = t.version()
    assert t._read_commit(head).get("partition_evolved") is True
    fresh = TxnTable(t.table_dir.rsplit("/", 1)[0], "t")
    assert fresh.partition_evolved() is True
    assert fresh.detail()["partition_evolved"] is True


def test_scoped_compact_migrates_only_pre_evolution_files(spark, evolved):
    """VERDICT r11 task 4 (Iceberg rewrite_data_files(filter) after a
    spec change): compact(scope='pre-evolution') rewrites ONLY the
    files staged under the old scheme — current-scheme files survive
    byte-identical — and replace_where unblocks afterwards."""
    t = evolved
    v0 = t.version()
    stats0 = t.file_stats(v0)
    current = {
        f for f, st in stats0.items()
        if "q" in (st.get("partitionValues") or {})
    }
    old = set(stats0) - current
    assert old and current  # the fixture really is mixed-layout
    with pytest.raises(ValueError, match="predate partitioning"):
        t.overwrite(_df(spark, [(9, "mm", "x")]), replace_where={"q": "x"})
    t.compact(spark, scope="pre-evolution")
    stats1 = t.file_stats(t.version())
    # zero current-scheme files touched; every old-scheme file replaced
    assert current <= set(stats1)
    assert not (old & set(stats1))
    # the rewritten rows are now value-pure on the current scheme
    assert all(
        "q" in (st.get("partitionValues") or {}) for st in stats1.values()
    )
    t.overwrite(_df(spark, [(9, "mm", "x")]), replace_where={"q": "x"})
    got = {(r.k, r.q) for r in t.read(spark).collect()}
    assert got == {(1, "zz"), (2, "zz"), (4, "y"), (9, "x")}
    # row-neutral commit: CDF/streams triage it like any compact
    assert t.count_rows() == 4
    # a second scoped pass is a no-op (nothing predates the scheme now)
    v_before = t.version()
    assert t.compact(spark, scope="pre-evolution") == v_before
    # guards: unknown scope, and scope+where together
    with pytest.raises(ValueError, match="unknown scope"):
        t.compact(spark, scope="nope")
    with pytest.raises(ValueError, match="mutually exclusive"):
        t.compact(spark, scope="pre-evolution", where={"q": "x"})
