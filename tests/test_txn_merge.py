"""MERGE (upsert), footer-stats data skipping, and Z-order compaction on
the transaction-log table (sources/txn.py). Mirrors the Delta workflows
the reference relies on (etl/utils/base_table.py:211-217 writes Delta;
MERGE/OPTIMIZE ZORDER are its maintenance surface)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable


@pytest.fixture()
def table(tmp_path):
    return TxnTable(str(tmp_path), "t", checkpoint_every=100)


def _rows(spark, pairs):
    return spark.createDataFrame([Row(k=k, v=v) for k, v in pairs], "k int, v string")


def test_merge_upsert_updates_and_inserts(spark, table):
    table.append(_rows(spark, [(1, "a"), (2, "b"), (3, "c")]))
    table.merge(spark, _rows(spark, [(2, "B"), (4, "D")]), on=["k"])
    got = {r.k: r.v for r in table.read(spark).collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "D"}


def test_merge_rewrites_only_touched_files(spark, table):
    # two appends with disjoint key ranges -> separate file sets
    table.append(_rows(spark, [(1, "a"), (2, "b")]).coalesce(1))
    table.append(_rows(spark, [(10, "x"), (11, "y")]).coalesce(1))
    before = set(table.live_files())
    table.merge(spark, _rows(spark, [(10, "X")]), on=["k"])
    commit = table.history()[-1]
    assert commit["action"] == "merge"
    assert len(commit["remove"]) == 1  # only the file holding k=10
    # the untouched file survives byte-identical (still live)
    survivors = before & set(table.live_files())
    assert len(survivors) == 1
    got = {r.k: r.v for r in table.read(spark).collect()}
    assert got == {1: "a", 2: "b", 10: "X", 11: "y"}


def test_merge_matched_delete(spark, table):
    table.append(_rows(spark, [(1, "a"), (2, "b")]))
    table.merge(
        spark,
        _rows(spark, [(1, "whatever")]),
        on=["k"],
        when_matched="delete",
        when_not_matched=None,
    )
    assert {r.k for r in table.read(spark).collect()} == {2}


def test_merge_insert_only_leaves_matched_rows(spark, table):
    table.append(_rows(spark, [(1, "a")]))
    v_before = table.version()
    table.merge(
        spark,
        _rows(spark, [(1, "IGNORED"), (2, "b")]),
        on=["k"],
        when_matched=None,
    )
    got = {r.k: r.v for r in table.read(spark).collect()}
    assert got == {1: "a", 2: "b"}  # matched row untouched, new row in
    # no pre-existing file rewritten
    assert table.history()[-1]["remove"] == []
    assert table.version() == v_before + 1


def test_merge_into_empty_table(spark, table):
    table.merge(spark, _rows(spark, [(1, "a")]), on=["k"])
    assert {r.k: r.v for r in table.read(spark).collect()} == {1: "a"}


def test_merge_is_time_travelable(spark, table):
    table.append(_rows(spark, [(1, "a")]))
    v1 = table.version()
    table.merge(spark, _rows(spark, [(1, "A2")]), on=["k"])
    assert {r.v for r in table.read(spark, at_version=v1).collect()} == {"a"}
    assert {r.v for r in table.read(spark).collect()} == {"A2"}


def test_footer_stats_recorded_and_skipping_prunes(spark, table):
    # three appends with disjoint id ranges -> per-file min/max boxes
    for lo in (0, 100, 200):
        table.append(spark.range(lo, lo + 50).coalesce(1))
    stats = table.file_stats()
    assert all("id" in s for s in stats.values())
    pruned = table.prune_files({"id": (120, 130)})
    assert len(pruned) == 1 and len(stats) == 3
    got = table.read(spark, prune={"id": (120, 130)}).filter(
        F.col("id").between(120, 130)
    )
    assert got.count() == 11


def test_prune_with_no_match_returns_empty_frame(spark, table):
    table.append(spark.range(10).coalesce(1))
    df = table.read(spark, prune={"id": (1000, 2000)})
    assert df.count() == 0
    assert df.schema == table.read(spark).schema


def test_string_stats_prune(spark, table):
    a = spark.createDataFrame([("apple",), ("berry",)], "word string").coalesce(1)
    z = spark.createDataFrame([("yak",), ("zebra",)], "word string").coalesce(1)
    table.append(a)
    table.append(z)
    assert len(table.prune_files({"word": ("x", None)})) == 1


def test_zorder_compact_prunes_on_both_columns(spark, table):
    # 32x32 grid appended in row-major slabs: raw files are tight on x,
    # wide on y. After ZORDER(x, y) every file is a box on both.
    df = (
        spark.range(32 * 32)
        .select(
            (F.col("id") % 32).alias("x"),
            (F.col("id") / 32).cast("long").alias("y"),
        )
    )
    table.append(df.repartitionByRange(4, "y"))
    table.compact(spark, target_file_bytes=1200, zorder_by=["x", "y"])
    files = table.live_files()
    assert len(files) >= 3  # actually produced several clustered files
    px = table.prune_files({"x": (3, 4)})
    py = table.prune_files({"y": (3, 4)})
    assert len(px) < len(files) and len(py) < len(files)
    # correctness: the pruned read still returns the full filtered result
    got = (
        table.read(spark, prune={"x": (3, 4), "y": (3, 4)})
        .filter(F.col("x").between(3, 4) & F.col("y").between(3, 4))
        .count()
    )
    assert got == 4


def test_stats_survive_checkpoint_replay(spark, tmp_path):
    table = TxnTable(str(tmp_path), "cp", checkpoint_every=2)
    for lo in (0, 100, 200, 300):
        table.append(spark.range(lo, lo + 10).coalesce(1))
    # head is past a checkpoint; replay must still see all stats
    assert table.version() == 4
    stats = table.file_stats()
    assert len(stats) == 4 and all("id" in s for s in stats.values())
    assert len(table.prune_files({"id": (305, 306)})) == 1


def test_merge_pins_one_snapshot_for_discovery_and_insert(spark, tmp_path):
    """A commit landing between merge's touched-file discovery and its
    insert anti-join must not affect the merge's outcome (both reads are
    pinned to the entry version). Before the fix, the anti-join resolved
    at the NEW head and silently dropped source rows whose key the
    concurrent commit had just added — a result matching no serial
    order."""
    from spark_data_engineering_spark.sources.txn import TxnTable

    root = str(tmp_path)
    table = TxnTable(root, "t")
    table.append(spark.createDataFrame([(1, "a")], "k bigint, v string"))

    # merge's two pinned target reads: touched-file discovery
    # (_read_files_meta) and the insert anti-join (read) — inject the
    # racer between them
    orig_read = TxnTable.read
    orig_meta = TxnTable._read_files_meta
    state = {"n": 0}

    def _racer_between(spark_):
        state["n"] += 1
        if state["n"] == 2:
            # between the two merge-internal reads: a racer commits key 99
            TxnTable(root, "t").append(
                spark_.createDataFrame([(99, "racer")], "k bigint, v string")
            )

    def racing_read(self, spark_, *a, **kw):
        _racer_between(spark_)
        return orig_read(self, spark_, *a, **kw)

    def racing_meta(self, spark_, *a, **kw):
        _racer_between(spark_)
        return orig_meta(self, spark_, *a, **kw)

    TxnTable.read = racing_read
    TxnTable._read_files_meta = racing_meta
    try:
        src = spark.createDataFrame([(1, "a2"), (99, "mine")], "k bigint, v string")
        table.merge(spark, src, on=["k"])
    finally:
        TxnTable.read = orig_read
        TxnTable._read_files_meta = orig_meta
    assert state["n"] >= 2, "merge did not exercise both reads"
    rows = {(r.k, r.v) for r in table.read(spark).collect()}
    # serial order merge-then-racer: update lands, source 99 inserted,
    # racer's 99 row also present. The bug dropped ("mine") entirely.
    assert (1, "a2") in rows
    assert (99, "mine") in rows
    assert (99, "racer") in rows


# --- WHEN NOT MATCHED BY SOURCE THEN DELETE (round 9) ---


def _kv(spark, pairs):
    return spark.createDataFrame(pairs, "k int, v int").coalesce(1)


def test_by_source_delete_syncs_target_to_source(spark, tmp_path):
    from spark_data_engineering_spark.sources.txn import TxnTable

    t = TxnTable(str(tmp_path / "t"), "t")
    t.append(_kv(spark, [(i, i * 10) for i in range(1, 11)]))
    src = _kv(spark, [(3, 333), (4, 444), (5, 555), (6, 666), (11, 111)])
    t.merge(spark, src, on=["k"], when_not_matched_by_source="delete")
    got = sorted((r.k, r.v) for r in t.read(spark).collect())
    assert got == [(3, 333), (4, 444), (5, 555), (6, 666), (11, 111)]


def test_by_source_delete_drops_zero_match_files_wholesale(spark, tmp_path):
    from spark_data_engineering_spark.sources.txn import TxnTable

    t = TxnTable(str(tmp_path / "t"), "t")
    t.append(_kv(spark, [(i, i) for i in range(0, 50)]))       # file A
    t.append(_kv(spark, [(i, i) for i in range(100, 150)]))    # file B
    before = t.live_files()
    assert len(before) == 2
    # source matches only file A's keys: B must be REMOVED, not rewritten
    src = _kv(spark, [(i, i + 1) for i in range(0, 50)])
    v = t.merge(spark, src, on=["k"], when_not_matched_by_source="delete")
    c = t._read_commit(v)
    assert set(c["remove"]) == set(before)
    got = sorted((r.k, r.v) for r in t.read(spark).collect())
    assert got == [(i, i + 1) for i in range(0, 50)]


def test_by_source_delete_empty_source_empties_table(spark, tmp_path):
    import pytest

    from spark_data_engineering_spark.sources.txn import TxnTable

    t = TxnTable(str(tmp_path / "t"), "t")
    t.append(_kv(spark, [(1, 1), (2, 2)]))
    v0 = t.version()
    src = _kv(spark, []).filter("k > 0")  # empty, schema-carrying
    v = t.merge(spark, src, on=["k"], when_not_matched_by_source="delete")
    assert v == v0 + 1
    with pytest.raises(FileNotFoundError):
        t.read(spark)


def test_by_source_delete_with_matched_none_keeps_matched_asis(spark, tmp_path):
    from spark_data_engineering_spark.sources.txn import TxnTable

    t = TxnTable(str(tmp_path / "t"), "t")
    t.append(_kv(spark, [(1, 10), (2, 20), (3, 30)]))
    src = _kv(spark, [(2, 999)])
    t.merge(
        spark,
        src,
        on=["k"],
        when_matched=None,
        when_not_matched=None,
        when_not_matched_by_source="delete",
    )
    got = sorted((r.k, r.v) for r in t.read(spark).collect())
    assert got == [(2, 20)]  # survived UNTOUCHED (not 999)


def test_by_source_delete_cdf_images_fold_to_final_state(spark, tmp_path):
    from collections import Counter

    from spark_data_engineering_spark.sources.txn import TxnTable

    t = TxnTable(str(tmp_path / "t"), "t")
    t.append(_kv(spark, [(i, i) for i in range(0, 10)]))       # file A
    t.append(_kv(spark, [(i, i) for i in range(100, 110)]))    # file B (no match)
    src = _kv(spark, [(2, 22), (3, 33), (200, 2000)])
    t.merge(spark, src, on=["k"], cdf=True, when_not_matched_by_source="delete")
    fold: Counter = Counter()
    for r in t.read_changes(spark, 0).collect():
        if r._change_type in ("insert", "update_postimage"):
            fold[(r.k, r.v)] += 1
        elif r._change_type in ("delete", "update_preimage"):
            fold[(r.k, r.v)] -= 1
    folded = sorted(kv for kv, n in fold.items() for _ in range(n))
    got = sorted((r.k, r.v) for r in t.read(spark).collect())
    assert folded == got == [(2, 22), (3, 33), (200, 2000)]


def test_by_source_rejects_unknown_mode(spark, tmp_path):
    import pytest

    from spark_data_engineering_spark.sources.txn import TxnTable

    t = TxnTable(str(tmp_path / "t"), "t")
    t.append(_kv(spark, [(1, 1)]))
    with pytest.raises(ValueError, match="when_not_matched_by_source"):
        t.merge(spark, _kv(spark, [(1, 2)]), on=["k"], when_not_matched_by_source="update")


# --- WHEN NOT MATCHED BY SOURCE THEN UPDATE SET (round 9) ---


def test_by_source_update_flags_stale_rows(spark, tmp_path):
    from pyspark.sql import functions as F

    from spark_data_engineering_spark.sources.txn import TxnTable

    t = TxnTable(str(tmp_path / "t"), "t")
    t.append(
        spark.createDataFrame(
            [(i, i * 10, True) for i in range(1, 6)], "k int, v int, live boolean"
        ).coalesce(1)
    )
    src = spark.createDataFrame(
        [(2, 222, True), (3, 333, True)], "k int, v int, live boolean"
    ).coalesce(1)
    t.merge(
        spark,
        src,
        on=["k"],
        when_not_matched=None,
        when_not_matched_by_source="update",
        by_source_update_set={"live": F.lit(False)},
    )
    got = sorted((r.k, r.v, r.live) for r in t.read(spark).collect())
    # matched rows updated from source, unmatched flagged stale (SCD close-out)
    assert got == [
        (1, 10, False),
        (2, 222, True),
        (3, 333, True),
        (4, 40, False),
        (5, 50, False),
    ]


def test_by_source_update_with_matched_none_and_sql_expr(spark, tmp_path):
    from spark_data_engineering_spark.sources.txn import TxnTable

    t = TxnTable(str(tmp_path / "t"), "t")
    t.append(_kv(spark, [(1, 10), (2, 20)]))          # file A
    t.append(_kv(spark, [(100, 1000), (101, 1010)]))  # file B: zero matches
    src = _kv(spark, [(2, 999)])
    t.merge(
        spark,
        src,
        on=["k"],
        when_matched=None,
        when_not_matched=None,
        when_not_matched_by_source="update",
        by_source_update_set={"v": "v + 1"},  # SQL-string form
    )
    got = sorted((r.k, r.v) for r in t.read(spark).collect())
    # matched row untouched; every unmatched row (both files) bumped
    assert got == [(1, 11), (2, 20), (100, 1001), (101, 1011)]


def test_by_source_update_regenerates_dependent_generated_col(spark, tmp_path):
    from spark_data_engineering_spark.sources.txn import TxnTable

    t = TxnTable(
        str(tmp_path / "t"), "t", generated_cols={"g": "v * 2 + 1"}
    )
    t.append(_kv(spark, [(1, 10), (2, 20)]))
    src = _kv(spark, [(2, 20)])
    t.merge(
        spark,
        src,
        on=["k"],
        when_matched=None,
        when_not_matched=None,
        when_not_matched_by_source="update",
        by_source_update_set={"v": "v + 100"},
    )
    got = sorted((r.k, r.v, r.g) for r in t.read(spark).collect())
    assert got == [(1, 110, 221), (2, 20, 41)]


def test_by_source_update_validation(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from spark_data_engineering_spark.sources.txn import TxnTable

    t = TxnTable(str(tmp_path / "t"), "t", partition_cols=("k",))
    t.append(_kv(spark, [(1, 10)]))
    src = _kv(spark, [(1, 11)])
    with pytest.raises(ValueError, match="exactly when"):
        t.merge(spark, src, on=["k"], when_not_matched_by_source="update")
    with pytest.raises(ValueError, match="exactly when"):
        t.merge(
            spark,
            src,
            on=["k"],
            when_not_matched_by_source="delete",
            by_source_update_set={"v": F.lit(0)},
        )
    with pytest.raises(ValueError, match="table-managed"):
        t.merge(
            spark,
            src,
            on=["k"],
            when_not_matched_by_source="update",
            by_source_update_set={"k": F.lit(0)},
        )


def test_by_source_update_cdf_images(spark, tmp_path):
    from collections import Counter

    from spark_data_engineering_spark.sources.txn import TxnTable

    t = TxnTable(str(tmp_path / "t"), "t")
    t.append(_kv(spark, [(1, 10), (2, 20), (3, 30)]))
    src = _kv(spark, [(2, 22)])
    t.merge(
        spark,
        src,
        on=["k"],
        cdf=True,
        when_matched=None,
        when_not_matched=None,
        when_not_matched_by_source="update",
        by_source_update_set={"v": "v + 1"},
    )
    fold: Counter = Counter()
    for r in t.read_changes(spark, 0).collect():
        if r._change_type in ("insert", "update_postimage"):
            fold[(r.k, r.v)] += 1
        elif r._change_type in ("delete", "update_preimage"):
            fold[(r.k, r.v)] -= 1
    folded = sorted(kv for kv, n in fold.items() for _ in range(n))
    got = sorted((r.k, r.v) for r in t.read(spark).collect())
    assert folded == got == [(1, 11), (2, 20), (3, 31)]


# --- WHEN NOT MATCHED BY SOURCE AND <cond> (round 9) ---


def test_by_source_condition_bounds_the_delete(spark, tmp_path):
    from pyspark.sql import functions as F

    from spark_data_engineering_spark.sources.txn import TxnTable

    t = TxnTable(str(tmp_path / "t"), "t")
    t.append(_kv(spark, [(1, 10), (2, 20)]))          # in-scope keys
    t.append(_kv(spark, [(100, 1000), (101, 1010)]))  # out-of-scope file
    # sync source covers ONLY key 1; the condition bounds deletion to k < 50
    src = _kv(spark, [(1, 11)])
    t.merge(
        spark,
        src,
        on=["k"],
        when_not_matched=None,
        when_not_matched_by_source="delete",
        by_source_condition=F.col("k") < 50,
    )
    got = sorted((r.k, r.v) for r in t.read(spark).collect())
    # k=2 deleted (unmatched, in scope); 100/101 SURVIVE (out of scope)
    assert got == [(1, 11), (100, 1000), (101, 1010)]


def test_by_source_condition_null_means_survive(spark, tmp_path):
    from pyspark.sql import functions as F

    from spark_data_engineering_spark.sources.txn import TxnTable

    t = TxnTable(str(tmp_path / "t"), "t")
    t.append(
        spark.createDataFrame(
            [(1, 10), (2, None), (3, 30)], "k int, v int"
        ).coalesce(1)
    )
    src = _kv(spark, [(1, 10)])
    t.merge(
        spark,
        src,
        on=["k"],
        when_matched=None,
        when_not_matched=None,
        when_not_matched_by_source="delete",
        by_source_condition=F.col("v") > 15,  # NULL for k=2
    )
    got = sorted((r.k,) for r in t.read(spark).collect())
    assert got == [(1,), (2,)]  # k=3 deleted; NULL-cond k=2 survives


def test_by_source_condition_scopes_the_update(spark, tmp_path):
    from pyspark.sql import functions as F

    from spark_data_engineering_spark.sources.txn import TxnTable

    t = TxnTable(str(tmp_path / "t"), "t")
    t.append(_kv(spark, [(1, 10), (2, 20), (3, 30)]))
    src = _kv(spark, [(1, 10)])
    t.merge(
        spark,
        src,
        on=["k"],
        when_matched=None,
        when_not_matched=None,
        when_not_matched_by_source="update",
        by_source_update_set={"v": "v + 1"},
        by_source_condition=F.col("k") == 2,
    )
    got = sorted((r.k, r.v) for r in t.read(spark).collect())
    assert got == [(1, 10), (2, 21), (3, 30)]


def test_by_source_condition_requires_clause(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from spark_data_engineering_spark.sources.txn import TxnTable

    t = TxnTable(str(tmp_path / "t"), "t")
    t.append(_kv(spark, [(1, 10)]))
    with pytest.raises(ValueError, match="requires when_not_matched_by_source"):
        t.merge(
            spark,
            _kv(spark, [(1, 11)]),
            on=["k"],
            by_source_condition=F.col("k") > 0,
        )


def test_by_source_condition_cdf_folds(spark, tmp_path):
    from collections import Counter

    from pyspark.sql import functions as F

    from spark_data_engineering_spark.sources.txn import TxnTable

    t = TxnTable(str(tmp_path / "t"), "t")
    t.append(_kv(spark, [(1, 10), (2, 20), (3, 30)]))
    src = _kv(spark, [(1, 11)])
    t.merge(
        spark,
        src,
        on=["k"],
        cdf=True,
        when_not_matched=None,
        when_not_matched_by_source="delete",
        by_source_condition=F.col("k") == 2,
    )
    fold: Counter = Counter()
    for r in t.read_changes(spark, 0).collect():
        if r._change_type in ("insert", "update_postimage"):
            fold[(r.k, r.v)] += 1
        elif r._change_type in ("delete", "update_preimage"):
            fold[(r.k, r.v)] -= 1
    folded = sorted(kv for kv, n in fold.items() for _ in range(n))
    got = sorted((r.k, r.v) for r in t.read(spark).collect())
    assert folded == got == [(1, 11), (3, 30)]
