"""Transaction-log table format (sources/txn.py): atomic commits,
snapshot isolation, time travel, delete/compact/vacuum, conflicts."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import ConcurrentWriteError, TxnTable


@pytest.fixture()
def table(tmp_path):
    return TxnTable(str(tmp_path), "t", checkpoint_every=3)


def test_append_read_roundtrip(spark, table):
    table.append(spark.range(5))
    table.append(spark.range(5, 8))
    assert table.version() == 2
    assert sorted(r.id for r in table.read(spark).collect()) == list(range(8))


def test_overwrite_replaces_and_time_travel_preserves(spark, table):
    table.append(spark.range(10))
    v1 = table.version()
    table.overwrite(spark.range(100, 103))
    assert sorted(r.id for r in table.read(spark).collect()) == [100, 101, 102]
    # the pre-overwrite snapshot is intact until vacuum
    assert table.read(spark, at_version=v1).count() == 10


def test_commit_collision_append_retries(spark, table):
    table.append(spark.range(3))
    # simulate a racer claiming the next version between resolve and link:
    # pre-create version 2's log entry manually
    racer = {"version": 2, "action": "append", "add": [], "remove": []}
    with open(os.path.join(table.log_dir, f"{2:020d}.json"), "w") as f:
        json.dump(racer, f)
    table.append(spark.range(3, 6))  # must land as version 3, not clobber 2
    assert table.version() == 3
    assert table.read(spark).count() == 6


def test_rewrite_conflict_raises(spark, table):
    table.append(spark.range(10))
    files = table.live_files()
    # a concurrent delete removes one of the files compact wants to rewrite
    racer = {"version": 2, "action": "delete", "add": [], "remove": [files[0]]}
    with open(os.path.join(table.log_dir, f"{2:020d}.json"), "w") as f:
        json.dump(racer, f)
    with pytest.raises(ConcurrentWriteError):
        table._commit("compact", [], files)


def test_delete_where_rewrites_only_hit_files(spark, table):
    # two appends -> disjoint file sets; delete rows only in the second
    table.append(spark.range(10).withColumn("k", F.lit("a")))
    table.append(spark.range(100, 110).withColumn("k", F.lit("b")))
    before = set(table.live_files())
    table.delete_where(spark, F.col("id") >= 105)
    after = set(table.live_files())
    # first append's files survive untouched
    first_files = {f for f in before if f in after}
    assert first_files, "untouched files should remain live"
    out = table.read(spark)
    assert out.filter(F.col("id") >= 105).count() == 0
    assert out.count() == 15


def test_delete_where_null_predicate_rows_survive(spark, table):
    df = spark.createDataFrame([(1, "x"), (2, None), (3, "y")], "id int, s string")
    table.append(df)
    table.delete_where(spark, F.col("s") == "x")
    # the NULL-s row must NOT be deleted (tri-state semantics)
    assert sorted(r.id for r in table.read(spark).collect()) == [2, 3]


def test_compact_binpacks_and_preserves_rows(spark, table):
    for i in range(4):
        table.append(spark.range(i * 10, (i + 1) * 10))
    n_before = len(table.live_files())
    table.compact(spark)
    assert len(table.live_files()) < n_before
    assert sorted(r.id for r in table.read(spark).collect()) == list(range(40))


def test_vacuum_keeps_retained_versions(spark, table):
    table.append(spark.range(5))
    table.overwrite(spark.range(5, 9))
    removed = table.vacuum(keep_versions=1)
    assert removed, "the overwritten files should be vacuumed"
    assert table.read(spark).count() == 4
    with pytest.raises(Exception):
        table.read(spark, at_version=1).collect()


def test_vacuum_age_guard_spares_young_files(spark, table):
    table.append(spark.range(5))
    table.overwrite(spark.range(3))
    # everything was just written — a 1h retention removes nothing
    assert table.vacuum(keep_versions=1, min_age_s=3600) == []


def test_checkpoint_bounds_replay(spark, table):
    for i in range(7):  # checkpoint_every=3 -> checkpoints at v3, v6
        table.append(spark.range(i, i + 1))
    cps = [f for f in os.listdir(table.log_dir) if f.endswith(".checkpoint.json")]
    assert len(cps) == 2
    # drop pre-checkpoint commit files: replay still resolves from the cp
    for v in (1, 2, 3, 4, 5):
        os.unlink(os.path.join(table.log_dir, f"{v:020d}.json"))
    assert table.read(spark).count() == 7


def test_crashed_stage_is_invisible(spark, table):
    table.append(spark.range(4))
    # a writer that staged files but never committed
    with open(os.path.join(table.data_dir, "deadbeef-0.parquet"), "wb") as f:
        f.write(b"not really parquet")
    assert table.read(spark).count() == 4  # reader replays the log only
    removed = table.vacuum(keep_versions=1)
    assert "deadbeef-0.parquet" in removed


def test_schema_evolution_on_append(spark, table):
    """Delta-style additive evolution: a later append may carry new
    columns; readers see the superset schema with NULLs backfilled for
    old files (mergeSchema read over the live set)."""
    from pyspark.sql import functions as F

    table.append(spark.range(3))
    table.append(spark.range(3, 5).withColumn("tag", F.lit("new")))
    df = table.read(spark)
    assert set(df.columns) == {"id", "tag"}
    got = {(r.id, r.tag) for r in df.collect()}
    assert got == {(0, None), (1, None), (2, None), (3, "new"), (4, "new")}
    # time travel to v1 still shows the original narrow schema
    assert table.read(spark, at_version=1).columns == ["id"]


def test_concurrent_appends_all_serialize(spark, table):
    """ACID under real concurrency: 6 threads x 3 appends race on the
    hard-link commit protocol; every commit must win a distinct version
    and no rows may be lost."""
    import threading

    errs = []

    def writer(t):
        try:
            for i in range(3):
                table.append(
                    spark.createDataFrame([(t, i)], "writer int, seq int")
                )
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(t,)) for t in range(6)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs
    assert table.version() == 18  # every commit serialized to its own version
    rows = {(r.writer, r.seq) for r in table.read(spark).collect()}
    assert rows == {(t, i) for t in range(6) for i in range(3)}  # no lost updates


def test_append_during_compact_not_lost(spark, table):
    """An append that lands between compact's file-list resolution and
    its commit must survive: compact removes only the files it read, and
    the interleaved append's file is not in that set."""
    table.append(spark.range(3))
    table.append(spark.range(3, 6))
    files_before = table.live_files()
    # stage the compacted output against the current snapshot...
    paths = [f"{table.data_dir}/{f}" for f in files_before]
    packed = spark.read.option("mergeSchema", "true").parquet(*paths).coalesce(1)
    add, stats = table._stage(packed)
    # ...but an append wins the race before the compact commits
    table.append(spark.range(100, 102))
    v = table._commit("compact", add, files_before, stats)
    assert v == table.version()
    got = {r.id for r in table.read(spark).collect()}
    assert got == set(range(6)) | {100, 101}, "interleaved append lost"


def test_compact_loses_race_to_conflicting_rewrite(spark, table):
    """Two compactions racing over the same input files: the loser must
    raise ConcurrentWriteError, not double-remove."""
    import pytest as _pytest

    from spark_data_engineering_spark.sources.txn import ConcurrentWriteError

    table.append(spark.range(4))
    files = table.live_files()
    paths = [f"{table.data_dir}/{f}" for f in files]
    packed = spark.read.parquet(*paths).coalesce(1)
    add1, st1 = table._stage(packed)
    add2, st2 = table._stage(packed)
    table._commit("compact", add1, files, st1)  # winner
    with _pytest.raises(ConcurrentWriteError):
        table._commit("compact", add2, files, st2)  # loser re-validates


def test_checkpoint_txns_seed_from_previous_checkpoint(spark, tmp_path):
    """An app whose last epoch predates SEVERAL checkpoints must still be
    visible in last_epoch — the txns map is seeded from the previous
    checkpoint and folded forward, not rebuilt from version 1 (which was
    O(full log) per checkpoint)."""
    from spark_data_engineering_spark.sources.txn import TxnTable

    t = TxnTable(str(tmp_path), "cpseed", checkpoint_every=3)
    t.append_idempotent(spark.range(2), "old-app", 5)
    for _ in range(8):  # crosses checkpoints at v3, v6, v9
        t.append(spark.range(1))
    assert t.version() == 9
    assert t.last_epoch("old-app") == 5
    # and the newest checkpoint itself carries the seeded map
    import json as _json

    with open(t._checkpoint_path(9)) as f:
        assert _json.load(f)["txns"]["old-app"] == 5


def test_vacuum_cleans_orphaned_staging_dirs(spark, tmp_path):
    """A writer crashing inside _stage leaves a .staging-* dir; vacuum
    must remove it (docstring: half-staged files are cleaned by vacuum),
    honoring min_age_s for in-flight stages."""
    import os
    import time

    from spark_data_engineering_spark.sources.txn import TxnTable

    t = TxnTable(str(tmp_path), "vacstage")
    t.append(spark.range(3))
    orphan = os.path.join(t.table_dir, ".staging-deadbeef")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-0.parquet"), "w") as f:
        f.write("x")
    old = time.time() - 3600
    os.utime(orphan, (old, old))
    # a FRESH staging dir survives a min_age_s-guarded vacuum
    fresh = os.path.join(t.table_dir, ".staging-cafebabe")
    os.makedirs(fresh)
    removed = t.vacuum(min_age_s=60)
    assert ".staging-deadbeef" in removed
    assert not os.path.exists(orphan)
    assert os.path.exists(fresh)
    os.rmdir(fresh)


def test_count_rows_metadata_only(spark, tmp_path):
    import json
    import os

    from spark_data_engineering_spark.sources.txn import TxnTable

    t = TxnTable(str(tmp_path / "cnt"), "t")
    df1 = spark.range(0, 100).selectExpr("id AS k", "id * 2 AS v")
    df2 = spark.range(100, 130).selectExpr("id AS k", "id * 2 AS v")
    t.append(df1)
    v1 = t.version()
    t.append(df2)
    assert t.count_rows() == 130 == t.read(spark).count()
    assert t.count_rows(at_version=v1) == 100  # time travel, still metadata
    t.delete_where(spark, F.col("k") < 10)
    assert t.count_rows() == 120 == t.read(spark).count()
    t.compact(spark)
    assert t.count_rows() == 120
    # legacy commits without row-count stats fall back to local
    # parquet-footer reads — still metadata-only, no Spark job
    log_dir = os.path.join(str(tmp_path / "cnt"), "t", "_txn_log")
    newest = sorted(f for f in os.listdir(log_dir) if f.endswith(".json"))[-1]
    path = os.path.join(log_dir, newest)
    rec = json.load(open(path))
    for cols in rec.get("stats", {}).values():
        cols.pop("__num_rows", None)
    json.dump(rec, open(path, "w"))
    assert t.count_rows() == 120


def test_reserved_stats_key_rejected(spark, tmp_path):
    from spark_data_engineering_spark.sources.txn import TxnTable

    t = TxnTable(str(tmp_path / "resv"), "t")
    df = spark.range(5).selectExpr("id AS k", "id AS __num_rows")
    try:
        t.append(df)
    except ValueError as e:
        assert "reserved" in str(e)
    else:
        raise AssertionError("a real __num_rows column must be refused")


# ---- write-audit-publish (round 6) -------------------------------------


def test_wap_publishes_only_clean_data(spark, tmp_path):
    from spark_data_engineering_spark.checks import CheckError, not_null, unique
    from spark_data_engineering_spark.sources.txn import TxnTable

    t = TxnTable(str(tmp_path), "wap")
    clean = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string")
    v1 = t.write_audit_publish(spark, clean, (unique("id"), not_null("v")))
    assert v1 == 1 and t.read(spark).count() == 2
    # dirty batch: duplicate key AND a null — must not publish, must not
    # leave staged bytes behind
    import os

    dirty = spark.createDataFrame([(2, None), (2, "c")], "id bigint, v string")
    files_before = sorted(os.listdir(t.data_dir))
    try:
        t.write_audit_publish(spark, dirty, (unique("id"), not_null("v")))
        raise AssertionError("dirty batch published")
    except CheckError as e:
        assert "audit failed" in str(e)
    assert t.version() == v1
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2]
    assert sorted(os.listdir(t.data_dir)) == files_before  # staged cleaned


def test_wap_overwrite_keeps_old_snapshot_on_failure(spark, tmp_path):
    from spark_data_engineering_spark.checks import CheckError, not_null
    from spark_data_engineering_spark.sources.txn import TxnTable
    from pyspark.sql import functions as F

    t = TxnTable(str(tmp_path), "wap2")
    t.append(spark.range(5).withColumn("v", F.lit("x")))
    bad = spark.createDataFrame([(9, None)], "id bigint, v string")
    try:
        t.write_audit_publish(spark, bad, (not_null("v"),), mode="overwrite")
        raise AssertionError("published")
    except CheckError:
        pass
    assert t.read(spark).count() == 5  # overwrite never happened
    good = spark.createDataFrame([(9, "y")], "id bigint, v string")
    t.write_audit_publish(spark, good, (not_null("v"),), mode="overwrite")
    assert [(r.id, r.v) for r in t.read(spark).collect()] == [(9, "y")]


def test_wap_exactly_once_replay(spark, tmp_path):
    from spark_data_engineering_spark.checks import not_null
    from spark_data_engineering_spark.sources.txn import TxnTable
    from pyspark.sql import functions as F

    t = TxnTable(str(tmp_path), "wap3")
    batch = spark.range(3).withColumn("v", F.lit("x"))
    assert t.write_audit_publish(spark, batch, (not_null("v"),), txn=("s", 1)) == 1
    # crash-redelivered epoch: no staging, no commit, no duplicate rows
    assert t.write_audit_publish(spark, batch, (not_null("v"),), txn=("s", 1)) is None
    assert t.version() == 1 and t.read(spark).count() == 3


def test_decimal_columns_write_and_read(spark, tmp_path):
    """Regression (round 7, found by the streaming-materialized-view
    build): pyarrow raises ArrowNotImplementedError merely ACCESSING
    row-group .statistics for decimal columns, which failed EVERY write
    of a decimal-bearing frame inside footer-stat harvesting. A stats
    gap must cost pruning on that column, never the write."""
    from pyspark.sql import functions as F

    t = TxnTable(str(tmp_path), "t")
    df = spark.range(5).select(
        "id", F.col("id").cast("decimal(18,2)").alias("dec")
    )
    t.append(df)
    t.append(df)
    assert t.count_rows() == 10  # __num_rows footer stat still exact
    got = sorted((r.id, float(r.dec)) for r in t.read(spark).collect())
    assert got == sorted([(i, float(i)) for i in range(5)] * 2)
