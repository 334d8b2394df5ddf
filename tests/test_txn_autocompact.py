"""Auto-compaction (Delta's autoOptimize.autoCompact):
``compact_small`` bin-packs only sub-threshold live files once enough
accumulate — metadata-only no-op below the thresholds, big files never
rewritten, DVs materialized, value-purity preserved on partitioned
tables — and the streaming ingest sink keeps its file count bounded
with ``auto_compact=True``."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "v int").coalesce(1)


def test_compact_small_thresholds_and_big_files_untouched(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t")
    for i in range(6):
        t.append(_df(spark, [i]))
    v = t.version()
    # below min_files: metadata-only no-op, no commit
    assert t.compact_small(spark, min_files=8) == v
    assert t.version() == v
    for i in range(6, 9):
        t.append(_df(spark, [i]))
    # one genuinely BIG file (hundreds of rows vs single-row smalls)
    t.append(_df(spark, list(range(9, 500))))
    files_before = set(t.live_files())
    import os

    sizes = {
        f: os.path.getsize(os.path.join(t.data_dir, f)) for f in files_before
    }
    big = max(sizes, key=sizes.get)
    bar = sizes[big]  # strictly-below comparison leaves `big` alone
    got = t.compact_small(spark, small_bytes=bar, min_files=8)
    assert got == t.version() and got == v + 5  # one compact commit
    after = set(t.live_files())
    assert big in after  # the big file survived untouched
    assert len(after) < len(files_before)
    assert sorted(r.v for r in t.read(spark).collect()) == list(range(500))


def test_compact_small_materializes_dvs_and_keeps_partitions(spark, tmp_path):
    t = TxnTable(str(tmp_path), "t", partition_cols=("cat",))
    for i in range(4):
        t.append(
            spark.createDataFrame(
                [(i, "a"), (i + 100, "b")], "v int, cat string"
            ).coalesce(1)
        )
    t.delete_where_dv(spark, F.col("v") == 1)
    t.compact_small(spark, min_files=2)
    got = sorted(r.v for r in t.read(spark).collect())
    assert got == [0, 2, 3, 100, 101, 102, 103]
    stats = t.file_stats()
    for name, cols in stats.items():
        pv = cols.get("partitionValues")
        assert pv is not None and pv.get("cat") in ("a", "b"), (name, pv)
    # pruning still exact after the rewrite
    kept = t.prune_files(None, equals={"cat": "a"})
    assert kept and all(
        stats[f]["partitionValues"]["cat"] == "a" for f in kept
    )


def test_streaming_sink_auto_compact_bounds_files(spark, tmp_path):
    from spark_data_engineering_spark.streaming.events import (
        stream_to_txn_table,
    )

    src = str(tmp_path / "src")
    spark.range(24).repartition(12).write.parquet(src)
    t = TxnTable(str(tmp_path), "t")
    stream = (
        spark.readStream.schema("id bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_to_txn_table(stream, t, "ac-test", auto_compact=True)
    q.awaitTermination()
    # 12 micro-batches, each a file-per-task append; auto-compact keeps
    # the live count bounded by the min_files threshold instead of
    # growing with epoch count
    assert len(t.live_files()) <= 8
    assert sorted(r.id for r in t.read(spark).collect()) == list(range(24))
    # exactly-once survived the interleaved compact commits
    assert t.last_epoch("ac-test") >= 1


def test_describe_detail_is_metadata_only(spark, tmp_path):
    """detail(): every fact from the log + footer stats already in it —
    version, files/bytes/rows, DV-deleted rows, and the full property
    set — no data page read (nothing requires a SparkSession)."""
    t = TxnTable(
        str(tmp_path),
        "t",
        partition_cols=("cat",),
        generated_cols={"cat": "CASE WHEN v % 2 = 0 THEN 'a' ELSE 'b' END"},
    )
    t.append(_df(spark, [0, 1, 2, 3]))
    t.delete_where_dv(spark, F.col("v") == 0)
    t.add_constraint(spark, "v_small", "v < 100")
    t.branch("dev")
    d = t.detail()
    assert d["version"] == t.version() and d["num_files"] >= 1
    assert d["num_rows"] == 3 and d["dv_deleted_rows"] == 1
    assert d["partition_cols"] == ["cat"]
    assert "cat" in d["generated_cols"]
    assert d["constraints"] == {"v_small": "v < 100"}
    assert d["branches"] == ["dev"] and d["size_bytes"] > 0
    t.drop_branch("dev")
    # identity watermark surfaces too
    u = TxnTable(str(tmp_path), "u", identity_cols={"rid": {"start": 1, "step": 1}})
    u.append(_df(spark, [7, 8]))
    du = u.detail()
    assert du["identity_cols"] == {"rid": {"start": 1, "step": 1}}
    assert du["identity_high"] == {"rid": 2}


def test_read_changes_on_dataless_history(spark, tmp_path):
    """Deep model-search finding (round 8): read_changes on a table
    whose history is constraint-only DDL (no data commit ever) must
    return a typed empty feed, not crash in read()'s empty-table
    guard; same for an emptied table queried from its head."""
    t = TxnTable(str(tmp_path), "t")
    t.add_constraint(spark, "pos", "v > 0")
    t.drop_constraint("pos")
    assert t.read_changes(spark, 0).count() == 0
    # emptied table, window past the delete: schema-typed empty feed
    t.append(_df(spark, [1]))
    t.delete_where(spark, F.col("v") == 1)
    head = t.version()
    feed = t.read_changes(spark, head)
    assert feed.count() == 0 and "v" in feed.columns


def test_detail_num_rows_agrees_with_count_rows_on_legacy_stats(
    spark, tmp_path
):
    """ADVICE r8 low: a live file from a pre-stats legacy commit has no
    __num_rows entry; detail() must fall back to the same footer read
    count_rows() does instead of silently undercounting — the two
    surfaces report the SAME number."""
    import json
    import os

    t = TxnTable(str(tmp_path), "t")
    t.append(_df(spark, [1, 2, 3, 4, 5]))
    # simulate a legacy commit: strip the recorded row counts
    cpath = os.path.join(t.log_dir, sorted(os.listdir(t.log_dir))[0])
    with open(cpath) as f:
        rec = json.load(f)
    for st in rec.get("stats", {}).values():
        st.pop("__num_rows", None)
    with open(cpath, "w") as f:
        json.dump(rec, f)
    assert t.count_rows() == 5
    assert t.detail()["num_rows"] == 5
