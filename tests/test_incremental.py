"""Incremental view maintenance: the CDF-folded state must equal a full
recompute after every kind of base commit (append / delete / merge
update), and a replayed refresh must be a no-op (exactly-once)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_data_engineering_spark.pipeline.incremental import IncrementalAggregate
from spark_data_engineering_spark.sources.txn import TxnTable


@pytest.fixture()
def view(tmp_path):
    base = TxnTable(str(tmp_path), "base")
    state = TxnTable(str(tmp_path), "state")
    return base, IncrementalAggregate(
        base,
        state,
        group_by={"grp": "grp"},
        sums={"amount_sum": "CAST(amount AS DECIMAL(18,2))"},
    )


def _rows(spark, pairs):
    return spark.createDataFrame(
        [Row(grp=g, amount=float(a)) for g, a in pairs], "grp string, amount double"
    )


def _full(spark, base):
    return {
        (r.grp, str(r.amount_sum), r.n_rows)
        for r in base.read(spark)
        .groupBy("grp")
        .agg(
            F.sum(F.col("amount").cast("decimal(18,2)")).alias("amount_sum"),
            F.count("*").alias("n_rows"),
        )
        .collect()
    }


def _state(spark, agg):
    return {(r.grp, str(r.amount_sum), r.n_rows) for r in agg.read(spark).collect()}


def test_refresh_tracks_appends(spark, view):
    base, agg = view
    base.append(_rows(spark, [("a", 1.5), ("a", 2.0), ("b", 10.0)]))
    assert agg.refresh(spark) is not None
    assert _state(spark, agg) == _full(spark, base)

    base.append(_rows(spark, [("a", 0.25), ("c", 7.0)]))
    agg.refresh(spark)
    assert _state(spark, agg) == _full(spark, base)
    assert agg.last_refreshed_version() == base.version()


def test_refresh_is_exactly_once(spark, view):
    base, agg = view
    base.append(_rows(spark, [("a", 1.0)]))
    assert agg.refresh(spark) is not None
    v = agg.state.version()
    # no new base commits -> replayed refresh commits nothing
    assert agg.refresh(spark) is None
    assert agg.state.version() == v


def test_delete_maintenance_drops_emptied_group(spark, view):
    base, agg = view
    base.append(_rows(spark, [("a", 1.0), ("a", 2.0), ("b", 5.0)]))
    agg.refresh(spark)
    base.delete_where(spark, F.col("grp") == "b")
    agg.refresh(spark)
    got = _state(spark, agg)
    assert got == _full(spark, base)
    assert not any(g == "b" for g, _, _ in got)


def test_merge_update_is_delta_neutral_for_counts(spark, view):
    base, agg = view
    base.append(_rows(spark, [("a", 1.0), ("b", 2.0)]))
    base.append(_rows(spark, [("b", 3.0)]))
    agg.refresh(spark)
    # upsert: bump one existing row's amount, insert a new group
    src = spark.createDataFrame(
        [Row(grp="a", amount=100.0), Row(grp="z", amount=9.0)],
        "grp string, amount double",
    )
    base.merge(spark, src, on=["grp"], when_matched="update")
    agg.refresh(spark)
    assert _state(spark, agg) == _full(spark, base)


def test_multi_commit_catchup_in_one_refresh(spark, view):
    base, agg = view
    base.append(_rows(spark, [("a", 1.0)]))
    base.append(_rows(spark, [("b", 2.0)]))
    base.delete_where(spark, F.col("grp") == "a")
    base.append(_rows(spark, [("b", 4.0)]))
    # one refresh folds all four commits
    agg.refresh(spark)
    assert _state(spark, agg) == _full(spark, base)


def test_concurrent_refresh_race_is_safe(spark, view):
    """Two refreshers of the same view: the loser must either no-op
    (watermark already advanced) or fail the commit validation — never
    double-fold the delta."""
    base, agg = view
    base.append(_rows(spark, [("a", 1.0)]))
    agg.refresh(spark)
    base.append(_rows(spark, [("a", 2.0)]))
    # simulate a racing refresher that already consumed head: refresh
    # once, then call again — the second fold sees head == last and
    # must not commit a second time
    assert agg.refresh(spark) is not None
    v = agg.state.version()
    assert agg.refresh(spark) is None
    assert agg.state.version() == v
    assert _state(spark, agg) == _full(spark, base)


def test_merge_strategy_matches_full_recompute(spark, view):
    base, agg = view
    base.append(_rows(spark, [("a", 1.0), ("a", 2.0), ("b", 5.0)]))
    agg.refresh(spark, strategy="merge")
    base.append(_rows(spark, [("a", 0.5), ("c", 3.0)]))
    base.delete_where(spark, F.col("grp") == "b")  # empties group b
    agg.refresh(spark, strategy="merge")
    got = _state(spark, agg)
    assert got == _full(spark, base)
    assert not any(g == "b" for g, _, _ in got)
    # the state history shows merge commits (copy-on-write), not rewrites
    actions = [c["action"] for c in agg.state.history()]
    assert actions[-1] == "merge"


def test_merge_strategy_untouched_files_survive(spark, view):
    """Copy-on-write: a refresh touching only group 'z' must not rewrite
    the file(s) holding other groups."""
    base, agg = view
    base.append(_rows(spark, [("a", 1.0), ("b", 2.0)]))
    agg.refresh(spark)  # seed state (overwrite)
    before = set(agg.state.live_files())
    base.append(_rows(spark, [("z", 9.0)]))  # new group only
    agg.refresh(spark, strategy="merge")
    after = set(agg.state.live_files())
    assert before <= after, "files holding untouched groups were rewritten"


def test_merge_strategy_watermark_advances_on_rowless_window(spark, view):
    """A compact-only commit window changes no rows; the merge refresh
    must still advance the watermark or it would re-scan forever."""
    base, agg = view
    base.append(_rows(spark, [("a", 1.0)]))
    agg.refresh(spark, strategy="merge")
    base.compact(spark)
    assert agg.refresh(spark, strategy="merge") is not None
    assert agg.last_refreshed_version() == base.version()
    assert _state(spark, agg) == _full(spark, base)


def test_property_random_commit_sequences(spark, view):
    """Randomized (seeded) sequences of append/delete/merge commits: the
    incremental state must equal a full recompute after every refresh,
    alternating strategies."""
    import random

    base, agg = view
    rng = random.Random(7)
    groups = ["a", "b", "c", "d"]
    for step in range(6):
        op = rng.choice(["append", "append", "delete", "merge"])
        # empty-table reads raise by design: keep the base non-empty by
        # downgrading destructive ops to appends when they would wipe it
        alive = bool(base.live_files())
        surviving = (
            {r.grp for r in base.read(spark).select("grp").distinct().collect()}
            if alive
            else set()
        )
        if op == "delete" and len(surviving) <= 1:
            op = "append"
        if op == "merge" and not alive:
            op = "append"
        if op == "append":
            rows = [
                (rng.choice(groups), round(rng.uniform(0, 50), 2))
                for _ in range(rng.randint(1, 5))
            ]
            base.append(_rows(spark, rows))
        elif op == "delete":
            g = rng.choice(sorted(surviving))
            base.delete_where(spark, F.col("grp") == g)
        else:
            src = _rows(spark, [(rng.choice(groups), round(rng.uniform(0, 9), 2))])
            base.merge(spark, src, on=["grp"], when_matched="update")
        agg.refresh(spark, strategy="merge" if step % 2 else "overwrite")
        assert _state(spark, agg) == _full(spark, base), f"diverged at step {step} ({op})"


def test_streaming_materialized_view(spark, tmp_path):
    """End-to-end streaming materialized view: micro-batches land in the
    base table exactly-once (append_idempotent) and the aggregate state
    refreshes per epoch from the change feed — final state equals a
    batch recompute over everything that streamed."""
    from spark_data_engineering_spark.sources.txn import TxnTable

    staged = str(tmp_path / "in")
    rows = [(g, float(v)) for v in range(1, 21) for g in ("a", "b")]
    src = spark.createDataFrame(rows, "grp string, amount double")
    src.repartition(5).write.mode("overwrite").parquet(staged)

    base = TxnTable(str(tmp_path), "base")
    agg = IncrementalAggregate(
        base,
        TxnTable(str(tmp_path), "state"),
        group_by={"grp": "grp"},
        sums={"amount_sum": "CAST(amount AS DECIMAL(18,2))"},
    )

    def sink(batch_df, epoch_id):
        if base.append_idempotent(batch_df, "mv:ingest", epoch_id) is not None:
            agg.refresh(batch_df.sparkSession, strategy="merge")

    stream = (
        spark.readStream.schema(src.schema).option("maxFilesPerTrigger", 2).parquet(staged)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert _state(spark, agg) == _full(spark, base)
    assert {r.grp for r in agg.read(spark).collect()} == {"a", "b"}
    assert agg.last_refreshed_version() == base.version()


def test_transform_enrichment_through_dim_join(spark, tmp_path):
    """The flagship-report shape, maintained incrementally: orders fold
    through a join against a static customer dim (is_active filter +
    group by the dim's segment) — the delta-preserving enrichment the
    medallion silver layer performs. State must equal the full
    recompute after appends AND deletes."""
    from pyspark.sql import Row

    base = TxnTable(str(tmp_path), "orders")
    dim = spark.createDataFrame(
        [Row(cust=1, seg="gold", active=True), Row(cust=2, seg="iron", active=True),
         Row(cust=3, seg="gold", active=False)],
        "cust int, seg string, active boolean",
    )
    agg = IncrementalAggregate(
        base,
        TxnTable(str(tmp_path), "state"),
        group_by={"seg": "seg"},
        sums={"amount_sum": "CAST(amount AS DECIMAL(18,2))"},
        transform=lambda cdf: cdf.join(F.broadcast(dim), cdf["cust"] == dim["cust"]).filter(
            F.col("active")
        ),
    )

    def orders(rows):
        return spark.createDataFrame(rows, "cust int, amount double")

    base.append(orders([(1, 10.0), (2, 5.0), (3, 99.0)]))  # cust 3 inactive
    agg.refresh(spark)
    base.append(orders([(1, 2.5), (2, 1.0)]))
    base.delete_where(spark, F.col("cust") == 2)
    agg.refresh(spark, strategy="merge")

    full = {
        (r.seg, str(r.amount_sum), r.n_rows)
        for r in base.read(spark)
        .join(F.broadcast(dim), "cust")
        .filter("active")
        .groupBy("seg")
        .agg(
            F.sum(F.col("amount").cast("decimal(18,2)")).alias("amount_sum"),
            F.count("*").alias("n_rows"),
        )
        .collect()
    }
    got = {
        (r.seg, str(r.amount_sum), r.n_rows) for r in agg.read(spark).collect()
    }
    assert got == full
    assert not any(s == "iron" for s, _, _ in got)  # cust 2 deleted


def test_audit_confirms_consistency_and_catches_drift(spark, view):
    base, agg = view
    base.append(_rows(spark, [("a", 1.0), ("b", 2.0)]))
    agg.refresh(spark)
    base.append(_rows(spark, [("a", 3.5)]))
    base.delete_where(spark, F.col("grp") == "b")
    agg.refresh(spark, strategy="merge")
    assert agg.audit(spark) is True
    # corrupt the state out-of-band -> the audit must catch it
    bad = agg.read(spark).withColumn(
        "amount_sum", F.col("amount_sum") + F.lit(1).cast("decimal(18,2)")
    )
    agg.state.overwrite(bad)
    assert agg.audit(spark) is False


def test_audit_pins_to_watermark_version(spark, view):
    """Base commits AFTER the last refresh must not fail the audit: the
    recompute time-travels to the folded version."""
    base, agg = view
    base.append(_rows(spark, [("a", 1.0)]))
    agg.refresh(spark)
    base.append(_rows(spark, [("a", 99.0)]))  # not yet folded
    assert agg.audit(spark) is True
