"""DLT-style expectations (pipeline/expectations.py): warn counts but
never filters, drop diverts rows to a quarantine frame annotated with
WHY, fail refuses the batch naming the violated expectations, NULL
predicates are violations (DLT's rule), and the whole policy evaluates
as one aggregate job / two map-side filters — no per-rule jobs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_data_engineering_spark.pipeline.expectations import (
    Expectation,
    ExpectationError,
    enforce,
    metrics,
    split,
)

EXPS = (
    Expectation("pos", "v > 0", "drop"),
    Expectation("small", "v < 100", "drop"),
    Expectation("even_warn", "v % 2 = 0", "warn"),
)


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "v int")


def test_metrics_counts_and_kept_summary(spark):
    rows = {
        r.expectation: (r.action, r.violations, r.passed)
        for r in metrics(_df(spark, [1, 2, -3, 150, 4]), EXPS).collect()
    }
    assert rows["pos"] == ("drop", 1, 4)  # -3
    assert rows["small"] == ("drop", 1, 4)  # 150
    assert rows["even_warn"] == ("warn", 2, 3)  # 1, -3 odd... 1 and -3
    assert rows["__kept__"] == ("summary", 2, 3)  # -3 and 150 dropped


def test_split_good_bad_and_reasons(spark):
    good, bad = split(_df(spark, [1, -3, 150, 4]), EXPS)
    assert sorted(r.v for r in good.collect()) == [1, 4]
    got = {r.v: list(r.failed_expectations) for r in bad.collect()}
    assert got == {-3: ["pos"], 150: ["small"]}
    # warn never filters: a warn-only set keeps everything, empty quarantine
    g2, b2 = split(_df(spark, [1, 2]), (Expectation("w", "v > 5", "warn"),))
    assert sorted(r.v for r in g2.collect()) == [1, 2]
    assert b2.count() == 0 and "failed_expectations" in b2.columns


def test_null_predicate_is_violation(spark):
    df = spark.createDataFrame([(None,), (1,)], "v int")
    rows = {
        r.expectation: r.violations
        for r in metrics(df, (Expectation("pos", "v > 0", "drop"),)).collect()
    }
    assert rows["pos"] == 1  # NULL > 0 is NULL -> violation, not a pass
    good, bad = split(df, (Expectation("pos", "v > 0", "drop"),))
    assert [r.v for r in good.collect()] == [1]
    assert [list(r.failed_expectations) for r in bad.collect()] == [["pos"]]


def test_enforce_fail_policy(spark):
    exps = (
        Expectation("pos", "v > 0", "fail"),
        Expectation("even_warn", "v % 2 = 0", "warn"),
    )
    # warn violations do NOT refuse; counts are returned for observability
    assert enforce(_df(spark, [1, 2]), exps) == {"pos": 0, "even_warn": 1}
    with pytest.raises(ExpectationError, match="pos"):
        enforce(_df(spark, [1, -2]), exps)


def test_empty_frame_and_duplicate_names(spark):
    rows = {
        r.expectation: (r.violations, r.passed)
        for r in metrics(_df(spark, []), EXPS).collect()
    }
    assert rows["__kept__"] == (0, 0) and rows["pos"] == (0, 0)
    with pytest.raises(ValueError, match="duplicate"):
        metrics(_df(spark, [1]), (EXPS[0], EXPS[0]))
    with pytest.raises(ValueError, match="action"):
        Expectation("x", "v > 0", "quarantine")


def test_quarantine_dead_letter_roundtrip(spark, tmp_path):
    """The intended wiring: split a batch, good rows to the main table,
    quarantined rows (with reasons) to a dead-letter txn table."""
    from spark_data_engineering_spark.sources.txn import TxnTable

    src = _df(spark, [1, -3, 150, 4]).cache()
    try:
        good, bad = split(src, EXPS)
        main = TxnTable(str(tmp_path), "main")
        dead = TxnTable(str(tmp_path), "dead")
        main.append(good.coalesce(1))
        dead.append(bad.withColumn(
            "failed_expectations", F.to_json("failed_expectations")
        ).coalesce(1))
        assert sorted(r.v for r in main.read(spark).collect()) == [1, 4]
        got = {
            r.v: r.failed_expectations for r in dead.read(spark).collect()
        }
        assert got == {-3: '["pos"]', 150: '["small"]'}
    finally:
        src.unpersist()


def test_metrics_is_single_job_shape(spark):
    """The plan contract: however many expectations, metrics() is one
    aggregate over the source — no joins, no unions of per-rule scans."""
    plan = (
        metrics(_df(spark, [1, 2, 3]), EXPS)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.lower().count("aggregate") <= 2  # partial+final, one scan
    assert "join" not in plan.lower() and "union" not in plan.lower()


def test_stream_with_expectations_replay_and_partial_crash(spark, tmp_path):
    """Exactly-once across both tables: a redelivered epoch re-commits
    neither half, and a crash BETWEEN the two appends (main committed,
    quarantine not) replays into one skip + one commit — never a
    duplicate row on either side."""
    from spark_data_engineering_spark.pipeline.expectations import (
        split as _split,
        stream_with_expectations,
    )
    from spark_data_engineering_spark.sources.txn import TxnTable

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1,), (2,), (-3,), (150,), (4,)], "v int"
    ).coalesce(1).write.parquet(src)
    main = TxnTable(str(tmp_path), "main")
    dead = TxnTable(str(tmp_path), "dead")

    # simulate the partial crash: epoch 0's GOOD half already committed
    # under the stream's app id, quarantine half lost
    batch = spark.read.parquet(src)
    good0, _bad0 = _split(batch, EXPS)
    main.append_idempotent(good0, "sexp-test", 0)
    n_main = main.count_rows()

    def run():
        q = stream_with_expectations(
            spark.readStream.schema("v int").parquet(src),
            EXPS,
            main,
            dead,
            "sexp-test",
        )
        q.awaitTermination()

    run()
    # main: epoch 0 skipped (no duplicates); dead: committed once
    assert main.count_rows() == n_main
    assert sorted(r.v for r in main.read(spark).collect()) == [1, 2, 4]
    got = {r.v: r.failed_expectations for r in dead.read(spark).collect()}
    assert got == {-3: '["pos"]', 150: '["small"]'}
    # full redelivery (fresh checkpoint, same epochs): NOTHING recommits
    v_main, v_dead = main.version(), dead.version()
    run()
    assert (main.version(), dead.version()) == (v_main, v_dead)
    assert main.count_rows() == n_main and dead.count_rows() == 2


def test_expectation_name_validated_not_injectable():
    """Names are embedded in metrics()'s stack() SQL as quoted literals
    — a quote-bearing name must be refused at construction (ADVICE r8),
    not parse-error (or inject) at metrics time."""
    import pytest

    from spark_data_engineering_spark.pipeline.expectations import Expectation

    with pytest.raises(ValueError, match="must match"):
        Expectation("price's_cap", "price < 10")
    with pytest.raises(ValueError, match="must match"):
        Expectation("a, 'x', 0, 0) --", "true")
    with pytest.raises(ValueError, match="must match"):
        Expectation("__kept__", "true")  # reserved summary-row prefix
    Expectation("price.cap-v2_ok", "price < 10")  # identifier-ish: fine
