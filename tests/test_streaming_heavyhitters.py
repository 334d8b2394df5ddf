"""Streaming MG accumulator: exactly-once folds, atomic state, parity
with the one-shot batch sketch."""

from __future__ import annotations

from spark_data_engineering_spark.operators.sketches import misra_gries_summary
from spark_data_engineering_spark.streaming.heavyhitters import StreamingHeavyHitters


def _df(spark, items):
    return spark.createDataFrame([(x,) for x in items], "v string").repartition(4)


def test_accumulated_equals_batch_for_small_domain(spark, tmp_path):
    """Domain fits in k: the folded stream state must be EXACT, matching
    the one-shot summary counters and n."""
    batches = [["a"] * 10 + ["b"] * 5, ["a"] * 7 + ["c"] * 3, ["b"] * 4]
    hh = StreamingHeavyHitters(str(tmp_path / "s"), "v", k=10)
    for epoch, items in enumerate(batches):
        hh.process_batch(_df(spark, items), epoch)
    mg = hh.summary()
    flat = [x for b in batches for x in b]
    one_shot = misra_gries_summary(_df(spark, flat), "v", k=10)
    assert mg.counters == one_shot.counters == {"a": 17, "b": 9, "c": 3}
    assert mg.n == one_shot.n == len(flat)


def test_redelivered_epoch_folds_nothing(spark, tmp_path):
    hh = StreamingHeavyHitters(str(tmp_path / "s"), "v", k=10)
    hh.process_batch(_df(spark, ["a"] * 5), 0)
    hh.process_batch(_df(spark, ["a"] * 5), 0)  # crash re-delivery
    hh.process_batch(_df(spark, ["a"] * 5), 1)
    mg = hh.summary()
    assert mg.counters == {"a": 10}
    assert mg.n == 10


def test_state_survives_reopen(spark, tmp_path):
    d = str(tmp_path / "s")
    hh = StreamingHeavyHitters(d, "v", k=10)
    hh.process_batch(_df(spark, ["x"] * 8 + ["y"] * 2), 0)
    # new handle, same dir — a fresh process after a crash
    hh2 = StreamingHeavyHitters(d, "v", k=10)
    hh2.process_batch(_df(spark, ["x"] * 8 + ["y"] * 2), 0)  # redelivery
    hh2.process_batch(_df(spark, ["y"] * 3), 1)
    mg = hh2.summary()
    assert mg.counters == {"x": 8, "y": 5}
    assert mg.n == 13


def test_null_items_round_trip_state(spark, tmp_path):
    """NULL counters must survive the JSON snapshot (stored as pairs,
    not object keys — a {null: c} object would become the string
    'null')."""
    hh = StreamingHeavyHitters(str(tmp_path / "s"), "v", k=5)
    hh.process_batch(_df(spark, [None] * 6 + ["a"] * 2), 0)
    hh.process_batch(_df(spark, [None] * 3), 1)
    mg = hh.summary()
    assert mg.counters.get(None) == 9
    assert "null" not in mg.counters
    assert mg.n == 11


def test_presence_guarantee_across_batches(spark, tmp_path):
    """An item heavy in AGGREGATE but light per batch must survive the
    cross-batch folds (the mergeable-summaries property)."""
    hh = StreamingHeavyHitters(str(tmp_path / "s"), "v", k=10)
    n = 0
    for epoch in range(5):
        items = ["hot"] * 40 + [f"e{epoch}_{i}" for i in range(100)]
        n += len(items)
        hh.process_batch(_df(spark, items), epoch)
    mg = hh.summary()
    assert mg.n == n
    assert 200 > n / 11  # hot is above the guarantee threshold
    assert "hot" in mg.counters
    assert mg.counters["hot"] <= 200  # never overcounts


def test_k_mismatch_refuses_state(spark, tmp_path):
    d = str(tmp_path / "s")
    hh = StreamingHeavyHitters(d, "v", k=10)
    hh.process_batch(_df(spark, ["a"] * 5), 0)
    other = StreamingHeavyHitters(d, "v", k=20)
    try:
        other.summary()
    except ValueError as e:
        assert "k=10" in str(e)
    else:
        raise AssertionError("reopening with a different k must refuse")
