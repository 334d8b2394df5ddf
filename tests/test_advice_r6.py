"""Regression tests for the round-6 ADVICE findings:

1. (low) edit_distance_join hardcoded a bigint empty-output schema; a
   string id column (fuzzy_part_name_pairs passes p_name) on empty /
   all-null input returned wrongly-typed frames. Output id types now
   derive from the input id column on every path.
2. (low) edit_distance_join picked its path from a global min(length):
   one short string forced the unpruned length-band cross join onto the
   ENTIRE dataset (O(n^2) cliff) plus an extra driver action. Now the
   input is stratified by length — long-long pairs gram-join, pairs
   with a short member go through an equi length-band join (key
   expansion, hash join) — with no driver action.
3. (low) assign_row_ids bucket arithmetic silently lost precision when
   (max-min+1) * n_buckets exceeded 2^53, breaking bucket monotonicity.
   Now an executor-side assert_true fails loudly.
4. (low) StreamingKMV's applied-epoch watermark (keyed by app_id, with
   per-run fresh checkpoint dirs) could silently SKIP real batches
   after a rerun reset epoch numbering; since the KMV fold is
   idempotent the watermark is dropped — every delivered batch folds,
   replays are no-ops by construction.
5. (low) txn_maintenance_report's oracle pins n_data_files = 5; the
   build step now asserts the 4+1 file layout so a corpus/writer change
   fails at the builder, not as a confusing gate hash-mismatch.
   (Covered by the build assert itself + the local gate; exercised in
   test 5 below by just running the builder.)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_data_engineering_spark.operators.fuzzyjoin import edit_distance_join


def _brute(spark, rows, k, schema="id bigint, s string"):
    df = spark.createDataFrame(rows, schema)
    a, b = df.alias("a"), df.alias("b")
    return sorted(
        map(
            tuple,
            a.join(b, F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.levenshtein("a.s", "b.s").cast("bigint").alias("edit_dist"),
            )
            .filter(F.col("edit_dist") <= k)
            .collect(),
        )
    )


# ---- 1. id types derive from the input ----------------------------------


def test_fuzzyjoin_string_ids_empty_and_nonempty(spark):
    out = edit_distance_join(
        spark.createDataFrame([("x1", None)], "id string, s string"), "s", "id"
    )
    assert out.schema["id_a"].dataType.simpleString() == "string"
    assert out.schema["id_b"].dataType.simpleString() == "string"
    assert out.count() == 0

    rows = [("alpha", "banana-band"), ("beta", "banana-bend"), ("gam", "zzzzzzzzz")]
    out2 = edit_distance_join(
        spark.createDataFrame(rows, "id string, s string"), "s", "id"
    )
    assert out2.schema["id_a"].dataType.simpleString() == "string"
    got = sorted(map(tuple, out2.collect()))
    assert got == [("alpha", "beta", 1)]


def test_fuzzyjoin_empty_input_keeps_int_ids(spark):
    out = edit_distance_join(
        spark.createDataFrame([], "id int, s string"), "s", "id"
    )
    assert out.schema["id_a"].dataType.simpleString() == "int"
    assert out.count() == 0


# ---- 2. length stratification -------------------------------------------


def test_fuzzyjoin_one_short_string_stays_stratified(spark):
    """One 1-char string among long strings: long-long pairs must still
    come from the gram join (and stay exact), short-involved pairs from
    the banded equi join — verified against brute force, with the plan
    free of nested-loop joins."""
    rows = [
        (1, "a"),  # the stray short string (len 1 < q + k*q = 6)
        (2, "banana-band"),
        (3, "banana-bend"),
        (4, "banana-bandz"),
        (5, "completely-other"),
        (6, "ab"),  # short pair partner: ed("a","ab")=1
    ]
    df = spark.createDataFrame(rows, "id bigint, s string")
    got = sorted(map(tuple, edit_distance_join(df, "s", "id", max_dist=2).collect()))
    assert got == _brute(spark, rows, 2)
    assert (1, 6, 1) in got and (2, 3, 1) in got
    plan = edit_distance_join(df, "s", "id", max_dist=2)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_fuzzyjoin_short_short_and_short_long_bands_exact(spark):
    """All-short input exercises the banded equi join alone; straddling
    ids make sure both union legs (short-smaller-id vs long-smaller-id)
    emit, without duplicates."""
    rows = [(1, "ab"), (2, "cd"), (3, "abx"), (4, "a"), (5, "abcdefgh"), (6, "abcdefghx")]
    df = spark.createDataFrame(rows, "id bigint, s string")
    got = sorted(map(tuple, edit_distance_join(df, "s", "id", max_dist=2).collect()))
    assert got == _brute(spark, rows, 2)
    # no duplicate pairs from the two band legs
    assert len(got) == len({(a, b) for a, b, _ in got})


# ---- 3. assign_row_ids domain guard --------------------------------------


def test_assign_row_ids_overflow_domain_fails_loudly(spark):
    from spark_data_engineering_spark.queries.profiling import assign_row_ids

    wide = spark.createDataFrame(
        [(0,), (2**60,)], "k bigint"
    )  # (max-min+1)*64 >> 2^53
    with pytest.raises(Exception, match="2\\^53"):
        assign_row_ids(wide, "k").collect()


def test_assign_row_ids_normal_domain_unaffected(spark):
    from spark_data_engineering_spark.queries.profiling import assign_row_ids

    df = spark.createDataFrame([(i * 7,) for i in range(100)], "k bigint")
    got = assign_row_ids(df, "k").orderBy("k").collect()
    assert [r.row_id for r in got] == list(range(1, 101))


# ---- 4. StreamingKMV: no epoch watermark, idempotent folds ---------------


def test_streaming_kmv_reset_epoch_ids_do_not_skip(spark, tmp_path):
    """A rerun with a fresh checkpoint restarts epoch numbering at 0 —
    the accumulator must FOLD those batches (the old watermark skipped
    them as 'already folded')."""
    from spark_data_engineering_spark.streaming.kmv import StreamingKMV

    acc = StreamingKMV(str(tmp_path), "g", "v", k=64)
    b1 = spark.createDataFrame([("x", i) for i in range(10)], "g string, v int")
    b2 = spark.createDataFrame([("x", i) for i in range(10, 20)], "g string, v int")
    acc.process_batch(b1, 0)
    acc.process_batch(b2, 1)
    assert len(acc.sketches()["x"]) == 20
    # rerun: fresh accumulator, epoch ids reset; a NEW batch at epoch 0
    b3 = spark.createDataFrame([("x", i) for i in range(20, 25)], "g string, v int")
    StreamingKMV(str(tmp_path), "g", "v", k=64).process_batch(b3, 0)
    assert len(acc.sketches()["x"]) == 25  # folded, not skipped


# ---- 5. txn_maintenance_report build invariant ---------------------------


def test_txn_maintenance_build_asserts_file_layout(spark, sf_dir):
    """Running the builder must pass its own 4+1 live-file assertion and
    report n_data_files = 5 (the oracle's pinned constant)."""
    from spark_data_engineering_spark.queries.incremental_q import (
        txn_maintenance_report,
    )

    row = txn_maintenance_report(spark, sf_dir).first()
    assert row.n_data_files == 5
