"""Learned quality classifier (queries/quality.py classifier_scores):
hand-computed tiny-frame check, plan pins (broadcast apply, no Python
in the plan), and the curation_decisions precedence integration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from spark_data_engineering_spark.queries.quality import (
    _CLF_BUCKETS,
    _CLF_Q,
    _clf_bucket_col,
    classifier_scores,
)


def test_classifier_matches_hand_computation(spark):
    """4 docs over a 3-token vocab, every rate computed by hand:
    prior = 0.5; rate(aa) = (3+2.5)/8, rate(bb) = (2+2.5)/8,
    rate(cc) = (0+2.5)/9; doc score = mean of quantized rates."""
    docs = spark.createDataFrame(
        [
            (1, "en", "aa aa bb"),
            (2, "en", "aa bb"),
            (3, "de", "bb cc"),
            (4, "de", "cc cc cc"),
        ],
        "doc_id bigint, lang string, text string",
    )
    # the hand numbers assume no hash collisions among the 3 tokens
    buckets = (
        spark.createDataFrame([("aa",), ("bb",), ("cc",)], "tok string")
        .select(_clf_bucket_col(F.col("tok")).alias("b"))
        .collect()
    )
    assert len({r.b for r in buckets}) == 3
    got = {r.doc_id: r for r in classifier_scores(docs).collect()}
    assert got[1].clf_score == pytest.approx(0.6458)
    assert got[2].clf_score == pytest.approx(0.625)
    assert got[3].clf_score == pytest.approx(0.4201)
    assert got[4].clf_score == pytest.approx(0.2778)
    assert [got[i].en_like for i in (1, 2, 3, 4)] == [True, True, False, False]
    assert [got[i].n_scored_tokens for i in (1, 2, 3, 4)] == [3, 2, 2, 3]


def test_classifier_plan_broadcast_apply_no_python(spark, sf_dir):
    df = entrymod.queries()["doc_classifier_scores"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the <=4096-row weight table broadcasts onto the token stream
    assert "BroadcastHashJoin" in plan
    # pure JVM end-to-end: no row-at-a-time or Arrow Python eval
    assert "EvalPython" not in plan
    # token count + qrate sum partial-aggregate map-side
    assert plan.count("HashAggregate") >= 2


def test_curation_decisions_classifier_tier(spark, sf_dir):
    """'drop:classifier' fires iff every higher-precedence rule passed
    AND the learned score is below the threshold — consistency between
    the composed verdict and the standalone score query."""
    from spark_data_engineering_spark.queries.curation import _CLF_DROP

    dec = {r.doc_id: r for r in entrymod.queries()["curation_decisions"](spark, sf_dir).collect()}
    assert dec and all(r.clf_score is not None for r in dec.values())
    for r in dec.values():
        if r.decision == "drop:classifier":
            assert r.clf_score < _CLF_DROP
            assert r.n_tokens >= 20 and r.dup_token_frac <= 0.65 and r.quality >= 0.5
        elif r.decision == "keep":
            assert r.clf_score >= _CLF_DROP
