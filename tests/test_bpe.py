"""BPE learning + application: textbook examples, determinism,
round-trip conservation, and the pinned-oracle derivation."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_data_engineering_spark.operators.bpe import (
    _END,
    bpe_subwords,
    learn_bpe,
    segment_word,
)
from spark_data_engineering_spark.sources import load_table


def test_learn_bpe_textbook():
    # the classic Sennrich example family: 'low' x5, 'lower' x2,
    # 'newest' x6, 'widest' x3 — first merges form 'es', 'est', 'est</w>'
    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = learn_bpe(wf, 3)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", _END)
    assert segment_word("newest", merges) == ["n", "e", "w", "est</w>"]
    assert segment_word("lowest", merges) == ["l", "o", "w", "est</w>"]  # generalizes


def test_learning_is_input_order_independent():
    wf = [("abc", 3), ("abd", 2), ("bcd", 5)]
    assert learn_bpe(wf, 5) == learn_bpe(list(reversed(wf)), 5)


def test_segmentation_conserves_characters():
    merges = learn_bpe([("hello", 4), ("help", 3)], 4)
    for w in ("hello", "help", "shell"):
        joined = "".join(segment_word(w, merges))
        assert joined == w + _END


def test_distributed_apply_matches_driver(spark):
    docs = spark.createDataFrame(
        [(1, "low low lower newest"), (2, "widest newest low")],
        "doc_id bigint, text string",
    )
    wf = [("low", 3), ("lower", 1), ("newest", 2), ("widest", 1)]
    merges = learn_bpe(wf, 3)
    got = sorted(
        (r.subword, r.n)
        for r in bpe_subwords(docs, merges)
        .groupBy("subword")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    want = {}
    for text in ("low low lower newest", "widest newest low"):
        for tok in text.split(" "):
            for s in segment_word(tok, merges):
                want[s] = want.get(s, 0) + 1
    assert got == sorted(want.items())


def test_pinned_expectation_rederives(spark, sf_dir):
    """The query's pinned oracle must equal a from-scratch derivation
    (guards the pinned constants against silent corpus drift)."""
    from spark_data_engineering_spark.queries.text2 import bpe_subword_stats

    rows = [(r.subword, r.n) for r in bpe_subword_stats(spark, sf_dir).collect()]
    d = load_table(spark, "documents", sf_dir)
    wf = sorted(
        (r["token"], r["n"])
        for r in d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    merges = learn_bpe(wf, 20)
    want = {}
    for tok, f in wf:
        for s in segment_word(tok, merges):
            want[s] = want.get(s, 0) + f
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert rows == top
