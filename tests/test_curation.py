"""Sequence-packing and curation semantics (queries/curation.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_data_engineering_spark.queries.curation import (
    SEQ_BUDGET,
    context_length_buckets,
    corpus_curation_counts,
    pack_sequences,
)


def test_pack_sequences_offsets_are_contiguous_per_shard(spark, sf_dir):
    out = pack_sequences(spark, sf_dir).cache()
    rows = out.orderBy("shard", "doc_id").collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) > 1
    for shard_rows in by_shard.values():
        expect = 0
        for r in shard_rows:
            # concat-and-chunk: offsets tile the shard's token stream
            # exactly, no gaps and no overlaps
            assert r.tok_offset == expect
            expect += r.n_tokens
            assert r.seq_first == r.tok_offset // SEQ_BUDGET
            assert r.seq_last == (r.tok_offset + r.n_tokens - 1) // SEQ_BUDGET
            assert r.seq_first <= r.seq_last
    out.unpersist()


def test_pack_sequences_single_shuffle(spark, sf_dir):
    plan = pack_sequences(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_context_length_buckets_cover_all_docs(spark, sf_dir):
    from spark_data_engineering_spark.sources import load_table

    out = context_length_buckets(spark, sf_dir)
    n_docs = out.agg(F.sum("n_docs")).collect()[0][0]
    assert n_docs == load_table(spark, "documents", sf_dir).count()


def test_curation_counts_docs_bounded_by_corpus(spark, sf_dir):
    from spark_data_engineering_spark.sources import load_table

    out = corpus_curation_counts(spark, sf_dir)
    total = out.agg(F.sum("n_docs")).collect()[0][0]
    corpus = load_table(spark, "documents", sf_dir).count()
    # quality filter + dedup can only shrink the corpus; split must not
    # duplicate documents
    assert 0 < total <= corpus
    splits = {r.split for r in out.collect()}
    assert splits <= {"train", "val", "test"}


def test_scrub_segments_invariants(spark, sf_dir):
    import hashlib

    from spark_data_engineering_spark.queries.curation import (
        SEG_TOKENS,
        scrub_boilerplate_segments,
    )
    from spark_data_engineering_spark.sources import load_table

    out = scrub_boilerplate_segments(spark, sf_dir).cache()
    docs = load_table(spark, "documents", sf_dir)
    assert out.count() == docs.count()  # every doc emits exactly one row
    assert out.filter(F.col("n_dropped") > F.col("n_segments")).count() == 0
    # untouched docs reassemble to EXACTLY their original text
    joined = out.join(docs, "doc_id")
    untouched = joined.filter(F.col("n_dropped") == 0)
    assert untouched.count() > 0
    mismatched = untouched.filter(F.md5(F.col("text")) != F.col("clean_fp")).count()
    assert mismatched == 0
    # fully-scrubbed docs hash the empty string
    empty_md5 = hashlib.md5(b"").hexdigest()
    fully = out.filter(F.col("n_dropped") == F.col("n_segments"))
    assert fully.filter(F.col("clean_fp") != empty_md5).count() == 0
    assert fully.filter(F.col("clean_chars") != 0).count() == 0
    # segment count matches ceil(n_tokens / SEG_TOKENS)
    expect = joined.filter(
        F.col("n_segments")
        != F.ceil(F.size(F.split(F.col("text"), " ")).cast("double") / SEG_TOKENS).cast(
            "bigint"
        )
    )
    assert expect.count() == 0
    out.unpersist()


def test_scrub_segments_drops_shared_boilerplate(spark):
    """Two docs sharing an identical leading segment lose exactly that
    segment; unique tails survive verbatim."""
    from spark_data_engineering_spark.queries.curation import SEG_TOKENS
    import hashlib

    boiler = " ".join(["lic"] * SEG_TOKENS)
    a_tail = " ".join([f"a{i}" for i in range(SEG_TOKENS)])
    b_tail = " ".join([f"b{i}" for i in range(SEG_TOKENS)])
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df = spark.createDataFrame(
            [
                (1, f"{boiler} {a_tail}", "en", "s", 0),
                (2, f"{boiler} {b_tail}", "en", "s", 0),
                (3, " ".join([f"c{i}" for i in range(5)]), "en", "s", 0),
            ],
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        df.write.parquet(f"{td}/documents.parquet")
        from spark_data_engineering_spark.queries.curation import (
            scrub_boilerplate_segments,
        )

        rows = {r.doc_id: r for r in scrub_boilerplate_segments(spark, td).collect()}
    assert rows[1].n_dropped == 1 and rows[2].n_dropped == 1
    assert rows[1].clean_fp == hashlib.md5(a_tail.encode()).hexdigest()
    assert rows[2].clean_fp == hashlib.md5(b_tail.encode()).hexdigest()
    assert rows[3].n_dropped == 0


def test_cdc_chunks_are_shift_robust(spark):
    """The CDC property: prepending bytes to a doc leaves every chunk
    after the first boundary identical, so shifted boilerplate still
    dedups — fixed-stride chunking loses ALL alignment on the same
    edit."""
    import hashlib

    from spark_data_engineering_spark.queries.curation import _CDC_D, _CDC_W

    import random

    rnd = random.Random(7)
    base = "".join(
        chr(ord("a") + rnd.randrange(26)) for _ in range(4000)
    )  # high-entropy: ~4000/64 boundaries expected
    docs = spark.createDataFrame(
        [(1, base), (2, "XYZ" + base)], "doc_id bigint, text string"
    )

    def chunks_of(text):
        cuts = [
            i
            for i in range(_CDC_W, len(text) + 1)
            if int(hashlib.md5(text[i - _CDC_W : i].encode()).hexdigest()[:4], 16)
            % _CDC_D
            == 0
        ]
        if not cuts or cuts[-1] != len(text):
            cuts.append(len(text))
        out, prev = [], 0
        for c in sorted(set(cuts)):
            out.append(text[prev:c])
            prev = c
        return out

    c1, c2 = chunks_of(base), chunks_of("XYZ" + base)
    shared = set(c1) & set(c2)
    assert len(shared) >= max(1, len(c1) - 2), (len(c1), len(shared))

    # and the registered query finds those shared chunks across the docs
    from spark_data_engineering_spark.queries import curation as CQ
    from pyspark.sql import functions as F

    # inline replica of the query body over this 2-doc frame
    pos = docs.select(
        "doc_id", "text", F.explode(F.sequence(F.lit(_CDC_W), F.length("text"))).alias("i")
    )
    win = F.substring(F.col("text"), F.col("i") - _CDC_W + 1, _CDC_W)
    cut_hash = F.conv(F.substring(F.md5(win.cast("binary")), 1, 4), 16, 10).cast("bigint")
    from pyspark.sql import Window as W

    cuts = (
        pos.filter(cut_hash % _CDC_D == 0)
        .select("doc_id", "text", "i")
        .unionByName(docs.select("doc_id", "text", F.length("text").alias("i")))
        .distinct()
    )
    w = W.partitionBy("doc_id").orderBy("i")
    prev = F.coalesce(F.lag("i").over(w), F.lit(0))
    got = {
        r.chunk
        for r in cuts.select(
            "doc_id", F.substring(F.col("text"), prev + 1, F.col("i") - prev).alias("chunk")
        )
        .groupBy("chunk")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter((F.col("nd") >= 2) & (F.length("chunk") >= _CDC_W))
        .collect()
    }
    assert got == {c for c in shared if len(c) >= _CDC_W}
