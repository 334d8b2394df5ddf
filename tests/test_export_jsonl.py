"""export_jsonl_shards: byte-exact JSON encode/decode round-trip through
the native JVM json writer/reader — escaping, unicode, embedded
newlines, control characters — plus the manifest-vs-source identity the
gate enforces (VERDICT r6 task 5)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

NASTY = [
    (0, 'plain ascii text'),
    (1, 'quotes "double" and \'single\''),
    (2, 'back\\slash and tab\there'),
    (3, 'embedded\nnewline and\rcarriage'),
    (4, 'unicode: café 日本語 \U0001f600 ß'),
    (5, 'control \x01\x02 chars \x1f'),
    (6, ''),  # empty string
    (7, '{"looks": "like json"}'),
    (8, 'trailing spaces   '),
]


def test_jsonl_roundtrip_bytes_exact(spark, tmp_path):
    """Every nasty string must come back byte-identical through
    write.json -> read.json, and the physical files must stay one JSON
    object per line (line-format contract)."""
    df = spark.createDataFrame(NASTY, "doc_id bigint, text string")
    out = str(tmp_path / "jsonl")
    df.coalesce(1).write.json(out)
    back = {
        r.doc_id: r.text
        for r in spark.read.schema("doc_id bigint, text string").json(out).collect()
    }
    assert back == dict(NASTY)
    # line-format: each non-empty physical line parses standalone
    import pathlib

    lines = []
    for p in pathlib.Path(out).glob("part-*"):
        lines += [ln for ln in p.read_text().splitlines() if ln]
    assert len(lines) == len(NASTY)
    parsed = {d["doc_id"]: d.get("text", "") for d in map(json.loads, lines)}
    assert parsed == dict(NASTY)


def test_export_jsonl_shards_manifest_matches_source(spark, sf_dir):
    """The read-back JSONL manifest must equal the same aggregate
    computed directly over the source parquet (the oracle's claim,
    re-proven in-process)."""
    from spark_data_engineering_spark.functions import text as TX
    from spark_data_engineering_spark.queries.curation import (
        N_SHARDS,
        export_jsonl_shards,
    )
    from spark_data_engineering_spark.sources import load_table

    got = {r.shard: r for r in export_jsonl_shards(spark, sf_dir).collect()}
    crc = F.conv(
        F.substring(F.md5(F.col("text").cast("binary")), 1, 8), 16, 10
    ).cast("bigint")
    want = {
        r.shard: r
        for r in load_table(spark, "documents", sf_dir)
        .groupBy((F.col("doc_id") % N_SHARDS).cast("bigint").alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(TX.token_count(F.col("text"))).cast("bigint").alias("n_tokens"),
            F.sum(crc).alias("content_crc"),
            F.min(F.md5(F.col("text").cast("binary"))).alias("min_md5"),
            F.max(F.md5(F.col("text").cast("binary"))).alias("max_md5"),
        )
        .collect()
    }
    assert set(got) == set(want) and len(got) == N_SHARDS
    for s in got:
        assert got[s] == want[s]
