"""Streaming deduplication with watermark-bounded state.

A training-data ingest stream must drop re-crawled/re-delivered
documents *as they arrive* — batch dedup (operators/dedup.py) would
mean landing duplicates and rewriting later. Spark's
``dropDuplicatesWithinWatermark`` keeps one state entry per key and
emits only the first occurrence; the watermark is the state-retention
contract: two duplicates arriving within ``delay`` of each other (event
time) are guaranteed deduped, and state older than the watermark is
evicted, so memory is bounded by key arrival rate × delay instead of
growing forever (the reason plain ``dropDuplicates`` on an unbounded
stream eventually OOMs its state store).

At 100 TB-scale ingest the state store shards by key hash across
executors (HDFS/RocksDB-backed state store); the fingerprint key is
tiny (16-byte md5), so state volume = new-keys-per-delay-window × ~50
bytes — the knob is ``delay``, traded against how late a duplicate can
arrive and still be caught. Exact-content dedup only; near-dup (MinHash)
stays a batch/foreachBatch concern because LSH banding needs
cross-partition candidate joins per micro-batch.

No reference analog (the reference is batch-only; SURVEY.md §2.6) —
this extends the dedup family (operators/dedup.py) to the streaming
ingest path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str],
    event_time_col: str,
    delay: str = "1 hour",
) -> DataFrame:
    """First-occurrence-only stream: one output row per distinct key,
    for duplicates arriving within ``delay`` of each other."""
    return stream.withWatermark(event_time_col, delay).dropDuplicatesWithinWatermark(
        key_cols
    )


def fingerprint_dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    event_time_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Content-exact streaming dedup: md5 fingerprint of the text as the
    dedup key (same key as the batch ``dedup_exact`` operator, so batch
    and streaming paths agree on what 'duplicate' means)."""
    with_fp = stream.withColumn("fp", F.md5(F.col(text_col)))
    return dedup_stream(with_fp, ["fp"], event_time_col, delay)
