"""Stream-STREAM joins (Structured Streaming's symmetric hash join).

The reference has no streaming engine at all (its joins are batch,
etl/jobs/*.py); this is the Spark-native shape for correlating two
live event streams — e.g. attribute each purchase to the click that
preceded it — without landing either stream first.

Scale contract (the reason this operator exists at 100 TB/day):
both sides are shuffled ONCE on the join key into a symmetric
stateful hash join; per-key state is then evicted by the WATERMARK
plus the time-range condition, so state size is bounded by
(event rate x allowed gap x disorder delay), never by stream
length. An unbounded-state stream-stream join (no watermark, no
time bound) is refused by this module on purpose: it "works" in a
demo and OOMs in production.

Relationship to ``streaming/events.py::click_purchase_join_stream``:
that earlier helper is the SELF-join form (one event stream filtered
into both sides, fixed column names, unit-tested in
tests/test_streaming.py); this module is the general two-stream form
(independent sources, caller-named keys/timestamps) and carries the
oracle-gated query (``streaming_click_purchase_join``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner join two STREAMING frames on an equi key plus the interval
    condition ``left_ts <= right_ts <= left_ts + max_gap`` (the
    click->purchase attribution shape; an as-of variant would take the
    max right row per left, done downstream).

    Both sides get the same ``watermark`` delay: Spark derives the
    state eviction frontier from min(left watermark, right watermark)
    and the range condition, so a left row is dropped from state once
    no future right row could still match it (and vice versa). The
    delay must exceed the streams' maximum disorder or late rows
    silently miss matches — that is the watermark CONTRACT, not a bug;
    size it from measured disorder percentiles in production.

    Column names must already be disjoint where they overlap (rename
    before calling) — Spark's stream-stream join cannot disambiguate
    two streaming ``ts`` columns after the fact."""
    if not left.isStreaming or not right.isStreaming:
        raise ValueError(
            "interval_join_streams is for two STREAMING frames; use a "
            "plain join (batch) or enrich_with_dim_stream (stream-static)"
        )
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(left_key) == F.col(right_key))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.expr(f"{left_ts} + INTERVAL {max_gap}"))
    )
    return lw.join(rw, cond, "inner")
