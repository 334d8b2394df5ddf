"""Interval-overlap join — the bucket-replication plan for range joins.

Spark compiles a raw interval-overlap predicate (``a.start <= b.end AND
b.start <= a.end``) to BroadcastNestedLoopJoin — O(|L| x |R|) and
driver-memory-bound, hopeless at fact x fact scale. The standard
engine-level fix (DBR's RANGE_JOIN hint, Flink's interval join) is time
bucketing, expressed here with plain DataFrame ops:

1. replicate each interval to every fixed-width time chunk it touches
   (``explode(sequence(...))`` — replication factor = interval length /
   chunk, a tunable constant);
2. equi-join on the chunk id — a plain shuffled/broadcast hash join;
3. re-check the exact overlap predicate inside the matched chunk;
4. emit each matching pair exactly ONCE without a distinct: only the
   first chunk both intervals share — ``chunk ==
   max(floor(l.start), floor(r.start))`` — may produce the pair. Two
   overlapping intervals always share that chunk (the later start lies
   inside both), so no pair is lost.

Cost: one shuffle on the chunk id; per-chunk work is quadratic in chunk
population, so ``chunk_seconds`` trades replication factor against
bucket density (hot chunks are a salting candidate like any other hot
key). No nested loop anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _chunk(col: Column, chunk_seconds: int) -> Column:
    return F.floor(col.cast("double") / chunk_seconds).cast("long")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    chunk_seconds: int = 3600,
    extra_cond: Column | None = None,
    max_chunk_rows: int | None = None,
) -> DataFrame:
    """All (left, right) pairs whose CLOSED intervals overlap:
    ``l.start <= r.end AND r.start <= l.end``. Column names must be
    disjoint across the two inputs (rename before calling). Each
    qualifying pair appears exactly once.

    ``max_chunk_rows`` (opt-in): drop chunks whose RIGHT-side
    population exceeds the cap before joining — the hot-bucket
    guardrail (same contract as ``lsh_candidate_pairs``'s
    ``max_bucket``): per-chunk work is quadratic in chunk population,
    and one pathologically dense time window (a flash event) would
    otherwise own the whole job. With the guardrail active, the
    exactly-once emit point shifts from the first shared chunk to the
    first SURVIVING shared chunk (computed against the collected hot
    set — bounded by construction: the guardrail exists because hot
    chunks are pathological few), so a pair is lost ONLY when every
    chunk the two intervals share is hot — a logged, bounded recall
    trade, never silent (a warning reports how many chunks fired).
    Per-candidate cost of the shifted emit check is O(|hot|) array
    scan; with thousands of hot chunks prefer a larger
    ``chunk_seconds`` instead."""
    overlap_chunk = F.greatest(
        _chunk(F.col(left_start), chunk_seconds),
        _chunk(F.col(right_start), chunk_seconds),
    )
    lb = left.withColumn(
        "_chunk",
        F.explode(
            F.sequence(
                _chunk(F.col(left_start), chunk_seconds),
                _chunk(F.col(left_end), chunk_seconds),
            )
        ),
    )
    rb = right.withColumn(
        "_chunk",
        F.explode(
            F.sequence(
                _chunk(F.col(right_start), chunk_seconds),
                _chunk(F.col(right_end), chunk_seconds),
            )
        ),
    )
    emit_once = F.col("_chunk") == overlap_chunk
    if max_chunk_rows is not None:
        import logging

        hot = (
            rb.groupBy("_chunk")
            .count()
            .filter(F.col("count") > max_chunk_rows)
            .select("_chunk")
        )
        hot_chunks = sorted(r["_chunk"] for r in hot.collect())
        if hot_chunks:
            logging.getLogger(__name__).warning(
                "interval_overlap_join: max_chunk_rows=%d guardrail dropped "
                "%d hot chunk(s) — pairs ALL of whose shared chunks are hot "
                "are lost (pairs with any surviving shared chunk are kept)",
                max_chunk_rows,
                len(hot_chunks),
            )
            lb = lb.join(F.broadcast(hot), "_chunk", "left_anti")
            rb = rb.join(F.broadcast(hot), "_chunk", "left_anti")
            # first SURVIVING shared chunk: _chunk is it iff every chunk
            # in [first_shared, _chunk) is hot — i.e. the gap equals the
            # hot count in that half-open range (an O(|hot|) scan of the
            # inlined literal array, zero extra shuffles)
            hot_arr = F.lit(hot_chunks)
            emit_once = (F.col("_chunk") - overlap_chunk) == F.size(
                F.filter(
                    hot_arr,
                    lambda h: (h >= overlap_chunk) & (h < F.col("_chunk")),
                )
            )
    cond = (
        (F.col(left_start) <= F.col(right_end))
        & (F.col(right_start) <= F.col(left_end))
        & emit_once
    )
    if extra_cond is not None:
        cond = cond & extra_cond
    return lb.join(rb, "_chunk").filter(cond).drop("_chunk")
