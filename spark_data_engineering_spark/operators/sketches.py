"""Mergeable frequency sketches: distributed Misra-Gries heavy hitters.

HyperLogLog (distinct counting) ships as Spark's built-in
``approx_count_distinct`` and is oracled in ``approx_distinct_parts``;
this module adds the OTHER workhorse summary a 100 TB profiling pass
needs: heavy hitters over an unbounded key domain in bounded memory.

Misra-Gries(k) keeps at most ``k`` counters and guarantees that every
item with true frequency > n/(k+1) is present, with each kept counter
undercounting by at most n/(k+1) (Misra & Gries 1982; the merge step
and its preserved error bound are from Agarwal et al. 2012, "Mergeable
Summaries"). That mergeability is what makes it distributed-friendly:
each partition builds a local summary in one Arrow pass, and the
bounded union (#partitions x k counters, a few KB each) is folded on
the driver — the same bounded-driver contract as IVF centroid training.

The sketch yields CANDIDATES, not answers: the production pattern is
sketch -> exact recount of only the candidate keys (a second scan that
aggregates k keys instead of the full domain) — which is how the
``heavy_hitter_tokens`` query stays hash-exact against a plain SQL
top-k oracle while never holding more than k counters per task.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _mg_fold(counters: dict, items, counts, k: int) -> None:
    """Fold (item, count) pairs into an MG summary in place, keeping at
    most k counters via the standard subtract-the-(k+1)th-largest step."""
    for item, cnt in zip(items, counts):
        counters[item] = counters.get(item, 0) + int(cnt)
    if len(counters) > k:
        # subtract the (k+1)-th largest value from everything; drop <= 0
        vals = sorted(counters.values(), reverse=True)
        dec = vals[k]
        for item in list(counters):
            c = counters[item] - dec
            if c > 0:
                counters[item] = c
            else:
                del counters[item]


def misra_gries_summary(
    df: DataFrame, col: str, k: int = 200
) -> dict[str, int]:
    """Distributed Misra-Gries(k): per-partition Arrow summaries folded
    on the driver. Returns {item: lower-bound count} with at most k
    entries; every item with true frequency > n/(k+1) is guaranteed
    present. Driver traffic is #partitions x k counters — independent
    of n and of the key domain."""

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            vc = pdf["item"].value_counts()
            _mg_fold(counters, vc.index.tolist(), vc.to_numpy(), k)
        if counters:
            yield pd.DataFrame(
                {"item": list(counters), "cnt": list(counters.values())}
            )

    partials = df.select(col).toDF("item").mapInPandas(
        partial,
        schema=T.StructType(
            [
                T.StructField("item", df.schema[col].dataType),
                T.StructField("cnt", T.LongType()),
            ]
        ),
    ).collect()
    merged: dict = {}
    _mg_fold(
        merged, [r["item"] for r in partials], [r["cnt"] for r in partials], k
    )
    return merged
