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
aggregates k keys instead of the full domain). ``heavy_hitter_tokens``
additionally PROVES the recounted top-k equals the exact top-k (or
falls back) using the n/(k+1) presence bound — see the query docstring.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


@dataclass(frozen=True)
class MGSummary:
    """Misra-Gries result: {item: lower-bound count} plus the total row
    count n observed by the same pass (no extra scan)."""

    counters: dict
    n: int

    @property
    def threshold(self) -> float:
        """Any item with true frequency above this is guaranteed present
        (n / (k+1) uses the k actually requested — stored at build)."""
        return self.n / (self._k + 1)

    _k: int = 0


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


def misra_gries_summary(df: DataFrame, col: str, k: int = 200) -> MGSummary:
    """Distributed Misra-Gries(k): per-partition Arrow summaries folded
    on the driver. Every item with true frequency > n/(k+1) is
    guaranteed present (including NULL — counted explicitly, since
    pandas ``value_counts`` drops it by default). Driver traffic is
    #partitions x (k+1) rows — independent of n and of the key domain;
    the total row count rides along, so no separate count job."""

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        n_rows = 0
        for pdf in batches:
            n_rows += len(pdf)
            vc = pdf["item"].value_counts(dropna=False)
            items = [None if pd.isna(i) else i for i in vc.index.tolist()]
            _mg_fold(counters, items, vc.to_numpy(), k)
        if n_rows:
            yield pd.DataFrame(
                {
                    "item": list(counters) + [None],
                    "cnt": list(counters.values()) + [0],
                    "meta_n": [0] * len(counters) + [n_rows],
                }
            )

    partials = df.select(col).toDF("item").mapInPandas(
        partial,
        schema=T.StructType(
            [
                T.StructField("item", df.schema[col].dataType),
                T.StructField("cnt", T.LongType()),
                T.StructField("meta_n", T.LongType()),
            ]
        ),
    ).collect()
    merged: dict = {}
    data = [r for r in partials if r["meta_n"] == 0]
    n_total = sum(r["meta_n"] for r in partials)
    _mg_fold(merged, [r["item"] for r in data], [r["cnt"] for r in data], k)
    return MGSummary(counters=merged, n=n_total, _k=k)


def exact_topk_via_sketch(
    df: DataFrame, col: str, mg: MGSummary, topk: int = 20
) -> DataFrame:
    """Exact-count DataFrame backing a top-``topk`` over ``col``, using
    the MG candidates when provably sufficient: if the recounted
    ``topk``-th candidate strictly clears the n/(k+1) presence bound,
    no non-candidate can rank above it, so the candidate-bounded
    recount IS the exact top-k input; otherwise fall back to the full
    aggregation. Returns (col, tf) unordered — callers order/limit."""
    from pyspark.sql import functions as F

    non_null = [i for i in mg.counters if i is not None]
    member = F.col(col).isin(non_null)
    if None in mg.counters:
        # IN never matches NULL; a NULL heavy hitter is a candidate too
        member = member | F.col(col).isNull()
    recount = df.filter(member).groupBy(col).agg(F.count("*").alias("tf"))
    rows = recount.collect()  # <= k rows — the proof needs the counts
    cand = sorted((r["tf"] for r in rows), reverse=True)
    proven = len(cand) >= topk and cand[topk - 1] > mg.threshold
    if proven:
        # reuse the already-computed counts instead of re-running the
        # recount scan when the caller executes the returned frame
        return df.sparkSession.createDataFrame(rows, recount.schema)
    return df.groupBy(col).agg(F.count("*").alias("tf"))


# ---- KMV (k-minimum-values) distinct-count sketch ----------------------
#
# The third workhorse summary (Bar-Yossef et al. 2002; mergeable per
# Agarwal et al. 2012): keep the k smallest distinct hash values of a
# column; if fewer than k are ever seen the sketch IS the distinct set
# (exact), otherwise (k-1)/u_k estimates the count from the k-th
# smallest normalized hash. Two properties make it the right shape
# here: the merge is a trivial union+truncate (streaming/kmv.py folds
# per-batch sketches with no error growth — min-k of a union is the
# min-k of the per-part min-ks), and the exactness domain gives the
# same proof-or-fallback contract as Misra-Gries: below k the answer
# is provably exact, so the query stays hash-green; at saturation the
# caller recounts exactly and the sketch result is labeled.
#
# Hashes are 48-bit md5 prefixes of the value's string form — the same
# cross-engine integerization as dp_source_counts/doc_classifier_scores,
# so a DuckDB oracle replays the identical sketch bit for bit. Collision
# semantics: the sketch counts distinct HASHES (collision probability
# ~n^2/2^49); every consumer here counts the same quantity on both
# sides, so the contract is consistent by construction.

KMV_HASH_BITS = 48
KMV_HASH_SPAN = float(1 << KMV_HASH_BITS)


def kmv_hash_col(col):
    """48-bit md5-prefix hash of a column's string form (JVM-side)."""
    from pyspark.sql import functions as F

    return F.conv(
        F.substring(F.md5(col.cast("string").cast("binary")), 1, 12), 16, 10
    ).cast("bigint")


def kmv_group_sketch(
    df: DataFrame, group_col: str, col: str, k: int = 1024
) -> DataFrame:
    """Distributed per-group KMV(k): one Arrow pass keeps each
    partition's k smallest distinct hashes per group (bounded memory,
    no shuffle), then a per-group window over the pruned candidates
    (<= k x partitions rows) keeps the global k minimum. Returns
    (group, hv) — at most k rows per group, still distributed."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    hashed = df.select(
        F.col(group_col).alias("grp"), kmv_hash_col(F.col(col)).alias("hv")
    ).filter(F.col("hv").isNotNull())

    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best: dict = {}
        for pdf in batches:
            for grp, sub in pdf.groupby("grp", dropna=False):
                cur = best.get(grp)
                merged = pd.concat([cur, sub["hv"]]) if cur is not None else sub["hv"]
                u = merged.drop_duplicates().nsmallest(k)
                best[grp] = u
        for grp, u in best.items():
            yield pd.DataFrame({"grp": grp, "hv": u.to_numpy()})

    cand = hashed.mapInPandas(prune, schema="grp string, hv bigint").dropDuplicates()
    w = W.partitionBy("grp").orderBy("hv")
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("grp", "hv")
    )
