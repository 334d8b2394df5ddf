"""Skew-handling utilities: salted aggregation and salted joins.

AQE's skew-join handling (enabled in session.py) covers sort-merge
joins at runtime; these explicit operators cover the cases AQE can't:
skewed *aggregations* (one hot group key) and broadcast-infeasible
skewed joins where the salt must be planned into both sides.

Public textbook technique: split each hot key into S sub-keys with a
uniform salt, aggregate partially per (key, salt), then merge partials.
The two-stage form is exactly what map-side partial aggregation does
automatically for algebraic aggregates — so ``salted_agg`` matters for
the non-algebraic ones (collect_list, exact percentile) where partials
can't combine and one reducer would own the hot key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, *cols: str, col_name: str = "_salt") -> DataFrame:
    """Uniform salt column. Pass content columns (``with_salt(df, 16,
    "id", "ts")``) to derive the salt from row content — stable under
    stage recomputation, which matters whenever downstream correctness
    depends on a row keeping its salt (two-stage aggregations).

    With no columns, falls back to hashing ``monotonically_increasing_id``
    — uniform and cheap, but NOT stable across stage retries (it depends
    on partition layout); only use the fallback where the salt value
    doesn't affect results (e.g. replicate-joins)."""
    basis = [F.col(c) for c in cols] if cols else [F.monotonically_increasing_id()]
    return df.withColumn(col_name, F.pmod(F.xxhash64(*basis), F.lit(buckets)))


def salted_count_distinct(
    df: DataFrame, group_col: str, value_col: str, buckets: int = 16
) -> DataFrame:
    """Exact distinct count per (possibly hot) group key in two stages:
    stage 1 dedups (key, salt-of-value, value) partitions, stage 2 sums
    per-salt partial distincts — no single reducer ever sees a whole hot
    key."""
    salted = df.select(
        F.col(group_col),
        F.col(value_col),
        F.pmod(F.xxhash64(F.col(value_col)), F.lit(buckets)).alias("_salt"),
    )
    partial = salted.groupBy(group_col, "_salt").agg(
        F.count_distinct(F.col(value_col)).alias("_partial")
    )
    return partial.groupBy(group_col).agg(F.sum("_partial").alias("n_distinct"))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = 8,
) -> DataFrame:
    """Skewed equi-join: salt the big side, replicate the small side
    once per salt bucket, join on (key, salt). Row multiplication is
    #small x buckets — use when the small side is modest but above the
    broadcast threshold and the big side has hot keys."""
    # salt must be uniform per ROW (hashing the key would map each key to
    # a single bucket and provide no skew relief)
    big_salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(buckets))
    )
    replicated = small.crossJoin(
        big.sparkSession.range(buckets).select(F.col("id").cast("bigint").alias("_salt"))
    )
    joined = big_salted.join(replicated, [key, "_salt"])
    return joined.drop("_salt")
