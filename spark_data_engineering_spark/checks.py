"""Data-quality checks as plain DataFrame assertions.

Replaces the reference's Great Expectations gate (reference
etl/utils/base_table.py:140-196 + etl/great_expectations/expectations/*).
The reference wired three suites: orders.order_id unique,
fact_orders.order_id unique, daily_order_metrics.order_date unique +
0 < max(total_price_mean) < 100000 (SURVEY.md §2.7 V2-V4). Its README
also *intended* wide-table uniqueness checks that were never wired
(§2.7 quirk) — those are implemented here as first-class checks.

A ``Check`` is ``DataFrame -> str | None`` (None = pass, message = fail).
Each check is a single Spark job using aggregate pushdown; at scale the
uniqueness check is one hash aggregation, not a collect.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Check = Callable[[DataFrame], "str | None"]


class CheckError(Exception):
    """Raised when a node's data-quality checks fail (blocks the write,
    like the reference's InvalidDataException, base_table.py:232-235)."""


def unique(*cols: str) -> Check:
    def check(df: DataFrame) -> str | None:
        dup = (
            df.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            key = {c: dup[0][c] for c in cols}
            return f"duplicate key on {cols}: first offender {key}"
        return None

    return check


def not_null(*cols: str) -> Check:
    def check(df: DataFrame) -> str | None:
        agg = df.agg(
            *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols]
        ).collect()[0]
        bad = {c: agg[c] for c in cols if agg[c]}
        return f"nulls in {bad}" if bad else None

    return check


def bounds(col: str, lo: float | None = None, hi: float | None = None, strict: bool = True) -> Check:
    """Bound on max(col) — the reference's revenue sanity bound
    (expectations/daily_order_metrics.json:17-32: 0 < max < 100000)."""

    def check(df: DataFrame) -> str | None:
        mx = df.agg(F.max(F.col(col)).alias("_m")).collect()[0]["_m"]
        if mx is None:
            return f"{col}: max is NULL (empty input?)"
        if lo is not None and not (mx > lo if strict else mx >= lo):
            return f"{col}: max {mx} not above {lo}"
        if hi is not None and not (mx < hi if strict else mx <= hi):
            return f"{col}: max {mx} not below {hi}"
        return None

    return check


def row_count_min(n: int) -> Check:
    def check(df: DataFrame) -> str | None:
        cnt = df.limit(n).count()
        return None if cnt >= n else f"row count {cnt} < required {n}"

    return check
