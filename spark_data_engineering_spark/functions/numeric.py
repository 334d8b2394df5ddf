"""Cross-engine deterministic rounding.

``ROUND(double, n)`` disagrees between engines at half-ulp boundaries:
Spark rounds the shortest decimal representation HALF_UP (via BigDecimal),
DuckDB rounds the scaled double. ``floor(x * 10^n + 0.5) / 10^n`` is the
same IEEE-754 op sequence in both engines, so results are bit-identical —
used for every value that feeds the correctness hash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round2(col: Column) -> Column:
    return F.floor(col * 100 + F.lit(0.5)) / 100


def round4(col: Column) -> Column:
    return F.floor(col * 10000 + F.lit(0.5)) / 10000


def round6(col: Column) -> Column:
    return F.floor(col * 1000000 + F.lit(0.5)) / 1000000


def sql_round2(expr: str) -> str:
    return f"FLOOR(({expr}) * 100 + 0.5) / 100"


def sql_round4(expr: str) -> str:
    return f"FLOOR(({expr}) * 10000 + 0.5) / 10000"
