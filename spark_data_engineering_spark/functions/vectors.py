"""Vector math over array<float> embedding columns — JVM-side built-ins.

``F.aggregate``/``F.zip_with`` fold sequentially left-to-right, which is
the same evaluation order DuckDB's list functions use — so cosine values
match the oracle to the last bits (we still round before comparing).

At 100 TB these expressions run inside whole-stage codegen; the
brute-force k-NN is a broadcast of the (small) query set against the
(huge) corpus with no shuffle until the per-query top-k.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
