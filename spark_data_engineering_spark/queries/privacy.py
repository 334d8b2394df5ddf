"""Differentially-private count release under the correctness gate.

The mechanism is the two-sided geometric ("discrete Laplace") mechanism —
the standard epsilon-DP release for integer counts (Ghosh, Roughgarden &
Sundararajan 2009, "Universally utility-maximizing privacy mechanisms";
public method): released = true_count + K where
P(K = k) = (1-a)/(1+a) * a^|k|, a = exp(-eps). Per-source doc counts
have sensitivity 1 (each doc carries exactly one source), so eps = 1
here.

Determinism (what makes this oracle-able): the noise draw's uniform u is
a seeded md5 of the source value — u = int(md5[0:8], 16) / 2^32, an
exact dyadic rational both engines compute bit-identically — and the
inverse CDF is evaluated against PINNED literal quantile boundaries
(computed once in Python below, embedded in both the Spark expression
and the SQL string), so no engine ever evaluates ln/exp at query time:
the comparison ladder is exact in IEEE doubles. This is the seeded-PRNG
pattern every deterministic sampler in queries/sampling.py uses, applied
to a noise mechanism.

NOTE: a real release would not also publish the true counts; they are
included here because the point under test is the mechanism's
plumbing + determinism, and the gate needs both sides.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_data_engineering_spark.registry import query
from spark_data_engineering_spark.sources import load_table

_EPS = 1.0
_KMAX = 16
_SEED = "dpseed1:"


def _dgeom_thresholds(eps: float = _EPS, kmax: int = _KMAX) -> list[tuple[float, int]]:
    """Cumulative inverse-CDF ladder for the two-sided geometric
    distribution: u < threshold[i] selects noise k_i. Computed once in
    Python; both engines see only the pinned double literals."""
    a = math.exp(-eps)
    scale = (1 - a) / (1 + a)
    out = []
    cum = 0.0
    for k in range(-kmax, kmax):
        cum += scale * a ** abs(k)
        out.append((cum, k))
    return out


_THRESHOLDS = _dgeom_thresholds()


def _noise_sql(u_expr: str) -> str:
    branches = "\n               ".join(
        f"WHEN {u_expr} < {t!r} THEN {k}" for t, k in _THRESHOLDS
    )
    return f"CASE {branches} ELSE {_KMAX} END"


def _noise_col(u):
    expr = F.lit(_KMAX)
    for t, k in reversed(_THRESHOLDS):
        expr = F.when(u < F.lit(t), F.lit(k)).otherwise(expr)
    return expr


_U_SQL = (
    f"CAST(('0x' || SUBSTR(MD5('{_SEED}' || source), 1, 8)) AS BIGINT)"
    " / 4294967296.0"
)


@query(
    "dp_source_counts",
    oracle=f"""
    WITH c AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
    )
    SELECT source,
           n_docs,
           CAST({_noise_sql(_U_SQL)} AS BIGINT) AS dp_noise,
           CAST(n_docs + ({_noise_sql(_U_SQL)}) AS BIGINT) AS dp_count
    FROM c
    """,
)
def dp_source_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document counts released through the eps=1 two-sided
    geometric mechanism (module docstring): one groupBy, then a
    map-side seeded inverse-CDF noise draw against pinned quantile
    literals — no shuffle beyond the count, noise cost O(#sources),
    and the whole release is deterministic so the DuckDB replay
    hash-matches bit for bit."""
    docs = load_table(spark, "documents", sf_dir)
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(_SEED), F.col("source")).cast("binary")), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        / F.lit(4294967296.0)
    )
    noise = _noise_col(u).cast("bigint")
    return counts.select(
        "source",
        "n_docs",
        noise.alias("dp_noise"),
        (F.col("n_docs") + noise).cast("bigint").alias("dp_count"),
    )
