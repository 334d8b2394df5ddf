"""DP count release: bounded deterministic noise, correct ladder."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from spark_data_engineering_spark.queries.privacy import (
    _EPS,
    _KMAX,
    _THRESHOLDS,
    dp_source_counts,
)


def test_threshold_ladder_is_a_cdf():
    ts = [t for t, _ in _THRESHOLDS]
    assert ts == sorted(ts)
    assert 0 < ts[0] < 1 and ts[-1] <= 1.0 + 1e-12
    # ladder covers all but the geometric tail beyond |k| = KMAX
    a = math.exp(-_EPS)
    # remaining mass (both tails beyond the ladder) is exactly a^KMAX
    assert 1.0 - ts[-1] <= a ** _KMAX * 1.001


def test_release_is_deterministic_and_consistent(spark, sf_dir):
    a = dp_source_counts(spark, sf_dir).cache()
    rows = {r.source: (r.n_docs, r.dp_noise, r.dp_count) for r in a.collect()}
    b = {
        r.source: (r.n_docs, r.dp_noise, r.dp_count)
        for r in dp_source_counts(spark, sf_dir).collect()
    }
    assert rows == b  # seeded noise: same release every run
    for n, k, rel in rows.values():
        assert -_KMAX <= k <= _KMAX
        assert rel == n + k
    a.unpersist()


def test_noise_distribution_sanity(spark):
    """Over many synthetic keys the empirical mean |noise| should sit
    near E|K| = 2a/((1+a)(1-a)) for the two-sided geometric."""
    from spark_data_engineering_spark.queries.privacy import _SEED, _noise_col

    keys = spark.range(2000).select(
        F.concat(F.lit("s"), F.col("id").cast("string")).alias("source")
    )
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
    mean_abs = keys.select(F.abs(_noise_col(u)).alias("a")).agg(
        F.avg("a")
    ).first()[0]
    a = math.exp(-_EPS)
    expect = 2 * a / ((1 + a) * (1 - a))
    assert abs(mean_abs - expect) < 0.15, (mean_abs, expect)
