"""Pre-join conflict renaming (reference P3).

The reference disambiguates overlapping column names before a join by
computing the Python set-intersection of ``df.columns`` and prefixing
the conflicts via ``selectExpr`` (reference dim_buyer_silver.py:106-124,
dim_seller_silver.py:102-120, dim_product_silver.py:114-146) — note the
reference also prefixes ``etl_inserted`` (its tests assert
``appuser_etl_inserted``, test_dim_buyer_silver.py:131,137).

Pure metadata operation — zero runtime cost (projection-only)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def prefix_conflicts(df: DataFrame, other: DataFrame, prefix: str, keep: tuple[str, ...] = ()) -> DataFrame:
    """Rename every column of ``df`` that also exists in ``other`` to
    ``{prefix}_{col}``, except join keys listed in ``keep``."""
    conflicts = (set(df.columns) & set(other.columns)) - set(keep)
    renamed = df
    for c in df.columns:
        if c in conflicts:
            renamed = renamed.withColumnRenamed(c, f"{prefix}_{c}")
    return renamed
