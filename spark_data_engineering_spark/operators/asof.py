"""As-of (point-in-time) join — an operator Spark lacks natively.

Two strategies, equivalence-tested against each other and against
DuckDB's native ASOF JOIN oracle:

- ``strategy="window"`` (default, the scale path): tag both sides, union,
  then ``last(right_ts, ignorenulls=True)`` over a per-key window ordered
  by time with right-side rows sorting first on ties. One shuffle on the
  key; no range-condition join explosion. This is the plan that survives
  100 TB — the union sorts within key partitions and the window is a
  single pass.
- ``strategy="pandas"``: ``applyInPandas`` per key group running
  ``pd.merge_asof`` — the Arrow-batched escape hatch for semantics the
  window form can't express (nearest-neighbor tolerance, backward+forward).

Left rows with no prior right row get NULL (left as-of join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_value_cols: tuple[str, ...] = (),
    strategy: str = "window",
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.on <= left.on`` within the same ``by`` group."""
    if strategy == "window":
        return _asof_window(left, right, on, by, right_value_cols, suffix)
    if strategy == "pandas":
        return _asof_pandas(left, right, on, by, right_value_cols, suffix)
    raise ValueError(f"unknown strategy {strategy!r}")


def _asof_window(left, right, on, by, right_value_cols, suffix):
    payload = F.struct(F.col(on).alias(on), *[F.col(c) for c in right_value_cols])
    r = right.select(
        F.col(by).alias(by),
        F.col(on).alias(on),
        F.lit(0).alias("_side"),  # right rows sort BEFORE left on ts ties (>= semantics)
        payload.alias("_rpay"),
        *[F.lit(None).alias(f"_l_{c}") for c in left.columns if c not in (by,)],
    )
    l = left.select(
        F.col(by).alias(by),
        F.col(on).alias(on),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rpay"].dataType).alias("_rpay"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns if c not in (by,)],
    )
    unioned = r.unionByName(l)
    w = (
        W.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = unioned.withColumn("_match", F.last("_rpay", ignorenulls=True).over(w))
    out = matched.filter(F.col("_side") == 1).select(
        F.col(by),
        *[F.col(f"_l_{c}").alias(c) for c in left.columns if c not in (by,)],
        F.col(f"_match.{on}").alias(f"{on}{suffix}"),
        *[F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in right_value_cols],
    )
    return out


def _asof_pandas(left, right, on, by, right_value_cols, suffix):
    import pandas as pd

    l_cols = list(left.columns)
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in left.schema.fields]
        + [f"`{on}{suffix}` {right.schema[on].dataType.simpleString()}"]
        + [f"`{c}{suffix}` {right.schema[c].dataType.simpleString()}" for c in right_value_cols]
    )
    rename = {on: f"{on}{suffix}", **{c: f"{c}{suffix}" for c in right_value_cols}}

    def merge(lp: pd.DataFrame, rp: pd.DataFrame) -> pd.DataFrame:
        lp = lp.sort_values(on, kind="mergesort")
        rp = rp[[on, *right_value_cols]].sort_values(on, kind="mergesort").rename(columns=rename)
        if rp.empty:
            res = lp.copy()
            # None (not NaT): the `on` column may be numeric, and Arrow
            # rejects NaT in non-datetime columns
            res[f"{on}{suffix}"] = None
            for c in right_value_cols:
                res[f"{c}{suffix}"] = None
        else:
            res = pd.merge_asof(
                lp, rp, left_on=on, right_on=f"{on}{suffix}", direction="backward"
            )
        return res[l_cols + [f"{on}{suffix}"] + [f"{c}{suffix}" for c in right_value_cols]]

    return (
        left.groupBy(by)
        .cogroup(right.select(by, on, *right_value_cols).groupBy(by))
        .applyInPandas(lambda l, r: merge(l, r), schema=out_schema)
    )
