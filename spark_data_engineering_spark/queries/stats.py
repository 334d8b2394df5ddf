"""Statistical-aggregate and frequent-pattern queries.

Two analytics families the reference's report layer stops short of
(its aggregates end at sum/mean/median — etl/transform steps, see
SURVEY.md §2 A1/A2) but that any at-scale analytics engine needs:

* **Single-pass statistical moments** (correlation, regression slope /
  intercept) computed from *exact decimal* power sums. Float
  aggregation order differs between engines and between runs at
  different parallelism, so naive ``corr()`` is not reproducible; the
  moment sums here are DECIMAL (associative, exact), and only the
  final closed-form arithmetic runs in IEEE doubles — the identical
  op sequence on both engines, so the result is bit-identical. On a
  cluster the decimal sums are partial-aggregable (map-side combine),
  so the whole statistic is one shuffle of 25 tiny moment rows.

* **Market-basket co-occurrence** (frequent item pairs) with the
  Apriori pruning step that makes it feasible at 100 TB: an item pair
  can only reach pair-support s if each item alone appears in >= s
  baskets, so the (tiny) frequent-item set is computed first and
  broadcast, pruning the quadratic per-basket pair expansion before
  it happens. Per-basket work is bounded by basket size (<= 13 in
  this corpus); the only unbounded aggregation is the pair groupBy,
  which partial-aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_data_engineering_spark.functions.numeric import round4
from spark_data_engineering_spark.registry import query
from spark_data_engineering_spark.sources import load_table


@query(
    "brand_quantity_price_corr",
    oracle="""
    WITH m AS (
        SELECT p.p_brand,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))
                        * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))
                        * CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand
    )
    SELECT p_brand, n_rows,
           FLOOR((sx / n_rows) * 10000 + 0.5) / 10000 AS avg_qty,
           FLOOR((sy / n_rows) * 10000 + 0.5) / 10000 AS avg_price,
           FLOOR(((n_rows * sxy - sx * sy)
                  / SQRT((n_rows * sxx - sx * sx) * (n_rows * syy - sy * sy)))
                 * 10000 + 0.5) / 10000 AS corr_qty_price,
           FLOOR(((n_rows * sxy - sx * sy) / (n_rows * sxx - sx * sx))
                 * 10000 + 0.5) / 10000 AS slope_price_per_qty,
           FLOOR(((sy - ((n_rows * sxy - sx * sy) / (n_rows * sxx - sx * sx)) * sx)
                  / n_rows) * 10000 + 0.5) / 10000 AS intercept_price
    FROM m
    """,
)
def brand_quantity_price_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand Pearson correlation + OLS fit of extendedprice on
    quantity, from exact decimal power sums (see module docstring for
    the determinism argument — built-in ``corr()``/``regr_slope()``
    sum doubles in partition order and are not reproducible across
    engines or parallelism).

    Plan shape: broadcast part (dim) onto lineitem, one groupBy(p_brand)
    with five decimal partial-aggregable sums, then pure projection
    arithmetic on 25 rows. No second pass — the closed-form moment
    identities replace the textbook mean-centered two-pass formula.
    """
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    m = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(x).cast("double").alias("sx"),
            F.sum(y).cast("double").alias("sy"),
            F.sum(x * x).cast("double").alias("sxx"),
            F.sum(y * y).cast("double").alias("syy"),
            F.sum(x * y).cast("double").alias("sxy"),
        )
    )
    n = F.col("n_rows").cast("double")
    sx, sy = F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    cov_n = n * sxy - sx * sy  # n^2 * covariance
    var_x_n = n * sxx - sx * sx
    var_y_n = n * syy - sy * sy
    slope = cov_n / var_x_n
    return m.select(
        "p_brand",
        "n_rows",
        round4(sx / n).alias("avg_qty"),
        round4(sy / n).alias("avg_price"),
        round4(cov_n / F.sqrt(var_x_n * var_y_n)).alias("corr_qty_price"),
        round4(slope).alias("slope_price_per_qty"),
        round4((sy - slope * sx) / n).alias("intercept_price"),
    )


# A pair can only be co-ordered >= MIN_SUPPORT times if each part alone
# is ordered >= MIN_SUPPORT times (Apriori anti-monotonicity) — the
# single-item prune is lossless for the pair query.
MIN_SUPPORT = 3


@query(
    "copurchase_part_pairs",
    oracle=f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    freq AS (
        SELECT l_partkey FROM li GROUP BY l_partkey
        HAVING COUNT(*) >= {MIN_SUPPORT}
    ),
    fi AS (SELECT li.* FROM li JOIN freq USING (l_partkey))
    SELECT a.l_partkey AS partkey_a, b.l_partkey AS partkey_b,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM fi a JOIN fi b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
    HAVING COUNT(*) >= {MIN_SUPPORT}
    """,
)
def copurchase_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent co-purchased part pairs (pair support >= 3 orders) —
    the market-basket primitive behind "bought together" and feature
    co-occurrence mining.

    Scale shape: (1) distinct (order, part) — one shuffle, partial
    distinct map-side; (2) lossless Apriori prune via a broadcast
    semi-join against the frequent-item set, so rare items never enter
    the pair expansion; (3) self-join on l_orderkey — both sides hash
    to the same exchange, which Spark reuses (one physical shuffle),
    and per-order fan-out is bounded by basket size; (4) pair groupBy
    with partial counts. No step materializes the item×item matrix.
    """
    li = (
        load_table(spark, "lineitem", sf_dir)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    freq = (
        li.groupBy("l_partkey")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= MIN_SUPPORT)
        .select("l_partkey")
    )
    fi = li.join(F.broadcast(freq), "l_partkey", "left_semi")
    a = fi.alias("a")
    b = fi.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("partkey_a"),
            F.col("b.l_partkey").alias("partkey_b"),
        )
        .agg(F.count("*").cast("bigint").alias("n_orders"))
        .filter(F.col("n_orders") >= MIN_SUPPORT)
    )
