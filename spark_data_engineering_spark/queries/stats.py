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
from spark_data_engineering_spark.materialize import materialize


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
    # li feeds the frequency count AND (via fi) both self-join sides;
    # materialize the distinct pairs once (measured 4 FileScans of
    # lineitem in one plan without it)
    li = (
        load_table(spark, "lineitem", sf_dir)
        .select("l_orderkey", "l_partkey")
        .distinct()
        .transform(materialize)
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


@query(
    "ab_test_report",
    oracle="""
    WITH assigned AS (
        SELECT event_type,
               CAST(('0x' || SUBSTR(MD5('ab1:' || CAST(user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 2 AS arm,
               value
        FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
    ),
    m AS (
        SELECT event_type, arm,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s,
               CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4)))
                    AS DOUBLE) AS ss
        FROM assigned GROUP BY event_type, arm
    ),
    w AS (
        SELECT a.event_type,
               a.n AS n_a, b.n AS n_b,
               a.s / a.n AS mean_a, b.s / b.n AS mean_b,
               (a.ss - a.s * a.s / a.n) / (a.n - 1) AS var_a,
               (b.ss - b.s * b.s / b.n) / (b.n - 1) AS var_b
        FROM (SELECT * FROM m WHERE arm = 0) a
        JOIN (SELECT * FROM m WHERE arm = 1) b USING (event_type)
    )
    SELECT event_type, n_a, n_b,
           FLOOR((mean_a) * 10000 + 0.5) / 10000 AS mean_a,
           FLOOR((mean_b) * 10000 + 0.5) / 10000 AS mean_b,
           FLOOR(((mean_b - mean_a)
                  / SQRT(var_a / n_a + var_b / n_b)) * 10000 + 0.5) / 10000
               AS t_stat,
           (ABS((mean_b - mean_a) / SQRT(var_a / n_a + var_b / n_b)) > 1.96)
               AS significant_95
    FROM w
    """,
)
def ab_test_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment analysis (round 6): users are deterministically
    hash-assigned to two arms (seeded md5 parity — the stable
    bucketing every experimentation platform uses so a user never
    switches arms), and each event type gets a Welch two-sample
    t-statistic on the event value, computed from the same exact
    decimal power sums as ``brand_quantity_price_corr`` (single-pass
    moments, partial-aggregable, float-order-proof; sqrt is an
    exactly-rounded IEEE op so both engines agree bit-for-bit). The
    synthetic assignment is a true A/A test, so ``significant_95``
    doubles as a false-positive monitor — on this corpus no arm split
    should clear |t| > 1.96 except by the expected 5% chance.

    Scale: one shuffle of 2 x #event_types moment rows; the md5
    assignment is map-side."""
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ab1:"), F.col("user_id").cast("string")).cast("binary")),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    v = F.col("value").cast("decimal(18,4)")
    m = ev.select("event_type", arm.alias("arm"), "value").groupBy(
        "event_type", "arm"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(v).cast("double").alias("s"),
        F.sum(v * v).cast("double").alias("ss"),
    )
    a = m.filter(F.col("arm") == 0).alias("a")
    b = m.filter(F.col("arm") == 1).alias("b")
    j = a.join(b, F.col("a.event_type") == F.col("b.event_type")).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        (F.col("a.s") / F.col("a.n")).alias("_ma"),
        (F.col("b.s") / F.col("b.n")).alias("_mb"),
        ((F.col("a.ss") - F.col("a.s") * F.col("a.s") / F.col("a.n")) / (F.col("a.n") - 1)).alias("_va"),
        ((F.col("b.ss") - F.col("b.s") * F.col("b.s") / F.col("b.n")) / (F.col("b.n") - 1)).alias("_vb"),
    )
    t = (F.col("_mb") - F.col("_ma")) / F.sqrt(
        F.col("_va") / F.col("n_a") + F.col("_vb") / F.col("n_b")
    )
    return j.select(
        "event_type",
        "n_a",
        "n_b",
        round4(F.col("_ma")).alias("mean_a"),
        round4(F.col("_mb")).alias("mean_b"),
        round4(t).alias("t_stat"),
        (F.abs(t) > 1.96).alias("significant_95"),
    )


# Poisson(1) inverse-CDF thresholds (cumulative probabilities), pinned as
# literals so both engines draw identical resample counts from the same
# seeded uniform — the dp_source_counts technique applied to the
# bootstrap. P(K <= k) for k = 0..5; u beyond the last threshold -> 6.
_POIS1_CDF = (0.36787944, 0.73575888, 0.91969860, 0.98101184, 0.99634015, 0.99940582)
# The same thresholds as 8-hex-char literals: ceil(t * 2^32) in lowercase
# hex. md5 output is fixed-width lowercase hex, so comparing the first 8
# chars LEXICOGRAPHICALLY equals comparing the 32-bit integer they
# encode — h/2^32 < t  <=>  h < ceil(t*2^32)  <=>  hex(h) < hex literal.
# This removes the conv(hex,16,10) + division per draw (measured 2x on
# the whole query); re-derived from _POIS1_CDF in tests/test_stats.py.
_POIS1_HEX = ("5e2d58d4", "bc5ab1a8", "eb715e12", "fb23978a", "ff1025e8", "ffd90f51")
_BOOT_B = 100  # bootstrap replicates
_BOOT_LANES = 4  # uniforms carved per md5: 32 hex chars = 4 x 8
_BOOT_G = _BOOT_B // _BOOT_LANES
_BOOT_LO_RANK = 3   # ~2.5th percentile of 100 means
_BOOT_HI_RANK = 98  # ~97.5th percentile


def _pois_sql_hex(hx: str) -> str:
    branches = " ".join(
        f"WHEN {hx} < '{t}' THEN {k}" for k, t in enumerate(_POIS1_HEX)
    )
    return f"CASE {branches} ELSE 6 END"


def _pois_col_hex(hx):
    out = F.lit(6)
    for k, t in reversed(list(enumerate(_POIS1_HEX))):
        out = F.when(hx < F.lit(t), F.lit(k)).otherwise(out)
    return out


@query(
    "bootstrap_revenue_ci",
    oracle=f"""
    WITH reps AS (
        SELECT o.o_orderpriority AS priority, o.o_orderkey,
               CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
               g.g, l.lane
        FROM orders o,
             (SELECT UNNEST(RANGE(1, {_BOOT_G} + 1)) AS g) g,
             (SELECT UNNEST(RANGE(0, {_BOOT_LANES})) AS lane) l
    ),
    drawn AS (
        SELECT priority, (g - 1) * {_BOOT_LANES} + lane + 1 AS b, cents,
               {_pois_sql_hex(
                   "SUBSTR(MD5('boot:' || CAST(g AS VARCHAR) || ':'"
                   " || CAST(o_orderkey AS VARCHAR)), 1 + 8 * lane, 8)")}
                   AS c
        FROM reps
    ),
    bmeans AS (
        SELECT priority, b,
               FLOOR(CAST(SUM(cents * c) AS DOUBLE) / SUM(c) + 0.5) / 100
                   AS bmean
        FROM drawn GROUP BY priority, b HAVING SUM(c) > 0
    ),
    ranked AS (
        SELECT priority, bmean,
               ROW_NUMBER() OVER (PARTITION BY priority ORDER BY bmean, b) AS rn,
               COUNT(*) OVER (PARTITION BY priority) AS nb
        FROM bmeans
    ),
    ci AS (
        SELECT priority,
               MAX(CASE WHEN rn = {_BOOT_LO_RANK} THEN bmean END) AS ci_lo,
               MAX(CASE WHEN rn = {_BOOT_HI_RANK} THEN bmean END) AS ci_hi,
               CAST(MAX(nb) AS BIGINT) AS n_replicates
        FROM ranked GROUP BY priority
    ),
    pt AS (
        SELECT o_orderpriority AS priority,
               FLOOR(CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                          AS DOUBLE) / COUNT(*) + 0.5) / 100 AS mean_revenue
        FROM orders GROUP BY o_orderpriority
    )
    SELECT pt.priority, pt.mean_revenue, ci.ci_lo, ci.ci_hi, ci.n_replicates,
           (pt.mean_revenue >= ci.ci_lo AND pt.mean_revenue <= ci.ci_hi)
               AS point_inside_ci
    FROM pt JOIN ci USING (priority)
    """,
)
def bootstrap_revenue_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-bootstrap 95% CI for mean order revenue per priority
    (round 6) — the resampling-statistics tier (Efron 1979) on top of
    the closed-form moment queries. Each of the {B} replicates draws a
    Poisson(1) count per order (the Poisson bootstrap, Chamandy et al.
    2012 — the STREAMABLE bootstrap: counts are independent per row, so
    no replicate ever needs a global n, which is what makes resampling
    work map-side on a 100 TB table) from a seeded md5 uniform — four
    32-bit lanes carved per digest, compared as fixed-width hex against
    pinned inverse-CDF literals (see _POIS1_HEX); replicate means use
    exact integer CENTS sums; the CI is the {lo}rd/{hi}th order
    statistic of the rounded replicate means (explicit ranks — no
    interpolation ambiguity).
    Fully deterministic, so the whole resampling pipeline hash-matches
    the SQL replay — and ``point_inside_ci`` doubles as a sanity
    monitor (the point estimate should sit inside its own 95% CI).

    Scale: the only blowup is the B-way row explode, map-side and
    partial-aggregated into B x #groups moment rows; the rank window
    runs over 100 rows per group."""
    orders = load_table(spark, "orders", sf_dir).select(
        F.col("o_orderpriority").alias("priority"), "o_orderkey", "o_totalprice"
    )
    # One md5 per (order, hash-group): each digest's 32 hex chars carve
    # into 4 lane substrings = 4 independent 32-bit uniforms, and the
    # Poisson inverse-CDF compares the 8-hex-char lane LEXICOGRAPHICALLY
    # against the pinned _POIS1_HEX thresholds (fixed-width lowercase hex
    # orders exactly like the integer it encodes). Together with exact
    # integer CENTS sums instead of per-row decimal multiplies, this is
    # the same draw-per-(b, order) contract at 6x the throughput
    # (31.3 s -> 4.4 s at sf0.1, SCALE.md round 7).
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    g = orders.withColumn("g", F.explode(F.sequence(F.lit(1), F.lit(_BOOT_G))))
    digest = F.md5(
        F.concat(
            F.lit("boot:"),
            F.col("g").cast("string"),
            F.lit(":"),
            F.col("o_orderkey").cast("string"),
        ).cast("binary")
    )
    lanes = g.withColumn("_h", digest).select(
        "priority",
        cents.alias("cents"),
        "g",
        F.posexplode(
            F.array(*[F.substring("_h", 1 + 8 * i, 8) for i in range(_BOOT_LANES)])
        ).alias("lane", "hx"),
    )
    drawn = lanes.withColumn(
        "b", (F.col("g") - 1) * _BOOT_LANES + F.col("lane") + 1
    ).withColumn("c", _pois_col_hex(F.col("hx")))
    bmeans = (
        drawn.groupBy("priority", "b")
        .agg(
            F.sum(F.col("cents") * F.col("c")).alias("_s"),
            F.sum("c").alias("_n"),
        )
        .filter(F.col("_n") > 0)
        .select(
            "priority",
            "b",
            (
                F.floor(F.col("_s").cast("double") / F.col("_n") + F.lit(0.5)) / 100
            ).alias("bmean"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("priority").orderBy("bmean", "b")
    ranked = bmeans.withColumn("rn", F.row_number().over(w)).withColumn(
        "nb", F.count(F.lit(1)).over(W.partitionBy("priority"))
    )
    ci = ranked.groupBy("priority").agg(
        F.max(F.when(F.col("rn") == _BOOT_LO_RANK, F.col("bmean"))).alias("ci_lo"),
        F.max(F.when(F.col("rn") == _BOOT_HI_RANK, F.col("bmean"))).alias("ci_hi"),
        F.max("nb").cast("bigint").alias("n_replicates"),
    )
    pt = orders.groupBy("priority").agg(
        (
            F.floor(
                F.sum(cents).cast("double") / F.count(F.lit(1)) + F.lit(0.5)
            )
            / 100
        ).alias("mean_revenue")
    )
    return pt.join(ci, "priority").select(
        "priority",
        "mean_revenue",
        "ci_lo",
        "ci_hi",
        "n_replicates",
        (
            (F.col("mean_revenue") >= F.col("ci_lo"))
            & (F.col("mean_revenue") <= F.col("ci_hi"))
        ).alias("point_inside_ci"),
    )
