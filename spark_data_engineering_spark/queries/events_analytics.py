"""Event-stream analytics in batch form: as-of join, sessionization,
funnel — plus scalar-function coverage (strings, dates, conditionals,
maps) absent from the reference (SURVEY.md §2.2 lists none)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from spark_data_engineering_spark.functions import numeric as NR
from spark_data_engineering_spark.operators.asof import asof_join
from spark_data_engineering_spark.registry import query
from spark_data_engineering_spark.sources import load_table
from spark_data_engineering_spark.materialize import materialize


@query(
    "asof_purchase_click",
    oracle="""
    SELECT p.event_id,
           p.user_id,
           p.ts,
           c.ts AS ts_click,
           CAST(DATE_DIFF('second', c.ts, p.ts) AS BIGINT) AS secs_since_click
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (window strategy): each purchase matched to the same
    user's latest click at or before it. DuckDB's native ASOF JOIN is
    the oracle; Spark expresses it as union + last-ignorenulls window —
    one shuffle on user_id, no range-join explosion (see
    operators/asof.py for the 100 TB rationale)."""
    ev = load_table(spark, "events", sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(purchases, clicks, on="ts", by="user_id", suffix="_click")
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "ts_click",
        (F.unix_timestamp("ts") - F.unix_timestamp("ts_click")).alias("secs_since_click"),
    )


@query(
    "sessionize_events",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE OR
                         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    numbered AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id,
           CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           FLOOR((SUM(value)) * 100 + 0.5) / 100 AS session_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: lag-gap flag + running sum = session id,
    then per-session aggregates (the streaming twin uses
    session_window, streaming/events.py). Two window passes + one agg,
    all partitioned by user_id — a single shuffle."""
    ev = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w) > 1800, 1
        )
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0),
    )
    wrun = W.partitionBy("user_id").orderBy("ts").rowsBetween(W.unboundedPreceding, W.currentRow)
    numbered = flagged.withColumn("session_id", F.sum("new_session").over(wrun))
    return numbered.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        NR.round2(F.sum("value")).alias("session_value"),
    )


@query(
    "signup_click_purchase_funnel",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN t_click IS NOT NULL AND t_click > t_signup THEN 1 ELSE 0 END)
               AS BIGINT) AS clicked_after_signup,
           CAST(SUM(CASE WHEN t_purchase IS NOT NULL AND t_click IS NOT NULL
                          AND t_purchase > t_click AND t_click > t_signup THEN 1 ELSE 0 END)
               AS BIGINT) AS purchased_after_click
    FROM (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events
        GROUP BY user_id
    )
    WHERE t_signup IS NOT NULL
    """,
)
def signup_click_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel: conditional-aggregation first-touch times then ordered-
    step counting — one shuffle, no self-joins."""
    ev = load_table(spark, "events", sf_dir)
    first_touch = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    funnel = first_touch.filter(F.col("t_signup").isNotNull())
    return funnel.agg(
        F.count("*").alias("n_users"),
        F.sum(
            (F.col("t_click").isNotNull() & (F.col("t_click") > F.col("t_signup"))).cast("long")
        ).alias("clicked_after_signup"),
        F.sum(
            (
                F.col("t_purchase").isNotNull()
                & F.col("t_click").isNotNull()
                & (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_signup"))
            ).cast("long")
        ).alias("purchased_after_click"),
    )


@query(
    "orders_by_year_quarter",
    oracle="""
    SELECT CAST(YEAR(o_orderdate) AS INT) AS yr,
           CAST(QUARTER(o_orderdate) AS INT) AS qtr,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           FLOOR((SUM(o_totalprice)) * 100 + 0.5) / 100 AS revenue
    FROM orders
    GROUP BY YEAR(o_orderdate), QUARTER(o_orderdate)
    """,
)
def orders_by_year_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction + rollup grouping (date functions are absent
    from the reference beyond casts, SURVEY.md §2.2 P6)."""
    o = load_table(spark, "orders", sf_dir)
    return o.groupBy(
        F.year("o_orderdate").alias("yr"), F.quarter("o_orderdate").alias("qtr")
    ).agg(F.count("*").alias("n_orders"), NR.round2(F.sum("o_totalprice")).alias("revenue"))


@query(
    "part_name_analysis",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           SUBSTRING(p_name, 1, 3) AS name_prefix,
           REGEXP_EXTRACT(p_name, '^(\\w+)', 1) AS first_word,
           CAST(LENGTH(p_name) AS INT) AS name_len,
           CONCAT(p_brand, '/', p_type) AS brand_type,
           REPLACE(p_type, 'ANODIZED', 'ANOD.') AS type_short
    FROM part
    """,
)
def part_name_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function coverage: upper, substring, regexp_extract,
    length, concat, replace — all JVM codegen'd."""
    p = load_table(spark, "part", sf_dir)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 3).alias("name_prefix"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.length("p_name").cast("int").alias("name_len"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit("ANODIZED"), F.lit("ANOD.")).alias("type_short"),
    )


@query(
    "customer_tiers",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal > 7500 THEN 'platinum'
                WHEN c_acctbal > 5000 THEN 'gold'
                WHEN c_acctbal > 0 THEN 'standard'
                ELSE 'delinquent' END AS tier,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'CONSTRUCTION') AS segment_alias,
           FLOOR((GREATEST(c_acctbal, 0.0)) * 100 + 0.5) / 100 AS credit
    FROM customer
    """,
)
def customer_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-expression coverage: when/otherwise chains, coalesce,
    nullif, greatest (absent from reference — no when/otherwise or null
    handling anywhere, SURVEY.md §2.2)."""
    c = load_table(spark, "customer", sf_dir)
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") > 7500, "platinum")
        .when(F.col("c_acctbal") > 5000, "gold")
        .when(F.col("c_acctbal") > 0, "standard")
        .otherwise("delinquent")
        .alias("tier"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("CONSTRUCTION")).alias(
            "segment_alias"
        ),
        NR.round2(F.greatest(F.col("c_acctbal"), F.lit(0.0))).alias("credit"),
    )


@query(
    "unpivot_brand_metrics",
    oracle="""
    WITH m AS (
        SELECT p_brand,
               FLOOR((SUM(p_retailprice)) * 100 + 0.5) / 100 AS sum_price,
               FLOOR((AVG(p_retailprice)) * 100 + 0.5) / 100 AS mean_price
        FROM part GROUP BY p_brand
    )
    SELECT p_brand AS brand, 'sum_price' AS metric, sum_price AS value FROM m
    UNION ALL
    SELECT p_brand, 'mean_price', mean_price FROM m
    """,
)
def unpivot_brand_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide -> long) via the melt/stack pattern."""
    p = load_table(spark, "part", sf_dir)
    m = p.groupBy("p_brand").agg(
        NR.round2(F.sum("p_retailprice")).alias("sum_price"),
        NR.round2(F.avg("p_retailprice")).alias("mean_price"),
    )
    return m.unpivot(
        ids=["p_brand"], values=["sum_price", "mean_price"], variableColumnName="metric", valueColumnName="value"
    ).select(F.col("p_brand").alias("brand"), "metric", "value")


@query(
    "event_type_map_roundtrip",
    oracle="""
    SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY user_id, event_type
    """,
)
def event_type_map_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType coverage: per-user map<event_type, count> built with
    map_from_entries, then exploded back flat (map construction +
    explode both exercise the MapType path; the round-trip keeps the
    output hashable)."""
    ev = load_table(spark, "events", sf_dir)
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    as_map = counts.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "n"))).alias("by_type")
    )
    return as_map.select("user_id", F.explode("by_type").alias("event_type", "n"))


@query(
    "event_rollup_multires",
    oracle="""
    SELECT DATE_TRUNC('day', ts) AS day,
           DATE_TRUNC('hour', ts) AS hour,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           FLOOR((SUM(value)) * 100 + 0.5) / 100 AS sum_value
    FROM events
    GROUP BY GROUPING SETS ((DATE_TRUNC('day', ts), event_type),
                            (DATE_TRUNC('hour', ts), event_type))
    """,
)
def event_rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution time rollup (hypertable continuous-aggregate
    shape): hourly AND daily aggregates per event_type from ONE scan via
    grouping sets. At 100 TB this halves the cost of maintaining rollup
    tables vs two separate jobs: the Expand doubles rows map-side, then
    partial aggregation collapses them before the single shuffle."""
    ev = load_table(spark, "events", sf_dir).select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "event_type",
        "value",
    )
    return (
        ev.groupingSets(
            [
                [F.col("day"), F.col("event_type")],
                [F.col("hour"), F.col("event_type")],
            ],
            F.col("day"),
            F.col("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            NR.round2(F.sum("value")).alias("sum_value"),
        )
        .select("day", "hour", "event_type", "n_events", "sum_value")
    )


@query(
    "concurrent_sessions",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE OR
                         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    numbered AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    ),
    s AS (
        SELECT user_id, session_id, MIN(ts) AS session_start, MAX(ts) AS session_end
        FROM numbered GROUP BY user_id, session_id
    )
    SELECT a.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_overlap_pairs,
           CAST(COUNT(DISTINCT b.user_id) AS BIGINT) AS n_partners
    FROM s a JOIN s b
      ON a.user_id != b.user_id
     AND a.session_start <= b.session_end
     AND b.session_start <= a.session_end
    GROUP BY a.user_id
    """,
)
def concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join over user sessions: for each user,
    how many of their sessions ran concurrently with another user's
    session (pair count + distinct partner count). Plan: the
    bucket-replication range join (operators/rangejoin.py) — sessions
    replicate to the 1-hour chunks they touch, a plain hash join on the
    chunk id, exact overlap re-check, first-shared-chunk dedup. The
    oracle is the naive quadratic interval join (DuckDB runs it as an
    IEJoin); Spark would run that same predicate as a
    BroadcastNestedLoopJoin, which is exactly what this operator
    replaces at fact x fact scale."""
    from spark_data_engineering_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    # the session table feeds both interval-join sides; materialize the
    # sessionization window pipeline once (no exchange reuse across a
    # self-join — same finding as the dedup family, SCALE.md round 6)
    s = (
        sessionize_events(spark, sf_dir)
        .select("user_id", "session_id", "session_start", "session_end")
        .transform(materialize)
    )
    a = s.select(
        F.col("user_id").alias("a_user"),
        F.col("session_start").alias("a_start"),
        F.col("session_end").alias("a_end"),
    )
    b = s.select(
        F.col("user_id").alias("b_user"),
        F.col("session_start").alias("b_start"),
        F.col("session_end").alias("b_end"),
    )
    pairs = interval_overlap_join(
        a,
        b,
        "a_start",
        "a_end",
        "b_start",
        "b_end",
        chunk_seconds=3600,
        extra_cond=F.col("a_user") != F.col("b_user"),
    )
    return pairs.groupBy(F.col("a_user").alias("user_id")).agg(
        F.count("*").alias("n_overlap_pairs"),
        F.countDistinct("b_user").alias("n_partners"),
    )


# ---- KMV distinct counting (round 6) -----------------------------------

_KMV_K = 1024
_KMV_SPAN_SQL = "281474976710656.0"  # 2^48, the hash span


def _kmv_oracle() -> str:
    return f"""
    WITH h AS (
      SELECT DISTINCT event_type,
             CAST(('0x' || SUBSTR(MD5(CAST(user_id AS VARCHAR)), 1, 12)) AS BIGINT) AS hv
      FROM events WHERE user_id IS NOT NULL
    ),
    r AS (
      SELECT event_type, hv,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
      FROM h
    ),
    s AS (
      SELECT event_type,
             CAST(COUNT(CASE WHEN rn <= {_KMV_K} THEN 1 END) AS BIGINT) AS sketch_size,
             MAX(CASE WHEN rn = {_KMV_K} THEN hv END) AS kth,
             CAST(COUNT(*) AS BIGINT) AS n_distinct_users
      FROM r GROUP BY event_type
    )
    SELECT event_type, n_distinct_users, sketch_size,
           (sketch_size < {_KMV_K}) AS sketch_exact,
           CASE WHEN sketch_size < {_KMV_K} THEN CAST(sketch_size AS DOUBLE)
                ELSE FLOOR(({_KMV_K - 1} * {_KMV_SPAN_SQL} / kth) * 10000 + 0.5) / 10000
           END AS kmv_estimate
    FROM s
    """


def _kmv_report(spark: SparkSession, sf_dir: str, sketch: DataFrame) -> DataFrame:
    """(event_type, n_distinct_users, sketch_size, sketch_exact,
    kmv_estimate) from a per-group KMV sketch frame (grp, hv) — shared
    by the batch and streaming variants, which must agree row for row.
    Proof-or-fallback: below k the sketch size IS the distinct count;
    saturated groups are recounted exactly (left-semi against the tiny
    saturated-group set, so the expensive distinct touches only them)
    and the row is labeled ``sketch_exact = false``."""
    from spark_data_engineering_spark.operators.sketches import (
        KMV_HASH_SPAN,
        kmv_hash_col,
    )

    agg = sketch.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("sketch_size"),
        F.max("hv").alias("kth"),
    )
    sat = agg.filter(F.col("sketch_size") >= _KMV_K).select("grp")
    hashed = (
        load_table(spark, "events", sf_dir)
        .select(
            F.col("event_type").alias("grp"),
            kmv_hash_col(F.col("user_id")).alias("hv"),
        )
        .filter(F.col("hv").isNotNull())
    )
    exact = (
        hashed.join(F.broadcast(sat), "grp", "left_semi")
        .groupBy("grp")
        .agg(F.countDistinct("hv").cast("bigint").alias("exact_n"))
    )
    est = F.when(
        F.col("sketch_size") < _KMV_K, F.col("sketch_size").cast("double")
    ).otherwise(
        NR.round4(
            F.lit(float(_KMV_K - 1)) * F.lit(KMV_HASH_SPAN) / F.col("kth").cast("double")
        )
    )
    return agg.join(exact, "grp", "left").select(
        F.col("grp").alias("event_type"),
        F.coalesce(F.col("exact_n"), F.col("sketch_size")).alias("n_distinct_users"),
        "sketch_size",
        (F.col("sketch_size") < _KMV_K).alias("sketch_exact"),
        est.alias("kmv_estimate"),
    )


@query("kmv_distinct_users", oracle=_kmv_oracle())
def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via a KMV(1024) sketch
    (operators/sketches.py — per-partition Arrow prune, per-group
    window over <= k x partitions candidates, bounded memory at any
    cardinality) under the exactness-domain contract: below k the
    sketch is the distinct set and the count is provably exact — the
    gate corpus sits deep inside the domain — while saturated groups
    fall back to an exact recount and are labeled. The oracle replays
    the identical 48-bit md5 sketch in SQL, so the hash checks the
    sketch itself (hashing, pruning, k-th selection, estimator), not
    just the count. Complements approx_count_distinct/HLL
    (approx_distinct_parts): KMV's exactness domain and lossless
    union-truncate merge are what the STREAMING accumulator needs
    (streaming/kmv.py), where HLL's register state has no exactness
    proof."""
    from spark_data_engineering_spark.operators.sketches import kmv_group_sketch

    ev = load_table(spark, "events", sf_dir)
    sk = kmv_group_sketch(ev, "event_type", "user_id", _KMV_K)
    return _kmv_report(spark, sf_dir, sk)


@query(
    "kmv_audience_overlap",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type,
             CAST(('0x' || SUBSTR(MD5(CAST(user_id AS VARCHAR)), 1, 12)) AS BIGINT) AS hv
      FROM events WHERE user_id IS NOT NULL
    ),
    r AS (
      SELECT event_type, hv,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
      FROM h
    ),
    sk AS (SELECT event_type, hv FROM r WHERE rn <= {_KMV_K}),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM sk a JOIN sk b ON a.hv = b.hv AND a.event_type < b.event_type
      GROUP BY 1, 2
    ),
    sizes AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS sz FROM sk GROUP BY 1)
    SELECT p.type_a, p.type_b, p.n_common,
           sa.sz AS n_a, sb.sz AS n_b,
           (sa.sz < {_KMV_K} AND sb.sz < {_KMV_K}) AS exact,
           FLOOR((CAST(p.n_common AS DOUBLE)
                  / (sa.sz + sb.sz - p.n_common)) * 10000 + 0.5) / 10000
               AS jaccard
    FROM pairs p
    JOIN sizes sa ON p.type_a = sa.event_type
    JOIN sizes sb ON p.type_b = sb.event_type
    """,
)
def kmv_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between event types from KMV sketches (round 6)
    — the theta-sketch staple: which behaviors share users, answered
    from k-minimum-values state instead of a pairwise distinct-count
    join over raw events. Below k the sketches ARE the distinct hash
    sets, so intersection, sizes, and Jaccard are EXACT (this corpus's
    regime, and the gate hashes it); at saturation the same pair join
    over the k-min sets yields the standard KMV intersection estimate —
    the sketch-join cost is k x #types rows either way, independent of
    corpus size. The oracle replays the identical sketch construction
    and pair join in SQL.

    Scale: sketches come from the bounded per-partition prune
    (kmv_group_sketch); the overlap join touches <= k rows per type —
    audience overlap over a trillion events costs a kilobyte join."""
    from spark_data_engineering_spark.operators.sketches import kmv_group_sketch

    ev = load_table(spark, "events", sf_dir)
    sk = kmv_group_sketch(ev, "event_type", "user_id", _KMV_K).transform(
        materialize
    )
    a, b = sk.alias("a"), sk.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.hv") == F.col("b.hv")) & (F.col("a.grp") < F.col("b.grp")),
        )
        .groupBy(
            F.col("a.grp").alias("type_a"), F.col("b.grp").alias("type_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    sizes = sk.groupBy("grp").agg(F.count(F.lit(1)).cast("bigint").alias("sz"))
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    return (
        pairs.join(F.broadcast(sa), F.col("type_a") == F.col("sa.grp"))
        .join(F.broadcast(sb), F.col("type_b") == F.col("sb.grp"))
        .select(
            "type_a",
            "type_b",
            "n_common",
            F.col("sa.sz").alias("n_a"),
            F.col("sb.sz").alias("n_b"),
            ((F.col("sa.sz") < _KMV_K) & (F.col("sb.sz") < _KMV_K)).alias("exact"),
            NR.round4(
                F.col("n_common").cast("double")
                / (F.col("sa.sz") + F.col("sb.sz") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )
