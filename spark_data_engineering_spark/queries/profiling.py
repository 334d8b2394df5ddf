"""Data profiling & corpus versioning — ANALYZE-style column statistics,
scalable global row numbering, and epoch-over-epoch corpus diffing.

These are pipeline-operations queries the reference's ETL layer implies
but never materializes (its validation utilities compute ad-hoc counts —
reference etl/utils/validation.py — and its bronze loads re-snapshot whole
tables with no diff): a 100 TB corpus needs table profiling for planning,
stable global ids for sharding, and a snapshot diff for incremental
re-curation. All three are pure JVM expression plans with DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from spark_data_engineering_spark.functions import numeric as NR
from spark_data_engineering_spark.registry import query
from spark_data_engineering_spark.sources import load_table

# --- global_row_ids -------------------------------------------------------
#
# Contiguous global row numbering (1..N, ordered by a unique key) WITHOUT
# a single-partition window. The naive ROW_NUMBER() OVER (ORDER BY key)
# funnels all 100 TB through one task; the scale plan is the classic
# two-pass offset scheme:
#   1. assign each row a deterministic ordered bucket (equi-width on the
#      key domain — integer arithmetic, no sampling, so the assignment is
#      reproducible across the two passes, unlike repartitionByRange whose
#      sampled boundaries can differ between computations);
#   2. count rows per bucket (one partial-agg shuffle, B rows out);
#   3. cumulative-sum the B bucket counts into offsets (a window over B
#      rows — the ONLY single-partition window, on a bucket-count frame);
#   4. broadcast the offsets back and add a per-bucket row_number — a
#      window PARTITIONED by bucket, so ranking parallelizes.
# Output ids are identical to the naive global window's.

_N_BUCKETS = 64

_GLOBAL_ROW_IDS_SQL = """
SELECT orderkey, row_id FROM (
  SELECT o_orderkey AS orderkey,
         CAST(ROW_NUMBER() OVER (ORDER BY o_orderkey) AS BIGINT) AS row_id
  FROM orders
) t
WHERE orderkey % 97 = 0
"""


def assign_row_ids(
    df: DataFrame, key: str, n_buckets: int = _N_BUCKETS
) -> DataFrame:
    """Add a ``row_id`` column = global 1-based rank of integer column
    ``key`` (which must be unique), without a single-partition window
    over the data. Deterministic ordered bucket = integer equi-width over
    [min, max] — reproducible across the two passes, unlike
    repartitionByRange, whose sampled boundaries can differ between
    computations of the same lineage. The bucket arithmetic
    ``(k - min) * n_buckets`` is exact only while the key domain keeps it
    under 2^53 (bigint product, then a double divide); beyond that the
    product loses precision silently and bucket monotonicity — the whole
    row-id contract — breaks. Enforced with an executor-side
    ``assert_true`` over the broadcast min/max (no extra driver action,
    constant-folds to one comparison per partition): out-of-range
    domains fail loudly instead of mis-ranking."""
    mm = df.agg(F.min(key).alias("__minv"), F.max(key).alias("__maxv"))
    domain_ok = F.assert_true(
        (F.col("__maxv").cast("double") - F.col("__minv").cast("double") + 1.0)
        * float(n_buckets)
        < F.lit(2.0**53),
        F.lit(
            f"assign_row_ids: key domain * {n_buckets} buckets exceeds 2^53; "
            "bucket arithmetic would lose precision — shrink n_buckets or "
            "pre-normalize the key"
        ),
    )
    with_b = df.crossJoin(F.broadcast(mm)).withColumn(
        "__b",
        F.when(
            domain_ok.isNull(),  # assert_true: null on pass, raises on fail
            (
                (F.col(key) - F.col("__minv"))
                * n_buckets
                / (F.col("__maxv") - F.col("__minv") + 1)
            ).cast("bigint"),
        ),
    )
    counts = with_b.groupBy("__b").agg(F.count("*").alias("__cnt"))
    # Cumulative offsets: a window over <= n_buckets rows — bounded by
    # construction, never by the data volume.
    offsets = counts.withColumn(
        "__off",
        F.coalesce(
            F.sum("__cnt").over(
                W.orderBy("__b").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("__b", "__off")
    ranked = with_b.join(F.broadcast(offsets), "__b").withColumn(
        "row_id",
        (
            F.col("__off")
            + F.row_number().over(W.partitionBy("__b").orderBy(key))
        ).cast("bigint"),
    )
    return ranked.drop("__b", "__minv", "__maxv", "__off")


@query("global_row_ids", oracle=_GLOBAL_ROW_IDS_SQL)
def global_row_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalable contiguous global row ids over orders (unique key
    o_orderkey), two-pass bucket-offset scheme. The oracle is the naive
    global ROW_NUMBER — the distributed plan must reproduce it exactly.
    Only rows with orderkey % 97 == 0 are emitted to keep the gate
    payload small; the id ASSIGNMENT runs over the full table (the
    filter references the key, not the bucket, so Catalyst cannot push
    it below the ranking window — pinned in tests/test_plan_shapes.py)."""
    src = load_table(spark, "orders", sf_dir).select("o_orderkey")
    ranked = assign_row_ids(src, "o_orderkey")
    return (
        ranked.filter(F.col("o_orderkey") % 97 == 0)
        .select(F.col("o_orderkey").alias("orderkey"), "row_id")
    )


# --- column_stats_report --------------------------------------------------
#
# ANALYZE TABLE-style per-column statistics: non-null count, exact NDV,
# typed min/max. One union branch per column, each branch a separate
# column-pruned parquet scan (ReadSchema carries exactly that column —
# pinned), so the exact-NDV pass over a 100 TB table reads each column's
# chunks once, in parallel, with partial aggregation; no Expand blow-up
# from multi-distinct in a single aggregate. The approximate scale tier
# (HLL, one shared scan) already exists as approx_distinct_parts; this is
# the exact profiling pass a planner runs per-column.

_STATS_COLS: tuple[tuple[str, str], ...] = (
    ("l_orderkey", "num"),
    ("l_partkey", "num"),
    ("l_suppkey", "num"),
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
    ("l_shipdate", "ts"),
)


def _stats_branch_sql(col: str, kind: str) -> str:
    min_num = max_num = "CAST(NULL AS DOUBLE)"
    min_str = max_str = "CAST(NULL AS VARCHAR)"
    min_ts = max_ts = "CAST(NULL AS TIMESTAMP)"
    if kind == "num":
        min_num = NR.sql_round2(f"CAST(MIN({col}) AS DOUBLE)")
        max_num = NR.sql_round2(f"CAST(MAX({col}) AS DOUBLE)")
    elif kind == "str":
        min_str = f"MIN({col})"
        max_str = f"MAX({col})"
    else:
        min_ts = f"MIN({col})"
        max_ts = f"MAX({col})"
    return f"""
    SELECT '{col}' AS column_name,
           CAST(COUNT({col}) AS BIGINT) AS n_nonnull,
           CAST(COUNT(DISTINCT {col}) AS BIGINT) AS ndv,
           {min_num} AS min_num, {max_num} AS max_num,
           {min_str} AS min_str, {max_str} AS max_str,
           {min_ts} AS min_ts, {max_ts} AS max_ts
    FROM lineitem"""


_COLUMN_STATS_SQL = "\nUNION ALL\n".join(
    _stats_branch_sql(c, k) for c, k in _STATS_COLS
)


@query("column_stats_report", oracle=_COLUMN_STATS_SQL)
def column_stats_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-column profile of lineitem (8 columns): non-null count,
    exact NDV, typed min/max (numeric mins rounded through NR.round2 so
    the double slots hash identically). Each union branch scans only its
    own column."""
    li = load_table(spark, "lineitem", sf_dir)
    null_num = F.lit(None).cast("double")
    null_str = F.lit(None).cast("string")
    null_ts = F.lit(None).cast("timestamp")
    branches = []
    for col, kind in _STATS_COLS:
        min_num, max_num = null_num, null_num
        min_str, max_str = null_str, null_str
        min_ts, max_ts = null_ts, null_ts
        if kind == "num":
            min_num = NR.round2(F.min(col).cast("double"))
            max_num = NR.round2(F.max(col).cast("double"))
        elif kind == "str":
            min_str = F.min(col)
            max_str = F.max(col)
        else:
            min_ts = F.min(col)
            max_ts = F.max(col)
        branches.append(
            li.agg(
                F.count(col).alias("n_nonnull"),
                F.countDistinct(col).alias("ndv"),
                min_num.alias("min_num"),
                max_num.alias("max_num"),
                min_str.alias("min_str"),
                max_str.alias("max_str"),
                min_ts.alias("min_ts"),
                max_ts.alias("max_ts"),
            ).select(
                F.lit(col).alias("column_name"),
                "n_nonnull",
                "ndv",
                "min_num",
                "max_num",
                "min_str",
                "max_str",
                "min_ts",
                "max_ts",
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


# --- corpus_snapshot_diff -------------------------------------------------
#
# Epoch-over-epoch corpus diff: classify every document as added /
# removed / changed / unchanged between snapshot A and snapshot B via ONE
# hash-partitioned full outer join on doc_id — the incremental-curation
# primitive (only 'added' + 'changed' need re-scoring downstream). The
# second epoch is derived deterministically from the first with the
# cross-engine md5->int bucketing (seeded, so both engines build the
# identical epoch B): bucket 0 of 20 removed, buckets 1-2 edited,
# bucket 3 cloned as new doc_ids.

_DIFF_SEED = "epoch-b:"

_B_SQL = f"""
    SELECT doc_id, text FROM (
      SELECT doc_id, text,
             CAST(('0x' || SUBSTR(MD5('{_DIFF_SEED}' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 20 AS bkt
      FROM documents) d
    WHERE bkt <> 0 AND bkt NOT IN (1, 2)
    UNION ALL
    SELECT doc_id, text || ' [rev2]' AS text FROM (
      SELECT doc_id, text,
             CAST(('0x' || SUBSTR(MD5('{_DIFF_SEED}' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 20 AS bkt
      FROM documents) d
    WHERE bkt IN (1, 2)
    UNION ALL
    SELECT doc_id + 10000000 AS doc_id, 'new revision of ' || CAST(doc_id AS VARCHAR) AS text FROM (
      SELECT doc_id,
             CAST(('0x' || SUBSTR(MD5('{_DIFF_SEED}' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 20 AS bkt
      FROM documents) d
    WHERE bkt = 3
"""

_DIFF_SQL = f"""
WITH b AS ({_B_SQL}),
j AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         a.text AS a_text, b.text AS b_text
  FROM documents a FULL OUTER JOIN b ON a.doc_id = b.doc_id
)
SELECT CASE WHEN a_id IS NULL THEN 'added'
            WHEN b_id IS NULL THEN 'removed'
            WHEN a_text <> b_text THEN 'changed'
            ELSE 'unchanged' END AS change_class,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(COALESCE(LENGTH(a_text), 0)) AS BIGINT) AS chars_before,
       CAST(SUM(COALESCE(LENGTH(b_text), 0)) AS BIGINT) AS chars_after
FROM j
GROUP BY 1
"""


def _epoch_bucket() -> F.Column:
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(_DIFF_SEED), F.col("doc_id").cast("string")
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 20
    )


@query("corpus_snapshot_diff", oracle=_DIFF_SQL)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff documents(A) vs derived epoch B: per change class,
    doc count + total chars before/after. One full outer join on doc_id;
    at 100 TB both sides hash-partition on the id and AQE handles the
    residual skew — no content comparison happens off the joined row."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    bucketed = docs.withColumn("bkt", _epoch_bucket())
    survivors = bucketed.filter(
        (F.col("bkt") != 0) & (~F.col("bkt").isin(1, 2))
    ).select("doc_id", "text")
    edited = bucketed.filter(F.col("bkt").isin(1, 2)).select(
        "doc_id", F.concat(F.col("text"), F.lit(" [rev2]")).alias("text")
    )
    added = bucketed.filter(F.col("bkt") == 3).select(
        (F.col("doc_id") + 10000000).alias("doc_id"),
        F.concat(
            F.lit("new revision of "), F.col("doc_id").cast("string")
        ).alias("text"),
    )
    epoch_b = survivors.unionByName(edited).unionByName(added)
    a = docs.select(
        F.col("doc_id").alias("a_id"), F.col("text").alias("a_text")
    )
    b = epoch_b.select(
        F.col("doc_id").alias("b_id"), F.col("text").alias("b_text")
    )
    j = a.join(b, a["a_id"] == b["b_id"], "full_outer")
    cls = (
        F.when(F.col("a_id").isNull(), F.lit("added"))
        .when(F.col("b_id").isNull(), F.lit("removed"))
        .when(F.col("a_text") != F.col("b_text"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.groupBy(cls.alias("change_class")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.coalesce(F.length("a_text"), F.lit(0)))
        .cast("bigint")
        .alias("chars_before"),
        F.sum(F.coalesce(F.length("b_text"), F.lit(0)))
        .cast("bigint")
        .alias("chars_after"),
    )
