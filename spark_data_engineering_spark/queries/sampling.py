"""Deterministic sampling / dataset-split queries over the documents
corpus — the selection stage of a training-data pipeline.

The reference has no sampling of any kind (its ETL is full-reload,
SURVEY.md §2); these are training-data extensions. Randomness is
replaced by a keyed LCG bucket so the sample is (a) reproducible across
runs and engines — oracle-checkable, unlike rand() — and (b) stable
under re-partitioning: membership depends only on the row key, never on
task layout. That's the property that matters on a cluster: re-running
a failed stage or changing parallelism must not change the sample.

The bucket is ((doc_id % 100000007) * 1103515245 + 12345) % 100 — the
inner modulus keeps the product far inside int64 for arbitrarily large
keys (at 100 TB doc_ids can exceed 2^32; the multiply must not
overflow, and Spark/DuckDB both wrap vs raise differently, so we never
let it happen). In production you'd use xxhash64(doc_id) for better
mixing; the LCG keeps the arithmetic bit-identical in ANSI SQL for the
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_data_engineering_spark.registry import query
from spark_data_engineering_spark.sources import load_table


def lcg_bucket(key):
    """Deterministic 0-99 bucket from an integer key column (see module
    docstring for the overflow-safety argument)."""
    return ((key % 100000007) * 1103515245 + 12345) % 100


@query(
    "stratified_sample_documents",
    oracle="""
    SELECT doc_id, lang, source FROM documents
    WHERE ((doc_id % 100000007) * 1103515245 + 12345) % 100
          < CASE WHEN lang = 'en' THEN 50 ELSE 20 END
    """,
)
def stratified_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample with per-language rates (50% en, 20% rest) —
    the class-rebalancing selection a corpus pipeline runs before
    training. Pure map-side filter: no shuffle, no state, embarrassingly
    parallel at any scale, and the predicate pushes into codegen."""
    docs = load_table(spark, "documents", sf_dir)
    rate = F.when(F.col("lang") == "en", 50).otherwise(20)
    return docs.filter(lcg_bucket(F.col("doc_id")) < rate).select("doc_id", "lang", "source")


@query(
    "train_split_counts",
    oracle="""
    SELECT lang,
           CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (SELECT lang, n_chars,
                 ((doc_id % 100000007) * 1103515245 + 12345) % 100 AS b
          FROM documents) t
    GROUP BY lang, CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END
    """,
)
def train_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test split audit per language. The split is a
    pure function of doc_id, so a document lands in the same split on
    every engine, every run, every partitioning — the reproducibility
    contract a training pipeline needs before it can cache splits."""
    docs = load_table(spark, "documents", sf_dir)
    b = lcg_bucket(F.col("doc_id"))
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    )
    return (
        docs.select("lang", "n_chars", split.alias("split"))
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


@query(
    "mixture_sample_counts",
    oracle="""
    WITH c AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s
        FROM documents GROUP BY source
    ),
    m AS (SELECT MIN(n_s) AS n_min FROM c),
    r AS (
        SELECT source, n_s,
               CAST(FLOOR(100 * SQRT(CAST(n_min AS DOUBLE) / n_s)) AS BIGINT)
                   AS sample_pct
        FROM c, m
    ),
    s AS (
        SELECT d.source, d.n_chars
        FROM documents d JOIN r ON d.source = r.source
        WHERE ((doc_id % 100000007) * 1103515245 + 12345) % 100 < r.sample_pct
    )
    SELECT r.source,
           r.n_s AS n_source_docs,
           r.sample_pct,
           CAST(g.n_sampled AS BIGINT) AS n_sampled,
           CAST(g.chars_sampled AS BIGINT) AS chars_sampled
    FROM r JOIN (
        SELECT source, COUNT(*) AS n_sampled, SUM(n_chars) AS chars_sampled
        FROM s GROUP BY source
    ) g ON r.source = g.source
    """,
)
def mixture_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened training mixture (τ=0.5): each source is
    sampled at rate sqrt(n_min/n_s), so effective counts flatten to
    n_eff = sqrt(n_min · n_s) — rare sources keep everything, dominant
    sources shrink toward the geometric mean (the standard multilingual
    /multi-source rebalancing shape). The rate uses only MIN, division
    and SQRT — all exactly-rounded IEEE ops, no cross-source float
    summation — so membership is bit-identical in any engine, and the
    keyed LCG keeps it stable under re-partitioning.

    Scale: one groupBy(source) for counts (tiny result), rates broadcast
    back onto the corpus, then a map-side filter — the sample itself
    never shuffles; only the per-source audit rollup does."""
    docs = load_table(spark, "documents", sf_dir)
    counts = docs.groupBy("source").agg(F.count("*").cast("bigint").alias("n_s"))
    n_min = counts.agg(F.min("n_s").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        "source",
        "n_s",
        F.floor(
            F.lit(100) * F.sqrt(F.col("n_min").cast("double") / F.col("n_s"))
        )
        .cast("bigint")
        .alias("sample_pct"),
    )
    sampled = (
        docs.join(F.broadcast(rates), "source")
        .filter(lcg_bucket(F.col("doc_id")) < F.col("sample_pct"))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_sampled"),
            F.sum("n_chars").cast("bigint").alias("chars_sampled"),
        )
    )
    return (
        rates.join(sampled, "source")
        .select(
            "source",
            F.col("n_s").alias("n_source_docs"),
            "sample_pct",
            "n_sampled",
            "chars_sampled",
        )
    )


@query(
    "bottomk_sample_per_source",
    oracle="""
    SELECT source, doc_id, lang, CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT source, doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
        FROM documents
    )
    WHERE rnk <= 10
    """,
)
def bottomk_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-SIZE deterministic sample: exactly min(10, group size) docs
    per source, chosen by hash rank (smallest md5 of the key) — the
    reproducible form of per-group reservoir sampling. Unlike the
    rate-based LCG samples above, the output size is exact whatever the
    group's row count, and membership is still a pure function of the
    key: stable across runs, engines, partitionings, and — the property
    reservoirs lack — across STREAMS: a bottom-k set is mergeable
    (union then re-take bottom k), so partial samples from shards
    combine associatively. One hash-partitioned window per group; at
    scale the rank prunes with WindowGroupLimit (top-k pushdown), so no
    group ever materializes fully."""
    docs = load_table(spark, "documents", sf_dir)
    from pyspark.sql import Window as W

    w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), F.col("doc_id")
    )
    return (
        docs.select("source", "doc_id", "lang")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .withColumn("rnk", F.col("rnk").cast("bigint"))
    )
