"""Query/oracle registry backing ``__spark_entry__.py``.

Each registered query is a callable ``(spark, sf_dir) -> DataFrame``; most
carry an equivalent ANSI-SQL oracle that DuckDB runs on the same parquet
tables (the driver's correctness gate). Queries whose semantics are not
SQL-expressible (LSH bucketing, streaming state) register without an
oracle and get a rows-only check.

Naming contract: every computed column is aliased identically in the Spark
code and the oracle SQL — the driver sorts columns by name before hashing.

Float policy: aggregates over ``double`` columns are rounded (ROUND(x, 2))
on BOTH sides so cross-engine float-summation order can't flip the hash.
Sums of doubles are first cast to DECIMAL where exactness matters.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query (and optional DuckDB oracle SQL) under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The external correctness gate oracle-checks only the FIRST 50 registered
# queries. Rounds 1-2 together put a green driver row on 87 of the 119
# registered queries; this round's window targets exactly the 32 queries
# that have NEVER had a driver row, plus 5 stable canaries (regression
# tripwires over shared code paths) and a refresh of the most load-bearing
# round-1-only evidence (queries whose shared loader changed since their
# green row). Goal: the union of green rows across rounds covers all
# registered queries.
CHECK_PRIORITY: tuple[str, ...] = (
    # --- Canaries: stable, previously-green, exercise the shared loader,
    # the flagship report pipeline, events, and the dedup family.
    "tpch_q1_pricing_summary",
    "daily_order_report",
    "daily_category_report",
    "hourly_event_stats",
    "simhash_near_pairs",
    # --- Never driver-checked (32): sampling/curation/text micro-queries
    "mixture_sample_counts",
    "context_length_buckets",
    "benchmark_contamination",
    "chunk_documents",
    "boilerplate_chunks",
    "curation_decisions",
    "doc_fingerprints",
    "lang_source_profile",
    "token_regex_stats",
    "vocab_top_tokens",
    "tfidf_top_terms",
    "label_centroids",
    "bm25_keyword_search",
    # --- Never checked: multi-format ingest (CSV/JSONL/ORC)
    "csv_events_hourly_stats",
    "jsonl_events_hourly_stats",
    "orc_events_hourly_stats",
    # --- Never checked: graph / skew
    "pagerank_click_graph",
    "salted_distinct_customers_by_status",
    # --- Never checked: incremental / txn table format
    "incremental_daily_revenue",
    "incremental_daily_revenue_merged",
    "incremental_daily_order_report",
    "txn_datasource_revenue",
    # --- Never checked: multimodal + bucketed report
    "media_exact_dedup",
    "daily_category_report_bucketed",
    # --- Never checked: production ANN paths (lsh/ivf/pq rows-only;
    # int8 + dup-clusters oracled; ann_recall_report oracles recall@10
    # of all three approximate methods against brute force)
    "knn_lsh",
    "knn_lsh_multiprobe",
    "knn_ivf",
    "knn_pq",
    "knn_int8_quantized",
    "embedding_dup_clusters",
    "ann_recall_report",
    "ann_index_search_exhaustive",
    "ann_ivfpq_search_exhaustive",
    # --- Never checked: streaming dedup / sessionize / stateful-v2
    "streaming_dedup_documents",
    "streaming_sessionize_events",
    "streaming_user_totals_tws",
    # --- Round-1-only evidence refresh: the shared loader (sources/
    # tables.py) changed after these went green; re-evidence the most
    # load-bearing ones.
    "minhash_lsh_pairs",
    "dedup_exact",
    "dedup_clusters",
    "ngram_jaccard_pairs",
    "media_feature_knn",
    "media_resize_profile",
    "brand_type_metrics",
    "pipeline_daily_order_report",
    "pipeline_daily_category_report",
)


def load_all() -> None:
    """Import every query module so registration side-effects run, then
    reorder the registry so ``CHECK_PRIORITY`` queries register first
    (dict order = driver check order)."""
    from spark_data_engineering_spark.queries import (  # noqa: F401
        curation,
        dedup,
        events_analytics,
        formats,
        graph_q,
        incremental_q,
        multimodal,
        pipeline,
        quality,
        relational,
        reports,
        retrieval,
        sampling,
        similarity,
        streaming_q,
        text,
        text2,
        tpch,
        tpch2,
    )

    ordered: dict[str, QueryFn] = {}
    for name in CHECK_PRIORITY:
        if name in QUERIES:
            ordered[name] = QUERIES[name]
    for name, fn in QUERIES.items():
        if name not in ordered:
            ordered[name] = fn
    QUERIES.clear()
    QUERIES.update(ordered)
