"""Plan-shape regression tests: lock in the physical-plan properties the
100 TB design depends on (SCALE.md). A change that silently turns a
broadcast join into a shuffle or drops a pushed filter fails here, not
in a profiler three rounds later."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod


def _plan(spark, sf_dir, name: str) -> str:
    df = entrymod.queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_push_to_scan(spark, sf_dir):
    spark.conf.set("spark.sql.maxMetadataStringLength", "1000")
    df = entrymod.queries()["tpch_q6_forecast_revenue"](spark, sf_dir)
    scan = df._jdf.queryExecution().toString()
    assert "PushedFilters: [IsNotNull" in scan
    assert "GreaterThanOrEqual(l_shipdate" in scan
    # column pruning: only the 4 needed columns reach the scan
    assert "ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate" in scan


def test_report_joins_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "daily_order_report")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "top10_customers_by_revenue")
    assert "TakeOrderedAndProject" in plan  # no global sort materializes
    assert "Sort " not in plan


def test_wide_lineitem_dims_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "wide_lineitem")
    # part/supplier/nation dims broadcast; at most the orders join shuffles
    assert plan.count("BroadcastHashJoin") >= 3


def test_semi_anti_join_physical(spark, sf_dir):
    anti = _plan(spark, sf_dir, "customers_without_orders")
    semi = _plan(spark, sf_dir, "customers_with_high_value_orders")
    assert "LeftAnti" in anti
    assert "LeftSemi" in semi


def test_dedup_exact_partial_aggregation(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dedup_exact")
    # two HashAggregates (partial map-side + final) around one Exchange
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange") == 1


@pytest.mark.parametrize("name", ["project_derive_filter", "doc_stats", "token_regex_stats"])
def test_scan_queries_have_no_shuffle(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "Exchange" not in plan  # pure scan+project pipelines


def test_multires_rollup_single_scan(spark, sf_dir):
    """Grouping sets must expand from ONE events scan (that's the whole
    point vs two rollup jobs) and shuffle exactly once."""
    plan = _plan(spark, sf_dir, "event_rollup_multires")
    assert "Expand" in plan
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") >= 2  # partial collapses the Expand


def test_stratified_sample_is_map_only(spark, sf_dir):
    """Deterministic sampling is a pure filter: no shuffle anywhere."""
    plan = _plan(spark, sf_dir, "stratified_sample_documents")
    assert "Exchange" not in plan


def test_q18_all_joins_broadcast(spark, sf_dir):
    """The >300-qty order set is tiny; nothing may sort-merge."""
    plan = _plan(spark, sf_dir, "tpch_q18_volume_customers")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3
    assert "TakeOrderedAndProject" in plan


def test_q19_pushes_derived_predicates(spark, sf_dir):
    """Catalyst must extract single-side implications of the OR-of-ANDs
    onto both scans (brand disjunction -> part, quantity bound ->
    lineitem)."""
    spark.conf.set("spark.sql.maxMetadataStringLength", "1000")
    df = entrymod.queries()["tpch_q19_disjunctive_revenue"](spark, sf_dir)
    q = df._jdf.queryExecution().toString()
    assert "And(EqualTo(p_brand,Brand#12)" in q  # brand disjunction on part scan
    assert "GreaterThanOrEqual(l_quantity,1.0)" in q  # derived bound on lineitem scan


def test_runtime_bloom_filter_injection(spark, sf_dir):
    """When a shuffle join's build side is selective, Catalyst injects a
    runtime bloom filter (might_contain) on the probe side — at 100 TB
    this prunes most of the fact scan's shuffle input. Local data sits
    under the default size thresholds, so lower them to prove the
    machinery fires; production leaves the 10 GB defaults."""
    from pyspark.sql import functions as F

    from spark_data_engineering_spark.sources import load_table

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        li = load_table(spark, "lineitem", sf_dir)
        o = load_table(spark, "orders", sf_dir).filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").count()
        optimized = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in optimized
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)

def test_q8_snowflake_single_shuffle_join(spark, sf_dir):
    """Q8's 8-way snowflake: every dimension broadcasts; the only
    sort-merge-eligible join is lineitem x orders."""
    plan = _plan(spark, sf_dir, "tpch_q8_market_share")
    assert plan.count("BroadcastHashJoin") >= 3
    assert plan.count("SortMergeJoin") <= 1


def test_q2_min_cost_joinback_broadcasts(spark, sf_dir):
    """Q2's decorrelated per-part MIN joins back as a broadcast, not a
    second shuffle of the cost relation."""
    plan = _plan(spark, sf_dir, "tpch_q2_min_cost_supplier")
    assert plan.count("BroadcastHashJoin") >= 3


def test_q20_semi_join_chain(spark, sf_dir):
    """Q20: part filter and qualifying-supplier set both apply as semi
    joins (no row-widening inner joins on the probe side)."""
    plan = _plan(spark, sf_dir, "tpch_q20_part_promotion_suppliers")
    assert plan.count("LeftSemi") >= 2


def test_repetition_metrics_single_data_exchange(spark, sf_dir):
    # posexplode+lead window is the ONLY data shuffle: both downstream
    # aggregations reuse its hash(doc_id) partitioning, and the base
    # join broadcasts (SCALE.md; 3x win over the window-ranking form)
    plan = _plan(spark, sf_dir, "doc_repetition_metrics")
    data_exchanges = plan.count("Exchange hashpartitioning")
    assert data_exchanges == 1, plan[:2000]
    assert "BroadcastHashJoin" in plan


def test_contamination_bench_side_broadcasts(spark, sf_dir):
    # the corpus reduces to a distinct shingle vocabulary; the tiny
    # eval side must broadcast, never shuffle the vocabulary twice
    plan = _plan(spark, sf_dir, "benchmark_contamination")
    assert "BroadcastHashJoin" in plan


def test_interval_join_never_nested_loop(spark, sf_dir):
    """The whole point of the bucket-replicated range join: the overlap
    predicate must ride a hash join, not BroadcastNestedLoopJoin."""
    plan = _plan(spark, sf_dir, "concurrent_sessions")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_scrub_segments_two_exchanges(spark, sf_dir):
    """Single-pass window form: one fp shuffle + one doc reassembly —
    a third exchange means the segmentation started running twice."""
    plan = _plan(spark, sf_dir, "scrub_boilerplate_segments")
    assert plan.count("Exchange") <= 2


def test_scd2_single_customer_shuffle(spark, sf_dir):
    """Dimension build: groupBy + two windows all share the customer
    partitioning — exactly one exchange end-to-end."""
    plan = _plan(spark, sf_dir, "scd2_customer_tiers")
    assert plan.count("Exchange") == 1


def test_bottomk_window_group_limit(spark, sf_dir):
    """The per-group rank must prune to k rows BEFORE the exchange
    (WindowGroupLimit pushdown), so no group ever materializes fully."""
    plan = _plan(spark, sf_dir, "bottomk_sample_per_source")
    assert "WindowGroupLimit" in plan


def test_bm25_topk_never_global_sorts(spark, sf_dir):
    """Both BM25 top-k paths (full scan and persisted index) rank with a
    global row_number window; the rank<=k filter must become either a
    per-partition WindowGroupLimit prune or (what Spark 4 actually does
    here, strictly stronger) LimitPushDownThroughWindow rewriting the
    window input to TakeOrderedAndProject(limit=k) — pinned so a Spark
    upgrade or refactor can't silently turn it into a full sort of all
    scored docs (VERDICT r4 'What's wrong' #4)."""
    for name in ("bm25_keyword_search", "text_index_search"):
        plan = _plan(spark, sf_dir, name)
        assert "TakeOrderedAndProject" in plan or "WindowGroupLimit" in plan, name
        assert "Sort " not in plan, name  # no materialized global sort


def test_hybrid_rerank_never_global_sorts(spark, sf_dir):
    """The dense re-rank's final_rank window gets the same pre-prune."""
    plan = _plan(spark, sf_dir, "hybrid_search_rerank")
    assert "TakeOrderedAndProject" in plan or "WindowGroupLimit" in plan
    assert "Sort " not in plan


def test_dp_release_single_shuffle(spark, sf_dir):
    """The DP release is one count shuffle + a map-side noise ladder —
    no join, no second exchange."""
    plan = _plan(spark, sf_dir, "dp_source_counts")
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_txn_snapshot_join_broadcasts_dim(spark, sf_dir):
    """The pinned-snapshot cross-table join must broadcast the customer
    side — no sort-merge on the fact table."""
    plan = _plan(spark, sf_dir, "txn_snapshot_join")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dedup_keep_best_no_nested_loop(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dedup_keep_best")
    assert "BroadcastNestedLoop" not in plan
    assert "BroadcastHashJoin" in plan


def test_winsorized_reuses_priority_partitioning(spark, sf_dir):
    """The rank window, the bounds aggregation, and the final mean all
    key on priority — at most 2 hash exchanges end-to-end (window +
    the post-broadcast-join re-group), never a sort-merge join."""
    plan = _plan(spark, sf_dir, "winsorized_revenue_by_priority")
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "SortMergeJoin" not in plan


def test_cms_sketch_broadcast_probe(spark, sf_dir):
    """The 8k-cell CMS grid must broadcast to the probe side."""
    plan = _plan(spark, sf_dir, "cms_token_frequencies")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bpe_single_shuffle(spark, sf_dir):
    """BPE stats: one hash exchange (the subword count) — learning is
    driver-side over the vocab, application is a map-only Arrow pass."""
    plan = _plan(spark, sf_dir, "bpe_subword_stats")
    assert plan.count("Exchange hashpartitioning") == 1


def test_kmv_sketch_plan_no_python_rows_no_bnl(spark, sf_dir):
    """KMV: the only Python is the Arrow prune tier (MapInPandas), the
    saturated-group fallback is a broadcast semi-join, and nothing
    degenerates to a nested loop."""
    plan = _plan(spark, sf_dir, "kmv_distinct_users")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan  # no row-at-a-time Python
    assert plan.count("MapInPandas") <= 2  # the bounded prune passes only


def test_fuzzy_join_plan_hash_joins_only(spark, sf_dir):
    """Edit-distance join: the gram self-join is an equi hash/merge join
    (length band as post-join condition), the verify is JVM levenshtein
    — no cross product, no Python."""
    plan = _plan(spark, sf_dir, "fuzzy_part_name_pairs")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_prefix_jaccard_plan_no_bnl(spark, sf_dir):
    plan = _plan(spark, sf_dir, "jaccard_prefix_pairs")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_triangle_join_no_bnl(spark, sf_dir):
    """Both triangle join legs must stay equi hash joins — a
    condition-ordering mistake here degenerates to a nested loop over
    the edge set."""
    from pyspark.sql import functions as F

    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4)], "s bigint, d bigint"
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = e1.join(e2, F.col("e1.d") == F.col("e2.s")).join(
        e3, (F.col("e3.s") == F.col("e1.s")) & (F.col("e3.d") == F.col("e2.d"))
    )
    plan = tri._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_kanon_and_ab_single_aggregation_pass(spark, sf_dir):
    for name in ("k_anonymity_report", "ab_test_report"):
        plan = _plan(spark, sf_dir, name)
        assert plan.count("HashAggregate") >= 2, name  # partial + final
        assert "EvalPython" not in plan, name


def test_bootstrap_explode_is_map_side(spark, sf_dir):
    """The B-way replicate explode must sit below the partial aggregate
    (map-side blowup, combined before the shuffle), and the Poisson
    draw is pure JVM."""
    plan = _plan(spark, sf_dir, "bootstrap_revenue_ci")
    assert "EvalPython" not in plan
    assert "Generate explode" in plan or "Generate" in plan
    assert plan.count("HashAggregate") >= 2


def test_global_row_ids_ranking_window_is_partitioned(spark, sf_dir):
    """The 100 TB contract of the bucket-offset row-id scheme: the
    ranking window over the data is PARTITIONED by the bucket (never a
    global window), the data-scale exchange is keyed on the bucket, and
    the only SinglePartition exchanges feed the tiny (<=64-row)
    min/max + offsets frames."""
    plan = _plan(spark, sf_dir, "global_row_ids")
    import re

    rn = [ln for ln in plan.splitlines() if "row_number()" in ln]
    assert rn and all("__b" in ln for ln in rn)
    assert re.search(r"Exchange hashpartitioning\(__b", plan)
    assert plan.count("Exchange SinglePartition") <= 3
    assert plan.count("BroadcastExchange") >= 2


def test_column_stats_branches_prune_to_one_column(spark, sf_dir):
    """Each union branch of the exact-NDV profile scans exactly its own
    column (parquet column pruning per branch)."""
    import re

    df = entrymod.queries()["column_stats_report"](spark, sf_dir)
    plan = df._jdf.queryExecution().toString()
    scans = re.findall(r"FileScan parquet \[([^\]]*)\]", plan)
    assert len(scans) == 8
    assert all("," not in s for s in scans)  # one column per scan


def test_snapshot_diff_single_keyed_join_no_bnl(spark, sf_dir):
    plan = _plan(spark, sf_dir, "corpus_snapshot_diff")
    assert "FullOuter" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_export_jsonl_plan_stays_jvm(spark, sf_dir):
    """The JSONL manifest pass is pure JVM (native json reader + crc
    expressions) — no Python tier anywhere."""
    plan = _plan(spark, sf_dir, "export_jsonl_shards")
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    # partial + final manifest agg (min/max on strings may plan as
    # SortAggregate/ObjectHashAggregate rather than HashAggregate)
    assert plan.count("Aggregate") >= 2


def test_quarantine_plan_stays_jvm(spark, sf_dir):
    plan = _plan(spark, sf_dir, "corrupt_record_quarantine")
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_webdataset_parse_is_single_arrow_tier(spark, sf_dir):
    """Tar member parsing is the ONE sanctioned Arrow tier in the
    manifest plan (binaryFile -> mapInPandas); everything downstream is
    JVM aggregation."""
    plan = _plan(spark, sf_dir, "export_webdataset_shards")
    assert plan.count("MapInPandas") == 1
    assert "EvalPython" not in plan  # no row-at-a-time Python
