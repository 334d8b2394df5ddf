"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is executed with a count()-style action that forces full
evaluation without collecting rows to the driver. One warm-up of the
flagship query amortizes JVM/codegen startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_data_engineering_spark import registry  # noqa: E402
from spark_data_engineering_spark.session import get_spark  # noqa: E402

registry.load_all()

# Headline set, two tiers (round 8 re-derivation):
#
# 1. MUST-BENCH TIER — every registered query whose sf0.1 STEADY-STATE
#    wall exceeds 2 s, with no exceptions. The evidence is
#    tools/bench_audit.py run on a quiet machine (it measures all
#    registered queries once, re-running anything over 1.5 s so cached
#    builds report steady state); its full 201-query output is
#    committed per round as BENCH_AUDIT_r{N}.json, so NO query's cost
#    is invisible even when the ~1950-char driver stdout budget caps
#    how many rows this line can carry. The round-8 audit surfaced 16
#    >2 s queries the old set missed (the same invisibility class
#    VERDICT r7 flagged): the availableNow streaming demos
#    (user_totals_tws, sessionize, distinct_users, hourly_event_stats,
#    dedup_documents), the incremental-maintenance family (whose
#    per-call cost IS the maintenance fold), ann_recall_report,
#    pagerank_click_graph, approx_distinct_parts,
#    approx_quantiles_lineitem, cdc_boilerplate_chunks, dedup_clusters,
#    embedding_dup_clusters. All enter below. (Late-round tuning — the
#    shared _state_shuffle knob, fewer micro-batches at the same
#    cross-batch semantics, cached incremental lifecycles — then pushed
#    a number of these back UNDER the bar; they stay benched, since the
#    tier-1 rule is a superset requirement, not an exact set.)
#
# 2. REPRESENTATIVE TIER — the reference's two reports, a TPC-H core,
#    and one benched row per extension family, filling the remaining
#    stdout budget. Sub-2 s rows displaced in round 8 to fund tier 1
#    (machinery containment in parens; every one keeps its driver hash
#    row and pytest): daily_category_report_bucketed (plan pinned in
#    tests; daily_category_report stays), tpch q3/q5/q7/q9/q13/q16/q20
#    (join+agg machinery stays via q1/q2/q8/q18/q21 and the >2 s
#    tier), ngram_jaccard_pairs (minhash/simhash/jaccard_prefix
#    benched), media_feature_knn (knn_int8 + embedding_near_dup
#    benched), bpe_subword_stats + doc_repetition_metrics +
#    benchmark_contamination + doc_pii_scrub (text/quality family:
#    bigram_fluency + doc_classifier + cms benched),
#    winsorized_revenue_by_priority (brand_quantity_price_corr
#    benched), export_training/shuffled/jsonl_shards
#    (export_webdataset_shards benched; jsonl r7 driver-green).
#    tpch_q11_important_stock was dropped in r8 earlier (q16 note now
#    historical — q16 itself rotated out this round).
HEADLINE = (
    # ---- tier 1: every >2 s steady-state query (BENCH_AUDIT_r08) ----
    "streaming_user_totals_tws",
    # r11 audit: ngram_jaccard_pairs (2.57) and containment_pairs
    # (2.43) crossed the 2 s steady bar (BENCH_AUDIT_r11) — tier 1
    # requires them; funded within the ~1950-char driver stdout budget
    # by dropping incremental_scd2_tiers (0.22 s steady) and
    # incremental_daily_order_report (0.29 s) — the cached-lifecycle
    # machinery both exercise stays driver-hash-checked and pytest-
    # pinned, and every incremental query keeps its audit row
    "ngram_jaccard_pairs",
    "containment_pairs",
    # incremental_daily_revenue_merged (0.15 s steady, BENCH_AUDIT_r10)
    # dropped r10, incremental_scd2_tiers / incremental_daily_order
    # _report dropped r11 (0.22/0.29 s steady), all to fund tier-1
    # rows within the stdout budget
    # r10 audit: crossed the 2 s bar (2.07 s steady) — tier 1 requires it
    "dedup_cluster_stats",
    # r12 audit: txn_widen_column_revenue entered >2 s steady (2.45 s —
    # a full orders read through the widened schema) — tier 1 requires
    # it; funded by dropping streaming_expectations_quarantine (0.52 s
    # steady; the streaming machinery keeps ten benched rows and the
    # query keeps its driver hash row + pytest pins)
    "txn_widen_column_revenue",
    # incremental_daily_revenue (0.14 s) dropped r9 to fund the
    # pipeline_daily_category_report tier-1 row within the stdout
    # budget: the cached-lifecycle read-back machinery stays benched
    # via incremental_daily_revenue_merged / _order_report / scd2_tiers
    "ann_recall_report",
    "streaming_sessionize_events",
    "streaming_distinct_users",
    "streaming_hourly_event_stats",
    "streaming_dedup_documents",
    "pagerank_click_graph",
    "approx_distinct_parts",
    "approx_quantiles_lineitem",
    "cdc_boilerplate_chunks",
    "dedup_clusters",
    "embedding_dup_clusters",
    "bootstrap_revenue_ci",
    "semantic_dedup_report",
    "streaming_click_purchase_join",
    "streaming_txn_sink_revenue",
    "streaming_enriched_event_stats",
    "streaming_txn_source_revenue",
    "streaming_txn_cdf_merge_revenue",
    "streaming_txn_cdf_revenue",
    "streaming_materialized_view_revenue",
    "bloom_pruned_supplier_revenue",
    "minhash_lsh_pairs",
    "jaccard_prefix_pairs",
    "dedup_keep_best",
    "neardup_triangle_stats",
    # r9 late audit: crossed the 2 s bar (2.42 s best-of-3 on a quiet
    # re-measure; the other 8 apparent crossings in the loaded audit
    # run were contention — all <=1.98 s best-of-3) — tier 1 requires it
    "concurrent_sessions",
    # ---- tier 2: reports, TPC-H core, one row per family ----
    "daily_order_report",
    "daily_category_report",
    "daily_category_report_approx",
    "pipeline_daily_order_report",
    # r9 audit: crossed the 2 s bar (2.38 s steady) — tier 1 requires it
    "pipeline_daily_category_report",
    "tpch_q1_pricing_summary",
    "tpch_q2_min_cost_supplier",
    "tpch_q8_market_share",
    "tpch_q18_volume_customers",
    "tpch_q21_sole_returned_supplier",
    "wide_lineitem",
    "simhash_near_pairs",
    "embedding_near_dup",
    "knn_int8_quantized",
    "kmv_distinct_users",
    "cms_token_frequencies",
    "bigram_fluency_scores",
    "brand_quantity_price_corr",
    "copurchase_part_pairs",
    "ann_index_incremental_search",
    "doc_classifier_scores",
    "curation_decisions",
    "doc_hierarchy_depths",
    "txn_snapshot_join",
    "dv_delete_report",
    # streaming_expectations_quarantine (0.52 s steady) dropped r12 to
    # fund the txn_widen_column_revenue tier-1 row within the stdout
    # budget — quarantine machinery stays pytest-pinned + driver-hashed
    "export_webdataset_shards",
    "rrf_fusion_search",
    # txn_branch_merge_revenue (0.38 s steady) dropped r9-late to fund
    # the concurrent_sessions tier-1 row within the stdout budget: it
    # keeps its driver hash row + pytest pins, and the branch/commit
    # machinery stays benched via txn_writer_roundtrip_revenue and the
    # txn streaming rows
    "txn_writer_roundtrip_revenue",
)


# ---------------------------------------------------------------------------
# Calibration canary (VERDICT r11 task 2): a fixed CPU-bound workload
# measured IN the same session, interleaved with the queries, so a
# round-over-round bench delta can be split mechanically into
# environment drift (the canary moved with it) and query regression
# (the canary did not). Three rounds in a row the headline absorbed
# 10-30% uniform host drift that a judge had to adjudicate by hand
# against the full audit sweep; the canary makes that arithmetic.
#
# Two probes, both deterministic and IO-free:
#   - jvm: a 4B-row whole-stage-codegen aggregate (spark.range ->
#     sum(hash)) — tracks executor-side CPU contention/throttle, the
#     regime nearly every benched query runs in. Sized so task-
#     scheduling jitter is small relative to compute (~1.3 s steady;
#     at 512M the probe was ~0.5 s and 30% scheduler noise). Two
#     warm-up runs: the probe JITs across the first run, not just the
#     first job;
#   - py:  a pure-Python LCG loop — tracks driver/Python-worker CPU.
#
# CANARY_BASELINE.json (committed, measured on a quiet host) anchors
# normalization: cnorm = total * (baseline_jvm / measured_jvm) is the
# headline total re-expressed in baseline-host seconds.

CANARY_JVM_ROWS = 4_000_000_000
CANARY_PY_ITERS = 4_000_000


def canary_jvm(spark) -> float:
    """Wall seconds for the fixed JVM-side probe (one run)."""
    t0 = time.time()
    spark.range(CANARY_JVM_ROWS).selectExpr(
        "sum(hash(id)) as h", "sum(hash(id + 1)) as m"
    ).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def canary_py() -> float:
    """Wall seconds for the fixed pure-Python probe (one run)."""
    t0 = time.time()
    acc = 0
    for i in range(CANARY_PY_ITERS):
        acc = (acc * 1103515245 + i) & 0xFFFFFFFFFFFF
    return time.time() - t0


def canary_baseline(path: "str | None" = None) -> "dict | None":
    """The committed quiet-host reference, or None before one exists
    (or when the file is malformed — a broken baseline must degrade to
    cnorm=None, never abort the bench after the queries already ran)."""
    p = path or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "CANARY_BASELINE.json"
    )
    try:
        with open(p) as fh:
            base = json.load(fh)
        # validate the keys cnorm arithmetic needs up front — a
        # malformed/partial baseline must degrade to "no baseline"
        # (cnorm=None), not abort the bench after every query ran
        float(base["jvm"])
        float(base["py"])
        return base
    except (OSError, ValueError, KeyError, TypeError):
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")

    # Warm-up: JVM JIT + codegen + parquet footer caches, plus the
    # executor-side Python worker pool (first Pandas-UDF query otherwise
    # pays ~10 s of interpreter startup).
    registry.QUERIES["daily_order_report"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(cpus * 4).repartition(cpus).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    # N samples per query: this host shows bursty CPU throttling (30x
    # swings on identical work), so a single sample is noise, not signal.
    # Headline `queries` report best-of-N (comparable to earlier rounds);
    # `medians` + `noise_band_pct` quantify the residual spread so a
    # round-over-round delta can be read against the measured noise.
    # Slow-looking results get adaptive retries: a throttle burst clears
    # and a retry comes back fast; a genuinely slow query plateaus and
    # stops after one extra run (retries continue only while improving).
    import statistics

    # Cold-build accounting (VERDICT r13 #5, additions-only): the ANN
    # index family persists derived indexes under /tmp keyed on data +
    # code digest, so best-of-N never includes the build. Record whether
    # the cache root was cold when the bench started and, for the cached-
    # index queries, their FIRST sample (= build + first run when cold)
    # next to the steady best — the build cost is reported, not buried.
    # Headline `queries` timing and methodology are unchanged.
    import glob as _glob

    ann_cache_cold = not _glob.glob("/tmp/spark_de_ann_index/*")
    CACHED_INDEX_QUERIES = ("ann_recall_report", "ann_index_incremental_search")
    first_sample: dict[str, float] = {}

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    retry_above = float(os.environ.get("SPARK_GRAFT_BENCH_RETRY_ABOVE", "1.2"))
    max_retries = int(os.environ.get("SPARK_GRAFT_BENCH_RETRIES", "4"))
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    spreads: list[float] = []
    # canary samples interleave with the query loop (start / midpoints /
    # end) so the probe sees the same environment window the queries do;
    # the first TWO jvm runs warm codegen/JIT outside the samples
    canary_jvm(spark)
    canary_jvm(spark)
    canary_samples: dict[str, list[float]] = {"jvm": [], "py": []}

    def sample_canary() -> None:
        canary_samples["jvm"].append(round(canary_jvm(spark), 3))
        canary_samples["py"].append(round(canary_py(), 3))

    sample_canary()
    canary_at = {len(HEADLINE) // 3, (2 * len(HEADLINE)) // 3}
    for qi, name in enumerate(HEADLINE):
        if qi in canary_at:
            sample_canary()
        fn = registry.QUERIES[name]

        def one_run() -> float:
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            return time.time() - t0

        # heavy queries (BEST run >= 3 s: availableNow streaming demos,
        # iterative algorithms, the incremental-maintenance family) get
        # 2 runs and no noise retries — their wall is trigger
        # scheduling / fixed per-call work, stable in absolute terms,
        # and a 7-run budget on a 5 s query buys nothing but wall time
        # (the retry loop exists to rescue sub-second rows from
        # throttle noise, where one bad sample doubles the number).
        # Classification is by best-so-far, NOT the first sample
        # (round 10; VERDICT r9 #4): a throttle burst on run 1 used to
        # lock a 2.9 s-steady query into the no-retry tier and commit
        # the 8 s noise number (embedding_dup_clusters, BENCH_r09).
        samples = [one_run()]
        if name in CACHED_INDEX_QUERIES:
            first_sample[name] = round(samples[0], 3)
        if samples[0] >= 3.0:
            samples.append(one_run())  # confirm: heavy, or a noise hit?
        heavy = min(samples) >= 3.0
        n_runs = min(runs, 2) if heavy else runs
        while len(samples) < n_runs:
            samples.append(one_run())
        best = min(samples)
        if heavy and max(samples) > 1.5 * best:
            # large spread on a heavy query: one confirmation run so a
            # loaded-host pair doesn't stand as the committed number
            t = one_run()
            samples.append(t)
            best = min(best, t)
        for _ in range(max_retries):
            if best <= retry_above or heavy:
                break
            t = one_run()
            samples.append(t)
            if t < best * 0.75:
                best = t  # still improving — likely throttle noise, keep going
            else:
                best = min(best, t)
                break  # plateaued: genuinely this slow
        # steady-state stats exclude each query's FIRST sample: it pays
        # one-time plan compilation/codegen for that query, which is
        # startup cost, not run-to-run noise (best-of keeps all samples)
        steady = samples[1:] if len(samples) > 1 else samples
        med = statistics.median(steady)
        timings[name] = round(best, 3)
        medians[name] = round(med, 3)
        if med > 0 and len(steady) > 1:
            spreads.append(100.0 * (max(steady) - min(steady)) / med)

    sample_canary()  # closing sample
    canary = {
        "jvm": round(statistics.median(canary_samples["jvm"]), 3),
        "py": round(statistics.median(canary_samples["py"]), 3),
    }
    base = canary_baseline()
    # cnorm: the headline total in baseline-host seconds — divide out
    # the measured environment factor. Median canary, not best: the
    # queries pay the typical environment, so the normalizer must too.
    cnorm = (
        round(sum(timings.values()) * base["jvm"] / canary["jvm"], 3)
        if base and canary["jvm"] > 0
        else None
    )
    total = round(sum(timings.values()), 3)
    cold_build = {
        "ann_cache_cold_at_start": ann_cache_cold,
        "first_sample": first_sample,
    }
    rich = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "medians": medians,
        "median_total": round(sum(medians.values()), 3),
        "noise_band_pct": round(statistics.median(spreads), 1) if spreads else None,
        "runs": runs,
        "canary": canary,
        "canary_samples": canary_samples,
        "canary_baseline": base,
        "cnorm": cnorm,
        "cold_build": cold_build,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # full per-run medians live in a local file; the stdout line must fit
    # the driver's 2000-char tail capture (BENCH_r04 had "parsed": null
    # because the rich medians map pushed the line past it), so it keeps
    # only the best-of per-query map at 2 decimals, compact separators
    with open(os.path.join(os.path.dirname(__file__), "bench_local.json"), "w") as f:
        json.dump(rich, f, indent=1)
    # noise_band_pct and median_total moved to bench_local.json only as
    # of round 6: the 64-query map left no room for them under the
    # driver's 2000-char tail capture
    compact = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "canary": canary,
        "cnorm": cnorm,
        "sf": rich["sf"],
    }
    # cold-build visibility (additions-only; full record always in
    # bench_local.json "cold_build"): compact abbreviation "cb" =
    # [cache_cold_at_start, first_sample(ann_recall_report),
    #  first_sample(ann_index_incremental_search)] rides along ONLY when
    # it fits the driver's ~2000-char stdout tail with margin — the
    # alternative (the fallback below trimming the query map) would read
    # as dropped queries, which is never worth a telemetry field.
    with_cb = {
        **compact,
        "cb": [int(ann_cache_cold)]
        + [round(first_sample.get(q, -1.0), 2) for q in CACHED_INDEX_QUERIES],
    }
    if len(json.dumps(with_cb, separators=(",", ":"))) <= 1960:
        compact = with_cb
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1980:
        # last-ditch: drop the slowest-to-name half of the per-query map
        # rather than overflow (total and sf are the headline numbers)
        items = sorted(compact["queries"].items(), key=lambda kv: -kv[1])
        while len(line) > 1980 and items:
            items = items[:-1]
            line = json.dumps(
                {**compact, "queries": dict(items), "queries_truncated": True},
                separators=(",", ":"),
            )
    print(line)


if __name__ == "__main__":
    main()
