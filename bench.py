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

# Headline set: the two reference reports, the heavy relational shapes, and
# one representative of each extension family.
HEADLINE = (
    "daily_order_report",
    "daily_category_report",
    "wide_lineitem",
    "project_derive_filter",
    "brand_type_metrics",
    "latest_order_per_customer",
    "top10_customers_by_revenue",
    "distinct_counts",
    "rollup_flag_status",
    "hourly_event_stats",
    "dedup_exact",
    "minhash_lsh_pairs",
    "knn_bruteforce",
    "doc_stats",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")

    # Warm-up: JVM JIT + codegen + parquet footer caches.
    registry.QUERIES["daily_order_report"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry.QUERIES[name]
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
