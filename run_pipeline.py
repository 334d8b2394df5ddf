"""Production entry point — the reference's ``run_etl.py`` equivalent
(reference run_etl.py:9-28: run both gold metrics, register interface
views, query them via spark.sql and show).

Differences by design: one Runner executes the whole DAG with shared-
upstream memoization (the reference re-ran the entire bronze+silver
subtree once per report); gold metric tables optionally materialize
through the snapshot store (--store PATH); both reports print via
``spark.sql`` over the registered global temp views.

Usage:
    python run_pipeline.py [--sf-dir DIR] [--store PATH]
"""

from __future__ import annotations

import argparse

from spark_data_engineering_spark.pipeline import build_registry
from spark_data_engineering_spark.plans import Runner
from spark_data_engineering_spark.session import get_spark
from spark_data_engineering_spark.sources.snapshot import SnapshotStore
from spark_data_engineering_spark.sources.tables import default_sf_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=default_sf_dir())
    ap.add_argument("--store", default=None, help="snapshot store root (enables gold materialization)")
    args = ap.parse_args()

    spark = get_spark("rainforest-spark pipeline")
    reg = build_registry(spark, args.sf_dir)
    store = None
    if args.store:
        store = SnapshotStore(args.store)
        for gold in ("daily_order_metrics", "daily_category_metrics"):
            reg.node(gold).materialize = True

    runner = Runner(spark, reg, store=store)
    for report in ("daily_order_report", "daily_category_report"):
        runner.run(report).createOrReplaceGlobalTempView(report)
        spark.sql(f"select * from global_temp.{report} order by 1").show()


if __name__ == "__main__":
    main()
