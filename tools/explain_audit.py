"""Plan audit: one summary line per registered query — join strategies,
exchange count, pushed-filter presence, aggregation phases. The quick
way to spot a plan regression (broadcast gone, filter not pushed) across
the whole surface.

Usage: python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from spark_data_engineering_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("explain-audit")
    print(f"{'query':42} {'BHJ':>3} {'SMJ':>3} {'BNL':>3} {'Exch':>4} {'Agg':>3} {'Wind':>4} {'push':>4}")
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            qe = fn(spark, sf_dir)._jdf.queryExecution()
            plan = qe.executedPlan().toString()
            full = qe.toString()
        except Exception as e:
            print(f"{name:42} ERROR {type(e).__name__}: {str(e).splitlines()[0][:60]}")
            continue
        print(
            f"{name:42} "
            f"{plan.count('BroadcastHashJoin'):>3} "
            f"{plan.count('SortMergeJoin'):>3} "
            f"{plan.count('BroadcastNestedLoopJoin'):>3} "
            f"{len(re.findall(r'Exchange (hash|range|Single)', plan)):>4} "
            f"{plan.count('HashAggregate') + plan.count('ObjectHashAggregate') + plan.count('SortAggregate'):>3} "
            f"{plan.count('Window'):>4} "
            f"{'y' if 'PushedFilters: [I' in full or 'PushedFilters: [E' in full else '-':>4}"
        )


if __name__ == "__main__":
    main()
