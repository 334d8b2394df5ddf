"""Interleaved sweep of the shingle_index pre-explode spread count over
its heavy consumers, one session, monkeypatching
operators.dedup._spread_partitions. Prints per-run walls and the best
per (query, k).

Usage: python tools/ab_shingle.py [n_rounds] [k,k,...] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from spark_data_engineering_spark.operators import dedup as D  # noqa: E402
from spark_data_engineering_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    ks = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "4,8,16,32").split(",")]
    queries = sys.argv[3:] or [
        "jaccard_prefix_pairs",
        "neardup_triangle_stats",
        "simhash_near_pairs",
        "ngram_jaccard_pairs",
        "minhash_lsh_pairs",
    ]
    spark = get_spark("ab_shingle")
    fns = entrymod.queries()
    best: dict[tuple[str, int], float] = {}
    for qname in queries:
        fn = fns[qname]
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warm
        for i in range(n):
            for k in ks:
                D._spread_partitions = lambda df, _k=k: _k
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                w = time.perf_counter() - t0
                key = (qname, k)
                best[key] = min(best.get(key, 1e9), w)
                print(f"{qname} k={k} run{i}: {w:.2f}s", flush=True)
    print("---- best per (query, k)")
    for (qname, k), w in best.items():
        print(f"{qname} k={k}: {w:.2f}s")


if __name__ == "__main__":
    main()
