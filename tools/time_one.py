"""Isolated best-of-N timing for one query (same noop-sink action as bench.py).

Usage: python tools/time_one.py <query> [n] [sf_dir]
Prints per-run walls plus a canary sample (pure-Python loop) for host-drift
bracketing, then the best/median.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from spark_data_engineering_spark.session import get_spark  # noqa: E402


def py_canary() -> float:
    t0 = time.perf_counter()
    s = 0
    for i in range(12_000_000):
        s += i * i
    return time.perf_counter() - t0


def main() -> None:
    name = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark("time_one")
    fn = entrymod.queries()[name]
    # warm-up: JVM + codegen + IO caches
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    walls = []
    for i in range(n):
        c = py_canary()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        w = time.perf_counter() - t0
        walls.append(w)
        print(f"run {i}: {w:.2f}s (canary {c:.2f}s)", flush=True)
    walls.sort()
    med = walls[len(walls) // 2]
    print(f"BEST {walls[0]:.2f}s MEDIAN {med:.2f}s")


if __name__ == "__main__":
    main()
