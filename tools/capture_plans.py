"""Capture ``.explain("formatted")`` for named queries into text files.

The optimization rounds commit plan evidence (``plans/r13/<q>_before.txt``
/ ``_after.txt``) so plan-shape claims (exchange counts, join strategy,
pushed filters) can be checked without running Spark.

Batch queries: the full formatted physical plan of the returned frame.
Streaming gate queries return a memory-sink read (the streaming plan
only exists while the query runs), so for them the file records the
post-stream frame plus a marker line.

Usage:
  python tools/capture_plans.py <out_dir> <suffix> [sf_dir] [query ...]
  # default sf_dir /root/testdata/sf0.01; no query list = bench.HEADLINE
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

# resolve the repo root from THIS file so a checkout/worktree of an older
# tree captures its own code, not /root/repo's
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from spark_data_engineering_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    names = sys.argv[4:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    qs = entrymod.queries()
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            # public API (ADVICE r13): explain(mode=...) prints; capture it
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            plan = f"ERROR capturing plan: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
