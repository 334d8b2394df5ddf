"""Scale smoke: run registered queries at two scale factors and report
wall time + output rows at each, so N× growth is measurable and
reproducible (pair with tools/make_scale_data.py).

Usage:
    python tools/scale_smoke.py q1 q2 ...          # sf0.1 vs /tmp/spark_graft_sf1
    SMOKE_BASE=/root/testdata/sf0.1 SMOKE_BIG=/tmp/spark_graft_sf1 \
        python tools/scale_smoke.py q1 q2 ...

Prints one JSON line per query:
    {"query": ..., "base_s": ..., "big_s": ..., "base_rows": ...,
     "big_rows": ..., "wall_ratio": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from spark_data_engineering_spark import registry  # noqa: E402
from spark_data_engineering_spark.session import get_spark  # noqa: E402

registry.load_all()


def main() -> None:
    base = os.environ.get("SMOKE_BASE", "/root/testdata/sf0.1")
    big = os.environ.get("SMOKE_BIG", "/tmp/spark_graft_sf1")
    names = sys.argv[1:]
    spark = get_spark("scale-smoke")
    # warm the JVM + python worker pool off the clock
    registry.QUERIES["daily_order_report"](spark, base).write.format(
        "noop"
    ).mode("overwrite").save()

    for name in names:
        fn = registry.QUERIES[name]
        out = {}
        for tag, sf_dir in (("base", base), ("big", big)):
            t0 = time.time()
            df = fn(spark, sf_dir)
            rows = df.count()
            out[f"{tag}_s"] = round(time.time() - t0, 2)
            out[f"{tag}_rows"] = rows
        out["wall_ratio"] = round(out["big_s"] / max(out["base_s"], 1e-9), 2)
        print(json.dumps({"query": name, **out}))


if __name__ == "__main__":
    main()
