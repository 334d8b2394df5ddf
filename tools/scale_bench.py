"""Committed scale-bench artifact (round 13; VERDICT r12 task 4):
run the >=5 s must-bench heads at sf1 (tools/make_scale_data.py's 10x
replication of sf0.1) with the same calibration canary bench.py uses,
and write ``SCALE_BENCH_r{N}.json`` — so the 10x/100x scale claims in
SCALE.md are caught by ``--compare`` diffs across rounds instead of
re-read as point-in-time prose.

The query set is the fixed >=5 s tier of bench.py's HEADLINE: the ANN
index lifecycle, semantic dedup, the bootstrap CI resample, and the
streaming txn family — the operators whose wall is dominated by real
distributed work (index build, LSH banding, stateful streaming) rather
than fixed overhead, i.e. the ones whose *scaling*, not just absolute
wall, is the claim under test.

Usage:
  python tools/scale_bench.py [OUT.json]     # sweep (default
                                             #   /tmp/scale_bench.json)
  python tools/scale_bench.py --compare OLD.json NEW.json
      # canary-normalized classification, same bands as bench_audit

Env:
  SCALE_SF_DIR   big dir (default /tmp/spark_graft_sf1; generated via
                 make_scale_data.py if missing)
  SCALE_RUNS     runs per query, min wall recorded (default 2 — the
                 second run is the steady state: digest-keyed caches
                 built, streams warm)

Caveat recorded in the artifact: the ANN / dedup queries build
digest-keyed caches under /tmp keyed by (input, code digest) — a round
that touched txn.py/ann code pays the rebuild in run 1; SCALE_RUNS=2's
min() keeps the recorded number the steady read-path wall.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_data_engineering_spark import registry  # noqa: E402
from spark_data_engineering_spark.session import get_spark  # noqa: E402

# the >=5 s tier (BENCH_AUDIT_r12 steadies at sf0.1; all in HEADLINE)
QUERIES = (
    "ann_recall_report",
    "semantic_dedup_report",
    "bootstrap_revenue_ci",
    "streaming_txn_sink_revenue",
    "streaming_txn_source_revenue",
    "streaming_txn_cdf_merge_revenue",
    "streaming_txn_cdf_revenue",
    "streaming_user_totals_tws",
)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--compare":
        from tools import bench_audit

        bench_audit.compare(sys.argv[2], sys.argv[3])
        return
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_bench.json"
    big = os.environ.get("SCALE_SF_DIR", "/tmp/spark_graft_sf1")
    runs = int(os.environ.get("SCALE_RUNS", "2"))
    if not os.path.isdir(big):
        print(f"# generating {big} via make_scale_data.py", file=sys.stderr)
        subprocess.run(
            [
                sys.executable,
                os.path.join(os.path.dirname(__file__), "make_scale_data.py"),
                "/root/testdata/sf0.1",
                big,
                "10",
            ],
            check=True,
        )

    import bench
    from tools.scale_smoke import _warm_stream_worker

    registry.load_all()
    spark = get_spark("scale-bench")
    # fixed warm-up: JVM/codegen + pandas pool + stream worker, all off
    # the clock (same preamble rules as bench_audit)
    registry.QUERIES["daily_order_report"](spark, big).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    _warm_stream_worker(spark)

    import statistics

    bench.canary_jvm(spark)  # codegen warm-up outside the samples
    cs: dict[str, list[float]] = {"jvm": [], "py": []}

    def sample_canary() -> None:
        cs["jvm"].append(round(bench.canary_jvm(spark), 3))
        cs["py"].append(round(bench.canary_py(), 3))

    sample_canary()
    walls: dict[str, float] = {}
    mid = {len(QUERIES) // 2}
    for qi, name in enumerate(QUERIES):
        if qi in mid:
            sample_canary()
        best = None
        for _ in range(max(1, runs)):
            t0 = time.time()
            registry.QUERIES[name](spark, big).write.format("noop").mode(
                "overwrite"
            ).save()
            w = time.time() - t0
            best = w if best is None else min(best, w)
        walls[name] = round(best, 2)
        print(json.dumps({"query": name, "sf1_s": walls[name]}))
    sample_canary()
    canary = {
        "jvm": round(statistics.median(cs["jvm"]), 3),
        "py": round(statistics.median(cs["py"]), 3),
        "jvm_samples": cs["jvm"],
        "py_samples": cs["py"],
    }
    record = {
        **walls,
        "__canary__": canary,
        "__meta__": {
            "sf_dir": big,
            "runs": runs,
            "total_s": round(sum(walls.values()), 2),
            "note": "min-of-N walls; run 1 may pay digest-keyed cache "
            "rebuilds after code changes",
        },
    }
    with open(out_path, "w") as fh:
        json.dump(record, fh, indent=1)
    print(json.dumps({"total_s": record["__meta__"]["total_s"],
                      "canary": {"jvm": canary["jvm"], "py": canary["py"]},
                      "out": out_path}))


if __name__ == "__main__":
    main()
