"""Must-bench audit: measure EVERY registered query's sf0.1 wall once
(re-running any first-pass result over 1.5 s to get its steady state),
and print the queries whose steady-state wall exceeds the 2 s
must-bench bar together with whether they are in bench.py's HEADLINE
set. This is the evidence behind bench.py's claim that every >2 s
query enters the bench record (VERDICT r7 "What's wrong" #1 demanded
the claim be true, not just asserted).

The sweep also samples bench.py's calibration canary (start / two
midpoints / end) and records its median under the ``__canary__`` key,
so two audit files can be compared with environment drift divided out.

Usage:
  python tools/bench_audit.py [sf_dir]      # sweep (default sf0.1)
  python tools/bench_audit.py --compare OLD.json NEW.json
      # classify per-query deltas: the canary ratio is the environment
      # factor; a query whose normalized ratio stays within the band is
      # environment drift, outside it is a real regression/improvement
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_data_engineering_spark import registry  # noqa: E402
from spark_data_engineering_spark.session import get_spark  # noqa: E402


def compare(old_path: str, new_path: str) -> None:
    """Classify per-query deltas between two audit files, normalized by
    the canary ratio (VERDICT r11 task 2: make the recurring uniform
    host-drift adjudication mechanical)."""
    import statistics

    with open(old_path) as fh:
        old = json.load(fh)
    with open(new_path) as fh:
        new = json.load(fh)
    c_old = (old.get("__canary__") or {}).get("jvm")
    c_new = (new.get("__canary__") or {}).get("jvm")
    env = (c_new / c_old) if c_old and c_new else None
    shared = sorted(
        k for k in old if k in new and not k.startswith("__")
        and isinstance(old[k], (int, float)) and old[k] > 0
    )
    raw = {k: new[k] / old[k] for k in shared}
    factor = env if env else 1.0
    norm = {k: r / factor for k, r in raw.items()}
    # classification bands: within +-25% after normalization = noise /
    # environment; beyond = a real change. Only queries with enough
    # absolute wall to matter (>= 0.5 s on either side) are classified —
    # sub-half-second rows flip bands on scheduler jitter alone.
    sig = [k for k in shared if max(old[k], new[k]) >= 0.5]
    regressions = {
        k: {"old": old[k], "new": new[k], "norm_ratio": round(norm[k], 2)}
        for k in sig
        if norm[k] > 1.25
    }
    improvements = {
        k: {"old": old[k], "new": new[k], "norm_ratio": round(norm[k], 2)}
        for k in sig
        if norm[k] < 0.8
    }
    tot_old = sum(old[k] for k in shared)
    tot_new = sum(new[k] for k in shared)
    print(
        json.dumps(
            {
                "shared_queries": len(shared),
                "env_factor": round(env, 3) if env else None,
                "env_note": None
                if env
                else "one side lacks __canary__ — ratios are RAW",
                "raw_total_ratio": round(tot_new / tot_old, 3),
                "norm_total_ratio": round(tot_new / tot_old / factor, 3),
                "median_norm_ratio": round(
                    statistics.median(norm.values()), 3
                ),
                "regressions_gt_1.25x": dict(
                    sorted(
                        regressions.items(),
                        key=lambda kv: -kv[1]["norm_ratio"],
                    )
                ),
                "improvements_lt_0.8x": dict(
                    sorted(
                        improvements.items(),
                        key=lambda kv: kv[1]["norm_ratio"],
                    )
                ),
            },
            indent=1,
        )
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--compare":
        compare(sys.argv[2], sys.argv[3])
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import bench

    headline = set(bench.HEADLINE)
    registry.load_all()
    spark = get_spark("bench-audit")
    # Fixed warm-up preamble (VERDICT r12 task 2): the sweep's first few
    # timings otherwise absorb residual JVM JIT / codegen / Python-worker
    # cold-start beyond the two noop ops — and when the sweep order
    # followed CHECK_PRIORITY, window rotation moved DIFFERENT queries
    # into that cold slot each round, masquerading as 2-4x regressions
    # in --compare. The preamble is a fixed, rotation-independent set of
    # throwaway executions covering the hot engine paths (join+agg,
    # date bucketing, pandas-UDF pool), run before any timing starts.
    registry.QUERIES["daily_order_report"](spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    for warm in ("tpch_q1_pricing_summary", "hourly_event_stats",
                 "wide_lineitem"):
        registry.QUERIES[warm](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    import statistics

    bench.canary_jvm(spark)  # codegen warm-up outside the samples
    cs: dict[str, list[float]] = {"jvm": [], "py": []}

    def sample_canary() -> None:
        cs["jvm"].append(round(bench.canary_jvm(spark), 3))
        cs["py"].append(round(bench.canary_py(), 3))

    sample_canary()
    n_q = len(registry.QUERIES)
    canary_at = {n_q // 3, (2 * n_q) // 3}
    walls: dict[str, float] = {}
    # Canonical sweep order = sorted names, NOT registry (CHECK_PRIORITY)
    # order: the registry reorders on every window rotation, and a
    # query's position in the sweep must never change between the two
    # files a --compare adjudicates.
    sweep = sorted(registry.QUERIES.items())
    for qi, (name, fn) in enumerate(sweep):
        if qi in canary_at:
            sample_canary()
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:
            print(json.dumps({"query": name, "error": str(e)[:120]}))
            continue
        w = time.time() - t0
        if w > 1.5:
            # steady state: one more run (cached builds, warm streams)
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            w = min(w, time.time() - t0)
        walls[name] = round(w, 2)
    sample_canary()
    canary = {
        "jvm": round(statistics.median(cs["jvm"]), 3),
        "py": round(statistics.median(cs["py"]), 3),
        "jvm_samples": cs["jvm"],
        "py_samples": cs["py"],
    }
    over = {n: w for n, w in sorted(walls.items(), key=lambda kv: -kv[1]) if w > 2.0}
    print(json.dumps({"n_measured": len(walls), "over_2s": over}))
    missing = [n for n in over if n not in headline]
    print(json.dumps({"over_2s_not_benched": missing, "canary": canary}))
    with open("/tmp/bench_audit_sf01.json", "w") as fh:
        json.dump({**walls, "__canary__": canary}, fh, indent=1)


if __name__ == "__main__":
    main()
