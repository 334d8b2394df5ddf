"""Plan audit: one summary line per registered query — join strategies,
exchange count, pushed-filter presence, aggregation phases. The quick
way to spot a plan regression (broadcast gone, filter not pushed) across
the whole surface.

``--gate`` (round 13; VERDICT r12 task 5) turns the summary into an
ENFORCED agreement check between the evidence and the physical plan:
for every join in each must-bench query's optimized logical plan, the
min side's Catalyst size estimate (the same stats the advisor's
commit-log arithmetic mirrors for txn tables, and what Spark's own
planner consumes for file sources) decides whether a broadcast is
expected; the executed plan must contain at least that many broadcast
joins. Queries with a sub-threshold join side planned as SortMergeJoin
are DISAGREEMENTS. The result is written as ``EXPLAIN_AUDIT_r{N}.json``
so plan regressions (broadcast gone after a refactor) are caught by
diff, not by eyeballing explain output.

Usage:
  python tools/explain_audit.py [sf_dir] [query ...]         # summary
  python tools/explain_audit.py --gate [sf_dir] [OUT.json]   # gate over
      # bench.HEADLINE (default OUT /tmp/explain_audit.json)
"""

from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from spark_data_engineering_spark.session import get_spark  # noqa: E402

# which side(s) Spark's JoinSelection may broadcast, per join type —
# the preserved side of an outer join can never be the build side
# (broadcasting the stream side of a LeftOuter would drop unmatched
# rows), so only the non-preserved side counts as evidence
_BROADCAST_SIDES = {
    "Inner": ("left", "right"),
    "Cross": ("left", "right"),
    "LeftOuter": ("right",),
    "RightOuter": ("left",),
    "LeftSemi": ("right",),
    "LeftAnti": ("right",),
    "ExistenceJoin": ("right",),
}


def _walk(node):
    yield node
    it = node.children().iterator()
    while it.hasNext():
        yield from _walk(it.next())


def _join_evidence(qe, threshold: int) -> list[dict]:
    """One record per Join node in the optimized logical plan: the two
    sides' Catalyst size estimates and whether the evidence expects a
    broadcast (min side under the session threshold, join type
    broadcastable). sizeInBytes is exactly what Spark's
    JoinSelection consumes, so 'evidence says broadcast but the plan
    sort-merges' is a genuine planner/plan-shape disagreement."""
    out = []
    for node in _walk(qe.optimizedPlan()):
        if node.getClass().getSimpleName() != "Join":
            continue
        jt = str(node.joinType())
        kids = []
        it = node.children().iterator()
        while it.hasNext():
            kids.append(it.next())
        if len(kids) < 2:
            continue
        sizes = [int(str(k.stats().sizeInBytes())) for k in kids[:2]]
        sides = _BROADCAST_SIDES.get(jt.replace("(", " ").split()[0], ())
        eligible = [
            sizes[0 if s == "left" else 1] for s in sides
        ]
        out.append(
            {
                "join_type": jt,
                "left_bytes": sizes[0],
                "right_bytes": sizes[1],
                "expect_broadcast": bool(eligible)
                and min(eligible) <= threshold,
            }
        )
    return out


def _counts(plan: str, full: str) -> dict:
    return {
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "bnl": plan.count("BroadcastNestedLoopJoin"),
        "exch": len(re.findall(r"Exchange (hash|range|Single)", plan)),
        "agg": plan.count("HashAggregate")
        + plan.count("ObjectHashAggregate")
        + plan.count("SortAggregate"),
        "window": plan.count("Window"),
        "pushed": bool(
            "PushedFilters: [I" in full or "PushedFilters: [E" in full
        ),
    }


def gate(sf_dir: str, out_path: str) -> int:
    import bench

    spark = get_spark("explain-audit")
    raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold").strip().lower()
    m = re.match(r"^(-?\d+)\s*([kmg]?b?)$", raw)
    mult = {"": 1, "b": 1, "k": 1024, "kb": 1024, "m": 1024**2,
            "mb": 1024**2, "g": 1024**3, "gb": 1024**3}
    threshold = int(m.group(1)) * mult[m.group(2)] if m else 10 * 1024**2
    queries = entrymod.queries()
    record: dict = {}
    n_disagree = 0
    for name in bench.HEADLINE:
        fn = queries.get(name)
        if fn is None:
            continue
        try:
            qe = fn(spark, sf_dir)._jdf.queryExecution()
            plan = qe.executedPlan().toString()
            full = qe.toString()
            joins = _join_evidence(qe, threshold)
        except Exception as e:
            record[name] = {"error": f"{type(e).__name__}: {str(e)[:120]}"}
            continue
        c = _counts(plan, full)
        expected = sum(1 for j in joins if j["expect_broadcast"])
        actual = c["bhj"] + c["bnl"]
        note = None
        if "UnionLoop" in plan:
            # recursive CTE: the recursion body's join stays LOGICAL
            # inside UnionLoopExec and is planned per iteration at
            # runtime — the executed-plan text can never show it, so
            # the static evidence count doesn't apply
            note = (
                "recursive CTE — joins planned per iteration inside "
                "UnionLoop; static broadcast evidence not applicable"
            )
            expected = 0
        # the gate: every evidence-expected broadcast must appear as a
        # broadcast join in the executed plan. actual > expected is
        # FINE (AQE or hints may broadcast more than the static
        # evidence promises); fewer is a disagreement.
        entry: dict = {**c, "joins": joins, "expected_broadcasts": expected,
                       "actual_broadcasts": actual}
        if note:
            entry["note"] = note
        if actual < expected:
            entry["disagreement"] = (
                f"evidence expects >= {expected} broadcast join(s) "
                f"(sub-threshold side) but the plan has {actual}"
            )
            n_disagree += 1
        record[name] = entry
    summary = {
        "sf_dir": sf_dir,
        "threshold_bytes": threshold,
        "queries": len(record),
        "disagreements": n_disagree,
    }
    with open(out_path, "w") as fh:
        json.dump({"__summary__": summary, **record}, fh, indent=1)
    print(json.dumps(summary))
    for name, entry in record.items():
        if "disagreement" in entry:
            print(json.dumps({"query": name, **{
                k: entry[k] for k in ("disagreement", "expected_broadcasts",
                                      "actual_broadcasts")}}))
        if "error" in entry:
            print(json.dumps({"query": name, "error": entry["error"]}))
    return 0 if n_disagree == 0 else 1


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--gate":
        sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
        out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/explain_audit.json"
        sys.exit(gate(sf_dir, out))
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
        c = _counts(plan, full)
        print(
            f"{name:42} "
            f"{c['bhj']:>3} {c['smj']:>3} {c['bnl']:>3} {c['exch']:>4} "
            f"{c['agg']:>3} {c['window']:>4} "
            f"{'y' if c['pushed'] else '-':>4}"
        )


if __name__ == "__main__":
    main()
