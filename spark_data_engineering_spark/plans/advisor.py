"""Zero-job join planning from committed ANALYZE stats (VERDICT r10
task 3: give the stats surface a consumer).

``join_size_advisor`` reads each table's commit log only — fresh
``analyzed_rows`` + logical schema width for a size estimate, per-key
NDV from ``column_stats`` for multiplicity — and flags which sides of a
join are broadcast-eligible under the session threshold. No Spark jobs,
no file listing: at 100 TB the driver decides join strategy from a few
KB of JSON, the same way Spark's CBO consumes ANALYZE output.

The estimates deliberately reuse the MERGE broadcast gate's arithmetic
(``_est_row_bytes`` — Catalyst defaultSize-style widths), so "the
advisor said broadcast" and "merge would broadcast it" never disagree.
"""

from __future__ import annotations

from spark_data_engineering_spark.sources.txn import (
    TxnTable,
    _est_row_bytes,
    _size_bytes,
)

# rows-per-key multiplicity above which a join key is flagged: either
# the key is low-cardinality (every probe row fans out) or a few hot
# keys dominate — both are what salting / AQE skew-join exist for
_SKEW_MULTIPLICITY = 16.0


class _SchemaShim:
    """Adapts a logged logical schema (list of field dicts) to the
    ``schema.fields[i].dataType.typeName()`` shape _est_row_bytes
    consumes, without needing a live SparkSession."""

    class _F:
        def __init__(self, type_json) -> None:
            self._t = type_json

        @property
        def dataType(self):
            return self

        def typeName(self) -> str:
            t = self._t
            if isinstance(t, str):
                # "decimal(18,2)" -> "decimal"; simple names pass through
                return t.split("(", 1)[0]
            return str((t or {}).get("type", "struct"))

    def __init__(self, logged: list[dict]) -> None:
        self.fields = [
            self._F(s["type"]) for s in logged if not s.get("dropped")
        ]


def join_size_advisor(
    tables: "dict[str, TxnTable]",
    join_keys: "dict[str, str] | None" = None,
    threshold: "int | str" = "10mb",
) -> list[dict]:
    """Advise a join strategy per table from commit-log metadata alone.

    ``tables`` maps a display name to its TxnTable; ``join_keys``
    optionally maps the same names to the column each table joins on;
    ``threshold`` is the broadcast cutoff (Spark byte-string or bytes —
    pass the session's ``spark.sql.autoBroadcastJoinThreshold`` to
    mirror it; non-positive disables broadcasts, Spark's ``-1`` rule).

    Returns one dict per table, input order::

        {"table", "rows", "row_bytes", "est_bytes", "broadcast",
         "key", "key_ndv", "rows_per_key", "skewed", "reason",
         ["max_rows_per_key", "salt_factor"]}

    ``broadcast`` is True/False when fresh ANALYZE evidence decides it,
    None when the table needs an ANALYZE first (``reason`` says so —
    the advisor never runs a job to find out). ``skewed`` flags
    rows/NDV multiplicity above 16 on the join key; when the newest
    ANALYZE carries equi-height buckets for the key, the worst
    bucket's count/NDV gives ``max_rows_per_key`` (the hot-key
    multiplicity a global average hides) and a concrete
    ``salt_factor`` recommendation (power of two, capped at 64).
    """
    limit = threshold if isinstance(threshold, int) else _size_bytes(threshold)
    out: list[dict] = []
    for name, t in tables.items():
        rows = t.analyzed_rows()
        width = _est_row_bytes(_SchemaShim(t.table_schema()))
        rec: dict = {
            "table": name,
            "rows": rows,
            "row_bytes": width,
            "est_bytes": None if rows is None else rows * width,
            "broadcast": None,
            "key": None,
            "key_ndv": None,
            "rows_per_key": None,
            "skewed": None,
            "reason": "",
        }
        if limit <= 0:
            rec["broadcast"] = False
            rec["reason"] = "broadcast disabled by threshold"
        elif rows is None:
            rec["reason"] = (
                "no fresh ANALYZE at this version — run analyze() for a "
                "zero-job verdict"
            )
        else:
            rec["broadcast"] = rec["est_bytes"] <= limit
            rec["reason"] = (
                f"~{rec['est_bytes']} bytes "
                f"{'<=' if rec['broadcast'] else '>'} {limit} threshold"
            )
        key = (join_keys or {}).get(name)
        if key is not None:
            cs = t.column_stats()
            col = (cs.get("columns") or {}).get(key)
            if col is None:
                rec["key"] = key
                rec["reason"] += (
                    f"; key '{key}' not covered by the newest ANALYZE"
                )
            else:
                ndv = max(int(col["distinct_count"]), 1)
                nn = (
                    (cs.get("rows") or 0) - int(col.get("num_nulls", 0))
                )
                rec.update(
                    key=key,
                    key_ndv=ndv,
                    rows_per_key=round(nn / ndv, 2),
                    skewed=nn / ndv > _SKEW_MULTIPLICITY,
                )
                # equi-height tier (VERDICT r11 task 6): per-bucket
                # count/NDV exposes the WORST key's multiplicity, which
                # a global rows/NDV average hides — a table with one
                # hot key among a million uniform ones reads as flat on
                # the average but its hot bucket (uniform count per
                # bucket, tiny NDV) screams. The salting factor the
                # verdict recommends comes from that worst bucket, not
                # the flat 16x flag.
                eh = (col.get("histogram_eh") or {}).get("buckets")
                if eh:
                    # a hot key hot enough to matter SPANS buckets
                    # (equi-height splits it into consecutive point
                    # buckets, lo == hi == the value), so its true
                    # count is the sum across them — per-bucket
                    # count/ndv alone would divide the hot key by the
                    # number of buckets it fills
                    point_tot: dict = {}
                    for b in eh:
                        if b["lo"] == b["hi"]:
                            point_tot[b["lo"]] = (
                                point_tot.get(b["lo"], 0) + b["count"]
                            )
                    max_mult = max(
                        max(point_tot.values(), default=0.0),
                        max(
                            b["count"] / max(int(b.get("ndv", 1)), 1)
                            for b in eh
                        ),
                    )
                    rec["max_rows_per_key"] = round(max_mult, 2)
                    if max_mult > _SKEW_MULTIPLICITY:
                        rec["skewed"] = True
                        # smallest power of two bringing the hot key's
                        # per-salt share under the multiplicity bar,
                        # capped: salting beyond the shuffle parallelism
                        # only multiplies the build side for nothing
                        f = 2
                        while (
                            f < 64
                            and max_mult / f > _SKEW_MULTIPLICITY
                        ):
                            f *= 2
                        rec["salt_factor"] = f
                        rec["reason"] += (
                            f"; hot bucket averages {max_mult:.0f} "
                            f"rows/value (equi-height) — salt by "
                            f"{f} or rely on AQE skew-join"
                        )
                if rec["skewed"] and "salt" not in rec["reason"]:
                    rec["reason"] += (
                        f"; key '{key}' averages {nn / ndv:.0f} rows/value"
                        " — salt it or rely on AQE skew-join"
                    )
        out.append(rec)
    return out


def estimate_range_rows(
    table: TxnTable,
    col: str,
    lo=None,
    hi=None,
    at_version: "int | None" = None,
) -> "dict | None":
    """CBO-style range-cardinality estimate for ``col BETWEEN lo AND
    hi`` (either bound None = open) from the committed ANALYZE payload
    alone — zero Spark jobs, commit-log JSON only. This is what the
    equi-height histogram tier exists FOR: Spark's own CBO consumes
    equi-height bins for exactly this arithmetic.

    Tiers, best evidence first:
      1. equi-height buckets (``histogram_eh``): fully-covered buckets
         count whole, edge buckets interpolate linearly within [bucket
         lo, bucket hi] — the standard CBO assumption;
      2. equi-width counts (``histogram``): same arithmetic over the
         derived bucket bounds;
      3. min/max only: uniform interpolation over the column range.

    Returns ``{"rows": float, "selectivity": float, "tier": str,
    "analyzed_rows": int}`` or None when the column was never analyzed
    (the honest answer — never guesses without evidence). Estimates
    are advisory: committed counts are exact per bucket, interpolation
    inside a bucket is the uniform assumption."""
    cs = table.column_stats(at_version)
    st = (cs.get("columns") or {}).get(col)
    if not st or st.get("min") is None:
        return None
    n_rows = (cs.get("rows") or 0) - int(st.get("num_nulls", 0))

    def _f(x):
        return float(x) if x is not None else None

    lo_f, hi_f = _f(lo), _f(hi)

    def overlap(b_lo: float, b_hi: float, count: int) -> float:
        """Rows of a [b_lo, b_hi] bucket falling inside the query range,
        linear interpolation (point buckets count all-or-nothing)."""
        q_lo = b_lo if lo_f is None else max(b_lo, lo_f)
        q_hi = b_hi if hi_f is None else min(b_hi, hi_f)
        if q_lo > q_hi:
            return 0.0
        if b_hi == b_lo:
            return float(count)
        return count * (q_hi - q_lo) / (b_hi - b_lo)

    eh = st.get("histogram_eh")
    h = st.get("histogram")
    # only reconstruct equi-width bounds with the SAME formula that
    # binned the counts — the payload's formula marker (ADVICE r11).
    # Unmarked payloads (committed by pre-marker code) fall through to
    # the min/max tier rather than risk misbinned estimates.
    h_formula = (h or {}).get("formula")
    if eh:
        est = sum(
            overlap(float(b["lo"]), float(b["hi"]), b["count"])
            for b in eh["buckets"]
        )
        tier = "equi_height"
    elif h and h_formula == "int_width_first":
        cmin, cmax = float(st["min"]), float(st["max"])
        # width-first integer bounds (txn.analyze): w = (hi-lo) div
        # bins + 1; bucket b covers [lo + b*w, lo + (b+1)*w - 1]
        w = (int(st["max"]) - int(st["min"])) // h["bins"] + 1
        est = sum(
            overlap(cmin + b * w, min(cmin + (b + 1) * w - 1, cmax), c)
            for b, c in enumerate(h["counts"])
        )
        tier = "equi_width"
    elif h and h_formula == "float_floor":
        cmin, cmax = float(st["min"]), float(st["max"])
        # float-floor bounds (txn.analyze fractional tier): w =
        # (hi-lo)/bins; bucket b covers [lo + b*w, lo + (b+1)*w), the
        # last bucket clamped to cmax (the analyze expr's `least`)
        w = (cmax - cmin) / h["bins"] or 1.0
        est = sum(
            overlap(cmin + b * w, cmax if b == h["bins"] - 1 else cmin + (b + 1) * w, c)
            for b, c in enumerate(h["counts"])
        )
        tier = "equi_width"
    else:
        est = overlap(float(st["min"]), float(st["max"]), n_rows)
        tier = "min_max_uniform"
    return {
        "rows": est,
        "selectivity": est / n_rows if n_rows else 0.0,
        "tier": tier,
        "analyzed_rows": n_rows,
    }
