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
         "key", "key_ndv", "rows_per_key", "skewed", "reason"}

    ``broadcast`` is True/False when fresh ANALYZE evidence decides it,
    None when the table needs an ANALYZE first (``reason`` says so —
    the advisor never runs a job to find out). ``skewed`` flags
    rows/NDV multiplicity above 16 on the join key.
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
                if rec["skewed"]:
                    rec["reason"] += (
                        f"; key '{key}' averages {nn / ndv:.0f} rows/value"
                        " — salt it or rely on AQE skew-join"
                    )
        out.append(rec)
    return out
