"""Declarative (file-based) check suites: JSON config -> ``checks.py``.

Restores the reference's "edit a config file, not code" validation
workflow (reference etl/utils/base_table.py:140-196 loads Great
Expectations suite JSON from etl/great_expectations/expectations/*.json
at runtime) on top of this repo's single-pass check runner. A suite
file maps 1:1 onto the ``checks.py`` constructors:

    {
      "table": "daily_order_metrics",
      "checks": [
        {"type": "unique", "columns": ["order_date"]},
        {"type": "not_null", "columns": ["order_id", "order_date"]},
        {"type": "bounds", "column": "total_price_mean",
         "lo": 0, "hi": 100000, "strict": true},
        {"type": "row_count_min", "n": 1},
        {"type": "accepted_values", "column": "status", "values": ["O", "F"]},
        {"type": "foreign_key", "column": "o_custkey",
         "ref_table": "customer", "ref_column": "c_custkey"}
      ]
    }

``foreign_key`` needs the dimension side at validation time, so the
loader takes a ``resolve(table_name) -> DataFrame`` callable (usually a
closure over ``load_table``); resolution is deferred to check execution
so the suite file can be parsed without a SparkSession.

Unknown check types and missing fields fail at LOAD time (fail fast —
a typo'd suite must not silently validate nothing).
"""

from __future__ import annotations

import json
from collections.abc import Callable
from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame

from spark_data_engineering_spark import checks as C


class SuiteConfigError(ValueError):
    """Malformed suite config (unknown type / missing field)."""


def _build_one(
    spec: dict[str, Any],
    resolve: "Callable[[str], DataFrame] | None",
) -> C.Check:
    kind = spec.get("type")
    try:
        if kind == "unique":
            return C.unique(*spec["columns"])
        if kind == "not_null":
            return C.not_null(*spec["columns"])
        if kind == "bounds":
            return C.bounds(
                spec["column"],
                lo=spec.get("lo"),
                hi=spec.get("hi"),
                strict=bool(spec.get("strict", True)),
            )
        if kind == "row_count_min":
            return C.row_count_min(int(spec["n"]))
        if kind == "accepted_values":
            return C.accepted_values(spec["column"], tuple(spec["values"]))
        if kind == "foreign_key":
            if resolve is None:
                raise SuiteConfigError(
                    "foreign_key check requires a resolve(table) callable"
                )
            ref_table, ref_column = spec["ref_table"], spec["ref_column"]
            # defer resolution to validation time (checks.foreign_key
            # accepts a zero-arg callable for exactly this)
            return C.foreign_key(
                spec["column"], lambda: resolve(ref_table), ref_column
            )
    except KeyError as e:
        raise SuiteConfigError(f"check {spec!r}: missing field {e}") from e
    raise SuiteConfigError(f"unknown check type {kind!r} in {spec!r}")


def load_suite(
    source: "str | Path | dict[str, Any]",
    resolve: "Callable[[str], DataFrame] | None" = None,
) -> tuple[C.Check, ...]:
    """Parse a suite (path to JSON, or an already-parsed dict) into the
    Check tuple the runner/DAG consumes. Raises SuiteConfigError on any
    malformed entry."""
    if isinstance(source, (str, Path)):
        with open(source) as f:
            cfg = json.load(f)
    else:
        cfg = source
    specs = cfg.get("checks")
    if not isinstance(specs, list) or not specs:
        raise SuiteConfigError("suite must declare a non-empty 'checks' list")
    return tuple(_build_one(spec, resolve) for spec in specs)


def validate_with_suite(
    df: DataFrame,
    source: "str | Path | dict[str, Any]",
    resolve: "Callable[[str], DataFrame] | None" = None,
) -> None:
    """Load a suite and gate ``df`` on it: raises ``checks.CheckError``
    with every failure message if any check fails (the write-blocking
    gate, same contract as the in-code DAG validation)."""
    failures = C.run_checks(df, load_suite(source, resolve))
    if failures:
        raise C.CheckError("; ".join(failures))
