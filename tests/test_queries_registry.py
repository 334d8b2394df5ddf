"""Contract tests for the __spark_entry__ driver interface."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_registry_nonempty():
    qs = entrymod.queries()
    assert len(qs) >= 25
    oracles = entrymod.oracle_sql()
    # every oracle key must have a query
    assert set(oracles) <= set(qs)
    # most queries should be oracle-checked
    assert len(oracles) >= len(qs) * 0.75


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"Date", "Revenue", "Mean Revenue"}


def test_all_queries_return_schema(spark, sf_dir):
    """Every registered query must build a valid plan (schema resolves
    without execution)."""
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.schema is not None, name
        assert len(df.columns) > 0, name
