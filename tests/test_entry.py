"""Driver-contract smoke tests: entry(), queries(), oracle_sql()."""

from __future__ import annotations

import importlib


def _entry_mod():
    return importlib.import_module("__spark_entry__")


def test_entry_returns_rows(spark):
    df = _entry_mod().entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_queries_and_oracles_consistent():
    m = _entry_mod()
    qs, osql = m.queries(), m.oracle_sql()
    assert qs, "no queries registered"
    # every oracle key must have a spark twin
    assert set(osql) <= set(qs)


def test_all_queries_run_at_smallest_sf(spark, sf_dir):
    m = _entry_mod()
    for name, fn in m.queries().items():
        df = fn(spark, sf_dir)
        # schema resolves and the plan executes
        assert df.columns, name
        df.limit(5).collect()
