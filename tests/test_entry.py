"""t1 smoke: the driver-contract module itself."""

from __future__ import annotations

import importlib


def test_entry_runs(spark):
    mod = importlib.import_module("__spark_entry__")
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty", "count_order"}


def test_contract_shapes():
    mod = importlib.import_module("__spark_entry__")
    qs = mod.queries()
    os_ = mod.oracle_sql()
    assert len(qs) >= 60
    assert set(os_) <= set(qs)
    # the graded metric counts hash-matching queries: keep rows-only rare
    rows_only = set(qs) - set(os_)
    assert len(rows_only) <= max(2, len(qs) // 5), sorted(rows_only)
