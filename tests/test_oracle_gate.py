"""The t2 gate, locally: every declared query vs its DuckDB oracle at
sf0.01 — the exact comparison the driver performs (row count + schema +
order-insensitive value-hash)."""

from __future__ import annotations

import pytest

from sparketl import registry
from sparketl.oracle import compare_one
from tests.conftest import SF_DIR

ALL_QUERIES = sorted(registry.QUERIES)


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_matches_oracle(name, spark, duck):
    df = registry.QUERIES[name](spark, SF_DIR)
    res = compare_one(name, df, duck, registry.ORACLES.get(name))
    assert res.ok, str(res)
    assert res.rows_spark >= 0


def test_every_oracle_key_has_query():
    assert set(registry.ORACLES) <= set(registry.QUERIES)
