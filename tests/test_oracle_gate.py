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


def test_duckdb_connect_pins_utc_session_zone():
    """Review r10: the oracle connection must pin TimeZone=UTC to
    match Spark's SESSION_CONFS pin — DuckDB defaults to the HOST
    zone, and tz-sensitive oracles (dt_timezone_iso's TIMESTAMPTZ →
    naive casts) would hash-diverge on a non-UTC machine.  Asserted
    directly so the full gate stays reproducible anywhere."""
    from sparketl.oracle import duckdb_connect
    from tests.conftest import SF_SMOKE_DIR

    import contextlib

    with contextlib.closing(duckdb_connect(SF_SMOKE_DIR)) as con:
        (tz,) = con.execute("select current_setting('TimeZone')").fetchone()
        assert tz == "UTC"
        # and the pinned rendering law itself, independent of host zone
        (wall,) = con.execute(
            "select strftime(timezone('Asia/Tokyo',"
            " timestamp '2024-01-01 00:00:00' at time zone 'UTC'),"
            " '%Y-%m-%d %H:%M')"
        ).fetchone()
        assert wall == "2024-01-01 09:00"
