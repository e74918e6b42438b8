"""Anti-vacuity gate (round-4 lesson, VERDICT.md r4 "What's wrong" #1):
a hash match on an EMPTY result proves nothing — set_except,
join_left_anti and join_theta_nonequi have each at some point been
vacuously green at one fixture SF.  This test pins every declared
oracle to >= 1 row at EVERY fixture scale factor, so a query whose
filters silently empty out at some SF fails loudly instead of
degrading the correctness gate to a schema check.

DuckDB-only on purpose: the oracles are the ground truth for expected
row counts, and running them alone keeps the sweep seconds-fast (no
Spark jobs); the Spark side is already row-count-compared against
these same oracles by test_oracle_gate.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from sparketl import registry

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

registry.load_all_modules()


@pytest.fixture(scope="module", params=SF_DIRS, ids=lambda d: os.path.basename(d))
def duck_sf(request):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as "
            f"select * from read_parquet('{request.param}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(registry.ORACLES))
def test_oracle_nonempty_at_every_sf(name, duck_sf):
    n = duck_sf.execute(
        f"select count(*) from ({registry.ORACLES[name]}) t"
    ).fetchone()[0]
    assert n > 0, f"{name}: oracle is EMPTY — hash match would be vacuous"
