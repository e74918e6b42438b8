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
    yield os.path.basename(request.param), con
    con.close()


@pytest.mark.parametrize("name", sorted(registry.ORACLES))
def test_oracle_nonempty_at_every_sf(name, duck_sf):
    _, con = duck_sf
    n = con.execute(
        f"select count(*) from ({registry.ORACLES[name]}) t"
    ).fetchone()[0]
    assert n > 0, f"{name}: oracle is EMPTY — hash match would be vacuous"


# Single-row scalar aggregates ALWAYS return one row, so the row-count
# gate above is vacuously satisfiable for them (ADVICE r5): a funnel
# whose every stage count is 0 still yields its one row.  Pin a key
# count/measure column per scalar query to be non-NULL and > 0.  The
# inventory below is every oracle that returns exactly one row at
# sf0.001 (enumerated by running them; a new scalar query must be added
# here or it only gets the weaker row-count gate).
SCALAR_KEYS = {
    "agg_counts": "n_rows",
    "approx_count_distinct": "exact_nd",
    "approx_percentile": "exact_p50",
    "funnel_conversion": "n_view",
    "join_star_multiway": "revenue",
    "scan_predicate_pushdown": "n",
    "stream_stream_join": "view_id",
    "tpch_q14_promo_revenue": "promo_pct",
    "tpch_q15_top_supplier": "total_revenue",
    "tpch_q17_small_qty_order": "avg_yearly",
    "tpch_q19_disjunctive_join": "n_lines",
    "tpch_q5_local_supplier": "revenue",
    "tpch_q6_forecast": "n_lines",
}

# tpch_q19's disjunctive part/quantity filter genuinely matches nothing
# in the 6k-line sf0.001 fixture (131 lines at sf0.01, 1672 at sf0.1 —
# the SFs the driver grades at).  The empty-match aggregate at sf0.001
# still pins sum-over-empty = NULL semantics, so it is excluded rather
# than "fixed" by loosening the filter.
SCALAR_KEY_EXEMPT = {("tpch_q19_disjunctive_join", "sf0.001")}


@pytest.mark.parametrize("name", sorted(SCALAR_KEYS))
def test_scalar_oracle_key_nonzero(name, duck_sf):
    sf, con = duck_sf
    if (name, sf) in SCALAR_KEY_EXEMPT:
        pytest.skip(f"{name} documented empty-match at {sf}")
    col = SCALAR_KEYS[name]
    val = con.execute(
        f"select {col} from ({registry.ORACLES[name]}) t"
    ).fetchone()[0]
    assert val is not None and val > 0, (
        f"{name}: key column {col} = {val!r} — scalar oracle is "
        f"vacuously green at {sf}"
    )


def test_recursive_gapfill_exercises_both_paths(duck_sf):
    """sql_recursive_gapfill's contract is the FILL: planted gaps
    (March excluded) and populated months must both exist at every SF,
    else the left join is vacuously an inner join."""
    _, con = duck_sf
    z, nz = con.execute(
        "select count(*) filter (n_orders = 0), "
        "count(*) filter (n_orders > 0) from "
        f"({registry.ORACLES['sql_recursive_gapfill']}) t"
    ).fetchone()
    assert z > 0 and nz > 0
