"""funnel_conversion Spark/oracle equivalence under NULL-bearing
events (optimization round 16, VERDICT r15 "what's wrong" #2 / next
#8): the r15 Spark plan filters ``user_id IS NOT NULL`` into the
shared stage base (the exchange-reuse alignment), and the oracle CTEs
now carry the same filter — this test pins the pair's equivalence on a
corpus that actually CONTAINS NULL user_ids, which the shipped
fixtures never do (FIXTURES.md events contract)."""

from __future__ import annotations

import contextlib
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sparketl import registry
from sparketl.oracle import compare_one, duckdb_connect
from sparketl.tables import TABLE_NAMES
from tests.conftest import SF_SMOKE_DIR


@pytest.fixture(scope="module")
def null_user_dir(tmp_path_factory):
    src = pq.read_table(f"{SF_SMOKE_DIR}/events.parquet")
    d = tmp_path_factory.mktemp("nulluser")
    # append NULL-user rows in every funnel stage (view/click/purchase)
    # plus one user whose ts is NULL on the view stage — the exact
    # shapes the r15 advice flagged as oracle-divergence risks
    cols = {name: src.column(name).to_pylist() for name in src.column_names}
    base_id = max(cols["event_id"]) + 1
    ts0 = next(t for t in cols["ts"] if t is not None)
    extra = [
        (base_id + 0, ts0, None, "view", 1.0, "{}"),
        (base_id + 1, ts0, None, "click", 1.0, "{}"),
        (base_id + 2, ts0, None, "purchase", 1.0, "{}"),
        (base_id + 3, None, 999_999, "view", 1.0, "{}"),
    ]
    for i, name in enumerate(src.column_names):
        cols[name] = cols[name] + [e[i] for e in extra]
    pq.write_table(
        pa.table(
            {n: pa.array(cols[n], type=src.schema.field(n).type)
             for n in src.column_names}
        ),
        d / "events.parquet",
    )
    for name in TABLE_NAMES:
        if name != "events":
            os.symlink(
                f"{SF_SMOKE_DIR}/{name}.parquet", d / f"{name}.parquet"
            )
    return str(d)


def test_funnel_conversion_matches_oracle_with_null_users(
    spark, null_user_dir
):
    df = registry.QUERIES["funnel_conversion"](spark, null_user_dir)
    with contextlib.closing(duckdb_connect(null_user_dir)) as con:
        res = compare_one(
            "funnel_conversion", df, con,
            registry.ORACLES["funnel_conversion"],
        )
    assert res.ok, str(res)
