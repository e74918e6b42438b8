"""Unit tests for the round-9 query-shape operators (SURVEY §2
#150-#152): recursion vs a Python BFS model, pivot/unpivot
consistency + round-trip, and gap-fill invariants.

The oracle gate already proves hash-equality vs DuckDB at sf0.01;
these tests pin the semantics against INDEPENDENT models (pure-Python
graph walk, melt-back identities, counting laws) so a same-bug-both-
engines translation slip can't hide.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from sparketl.functions.exact import exact_avg, exact_sum
from sparketl.registry import QUERIES
from tests.conftest import SF_SMOKE_DIR


def _customer_rows():
    con = duckdb.connect()
    rows = con.execute(
        "select c_custkey, c_acctbal from "
        f"read_parquet('{SF_SMOKE_DIR}/customer.parquet')"
    ).fetchall()
    con.close()
    return rows


def _python_closure(rows):
    """BFS over the digit-prefix forest in plain Python: key -> (root,
    depth), walking parent chains key // 10 without any SQL."""
    keys = {k for k, _ in rows}
    out = {}
    for k, _ in rows:
        chain = [k]
        while chain[-1] >= 10:
            p = chain[-1] // 10
            if p not in keys:
                break
            chain.append(p)
        if chain[-1] < 10:  # reached a root
            out[k] = (chain[-1], len(chain) - 1)
    return out


def test_recursive_hierarchy_matches_python_bfs(spark):
    rows = _customer_rows()
    model = _python_closure(rows)
    bal = dict(rows)
    expect = {}
    for k, (root, depth) in model.items():
        n, roots, s = expect.get(depth, (0, set(), 0.0))
        expect[depth] = (n + 1, roots | {root}, s + bal[k])
    got = {
        r.depth: (r.n_nodes, r.n_roots, r.bal_sum)
        for r in QUERIES["cte_recursive_hierarchy"](spark, SF_SMOKE_DIR).collect()
    }
    assert set(got) == set(expect)
    for d, (n, roots, s) in expect.items():
        gn, gr, gs = got[d]
        assert (gn, gr) == (n, len(roots))
        # exact-cents model: sum integer cents, divide once
        assert gs == pytest.approx(s, abs=1e-6)


def test_recursive_path_matches_python_chains(spark):
    rows = _customer_rows()
    model = _python_closure(rows)
    got = {
        r.custkey: (r.path, r.depth)
        for r in QUERIES["cte_recursive_path"](spark, SF_SMOKE_DIR).collect()
    }
    expect_keys = {k for k in model if k <= 200}
    assert set(got) == expect_keys
    for k in expect_keys:
        root, depth = model[k]
        chain = [k]
        while chain[-1] >= 10:
            chain.append(chain[-1] // 10)
        path = "/".join(str(x) for x in reversed(chain))
        assert got[k] == (path, depth), k


def test_pivot_melts_back_to_grouped_counts(spark):
    """Row-wise identity: melting the pivot back must reproduce the
    plain (day, type) grouped counts, including absent cells as 0."""
    wide = QUERIES["reshape_pivot"](spark, SF_SMOKE_DIR)
    melted = {}
    for r in wide.collect():
        for t in ("view", "click", "purchase", "signup", "error"):
            melted[(r.day, t)] = r[f"n_{t}"]
    ev = spark.read.parquet(f"{SF_SMOKE_DIR}/events.parquet")
    grouped = {
        (r.day, r.event_type): r.n
        for r in ev.groupBy(
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for cell, n in grouped.items():
        assert melted[cell] == n
    # every melted cell not in grouped is a zero-filled gap
    for cell, n in melted.items():
        if cell not in grouped:
            assert n == 0


def test_unpivot_round_trips_to_wide(spark):
    """unpivot(wide) pivoted back on (metric -> val) == wide."""
    long = QUERIES["reshape_unpivot"](spark, SF_SMOKE_DIR)
    back = (
        long.groupBy("c_mktsegment")
        .pivot("metric", ["n_cust", "bal_sum", "bal_avg"])
        .agg(F.first("val"))
    )
    cust = spark.read.parquet(f"{SF_SMOKE_DIR}/customer.parquet")
    wide = {
        r.c_mktsegment: (r.n_cust, r.bal_sum, r.bal_avg)
        for r in cust.groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("double").alias("n_cust"),
            exact_sum("c_acctbal").alias("bal_sum"),
            exact_avg("c_acctbal").alias("bal_avg"),
        )
        .collect()
    }
    got = {r.c_mktsegment: (r.n_cust, r.bal_sum, r.bal_avg) for r in back.collect()}
    assert got == wide


def test_gap_fill_counting_laws(spark):
    """|rows| == users x days; sum == total events; gaps exist and
    are zero."""
    out = QUERIES["ts_gap_fill"](spark, SF_SMOKE_DIR)
    ev = spark.read.parquet(f"{SF_SMOKE_DIR}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    d0, d1 = ev.agg(
        F.min(F.col("ts").cast("date")), F.max(F.col("ts").cast("date"))
    ).first()
    n_days = (d1 - d0).days + 1
    rows = out.collect()
    assert len(rows) == n_users * n_days
    assert sum(r.n_events for r in rows) == ev.count()
    assert any(r.n_events == 0 for r in rows)  # fixture has real gaps
    assert all(r.n_events >= 0 for r in rows)
