"""Property-based differential for the DDL/ALTER statement arms
(round 14, VERDICT r13 #4): hypothesis composes random sequences
mixing ALTER TABLE (ADD/DROP/RENAME COLUMN, RENAME TO) with CREATE OR
REPLACE VIEW and row DML, and the SAME statement text runs through
``dialect.sql`` against Spark and natively in DuckDB; final table
state, column names, and the live view's contents must match exactly.
A SHOW CREATE TABLE round-trip closes each sequence: the emitted DDL
is fed back through the front door under a fresh name and must
reproduce the column layout.

The generator is MODEL-DRIVEN: a tiny python model of the engine's
documented refusal rules (the column-resurrect guard — re-adding a
name whose bytes survive in the parquet files; the dependent-view
rename guard) decides, per drawn statement, whether the engine must
REFUSE (asserted, and the statement is skipped on DuckDB too — its
column DROP physically rewrites, so the resurrect case cannot exist
there) or succeed on BOTH engines.  The model also tracks which
columns have bytes in the files: ADD COLUMN alone writes nothing,
INSERT appends a file carrying all live columns, and a matching
UPDATE/DELETE rewrites the (unpartitioned) table so previously
dropped columns' bytes are gone and the name becomes re-addable —
exactly the rule dml._alter documents.
"""

from __future__ import annotations

import duckdb
import pytest

try:
    from hypothesis import given, settings, strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)

from sparketl import dialect, dml

SEED = (
    "create table prop_d as select * from (values "
    "(1, 'a', cast(10.25 as double)), (2, 'b', 20.5), (3, 'a', 30.0), "
    "(4, cast(null as varchar), 40.75), (5, 'c', 50.25)"
    ") as t(k, g, v)"
)

_CONSTS = {"bigint": "7", "varchar": "'zz'", "double": "1.25"}


@st.composite
def ddl_sequence(draw):
    """A list of (stmt, expect_engine_refusal) pairs, valid against a
    running model of live columns / file bytes / view / table name."""
    cols = {"k": "bigint", "g": "varchar", "v": "double"}
    in_files = set(cols)  # columns with bytes in some parquet file
    ks = {1, 2, 3, 4, 5}
    cur = "prop_d"
    view_live = False
    fresh = iter(["c1", "c2", "c3", "c4", "r1", "r2", "r3"])
    out = []
    for _ in range(draw(st.integers(4, 8))):
        kind = draw(
            st.sampled_from(
                ["add", "drop", "rename_col", "rename_tbl",
                 "view", "drop_view", "insert", "update", "delete"]
            )
        )
        if kind == "add":
            readd = [c for c in in_files if c not in cols and c != "k"]
            if readd and draw(st.booleans()):
                # the resurrect guard: bytes still in files → refuse
                c = draw(st.sampled_from(sorted(readd)))
                out.append(
                    (f"alter table {cur} add column {c} varchar", True)
                )
                continue
            c = next(fresh, None)
            if c is None:
                continue
            typ = draw(st.sampled_from(["bigint", "varchar", "double"]))
            cols[c] = typ
            out.append((f"alter table {cur} add column {c} {typ}", False))
        elif kind == "drop":
            cand = sorted(c for c in cols if c != "k")
            if not cand:
                continue
            c = draw(st.sampled_from(cand))
            # DROP/RENAME COLUMN carry the TABLE-level dependent-view
            # guard (any view referencing the table refuses, column
            # usage notwithstanding — found by this test's first run)
            out.append(
                (f"alter table {cur} drop column {c}", view_live)
            )
            if not view_live:
                del cols[c]
        elif kind == "rename_col":
            cand = sorted(c for c in cols if c != "k")
            new = next(fresh, None)
            if not cand or new is None:
                continue
            c = draw(st.sampled_from(cand))
            out.append(
                (f"alter table {cur} rename column {c} to {new}", view_live)
            )
            if not view_live:
                cols[new] = cols.pop(c)
                # the engine's RENAME COLUMN is a full copy-on-write
                # rewrite — afterwards the files carry exactly the live
                # columns, so EARLIER-dropped names become re-addable
                # too (another first-run falsifying example: the naive
                # model expected the resurrect guard to still fire)
                in_files = set(cols)
        elif kind == "rename_tbl":
            new = "prop_d2" if cur == "prop_d" else "prop_d"
            # dependent-view guard: refuse while the view references it
            out.append((f"alter table {cur} rename to {new}", view_live))
            if not view_live:
                cur = new
        elif kind == "view":
            n = draw(st.integers(2, 9))
            out.append(
                (
                    f"create or replace view pv as "
                    f"select k from {cur} where k < {n}",
                    False,
                )
            )
            view_live = True
        elif kind == "drop_view":
            if not view_live:
                continue
            out.append(("drop view pv", False))
            view_live = False
        elif kind == "insert":
            k = draw(st.integers(20, 60))
            if k in ks:
                continue
            ks.add(k)
            out.append((f"insert into {cur} (k) values ({k})", False))
            in_files |= set(cols)  # the appended file has every live col
        elif kind == "update":
            tgt = sorted(c for c in cols if c != "k")
            if not tgt or not ks:
                continue
            c = draw(st.sampled_from(tgt))
            out.append(
                (f"update {cur} set {c} = {_CONSTS[cols[c]]}", False)
            )
            in_files = set(cols)  # full rewrite: files = live cols
        elif kind == "delete":
            n = draw(st.integers(2, 30))
            matched = {k for k in ks if k < n}
            out.append((f"delete from {cur} where k < {n}", False))
            if matched:
                ks -= matched
                in_files = set(cols)  # full rewrite
    return out, cur, view_live


@settings(max_examples=12, deadline=None, derandomize=True)
@given(seq=ddl_sequence())
def test_ddl_sequence_matches_duckdb(spark, tmp_path_factory, seq):
    stmts, cur, view_live = seq
    dml.set_base_dir(spark, str(tmp_path_factory.mktemp("prop_ddl") / "wh"))
    for n in ("prop_d", "prop_d2", "prop_rt"):
        dialect.sql(spark, f"drop view if exists pv")
        dialect.sql(spark, f"drop table if exists {n}")
    dialect.sql(spark, SEED)
    con = duckdb.connect()
    con.sql(SEED.replace(") as t(", ") t("))
    for stmt, expect_refusal in stmts:
        if expect_refusal:
            with pytest.raises(ValueError):
                dialect.sql(spark, stmt)
            continue  # engine state unchanged; keep DuckDB in step
        dialect.sql(spark, stmt)
        con.sql(stmt)
    sdf = dialect.sql(spark, f"select * from {cur}")
    got = sorted(tuple(r) for r in sdf.collect())
    duck = con.sql(f"select * from {cur}")
    want = sorted(tuple(r) for r in duck.fetchall())
    assert [c.lower() for c in sdf.columns] == [
        d[0].lower() for d in duck.description
    ], stmts
    assert got == want, stmts
    if view_live:
        gv = sorted(
            tuple(r)
            for r in dialect.sql(spark, "select * from pv").collect()
        )
        wv = sorted(tuple(r) for r in con.sql("select * from pv").fetchall())
        assert gv == wv, stmts
    con.close()

    # SHOW CREATE TABLE round-trip: the emitted DDL replayed through
    # the front door under a fresh name must reproduce the layout
    ddl = dialect.sql(spark, f"show create table {cur}").collect()[0][0]
    ddl = "\n".join(
        ln for ln in ddl.splitlines() if not ln.lstrip().startswith("--")
    )
    replay = ddl.replace(f"CREATE TABLE {cur} ", "CREATE TABLE prop_rt ", 1)
    dialect.sql(spark, replay)
    orig = [
        (r[0].lower(), r[1])
        for r in dialect.sql(spark, f"describe {cur}").collect()
    ]
    rt = [
        (r[0].lower(), r[1])
        for r in dialect.sql(spark, "describe prop_rt").collect()
    ]
    assert rt == orig, (replay, stmts)
