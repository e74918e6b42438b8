"""Property-based differential for the two-level NAMESPACE arms
(round 15, VERDICT r14 #1 — the test class that found a real
silent-corruption bug on its first run in round 14).

hypothesis composes random statement sequences mixing CREATE/DROP
SCHEMA (RESTRICT/CASCADE), USE, qualified CTAS/INSERT/UPDATE/DELETE/
MERGE, qualified CREATE/DROP VIEW, and cross-schema reads; the same
sequence runs through ``dialect.sql`` against Spark and natively in
DuckDB (its schemas + USE are an independent implementation of the
same model).  Final state of every live table and view must match
exactly; views whose base table was dropped must be BROKEN on both
engines (lazy dependents — the documented Trino-style semantics for
qualified views).

The generator is MODEL-DRIVEN, mirroring the engine's documented
refusal rules: CREATE SCHEMA refuses on an existing schema, DROP
SCHEMA RESTRICT refuses while the schema holds any object, qualified
writes into a missing schema refuse, and the current schema is never
dropped (both engines would be left pointing at nothing).  When the
model expects a refusal, the engine must raise and DuckDB skips the
statement, keeping the two in step.  MERGE (absent in DuckDB) is
mirrored as its effect: UPDATE-the-match plus INSERT-if-absent.

Names never collide across namespaces (flat seed `pnf`, schema
tables t<i>, views v<i>), so the documented flat-vs-current-schema
resolution-order divergence (USE handler docstring) is out of scope
here; it is pinned by the targeted lifecycle tests in test_dml.py.
"""

from __future__ import annotations

import duckdb
import pytest

try:
    from hypothesis import given, settings, strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)

from sparketl import dialect, dml

_POOL = ["ps1", "ps2", "ps3"]

SEED = (
    "create table pnf as select * from (values "
    "(1, 'a', cast(10.25 as double)), (2, 'b', 20.5), (3, 'a', 30.0), "
    "(4, cast(null as varchar), 40.75), (5, 'c', 50.25)"
    ") as t(k, g, v)"
)


@st.composite
def ns_sequence(draw):
    """A list of (spark_stmt, [duck_stmts], expect_refusal) triples
    valid against a model of schemas/tables/views/current-schema."""
    schemas: dict[str, dict] = {}
    broken: set[str] = set()  # qualified views whose base is gone
    cur = "default"
    seq_n = iter(range(1, 100))  # 0 is the seeded ps1.t0
    out = []
    # tables widened by ALTER ADD COLUMN: bare positional INSERT VALUES
    # no longer matches their arity (both engines refuse it), so the
    # insert arm must switch to an explicit (k, g, v) column list
    widened = set()

    def live_tables():
        return sorted(
            f"{s}.{t}" for s, d in schemas.items() for t in d["tables"]
        )

    def live_views():
        return sorted(
            f"{s}.{v}" for s, d in schemas.items() for v in d["views"]
        )

    # seed prefix: the interesting arms all need a schema and a table,
    # so every sequence starts with one of each (plus, half the time, a
    # second schema for cross-schema shapes)
    schemas["ps1"] = {"tables": {"t0"}, "views": {}}
    out.append(("create schema ps1", ["create schema ps1"], False))
    out.append(
        (
            "create table ps1.t0 as select k, g, v from pnf",
            ["create table ps1.t0 as select k, g, v from pnf"],
            False,
        )
    )
    if draw(st.booleans()):
        schemas["ps2"] = {"tables": set(), "views": {}}
        out.append(("create schema ps2", ["create schema ps2"], False))

    for _ in range(draw(st.integers(6, 14))):
        kind = draw(
            st.sampled_from(
                ["create_schema", "drop_restrict", "drop_cascade", "use",
                 "ctas", "ctas", "insert", "update", "delete", "merge",
                 "merge", "view", "view", "drop_view", "drop_table",
                 "alter_add", "alter_rename"]
            )
        )
        if kind == "create_schema":
            s = draw(st.sampled_from(_POOL))
            if s in schemas:
                out.append((f"create schema {s}", [], True))
            else:
                schemas[s] = {"tables": set(), "views": {}}
                out.append((f"create schema {s}", [f"create schema {s}"], False))
        elif kind == "drop_restrict":
            cand = sorted(x for x in schemas if x != cur)
            if not cand:
                continue
            s = draw(st.sampled_from(cand))
            if schemas[s]["tables"] or schemas[s]["views"]:
                out.append((f"drop schema {s} restrict", [], True))
            else:
                del schemas[s]
                out.append(
                    (f"drop schema {s} restrict", [f"drop schema {s}"], False)
                )
        elif kind == "drop_cascade":
            cand = sorted(x for x in schemas if x != cur)
            if not cand:
                continue
            s = draw(st.sampled_from(cand))
            gone = {f"{s}.{t}" for t in schemas[s]["tables"]}
            del schemas[s]
            broken = {b for b in broken if not b.startswith(f"{s}.")}
            for s2, d in schemas.items():
                for v, base in d["views"].items():
                    if base in gone:
                        broken.add(f"{s2}.{v}")
            out.append(
                (f"drop schema {s} cascade", [f"drop schema {s} cascade"], False)
            )
        elif kind == "use":
            s = draw(st.sampled_from(sorted(schemas) + ["default"]))
            cur = s
            out.append(
                (f"use {s}", [f"use {'main' if s == 'default' else s}"], False)
            )
        elif kind == "ctas":
            missing = (
                draw(st.integers(0, 4)) == 0 and len(schemas) < len(_POOL)
            )
            t = f"t{next(seq_n)}"
            n = draw(st.integers(2, 5))
            if missing:
                s = sorted(set(_POOL) - set(schemas))[0]
                out.append(
                    (f"create table {s}.{t} as select * from pnf", [], True)
                )
                continue
            if not schemas:
                continue
            s = draw(st.sampled_from(sorted(schemas)))
            stmt = (
                f"create table {s}.{t} as "
                f"select k, g, v from pnf where k <= {n}"
            )
            schemas[s]["tables"].add(t)
            out.append((stmt, [stmt], False))
        elif kind in ("insert", "update", "delete", "merge"):
            tabs = live_tables()
            if not tabs:
                continue
            qt = draw(st.sampled_from(tabs))
            if kind == "insert":
                k = draw(st.integers(10, 99))
                c = draw(st.sampled_from(["7.25", "8.5", "9.75"]))
                cols = " (k, g, v)" if qt in widened else ""
                stmt = (
                    f"insert into {qt}{cols} values "
                    f"({k}, 'i{k}', cast({c} as double))"
                )
                out.append((stmt, [stmt], False))
            elif kind == "update":
                m, r = draw(st.integers(2, 4)), draw(st.integers(0, 1))
                c = draw(st.sampled_from(["1.25", "2.5", "3.75"]))
                stmt = (
                    f"update {qt} set v = cast({c} as double) "
                    f"where k % {m} = {r}"
                )
                out.append((stmt, [stmt], False))
            elif kind == "delete":
                n = draw(st.integers(3, 60))
                stmt = f"delete from {qt} where k > {n}"
                out.append((stmt, [stmt], False))
            else:
                K = draw(st.integers(1, 12))
                c = draw(st.sampled_from(["4.25", "5.5", "6.75"]))
                spark_stmt = (
                    f"merge into {qt} t using (select {K} as mk, "
                    f"cast({c} as double) as mv) m on t.k = mk "
                    "when matched then update set v = mv "
                    "when not matched then insert (k, g, v) "
                    "values (mk, 'mg', mv)"
                )
                duck_stmts = [
                    f"update {qt} set v = cast({c} as double) where k = {K}",
                    (
                        # column list matches the MERGE INSERT's: columns
                        # added later by ALTER must default to NULL on
                        # both engines (without it DuckDB binds the 3
                        # values positionally and errors after ADD COLUMN)
                        f"insert into {qt} (k, g, v) select {K}, 'mg', "
                        f"cast({c} as double) where not exists "
                        f"(select 1 from {qt} where k = {K})"
                    ),
                ]
                out.append((spark_stmt, duck_stmts, False))
        elif kind == "view":
            tabs = [t for t in live_tables()]
            if not tabs or not schemas:
                continue
            sv = draw(st.sampled_from(sorted(schemas)))
            base = draw(st.sampled_from(tabs))
            v = f"v{next(seq_n)}"
            n = draw(st.integers(3, 9))
            stmt = (
                f"create view {sv}.{v} as "
                f"select k, v as w from {base} where k < {n}"
            )
            schemas[sv]["views"][v] = base
            out.append((stmt, [stmt], False))
        elif kind == "drop_view":
            views = live_views()
            if not views:
                continue
            qv = draw(st.sampled_from(views))
            s, v = qv.split(".")
            del schemas[s]["views"][v]
            broken.discard(qv)
            out.append((f"drop view {qv}", [f"drop view {qv}"], False))
        elif kind == "alter_add":
            # qualified ALTER ADD COLUMN, fresh name each time (the
            # resurrect guard is flat-ALTER territory — property_ddl)
            tabs = live_tables()
            if not tabs:
                continue
            qt = draw(st.sampled_from(tabs))
            c = f"c{next(seq_n)}"
            typ = draw(st.sampled_from(["bigint", "varchar", "double"]))
            stmt = f"alter table {qt} add column {c} {typ}"
            widened.add(qt)
            out.append((stmt, [stmt], False))
        elif kind == "alter_rename":
            # qualified RENAME within the same schema: the engine
            # spells the target qualified; DuckDB wants it BARE (the
            # target stays in the table's schema) — refuse renaming a
            # view BASE (the engine's dependent-view guard) by only
            # renaming tables no view references
            tabs = live_tables()
            based = {base for s2, d in schemas.items() for base in d["views"].values()}
            cand = [t for t in tabs if t not in based]
            if not cand:
                continue
            qt = draw(st.sampled_from(cand))
            s, t = qt.split(".")
            new_t = f"t{next(seq_n)}"
            schemas[s]["tables"].discard(t)
            schemas[s]["tables"].add(new_t)
            if qt in widened:
                widened.discard(qt)
                widened.add(f"{s}.{new_t}")
            out.append(
                (
                    f"alter table {qt} rename to {s}.{new_t}",
                    [f"alter table {qt} rename to {new_t}"],
                    False,
                )
            )
        elif kind == "drop_table":
            tabs = live_tables()
            if not tabs:
                continue
            qt = draw(st.sampled_from(tabs))
            s, t = qt.split(".")
            schemas[s]["tables"].discard(t)
            widened.discard(qt)
            for s2, d in schemas.items():
                for v, base in d["views"].items():
                    if base == qt:
                        broken.add(f"{s2}.{v}")
            out.append((f"drop table {qt}", [f"drop table {qt}"], False))
    if cur != "default":
        out.append(("use default", ["use main"], False))
    return out, schemas, broken


@settings(max_examples=10, deadline=None, derandomize=True)
@given(seq=ns_sequence())
def test_namespace_sequence_matches_duckdb(spark, tmp_path_factory, seq):
    stmts, schemas, broken = seq
    dml.set_base_dir(
        spark, str(tmp_path_factory.mktemp("prop_ns") / "wh")
    )
    dialect.sql(spark, "use default")
    for s in _POOL:
        dialect.sql(spark, f"drop schema if exists {s} cascade")
    dialect.sql(spark, "drop table if exists pnf")
    dialect.sql(spark, SEED)
    con = duckdb.connect()
    con.sql(SEED.replace(") as t(", ") t("))
    try:
        for spark_stmt, duck_stmts, expect_refusal in stmts:
            if expect_refusal:
                with pytest.raises(ValueError):
                    dialect.sql(spark, spark_stmt)
                continue
            dialect.sql(spark, spark_stmt)
            for d in duck_stmts:
                con.sql(d)
        # every live table matches in columns and full contents
        for s, d in sorted(schemas.items()):
            for t in sorted(d["tables"]):
                sdf = dialect.sql(spark, f"select * from {s}.{t}")
                got = sorted(tuple(r) for r in sdf.collect())
                duck = con.sql(f"select * from {s}.{t}")
                want = sorted(tuple(r) for r in duck.fetchall())
                assert [c.lower() for c in sdf.columns] == [
                    x[0].lower() for x in duck.description
                ], (s, t, stmts)
                assert got == want, (s, t, stmts)
            for v, base in sorted(d["views"].items()):
                if f"{s}.{v}" in broken:
                    # lazy dependents: the base is gone, so the view
                    # must error at read on BOTH engines
                    with pytest.raises(Exception):
                        dialect.sql(spark, f"select * from {s}.{v}").collect()
                    with pytest.raises(Exception):
                        con.sql(f"select * from {s}.{v}").fetchall()
                    continue
                gv = sorted(
                    tuple(r)
                    for r in dialect.sql(
                        spark, f"select * from {s}.{v}"
                    ).collect()
                )
                wv = sorted(
                    tuple(r)
                    for r in con.sql(f"select * from {s}.{v}").fetchall()
                )
                assert gv == wv, (s, v, stmts)
        # SHOW SCHEMAS agrees with the model over this test's own
        # namespace pool (other suite members legitimately hold their
        # schemas live — e.g. the sql_schema_namespace face's result
        # frame reads from its schemas, so it cannot drop them)
        got_schemas = {
            r[0] for r in dialect.sql(spark, "show schemas").collect()
        }
        assert got_schemas & set(_POOL) == set(schemas), stmts
        assert "default" in got_schemas, stmts
    finally:
        con.close()
        dialect.sql(spark, "use default")
        for s in _POOL:
            dialect.sql(spark, f"drop schema if exists {s} cascade")
        dialect.sql(spark, "drop table if exists pnf")
