"""Property-based differential for the DML statement FRONT DOOR
(round 13, VERDICT r12 #2): hypothesis composes random statement
sequences — INSERT VALUES / INSERT-SELECT / UPDATE (random assignment
lists and predicates, incl. correlated scalar subqueries) / DELETE
(random predicates incl. IN/EXISTS subqueries) — and the SAME
statement text runs through ``dialect.sql`` against Spark and natively
in DuckDB on the same seeded rows; final table states must match
exactly.  MERGE (DuckDB has no MERGE statement) is fuzzed separately
against a programmatically-constructed first-satisfied-clause CTE
oracle, the same construction the sql_merge_into face pins by hand.

The point is parser INTERACTION: the 1,900-line masked-text statement
parser has hand-written cases for each clause shape, but random
predicate/assignment/subquery nesting is exactly what caught the
ngrams lambda-capture class in the SELECT translator
(test_property_dialect).

Determinism rules for exact state compare: doubles move in multiples
of 0.25 (binary-exact), no `/` anywhere (Trino truncates int/int,
DuckDB doesn't), source keys are NOT NULL (no NOT-IN null traps), and
every aggregate threshold is order-independent (max / count / sums of
quarters).
"""

from __future__ import annotations

import duckdb
import pytest

try:
    from hypothesis import given, settings, strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)

from sparketl import dialect, dml

SEED_T = (
    "create table {t} as select * from (values "
    "(1, 'a', cast(10.25 as double)), (2, 'b', 20.5), (3, 'a', 30.0), "
    "(4, cast(null as varchar), 40.75), (5, 'c', 50.25), (6, 'b', 60.5), "
    "(7, 'a', 70.0), (8, cast(null as varchar), 80.25)"
    ") as t(k, g, v)"
)
SEED_S = (
    "create table {t} as select * from (values "
    "(1, cast(100.25 as double)), (3, 300.5), (5, 500.0), (9, 900.75), "
    "(11, 1100.25)"
    ") as t(k, w)"
)


def _seed_spark(spark, wh):
    for name in ("prop_t", "prop_src"):
        dialect.sql(spark, f"drop table if exists {name}")
    dialect.sql(spark, SEED_T.format(t="prop_t"))
    dialect.sql(spark, SEED_S.format(t="prop_src"))


def _seed_duck():
    con = duckdb.connect()
    con.sql(SEED_T.format(t="prop_t").replace(") as t(", ") t("))
    con.sql(SEED_S.format(t="prop_src").replace(") as t(", ") t("))
    return con


# --- predicate grammar over prop_t(k, g, v) ------------------------------

_PRED_ATOMS = [
    "k % {m} = {r}",
    "k < {n}",
    "k >= {n}",
    "v > {c}",
    "v <= {c}",
    "g = '{s}'",
    "g is null",
    "g is not null",
    "k in (select k from prop_src where k < {n})",
    "exists (select 1 from prop_src where prop_src.k = prop_t.k "
    "and prop_src.w > {c})",
]

_ASSIGNS = [
    ("v", "v + {step}"),
    ("v", "v * 2"),
    ("v", "-v"),
    ("v", "(select max(w) from prop_src where prop_src.k = prop_t.k)"),
    ("v", "coalesce((select max(w) from prop_src "
          "where prop_src.k = prop_t.k), v)"),
    ("g", "upper(g)"),
    ("g", "'{s}'"),
    ("k", "k + 100"),
]


@st.composite
def params(draw):
    return {
        "m": draw(st.integers(2, 4)),
        "r": draw(st.integers(0, 1)),
        "n": draw(st.integers(2, 9)),
        "c": draw(st.sampled_from([15.25, 35.5, 55.0, 75.75])),
        "s": draw(st.sampled_from(["a", "b", "z"])),
        "step": draw(st.sampled_from([0.25, 1.5, 100.0])),
    }


@st.composite
def predicate(draw):
    p = draw(params())
    n_atoms = draw(st.integers(1, 3))
    atoms = draw(
        st.lists(
            st.sampled_from(_PRED_ATOMS),
            min_size=n_atoms,
            max_size=n_atoms,
        )
    )
    parts = [a.format(**p) for a in atoms]
    out = parts[0]
    for part in parts[1:]:
        op = draw(st.sampled_from(["and", "or"]))
        out = f"({out}) {op} ({part})"
    if draw(st.booleans()):
        out = f"not ({out})"
    return out


@st.composite
def statement(draw):
    p = draw(params())
    kind = draw(st.sampled_from(["insert_values", "insert_select",
                                 "update", "delete"]))
    if kind == "insert_values":
        rows = draw(
            st.lists(
                st.tuples(
                    st.integers(20, 40),
                    st.sampled_from(["'a'", "'q'", "cast(null as varchar)"]),
                    st.sampled_from(["1.25", "2.5", "0.0"]),
                ),
                min_size=1,
                max_size=3,
            )
        )
        vals = ", ".join(f"({k}, {g}, {v})" for k, g, v in rows)
        return f"insert into prop_t values {vals}"
    if kind == "insert_select":
        return (
            f"insert into prop_t (k, v) select k + 50, w from prop_src "
            f"where k < {p['n']}"
        )
    if kind == "update":
        n_as = draw(st.integers(1, 3))
        chosen = draw(
            st.lists(
                st.sampled_from(range(len(_ASSIGNS))),
                min_size=n_as,
                max_size=n_as,
                unique_by=lambda i: _ASSIGNS[i][0],
            )
        )
        sets = ", ".join(
            f"{_ASSIGNS[i][0]} = {_ASSIGNS[i][1].format(**p)}"
            for i in chosen
        )
        stmt = f"update prop_t set {sets}"
        if draw(st.booleans()):
            stmt += f" where {draw(predicate())}"
        return stmt
    return f"delete from prop_t where {draw(predicate())}"


@settings(max_examples=15, deadline=None, derandomize=True)
@given(stmts=st.lists(statement(), min_size=2, max_size=4))
def test_dml_sequence_matches_duckdb(spark, tmp_path_factory, stmts):
    dml.set_base_dir(
        spark, str(tmp_path_factory.mktemp("prop_dml") / "wh")
    )
    _seed_spark(spark, None)
    con = _seed_duck()
    for s in stmts:
        dialect.sql(spark, s)
        con.sql(s)
    got = sorted(
        tuple(r)
        for r in dialect.sql(spark, "select * from prop_t").collect()
    )
    want = sorted(
        tuple(r) for r in con.sql("select * from prop_t").fetchall()
    )
    con.close()
    assert got == want, stmts


# --- MERGE: first-satisfied-clause CTE oracle ----------------------------

_M_CONDS = [
    None,
    "t.v < s.w",
    "s.w > {c}",
    "t.g = '{s}'",
    "t.v < (select max(w) from prop_src)",
]
_NM_CONDS = [None, "s.w > {c}", "s.k % 2 = 1"]
_M_UPD_RHS = ["t.v + s.w", "s.w", "t.v * 2"]


@st.composite
def merge_stmt(draw):
    p = draw(params())
    n_matched = draw(st.integers(1, 2))
    clauses, tags = [], []
    for i in range(n_matched):
        cond = draw(st.sampled_from(_M_CONDS))
        cond_sql = cond.format(**p) if cond else None
        head = "when matched" + (f" and {cond_sql}" if cond_sql else "")
        if draw(st.booleans()):
            clauses.append(f"{head} then delete")
            tags.append(("m", cond_sql, "delete", None))
        else:
            rhs = draw(st.sampled_from(_M_UPD_RHS))
            clauses.append(f"{head} then update set v = {rhs}")
            tags.append(("m", cond_sql, "update", rhs))
        if cond is None:
            break  # an unconditional clause shadows everything after
    nm_cond = draw(st.sampled_from(_NM_CONDS))
    nm_sql = nm_cond.format(**p) if nm_cond else None
    with_insert = draw(st.booleans())
    if with_insert:
        head = "when not matched" + (f" and {nm_sql}" if nm_sql else "")
        clauses.append(
            f"{head} then insert (k, g, v) values (s.k, 'new', s.w)"
        )
    stmt = (
        "merge into prop_t as t using prop_src as s on t.k = s.k "
        + " ".join(clauses)
    )
    return stmt, tags, (nm_sql if with_insert else False)


def _merge_oracle_sql(tags, nm):
    """The final prop_t state as ONE SELECT: tag each matched target
    row with its FIRST satisfied clause, apply that clause's action,
    append the insert branch."""
    whens, actions = [], []
    for i, (_, cond, action, rhs) in enumerate(tags):
        c = cond if cond is not None else "true"
        whens.append(f"when s.k is not null and ({c}) then 'a{i}'")
        if action == "update":
            actions.append(f"when tag = 'a{i}' then ({rhs})")
    tag_case = "case " + " ".join(whens) + " else 'keep' end"
    v_case = (
        "case " + " ".join(actions) + " else t.v end"
        if actions
        else "t.v"
    )
    drops = ", ".join(
        f"'a{i}'" for i, (_, _, a, _) in enumerate(tags) if a == "delete"
    ) or "'never'"
    insert_branch = ""
    if nm is not False:
        nm_c = nm if nm else "true"
        insert_branch = f"""
        union all
        select s.k, 'new', s.w from prop_src s
        where not exists (select 1 from prop_t t where t.k = s.k)
          and ({nm_c})
        """
    return f"""
        with tagged as (
            select t.k, t.g, t.v, s.w, {tag_case} as tag
            from prop_t t left join prop_src s on t.k = s.k
        )
        select k, g, {v_case.replace('t.v', 'v').replace('s.w', 'w')} as v
        from tagged t where tag not in ({drops})
        {insert_branch}
    """


@settings(max_examples=15, deadline=None, derandomize=True)
@given(mg=merge_stmt())
def test_merge_matches_clause_oracle(spark, tmp_path_factory, mg):
    stmt, tags, nm = mg
    dml.set_base_dir(
        spark, str(tmp_path_factory.mktemp("prop_mrg") / "wh")
    )
    _seed_spark(spark, None)
    dialect.sql(spark, stmt)
    got = sorted(
        tuple(r)
        for r in dialect.sql(spark, "select * from prop_t").collect()
    )
    con = _seed_duck()
    want = sorted(
        tuple(r) for r in con.sql(_merge_oracle_sql(tags, nm)).fetchall()
    )
    con.close()
    assert got == want, stmt
