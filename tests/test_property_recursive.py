"""Property differential for WITH RECURSIVE (§2 #150): random forests
vs a pure-Python BFS model.

The declared queries recurse over the fixture's digit-prefix forest —
one fixed topology.  Here hypothesis draws arbitrary parent maps
(multiple roots, chains, wide fan-out, orphans pointing at absent
parents) into a temp view, and the SAME recursion text shape Spark
executes is checked against a Python closure: reachable set, depth,
and root assignment must agree exactly.  Orphan subtrees (parent id
absent from the table) must NOT be reached — the frontier join, not
NULL handling, decides membership.
"""

from __future__ import annotations

import pytest

try:
    from hypothesis import assume, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)


# node ids 0..24; parent either None (root) or any id (possibly absent
# from the drawn key set -> orphan chain, possibly forming a cycle —
# cycles are filtered out below because SQL:1999 recursion diverges on
# them by design and Spark's level limit would abort the query).
nodes_st = st.dictionaries(
    st.integers(0, 24),
    st.one_of(st.none(), st.integers(0, 24)),
    min_size=1,
    max_size=25,
)


def _acyclic(nodes: dict) -> bool:
    for k in nodes:
        seen = set()
        cur = k
        while cur is not None and cur in nodes:
            if cur in seen:
                return False
            seen.add(cur)
            cur = nodes[cur]
    return True


def _python_closure(nodes: dict) -> dict:
    """node -> (root, depth) for nodes whose chain ends at a root
    (parent None) without leaving the key set."""
    out = {}
    for k in nodes:
        chain = [k]
        cur = nodes[k]
        while cur is not None and cur in nodes:
            chain.append(cur)
            cur = nodes[cur]
        if cur is None:  # ended at a real root
            out[k] = (chain[-1], len(chain) - 1)
        # else: orphan chain (parent absent) -> unreachable by anchor
    return out


@settings(max_examples=20, deadline=None, derandomize=True)
@given(nodes=nodes_st)
def test_recursion_matches_python_closure(spark, nodes):
    # assume (not return): a filtered cyclic draw must not count as a
    # passing example or the effective example count silently shrinks
    assume(_acyclic(nodes))
    rows = [(k, p) for k, p in nodes.items()]
    spark.createDataFrame(rows, "node int, parent int").createOrReplaceTempView(
        "prop_forest"
    )
    collected = spark.sql(
            """
            with recursive cl(node, root, depth) as (
                select node, node, 0 from prop_forest where parent is null
                union all
                select f.node, c.root, c.depth + 1
                from prop_forest f join cl c on f.parent = c.node
            )
            select node, root, depth from cl
            """
    ).collect()
    model = _python_closure(nodes)
    # row-count check BEFORE dict-ification: a frontier-join bug that
    # emits a node twice would otherwise be collapsed and masked
    assert len(collected) == len(model)
    got = {r.node: (r.root, r.depth) for r in collected}
    assert got == model
