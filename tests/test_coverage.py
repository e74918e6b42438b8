"""SURVEY.md §2 contract enforcement: all 160 inventory ops map to
registered queries, and the flagship + entry contract shape holds."""

from __future__ import annotations

from sparketl import registry
from sparketl.coverage import OP_COVERAGE


def test_every_inventory_op_covered():
    assert sorted(OP_COVERAGE) == list(range(1, 161))
    missing = {
        op: qs
        for op, qs in OP_COVERAGE.items()
        for q in qs
        if q not in registry.QUERIES
    }
    assert not missing, f"coverage map references unregistered queries: {missing}"


def test_oracle_coverage_is_broad():
    """rows-only checks are the weaker gate (SURVEY.md §5) — keep them
    a small, intentional set (approx/ANN/sampling-class ops only)."""
    rows_only = set(registry.QUERIES) - set(registry.ORACLES)
    assert rows_only <= {
        "math_random_seeded",
        "sample_bernoulli",
    }, f"unexpected rows-only queries: {rows_only}"
