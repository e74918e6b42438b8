"""Property tests for the mergeable percentile sketch (round 11,
VERDICT r10 #8 — sparketl.operators.aggregates PCTL_GAMMA family).

The sketch is a log-bucket count histogram; merge is key-wise count
sum.  Associativity/commutativity of the merge is what makes the
qdigest WORKFLOW sound (build per-segment, recombine in any grouping or
order), so hypothesis splits a value list into chunks and checks that
every merge tree yields the SAME sketch as building one sketch over the
whole list — and that the quantile read off the merged sketch is within
the documented (gamma-1)/2 relative-error bound of a true order
statistic (plus one bucket of rank-convention slack)."""

from __future__ import annotations

import math

import pytest

try:
    from hypothesis import HealthCheck, given, settings, strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)

from pyspark.sql import functions as F

from sparketl.operators.aggregates import (
    PCTL_GAMMA,
    pctl_quantile_expr,
    pctl_sketch_merge_expr,
)

_VALS = st.lists(
    st.floats(min_value=0.1, max_value=1e6, allow_nan=False,
              allow_infinity=False),
    min_size=1,
    max_size=120,
)


def _sketch_model(vals):
    m: dict[int, int] = {}
    for v in vals:
        b = math.floor(math.log(v) / math.log(PCTL_GAMMA))
        m[b] = m.get(b, 0) + 1
    return m


def _build_sketches(spark, chunks):
    """Per-chunk sketches via the SAME two-level plan the declared
    query uses (group → bucket counts → map), returning {g: map}."""
    rows = [(g, float(v)) for g, chunk in enumerate(chunks) for v in chunk]
    df = spark.createDataFrame(rows, "g long, v double")
    bucket = F.floor(F.log("v") / math.log(PCTL_GAMMA)).cast("long")
    hist = df.groupBy("g", bucket.alias("b")).agg(F.count("*").alias("c"))
    sk = (
        hist.groupBy("g")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("b", "c")))
            ).alias("sk")
        )
    )
    return {r.g: dict(r.sk) for r in sk.collect()}


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=_VALS, cut=st.integers(min_value=0, max_value=10))
def test_merge_is_associative_and_equals_direct_build(spark, vals, cut):
    n = len(vals)
    c1, c2 = (cut * n) // 10, ((cut + 3) * n) // 10
    c1, c2 = min(c1, c2), max(c1, c2)
    chunks = [vals[:c1], vals[c1:c2], vals[c2:]]
    nonempty = [c for c in chunks if c]
    if not nonempty:
        return
    sks = _build_sketches(spark, nonempty)
    # every per-chunk sketch equals the pure-python model
    for g, chunk in enumerate(nonempty):
        assert sks[g] == _sketch_model(chunk)

    def merge(a, b):
        out = dict(a)
        for k, v in b.items():
            out[k] = out.get(k, 0) + v
        return out

    # associativity + order-independence of the model merge, and the
    # merged sketch equals one sketch built over the whole list
    maps = list(sks.values())
    left = maps[0]
    for m in maps[1:]:
        left = merge(left, m)
    right = maps[-1]
    for m in reversed(maps[:-1]):
        right = merge(m, right)
    assert left == right == _sketch_model(vals)


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=_VALS, q=st.sampled_from([0.1, 0.5, 0.9, 0.99]))
def test_spark_merge_and_quantile_within_bound(spark, vals, q):
    """The SPARK merge expression equals the model merge, and the
    quantile readout lands within the documented relative-error bound
    of the true lower order statistic at that rank."""
    n = len(vals)
    chunks = [vals[: n // 2], vals[n // 2 :]]
    nonempty = [c for c in chunks if c]
    rows = [(g, float(v)) for g, chunk in enumerate(nonempty) for v in chunk]
    df = spark.createDataFrame(rows, "g long, v double")
    bucket = F.floor(F.log("v") / math.log(PCTL_GAMMA)).cast("long")
    hist = df.groupBy("g", bucket.alias("b")).agg(F.count("*").alias("c"))
    seg = hist.groupBy("g").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("b", "c")))
        ).alias("sk")
    )
    merged = seg.agg(F.expr(pctl_sketch_merge_expr("sk")).alias("msk"))
    row = merged.select(
        F.col("msk"),
        F.expr(pctl_quantile_expr("msk", q)).alias("est"),
    ).collect()[0]
    assert dict(row.msk) == _sketch_model(vals)
    rank = max(1, math.ceil(q * n))
    true_val = sorted(vals)[rank - 1]
    # bucket-midpoint estimate: relative error <= (gamma-1)/2 of some
    # value INSIDE the chosen bucket; the chosen bucket contains the
    # rank-th value exactly (counts are exact), so the bound is tight
    assert abs(row.est - true_val) <= (PCTL_GAMMA - 1) * true_val
