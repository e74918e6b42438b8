"""Differential tests for distributed_percentiles (round-8): the
bucketed order-statistics plan must agree with Spark's builtin exact
``percentile`` aggregate — including the all-NULL-group case the
round-8 review caught (the pre-filter dropped such groups where the
builtin emits them with NULL percentiles)."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from sparketl.operators.aggregates import distributed_percentiles

PS = [("p25", 0.25), ("p90", 0.90), ("med", 0.5)]


def _builtin(df):
    return df.groupBy("g").agg(
        F.round(F.expr("percentile(v, 0.25D)"), 6).alias("p25"),
        F.round(F.expr("percentile(v, 0.90D)"), 6).alias("p90"),
        F.round(F.expr("percentile(v, 0.5D)"), 6).alias("med"),
    )


def _rows(df):
    return sorted(
        (r.g, r.p25, r.p90, r.med) for r in df.collect()
    )


def test_matches_builtin_random(spark):
    rng = random.Random(8)
    data = [
        (f"g{rng.randrange(4)}", round(rng.uniform(-100, 100), 2))
        for _ in range(5000)
    ]
    df = spark.createDataFrame(data, "g string, v double")
    got = _rows(distributed_percentiles(df, "g", "v", PS, buckets=16))
    want = _rows(_builtin(df))
    assert got == want


def test_all_null_group_surfaces_with_null_percentiles(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", None), ("b", None)],
        "g string, v double",
    )
    got = _rows(distributed_percentiles(df, "g", "v", PS))
    want = _rows(_builtin(df))
    assert got == want
    assert ("b", None, None, None) in got


def test_single_value_and_duplicate_heavy_groups(spark):
    df = spark.createDataFrame(
        [("a", 5.0)] + [("b", 1.0)] * 100 + [("b", 2.0)] * 3,
        "g string, v double",
    )
    got = _rows(distributed_percentiles(df, "g", "v", PS, buckets=4))
    want = _rows(_builtin(df))
    assert got == want
    a = dict((g, (p25, p90, med)) for g, p25, p90, med in got)
    assert a["a"] == (5.0, 5.0, 5.0)
    assert not any(
        isinstance(x, float) and math.isnan(x) for t in got for x in t[1:]
    )
