"""Structured Streaming runner tests (SURVEY.md §2.10 streaming half).

The batch event-time queries are the graded face; these tests prove
the SAME transformations execute under readStream — tumbling window
with watermark, streaming dedup, and the custom-stateful #133 path
(applyInPandasWithState) against its batch applyInPandas twin.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sparketl.streaming.runner import (
    read_events_stream,
    run_available_now,
    sessionize_pandas,
    stage_events_dir,
    stateful_sessions_stream,
)
from sparketl.tables import table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    scratch = tmp_path_factory.mktemp("stream")
    return stage_events_dir(SF_DIR, str(scratch))


def test_tumbling_window_stream_equals_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("w"), "event_type", "n")
    )
    got = {
        (r.w, r.event_type): r.n
        for r in run_available_now(agg, output_mode="complete").collect()
    }
    ev = table(spark, SF_DIR, "events")
    want = {
        (r.w, r.event_type): r.n
        for r in ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("w"), "event_type", "n")
        .collect()
    }
    assert got == want and len(got) > 0


def test_streaming_dedup(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    dedup = stream.withWatermark("ts", "10 minutes").dropDuplicates(["event_id"])
    got = run_available_now(dedup, output_mode="append").count()
    want = table(spark, SF_DIR, "events").dropDuplicates(["event_id"]).count()
    assert got == want > 0


def test_stateful_sessions_stream_matches_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    got = run_available_now(
        stateful_sessions_stream(stream), output_mode="append"
    )
    ev = table(spark, SF_DIR, "events")
    want = (
        ev.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandas(
            lambda pdf: sessionize_pandas(pdf), schema=got.schema
        )
    )
    got_rows = {tuple(r) for r in got.collect()}
    want_rows = {tuple(r) for r in want.collect()}
    assert got_rows == want_rows and len(got_rows) > 0


def test_sliding_window_stream_equals_batch(spark, events_dir):
    from sparketl.streaming.runner import read_events_stream

    stream = read_events_stream(spark, events_dir)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("w"), "n")
    )
    got = {
        (r.w, r.n) for r in run_available_now(agg, output_mode="complete").collect()
    }
    ev = table(spark, SF_DIR, "events")
    want = {
        (r.w, r.n)
        for r in ev.groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("w"), "n")
        .collect()
    }
    assert got == want and len(got) > 0


def test_transform_with_state_running_totals(spark, events_dir):
    """#133 via the Spark 4.x StatefulProcessor API: final per-key
    running totals equal the batch aggregation."""
    from sparketl.streaming.runner import (
        HAS_TRANSFORM_WITH_STATE,
        read_events_stream,
        running_totals_stream,
    )

    if not HAS_TRANSFORM_WITH_STATE:
        pytest.skip("transformWithStateInPandas unavailable")
    stream = read_events_stream(spark, events_dir)
    out = run_available_now(
        running_totals_stream(stream), output_mode="update"
    )
    # last update per key == final running total
    got = {
        r.event_type: (r.n, r.cents)
        for r in out.orderBy("n").collect()  # later updates have larger n
    }
    ev = table(spark, SF_DIR, "events")
    want = {
        r.event_type: (r.n, r.cents)
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
        )
        .collect()
    }
    assert got == want and len(got) > 0
