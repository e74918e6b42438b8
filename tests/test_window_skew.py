"""Window-skew mitigation: sessionize_chunked ≡ sessionize_plain,
including on hot-key data and across chunk boundaries (round 8 —
the windows counterpart to the join-skew measurement)."""

from __future__ import annotations

import datetime as dt
import os
import random

import pytest

from sparketl.operators.eventtime import sessionize_chunked, sessionize_plain


def _rows(df):
    return sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in df.collect()
    )


def test_boundary_glue_and_split(spark):
    base = dt.datetime(2024, 1, 1, 23, 40)
    rows = [
        # user 0: session spanning midnight (10-min gaps) — the chunk
        # split at 00:00 must be glued back
        (0, base),
        (0, base + dt.timedelta(minutes=10)),
        (0, base + dt.timedelta(minutes=30)),  # 00:10 next day
        (0, base + dt.timedelta(minutes=40)),
        # user 0: genuinely new session next day (gap 5h)
        (0, base + dt.timedelta(hours=6)),
        # user 1: one event exactly at midnight
        (1, dt.datetime(2024, 1, 2, 0, 0)),
        # user 2: boundary gap exactly > gap_min — must NOT glue
        (2, dt.datetime(2024, 1, 1, 23, 50)),
        (2, dt.datetime(2024, 1, 2, 0, 21)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = _rows(sessionize_chunked(df, gap_min=30))
    want = _rows(sessionize_plain(df, gap_min=30))
    assert got == want
    by_user = {}
    for u, *_ in got:
        by_user[u] = by_user.get(u, 0) + 1
    assert by_user == {0: 2, 1: 1, 2: 2}


def test_random_timelines_match(spark):
    rng = random.Random(8)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for u in range(20):
        t = t0 + dt.timedelta(minutes=rng.randrange(3000))
        for _ in range(rng.randrange(1, 60)):
            t += dt.timedelta(seconds=rng.randrange(1, 7200))
            rows.append((u, t))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    for chunk in ("day", "hour"):
        assert _rows(sessionize_chunked(df, 30, chunk)) == _rows(
            sessionize_plain(df, 30)
        )


@pytest.mark.skipif(
    not os.path.isdir("/root/repo/.scale/skew"),
    reason="skew corpus not generated (scripts/gen_scale_corpus.py --skew)",
)
def test_hot_key_corpus_equal(spark):
    ev = spark.read.parquet("/root/repo/.scale/skew/events.parquet").select(
        "user_id", "ts"
    )
    a = sessionize_chunked(ev, 30).agg(
        {"n_events": "sum", "*": "count"}
    ).collect()[0]
    b = sessionize_plain(ev, 30).agg(
        {"n_events": "sum", "*": "count"}
    ).collect()[0]
    assert a == b
