"""Unit tests for the round-9 window-navigation / rollup operators
(SURVEY §2 #154-#157): LOCF/NOCB vs a pure-Python carry model, frame
EXCLUDE vs a brute-force neighborhood loop, ngram overlap/counting
laws, and the rollup cascade's associativity law.

The oracle gate already proves hash-equality vs DuckDB at sf0.01;
these tests pin the semantics against INDEPENDENT models so a
same-bug-both-engines spelling slip can't hide.
"""

from __future__ import annotations

import duckdb

from sparketl.registry import QUERIES
from tests.conftest import SF_SMOKE_DIR


def _event_rows():
    con = duckdb.connect()
    rows = con.execute(
        "select user_id, event_id, ts, event_type, value from "
        f"read_parquet('{SF_SMOKE_DIR}/events.parquet') "
        "order by user_id, ts, event_id"
    ).fetchall()
    con.close()
    return rows


def _python_locf(rows):
    """Per user ordered by (ts, event_id): carry the last purchase
    value forward (LOCF), remember the strictly-previous observation,
    and backfill the next observation (NOCB) — plain dict walk."""
    out = {}
    by_user: dict = {}
    for u, e, ts, et, v in rows:
        by_user.setdefault(u, []).append((e, et, v))
    for u, evs in by_user.items():
        carried = None
        locf, prev = {}, {}
        for e, et, v in evs:
            prev[e] = carried
            if et == "purchase":
                carried = v
            locf[e] = carried
        nxt = None
        nocb = {}
        for e, et, v in reversed(evs):
            if et == "purchase":
                nxt = v
            nocb[e] = nxt
        for e, _, _ in evs:
            out[(u, e)] = (locf[e], prev[e], nocb[e])
    return out


def test_locf_matches_python_carry_model(spark):
    model = _python_locf(_event_rows())
    got = {
        (r.user_id, r.event_id): (r.locf_value, r.prev_obs, r.nocb_value)
        for r in QUERIES["win_locf_fill"](spark, SF_SMOKE_DIR).collect()
    }
    assert got == model


def test_locf_null_before_first_observation(spark):
    """Rows before a user's first purchase must be NULL in locf_value
    (no default, no zero) and the first purchase row must carry its
    OWN value (frame includes current row) while prev_obs excludes it."""
    rows = QUERIES["win_locf_fill"](spark, SF_SMOKE_DIR).collect()
    ev = _event_rows()
    first_purchase = {}
    for u, e, ts, et, v in ev:  # ordered
        if et == "purchase" and u not in first_purchase:
            first_purchase[u] = (e, v)
    by_key = {(r.user_id, r.event_id): r for r in rows}
    order = {}
    for u, e, ts, et, v in ev:
        order.setdefault(u, []).append(e)
    for u, (fe, fv) in first_purchase.items():
        for e in order[u]:
            r = by_key[(u, e)]
            if e == fe:
                assert r.locf_value == fv and r.prev_obs is None
                break
            assert r.locf_value is None and r.prev_obs is None


def _cents(v: float) -> int:
    """Half-away-from-zero, matching Spark F.round and DuckDB round —
    Python's built-in round() is banker's (half-to-even) and would
    diverge on exact .5 cent boundaries."""
    import math

    return int(math.copysign(math.floor(abs(v * 100) + 0.5), v))


def _python_exclude(rows):
    out = {}
    by_user: dict = {}
    for u, e, ts, et, v in rows:
        by_user.setdefault(u, []).append((e, _cents(v)))
    for u, evs in by_user.items():
        for i, (e, _) in enumerate(evs):
            lo, hi = max(0, i - 3), min(len(evs), i + 4)
            neigh = [c for j, (_, c) in enumerate(evs[lo:hi], lo) if j != i]
            # empty excluded frame => SQL sum is NULL, not 0
            out[(u, e)] = (
                sum(neigh) / 100.0 if neigh else None,
                len(neigh),
            )
    return out


def test_frame_exclude_matches_brute_force(spark):
    model = _python_exclude(_event_rows())
    got = {
        (r.user_id, r.event_id): (r.neighbor_sum, r.n_neighbors)
        for r in QUERIES["win_frame_exclude"](spark, SF_SMOKE_DIR).collect()
    }
    assert got == model


def test_ngrams_overlap_and_counting_laws(spark):
    """Adjacent bigrams overlap by one word, trigram k = bigram k - 1,
    and merging bigram heads + the last bigram reconstructs the
    original 8-token window exactly (the melt-back identity)."""
    rows = QUERIES["arr_ngrams"](spark, SF_SMOKE_DIR).collect()
    con = duckdb.connect()
    texts = dict(
        con.execute(
            "select doc_id, text from "
            f"read_parquet('{SF_SMOKE_DIR}/documents.parquet') "
            "where doc_id < 300"
        ).fetchall()
    )
    con.close()
    assert len(rows) == len(texts) > 0
    for r in rows:
        bi = [g.split(" ") for g in r.bigrams.split(",")]
        tri = [g.split(" ") for g in r.trigrams.split(",")]
        assert r.n_bigrams == len(bi) == 7 and len(tri) == 6
        assert all(len(g) == 2 for g in bi) and all(len(g) == 3 for g in tri)
        for a, b in zip(bi, bi[1:]):
            assert a[1] == b[0]
        rebuilt = [g[0] for g in bi] + [bi[-1][1]]
        assert rebuilt == texts[r.doc_id].split(" ")[:8]


def test_rollup_cascade_day_equals_direct_aggregation(spark):
    """Associativity law: the day rows (re-aggregated FROM hourly
    partials) must equal a direct day aggregation over raw events —
    exact, because the carriers are count + integer cents."""
    rows = QUERIES["ts_rollup_cascade"](spark, SF_SMOKE_DIR).collect()
    con = duckdb.connect()
    direct = {
        b: (n, s)
        for b, n, s in con.execute(
            "select strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S'),"
            " count(*), sum(cast(round(value * 100) as bigint)) from "
            f"read_parquet('{SF_SMOKE_DIR}/events.parquet') group by 1"
        ).fetchall()
    }
    con.close()
    day_rows = [r for r in rows if r.resolution == "day"]
    assert {r.bucket for r in day_rows} == set(direct)
    for r in day_rows:
        n, cents = direct[r.bucket]
        assert r.n_events == n
        assert r.value_sum == cents / 100.0
    # conservation: hour-level totals equal day-level totals exactly
    hour_rows = [r for r in rows if r.resolution == "hour"]
    assert sum(r.n_events for r in hour_rows) == sum(
        r.n_events for r in day_rows
    )
    assert round(sum(r.value_sum for r in hour_rows), 2) == round(
        sum(r.value_sum for r in day_rows), 2
    )


def test_frame_exclude_empty_frame_is_null(spark):
    """The review-caught edge: a user with exactly ONE event has an
    empty excluded frame — native EXCLUDE CURRENT ROW yields NULL
    (sum over no rows), which the naive sum-minus-current composition
    renders as 0.0.  Pin the NULL on a live singleton corpus, plus a
    NULL current-row measure (subtracts nothing; neighbors' sum
    survives)."""
    import tempfile

    from pyspark.sql import Row, functions as F

    from sparketl.registry import QUERIES
    from tests.test_etl import _events_fixture_dir

    rows = [
        # user 1: singleton -> empty excluded frame
        Row(event_id=1, ts="2024-01-01 10:00:00", user_id=1,
            event_type="view", value=7.0),
        # user 2: three events, middle one has NULL value
        Row(event_id=2, ts="2024-01-01 10:00:00", user_id=2,
            event_type="view", value=1.0),
        Row(event_id=3, ts="2024-01-01 10:30:00", user_id=2,
            event_type="view", value=None),
        Row(event_id=4, ts="2024-01-01 11:00:00", user_id=2,
            event_type="view", value=2.0),
    ]
    df = (
        spark.createDataFrame(rows)
        .withColumn("ts", F.to_timestamp("ts"))
        .withColumn("props", F.lit("{}"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    )
    with tempfile.TemporaryDirectory() as d:
        _events_fixture_dir(d, df)
        got = {
            r.event_id: (r.neighbor_sum, r.n_neighbors)
            for r in QUERIES["win_frame_exclude"](spark, d).collect()
        }
    assert got[1] == (None, 0)          # empty excluded frame -> NULL
    assert got[2] == (2.0, 2)           # NULL neighbor contributes nothing
    assert got[3] == (3.0, 2)           # NULL current row subtracts nothing
    assert got[4] == (1.0, 2)


def test_match_predicates_against_python_model(spark):
    """#158 quantifiers recomputed in plain Python from the raw text —
    the n_long count anchors the booleans so they can't pass
    vacuously (all-False corpora would still hash-match)."""
    rows = QUERIES["arr_match_predicates"](spark, SF_SMOKE_DIR).collect()
    con = duckdb.connect()
    texts = dict(
        con.execute(
            "select doc_id, text from "
            f"read_parquet('{SF_SMOKE_DIR}/documents.parquet') "
            "where doc_id < 400"
        ).fetchall()
    )
    con.close()
    assert len(rows) == len(texts) > 0
    seen_true = seen_false = none_true = none_false = False
    for r in rows:
        w = texts[r.doc_id].split(" ")
        longs = [x for x in w if len(x) > 6]
        assert r.any_long == (len(longs) > 0)
        assert r.all_ge2 == all(len(x) >= 2 for x in w)
        assert r.none_huge == (not any(len(x) > 7 for x in w))
        assert r.n_long == len(longs)
        seen_true |= r.any_long
        seen_false |= not r.any_long
        none_true = none_true or r.none_huge
        none_false = none_false or not r.none_huge
    assert seen_true  # corpus exercises both branches of any_long
    assert seen_false
    assert none_true  # ... and of none_huge (review-caught: the
    assert none_false  # original >15 threshold was constant-True)


def test_map_zip_with_against_python_model(spark):
    """#159 key-aligned merge recomputed in Python: chars*2 and
    tokens*3 from the raw document row."""
    rows = QUERIES["map_zip_with"](spark, SF_SMOKE_DIR).collect()
    con = duckdb.connect()
    docs = {
        d: (nc, t)
        for d, nc, t in con.execute(
            "select doc_id, n_chars, len(string_split(text, ' ')) from "
            f"read_parquet('{SF_SMOKE_DIR}/documents.parquet') "
            "where doc_id < 400"
        ).fetchall()
    }
    con.close()
    assert len(rows) == len(docs) > 0
    for r in rows:
        nc, nt = docs[r.doc_id]
        assert r.weighted == f"chars:{nc * 2},tokens:{nt * 3}"


def test_groups_frame_matches_brute_force(spark):
    """#160 GROUPS ±1 frame recomputed in plain Python: peer groups
    built from raw rows by (user, hour) without SQL — covers the
    same-bug risk of both engines running the dense_rank+RANGE
    composition."""
    got = {
        (r.user_id, r.event_id): (r.adj_group_sum, r.grp)
        for r in QUERIES["win_groups_frame"](spark, SF_SMOKE_DIR).collect()
    }
    by_user: dict = {}
    for u, e, ts, et, v in _event_rows():
        hour = ts.replace(minute=0, second=0, microsecond=0)
        by_user.setdefault(u, {}).setdefault(hour, []).append((e, _cents(v)))
    model = {}
    for u, groups in by_user.items():
        hours = sorted(groups)
        sums = [sum(c for _, c in groups[h]) for h in hours]
        for gi, h in enumerate(hours):
            lo, hi = max(0, gi - 1), min(len(hours), gi + 2)
            s = sum(sums[lo:hi])
            for e, _ in groups[h]:
                model[(u, e)] = (s, gi + 1)
    assert got == model


def test_groups_frame_single_exchange(spark):
    """The dense_rank and frame windows share (partitionBy, orderBy
    prefix) — but grp is computed BEFORE the second sort key exists,
    so assert the realistic bound: exactly one exchange on user_id
    (no second shuffle), at most two sorts."""
    import contextlib
    import io

    df = QUERIES["win_groups_frame"](spark, SF_SMOKE_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    plan = buf.getvalue()
    assert plan.count("Exchange") == 1, plan
    assert plan.count("Window") >= 2, plan
    assert plan.count("Sort") <= 2, plan


def _python_exclude_group_ties(rows):
    """Brute-force EXCLUDE GROUP / EXCLUDE TIES over raw rows: hour
    buckets built with datetime arithmetic (no SQL), frame = hours
    within +-2h, peers = same hour, obs = purchase cents or None."""
    from datetime import timedelta

    out = {}
    by_user: dict = {}
    for u, e, ts, et, v in rows:
        hour = ts.replace(minute=0, second=0, microsecond=0)
        obs = _cents(v) if et == "purchase" else None
        by_user.setdefault(u, []).append((e, hour, obs))
    two_h = timedelta(hours=2)
    for u, evs in by_user.items():
        for e, h, obs in evs:
            frame = [(h2, o2) for _, h2, o2 in evs if abs(h2 - h) <= two_h]
            rest = [(h2, o2) for h2, o2 in frame if h2 != h]
            rest_vals = [o for _, o in rest if o is not None]
            grp = (
                sum(rest_vals) / 100.0 if rest_vals else None,
                len(rest),
            )
            kept_vals = rest_vals + ([obs] if obs is not None else [])
            ties = (
                sum(kept_vals) / 100.0 if kept_vals else None,
                len(rest) + 1,
            )
            out[(u, e)] = (grp, ties)
    return out


def test_frame_exclude_group_ties_brute_force(spark):
    """#155 EXCLUDE GROUP/TIES vs a pure-Python neighborhood loop —
    independent of both the Spark composition and DuckDB's native
    clause (which already grades them at the oracle gate)."""
    model = _python_exclude_group_ties(_event_rows())
    got_g = {
        (r.user_id, r.event_id): (r.excl_group_sum, r.n_rest)
        for r in QUERIES["win_frame_exclude_group"](
            spark, SF_SMOKE_DIR
        ).collect()
    }
    got_t = {
        (r.user_id, r.event_id): (r.excl_ties_sum, r.n_rest)
        for r in QUERIES["win_frame_exclude_ties"](
            spark, SF_SMOKE_DIR
        ).collect()
    }
    assert len(got_g) == len(model) > 0
    assert got_g == {k: g for k, (g, _) in model.items()}
    assert got_t == {k: t for k, (_, t) in model.items()}
    # the fixture must exercise BOTH null-gate branches, or the test
    # is vacuous (the r9 none_match lesson)
    assert any(g[0] is None for g in got_g.values())
    assert any(g[0] is not None for g in got_g.values())


def test_frame_exclude_group_null_edges(spark):
    """Pinned edges the composition must get right: (a) a frame whose
    only non-null observation is inside the excluded peer group ->
    GROUP yields NULL, TIES yields the self value; (b) a NULL self
    among non-null neighbors -> GROUP sums the neighbors, TIES the
    same (self adds nothing); (c) a singleton user -> GROUP NULL/0
    rows, TIES keeps self."""
    import tempfile

    from pyspark.sql import Row, functions as F

    from tests.test_etl import _events_fixture_dir

    rows = [
        # user 1: lone purchase -> (a) and (c)
        Row(event_id=1, ts="2024-01-01 10:00:00", user_id=1,
            event_type="purchase", value=5.0),
        # user 2: purchase at 10:00 and a view (NULL obs) peer at
        # 10:30, plus a purchase neighbor hour at 11:00
        Row(event_id=2, ts="2024-01-01 10:00:00", user_id=2,
            event_type="purchase", value=1.0),
        Row(event_id=3, ts="2024-01-01 10:30:00", user_id=2,
            event_type="view", value=9.0),
        Row(event_id=4, ts="2024-01-01 11:00:00", user_id=2,
            event_type="purchase", value=2.0),
    ]
    df = (
        spark.createDataFrame(rows)
        .withColumn("ts", F.to_timestamp("ts"))
        .withColumn("props", F.lit("{}"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    )
    with tempfile.TemporaryDirectory() as d:
        _events_fixture_dir(d, df)
        g = {
            r.event_id: (r.excl_group_sum, r.n_rest)
            for r in QUERIES["win_frame_exclude_group"](spark, d).collect()
        }
        t = {
            r.event_id: (r.excl_ties_sum, r.n_rest)
            for r in QUERIES["win_frame_exclude_ties"](spark, d).collect()
        }
    assert g[1] == (None, 0)   # singleton: empty rest-frame -> NULL
    assert t[1] == (5.0, 1)    # ties keeps self
    assert g[2] == (2.0, 1)    # NULL peer excluded with the group
    assert t[2] == (3.0, 2)    # self 1.0 + neighbor 2.0
    # 10:30 truncates INTO the 10:00 bucket: events 2+3 are peers
    assert g[3] == (2.0, 1)    # both 10:00 peers out, 11:00 stays
    assert t[3] == (2.0, 2)    # NULL self adds nothing over GROUP
    assert g[4] == (1.0, 2)    # 10:00 purchase only (NULL view adds 0)
    assert t[4] == (3.0, 3)


def test_frame_exclude_single_window_exec(spark):
    """Both EXCLUDE frames share (partitionBy, orderBy): Catalyst must
    plan ONE exchange, ONE sort, ONE WindowExec evaluating the full
    and peer frames together — EXCLUDE costs nothing over the plain
    sliding frame (the docstring's scale claim, asserted)."""
    for name in ("win_frame_exclude_group", "win_frame_exclude_ties"):
        df = QUERIES[name](spark, SF_SMOKE_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, (name, plan)
        assert plan.count("Sort") == 1, (name, plan)
        assert plan.count("Window") == 1, (name, plan)


def test_groups_frame_bounds_brute_force(spark):
    """#160 widened bounds vs plain Python: +-2 groups and the
    running UNBOUNDED PRECEDING..CURRENT ROW frame, whose GROUPS
    semantics close at the END of the current peer group — every row
    of a group must see the same running sum (asserted explicitly,
    since that is where a rows-mode slip would hide)."""
    got = {
        (r.user_id, r.event_id): (r.wide_group_sum, r.run_group_sum, r.grp)
        for r in QUERIES["win_groups_frame_bounds"](
            spark, SF_SMOKE_DIR
        ).collect()
    }
    by_user: dict = {}
    for u, e, ts, et, v in _event_rows():
        hour = ts.replace(minute=0, second=0, microsecond=0)
        by_user.setdefault(u, {}).setdefault(hour, []).append((e, _cents(v)))
    model = {}
    for u, groups in by_user.items():
        hours = sorted(groups)
        sums = [sum(c for _, c in groups[h]) for h in hours]
        prefix = 0
        for gi, h in enumerate(hours):
            lo, hi = max(0, gi - 2), min(len(hours), gi + 3)
            wide = sum(sums[lo:hi])
            prefix += sums[gi]
            for e, _ in groups[h]:
                model[(u, e)] = (wide, prefix, gi + 1)
    assert got == model
    assert len(got) > 0


def test_groups_exclude_brute_force(spark):
    """r10 capstone (#155 x #160): GROUPS +-1 EXCLUDE GROUP recomputed
    in plain Python — adjacent hour-groups' purchase sums, the current
    group excluded entirely, NULL when the adjacent groups hold no
    observation."""
    got = {
        (r.user_id, r.event_id): (r.adj_excl_sum, r.n_rest, r.grp)
        for r in QUERIES["win_groups_exclude"](spark, SF_SMOKE_DIR).collect()
    }
    by_user: dict = {}
    for u, e, ts, et, v in _event_rows():
        hour = ts.replace(minute=0, second=0, microsecond=0)
        obs = _cents(v) if et == "purchase" else None
        by_user.setdefault(u, {}).setdefault(hour, []).append((e, obs))
    model = {}
    for u, groups in by_user.items():
        hours = sorted(groups)
        for gi, h in enumerate(hours):
            adj = []
            for gj in (gi - 1, gi + 1):
                if 0 <= gj < len(hours):
                    adj.extend(groups[hours[gj]])
            vals = [o for _, o in adj if o is not None]
            s = sum(vals) / 100.0 if vals else None
            for e, _ in groups[h]:
                model[(u, e)] = (s, len(adj), gi + 1)
    assert got == model and len(got) > 0
    # both NULL-gate branches must fire on the fixture
    assert any(v[0] is None for v in got.values())
    assert any(v[0] is not None for v in got.values())
