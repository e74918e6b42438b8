"""Unit tests for the perf-audit core (VERDICT r7 #3: tags carry
measured justification baselines and trip back to WEAK on regression).

Pure-python: synthesizes bench/baseline dicts and checks the audit's
classification logic, including the stale-tag regression trip on a
real tagged query name.
"""

from __future__ import annotations

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "perf_audit",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "perf_audit.py"),
)
perf_audit = importlib.util.module_from_spec(spec)
spec.loader.exec_module(perf_audit)


def test_untagged_over_2x_and_1s_is_weak():
    rows, n_cmp, weak = perf_audit.audit(
        {"some_query": 1.5}, {"some_query": 0.5}
    )
    assert weak == 1
    assert rows[0][3] == "some_query" and rows[0][4] == ""


def test_untagged_over_2x_but_under_1s_is_reported_not_weak():
    rows, _, weak = perf_audit.audit({"q": 0.9}, {"q": 0.2})
    assert len(rows) == 1 and weak == 0


def test_sub_100ms_referent_excluded():
    rows, n_cmp, weak = perf_audit.audit({"q": 5.0}, {"q": 0.05})
    assert rows == [] and weak == 0 and n_cmp == 0


def test_live_tag_suppresses_weak():
    # agg_checksum recorded at 1.10s; at its recorded time the tag holds
    rows, _, weak = perf_audit.audit({"agg_checksum": 1.10}, {"agg_checksum": 0.3})
    assert weak == 0
    assert rows[0][4] == "portable-hash" and rows[0][5] == ""


def test_stale_tag_trips_back_to_weak():
    # a tagged query that doubles from its recorded justification time
    # (1.10s -> 2.5s) must count WEAK again: the rationale explained the
    # old number, not the new one.
    rows, _, weak = perf_audit.audit({"agg_checksum": 2.5}, {"agg_checksum": 0.3})
    assert weak == 1
    assert rows[0][5] == "STALE"


def test_tag_registry_shape():
    for name, (tag, rec_s, rationale) in perf_audit.TAGS.items():
        assert tag and rec_s > 0 and len(rationale) > 10, name


def test_input_gaps_flag_registry_artifact_drift():
    # a declared query absent from bench, and an oracle-graded query
    # whose baseline referent is missing/null, must both be reported
    # (VERDICT r8 What's-missing #2: silently-unaudited queries)
    declared = {"a", "b", "c", "rows_only"}
    oracled = {"a", "b", "c"}
    bench = {"a": 1.0, "b": 1.0, "rows_only": 0.2}  # c missing
    base = {"a": 0.5, "b": None, "rows_only": None}  # b null, c absent
    bench_gap, base_gap, orphans = perf_audit.input_gaps(
        declared, oracled, bench, base
    )
    assert bench_gap == ["c"]
    assert base_gap == ["b", "c"]
    assert orphans == []


def test_input_gaps_rows_only_exempt_from_baseline_only():
    declared = {"rows_only"}
    bench_gap, base_gap, orphans = perf_audit.input_gaps(
        declared, set(), {}, {}
    )
    assert bench_gap == ["rows_only"]  # still must be benched
    assert base_gap == []  # but needs no referent
    assert orphans == []


def test_input_gaps_flag_orphaned_artifact_entries():
    # a deleted/renamed query left behind in either artifact must be
    # flagged — it would otherwise keep being graded (round-9 review)
    declared = {"a"}
    bench = {"a": 1.0, "ghost_bench": 2.0}
    base = {"a": 0.5, "ghost_base": 0.2}
    _, _, orphans = perf_audit.input_gaps(declared, {"a"}, bench, base)
    assert orphans == ["ghost_base", "ghost_bench"]


def test_live_artifacts_cover_live_registry():
    # HEAD-state gate: the committed artifacts must cover every
    # declared query so the audit never silently skips one.
    import json
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from sparketl import registry

    registry.load_all_modules()
    with open(os.path.join(repo, "BENCH_SEQ.json")) as f:
        bench = json.load(f)["queries"]
    with open(os.path.join(repo, "BASELINE_PERQUERY.json")) as f:
        base = json.load(f)["queries"]
    bench_gap, base_gap, orphans = perf_audit.input_gaps(
        set(registry.QUERIES), set(registry.ORACLES), bench, base
    )
    assert bench_gap == [] and base_gap == [] and orphans == [], (
        bench_gap, base_gap, orphans
    )
