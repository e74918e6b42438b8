"""Unit tests for the shared SCALE_STRESS merge contract
(scripts/stress_common.py — extracted in round 8 after the review
found three divergent copies).  Pure-python, temp-dir backed."""

from __future__ import annotations

import importlib.util
import json
import os

spec = importlib.util.spec_from_file_location(
    "stress_common",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "stress_common.py"),
)
stress_common = importlib.util.module_from_spec(spec)
spec.loader.exec_module(stress_common)
merge = stress_common.merge_scale_stress


def _read(repo):
    with open(os.path.join(repo, "SCALE_STRESS.json")) as f:
        return json.load(f)


def test_fresh_write_computes_ratio(tmp_path):
    repo = str(tmp_path)
    merge(repo, {"q": {"x1": {"wall_sec": 1.0}, "x10": {"wall_sec": 5.0}}}, 2)
    d = _read(repo)
    assert d["queries"]["q"]["wall_ratio"] == 5.0
    assert d["passes"] == 2


def test_refreshing_one_tier_recomputes_and_preserves_others(tmp_path):
    repo = str(tmp_path)
    merge(repo, {"q": {"x1": {"wall_sec": 1.0}, "x10": {"wall_sec": 5.0},
                       "x100": {"wall_sec": 50.0}}}, 2)
    # later run refreshes ONLY x10 — the x100 tier must survive and
    # BOTH dependent ratios must be recomputed against the new record
    merge(repo, {"q": {"x10": {"wall_sec": 2.0}}}, 3)
    q = _read(repo)["queries"]["q"]
    assert q["x100"]["wall_sec"] == 50.0  # preserved
    assert q["wall_ratio"] == 2.0  # 2.0 / 1.0, recomputed
    assert q["wall_ratio_x100"] == 25.0  # 50 / 2, recomputed
    assert _read(repo)["passes"] == 3  # file-level field refreshed


def test_ratio_dropped_when_input_tier_missing(tmp_path):
    repo = str(tmp_path)
    merge(repo, {"q": {"x1": {"wall_sec": 1.0}, "x10": {"wall_sec": 5.0}}}, 2)
    # simulate an errored re-measure of x1 (wall -1): ratio must drop
    merge(repo, {"q": {"x1": {"wall_sec": -1.0}}}, 2)
    q = _read(repo)["queries"]["q"]
    assert "wall_ratio" not in q


def test_other_queries_ratios_also_recomputed(tmp_path):
    repo = str(tmp_path)
    merge(repo, {"a": {"x1": {"wall_sec": 1.0}, "x10": {"wall_sec": 4.0}}}, 2)
    # hand-corrupt a's ratio, then merge an unrelated query: the
    # global recompute must repair it
    path = os.path.join(repo, "SCALE_STRESS.json")
    d = json.load(open(path))
    d["queries"]["a"]["wall_ratio"] = 99.0
    json.dump(d, open(path, "w"))
    merge(repo, {"b": {"x1": {"wall_sec": 1.0}}}, 2)
    assert _read(repo)["queries"]["a"]["wall_ratio"] == 4.0


def test_extra_fields_written(tmp_path):
    repo = str(tmp_path)
    merge(repo, {"q": {"x1": {"wall_sec": 1.0}}}, 1, extra={"corpus": {"x1": "c"}})
    assert _read(repo)["corpus"] == {"x1": "c"}
