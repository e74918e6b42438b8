#!/usr/bin/env python
"""Per-query DuckDB baseline referent (closes VERDICT.md r4 "What's
missing" #5): BASELINE.md records only suite walls, so ">2x slower
than baseline" could previously be judged only at suite level.  This
script times EVERY registered ``oracle_sql()`` string individually in
DuckDB at a given SF and writes ``BASELINE_PERQUERY.json``
(query -> best-of-N seconds), making the perf gate auditable
per-query: compare any BENCH_LOCAL.json / BENCH_r{N}.json entry
against the same key here.

Method mirrors the suite-level referent in BASELINE.md: one warm
connection with the ten fixture views registered (the driver's own
harness shape, sparketl/oracle.py:47), sequential execution, results
fully materialized via ``.fetchall()``, best-of-N (default 2) to damp
host co-tenant noise.  Rows-only queries (no oracle by design) are
recorded as null.

Usage:
    python scripts/baseline_perquery.py [sf_dir] [repeats]
    # defaults: /root/testdata/sf0.1, 2
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparketl import registry
from sparketl.oracle import duckdb_connect


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    registry.load_all_modules()
    con = duckdb_connect(sf_dir)
    con.execute("select 1").fetchall()  # warm

    timings: dict[str, float | None] = {}
    for name in sorted(registry.QUERIES):
        sql = registry.ORACLES.get(name)
        if sql is None:
            timings[name] = None  # rows-only by design (SURVEY.md §5)
            continue
        best = None
        for _ in range(max(1, repeats)):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        timings[name] = round(best, 4)
        print(f"{timings[name]:8.3f}  {name}", file=sys.stderr)

    timed = {k: v for k, v in timings.items() if v is not None}
    out = {
        "engine": "duckdb",
        "sf_dir": sf_dir,
        "repeats": repeats,
        "n_timed": len(timed),
        "n_rows_only": len(timings) - len(timed),
        "sum_sec": round(sum(timed.values()), 3),
        "queries": timings,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BASELINE_PERQUERY.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({k: out[k] for k in ("n_timed", "sum_sec", "sf_dir")}))


if __name__ == "__main__":
    main()
