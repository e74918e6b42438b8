#!/usr/bin/env python
"""Run the driver-equivalent oracle gate locally.

Usage: python scripts/check.py [name-or-prefix ...] [--sf DIR]
No args => every registered query.  A trailing '*' on a name (or any
name that is a prefix of several) selects by prefix.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from sparketl import registry
from sparketl.oracle import compare_one, duckdb_connect
from sparketl.session import get_spark


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        del args[i : i + 2]

    registry.load_all_modules()
    names = list(registry.QUERIES)
    if args:
        sel = []
        for a in args:
            a = a.rstrip("*")
            sel += [n for n in names if n == a or n.startswith(a)]
        names = list(dict.fromkeys(sel))

    spark = get_spark("sparketl-check")
    con = duckdb_connect(sf)
    failures = 0
    t0 = time.time()
    for n in names:
        t = time.time()
        try:
            df = registry.QUERIES[n](spark, sf)
            res = compare_one(n, df, con, registry.ORACLES.get(n))
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"[ERR ] {n}: {type(e).__name__}: {str(e)[:500]}")
            continue
        failures += not res.ok
        print(f"{res}  ({time.time() - t:.2f}s)")
    print(f"-- {len(names)} queries, {failures} failures, {time.time() - t0:.1f}s total")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
