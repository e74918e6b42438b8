#!/usr/bin/env python
"""Spark-jobs-per-query audit (r15 optimization round).

Usage: python scripts/job_audit.py [name-or-prefix ...] [--sf DIR]
       [--json FILE]

For each declared query: warm it once, then run it under a job group
and report how many Spark jobs the second (warm) execution submitted,
plus its wall.  Job count is the load-independent proxy for the
sequential driver-action latency that dominates statement-shaped
queries at bench SF (guide §1.2: at this granularity the blocking
small actions ARE the wall) — used as before/after evidence for the
DML consolidation, where wall-clock on this host is too noisy to
discriminate ~0.5 s effects.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from sparketl import registry
from sparketl.session import get_spark
from sparketl.tables import load_tables


def main() -> int:
    args = list(sys.argv[1:])
    sf = "/root/testdata/sf0.1"
    json_path = None
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        del args[i : i + 2]
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        del args[i : i + 2]

    registry.load_all_modules()
    names = []
    for a in args:
        a2 = a.rstrip("*")
        names += [q for q in registry.QUERIES if q == a2 or q.startswith(a2)]
    names = list(dict.fromkeys(names)) or sorted(registry.QUERIES)

    spark = get_spark("sparketl-job-audit")
    load_tables(spark, sf)
    sc = spark.sparkContext
    out: dict[str, dict] = {}
    for name in names:
        try:
            q = registry.QUERIES[name]
            q(spark, sf).collect()  # warm (memos, JIT, catalog)
            sc.setJobGroup(f"ja_{name}", name)
            t0 = time.perf_counter()
            q(spark, sf).collect()
            dt = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            jids = sc._jsc.sc().statusTracker().getJobIdsForGroup(  # noqa: SLF001
                f"ja_{name}"
            )
            out[name] = {"jobs": len(jids), "wall": round(dt, 2)}
            print(f"{name}: jobs={len(jids)} wall={dt:.2f}")
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": str(e)[:150]}
            print(f"{name}: ERR {str(e)[:150]}")
        spark.catalog.clearCache()
    if json_path:
        json.dump(out, open(json_path, "w"), indent=1, sort_keys=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
