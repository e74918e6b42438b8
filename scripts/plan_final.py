#!/usr/bin/env python
"""Dump the EXECUTED adaptive plan (final + initial) for queries.

Usage: python scripts/plan_final.py name [name ...] [--sf DIR] [--out DIR]

Unlike plan_dump.py (pre-execution initial plan), this collect()s each
query first so the dumped `.explain("formatted")` carries the AQE
final plan — ReusedExchange nodes, AQEShuffleRead coalescing, runtime
join strategy changes.  Used for the plans/r15/*_before|after.txt
evidence files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from sparketl import registry
from sparketl.session import get_spark
from sparketl.tables import load_tables


def main() -> int:
    args = list(sys.argv[1:])
    sf = "/root/testdata/sf0.1"
    out_dir = "plans/r15"
    suffix = ""
    for flag in ("--sf", "--out", "--suffix"):
        if flag in args:
            i = args.index(flag)
            val = args[i + 1]
            del args[i : i + 2]
            if flag == "--sf":
                sf = val
            elif flag == "--out":
                out_dir = val
            else:
                suffix = val

    registry.load_all_modules()
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("sparketl-plan-final")
    load_tables(spark, sf)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(  # noqa: SLF001
        "formatted"
    )
    for n in args:
        try:
            df = registry.QUERIES[n](spark, sf)
            df.collect()
            plan = df._jdf.queryExecution().explainString(mode)  # noqa: SLF001
        except Exception as e:  # noqa: BLE001
            print(f"[ERR ] {n}: {type(e).__name__}: {str(e)[:300]}")
            continue
        path = os.path.join(out_dir, f"{n}{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        import re

        scans = len(
            re.findall(
                r"Scan parquet", plan.split("== Initial Plan ==")[0]
            )
        )
        print(f"[ok  ] {n}: executed scans={scans} "
              f"reused={plan.split('== Initial Plan ==')[0].count('ReusedExchange')} -> {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
