#!/usr/bin/env python
"""Dump `.explain("formatted")` for declared queries + a plan-shape audit.

Usage: python scripts/plan_dump.py [name-or-prefix ...] [--sf DIR]
       [--out DIR] [--json FILE]

Writes one `<query>.txt` per query under --out (default plans/dump/)
and a JSON summary of plan-shape counters (Exchange, join strategies,
Python-eval nodes, scans with/without pushed filters) so optimization
rounds can diff plan shape before/after (guide §1: measure first;
§7.2: read the plan).

The audit runs under the engine conf contract (SESSION_CONFS), i.e.
the plan the 100 TB deployment would get — not the bench session's
local-overhead knobs.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, ".")

from sparketl import registry
from sparketl.session import get_spark

#: physical-plan node names worth counting when auditing a plan
NODE_COUNTERS = [
    "Exchange",
    "BroadcastExchange",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "MapInArrow",
    "FlatMapGroupsInPandas",
    "AggregateInPandas",
    "Window",
    "Sort",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "Scan parquet",
    "WholeStageCodegen",
]


def explain_str(df) -> str:
    qe = df._jdf.queryExecution()  # noqa: SLF001
    return df.sparkSession._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        qe, "formatted"
    )


def summarize(plan: str) -> dict:
    out: dict[str, object] = {}
    for node in NODE_COUNTERS:
        # count only the detail headers "(4) Exchange" so tree lines
        # ("+- Exchange (4)") are not double-counted
        n = len(re.findall(rf"^\(\d+\) {re.escape(node)}", plan, re.M))
        if n:
            out[node.replace(" ", "_").lower()] = n
    scans = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    out["scans_with_pushed"] = sum(1 for s in scans if s.strip())
    out["scans_no_pushed"] = sum(1 for s in scans if not s.strip())
    return out


def main() -> int:
    args = list(sys.argv[1:])
    sf = "/root/testdata/sf0.1"
    out_dir = "plans/dump"
    json_path = None
    for flag, default in (("--sf", sf), ("--out", out_dir), ("--json", None)):
        if flag in args:
            i = args.index(flag)
            val = args[i + 1]
            del args[i : i + 2]
            if flag == "--sf":
                sf = val
            elif flag == "--out":
                out_dir = val
            else:
                json_path = val

    registry.load_all_modules()
    names = list(registry.QUERIES)
    if args:
        sel = []
        for a in args:
            a = a.rstrip("*")
            sel += [n for n in names if n == a or n.startswith(a)]
        names = list(dict.fromkeys(sel))

    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("sparketl-plan-dump")
    summary: dict[str, dict] = {}
    for n in names:
        try:
            df = registry.QUERIES[n](spark, sf)
            plan = explain_str(df)
        except Exception as e:  # noqa: BLE001
            print(f"[ERR ] {n}: {type(e).__name__}: {str(e)[:300]}")
            summary[n] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            continue
        with open(os.path.join(out_dir, f"{n}.txt"), "w") as f:
            f.write(plan)
        summary[n] = summarize(plan)
        print(f"[ok  ] {n}: {summary[n]}")
    if json_path:
        with open(json_path, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
