"""Shared plumbing for the scale-measurement scripts (round-8 review:
the SCALE_STRESS.json load/deep-merge/ratio-recompute/write block and
the Spark warmup boilerplate were triplicated across scale_stress.py,
k_sweep.py and stream_stress.py and had already diverged — k_sweep and
stream_stress recomputed only their own queries' ratios and left the
file-level ``passes`` field stale)."""

from __future__ import annotations

import json
import os

#: cross-tier wall ratios, recomputed from whatever tier records exist
#: after every merge (a stale ratio carried verbatim across a refresh
#: of its input tier left the artifact internally inconsistent —
#: round-7 review)
RATIOS = (("wall_ratio", "x1", "x10"), ("wall_ratio_x100", "x10", "x100"))


def merge_scale_stress(repo: str, results: dict, passes: int,
                       extra: dict | None = None) -> dict:
    """Deep-merge per-query ``results`` into SCALE_STRESS.json.

    Per query: tier records overwrite tier-wise, everything else in
    the prior record is preserved.  EVERY query's cross-tier ratios
    (not just this run's) are recomputed from the merged tier records,
    and dropped when an input tier is missing.  File-level fields
    (``passes``, anything in ``extra``) are refreshed.  Returns the
    full merged document."""
    path = os.path.join(repo, "SCALE_STRESS.json")
    out: dict = {"queries": {}}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    merged = out.get("queries", {})
    for name, rec in results.items():
        merged[name] = {**merged.get(name, {}), **rec}
    for rec in merged.values():
        for rk, lo, hi in RATIOS:
            a = rec.get(lo, {}).get("wall_sec")
            b = rec.get(hi, {}).get("wall_sec")
            if a and b and a > 0 and b > 0:
                rec[rk] = round(b / a, 2)
            elif rk in rec:
                del rec[rk]
    out["queries"] = merged
    out["passes"] = passes
    for k, v in (extra or {}).items():
        out[k] = v
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    return out


def warm_spark(spark) -> None:
    """Standard measurement warmup: catalog + JVM + the Python worker
    pool (one 32-way mapInPandas round so the first timed Arrow query
    doesn't pay worker forking)."""
    spark.sql("select 1").collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).collect()
