#!/usr/bin/env python
"""Hot-key shuffle-join skew: measured mitigation comparison.

The fixtures' keys are uniform, so the suite's skew machinery
(join_skew_salted, AQE skew-join) had never been exercised against
REAL skew.  gen_scale_corpus.py --skew writes a 10M-row events table
where user 0 owns 25% of all rows (.scale/skew); this script joins it
against a 100k-row user dim (broadcast disabled, so the join MUST
shuffle on the hot key) and measures three plans:

  plain   AQE skew-join OFF — the hot key's ~2.6M rows land in ONE
          sort-merge task; wall ~= that task
  aqe     AQE skew-join ON (skewedPartitionThresholdInBytes lowered to
          16MB so the 10M-row demo crosses it; production data crosses
          the 256MB default on its own) — the runtime splits the hot
          partition against replicated dim rows
  salt    manual 16-way salting (the join_skew_salted pattern): fact
          tagged pmod(event_id, 16), dim replicated x16, join on
          (user_id, salt) — the engines-off / persistent-bucketing
          mitigation

Per variant: wall (min of N passes) and the MAX single-task duration
of the heaviest stage (Spark UI REST task list) — the skew diagnostic:
plain's max task IS the hot key; mitigated plans split it.

Results merge into SCALE_STRESS.json under skew_join_{plain,aqe,salt}
(single "x1" tier records — no cross-tier ratio; the comparison is
across variants, summarized in SCALING.md).

Usage: python scripts/skew_stress.py [passes]   (default 2)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sparketl import session

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_SALTS = 16


def api(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/{path}") as r:
        return json.load(r)


def max_task_ms(spark, since_stage: int) -> tuple[int, int]:
    """Max single-task duration (ms) of the run's JOIN stage — the
    stage with the largest shuffle READ among stages newer than
    ``since_stage`` (scan stages read no shuffle, so the diagnostic
    isolates the skew-sensitive sort-merge work).  Returns
    (max task ms, n tasks in that stage)."""
    join_stage, best_read = None, -1
    for st in api(spark, "stages?status=complete"):
        if st["stageId"] <= since_stage:
            continue
        rb = int(st.get("shuffleReadBytes", 0) or 0)
        if rb > best_read:
            best_read, join_stage = rb, st["stageId"]
    if join_stage is None:
        return 0, 0
    det = api(spark, f"stages/{join_stage}?details=true")
    best, n = 0, 0
    for att in det if isinstance(det, list) else [det]:
        tasks = att.get("tasks") or {}
        n = max(n, len(tasks))
        for t in tasks.values():
            best = max(best, int(t.get("duration", 0) or 0))
    return best, n


def latest_stage(spark) -> int:
    return max(
        (st["stageId"] for st in api(spark, "stages?status=complete")), default=-1
    )


def build(spark, variant: str):
    fact = spark.read.parquet(os.path.join(REPO, ".scale", "skew", "events.parquet"))
    dim = (
        spark.range(100_000)
        .select(
            F.col("id").alias("user_id"),
            (F.col("id") % 97).alias("user_group"),
            (F.col("id") % 7 + 1).alias("weight"),
        )
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    if variant == "salt":
        f = fact.withColumn("salt", F.pmod("event_id", F.lit(N_SALTS)))
        d = dim.crossJoin(
            spark.range(N_SALTS).select(F.col("id").cast("bigint").alias("salt"))
        )
        joined = f.join(d, ["user_id", "salt"])
    else:
        joined = fact.join(dim, "user_id")
    return joined.groupBy("user_group").agg(
        F.sum(cents * F.col("weight")).alias("weighted_cents"),
        F.count("*").alias("n"),
    )


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from scripts.stress_common import merge_scale_stress, warm_spark

    session.LOCAL_BUILD_CONFS = {
        **session.LOCAL_BUILD_CONFS,
        "spark.ui.enabled": "true",
        "spark.ui.retainedStages": "20000",
    }
    spark = session.get_spark("sparketl-skew-stress")
    warm_spark(spark)
    # force the shuffle join: the dim would otherwise broadcast and
    # there would be no skewed exchange to measure
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    confs = {
        "plain": {"spark.sql.adaptive.skewJoin.enabled": "false"},
        "aqe": {
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
        },
        "salt": {"spark.sql.adaptive.skewJoin.enabled": "false"},
    }
    results: dict[str, dict] = {}
    checks = set()
    for variant, cc in confs.items():
        for k, v in cc.items():
            spark.conf.set(k, v)
        walls, max_tasks = [], []
        for _ in range(passes):
            spark.catalog.clearCache()
            mark = latest_stage(spark)
            t0 = time.perf_counter()
            rows = build(spark, variant).collect()
            walls.append(round(time.perf_counter() - t0, 3))
            mt, ntasks = max_task_ms(spark, mark)
            max_tasks.append((mt, ntasks))
            checks.add(tuple(sorted((r.user_group, r.weighted_cents, r.n) for r in rows)))
        mt, ntasks = min(max_tasks)
        results[f"skew_join_{variant}"] = {
            "x1": {
                "wall_sec": min(walls),
                "walls": walls,
                "max_task_ms": mt,
                "join_stage_tasks": ntasks,
            }
        }
        print(
            f"{variant:6} wall={min(walls):6.2f}s max_task={mt}ms "
            f"join_tasks={ntasks}",
            file=sys.stderr,
        )
    # all three plans must produce identical results — skew mitigation
    # is a physical rewrite, never a semantic one
    assert len(checks) == 1, "variants disagree on results"
    merge_scale_stress(REPO, results, passes)
    print("| variant | wall s | join max task ms | join tasks |")
    print("| --- | --- | --- | --- |")
    for v in confs:
        r = results[f"skew_join_{v}"]["x1"]
        print(
            f"| {v} | {r['wall_sec']:.2f} | {r['max_task_ms']} | "
            f"{r['join_stage_tasks']} |"
        )


if __name__ == "__main__":
    main()
