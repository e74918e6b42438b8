#!/usr/bin/env python
"""MinHash-LSH band-key skew: measured mitigation evidence (round 11,
VERDICT r10 #6).

The fixtures' documents are near-uniform, so the dedup band join's
skew story (llm_dedup.py: "skewed buckets are handled by AQE skew-join
splitting") had only ever been a docstring assertion.  This script
builds a corpus where ONE boilerplate template owns ~10% of all
documents — each copy carries a per-doc suffix word, so they are
NEAR-duplicates (Jaccard ≈ 0.94), and most of them still minhash to
the template's band keys: the classic terms-of-service / license-
header hot bucket.  It then runs EXACTLY the declared query's
candidate-generation plan (sparketl.operators.llm_dedup.
minhash_lsh_pairs(confirm=False) — the band self-join + pair dedup)
under two configurations:

  plain   AQE skew-join OFF — each hot band key's pairs are generated
          inside ONE sort-merge task (banding itself spreads the class
          across _LSH_BANDS keys, so "one task per band")
  aqe     AQE skew-join ON, thresholds lowered so the demo-sized
          partitions qualify.  MEASURED FINDING: AQE's relief is
          PARTIAL for this skew class — detection is by a partition's
          INPUT bytes and splitting is at mapper-block granularity,
          while a boilerplate bucket is ~10% of input rows yet ~99.9%
          of output pairs (output-side skew); the run shows extra
          tasks and a ~25% max-task cut, with the biggest pair-writing
          task nearly unchanged
  salt    minhash_lsh_pairs(band_salt=8): side A tagged doc_id % 8,
          side B's 16-byte band rows replicated 8x, join on
          (band_key, salt) — the OUTPUT-side mitigation; each bucket's
          all-pairs workload deterministically lands on 8 tasks.  The
          measured max task write drops ~2.8x and the max task ~2.5x

Broadcast is disabled like scripts/skew_stress.py: at demo scale the
120k-row band frame would broadcast (no skewed exchange to measure at
all — broadcast IS the first mitigation), while at corpus scale the
band frame cannot broadcast and the shuffle lane below is the real
plan.

Diagnostic: wall (min of N passes) and the MAX single-task duration
across all stages of the run (the hot SMJ task dominates every other
task under plain; a mitigated plan has no such task).  Both variants
must produce the identical candidate-pair count and checksum — skew
mitigation is a physical rewrite, never a semantic one.

Results merge into SCALE_STRESS.json under band_skew_{plain,aqe,salt}
("x1" tier records; the comparison is across variants, summarized in
SCALING.md).

Usage: python scripts/band_skew_stress.py [passes]   (default 2)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sparketl import session

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = os.path.join(REPO, ".scale", "bandskew", "documents.parquet")
N_DOCS = 30_000
HOT_FRAC = 0.10  # one boilerplate template owns this share of the corpus

#: --x100 lane (round 12, VERDICT r11 #6): 500k docs with a FIXED
#: 10k-doc boilerplate cluster (2%).  The hot share shrinks because
#: pair volume is quadratic in the cluster: 10% of 500k would be
#: 1.25e9 candidate pairs from one template — no deduper runs that
#: unsalted, and the lane's purpose is the G knob's decade behavior,
#: not a pathological stall.  10k hot docs = ~50M hot pairs, the
#: x100 decade of the x1 lane's ~4.5M.
X100_CORPUS = os.path.join(REPO, ".scale", "bandskew_x100", "documents.parquet")
X100_N_DOCS = 500_000
X100_HOT = 10_000

#: ~30-word boilerplate body — every hot doc = template + unique suffix
#: word, so hot docs are NEAR-duplicates (not exact: an exact-dedup
#: pass upstream would have removed byte-identical copies; the band
#: join's skew exposure is precisely the near-dup boilerplate class)
_TEMPLATE = (
    "this service is provided as is without warranty of any kind either "
    "express or implied including but not limited to the implied "
    "warranties of merchantability and fitness for a particular purpose"
)


def gen_corpus(spark, corpus=CORPUS, n_docs=N_DOCS, hot=None) -> None:
    if os.path.exists(corpus):
        return
    hot = int(n_docs * HOT_FRAC) if hot is None else hot
    df = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < hot,
            F.concat(F.lit(_TEMPLATE + " clause "), F.col("id").cast("string")),
        )
        .otherwise(
            # unique 8-token docs: no cross-doc shingle collisions
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"w{j}x"), (F.col("id") * (j + 3)).cast("string"))
                    for j in range(8)
                ],
            )
        )
        .alias("text"),
        (F.col("id") % 100).alias("n_chars"),
    )
    df.repartition(8).write.mode("overwrite").parquet(corpus)
    print(f"generated {corpus}: {n_docs} docs, {hot} boilerplate", file=sys.stderr)


def join_stage_max_task(spark, since_stage: int) -> tuple[int, int, int]:
    """Max single-task duration of the BAND-JOIN stage — identified as
    the stage with the largest shuffle WRITE among stages newer than
    ``since_stage`` (the join writes the candidate pairs, ~40x its
    keys-only input; skew_stress's shuffle-READ heuristic would pick
    the downstream dedup stage instead, whose read is the pair volume
    but whose tasks are uniform).  Returns (max task ms, max task
    shuffle-write bytes, task count).  The WRITE-bytes maximum is the
    deterministic split evidence — each task's write is its share of
    the generated pairs, immune to co-tenant timing noise; a split hot
    partition also adds tasks."""
    from scripts.skew_stress import api

    join_stage, best_write = None, -1
    for st in api(spark, "stages?status=complete"):
        if st["stageId"] <= since_stage:
            continue
        wb = int(st.get("shuffleWriteBytes", 0) or 0)
        if wb > best_write:
            best_write, join_stage = wb, st["stageId"]
    if join_stage is None:
        return 0, 0, 0
    det = api(spark, f"stages/{join_stage}?details=true")
    best, best_wr, n = 0, 0, 0
    for att in det if isinstance(det, list) else [det]:
        tasks = att.get("tasks") or {}
        n = max(n, len(tasks))
        for t in tasks.values():
            best = max(best, int(t.get("duration", 0) or 0))
            best_wr = max(
                best_wr,
                int(
                    (t.get("taskMetrics") or {})
                    .get("shuffleWriteMetrics", {})
                    .get("bytesWritten", 0)
                    or 0
                ),
            )
    return best, best_wr, n


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--x100"]
    x100 = "--x100" in sys.argv[1:]
    passes = int(args[0]) if args else (1 if x100 else 2)
    from scripts.skew_stress import latest_stage
    from scripts.stress_common import merge_scale_stress, warm_spark
    from sparketl.operators.llm_dedup import minhash_lsh_pairs

    session.LOCAL_BUILD_CONFS = {
        **session.LOCAL_BUILD_CONFS,
        "spark.ui.enabled": "true",
        "spark.ui.retainedStages": "20000",
    }
    spark = session.get_spark("sparketl-band-skew-stress")
    warm_spark(spark)
    corpus, tier = (CORPUS, "x1")
    n_docs, hot = N_DOCS, int(N_DOCS * HOT_FRAC)
    if x100:
        corpus, tier = (X100_CORPUS, "x100")
        n_docs, hot = X100_N_DOCS, X100_HOT
    gen_corpus(spark, corpus, n_docs, hot)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    confs = {
        "plain": {"spark.sql.adaptive.skewJoin.enabled": "false"},
        "aqe": {
            "spark.sql.adaptive.skewJoin.enabled": "true",
            # Demo-size calibration: AQE detects skew by a partition's
            # INPUT bytes (> factor x median AND > threshold), but this
            # skew is pair-EXPLOSION skew — the hot band keys are ~10%
            # of input rows yet ~99.9% of output pairs, so at 30k docs
            # the hot partition is only ~1.8x the median's input.  The
            # lowered factor/threshold make the demo partition qualify;
            # at corpus scale a 10%-boilerplate bucket is GBs of input
            # and crosses the 256MB/5x defaults on its own.
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16k",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8k",
            # partition coalescing (parallelismFirst + 1MB min size)
            # merges the 32 reducer partitions to ~8 BEFORE the skew
            # check, burying the hot keys inside merged partitions —
            # at demo byte sizes only; production partitions are far
            # above the coalesce floor
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
        # intra-bucket salting (minhash_lsh_pairs band_salt=8): side A
        # tagged doc_id % 8, side B replicated 8x, join on (band_key,
        # salt) — the OUTPUT-side mitigation: each bucket's all-pairs
        # workload deterministically lands on 8 tasks
        "salt": {"spark.sql.adaptive.skewJoin.enabled": "false"},
    }
    salt_of = {"salt": 8}
    if x100:
        # the decade lane compares the G knob directly: the per-task
        # pair share is hot_pairs / G, so doubling the decade means
        # raising G — salt32 shows max-task write ~ 1/G at fixed data
        confs = {
            "plain": confs["plain"],
            "salt": confs["salt"],
            "salt32": dict(confs["salt"]),
        }
        salt_of = {"salt": 8, "salt32": 32}
    results: dict[str, dict] = {}
    checks = set()
    for variant, cc in confs.items():
        for k, v in cc.items():
            spark.conf.set(k, v)
        walls, max_tasks = [], []
        n_pairs = checksum = None
        for _ in range(passes):
            spark.catalog.clearCache()
            docs = spark.read.parquet(corpus)
            mark = latest_stage(spark)
            t0 = time.perf_counter()
            cand = minhash_lsh_pairs(
                docs,
                confirm=False,
                band_salt=salt_of.get(variant),
            )
            row = cand.agg(
                F.count("*").alias("n"),
                F.sum(F.col("doc_a") * 3 + F.col("doc_b")).alias("chk"),
            ).collect()[0]
            walls.append(round(time.perf_counter() - t0, 3))
            max_tasks.append(join_stage_max_task(spark, mark))
            n_pairs, checksum = row.n, row.chk
            checks.add((row.n, row.chk))
        mt, mwr, ntasks = min(max_tasks)
        results[f"band_skew_{variant}"] = {
            tier: {
                "wall_sec": min(walls),
                "walls": walls,
                "max_task_ms": mt,
                "max_task_write_bytes": mwr,
                "join_stage_tasks": ntasks,
                "n_pairs": n_pairs,
            }
        }
        print(
            f"{variant:6} wall={min(walls):6.2f}s max_task={mt}ms "
            f"max_write={mwr} tasks={ntasks} pairs={n_pairs} chk={checksum}",
            file=sys.stderr,
        )
    assert len(checks) == 1, f"variants disagree on results: {checks}"
    merge_scale_stress(
        REPO,
        results,
        passes,
        extra={
            f"band_skew_corpus_{tier}": (
                f"docs={n_docs}, one boilerplate template + per-doc "
                f"suffix = {hot} near-dup docs "
                f"({hot / n_docs:.0%}); broadcast disabled"
            )
        },
    )
    print("| variant | wall s | join max task ms | max task write MB | join tasks | pairs |")
    print("| --- | --- | --- | --- | --- | --- |")
    for v in confs:
        r = results[f"band_skew_{v}"][tier]
        print(
            f"| {v} | {r['wall_sec']:.2f} | {r['max_task_ms']} | "
            f"{r['max_task_write_bytes'] / 1e6:.1f} | "
            f"{r['join_stage_tasks']} | {r['n_pairs']} |"
        )


if __name__ == "__main__":
    main()
