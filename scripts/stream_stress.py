#!/usr/bin/env python
"""Streaming lane at x10 (VERDICT.md r7 #5).

Replays the scale corpus (gen_scale_corpus.py --rel: events 100k -> 1M
rows, documents 5k -> 50k) through the Structured Streaming faces as
a ~10-micro-batch file stream (landing dir split into 10 ordered part
files, maxFilesPerTrigger=1), measuring per face and tier:

  wall_sec      run-to-completion (Trigger.AvailableNow -> memory sink)
  in_rows/s     input throughput (sum of numInputRows / wall)
  batches       micro-batches executed
  state_rows    stateOperators numRowsTotal at the final progress —
                the state-store growth story: sessions must be
                O(users), dedup O(arrived keys), the gate zero
  state_mb      stateOperators memoryUsedBytes at the final progress

Faces: stateful sessionization (applyInPandasWithState), incremental
dedup (stream-static anti-join + identity dropDuplicates; standing
corpus = first half of the tier's documents, stream = all), quality
gate (stateless classifier), stream-stream interval join (views x
clicks, watermarked), tumbling window agg (watermark + window).

Results deep-merge into SCALE_STRESS.json under stream_* names; the
markdown table is pasted into SCALING.md.

Usage: python scripts/stream_stress.py [--x100] [passes]
  default 2 passes (1 with --x100); --x100 runs the x10 -> x100 tiers
  (events 1M -> 10M, documents 50k -> 500k) for the streaming lane's
  third decade — requires gen_scale_corpus.py --rel --x100.
"""

from __future__ import annotations

import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from sparketl import session
from sparketl.streaming.runner import (
    incremental_dedup_stream,
    incremental_dedup_stream_bounded,
    quality_gate_stream,
    read_events_stream,
    stateful_sessions_stream,
)
from sparketl.tables import load_tables

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_FILES = 10


def stage_split(src: str, dst: str, n_files: int = N_FILES) -> int:
    """Split one parquet file into ``n_files`` ordered row-slices — the
    micro-batch schedule (row order preserved: the stateful session
    operator assumes an append-in-order landing zone, like a log
    shipper producing time-ordered files)."""
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    t = pq.read_table(src)
    per = (t.num_rows + n_files - 1) // n_files
    for i in range(0, t.num_rows, per):
        pq.write_table(
            t.slice(i, per), os.path.join(dst, f"part-{i // per:03d}.parquet")
        )
    return t.num_rows


def stage_split_ingest_ts(src: str, dst: str, n_files: int = N_FILES) -> int:
    """stage_split + a synthetic ``ingest_ts`` column: slice i arrives
    at T0 + i hours, so with a 10-minute watermark every micro-batch
    advances event time far past the previous batch's keys — the
    bounded dedup face must EVICT them (state ~ one batch's keys, not
    all arrived keys)."""
    import pyarrow as pa

    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    t = pq.read_table(src)
    per = (t.num_rows + n_files - 1) // n_files
    base_us = 1_700_000_000_000_000  # fixed epoch; only spacing matters
    for i in range(0, t.num_rows, per):
        s = t.slice(i, per)
        ts = pa.array(
            [base_us + (i // per) * 3_600_000_000] * s.num_rows,
            pa.timestamp("us"),
        )
        pq.write_table(
            s.append_column("ingest_ts", ts),
            os.path.join(dst, f"part-{i // per:03d}.parquet"),
        )
    return t.num_rows


def read_docs_stream(spark, docs_dir: str):
    schema = spark.read.parquet(docs_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )


def run_measured(stream_df, output_mode: str = "append") -> dict:
    """run_available_now + progress metrics (state rows/memory come
    from the engine's own stateOperators telemetry)."""
    name = f"mem_{uuid.uuid4().hex[:8]}"
    t0 = time.perf_counter()
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = round(time.perf_counter() - t0, 3)
    progresses = [p for p in q.recentProgress if p is not None]
    in_rows = sum(int(p.get("numInputRows", 0)) for p in progresses)
    state_rows = state_mem = 0
    for p in reversed(progresses):
        ops = p.get("stateOperators") or []
        if ops:
            state_rows = sum(int(o.get("numRowsTotal", 0)) for o in ops)
            state_mem = sum(int(o.get("memoryUsedBytes", 0)) for o in ops)
            break
    out_rows = stream_df.sparkSession.table(name).count()
    return {
        "wall_sec": wall,
        "in_rows": in_rows,
        "out_rows": out_rows,
        "batches": sum(1 for p in progresses if int(p.get("numInputRows", 0)) > 0),
        "state_rows": state_rows,
        "state_mb": round(state_mem / 1e6, 2),
    }


def faces(spark, ev_dir: str, docs_dir: str, docs_ts_dir: str, standing):
    ev = lambda: read_events_stream(spark, ev_dir)  # noqa: E731
    yield "stream_lane_sessions", lambda: run_measured(
        stateful_sessions_stream(ev())
    )
    yield "stream_lane_incremental_dedup", lambda: run_measured(
        incremental_dedup_stream(read_docs_stream(spark, docs_dir), standing)
    )
    # the watermark-BOUNDED twin (round 9): batches arrive 1h apart
    # with a 10-minute delay, so state must hold ~one batch's keys
    # where the unbounded face above holds ALL arrived keys
    yield "stream_lane_bounded_dedup", lambda: run_measured(
        incremental_dedup_stream_bounded(
            read_docs_stream(spark, docs_ts_dir), standing, delay="10 minutes"
        )
    )
    yield "stream_lane_quality_gate", lambda: run_measured(
        quality_gate_stream(read_docs_stream(spark, docs_dir))
    )

    def sswj():
        views = (
            ev()
            .where(F.col("event_type") == "view")
            .select(
                "user_id",
                F.col("event_id").alias("view_id"),
                F.col("ts").alias("v_ts"),
            )
            .withWatermark("v_ts", "10 minutes")
        )
        clicks = (
            ev()
            .where(F.col("event_type") == "click")
            .select(
                F.col("user_id").alias("c_user"),
                F.col("event_id").alias("click_id"),
                F.col("ts").alias("c_ts"),
            )
            .withWatermark("c_ts", "10 minutes")
        )
        joined = views.join(
            clicks,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("v_ts"))
            & (F.col("c_ts") <= F.col("v_ts") + F.expr("interval 10 minutes")),
        )
        return run_measured(joined)

    yield "stream_lane_stream_stream_join", sswj
    # the rollup cascade's hourly tier (r10, SURVEY #157 streaming
    # face): state must be O(open hour windows) — the continuous
    # aggregate the daily tier re-reads from the sink
    from sparketl.streaming.runner import rollup_hourly_stream

    yield "stream_lane_rollup_hourly", lambda: run_measured(
        rollup_hourly_stream(ev()), output_mode="append"
    )
    yield "stream_lane_tumbling_agg", lambda: run_measured(
        ev()
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
        ),
        output_mode="append",
    )


def main() -> None:
    args = sys.argv[1:]
    x100 = "--x100" in args
    if x100:
        args.remove("--x100")
    passes = int(args[0]) if args else (1 if x100 else 2)
    tiers = ("x10", "x100") if x100 else ("x1", "x10")
    from scripts.stress_common import merge_scale_stress, warm_spark

    spark = session.get_spark("sparketl-stream-stress")
    warm_spark(spark)
    scratch = os.path.join(REPO, ".scale", "_stream_stage")

    results: dict[str, dict] = {}
    for tag in tiers:
        sf_dir = os.path.join(REPO, ".scale", tag)
        ev_dir = os.path.join(scratch, tag, "events")
        docs_dir = os.path.join(scratch, tag, "documents")
        stage_split(os.path.join(sf_dir, "events.parquet"), ev_dir)
        n_docs = stage_split(os.path.join(sf_dir, "documents.parquet"), docs_dir)
        docs_ts_dir = os.path.join(scratch, tag, "documents_ts")
        stage_split_ingest_ts(
            os.path.join(sf_dir, "documents.parquet"), docs_ts_dir
        )
        docs = load_tables(spark, sf_dir)["documents"]
        standing = docs.where(F.col("doc_id") < n_docs // 2)
        for name, run in faces(spark, ev_dir, docs_dir, docs_ts_dir, standing):
            recs = []
            for _ in range(passes):
                spark.catalog.clearCache()
                recs.append(run())
            best = min(recs, key=lambda r: r["wall_sec"])
            best["walls"] = [r["wall_sec"] for r in recs]
            best["rows_per_sec"] = (
                round(best["in_rows"] / best["wall_sec"]) if best["wall_sec"] else 0
            )
            results.setdefault(name, {})[tag] = best
            print(
                f"{tag:4} {name:32} {best['wall_sec']:7.2f}s "
                f"in={best['in_rows']:7d} out={best['out_rows']:7d} "
                f"batches={best['batches']:2d} state_rows={best['state_rows']:6d} "
                f"state_mb={best['state_mb']}",
                file=sys.stderr,
            )

    merge_scale_stress(REPO, results, passes)

    lo, hi = tiers
    print(
        f"| face | {lo} s | {hi} s | ratio | {hi} rows/s | {hi} batches "
        f"| {lo} state rows | {hi} state rows | {hi} state MB |"
    )
    print("| --- | --- | --- | --- | --- | --- | --- | --- | --- |")
    for name, rec in results.items():
        r1, r10 = rec[lo], rec[hi]
        print(
            f"| {name} | {r1['wall_sec']:.2f} | {r10['wall_sec']:.2f} | "
            f"{round(r10['wall_sec'] / r1['wall_sec'], 2)} | "
            f"{r10['rows_per_sec']} | {r10['batches']} | "
            f"{r1['state_rows']} | {r10['state_rows']} | {r10['state_mb']} |"
        )


if __name__ == "__main__":
    main()
