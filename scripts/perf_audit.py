#!/usr/bin/env python
"""Per-query performance audit: BENCH_SEQ.json vs BASELINE_PERQUERY.json
(round-7, VERDICT r6 next-round #2).

Compares every declared query's sequential min-of-passes Spark time
against its DuckDB per-oracle referent and reports the >2x entries,
tagging referent classes whose comparison is structurally
apples-to-oranges so the report separates like from unlike:

  side-effect   sink_* queries write parquet/orc and re-read; the
                referent oracle only reads — the ratio compares a
                write+read against a read.
  sketch        the Spark side builds/merges a real sketch (HLL, KLL,
                frequent-items) and self-checks a tolerance; the
                oracle states the contract with exact aggregates +
                constant booleans, doing structurally less work.
  composite     the query IS a multi-query harness by construction
                (llm_ann_recall_eval runs two declared queries plus
                their referents to score recall).
  python-state  applyInPandasWithState / custom-stateful operators pay
                a fixed Arrow+Python-worker floor the referent has no
                analogue of (documented in SCALING.md).
  codebook-build  first IVF/PQ-family member in a bench pass is charged
                the shared centroid-codebook collect job (cleared per
                pass by design so each pass pays it exactly once);
                later family members reuse it — e.g. ivf_search ~=
                ivf_search_nprobe + codebook.
  ann-score-floor  the per-pair cosine was measured BOTH as a JVM HOF
                (zip_with/aggregate — CodegenFallback, interpreted at
                ~0.5 ms/pair with codegen on OR off) and as the
                round-7 cogrouped numpy kernel; at sf0.1 both floor at
                ~1s (HOF cpu vs Arrow/cogroup overhead) while the
                kernel wins >2x at 10x data (SCALING.md), so the
                shipped kernel is the scale-correct choice and the
                sf0.1 number is its measured local floor.
  portable-hash the engine-portable checksum contract pins md5 (the
                only digest both engines compute identically).  The
                round-7 repartition fix removed the real plan bug
                (3-partition scan serialized the fold: 2.4s -> ~1.0s);
                the residual is JVM md5 + UTF8 formatting vs DuckDB's
                C md5 — pure function throughput on an embarrassingly
                parallel map-side-combinable aggregate, hovering at
                the 1s bar under bench's interpreted-expression mode.

Everything untagged and >2x AND >1s absolute is a WEAK entry the next
round must either fix or explain.

Usage: python scripts/perf_audit.py   (reads the two JSONs, prints md)
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TAGS = {
    "sink_parquet_partitioned": "side-effect",
    "sink_partition_overwrite_dynamic": "side-effect",
    "sink_compacted_files": "side-effect",
    "sink_bucketed_colocated_join": "side-effect",
    "source_orc_roundtrip": "side-effect",
    "source_text_roundtrip": "side-effect",
    "source_csv": "side-effect",
    "source_jsonlines": "side-effect",
    "approx_hll_sketch_merge": "sketch",
    "approx_count_distinct": "sketch",
    "approx_percentile": "sketch",
    "approx_top_k_sketch": "sketch",
    "llm_ann_recall_eval": "composite",
    "stream_stateful_sessions": "python-state",
    "udf_grouped_map_apply": "python-state",
    "llm_ivf_search": "codebook-build",
    "llm_ivf_search_nprobe": "ann-score-floor",
    "agg_checksum": "portable-hash",
}


def main() -> None:
    with open(os.path.join(REPO, "BENCH_SEQ.json")) as f:
        bench = json.load(f)["queries"]
    with open(os.path.join(REPO, "BASELINE_PERQUERY.json")) as f:
        base = json.load(f)["queries"]

    rows = []
    for name, spark_s in sorted(bench.items()):
        ref = base.get(name)
        if ref is None or ref <= 0 or spark_s <= 0:
            continue
        if ref < 0.1:  # sub-100ms referents are pure-overhead compares
            continue
        ratio = spark_s / ref
        if ratio > 2.0:
            rows.append((ratio, spark_s, ref, name, TAGS.get(name, "")))

    rows.sort(reverse=True)
    print("| query | spark s | duckdb s | ratio | tag |")
    print("| --- | --- | --- | --- | --- |")
    weak = 0
    for ratio, s, r, name, tag in rows:
        print(f"| {name} | {s:.2f} | {r:.2f} | {ratio:.1f}x | {tag} |")
        if not tag and s > 1.0:
            weak += 1
    n_cmp = sum(
        1
        for n, v in bench.items()
        if base.get(n) and base[n] >= 0.1 and v > 0
    )
    print(
        f"\n{n_cmp} comparable queries (>=100ms referent); "
        f"{len(rows)} over 2x; {weak} WEAK (untagged, >2x and >1s)."
    )


if __name__ == "__main__":
    main()
