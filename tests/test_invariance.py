"""Partition-layout invariance: every fixture arrives as ONE parquet
file, so the suite never proves that results survive a multi-file,
arbitrarily-ordered layout — which is the ONLY layout that exists at
100 TB.  Here the same documents are rewritten as 8 parquet files with
rows deterministically scattered across them, and the dedup/curation
results must be IDENTICAL: any hidden dependence on scan order,
partition count, or per-file locality (non-commutative aggregation,
first()-style picks, partition-local numbering) would flip the
comparison."""

from __future__ import annotations

import numpy as np
import os

import pyarrow.parquet as pq
import pytest

from sparketl import registry
from sparketl.tables import TABLE_NAMES
from tests.conftest import SF_SMOKE_DIR

INVARIANT_QUERIES = [
    "llm_dedup_exact",
    "llm_dedup_minhash_lsh",
    "llm_dedup_components",
    "llm_dedup_survivorship",
    "llm_dedup_bloom_prefilter",
    "llm_shard_assign",
    "llm_seq_packing",
    "llm_train_val_split",
    "llm_unigram_nll",
    "llm_quality_classifier",
]


@pytest.fixture(scope="module")
def scattered_dir(tmp_path_factory):
    src = pq.read_table(f"{SF_SMOKE_DIR}/documents.parquet")
    d = tmp_path_factory.mktemp("scatter")
    docs_dir = d / "documents.parquet"
    docs_dir.mkdir()
    idx = np.random.RandomState(0).permutation(len(src))
    for k in range(8):
        pq.write_table(
            src.take(idx[k::8]), docs_dir / f"part-{k:03d}.parquet"
        )
    for name in TABLE_NAMES:
        if name != "documents":
            os.symlink(
                f"{SF_SMOKE_DIR}/{name}.parquet", d / f"{name}.parquet"
            )
    return str(d)


@pytest.mark.parametrize("name", INVARIANT_QUERIES)
def test_result_is_partition_layout_invariant(spark, scattered_dir, name):
    a = {tuple(r) for r in registry.QUERIES[name](spark, SF_SMOKE_DIR).collect()}
    b = {tuple(r) for r in registry.QUERIES[name](spark, scattered_dir).collect()}
    assert a, name
    assert a == b, f"{name}: result depends on partition layout"


EVENT_INVARIANT_QUERIES = [
    "stream_stateful_sessions",
    "stream_session_window",
    "join_asof",
    "funnel_conversion",
    "retention_cohort",
    "path_bigrams",
]


@pytest.fixture(scope="module")
def scattered_events_dir(tmp_path_factory):
    """events rewritten as 8 files with rows deterministically
    scattered — ordering-sensitive operators (sessionization, as-of,
    paths) must not depend on the single-file scan order."""
    src = pq.read_table(f"{SF_SMOKE_DIR}/events.parquet")
    d = tmp_path_factory.mktemp("scatter_ev")
    ev_dir = d / "events.parquet"
    ev_dir.mkdir()
    idx = np.random.RandomState(1).permutation(len(src))
    for k in range(8):
        pq.write_table(src.take(idx[k::8]), ev_dir / f"part-{k:03d}.parquet")
    for name in TABLE_NAMES:
        if name != "events":
            os.symlink(
                f"{SF_SMOKE_DIR}/{name}.parquet", d / f"{name}.parquet"
            )
    return str(d)


@pytest.mark.parametrize("name", EVENT_INVARIANT_QUERIES)
def test_event_result_is_partition_layout_invariant(
    spark, scattered_events_dir, name
):
    a = {tuple(r) for r in registry.QUERIES[name](spark, SF_SMOKE_DIR).collect()}
    b = {
        tuple(r)
        for r in registry.QUERIES[name](spark, scattered_events_dir).collect()
    }
    assert a, name
    assert a == b, f"{name}: result depends on events partition layout"
