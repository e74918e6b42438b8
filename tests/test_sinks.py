"""File-level assertions for the maintenance sinks: the oracle gate
proves the DATA is right; these prove the FILE behavior the operators
exist for — overwrite scoping and file-count collapse."""

from __future__ import annotations

import os

from sparketl import registry
from sparketl.sources.connectors import _scratch_dir
from tests.conftest import SF_DIR


def _parquet_files(path: str) -> dict[str, float]:
    out = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out[os.path.relpath(p, path)] = os.path.getmtime(p)
    return out


def test_dynamic_overwrite_touches_only_written_partitions(spark):
    """Re-running the restatement must rewrite files under the F
    partition only: O and P partition files keep their identity
    (same paths, same mtimes) — the idempotent-backfill property.
    The re-run repeats ONLY the dynamic-overwrite step (the query
    function also re-lands the base table, which legitimately
    rewrites everything)."""
    import pyspark.sql.functions as F

    from sparketl.sources.connectors import _partition_overwrite_dynamic
    from sparketl.tables import table

    registry.QUERIES["sink_partition_overwrite_dynamic"](spark, SF_DIR).collect()
    path = _scratch_dir(SF_DIR, "orders_dyn_overwrite")
    before = _parquet_files(path)
    restated = (
        table(spark, SF_DIR, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderpriority", "o_orderstatus")
        .where(F.col("o_orderstatus") == "F")
        .withColumn("o_orderpriority", F.lit("X-RESTATED"))
    )
    with _partition_overwrite_dynamic(spark):
        restated.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    after = _parquet_files(path)
    untouched = {f for f in before if "o_orderstatus=F" not in f}
    assert untouched == {f for f in after if "o_orderstatus=F" not in f}
    changed = [f for f in untouched if before[f] != after[f]]
    assert not changed, f"sibling partitions rewritten: {changed}"
    # and the F partition WAS rewritten
    f_before = {f for f in before if "o_orderstatus=F" in f}
    f_after = {f for f in after if "o_orderstatus=F" in f}
    assert f_after and (
        f_before != f_after
        or any(before[f] != after[f] for f in f_before & f_after)
    )


def test_compaction_collapses_file_count(spark):
    registry.QUERIES["sink_compacted_files"](spark, SF_DIR).collect()
    frag = _parquet_files(_scratch_dir(SF_DIR, "lineitem_fragmented"))
    compact = _parquet_files(_scratch_dir(SF_DIR, "lineitem_compacted"))
    assert len(frag) == 64
    # sf0.01 slice is far below the 64 MiB target => exactly one file
    assert len(compact) < len(frag) // 8, (len(frag), len(compact))


def test_csv_malformed_modes(spark):
    """The other two CSV parse modes over source_csv_malformed's dirty
    landing dir: DROPMALFORMED silently drops exactly the three
    planted bad rows; FAILFAST raises on first corruption."""
    import pytest as _pytest

    from sparketl.sources.connectors import (
        NATION_SCHEMA,
        _scratch_dir,
        source_csv_malformed,
    )
    from sparketl.tables import table

    # materialize the dirty dir (idempotent overwrite)
    source_csv_malformed(spark, SF_DIR).collect()
    path = _scratch_dir(SF_DIR, "nation_csv_dirty")
    n_clean = table(spark, SF_DIR, "nation").count()

    dropped = (
        spark.read.schema(NATION_SCHEMA)
        .option("mode", "DROPMALFORMED")
        .csv(path)
    )
    # collect all columns: a bare count() prunes the scan to zero
    # columns and the CSV parser never sees the malformed cells
    # (spark.sql.csv.parser.columnPruning) — a real mode-semantics
    # footgun worth pinning here
    assert len(dropped.collect()) == n_clean

    with _pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        (
            spark.read.schema(NATION_SCHEMA)
            .option("mode", "FAILFAST")
            .csv(path)
            .collect()
        )
