"""Declared-query registry.

Every operator in SURVEY.md §2 is exposed as a named query builder
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB
oracle string.  ``__spark_entry__.py`` simply re-exports these dicts.

Naming: ``<category>_<operator>`` (e.g. ``join_left_anti``,
``str_regexp_extract``) per SURVEY.md §2.

Determinism rules enforced by convention in every registered query
(SURVEY.md §5): no now()/rand() without seed; collect_list is always
sorted; explicit NULLS FIRST/LAST wherever order feeds a LIMIT or a
window frame; every computed column aliased identically in Spark and
oracle SQL; floating aggregates rounded to 6 decimals on BOTH sides;
no raw TIMESTAMP columns in a final select (cast to DATE or format to
string — arrow tz-aware vs naive mismatch risk).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query; ``oracle=None`` => rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate declared query: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    # Imports are inside the function so `import sparketl` stays cheap
    # and circular imports (modules import `query` from here) resolve.
    from sparketl.operators import (  # noqa: F401
        aggregates,
        analytics,
        curation,
        dialect_queries,
        dml_queries,
        etl,
        eventtime,
        joins,
        llm,
        multimodal,
        relational,
        reshape,
        tpch,
        udfs,
        windows,
    )
    from sparketl.functions import (  # noqa: F401
        arrays,
        datetimes,
        maps_json,
        mathfns,
        strings,
    )
    from sparketl.sources import connectors  # noqa: F401
