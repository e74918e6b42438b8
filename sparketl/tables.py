"""Table catalog: load the ten fixture tables, normalize, register views.

Presto resolves tables eagerly against connector metadata; our analogue
is parquet's embedded schema — no inference (SURVEY.md §1.1).  Views are
registered once per (session, sf_dir) and cached so a 100-query suite
doesn't re-plan 1000 scans; DataFrames themselves stay lazy.

events.ts normalization (SURVEY.md §0.1): the driver's fixture
generations have shipped the column as either TIMESTAMP(NANOS) — which
PySpark 4.1 reads only under ``spark.sql.legacy.parquet.nanosAsLong=true``
as LongType nanos, normalized via ``timestamp_micros(ts div 1000)``
(truncation, bit-exact vs DuckDB's truncating µs read) — or, as of the
round-4 regeneration, a native ``timestamp[us]`` column that arrives as
TIMESTAMP_NTZ.  :func:`normalize_events_ts` handles both by inspecting
the loaded dtype, so the engine tracks whichever schema the driver
generates next.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparketl.session import configure_session

TABLE_NAMES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: (session id, sf_dir) -> {table: DataFrame}
_CATALOG_CACHE: dict[tuple[int, str], dict[str, DataFrame]] = {}

#: session id -> sf_dir the fixture views currently point at.  The
#: re-pin in load_tables exists only because ANOTHER sf_dir may have
#: repointed the plain-named views; tracking the last pin lets the
#: same-dir case (every call but the first in a bench/check run) skip
#: ten createOrReplaceTempView round trips (~0.13 s of py4j per query
#: — a third of the cheap-query floor, optimization round 16).
_VIEW_PIN: dict[int, str] = {}


def invalidate_view_pins(spark: SparkSession) -> None:
    """Force the next load_tables to re-pin the fixture views.  Called
    by the DML front door when a statement registers or drops a FLAT
    table whose name collides with a fixture view — the only way the
    views can change under load_tables' feet."""
    _VIEW_PIN.pop(id(spark), None)


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to session-timezone TIMESTAMP regardless
    of the fixture generation's physical type (see module docstring).

    * LongType — TIMESTAMP(NANOS) read under ``nanosAsLong``: truncate
      to µs (matches DuckDB's truncating read of the same file).
    * TIMESTAMP_NTZ — native ``timestamp[us]`` parquet: cast; with
      ``spark.sql.session.timeZone=UTC`` the wall-clock is preserved.
    * TIMESTAMP — already what downstream operators expect.
    """
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, T.TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load + normalize all fixture tables and register temp views.

    Idempotent and cached per (session, sf_dir).  Registering plain
    names (``lineitem`` etc.) gives the SQL entry point (E2) the same
    catalog the DataFrame entry point (E1) uses.
    """
    key = (id(spark), sf_dir.rstrip("/"))
    cached = _CATALOG_CACHE.get(key)
    if cached is not None:
        # Views are plain-named (`lineitem`), so loading ANOTHER sf_dir on
        # the same session points them elsewhere.  The DataFrames stay
        # valid, but SQL-path queries would silently read the other scale
        # factor — so re-pin the views on every call (ms-cheap, no re-plan
        # of the scans themselves).
        from sparketl.session import CATALOG_LOCK

        if _VIEW_PIN.get(id(spark)) == key[1]:
            return cached  # views already point here — nothing to do
        with CATALOG_LOCK:
            for name, df in cached.items():
                df.createOrReplaceTempView(name)
            _VIEW_PIN[id(spark)] = key[1]
        return cached

    configure_session(spark)
    # registering/re-pointing views changes what the dialect's
    # integer-division resolver should see — drop its schema cache
    # (cheap; it rebuilds lazily on the next dialect.sql call)
    from sparketl import dialect

    dialect.clear_schema_cache()
    from sparketl.session import CATALOG_LOCK

    dfs: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
        if name == "events":
            df = normalize_events_ts(df)
        dfs[name] = df
        with CATALOG_LOCK:
            df.createOrReplaceTempView(name)
        # PUSH the schema (round 14): push-origin entries are
        # authoritative and survive the probe-origin eviction the
        # classing cache performs on name-set changes — without this,
        # every external create/drop would re-read all base-table
        # schemas on the next classing rebuild
        dialect.update_schema_cache(spark, name, df.schema)

    _CATALOG_CACHE[key] = dfs
    _VIEW_PIN[id(spark)] = key[1]
    return dfs


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Fetch one normalized table (loading/caching the catalog)."""
    return load_tables(spark, sf_dir)[name]


def clear_cache() -> None:
    _CATALOG_CACHE.clear()
