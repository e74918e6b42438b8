"""Local replica of the driver's DuckDB-oracle correctness check.

The driver (``__spark_entry__.py`` docstring) runs every ``queries()``
entry at sf0.01 and compares against ``oracle_sql()`` via DuckDB on
row-count + schema + order-insensitive value-hash.  This module lets us
run the same gate locally before the driver does (SURVEY.md §5).

Round-2 hardening: the driver canonicalizes through *pandas* (its
recorded traceback in CORRECTNESS_r01.json shows ``DataFrame.sort_values``
over the result frame), which has two consequences the round-1 replica
missed:

1. **Complex cells break the gate.**  A result column holding lists /
   arrays / maps / structs is an ``object`` column of unhashable values
   → ``TypeError: unhashable type: 'list'`` in pandas' sort.  Declared
   queries must serialize complex values (``array_join``, ``to_json``)
   in the final select on BOTH sides.  This replica therefore fetches
   both sides as pandas frames and *fails* any query whose result
   contains such cells.

2. **DuckDB HUGEINT becomes float64.**  DuckDB's ``sum(INTEGER)`` /
   ``count_if`` return HUGEINT, which ``.df()`` converts to float64 —
   so the oracle yields ``6.0`` where Spark yields ``6`` and the hash
   mismatches.  Oracle SQL must ``cast(... as bigint)`` every
   HUGEINT-producing aggregate.  Fetching through ``.df()`` here makes
   the divergence visible locally.

Canonicalization: values are rendered to strings (floats via repr so
only bit-identical doubles match — the driver's hash is exact, so we
hold ourselves to exactness, which the round(x, 6)-on-both-sides policy
delivers), rows sorted, columns sorted by name.
"""

from __future__ import annotations

import datetime as dt
import math
import os
from dataclasses import dataclass

import duckdb
import numpy as np
import pandas as pd

from sparketl.tables import TABLE_NAMES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with the ten fixture views pre-registered, as the
    driver does (``__spark_entry__.py:33-35``)."""
    con = duckdb.connect()
    # Pin the session zone to match Spark's SESSION_CONFS UTC pin
    # (review r10): DuckDB's TimeZone defaults to the HOST zone, and
    # tz-sensitive oracle expressions (dt_timezone_iso's
    # TIMESTAMPTZ→naive casts) would hash-diverge on a non-UTC
    # machine.  This container is Etc/UTC, so the pin changes nothing
    # here — it makes `python scripts/check.py` reproducible anywhere.
    con.execute("set TimeZone = 'UTC'")
    for name in TABLE_NAMES:
        path = f"{sf_dir.rstrip('/')}/{name}.parquet"
        # scale-corpus facts are multi-file directories (a lake layout —
        # scripts/gen_scale_corpus.py ROWS_PER_FILE); DuckDB needs the
        # glob form for those, Spark reads the directory natively.
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"create or replace view {name} as "
            f"select * from read_parquet('{path}')"
        )
    return con


class ComplexCellError(TypeError):
    """A result cell the driver's pandas canonicalization cannot hash
    (list/array/map/struct).  Serialize it in the query instead."""


def _canon_value(v) -> str:
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            # pandas represents both SQL NULL and NaN as NaN in float
            # columns — the driver cannot tell them apart, so neither
            # do we.
            return "NULL"
        if f == 0.0:
            f = 0.0  # normalize -0.0
        return repr(f)
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, bytes):
        return "0x" + v.hex()
    if isinstance(v, (pd.Timestamp, dt.datetime)):
        return (
            pd.Timestamp(v)
            .to_pydatetime()
            .replace(tzinfo=None)
            .isoformat(sep=" ", timespec="microseconds")
        )
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, str):
        return v
    if isinstance(v, (list, tuple, dict, np.ndarray)) or hasattr(v, "asDict"):
        raise ComplexCellError(
            f"driver-unhashable complex cell {type(v).__name__}: {str(v)[:80]}"
        )
    return str(v)


def canonical_frame(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    """Column-name-sorted, row-sorted, string-rendered rows — the
    order-insensitive exact-value canonical form."""
    cols = sorted(pdf.columns)
    out = [
        tuple(_canon_value(row[c]) for c in cols)
        for row in pdf.to_dict(orient="records")
    ]
    out.sort()
    return out


@dataclass
class CompareResult:
    name: str
    ok: bool
    rows_spark: int
    rows_oracle: int | None
    detail: str = ""

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        return f"[{status}] {self.name} spark_rows={self.rows_spark} oracle_rows={self.rows_oracle} {self.detail}"


def compare_one(
    name: str,
    spark_df,
    con: duckdb.DuckDBPyConnection,
    oracle_sql: str | None,
    max_diff_shown: int = 3,
) -> CompareResult:
    s_pdf = spark_df.toPandas()
    if oracle_sql is None:
        # rows-only: the driver still needs a materializable result;
        # reject driver-unhashable cells here too, to be safe.
        try:
            canonical_frame(s_pdf)
        except ComplexCellError as e:
            return CompareResult(name, False, len(s_pdf), None, f"(rows-only) {e}")
        return CompareResult(name, True, len(s_pdf), None, "(rows-only)")

    o_pdf = con.execute(oracle_sql).df()

    if sorted(s_pdf.columns) != sorted(o_pdf.columns):
        return CompareResult(
            name, False, len(s_pdf), len(o_pdf),
            f"schema mismatch: spark={sorted(s_pdf.columns)} oracle={sorted(o_pdf.columns)}",
        )
    if len(s_pdf) != len(o_pdf):
        return CompareResult(name, False, len(s_pdf), len(o_pdf), "row count mismatch")

    try:
        cs = canonical_frame(s_pdf)
    except ComplexCellError as e:
        return CompareResult(name, False, len(s_pdf), len(o_pdf), f"spark side: {e}")
    try:
        co = canonical_frame(o_pdf)
    except ComplexCellError as e:
        return CompareResult(name, False, len(s_pdf), len(o_pdf), f"oracle side: {e}")

    if cs != co:
        diffs = [
            f"\n  spark : {a}\n  oracle: {b}"
            for a, b in zip(cs, co)
            if a != b
        ][:max_diff_shown]
        return CompareResult(
            name, False, len(s_pdf), len(o_pdf),
            "value mismatch:" + "".join(diffs),
        )
    return CompareResult(name, True, len(s_pdf), len(o_pdf))
