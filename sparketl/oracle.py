"""Local replica of the driver's DuckDB-oracle correctness check.

The driver (``__spark_entry__.py`` docstring) runs every ``queries()``
entry at sf0.01 and compares against ``oracle_sql()`` via DuckDB on
row-count + schema + order-insensitive value-hash.  This module lets us
run the same gate locally before the driver does (SURVEY.md §5).

Canonicalization: values are rendered to strings (floats via repr so
only bit-identical doubles match — the driver's hash is exact, so we
hold ourselves to exactness, which the round(x, 6)-on-both-sides policy
delivers), rows sorted, columns sorted by name.
"""

from __future__ import annotations

import datetime as dt
import math
from dataclasses import dataclass

import duckdb
import numpy as np

from sparketl.tables import TABLE_NAMES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with the ten fixture views pre-registered, as the
    driver does (``__spark_entry__.py:33-35``)."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"create or replace view {name} as "
            f"select * from read_parquet('{sf_dir.rstrip('/')}/{name}.parquet')"
        )
    return con


def _canon_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        if f == 0.0:
            f = 0.0  # normalize -0.0
        return repr(f)
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, bytes):
        return "0x" + v.hex()
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, np.ndarray):
        return "[" + ",".join(_canon_value(x) for x in v.tolist()) + "]"
    if hasattr(v, "asDict"):  # pyspark Row (struct) — before tuple check
        return _canon_value(v.asDict())
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        items = sorted((str(k), _canon_value(x)) for k, x in v.items())
        return "{" + ",".join(f"{k}:{x}" for k, x in items) + "}"
    # pyspark Row (structs) and anything else
    if hasattr(v, "asDict"):
        return _canon_value(v.asDict())
    return str(v)


def canonical_rows(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
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
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    if oracle_sql is None:
        return CompareResult(name, True, len(s_rows), None, "(rows-only)")

    cur = con.execute(oracle_sql)
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()

    if sorted(s_cols) != sorted(o_cols):
        return CompareResult(
            name, False, len(s_rows), len(o_rows),
            f"schema mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}",
        )
    if len(s_rows) != len(o_rows):
        return CompareResult(name, False, len(s_rows), len(o_rows), "row count mismatch")

    cs = canonical_rows(s_cols, s_rows)
    co = canonical_rows(o_cols, o_rows)
    if cs != co:
        diffs = [
            f"\n  spark : {a}\n  oracle: {b}"
            for a, b in zip(cs, co)
            if a != b
        ][:max_diff_shown]
        return CompareResult(
            name, False, len(s_rows), len(o_rows),
            "value mismatch:" + "".join(diffs),
        )
    return CompareResult(name, True, len(s_rows), len(o_rows))
