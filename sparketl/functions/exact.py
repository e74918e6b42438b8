"""Exact (order-independent) floating aggregates.

A double sum's low bits depend on accumulation order, which differs
across engines AND across partitionings of the same engine — at 100 TB
the same query on the same data gives different last-decimals run to
run.  The fixture money columns are exact decimals (verified: price
columns are exact cents, discount/tax exact 1e-4), so we sum them as
scaled integers — bit-exact, order-independent, and shuffle-plan
independent:

    sum(x)      = sum(cast(round(x * 10^s) as bigint)) / 10^s
    sum(x*y)    = decompose into exact-scale integer sums per term

Each ``round(x * 10^s)`` recovers the exact integer because the true
scaled value is an integer < 2^53 and the double is within ulp of it.
Spark's long sums and DuckDB's hugeint sums are both exact; the final
divisions are mirrored literally so the doubles come out bit-identical.

**Do NOT wrap these results in round(x, d).**  The outputs are already
bit-identical, and ``round(x, 6)`` is itself engine-divergent once
``|x| * 10^6`` approaches 2^53 (~ |x| > 1e9): DuckDB rounds by float
scaling (multiply, rint, divide) while Spark rounds on the exact
decimal expansion of the double — the last kept digit can differ
(observed on the Q1 sum_charge at sf0.1).  General §5 policy refined:
``round(expr, d)`` is safe only while ``|expr| * 10^d << 2^53``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def exact_sum(c: str | Column, decimals: int = 2) -> Column:
    """Order-independent sum of a fixed-decimal double column."""
    scale = float(10**decimals)
    return F.sum(F.round(_col(c) * scale).cast("bigint")) / scale


def exact_sum_sql(expr: str, decimals: int = 2) -> str:
    """SQL mirror of :func:`exact_sum` (hugeint/double ≡ long/double
    because the integer sum is exact and < 2^53).  The divisor is cast
    to double explicitly — a bare ``100.0`` literal is DECIMAL in both
    Spark-ANSI and DuckDB and would flip the result type.  The string
    is portable: it runs identically on spark.sql and DuckDB."""
    scale = 10**decimals
    return (
        f"sum(cast(round(({expr}) * {scale}) as bigint)) / cast({scale} as double)"
    )


def exact_avg(c: str | Column, decimals: int = 2) -> Column:
    """Order-independent mean: exact sum / count, mirrored literally."""
    return exact_sum(c, decimals) / F.count("*")


def exact_avg_sql(expr: str, decimals: int = 2) -> str:
    return f"({exact_sum_sql(expr, decimals)}) / count(*)"


def disc_price_sum(ep: str = "l_extendedprice", d: str = "l_discount") -> Column:
    """sum(ep*(1-d)) = sum(ep) - sum(ep*d): cents + micro-units, both
    exact (ep has 2 decimals, d has 4 → ep*d has 6)."""
    return exact_sum(ep, 2) - exact_sum(_col(ep) * _col(d), 6)


def disc_price_sum_sql(ep: str = "l_extendedprice", d: str = "l_discount") -> str:
    return f"({exact_sum_sql(ep, 2)}) - ({exact_sum_sql(f'{ep} * {d}', 6)})"


def charge_sum(
    ep: str = "l_extendedprice", d: str = "l_discount", t: str = "l_tax"
) -> Column:
    """sum(ep*(1-d)*(1+t)) = sum(ep) + sum(ep*t) - sum(ep*d) - sum(ep*d*t).

    ep*d*t has 10 decimals; per-row scaled value ≤ ~1e13 < 2^53 and the
    60k-row (and even 6e8-row) sum fits in int64."""
    epc, dc, tc = _col(ep), _col(d), _col(t)
    return (
        exact_sum(epc, 2)
        + exact_sum(epc * tc, 6)
        - exact_sum(epc * dc, 6)
        - exact_sum(epc * dc * tc, 10)
    )


def charge_sum_sql(
    ep: str = "l_extendedprice", d: str = "l_discount", t: str = "l_tax"
) -> str:
    return (
        f"({exact_sum_sql(ep, 2)}) + ({exact_sum_sql(f'{ep} * {t}', 6)})"
        f" - ({exact_sum_sql(f'{ep} * {d}', 6)}) - ({exact_sum_sql(f'{ep} * {d} * {t}', 10)})"
    )
