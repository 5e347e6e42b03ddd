"""Exact-integer arithmetic for cross-engine float determinism.

Summing doubles is order-dependent; Spark's partial aggregation and
DuckDB's parallel aggregation add in different orders, so a raw
``SUM(double)`` differs between engines in the last bits — enough to
break a value-hash comparison. The fix used throughout the query
catalog: scale to an integer BEFORE aggregating.

    round(x * 10^s)  → exact int64 (same in any IEEE engine, since the
                        per-row expression is evaluated in one order)
    SUM(int64)       → exact, order-independent
    /10^s at the end → one exact double division

This is also the right call at 100 TB: integer aggregation is cheaper
than decimal and immune to partial-aggregation reordering under AQE.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_scaled_long(col: Column, scale: int = 2) -> Column:
    """``round(col * 10^scale)`` as long — exact per-row."""
    return F.round(col * F.lit(10**scale)).cast("long")


def sum_money(col: Column, scale: int = 2) -> Column:
    """Order-independent SUM of a fixed-point-ish double column."""
    return (F.sum(to_scaled_long(col, scale)).cast("double") / F.lit(float(10**scale)))


def avg_money(col: Column, scale: int = 2) -> Column:
    """Order-independent AVG (exact integer sum / count)."""
    return (
        F.sum(to_scaled_long(col, scale)).cast("double")
        / F.count(col).cast("double")
        / F.lit(float(10**scale))
    )


def sql_sum_money(expr: str, scale: int = 2, *, duck: bool = True) -> str:
    """The DuckDB-side twin of :func:`sum_money` (ANSI SQL text)."""
    return (
        f"CAST(SUM(CAST(ROUND(({expr}) * {10**scale}) AS BIGINT)) AS DOUBLE)"
        f" / {float(10**scale)}"
    )


def sql_avg_money(expr: str, scale: int = 2) -> str:
    return (
        f"CAST(SUM(CAST(ROUND(({expr}) * {10**scale}) AS BIGINT)) AS DOUBLE)"
        f" / CAST(COUNT({expr}) AS DOUBLE) / {float(10**scale)}"
    )
