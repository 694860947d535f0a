"""Reusable column-expression builders.

The ``exact_*`` helpers solve SURVEY §7 watch-list #4 (float nondeterminism
in distributed sums): quantize to integer units (cents / 1e-4 units), sum
as BIGINT (order-independent, exact), divide back once. Spark and DuckDB
then produce bit-identical doubles regardless of partitioning/merge order,
so the driver's value-hash comparison is stable at any scale factor.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def exact_sum(col: Column, scale: int = 2) -> Column:
    """Order-independent SUM of a fixed-point double column.

    Exact for values with <= ``scale`` meaningful decimals (money, rates).
    """
    p = 10**scale
    return F.sum(F.round(col * p).cast("long")) / float(p)


def exact_sum_window(col: Column, window, scale: int = 2) -> Column:
    """Windowed variant of :func:`exact_sum`."""
    p = 10**scale
    return F.sum(F.round(col * p).cast("long")).over(window) / float(p)


def spark_exact_sum(expr: str, scale: int = 2) -> str:
    """Spark-SQL-text twin of :func:`exact_sum` for F.expr construction.

    Emits the same plan as the Column form (sum(cast(round(x*p) as
    bigint))/p) in ONE parsed string instead of several Py4J round-trips
    — used by hot-path queries where Python-side plan-build time is
    measurable. The ``D`` suffix forces a DOUBLE literal (bare decimal
    literals parse as DECIMAL in Spark SQL and would change the result
    type)."""
    p = 10**scale
    return f"sum(CAST(round(({expr}) * {p}) AS BIGINT)) / {p}.0D"


def duck_exact_sum(expr: str, scale: int = 2) -> str:
    """DuckDB SQL twin of :func:`exact_sum`.

    DuckDB widens integer SUM to HUGEINT — cast back to BIGINT so the arrow
    schema matches Spark's LongType before the final division.
    """
    p = 10**scale
    return f"CAST(SUM(CAST(ROUND(({expr}) * {p}) AS BIGINT)) AS BIGINT) / {p}.0"


def duck_exact_sum_window(expr: str, over: str, scale: int = 2) -> str:
    """DuckDB SQL twin of :func:`exact_sum_window`."""
    p = 10**scale
    return (
        f"CAST(SUM(CAST(ROUND(({expr}) * {p}) AS BIGINT)) OVER {over} AS BIGINT)"
        f" / {p}.0"
    )
