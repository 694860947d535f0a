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


# Rounding an exact 1e-9-unit sum DOWN to 6 decimals with float ROUND is an
# engine-parity trap: when the sum lands on ...500 units the true value sits
# exactly on the 6th-decimal .5 boundary, and Spark (BigDecimal of the
# double's shortest decimal repr, HALF_UP) disagrees with DuckDB (binary
# nearbyint of x*1e6) — observed at sf1 on q66c (1/16384 rows). The safe
# idiom does the half-up AT THE INTEGER LEVEL: out_u = floor((sum_u+500)/
# 1000) is pure BIGINT-exact arithmetic, identical on any engine, and
# out_u/1e6 is the same double everywhere. floor of the IEEE quotient equals
# the true floor for |sum_u| < 2^52 (quotients are never within an ulp of an
# integer unless exact).


def exact_sum_round6(col: Column, in_scale: int = 9) -> Column:
    """Exact sum in 1e-``in_scale`` units, emitted half-up-rounded to 6
    decimals via integer arithmetic (engine-parity-safe)."""
    p_in = 10**in_scale
    div = p_in // 1_000_000
    half = div // 2
    sum_u = F.sum(F.round(col * p_in).cast("long"))
    return F.floor((sum_u + F.lit(half)) / float(div)).cast("long") / 1e6


def spark_exact_sum_round6(expr: str, in_scale: int = 9) -> str:
    """SQL-text twin of :func:`exact_sum_round6`."""
    p_in = 10**in_scale
    div = p_in // 1_000_000
    half = div // 2
    return (
        f"CAST(FLOOR((sum(CAST(round(({expr}) * {p_in}) AS BIGINT))"
        f" + {half}) / {div}.0D) AS BIGINT) / 1000000.0D"
    )


def duck_exact_sum_round6(expr: str, in_scale: int = 9) -> str:
    """DuckDB oracle twin of :func:`exact_sum_round6`."""
    p_in = 10**in_scale
    div = p_in // 1_000_000
    half = div // 2
    return (
        f"CAST(FLOOR((CAST(SUM(CAST(ROUND(({expr}) * {p_in}) AS BIGINT))"
        f" AS BIGINT) + {half}) / {div}.0) AS BIGINT) / 1000000.0"
    )


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
