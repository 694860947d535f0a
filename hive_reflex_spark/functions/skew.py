"""Skew-handling utilities: salted joins for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; salting is the explicit tool for the pathological case — a join
key whose single value carries a large fraction of all rows (the 100 TB
failure mode where one task runs for hours).

Pattern: replicate the small side SALT_N times, scatter the big side's
hot rows across salts, join on (key, salt) — the hot key's rows spread
over SALT_N tasks instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the big side salted.

    ``small`` is replicated n_salts× (it must be the bounded side); each
    ``big`` row gets an arbitrary salt in [0, n_salts) — the join result
    is identical for any salt assignment, only the task-level spread
    changes. Output columns = big's + small's (minus the duplicate key),
    same as a plain join.

    Only join types whose output is driven by the big side are allowed:
    for right/full/outer, unmatched *small* rows would be emitted once per
    salt replica — silently duplicated output.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)}, got {how!r}: "
            "right/full joins would duplicate unmatched small-side rows "
            "once per salt replica"
        )
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(key), F.monotonically_increasing_id()), F.lit(n_salts))
    )
    salts = small.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias("__salt")
    )
    salted_small = small.crossJoin(F.broadcast(salts))
    out = salted_big.join(salted_small, [key, "__salt"], how)
    return out.drop("__salt")
