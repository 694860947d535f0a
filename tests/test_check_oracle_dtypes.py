"""Pin the arrow-dtype parity guard in scripts/check_oracle.py.

CORRECTNESS_r08 background: q273 was value-identical in both engines yet
driver hash-red, because Spark typed a bare-decimal-literal CASE as
decimal(6,6) while DuckDB's arrow output was decimal128(7,6) — the driver
hash is arrow-type-sensitive while check_oracle's value canonicalization
(Decimal -> rounded float) was not. These tests prove the hardened harness
rejects that class pre-driver:

- a deliberately DECIMAL-typed query goes red (both the decimal ban and
  the dtype diff fire),
- a dtype mismatch with equal values (double vs int64) goes red,
- the fixed q273 expression shape maps to DOUBLE on both engines.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb

_SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "check_oracle.py",
)
_spec = importlib.util.spec_from_file_location("check_oracle", _SCRIPT)
check_oracle = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("check_oracle", check_oracle)
_spec.loader.exec_module(check_oracle)


def _probe(spark, spark_sql: str, duck_sql: str):
    sdf = spark.sql(spark_sql)
    con = duckdb.connect()
    try:
        return check_oracle.arrow_dtype_check(sdf, con, duck_sql)
    finally:
        con.close()


def test_decimal_output_is_rejected(spark):
    """A bare decimal literal (exactly q273's r8 bug shape) must fail."""
    fails = _probe(
        spark,
        "SELECT CASE WHEN 1 = 1 THEN 0.123456 END AS theory_p",
        "SELECT CASE WHEN 1 = 1 THEN 0.123456 END AS theory_p",
    )
    assert any("DECIMAL" in f for f in fails), fails


def test_decimal_on_one_side_only_is_rejected(spark):
    """Even a single-engine DECIMAL (hash-divergence risk) is banned."""
    fails = _probe(
        spark,
        "SELECT CAST(0.123456 AS DOUBLE) AS v",
        "SELECT 0.123456 AS v",
    )
    assert any("DECIMAL" in f and "duck" in f for f in fails), fails


def test_dtype_mismatch_with_equal_values_is_rejected(spark):
    """Equal values, different arrow types — the exact driver-vs-local gap."""
    fails = _probe(
        spark,
        "SELECT CAST(1 AS DOUBLE) AS v",
        "SELECT CAST(1 AS BIGINT) AS v",
    )
    assert any("arrow dtypes differ" in f for f in fails), fails


def test_matching_double_passes(spark):
    fails = _probe(
        spark,
        "SELECT CAST(0.123456 AS DOUBLE) AS v, CAST(3 AS BIGINT) AS n",
        "SELECT CAST(0.123456 AS DOUBLE) AS v, CAST(3 AS BIGINT) AS n",
    )
    assert fails == []


def test_q273_output_schema_is_decimal_free(spark, sf_smoke):
    """The fixed q273 emits long/long/long/double/double on the Spark side
    and its oracle probes to the identical arrow schema."""
    import hive_reflex_spark.operators  # noqa: F401 — registers queries
    from hive_reflex_spark.registry import ORACLES, QUERIES

    sdf = QUERIES["q273_lsh_recall_curve"](spark, sf_smoke)
    kinds = dict(sdf.dtypes)
    assert kinds["recall"] == "double"
    assert kinds["theory_p"] == "double"

    con = duckdb.connect()
    try:
        from hive_reflex_spark.io import TABLES

        for t in TABLES:
            p = os.path.join(sf_smoke, f"{t}.parquet")
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        fails = check_oracle.arrow_dtype_check(
            sdf, con, ORACLES["q273_lsh_recall_curve"]
        )
    finally:
        con.close()
    assert fails == []


def test_q273_recall_is_integer_exact_half_up(spark):
    """The recall column comes from (c*2e6 + n) DIV (2n) — pure BIGINT
    integer division on both engines (Spark DIV, DuckDB //), never a
    float intermediate: check the half-up identity at small scale AND at
    a magnitude where a double-division form would lose ulps (>2^53)."""
    row = spark.sql(
        "SELECT ((CAST(1 AS BIGINT) * 2000000 + 3) DIV (2 * 3)) / 1e6 "
        "AS recall"
    ).collect()[0]
    assert row["recall"] == 0.333333
    con = duckdb.connect()
    try:
        d = con.execute(
            "SELECT ((CAST(1 AS BIGINT) * 2000000 + 3) // (2 * 3)) "
            "/ 1000000.0 AS recall"
        ).fetchone()[0]
        # exactness past 2^53: numerator c*2e6 + n ≈ 8.8e18 (> 2^53, still
        # inside BIGINT) — a double intermediate collapses low bits; the
        # integer div must match Python's exact //
        big_c, big_n = (1 << 42) + 1, (1 << 43) + 1
        expected = (big_c * 2000000 + big_n) // (2 * big_n)
        d_big = con.execute(
            f"SELECT (CAST({big_c} AS BIGINT) * 2000000 + {big_n}) "
            f"// (2 * CAST({big_n} AS BIGINT))"
        ).fetchone()[0]
    finally:
        con.close()
    assert d == 0.333333
    assert d_big == expected
    s_big = spark.sql(
        f"SELECT (CAST({big_c} AS BIGINT) * 2000000 + {big_n}) "
        f"DIV (2 * CAST({big_n} AS BIGINT)) AS v"
    ).collect()[0]["v"]
    assert s_big == expected


def test_integer_width_mismatch_is_rejected(spark):
    """int32-vs-int64 is a FAILURE since r11 (verdict #5): the 23 legacy
    diffs the old WARN path tolerated are all cast away and the
    registry scan reports 0, so any new width drift must red the sweep
    instead of riding the driver hash's width-insensitivity."""
    fails = _probe(
        spark,
        "SELECT CAST(1 AS BIGINT) AS v",
        "SELECT CAST(1 AS INTEGER) AS v",
    )
    assert any("arrow dtypes differ" in f for f in fails), fails


def test_nested_integer_width_mismatch_is_rejected(spark):
    """Width exactness must see through nesting too — a list<int32> vs
    list<int64> disagreement is the same hash hazard as a top-level
    one, and the old normalization hid it without even a warning."""
    fails = _probe(
        spark,
        "SELECT array(CAST(1 AS BIGINT)) AS v",
        "SELECT [CAST(1 AS INTEGER)] AS v",
    )
    assert any("arrow dtypes differ" in f for f in fails), fails


def test_nested_decimal_is_rejected(spark):
    """Decimals inside list/struct columns are the same driver-hash
    hazard as top-level ones — the ban must see through nesting."""
    fails = _probe(
        spark,
        "SELECT array(CAST(0.123456 AS DOUBLE)) AS v",
        "SELECT [0.123456] AS v",
    )
    assert any("DECIMAL" in f and "duck" in f for f in fails), fails
