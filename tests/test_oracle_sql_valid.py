"""Every registered oracle must at least PLAN in DuckDB — a seconds-fast
net for SQL typos/dialect slips that otherwise only surface in the
driver's full parity run (or worse, in CORRECTNESS_r{N} as an err)."""

from __future__ import annotations

import duckdb
import pytest

import hive_reflex_spark.operators  # noqa: F401 — registers queries
from hive_reflex_spark.io import TABLES
from hive_reflex_spark.registry import ORACLES
from tests.conftest import SF_SMOKE as SF


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def test_every_oracle_plans_in_duckdb(con):
    bad = {}
    for name, sql in ORACLES.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as ex:  # noqa: BLE001 — collect all failures
            bad[name] = str(ex).splitlines()[0]
    assert not bad, bad


def test_oracle_coverage_ratio():
    """Rows-only queries stay the justified exceptions, not a leak."""
    from hive_reflex_spark.registry import QUERIES

    rows_only = set(QUERIES) - set(ORACLES)
    assert rows_only <= {
        "q28_approx_distinct",      # HLL sketch — engine-specific
        "q68_lstm_hidden",          # float recurrence — numpy pytest
                                    # oracle (q68a/q68b are the
                                    # hash-checked fixed-point twins)
    }, rows_only


def test_driver_window_fully_oracled():
    """The driver hash-checks only the FIRST 50 registered queries — a
    rows-only query sitting in a window slot would burn judged evidence
    on the weaker check. Every slot must carry an oracle."""
    from hive_reflex_spark.registry import QUERIES

    window = list(QUERIES)[:50]
    missing = [n for n in window if n not in ORACLES]
    assert not missing, f"rows-only queries occupy driver slots: {missing}"
