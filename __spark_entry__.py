"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``hive_reflex_spark`` package; queries register
themselves into ``hive_reflex_spark.registry`` at import time.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import hive_reflex_spark.operators  # noqa: F401,E402  (registers queries)
from hive_reflex_spark.registry import ORACLES, QUERIES  # noqa: E402

# SURVEY §7's minimum end-to-end slice: the A2 sparsity analysis.
FLAGSHIP = "q34_sparsity_analysis"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    name = FLAGSHIP if FLAGSHIP in QUERIES else sorted(QUERIES)[0]
    return QUERIES[name](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-expressible query."""
    return dict(ORACLES)
