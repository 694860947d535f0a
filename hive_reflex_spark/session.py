"""SparkSession builder pinned for determinism and local-mode throughput.

Scale note: every config here is either scale-neutral (timezone, ANSI) or
adaptive (AQE re-plans shuffles at runtime, coalesces small partitions,
splits skewed ones) — the same session config is correct on local[32] and
on a 1000-executor cluster; only `shuffle.partitions` should be raised
(AQE's coalescing makes over-provisioning it cheap).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# pin_session re-asserts its confs every N-th call (see docstring)
_PIN_REASSERT_EVERY = 64


def get_spark(
    app_name: str = "hive-reflex-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with deterministic, scale-ready configs."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Python workers unpickle package-defined UDFs/UDTFs by importing
    # hive_reflex_spark — make that work from ANY driver cwd by putting
    # the package root on the workers' PYTHONPATH (a cluster deployment
    # ships the package via --py-files / pip instead; local workers
    # inherit this env).
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{pp}" if pp else pkg_root
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # AQE: runtime shuffle re-planning, small-partition coalescing and
        # skew-join splitting — the main lever that makes one plan survive
        # a 100x scale-up without retuning.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for all pandas-UDF exchange (the only sanctioned Python path).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # ANSI off: match DuckDB-ish permissive semantics (e.g. no overflow
        # errors on casts) used by the correctness oracle.
        .config("spark.sql.ansi.enabled", "false")
        # bucketed-table warehouse (functions/layout.py) out of the repo tree
        .config("spark.sql.warehouse.dir", "/tmp/hrs_warehouse")
        # local-mode heap: the driver JVM IS the executor; Spark's 1g
        # default OOMs as soon as cached base tables pass a few hundred
        # MB. Only applies when this call creates the JVM; a cluster
        # deployment sizes executors via spark-submit as usual.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"),
        )
    )
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    return builder.master(f"local[{cpus}]").getOrCreate()


def pin_session(spark: SparkSession) -> SparkSession:
    """Pin runtime-settable confs on a session we did not build.

    The driver passes us its own SparkSession; oracle comparisons require
    UTC timestamps regardless of how that session was built, and the
    declared DuckDB-permissive arithmetic semantics (NULL on /0,
    wrap-on-overflow casts) require ANSI mode OFF — a driver session
    built ANSI-on would otherwise throw DIVIDE_BY_ZERO / CAST_OVERFLOW
    on edges every one of the registered queries is exposed to.
    Both confs are runtime-settable (SQLConf), so pinning here covers
    sessions of any provenance; read_table routes every registered
    query through this function.
    """
    # Memoized per session object: the registry wrapper pins on EVERY
    # query build and read_table pins again per table — at 2 py4j RPCs
    # per pin that was ~10-20 ms of pure chatter per bench rep (guide
    # §7.3 driver overhead). The flag lives on the session instance, so
    # a fresh driver session always pins once; nothing in the repo
    # mutates these two confs afterwards (grep-audited r12).
    #
    # Re-assert guard (r13, VERDICT #4): the memo trusts the instance
    # flag, so a caller that re-sets ansi/timezone EXTERNALLY after the
    # first pin would silently run queries unpinned. Every
    # _PIN_REASSERT_EVERY-th call re-runs the two conf sets — 2 RPCs
    # per 64 calls keeps ~98% of the r12 chatter saving while bounding
    # how long an external drift can survive.
    n = getattr(spark, "_hrs_pin_calls", 0)
    spark._hrs_pin_calls = n + 1
    if getattr(spark, "_hrs_pinned", False) and n % _PIN_REASSERT_EVERY:
        return spark
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark._hrs_pinned = True
    return spark
