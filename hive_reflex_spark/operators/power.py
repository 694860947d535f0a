"""Power-model rollup (SURVEY §2A A7) reproducing the reference's
published numbers.

The reference computes per-(mode, domain) power with clock gating
(`tools/power_estimator.py:24-140`) and publishes the results in
`reports/power_estimate.json` (Active 48.8605 mW, Standby 432.54 µW,
DeepSleep 88.096 µW). This module rebuilds the same model as a grouped
aggregate over a (mode × domain) table — the domain constants live in one
Python dict that generates BOTH the Spark DataFrame and the DuckDB VALUES
oracle, and the pytest golden asserts the published totals to the µW.

Formula per (mode, domain):
  gated (clock_gated and activity == 0):  base · 0.01 · V²
  running: base · activity · V² · (f/100) + base · 0.05 · V²
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_reflex_spark.registry import query

# (domain, base_power_mw, clock_gated) — power_estimator.py:38-45
DOMAINS = [
    ("cim_core", 25.0, True),
    ("sparse_mac", 15.0, True),
    ("dvfs_ctrl", 5.0, True),
    ("riscv_cpu", 8.0, True),
    ("uart", 2.0, True),
    ("wakeup", 0.01, False),
]

# mode -> (voltage, frequency_mhz, {domain: activity}) — :53-92
MODES = {
    "Active": (1.0, 100, {"cim_core": 1.0, "sparse_mac": 0.8, "dvfs_ctrl": 0.1,
                          "riscv_cpu": 1.0, "uart": 0.3, "wakeup": 1.0}),
    "Standby": (0.6, 10, {"cim_core": 0.0, "sparse_mac": 0.0, "dvfs_ctrl": 0.1,
                          "riscv_cpu": 0.1, "uart": 0.0, "wakeup": 1.0}),
    "DeepSleep": (0.4, 1, {"cim_core": 0.0, "sparse_mac": 0.0, "dvfs_ctrl": 0.0,
                           "riscv_cpu": 0.0, "uart": 0.0, "wakeup": 1.0}),
}


def power_rows() -> list[tuple]:
    return [
        (mode, d, base, gated, v, float(f), act[d])
        for mode, (v, f, act) in MODES.items()
        for d, base, gated in DOMAINS
    ]


def _values_sql() -> str:
    rows = ", ".join(
        f"('{m}', '{d}', {b!r}, {str(g).lower()}, {v!r}, {f!r}, {a!r})"
        for m, d, b, g, v, f, a in power_rows()
    )
    return (
        f"(VALUES {rows}) AS pd(mode, domain, base_mw, clock_gated, "
        "voltage, freq_mhz, activity)"
    )


@query(
    "q79_power_rollup",
    oracle=f"""
    SELECT mode,
           ROUND(SUM(CASE WHEN clock_gated AND activity = 0
                     THEN base_mw * 0.01 * voltage * voltage
                     ELSE base_mw * activity * voltage * voltage
                          * (freq_mhz / 100.0)
                          + base_mw * 0.05 * voltage * voltage END), 6)
               AS total_mw,
           COUNT(*) AS n_domains,
           CAST(SUM(CASE WHEN clock_gated AND activity = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_gated
    FROM {_values_sql()}
    GROUP BY mode
    """,
)
def q79_power_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clock-gated power rollup (A7): Σ over domains of
    base·activity·V²·f + static, with gated domains at 1% static — must
    reproduce `reports/power_estimate.json` exactly (Active 48.8605 mW,
    DeepSleep 0.088096 mW; golden-asserted in tests)."""
    pd_df = spark.createDataFrame(
        power_rows(),
        "mode string, domain string, base_mw double, clock_gated boolean, "
        "voltage double, freq_mhz double, activity double",
    )
    gated = F.col("clock_gated") & (F.col("activity") == 0)
    v2 = F.col("voltage") * F.col("voltage")
    p = F.when(gated, F.col("base_mw") * 0.01 * v2).otherwise(
        F.col("base_mw") * F.col("activity") * v2 * (F.col("freq_mhz") / 100.0)
        + F.col("base_mw") * 0.05 * v2
    )
    return pd_df.groupBy("mode").agg(
        F.round(F.sum(p), 6).alias("total_mw"),
        F.count("*").alias("n_domains"),
        F.sum(gated.cast("int")).cast("long").alias("n_gated"),
    )
