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


# ---------------------------------------------------------------------------
# Flash-I/O strategy advisor (tools/flash_io_benchmark.py:106-256)
# ---------------------------------------------------------------------------

# 8-layer model, sizes in bytes — flash_io_benchmark.py:80-84
LAYER_SIZES = [
    128 * 1024, 64 * 1024, 64 * 1024, 32 * 1024,
    32 * 1024, 16 * 1024, 16 * 1024, 8 * 1024,
]
FLASH_MBPS = 100.0  # :92
CIM_MS = 5.0  # :96
LZ4_MBPS = 300.0  # :103
COMP_RATIO = 2  # :151 (sizes are even -> int(size/2) is exact)
EXIT_RATIO = 0.7  # :174
EXIT_LAYER = 2  # :174

_MS = 1000.0 / (1024.0 * 1024.0)  # bytes -> ms at 1 MB/s


def _layers_values_sql() -> str:
    rows = ", ".join(f"({i}, {s})" for i, s in enumerate(LAYER_SIZES))
    return f"(VALUES {rows}) AS layers(i, s)"


@query(
    "q130_flash_io_strategies",
    oracle=f"""
    WITH layers AS (SELECT i, CAST(s AS BIGINT) AS s,
                           CAST(s // {COMP_RATIO} AS BIGINT) AS cs
                    FROM {_layers_values_sql()}),
         costs AS (SELECT i, s, cs,
                          s * {_MS!r} / {FLASH_MBPS!r} AS fr,
                          cs * {_MS!r} / {FLASH_MBPS!r} AS frc,
                          cs * {_MS!r} / {LZ4_MBPS!r} AS dec
                   FROM layers),
         agg AS (SELECT
             SUM(fr + {CIM_MS!r}) AS base_t,
             CAST(SUM(s) AS BIGINT) AS base_b,
             SUM(CASE WHEN i = 0 THEN fr + {CIM_MS!r}
                      ELSE GREATEST(fr, {CIM_MS!r}) END) AS pipe_t,
             SUM(frc + dec + {CIM_MS!r}) AS comp_t,
             CAST(SUM(cs) AS BIGINT) AS comp_b,
             SUM(CASE WHEN i <= {EXIT_LAYER} THEN fr + {CIM_MS!r}
                      ELSE 0 END) AS early_t,
             SUM(CASE WHEN i <= {EXIT_LAYER} THEN s ELSE 0 END) AS early_b,
             SUM(CASE WHEN i = 0 THEN frc + dec + {CIM_MS!r}
                      WHEN i <= {EXIT_LAYER}
                      THEN GREATEST(frc + dec, {CIM_MS!r}) ELSE 0 END)
                 AS earlyc_t,
             SUM(CASE WHEN i <= {EXIT_LAYER} THEN cs ELSE 0 END) AS earlyc_b,
             SUM(CASE WHEN i = 0 THEN frc + dec + {CIM_MS!r}
                      ELSE GREATEST(frc + dec, {CIM_MS!r}) END) AS fullc_t
             FROM costs),
         strat AS (
             SELECT 'Baseline' AS strategy, base_t AS t,
                    CAST(base_b AS DOUBLE) AS b FROM agg
             UNION ALL
             SELECT 'Pipeline', pipe_t, CAST(base_b AS DOUBLE) FROM agg
             UNION ALL
             SELECT 'Compression', comp_t, CAST(comp_b AS DOUBLE) FROM agg
             UNION ALL
             SELECT 'Cascade',
                    {EXIT_RATIO!r} * early_t + (1 - {EXIT_RATIO!r}) * base_t,
                    {EXIT_RATIO!r} * early_b + (1 - {EXIT_RATIO!r}) * base_b
             FROM agg
             UNION ALL
             SELECT 'AllCombined',
                    {EXIT_RATIO!r} * earlyc_t + (1 - {EXIT_RATIO!r}) * fullc_t,
                    {EXIT_RATIO!r} * earlyc_b + (1 - {EXIT_RATIO!r}) * comp_b
             FROM agg)
    SELECT strategy,
           ROUND(t, 6) AS time_ms,
           ROUND(b, 1) AS flash_bytes,
           ROUND(agg.base_t / t, 6) AS speedup,
           CAST(FLOOR((1 - b / agg.base_b) * 100) AS BIGINT) AS flash_saved
    FROM strat, agg
    ORDER BY strategy
    """,
)
def q130_flash_io_strategies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flash-I/O strategy advisor reproducing the reference's published
    optimization study (`tools/flash_io_benchmark.py:106-256`): the five
    strategies — serial Baseline, flash∥compute Pipeline (per-layer
    max(io, compute)), LZ4 Compression (half the bytes plus decompress
    at 300 MB/s), 70%-early-exit Cascade, and AllCombined — each scored
    for wall time, flash traffic, speedup and bytes saved on the 8-layer
    model at 100 MB/s flash and 5 ms/layer CIM compute. Same
    shared-constants pattern as the power model (q79): one Python table
    generates both engines' inputs, so the advisor's numbers — the ones
    BASELINE.md quotes (pipeline ≈ max(io,compute), LZ4 2×, cascade
    70%@L2) — hash-match DuckDB exactly."""
    layers = spark.createDataFrame(
        [(i, s, s // COMP_RATIO) for i, s in enumerate(LAYER_SIZES)],
        "i int, s long, cs long",
    )
    fr = F.col("s") * _MS / FLASH_MBPS
    frc = F.col("cs") * _MS / FLASH_MBPS
    dec = F.col("cs") * _MS / LZ4_MBPS
    early = F.col("i") <= EXIT_LAYER
    l0 = F.col("i") == 0
    agg = layers.agg(
        F.sum(fr + CIM_MS).alias("base_t"),
        F.sum("s").alias("base_b"),
        F.sum(
            F.when(l0, fr + CIM_MS).otherwise(F.greatest(fr, F.lit(CIM_MS)))
        ).alias("pipe_t"),
        F.sum(frc + dec + CIM_MS).alias("comp_t"),
        F.sum("cs").alias("comp_b"),
        F.sum(F.when(early, fr + CIM_MS).otherwise(0.0)).alias("early_t"),
        F.sum(F.when(early, F.col("s")).otherwise(0)).alias("early_b"),
        F.sum(
            F.when(l0, frc + dec + CIM_MS)
            .when(early, F.greatest(frc + dec, F.lit(CIM_MS)))
            .otherwise(0.0)
        ).alias("earlyc_t"),
        F.sum(F.when(early, F.col("cs")).otherwise(0)).alias("earlyc_b"),
        F.sum(
            F.when(l0, frc + dec + CIM_MS).otherwise(
                F.greatest(frc + dec, F.lit(CIM_MS))
            )
        ).alias("fullc_t"),
    )
    r = EXIT_RATIO
    strat = None
    for name, t, b in [
        ("Baseline", F.col("base_t"), F.col("base_b").cast("double")),
        ("Pipeline", F.col("pipe_t"), F.col("base_b").cast("double")),
        ("Compression", F.col("comp_t"), F.col("comp_b").cast("double")),
        (
            "Cascade",
            r * F.col("early_t") + (1 - r) * F.col("base_t"),
            r * F.col("early_b") + (1 - r) * F.col("base_b"),
        ),
        (
            "AllCombined",
            r * F.col("earlyc_t") + (1 - r) * F.col("fullc_t"),
            r * F.col("earlyc_b") + (1 - r) * F.col("comp_b"),
        ),
    ]:
        row = agg.select(
            F.lit(name).alias("strategy"),
            t.alias("t"),
            b.alias("b"),
            F.col("base_t"),
            F.col("base_b"),
        )
        strat = row if strat is None else strat.unionAll(row)
    return strat.select(
        "strategy",
        F.round("t", 6).alias("time_ms"),
        F.round("b", 1).alias("flash_bytes"),
        F.round(F.col("base_t") / F.col("t"), 6).alias("speedup"),
        F.floor((1 - F.col("b") / F.col("base_b")) * 100)
        .cast("long")
        .alias("flash_saved"),
    ).orderBy("strategy")


# ---------------------------------------------------------------------------
# Per-layer performance profile (simulator/profiler.py + run_profiling.py)
# ---------------------------------------------------------------------------

# MobileNetV1_Tiny layer table — run_profiling.py:17-29 (name, out, in)
PROFILE_LAYERS = [
    ("conv1", 32, 27),
    ("dw1", 1, 9),
    ("pw1", 64, 32),
    ("dw2", 1, 9),
    ("pw2", 128, 64),
    ("fc_out", 10, 512),
]
MACS_PER_CYCLE = 32  # sim_reflex.py:91
MAC_ARRAY = 256  # run_profiling.py:32
FREQ_MHZ = 100


def _profile_values_sql() -> str:
    rows = ", ".join(
        f"({i}, '{n}', {o}, {inp})"
        for i, (n, o, inp) in enumerate(PROFILE_LAYERS)
    )
    return f"(VALUES {rows}) AS pl(i, name, out_dim, in_dim)"


@query(
    "q131_layer_profile",
    oracle=f"""
    SELECT name, 'fc' AS type,
           CAST(CAST(in_dim AS BIGINT) * out_dim AS BIGINT) AS mac_ops,
           CAST(FLOOR(CAST(in_dim AS BIGINT) * out_dim
                      / {MACS_PER_CYCLE!r}) AS BIGINT) AS cycles,
           ROUND(CAST(in_dim AS BIGINT) * out_dim / {MACS_PER_CYCLE!r}
                 / {FREQ_MHZ!r}, 9) AS time_us,
           ROUND(CAST(in_dim AS BIGINT) * out_dim * 1.0
                 / (CAST(in_dim AS BIGINT) * out_dim / {MACS_PER_CYCLE!r}
                    * {MAC_ARRAY}), 6) AS util
    FROM {_profile_values_sql()}
    ORDER BY i
    """,
)
def q131_layer_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-layer cycle-accurate profile reproducing the reference's
    published `simulator/profiling_report.csv` exactly: the simulator
    charges in_dim*out_dim MACs at 32 MACs/cycle (`sim_reflex.py:90-91`)
    and the profiler derives time at 100 MHz and utilization against the
    256-MAC array (`profiler.py:128-143`) — conv1 27 cycles / 0.27 µs,
    dw1 0 cycles (sub-cycle) / 0.0028125 µs, total 507 cycles, util
    12.5 %/layer (= 32/256, the published MobileNet-tiny numbers in
    BASELINE.md). The layer table is the shared constant driving both
    engines; cycles floor to int exactly as the CSV exporter does."""
    layers = spark.createDataFrame(
        [(i, n, o, inp) for i, (n, o, inp) in enumerate(PROFILE_LAYERS)],
        "i int, name string, out_dim int, in_dim int",
    )
    macs = F.col("in_dim").cast("long") * F.col("out_dim")
    cyc_f = macs / float(MACS_PER_CYCLE)
    return (
        layers.select(
            "i",
            "name",
            F.lit("fc").alias("type"),
            macs.alias("mac_ops"),
            F.floor(cyc_f).cast("long").alias("cycles"),
            F.round(cyc_f / FREQ_MHZ, 9).alias("time_us"),
            F.round(macs * 1.0 / (cyc_f * MAC_ARRAY), 6).alias("util"),
        )
        .orderBy("i")
        .drop("i")
    )


# ---------------------------------------------------------------------------
# DVFS auto-scale governor (imc22_sdk/imc22_dvfs.c)
# ---------------------------------------------------------------------------

# Hysteresis thresholds — imc22_dvfs.c:15-16 defaults (uint8 scale 0-255)
DVFS_UTIL_HIGH = 200
DVFS_UTIL_LOW = 50
# mode ladder, imc22_dvfs.c:90-101: DEEPSLEEP (0.4 V, 1 MHz) < STANDBY
# (0.6 V, 10 MHz) < ACTIVE (1.0 V, 100 MHz); reset state = ACTIVE (:21-22)
DVFS_FREQ_MHZ = (1, 10, 100)
DVFS_MV = (400, 600, 1000)
DVFS_N_DEVICES = 4
DVFS_UTIL_SCALE = 25  # events/hour -> 0-255 utilization counter


def dvfs_mode_trajectory(hourly, key_col: str, order_col: str):
    """Per-device replay of the DVFS auto-scale governor: each tick's
    utilization counter steps the mode ladder UP one level when util
    crosses `util_threshold_high`, DOWN one when it falls below
    `util_threshold_low`, and HOLDS otherwise (the hysteresis band that
    prevents mode thrash, `imc22_dvfs.c:52-53` threshold register).

    The recurrence input is the per-tick AGGREGATE — O(hours) rows per
    device, not O(events) — so the sequential replay is planner-scale
    while the utilization count runs distributed; devices recur in
    parallel. Integer state only → engine-exact (recursive-CTE oracle
    in q136)."""
    import pandas as pd

    schema = f"{hourly.schema.simpleString()[7:-1]},mode:int"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        m = 2  # reset state: ACTIVE
        out = []
        for util in pdf["util"]:
            if util >= DVFS_UTIL_HIGH:
                m = min(2, m + 1)
            elif util < DVFS_UTIL_LOW:
                m = max(0, m - 1)
            out.append(m)
        pdf["mode"] = out
        return pdf

    return hourly.groupBy(key_col).applyInPandas(fn, schema)


@query(
    "q136_dvfs_governor",
    oracle=f"""
    WITH RECURSIVE hourly AS MATERIALIZED (
        SELECT user_id % {DVFS_N_DEVICES} AS device,
               strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS h,
               COUNT(*) AS n,
               CAST(LEAST(255, COUNT(*) * {DVFS_UTIL_SCALE}) AS INTEGER)
                   AS util
        FROM events GROUP BY 1, 2),
    seq AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY device ORDER BY h) AS rn
        FROM hourly),
    ctl AS (
        SELECT device, CAST(NULL AS VARCHAR) AS h, 0 AS rn,
               CAST(0 AS BIGINT) AS n, CAST(0 AS INTEGER) AS util,
               2 AS mode
        FROM (SELECT DISTINCT device FROM seq)
        UNION ALL
        SELECT s.device, s.h, s.rn, s.n, s.util,
               CASE WHEN s.util >= {DVFS_UTIL_HIGH}
                    THEN LEAST(2, c.mode + 1)
                    WHEN s.util < {DVFS_UTIL_LOW}
                    THEN GREATEST(0, c.mode - 1)
                    ELSE c.mode END
        FROM seq s JOIN ctl c ON s.device = c.device AND s.rn = c.rn + 1)
    SELECT device, h AS window_start, n, util,
           CAST(mode AS INTEGER) AS mode,
           CAST(CASE mode WHEN 2 THEN 100 WHEN 1 THEN 10 ELSE 1 END
                AS INTEGER) AS freq_mhz,
           CAST(CASE mode WHEN 2 THEN 1000 WHEN 1 THEN 600 ELSE 400 END
                AS INTEGER) AS mv
    FROM ctl WHERE rn >= 1
    """,
)
def q136_dvfs_governor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DVFS governor trajectory (`imc22_sdk/imc22_dvfs.c`): per device,
    hourly event counts become the 0-255 utilization counter, and the
    auto-scale hysteresis (up at >= 200, down at < 50, hold in the
    band — the DVFS_THRESHOLD register packing at :52-53) walks the
    DeepSleep/Standby/Active ladder from the ACTIVE reset state; output
    maps each tick's mode to its published voltage/frequency operating
    point. Same aggregate-then-replay split as q108: the count is the
    only event-scale work."""
    from hive_reflex_spark.io import read_table

    events = read_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        (F.col("user_id") % DVFS_N_DEVICES).alias("device"),
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
        .alias("window_start"),
    ).agg(
        F.count("*").alias("n"),
        F.least(F.lit(255), F.count("*") * DVFS_UTIL_SCALE)
        .cast("int")
        .alias("util"),
    )
    traj = dvfs_mode_trajectory(hourly, "device", "window_start")
    mode = F.col("mode")
    return traj.select(
        "device",
        "window_start",
        "n",
        "util",
        mode.cast("int").alias("mode"),
        F.when(mode == 2, DVFS_FREQ_MHZ[2])
        .when(mode == 1, DVFS_FREQ_MHZ[1])
        .otherwise(DVFS_FREQ_MHZ[0])
        .cast("int")
        .alias("freq_mhz"),
        F.when(mode == 2, DVFS_MV[2])
        .when(mode == 1, DVFS_MV[1])
        .otherwise(DVFS_MV[0])
        .cast("int")
        .alias("mv"),
    )
