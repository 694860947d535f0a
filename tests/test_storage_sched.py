"""Tests for the SDK-parity additions: NVS log compaction (q135), the
DVFS hysteresis governor (q136), RTL pruning config (q137), scheduler
ASAP/ALAP levels (q138), SCD2 validity intervals (q139), and ROLLUP
grouping ids (q140)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from hive_reflex_spark.io import read_table
from hive_reflex_spark.operators.compiler import (
    q137_rtl_prune,
    q138_schedule_levels,
)
from hive_reflex_spark.operators.power import (
    DVFS_UTIL_HIGH,
    DVFS_UTIL_LOW,
    dvfs_mode_trajectory,
    q136_dvfs_governor,
)
from hive_reflex_spark.operators.storage import (
    ITEM_HEADER,
    q135_nvs_compaction,
)


# ---------------------------------------------------------------- q135


def test_nvs_compaction_conserves_bytes_and_writes(spark):
    """Per key: live + reclaimed == total appended bytes; write counts
    reconcile with the raw log; a dead key reclaims everything."""
    out = q135_nvs_compaction(spark, SF_SMOKE).cache()
    events = read_table(spark, SF_SMOKE, "events")

    assert out.agg(F.sum("n_writes")).first()[0] == events.count()

    total_bytes = events.agg(
        F.sum(F.lit(ITEM_HEADER) + F.octet_length("props"))
    ).first()[0]
    assert (
        out.agg(F.sum(F.col("live_bytes") + F.col("reclaimed_bytes"))).first()[0]
        == total_bytes
    )

    # dead keys carry zero live bytes; live keys carry a plausible item
    assert out.filter(~F.col("live") & (F.col("live_bytes") != 0)).count() == 0
    assert (
        out.filter(F.col("live") & (F.col("live_bytes") < ITEM_HEADER)).count()
        == 0
    )
    out.unpersist()


def test_nvs_compaction_planted_log(spark):
    """Hand log: k1 written twice (second wins), k2 tombstoned last
    (dead, all bytes reclaimed), k3 single write (nothing reclaimed)."""
    log = spark.createDataFrame(
        [
            ("k1", 1, False, 100),
            ("k1", 4, False, 120),
            ("k2", 2, False, 80),
            ("k2", 5, True, 50),
            ("k3", 3, False, 64),
        ],
        "key string, seq long, tombstone boolean, item_bytes int",
    )
    last_tomb = F.max_by("tombstone", "seq")
    last_bytes = F.when(last_tomb, F.lit(0)).otherwise(
        F.max_by("item_bytes", "seq")
    )
    got = {
        r["key"]: r
        for r in log.groupBy("key")
        .agg(
            (~last_tomb).alias("live"),
            last_bytes.alias("live_bytes"),
            (F.sum("item_bytes") - last_bytes).alias("reclaimed"),
        )
        .collect()
    }
    assert got["k1"]["live"] and got["k1"]["live_bytes"] == 120
    assert got["k1"]["reclaimed"] == 100
    assert not got["k2"]["live"] and got["k2"]["live_bytes"] == 0
    assert got["k2"]["reclaimed"] == 130
    assert got["k3"]["live"] and got["k3"]["reclaimed"] == 0


# ---------------------------------------------------------------- q136


def test_dvfs_hand_trajectory(spark):
    """Hysteresis ladder on a crafted utilization sequence, from the
    ACTIVE reset state: high steps up (clamped), low steps down
    (clamped), the band holds."""
    hourly = spark.createDataFrame(
        [(0, f"t{i}", n, u) for i, (n, u) in enumerate(
            [(1, 255), (1, 100), (1, 40), (1, 10), (1, 10),
             (1, 100), (1, 210), (1, 200), (1, 49)]
        )],
        "device long, window_start string, n long, util int",
    )
    traj = dvfs_mode_trajectory(hourly, "device", "window_start")
    got = [r["mode"] for r in traj.orderBy("window_start").collect()]
    #       255→2(hold at top), 100→2, 40→1, 10→0, 10→0(clamp),
    #       100→0(hold), 210→1, 200→2, 49→1
    assert got == [2, 2, 1, 0, 0, 0, 1, 2, 1]


def test_dvfs_governor_invariants(spark):
    """Modes move at most one level per tick; threshold crossings force
    the direction; operating points map the published ladder."""
    out = q136_dvfs_governor(spark, SF_SMOKE).cache()
    w_ok = out.select(
        "device", "window_start", "util", "mode", "freq_mhz", "mv"
    )
    assert w_ok.filter(~F.col("mode").isin(0, 1, 2)).count() == 0
    assert (
        w_ok.filter(
            ((F.col("mode") == 2) & (F.col("freq_mhz") != 100))
            | ((F.col("mode") == 1) & (F.col("freq_mhz") != 10))
            | ((F.col("mode") == 0) & (F.col("freq_mhz") != 1))
        ).count()
        == 0
    )
    from pyspark.sql import Window

    w = Window.partitionBy("device").orderBy("window_start")
    with_prev = out.withColumn("prev_mode", F.lag("mode", 1, 2).over(w))
    assert (
        with_prev.filter(
            F.abs(F.col("mode") - F.col("prev_mode")) > 1
        ).count()
        == 0
    )
    # crossing high never steps down; crossing low never steps up
    assert (
        with_prev.filter(
            (F.col("util") >= DVFS_UTIL_HIGH)
            & (F.col("mode") < F.col("prev_mode"))
        ).count()
        == 0
    )
    assert (
        with_prev.filter(
            (F.col("util") < DVFS_UTIL_LOW)
            & (F.col("mode") > F.col("prev_mode"))
        ).count()
        == 0
    )
    out.unpersist()


# ---------------------------------------------------------------- q137


def test_rtl_prune_engine_flags_and_banks(spark):
    """The transformer model strips the Conv engine, the CNN strips the
    transformer accelerator; SRAM sizing satisfies the bank/width
    contract from rtl_pruner.py:36-48."""
    rows = {r["model"]: r for r in q137_rtl_prune(spark, SF_SMOKE).collect()}
    bert, mob = rows["bert_tiny"], rows["mobilenet_v1"]

    assert bert["has_conv"] == 0 and bert["has_transformer"] == 1
    assert bert["has_fc"] == 1 and bert["has_activation"] == 1
    assert bert["n_pruned_engines"] == 1
    assert mob["has_conv"] == 1 and mob["has_transformer"] == 0
    assert mob["has_fc"] == 1 and mob["has_activation"] == 1

    for r in rows.values():
        assert r["sram_num_banks"] >= 1
        total = r["total_sram_kb"] * 1024
        assert r["total_sram_kb"] == r["sram_num_banks"] * 32
        w = r["sram_addr_width"]
        assert 2**w >= total > 2 ** (w - 1) or total == 2**w
        # banks cover the liveness peak
        assert total >= r["peak_bytes"]


# ---------------------------------------------------------------- q138


def test_schedule_levels_dag_contract(spark):
    """ASAP <= ALAP everywhere; slack 0 spans a full critical path;
    the linear CNN has zero slack everywhere while BERT's attention
    fan-out leaves slack on non-critical branches."""
    out = q138_schedule_levels(spark, SF_SMOKE).cache()

    assert out.filter(F.col("slack") < 0).count() == 0
    assert out.filter(
        F.col("is_critical") != (F.col("slack") == 0)
    ).count() == 0

    for model in ("bert_tiny", "mobilenet_v1"):
        m = out.filter(F.col("model") == model)
        t = m.agg(F.max("asap")).first()[0]
        # a critical node exists on EVERY level 0..T (path continuity)
        crit_levels = {
            r["asap"] for r in m.filter("is_critical").collect()
        }
        assert crit_levels == set(range(t + 1))

    # both fixtures' fan-outs re-merge behind the longer branch: no slack
    assert out.filter(F.col("slack") > 0).count() == 0
    out.unpersist()


def test_schedule_levels_diamond_slack(spark):
    """Crafted diamond: a → (b → c) and a → x, both into d. The short
    branch x has slack 1 and is off the critical path; the scheduler
    may defer it one level without stretching the makespan."""
    from hive_reflex_spark.operators.compiler import schedule_levels

    ir = spark.createDataFrame(
        [
            ("m", 0, "a", ["in"], ["ta"]),
            ("m", 1, "b", ["ta"], ["tb"]),
            ("m", 2, "c", ["tb"], ["tc"]),
            ("m", 3, "x", ["ta"], ["tx"]),
            ("m", 4, "d", ["tc", "tx"], ["td"]),
        ],
        "model string, idx int, name string, inputs array<string>, "
        "outputs array<string>",
    )
    got = {r["name"]: r for r in schedule_levels(ir).collect()}
    assert got["a"]["asap"] == 0 and got["a"]["is_critical"]
    assert got["x"]["asap"] == 1 and got["x"]["alap"] == 2
    assert got["x"]["slack"] == 1 and not got["x"]["is_critical"]
    assert got["d"]["asap"] == 3 and got["d"]["is_critical"]
    assert {n for n, r in got.items() if r["is_critical"]} == {
        "a", "b", "c", "d",
    }


# ---------------------------------------------------------------- q139


def test_scd2_intervals_partition_key_history(spark):
    """Validity intervals tile each key's history: versions are dense
    from 1, intervals are adjacent and non-overlapping, at most one
    current row per key, and current/dead agrees with q135's
    compaction verdict."""
    from hive_reflex_spark.operators.storage import q139_scd2_intervals

    out = q139_scd2_intervals(spark, SF_SMOKE).cache()

    from pyspark.sql import Window

    w = Window.partitionBy("key").orderBy("effective_from")
    # adjacency: this version's end + 1 == next version's start
    adj = out.withColumn("nxt_from", F.lead("effective_from").over(w)).filter(
        F.col("nxt_from").isNotNull()
        & (F.col("effective_to") + 1 != F.col("nxt_from"))
    )
    assert adj.count() == 0
    # dense versions, head starts the interval chain
    dense = out.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") != F.col("version_n")
    )
    assert dense.count() == 0
    # exactly the open-ended tail row may be current
    assert out.filter(
        F.col("is_current") & F.col("effective_to").isNotNull()
    ).count() == 0
    per_key_current = (
        out.groupBy("key").agg(F.sum(F.col("is_current").cast("int")).alias("c"))
    )
    assert per_key_current.filter(F.col("c") > 1).count() == 0

    from hive_reflex_spark.operators.storage import q135_nvs_compaction

    live_keys = {
        r["key"] for r in q135_nvs_compaction(spark, SF_SMOKE)
        .filter("live").select("key").collect()
    }
    current_keys = {
        r["key"] for r in out.filter("is_current").select("key").collect()
    }
    assert current_keys == live_keys
    out.unpersist()


# ---------------------------------------------------------------- q140


def test_rollup_grouping_reconciles(spark):
    """ROLLUP emits detail + per-status + grand total; grouping ids tag
    the levels (0/1/3) and each level's counts reconcile."""
    from hive_reflex_spark.operators.relational import q140_rollup_grouping

    rows = q140_rollup_grouping(spark, SF_SMOKE).collect()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r["grouping_id"], []).append(r)
    assert set(by_gid) == {0, 1, 3}
    grand = by_gid[3]
    assert len(grand) == 1 and grand[0]["o_orderstatus"] is None
    total = grand[0]["n_orders"]
    assert sum(r["n_orders"] for r in by_gid[1]) == total
    assert sum(r["n_orders"] for r in by_gid[0]) == total
    # subtotal price reconciles exactly (integer-cent sums)
    assert abs(
        sum(r["total_price"] for r in by_gid[1]) - grand[0]["total_price"]
    ) < 1e-9
