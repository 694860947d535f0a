#!/usr/bin/env python3
"""q246b skew study: the salted shuffle-hash interval join (the
registered plan) measured against the UNSALTED join on (tier, bucket)
as a plain sort-merge join with AQE skew-join splitting enabled — the
comparison q246b's docstring argues from theory (VERDICT r11 item 5).

Both variants compute the identical match set (asserted); only the
physical strategy differs. Usage:

    python scripts/skew_study_q246.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import bench
    from hive_reflex_spark.operators.relational import (
        _IVJ_LONG_CUTOFF_US,
        _IVJ_SALT,
        _ivj_intervals,
        _ivj_probe_buckets,
        _ivj_windows,
        multires_interval_buckets,
    )
    from hive_reflex_spark.session import get_spark

    spark = get_spark("skew-study-q246")
    n_shuffle, _ = bench.configure_for(spark, sf_dir)

    def agg_of(matched):
        return (
            matched.select(
                "event_id", "user_id", "is_long", "window_id", "w_start"
            )
            .distinct()
            .groupBy("window_id", "w_start")
            .agg(
                F.count("*").alias("n_hits"),
                F.sum("is_long").cast("long").alias("n_long_hits"),
                F.countDistinct("user_id").alias("n_users"),
            )
        )

    def salted_shj():
        iv_b = multires_interval_buckets(
            _ivj_intervals(spark, sf_dir), "i_start", "i_end",
            _IVJ_LONG_CUTOFF_US,
        )
        iv_s = iv_b.withColumn(
            "salt",
            F.pmod(F.xxhash64("event_id"), F.lit(_IVJ_SALT)).cast("int"),
        )
        wins_s = _ivj_probe_buckets(_ivj_windows(spark, sf_dir)).select(
            "*",
            F.explode(F.sequence(F.lit(0), F.lit(_IVJ_SALT - 1))).alias(
                "salt"
            ),
        )
        m = iv_s.join(
            wins_s.hint("shuffle_hash"), ["tier", "bucket", "salt"]
        ).filter(
            (F.col("i_start") < F.col("w_end"))
            & (F.col("i_end") >= F.col("w_start"))
        )
        return agg_of(m)

    def unsalted_smj():
        iv_b = multires_interval_buckets(
            _ivj_intervals(spark, sf_dir), "i_start", "i_end",
            _IVJ_LONG_CUTOFF_US,
        )
        wins_b = _ivj_probe_buckets(_ivj_windows(spark, sf_dir))
        m = iv_b.join(wins_b.hint("merge"), ["tier", "bucket"]).filter(
            (F.col("i_start") < F.col("w_end"))
            & (F.col("i_end") >= F.col("w_start"))
        )
        return agg_of(m)

    # same answer? (one check, untimed)
    a = sorted(map(tuple, salted_shj().collect()))
    b = sorted(map(tuple, unsalted_smj().collect()))
    assert a == b, "variants disagree — study invalid"
    print(f"# variants agree: {len(a)} result rows", file=sys.stderr)

    results = {}
    for label, build, aqe in (
        ("salted_shj_aqe_off", salted_shj, "false"),
        ("salted_shj_aqe_on", salted_shj, "true"),
        ("unsalted_smj_aqe_skew", unsalted_smj, "true"),
        ("unsalted_smj_aqe_off", unsalted_smj, "false"),
    ):
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        # make the runtime split actually able to fire at toy scale:
        # default 256 MB threshold never trips on MBs of shuffle
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "1m",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m"
        )
        walls = []
        for _ in range(reps + 1):
            t0 = time.time()
            bench.force_eval(build())
            walls.append(time.time() - t0)
        results[label] = (min(walls[1:]), walls)
        print(
            f"{label}: min {min(walls[1:]):.2f}s "
            f"(cold {walls[0]:.2f}s, reps {['%.2f' % w for w in walls]})"
        )
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "256m",
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
    print(f"# sf_dir={sf_dir} shuffle={n_shuffle} reps={reps}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
