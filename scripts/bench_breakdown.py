#!/usr/bin/env python3
"""Per-query wall breakdown for the headline bench set (guide §1):

  build  — Python DataFrame construction (py4j chatter + analysis)
  exec   — noop-sink evaluation of the already-built plan
  jobs   — Spark jobs launched by the evaluation (job-floor multiplier)

Run AFTER bench-style warm-up on a quiet box; prints one TSV line per
query (min over reps for build and exec independently).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import bench
    from hive_reflex_spark.io import TABLES, enable_df_cache, read_table
    from hive_reflex_spark.session import get_spark
    import __spark_entry__ as e

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("BREAKDOWN_REPS", "4"))
    spark = get_spark("hive-reflex-breakdown")
    n_shuffle, aqe = bench.configure_for(spark, sf_dir)
    enable_df_cache(table_partitions=2 * n_shuffle)
    qs = e.queries()

    bench.force_eval(qs["q14_conditional_agg"](spark, sf_dir))
    for t in TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            read_table(spark, sf_dir, t).count()
    for warm in ("q49_lsh_candidates", "q47_jaccard_pairs"):
        bench.force_eval(qs[warm](spark, sf_dir))

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    names = sys.argv[1:] or bench.HEADLINE
    print("query\tbuild_s\texec_s\ttotal_s\tjobs\tstages")
    for name in names:
        builds, execs, jobs_n, stages_n = [], [], 0, 0
        for r in range(reps):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t1 = time.time()
            group = f"bd_{name}_{r}"
            sc.setJobGroup(group, name)
            bench.force_eval(df)
            sc.setJobGroup(None, None)
            t2 = time.time()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            if r == reps - 1:
                ids = tracker.getJobIdsForGroup(group)
                jobs_n = len(ids)
                stages_n = sum(
                    len(tracker.getJobInfo(j).stageIds)
                    for j in ids
                    if tracker.getJobInfo(j) is not None
                )
        print(
            f"{name}\t{min(builds):.3f}\t{min(execs):.3f}"
            f"\t{min(builds) + min(execs):.3f}\t{jobs_n}\t{stages_n}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
