#!/usr/bin/env python3
"""Registry-wide plan-bloat scan (guide §2.4 / §7.2): build every
registered query's physical plan at a small SF and report Exchange /
Join / Generate / InMemoryTableScan / duplicate-subtree indicators,
sorted by Exchange count. A query whose plan repeats the same scan or
aggregate subtree many times is an unshared-common-subplan candidate
(Catalyst does not share multi-referenced DataFrame pipelines).

Pure plan construction — nothing is executed except queries that
localCheckpoint during build.

Usage: python3 scripts/plan_bloat_scan.py [sf_dir] [top_n]
"""

from __future__ import annotations

import os
import re
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    from hive_reflex_spark.session import get_spark
    import __spark_entry__ as e

    spark = get_spark("hive-reflex-plan-bloat")
    qs = e.queries()
    rows = []
    for name in sorted(qs):
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception:
            rows.append((name, -1, -1, -1, -1, "BUILD ERROR"))
            traceback.print_exc(limit=1)
            continue
        n_ex = plan.count("Exchange")
        n_join = sum(
            plan.count(k)
            for k in (
                "SortMergeJoin",
                "BroadcastHashJoin",
                "ShuffledHashJoin",
                "BroadcastNestedLoopJoin",
                "CartesianProduct",
            )
        )
        n_scan = len(re.findall(r"Scan parquet|Scan ExistingRDD|InMemoryTableScan", plan))
        # duplicate-subtree proxy: identical parquet scan lines repeated
        scans = re.findall(r"FileScan parquet [^\[]*", plan)
        dup = len(scans) - len(set(scans))
        rows.append((name, n_ex, n_join, n_scan, dup, ""))
    rows.sort(key=lambda r: -r[1])
    print(f"{'query':45s} exch joins scans dupscan")
    for name, n_ex, n_join, n_scan, dup, err in rows[:top_n]:
        print(f"{name:45s} {n_ex:4d} {n_join:5d} {n_scan:5d} {dup:7d} {err}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
