#!/usr/bin/env python3
"""Registry-wide plan-bloat scan (guide §2.4 / §7.2): build every
registered query's physical plan at a small SF and report Exchange /
Join / Generate / InMemoryTableScan / duplicate-subtree indicators,
sorted by Exchange count. A query whose plan repeats the same scan or
aggregate subtree many times is an unshared-common-subplan candidate
(Catalyst does not share multi-referenced DataFrame pipelines).

r13: counts are over UNIQUE NUMBERED operators of the formatted plan,
not raw substrings — the corpus-tier persist keeps a shared waist's
lineage visible in the tree once per reference (deliberate: fault
tolerance), but the shared InMemoryRelation carries ONE operator id,
so numbered-operator counts reflect actual evaluated work while raw
substring counts would misread sharing as bloat.

Pure plan construction — nothing is executed except queries that
materialize during build (dimension/chain checkpoints, corpus-tier
eager-once actions).

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
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception:
            rows.append((name, -1, -1, -1, -1, "BUILD ERROR"))
            traceback.print_exc(limit=1)
            continue
        # unique numbered operators (shared cached subtrees keep one id)
        ops = dict(re.findall(r"^\((\d+)\) (.+)$", plan, re.M))
        names_by_id = list(ops.values())
        n_ex = sum(1 for o in names_by_id if o.startswith(("Exchange", "BroadcastExchange")))
        n_join = sum(
            1
            for o in names_by_id
            if o.startswith(
                (
                    "SortMergeJoin",
                    "BroadcastHashJoin",
                    "ShuffledHashJoin",
                    "BroadcastNestedLoopJoin",
                    "CartesianProduct",
                )
            )
        )
        n_scan = sum(
            1
            for o in names_by_id
            if o.startswith(("Scan parquet", "Scan ExistingRDD", "InMemoryTableScan"))
        )
        # duplicate-subtree proxy: distinct numbered parquet-scan nodes
        # with identical output/location/filters — real unshared
        # duplication, since a shared cached subtree's scan appears
        # under one id and a different-column scan is a different scan
        blocks = re.split(r"^\(\d+\) ", plan, flags=re.M)
        sigs = [
            tuple(
                ln
                for ln in b.splitlines()
                if ln.startswith(("Output", "Location", "PushedFilters"))
            )
            for b in blocks
            if b.startswith("Scan parquet")
        ]
        dup = len(sigs) - len(set(sigs))
        rows.append((name, n_ex, n_join, n_scan, dup, ""))
    rows.sort(key=lambda r: -r[1])
    print(f"{'query':45s} exch joins scans dupscan")
    for name, n_ex, n_join, n_scan, dup, err in rows[:top_n]:
        print(f"{name:45s} {n_ex:4d} {n_join:5d} {n_scan:5d} {dup:7d} {err}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
