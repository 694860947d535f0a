#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

The headline set spans every operator family (relational agg/join/window,
tensor matmul, sparsity, dedup LSH, ANN) so a regression in any family
shows up in the per-query seconds.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary",      # scan + grouped multi-agg
    "q03_top_revenue",          # 3-way broadcast join + top-k
    "q07_customer_order_stats", # outer join + agg
    "q11_running_order_totals", # window frames
    "q14_conditional_agg",      # conditional agg (A2 shape)
    "q19_gaps_islands",         # T4 islands
    "q30_coord_matmul_gram",    # J1 coordinate matmul
    "q34_sparsity_analysis",    # A2 flagship
    "q47_jaccard_pairs",        # shingle-collision near-dup join
    "q49_lsh_candidates",       # minhash LSH banding
    "q50_simhash",              # simhash aggregate
    "q52_cosine_topk_arrays",   # ANN array fast path
    "q53_lsh_buckets",          # ANN LSH bucketing
    "q66_attention",            # J6 attention chain
    "q59a_asof_join",           # temporal as-of enrichment
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    from hive_reflex_spark.session import get_spark
    import __spark_entry__ as e

    spark = get_spark("hive-reflex-bench")
    qs = e.queries()

    # Warm the JVM/IO path once with the cheapest query so per-query times
    # measure the plan, not session startup.
    qs["q14_conditional_agg"](spark, sf_dir).collect()

    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count() if name == "q11_running_order_totals" else len(df.collect())
        times[name] = round(time.time() - t0, 3)
        print(f"# {name}: {times[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
