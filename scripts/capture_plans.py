#!/usr/bin/env python3
"""Capture .explain('formatted') for the headline bench queries into
plans/<tag>/<qshort>_<suffix>.txt — the optimization-round evidence files.

Usage: python scripts/capture_plans.py <tag> <suffix> [query ...]
e.g.   python scripts/capture_plans.py r12 before
Bench-identical conditions: same sf_dir/shuffle sizing as bench.py
(df cache ON, partitions from input bytes) so the captured plan is the
one the bench times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r12"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    import bench
    from hive_reflex_spark.io import enable_df_cache
    from hive_reflex_spark.session import get_spark
    import __spark_entry__ as e

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("hive-reflex-plan-capture")
    n_shuffle, _ = bench.configure_for(spark, sf_dir)
    enable_df_cache(table_partitions=2 * n_shuffle)
    qs = e.queries()

    names = sys.argv[3:] or bench.HEADLINE
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    # warm the shared intermediates exactly as bench.py does, so cached
    # inputs appear as InMemoryTableScan in the captured plans
    for warm in ("q49_lsh_candidates", "q47_jaccard_pairs"):
        if warm in qs:
            bench.force_eval(qs[warm](spark, sf_dir))
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        short = name.split("_", 1)[0]
        path = os.path.join(out_dir, f"{short}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} @ {sf_dir} shuffle={n_shuffle}\n")
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
