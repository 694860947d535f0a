#!/usr/bin/env python3
"""Measure how much a PPJoin-style length filter would prune q47's pair
expansion (guide §1: measure before changing the algorithm).

q47 scores pairs by counting shared capped shingles: the expansion emits
one record per (pair, shared shingle), so expansion volume equals the
total intersection mass over all colliding pairs. A LENGTH filter
(J >= 1/2 forces max(na, nb) <= 2 * min(na, nb), since J <= min/max)
can drop a record at generation time using only the sizes the r12
sized-posting layout already carries — no joins, no new index. This
script reports, per SF:

  records_total      — expansion records today (sum over shingles of C(df,2))
  records_kept       — records surviving the length test
  pairs_total        — distinct colliding pairs today
  pairs_kept         — pairs surviving the length test
  pairs_result       — pairs actually passing J >= 0.5 (q47's output)

Usage: python3 scripts/q47_prune_study.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hive_reflex_spark.session import get_spark  # noqa: E402


def study(spark, sf_dir: str) -> None:
    from hive_reflex_spark.operators.dedup import capped_postings

    t0 = time.time()
    grouped = capped_postings(spark, sf_dir).filter(F.size("docs") >= 2)
    pair_expr = F.expr(
        "flatten(transform(docs, (x, i) -> "
        "transform(slice(docs, i + 2, size(docs)), "
        "y -> struct(x.d AS doc_a, x.n AS na, "
        "y.d AS doc_b, y.n AS nb))))"
    )
    recs = grouped.select(F.explode(pair_expr).alias("pr")).select(
        "pr.doc_a", "pr.na", "pr.doc_b", "pr.nb"
    )
    keep = (2 * F.least("na", "nb") >= F.greatest("na", "nb")).cast("long")
    rec_stats = recs.agg(
        F.count("*").alias("records_total"),
        F.sum(keep).alias("records_kept"),
    ).collect()[0]
    pairs = recs.groupBy("doc_a", "na", "doc_b", "nb").agg(
        F.count("*").alias("i")
    )
    jac = F.col("i") * 1.0 / (F.col("na") + F.col("nb") - F.col("i"))
    pair_stats = pairs.agg(
        F.count("*").alias("pairs_total"),
        F.sum(keep).alias("pairs_kept"),
        F.sum((jac >= 0.5).cast("long")).alias("pairs_result"),
    ).collect()[0]
    dt = time.time() - t0
    print(
        f"{sf_dir}: records {rec_stats['records_total']} -> kept "
        f"{rec_stats['records_kept']} "
        f"({100.0 * rec_stats['records_kept'] / max(1, rec_stats['records_total']):.1f}%) | "
        f"pairs {pair_stats['pairs_total']} -> kept {pair_stats['pairs_kept']} "
        f"({100.0 * pair_stats['pairs_kept'] / max(1, pair_stats['pairs_total']):.1f}%) | "
        f"result pairs {pair_stats['pairs_result']} | {dt:.1f}s"
    )


def main() -> int:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/hrs_sf1"]
    spark = get_spark("q47-prune-study")
    for d in dirs:
        study(spark, d)
    return 0


if __name__ == "__main__":
    main()
