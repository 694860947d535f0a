#!/usr/bin/env python3
"""Propose the next driver verification window (advisory).

The driver's correctness harness checks the FIRST 50 registered queries
(`registry.finalize_order`). Queries keep their driver evidence across
rounds, so window slots are wasted on re-checking greens while new
queries wait. This script reads every CORRECTNESS_r*.json and prints a
suggested priority list for `operators/__init__.py`:

1. queries with NO driver row in any round (newest registrations first
   would churn less, but registration order is kept — earlier families
   first);
2. queries whose only evidence is rows-only (weaker signal);
3. hash-green queries, oldest evidence first (stale greens re-confirm
   before fresh ones).

Always review before pasting: keep at least one query per SURVEY §2
family in the window even when everything is green.

Usage: python3 scripts/rotate_window.py [window_size]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    import hive_reflex_spark.operators  # noqa: F401 — registers queries
    from hive_reflex_spark.registry import QUERIES

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    evidence: dict[str, tuple[int, str]] = {}  # name -> (round, kind)
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int("".join(c for c in os.path.basename(path) if c.isdigit()))
        with open(path) as f:
            rows = json.load(f)
        for name, rec in rows.items():
            if rec.get("hash_match"):
                kind = "hash"
            elif rec.get("spark_rows") is not None:
                kind = "rows"
            else:
                continue
            prev = evidence.get(name)
            # keep the NEWEST evidence round (freshness), strongest kind
            if prev is None or rnd > prev[0] or (
                rnd == prev[0] and kind == "hash"
            ):
                evidence[name] = (rnd, kind)

    never = [n for n in QUERIES if n not in evidence]
    rows_only = [n for n in QUERIES if evidence.get(n, (0, ""))[1] == "rows"]
    greens = sorted(
        (n for n in QUERIES if evidence.get(n, (0, ""))[1] == "hash"),
        key=lambda n: evidence[n][0],  # oldest evidence first
    )
    proposal = (never + rows_only + greens)[:size]

    print(f"# {len(never)} never-checked, {len(rows_only)} rows-only, "
          f"{len(greens)} hash-green of {len(QUERIES)} registered")
    print(f"# proposed first-{size} window "
          f"({sum(1 for n in proposal if n in never)} first driver rows):")
    for n in proposal:
        rnd, kind = evidence.get(n, (None, "NEVER"))
        print(f'    "{n}",  # {kind}' + (f" r{rnd:02d}" if rnd else ""))
    return 0


if __name__ == "__main__":
    main()
