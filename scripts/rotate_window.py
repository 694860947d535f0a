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

# Standing staleness SLO (r9 verdict #3 — executable, not a per-round
# verdict ask): a row is STALE when its newest driver evidence is more
# than STALE_ROUNDS rounds old at the round being planned. Whenever any
# row is stale, at least min(n_stale, BACKLOG_QUOTA) of the window's
# slots go to the stalest backlog rows BEFORE new registrations claim
# space — so a burst of new queries can never starve the refresh cycle
# (r8's process miss). 35-of-50 keeps ~15 slots/round for new + changed
# code while a full 337-row refresh still completes in <=7 rounds.
STALE_ROUNDS = 5
BACKLOG_QUOTA = 35
WINDOW_SIZE = 50


def backlog_quota(n_stale: int, floor: int = BACKLOG_QUOTA) -> int:
    """Minimum window slots owed to the staleness backlog."""
    return min(n_stale, floor)


def stale_rows(
    latest: dict[str, int], next_round: int, stale_after: int = STALE_ROUNDS
) -> list[str]:
    """Names whose newest evidence (any kind) is > stale_after rounds old
    at ``next_round``, stalest first (ties keep dict order)."""
    aged = [
        (rnd, name)
        for name, rnd in latest.items()
        if next_round - rnd > stale_after
    ]
    return [n for _, n in sorted(aged, key=lambda t: t[0])]


def new_registration_budget(n_stale: int, size: int = WINDOW_SIZE) -> int:
    """How many never-checked queries the window may admit this round."""
    return max(0, size - backlog_quota(n_stale))


def load_evidence(
    root: str,
) -> tuple[dict[str, int], dict[str, int], dict[str, int]]:
    """Read every CORRECTNESS_r*.json under ``root`` and return
    (hash_r, rows_r, fail_r): name -> latest round seen per evidence
    kind. A record with hash_match=False is a FAILURE, not weak
    evidence."""
    hash_r: dict[str, int] = {}
    rows_r: dict[str, int] = {}
    fail_r: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int("".join(c for c in os.path.basename(path) if c.isdigit()))
        with open(path) as f:
            rows = json.load(f)
        for name, rec in rows.items():
            if rec.get("hash_match"):
                hash_r[name] = max(hash_r.get(name, 0), rnd)
            elif rec.get("hash_match") is False:
                fail_r[name] = max(fail_r.get(name, 0), rnd)
            elif rec.get("spark_rows") is not None:
                rows_r[name] = max(rows_r.get(name, 0), rnd)
    return hash_r, rows_r, fail_r


def classify(
    queries: list[str],
    hash_r: dict[str, int],
    rows_r: dict[str, int],
    fail_r: dict[str, int],
) -> dict:
    """Bucket the registry by evidence kind — the ONE place the
    classification rules live (propose() and main()'s summary both read
    from here, so they cannot desynchronize). Returns failed / never /
    rows_only / greens (oldest green first) / latest / next_round /
    stale."""
    failed = [n for n in queries
              if n in fail_r and fail_r[n] >= hash_r.get(n, 0)]
    never = [n for n in queries
             if n not in hash_r and n not in rows_r and n not in failed]
    rows_only = [n for n in queries
                 if n in rows_r and n not in hash_r and n not in failed]
    greens = sorted(
        (n for n in queries if n in hash_r and n not in failed),
        key=lambda n: hash_r[n],  # oldest green first
    )
    latest = {
        n: max(hash_r.get(n, 0), rows_r.get(n, 0), fail_r.get(n, 0))
        for n in queries
        if n in hash_r or n in rows_r or n in fail_r
    }
    next_round = max(latest.values(), default=0) + 1
    return {
        "failed": failed,
        "never": never,
        "rows_only": rows_only,
        "greens": greens,
        "latest": latest,
        "next_round": next_round,
        "stale": stale_rows(latest, next_round),
    }


def propose(
    queries: list[str],
    hash_r: dict[str, int],
    rows_r: dict[str, int],
    fail_r: dict[str, int],
    size: int = WINDOW_SIZE,
    cls: dict | None = None,
) -> list[str]:
    """The SLO-satisfying window proposal for the next round, given the
    registry order and the per-kind evidence maps from
    :func:`load_evidence` (pass ``cls`` to reuse an already-computed
    :func:`classify` result instead of re-bucketing).

    Block order (the quota is reserved STRUCTURALLY): failures first
    (regressions always re-verify), then min(n_stale, 35) stalest
    backlog rows, then budget-capped new registrations, then the
    weaker-evidence buckets. Appending the quota block up front (rather
    than only capping `never`) means rows-only/failed entries can never
    crowd the backlog below its reserve."""
    c = cls if cls is not None else classify(queries, hash_r, rows_r, fail_r)
    stale = c["stale"]
    budget = new_registration_budget(len(stale), size)
    # quota slots must go to DISTINCT backlog rows: a stale row that is
    # also failed already re-verifies via the failed block, so slice the
    # quota over the not-yet-admitted remainder (ADVICE r10)
    stale_pending = [n for n in stale if n not in c["failed"]]
    seen: set[str] = set()
    proposal: list[str] = []
    for block in (
        c["failed"],
        stale_pending[: backlog_quota(len(stale))],
        c["never"][:budget],
        c["rows_only"],
        c["greens"],
    ):
        for n in block:
            if n not in seen:
                seen.add(n)
                proposal.append(n)
    return proposal[:size]


def main() -> int:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    import hive_reflex_spark.operators  # noqa: F401 — registers queries
    from hive_reflex_spark.registry import QUERIES

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hash_r, rows_r, fail_r = load_evidence(root)

    c = classify(list(QUERIES), hash_r, rows_r, fail_r)
    failed, never = c["failed"], c["never"]
    rows_only, greens, stale = c["rows_only"], c["greens"], c["stale"]
    budget = new_registration_budget(len(stale), size)
    if len(never) > budget:
        print(f"# SLO: {len(stale)} rows are >{STALE_ROUNDS} rounds stale "
              f"-> new-registration budget {budget}; deferring "
              f"{len(never) - budget} never-checked entries")
    proposal = propose(list(QUERIES), hash_r, rows_r, fail_r, size, cls=c)

    print(f"# {len(failed)} failed-after-green/regressed, "
          f"{len(never)} never-checked, {len(rows_only)} rows-only, "
          f"{len(greens)} hash-green of {len(QUERIES)} registered; "
          f"{len(stale)} stale (SLO quota {backlog_quota(len(stale))})")
    print(f"# proposed first-{size} window "
          f"({sum(1 for n in proposal if n in never)} first driver rows):")
    for n in proposal:
        if n in failed:
            tag = f"FAILED r{fail_r[n]:02d}"
        elif n in hash_r:
            tag = f"hash r{hash_r[n]:02d}"
        elif n in rows_r:
            tag = f"rows r{rows_r[n]:02d}"
        else:
            tag = "NEVER"
        print(f'    "{n}",  # {tag}')
    return 0


if __name__ == "__main__":
    main()
