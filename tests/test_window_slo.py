"""Pin the standing staleness SLO (r9 verdict #3).

The driver judges only the first 50 registered queries, so with 337
registered rows a full evidence refresh takes ~7 rounds even with zero
additions. The SLO makes backlog-first rotation EXECUTABLE instead of a
per-round verdict ask: whenever any row's newest driver evidence is more
than STALE_ROUNDS rounds old, at least min(n_stale, BACKLOG_QUOTA) window
slots go to the stalest rows before new registrations claim space.

Two layers:
- unit: the quota/budget/stale-ordering math in scripts/rotate_window.py;
- integration: the CURRENT finalize_order window, scored against the
  repo's real CORRECTNESS_r*.json history, must satisfy the quota — a
  future rotation that starves the backlog fails here loudly.
"""

from __future__ import annotations

import glob
import importlib.util
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SCRIPT = os.path.join(_ROOT, "scripts", "rotate_window.py")
_spec = importlib.util.spec_from_file_location("rotate_window", _SCRIPT)
rotate_window = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("rotate_window", rotate_window)
_spec.loader.exec_module(rotate_window)


def test_backlog_quota_math():
    assert rotate_window.backlog_quota(0) == 0
    assert rotate_window.backlog_quota(10) == 10
    assert rotate_window.backlog_quota(35) == 35
    # more stale rows than the floor: quota stays the floor (the rest
    # queue for the next round), leaving slots for changed code
    assert rotate_window.backlog_quota(200) == 35


def test_new_registration_budget():
    # no backlog -> new registrations may fill the window
    assert rotate_window.new_registration_budget(0) == 50
    # saturated backlog -> at most 15 new entries per round
    assert rotate_window.new_registration_budget(35) == 15
    assert rotate_window.new_registration_budget(300) == 15


def test_stale_rows_ordering_and_threshold():
    latest = {"a": 2, "b": 4, "c": 5, "d": 9, "e": 1}
    # at round 10: age > 5 means latest < 5 -> a(2), b(4), e(1); stalest first
    assert rotate_window.stale_rows(latest, 10) == ["e", "a", "b"]
    # boundary: exactly 5 rounds old is NOT stale
    assert rotate_window.stale_rows({"x": 5}, 10) == []
    assert rotate_window.stale_rows({"x": 4}, 10) == ["x"]


def _latest_evidence() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json"))):
        rnd = int("".join(c for c in os.path.basename(path) if c.isdigit()))
        with open(path) as f:
            rows = json.load(f)
        for name, rec in rows.items():
            if rec.get("hash_match") is not None or rec.get(
                "spark_rows"
            ) is not None:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def test_current_window_satisfies_slo():
    """The registry's live first-50 must honor the quota against the real
    evidence history — this is the executable form of the rule."""
    import hive_reflex_spark.operators  # noqa: F401 — registers queries
    from hive_reflex_spark.registry import QUERIES

    latest = _latest_evidence()
    assert latest, "no CORRECTNESS_r*.json evidence found"
    next_round = max(latest.values()) + 1
    stale = set(rotate_window.stale_rows(latest, next_round))
    quota = rotate_window.backlog_quota(len(stale))

    window = list(QUERIES)[: rotate_window.WINDOW_SIZE]
    in_window_stale = [n for n in window if n in stale]
    assert len(in_window_stale) >= quota, (
        f"window gives {len(in_window_stale)} slots to the "
        f"{len(stale)}-row backlog; SLO requires >= {quota}"
    )

    # and new registrations must fit the residual budget
    never = [n for n in window if n not in latest]
    assert len(never) <= rotate_window.new_registration_budget(len(stale)), (
        f"{len(never)} never-checked entries exceed the registration budget"
    )
