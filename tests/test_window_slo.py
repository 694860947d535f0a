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


def _evidence_paths(root: str) -> list[str]:
    return sorted(
        glob.glob(os.path.join(root, "CORRECTNESS_r*.json")),
        key=lambda p: int(
            "".join(c for c in os.path.basename(p) if c.isdigit())
        ),
    )


def _latest_from(hash_r, rows_r, fail_r) -> dict[str, int]:
    latest: dict[str, int] = {}
    for kind in (hash_r, rows_r, fail_r):
        for name, rnd in kind.items():
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def _assert_slo(scored: list[str], latest: dict[str, int], label: str):
    """Score a window/proposal against the evidence: >= quota slots to
    the stale backlog, and never-checked admissions within budget."""
    next_round = max(latest.values()) + 1
    stale = set(rotate_window.stale_rows(latest, next_round))
    quota = rotate_window.backlog_quota(len(stale))

    in_window_stale = [n for n in scored if n in stale]
    assert len(in_window_stale) >= quota, (
        f"{label} gives {len(in_window_stale)} slots to the "
        f"{len(stale)}-row backlog; SLO requires >= {quota}"
    )
    never = [n for n in scored if n not in latest]
    assert len(never) <= rotate_window.new_registration_budget(len(stale)), (
        f"{label}: {len(never)} never-checked entries exceed the "
        f"registration budget"
    )


def _check_slo(root: str):
    """The executable form of the rule, parameterized over the evidence
    directory so the synthetic-artifact fixture test can replay it.

    The live first-50 is scored UNLESS the newest artifact's key set
    equals that window — i.e. the driver has already judged this exact
    composition, every row in it is fresh by construction, and the thing
    that now owes the quota is the NEXT rotation. In that case score
    ``rotate_window.propose()`` for next_round instead, so a freshly
    landed driver artifact can never red the tree (r10 verdict #1)."""
    import hive_reflex_spark.operators  # noqa: F401 — registers queries
    from hive_reflex_spark.registry import QUERIES

    hash_r, rows_r, fail_r = rotate_window.load_evidence(root)
    latest = _latest_from(hash_r, rows_r, fail_r)
    assert latest, "no CORRECTNESS_r*.json evidence found"

    window = list(QUERIES)[: rotate_window.WINDOW_SIZE]
    paths = _evidence_paths(root)
    with open(paths[-1]) as f:
        newest_keys = set(json.load(f))

    if newest_keys == set(window):
        # window already judged by the newest artifact: score the next
        # rotation the tooling would propose, not the retired window
        proposal = rotate_window.propose(
            list(QUERIES), hash_r, rows_r, fail_r
        )
        _assert_slo(proposal, latest, "rotation proposal")
    else:
        _assert_slo(window, latest, "live window")


def test_current_window_satisfies_slo():
    """The registry's live first-50 must honor the quota against the real
    evidence history — this is the executable form of the rule."""
    _check_slo(_ROOT)


def test_slo_green_after_fresh_driver_artifact(tmp_path):
    """Dropping a driver artifact whose keys equal the current window
    must NOT red the tree (r10's 401/402): replay the SLO check against
    a copy of the real evidence plus a synthetic next-round artifact
    covering exactly the live first-50."""
    import shutil

    import hive_reflex_spark.operators  # noqa: F401 — registers queries
    from hive_reflex_spark.registry import QUERIES

    paths = _evidence_paths(_ROOT)
    for p in paths:
        shutil.copy(p, tmp_path / os.path.basename(p))
    newest_round = int(
        "".join(c for c in os.path.basename(paths[-1]) if c.isdigit())
    )

    # the check must hold BEFORE the synthetic artifact...
    _check_slo(str(tmp_path))

    window = list(QUERIES)[: rotate_window.WINDOW_SIZE]
    synthetic = {
        n: {"hash_match": True, "spark_rows": 1, "oracle_rows": 1}
        for n in window
    }
    art = tmp_path / f"CORRECTNESS_r{newest_round + 1:02d}.json"
    art.write_text(json.dumps(synthetic))

    # ...and AFTER it lands, with zero code changes in between
    _check_slo(str(tmp_path))
