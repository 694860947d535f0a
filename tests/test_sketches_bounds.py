"""Invariant tests for the round-8 sketch/bounds additions:

- q265 HLL rollup-merge: day registers MERGED from hour registers must be
  bit-identical to day registers built directly from the raw events (the
  mergeability property the rollup relies on), and the estimate error
  must sit inside the m=256 design band.
- q266 TPUT top-k: the deterministic bounds must contain the true count
  on every reported row (worst-case guarantee, not in-expectation).
- q267 BLEU candidate score: exact-integer clipped counts and the 6dp
  score must match an independent pure-Python recomputation.
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_hll_rollup_merge_equals_direct_build(spark):
    """max-over-hours of hour-registers == registers built in one pass:
    the property that lets a sketch cube roll up without rescanning."""
    from hive_reflex_spark.io import read_table
    from hive_reflex_spark.operators.analytics import hll_registers

    events = read_table(spark, SF_SMOKE, "events")
    keyed = events.select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        F.hour("ts").cast("long").alias("hr"),
        "user_id",
    )
    via_hours = (
        hll_registers(keyed, ["event_type", "day", "hr"])
        .groupBy("event_type", "day", "bucket")
        .agg(F.max("m_j").alias("m_j"))
    )
    direct = hll_registers(keyed, ["event_type", "day"])
    assert via_hours.exceptAll(direct).count() == 0
    assert direct.exceptAll(via_hours).count() == 0


def test_hll_rollup_estimate_in_design_band(spark):
    from hive_reflex_spark.operators.analytics import q265_hll_sketch_rollup

    rows = q265_hll_sketch_rollup(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["n_hours"] >= 1
        assert r["hll_users"] >= 1
        # rsd ~ 1.04/sqrt(256) = 6.5%; allow 5 sigma for small groups
        assert r["rel_error"] <= 0.33, (r["event_type"], r["day"], r)


def test_tput_bounds_contain_truth(spark):
    """TPUT's worst-case guarantee: lb <= true <= ub on EVERY row, and the
    rows arrive ordered by lb."""
    from hive_reflex_spark.operators.text import q266_tput_topk_bounds

    rows = q266_tput_topk_bounds(spark, SF_SMOKE).collect()
    assert rows
    last_lb = None
    for r in rows:
        assert r["lb"] <= r["true_cnt"] <= r["ub"], r
        assert r["in_bounds"] == 1
        if last_lb is not None:
            assert r["lb"] <= last_lb
        last_lb = r["lb"]


def test_bleu_score_matches_python(spark):
    """Recompute every output pair's clipped counts and score in pure
    Python from the raw parquet — exact integers, 6dp score parity."""
    from hive_reflex_spark.operators.dedup import q267_bleu_candidate_score

    got = q267_bleu_candidate_score(spark, SF_SMOKE).collect()
    assert got
    texts = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{SF_SMOKE}/documents.parquet'"
        ).fetchall()
    )
    for r in got:
        wa = texts[r["doc_a"]].split(" ")
        wb = texts[r["doc_b"]].split(" ")
        ua, ub_ = Counter(wa), Counter(wb)
        ba = Counter(zip(wa, wa[1:]))
        bb = Counter(zip(wb, wb[1:]))
        m1 = sum(min(c, ub_[g]) for g, c in ua.items())
        m2 = sum(min(c, bb[g]) for g, c in ba.items())
        assert (m1, m2) == (r["m1"], r["m2"]), r
        assert (len(wa), len(wb)) == (r["len_a"], r["len_b"])
        p1 = m1 * 1.0 / len(wa)
        p2 = m2 * 1.0 / max(len(wa) - 1, 1)
        f = 0.0 if p1 + p2 == 0 else (2 * p1 * p2) / (p1 + p2)
        bp = min(1.0, len(wa) * 1.0 / len(wb))
        assert math.isclose(r["bleu2"], round(f * bp, 6), abs_tol=1e-9), r


def test_bleu_score_bounds_and_saturation(spark):
    """bleu2 must sit in [0, 1] on every pair, and saturate at exactly
    1.0 precisely when clipping and brevity both saturate (full clipped
    overlap at equal length). The fixture's near-dup families are
    MUTATED copies, so scores must be high but strictly below 1."""
    from hive_reflex_spark.operators.dedup import q267_bleu_candidate_score

    rows = q267_bleu_candidate_score(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["bleu2"] <= 1.0, r
        saturated = (
            r["m1"] == r["len_a"]
            and r["m2"] == max(r["len_a"] - 1, 1)
            and r["len_a"] == r["len_b"]
        )
        assert (r["bleu2"] == 1.0) == saturated, r
    # LSH candidates are near-dups: the score should reflect that
    assert max(r["bleu2"] for r in rows) >= 0.5


def test_stream_hll_registers_equal_batch(spark):
    """q265a's streaming register table (micro-batched groupBy MAX in
    complete mode) must be row-identical to the same registers computed
    in one batch pass — MAX is the mergeable combine, so chunking cannot
    change the state."""
    from hive_reflex_spark.streaming.ops import q265a_stream_hll_registers
    from hive_reflex_spark.io import read_table
    from hive_reflex_spark.operators.analytics import hll_registers

    got = q265a_stream_hll_registers(spark, SF_SMOKE)
    batch = hll_registers(
        read_table(spark, SF_SMOKE, "events").select("event_type", "user_id"),
        ["event_type"],
    )
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0
