"""Canonical-form replays for the REMAINING statistical operators —
completing the r9 verdict #5 sweep beyond its six named queries, so the
stat -> canonical-check inventory covers every statistical query in the
registry (the q295 lesson: engine parity cannot catch a statistic wrong
the same way in both engines).

Stat -> canonical check in this file:

- q116 MAD: numpy interpolated medians of raw values / abs deviations,
  fence count recomputed in floats.
- q154 CUSUM: Page's recursion s_i = max(0, s_(i-1) + x_i - target - k)
  replayed in exact integer units from the raw hourly means (the
  recursion IS the statistic — q289 treatment).
- q169 winsorized/trimmed: numpy clip + mean over exact 1e-6 units with
  the discrete order-statistic fences recomputed independently.
- q183 shrinkage: textbook empirical-Bayes blend
  (sum + k*prior_mean)/(n + k) from raw cell sums.
- q190 time-to-convert: numpy linear-interpolated percentiles over the
  raw per-user view->purchase gaps.
- q191 bot regularity: numpy population mean/std/CV over the raw
  inter-event gap series per user.
- q192 cohort retention: pure-Python cohort triangle recount.
- q196 ABC: Pareto classes from the independently sorted cumulative
  revenue shares.
- q199/q242 Kaplan-Meier: the canonical PRODUCT form S(t) = prod(1-d/n)
  (plain float multiplication) against the queries' exp-of-integer-logs
  construction, with risk sets recounted from raw data.
- q205 basket lift: textbook support/confidence/lift recount from raw
  (user, day, type) baskets.
- q213 CVaR: numpy p95 + tail mean from raw order totals.
- q230 Benford: first-digit recount + math.log10(1 + 1/d).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import numpy as np

from tests.conftest import SF_SMOKE


def _duck(sql: str):
    con = duckdb.connect()
    try:
        return con.execute(sql.replace("$SF", SF_SMOKE)).fetchall()
    finally:
        con.close()


def test_mad_outliers_match_numpy_medians(spark):
    from hive_reflex_spark.operators.analytics import MAD_K, q116_mad_outliers

    rows = {r.event_type: r for r in q116_mad_outliers(spark, SF_SMOKE).collect()}
    vals: dict[str, list[float]] = defaultdict(list)
    for t, v in _duck("SELECT event_type, value FROM '$SF/events.parquet'"):
        vals[t].append(v)
    assert set(vals) == set(rows)
    for t, xs in vals.items():
        a = np.array(xs, dtype=np.float64)
        med = float(np.percentile(a, 50, method="linear"))
        adev = np.abs(a - med)
        mad = float(np.percentile(adev, 50, method="linear"))
        n_out = int((adev > MAD_K * mad).sum())
        r = rows[t]
        assert r.n_events == len(xs)
        assert abs(r.med - med) < 1e-6 and abs(r.mad - mad) < 1e-6
        assert r.n_outliers == n_out
        assert abs(r.outlier_frac - n_out / len(xs)) < 2e-6


def test_cusum_matches_pages_recursion_replay(spark):
    from hive_reflex_spark.operators.analytics import (
        CUSUM_H,
        CUSUM_K,
        CUSUM_TARGET,
        q154_cusum_drift,
    )

    got = defaultdict(list)
    for r in q154_cusum_drift(spark, SF_SMOKE).collect():
        got[r.event_type].append(r)
    hourly = _duck(
        "SELECT event_type, strftime(date_trunc('hour', ts), "
        "'%Y-%m-%d %H:%M:%S') AS h, COUNT(*) AS n, "
        "(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) * 10000)"
        " // CAST(COUNT(*) AS BIGINT) AS m_u "
        "FROM '$SF/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"
    )
    series = defaultdict(list)
    for t, h, n, m_u in hourly:
        series[t].append((h, n, int(m_u)))
    drift = int((CUSUM_TARGET + CUSUM_K) * 1_000_000)
    alarm_at = int(CUSUM_H * 1_000_000)
    assert set(series) == set(got)
    for t, pts in series.items():
        s = 0
        rows = sorted(got[t], key=lambda r: r.window_start)
        assert len(rows) == len(pts)
        for r, (h, n, m_u) in zip(rows, pts):
            s = max(0, s + m_u - drift)  # Page (1954)
            assert r.window_start == h and r.n == n
            assert abs(r.hourly_mean - m_u / 1e6) < 2e-6
            assert abs(r.cusum - s / 1e6) < 2e-6, (t, h)
            assert r.alarm == (s > alarm_at)


def test_winsorized_and_trimmed_means_match_numpy(spark):
    from hive_reflex_spark.operators.analytics import q169_winsorized_stats

    rows = {
        r.event_type: r for r in q169_winsorized_stats(spark, SF_SMOKE).collect()
    }
    units = defaultdict(list)
    for t, u in _duck(
        "SELECT event_type, CAST(ROUND(value * 1000000) AS BIGINT) "
        "FROM '$SF/events.parquet'"
    ):
        units[t].append(int(u))
    for t, us in units.items():
        us.sort()
        n = len(us)
        lo = us[(n * 5 + 99) // 100 - 1]   # smallest u with cum >= ceil
        hi = us[(n * 95 + 99) // 100 - 1]
        a = np.array(us, dtype=np.int64)
        wins = float(np.clip(a, lo, hi).mean()) / 1e6
        inside = a[(a >= lo) & (a <= hi)]
        trim = float(inside.mean()) / 1e6
        r = rows[t]
        assert r.n == n and r.n_kept == len(inside)
        assert abs(r.p05 - lo / 1e6) < 1e-9 and abs(r.p95 - hi / 1e6) < 1e-9
        assert abs(r.winsorized_mean - wins) < 2e-6
        assert abs(r.trimmed_mean - trim) < 2e-6


def test_shrunk_means_match_empirical_bayes_blend(spark):
    from hive_reflex_spark.operators.analytics import (
        _SHRINK_K,
        q183_shrunk_group_means,
    )

    rows = {
        (r.event_type, r.hr): r
        for r in q183_shrunk_group_means(spark, SF_SMOKE).collect()
    }
    cells = _duck(
        "SELECT event_type, CAST(hour(ts) AS INTEGER), COUNT(*), "
        "CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT) "
        "FROM '$SF/events.parquet' GROUP BY 1, 2"
    )
    gu = sum(c[3] for c in cells)
    gn = sum(c[2] for c in cells)
    gmean = gu / 1e6 / gn
    assert {(t, h) for t, h, _, _ in cells} == set(rows)
    for t, h, n, u in cells:
        r = rows[(t, h)]
        assert r.n == n
        assert abs(r.raw_mean - u / 1e6 / n) < 2e-6
        blended = (u / 1e6 + _SHRINK_K * gmean) / (n + _SHRINK_K)
        assert abs(r.shrunk_mean - blended) < 2e-6
        assert abs(r.own_weight - n / (n + _SHRINK_K)) < 2e-6
        # shrinkage property: the blend sits BETWEEN raw and prior
        lo_, hi_ = sorted((r.raw_mean, gmean))
        assert lo_ - 1e-5 <= r.shrunk_mean <= hi_ + 1e-5


def test_time_to_convert_matches_numpy_percentiles(spark):
    from hive_reflex_spark.operators.analytics import q190_time_to_convert

    row = q190_time_to_convert(spark, SF_SMOKE).collect()[0]
    gaps = [
        h
        for (h,) in _duck(
            "WITH v AS (SELECT user_id, MIN(epoch_us(ts)) AS t0 "
            "FROM '$SF/events.parquet' WHERE event_type='view' "
            "GROUP BY user_id), "
            "p AS (SELECT user_id, MIN(epoch_us(ts)) AS t1 "
            "FROM '$SF/events.parquet' WHERE event_type='purchase' "
            "GROUP BY user_id) "
            "SELECT (t1 - t0) / 3600000000.0 FROM v JOIN p USING (user_id) "
            "WHERE t1 >= t0"
        )
    ]
    assert row.n_converters == len(gaps)
    a = np.array(gaps, dtype=np.float64)
    assert abs(row.p50_hours - float(np.percentile(a, 50, method="linear"))) < 2e-6
    assert abs(row.p90_hours - float(np.percentile(a, 90, method="linear"))) < 2e-6
    assert abs(row.min_hours - a.min()) < 2e-6
    assert abs(row.max_hours - a.max()) < 2e-6


def test_bot_regularity_matches_numpy_cv(spark):
    from hive_reflex_spark.operators.analytics import (
        _BOT_MIN_EVENTS,
        q191_bot_regularity,
    )

    rows = {r.user_id: r for r in q191_bot_regularity(spark, SF_SMOKE).collect()}
    raw = _duck(
        "SELECT user_id, epoch_us(ts), event_id FROM '$SF/events.parquet' "
        "ORDER BY user_id, 2, 3"
    )
    by_user = defaultdict(list)
    for uid, t, _ in raw:
        by_user[uid].append(t)
    checked = 0
    for uid, ts in by_user.items():
        gaps = np.array(
            [(b - a) // 1000 for a, b in zip(ts, ts[1:])], dtype=np.float64
        )
        if len(gaps) < _BOT_MIN_EVENTS:
            assert uid not in rows
            continue
        r = rows[uid]
        mean, std = float(gaps.mean()), float(gaps.std())  # population std
        assert r.n == len(gaps)
        assert abs(r.mean_gap_s - mean / 1000) < 2e-5
        assert abs(r.std_gap_s - std / 1000) < 2e-4
        assert abs(r.cv - std / mean) < 2e-5
        assert r.bot_flag == (std / mean < 0.1)
        checked += 1
    assert checked == len(rows) and checked > 0


def test_cohort_retention_matches_python_recount(spark):
    from hive_reflex_spark.operators.analytics import q192_cohort_retention

    got = {
        (r.cohort_week, r.weeks_since): (r.n_active, r.n_cohort)
        for r in q192_cohort_retention(spark, SF_SMOKE).collect()
    }
    wk = 604_800_000_000
    first: dict[int, int] = {}
    weeks = defaultdict(set)
    for uid, t in _duck(
        "SELECT user_id, epoch_us(ts) FROM '$SF/events.parquet'"
    ):
        w = t // wk
        first[uid] = min(first.get(uid, w), w)
        weeks[uid].add(w)
    cohort_size = Counter(first.values())
    expect = Counter()
    for uid, ws in weeks.items():
        for w in ws:
            expect[(first[uid], w - first[uid])] += 1
    assert got == {
        k: (n, cohort_size[k[0]]) for k, n in expect.items()
    }


def test_abc_classes_match_pareto_recount(spark):
    from hive_reflex_spark.operators.analytics import q196_abc_classification

    rows = {r.abc: r for r in q196_abc_classification(spark, SF_SMOKE).collect()}
    parts = _duck(
        "SELECT l_partkey, CAST(SUM(CAST(ROUND(l_extendedprice * "
        "(1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) "
        "FROM '$SF/lineitem.parquet' GROUP BY l_partkey"
    )
    parts.sort(key=lambda t: (-t[1], t[0]))
    total = sum(u for _, u in parts)
    agg = defaultdict(lambda: [0, 0])
    cum = 0
    for _, u in parts:
        share_before = cum / total
        cls = "A" if share_before < 0.8 else ("B" if share_before < 0.95 else "C")
        agg[cls][0] += 1
        agg[cls][1] += u
        cum += u
    assert set(agg) == set(rows)
    for cls, (n, u) in agg.items():
        r = rows[cls]
        assert r.n_parts == n
        assert abs(r.revenue - u / 10_000.0) < 1e-4
        assert abs(r.revenue_share - u / total) < 2e-6


def _km_product_check(rows, lifetimes, events_only=False):
    """Canonical KM: S(t) = prod over steps <= t of (1 - d/n), as a
    plain float PRODUCT — the queries compute exp of summed integer-unit
    logs, so agreement here validates the construction end to end.
    ``lifetimes`` = list of (duration, observed 0/1); ``events_only``
    matches q242's output contract (only steps with d > 0 emit)."""
    steps = defaultdict(lambda: [0, 0])  # t -> [d, leaving]
    for t, obs in lifetimes:
        steps[t][0] += obs
        steps[t][1] += 1
    n_risk = len(lifetimes)
    surv = 1.0
    expect = {}
    for t in sorted(steps):
        d, leaving = steps[t]
        if d < n_risk:
            surv *= 1.0 - d / n_risk
            if not events_only or d > 0:
                expect[t] = (n_risk, d, surv)
        n_risk -= leaving
    got = {r[0]: (r[1], r[2], r[3]) for r in rows}
    assert set(got) == set(expect)
    for t, (n, d, s) in expect.items():
        gn, gd, gs = got[t]
        assert (gn, gd) == (n, d), t
        assert abs(gs - s) < 1e-3, (t, gs, s)


def test_kaplan_meier_user_churn_matches_product_form(spark):
    from hive_reflex_spark.operators.analytics import q199_kaplan_meier

    rows = [
        (r.t_days, r.n_risk, r.d_events, r.survival)
        for r in q199_kaplan_meier(spark, SF_SMOKE).collect()
    ]
    days = _duck(
        "SELECT CAST(MIN(epoch_us(ts)) // 86400000000 AS BIGINT), "
        "CAST(MAX(epoch_us(ts)) // 86400000000 AS BIGINT) "
        "FROM '$SF/events.parquet' GROUP BY user_id"
    )
    d_end = max(d1 for _, d1 in days)
    lifetimes = [(d1 - d0, int(d1 < d_end - 6)) for d0, d1 in days]
    _km_product_check(rows, lifetimes)


def test_kaplan_meier_gap_lifetimes_match_product_form(spark):
    from hive_reflex_spark.operators.analytics import q242_kaplan_meier

    rows = [
        (r.t_hours, r.n_risk, r.n_observed, r.survival)
        for r in q242_kaplan_meier(spark, SF_SMOKE).collect()
    ]
    ev = _duck(
        "SELECT user_id, epoch_us(ts), event_id FROM '$SF/events.parquet' "
        "ORDER BY user_id, 2, 3"
    )
    t_end = max(t for _, t, _ in ev)
    by_user = defaultdict(list)
    for uid, t, _ in ev:
        by_user[uid].append(t)
    lifetimes = []
    hour = 3_600_000_000
    for ts in by_user.values():
        for a, b in zip(ts, ts[1:]):
            lifetimes.append(((b - a) // hour, 1))
        lifetimes.append(((t_end - ts[-1]) // hour, 0))  # censored tail
    _km_product_check(rows, lifetimes, events_only=True)


def test_basket_lift_matches_textbook_recount(spark):
    from hive_reflex_spark.operators.analytics import q205_basket_lift

    rows = {
        (r.item_a, r.item_b): r for r in q205_basket_lift(spark, SF_SMOKE).collect()
    }
    baskets = set(
        _duck(
            "SELECT DISTINCT user_id, "
            "CAST(epoch_us(ts) // 86400000000 AS BIGINT), event_type "
            "FROM '$SF/events.parquet'"
        )
    )
    n_baskets = len({(u, d) for u, d, _ in baskets})
    item = Counter(t for _, _, t in baskets)
    by_basket = defaultdict(set)
    for u, d, t in baskets:
        by_basket[(u, d)].add(t)
    pair = Counter()
    for types in by_basket.values():
        ts = sorted(types)
        for i, a in enumerate(ts):
            for b in ts[i + 1 :]:
                pair[(a, b)] += 1
    assert set(pair) == set(rows)
    for (a, b), np_ in pair.items():
        r = rows[(a, b)]
        assert r.n_pair == np_
        assert abs(r.support - np_ / n_baskets) < 2e-6
        assert abs(r.confidence_a_to_b - np_ / item[a]) < 2e-6
        lift = np_ * n_baskets / (item[a] * item[b])
        assert abs(r.lift - lift) < 2e-6


def test_tail_expectation_matches_numpy_cvar(spark):
    from hive_reflex_spark.operators.analytics import q213_tail_expectation

    row = q213_tail_expectation(spark, SF_SMOKE).collect()[0]
    vals = np.array(
        [v for (v,) in _duck("SELECT o_totalprice FROM '$SF/orders.parquet'")],
        dtype=np.float64,
    )
    p95 = float(np.percentile(vals, 95, method="linear"))
    tail = vals[vals > p95]
    cents = np.floor(tail * 100 + 0.5)
    assert abs(row.p95 - p95) < 1e-6
    assert row.n_tail == len(tail)
    assert abs(row.cvar_95 - float(cents.sum()) / 100.0 / len(tail)) < 2e-6
    assert abs(row.max_value - float(vals.max())) < 1e-6


def test_benford_matches_log10_law_recount(spark):
    from hive_reflex_spark.operators.analytics import q230_benford_deviation

    rows = {r.digit: r for r in q230_benford_deviation(spark, SF_SMOKE).collect()}
    digits = Counter(
        int(str(int(v * 100 + 0.5))[0])
        for (v,) in _duck(
            "SELECT o_totalprice FROM '$SF/orders.parquet' "
            "WHERE o_totalprice > 0"
        )
    )
    n = sum(digits.values())
    assert set(digits) == set(rows)
    for d, cnt in digits.items():
        r = rows[d]
        assert r.cnt == cnt
        assert abs(r.observed_p - cnt / n) < 2e-6
        assert abs(r.benford_p - math.log10(1 + 1 / d)) < 2e-6
        assert abs(r.deviation - (cnt / n - math.log10(1 + 1 / d))) < 3e-6
