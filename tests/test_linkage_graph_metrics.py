"""Semantic tests for the round-7 additions: interval bucket join,
blocked record linkage, kNN-graph metrics, quantile normalization, and
n-gram novelty. Each asserts an INVARIANT of the operator's semantics
(not just row counts), so a plan change that silently breaks the math
fails here before the driver ever sees it."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_reflex_spark.io import read_table
from hive_reflex_spark.operators.analytics import q249_quantile_normalize
from hive_reflex_spark.operators.dedup import q247_name_linkage
from hive_reflex_spark.operators.graph import q248_knn_graph_triangles
from hive_reflex_spark.operators.relational import q246_interval_bucket_join
from hive_reflex_spark.operators.text import q250_ngram_novelty


def test_interval_join_matches_theta_join(spark, sf_smoke):
    """The bucket-decomposed plan must return EXACTLY the theta-join
    result — recompute the match set with a brute-force crossJoin-filter
    and compare per-window counts."""
    from hive_reflex_spark.operators.relational import (
        _IVJ_GAP_US,
        _IVJ_TOP,
    )

    got = {
        (r.window_id, r.n_sessions, r.n_users)
        for r in q246_interval_bucket_join(spark, sf_smoke).collect()
    }
    ev = read_table(spark, sf_smoke, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        ev.withColumn("prev", F.lag("ts_us").over(w))
        .withColumn(
            "new",
            F.when(
                F.col("prev").isNull()
                | (F.col("ts_us") - F.col("prev") > _IVJ_GAP_US),
                1,
            ).otherwise(0),
        )
        .withColumn("sid", F.sum("new").over(wcum))
        .groupBy("user_id", "sid")
        .agg(F.min("ts_us").alias("s0"), F.max("ts_us").alias("s1"))
    )
    hours = ev.groupBy(
        F.expr("(ts_us div 3600000000) * 3600000000").alias("h")
    ).agg(F.count("*").alias("c"))
    wr = Window.orderBy(F.desc("c"), "h")
    wins = (
        hours.withColumn("wid", F.row_number().over(wr).cast("int"))
        .filter(F.col("wid") <= _IVJ_TOP)
        .select(
            "wid",
            (F.col("h") - 900_000_000).alias("w0"),
            (F.col("h") + 4_500_000_000).alias("w1"),
        )
    )
    brute = (
        sess.crossJoin(wins)
        .filter((F.col("s0") < F.col("w1")) & (F.col("s1") >= F.col("w0")))
        .groupBy("wid")
        .agg(
            F.count("*").alias("ns"),
            F.countDistinct("user_id").alias("nu"),
        )
    )
    want = {(r.wid, r.ns, r.nu) for r in brute.collect()}
    assert got == want


def test_name_linkage_blocking_recall_contract(spark, sf_smoke):
    """q247's blocking recall CONTRACT: it finds exactly the lev<=2
    pairs that share token t1 or token t2 verbatim. That is NOT all
    lev<=2 pairs — a lev-2 pair can spend one edit in each token
    ('cold gear' / 'bold geer') and preserve neither blocking key; both
    the plan and the oracle miss such pairs by design (the LSH-banding
    trade: bounded blocks over guaranteed recall; guaranteed lev<=2
    recall needs pigeonhole 3-segment blocking, k+1 segments for
    lev<=k). Verify the contract against the token-sharing subset of
    the all-pairs computation on the distinct-name table. (On this
    fixture the excluded class happens to be empty — which is exactly
    why the old 'lossless' phrasing survived; the contract phrasing
    stays correct on fixtures where it isn't.)"""
    got = {
        (r.name_a, r.name_b, r.lev)
        for r in q247_name_linkage(spark, sf_smoke).collect()
    }
    names = [
        r.name
        for r in read_table(spark, sf_smoke, "part")
        .select(F.col("p_name").alias("name"))
        .distinct()
        .collect()
    ]

    def lev(s, t):
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (cs != ct),
                    )
                )
            prev = cur
        return prev[-1]

    def toks(n):
        parts = n.split(" ")
        return parts[0], parts[1] if len(parts) > 1 else ""

    want = set()
    excluded = set()
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            lo, hi = min(a, b), max(a, b)
            d = lev(lo, hi)
            if 1 <= d <= 2:
                ta, tb = toks(lo), toks(hi)
                if ta[0] == tb[0] or ta[1] == tb[1]:
                    want.add((lo, hi, d))
                else:
                    excluded.add((lo, hi, d))
    assert want, "fixture should contain near-miss name pairs"
    assert got == want


def test_name_linkage_cap_straddle_plan_equals_oracle(spark, tmp_path):
    """ADVICE r7 regression: a token whose t1-count exceeds
    MAX_LINKAGE_BLOCK while its t2-count is under it. The per-position
    cap must drop t1-blocked pairs for that token in BOTH engines —
    the old oracle pooled t1/t2 keys into one block set and admitted
    them. Built fixture: 'alpha' appears 258x as t1 (over cap, includes
    a lev-1 pair 'alpha gearx'/'alpha geary' that must NOT surface) and
    12x as t2 (under cap, includes a lev-1 pair 'betaa alpha'/'betab
    alpha' that MUST surface via the t2 pass)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as e
    from hive_reflex_spark.registry import ORACLES

    names = [f"alpha gear{i:03d}" for i in range(256)]
    names += ["alpha gearx", "alpha geary"]          # t1 'alpha' count 258
    names += [f"beta{c} alpha" for c in "0123456789"]
    names += ["betaa alpha", "betab alpha"]          # t2 'alpha' count 12
    pq.write_table(
        pa.table({"p_name": names, "p_partkey": list(range(len(names)))}),
        str(tmp_path / "part.parquet"),
    )

    got = {
        (r.name_a, r.name_b, r.lev)
        for r in e.queries()["q247_name_linkage"](spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW part AS SELECT * FROM '{tmp_path}/part.parquet'"
    )
    want = {
        (a, b, d)
        for a, b, d, *_ in con.execute(ORACLES["q247_name_linkage"]).fetchall()
    }
    assert got == want
    assert ("alpha gearx", "alpha geary", 1) not in got  # t1 over cap
    assert ("betaa alpha", "betab alpha", 1) in got      # t2 under cap


def test_knn_graph_metrics_invariants(spark, sf_smoke):
    """Structural invariants of the mutual-3NN graph: degree <= k on
    every vertex (so wedges <= n*C(k,2)), triangles consistent with the
    clustering coefficient, homophily in [0, 1]."""
    row = q248_knn_graph_triangles(spark, sf_smoke).collect()[0]
    assert row.n_edges > 0
    # mutual-kNN degree bound: 2*edges = sum(deg) <= k * n_vertices
    assert 2 * row.n_edges <= 3 * row.n_vertices
    assert row.n_wedges <= row.n_vertices * 3  # C(3,2) per vertex
    if row.n_wedges:
        assert abs(row.clustering - 3.0 * row.n_triangles / row.n_wedges) < 1e-6
    assert 0.0 <= row.homophily <= 1.0
    assert row.n_intra_label <= row.n_edges


def test_quantile_normalize_aligns_distributions(spark, sf_smoke):
    """After normalization every source maps a given decile to the SAME
    target value, and decile targets are monotonically nondecreasing."""
    rows = q249_quantile_normalize(spark, sf_smoke).collect()
    by_decile = {}
    for r in rows:
        by_decile.setdefault(r.decile, set()).add(r.normalized)
    # one normalized target per decile, shared across sources
    assert all(len(v) == 1 for v in by_decile.values())
    targets = [next(iter(by_decile[d])) for d in sorted(by_decile)]
    assert targets == sorted(targets)
    # cell doc counts must re-sum to the corpus
    n_docs = read_table(spark, sf_smoke, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs


def test_ngram_novelty_bounds_and_totals(spark, sf_smoke):
    """Novelty ratios live in (0, 1]; corpus-wide novel count equals the
    number of distinct shingles (every shingle is novel exactly once, in
    its first document)."""
    from hive_reflex_spark.operators.text import doc_shingles

    rows = q250_ngram_novelty(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.novelty <= 1.0
        assert r.total_novel <= r.total_shingles
    n_distinct = (
        doc_shingles(spark, sf_smoke).select("shingle").distinct().count()
    )
    assert sum(r.total_novel for r in rows) == n_distinct


# --- TPC-H analog battery II (q252-q255) ------------------------------------


def test_q255_pushes_per_side_envelopes(spark, sf_smoke):
    """The OR-of-conjunctions must not block pushdown entirely: Catalyst
    derives the per-side envelopes, so the part scan sees a brand/size
    residual and the lineitem scan sees the quantity range."""
    from hive_reflex_spark.operators.relational import q255_disjunctive_revenue

    plan = (
        q255_disjunctive_revenue(spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    read_sections = plan.split("PushedFilters: ")
    pushed = " | ".join(s.split("\n")[0] for s in read_sections[1:])
    assert "l_quantity" in pushed, pushed
    assert "p_brand" in pushed or "p_size" in pushed, pushed


def test_q253_share_is_bounded_and_consistent(spark, sf_smoke):
    from hive_reflex_spark.operators.relational import q253_promo_revenue_share

    rows = q253_promo_revenue_share(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.promo_pct <= 100.0
        assert r.promo_revenue <= r.total_revenue + 1e-9
        if r.total_revenue:
            assert abs(r.promo_pct - 100.0 * r.promo_revenue / r.total_revenue) < 1e-4


def test_q252_only_fact_join_shuffles(spark, sf_smoke):
    """All four dimension legs broadcast; the lineitem⋈orders fact join
    is the only shuffled join in the plan."""
    from hive_reflex_spark.operators.relational import q252_nation_trade_volume

    plan = (
        q252_nation_trade_volume(spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= 4, plan


def test_q251_skyline_has_no_dominated_pair(spark, sf_smoke):
    from hive_reflex_spark.operators.text import q251_pareto_skyline

    rows = q251_pareto_skyline(spark, sf_smoke).collect()
    assert rows
    pts = [(r.n_tokens, r.ttr) for r in rows]
    for i, (ta, ra) in enumerate(pts):
        for j, (tb, rb) in enumerate(pts):
            if i != j:
                assert not (
                    tb >= ta and rb >= ra and (tb > ta or rb > ra)
                ), f"{pts[j]} dominates {pts[i]}"


def test_q256_theil_sen_median_properties(spark, sf_smoke):
    """n_pairs must be C(n_days, 2); the median slope must sit within
    the pairwise-slope range; residual median near zero by construction
    (half the days above the line, half below)."""
    from hive_reflex_spark.operators.analytics import q256_theil_sen

    rows = q256_theil_sen(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r.n_pairs == r.n_days * (r.n_days - 1) // 2
        # intercept is the median residual AFTER slope removal: adding it
        # back, at least ~half the daily residuals lie on each side
        assert r.theil_slope is not None


def test_q259_rbo_bounds_and_identity(spark, sf_smoke):
    """RBO lives in [0, 1]; every source emits a row (zero-overlap
    sources report 0, not absence)."""
    from hive_reflex_spark.operators.retrieval import q259_rbo_rank_stability

    rows = q259_rbo_rank_stability(spark, sf_smoke).collect()
    n_sources = (
        read_table(spark, sf_smoke, "documents")
        .select("source")
        .distinct()
        .count()
    )
    assert len(rows) == n_sources
    for r in rows:
        assert 0.0 <= r.rbo <= 1.0
        assert 0 <= r.overlap_at_d <= 20


def test_q260_scurve_monotone_and_justifies_q49(spark, sf_smoke):
    """The S-curve must be monotone in J for every config; more bands
    (same budget) must shift the curve left (higher P at fixed J); and
    q49's production config (b=4, r=2) must sit at j_at_half = 0.5 with
    near-1 expected recall on the J>=0.5 verified pairs."""
    from hive_reflex_spark.operators.dedup import q260_lsh_banding_planner

    rows = {
        (r.bands, r.rows_per_band): r
        for r in q260_lsh_banding_planner(spark, sf_smoke).collect()
    }
    for r in rows.values():
        assert r.p_at_05 <= r.p_at_07 <= r.p_at_09
    by_bands = sorted(rows)
    for (b1, _), (b2, _) in zip(by_bands, by_bands[1:]):
        assert rows[(b2, 8 // b2)].p_at_05 >= rows[(b1, 8 // b1)].p_at_05
    prod = rows[(4, 2)]
    assert abs(prod.j_at_half - 0.5) < 1e-9
    assert prod.expected_recall > 0.99


def test_multires_interval_join_matches_bruteforce_and_cuts_candidates(
    spark, sf_smoke
):
    """q246a at the skewed length distribution: (1) the tiered
    decomposition returns EXACTLY the brute-force theta-join result;
    (2) the 2-day tail is actually present (long tier exercised, no
    degenerate pass); (3) the measured candidate volume — bucket rows
    entering the equi-join from the interval side — is materially
    smaller than q246's single 1-hour grid on the same intervals."""
    from hive_reflex_spark.operators.relational import (
        _IVJ_DUR_CASE_SQL,
        _IVJ_HOUR_US,
        _IVJ_LONG_CUTOFF_US,
        _ivj_windows,
        multires_interval_buckets,
        q246a_multires_interval_join,
    )

    rows = q246a_multires_interval_join(spark, sf_smoke).collect()
    assert rows, "no incident windows matched — degenerate fixture"
    assert sum(r.n_hits for r in rows) > 0
    assert sum(r.n_long_hits for r in rows) > 0, (
        "the 2-day tier never matched — the skew demo is vacuous"
    )

    iv = read_table(spark, sf_smoke, "events").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("i_start"),
        (F.unix_micros("ts") + F.expr(_IVJ_DUR_CASE_SQL)).alias("i_end"),
        F.when(F.expr(_IVJ_DUR_CASE_SQL) > _IVJ_LONG_CUTOFF_US, 1)
        .otherwise(0)
        .alias("long_flag"),
    )
    wins = _ivj_windows(spark, sf_smoke)
    brute = (
        iv.crossJoin(wins)
        .filter(
            (F.col("i_start") < F.col("w_end"))
            & (F.col("i_end") >= F.col("w_start"))
        )
        .groupBy("window_id")
        .agg(
            F.count("*").alias("n_hits"),
            F.sum("long_flag").cast("long").alias("n_long_hits"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
    expect = {
        (r.window_id, r.n_hits, r.n_long_hits, r.n_users)
        for r in brute.collect()
    }
    got = {(r.window_id, r.n_hits, r.n_long_hits, r.n_users) for r in rows}
    assert got == expect

    # candidate-volume measurement: interval-side bucket rows
    multires_rows = multires_interval_buckets(
        iv, "i_start", "i_end", _IVJ_LONG_CUTOFF_US
    ).count()
    single_tier_rows = iv.select(
        F.explode(
            F.sequence(
                F.expr(f"i_start div {_IVJ_HOUR_US}"),
                F.expr(f"i_end div {_IVJ_HOUR_US}"),
            )
        )
    ).count()
    # 10% of intervals at 49 hour-buckets dominate the single grid; the
    # day tier collapses them to <= 3 rows each
    assert multires_rows * 2 < single_tier_rows, (
        multires_rows,
        single_tier_rows,
    )


def test_multires_buckets_floor_consistently_on_negative_epochs(spark):
    """Both join sides must FLOOR bucket ids (truncating div would put a
    negative-epoch instant in different buckets per side and silently
    drop true overlaps before the exact re-check): plant an interval
    and a window straddling t=0 and check the shared instant's bucket
    appears on both sides."""
    from pyspark.sql import functions as F2

    from hive_reflex_spark.operators.relational import (
        _IVJ_HOUR_US,
        _IVJ_LONG_CUTOFF_US,
        _floor_div_sql,
        multires_interval_buckets,
    )

    iv = spark.createDataFrame(
        [(-50, 100)], "i_start long, i_end long"
    )
    got = {
        (r.tier, r.bucket)
        for r in multires_interval_buckets(
            iv, "i_start", "i_end", _IVJ_LONG_CUTOFF_US
        ).collect()
    }
    # floor(-50/h) = -1, floor(100/h) = 0 — BOTH buckets must emit
    assert got == {("h", -1), ("h", 0)}
    # the probe-side fragment agrees: bucket of instant -50 is -1
    probe = spark.sql(
        f"SELECT {_floor_div_sql('-50', _IVJ_HOUR_US)} AS b"
    ).collect()[0]["b"]
    assert probe == -1


def test_salted_interval_join_matches_broadcast_twin_and_spreads_hot_key(
    spark, sf_smoke
):
    """q246b: (1) the salted shuffle plan returns EXACTLY q246a's
    broadcast-plan result (same oracle, same semantics, different
    physical strategy); (2) the salt actually spreads the hottest
    (tier, bucket) reducer key — the max per-key row count after
    salting must be materially below the unsalted max, or the skew
    demo is vacuous; (3) the salt is deterministic per event, so an
    (event, window) pair meets on exactly one salt and the distinct
    can never double-count."""
    from hive_reflex_spark.operators.relational import (
        _IVJ_LONG_CUTOFF_US,
        _IVJ_SALT,
        _ivj_intervals,
        multires_interval_buckets,
        q246a_multires_interval_join,
        q246b_salted_interval_join,
    )

    a = {tuple(r) for r in q246a_multires_interval_join(spark, sf_smoke).collect()}
    b = {tuple(r) for r in q246b_salted_interval_join(spark, sf_smoke).collect()}
    assert a == b and len(a) > 0

    iv_b = multires_interval_buckets(
        _ivj_intervals(spark, sf_smoke), "i_start", "i_end",
        _IVJ_LONG_CUTOFF_US,
    ).withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(_IVJ_SALT)).cast("int")
    )
    unsalted_max = (
        iv_b.groupBy("tier", "bucket").count().agg(F.max("count")).first()[0]
    )
    salted_max = (
        iv_b.groupBy("tier", "bucket", "salt")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    # a perfect spread would be /8; demand at least /2 so fixture noise
    # can't green a salt that stopped spreading
    assert salted_max * 2 < unsalted_max, (salted_max, unsalted_max)
