"""Invariant tests for the stats/experimentation tier.

CANONICAL-FORM AUDIT (the q295 lesson, completed in r9): engine-parity
cannot catch a statistic that is wrong identically in both engines, so
every statistical operator below has an INDEPENDENT textbook-form
cross-check computed from the raw fixture data — not a replay of the
repo's own frozen-unit expression. Stat -> canonical check:

- q279 Mann-Whitney: tie-averaged ranks + textbook U/z with the tie
  correction, pure Python (test_curation_sketch_ops.py).
- q280 ROC/AUC: brute-force pairwise count 2*#(pos>neg) + #(pos==neg).
- q281 BH-FDR: math.comb exact binomial tails + independent Python BH.
- q282 chi-squared: textbook sum (O-E)^2/E from observed marginals.
- q283 exact quantile: sorted order statistic at the exact rank.
- q284 Good-Turing: pure-Python trigram recount; N_1/N missing mass;
  conservation sum r*N_r == n_tokens.
- q285 HyperBall: ground-truth BFS balls -> register union (max-merge
  == set-union IS the algorithm's canonical claim).
- q286 Kendall tau-b: brute-force double loop over all pairs.
- q287 RRF: textbook sum 1/(k+rank), ranks checked as permutations.
- q288 GBDT split: textbook Gini gain recomputed from cell counts;
  conservation of class totals across splits.
- q289 permutation test: independent replay of the md5-keyed
  relabeling (the construction IS the statistic) + textbook add-one
  p = (1+n_extreme)/(1+B) + a planted exact-null fixture that must
  yield p = 1 exactly (distribution-level property, not a replay).
- q290/q290a CountSketch: grid recomputed from TRUE per-user counts
  (duckdb group-by), textbook median-of-row-estimates readout.
- q291 Brier: Murphy identity REL-RES+UNC, direct float Brier from the
  binned forecasts, UNC == ybar*(1-ybar).
- q292 KL/JS: textbook divergence from raw word counts with math.log.
- q293 CUPED: theta = cov/var recomputed from raw per-user spend
  (Deng et al. form); raw/adjusted lifts from the arm means.
- q294 silhouette: s=(b-a)/max(a,b) from raw embeddings in BOTH the
  frozen-unit form (exact) and plain float (textbook, 1e-4) —
  test_silhouette_matches_canonical_numpy_recompute.
- q295 DeLong: canonical numpy covariance form on a constructed
  skewed sample (test_delong_formula_matches_canonical_on_skewed_sample)
  + placement-value replay on the fixture.
- q296 McNemar: cells counted from raw docs + textbook (b-c)^2/(b+c)
  and the continuity-corrected variant.
- q297 NMI: joint contingency from raw labels + textbook MI/entropy.
- q298 Spearman: textbook rho on midranks (named ..._textbook_form).
- q299 quantile CI: exact Binomial(n, q) coverage of the bracket
  (>= 94%) + order statistics from the sorted raw values.

Backward extension (r9 verdict #5 — the pre-r8 statistics operators
that predate the lesson):

- q123 Pearson: np.corrcoef on the raw hourly cent series per pair.
- q128 OLS: np.polyfit least squares + corr^2 R^2 on the raw series.
- q189 two-proportion z: pure-Python funnel recount (first view ->
  purchase within 24 h) + textbook pooled-variance z.
- q204 Gini: mean-absolute-difference form sum|xi-xj| / (2 n^2 mu) —
  a DIFFERENT closed form than the query's rank formula.
- q235 ECE: per-vector softmax recount in exact frozen units for bin
  membership, plain-float textbook sum (n_b/N)|acc_b - conf_b| for the
  statistic.
- q249 quantile normalization: independent Python ntile + the
  pooled-decile-mean mapping recomputed from raw (source, n_chars).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import duckdb

from tests.conftest import SF_CORRECT, SF_SMOKE


def _events(sf_dir: str):
    con = duckdb.connect()
    return con.execute(
        f"SELECT event_id, event_type, value, "
        f"CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchall()


def test_roc_auc_matches_pairwise_bruteforce(spark):
    from hive_reflex_spark.operators.analytics import q280_roc_auc

    rows = q280_roc_auc(spark, SF_SMOKE).collect()
    ev = _events(SF_SMOKE)
    pos = sorted(v for _, t, v, _ in ev if t == "purchase")
    neg = sorted(v for _, t, v, _ in ev if t != "purchase")
    # 2*U via bisect on the sorted negative side: exact integers in halves
    import bisect

    auc2 = 0
    for v in pos:
        lt = bisect.bisect_left(neg, v)
        eq = bisect.bisect_right(neg, v) - lt
        auc2 += 2 * lt + eq
    assert {r.auc2num for r in rows} == {auc2}
    by_dec = sorted(rows, key=lambda r: r.decile)
    assert [r.decile for r in by_dec] == list(range(1, 11))
    # cumulative counts are monotone and saturate at the class totals
    assert all(
        a.cum_tp <= b.cum_tp and a.cum_fp <= b.cum_fp
        for a, b in zip(by_dec, by_dec[1:])
    )
    assert by_dec[-1].cum_tp == len(pos) and by_dec[-1].cum_fp == len(neg)
    assert by_dec[-1].tpr == 1.0 and by_dec[-1].fpr == 1.0
    assert abs(by_dec[0].auc - auc2 / (2 * len(pos) * len(neg))) < 1e-6


def _daily_deltas(sf_dir: str) -> dict[str, list[int]]:
    by_type: dict[str, dict[int, int]] = {}
    for _, t, v, d in _events(sf_dir):
        day = by_type.setdefault(t, {})
        day[d] = day.get(d, 0) + round(v * 100)
    out = {}
    for t, days in by_type.items():
        ordered = [days[d] for d in sorted(days)]
        deltas = [b - a for a, b in zip(ordered, ordered[1:]) if b != a]
        out[t] = deltas[-40:]
    return out


def test_bh_fdr_matches_python_binomial_and_bh(spark):
    from hive_reflex_spark.operators.analytics import q281_bh_fdr

    rows = {r.event_type: r for r in q281_bh_fdr(spark, SF_CORRECT).collect()}
    deltas = _daily_deltas(SF_CORRECT)
    ps = {}
    for t, dl in deltas.items():
        if not dl:
            continue
        n, k = len(dl), sum(1 for x in dl if x > 0)
        cle = sum(math.comb(n, i) for i in range(0, k + 1))
        cge = sum(math.comb(n, i) for i in range(k, n + 1))
        p_num = min(2**n, 2 * min(cle, cge))
        r = rows[t]
        assert (r.n, r.k_pos, r.p_num, r.p_den) == (n, k, p_num, 2**n)
        ps[t] = (p_num, 2**n)
    # independent BH at alpha=0.05 over the exact rationals
    m = len(ps)
    ranked = sorted(ps.items(), key=lambda kv: (kv[1][0] / kv[1][1], kv[0]))
    i_max = 0
    for i, (_, (num, den)) in enumerate(ranked, start=1):
        if num * 20 * m <= i * den:
            i_max = i
    expect_rej = {t for t, _ in ranked[:i_max]}
    assert {t for t, r in rows.items() if r.rejected == 1} == expect_rej


def test_chi2_rows_sum_to_zero_and_match_float(spark):
    from hive_reflex_spark.operators.analytics import (
        q282_chi2_independence,
    )

    rows = q282_chi2_independence(spark, SF_SMOKE).collect()
    by_type: dict[str, int] = {}
    for r in rows:
        by_type[r.event_type] = by_type.get(r.event_type, 0) + r.delta
    assert all(v == 0 for v in by_type.values())
    # float recomputation of the statistic from the observed counts
    tot = sum(r.observed for r in rows)
    rt = Counter()
    ct = Counter()
    for r in rows:
        rt[r.event_type] += r.observed
        ct[r.dow] += r.observed
    chi2 = sum(
        (r.observed - rt[r.event_type] * ct[r.dow] / tot) ** 2
        / (rt[r.event_type] * ct[r.dow] / tot)
        for r in rows
    )
    got = rows[0].chi2_total_units / 1e6
    assert abs(got - chi2) / max(chi2, 1e-9) < 1e-6
    assert rows[0].dof == (len(rt) - 1) * (len(ct) - 1)


def test_exact_quantile_matches_sorted_order_statistic(spark):
    from hive_reflex_spark.operators.relational import q283_exact_quantile

    rows = q283_exact_quantile(spark, SF_SMOKE).collect()
    con = duckdb.connect()
    cents = sorted(
        c
        for (c,) in con.execute(
            f"SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) "
            f"FROM '{SF_SMOKE}/lineitem.parquet'"
        ).fetchall()
    )
    n = len(cents)
    assert {r.pct for r in rows} == {25, 50, 75, 90, 99}
    for r in rows:
        rank = (r.pct * n + 99) // 100
        assert r.n == n and r.rank == rank
        assert r.value_cents == cents[rank - 1]


def test_good_turing_matches_python_recount(spark):
    from hive_reflex_spark.operators.text import q284_good_turing

    rows = q284_good_turing(spark, SF_SMOKE).collect()
    con = duckdb.connect()
    texts = [
        t
        for (t,) in con.execute(
            f"SELECT text FROM '{SF_SMOKE}/documents.parquet'"
        ).fetchall()
    ]
    grams = Counter()
    for t in texts:
        ws = t.split(" ")
        for i in range(len(ws) - 2):
            grams[" ".join(ws[i : i + 3])] += 1
    fof = Counter(grams.values())
    n_tokens = sum(grams.values())
    smallest = sorted(fof)[:20]
    assert {(r.r, r.n_r) for r in rows} == {(r, fof[r]) for r in smallest}
    for r in rows:
        assert r.n_tokens == n_tokens and r.vocab == len(grams)
        assert abs(r.missing_mass - fof.get(1, 0) / n_tokens) < 1e-6
        if r.r + 1 in fof:
            want = round(1e6 * (r.r + 1) * fof[r.r + 1] / fof[r.r])
            assert abs(r.r_star_units - want) <= 1
        else:
            assert r.r_star_units is None
    # conservation: sum over the FULL histogram equals the token count
    assert sum(r * c for r, c in fof.items()) == n_tokens


def _hll_estimate(regs: dict[str, int]) -> float:
    m = 256
    alpha = 0.7213 / (1 + 1.079 / m)
    sum_pow = sum(2.0 ** -v for v in regs.values()) + (m - len(regs))
    e_raw = alpha * m * m / sum_pow
    zeros = m - len(regs)
    if e_raw <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return e_raw


def _node_register(v: int) -> tuple[str, int]:
    h = hashlib.md5(str(v).encode()).hexdigest()
    bucket, suffix = h[:2], h[2:31]
    stripped = suffix.lstrip("0")
    if not stripped:
        lead = 0
    else:
        d = int(stripped[0], 16)
        lead = 0 if d >= 8 else 1 if d >= 4 else 2 if d >= 2 else 3
    return bucket, 4 * (29 - len(stripped)) + lead + 1


def test_hyperball_equals_bfs_ball_replay(spark):
    from hive_reflex_spark.operators.dedup import q47_jaccard_pairs
    from hive_reflex_spark.operators.graph import q285_hyperball

    rows = {r.t: r for r in q285_hyperball(spark, SF_SMOKE).collect()}
    edges = [
        (r.doc_a, r.doc_b)
        for r in q47_jaccard_pairs(spark, SF_SMOKE)
        .select("doc_a", "doc_b")
        .collect()
    ]
    con = duckdb.connect()
    nodes = [
        d
        for (d,) in con.execute(
            f"SELECT doc_id FROM '{SF_SMOKE}/documents.parquet'"
        ).fetchall()
    ]
    adj: dict[int, set[int]] = {v: set() for v in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    balls = {v: {v} for v in nodes}
    for t in range(0, 4):
        if t > 0:
            balls = {
                v: ball | {u for w in ball for u in adj[w]}
                for v, ball in balls.items()
            }
        nf_units = 0
        mass = 0
        for v, ball in balls.items():
            regs: dict[str, int] = {}
            for u in ball:
                b, r = _node_register(u)
                regs[b] = max(regs.get(b, 0), r)
            mass += sum(regs.values())
            nf_units += round(1e6 * _hll_estimate(regs))
        row = rows[t]
        assert row.n_nodes == len(nodes)
        assert row.register_mass == mass, t
        assert row.nf_units == nf_units, t
    assert rows[3].reach_ratio == 1.0


def test_kendall_tau_matches_double_loop(spark):
    from hive_reflex_spark.operators.analytics import q286_kendall_tau

    rows = q286_kendall_tau(spark, SF_SMOKE).collect()
    daily: dict[str, dict[int, int]] = {}
    for _, t, v, d in _events(SF_SMOKE):
        daily.setdefault(t, {})[d] = daily.setdefault(t, {}).get(d, 0) + round(
            v * 100
        )
    for r in rows:
        xa, xb = daily[r.type_a], daily[r.type_b]
        days = sorted(set(xa) & set(xb))
        nc = nd = n1 = n2 = 0
        for i in range(len(days)):
            for j in range(i + 1, len(days)):
                dx = xa[days[j]] - xa[days[i]]
                dy = xb[days[j]] - xb[days[i]]
                nc += dx * dy > 0
                nd += dx * dy < 0
                n1 += dx == 0
                n2 += dy == 0
        n0 = len(days) * (len(days) - 1) // 2
        assert (r.n0, r.nc, r.nd, r.n1, r.n2) == (n0, nc, nd, n1, n2)
        denom = math.sqrt((n0 - n1) * (n0 - n2))
        if denom:
            assert abs(r.tau_b - (nc - nd) / denom) < 1e-6


def test_rrf_fusion_matches_rank_recompute(spark):
    from hive_reflex_spark.operators.retrieval import (
        q173_hybrid_rerank,
        q287_rrf_fusion,
    )

    fused = q287_rrf_fusion(spark, SF_CORRECT).collect()
    hyb = q173_hybrid_rerank(spark, SF_CORRECT).collect()
    assert {r.doc_id for r in fused} == {r.doc_id for r in hyb}
    for r in fused:
        want = round(1e9 / (60 + r.bm25_rank)) + round(
            1e9 / (60 + r.cos_rank)
        )
        assert r.rrf_units == want
    # both rank columns are permutations of 1..K
    k = len(fused)
    assert sorted(r.bm25_rank for r in fused) == list(range(1, k + 1))
    assert sorted(r.cos_rank for r in fused) == list(range(1, k + 1))
    assert sorted(r.rrf_rank for r in fused) == list(range(1, k + 1))


def test_gbdt_split_gain_recompute_and_conservation(spark):
    from hive_reflex_spark.operators.analytics import q288_gbdt_split

    rows = q288_gbdt_split(spark, SF_SMOKE).collect()
    tp = rows[0].lp + rows[0].rp
    tn = rows[0].ln_ + rows[0].rn
    best = None
    for r in rows:
        assert r.lp + r.rp == tp and r.ln_ + r.rn == tn
        t = tp + tn
        gp = 1 - (tp**2 + tn**2) / t**2
        l, rr = r.lp + r.ln_, r.rp + r.rn
        gl = 1 - (r.lp**2 + r.ln_**2) / l**2
        gr = 1 - (r.rp**2 + r.rn**2) / rr**2
        gain = gp - (l / t) * gl - (rr / t) * gr
        assert abs(r.gain_units - round(1e9 * gain)) <= 1
        if best is None or r.gain_units > best:
            best = r.gain_units
    assert next(r for r in rows if r.split_rank == 1).gain_units == best
    # thresholds are nondecreasing in bin (equal-frequency bin maxima)
    by_bin = sorted(rows, key=lambda r: r.bin)
    assert all(
        a.threshold <= b.threshold for a, b in zip(by_bin, by_bin[1:])
    )


def test_permutation_test_full_python_replay(spark):
    from hive_reflex_spark.operators.analytics import (
        _PERM_B,
        q289_permutation_test,
    )

    rows = q289_permutation_test(spark, SF_SMOKE).collect()
    daily: dict[str, dict[int, int]] = {}
    for _, t, v, d in _events(SF_SMOKE):
        daily.setdefault(t, {})[d] = daily.setdefault(t, {}).get(d, 0) + round(
            v * 100
        )
    for r in rows:
        pool = [(r.type_a, d, c) for d, c in daily[r.type_a].items()] + [
            (r.type_b, d, c) for d, c in daily[r.type_b].items()
        ]
        na = len(daily[r.type_a])
        total = sum(c for _, _, c in pool)
        t_obs = sum(c for t, _, c in pool if t == r.type_a)
        assert (r.na, r.t_obs) == (na, t_obs)
        obs_dev = abs(t_obs * len(pool) - na * total)
        n_ext = 0
        for b in range(1, _PERM_B + 1):
            keyed = sorted(
                pool,
                key=lambda it: (
                    hashlib.md5(
                        f"{b}:{it[0]}:{it[1]}".encode()
                    ).hexdigest(),
                    it[0],
                    it[1],
                ),
            )
            t_b = sum(c for _, _, c in keyed[:na])
            if abs(t_b * len(pool) - na * total) >= obs_dev:
                n_ext += 1
        assert r.n_extreme == n_ext
        assert r.p_units == round(1e6 * (1 + n_ext) / (1 + _PERM_B))


def test_count_sketch_full_python_replay(spark):
    from hive_reflex_spark.operators.analytics import (
        _CS_BUCKETS,
        _CS_ROWS,
        q290_count_sketch,
    )

    rows = q290_count_sketch(spark, SF_SMOKE).collect()
    f = Counter()
    con = duckdb.connect()
    for (u, c) in con.execute(
        f"SELECT user_id, COUNT(*) FROM '{SF_SMOKE}/events.parquet' "
        f"GROUP BY user_id"
    ).fetchall():
        f[u] = c

    def hx(prefix: str, j: int, u: int) -> int:
        return int(
            hashlib.md5(f"{prefix}{j}:{u}".encode()).hexdigest()[0], 16
        )

    grid: dict[tuple[int, int], int] = {}
    for u, c in f.items():
        for j in range(1, _CS_ROWS + 1):
            b = hx("h", j, u) % _CS_BUCKETS
            s = 1 if hx("s", j, u) < 8 else -1
            grid[(j, b)] = grid.get((j, b), 0) + s * c
    top = sorted(f.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert {(r.user_id, r.f_true) for r in rows} == set(top)
    for r in rows:
        ests = sorted(
            (1 if hx("s", j, r.user_id) < 8 else -1)
            * grid[(j, hx("h", j, r.user_id) % _CS_BUCKETS)]
            for j in range(1, _CS_ROWS + 1)
        )
        est2x = ests[1] + ests[2]
        assert r.est2x == est2x and r.err2x == est2x - 2 * r.f_true


def test_brier_murphy_identity_and_bounds(spark):
    from hive_reflex_spark.operators.analytics import (
        q291_brier_decomposition,
    )

    rows = q291_brier_decomposition(spark, SF_SMOKE).collect()
    r0 = rows[0]
    # identity by construction; components nonnegative
    assert r0.brier_units == r0.rel_units - r0.res_units + r0.unc_units
    assert r0.rel_units >= 0 and r0.res_units >= 0 and r0.unc_units >= 0
    assert sum(r.rel_units_k for r in rows) == r0.rel_units
    assert sum(r.res_units_k for r in rows) == r0.res_units
    # direct float Brier with the binned forecast reproduces the total
    n = sum(r.n for r in rows)
    p = sum(r.pos for r in rows)
    direct = sum(
        r.pos * (r.fbar - 1) ** 2 + (r.n - r.pos) * r.fbar**2
        for r in rows
    ) / n
    assert abs(direct - r0.brier_units / 1e9) < 5e-5
    # uncertainty is the base-rate variance
    ybar = p / n
    assert abs(r0.unc_units / 1e9 - ybar * (1 - ybar)) < 1e-8
    # forecast bin means are nondecreasing in bin (built from sorted cents)
    by_bin = sorted(rows, key=lambda r: r.bin)
    assert all(a.fbar <= b.fbar for a, b in zip(by_bin, by_bin[1:]))


def test_source_divergence_python_replay_and_bounds(spark):
    from hive_reflex_spark.operators.text import q292_source_divergence

    rows = q292_source_divergence(spark, SF_SMOKE).collect()
    con = duckdb.connect()
    wc: dict[str, Counter] = {}
    for (src, text) in con.execute(
        f"SELECT source, text FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall():
        wc.setdefault(src, Counter()).update(text.split(" "))
    vocab = sorted({w for c in wc.values() for w in c})
    v = len(vocab)
    ln2 = math.log(2)
    for r in rows:
        assert r.kl_ab_units >= 0 and r.kl_ba_units >= 0
        assert 0 <= r.js_units <= round(1e9 * ln2) + 10
        ca, cb = wc[r.source_a], wc[r.source_b]
        na, nb = sum(ca.values()), sum(cb.values())
        kl_ab = js = 0
        for w in vocab:
            pa = (ca.get(w, 0) + 1) / (na + v)
            pb = (cb.get(w, 0) + 1) / (nb + v)
            kl_ab += round(1e9 * pa * math.log(pa / pb))
            m = (pa + pb) / 2
            js += round(
                1e9
                * (0.5 * pa * math.log(pa / m) + 0.5 * pb * math.log(pb / m))
            )
        assert r.kl_ab_units == kl_ab
        assert r.js_units == js


def test_cuped_matches_moment_recompute(spark):
    from hive_reflex_spark.operators.analytics import (
        _CUPED_PRE_DAYS,
        q293_cuped_adjustment,
    )

    r = q293_cuped_adjustment(spark, SF_SMOKE).collect()[0]
    per: dict[int, list[int]] = {}
    days = [d for _, _, _, d in _events(SF_SMOKE)]
    mind = min(days)
    con = duckdb.connect()
    for (u, d, c) in con.execute(
        f"SELECT user_id, CAST(epoch_us(ts) // 86400000000 AS BIGINT), "
        f"CAST(ROUND(value * 100) AS BIGINT) "
        f"FROM '{SF_SMOKE}/events.parquet'"
    ).fetchall():
        xy = per.setdefault(u, [0, 0])
        xy[0 if d - mind < _CUPED_PRE_DAYS else 1] += c
    n = len(per)
    xs = [xy[0] for xy in per.values()]
    ys = [xy[1] for xy in per.values()]
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert r.n_users == n and r.n_a + r.n_b == n
    assert abs(r.theta - theta) < 1e-5
    a = [(xy[0], xy[1]) for u, xy in per.items() if u % 2 == 0]
    b = [(xy[0], xy[1]) for u, xy in per.items() if u % 2 == 1]
    raw = sum(y for _, y in b) / len(b) - sum(y for _, y in a) / len(a)
    dx = sum(x for x, _ in b) / len(b) - sum(x for x, _ in a) / len(a)
    assert abs(r.raw_lift - raw) < 1e-4
    assert abs(r.adj_lift - (raw - theta * dx)) < 1e-4
    assert 0 <= r.rho2 <= 1


def test_silhouette_bounds_and_assignment_consistency(spark):
    from hive_reflex_spark.operators.similarity import (
        q294_simplified_silhouette,
        q54a_ivf_assign,
    )

    sil = q294_simplified_silhouette(spark, SF_SMOKE).collect()
    assign = {
        r.centroid_id: r.n_assigned
        for r in q54a_ivf_assign(spark, SF_SMOKE).collect()
    }
    # same clusters and sizes as the IVF assignment
    assert {(r.centroid_id, r.n) for r in sil} == set(assign.items())
    for r in sil:
        # mean silhouette is bounded in [-1, 1]
        assert -1.0 <= r.mean_sil <= 1.0
        assert -1.0 <= r.global_mean_sil <= 1.0


def test_stream_count_sketch_equals_batch_grid(spark):
    from hive_reflex_spark.operators.analytics import (
        _CS_BUCKETS,
        _CS_ROWS,
    )
    from hive_reflex_spark.streaming.ops import q290a_stream_count_sketch

    rows = q290a_stream_count_sketch(spark, SF_SMOKE).collect()
    con = duckdb.connect()
    grid: dict[tuple[int, int], int] = {}
    for (u, c) in con.execute(
        f"SELECT user_id, COUNT(*) FROM '{SF_SMOKE}/events.parquet' "
        f"GROUP BY user_id"
    ).fetchall():
        for j in range(1, _CS_ROWS + 1):
            b = (
                int(
                    hashlib.md5(f"h{j}:{u}".encode()).hexdigest()[0], 16
                )
                % _CS_BUCKETS
            )
            s = (
                1
                if int(
                    hashlib.md5(f"s{j}:{u}".encode()).hexdigest()[0], 16
                )
                < 8
                else -1
            )
            grid[(j, b)] = grid.get((j, b), 0) + s * c
    got = {(r.j, r.bucket): r.c for r in rows}
    assert got == {k: v for k, v in grid.items()}


def test_auc_delong_python_replay(spark):
    from hive_reflex_spark.operators.analytics import q295_auc_delong

    r = q295_auc_delong(spark, SF_SMOKE).collect()[0]
    ev = _events(SF_SMOKE)
    pos = sorted(v for _, t, v, _ in ev if t == "purchase")
    neg = sorted(v for _, t, v, _ in ev if t != "purchase")
    import bisect

    p_n, n_n = len(pos), len(neg)
    assert (r.p, r.neg) == (p_n, n_n)
    # placement values: V10_i = (#neg below + half ties)/N in halves
    s10u = 0
    auc2 = r.auc2num
    for v in pos:
        lt = bisect.bisect_left(neg, v)
        eq = bisect.bisect_right(neg, v) - lt
        a2 = 2 * lt + eq
        dev = (a2 * p_n - auc2) / (2.0 * p_n * n_n)
        s10u += round(1e6 * dev * dev)
    s01u = 0
    for v in neg:
        lt = bisect.bisect_left(pos, v)
        eq = bisect.bisect_right(pos, v) - lt
        # a2 counts positives BELOW the negative (mean 2P(1-AUC)), so
        # the deviation centers at 1-AUC, not AUC
        a2 = 2 * lt + eq
        dev = (a2 * n_n - (2 * p_n * n_n - auc2)) / (2.0 * p_n * n_n)
        s01u += round(1e6 * dev * dev)
    assert r.s10u == s10u
    assert r.s01u == s01u
    se = math.sqrt(
        s10u / 1e6 / (p_n - 1) / p_n + s01u / 1e6 / (n_n - 1) / n_n
    )
    assert abs(r.se - se) < 2e-6
    assert r.ci_lo < r.auc < r.ci_hi
    assert abs((r.ci_hi - r.ci_lo) / 2 - 1.96 * se) < 5e-6


def test_mcnemar_cells_and_units_replay(spark):
    from hive_reflex_spark.operators.text import (
        _MCN_CHAR_MIN,
        _MCN_TOKEN_MIN,
        q296_mcnemar_filters,
    )

    r = q296_mcnemar_filters(spark, SF_SMOKE).collect()[0]
    con = duckdb.connect()
    cells = [0, 0, 0, 0]
    for (nc, text) in con.execute(
        f"SELECT n_chars, text FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall():
        ka = nc >= _MCN_CHAR_MIN
        kb = len(text.split(" ")) >= _MCN_TOKEN_MIN
        cells[(not ka) * 2 + (not kb)] += 1
    both, b_only_inv, a_only_inv, neither = cells
    assert (r.keep_both, r.a_only, r.b_only, r.keep_neither) == (
        both,
        b_only_inv,
        a_only_inv,
        neither,
    )
    b, c = r.a_only, r.b_only
    if b + c:
        assert r.mcnemar_units == round(1e9 * (b - c) ** 2 / (b + c))
        cc = max(abs(b - c) - 1, 0)
        assert r.mcnemar_cc_units == round(1e9 * cc * cc / (b + c))
    assert r.keep_both + r.a_only + r.b_only + r.keep_neither == r.n_docs


def test_cluster_label_nmi_python_replay(spark):
    from hive_reflex_spark.operators.similarity import (
        N_CENTROIDS_STRIDE,
        q297_cluster_label_nmi,
    )

    r = q297_cluster_label_nmi(spark, SF_CORRECT).collect()[0]
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, label, embedding "
        f"FROM '{SF_CORRECT}/embeddings.parquet'"
    ).fetchall()
    vecs = {vid: (lab, list(emb)) for vid, lab, emb in rows}
    cents = {
        vid: emb
        for vid, (lab, emb) in vecs.items()
        if vid % N_CENTROIDS_STRIDE == 0
    }

    def xdot(a, b):
        return sum(round(x * y * 1e9) for x, y in zip(a, b)) / 1e9

    joint = Counter()
    for vid, (lab, emb) in vecs.items():
        best = max(
            sorted(cents), key=lambda cid: (xdot(emb, cents[cid]), -cid)
        )
        joint[(best, lab)] += 1
    n = sum(joint.values())
    mc = Counter()
    ml = Counter()
    for (cid, lab), cnt in joint.items():
        mc[cid] += cnt
        ml[lab] += cnt
    i_units = sum(
        round(1e9 * (cnt / n) * math.log(n * cnt / (mc[cid] * ml[lab])))
        for (cid, lab), cnt in joint.items()
    )
    hc = sum(round(1e9 * (v / n) * math.log(n / v)) for v in mc.values())
    hl = sum(round(1e9 * (v / n) * math.log(n / v)) for v in ml.values())
    assert (r.n_vecs, r.n_clusters, r.n_labels) == (n, len(mc), len(ml))
    assert (r.i_units, r.hc_units, r.hl_units) == (i_units, hc, hl)
    pur = sum(
        max(cnt for (c2, _), cnt in joint.items() if c2 == cid)
        for cid in mc
    )
    assert r.n_majority == pur
    assert 0 <= r.purity <= 1
    if hc and hl:
        assert abs(r.nmi - i_units / math.sqrt(hc * hl)) < 1e-6


def test_delong_formula_matches_canonical_on_skewed_sample():
    """The repo's rank-difference DeLong form equals the canonical
    placement-value computation on a construction where AUC != 0.5 —
    the case where centering the negatives' statistic at AUC instead
    of 1-AUC inflated the SE 2.4x (review finding, fixed)."""
    import numpy as np

    rng = np.random.default_rng(7)
    pos = rng.normal(1, 1, 40)
    neg = rng.normal(0, 1, 60)
    p_n, n_n = len(pos), len(neg)
    v10 = np.array(
        [(np.sum(v > neg) + 0.5 * np.sum(v == neg)) / n_n for v in pos]
    )
    v01 = np.array(
        [(np.sum(pos > v) + 0.5 * np.sum(pos == v)) / p_n for v in neg]
    )
    se_canon = math.sqrt(
        v10.var(ddof=1) / p_n + v01.var(ddof=1) / n_n
    )
    auc2 = sum(
        2 * np.sum(v > neg) + np.sum(v == neg) for v in pos
    )
    s10 = sum(
        ((2 * np.sum(v > neg) + np.sum(v == neg)) * p_n - auc2) ** 2
        for v in pos
    ) / (2.0 * p_n * n_n) ** 2
    s01 = sum(
        (
            (2 * np.sum(v > pos) + np.sum(v == pos)) * n_n
            - (2 * p_n * n_n - auc2)
        )
        ** 2
        for v in neg
    ) / (2.0 * p_n * n_n) ** 2
    se_repo = math.sqrt(s10 / (p_n - 1) / p_n + s01 / (n_n - 1) / n_n)
    assert abs(se_canon - se_repo) < 1e-12


def test_registry_order_survives_streaming_first_import():
    """Importing hive_reflex_spark.streaming.ops BEFORE the operators
    package must not corrupt the judged window order: the stream
    oracle builders run at module-import time and once imported
    operators.analytics mid-registration, silently appending q290a
    (and everything after it in ops.py) to the registry tail. They
    now build from hive_reflex_spark.functions only (review finding,
    fixed) — proven here in a pristine subprocess."""
    import subprocess
    import sys

    code = (
        "import sys; sys.path.insert(0, '/root/repo');"
        "import hive_reflex_spark.streaming.ops;"
        "import hive_reflex_spark.operators;"
        "from hive_reflex_spark import registry;"
        "print('|'.join(list(registry.QUERIES)[:50]))"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True
    )
    assert out.returncode == 0, out.stderr[-2000:]
    streaming_first = out.stdout.strip().splitlines()[-1].split("|")

    import hive_reflex_spark.operators  # noqa: F401
    from hive_reflex_spark.registry import QUERIES

    # rotation-proof: whatever the current curated window is, a
    # streaming-first import must produce the IDENTICAL first 50
    assert streaming_first == list(QUERIES)[:50]


def test_spearman_matches_textbook_form_and_replay(spark):
    from hive_reflex_spark.operators.analytics import q298_spearman

    rows = q298_spearman(spark, SF_SMOKE).collect()
    daily: dict[str, dict[int, int]] = {}
    for _, t, v, d in _events(SF_SMOKE):
        daily.setdefault(t, {})[d] = daily.setdefault(t, {}).get(d, 0) + round(
            v * 100
        )

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vals[order[j]] == vals[order[i]]:
                j += 1
            r = (i + 1 + j) / 2.0
            for k in range(i, j):
                ranks[order[k]] = r
            i = j
        return ranks

    for r in rows:
        xa, xb = daily[r.type_a], daily[r.type_b]
        days = sorted(set(xa) & set(xb))
        xs = [xa[d] for d in days]
        ys = [xb[d] for d in days]
        rx, ry = avg_ranks(xs), avg_ranks(ys)
        n = len(days)
        # full product-moment Pearson on tie-averaged ranks
        mx, my = sum(rx) / n, sum(ry) / n
        num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
        den = math.sqrt(
            sum((a - mx) ** 2 for a in rx)
            * sum((b - my) ** 2 for b in ry)
        )
        assert abs(r.rho - num / den) < 1e-6
        # the textbook 1 - 6*sum(d^2)/(n(n^2-1)) agrees when untied
        if len(set(xs)) == n and len(set(ys)) == n:
            d2 = sum((a - b) ** 2 for a, b in zip(rx, ry))
            book = 1 - 6 * d2 / (n * (n * n - 1))
            # r.rho is engine-rounded at 6dp
            assert abs(r.rho - book) < 1.1e-6
        assert -1.0 <= r.rho <= 1.0


def test_quantile_ci_brackets_and_exact_binomial_coverage(spark):
    from hive_reflex_spark.operators.relational import (
        q299_quantile_order_ci,
    )

    rows = q299_quantile_order_ci(spark, SF_SMOKE).collect()
    con = duckdb.connect()
    cents = sorted(
        c
        for (c,) in con.execute(
            f"SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) "
            f"FROM '{SF_SMOKE}/lineitem.parquet'"
        ).fetchall()
    )
    n = len(cents)
    for r in rows:
        assert r.lo_rank <= r.rank <= r.hi_rank
        assert r.lo_cents == cents[r.lo_rank - 1]
        assert r.value_cents == cents[r.rank - 1]
        assert r.hi_cents == cents[r.hi_rank - 1]
        assert r.lo_cents <= r.value_cents <= r.hi_cents
        # canonical coverage: #obs below the true q-quantile is
        # Binomial(n, q); the bracket [X_(lo), X_(hi)] covers iff
        # lo <= Bin < hi — exact CDF must give >= ~95%
        q = r.pct / 100
        def pmf(k):
            return math.exp(
                math.lgamma(n + 1)
                - math.lgamma(k + 1)
                - math.lgamma(n - k + 1)
                + k * math.log(q)
                + (n - k) * math.log(1 - q)
            )

        cov = sum(pmf(k) for k in range(r.lo_rank, r.hi_rank))
        assert cov >= 0.94, (r.pct, cov)


# ---------------------------------------------------------------------------
# ADVICE r8 degenerate-input guards: both engines must return NULL (not
# inf/NaN on one side) when a variance denominator collapses to zero.
# ---------------------------------------------------------------------------


def _degenerate_events_dir(tmp_path, rows):
    """Write an events.parquet with the given (event_id, ts, user_id,
    event_type, value) rows into a tmp sf-dir."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _duck_on(sf_dir: str, sql: str):
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW events AS "
            f"SELECT * FROM '{sf_dir}/events.parquet'"
        )
        return con.execute(sql).fetchall()
    finally:
        con.close()


def test_cuped_zero_variance_covariate_is_null_both_engines(
    spark, tmp_path
):
    """Every user has the IDENTICAL pre-period spend -> var(X)=0 ->
    theta/adj_lift/rho2 NULL in Spark (try_divide) AND DuckDB (NULLIF)."""
    from datetime import datetime, timedelta

    import hive_reflex_spark.operators  # noqa: F401
    from hive_reflex_spark.registry import ORACLES, QUERIES

    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(4):
        rows.append((eid, t0, u, "purchase", 1.00))  # pre: x=100 for all
        eid += 1
        rows.append(
            (eid, t0 + timedelta(days=20), u, "purchase", 1.0 + u)
        )  # post: varying y
        eid += 1
    d = _degenerate_events_dir(tmp_path, rows)

    r = QUERIES["q293_cuped_adjustment"](spark, d).collect()[0]
    assert r.theta is None and r.adj_lift is None and r.rho2 is None
    assert r.raw_lift is not None  # unguarded path still defined

    (dr,) = _duck_on(d, ORACLES["q293_cuped_adjustment"])
    cols = ["n_users", "n_a", "n_b", "theta", "raw_lift", "adj_lift",
            "rho2"]
    duck = dict(zip(cols, dr))
    assert duck["theta"] is None
    assert duck["adj_lift"] is None
    assert duck["rho2"] is None


def test_delong_single_positive_is_null_both_engines(spark, tmp_path):
    """One positive example -> (p-1)=0 -> se/ci NULL in both engines."""
    from datetime import datetime, timedelta

    import hive_reflex_spark.operators  # noqa: F401
    from hive_reflex_spark.registry import ORACLES, QUERIES

    t0 = datetime(2024, 1, 1)
    rows = [(0, t0, 0, "purchase", 5.0)]
    for i in range(1, 6):
        rows.append((i, t0 + timedelta(hours=i), i, "view", float(i)))
    d = _degenerate_events_dir(tmp_path, rows)

    r = QUERIES["q295_auc_delong"](spark, d).collect()[0]
    assert r.p == 1 and r.neg == 5
    assert r.auc is not None
    assert r.se is None and r.ci_lo is None and r.ci_hi is None

    (dr,) = _duck_on(d, ORACLES["q295_auc_delong"])
    cols = ["p", "neg", "auc2num", "auc", "s10u", "s01u", "se",
            "ci_lo", "ci_hi"]
    duck = dict(zip(cols, dr))
    assert duck["se"] is None
    assert duck["ci_lo"] is None and duck["ci_hi"] is None


def test_two_pass_bucket_key_floors_negative_cents(spark):
    """The sign-safe bucket key: -150 cents must land in bucket -65536,
    not bucket 0 (the old cents - cents%w form mis-bucketed it)."""
    from hive_reflex_spark.operators.relational import (
        two_pass_histogram,
        two_pass_rank_values,
    )

    li = spark.createDataFrame(
        [(-150,), (-65537,), (0,), (1,), (70000,)], "cents long"
    )
    n, buckets = two_pass_histogram(li)
    assert n == 5
    assert dict(buckets) == {-131072: 1, -65536: 1, 0: 2, 65536: 1}
    # rank 1 = the minimum, rank 2 = -150: exact selection across
    # negative buckets
    vals = {
        r.rank: r.cents
        for r in two_pass_rank_values(li, buckets, [1, 2, 5]).collect()
    }
    assert vals == {1: -65537, 2: -150, 5: 70000}


def test_silhouette_matches_canonical_numpy_recompute(spark):
    """q294 canonical form (the q295-lesson audit gap): the simplified
    silhouette s_i = (b_i - a_i)/max(a_i, b_i) with a = cosine distance
    to the OWN (max-dot) centroid and b = to the nearest OTHER centroid
    — recomputed from the raw embeddings in pure Python, both in the
    frozen-unit form (exact equality) and in plain float (the textbook
    formula, 1e-4 closeness) so a mis-frozen unit expression cannot hide
    behind an engine-parity green."""
    from hive_reflex_spark.operators.similarity import (
        N_CENTROIDS_STRIDE,
        q294_simplified_silhouette,
    )

    rows = q294_simplified_silhouette(spark, SF_SMOKE).collect()
    con = duckdb.connect()
    raw = con.execute(
        f"SELECT vec_id, embedding FROM '{SF_SMOKE}/embeddings.parquet'"
    ).fetchall()
    vecs = {vid: list(emb) for vid, emb in raw}
    cents = {
        vid: emb
        for vid, emb in vecs.items()
        if vid % N_CENTROIDS_STRIDE == 0
    }

    def xdot(a, b):
        return sum(round(x * y * 1e9) for x, y in zip(a, b)) / 1e9

    nrm = {vid: math.sqrt(xdot(e, e)) for vid, e in vecs.items()}
    per_c: dict[int, list] = {}
    float_sil: dict[int, list] = {}
    for vid, e in vecs.items():
        dots = {cid: xdot(e, cents[cid]) for cid in cents}
        own = max(sorted(cents), key=lambda cid: (dots[cid], -cid))
        dd = {
            cid: 1.0 - dots[cid] / (nrm[vid] * nrm[cid]) for cid in cents
        }
        a = dd[own]
        b = min(v for cid, v in dd.items() if cid != own)
        g = max(a, b)
        # frozen-unit form: the oracle's exact tree (1e6*(b-a))/g
        s_units = None if g == 0 else round((1e6 * (b - a)) / g)
        per_c.setdefault(own, []).append(s_units)
        float_sil.setdefault(own, []).append(
            0.0 if g == 0 else (b - a) / g
        )

    assert {r.centroid_id for r in rows} == set(per_c)
    all_units = [u for us in per_c.values() for u in us if u is not None]
    all_float = [s for ss in float_sil.values() for s in ss]
    for r in rows:
        us = [u for u in per_c[r.centroid_id] if u is not None]
        assert r.n == len(per_c[r.centroid_id])
        assert r.sum_sil_units == sum(us)
        # textbook float form — catches a wrong freezing, not just a
        # wrong engine
        mean_f = sum(float_sil[r.centroid_id]) / len(
            float_sil[r.centroid_id]
        )
        assert abs(r.mean_sil - mean_f) < 1e-4, (r.centroid_id,)
        assert abs(
            r.global_mean_sil - sum(all_float) / len(all_float)
        ) < 1e-4
    n_tot = sum(len(v) for v in per_c.values())
    got_global = rows[0].global_mean_sil
    assert got_global == round(sum(all_units) * 1.0 / n_tot / 1e6, 6)


def test_bucket_key_matches_python_floor_div_property(spark):
    """Property: the pure-BIGINT bucket key cents - pmod(cents, w)
    equals Python's floor-division bucketing floor(c/w)*w for adversarial
    magnitudes on both sides of zero, INCLUDING values past 2^53 where a
    float-floor form silently mis-buckets."""
    from hive_reflex_spark.operators.relational import (
        _QUANTILE_BUCKET_CENTS,
        _bucket_key,
    )

    w = _QUANTILE_BUCKET_CENTS
    vals = [0, 1, -1, w - 1, w, w + 1, -w, -w - 1, -w + 1,
            2**53 + 1, 2**53 + w + 3, -(2**53) - 1,
            2**62 + 12345, -(2**62) - 12345, 150, -150]
    li = spark.createDataFrame([(v,) for v in vals], "cents long")
    got = {
        r.cents: r.b
        for r in li.select("cents", _bucket_key(w).alias("b")).collect()
    }
    for v in vals:
        assert got[v] == (v // w) * w, (v, got[v], (v // w) * w)


def test_permutation_test_planted_null_gives_p_one(spark, tmp_path):
    """Canonical distribution-level property (not a construction
    replay): on a PLANTED exact null — two event types with identical
    daily totals — the observed deviation is 0, every one of the B
    relabelings is at least as extreme, and the add-one estimator
    must return exactly p = 1 (1e6 units) with n_extreme == B."""
    from datetime import datetime, timedelta

    from hive_reflex_spark.operators.analytics import (
        _PERM_B,
        q289_permutation_test,
    )

    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(6):
        for typ in ("aa", "bb"):
            rows.append(
                (eid, t0 + timedelta(days=day), eid % 7, typ,
                 10.0 + day)  # same value per day for both types
            )
            eid += 1
    d = _degenerate_events_dir(tmp_path, rows)
    r = q289_permutation_test(spark, d).collect()
    assert len(r) == 1
    assert (r[0].type_a, r[0].type_b) == ("aa", "bb")
    assert r[0].t_obs * 2 == sum(round((10.0 + day) * 100) for day in range(6)) * 2
    assert r[0].n_extreme == _PERM_B
    assert r[0].p_units == 1_000_000


# ---------------------------------------------------------------------------
# r10: canonical-form replays extended BACKWARD to the pre-r8 statistics
# operators (r9 verdict #5) — each checks the TEXTBOOK form of the
# statistic against raw fixture data, not the repo's own expression.
# ---------------------------------------------------------------------------


def _hourly_cents(sf_dir: str):
    """(event_type, hour_index, cents) — the raw series both q123 and
    q128 aggregate. Quantization (ROUND(value*100)) reuses duckdb as a
    data-prep step (q290 precedent); the statistics are recomputed in
    numpy below."""
    con = duckdb.connect()
    return con.execute(
        f"SELECT event_type, "
        f"CAST(epoch(date_trunc('hour', ts)) // 3600 AS BIGINT) AS h, "
        f"CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents "
        f"FROM '{sf_dir}/events.parquet' GROUP BY 1, 2"
    ).fetchall()


def test_pearson_matches_numpy_corrcoef(spark):
    """q123's exact-integer-moment correlation must equal the textbook
    Pearson r (np.corrcoef) on the identical raw hourly series."""
    import numpy as np

    from hive_reflex_spark.operators.analytics import q123_metric_correlation

    rows = q123_metric_correlation(spark, SF_SMOKE).collect()
    assert rows
    series: dict[str, dict[int, int]] = {}
    for t, h, cents in _hourly_cents(SF_SMOKE):
        series.setdefault(t, {})[h] = cents
    for r in rows:
        a, b = series[r.type_a], series[r.type_b]
        hours = sorted(set(a) & set(b))
        assert r.n == len(hours)
        x = np.array([a[h] for h in hours], dtype=np.float64)
        y = np.array([b[h] for h in hours], dtype=np.float64)
        canonical = float(np.corrcoef(x, y)[0, 1])
        assert abs(r.pearson_r - canonical) < 2e-6, (r.type_a, r.type_b)


def test_trend_ols_matches_numpy_polyfit(spark):
    """q128's closed-form moments must equal np.polyfit least squares
    (slope, intercept) and corr^2 (R^2) on the raw hourly series."""
    import numpy as np

    from hive_reflex_spark.operators.analytics import q128_trend_ols

    rows = q128_trend_ols(spark, SF_SMOKE).collect()
    assert rows
    series: dict[str, list[tuple[int, int]]] = {}
    for t, h, cents in _hourly_cents(SF_SMOKE):
        series.setdefault(t, []).append((h, cents))
    for r in rows:
        pts = series[r.event_type]
        assert r.n == len(pts)
        h0 = min(h for h, _ in pts)
        x = np.array([h - h0 for h, _ in pts], dtype=np.float64)
        y = np.array([c for _, c in pts], dtype=np.float64)
        slope, intercept = np.polyfit(x, y, 1)
        r2 = float(np.corrcoef(x, y)[0, 1]) ** 2
        assert abs(r.slope_per_hour - slope / 100.0) < 1e-5, r.event_type
        assert abs(r.intercept - intercept / 100.0) < 1e-4, r.event_type
        assert abs(r.r_squared - r2) < 2e-6, r.event_type


def test_ab_readout_matches_textbook_two_proportion_z(spark):
    """q189's funnel counts and pooled z recomputed in pure Python:
    conversion = purchase within 24 h of the user's FIRST view, arms by
    user_id parity, z = (rb-ra)/sqrt(p(1-p)(1/na+1/nb))."""
    from hive_reflex_spark.operators.analytics import q189_ab_test_readout

    row = q189_ab_test_readout(spark, SF_SMOKE).collect()[0]
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT user_id, event_type, epoch_us(ts) "
        f"FROM '{SF_SMOKE}/events.parquet'"
    ).fetchall()
    first_view: dict[int, int] = {}
    buys: dict[int, list[int]] = {}
    users = set()
    for uid, t, us in ev:
        users.add(uid)
        if t == "view":
            first_view[uid] = min(first_view.get(uid, us), us)
        elif t == "purchase":
            buys.setdefault(uid, []).append(us)
    n = {"A": 0, "B": 0}
    conv = {"A": 0, "B": 0}
    day_us = 86_400_000_000
    for uid in users:
        arm = "A" if uid % 2 == 0 else "B"
        n[arm] += 1
        tv = first_view.get(uid)
        if tv is not None and any(
            tv <= tb <= tv + day_us for tb in buys.get(uid, ())
        ):
            conv[arm] += 1
    assert (row.n_a, row.conv_a) == (n["A"], conv["A"])
    assert (row.n_b, row.conv_b) == (n["B"], conv["B"])
    ra, rb = conv["A"] / n["A"], conv["B"] / n["B"]
    assert abs(row.rate_a - ra) < 1e-6 and abs(row.rate_b - rb) < 1e-6
    p = (conv["A"] + conv["B"]) / (n["A"] + n["B"])
    if 0 < p < 1:
        z = (rb - ra) / math.sqrt(p * (1 - p) * (1 / n["A"] + 1 / n["B"]))
        assert abs(row.z_score - z) < 1e-6
    else:
        assert row.z_score is None


def test_gini_matches_mean_absolute_difference_form(spark):
    """q204 uses the rank closed form G = 2*sum(i*xi)/(n*sum x)-(n+1)/n;
    the canonical definition is the relative mean absolute difference
    G = sum_ij |xi-xj| / (2 n^2 mu). The two must agree exactly."""
    from hive_reflex_spark.operators.analytics import q204_revenue_gini

    row = q204_revenue_gini(spark, SF_SMOKE).collect()[0]
    con = duckdb.connect()
    units = [
        u
        for (u,) in con.execute(
            f"SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) "
            f"AS BIGINT) FROM '{SF_SMOKE}/orders.parquet' GROUP BY o_custkey"
        ).fetchall()
    ]
    n, total = len(units), sum(units)
    assert row.n_customers == n
    assert abs(row.total_revenue - total / 100.0) < 1e-6
    xs = sorted(units)
    # O(n) exact MAD via the sorted prefix identity:
    # sum_ij |xi-xj| = 2 * sum_i ((2i - n + 1) * x_(i)) with 0-based i
    mad2 = 2 * sum((2 * i - n + 1) * x for i, x in enumerate(xs))
    canonical = mad2 / (2.0 * n * n * (total / n))
    assert abs(row.gini - canonical) < 2e-6


def test_calibration_ece_matches_textbook_weighted_gap(spark):
    """q235 recomputed from raw embeddings: bin membership replays the
    exact frozen-unit construction (integer e6/ppm/floor-div), while
    accuracy, confidence, and ECE = sum_b (n_b/N)|acc_b - conf_b| are
    plain-float textbook aggregation (Guo et al. 2017, eq. 3)."""
    import pandas as pd  # noqa: F401 — pyarrow path below

    import pyarrow.parquet as pq

    from hive_reflex_spark.operators.analytics import q235_calibration_ece

    rows = {r.bin: r for r in q235_calibration_ece(spark, SF_SMOKE).collect()}
    tbl = pq.read_table(f"{SF_SMOKE}/embeddings.parquet").to_pydict()
    bins: dict[int, list[tuple[float, int]]] = {}
    for vec, label in zip(tbl["embedding"], tbl["label"]):
        vs = [float(x) for x in vec]
        vmax = max(vs)
        e6 = [math.floor(math.exp(12.0 * (v - vmax)) * 1e6 + 0.5) for v in vs]
        sum_e, max_e = sum(e6), max(e6)
        pred_dim = min(
            range(len(vs)), key=lambda d: (-vs[d], d)
        )
        conf = ((1_000_000 * max_e) // sum_e) / 1e6
        b = min((10 * max_e) // sum_e, 9)
        bins.setdefault(int(b), []).append((conf, int(pred_dim % 10 == label)))
    assert set(bins) == set(rows)
    n_total = sum(len(v) for v in bins.values())
    ece = 0.0
    for b, members in bins.items():
        n_b = len(members)
        conf_b = sum(c for c, _ in members) / n_b
        acc_b = sum(k for _, k in members) / n_b
        assert rows[b].n_vectors == n_b
        assert abs(rows[b].avg_confidence - conf_b) < 2e-6
        assert abs(rows[b].accuracy - acc_b) < 1e-6
        assert abs(rows[b].calib_gap - (acc_b - conf_b)) < 2e-6
        ece += (n_b / n_total) * abs(acc_b - conf_b)
    for r in rows.values():
        assert abs(r.ece - ece) < 2e-6


def test_quantile_normalize_matches_python_ntile_and_pooled_mean(spark):
    """q249 replayed independently: Python ntile(10) over each source's
    (n_chars, doc_id) order, then the canonical quantile-normalization
    mapping — decile d's target is the POOLED mean of decile-d members
    across all sources."""
    from hive_reflex_spark.operators.analytics import q249_quantile_normalize

    got = {
        (r.source, r.decile): r
        for r in q249_quantile_normalize(spark, SF_SMOKE).collect()
    }
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, source, n_chars FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    by_src: dict[str, list[tuple[int, int]]] = {}
    for doc_id, src, n_chars in docs:
        by_src.setdefault(src, []).append((n_chars, doc_id))
    cells: dict[tuple[str, int], list[int]] = {}
    pool: dict[int, list[int]] = {}
    for src, members in by_src.items():
        members.sort()
        n, k = len(members), 10
        base, rem = divmod(n, k)
        i = 0
        for d in range(1, k + 1):
            width = base + (1 if d <= rem else 0)
            for n_chars, _ in members[i : i + width]:
                cells.setdefault((src, d), []).append(n_chars)
                pool.setdefault(d, []).append(n_chars)
            i += width
    assert set(cells) == set(got)
    for key, chars in cells.items():
        assert got[key].n_docs == len(chars)
        assert abs(got[key].raw_avg - sum(chars) / len(chars)) < 1e-6
        d = key[1]
        target = sum(pool[d]) / len(pool[d])
        assert abs(got[key].normalized - target) < 1e-6
