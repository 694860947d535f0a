"""Numpy-oracle tests for the NN composites: LSTM recurrence, attention
sanity, cascade loop ≡ declarative CASE."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hive_reflex_spark.io import read_table
from hive_reflex_spark.operators.analytics import (
    cascade_exit_stage,
    run_cascade,
)
from hive_reflex_spark.operators.nn import lstm_forward, q66_attention


def test_lstm_matches_numpy(spark):
    """`imc22_cim.c:144-172` gate semantics, packed i,f,g,o layout."""
    rng = np.random.default_rng(1)
    d, h, n = 2, 3, 40
    wx = rng.normal(scale=0.5, size=(4 * h, d))
    wh = rng.normal(scale=0.5, size=(4 * h, h))
    b = rng.normal(scale=0.1, size=4 * h)
    x = rng.normal(size=(n, d))
    rows = [(0, int(t), float(x[t, 0]), float(x[t, 1])) for t in range(n)]
    df = spark.createDataFrame(rows, "seq int, t int, x0 double, x1 double")
    got = sorted(
        lstm_forward(df, ["seq"], "t", ["x0", "x1"], wx, wh, b, h).collect(),
        key=lambda r: r.t,
    )

    def sig(v):
        return 1 / (1 + np.exp(-v))

    hs, cs = np.zeros(h), np.zeros(h)
    for t in range(n):
        z = wx @ x[t] + wh @ hs + b
        i, f, g, o = sig(z[:h]), sig(z[h : 2 * h]), np.tanh(z[2 * h : 3 * h]), sig(z[3 * h :])
        cs = f * cs + i * g
        hs = o * np.tanh(cs)
        np.testing.assert_allclose(
            [got[t][f"h{j}"] for j in range(h)], hs, rtol=1e-10
        )


def test_attention_rows_are_convex_combinations(spark, sf_smoke):
    """Attention output must lie inside the convex hull of V rows: each
    out dim between min and max of the value vectors' dim."""
    out = q66_attention(spark, sf_smoke).collect()
    emb = {
        r.vec_id: np.array(r.embedding, dtype="float64")
        for r in read_table(spark, sf_smoke, "embeddings")
        .filter(F.col("vec_id").between(100, 107))
        .collect()
    }
    v = np.stack(list(emb.values()))
    lo, hi = v.min(axis=0), v.max(axis=0)
    assert len(out) == 4 * 64
    for r in out:
        assert lo[r.out_dim] - 1e-6 <= r.out_v <= hi[r.out_dim] + 1e-6


def test_cascade_loop_matches_declarative(spark, sf_smoke):
    """The driver-loop cascade (T2 control flow) must agree row-for-row
    with the single-pass CASE expression."""
    events = read_table(spark, sf_smoke, "events")
    loop = {r.event_id: r.exit_stage for r in run_cascade(events).collect()}
    decl = {
        r.event_id: r.exit_stage
        for r in events.withColumn("exit_stage", cascade_exit_stage())
        .select("event_id", "exit_stage")
        .collect()
    }
    assert loop == decl


def test_int4_pack_lossless(spark, sf_smoke):
    from hive_reflex_spark.operators.codec import q70_int4_pack

    rows = q70_int4_pack(spark, sf_smoke).collect()
    assert len(rows) == 8 * 32
    for r in rows:
        assert 0 <= r.packed <= 255
        assert r.unpacked_hi == (r.packed >> 4) & 15
        assert r.unpacked_lo == r.packed & 15


def test_gru_matches_numpy(spark):
    """LAYER_GRU semantics (z/r/n packed gates)."""
    from hive_reflex_spark.operators.nn import gru_forward

    rng = np.random.default_rng(9)
    d, h, n = 2, 3, 30
    wx = rng.normal(scale=0.5, size=(3 * h, d))
    wh = rng.normal(scale=0.5, size=(3 * h, h))
    b = rng.normal(scale=0.1, size=3 * h)
    x = rng.normal(size=(n, d))
    rows = [(0, int(t), float(x[t, 0]), float(x[t, 1])) for t in range(n)]
    df = spark.createDataFrame(rows, "seq int, t int, x0 double, x1 double")
    got = sorted(
        gru_forward(df, ["seq"], "t", ["x0", "x1"], wx, wh, b, h).collect(),
        key=lambda r: r.t,
    )

    def sig(v):
        return 1 / (1 + np.exp(-v))

    hs = np.zeros(h)
    for t in range(n):
        zx = wx @ x[t] + b
        zh = wh @ hs
        z = sig(zx[:h] + zh[:h])
        r = sig(zx[h : 2 * h] + zh[h : 2 * h])
        nn_ = np.tanh(zx[2 * h :] + r * zh[2 * h :])
        hs = (1 - z) * nn_ + z * hs
        np.testing.assert_allclose(
            [got[t][f"h{j}"] for j in range(h)], hs, rtol=1e-10
        )


def test_fold_batchnorm(spark):
    """w' = w·γ/√(σ²+ε), checked against the closed form."""
    from hive_reflex_spark.operators.nn import fold_batchnorm

    w = spark.createDataFrame(
        [("fc", 0, 0, 2.0), ("fc", 0, 1, -1.0), ("fc", 1, 0, 4.0)],
        "layer string, i int, j int, value double",
    )
    bn = spark.createDataFrame(
        [("fc", 0, 0.5, 0.0, 0.0, 1.0), ("fc", 1, 2.0, 0.0, 0.0, 3.0)],
        "layer string, i int, gamma double, beta double, mean double, var double",
    )
    got = {(r.i, r.j): r.value for r in fold_batchnorm(w, bn).collect()}
    import math

    assert got[(0, 0)] == pytest.approx(2.0 * 0.5 / math.sqrt(1.0 + 1e-5))
    assert got[(0, 1)] == pytest.approx(-1.0 * 0.5 / math.sqrt(1.0 + 1e-5))
    assert got[(1, 0)] == pytest.approx(4.0 * 2.0 / math.sqrt(3.0 + 1e-5))


def test_power_rollup_matches_published_report(spark):
    """The A7 rollup must reproduce the reference's published
    reports/power_estimate.json: Active 48.8605 mW, Standby 0.43254 mW,
    DeepSleep 0.088096 mW."""
    from hive_reflex_spark.operators.power import q79_power_rollup

    got = {r.mode: r.total_mw for r in q79_power_rollup(spark, "").collect()}
    assert got["Active"] == pytest.approx(48.8605, abs=1e-4)
    assert got["Standby"] == pytest.approx(0.43254, abs=1e-5)
    assert got["DeepSleep"] == pytest.approx(0.088096, abs=1e-6)


def test_asof_join_pandas_matches_rangejoin(spark, sf_smoke):
    from hive_reflex_spark.operators.timeseries import (
        asof_join_pandas,
        q59a_asof_join,
    )
    from hive_reflex_spark.io import read_table
    from pyspark.sql import functions as F

    base = {
        (r.event_id): r.latest_orderkey
        for r in q59a_asof_join(spark, sf_smoke).collect()
    }
    events = read_table(spark, sf_smoke, "events").select(
        "event_id", F.col("user_id").alias("k"), "ts"
    )
    orders = read_table(spark, sf_smoke, "orders").select(
        F.col("o_custkey").alias("k"), "o_orderkey", "o_orderdate"
    )
    fast = asof_join_pandas(events, orders, "k", "ts", "o_orderdate")
    got = {
        r.event_id: r.o_orderkey
        for r in fast.collect()
        if r.o_orderkey is not None
    }
    # merge_asof ties: equal o_orderdate rows pick the last after sort —
    # compare on events whose match is unambiguous in both
    agree = sum(1 for k, v in base.items() if got.get(k) == v)
    assert agree / len(base) > 0.95


def test_layernorm_matches_numpy(spark):
    """q107 semantics against a plain numpy LayerNorm (no integer-unit
    pinning needed at rtol 1e-6 — the pinning exists for cross-engine
    hash equality, not accuracy)."""
    from hive_reflex_spark.operators.nn import LN_EPS, layernorm_coords

    rng = np.random.default_rng(7)
    x = rng.normal(size=(5, 32))
    rows = [
        (i, j, float(x[i, j])) for i in range(5) for j in range(32)
    ]
    df = spark.createDataFrame(rows, "vec_id int, dim int, v double")
    got = layernorm_coords(
        df,
        keys=["vec_id"],
        gamma=F.lit(1.0) + F.col("dim") / F.lit(128.0),
        beta=F.col("dim") / F.lit(1000.0),
    ).collect()
    gamma = 1 + np.arange(32) / 128.0
    beta = np.arange(32) / 1000.0
    want = (
        (x - x.mean(axis=1, keepdims=True))
        / np.sqrt(x.var(axis=1, keepdims=True) + LN_EPS)
    ) * gamma + beta
    for r in got:
        np.testing.assert_allclose(
            r.ln_v, want[r.vec_id, r.dim], rtol=1e-6, atol=1e-6
        )


def test_rmsnorm_matches_numpy(spark):
    from hive_reflex_spark.operators.nn import LN_EPS, rmsnorm_coords

    rng = np.random.default_rng(8)
    x = rng.normal(size=(4, 16))
    rows = [(i, j, float(x[i, j])) for i in range(4) for j in range(16)]
    df = spark.createDataFrame(rows, "vec_id int, dim int, v double")
    got = rmsnorm_coords(df, keys=["vec_id"]).collect()
    want = x / np.sqrt((x * x).mean(axis=1, keepdims=True) + LN_EPS)
    for r in got:
        np.testing.assert_allclose(
            r.rms_v, want[r.vec_id, r.dim], rtol=1e-6, atol=1e-6
        )


def test_layernorm_single_exchange(spark, sf_smoke):
    """The mean/var windows and output projection must share ONE shuffle
    on vec_id — chained Window ops, no re-exchange."""
    from hive_reflex_spark.operators.nn import q107_layernorm

    plan = (
        q107_layernorm(spark, sf_smoke)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_lstm_fixed_nondegenerate_and_bounded(spark, sf_smoke):
    """The Q16.16 hard-gate LSTM must produce a varied, bounded
    trajectory — an all-zero (gate-saturated) run would hash-match a
    degenerate oracle and prove nothing."""
    from hive_reflex_spark.operators.nn import q68a_lstm_unrolled

    rows = q68a_lstm_unrolled(spark, sf_smoke).collect()
    h0 = {r.h0 for r in rows}
    h1 = {r.h1 for r in rows}
    assert len(h0) > 50 and len(h1) > 50, (len(h0), len(h1))
    for r in rows:
        assert -1.0 <= r.h0 <= 1.0 and -1.0 <= r.h1 <= 1.0


def test_adaptive_cascade_bounded_and_live(spark, sf_smoke):
    """The threshold-adjust factor must stay in cascade_model.h's
    [0.9, 1.1] band and actually move (a clamp-pinned trajectory would
    mean the controller never operates in its active region)."""
    from hive_reflex_spark.operators.analytics import q108_adaptive_cascade

    rows = q108_adaptive_cascade(spark, sf_smoke).collect()
    factors = [r.factor for r in rows]
    assert all(0.9 <= f <= 1.1 for f in factors)
    assert len(set(factors)) > 20, len(set(factors))
    # factor is rounded to 6dp independently of the threshold, so the
    # recomputation tolerance is 40 x the rounding quantum
    for r in rows:
        assert abs(r.effective_threshold - 40.0 * r.factor) < 4e-5


def test_gru_fixed_nondegenerate_and_bounded(spark, sf_smoke):
    from hive_reflex_spark.operators.nn import q68b_gru_unrolled

    rows = q68b_gru_unrolled(spark, sf_smoke).collect()
    h0 = {r.h0 for r in rows}
    assert len(h0) > 50, len(h0)
    for r in rows:
        assert -1.0 <= r.h0 <= 1.0 and -1.0 <= r.h1 <= 1.0


def test_layernorm_degenerate_inputs(spark):
    """Edge semantics: a constant vector has var=0, so ln_v = beta
    exactly (gamma * 0 / sqrt(eps) + beta); a single-element group
    likewise normalizes to beta. Neither may NaN."""
    from hive_reflex_spark.operators.nn import layernorm_coords

    rows = [(0, j, 2.5) for j in range(8)] + [(1, 0, -3.0)]
    df = spark.createDataFrame(rows, "vec_id int, dim int, v double")
    got = layernorm_coords(
        df, keys=["vec_id"], beta=F.col("dim") / F.lit(10.0)
    ).collect()
    assert len(got) == 9
    for r in got:
        assert r.ln_v == pytest.approx(r.dim / 10.0, abs=1e-9), r


def test_transformer_block_matches_numpy(spark, sf_smoke):
    """q109's 6-stage composition against an unpinned numpy transformer
    block — the integer-unit/6dp pinning exists for cross-engine hash
    equality and must not change the math beyond rounding noise."""
    from hive_reflex_spark.operators.nn import (
        _GELU_C,
        TB_TOKENS,
        q109_transformer_block,
    )

    emb = {
        r.vec_id: np.array(r.embedding, dtype="float64")
        for r in read_table(spark, sf_smoke, "embeddings")
        .filter(F.col("vec_id") < TB_TOKENS)
        .collect()
    }
    x = np.stack([emb[i] for i in range(TB_TOKENS)])

    def ln(m):
        mu = m.mean(axis=1, keepdims=True)
        var = m.var(axis=1, keepdims=True)
        return (m - mu) / np.sqrt(var + 1e-5)

    h1 = ln(x)
    s = h1 @ h1.T / 8.0
    e = np.exp(s - s.max(axis=1, keepdims=True))
    w = e / e.sum(axis=1, keepdims=True)
    r1 = x + w @ h1
    h2 = ln(r1)
    i_idx = np.arange(64)
    wt = (((i_idx[:, None] * 7 + i_idx[None, :] * 3) % 9) - 4) / 64.0
    f = h2 @ wt
    g = 0.5 * f * (1 + np.tanh(_GELU_C * (f + 0.044715 * f**3)))
    want = r1 + g

    got = q109_transformer_block(spark, sf_smoke).collect()
    assert len(got) == TB_TOKENS * 64
    for r in got:
        assert abs(r.out_v - want[r.pos, r.dim]) < 2e-3, (r, want[r.pos, r.dim])


def test_multihead_output_is_per_head_convex(spark, sf_smoke):
    """Each 16-dim head slice of q66b's output must lie inside the
    convex hull of the token values for that slice (softmax weights are
    convex per head) — a head-mixing bug would violate this."""
    from hive_reflex_spark.operators.nn import (
        TB_TOKENS,
        q66b_multihead_attention,
    )

    emb = {
        r.vec_id: np.array(r.embedding, dtype="float64")
        for r in read_table(spark, sf_smoke, "embeddings")
        .filter(F.col("vec_id") < TB_TOKENS)
        .collect()
    }
    v = np.stack([emb[i] for i in range(TB_TOKENS)])
    lo, hi = v.min(axis=0), v.max(axis=0)
    out = q66b_multihead_attention(spark, sf_smoke).collect()
    assert len(out) == TB_TOKENS * 64
    for r in out:
        assert lo[r.dim] - 1e-5 <= r.out_v <= hi[r.dim] + 1e-5, r


def test_swiglu_matches_numpy(spark, sf_smoke):
    from hive_reflex_spark.operators.nn import (
        SWIGLU_HIDDEN,
        TB_TOKENS,
        q109a_swiglu_mlp,
    )

    emb = {
        r.vec_id: np.array(r.embedding, dtype="float64")
        for r in read_table(spark, sf_smoke, "embeddings")
        .filter(F.col("vec_id") < TB_TOKENS)
        .collect()
    }
    x = np.stack([emb[i] for i in range(TB_TOKENS)])

    def wt(a, b, rows, cols):
        i = np.arange(rows)[:, None]
        j = np.arange(cols)[None, :]
        return (((i * a + j * b) % 9) - 4) / 64.0

    g = x @ wt(5, 7, 64, SWIGLU_HIDDEN)
    u = x @ wt(3, 5, 64, SWIGLU_HIDDEN)
    m = (g / (1 + np.exp(-g))) * u
    want = m @ wt(7, 3, SWIGLU_HIDDEN, 64)
    got = q109a_swiglu_mlp(spark, sf_smoke).collect()
    assert len(got) == TB_TOKENS * 64
    for r in got:
        assert abs(r.out_v - want[r.pos, r.dim]) < 2e-3, r


def test_rope_is_norm_preserving(spark, sf_smoke):
    """Rotation invariant: each (even, odd) pair's L2 norm is unchanged
    by RoPE (up to the 6dp pinning), and position 0 is the identity."""
    from hive_reflex_spark.operators.nn import TB_TOKENS, q109b_rope

    emb = {
        r.vec_id: np.array(r.embedding, dtype="float64")
        for r in read_table(spark, sf_smoke, "embeddings")
        .filter(F.col("vec_id") < TB_TOKENS)
        .collect()
    }
    out = np.zeros((TB_TOKENS, 64))
    for r in q109b_rope(spark, sf_smoke).collect():
        out[r.pos, r.dim] = r.out_v
    for p in range(TB_TOKENS):
        x = emb[p]
        for i in range(32):
            n_in = np.hypot(x[2 * i], x[2 * i + 1])
            n_out = np.hypot(out[p, 2 * i], out[p, 2 * i + 1])
            assert abs(n_in - n_out) < 1e-4, (p, i)
    np.testing.assert_allclose(out[0], emb[0], atol=2e-6)  # theta=0


def test_llama_block_matches_numpy(spark, sf_smoke):
    """q109c's eight-stage composition against an unpinned numpy Llama
    block (RMSNorm eps 1e-6, RoPE on q=k, causal softmax, SwiGLU)."""
    from hive_reflex_spark.operators.nn import (
        RMS_EPS,
        SWIGLU_HIDDEN,
        TB_TOKENS,
        q109c_llama_block,
    )

    emb = {
        r.vec_id: np.array(r.embedding, dtype="float64")
        for r in read_table(spark, sf_smoke, "embeddings")
        .filter(F.col("vec_id") < TB_TOKENS)
        .collect()
    }
    x = np.stack([emb[i] for i in range(TB_TOKENS)])

    def rms(m):
        return m / np.sqrt((m * m).mean(axis=1, keepdims=True) + RMS_EPS)

    def rope(m):
        out = m.copy()
        for p in range(m.shape[0]):
            for i in range(32):
                th = p / (10000.0 ** (2.0 * i / 64.0))
                c, s = np.cos(th), np.sin(th)
                e, o = m[p, 2 * i], m[p, 2 * i + 1]
                out[p, 2 * i] = e * c - o * s
                out[p, 2 * i + 1] = e * s + o * c
        return out

    h1 = rms(x)
    rq = rope(h1)
    s = rq @ rq.T / 8.0
    mask = np.tril(np.ones((TB_TOKENS, TB_TOKENS), dtype=bool))
    s = np.where(mask, s, -np.inf)
    e = np.exp(s - s.max(axis=1, keepdims=True))
    w = e / e.sum(axis=1, keepdims=True)
    r1 = x + w @ h1
    h2 = rms(r1)

    def wt(a, b, rows, cols):
        i = np.arange(rows)[:, None]
        j = np.arange(cols)[None, :]
        return (((i * a + j * b) % 9) - 4) / 64.0

    g = h2 @ wt(5, 7, 64, SWIGLU_HIDDEN)
    u = h2 @ wt(3, 5, 64, SWIGLU_HIDDEN)
    want = r1 + ((g / (1 + np.exp(-g))) * u) @ wt(7, 3, SWIGLU_HIDDEN, 64)

    got = q109c_llama_block(spark, sf_smoke).collect()
    assert len(got) == TB_TOKENS * 64
    for r in got:
        assert abs(r.out_v - want[r.pos, r.dim]) < 2e-3, r


def test_attention_blocked_is_bit_identical_to_coordinate_chain(spark, sf_smoke):
    """The numpy-blocked attention tier (q66d) and the coordinate chain
    (q66c) share one oracle; pin the equivalence DIRECTLY too — every
    (qid, out_dim) value bit-identical, which is what makes the two
    plans interchangeable at the library level."""
    from hive_reflex_spark.operators.nn import (
        q66c_attention_scaled,
        q66d_attention_blocked,
    )

    coord = {
        (r["qid"], r["out_dim"]): r["out_v"]
        for r in q66c_attention_scaled(spark, sf_smoke).collect()
    }
    blocked = {
        (r["qid"], r["out_dim"]): r["out_v"]
        for r in q66d_attention_blocked(spark, sf_smoke).collect()
    }
    assert set(coord) == set(blocked)
    assert all(coord[k] == blocked[k] for k in coord)  # == : bit parity


def test_conv2d_blocked_is_bit_identical_to_coordinate_join(spark, sf_smoke):
    """The per-image numpy conv tier (q67b) and the im2col coordinate
    join (q67) share one oracle; pin the equivalence directly — every
    (oy, ox) value bit-identical, taps included."""
    from hive_reflex_spark.operators.nn import q67_conv2d, q67b_conv2d_blocked

    coord = {
        (r["oy"], r["ox"]): (r["conv_v"], r["n_taps"])
        for r in q67_conv2d(spark, sf_smoke).collect()
    }
    blocked = {
        (r["oy"], r["ox"]): (r["conv_v"], r["n_taps"])
        for r in q67b_conv2d_blocked(spark, sf_smoke).collect()
    }
    assert set(coord) == set(blocked)
    assert all(coord[k] == blocked[k] for k in coord)


def test_lstm_blocked_matches_per_key(spark, sf_smoke):
    """The batched recurrence (q68c) must replay q68a's per-key
    trajectory BIT-identically on every row — the padding/masking across
    sequences of different lengths is the part a bug would break."""
    from hive_reflex_spark.operators.nn import (
        q68a_lstm_unrolled,
        q68c_lstm_blocked,
    )

    base = {
        r.event_id: (r.h0, r.h1)
        for r in q68a_lstm_unrolled(spark, sf_smoke).collect()
    }
    blocked = {
        r.event_id: (r.h0, r.h1)
        for r in q68c_lstm_blocked(spark, sf_smoke).collect()
    }
    assert base == blocked


def test_gru_blocked_matches_per_key(spark, sf_smoke):
    """q68d (batched GRU) bit-matches q68b's per-key trajectory."""
    from hive_reflex_spark.operators.nn import (
        q68b_gru_unrolled,
        q68d_gru_blocked,
    )

    base = {
        r.event_id: (r.h0, r.h1)
        for r in q68b_gru_unrolled(spark, sf_smoke).collect()
    }
    blocked = {
        r.event_id: (r.h0, r.h1)
        for r in q68d_gru_blocked(spark, sf_smoke).collect()
    }
    assert base == blocked


def test_lstm_blocked_handles_negative_and_edge_sequences(spark):
    """The batched recurrence's padding/masking and SIGNED integer
    semantics on inputs the fixture never exercises: negative values
    (floor semantics on negative accumulators), single-event sequences,
    duplicate timestamps (unique tie-break), and wildly unequal
    sequence lengths within one salt group."""
    from hive_reflex_spark.operators.nn import (
        _LSTM_H,
        _LSTM_XSCALE,
        lstm_fixed_forward,
        lstm_fixed_forward_blocked,
    )

    rows = []
    eid = 0
    # user 0: single event, negative value
    rows.append((0, eid, 1_000_000, -55.25)); eid += 1
    # user 16 (same salt as user 0): long mixed-sign sequence
    for t in range(12):
        rows.append((16, eid, 1_000_000 + t * 7, (-1) ** t * (3.7 * t + 0.01)))
        eid += 1
    # user 1: duplicate timestamps -> event_id tie-break is load-bearing
    rows.append((1, eid, 2_000_000, 10.0)); eid += 1
    rows.append((1, eid, 2_000_000, -10.0)); eid += 1
    rows.append((1, eid, 2_000_000, 0.5)); eid += 1
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_us long, value double"
    )
    base = {
        r.event_id: tuple(r[f"h{j}"] for j in range(_LSTM_H))
        for r in lstm_fixed_forward(
            df, ["user_id"], ["ts_us", "event_id"], "value",
            _LSTM_XSCALE, _LSTM_H,
        ).collect()
    }
    blocked = {
        r.event_id: tuple(r[f"h{j}"] for j in range(_LSTM_H))
        for r in lstm_fixed_forward_blocked(
            df, "user_id", ["ts_us", "event_id"], "value",
            _LSTM_XSCALE, _LSTM_H,
        ).collect()
    }
    assert base == blocked
    assert len(base) == len(rows)


def test_gru_blocked_handles_negative_and_edge_sequences(spark):
    """q68d's padding/masking and signed semantics under the same
    adversarial frame as the LSTM edge test."""
    from hive_reflex_spark.operators.nn import (
        _LSTM_H,
        _LSTM_XSCALE,
        gru_fixed_forward,
        gru_fixed_forward_blocked,
    )

    rows = []
    eid = 0
    rows.append((0, eid, 1_000_000, -55.25)); eid += 1
    for t in range(12):
        rows.append((16, eid, 1_000_000 + t * 7, (-1) ** t * (3.7 * t + 0.01)))
        eid += 1
    rows.append((1, eid, 2_000_000, 10.0)); eid += 1
    rows.append((1, eid, 2_000_000, -10.0)); eid += 1
    rows.append((1, eid, 2_000_000, 0.5)); eid += 1
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_us long, value double"
    )
    base = {
        r.event_id: tuple(r[f"h{j}"] for j in range(_LSTM_H))
        for r in gru_fixed_forward(
            df, ["user_id"], ["ts_us", "event_id"], "value",
            _LSTM_XSCALE, _LSTM_H,
        ).collect()
    }
    blocked = {
        r.event_id: tuple(r[f"h{j}"] for j in range(_LSTM_H))
        for r in gru_fixed_forward_blocked(
            df, "user_id", ["ts_us", "event_id"], "value",
            _LSTM_XSCALE, _LSTM_H,
        ).collect()
    }
    assert base == blocked
    assert len(base) == len(rows)
