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
