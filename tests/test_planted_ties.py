"""Planted exact-.5 rounding fixture for the blocked-kernel tier.

The r7 property-test failure showed the blocked kernels' half-away
emulation was only *fixture-lucky*: real embeddings never put a scaled
product exactly on a .5 double, so a half-even/half-away divergence
would stay latent until corpus data hits the boundary. This fixture
makes the boundary the COMMON case, by construction:

1e9 = 2^9 * 5^9, so a product of dyadic values a*b = p * 2^-10 (p odd)
scales to y = p * 5^9 * 2^-1 EXACTLY (p*5^9 < 2^53, power-of-two shift
exact) — an odd multiple of 0.5, i.e. an exact tie, on every term.
Embedding values are odd multiples of 2^-5 (q30b Gram pairs: exponent
sum -10) and the attention Q/KV sides use odd multiples of 2^-3 / 2^-4
(with the 1/8 = 2^-3 score divisor: exponent sum -10 again), all exact
in float32. A regression to numpy half-even (np.rint/np.round alone)
or to the naive sign*floor(|y|+0.5) spelling flips thousands of terms
here and the oracle compare goes red immediately.

q67b's 1/9 kernel weight is non-dyadic, so its per-tap terms cannot be
*constructed* onto ties (a Diophantine hit); it still runs over this
fixture as a fresh-data parity check and shares round_half_away with
the two tie-exercised kernels.

Bit-exactness contract anchor: the reference's simulator parity tests
(simulator/test_sim_reflex.py:24-59).
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np
import pytest

import __spark_entry__  # noqa: F401  (imports populate the registry)

from hive_reflex_spark.registry import ORACLES, QUERIES

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
)
from tie_fixture import N_KV, N_Q, N_TIE, write_tie_fixture  # noqa: E402


@pytest.fixture(scope="module")
def tie_sf_dir(tmp_path_factory) -> str:
    return write_tie_fixture(str(tmp_path_factory.mktemp("tie_sf")))


def test_fixture_is_adversarial(tie_sf_dir):
    """Self-check: the planted data really does land scaled products on
    exact-.5 doubles — in bulk — for both the Gram terms (q30b) and the
    scaled attention score terms (q66d)."""
    import pyarrow.parquet as pq

    emb = pq.read_table(os.path.join(tie_sf_dir, "embeddings.parquet"))
    mat = np.array(emb["embedding"].to_pylist(), dtype=np.float64)

    gram_terms = (mat[:N_TIE, None, :] * mat[None, :N_TIE, :]) * 1e9
    frac = np.abs(gram_terms - np.trunc(gram_terms))
    assert np.all(frac == 0.5)  # EVERY q30b tie-grid term is an exact tie

    score_terms = (
        mat[N_TIE:N_Q, None, :] * mat[None, N_Q:N_KV, :] * (1.0 / 8.0) * 1e9
    )
    sfrac = np.abs(score_terms - np.trunc(score_terms))
    assert np.all(sfrac == 0.5)  # every q66d Q-x-KV score term too

    # and ties are where the rounding spellings actually disagree:
    bad_even = np.rint(gram_terms)
    good = np.trunc(gram_terms) + np.copysign(1.0, gram_terms)
    assert np.sum(bad_even != good) > 100_000


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cv(v):
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else round(v, 9)
        return v

    out = [tuple(cv(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(map(str, t)))


@pytest.mark.parametrize(
    "name",
    [
        "q30b_gram_matmul_numpy",
        "q66d_attention_blocked",
        "q67b_conv2d_blocked",
    ],
)
def test_blocked_kernels_match_oracle_on_planted_ties(spark, tie_sf_dir, name):
    """Driver-identical query-vs-oracle compare for the three blocked
    kernels on the planted-tie fixture: row counts AND canonicalized
    values must match DuckDB exactly."""
    import duckdb

    sdf = QUERIES[name](spark, tie_sf_dir).collect()
    s_cols = list(sdf[0].asDict().keys()) if sdf else []

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{os.path.join(tie_sf_dir, 'embeddings.parquet')}'"
    )
    cur = con.execute(ORACLES[name])
    d_cols = [c[0] for c in cur.description]
    drows = cur.fetchall()

    assert len(sdf) == len(drows) and len(sdf) > 0
    sc, sr = _canon(s_cols, [tuple(r) for r in sdf])
    dc, dr = _canon(d_cols, drows)
    assert sc == dc
    mismatch = [(a, b) for a, b in zip(sr, dr) if a != b]
    assert not mismatch, mismatch[:5]
