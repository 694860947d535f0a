"""Unit tests for the training-loop primitives (operators/training.py).

The distributed loops themselves are hash-verified against the unrolled
DuckDB CTE oracle by scripts/check_oracle.py (q83/q84); these tests pin
the driver-side scalar math those loops depend on.
"""

import math

from hive_reflex_spark.operators.training import (
    _round_away,
    fake_quant_int8,
    teacher_weights,
)


def test_round_away_half_cases():
    # Spark round() / DuckDB ROUND: half away from zero, not banker's.
    assert _round_away(0.5, 0) == 1.0
    assert _round_away(-0.5, 0) == -1.0
    assert _round_away(2.5, 0) == 3.0
    assert _round_away(0.125, 2) == 0.13
    assert _round_away(-0.125, 2) == -0.13
    # Python's round() would give 2 for 2.5 — make sure we differ.
    assert round(2.5) == 2


def test_fake_quant_zero_passthrough():
    w = [0.0] * 8
    wq, s = fake_quant_int8(w)
    assert wq == w
    assert s == 0.0


def test_fake_quant_grid_and_scale():
    w = [1.27, -0.5, 0.005, 0.0]
    wq, s = fake_quant_int8(w)
    assert s == 0.01  # absmax/127 = 1.27/127
    # every dequantized value sits on an integer multiple of the scale
    for v in wq:
        q = v / s
        assert abs(q - round(q)) < 1e-9
        assert -127 <= round(q) <= 127
    # absmax maps to the full-scale code exactly
    assert math.isclose(wq[0], 1.27)


def test_fake_quant_idempotent_on_grid():
    # Quantizing an already-quantized vector must be a fixed point:
    # same absmax -> same scale -> values already on the grid.
    w = [0.9, -0.3, 0.15, 0.0]
    wq, s = fake_quant_int8(w)
    wq2, s2 = fake_quant_int8(wq)
    assert s2 == s
    assert wq2 == wq


def test_teacher_weights_deterministic_and_bounded():
    t = teacher_weights(64)
    assert t == teacher_weights(64)
    assert len(t) == 64
    assert all(-0.3 <= v <= 0.3 for v in t)
    # not constant — the probe has to learn something nontrivial
    assert len(set(t)) > 1
