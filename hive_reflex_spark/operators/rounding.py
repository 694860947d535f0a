"""Bit-exact emulation of C ``round()`` / DuckDB ``ROUND`` for numpy.

The blocked kernels (q30b Gram, q66d attention, q67b conv) verify
against DuckDB oracles of the shape ``CAST(ROUND(x * 1e9) AS BIGINT)``.
DuckDB's ROUND on DOUBLE is C ``std::round``: correctly-rounded
round-half-AWAY-from-zero. Two numpy spellings that look equivalent are
not:

- ``np.round`` / ``np.rint`` resolve exact .5 landings half-to-EVEN
  (IEEE default) — wrong on every odd .5 tie;
- ``sign(y) * floor(|y| + 0.5)`` resolves ties correctly but the
  ``+ 0.5`` ADDITION is itself a rounding step: for y just below a tie
  (e.g. y = 0.49999999999999994, the largest double < 0.5) the sum
  rounds UP across the boundary and the emulation returns 1 where
  ``std::round`` returns 0.

``round_half_away`` composes the two exactly: ``np.rint`` supplies the
correctly-rounded nearest integer for every non-tie (it performs no
intermediate arithmetic, so no boundary drift), and the exact ties —
detectable exactly, because a double whose fractional part is 0.5 has
``y - trunc(y) == ±0.5`` with Sterbenz-exact subtraction — are
redirected away from zero. For |y| >= 2^52 doubles are already integers
(no ties possible) and ``np.rint`` is the identity, matching
``std::round``.

Contract pinned by tests/test_properties.py::
test_half_away_emulation_matches_duckdb_round (hypothesis, identical
double injected into DuckDB via string cast) and the planted exact-.5
fixture in test_tensor.py. Reference anchor for the bit-exactness
requirement these kernels inherit: simulator/test_sim_reflex.py:24-59.
"""

from __future__ import annotations

import numpy as np


def round_half_away(y: np.ndarray) -> np.ndarray:
    """Elementwise C ``std::round`` (= DuckDB ROUND on DOUBLE): nearest
    integer, exact .5 ties away from zero. Bit-exact for all finite
    doubles; returns float64."""
    y = np.asarray(y, dtype=np.float64)
    t = np.trunc(y)
    r = np.rint(y)
    return np.where(np.abs(y - t) == 0.5, t + np.copysign(1.0, y), r)
