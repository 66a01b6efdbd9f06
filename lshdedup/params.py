"""Optimal LSH (b, r) parameter search — the reference's tiny cost-based
optimizer (lsh.h:56-80), driver-side.

Minimizes ``w_fp * ∫₀ᵗ P(s) ds + w_fn * ∫ₜ¹ (1 − P(s)) ds`` over all
``(b, r)`` with ``b*r ≤ n_perm``, where ``P(s) = 1 − (1 − s^r)^b`` is the
collision probability of an s-similar pair under b bands × r rows
(integrands: util.h:45-55).  The reference integrates with GSL cquad
(util.h:32-43, epsrel 1e-4); scipy is unavailable here, so we use a dense
Simpson rule — the error curve is smooth and the argmin is insensitive far
below 1e-4.

Runs once per job on the driver; no cluster involvement.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np


def collision_probability(s: np.ndarray, b: int, r: int) -> np.ndarray:
    """P(candidate | similarity s) = 1 - (1 - s^r)^b  (util.h:45-49)."""
    return 1.0 - np.power(1.0 - np.power(s, r), b)


def _simpson(y: np.ndarray, dx: float) -> float:
    n = y.shape[0]
    if n < 3:
        return float(np.trapezoid(y, dx=dx))
    if n % 2 == 0:  # need odd point count; peel one trapezoid
        return _simpson(y[:-1], dx) + 0.5 * dx * (y[-2] + y[-1])
    return float(dx / 3.0 * (y[0] + y[-1] + 4.0 * y[1:-1:2].sum() + 2.0 * y[2:-1:2].sum()))


@lru_cache(maxsize=None)
def optimal_params(
    n_perm: int, threshold: float, fp_weight: float = 0.5, fn_weight: float = 0.5,
    n_points: int = 1001,
) -> tuple[int, int]:
    """Grid-search (b, r) minimizing weighted FP area + FN area (lsh.h:56-80)."""
    assert 0.0 < threshold < 1.0
    best = (1, 1)
    best_err = float("inf")
    lo = np.linspace(0.0, threshold, n_points)
    hi = np.linspace(threshold, 1.0, n_points)
    dx_lo = threshold / (n_points - 1)
    dx_hi = (1.0 - threshold) / (n_points - 1)
    for b in range(1, n_perm + 1):
        for r in range(1, n_perm // b + 1):
            fp = _simpson(collision_probability(lo, b, r), dx_lo)
            fn = _simpson(1.0 - collision_probability(hi, b, r), dx_hi)
            err = fp_weight * fp + fn_weight * fn
            if err < best_err:
                best_err = err
                best = (b, r)
    return best
