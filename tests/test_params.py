"""(b, r) optimizer pins (lsh.h:56-80 semantics)."""

import numpy as np

from lshdedup.params import collision_probability, optimal_params


def test_constraint():
    for n in (64, 128, 256):
        for t in (0.5, 0.7, 0.9):
            b, r = optimal_params(n, t)
            assert 1 <= b and 1 <= r and b * r <= n


def test_fn_weight_pushes_curve_left():
    """Heavier FN weight → higher collision probability at the threshold
    (the reference's DNA run uses {0.1, 0.9} for this, dna_benchmark.h:42)."""
    t = 0.7
    b1, r1 = optimal_params(128, t, 0.5, 0.5)
    b2, r2 = optimal_params(128, t, 0.1, 0.9)
    p1 = collision_probability(np.array([t]), b1, r1)[0]
    p2 = collision_probability(np.array([t]), b2, r2)[0]
    assert p2 > p1


def test_collision_probability_shape():
    s = np.linspace(0, 1, 11)
    p = collision_probability(s, 20, 6)
    assert p[0] == 0.0 and p[-1] == 1.0
    assert (np.diff(p) >= 0).all()


def test_known_values():
    """Pin resolved params for the flagship configs (regression guard)."""
    assert optimal_params(128, 0.7, 0.5, 0.5) == (14, 9)
    assert optimal_params(128, 0.9, 0.65, 0.35) == (5, 25)
