"""Douglas–Peucker goldens (stages/simplify.py)."""
from __future__ import annotations

import numpy as np

from laji_pygeoapi_ray.stages.simplify import (douglas_peucker_mask,
                                               verify_simplification)


def test_collinear_collapses_to_endpoints():
    x = np.linspace(0, 10, 11)
    y = np.zeros(11)
    keep = douglas_peucker_mask(x, y, tol=0.01)
    assert keep.sum() == 2 and keep[0] and keep[-1]
    assert verify_simplification(x, y, keep, 0.01)


def test_single_spike_kept():
    x = np.array([0.0, 1, 2, 3, 4])
    y = np.array([0.0, 0, 5, 0, 0])
    # the flank points sit 5/sqrt(29) ≈ 0.93 off the split chain: kept at
    # tol=0.5, dropped at tol=1.0; the spike itself survives both
    keep_tight = douglas_peucker_mask(x, y, tol=0.5)
    assert keep_tight.tolist() == [True, True, True, True, True]
    keep = douglas_peucker_mask(x, y, tol=1.0)
    assert keep.tolist() == [True, False, True, False, True]
    assert verify_simplification(x, y, keep, 1.0)


def test_tolerance_monotone():
    rng = np.random.default_rng(3)
    x = np.cumsum(rng.uniform(0.1, 1, 60))
    y = np.cumsum(rng.normal(0, 1, 60))
    k1 = douglas_peucker_mask(x, y, 0.1).sum()
    k2 = douglas_peucker_mask(x, y, 1.0).sum()
    k3 = douglas_peucker_mask(x, y, 10.0).sum()
    assert k1 >= k2 >= k3 >= 2
    for tol in (0.1, 1.0, 10.0):
        assert verify_simplification(
            x, y, douglas_peucker_mask(x, y, tol), tol)


def test_short_inputs():
    assert douglas_peucker_mask(np.array([1.0]), np.array([2.0]),
                                1).tolist() == [True]
    assert douglas_peucker_mask(np.array([1.0, 1.0]),
                                np.array([2.0, 2.0]), 1).tolist() \
        == [True, True]
    assert len(douglas_peucker_mask(np.array([]), np.array([]), 1)) == 0


def test_verify_rejects_bad_mask():
    x = np.array([0.0, 1, 2, 3, 4])
    y = np.array([0.0, 0, 5, 0, 0])
    bad = np.array([True, False, False, False, True])  # spike dropped
    assert not verify_simplification(x, y, bad, 0.5)
