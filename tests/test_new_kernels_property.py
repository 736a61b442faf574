"""Property-based tests for the third-session kernels — each vectorized
implementation is checked against an independent brute-force reference
on randomized small inputs (hypothesis), mirroring the strategy of
test_property.py / test_polyclip_property.py."""
from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from laji_pygeoapi_ray.functions.hilbert import (spread_bits, xy_to_d,
                                                 xy_to_morton)
from laji_pygeoapi_ray.stages.simplify import (douglas_peucker_mask,
                                               verify_simplification)

coords = st.lists(st.integers(min_value=0, max_value=255),
                  min_size=1, max_size=40)


@settings(max_examples=100, deadline=None)
@given(coords, coords)
def test_hilbert_injective_and_in_range(xs, ys):
    n = min(len(xs), len(ys))
    ix = np.array(xs[:n], np.int64)
    iy = np.array(ys[:n], np.int64)
    d = xy_to_d(ix, iy, 8)
    assert ((d >= 0) & (d < 1 << 16)).all()
    # injectivity: equal keys ⟺ equal coords
    seen = {}
    for i in range(n):
        key = int(d[i])
        if key in seen:
            assert seen[key] == (ix[i], iy[i])
        seen[key] = (ix[i], iy[i])


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << 16) - 1))
def test_spread_bits_reference(v):
    ref = 0
    for b in range(16):
        if v >> b & 1:
            ref |= 1 << (2 * b)
    assert int(spread_bits(np.array([v], np.int64))[0]) == ref


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=255),
       st.integers(min_value=0, max_value=255))
def test_morton_interleave_reference(x, y):
    m = int(xy_to_morton(np.array([x], np.int64),
                         np.array([y], np.int64))[0])
    ref = 0
    for b in range(8):
        ref |= ((x >> b & 1) << (2 * b)) | ((y >> b & 1) << (2 * b + 1))
    assert m == ref


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.floats(0, 100, allow_nan=False,
                                    allow_infinity=False),
                          st.floats(0, 100, allow_nan=False,
                                    allow_infinity=False)),
                min_size=2, max_size=30),
       st.floats(0.01, 20, allow_nan=False))
def test_dp_invariants_random(pts, tol):
    x = np.array([p[0] for p in pts], np.float64)
    y = np.array([p[1] for p in pts], np.float64)
    keep = douglas_peucker_mask(x, y, tol)
    assert keep[0] and keep[-1]
    assert verify_simplification(x, y, keep, tol)


def _brute_islands(iv: list[tuple[int, int]]) -> tuple[int, int]:
    """Reference interval merge by full sort-scan."""
    iv = sorted(iv)
    n, cov = 0, 0
    cur_a = cur_b = None
    for a, b in iv:
        if cur_a is None or a > cur_b:
            if cur_a is not None:
                cov += cur_b - cur_a
            n += 1
            cur_a, cur_b = a, b
        else:
            cur_b = max(cur_b, b)
    if cur_a is not None:
        cov += cur_b - cur_a
    return n, cov


@settings(max_examples=80, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 50), st.integers(0, 20)),
                min_size=1, max_size=25))
def test_segmented_cummax_islands_vs_brute(raw):
    # mirror the supplier_ship_islands in-bucket algorithm on one key
    iv = [(a, a + w) for a, w in raw]
    d0 = np.array(sorted(iv))[:, 0]
    d1 = np.array(sorted(iv))[:, 1]
    order = np.lexsort((d1, d0))
    d0, d1 = d0[order], d1[order]
    prev_max = np.empty(len(d0), np.int64)
    prev_max[0] = d0[0] - 1
    prev_max[1:] = np.maximum.accumulate(d1)[:-1]
    brk = (d0 > prev_max).astype(np.int64)
    isl = np.cumsum(brk)
    import pandas as pd
    gi = pd.DataFrame({"isl": isl, "a": d0, "b": d1}).groupby("isl").agg(
        a=("a", "min"), b=("b", "max"))
    got = (len(gi), int((gi["b"] - gi["a"]).sum()))
    assert got == _brute_islands(iv)


def _brute_crossing(a, b, c, d) -> bool:
    def cross(o, p, q):
        return (p[0] - o[0]) * (q[1] - o[1]) - (p[1] - o[1]) * (q[0] - o[0])

    d1, d2 = cross(a, b, c), cross(a, b, d)
    d3, d4 = cross(c, d, a), cross(c, d, b)
    return ((d1 > 0) != (d2 > 0) and d1 != 0 and d2 != 0
            and (d3 > 0) != (d4 > 0) and d3 != 0 and d4 != 0)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 30), min_size=8, max_size=8))
def test_straddle_matrix_matches_pointwise(v):
    # the vectorized straddle logic used by trajectory_crossings
    ax, ay, bx, by, cx, cy, dx, dy = (np.int64(t) for t in v)
    rx, ry = bx - ax, by - ay
    d1 = rx * (cy - ay) - ry * (cx - ax)
    d2 = rx * (dy - ay) - ry * (dx - ax)
    s12 = (d1 > 0 and d2 < 0) or (d1 < 0 and d2 > 0)
    sx, sy = dx - cx, dy - cy
    d3 = sx * (ay - cy) - sy * (ax - cx)
    d4 = sx * (by - cy) - sy * (bx - cx)
    s34 = (d3 > 0 and d4 < 0) or (d3 < 0 and d4 > 0)
    assert (s12 and s34) == _brute_crossing(
        (ax, ay), (bx, by), (cx, cy), (dx, dy))
