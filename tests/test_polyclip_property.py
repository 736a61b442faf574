"""Property tests for the planar-overlay engine (functions/polyclip.py):
union of random axis-aligned rectangles checked against an independent
rasterized reference, plus structural invariants (shell orientation,
vertex-set containment, exactly-once area accounting)."""
from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from laji_pygeoapi_ray.functions.polyclip import (_ring_area, odd_even_rebuild,
                                                  union_rings)


def _rect(x0, y0, w, h):
    return [np.array([[x0, y0], [x0 + w, y0], [x0 + w, y0 + h],
                      [x0, y0 + h], [x0, y0]], dtype=np.float64)]


def _union_area(parts):
    return sum(abs(_ring_area(shell[:-1]))
               - sum(abs(_ring_area(h[:-1])) for h in holes)
               for shell, holes in parts)


def _raster_union_area(rects, n=400):
    """Independent reference: rasterize the union on an n×n grid over the
    joint bbox (midpoint sampling)."""
    xs0 = min(r[0][:, 0].min() for r in rects) - 0.01
    xs1 = max(r[0][:, 0].max() for r in rects) + 0.01
    ys0 = min(r[0][:, 1].min() for r in rects) - 0.01
    ys1 = max(r[0][:, 1].max() for r in rects) + 0.01
    gx = np.linspace(xs0, xs1, n, endpoint=False) + (xs1 - xs0) / (2 * n)
    gy = np.linspace(ys0, ys1, n, endpoint=False) + (ys1 - ys0) / (2 * n)
    X, Y = np.meshgrid(gx, gy)
    inside = np.zeros(X.shape, dtype=bool)
    for r in rects:
        ring = r[0]
        x0, y0 = ring[:, 0].min(), ring[:, 1].min()
        x1, y1 = ring[:, 0].max(), ring[:, 1].max()
        inside |= (X >= x0) & (X <= x1) & (Y >= y0) & (Y <= y1)
    cell = ((xs1 - xs0) / n) * ((ys1 - ys0) / n)
    return inside.sum() * cell


rect_st = st.tuples(
    st.integers(0, 8), st.integers(0, 8),
    st.integers(1, 5), st.integers(1, 5))


@settings(max_examples=25, deadline=None)
@given(st.lists(rect_st, min_size=1, max_size=4, unique=True))
def test_union_area_matches_raster_reference(specs):
    rects = [_rect(float(x), float(y), float(w), float(h))
             for x, y, w, h in specs]
    parts = union_rings(rects)
    got = _union_area(parts)
    ref = _raster_union_area(rects)
    # raster reference resolution bound: perimeter × cell size
    assert abs(got - ref) < 0.6, (got, ref, specs)
    for shell, holes in parts:
        assert _ring_area(shell[:-1]) > 0          # CCW shells
        for h in holes:
            assert _ring_area(h[:-1]) < 0          # CW holes


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 6), st.integers(0, 6)),
                min_size=4, max_size=7, unique=True))
def test_odd_even_rebuild_always_valid_and_conserves_parity(pts):
    """Any closed polyline (possibly self-crossing, possibly degenerate):
    the rebuild returns CCW shells whose summed area equals the
    odd-winding area of the input linework (sampled reference)."""
    ring = np.array([[float(x), float(y)] for x, y in pts])
    ring = np.vstack([ring, ring[:1]])
    parts = odd_even_rebuild([ring])
    for shell, holes in parts:
        assert _ring_area(shell[:-1]) > 0
    got = _union_area(parts)
    # sampled odd-winding reference
    from laji_pygeoapi_ray.functions.polyclip import _crossings
    n = 160
    xs0, xs1 = ring[:, 0].min() - 0.01, ring[:, 0].max() + 0.01
    ys0, ys1 = ring[:, 1].min() - 0.01, ring[:, 1].max() + 0.01
    gx = np.linspace(xs0, xs1, n, endpoint=False) + (xs1 - xs0) / (2 * n)
    gy = np.linspace(ys0, ys1, n, endpoint=False) + (ys1 - ys0) / (2 * n)
    acc = 0
    for y in gy:
        for x in gx:
            if _crossings(np.array([x, y]), [ring]) % 2 == 1:
                acc += 1
    ref = acc * ((xs1 - xs0) / n) * ((ys1 - ys0) / n)
    assert abs(got - ref) < 0.7, (got, ref, pts)
