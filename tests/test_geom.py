"""Geometry layer: WKB round-trip + the reference's normalization golden
behavior (test_process_data.py:35-44,75-92 structure) + validation."""
from __future__ import annotations

import numpy as np
import pytest

from laji_pygeoapi_ray.functions import geom as G


def _square(cx=0.0, cy=0.0, r=1.0):
    ring = np.array([[cx - r, cy - r], [cx + r, cy - r],
                     [cx + r, cy + r], [cx - r, cy + r], [cx - r, cy - r]])
    return G.Geometry("Polygon", [ring])


def test_wkb_roundtrip_all_types():
    pt = G.Geometry("Point", np.array([1.5, 2.5]))
    ls = G.Geometry("LineString", np.array([[0, 0], [1, 1], [2, 0.5]]))
    poly = _square()
    mp = G.Geometry("MultiPoint", [pt, G.Geometry("Point", np.array([3., 4.]))])
    mpoly = G.Geometry("MultiPolygon", [poly, _square(5, 5)])
    gc = G.Geometry("GeometryCollection", [pt, ls, poly])
    for g in (pt, ls, poly, mp, mpoly, gc):
        rt, _ = G.wkb_decode(G.wkb_encode(g))
        assert rt.type == g.type
        assert G.wkb_encode(rt) == G.wkb_encode(g)


def test_normalize_gc_golden_structure():
    """Mirrors the reference truth table (test_process_data.py:75-92):
    GC(point, line) → MultiPolygon; GC(single polygon) → Polygon unwrap;
    None passthrough; conversion count == 3 over the three non-None."""
    pt = G.Geometry("Point", np.array([1.0, 1.0]))
    ls = G.Geometry("LineString", np.array([[0., 0.], [2., 2.]]))
    gc_mixed = G.Geometry("GeometryCollection", [pt, ls])
    gc_single = G.Geometry("GeometryCollection", [_square()])
    gc_homog = G.Geometry("GeometryCollection",
                          [pt, G.Geometry("Point", np.array([2., 2.]))])
    converted = 0
    g1, c = G.normalize_geometry(gc_mixed); converted += c
    g2, c = G.normalize_geometry(gc_single); converted += c
    g3, c = G.normalize_geometry(gc_homog); converted += c
    g4, c = G.normalize_geometry(None); converted += c
    assert g1.type == "MultiPolygon"
    assert g2.type == "Polygon"
    assert g3.type == "MultiPoint" and len(g3.data) == 2
    assert g4 is None
    assert converted == 3
    # the buffered mixed hull covers both inputs dilated by 0.5
    hull = g1.data[0].data[0]
    assert hull[:, 0].min() <= -0.49 and hull[:, 0].max() >= 2.49


def test_normalize_homogeneous_flattens_nested_multi():
    mp = G.Geometry("MultiPoint", [G.Geometry("Point", np.array([0., 0.])),
                                   G.Geometry("Point", np.array([1., 1.]))])
    pt = G.Geometry("Point", np.array([2., 2.]))
    out, conv = G.normalize_geometry(
        G.Geometry("GeometryCollection", [mp, pt]))
    assert conv and out.type == "MultiPoint" and len(out.data) == 3


def test_validate_counts_and_repairs_only_invalid():
    bowtie = G.Geometry("Polygon", [np.array(
        [[0., 0.], [2., 2.], [2., 0.], [0., 2.], [0., 0.]])])
    ok = _square()
    assert not G.is_valid(bowtie)
    assert G.is_valid(ok)
    out, edited = G.validate_geometries([bowtie, ok, None])
    assert edited == 1                        # only the bowtie repaired
    assert G.is_valid(out[0])                 # repaired is valid
    assert out[1] is ok                       # valid one untouched
    assert out[2] is None


def test_normalize_wkb_batch_kernel():
    pt = G.Geometry("Point", np.array([1.0, 1.0]))
    ls = G.Geometry("LineString", np.array([[0., 0.], [2., 2.]]))
    gc = G.Geometry("GeometryCollection", [pt, ls])
    wkbs = [G.wkb_encode(gc), G.wkb_encode(pt), None]
    out, conv = G.normalize_wkb_batch(wkbs)
    assert conv == 1
    g, _ = G.wkb_decode(out[0])
    assert g.type == "MultiPolygon"
    assert out[1] == wkbs[1] and out[2] is None


def test_mixed_gc_union_preserves_disjoint_structure():
    """GEOS unary_union structure: disjoint buffered parts stay separate
    MultiPolygon members; touching/overlapping parts merge."""
    pt = G.Geometry("Point", np.array([0.0, 0.0]))
    far = G.Geometry("LineString", np.array([[100.0, 100.0], [101.0, 100.0]]))
    out, conv = G.normalize_geometry(
        G.Geometry("GeometryCollection", [pt, far]))
    assert conv and out.type == "MultiPolygon" and len(out.data) == 2
    near = G.Geometry("LineString", np.array([[0.2, 0.0], [1.0, 0.0]]))
    out2, _ = G.normalize_geometry(
        G.Geometry("GeometryCollection", [pt, near]))
    assert len(out2.data) == 1 and G.is_valid(out2)
    # WKB round trip keeps the two-member structure
    rt, _ = G.wkb_decode(G.wkb_encode(out))
    assert rt.type == "MultiPolygon" and len(rt.data) == 2


def test_convex_overlap_sat():
    sq = np.array([[0., 0.], [1., 0.], [1., 1.], [0., 1.], [0., 0.]])
    assert G.convex_overlap(sq, sq + 0.5)      # overlapping
    assert G.convex_overlap(sq, sq + np.array([1.0, 0.0]))  # touching edge
    assert not G.convex_overlap(sq, sq + np.array([2.5, 0.0]))  # disjoint


# ---- GEOS-parity goldens (planar-overlay engine, functions/polyclip.py).
# Expected coordinates derived analytically = what GEOS make_valid
# (linework) / unary_union produce for these inputs.

def _ring_set(ring):
    """Closed ring → canonical frozenset-friendly tuple of vertices."""
    pts = ring[:-1] if np.array_equal(ring[0], ring[-1]) else ring
    return frozenset((round(float(x), 9), round(float(y), 9))
                     for x, y in pts)


def test_make_valid_bowtie_geos_parity():
    """GEOS make_valid on the bowtie returns the two odd-winding
    triangles as a MultiPolygon — not a convex hull."""
    bowtie = G.Geometry("Polygon", [np.array(
        [[0., 0.], [2., 2.], [2., 0.], [0., 2.], [0., 0.]])])
    out = G.make_valid(bowtie)
    assert out.type == "MultiPolygon" and len(out.data) == 2
    got = {_ring_set(p.data[0]) for p in out.data}
    assert got == {
        frozenset({(0.0, 0.0), (1.0, 1.0), (0.0, 2.0)}),
        frozenset({(2.0, 0.0), (1.0, 1.0), (2.0, 2.0)}),
    }


def test_make_valid_concave_spike_geos_parity():
    """Self-crossing 'spike' pentagon: the two dangling edges cross the
    base at x = 4/3 and x = 8/3, so GEOS's odd-even rebuild yields THREE
    faces — left triangle, below-axis spike triangle, right triangle —
    with those exact crossing coordinates."""
    ring = np.array([[0., 0.], [4., 0.], [4., 2.], [2., -1.], [0., 2.],
                     [0., 0.]])
    out = G.make_valid(G.Geometry("Polygon", [ring]))
    assert out.type == "MultiPolygon" and len(out.data) == 3
    got = {_ring_set(p.data[0]) for p in out.data}
    assert got == {
        _ring_set(np.array([[0.0, 0.0], [4 / 3, 0.0], [0.0, 2.0]])),
        _ring_set(np.array([[4 / 3, 0.0], [2.0, -1.0], [8 / 3, 0.0]])),
        _ring_set(np.array([[8 / 3, 0.0], [4.0, 0.0], [4.0, 2.0]])),
    }


def _signed_area(ring):
    pts = np.asarray(ring, dtype=np.float64)
    if np.array_equal(pts[0], pts[-1]):
        pts = pts[:-1]
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def test_union_concave_l_square_geos_parity():
    """unary_union of a concave L with an overlapping square: the true
    10-vertex concave boundary (not a hull)."""
    from laji_pygeoapi_ray.functions.polyclip import union_rings
    L = [np.array([[0., 0.], [2., 0.], [2., 1.], [1., 1.], [1., 3.],
                   [0., 3.], [0., 0.]])]
    sq = [np.array([[1.5, 0.5], [2.5, 0.5], [2.5, 1.5], [1.5, 1.5],
                    [1.5, 0.5]])]
    out = union_rings([L, sq])
    assert len(out) == 1 and not out[0][1]
    assert _ring_set(out[0][0]) == frozenset({
        (0.0, 0.0), (2.0, 0.0), (2.0, 0.5), (2.5, 0.5), (2.5, 1.5),
        (1.5, 1.5), (1.5, 1.0), (1.0, 1.0), (1.0, 3.0), (0.0, 3.0)})


def test_union_makes_hole_geos_parity():
    """unary_union of a C-shape and a closing bar produces a polygon
    WITH A HOLE (GEOS keeps the enclosed void as an interior ring)."""
    from laji_pygeoapi_ray.functions.polyclip import union_rings
    c = [np.array([[0., 0.], [3., 0.], [3., 1.], [1., 1.], [1., 2.],
                   [3., 2.], [3., 3.], [0., 3.], [0., 0.]])]
    bar = [np.array([[2., 0.5], [3.5, 0.5], [3.5, 2.5], [2., 2.5],
                     [2., 0.5]])]
    out = union_rings([c, bar])
    assert len(out) == 1
    shell, holes = out[0]
    assert len(holes) == 1
    assert _ring_set(holes[0]) == frozenset({
        (1.0, 1.0), (1.0, 2.0), (2.0, 2.0), (2.0, 1.0)})


def test_mixed_gc_concave_line_buffer():
    """A bent line's buffer through the GC-normalization path is CONCAVE
    (per-segment capsules unioned), not the convex hull of the discs:
    the inner elbow point must lie OUTSIDE the buffered polygon."""
    from laji_pygeoapi_ray.functions.polyclip import _crossings
    pt = G.Geometry("Point", np.array([10.0, 10.0]))
    bent = G.Geometry("LineString",
                      np.array([[0., 0.], [4., 0.], [4., 4.]]))
    out, conv = G.normalize_geometry(
        G.Geometry("GeometryCollection", [pt, bent]))
    assert conv and out.type == "MultiPolygon" and len(out.data) == 2
    big = max(out.data, key=lambda p: abs(_signed_area(p.data[0])))
    ring = np.asarray(big.data[0])
    inner_elbow = np.array([2.0, 2.0])   # inside the hull, outside the buffer
    assert _crossings(inner_elbow, [ring]) % 2 == 0
    on_line = np.array([2.0, 0.0])       # on the segment: inside the buffer
    assert _crossings(on_line, [ring]) % 2 == 1
