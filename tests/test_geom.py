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
