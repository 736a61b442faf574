"""Unit tests: point derivation, cell index, PIP kernels, fixture layers."""
from __future__ import annotations

import numpy as np
import pytest

from laji_pygeoapi_ray.functions import cells, points
from laji_pygeoapi_ray.functions.pip import GridIndex, crossing_parity
from laji_pygeoapi_ray.state import fixtures


def test_derive_xy_in_bbox_and_deterministic():
    keys = np.arange(10_000, dtype=np.int64)
    x, y = points.derive_xy(keys)
    x2, y2 = points.derive_xy(keys)
    assert np.array_equal(x, x2) and np.array_equal(y, y2)
    assert (x >= points.FIN_X0).all() and (x <= points.FIN_X1).all()
    assert (y >= points.FIN_Y0).all() and (y <= points.FIN_Y1).all()


def test_derive_xy_cluster_share():
    keys = np.arange(100_000, dtype=np.int64)
    x, y = points.derive_xy(keys)
    in_hel = ((x >= points.HEL_X0) & (x <= points.HEL_X1)
              & (y >= points.HEL_Y0) & (y <= points.HEL_Y1))
    assert 0.28 < in_hel.mean() < 0.33  # ~30 % planted skew


def test_cell_roundtrip_and_parent():
    keys = np.arange(5_000, dtype=np.int64)
    x, y = points.derive_xy(keys)
    c9 = cells.encode(x, y, 9)
    r, ix, iy = cells.decode(c9)
    assert (r == 9).all()
    c7 = cells.parent(c9, 7)
    assert np.array_equal(c7, cells.encode(x, y, 7))
    # every point lies inside its cell bounds
    for c, px, py in list(zip(c9[:50], x[:50], y[:50])):
        x0, y0, x1, y1 = cells.cell_bounds(int(c))
        assert x0 <= px <= x1 and y0 <= py <= y1


def test_cell_neighbors_and_cover():
    c = cells.encode(np.array([24.9]), np.array([60.2]), 7)[0]
    nb = cells.neighbors(int(c), 1)
    assert int(c) in nb and len(nb) == 9
    x0, y0, x1, y1 = cells.cell_bounds(int(c))
    cover = cells.cover_bbox(x0 + 1e-9, y0 + 1e-9, x1 - 1e-9, y1 - 1e-9, 7)
    assert cover == [int(c)]


def test_layers_partition_bbox():
    """Every derived point belongs to exactly one province and municipality."""
    keys = np.arange(20_000, dtype=np.int64)
    px, py = points.derive_xy(keys)
    for layer in (fixtures.province_layer(), fixtures.municipality_layer()):
        total = np.zeros(len(px), dtype=np.int64)
        for poly in layer:
            total += crossing_parity(px, py, poly.ring).astype(np.int64)
        assert (total == 1).all(), f"partition violated: {np.unique(total)}"


def test_grid_index_matches_bruteforce():
    keys = np.arange(5_000, dtype=np.int64)
    px, py = points.derive_xy(keys)
    layer = fixtures.municipality_layer()
    idx = GridIndex(layer)
    got = idx.assign(px, py)
    brute = np.full(len(px), -1, dtype=np.int64)
    for poly in layer:
        inside = crossing_parity(px, py, poly.ring)
        brute[inside] = poly.pid
    assert np.array_equal(got, brute)
    assert (got >= 0).all()


def test_square_polygon_pip():
    ring = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])
    px = np.array([1.0, 3.0, -1.0, 1.0])
    py = np.array([1.0, 1.0, 1.0, 3.0])
    assert crossing_parity(px, py, ring).tolist() == [True, False, False, False]


def test_nonconvex_polygon_pip():
    # U-shape: the notch (1.5, 1.5) is outside
    ring = np.array([[0, 0], [3, 0], [3, 3], [2, 3], [2, 1], [1, 1], [1, 3], [0, 3]],
                    dtype=np.float64)
    px = np.array([0.5, 1.5, 2.5, 1.5])
    py = np.array([2.0, 2.0, 2.0, 0.5])
    assert crossing_parity(px, py, ring).tolist() == [True, False, True, True]


def test_region_table_names_roundtrip():
    from laji_pygeoapi_ray.state.fixtures import (PROVINCE_ID_MAPPING,
                                                  region_table_name,
                                                  title_from_table_name)
    assert region_table_name("ML.269") == "sompion_lappi"
    assert region_table_name("ML.256") == "etela_hame"
    assert region_table_name("ML.270") == "enontekion_lappi"
    assert region_table_name("nope") == "empty_biogeographical_region"
    # full inverse over all 21 provinces, with the geometry-type suffix
    for pid, name in PROVINCE_ID_MAPPING.items():
        assert title_from_table_name(region_table_name(pid) + "_points") == name
    assert title_from_table_name("unknown_polygons") == "Finland"


def test_grid_index_resolved_fast_path_exact():
    """The per-cell constant-answer table must agree with the exact edge
    loop everywhere — including points OUTSIDE the index bbox, which
    _cell_of clips into border cells (regression: clipped points must
    never take a border cell's resolved answer)."""
    import numpy as np

    from laji_pygeoapi_ray.functions.pip import GridIndex, crossing_parity
    from laji_pygeoapi_ray.state import fixtures

    for layer in (fixtures.province_layer(), fixtures.municipality_layer()):
        gi = GridIndex(layer)
        assert (gi.resolved != -2).any()      # fast path actually engages
        rng = np.random.default_rng(5)
        px = rng.uniform(gi.x0 - 0.5, gi.x1 + 0.5, 100000)
        py = rng.uniform(gi.y0 - 0.5, gi.y1 + 0.5, 100000)
        got = gi.assign(px, py)
        want = np.full(len(px), -1, np.int64)
        for poly in layer:
            todo = np.flatnonzero(want == -1)
            ins = crossing_parity(px[todo], py[todo], poly.ring)
            want[todo[ins]] = poly.pid
        assert (got == want).all()
