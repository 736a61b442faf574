"""Hex lattice (functions/hexgrid.py) invariants.

The oracle sweep (test_oracle_sweep.py) certifies engine==SQL for the
packed ids; these tests certify the lattice is a CORRECT hex tiling:
cube rounding assigns every point to its nearest hex center, centers
round-trip, and the six neighbors are equidistant (the property that
makes hex binning preferable to squares for density products).
"""
from __future__ import annotations

import numpy as np

from laji_pygeoapi_ray.functions import hexgrid
from laji_pygeoapi_ray.functions.points import FIN_X0, FIN_X1, FIN_Y0, FIN_Y1

RES = 7
# the 6 axial neighbor offsets of a pointy-top hex
NEIGHBORS = [(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)]


def _rand_points(n: int, seed: int = 7):
    rng = np.random.RandomState(seed)
    x = FIN_X0 + rng.rand(n) * (FIN_X1 - FIN_X0)
    y = FIN_Y0 + rng.rand(n) * (FIN_Y1 - FIN_Y0)
    return x, y


def test_cube_round_picks_nearest_center():
    x, y = _rand_points(20000)
    q, r = hexgrid.hex_qr(x, y, RES)
    cx, cy = hexgrid.hex_center(q, r, RES)
    d_own = (x - cx) ** 2 + (y - cy) ** 2
    for dq, dr in NEIGHBORS:
        nx, ny = hexgrid.hex_center(q + dq, r + dr, RES)
        d_n = (x - nx) ** 2 + (y - ny) ** 2
        # ties can only occur exactly on an edge; random doubles don't hit it
        assert (d_own <= d_n).all()


def test_center_round_trips():
    q = np.arange(-50, 80, dtype=np.int64)
    r = np.arange(-40, 90, dtype=np.int64)
    qq, rr = np.meshgrid(q, r)
    qq, rr = qq.ravel(), rr.ravel()
    cx, cy = hexgrid.hex_center(qq, rr, RES)
    q2, r2 = hexgrid.hex_qr(cx, cy, RES)
    assert (q2 == qq).all() and (r2 == rr).all()


def test_neighbors_equidistant():
    cx0, cy0 = hexgrid.hex_center(np.array([3]), np.array([-2]), RES)
    dists = []
    for dq, dr in NEIGHBORS:
        cx, cy = hexgrid.hex_center(np.array([3 + dq]), np.array([-2 + dr]), RES)
        dists.append(float(np.hypot(cx - cx0, cy - cy0)))
    assert np.allclose(dists, dists[0], rtol=1e-12)
    # and the spacing is the lattice constant sqrt(3)*size
    assert np.isclose(dists[0], hexgrid.SQRT3 * hexgrid.hex_size(RES),
                      rtol=1e-12)


def test_pack_unpack_negative_safe():
    q = np.array([-300, -1, 0, 1, 917], dtype=np.int64)
    r = np.array([5, -7, 0, -1, 333], dtype=np.int64)
    hid = q * np.int64(hexgrid.PACK) + r
    q2, r2 = hexgrid.unpack(hid)
    assert (q2 == q).all() and (r2 == r).all()
