"""Unit tests: real S2 cell ids (functions/s2.py).

The encoder has no library to compare against (no s2 wheel in the
container), so correctness rests on four independent anchors:
exact (face,i,j) round-trips, Hilbert-curve continuity (consecutive
positions are rook-adjacent), an independent per-row 2-bit state-machine
reimplementation, and the DuckDB recursive-CTE twin (exercised by the
oracle sweep / driver gate for the registered queries).
"""
from __future__ import annotations

import numpy as np

from laji_pygeoapi_ray.functions import points, s2

RNG = np.random.default_rng(20260817)


def test_lookup_tables_are_bijective():
    # every (pos, orient) must map back to its (ij, orient) and vice versa
    for orig in range(4):
        ij_seen = s2.LOOKUP_POS[(np.arange(256) << 2) + orig]
        assert len(np.unique(ij_seen >> 2)) == 256
        back = s2.LOOKUP_IJ[((s2.LOOKUP_POS[(np.arange(256) << 2) + orig]
                              >> 2) << 2) + orig] >> 2
        assert np.array_equal(back, np.arange(256))


def test_face_ij_roundtrip_exact():
    face = RNG.integers(0, 6, 5000).astype(np.int64)
    i = RNG.integers(0, 1 << 30, 5000).astype(np.int64)
    j = RNG.integers(0, 1 << 30, 5000).astype(np.int64)
    leaf = s2.face_ij_to_leaf(face, i, j)
    f2, i2, j2 = s2.leaf_to_face_ij(leaf)
    assert np.array_equal(face, f2)
    assert np.array_equal(i, i2)
    assert np.array_equal(j, j2)


def test_hilbert_continuity_all_faces():
    # consecutive curve positions are rook-adjacent cells — the defining
    # property of the Hilbert traversal; catches any table/orientation bug
    pos = RNG.integers(0, (1 << 60) - 2, 2000).astype(np.uint64)
    for f in range(6):
        base = np.uint64(f) << np.uint64(61)
        a = (base | (pos << np.uint64(1)) | np.uint64(1)).view(np.int64)
        b = (base | ((pos + np.uint64(1)) << np.uint64(1))
             | np.uint64(1)).view(np.int64)
        _, ia, ja = s2.leaf_to_face_ij(a)
        _, ib, jb = s2.leaf_to_face_ij(b)
        assert (np.abs(ia - ib) + np.abs(ja - jb) == 1).all()


def _slow_leaf(face, i, j):
    """Independent reimplementation: per-row 2-bit Hilbert state machine
    straight from POS_TO_IJ (no 4-bit lookup tables)."""
    out = np.empty(len(face), dtype=np.uint64)
    for r in range(len(face)):
        orient = face[r] & s2.SWAP_MASK
        pos = 0
        for level in range(29, -1, -1):
            ij = (((i[r] >> level) & 1) << 1) | ((j[r] >> level) & 1)
            idx = s2.POS_TO_IJ[orient].index(ij)
            pos = (pos << 2) | idx
            orient ^= s2.POS_TO_ORIENTATION[idx]
        out[r] = ((np.uint64(face[r]) << np.uint64(60) | np.uint64(pos))
                  << np.uint64(1) | np.uint64(1))
    return out.view(np.int64)


def test_table_walk_matches_slow_state_machine():
    face = RNG.integers(0, 6, 300).astype(np.int64)
    i = RNG.integers(0, 1 << 30, 300).astype(np.int64)
    j = RNG.integers(0, 1 << 30, 300).astype(np.int64)
    assert np.array_equal(s2.face_ij_to_leaf(face, i, j),
                          _slow_leaf(face, i, j))


def test_parent_level_range_invariants():
    x, y = points.derive_xy(np.arange(1, 4001, dtype=np.int64))
    leaf = s2.encode_lonlat(x, y)
    assert (s2.level_of(leaf) == 30).all()
    for lv in (11, 6, 0):
        p = s2.parent(leaf, lv)
        assert (s2.level_of(p) == lv).all()
        assert ((s2.range_min(p) <= leaf) & (leaf <= s2.range_max(p))).all()
        # parent of parent == direct parent at the coarser level
        assert np.array_equal(s2.parent(p, 0), s2.parent(leaf, 0))
    # Finland sits entirely on face 2 (the +z / polar face)
    assert (s2.leaf_to_face_ij(leaf)[0] == 2).all()


def test_parent_arithmetic_on_negative_int64_faces():
    # faces 4/5 set bit 63 → negative int64 views; the two's-complement
    # bit math must still match recomputing the parent from (face, i, j)
    lon = RNG.uniform(-180.0, -90.0, 3000)    # lands on faces 1/4/5 mostly
    lat = RNG.uniform(-80.0, 10.0, 3000)
    leaf = s2.encode_lonlat(lon, lat)
    assert (leaf < 0).any()
    p = s2.parent(leaf, 8)
    assert ((s2.range_min(p) <= leaf) & (leaf <= s2.range_max(p))).all()
    f_leaf, _, _ = s2.leaf_to_face_ij(leaf)
    f_p = (p.view(np.uint64) >> np.uint64(s2.POS_BITS)).astype(np.int64)
    assert np.array_equal(f_leaf, f_p)


def test_encode_level_equals_parent_of_leaf():
    x, y = points.derive_xy(np.arange(1, 2001, dtype=np.int64))
    assert np.array_equal(s2.encode_lonlat(x, y, 11),
                          s2.parent(s2.encode_lonlat(x, y), 11))


def test_duckdb_twin_bit_equal_global():
    import duckdb
    import pyarrow as pa

    lon = RNG.uniform(-180.0, 180.0, 8000)
    lat = RNG.uniform(-89.9, 89.9, 8000)
    ids = s2.encode_lonlat(lon, lat)
    con = duckdb.connect()
    con.register("g", pa.table({"k": np.arange(8000), "x": lon, "y": lat}))
    df = con.execute(s2.sql_leaf_cte("SELECT k, x, y FROM g", "k")
                     + "\nSELECT s2 FROM s2_leaf ORDER BY k").df()
    assert np.array_equal(df["s2"].to_numpy(), ids)   # all 6 faces, ± ids


def test_token_format():
    # token = uint64 hex, trailing zeros stripped (public S2 format)
    face2_cell = (np.int64(2) << np.int64(61)) | (np.int64(1) << np.int64(60))
    assert s2.token(int(face2_cell)) == "5"
    leaf = s2.encode_lonlat(np.array([24.94]), np.array([60.17]))[0]
    t = s2.token(int(leaf))
    assert 1 <= len(t) <= 16 and int(t.ljust(16, "0"), 16) == np.int64(
        leaf).astype(np.uint64)


def test_cell_uv_rect_contains_point_uv():
    lon = RNG.uniform(-180.0, 180.0, 4000)
    lat = RNG.uniform(-89.9, 89.9, 4000)
    face, u, v = s2.xyz_to_face_uv(*s2.lonlat_to_xyz(lon, lat))
    for lv in (4, 11, 20):
        cells = s2.encode_lonlat(lon, lat, lv)
        f, u_lo, u_hi, v_lo, v_hi = s2.cell_uv_rect(cells, lv)
        assert np.array_equal(f, face)
        assert ((u_lo <= u) & (u <= u_hi) & (v_lo <= v) & (v <= v_hi)).all()
        # exact rect size: each level halves the st span, uv via quadratic
        assert (u_hi > u_lo).all() and (v_hi > v_lo).all()


def test_st_uv_roundtrip_exact_on_grid():
    # grid-corner st values are exact dyadic rationals; the quadratic and
    # its inverse must round-trip them through float64 exactly enough to
    # preserve ordering and the [-1, 1] range
    s = np.linspace(0.0, 1.0, 1 << 12)
    u = s2.st_to_uv(s)
    assert u[0] == -1.0 and u[-1] == 1.0
    assert (np.diff(u) > 0).all()
    back = s2.uv_to_st(u)
    assert np.allclose(back, s, atol=1e-15)


def test_cell_uv_rect_duckdb_twin_bit_equal():
    import duckdb
    import pyarrow as pa

    lon = RNG.uniform(-180.0, 180.0, 3000)
    lat = RNG.uniform(-89.9, 89.9, 3000)
    for lv in (6, 11):
        cells = np.unique(s2.encode_lonlat(lon, lat, lv))
        f, u_lo, u_hi, v_lo, v_hi = s2.cell_uv_rect(cells, lv)
        con = duckdb.connect()
        con.register("g", pa.table({"k": cells, "s2": cells}))
        df = con.execute(
            s2.sql_uv_rect_cte("SELECT k, s2 FROM g", "k", lv)
            + "\nSELECT face, u_lo, u_hi, v_lo, v_hi FROM s2_rect ORDER BY k"
        ).df()
        assert np.array_equal(df["face"].to_numpy(), f)
        for name, arr in (("u_lo", u_lo), ("u_hi", u_hi),
                          ("v_lo", v_lo), ("v_hi", v_hi)):
            assert np.array_equal(df[name].to_numpy(), arr), (lv, name)
