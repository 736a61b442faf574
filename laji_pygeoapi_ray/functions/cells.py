"""Hierarchical grid-cell index ("fincell") — the engine's H3/S2 stand-in.

The reference partitions physically by (biogeographical province × geometry
type) tables (``/root/reference/pygeoapi/scripts/main.py:85,193-198``) and
relies on a PostGIS GIST index for spatial pruning (``edit_db.py:307-310``).
The new engine replaces both with a single hierarchical cell id computed from
the point: a power-of-two quadtree grid anchored to the Finland bbox
(the container ships neither ``h3`` nor ``s2``; this grid provides the same
roles — shuffle key, bbox cover / pruning key, tile id, kNN candidate rings —
with exact parent/child/neighbor arithmetic).

Cell id layout (uint64-in-int64):  ``(res << 58) | (iy << 29) | ix``
with ``ix, iy ∈ [0, 2**res)`` and ``res ∈ [0, 29)``.  Resolution 7-9 mirrors
the north-star "H3 res 7-9" tiling band: at res 7 the bbox splits into
128×128 cells (~0.1° ≈ 5-10 km, comparable to H3 res 7).

All arithmetic has a DuckDB-SQL twin (same op order on float64 / BIGINT) used
by the correctness oracle.
"""
from __future__ import annotations

import numpy as np

from .points import FIN_X0, FIN_X1, FIN_Y0, FIN_Y1, _d

_W = FIN_X1 - FIN_X0
_H = FIN_Y1 - FIN_Y0

RES_SHIFT = 58
IY_SHIFT = 29


def cell_xy(x: np.ndarray, y: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """(x, y) float64 → integer grid coordinates (ix, iy) at resolution ``res``."""
    n = np.int64(1) << res
    fx = ((x - FIN_X0) / _W) * np.float64(n)
    fy = ((y - FIN_Y0) / _H) * np.float64(n)
    ix = np.clip(np.floor(fx).astype(np.int64), 0, n - 1)
    iy = np.clip(np.floor(fy).astype(np.int64), 0, n - 1)
    return ix, iy


def encode(x: np.ndarray, y: np.ndarray, res: int) -> np.ndarray:
    """(x, y) → cell id at resolution ``res``."""
    ix, iy = cell_xy(x, y, res)
    return (np.int64(res) << RES_SHIFT) | (iy << IY_SHIFT) | ix


def decode(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell id → (res, ix, iy)."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell >> RES_SHIFT
    iy = (cell >> IY_SHIFT) & ((np.int64(1) << IY_SHIFT) - 1)
    ix = cell & ((np.int64(1) << IY_SHIFT) - 1)
    return res, ix, iy


def parent(cell: np.ndarray, res: int) -> np.ndarray:
    """Coarsen a cell id to a lower resolution (exact quadtree ancestor)."""
    r, ix, iy = decode(cell)
    shift = r - res
    return (np.int64(res) << RES_SHIFT) | ((iy >> shift) << IY_SHIFT) | (ix >> shift)


def cell_bounds(cell: int) -> tuple[float, float, float, float]:
    """cell id → (x0, y0, x1, y1) bbox of the cell."""
    r, ix, iy = decode(np.asarray([cell]))
    n = float(1 << int(r[0]))
    cw, ch = _W / n, _H / n
    x0 = FIN_X0 + float(ix[0]) * cw
    y0 = FIN_Y0 + float(iy[0]) * ch
    return x0, y0, x0 + cw, y0 + ch


def neighbors(cell: int, ring: int = 1) -> list[int]:
    """All cell ids within ``ring`` king-moves (the kNN candidate ring;
    plays the role of ``h3.grid_disk``). Clipped at the grid edge."""
    r, ix, iy = decode(np.asarray([cell]))
    r, ix, iy = int(r[0]), int(ix[0]), int(iy[0])
    n = 1 << r
    out = []
    for dy in range(-ring, ring + 1):
        for dx in range(-ring, ring + 1):
            jx, jy = ix + dx, iy + dy
            if 0 <= jx < n and 0 <= jy < n:
                out.append((r << RES_SHIFT) | (jy << IY_SHIFT) | jx)
    return out


def cover_bbox(x0: float, y0: float, x1: float, y1: float, res: int) -> list[int]:
    """Cell ids whose extent intersects the query bbox — the coarse prune set
    (the engine's analogue of a GIST bbox index scan, ``edit_db.py:309``)."""
    n = 1 << res
    lo_ix = min(max(int(np.floor((x0 - FIN_X0) / _W * n)), 0), n - 1)
    hi_ix = min(max(int(np.floor((x1 - FIN_X0) / _W * n)), 0), n - 1)
    lo_iy = min(max(int(np.floor((y0 - FIN_Y0) / _H * n)), 0), n - 1)
    hi_iy = min(max(int(np.floor((y1 - FIN_Y0) / _H * n)), 0), n - 1)
    return [(res << RES_SHIFT) | (iy << IY_SHIFT) | ix
            for iy in range(lo_iy, hi_iy + 1) for ix in range(lo_ix, hi_ix + 1)]


def sql_cell(x: str, y: str, res: int) -> str:
    """DuckDB expression mirroring :func:`encode` for (x, y) expressions."""
    n = 1 << res
    fx = f"((({x}) - {_d(FIN_X0)}) / {_d(_W)}) * {_d(float(n))}"
    fy = f"((({y}) - {_d(FIN_Y0)}) / {_d(_H)}) * {_d(float(n))}"
    ix = f"LEAST(GREATEST(CAST(floor({fx}) AS BIGINT), 0), {n - 1})"
    iy = f"LEAST(GREATEST(CAST(floor({fy}) AS BIGINT), 0), {n - 1})"
    return (f"((CAST({res} AS BIGINT) << {RES_SHIFT}) | (({iy}) << {IY_SHIFT}) | ({ix}))")


def cell_bounds_np(cell: np.ndarray, res: int):
    """Vectorized cell id → (x0, y0, x1, y1) arrays for a fixed resolution
    (the raster→vector 'vectorize' direction). Float ops mirror
    :func:`sql_cell_bounds` exactly."""
    cell = np.asarray(cell, dtype=np.int64)
    n = 1 << res
    cw = _W / n
    ch = _H / n
    ix = (cell & ((np.int64(1) << IY_SHIFT) - 1)).astype(np.float64)
    iy = ((cell >> IY_SHIFT) & ((np.int64(1) << IY_SHIFT) - 1)).astype(np.float64)
    x0 = FIN_X0 + ix * cw
    y0 = FIN_Y0 + iy * ch
    x1 = FIN_X0 + (ix + 1.0) * cw
    y1 = FIN_Y0 + (iy + 1.0) * ch
    return x0, y0, x1, y1


def sql_cell_bounds(cell: str, res: int) -> tuple[str, str, str, str]:
    """DuckDB twins of :func:`cell_bounds_np` for a cell-id expression."""
    n = 1 << res
    cw = _d(_W / n)
    ch = _d(_H / n)
    mask = (1 << IY_SHIFT) - 1
    ix = f"CAST((({cell}) & {mask}) AS DOUBLE)"
    iy = f"CAST(((({cell}) >> {IY_SHIFT}) & {mask}) AS DOUBLE)"
    return (f"({_d(FIN_X0)} + {ix} * {cw})",
            f"({_d(FIN_Y0)} + {iy} * {ch})",
            f"({_d(FIN_X0)} + ({ix} + CAST(1.0 AS DOUBLE)) * {cw})",
            f"({_d(FIN_Y0)} + ({iy} + CAST(1.0 AS DOUBLE)) * {ch})")


def enumerate_cover(lox: np.ndarray, hix: np.ndarray,
                    loy: np.ndarray, hiy: np.ndarray,
                    res: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized per-row cell-rectangle enumeration: row i expands to
    every cell id in [lox[i], hix[i]] × [loy[i], hiy[i]] (inclusive index
    ranges, already clipped by the caller). Returns (idx, cell) — idx maps
    each output cell back to its source row. Shared by the bbox-cover
    explodes (rectangle-overlap join, corridor join, segment crossings
    shape)."""
    nx = hix - lox + 1
    ny = hiy - loy + 1
    cnt = nx * ny
    total = int(cnt.sum())
    idx = np.repeat(np.arange(len(lox), dtype=np.int64), cnt)
    starts = np.cumsum(cnt) - cnt
    k = np.arange(total, dtype=np.int64) - starts[idx]
    jx = lox[idx] + k % nx[idx]
    jy = loy[idx] + k // nx[idx]
    cell = (np.int64(res) << RES_SHIFT) | (jy << IY_SHIFT) | jx
    return idx, cell
