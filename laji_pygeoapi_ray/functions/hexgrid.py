"""Hexagonal tiling — the true H3-analogue cell family.

The north star names "H3 (res 7-9)" tiling (SURVEY.md §1.4); the engine's
quadtree grid (``functions/cells.py``) covers the hierarchical-square role
and ``functions/s2.py`` the real spherical S2 ids, but H3's defining
property is HEXAGONAL cells: every neighbor shares an edge, all six
neighbors are equidistant, and aggregation over hexes has no corner bias —
which is why raster←vector density products (the reference's tile
aggregates, ``edit_db.py:235-260``) prefer hex binning. The container
ships no ``h3`` wheel, so this module implements the planar hex lattice
from the public axial/cube-coordinate algebra (Red Blob Games'
hex-grid formulation, public domain): pointy-top hexes over the Finland
bbox plane, point→hex via fractional axial coordinates + cube rounding.

Resolution: ``res`` gives ``n = 2**res`` hex columns across the bbox width
(hex width = sqrt(3)·size = bbox_width / n), so res 7 is directly
comparable to the quadtree's 128-column res-7 band (H3 res-7 analogue).

Every arithmetic op has a DuckDB twin with IDENTICAL op order and
shared ``repr``-cast float64 constants (:func:`sql_hex_cte`), so hex
assignments are oracle-checkable bit-for-bit — the same float playbook as
``functions/cells.py`` / ``functions/s2.py``.
"""
from __future__ import annotations

import numpy as np

from .points import FIN_X0, FIN_Y0, FIN_X1, FIN_Y1, _d

_W = FIN_X1 - FIN_X0

# Shared float64 constants — computed ONCE here; numpy uses these exact
# values and SQL receives their repr via CAST('…' AS DOUBLE).
SQRT3 = float(np.sqrt(np.float64(3.0)))
C_Q = SQRT3 / 3.0          # qf = (C_Q·px − C_R·py) / size
C_R = 1.0 / 3.0
C_ROW = 2.0 / 3.0          # rf = (C_ROW·py) / size

# hex id packing: id = q·2^20 + r (q, r stay well inside ±2^19 for the
# res ≤ 12 band over the bbox; BIGINT-exact on both sides)
PACK = 1 << 20


def hex_size(res: int) -> float:
    """Hex circumradius (pointy-top) giving ``2**res`` columns across the
    bbox: width = sqrt(3)·size = _W / 2**res."""
    return _W / (float(1 << res) * SQRT3)


def hex_qr(x: np.ndarray, y: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """(x, y) float64 → axial hex coordinates (q, r) int64 at ``res``.

    Fractional axial coords + cube rounding; op order mirrored exactly by
    :func:`sql_hex_cte`.
    """
    s = np.float64(hex_size(res))
    px = x - FIN_X0
    py = y - FIN_Y0
    qf = (np.float64(C_Q) * px - np.float64(C_R) * py) / s
    rf = (np.float64(C_ROW) * py) / s
    yf = (-qf) - rf
    rx = np.floor(qf + 0.5)
    ry = np.floor(yf + 0.5)
    rz = np.floor(rf + 0.5)
    dx = np.abs(rx - qf)
    dy = np.abs(ry - yf)
    dz = np.abs(rz - rf)
    c1 = (dx > dy) & (dx > dz)
    c2 = dy > dz
    q = np.where(c1, (-ry) - rz, rx)
    r = np.where((~c1) & (~c2), (-rx) - ry, rz)
    return q.astype(np.int64), r.astype(np.int64)


def hex_id(x: np.ndarray, y: np.ndarray, res: int) -> np.ndarray:
    """(x, y) → packed hex id (``q·2^20 + r``; int64, sign-safe)."""
    q, r = hex_qr(x, y, res)
    return q * np.int64(PACK) + r


def hex_center(q: np.ndarray, r: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Axial (q, r) → hex center (x, y) in bbox coordinates (pointy-top)."""
    s = np.float64(hex_size(res))
    qf = np.asarray(q, dtype=np.float64)
    rf = np.asarray(r, dtype=np.float64)
    cx = s * (np.float64(SQRT3) * qf + np.float64(SQRT3) / 2.0 * rf) + FIN_X0
    cy = s * (1.5 * rf) + FIN_Y0
    return cx, cy


def unpack(hid: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Packed hex id → (q, r). The packing is injective for |r| < 2^19;
    recovering it needs NEAREST division (a negative r must not borrow a
    whole PACK from q): q = floor((hid + PACK/2) / PACK)."""
    hid = np.asarray(hid, dtype=np.int64)
    q = np.floor_divide(hid + (PACK >> 1), PACK)
    r = hid - q * PACK
    return q, r


def sql_hex_cte(pts_sql: str, key: str, res: int,
                out: str = "hex_id") -> str:
    """DuckDB twin of :func:`hex_id` over a points subquery.

    ``pts_sql`` must yield columns (``key``, x, y); the result yields
    (``key``, ``out``). Every stage is a CTE so each float is computed
    once and reused — mirroring the numpy intermediate variables
    (identical op order, shared constants).
    """
    s = _d(hex_size(res))
    return f"""(
    WITH __hx_p AS ({pts_sql}),
    __hx_f AS (
        SELECT {key},
               (({_d(C_Q)} * (x - {_d(FIN_X0)})) -
                ({_d(C_R)} * (y - {_d(FIN_Y0)}))) / {s} AS qf,
               ({_d(C_ROW)} * (y - {_d(FIN_Y0)})) / {s} AS rf
        FROM __hx_p),
    __hx_y AS (
        SELECT {key}, qf, rf, ((-(qf)) - rf) AS yf FROM __hx_f),
    __hx_r AS (
        SELECT {key}, qf, rf, yf,
               floor(qf + 0.5) AS rx, floor(yf + 0.5) AS ry,
               floor(rf + 0.5) AS rz
        FROM __hx_y),
    __hx_d AS (
        SELECT {key}, rx, ry, rz,
               abs(rx - qf) AS dx, abs(ry - yf) AS dy, abs(rz - rf) AS dz
        FROM __hx_r),
    __hx_c AS (
        SELECT {key},
               CASE WHEN dx > dy AND dx > dz THEN ((-(ry)) - rz)
                    ELSE rx END AS qh,
               CASE WHEN NOT (dx > dy AND dx > dz) AND NOT (dy > dz)
                    THEN ((-(rx)) - ry) ELSE rz END AS rh
        FROM __hx_d)
    SELECT {key},
           CAST(qh AS BIGINT) * {PACK} + CAST(rh AS BIGINT) AS {out}
    FROM __hx_c)"""


def sql_unpack_center_cte(ids_sql: str, key: str, id_col: str,
                          res: int) -> str:
    """DuckDB twin of ``unpack`` + :func:`hex_center`: a subquery over
    ``ids_sql`` (columns ``key``, ``id_col`` = packed hex id) yielding
    (``key``, x, y) = the hex centers. Nearest-division unpack (the packed
    low half is signed) and the exact center op order of the numpy
    kernel."""
    s = _d(hex_size(res))
    half = PACK >> 1
    return f"""(
    WITH __hc_i AS ({ids_sql}),
    __hc_q AS (
        SELECT {key},
               CAST(floor(({id_col} + {half}) / {PACK}) AS BIGINT) AS q
        FROM __hc_i),
    __hc_qr AS (
        SELECT i.{key}, CAST(q AS DOUBLE) AS qf,
               CAST(i.{id_col} - q * {PACK} AS DOUBLE) AS rf
        FROM __hc_i i JOIN __hc_q USING ({key}))
    SELECT {key},
           {s} * (({_d(SQRT3)} * qf) + ({_d(SQRT3 / 2.0)} * rf))
               + {_d(FIN_X0)} AS x,
           {s} * ({_d(1.5)} * rf) + {_d(FIN_Y0)} AS y
    FROM __hc_qr)"""
