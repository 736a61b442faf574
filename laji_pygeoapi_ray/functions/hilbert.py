"""Hilbert space-filling-curve index — the locality-preserving layout key.

At 100 TB the physical sort order of the output decides how many files a
bbox query touches; a Hilbert key beats row-major (Z-order-ish) tile ids
because consecutive index values are always 4-neighbors, so any bbox is
covered by few contiguous index ranges. The engine exposes ``xy_to_d``
(vectorized numpy, the classic Wikipedia/TAOCP bit transform) and a
bit-exact staged-CTE SQL twin for the oracle.

Both sides run the identical per-level transform (MSB→LSB):

    rx = (x & s) > 0 ; ry = (y & s) > 0
    d += s·s·((3·rx) XOR ry)
    if ry == 0:                      # rotate quadrant
        if rx == 1: x, y = s−1−x, s−1−y
        x, y = y, x
"""
from __future__ import annotations

import numpy as np


def xy_to_d(ix: np.ndarray, iy: np.ndarray, order: int) -> np.ndarray:
    """Grid coords (in [0, 2**order)) → Hilbert curve index (int64)."""
    x = np.asarray(ix, dtype=np.int64).copy()
    y = np.asarray(iy, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1) << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        flip = (ry == 0) & (rx == 1)
        x1 = np.where(flip, s - 1 - x, x)
        y1 = np.where(flip, s - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, y1, x1), np.where(swap, x1, y1)
        s >>= 1
    return d


def sql_hilbert_ctes(src: str, order: int, *, id_col: str = "id",
                     x_col: str = "hx", y_col: str = "hy",
                     out: str = "hd") -> str:
    """Staged CTEs computing the same transform in DuckDB. ``src`` must be
    a CTE name exposing (id_col, x_col, y_col); returns the CTE chain text
    (to splice after a WITH) whose final CTE ``{out}`` has
    (id_col, {out})."""
    parts = [f"h0 AS (SELECT {id_col}, {x_col} AS x, {y_col} AS y, "
             f"CAST(0 AS BIGINT) AS d FROM {src})"]
    lvl = 0
    for k in range(order - 1, -1, -1):
        s = 1 << k
        parts.append(
            f"a{lvl} AS (SELECT *, "
            f"CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END AS rx, "
            f"CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END AS ry "
            f"FROM h{lvl})")
        parts.append(
            f"h{lvl + 1} AS (SELECT {id_col}, "
            f"CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 "
            f"THEN {s - 1} - y ELSE y END) ELSE x END AS x, "
            f"CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 "
            f"THEN {s - 1} - x ELSE x END) ELSE y END AS y, "
            f"d + {s * s} * (CASE WHEN rx = 1 THEN "
            f"(CASE WHEN ry = 1 THEN 2 ELSE 3 END) ELSE ry END) AS d "
            f"FROM a{lvl})")
        lvl += 1
    parts.append(f"{out} AS (SELECT {id_col}, d AS {out} FROM h{lvl})")
    return ",\n    ".join(parts)


_M1, _M2, _M4, _M8 = (0x5555555555555555, 0x3333333333333333,
                      0x0F0F0F0F0F0F0F0F, 0x00FF00FF00FF00FF)


def spread_bits(v: np.ndarray) -> np.ndarray:
    """Spread a 16-bit int to the even bit positions (Morton helper)."""
    v = np.asarray(v, dtype=np.int64)
    v = (v | (v << 8)) & _M8
    v = (v | (v << 4)) & _M4
    v = (v | (v << 2)) & _M2
    v = (v | (v << 1)) & _M1
    return v


def xy_to_morton(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    """Z-order (Morton) index by bit interleave — the Hilbert baseline."""
    return spread_bits(ix) | (spread_bits(iy) << 1)


def sql_spread(expr: str) -> str:
    e = expr
    e = f"((({e}) | (({e}) << 8)) & {_M8})"
    e = f"((({e}) | (({e}) << 4)) & {_M4})"
    e = f"((({e}) | (({e}) << 2)) & {_M2})"
    e = f"((({e}) | (({e}) << 1)) & {_M1})"
    return e


def sql_morton(x_col: str, y_col: str) -> str:
    return f"({sql_spread(x_col)} | ({sql_spread(y_col)} << 1))"
