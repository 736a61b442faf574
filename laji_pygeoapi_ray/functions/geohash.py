"""Geohash encoding over the engine's working extent.

Classic geohash (Niemeyer 2008, public spec): binary-subdivide the
bounding box, alternating longitude/latitude bits MSB-first, then emit
the bit string in 5-bit groups through the base-32 alphabet
``0123456789bcdefghjkmnpqrstuvwxyz``. The textbook variant spans the
whole globe; this engine anchors the subdivision at its working extent
(the Finland bbox every other index here uses — ``functions/points.py``)
so precision-6 cells are comparable to the res-7 Morton tiles.

Why a THIRD curve next to Morton (`cells`) and Hilbert: geohash is the
only one whose cell id is a *string with the prefix property* — a
coarser cell is literally a prefix of the finer id, so rollups and range
scans work with plain string operators (``LIKE 'u6dc%'``), the property
object stores and key-value layouts exploit. The complement of the
reference's PostGIS tiling (SURVEY §2.6 raster↔vector family).

Every arithmetic op mirrors 1:1 into DuckDB SQL (:func:`sql_geohash`)
so geohash queries carry exact value oracles, same trick as
``cells.sql_cell`` / ``hilbert.sql_d2xy``.
"""
from __future__ import annotations

import numpy as np

from .points import FIN_X0, FIN_Y0, _H, _W, _d

GH_BITS = 15                       # per axis → 30 bits → 6 base-32 chars
GH_CHARS = (2 * GH_BITS) // 5
ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
_ALPHA_U8 = np.frombuffer(ALPHABET.encode(), dtype=np.uint8)
_N = 1 << GH_BITS


def axis_bits(x: np.ndarray, x0: float, span: float) -> np.ndarray:
    """Quantize one axis to GH_BITS bits (clipped to the extent)."""
    f = np.floor((x - x0) / span * float(_N)).astype(np.int64)
    return np.clip(f, 0, _N - 1)


def interleave(bx: np.ndarray, by: np.ndarray) -> np.ndarray:
    """MSB-first bit interleave, longitude leading (geohash bit order)."""
    z = np.zeros(len(bx), dtype=np.int64)
    for i in range(GH_BITS):
        z |= ((bx >> (GH_BITS - 1 - i)) & 1) << (2 * GH_BITS - 1 - 2 * i)
        z |= ((by >> (GH_BITS - 1 - i)) & 1) << (2 * GH_BITS - 2 - 2 * i)
    return z


def encode(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """(x, y) float64 → precision-6 geohash strings (numpy ``U6``)."""
    z = interleave(axis_bits(x, FIN_X0, _W), axis_bits(y, FIN_Y0, _H))
    chars = np.empty((len(z), GH_CHARS), dtype=np.uint8)
    for j in range(GH_CHARS):
        shift = 5 * (GH_CHARS - 1 - j)
        chars[:, j] = _ALPHA_U8[(z >> shift) & 31]
    return chars.reshape(-1).view(f"S{GH_CHARS}").astype(f"U{GH_CHARS}")


def sql_axis_bits(expr: str, x0: float, span: float) -> str:
    """DuckDB twin of :func:`axis_bits` for a coordinate expression."""
    f = f"((({expr}) - {_d(x0)}) / {_d(span)}) * {_d(float(_N))}"
    return f"LEAST(GREATEST(CAST(floor({f}) AS BIGINT), 0), {_N - 1})"


def sql_interleave(bx: str, by: str) -> str:
    """DuckDB twin of :func:`interleave`. Pass COLUMN NAMES (stage bx/by
    in a prior CTE) — the expression references each 15 times."""
    terms = []
    for i in range(GH_BITS):
        terms.append(f"((({bx} >> {GH_BITS - 1 - i}) & 1)"
                     f" << {2 * GH_BITS - 1 - 2 * i})")
        terms.append(f"((({by} >> {GH_BITS - 1 - i}) & 1)"
                     f" << {2 * GH_BITS - 2 - 2 * i})")
    return "(" + " | ".join(terms) + ")"


def sql_chars(z: str) -> str:
    """DuckDB twin of the base-32 emit. Pass a COLUMN NAME (the z column
    of a prior CTE) — referenced once per output char."""
    parts = []
    for j in range(GH_CHARS):
        shift = 5 * (GH_CHARS - 1 - j)
        parts.append(
            f"substring('{ALPHABET}', CAST((({z} >> {shift}) & 31)"
            f" AS INTEGER) + 1, 1)")
    return "(" + " || ".join(parts) + ")"


def sql_geohash_ctes(points_sql: str, keep: str = "doc_id") -> str:
    """Staged CTE chain ``points → (bx, by) → z → gh`` over a points
    subquery with columns (``keep``, x, y); yields ``__gh(keep, gh)``."""
    return f"""
    __ghp AS ({points_sql}),
    __ghb AS (SELECT {keep}, {sql_axis_bits('x', FIN_X0, _W)} AS bx,
                     {sql_axis_bits('y', FIN_Y0, _H)} AS by FROM __ghp),
    __ghz AS (SELECT {keep}, {sql_interleave('bx', 'by')} AS z FROM __ghb),
    __gh AS (SELECT {keep}, {sql_chars('z')} AS gh FROM __ghz)"""
