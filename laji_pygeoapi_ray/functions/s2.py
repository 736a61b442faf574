"""Real S2 cell ids — vectorized numpy encode with an exact DuckDB twin.

The north-star tiling contract names H3/S2 cells as the shuffle / rollup
key. [[cells.py]] provides the engine's bbox-anchored quadtree stand-in;
this module adds the REAL thing: bit-compatible 64-bit S2 cell ids per the
public s2geometry algorithm (s2coords.h / s2cell_id.cc semantics,
re-derived here — no s2 wheel ships in the container):

    lon/lat → unit-sphere xyz → cube face + (u, v)
            → quadratic (s, t) → leaf (i, j) ∈ [0, 2^30)^2
            → Hilbert-curve position via 4-bit lookup tables
            → id = face(3 bits) · pos(2·30 bits) · sentinel(1)

Everything is vectorized (the Hilbert walk is 8 table-lookup iterations
over whole arrays), and every float op has the same order in numpy and in
the generated DuckDB SQL (trig/sqrt are bit-equal across the two — both
call libm; verified empirically in tests). The SQL twin runs the Hilbert
walk as a recursive CTE joining a 1024-row lookup table, so the oracle
reproduces ids bit-for-bit.

Scale role (SURVEY.md §1.4): leaf encode once in `map_batches`, then every
coarser view is integer parent arithmetic — no re-encode, no shuffle of
floats; `parent()` / `range_min/max` give hierarchical rollups and
range-pruning (a cell's descendants are one contiguous id interval).
"""
from __future__ import annotations

import numpy as np

from .points import _d

MAX_LEVEL = 30
POS_BITS = 2 * MAX_LEVEL + 1           # 61
LOOKUP_BITS = 4
SWAP_MASK, INVERT_MASK = 1, 2

# Hilbert sub-quadrant traversal order per orientation; ij = (i << 1) | j.
POS_TO_IJ = ((0, 1, 3, 2),             # canonical
             (0, 2, 3, 1),             # axes swapped
             (3, 2, 0, 1),             # bits inverted
             (3, 1, 0, 2))             # swapped + inverted
POS_TO_ORIENTATION = (SWAP_MASK, 0, 0, INVERT_MASK | SWAP_MASK)

# 4-level (16×16) lookup tables: index (ij<<2)|orient ↔ (pos<<2)|orient.
LOOKUP_POS = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.int64)
LOOKUP_IJ = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.int64)


def _init_lookup(level: int, i: int, j: int, orig: int, pos: int, orient: int):
    if level == LOOKUP_BITS:
        ij = (i << LOOKUP_BITS) + j
        LOOKUP_POS[(ij << 2) + orig] = (pos << 2) + orient
        LOOKUP_IJ[(pos << 2) + orig] = (ij << 2) + orient
        return
    level, i, j, pos = level + 1, i << 1, j << 1, pos << 2
    r = POS_TO_IJ[orient]
    for index in range(4):
        _init_lookup(level, i + (r[index] >> 1), j + (r[index] & 1),
                     orig, pos + index, orient ^ POS_TO_ORIENTATION[index])


for _o in range(4):
    _init_lookup(0, 0, 0, _o, 0, _o)


# ------------------------------------------------------------- sphere → ij

def lonlat_to_xyz(lon: np.ndarray, lat: np.ndarray):
    """Degrees → unit-sphere xyz. Op order mirrored by :func:`_sql_xyz`."""
    phi = lat * np.pi / 180.0
    theta = lon * np.pi / 180.0
    coslat = np.cos(phi)
    return coslat * np.cos(theta), coslat * np.sin(theta), np.sin(phi)


def xyz_to_face_uv(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    """Largest-|component| cube face + per-face (u, v) projection.

    The denominator of every face's (u, v) formula is the major component
    itself (sign included), so the six-way CASE collapses to two
    numerator gathers + ONE division each — bit-identical to the per-face
    elementwise formulas the SQL twin spells out."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    axis = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    comp = np.choose(axis, [x, y, z])
    face = np.where(comp < 0.0, axis + 3, axis).astype(np.int64)
    nx, ny = -x, -y
    u = np.choose(face, [y, nx, nx, z, z, ny]) / comp
    v = np.choose(face, [z, z, ny, y, nx, nx]) / comp
    return face, u, v


def uv_to_st(u: np.ndarray) -> np.ndarray:
    """S2's quadratic projection (the default S2_QUADRATIC_PROJECTION)."""
    with np.errstate(invalid="ignore"):
        return np.where(u >= 0.0,
                        0.5 * np.sqrt(1.0 + 3.0 * u),
                        1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def st_to_ij(s: np.ndarray) -> np.ndarray:
    lim = np.int64(1) << MAX_LEVEL
    return np.clip(np.floor(s * np.float64(lim)).astype(np.int64), 0, lim - 1)


# ------------------------------------------------------------- ij ↔ cell id

def face_ij_to_leaf(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """(face, i, j) → leaf cell id (int64 view of the uint64 id), via the
    8-iteration 4-bit Hilbert table walk."""
    n = face.astype(np.uint64) << np.uint64(POS_BITS - 1)
    bits = (face & 1).astype(np.int64)
    for k in range(7, -1, -1):
        bits = bits + (((i >> (k * 4)) & 15) << 6) + (((j >> (k * 4)) & 15) << 2)
        bits = LOOKUP_POS[bits]
        n |= (bits >> 2).astype(np.uint64) << np.uint64(k * 8)
        bits = bits & 3
    return ((n << np.uint64(1)) | np.uint64(1)).view(np.int64)


def leaf_to_face_ij(ids: np.ndarray):
    """Inverse of :func:`face_ij_to_leaf` (exact round-trip; test anchor)."""
    u = np.asarray(ids, dtype=np.int64).view(np.uint64)
    face = (u >> np.uint64(POS_BITS)).astype(np.int64)
    bits = face & 1
    i = np.zeros(len(u), dtype=np.int64)
    j = np.zeros(len(u), dtype=np.int64)
    for k in range(7, -1, -1):
        nbits = MAX_LEVEL - 7 * LOOKUP_BITS if k == 7 else LOOKUP_BITS
        pos = ((u >> np.uint64(k * 8 + 1)) &
               np.uint64((1 << (2 * nbits)) - 1)).astype(np.int64)
        bits = bits + (pos << 2)
        bits = LOOKUP_IJ[bits]
        i = i + ((bits >> 6) << (k * 4))
        j = j + (((bits >> 2) & 15) << (k * 4))
        bits = bits & 3
    return face, i, j


def encode_lonlat(lon: np.ndarray, lat: np.ndarray,
                  level: int = MAX_LEVEL) -> np.ndarray:
    """lon/lat degrees → S2 cell id at ``level`` (leaf encode + parent)."""
    face, u, v = xyz_to_face_uv(*lonlat_to_xyz(lon, lat))
    leaf = face_ij_to_leaf(face, st_to_ij(uv_to_st(u)), st_to_ij(uv_to_st(v)))
    return leaf if level >= MAX_LEVEL else parent(leaf, level)


def lsb_for_level(level: int) -> int:
    return 1 << (2 * (MAX_LEVEL - level))


def parent(ids: np.ndarray, level: int) -> np.ndarray:
    """Ancestor at ``level`` — pure int64 bit math (valid for face 4/5's
    negative int64 views too: two's-complement & matches uint64 &)."""
    lsb = np.int64(lsb_for_level(level))
    return (np.asarray(ids, dtype=np.int64) & -lsb) | lsb


def level_of(ids: np.ndarray) -> np.ndarray:
    ids = np.asarray(ids, dtype=np.int64)
    lsb = (ids & -ids).view(np.uint64)
    return (np.int64(MAX_LEVEL) -
            (np.log2(lsb.astype(np.float64)).astype(np.int64) >> 1))


def range_min(ids: np.ndarray) -> np.ndarray:
    ids = np.asarray(ids, dtype=np.int64)
    return ids - ((ids & -ids) - 1)


def range_max(ids: np.ndarray) -> np.ndarray:
    ids = np.asarray(ids, dtype=np.int64)
    return ids + ((ids & -ids) - 1)


def st_to_uv(s: np.ndarray) -> np.ndarray:
    """Inverse of :func:`uv_to_st` (the quadratic projection's UVtoST
    inverse). Op order mirrored exactly by the SQL twin — rational
    arithmetic only, so the two engines agree bit-for-bit."""
    s = np.asarray(s, dtype=np.float64)
    return np.where(s >= 0.5,
                    (4.0 * s * s - 1.0) / 3.0,
                    (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0)


def cell_uv_rect(ids: np.ndarray, level: int):
    """Cell ids at ``level`` → (face, u_lo, u_hi, v_lo, v_hi): the exact
    per-face (u, v) extent of each cell — the 'vector tile extent' of the
    S2 key. Decodes each cell's MIN leaf (any leaf floors to the same
    grid corner) and applies the rational ST→UV inverse; no trig, so the
    rect is bit-exact against the SQL twin."""
    ids = np.asarray(ids, dtype=np.int64)
    size = np.int64(1) << np.int64(MAX_LEVEL - level)
    face, i, j = leaf_to_face_ij(range_min(ids))
    i0, j0 = i & -size, j & -size
    lim = np.float64(np.int64(1) << MAX_LEVEL)
    s_lo, s_hi = i0 / lim, (i0 + size) / lim
    t_lo, t_hi = j0 / lim, (j0 + size) / lim
    return (face, st_to_uv(s_lo), st_to_uv(s_hi),
            st_to_uv(t_lo), st_to_uv(t_hi))


def token(cell_id: int) -> str:
    """Canonical hex token: 16 hex digits of the uint64 id, trailing zeros
    stripped (the public S2 token format)."""
    h = format(np.int64(cell_id).view(np.uint64).item() if hasattr(cell_id, "view")
               else np.array([cell_id], dtype=np.int64).view(np.uint64)[0].item(),
               "016x").rstrip("0")
    return h or "X"


# ------------------------------------------------------------- DuckDB twin

def _sql_lookup_values() -> str:
    return ", ".join(f"({i}, {int(v)})" for i, v in enumerate(LOOKUP_POS))


def sql_leaf_cte(points_sql: str, key: str) -> str:
    """Full ``WITH RECURSIVE`` prologue + a ``s2_leaf(key, s2)`` CTE chain
    mirroring :func:`encode_lonlat` at leaf level bit-for-bit.

    ``points_sql`` must yield columns (``key``, x=lon degrees, y=lat
    degrees). Returns the CTE text up to and including ``s2_leaf``; append
    your own ``SELECT ... FROM s2_leaf``.
    """
    pi, d180 = _d(np.pi), _d(180.0)
    half, one, three = _d(0.5), _d(1.0), _d(3.0)
    lim = 1 << MAX_LEVEL
    st = ("(CASE WHEN {u} >= CAST(0 AS DOUBLE) "
          f"THEN {half} * sqrt({one} + {three} * {{u}}) "
          f"ELSE {one} - {half} * sqrt({one} - {three} * {{u}}) END)")
    ij = (f"LEAST(GREATEST(CAST(floor({{s}} * {_d(float(lim))}) AS BIGINT),"
          f" 0), {lim - 1})")
    uexpr = ("CASE face WHEN 0 THEN y0 / x0 WHEN 1 THEN -x0 / y0"
             " WHEN 2 THEN -x0 / z0 WHEN 3 THEN z0 / x0"
             " WHEN 4 THEN z0 / y0 ELSE -y0 / z0 END")
    vexpr = ("CASE face WHEN 0 THEN z0 / x0 WHEN 1 THEN z0 / y0"
             " WHEN 2 THEN -y0 / z0 WHEN 3 THEN y0 / x0"
             " WHEN 4 THEN -x0 / y0 ELSE -x0 / z0 END")
    return f"""WITH RECURSIVE
s2_pts AS ({points_sql}),
s2_xyz AS (
  SELECT {key},
         cos(y * {pi} / {d180}) * cos(x * {pi} / {d180}) AS x0,
         cos(y * {pi} / {d180}) * sin(x * {pi} / {d180}) AS y0,
         sin(y * {pi} / {d180}) AS z0
  FROM s2_pts),
s2_fuv AS (
  SELECT {key}, x0, y0, z0,
         axis + CASE WHEN (CASE axis WHEN 0 THEN x0 WHEN 1 THEN y0 ELSE z0 END)
                     < CAST(0 AS DOUBLE) THEN 3 ELSE 0 END AS face
  FROM (SELECT *, CASE WHEN abs(x0) > abs(y0)
                       THEN CASE WHEN abs(x0) > abs(z0) THEN 0 ELSE 2 END
                       ELSE CASE WHEN abs(y0) > abs(z0) THEN 1 ELSE 2 END
                  END AS axis FROM s2_xyz)),
s2_fij AS (
  SELECT {key}, face,
         {ij.format(s=st.format(u=uexpr))} AS i,
         {ij.format(s=st.format(u=vexpr))} AS j
  FROM s2_fuv),
s2_lk(idx, lp) AS (VALUES {_sql_lookup_values()}),
s2_hil AS (
  SELECT {key}, face, i, j, 7 AS s2k,
         CAST(face & 1 AS BIGINT) AS bits,
         CAST(face AS BIGINT) << {POS_BITS - 1} AS n
  FROM s2_fij
  UNION ALL
  SELECT h.{key}, h.face, h.i, h.j, h.s2k - 1,
         CAST(lk.lp & 3 AS BIGINT),
         h.n | ((CAST(lk.lp AS BIGINT) >> 2) << (h.s2k * 8))
  FROM s2_hil h JOIN s2_lk lk
    ON lk.idx = h.bits + (((h.i >> (h.s2k * 4)) & 15) << 6)
                       + (((h.j >> (h.s2k * 4)) & 15) << 2)
  WHERE h.s2k >= 0),
s2_leaf AS (
  SELECT {key},
         CAST(CASE WHEN h >= CAST('9223372036854775808' AS HUGEINT)
                   THEN h - CAST('18446744073709551616' AS HUGEINT)
                   ELSE h END AS BIGINT) AS s2
  FROM (SELECT {key}, CAST(n AS HUGEINT) * 2 + 1 AS h
        FROM s2_hil WHERE s2k = -1) w)"""


def sql_parent(expr: str, level: int) -> str:
    lsb = lsb_for_level(level)
    return f"((({expr}) & -({lsb})) | {lsb})"


def _sql_lookup_ij_values() -> str:
    return ", ".join(f"({i}, {int(v)})" for i, v in enumerate(LOOKUP_IJ))


def sql_uv_rect_cte(cells_sql: str, key: str, level: int) -> str:
    """``WITH RECURSIVE`` prologue + a ``s2_rect(key, face, u_lo, u_hi,
    v_lo, v_hi)`` CTE mirroring :func:`cell_uv_rect` bit-for-bit: min-leaf
    decode → inverse Hilbert table walk (LOOKUP_IJ joined per iteration) →
    grid-floored (i, j) → exact rational ST→UV.

    ``cells_sql`` must yield (``key``, s2) with s2 = cell ids at ``level``.
    """
    size = 1 << (MAX_LEVEL - level)
    lim = _d(float(1 << MAX_LEVEL))
    two61 = 1 << POS_BITS
    half, one, three, four = _d(0.5), _d(1.0), _d(3.0), _d(4.0)
    uv = (f"(CASE WHEN {{s}} >= {half} "
          f"THEN ({four} * {{s}} * {{s}} - {one}) / {three} "
          f"ELSE ({one} - {four} * ({one} - {{s}}) * ({one} - {{s}}))"
          f" / {three} END)")
    s_lo, s_hi = f"(CAST(i0 AS DOUBLE) / {lim})", \
                 f"(CAST(i0 + {size} AS DOUBLE) / {lim})"
    t_lo, t_hi = f"(CAST(j0 AS DOUBLE) / {lim})", \
                 f"(CAST(j0 + {size} AS DOUBLE) / {lim})"
    return f"""WITH RECURSIVE
s2_cells AS ({cells_sql}),
s2_minleaf AS (
  SELECT {key}, s2 - ((s2 & -s2) - 1) AS leaf FROM s2_cells),
s2_h AS (
  SELECT {key},
         CASE WHEN leaf < 0
              THEN CAST(leaf AS HUGEINT) + CAST('18446744073709551616' AS HUGEINT)
              ELSE CAST(leaf AS HUGEINT) END AS h
  FROM s2_minleaf),
s2_fp AS (
  SELECT {key}, CAST(h // {two61} AS BIGINT) AS face,
         CAST(h % {two61} AS BIGINT) AS pos
  FROM s2_h),
s2_lkij(idx, v) AS (VALUES {_sql_lookup_ij_values()}),
s2_walk AS (
  SELECT {key}, face, pos, 7 AS s2k,
         CAST(face & 1 AS BIGINT) AS bits,
         CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS j
  FROM s2_fp
  UNION ALL
  SELECT w.{key}, w.face, w.pos, w.s2k - 1,
         CAST(lk.v & 3 AS BIGINT),
         w.i + ((lk.v >> 6) << (w.s2k * 4)),
         w.j + (((lk.v >> 2) & 15) << (w.s2k * 4))
  FROM s2_walk w JOIN s2_lkij lk
    ON lk.idx = w.bits + (((w.pos >> (w.s2k * 8 + 1))
         & (CASE WHEN w.s2k = 7 THEN 15 ELSE 255 END)) << 2)
  WHERE w.s2k >= 0),
s2_ij AS (
  SELECT {key}, face, i & -{size} AS i0, j & -{size} AS j0
  FROM s2_walk WHERE s2k = -1),
s2_rect AS (
  SELECT {key}, face,
         {uv.format(s=s_lo)} AS u_lo, {uv.format(s=s_hi)} AS u_hi,
         {uv.format(s=t_lo)} AS v_lo, {uv.format(s=t_hi)} AS v_hi
  FROM s2_ij)"""
