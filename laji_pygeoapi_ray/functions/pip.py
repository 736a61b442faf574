"""Vectorized point-in-polygon (even-odd ray casting) + a grid-bucketed
polygon index — the engine's ``ST_Contains`` / STRtree substitute.

The reference gets containment labels pre-interpreted from the warehouse and
serves spatial predicates via PostGIS GIST-indexed SQL
(``/root/reference/pygeoapi/scripts/edit_db.py:307-310``); the new engine
computes `point ∈ region polygon` itself (SURVEY.md §2.5, "the core new
work"). The container has no shapely, so both the index and the ray casting
are pure numpy.

Crossing rule (identical, op-for-op, to the SQL twin in
:func:`sql_pip_assign` so the DuckDB oracle is bit-equal on float64): an edge
(x1,y1)→(x2,y2) with ``y1 != y2`` crosses the leftward ray of point (px,py)
iff ``(y1 > py) != (y2 > py)`` and ``px < (x2-x1)*(py-y1)/(y2-y1) + x1``.
A point is inside iff its crossing count over the polygon's non-horizontal
edges is odd. Horizontal edges never satisfy the first clause and are
filtered on both sides (DuckDB double x/0 yields NULL, numpy yields inf/nan —
filtering keeps both engines on defined arithmetic).
"""
from __future__ import annotations

import numpy as np

from ..state.fixtures import Polygon


def ring_edges(ring: np.ndarray) -> list:
    """Ring (V, 2) → cached-friendly list of non-horizontal edges as python
    float tuples (x1, y1, x2, y2). Building this ONCE per polygon (GridIndex
    holds it) removes the per-call np.roll/slicing that dominated
    crossing_parity at high call rates (boundary-cell chunks call it per
    polygon per 32k chunk)."""
    x1e = ring[:, 0]
    y1e = ring[:, 1]
    x2e = np.roll(x1e, -1)
    y2e = np.roll(y1e, -1)
    keep = y1e != y2e
    return [(float(a), float(b), float(c), float(d))
            for a, b, c, d in zip(x1e[keep], y1e[keep],
                                  x2e[keep], y2e[keep])]


def crossing_parity(px: np.ndarray, py: np.ndarray,
                    ring: np.ndarray | None = None,
                    edges: list | None = None) -> np.ndarray:
    """Boolean inside-mask of points (px, py) vs one polygon ring (V, 2).

    Loops over the (few) edges with (n,)-sized temporaries and accumulates
    the parity with XOR instead of materializing an (n, E) crossing matrix:
    same float64 ops in the same order (bit-identical to the SQL twin), but
    the working set stays cache-resident — ~2× faster under a full actor
    pool where memory bandwidth is the binding resource. Pass precomputed
    ``edges`` (:func:`ring_edges`) in hot paths; scalar edge constants are
    python floats — numpy scalar·array arithmetic is the identical float64
    op sequence."""
    if edges is None:
        edges = ring_edges(ring)
    inside = np.zeros(px.shape[0], dtype=bool)
    for x1, y1, x2, y2 in edges:
        straddles = (y1 > py) != (y2 > py)
        xs = (x2 - x1) * (py - y1) / (y2 - y1) + x1
        inside ^= straddles & (px < xs)
    return inside


class GridIndex:
    """Coarse-grid polygon index: maps an internal grid cell to the candidate
    polygons whose bbox intersects it. Plays the STRtree role from the build
    plan (SURVEY.md §7.2 step 4); built once per actor in ``__init__`` of the
    PIP stage, then reused per batch.

    ``assign`` returns the polygon pid per point (-1 when none contains it),
    exploiting the partition property of the fixture layers: once a point is
    assigned, it is skipped for later polygons.
    """

    def __init__(self, layer: list[Polygon], grid: int = 64):
        self.layer = layer
        self.grid = grid
        self._edges = [ring_edges(p.ring) for p in layer]
        xs = np.concatenate([p.ring[:, 0] for p in layer])
        ys = np.concatenate([p.ring[:, 1] for p in layer])
        self.x0, self.x1 = float(xs.min()), float(xs.max())
        self.y0, self.y1 = float(ys.min()), float(ys.max())
        self.w = (self.x1 - self.x0) or 1.0
        self.h = (self.y1 - self.y0) or 1.0
        # dense candidate bitmap: (grid*grid, n_polys)
        self.bitmap = np.zeros((grid * grid, len(layer)), dtype=bool)
        for i, poly in enumerate(layer):
            bx0, by0, bx1, by1 = poly.bbox
            lo_ix = max(int((bx0 - self.x0) / self.w * grid), 0)
            hi_ix = min(int((bx1 - self.x0) / self.w * grid), grid - 1)
            lo_iy = max(int((by0 - self.y0) / self.h * grid), 0)
            hi_iy = min(int((by1 - self.y0) / self.h * grid), grid - 1)
            for iy in range(lo_iy, hi_iy + 1):
                self.bitmap[iy * grid + lo_ix:iy * grid + hi_ix + 1, i] = True
        self._build_resolved()

    def _cell_range(self, bx0, by0, bx1, by1):
        g = self.grid
        lo_ix = max(int((bx0 - self.x0) / self.w * g), 0)
        hi_ix = min(int((bx1 - self.x0) / self.w * g), g - 1)
        lo_iy = max(int((by0 - self.y0) / self.h * g), 0)
        hi_iy = min(int((by1 - self.y0) / self.h * g), g - 1)
        return lo_ix, lo_iy, hi_ix, hi_iy

    def _build_resolved(self):
        """Per-cell constant-answer table — the interior fast path.

        A grid cell whose candidate set is a SINGLE polygon P and which no
        edge of P touches has constant crossing parity over the whole cell
        (parity flips only when a path crosses an edge; the cell is convex),
        so the cell's answer is decided by its center: pid(P) if the center
        is inside, else -1 (bbox pruning already excludes every other
        polygon). Cells with no candidates resolve to -1 outright. Any
        other cell stores -2 = run the exact per-point edge tests. Exact by
        construction — every resolved answer equals what the edge loop
        would compute; the SQL-twin oracles stay bit-identical."""
        g = self.grid
        crossed = np.zeros((g * g, len(self.layer)), dtype=bool)
        for i, poly in enumerate(self.layer):
            x1 = poly.ring[:, 0]
            y1 = poly.ring[:, 1]
            x2 = np.roll(x1, -1)
            y2 = np.roll(y1, -1)
            for ex0, ey0, ex1, ey1 in zip(np.minimum(x1, x2),
                                          np.minimum(y1, y2),
                                          np.maximum(x1, x2),
                                          np.maximum(y1, y2)):
                lo_ix, lo_iy, hi_ix, hi_iy = self._cell_range(
                    ex0, ey0, ex1, ey1)
                for iy in range(lo_iy, hi_iy + 1):
                    crossed[iy * g + lo_ix:iy * g + hi_ix + 1, i] = True
        cx = self.x0 + (np.arange(g, dtype=np.float64) + 0.5) * (self.w / g)
        cy = self.y0 + (np.arange(g, dtype=np.float64) + 0.5) * (self.h / g)
        CX, CY = np.meshgrid(cx, cy)            # [iy, ix] like cell ids
        cx, cy = CX.ravel(), CY.ravel()
        n_cand = self.bitmap.sum(axis=1)
        self.resolved = np.full(g * g, -2, dtype=np.int64)
        self.resolved[n_cand == 0] = -1
        for i, poly in enumerate(self.layer):
            only = self.bitmap[:, i] & (n_cand == 1) & ~crossed[:, i]
            idx = np.flatnonzero(only)
            if idx.size == 0:
                continue
            inside = crossing_parity(cx[idx], cy[idx],
                                     edges=self._edges[i])
            self.resolved[idx] = np.where(inside, poly.pid, -1)

    def _cell_of(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        g = self.grid
        ix = np.clip(((px - self.x0) / self.w * g).astype(np.int64), 0, g - 1)
        iy = np.clip(((py - self.y0) / self.h * g).astype(np.int64), 0, g - 1)
        return iy * g + ix

    CHUNK = 32768   # keep the per-chunk working set L2-resident: measured
                    # ~5× per-core speedup vs one 600k-row pass under a full
                    # 30-actor pool (memory-bandwidth contention)

    def assign(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """→ int64 pid per point; -1 if no polygon contains it."""
        n = px.shape[0]
        if n > self.CHUNK:
            out = np.empty(n, dtype=np.int64)
            for i in range(0, n, self.CHUNK):
                out[i:i + self.CHUNK] = self.assign(px[i:i + self.CHUNK],
                                                    py[i:i + self.CHUNK])
            return out
        cell = self._cell_of(px, py)
        out = self.resolved[cell]          # fancy index → fresh array
        # resolution is valid only for points actually inside the index
        # bbox — _cell_of CLIPS outside points into border cells, whose
        # constant answer doesn't speak for them
        inb = ((px >= self.x0) & (px <= self.x1)
               & (py >= self.y0) & (py <= self.y1))
        todo = np.flatnonzero((out == -2) | ~inb)
        if todo.size == 0:
            return out
        sub = np.full(todo.size, -1, dtype=np.int64)
        cand = self.bitmap[cell[todo]]                     # (t, n_polys)
        tpx, tpy = px[todo], py[todo]
        for i, poly in enumerate(self.layer):
            rem = np.flatnonzero(cand[:, i] & (sub == -1))
            if rem.size == 0:
                continue
            inside = crossing_parity(tpx[rem], tpy[rem],
                                     edges=self._edges[i])
            sub[rem[inside]] = poly.pid
        out[todo] = sub
        return out


def sql_pip_assign(points_cte: str, key: str, edges_sql: str,
                   names_sql: str | None = None) -> str:
    """DuckDB query assigning each point of ``points_cte`` (columns
    ``{key}, x, y``) its containing polygon pid (and name when ``names_sql``
    given) via the identical crossing rule. LEFT-join semantics: points on no
    polygon surface → NULL label."""
    # parity runs over DISTINCT points: duplicate keys (e.g. repeated
    # lineitem (orderkey, linenumber) pairs in the synthetic data) would
    # double the crossing counts and flip the parity
    parity = f"""
    SELECT p.{key} AS {key}, e.pid AS pid
    FROM (SELECT DISTINCT * FROM pts) p, edges e
    WHERE e.y1 <> e.y2
    GROUP BY p.{key}, e.pid
    HAVING SUM(CASE WHEN ((e.y1 > p.y) <> (e.y2 > p.y))
                     AND (p.x < (e.x2 - e.x1) * (p.y - e.y1) / (e.y2 - e.y1) + e.x1)
               THEN 1 ELSE 0 END) % 2 = 1
    """
    base = f"WITH pts AS ({points_cte}), edges AS (SELECT * FROM {edges_sql} e(pid, x1, y1, x2, y2))"
    if names_sql is None:
        return f"{base}, hit AS ({parity}) SELECT p.{key} AS {key}, hit.pid AS pid FROM pts p LEFT JOIN hit ON p.{key} = hit.{key}"
    return (f"{base}, hit AS ({parity}) "
            f"SELECT p.{key} AS {key}, n.name AS name "
            f"FROM pts p LEFT JOIN hit ON p.{key} = hit.{key} "
            f"LEFT JOIN {names_sql} n(pid, name) ON hit.pid = n.pid")
