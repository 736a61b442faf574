"""Planar-overlay polygon engine — odd-even repair and true union in
pure numpy (no GEOS in the container).

Replaces the earlier convex-hull approximations in ``functions/geom.py``
with the actual GEOS semantics the reference relies on
(``/root/reference/pygeoapi/scripts/process_data.py:132-181`` uses
shapely ``make_valid`` / ``unary_union``):

- :func:`odd_even_rebuild` — GEOS ``make_valid`` (linework) for
  self-intersecting rings: node every crossing, trace the planar faces,
  keep those with ODD winding parity w.r.t. the original rings (the
  bowtie splits into its two triangles, exactly as GEOS).
- :func:`union_rings` — ``unary_union`` of polygon rings: overlay all
  rings, keep faces covered by ≥1 input polygon, emit boundary shells
  (CCW) with their holes (CW) — concave merges, shared-edge dissolves
  and holes all come out with true coordinates, not hulls.

Method: O(n²) segment noding (inputs are per-record geometries of tens
of vertices — no sweepline needed), node snapping on a 1e-9 grid,
half-edge face tracing by angular order (interior-on-the-left), face
classification by a sample point nudged off an edge midpoint.

Scale contract: this runs per ROW inside the normalization actor stage
(`stages/geometry.py`) — cost is bounded by single-geometry size, never
by dataset size.
"""
from __future__ import annotations

import math

import numpy as np

SNAP = 1e-9          # node-identity grid
NUDGE = 1e-7         # interior sample offset off an edge midpoint


def _snap_key(x: float, y: float) -> tuple[int, int]:
    return (round(x / SNAP), round(y / SNAP))


def _cross2(a, b) -> float:
    """2-D cross product a×b as direct scalar arithmetic — the exact
    expression ``np.cross`` evaluates (a0·b1 − a1·b0) without its
    moveaxis/broadcast machinery (~40 µs/call → ~0.5 µs: np.cross on
    scalar pairs dominated the whole geometry-repair stage, 1.5 M calls
    = 59 s of a 66 s normalize pass)."""
    return float(a[0] * b[1] - a[1] * b[0])


def _seg_params(p1, p2, p3, p4) -> list[float]:
    """Parameters t ∈ (0,1) along (p1,p2) where it meets segment (p3,p4)
    — proper crossings, T-touches, and collinear-overlap endpoints."""
    r = p2 - p1
    s = p4 - p3
    denom = _cross2(r, s)
    out: list[float] = []
    if abs(denom) > 1e-18:
        p31 = p3 - p1
        t = _cross2(p31, s) / denom
        u = _cross2(p31, r) / denom
        if -1e-12 <= t <= 1 + 1e-12 and -1e-12 <= u <= 1 + 1e-12:
            out.append(min(1.0, max(0.0, t)))
        return out
    # parallel: collinear overlap contributes the other segment's
    # endpoints projected onto (p1,p2)
    if abs(_cross2(p3 - p1, r)) > 1e-12 * max(1.0, np.abs(r).max()):
        return out
    rr = float(r @ r)
    if rr == 0.0:
        return out
    for q in (p3, p4):
        t = float((q - p1) @ r) / rr
        if 1e-12 < t < 1 - 1e-12:
            out.append(t)
    return out


def _node_rings(rings: list[np.ndarray]):
    """Split every ring edge at every intersection with any other edge.
    Returns (nodes (m,2) array, set of undirected node-index edges)."""
    segs = []
    for ring in rings:
        ring = np.asarray(ring, dtype=np.float64)
        for i in range(len(ring) - 1):
            if not np.array_equal(ring[i], ring[i + 1]):
                segs.append((ring[i], ring[i + 1]))

    node_ix: dict[tuple[int, int], int] = {}
    nodes: list[np.ndarray] = []

    def nid(pt: np.ndarray) -> int:
        k = _snap_key(float(pt[0]), float(pt[1]))
        if k not in node_ix:
            node_ix[k] = len(nodes)
            nodes.append(pt)
        return node_ix[k]

    edges: set[tuple[int, int]] = set()
    for i, (p1, p2) in enumerate(segs):
        ts = [0.0, 1.0]
        for j, (p3, p4) in enumerate(segs):
            if i == j:
                continue
            ts.extend(_seg_params(p1, p2, p3, p4))
        ts = sorted(set(ts))
        pts = [p1 + t * (p2 - p1) for t in ts]
        ids = [nid(p) for p in pts]
        for a, b in zip(ids, ids[1:]):
            if a != b:
                edges.add((min(a, b), max(a, b)))
    return np.asarray(nodes), edges


def _trace_cycles(nodes: np.ndarray, edges: set[tuple[int, int]]):
    """Half-edge face tracing: every directed edge belongs to exactly one
    cycle; successor = the most-clockwise outgoing edge at the head
    (interior of each traced cycle lies on its LEFT)."""
    out_edges: dict[int, list[tuple[float, int]]] = {}
    for a, b in edges:
        va = nodes[b] - nodes[a]
        out_edges.setdefault(a, []).append(
            (math.atan2(va[1], va[0]), b))
        out_edges.setdefault(b, []).append(
            (math.atan2(-va[1], -va[0]), a))
    for v in out_edges.values():
        v.sort()

    def nxt(a: int, b: int) -> tuple[int, int]:
        # arriving a→b: leave b by the edge clockwise-next from (b→a)
        cand = out_edges[b]
        back = math.atan2(nodes[a][1] - nodes[b][1],
                          nodes[a][0] - nodes[b][0])
        # strictly smaller angle than `back`, wrapping (clockwise order)
        idx = None
        for i, (ang, _) in enumerate(cand):
            if ang < back - 1e-15:
                idx = i
        if idx is None:
            idx = len(cand) - 1
        return b, cand[idx][1]

    unused: set[tuple[int, int]] = set()
    for a, b in edges:
        unused.add((a, b))
        unused.add((b, a))
    cycles = []
    while unused:
        start = next(iter(unused))
        cyc = [start]
        unused.discard(start)
        cur = start
        while True:
            cur = nxt(*cur)
            if cur == start:
                break
            cyc.append(cur)
            unused.discard(cur)
        cycles.append([c[0] for c in cyc])
    return cycles


def _ring_area(pts: np.ndarray) -> float:
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def _sample_point(nodes: np.ndarray, cyc: list[int], ccw: bool) -> np.ndarray:
    """A point just inside the cycle: midpoint of its LONGEST edge nudged
    along the interior-side normal (left of travel for CCW)."""
    best, best_len = None, -1.0
    for a, b in zip(cyc, cyc[1:] + cyc[:1]):
        e = nodes[b] - nodes[a]
        ln = float(np.hypot(*e))
        if ln > best_len:
            best_len, best = ln, (a, b)
    a, b = best
    e = nodes[b] - nodes[a]
    n = np.array([-e[1], e[0]]) / (best_len or 1.0)   # left normal
    return (nodes[a] + nodes[b]) / 2.0 + NUDGE * max(1.0, best_len) * n


def _crossings(pt: np.ndarray, rings: list[np.ndarray]) -> int:
    """Ray-crossing count of pt against all ring edges (odd = inside)."""
    cnt = 0
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        x1, y1 = r[:-1, 0], r[:-1, 1]
        x2, y2 = r[1:, 0], r[1:, 1]
        cond = (y1 > pt[1]) != (y2 > pt[1])
        with np.errstate(divide="ignore", invalid="ignore"):
            xs = x1 + (pt[1] - y1) * (x2 - x1) / (y2 - y1)
        cnt += int(np.count_nonzero(cond & (pt[0] < xs)))
    return cnt


def _inside_any(pt: np.ndarray, polys: list[list[np.ndarray]]) -> bool:
    """Odd-even membership in ANY polygon (each polygon = list of rings,
    holes included in the parity)."""
    return any(_crossings(pt, rings) % 2 == 1 for rings in polys)


def _point_in_ring(pt: np.ndarray, ring: np.ndarray) -> bool:
    return _crossings(pt, [ring]) % 2 == 1


def _inner_point(ring: np.ndarray) -> np.ndarray:
    """A point strictly inside the region a closed ring encloses (tries
    both normals off the longest edge's midpoint)."""
    best, best_len = None, -1.0
    for a, b in zip(ring[:-1], ring[1:]):
        ln = float(np.hypot(*(b - a)))
        if ln > best_len:
            best_len, best = ln, (a, b)
    a, b = best
    e = b - a
    n = np.array([-e[1], e[0]]) / (best_len or 1.0)
    mid = (a + b) / 2.0
    for s in (1.0, -1.0):
        cand = mid + s * NUDGE * max(1.0, best_len) * n
        if _point_in_ring(cand, ring):
            return cand
    return ring[:-1].mean(axis=0)


def _assemble(nodes: np.ndarray, kept: list[tuple[list[int], bool]]):
    """Kept cycles → list of (shell, [holes]): CCW cycles are shells, CW
    cycles are holes assigned to the smallest containing shell.
    Deterministic order: shells sorted by (minx, miny) of their ring."""
    shells, holes = [], []
    for cyc, ccw in kept:
        ring = np.vstack([nodes[cyc], nodes[cyc[:1]]])
        (shells if ccw else holes).append(ring)

    def keyfn(r):
        return (float(r[:, 0].min()), float(r[:, 1].min()),
                float(r[:, 0].max()), float(r[:, 1].max()))

    shells.sort(key=keyfn)
    out = [(s, []) for s in shells]
    for h in holes:
        pt = _inner_point(h)
        best_i, best_area = None, None
        for i, (s, _) in enumerate(out):
            if _point_in_ring(pt, s):
                a = abs(_ring_area(s[:-1]))
                if best_area is None or a < best_area:
                    best_i, best_area = i, a
        if best_i is not None:
            out[best_i][1].append(h)
    return out


def _canonical_ring(ring: np.ndarray, ccw: bool) -> np.ndarray:
    """Closed ring → canonical form: drop the duplicate closing vertex,
    rotate so the lexicographically-smallest vertex leads, re-close, and
    orient (CCW shells, CW holes)."""
    pts = ring[:-1] if np.array_equal(ring[0], ring[-1]) else ring
    if (_ring_area(pts) > 0) != ccw:
        pts = pts[::-1]
    i = int(np.lexsort((pts[:, 1], pts[:, 0]))[0])
    pts = np.vstack([pts[i:], pts[:i]])
    return np.vstack([pts, pts[:1]])


def _overlay(rings: list[np.ndarray], keep_pred):
    """Overlay → region extraction: trace every face cycle, classify it
    with ``keep_pred`` on an interior sample, keep only the BOUNDARY
    half-edges (kept face on the left, discarded on the right), and
    re-trace rings over that subgraph — adjacent kept faces merge, their
    shared edges dissolve (the unary_union behavior)."""
    nodes, edges = _node_rings(rings)
    if not edges:
        return []
    cycles = _trace_cycles(nodes, edges)
    face_of: dict[tuple[int, int], int] = {}
    kept: list[bool] = []
    for ci, cyc in enumerate(cycles):
        for a, b in zip(cyc, cyc[1:] + cyc[:1]):
            face_of[(a, b)] = ci
        pts = nodes[np.asarray(cyc)]
        area = _ring_area(pts) if len(cyc) >= 3 else 0.0
        if abs(area) < 1e-18:
            kept.append(False)
            continue
        sample = _sample_point(nodes, cyc, area > 0)
        kept.append(bool(keep_pred(sample)))
    boundary = {(a, b) for (a, b), ci in face_of.items()
                if kept[ci] and not kept[face_of[(b, a)]]}
    if not boundary:
        return []

    out_edges: dict[int, list[tuple[float, int]]] = {}
    for a, b in boundary:
        v = nodes[b] - nodes[a]
        out_edges.setdefault(a, []).append((math.atan2(v[1], v[0]), b))
    for v in out_edges.values():
        v.sort()

    def nxt(a: int, b: int) -> tuple[int, int]:
        cand = out_edges[b]
        back = math.atan2(nodes[a][1] - nodes[b][1],
                          nodes[a][0] - nodes[b][0])
        idx = None
        for i, (ang, _) in enumerate(cand):
            if ang < back - 1e-15:
                idx = i
        if idx is None:
            idx = len(cand) - 1
        return b, cand[idx][1]

    unused = set(boundary)
    kept_rings: list[tuple[list[int], bool]] = []
    while unused:
        start = next(iter(unused))
        cyc = [start]
        unused.discard(start)
        cur = start
        while True:
            cur = nxt(*cur)
            if cur == start:
                break
            cyc.append(cur)
            unused.discard(cur)
        ids = [c[0] for c in cyc]
        if len(ids) >= 3:
            kept_rings.append((ids, _ring_area(nodes[np.asarray(ids)]) > 0))

    polys = _assemble(nodes, kept_rings)
    return [(_canonical_ring(s, True),
             [_canonical_ring(h, False) for h in hs]) for s, hs in polys]


def odd_even_rebuild(rings: list[np.ndarray]):
    """GEOS make_valid (linework) for one polygon's rings: faces with odd
    crossing parity w.r.t. the original linework survive. Returns a list
    of (shell, holes) — one entry per output polygon."""
    closed = [np.asarray(r, dtype=np.float64) for r in rings]
    closed = [r if np.array_equal(r[0], r[-1]) else np.vstack([r, r[:1]])
              for r in closed]
    return _overlay(closed, lambda pt: _crossings(pt, closed) % 2 == 1)


def union_rings(polys: list[list[np.ndarray]]):
    """unary_union of polygons (each a list of rings, shell first):
    faces inside ≥1 input survive. Returns a list of (shell, holes)."""
    closed_polys = []
    flat = []
    for rings in polys:
        cp = []
        for r in rings:
            r = np.asarray(r, dtype=np.float64)
            if not np.array_equal(r[0], r[-1]):
                r = np.vstack([r, r[:1]])
            cp.append(r)
            flat.append(r)
        closed_polys.append(cp)
    return _overlay(flat, lambda pt: _inside_any(pt, closed_polys))
