"""Douglas–Peucker polyline simplification (trajectory compaction).

The movement-data sibling of the raster operators: reduce each ordered
point sequence to the subset of vertices that keeps every dropped point
within ``tol`` of the kept polyline. Runs per key inside ONE bucketed
shuffle (trajectories are key-local by definition); the recursion is an
explicit stack over numpy segment slices — the per-split distance scan
is vectorized, no per-point Python.

Determinism: splits pick the FIRST index attaining the maximum
perpendicular distance (np.argmax); all arithmetic is float64 on one
worker per trajectory, so results are machine-independent. The
simplification property itself (every dropped vertex within ``tol`` of
the kept chain, endpoints kept) is re-MEASURED on the output and
returned as boolean gates — the decode-verify trust model for operators
whose output has no SQL twin.
"""
from __future__ import annotations

import numpy as np


def _seg_dist(px, py, ax, ay, bx, by):
    """Perpendicular (segment) distance of points P to segment A→B."""
    dx, dy = bx - ax, by - ay
    ll = dx * dx + dy * dy
    if ll == 0.0:
        return np.hypot(px - ax, py - ay)
    t = ((px - ax) * dx + (py - ay) * dy) / ll
    t = np.clip(t, 0.0, 1.0)
    return np.hypot(px - (ax + t * dx), py - (ay + t * dy))


def douglas_peucker_mask(x: np.ndarray, y: np.ndarray,
                         tol: float) -> np.ndarray:
    """Boolean keep-mask of the Douglas–Peucker simplification."""
    n = len(x)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        d = _seg_dist(x[a + 1:b], y[a + 1:b], x[a], y[a], x[b], y[b])
        i = int(np.argmax(d))                    # FIRST max → deterministic
        if d[i] > tol:
            m = a + 1 + i
            keep[m] = True
            stack.append((a, m))
            stack.append((m, b))
    return keep


def verify_simplification(x, y, keep: np.ndarray, tol: float) -> bool:
    """Measured gate: every dropped vertex within ``tol`` of the kept
    polyline (checked against its enclosing kept segment — the DP
    invariant), endpoints kept."""
    n = len(x)
    if n == 0:
        return True
    if not (keep[0] and keep[-1]):
        return False
    kidx = np.flatnonzero(keep)
    ok = True
    for a, b in zip(kidx[:-1], kidx[1:]):
        if b - a < 2:
            continue
        d = _seg_dist(x[a + 1:b], y[a + 1:b], x[a], y[a], x[b], y[b])
        ok &= bool((d <= tol).all())
    return ok
