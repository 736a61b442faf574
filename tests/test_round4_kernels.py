"""Property tests for the round-4 third-session kernels, each against an
INDEPENDENT reference implementation (not the SQL twins — those are
exercised by the oracle sweep):

- segment×cell SAT predicate (segment_cell_density) vs an exact
  Fraction-based Liang–Barsky clipper;
- the distributed ntile bucket formula vs DuckDB's window ntile;
- rendezvous hashing's consistency property (removing a shard moves
  ONLY that shard's keys) on the real mix64 kernel;
- the Knox 1-D ghost-bucket temporal pair count vs brute force,
  including boundary ties at exactly τ.
"""
from __future__ import annotations

from fractions import Fraction

import duckdb
import numpy as np


# ---------------------------------------------------------------- SAT pred
def _sat_intersects(x1, y1, x2, y2, bx0, by0, bx1, by1) -> bool:
    """The engine predicate: bbox overlap (assumed pre-filtered by the
    candidate enumeration — asserted here) + supporting-line corner test."""
    assert min(x1, x2) <= bx1 and max(x1, x2) >= bx0
    assert min(y1, y2) <= by1 and max(y1, y2) >= by0
    dx, dy = x2 - x1, y2 - y1
    cs = [dx * (yy - y1) - dy * (xx - x1)
          for xx in (bx0, bx1) for yy in (by0, by1)]
    return min(cs) <= 0 <= max(cs)


def _liang_barsky(x1, y1, x2, y2, bx0, by0, bx1, by1) -> bool:
    """Exact rational clipping reference (closed segment, closed box)."""
    dx, dy = x2 - x1, y2 - y1
    t0, t1 = Fraction(0), Fraction(1)
    for p, q0, q1 in ((dx, bx0 - x1, bx1 - x1), (dy, by0 - y1, by1 - y1)):
        if p == 0:
            if q0 > 0 or q1 < 0:
                return False
        else:
            ta, tb = Fraction(q0, p), Fraction(q1, p)
            if ta > tb:
                ta, tb = tb, ta
            t0, t1 = max(t0, ta), min(t1, tb)
            if t0 > t1:
                return False
    return True


def test_segment_cell_sat_predicate_matches_exact_clipping():
    rng = np.random.default_rng(42)
    CW = 10
    n_checked = 0
    for _ in range(4000):
        x1, y1, x2, y2 = (int(v) for v in rng.integers(-25, 26, 4))
        # every candidate cell in the segment's bbox cover (the engine
        # enumerates exactly these)
        for cx in range(min(x1, x2) // CW, max(x1, x2) // CW + 1):
            for cy in range(min(y1, y2) // CW, max(y1, y2) // CW + 1):
                got = _sat_intersects(x1, y1, x2, y2, cx * CW, cy * CW,
                                      (cx + 1) * CW, (cy + 1) * CW)
                want = _liang_barsky(x1, y1, x2, y2, cx * CW, cy * CW,
                                     (cx + 1) * CW, (cy + 1) * CW)
                assert got == want, ((x1, y1, x2, y2), (cx, cy))
                n_checked += 1
    assert n_checked > 10000


def test_segment_cell_sat_corner_touch_counts_in_all_touched_cells():
    # segment ending exactly at a lattice corner touches 4 cells
    for cx in (-1, 0):
        for cy in (-1, 0):
            assert _sat_intersects(0, 0, 5, 5, cx * 10, cy * 10,
                                   (cx + 1) * 10, (cy + 1) * 10) \
                == _liang_barsky(0, 0, 5, 5, cx * 10, cy * 10,
                                 (cx + 1) * 10, (cy + 1) * 10)


# ---------------------------------------------------------------- ntile
def _bucket_from_rank(rank: np.ndarray, n: int, b: int) -> np.ndarray:
    q, rem = divmod(n, b)
    head = rem * (q + 1)
    return np.where(rank < head, rank // max(q + 1, 1),
                    rem + (rank - head) // max(q, 1)) + 1


def test_ntile_bucket_formula_matches_duckdb_window():
    rng = np.random.default_rng(7)
    con = duckdb.connect()
    for n in (1, 2, 15, 16, 17, 100, 257):
        for b in (1, 3, 16):
            vals = rng.integers(0, 50, n)
            con.sql("DROP TABLE IF EXISTS t")
            con.sql("CREATE TABLE t AS SELECT unnest(range(%d)) AS id" % n)
            con.sql("ALTER TABLE t ADD COLUMN v BIGINT")
            con.executemany("UPDATE t SET v = ? WHERE id = ?",
                            [(int(v), int(i)) for i, v in enumerate(vals)])
            want = con.sql(
                f"SELECT id, ntile({b}) OVER (ORDER BY v, id) FROM t"
            ).fetchall()
            order = np.lexsort((np.arange(n), vals))
            rank = np.empty(n, np.int64)
            rank[order] = np.arange(n)
            got = dict(zip(range(n), _bucket_from_rank(rank, n, b)))
            for rid, w in want:
                assert got[rid] == w, (n, b, rid)


# ---------------------------------------------------------------- HRW
def test_rendezvous_removing_a_shard_moves_only_its_keys():
    from laji_pygeoapi_ray.functions import textkernels as tk

    ids = np.arange(5000, dtype=np.int64)
    S = 8

    def assign(n_shards: int) -> np.ndarray:
        z = ids[:, None] * np.int64(S) + np.arange(n_shards,
                                                   dtype=np.int64)[None, :]
        h = tk.mix64(z.astype(np.uint64).ravel()).reshape(len(ids),
                                                          n_shards)
        return np.argmax(h, axis=1)

    full = assign(S)
    reduced = assign(S - 1)      # shard S-1 removed
    moved = full != reduced
    # keys not on the removed shard keep their assignment
    assert not moved[full != S - 1].any()
    # the removed shard's keys all moved somewhere valid
    assert (reduced[full == S - 1] < S - 1).all()
    # balance sanity: every shard gets within 3x of fair share
    counts = np.bincount(full, minlength=S)
    assert counts.min() > len(ids) / (3 * S)


# ---------------------------------------------------------------- Knox 1-D
def _ghost_bucket_pair_count(ts: np.ndarray, ids: np.ndarray,
                             tau: int) -> int:
    """The engine's 1-D cogroup: home bucket + previous-bucket ghost,
    per-bucket (t, id) sort + searchsorted successor counts over HOME
    rows only."""
    b = ts // tau
    bucket = np.concatenate([b, b - 1])
    tt = np.concatenate([ts, ts])
    ii = np.concatenate([ids, ids])
    home = np.concatenate([np.ones(len(ts), bool), np.zeros(len(ts), bool)])
    total = 0
    for bk in np.unique(bucket):
        m = bucket == bk
        order = np.lexsort((ii[m], tt[m]))
        ts_s = tt[m][order]
        hm_s = home[m][order]
        rank = np.arange(len(ts_s))
        hi = np.searchsorted(ts_s, ts_s + tau, side="right")
        total += int((hi - rank - 1)[hm_s].sum())
    return total


def test_knox_temporal_count_matches_brute_force():
    rng = np.random.default_rng(11)
    for trial in range(50):
        n = int(rng.integers(2, 120))
        tau = int(rng.integers(3, 40))
        # cluster timestamps on a tau/2 lattice so many pairs land exactly
        # ON the tau boundary, and force exact duplicates
        ts = (rng.integers(0, 40, n).astype(np.int64) * (tau // 2 + 1))
        ts[rng.random(n) < 0.3] = ts[0]
        ids = np.arange(n, dtype=np.int64)
        brute = 0
        for i in range(n):
            for j in range(i + 1, n):
                if abs(int(ts[i]) - int(ts[j])) <= tau:
                    brute += 1
        assert _ghost_bucket_pair_count(ts, ids, tau) == brute, (trial, n)


def test_knox_temporal_count_boundary_exact_tau():
    ts = np.array([0, 5, 10, 15, 20], np.int64)   # gaps exactly tau/2
    ids = np.arange(5, dtype=np.int64)
    tau = 10
    # pairs within 10: (0,5),(0,10),(5,10),(5,15),(10,15),(10,20),(15,20)
    assert _ghost_bucket_pair_count(ts, ids, tau) == 7
