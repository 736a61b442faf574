"""Property tests for the later fifth-session kernels vs independent
brute-force references (random inputs — coverage beyond the fixed corpus
the oracle sweep pins)."""
from __future__ import annotations

import numpy as np
import pandas as pd


def test_running_max_two_pass_matches_brute():
    """lateness_audit's scan shape: per-partition maxima + exclusive
    accumulate seeded by the driver prefix == the serial exclusive
    running max."""
    rng = np.random.default_rng(5)
    n, width = 3000, 256
    ids = rng.permutation(n)
    t = rng.integers(0, 10**9, n)
    order = np.argsort(ids)
    ids, t = ids[order], t[order]
    # brute serial
    brute = np.empty(n, np.int64)
    acc = np.iinfo(np.int64).min
    for i in range(n):
        brute[i] = acc
        acc = max(acc, int(t[i]))
    # two-pass
    part = ids // width
    prefix, acc2 = {}, np.iinfo(np.int64).min
    for p in np.unique(part):
        prefix[int(p)] = acc2
        acc2 = max(acc2, int(t[part == p].max()))
    got = np.empty(n, np.int64)
    for p in np.unique(part):
        m = part == p
        tt = t[m]
        run = np.maximum.accumulate(tt)
        excl = np.empty(len(tt), np.int64)
        excl[0] = prefix[int(p)]
        excl[1:] = np.maximum(run[:-1], prefix[int(p)])
        got[m] = excl
    assert (got == brute).all()


def test_blocked_argmin_matches_full_matrix():
    """nearest_road_segment's memory-bounded scan: blocked running
    (min, first-argmin) == argmin over the full distance matrix,
    including ties (lowest index wins in both)."""
    rng = np.random.default_rng(9)
    n, m = 400, 333
    d2 = rng.integers(0, 50, (n, m)).astype(np.float64)  # many ties
    full = np.argmin(d2, axis=1)
    best = np.full(n, np.inf)
    bestj = np.zeros(n, np.int64)
    for s0 in range(0, m, 128):
        s1 = min(s0 + 128, m)
        blk = d2[:, s0:s1]
        jb = np.argmin(blk, axis=1)
        db = blk[np.arange(n), jb]
        upd = db < best
        best[upd] = db[upd]
        bestj[upd] = jb[upd] + s0
    assert (bestj == full).all()


def test_interarrival_bucket_boundaries():
    """searchsorted power-of-2 bucketing: gap ∈ [2^k, 2^(k+1)) → bucket k,
    exact at every boundary."""
    bounds = np.array([1 << (k + 1) for k in range(50)], dtype=np.int64)
    gaps = np.array([0, 1, 2, 3, 4, 7, 8, (1 << 20) - 1, 1 << 20,
                     (1 << 49), (1 << 50) - 1], dtype=np.int64)
    b = np.searchsorted(bounds, gaps, side="right").astype(np.int64)
    b[gaps < 1] = -1
    exp = np.array([-1, 0, 1, 1, 2, 2, 3, 19, 20, 49, 49])
    assert (b == exp).all()


def test_ivm_delta_equals_recompute():
    """Delta algebra (+insert/−delete merged into the base aggregate)
    == full recompute over the mutated logical table, on random keys."""
    rng = np.random.default_rng(21)
    keys = rng.integers(0, 500, 2000)
    cell = keys % 37                       # stand-in cell function
    ins_mask = keys % 10 == 0
    del_mask = keys % 17 == 0
    ins_cell = (keys[ins_mask] + 1000) % 37
    # recompute
    logical = np.concatenate([cell[~del_mask], ins_cell])
    exp = pd.Series(logical).value_counts().sort_index()
    # delta path
    base = pd.Series(cell).value_counts().sort_index()
    delta = (pd.Series(ins_cell).value_counts()
             .sub(pd.Series(cell[del_mask]).value_counts(), fill_value=0))
    got = base.add(delta, fill_value=0).astype(np.int64)
    got = got[got > 0]
    assert got.equals(exp.astype(np.int64))


def test_join_count_searchsorted_matches_brute():
    """join_count_stats' east/north searchsorted pairing == brute
    adjacency enumeration on a random occupied-cell set."""
    rng = np.random.default_rng(3)
    iy_shift = 29
    pts = set()
    while len(pts) < 200:
        pts.add((int(rng.integers(0, 20)), int(rng.integers(0, 20))))
    ixs = np.array([p[0] for p in sorted(pts)], np.int64)
    iys = np.array([p[1] for p in sorted(pts)], np.int64)
    cell = (iys << iy_shift) | ixs
    mark = rng.integers(0, 2, len(cell)).astype(np.int64)
    order = np.argsort(cell)
    cell, mark = cell[order], mark[order]
    ixs, iys = cell & ((1 << iy_shift) - 1), cell >> iy_shift
    # brute
    loc = {(int(x), int(y)): int(m) for x, y, m in zip(ixs, iys, mark)}
    bb = bw = ww = 0
    for (x, y), ma in loc.items():
        for nb in ((x + 1, y), (x, y + 1)):
            if nb in loc:
                mb = loc[nb]
                bb += ma == 1 and mb == 1
                bw += ma != mb
                ww += ma == 0 and mb == 0
    # searchsorted pass (the query kernel's shape)
    got = {"bb": 0, "bw": 0, "ww": 0}
    for ncell in (cell + 1, cell + (np.int64(1) << iy_shift)):
        pos = np.searchsorted(cell, ncell)
        ok = pos < len(cell)
        ok &= np.where(ok, cell[np.minimum(pos, len(cell) - 1)] == ncell,
                       False)
        # east neighbor only valid when ix+1 didn't wrap: enforced by
        # membership — a wrap lands on (0, y+1), absent unless occupied.
        ma = mark[ok]
        mb = mark[np.minimum(pos, len(cell) - 1)[ok]]
        got["bb"] += int(((ma == 1) & (mb == 1)).sum())
        got["bw"] += int((ma != mb).sum())
        got["ww"] += int(((ma == 0) & (mb == 0)).sum())
    assert (got["bb"], got["bw"], got["ww"]) == (bb, bw, ww)


def test_time_weighted_integral_matches_loop():
    rng = np.random.default_rng(13)
    n = 500
    u = rng.integers(0, 20, n)
    t = rng.integers(0, 10**8, n)
    c = rng.integers(0, 50000, n)
    df = pd.DataFrame({"u": u, "t": t, "c": c, "i": np.arange(n)})
    df = df.sort_values(["u", "t", "i"], kind="mergesort")
    # vectorized kernel (the query shape)
    uu = df["u"].to_numpy()
    tt = df["t"].to_numpy()
    cc = df["c"].to_numpy()
    has_next = np.zeros(n, bool)
    has_next[:-1] = uu[:-1] == uu[1:]
    gap = np.zeros(n, np.int64)
    gap[:-1] = tt[1:] - tt[:-1]
    gap[~has_next] = 0
    got = pd.DataFrame({"u": uu, "integral": cc * gap}) \
        .groupby("u")["integral"].sum()
    # brute loop
    exp = {}
    for uid, g in df.groupby("u"):
        tot = 0
        rows = list(g.itertuples())
        for a, b in zip(rows, rows[1:]):
            tot += a.c * (b.t - a.t)
        exp[uid] = tot
    for uid in exp:
        assert got[uid] == exp[uid]
