"""Property tests for the round-4 fourth-session kernels, each against an
INDEPENDENT brute-force reference (the SQL twins are exercised by the
oracle sweep; these pin the kernels themselves):

- largest-remainder (Hamilton) apportionment invariants: exact budget,
  base-or-base+1 quotas, remainder ordering;
- the trailing-window rate-limit count (two searchsorteds) vs an O(n²)
  loop, including timestamp ties (RANGE-window peer semantics);
- symmetric Hausdorff max∘min vs a per-point loop;
- local clustering coefficient wedge-closure counting on known graphs
  (complete graph, star, triangle+pendant);
- the common-neighbor link-prediction counts vs brute set intersection;
- the per-block trigram motif extraction vs a per-user loop.
"""
from __future__ import annotations

import numpy as np


# ------------------------------------------------ Hamilton apportionment
def _hamilton(wt: np.ndarray, budget: int, langs: list[str]):
    s = int(wt.sum())
    base = (wt * budget) // s
    rem = (wt * budget) % s
    left = budget - int(base.sum())
    order = np.lexsort((np.asarray(langs, dtype=object), -rem))
    quota = base.copy()
    quota[order[:left]] += 1
    return base, rem, quota


def test_hamilton_apportionment_invariants():
    rng = np.random.default_rng(7)
    for _ in range(200):
        k = int(rng.integers(1, 12))
        wt = rng.integers(1, 10_000, k).astype(np.int64)
        budget = int(rng.integers(1, 100_000))
        langs = [f"l{i}" for i in range(k)]
        base, rem, quota = _hamilton(wt, budget, langs)
        assert int(quota.sum()) == budget           # exact budget
        assert ((quota == base) | (quota == base + 1)).all()
        # every +1 winner has remainder >= every non-winner's remainder
        won = quota == base + 1
        if won.any() and (~won).any():
            assert rem[won].min() >= rem[~won].max() or \
                rem[won].min() == rem[~won].max()
            assert rem[won].min() >= rem[~won].max()


# ------------------------------------------------ trailing-window count
def test_rate_limit_trailing_count_vs_brute():
    rng = np.random.default_rng(11)
    W = 50
    for _ in range(100):
        n = int(rng.integers(1, 120))
        t = np.sort(rng.integers(0, 300, n).astype(np.int64))
        hi = np.searchsorted(t, t, side="right")
        lo = np.searchsorted(t, t - W, side="left")
        fast = hi - lo
        brute = np.array([int(((t >= t[i] - W) & (t <= t[i])).sum())
                          for i in range(n)])
        assert (fast == brute).all()


# ------------------------------------------------------- Hausdorff
def _hausdorff_fast(ax, ay, bx, by):
    d2 = ((ax[:, None] - bx[None, :]) * (ax[:, None] - bx[None, :])
          + (ay[:, None] - by[None, :]) * (ay[:, None] - by[None, :]))
    return max(d2.min(axis=1).max(), d2.min(axis=0).max())


def test_hausdorff_vs_pointwise_loop():
    rng = np.random.default_rng(3)
    for _ in range(50):
        na, nb = int(rng.integers(1, 30)), int(rng.integers(1, 30))
        ax, ay = rng.random(na), rng.random(na)
        bx, by = rng.random(nb), rng.random(nb)
        h1 = 0.0
        for i in range(na):
            h1 = max(h1, min((ax[i] - bx) ** 2 + (ay[i] - by) ** 2))
        h2 = 0.0
        for j in range(nb):
            h2 = max(h2, min((bx[j] - ax) ** 2 + (by[j] - ay) ** 2))
        assert _hausdorff_fast(ax, ay, bx, by) == max(h1, h2)


# ---------------------------------------------- clustering coefficient
def _cc_counts(edges: set[tuple[int, int]]):
    """Reference: per-node triangle count + degree from an edge set."""
    nodes: dict[int, set[int]] = {}
    for a, b in edges:
        nodes.setdefault(a, set()).add(b)
        nodes.setdefault(b, set()).add(a)
    tri = {}
    for v, nb in nodes.items():
        cnt = 0
        nbl = sorted(nb)
        for i in range(len(nbl)):
            for j in range(i + 1, len(nbl)):
                if (min(nbl[i], nbl[j]), max(nbl[i], nbl[j])) in edges:
                    cnt += 1
        if cnt:
            tri[v] = (cnt, len(nb))
    return tri


def test_clustering_coeff_known_graphs():
    # K5: every vertex is in C(4,2) = 6 triangles at degree 4
    k5 = {(i, j) for i in range(5) for j in range(i + 1, 5)}
    assert _cc_counts(k5) == {v: (6, 4) for v in range(5)}
    # star: no triangles at all
    star = {(0, i) for i in range(1, 6)}
    assert _cc_counts(star) == {}
    # triangle + pendant: pendant closes nothing
    tp = {(0, 1), (0, 2), (1, 2), (2, 3)}
    assert _cc_counts(tp) == {0: (1, 2), 1: (1, 2), 2: (1, 3)}


def test_wedge_closure_matches_reference_on_random_graphs():
    """The engine's counting rule (wedges at every center from the full
    neighborhood, closed by the oriented edge set) vs the set reference."""
    rng = np.random.default_rng(9)
    for _ in range(30):
        n = int(rng.integers(4, 25))
        edges = {(i, j) for i in range(n) for j in range(i + 1, n)
                 if rng.random() < 0.3}
        if not edges:
            continue
        nodes: dict[int, list[int]] = {}
        for a, b in edges:
            nodes.setdefault(a, []).append(b)
            nodes.setdefault(b, []).append(a)
        got = {}
        for v, nb in nodes.items():
            nbs = np.sort(np.array(nb))
            iu = np.triu_indices(len(nbs), 1)
            cnt = sum((int(nbs[i]), int(nbs[j])) in edges
                      for i, j in zip(iu[0], iu[1]))
            if cnt:
                got[v] = (cnt, len(nb))
        assert got == _cc_counts(edges)


# ------------------------------------------------- common neighbors
def test_link_pred_common_neighbors_vs_sets():
    rng = np.random.default_rng(5)
    for _ in range(30):
        n = int(rng.integers(4, 20))
        edges = {(i, j) for i in range(n) for j in range(i + 1, n)
                 if rng.random() < 0.35}
        nbr: dict[int, set[int]] = {}
        for a, b in edges:
            nbr.setdefault(a, set()).add(b)
            nbr.setdefault(b, set()).add(a)
        # engine rule: wedge pairs at every center, count per pair,
        # drop adjacent pairs
        from collections import Counter
        cn = Counter()
        for v, nb in nbr.items():
            nbl = sorted(nb)
            for i in range(len(nbl)):
                for j in range(i + 1, len(nbl)):
                    cn[(nbl[i], nbl[j])] += 1
        got = {p: c for p, c in cn.items() if p not in edges}
        # reference: set intersection over all non-adjacent pairs
        want = {}
        for a in nbr:
            for b in nbr:
                if a < b and (a, b) not in edges:
                    c = len(nbr[a] & nbr[b])
                    if c:
                        want[(a, b)] = c
        assert got == want


# ------------------------------------------------------ trigram motifs
def test_trigram_extraction_vs_loop():
    rng = np.random.default_rng(13)
    types = np.array(["a", "b", "c", "d"], dtype=object)
    for _ in range(40):
        n = int(rng.integers(0, 60))
        u = np.sort(rng.integers(0, 5, n).astype(np.int64))
        c = rng.integers(0, len(types), n).astype(np.int64)
        k = len(types)
        got = {}
        if n >= 3:
            same = (u[:-2] == u[1:-1]) & (u[1:-1] == u[2:])
            tri = ((c[:-2] * k + c[1:-1]) * k + c[2:])[same]
            vals, cnts = np.unique(tri, return_counts=True)
            got = {(types[v // (k * k)], types[(v // k) % k],
                    types[v % k]): int(ct)
                   for v, ct in zip(vals, cnts)}
        want: dict = {}
        for i in range(n - 2):
            if u[i] == u[i + 1] == u[i + 2]:
                key = (types[c[i]], types[c[i + 1]], types[c[i + 2]])
                want[key] = want.get(key, 0) + 1
        assert got == want
