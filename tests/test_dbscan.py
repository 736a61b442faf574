"""Planted-fixture DBSCAN semantics tests (stages/dbscan.py).

A hand-built point field with known answers: two dense clusters, a
border point reachable from one of them, an isolated noise point, and a
chain that links two would-be groups through a shared core point.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from laji_pygeoapi_ray.stages.dbscan import dbscan

EPS = 100  # micro-units
MIN = 3


def _run(pts: dict[int, tuple[int, int]], *, eps_u=EPS, minpts=MIN):
    ids = sorted(pts)
    t = pa.table({
        "id": pa.array(ids, pa.int64()),
        "qx": pa.array([pts[i][0] for i in ids], pa.int64()),
        "qy": pa.array([pts[i][1] for i in ids], pa.int64()),
    })
    ds = ray.data.from_arrow(t)
    out = dbscan(ds, eps_u=eps_u, minpts=minpts, num_buckets=4).to_pandas()
    return out.set_index("id").sort_index()


def test_two_clusters_border_and_noise():
    # cluster A: 3 mutual-eps points around origin → all core, label=min id
    # cluster B: 3 points far away → all core
    # border: within eps of ONE core point of A, but only 2 neighbors
    #         (itself + that core) → not core, labeled A
    # noise: far from everything
    pts = {
        1: (0, 0), 2: (50, 0), 3: (0, 50),          # A (pairwise ≤ 100)
        10: (100_000, 0), 11: (100_050, 0), 12: (100_000, 50),  # B
        5: (0, 140),        # border: within eps of 3 only (d=90)
        99: (500_000, 500_000),  # noise
    }
    out = _run(pts)
    assert out.loc[[1, 2, 3], "is_core"].all()
    assert out.loc[[10, 11, 12], "is_core"].all()
    assert not out.loc[5, "is_core"] and not out.loc[99, "is_core"]
    assert set(out.loc[[1, 2, 3], "cluster_id"]) == {1}
    assert set(out.loc[[10, 11, 12], "cluster_id"]) == {10}
    assert out.loc[5, "cluster_id"] == 1      # border joins A
    assert out.loc[99, "cluster_id"] == -1    # noise
    # neighbor counts are exact (self included)
    assert out.loc[1, "n_in_eps"] == 3
    assert out.loc[5, "n_in_eps"] == 2


def test_chain_merges_through_shared_core():
    # two triangles linked by a middle point that is core (sees 2+2 ends
    # ≥ minpts) → ONE component
    pts = {
        1: (0, 0), 2: (60, 0), 3: (0, 60),
        7: (120, 0),                      # bridge: sees 2, 8 (+self)
        8: (180, 0), 9: (240, 0), 10: (180, 60),
    }
    out = _run(pts)
    assert out["is_core"].loc[[1, 2, 3, 7, 8, 9, 10]].all()
    assert set(out["cluster_id"]) == {1}


def test_border_takes_min_label_when_two_clusters_reach():
    # border point within eps of cores from two different clusters takes
    # the MIN cluster label (deterministic tie rule)
    pts = {
        1: (0, 0), 2: (-60, 0), 3: (0, -60),       # cluster 1
        20: (200, 0), 21: (260, 0), 22: (200, 60),  # cluster 20
        15: (100, 0),  # within eps of 1 (d=100) and 20 (d=100); n=3 BUT
                       # its neighbors: 1, 20, self → core actually!
    }
    out = _run(pts)
    # 15 sees {self, 1, 20} = 3 ≥ minpts → core, so it MERGES the clusters
    assert out.loc[15, "is_core"]
    assert set(out["cluster_id"]) == {1}
    # shrink its reach: move it so it reaches only cluster-1's core + one
    # non-core-making distance — make it a genuine border of both
    pts2 = {
        1: (0, 0), 2: (-60, 0), 3: (0, -60),
        20: (200, 0), 21: (260, 0), 22: (200, 60),
        15: (100, 0),
    }
    out2 = _run(pts2, minpts=4)  # raise minPts: 15 (n=3) is now border
    assert not out2.loc[15, "is_core"]
    # minPts=4 cores: 1 sees {self,2,3,15}=4 and 20 sees {self,21,22,15}=4;
    # 2,3 (n=3) and 21,22 (n≤3) are borders of their core. 15 borders BOTH
    # singleton-core clusters {1} and {20} → MIN label = 1.
    assert out2.loc[1, "is_core"] and out2.loc[20, "is_core"]
    assert not out2.loc[[2, 3, 21, 22], "is_core"].any()
    assert out2.loc[15, "cluster_id"] == 1
    assert out2.loc[21, "cluster_id"] == 20
    assert out2.loc[22, "cluster_id"] == 20
    assert out2.loc[2, "cluster_id"] == 1
    assert out2.loc[3, "cluster_id"] == 1


def test_grid_boundary_pairs_found_once():
    # points straddling a cell boundary (cell width = 2*eps = 200):
    # qx=199 and qx=201 are in different cells but within eps
    pts = {1: (199, 0), 2: (201, 0), 3: (199, 80)}
    out = _run(pts)
    assert out["is_core"].all()
    assert set(out["cluster_id"]) == {1}
    assert (out["n_in_eps"] == 3).all()


def test_exact_eps_boundary_inclusive():
    # d == eps exactly is INSIDE (<=), matching the SQL twin: 2 and 3 are
    # each exactly eps from 1 (but 2-3 are √2·eps apart), so 1 is the only
    # core and 2, 3 join as its borders.
    pts = {1: (0, 0), 2: (100, 0), 3: (0, 100)}
    out = _run(pts)
    assert list(out["n_in_eps"]) == [3, 2, 2]
    assert list(out["is_core"]) == [True, False, False]
    assert set(out["cluster_id"]) == {1}
