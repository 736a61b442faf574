"""kNN / ANN tests: oracle parity, cogroup-vs-broadcast agreement, LSH recall."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data

from tests.conftest import SF_UNIT, assert_query_matches_oracle


@pytest.mark.parametrize("name", ["knn_nearest_occurrence", "ann_topk_dot"])
def test_query_matches_oracle(name):
    assert_query_matches_oracle(name, SF_UNIT)


def test_knn_cell_cogroup_matches_broadcast():
    from laji_pygeoapi_ray.pipelines.knn_queries import (_points_ds,
                                                         _query_points)
    from laji_pygeoapi_ray.stages.knn import knn_broadcast, knn_cell_cogroup

    pts = _points_ds(SF_UNIT)
    qdf = _query_points(SF_UNIT)
    exact = knn_broadcast(pts, qdf, 5).to_pandas()
    qds = ray.data.from_pandas(qdf)
    cg = knn_cell_cogroup(_points_ds(SF_UNIT), qds, res=3, k=5,
                          ring=1, num_buckets=8).to_pandas()
    key = ["query_id", "rank"]
    exact = exact.sort_values(key).reset_index(drop=True)
    cg = cg.sort_values(key).reset_index(drop=True)
    # res-3 cells (~1.5°) are wide vs kth-neighbor distances: ring-1 exact
    assert len(cg) == len(exact)
    agree = (exact["neighbor_id"].to_numpy() == cg["neighbor_id"].to_numpy())
    assert agree.mean() >= 0.99, agree.mean()


def test_lsh_ann_recall():
    from laji_pygeoapi_ray.pipelines.ann_queries import _queries_df
    from laji_pygeoapi_ray.stages.ann import ann_topk_broadcast, ann_topk_lsh

    emb = pq.read_table(f"{SF_UNIT}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    qdf = _queries_df(SF_UNIT)
    ds = ray.data.read_parquet(f"{SF_UNIT}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    exact = ann_topk_broadcast(ds, qdf, 5).to_pandas()
    qds = ray.data.from_pandas(qdf)
    approx = ann_topk_lsh(emb, qds, 5, n_bits=4, n_tables=16).to_pandas()
    recalls = []
    for qid, g in exact.groupby("query_id"):
        got = set(approx[approx["query_id"] == qid]["neighbor_id"])
        recalls.append(len(got & set(g["neighbor_id"])) / len(g))
    assert np.mean(recalls) >= 0.8, recalls  # 4-bit codes × 16 tables: 0.96


def test_knn_cell_exact_equals_broadcast_even_at_fine_res():
    """At res 7 with ring 1 the plain cogroup MISSES neighbors on the
    sparse sf0.001 points; the certified-radius fallback must repair it to
    exact equality with the broadcast path."""
    from laji_pygeoapi_ray.pipelines.knn_queries import (_points_ds,
                                                         _query_points)
    from laji_pygeoapi_ray.stages.knn import knn_broadcast, knn_cell_exact

    qdf = _query_points(SF_UNIT)
    exact = knn_broadcast(_points_ds(SF_UNIT), qdf, 5).to_pandas()
    fixed = knn_cell_exact(_points_ds(SF_UNIT), qdf, res=7, k=5,
                           ring=1, num_buckets=8)
    key = ["query_id", "rank"]
    exact = exact.sort_values(key).reset_index(drop=True)
    fixed = fixed.sort_values(key).reset_index(drop=True)
    assert len(fixed) == len(exact)
    assert (exact["neighbor_id"].to_numpy()
            == fixed["neighbor_id"].to_numpy()).all()
    assert (exact["d2"].to_numpy() == fixed["d2"].to_numpy()).all()


def test_ivf_ann_recall():
    from laji_pygeoapi_ray.pipelines.ann_queries import _queries_df
    from laji_pygeoapi_ray.stages.ann import ann_topk_broadcast, ann_topk_ivf

    qdf = _queries_df(SF_UNIT)
    ds = ray.data.read_parquet(f"{SF_UNIT}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    exact = ann_topk_broadcast(ds, qdf, 5).to_pandas()
    approx = ann_topk_ivf(ds, qdf, 5, n_lists=8, n_probe=4).to_pandas()
    recalls = []
    for qid, g in exact.groupby("query_id"):
        got = set(approx[approx["query_id"] == qid]["neighbor_id"])
        recalls.append(len(got & set(g["neighbor_id"])) / len(g))
    assert np.mean(recalls) >= 0.7, recalls


def test_kmeans_distributed_matches_local():
    """Distributed Lloyd == a local reference implementation on the same
    data with the same deterministic init."""
    import pyarrow.parquet as pq

    from laji_pygeoapi_ray.stages.ann import kmeans_distributed
    from laji_pygeoapi_ray.stages.sampling import id_hash

    t = pq.read_table(f"{SF_UNIT}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
    k = 6
    # local reference with identical init + schedule
    order = np.argsort(id_hash(ids), kind="stable")[:k]
    cent = m[order].copy()
    prev = None
    for _ in range(10):
        d2 = ((m[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        a = d2.argmin(1)
        obj = float(d2[np.arange(len(m)), a].sum())
        for c in range(k):
            if (a == c).any():
                cent[c] = m[a == c].mean(0)
        if prev is not None and obj >= prev * (1 - 1e-9):
            break
        prev = obj

    ds = ray.data.read_parquet(f"{SF_UNIT}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    got_cent, assign = kmeans_distributed(ds, k, n_iters=10)
    assert np.allclose(got_cent, cent, atol=1e-9)
    adf = assign.to_pandas().sort_values("vec_id")
    exp_a = ((m[:, None, :] - cent[None, :, :]) ** 2).sum(-1).argmin(1)
    srt = np.argsort(ids)
    assert (adf["cluster"].to_numpy() == exp_a[srt]).all()


def test_rect_overlap_pairs_matches_bruteforce_multicell():
    """PBSM exactly-once rule: rects spanning MANY grid cells (extents up
    to several cell widths at res 5, plus boundary-clipped ones) still
    produce every overlapping pair exactly once, matching the O(n²) scan."""
    from laji_pygeoapi_ray.functions.points import (FIN_X0, FIN_X1,
                                                    FIN_Y0, FIN_Y1)
    from laji_pygeoapi_ray.stages.knn import rect_overlap_pairs

    rng = np.random.default_rng(42)
    n = 300
    cx = rng.uniform(FIN_X0 - 0.5, FIN_X1 + 0.5, n)   # some clip past bbox
    cy = rng.uniform(FIN_Y0 - 0.5, FIN_Y1 + 0.5, n)
    hw = rng.uniform(0.01, 1.2, n)                    # up to ~3 cell widths
    hh = rng.uniform(0.01, 1.0, n)
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "x1": cx - hw, "x2": cx + hw,
                       "y1": cy - hh, "y2": cy + hh})
    got = rect_overlap_pairs(ray.data.from_pandas(df), res=5,
                             num_buckets=8).to_pandas()
    # brute force
    xo = (np.minimum(df["x2"].to_numpy()[:, None], df["x2"].to_numpy())
          - np.maximum(df["x1"].to_numpy()[:, None], df["x1"].to_numpy()))
    yo = (np.minimum(df["y2"].to_numpy()[:, None], df["y2"].to_numpy())
          - np.maximum(df["y1"].to_numpy()[:, None], df["y1"].to_numpy()))
    ia, ib = np.nonzero((xo > 0) & (yo > 0)
                        & (np.arange(n)[:, None] < np.arange(n)))
    exp = pd.DataFrame({"id_a": ia.astype(np.int64),
                        "id_b": ib.astype(np.int64),
                        "xo": xo[ia, ib], "yo": yo[ia, ib]})
    got = got.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    exp = exp.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert len(got) == len(exp), (len(got), len(exp))
    pd.testing.assert_frame_equal(got, exp, check_exact=True)


def test_knn_cell_exact_preserves_neighbor_ids_above_2_53():
    """The certify shuffle carries neighbor_id/rank as absent-side columns
    of a tagged union (round-5 hardening: pandas nullable Int64, not a
    float64-upcasting pa.nulls fill) — point ids above 2^53 must survive
    bit-exact through certification."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from laji_pygeoapi_ray.functions.points import (FIN_X0, FIN_X1,
                                                    FIN_Y0, FIN_Y1)
    from laji_pygeoapi_ray.stages.knn import knn_cell_exact

    big = (1 << 60) + 1
    rng = np.random.default_rng(7)
    n = 40
    cx, cy = (FIN_X0 + FIN_X1) / 2, (FIN_Y0 + FIN_Y1) / 2
    # DENSE cluster around the queries: the kth distance is far below the
    # certified radius, so the hazardous certify path (not the exact redo
    # fallback) produces the output rows
    pts = ray.data.from_arrow(pa.table({
        "id": pa.array(big + np.arange(n), pa.int64()),
        "x": cx + rng.uniform(-1e-3, 1e-3, n),
        "y": cy + rng.uniform(-1e-3, 1e-3, n)}))
    qdf = pd.DataFrame({"id": np.array([1, 2], np.int64),
                        "x": [cx] * 2, "y": [cy + 0.0005, cy - 0.0005]})
    out = knn_cell_exact(pts, qdf, res=5, k=3, ring=1, num_buckets=4)
    assert len(out) == 6
    got = set(out["neighbor_id"].astype(np.int64))
    assert all(big <= v < big + n for v in got), got
    # bit-exactness: every id must be one of the planted values exactly
    assert got <= set(range(big, big + n))


def test_dwithin_pairs_ring2_matches_bruteforce():
    """Every production config picks res so ring == 1; force ring >= 2
    (radius ~ 2.5 cell widths at res 6) and require the ghost-replicated
    self-join to match the O(n²) scan exactly — the multi-ring
    exactly-once rule (pair emitted only in the smaller-id home cell) is
    otherwise untested."""
    from laji_pygeoapi_ray.functions.points import (FIN_X0, FIN_X1,
                                                    FIN_Y0, FIN_Y1)
    from laji_pygeoapi_ray.stages.knn import dwithin_pairs

    rng = np.random.default_rng(9)
    n = 250
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "x": rng.uniform(FIN_X0, FIN_X1, n),
                       "y": rng.uniform(FIN_Y0, FIN_Y1, n)})
    radius = 0.5                       # res-6 cell ≈ 0.2 → ring = 3
    got = (dwithin_pairs(ray.data.from_pandas(df), radius, res=6,
                         num_buckets=8)
           .to_pandas().sort_values(["id_a", "id_b"])
           .reset_index(drop=True))
    x, y = df["x"].to_numpy(), df["y"].to_numpy()
    d2 = (x[:, None] - x) ** 2 + (y[:, None] - y) ** 2
    ia, ib = np.nonzero((d2 <= radius * radius)
                        & (np.arange(n)[:, None] < np.arange(n)))
    assert len(got) == len(ia), (len(got), len(ia))
    assert (got["id_a"].to_numpy() == ia).all()
    assert (got["id_b"].to_numpy() == ib).all()
    assert np.array_equal(got["d2"].to_numpy(), d2[ia, ib])  # bit-exact


def test_dwithin_cross_pairs_ring2_matches_bruteforce():
    """Cross-table variant at ring >= 2: each (a, b) must meet exactly
    once (a home-only, b ghost-ringed) with no dedup convention."""
    from laji_pygeoapi_ray.functions.points import (FIN_X0, FIN_X1,
                                                    FIN_Y0, FIN_Y1)
    from laji_pygeoapi_ray.stages.knn import dwithin_cross_pairs

    rng = np.random.default_rng(10)
    na, nb = 200, 150
    a = pd.DataFrame({"id": np.arange(na, dtype=np.int64),
                      "x": rng.uniform(FIN_X0, FIN_X1, na),
                      "y": rng.uniform(FIN_Y0, FIN_Y1, na)})
    b = pd.DataFrame({"id": np.arange(nb, dtype=np.int64),
                      "x": rng.uniform(FIN_X0, FIN_X1, nb),
                      "y": rng.uniform(FIN_Y0, FIN_Y1, nb)})
    radius = 0.45
    got = (dwithin_cross_pairs(ray.data.from_pandas(a),
                               ray.data.from_pandas(b), radius, res=6,
                               num_buckets=8)
           .to_pandas().sort_values(["id_a", "id_b"])
           .reset_index(drop=True))
    d2 = ((a["x"].to_numpy()[:, None] - b["x"].to_numpy()) ** 2
          + (a["y"].to_numpy()[:, None] - b["y"].to_numpy()) ** 2)
    ia, ib = np.nonzero(d2 <= radius * radius)
    assert len(got) == len(ia), (len(got), len(ia))
    assert (got["id_a"].to_numpy() == ia).all()
    assert (got["id_b"].to_numpy() == ib).all()
    assert np.array_equal(got["d2"].to_numpy(), d2[ia, ib])
