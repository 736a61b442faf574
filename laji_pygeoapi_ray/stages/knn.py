"""kNN nearest-occurrence lookup — the ``ST_DWithin``-class capability the
reference implies via its PostGIS GIST index (``edit_db.py:307-310``;
SURVEY.md §2.5 "kNN nearest-occurrence", a north-star requirement).

Two execution strategies:

- :func:`knn_broadcast` — the small-query-side path: the Q query points are
  ``ray.put`` once and every ``map_batches`` task scans its batch against
  them (vectorized (batch × Q) distance matrix), emitting per-batch top-k
  *candidates*; a tiny ``groupby(query_id)`` reduction finishes the global
  top-k. One broadcast + one small shuffle of Q·k·n_blocks candidate rows —
  no all-to-all of the big side.

- :func:`knn_cell_cogroup` — the scale path for LARGE query sets: both
  sides shuffle once by grid cell; queries replicate to their neighbor
  ring; per-cell vectorized top-k + a tiny per-query merge. Partitioning
  assumption: the kth neighbor lies within ``ring`` cell widths (see the
  function docstring).

Distance = squared euclidean in (x, y), computed with the same op order as
the DuckDB oracle (``(qx-px)*(qx-px)+(qy-py)*(qy-py)``) so values are
bit-identical; ranking ties break by neighbor id.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..functions import cells


def _topk_partial(qx, qy, qid, px, py, pid, k, exclude_self):
    """Vectorized per-batch candidates: for each query, the k nearest batch
    points by (d2, pid). Returns (qid, pid, d2) arrays."""
    dx = qx[:, None] - px[None, :]
    dy = qy[:, None] - py[None, :]
    d2 = dx * dx + dy * dy
    if exclude_self:
        d2 = np.where(qid[:, None] == pid[None, :], np.inf, d2)
    kk = min(k, d2.shape[1])
    # lexsort per row by (d2, pid): stable argsort on pid then stable by d2
    order = np.lexsort((np.broadcast_to(pid, d2.shape), d2), axis=1)[:, :kk]
    out_qid = np.repeat(qid, kk)
    out_pid = pid[order].ravel()
    out_d2 = np.take_along_axis(d2, order, axis=1).ravel()
    keep = np.isfinite(out_d2)
    return out_qid[keep], out_pid[keep], out_d2[keep]


def knn_broadcast(points_ds, queries: "pa.Table | pd.DataFrame", k: int,
                  *, id_col: str = "id", exclude_self: bool = True):
    """k nearest points of ``points_ds`` (columns id_col, x, y) for each row
    of the small broadcast ``queries`` table (same columns).
    Returns a Dataset (query_id, neighbor_id, d2, rank)."""
    if isinstance(queries, pa.Table):
        queries = queries.to_pandas()
    q_ref = ray.put((queries[id_col].to_numpy(np.int64),
                     queries["x"].to_numpy(np.float64),
                     queries["y"].to_numpy(np.float64)))

    def scan(batch: pa.Table) -> pa.Table:
        qid, qx, qy = ray.get(q_ref)
        pid = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        px = batch["x"].to_numpy(zero_copy_only=False)
        py = batch["y"].to_numpy(zero_copy_only=False)
        oq, op, od = _topk_partial(qx, qy, qid, px, py, pid, k, exclude_self)
        return pa.table({"query_id": oq, "neighbor_id": op, "d2": od})

    cands = points_ds.map_batches(scan, batch_format="pyarrow")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["query_id", "d2", "neighbor_id"],
                            kind="mergesort")
        df = df.groupby("query_id", sort=False).head(k).copy()
        df["rank"] = df.groupby("query_id", sort=False).cumcount() + 1
        return df

    return cands.groupby("query_id").map_groups(finish, batch_format="pandas")


def knn_cell_cogroup(points_ds, queries_ds, res: int, k: int,
                     *, ring: int = 1, num_buckets: int = 64):
    """Scale path for LARGE query sets: a cell-cogrouped kNN join.

    Both sides shuffle ONCE by grid cell at resolution ``res``
    (functions/cells.py): points go to their own cell; each query is
    replicated to its cell's neighbor ring (``(2·ring+1)²`` cells) so every
    cell group holds exactly the candidates the query may need. One
    ``groupby(cell-bucket)`` then runs a vectorized per-cell top-k, and a
    tiny ``groupby(query_id)`` merges per-cell candidates into the global
    top-k.

    Partitioning assumption (documented per SURVEY.md §2.5): the kth
    neighbor lies within ``ring`` cell widths of the query; with res 7 cells
    (~0.1°) and the synthetic densities this holds ≥99.9 % (asserted vs
    brute force in tests). Skewed cells (Helsinki cluster) are bounded by
    the bucket hash — a hot cell's matrix work is chunked inside the
    vectorized kernel.
    """
    from .shuffle import grouped_apply

    def tag_points(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        return pa.table({
            "cell": cells.encode(x, y, res),
            "side": np.zeros(len(x), dtype=np.int8),
            "id": t["id"].to_numpy(zero_copy_only=False).astype(np.int64),
            "x": x, "y": y,
        })

    def replicate_queries(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        qid = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        home = cells.encode(x, y, res)
        out_cell, out_id, out_x, out_y = [], [], [], []
        # vectorized ring replication: shift the (ix, iy) grid coords
        r, ix, iy = cells.decode(home)
        n = np.int64(1) << res
        for dy in range(-ring, ring + 1):
            for dx in range(-ring, ring + 1):
                jx, jy = ix + dx, iy + dy
                ok = (jx >= 0) & (jx < n) & (jy >= 0) & (jy < n)
                c = ((np.int64(res) << cells.RES_SHIFT)
                     | (jy[ok] << cells.IY_SHIFT) | jx[ok])
                out_cell.append(c)
                out_id.append(qid[ok]); out_x.append(x[ok]); out_y.append(y[ok])
        return pa.table({
            "cell": np.concatenate(out_cell),
            "side": np.ones(sum(len(a) for a in out_id), dtype=np.int8),
            "id": np.concatenate(out_id),
            "x": np.concatenate(out_x), "y": np.concatenate(out_y),
        })

    tagged = (points_ds.map_batches(tag_points, batch_format="pyarrow")
              .union(queries_ds.map_batches(replicate_queries,
                                            batch_format="pyarrow")))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("cell", sort=False):
            pts = g[g["side"] == 0]
            qs = g[g["side"] == 1]
            if pts.empty or qs.empty:
                continue
            oq, op, od = _topk_partial(
                qs["x"].to_numpy(), qs["y"].to_numpy(),
                qs["id"].to_numpy(np.int64),
                pts["x"].to_numpy(), pts["y"].to_numpy(),
                pts["id"].to_numpy(np.int64), k, True)
            outs.append(pd.DataFrame({"query_id": oq, "neighbor_id": op,
                                      "d2": od}))
        if not outs:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 "neighbor_id": pd.Series([], dtype="int64"),
                                 "d2": pd.Series([], dtype="float64")})
        return pd.concat(outs, ignore_index=True)

    cands = grouped_apply(tagged, ["cell"], per_bucket,
                          num_buckets=num_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(subset=["query_id", "neighbor_id"])
        df = df.sort_values(["query_id", "d2", "neighbor_id"],
                            kind="mergesort")
        df = df.groupby("query_id", sort=False).head(k).copy()
        df["rank"] = df.groupby("query_id", sort=False).cumcount() + 1
        return df

    return cands.groupby("query_id").map_groups(finish, batch_format="pandas")


def knn_cell_exact(points_ds, queries: "pd.DataFrame", res: int, k: int,
                   *, ring: int = 1, num_buckets: int = 64):
    """EXACT kNN via the cell-cogroup scale path + a guarantee check:

    1. run :func:`knn_cell_cogroup` (one shuffle, ring-``ring`` candidates);
    2. per query, compute the certified radius — the distance from the
       query point to the outer boundary of its (2·ring+1)² cell block:
       every point within that radius provably lies inside the ring, so if
       the query found ≥ k neighbors and its kth distance ≤ radius, the
       ring result IS the global top-k;
    3. the (few) uncertified queries re-run through the exact broadcast
       path (:func:`knn_broadcast`) and replace their rows.

    Cost: the cogroup shuffle + a broadcast scan sized by the uncertified
    fraction (→ 0 as density × ring grows). Returns a pandas DataFrame.
    """
    from ..functions.points import FIN_X0, FIN_X1, FIN_Y0, FIN_Y1

    qdf = queries.reset_index(drop=True)
    approx = knn_cell_cogroup(points_ds,
                              ray.data.from_pandas(qdf), res, k,
                              ring=ring, num_buckets=num_buckets).to_pandas()

    n = 1 << res
    cw = (FIN_X1 - FIN_X0) / n
    ch = (FIN_Y1 - FIN_Y0) / n
    ix, iy = cells.cell_xy(qdf["x"].to_numpy(), qdf["y"].to_numpy(), res)
    bx0 = FIN_X0 + (ix - ring) * cw
    bx1 = FIN_X0 + (ix + 1 + ring) * cw
    by0 = FIN_Y0 + (iy - ring) * ch
    by1 = FIN_Y0 + (iy + 1 + ring) * ch
    safe = np.minimum.reduce([qdf["x"].to_numpy() - bx0,
                              bx1 - qdf["x"].to_numpy(),
                              qdf["y"].to_numpy() - by0,
                              by1 - qdf["y"].to_numpy()])
    # clamp: a query outside the FIN bbox has a CLIPPED cell block, so a
    # negative margin must stay 0 (never falsely certify via (-m)^2), and
    # strict '<' keeps the exact-boundary case on the fallback path
    safe = np.maximum(safe, 0.0)
    safe2 = pd.Series(safe * safe, index=qdf["id"].to_numpy())

    got = approx.groupby("query_id")["d2"].agg(["count", "max"])
    certified = got[(got["count"] >= k)
                    & (got["max"] < safe2.reindex(got.index).to_numpy())]
    bad_ids = sorted(set(qdf["id"]) - set(certified.index))
    if not bad_ids:
        return approx
    redo = qdf[qdf["id"].isin(bad_ids)]
    exact = knn_broadcast(points_ds, redo, k).to_pandas()
    keep = approx[~approx["query_id"].isin(bad_ids)]
    return pd.concat([keep, exact], ignore_index=True)
