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
                     *, ring: int = 1, num_buckets: int | None = None):
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


def _safe_radius2(qx: np.ndarray, qy: np.ndarray, res: int,
                  ring: int) -> np.ndarray:
    """Squared certified radius: distance from each query point to the
    outer boundary of its (2·ring+1)² cell block. Clamped at 0 — a query
    outside the FIN bbox has a CLIPPED block and must never certify."""
    from ..functions.points import FIN_X0, FIN_X1, FIN_Y0, FIN_Y1

    n = 1 << res
    cw = (FIN_X1 - FIN_X0) / n
    ch = (FIN_Y1 - FIN_Y0) / n
    ix, iy = cells.cell_xy(qx, qy, res)
    safe = np.minimum.reduce([qx - (FIN_X0 + (ix - ring) * cw),
                              (FIN_X0 + (ix + 1 + ring) * cw) - qx,
                              qy - (FIN_Y0 + (iy - ring) * ch),
                              (FIN_Y0 + (iy + 1 + ring) * ch) - qy])
    safe = np.maximum(safe, 0.0)
    return safe * safe


def knn_cell_exact_ds(points_ds, queries_ds, res: int, k: int,
                      *, ring: int = 1, num_buckets: int | None = None):
    """EXACT kNN via the cell-cogroup scale path + DISTRIBUTED certification:

    1. run :func:`knn_cell_cogroup` (one shuffle, ring-``ring`` candidates);
    2. certify per query INSIDE the shuffle (one more hash exchange on
       query_id co-locating each query's candidate rows with its
       coordinates): every point within the certified radius — the distance
       to the outer boundary of the (2·ring+1)² cell block — provably lies
       inside the ring, so a query with ≥ k candidates and kth distance
       strictly below that radius keeps its ring result;
    3. ONLY the uncertified queries (the fraction → 0 as density × ring
       grows; bounded, so a driver materialization of just them is safe)
       re-run through the exact broadcast path and union back in.

    Candidate rows (Q × k) never land on the driver. Returns a Dataset
    (query_id, neighbor_id, d2, rank)."""
    import pyarrow.compute as pc

    from .join import _tag_union

    approx = knn_cell_cogroup(points_ds, queries_ds, res, k,
                              ring=ring, num_buckets=num_buckets)

    def to_meta(t: pa.Table) -> pa.Table:
        return pa.table({"query_id": pc.cast(t["id"], pa.int64()),
                         "qx": pc.cast(t["x"], pa.float64()),
                         "qy": pc.cast(t["y"], pa.float64())})

    # shared hardened tag-union (join.py): neighbor_id/rank are absent on
    # the meta side, so they ride pandas nullable Int64 through the bucket
    # — a local pa.nulls fill would float64-upcast them in mixed buckets,
    # rounding ids above 2^53. Static schemas: probing the approx lineage
    # would execute its groupby.
    tagged, _, _, _, _ = _tag_union(
        approx, queries_ds.map_batches(to_meta, batch_format="pyarrow"),
        left_schema=pa.schema([("query_id", pa.int64()),
                               ("neighbor_id", pa.int64()),
                               ("d2", pa.float64()),
                               ("rank", pa.int64())]),
        right_schema=pa.schema([("query_id", pa.int64()),
                                ("qx", pa.float64()),
                                ("qy", pa.float64())]))

    def certify(df: pd.DataFrame) -> pd.DataFrame:
        meta = df[df["__side"] == 1]
        rows = df[df["__side"] == 0]
        safe2 = pd.Series(
            _safe_radius2(meta["qx"].to_numpy(np.float64),
                          meta["qy"].to_numpy(np.float64), res, ring),
            index=meta["query_id"].to_numpy())
        got = rows.groupby("query_id")["d2"].agg(["count", "max"])
        ok = got[(got["count"] >= k)
                 & (got["max"] < safe2.reindex(got.index).to_numpy())]
        cert_ids = set(ok.index)
        out = rows[rows["query_id"].isin(cert_ids)].copy()
        out["certified"] = True
        redo = meta[~meta["query_id"].isin(cert_ids)].copy()
        redo["certified"] = False
        return pd.concat([out, redo], ignore_index=True)

    from .shuffle import grouped_apply
    res_ds = grouped_apply(tagged, ["query_id"], certify,
                           num_buckets=num_buckets,
                           out_dtypes={"query_id": pa.int64(),
                                       "neighbor_id": pa.int64(),
                                       "rank": pa.int64()})

    # TWO consumers (certified rows + redo set) of one Q×k-row lineage:
    # spill once to Parquet instead of materialize() — the certify table
    # is proportional to the QUERY set, which this function's contract
    # says may be large, and each consumer re-reads column-pruned with a
    # `certified` filter (the scale policy of state/spill.py)
    import pyarrow.dataset as pads

    from ..state.spill import spill_checkpoint
    read_cert = spill_checkpoint(
        res_ds, "knn_certify",
        schema=pa.schema([("query_id", pa.int64()),
                          ("neighbor_id", pa.int64()),
                          ("d2", pa.float64()),
                          ("rank", pa.int64()),
                          ("qx", pa.float64()),
                          ("qy", pa.float64()),
                          ("certified", pa.bool_())]))
    cert_rows = read_cert(columns=["query_id", "neighbor_id", "d2",
                                   "rank", "certified"],
                          filter=(pads.field("certified") == True)  # noqa: E712
                          ).drop_columns(["certified"])
    redo_df = read_cert(columns=["query_id", "qx", "qy", "certified"],
                        filter=(pads.field("certified") == False)  # noqa: E712
                        ).drop_columns(["certified"]).to_pandas()
    if redo_df.empty:
        return cert_rows
    redo_df = redo_df.rename(columns={"query_id": "id", "qx": "x",
                                      "qy": "y"})
    exact = knn_broadcast(points_ds, redo_df, k)
    return cert_rows.union(exact)


def knn_cell_exact(points_ds, queries: "pd.DataFrame", res: int, k: int,
                   *, ring: int = 1, num_buckets: int | None = None):
    """pandas-API convenience wrapper over :func:`knn_cell_exact_ds` for a
    small driver-side query table (the result is Q·k rows, bounded by the
    caller's own input)."""
    qds = ray.data.from_pandas(queries.reset_index(drop=True))
    return knn_cell_exact_ds(points_ds, qds, res, k, ring=ring,
                             num_buckets=num_buckets).to_pandas()


def dwithin_pairs(points_ds, radius: float, *, res: int,
                  num_buckets: int | None = None):
    """``ST_DWithin`` radius SELF-JOIN: every pair (id_a < id_b) of points
    within euclidean distance ``radius`` — the literal PostGIS capability
    the north star names (the kNN operators above are its "k nearest"
    sibling).

    Distribution (fixed-radius near-neighbor join): every point lands
    HOME in its grid cell and GHOSTS into the ``ring`` neighboring cells
    (ring = ceil(radius / cell_width) — the ring provably covers every
    point within ``radius``); ONE hash shuffle on the cell id cogroups
    candidates; each cell runs a vectorized home×(home+ghost) distance
    matrix. Exactly-once rule: a pair is emitted ONLY in the home cell of
    its smaller-id endpoint, so no cross-cell pair is double-counted and
    no dedup shuffle is needed. Replication factor (2·ring+1)² is the
    scale knob — pick ``res`` so the cell width is near ``radius``.

    d2 is computed with the same operand order as the SQL twin
    ((xa−xb)² + (ya−yb)², a = smaller id), so values are bit-identical.
    Returns a Dataset (id_a, id_b, d2)."""
    from ..functions.points import FIN_X0, FIN_X1, FIN_Y0, FIN_Y1
    from .shuffle import grouped_apply

    n = 1 << res
    cw = (FIN_X1 - FIN_X0) / n
    ch = (FIN_Y1 - FIN_Y0) / n
    ring = max(1, int(np.ceil(radius / min(cw, ch))))
    r2 = radius * radius
    offs = np.array([(dx, dy) for dy in range(-ring, ring + 1)
                     for dx in range(-ring, ring + 1)], dtype=np.int64)
    home_off = np.flatnonzero((offs[:, 0] == 0) & (offs[:, 1] == 0))[0]

    def explode(t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = t["x"].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t["y"].to_numpy(zero_copy_only=False).astype(np.float64)
        ix, iy = cells.cell_xy(x, y, res)
        jx = ix[:, None] + offs[None, :, 0]
        jy = iy[:, None] + offs[None, :, 1]
        valid = (jx >= 0) & (jx < n) & (jy >= 0) & (jy < n)
        home = np.zeros_like(valid)
        home[:, home_off] = True
        cell = ((np.int64(res) << cells.RES_SHIFT)
                | (jy << cells.IY_SHIFT) | jx)
        m = valid.ravel()
        k_rep = offs.shape[0]
        return pa.table({
            "cell": cell.ravel()[m],
            "id": np.repeat(ids, k_rep)[m],
            "x": np.repeat(x, k_rep)[m],
            "y": np.repeat(y, k_rep)[m],
            "home": home.ravel()[m]})

    exploded = points_ds.map_batches(explode, batch_format="pyarrow")

    def bucket_fn(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("cell", sort=False):
            h = g[g["home"]]
            if h.empty or len(g) < 2:
                continue
            hid = h["id"].to_numpy(np.int64)
            hx = h["x"].to_numpy(np.float64)
            hy = h["y"].to_numpy(np.float64)
            aid = g["id"].to_numpy(np.int64)
            ax = g["x"].to_numpy(np.float64)
            ay = g["y"].to_numpy(np.float64)
            dx = hx[:, None] - ax[None, :]
            dy = hy[:, None] - ay[None, :]
            d2 = dx * dx + dy * dy
            ok = (hid[:, None] < aid[None, :]) & (d2 <= r2)
            ia, ib = np.nonzero(ok)
            if len(ia):
                outs.append(pd.DataFrame({"id_a": hid[ia],
                                          "id_b": aid[ib],
                                          "d2": d2[ia, ib]}))
        if not outs:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "d2": pd.Series([], dtype="float64")})
        return pd.concat(outs, ignore_index=True)

    return grouped_apply(exploded, ["cell"], bucket_fn,
                         num_buckets=num_buckets)


def rect_overlap_pairs(rects_ds, *, res: int, num_buckets: int | None = None):
    """Rectangle OVERLAP self-join (``ST_Intersects`` on bounding boxes —
    the PBSM / partition-based-spatial-merge primitive; reference analogue:
    the PostGIS ``&&`` bbox operator its spatial filters rely on,
    ``/root/reference/pygeoapi/plugins/lajiapi_provider.py:115-135``).

    Input: Dataset (id:int64, x1, x2, y1, y2 float64), x1 ≤ x2, y1 ≤ y2.
    Output: Dataset (id_a, id_b, xo, yo) — every pair id_a < id_b whose
    boxes strictly overlap on both axes (xo = min(x2a,x2b) − max(x1a,x1b)
    > 0, same for yo; values bit-match the SQL twin via shared op order).

    Distribution: each rect is EXPLODED to every grid cell its box covers
    (replication = cells covered — pick ``res`` so the cell width exceeds
    the typical rect, making it ≤ 4); ONE hash shuffle on the cell id
    cogroups candidates; each cell tests its rects all-pairs, vectorized.
    Exactly-once rule (the classic PBSM reference-point rule): a pair is
    reported ONLY in the cell that contains the lower-left corner of the
    INTERSECTION box (max(x1a,x1b), max(y1a,y1b)) — that corner lies
    inside both boxes, so both replicas are present in that cell, and it
    is unique per pair, so no cross-cell pair is double-counted and no
    dedup shuffle is needed. Cell indices clip to the grid, and the clip
    is monotone, so boundary-clipped rects keep the guarantee."""
    from ..functions.points import FIN_X0, FIN_X1, FIN_Y0, FIN_Y1
    from .shuffle import grouped_apply

    n = 1 << res
    cw = (FIN_X1 - FIN_X0) / n
    ch = (FIN_Y1 - FIN_Y0) / n

    def _clip_ix(x):
        return np.clip(np.floor((x - FIN_X0) / cw).astype(np.int64),
                       0, n - 1)

    def _clip_iy(y):
        return np.clip(np.floor((y - FIN_Y0) / ch).astype(np.int64),
                       0, n - 1)

    def explode(t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x1 = t["x1"].to_numpy(zero_copy_only=False).astype(np.float64)
        x2 = t["x2"].to_numpy(zero_copy_only=False).astype(np.float64)
        y1 = t["y1"].to_numpy(zero_copy_only=False).astype(np.float64)
        y2 = t["y2"].to_numpy(zero_copy_only=False).astype(np.float64)
        ix0, ix1 = _clip_ix(x1), _clip_ix(x2)
        iy0, iy1 = _clip_iy(y1), _clip_iy(y2)
        rep, cell = cells.enumerate_cover(ix0, ix1, iy0, iy1, res)
        return pa.table({"cell": cell, "id": ids[rep],
                         "x1": x1[rep], "x2": x2[rep],
                         "y1": y1[rep], "y2": y2[rep]})

    exploded = rects_ds.map_batches(explode, batch_format="pyarrow")

    def bucket_fn(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for cell_id, g in df.groupby("cell", sort=False):
            if len(g) < 2:
                continue
            gid = g["id"].to_numpy(np.int64)
            gx1 = g["x1"].to_numpy(np.float64)
            gx2 = g["x2"].to_numpy(np.float64)
            gy1 = g["y1"].to_numpy(np.float64)
            gy2 = g["y2"].to_numpy(np.float64)
            # all-pairs overlap test, SQL-twin op order:
            # xo = LEAST(x2a, x2b) − GREATEST(x1a, x1b)  (a = smaller id)
            lo = gid[:, None] < gid[None, :]
            xo = (np.minimum(gx2[:, None], gx2[None, :])
                  - np.maximum(gx1[:, None], gx1[None, :]))
            yo = (np.minimum(gy2[:, None], gy2[None, :])
                  - np.maximum(gy1[:, None], gy1[None, :]))
            # reference point = intersection lower-left corner; its cell
            # must be THIS cell (same clip as explode → exactly once)
            rx = np.maximum(gx1[:, None], gx1[None, :])
            ry = np.maximum(gy1[:, None], gy1[None, :])
            icell = int(cell_id)
            cix = icell & ((1 << cells.IY_SHIFT) - 1)
            ciy = (icell >> cells.IY_SHIFT) & ((1 << cells.IY_SHIFT) - 1)
            here = (_clip_ix(rx) == cix) & (_clip_iy(ry) == ciy)
            ok = lo & (xo > 0.0) & (yo > 0.0) & here
            ia, ib = np.nonzero(ok)
            if len(ia):
                outs.append(pd.DataFrame({"id_a": gid[ia], "id_b": gid[ib],
                                          "xo": xo[ia, ib],
                                          "yo": yo[ia, ib]}))
        if not outs:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "xo": pd.Series([], dtype="float64"),
                                 "yo": pd.Series([], dtype="float64")})
        return pd.concat(outs, ignore_index=True)

    return grouped_apply(exploded, ["cell"], bucket_fn,
                         num_buckets=num_buckets)


def dwithin_cross_pairs(a_ds, b_ds, radius: float, *, res: int,
                        num_buckets: int | None = None):
    """``ST_DWithin`` radius join BETWEEN TWO TABLES: every (a, b) pair
    within euclidean ``radius`` — the cross-modal sibling of
    :func:`dwithin_pairs` (e.g. image points × occurrence documents, the
    north star's spatial join verbatim).

    Distribution: side A lands ONLY in its home cell; side B lands home
    + the ghost ring. Each (a, b) candidate therefore meets exactly once
    (in a's home cell, where b has exactly one copy) — the cross join
    needs NO dedup rule at all, unlike the self-join's smaller-id-home
    convention. One cell-keyed shuffle; per-cell vectorized A×B distance
    matrix; d2 operand order matches the SQL twin ((xa−xb)² + (ya−yb)²).
    Returns (id_a, id_b, d2)."""
    from ..functions import cells
    from ..functions.points import FIN_X0, FIN_X1, FIN_Y0, FIN_Y1
    from .shuffle import grouped_apply

    n = 1 << res
    cw = (FIN_X1 - FIN_X0) / n
    ch = (FIN_Y1 - FIN_Y0) / n
    ring = max(1, int(np.ceil(radius / min(cw, ch))))
    r2 = radius * radius
    offs = np.array([(dx, dy) for dy in range(-ring, ring + 1)
                     for dx in range(-ring, ring + 1)], dtype=np.int64)

    def tag_home(t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = t["x"].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t["y"].to_numpy(zero_copy_only=False).astype(np.float64)
        ix, iy = cells.cell_xy(x, y, res)
        cell = ((np.int64(res) << cells.RES_SHIFT)
                | (iy << cells.IY_SHIFT) | ix)
        return pa.table({"cell": pa.array(cell), "id": pa.array(ids),
                         "x": pa.array(x), "y": pa.array(y),
                         "side": pa.array(np.zeros(len(ids), np.int64))})

    def ghost_b(t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = t["x"].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t["y"].to_numpy(zero_copy_only=False).astype(np.float64)
        ix, iy = cells.cell_xy(x, y, res)
        jx = ix[:, None] + offs[None, :, 0]
        jy = iy[:, None] + offs[None, :, 1]
        valid = ((jx >= 0) & (jx < n) & (jy >= 0) & (jy < n)).ravel()
        cell = ((np.int64(res) << cells.RES_SHIFT)
                | (jy << cells.IY_SHIFT) | jx).ravel()
        k = offs.shape[0]
        return pa.table({
            "cell": pa.array(cell[valid]),
            "id": pa.array(np.repeat(ids, k)[valid]),
            "x": pa.array(np.repeat(x, k)[valid]),
            "y": pa.array(np.repeat(y, k)[valid]),
            "side": pa.array(np.ones(int(valid.sum()), np.int64))})

    both = a_ds.map_batches(tag_home, batch_format="pyarrow").union(
        b_ds.map_batches(ghost_b, batch_format="pyarrow"))

    def bucket_fn(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("cell", sort=False):
            a = g[g["side"] == 0]
            b = g[g["side"] == 1]
            if a.empty or b.empty:
                continue
            aid = a["id"].to_numpy(np.int64)
            ax = a["x"].to_numpy(np.float64)
            ay = a["y"].to_numpy(np.float64)
            bid = b["id"].to_numpy(np.int64)
            bx = b["x"].to_numpy(np.float64)
            by_ = b["y"].to_numpy(np.float64)
            dx = ax[:, None] - bx[None, :]
            dy = ay[:, None] - by_[None, :]
            d2 = dx * dx + dy * dy
            ia, ib = np.nonzero(d2 <= r2)
            if len(ia):
                outs.append(pd.DataFrame({"id_a": aid[ia],
                                          "id_b": bid[ib],
                                          "d2": d2[ia, ib]}))
        if not outs:
            return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64),
                                 "d2": pd.Series([], dtype=np.float64)})
        return pd.concat(outs, ignore_index=True)

    return grouped_apply(both, ["cell"], bucket_fn,
                         num_buckets=num_buckets)
