"""Distributed grid DBSCAN (density-based spatial clustering).

The reference has no clustering operator — its densest spatial notion is
the per-municipality frequency count (SURVEY §2.6) — so this is part of
the engine's spatial-analysis extension set, built in the MR-DBSCAN /
grid-partitioned shape (He et al. 2011):

- **cell width = 2·eps**, every point replicated to EXACTLY the 4 grid
  cells its eps-disc touches (its home cell + 3 ghosts — with width 2·eps
  the disc always spans exactly 2 cells per axis). Any two points within
  eps then co-occur in the home cell of each, so all per-cell work is
  local and exactly-once per home point; only (id, qx, qy[, label]) rows
  ever shuffle, never payload.
- pass 1: neighbor counts → core flags (|N_eps(p)| ≥ minPts, self incl.)
- pass 2: core-core edges within eps, emitted exactly once (home side of
  the smaller-id endpoint — NOTES.md planar-overlay lesson)
- pass 3: connected components of the core graph via the existing
  distributed min-label propagation (``simdedup.cluster_pairs_ds``)
- pass 4: border points take the MIN cluster label among their core
  neighbors. (Classic DBSCAN leaves border assignment visit-order
  dependent; MIN makes it deterministic and SQL-reproducible.)
  Non-core points with no core neighbor are noise: ``cluster_id = -1``.

Coordinates are micro-degree int64 quantized (floor(x·1e6)) so every
distance test is exact integer arithmetic, bit-identical to the DuckDB
oracle's. Per-cell work is O(|cell|²) vectorized — cell population is
bounded by data density at eps, the operator's intrinsic work bound.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import points
from .join import hash_join
from .shuffle import grouped_apply
from .simdedup import cluster_pairs_ds

Q = 1_000_000                       # micro-degree quantization
_SHIFT = np.int64(1) << np.int64(32)  # (cx, cy) → one int64 cell key


def quantized_points(ds, id_col: str):
    """key → exact int64 micro-degree point (floor(x·1e6); x, y > 0 here
    so floor == trunc and DuckDB's CAST(floor(x*1e6) AS BIGINT) agrees
    bit-for-bit)."""
    def fn(t: pa.Table) -> pa.Table:
        keys = t[id_col].to_numpy(zero_copy_only=False)
        x, y = points.derive_xy(keys)
        qx = np.floor(x * np.float64(Q)).astype(np.int64)
        qy = np.floor(y * np.float64(Q)).astype(np.int64)
        return pa.table({"id": pc.cast(t[id_col], pa.int64()),
                         "qx": pa.array(qx), "qy": pa.array(qy)})
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _scatter(eps_u: int, carry: tuple[str, ...] = ()):
    """4-way disc scatter: emit each row to the 4 cells (width 2·eps) its
    eps-disc touches, with ``home`` marking the copy in the point's own
    cell. Extra ``carry`` columns are replicated alongside."""
    w = np.int64(2 * eps_u)
    r = np.int64(eps_u)

    def fn(t: pa.Table) -> pa.Table:
        qx = t["qx"].to_numpy(zero_copy_only=False)
        qy = t["qy"].to_numpy(zero_copy_only=False)
        lox, hix = (qx - r) // w, (qx + r) // w
        loy, hiy = (qy - r) // w, (qy + r) // w
        cx = np.stack([lox, lox, hix, hix], axis=1).ravel()
        cy = np.stack([loy, hiy, loy, hiy], axis=1).ravel()
        home = (cx == np.repeat(qx // w, 4)) & (cy == np.repeat(qy // w, 4))
        out = {"cell": pa.array(cx * _SHIFT + cy), "home": pa.array(home),
               "qx": pa.array(np.repeat(qx, 4)),
               "qy": pa.array(np.repeat(qy, 4))}
        for c in ("id",) + tuple(carry):
            v = t[c].to_numpy(zero_copy_only=False)
            out[c] = pa.array(np.repeat(v, 4))
        return pa.table(out)
    return fn


def _per_cell(df: pd.DataFrame, cell_fn, empty: dict) -> pd.DataFrame:
    outs = [r for _, g in df.groupby("cell", sort=False)
            if (r := cell_fn(g)) is not None]
    if not outs:
        return pd.DataFrame({k: pd.Series([], dtype=v)
                             for k, v in empty.items()})
    return pd.concat(outs, ignore_index=True)


def neighbor_counts(pts_ds, *, eps_u: int, minpts: int,
                    num_buckets: int | None = None):
    """(id, qx, qy) → + n_in_eps (self included) + is_core."""
    r2 = np.int64(eps_u) * np.int64(eps_u)
    scat = pts_ds.map_batches(_scatter(eps_u), batch_format="pyarrow",
                              zero_copy_batch=True)

    def cell_fn(g: pd.DataFrame):
        home = g["home"].to_numpy()
        if not home.any():
            return None
        qx = g["qx"].to_numpy()
        qy = g["qy"].to_numpy()
        hx, hy = qx[home], qy[home]
        d2 = (hx[:, None] - qx[None, :]) ** 2 + \
             (hy[:, None] - qy[None, :]) ** 2
        n = (d2 <= r2).sum(axis=1).astype(np.int64)
        return pd.DataFrame({"id": g["id"].to_numpy()[home],
                             "qx": hx, "qy": hy, "n_in_eps": n,
                             "is_core": n >= minpts})

    empty = {"id": "int64", "qx": "int64", "qy": "int64",
             "n_in_eps": "int64", "is_core": "bool"}
    return grouped_apply(scat, ["cell"],
                         lambda df: _per_cell(df, cell_fn, empty),
                         num_buckets=num_buckets)


def core_edges(core_ds, *, eps_u: int, num_buckets: int | None = None):
    """Core-core pairs within eps, each emitted exactly once (home copy of
    the smaller id)."""
    r2 = np.int64(eps_u) * np.int64(eps_u)
    scat = core_ds.map_batches(_scatter(eps_u), batch_format="pyarrow",
                               zero_copy_batch=True)

    def cell_fn(g: pd.DataFrame):
        home = g["home"].to_numpy()
        if not home.any():
            return None
        qx, qy = g["qx"].to_numpy(), g["qy"].to_numpy()
        ids = g["id"].to_numpy()
        hx, hy, ha = qx[home], qy[home], ids[home]
        d2 = (hx[:, None] - qx[None, :]) ** 2 + \
             (hy[:, None] - qy[None, :]) ** 2
        mask = (d2 <= r2) & (ha[:, None] < ids[None, :])
        i, j = np.nonzero(mask)
        if len(i) == 0:
            return None
        return pd.DataFrame({"id_a": ha[i], "id_b": ids[j]})

    empty = {"id_a": "int64", "id_b": "int64"}
    return grouped_apply(scat, ["cell"],
                         lambda df: _per_cell(df, cell_fn, empty),
                         num_buckets=num_buckets)


def border_labels(core_lab_ds, border_ds, *, eps_u: int,
                  num_buckets: int | None = None):
    """Border points (non-core with ≥1 core neighbor) → MIN core-neighbor
    cluster label. core_lab_ds: (id, qx, qy, cluster_id); border_ds:
    (id, qx, qy)."""
    r2 = np.int64(eps_u) * np.int64(eps_u)

    def tag(v: bool):
        def fn(t: pa.Table) -> pa.Table:
            out = {"id": t["id"], "qx": t["qx"], "qy": t["qy"],
                   "cluster_id": (pc.cast(t["cluster_id"], pa.int64())
                                  if v else
                                  pa.array(np.full(t.num_rows, -1,
                                                   np.int64))),
                   "is_core": pa.array(np.full(t.num_rows, v))}
            return pa.table(out)
        return fn

    both = (core_lab_ds.map_batches(tag(True), batch_format="pyarrow")
            .union(border_ds.map_batches(tag(False),
                                         batch_format="pyarrow")))
    scat = both.map_batches(_scatter(eps_u, carry=("cluster_id", "is_core")),
                            batch_format="pyarrow", zero_copy_batch=True)

    def cell_fn(g: pd.DataFrame):
        home = g["home"].to_numpy()
        core = g["is_core"].to_numpy()
        tgt = home & ~core
        if not tgt.any() or not core.any():
            return None
        qx, qy = g["qx"].to_numpy(), g["qy"].to_numpy()
        bx, by = qx[tgt], qy[tgt]
        cx, cy = qx[core], qy[core]
        lab = g["cluster_id"].to_numpy()[core]
        d2 = (bx[:, None] - cx[None, :]) ** 2 + \
             (by[:, None] - cy[None, :]) ** 2
        near = d2 <= r2
        hit = near.any(axis=1)
        if not hit.any():
            return None
        big = np.iinfo(np.int64).max
        best = np.where(near, lab[None, :], big).min(axis=1)
        return pd.DataFrame({"id": g["id"].to_numpy()[tgt][hit],
                             "cluster_id": best[hit]})

    empty = {"id": "int64", "cluster_id": "int64"}
    return grouped_apply(scat, ["cell"],
                         lambda df: _per_cell(df, cell_fn, empty),
                         num_buckets=num_buckets)


def dbscan(pts_ds, *, eps_u: int, minpts: int, num_buckets: int | None = None):
    """Full DBSCAN over an (id, qx, qy) dataset. Returns
    (id, qx, qy, n_in_eps, is_core, cluster_id) with cluster_id = min id
    of the core-connected component, border points labeled by MIN core
    neighbor, noise = -1."""
    # Multi-consumer fan-out points (core/border split + final join read
    # this 3×; core feeds 3 more): the one-row-per-point tables are
    # INPUT-proportional, so spill them once to Parquet and re-read
    # column-pruned/filtered per consumer instead of pinning them in the
    # object store (state/spill.py scale policy — materialize() is for
    # bounded intermediates only).
    import pyarrow.dataset as pads

    from ..state.spill import spill_checkpoint

    read_counts = spill_checkpoint(
        neighbor_counts(pts_ds, eps_u=eps_u, minpts=minpts,
                        num_buckets=num_buckets),
        "dbscan_counts",
        schema=pa.schema([("id", pa.int64()), ("qx", pa.int64()),
                          ("qy", pa.int64()), ("n_in_eps", pa.int64()),
                          ("is_core", pa.bool_())]))

    def side(is_core: bool):
        return read_counts(
            columns=["id", "qx", "qy", "is_core"],
            filter=(pads.field("is_core") == is_core)) \
            .drop_columns(["is_core"])

    core = side(True)
    border = side(False)
    edges = core_edges(core, eps_u=eps_u, num_buckets=num_buckets)
    labels = cluster_pairs_ds(edges, core.select_columns(["id"]),
                              id_col="id", num_buckets=num_buckets)
    read_core_lab = spill_checkpoint(
        hash_join(core, labels, on=["id"], num_buckets=num_buckets),
        "dbscan_core_lab",
        schema=pa.schema([("id", pa.int64()), ("qx", pa.int64()),
                          ("qy", pa.int64()),
                          ("cluster_id", pa.int64())]))
    blab = border_labels(read_core_lab(), border, eps_u=eps_u,
                         num_buckets=num_buckets)
    lab_all = (read_core_lab(columns=["id", "cluster_id"])
               .union(blab))
    out = hash_join(read_counts(), lab_all, on=["id"], how="left",
                    num_buckets=num_buckets)

    def finalize(t: pa.Table) -> pa.Table:
        cl = pc.fill_null(pc.cast(t["cluster_id"], pa.int64()),
                          np.int64(-1))
        cols = {c: pc.cast(t[c], pa.int64())
                for c in ("id", "qx", "qy", "n_in_eps")}
        cols["is_core"] = pc.cast(t["is_core"], pa.bool_())
        cols["cluster_id"] = cl
        return pa.table(cols)

    return out.map_batches(finalize, batch_format="pyarrow")
