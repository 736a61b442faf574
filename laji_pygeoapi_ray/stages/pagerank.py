"""Distributed integer-exact PageRank (fixed iteration count).

Generic value-propagation over an edge set — the iterative sibling of the
min-label propagation in :mod:`simdedup`. All arithmetic is INTEGER
(ranks carry a large fixed-point base; contributions use floor division),
so per-node sums are block-order independent and the DuckDB twin is
bit-exact — no float ever crosses a block boundary.

Update rule per iteration (damping d = damp_num/damp_den, base mass B):

    contrib(u)  = r(u) // outdeg(u)
    r'(v)       = (den−num)·B // den  +  num · Σ_{u→v} contrib(u) // den

Dangling nodes (outdeg 0) contribute nothing (their mass evaporates —
documented deviation from the redistribute-to-all convention; both sides
agree). Per iteration: ONE shuffle keyed by src (edges ⋈ ranks, the
sentinel-tagged union pattern — ids must be non-negative) and one
groupby-sum keyed by dst; node payloads never move, only (id, int) rows.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .shuffle import grouped_apply


def integer_pagerank(edges_ds, ids_ds, *, id_col: str = "id",
                     iters: int = 3, base: int = 10 ** 9,
                     damp_num: int = 85, damp_den: int = 100,
                     num_buckets: int = 16):
    """edges_ds: directed (src, dst) — pass both directions for an
    undirected graph. ids_ds: one row per node (id_col). Returns a
    Dataset (id_col, rank: int64)."""
    base_term = (damp_den - damp_num) * base // damp_den

    # out-degree, kept WITH the rank so iterations need no extra join
    def to_src(t: pa.Table) -> pa.Table:
        return pa.table({"src": pc.cast(t["src"], pa.int64())})

    deg = (edges_ds.map_batches(to_src, batch_format="pyarrow")
           .groupby("src").count()
           .map_batches(lambda t: t.rename_columns(["id", "deg"]),
                        batch_format="pyarrow"))

    def seed(t: pa.Table) -> pa.Table:
        return pa.table({
            "id": pc.cast(t["id"], pa.int64()),
            "deg": pc.cast(t["deg"], pa.int64()),
            "r": pa.array(np.full(len(t), base, np.int64))})

    state = deg.map_batches(seed, batch_format="pyarrow").materialize()
    edges = edges_ds.materialize()

    for _ in range(iters):
        # contributions, tagged -1 on the edge side (ids non-negative)
        contrib = state.map_batches(
            lambda t: pa.table({
                "src": t["id"],
                "dst": pa.array(np.full(len(t), -1, np.int64)),
                "c": pa.array(t["r"].to_numpy(zero_copy_only=False)
                              // t["deg"].to_numpy(zero_copy_only=False))}),
            batch_format="pyarrow")
        tagged = edges.map_batches(
            lambda t: pa.table({
                "src": pc.cast(t["src"], pa.int64()),
                "dst": pc.cast(t["dst"], pa.int64()),
                "c": pa.array(np.full(len(t), -1, np.int64))}),
            batch_format="pyarrow").union(contrib)

        def route(df: pd.DataFrame) -> pd.DataFrame:
            cpart = df[df["dst"] == -1][["src", "c"]]
            epart = df[df["c"] == -1][["src", "dst"]]
            if cpart.empty or epart.empty:
                return pd.DataFrame({"id": pd.Series([], dtype="int64"),
                                     "inflow": pd.Series([], dtype="int64")})
            m = epart.merge(cpart, on="src")
            g = m.groupby("dst", as_index=False)["c"].sum()
            return pd.DataFrame({"id": g["dst"].astype("int64"),
                                 "inflow": g["c"].astype("int64")})

        routed = grouped_apply(tagged, ["src"], route,
                               num_buckets=num_buckets)
        inflow = (routed.groupby("id")
                  .sum("inflow")
                  .map_batches(lambda t: t.rename_columns(["id", "inflow"]),
                               batch_format="pyarrow"))

        # state update: sentinel-tagged union again (state ⟕ inflow)
        st_side = state.map_batches(
            lambda t: pa.table({
                "id": t["id"], "deg": t["deg"], "r": t["r"],
                "inflow": pa.array(np.full(len(t), -1, np.int64))}),
            batch_format="pyarrow")
        in_side = inflow.map_batches(
            lambda t: pa.table({
                "id": t["id"],
                "deg": pa.array(np.full(len(t), -1, np.int64)),
                "r": pa.array(np.full(len(t), -1, np.int64)),
                "inflow": pc.cast(t["inflow"], pa.int64())}),
            batch_format="pyarrow")

        def update(df: pd.DataFrame) -> pd.DataFrame:
            st = df[df["inflow"] == -1]
            infl = (df[df["deg"] == -1].groupby("id")["inflow"].sum())
            got = st["id"].map(infl).fillna(0).astype("int64").to_numpy()
            return pd.DataFrame({
                "id": st["id"].astype("int64"),
                "deg": st["deg"].astype("int64"),
                "r": base_term + damp_num * got // damp_den})

        state = grouped_apply(st_side.union(in_side), ["id"], update,
                              num_buckets=num_buckets).materialize()

    # all nodes: graph nodes keep their rank; isolated ids get base_term
    node_side = state.map_batches(
        lambda t: pa.table({"id": t["id"], "r": t["r"]}),
        batch_format="pyarrow")
    id_side = ids_ds.map_batches(
        lambda t: pa.table({"id": pc.cast(t[id_col], pa.int64()),
                            "r": pa.array(np.full(len(t), -1, np.int64))}),
        batch_format="pyarrow")

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        known = df[df["r"] != -1]
        ids = df[df["r"] == -1][["id"]]
        m = ids.merge(known.assign(r=known["r"].astype("Int64")),
                      on="id", how="left")
        return pd.DataFrame({
            "id": m["id"].astype("int64"),
            "rank": m["r"].fillna(base_term).astype("int64")})

    out = grouped_apply(node_side.union(id_side), ["id"], attach,
                        num_buckets=num_buckets)
    return out.map_batches(
        lambda t: pa.table({id_col: t["id"], "rank": t["rank"]}),
        batch_format="pyarrow")
