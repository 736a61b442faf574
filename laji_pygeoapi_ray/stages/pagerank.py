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
                     num_buckets: int | None = None,
                     broadcast_threshold: int = 5_000_000):
    """edges_ds: directed (src, dst) — pass both directions for an
    undirected graph. ids_ds: one row per node (id_col). Returns a
    Dataset (id_col, rank: int64).

    Two execution shapes, chosen by GRAPH-NODE count (the rank state):
    when the node table fits a broadcast (≤ ``broadcast_threshold``
    rows — a few hundred MB of (id, deg, r) arrays), each iteration is
    ONE stateless map over the STATIC edge dataset (searchsorted rank
    lookup, per-batch pre-aggregated inflow partials) + a tiny groupby —
    the edges never shuffle. Beyond the threshold the sentinel-tagged
    union shuffle routes contributions edge-by-edge (nothing is ever
    broadcast), which is the unbounded-graph path. Both paths agree
    bit-exactly (tested in tests/test_graph_paths.py).

    SINK-NODE SEMANTICS (directed graphs): rank state is seeded from
    edge SOURCES only, so a zero-out-degree node never enters the state
    — its inflow is DISCARDED each iteration and it reports
    ``base_term`` at the end, exactly like an isolated id. For the
    undirected callers in this repo (both edge directions passed) every
    endpoint is a source, so no node is a sink and the oracle agrees;
    a directed-graph reuse that wants sinks to ACCUMULATE rank must
    union the node ids into the seeded state with deg clamped to 1.

    Ids must be NON-NEGATIVE int64 (the shuffle path tags union sides
    with a -1 sentinel) — enforced per batch, failing loudly instead of
    corrupting ranks.
    """
    base_term = (damp_den - damp_num) * base // damp_den

    # out-degree, kept WITH the rank so iterations need no extra join;
    # doubles as the non-negative-id guard (sentinel precondition)
    def to_src(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        if (len(src) and min(src.min(), dst.min()) < 0):
            raise ValueError(
                "integer_pagerank requires non-negative int64 node ids "
                "(-1 is the internal union side-tag sentinel); remap "
                "negative ids first")
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

    if state.count() <= broadcast_threshold:
        return _pagerank_broadcast(edges, state, ids_ds, id_col=id_col,
                                   iters=iters, base_term=base_term,
                                   damp_num=damp_num, damp_den=damp_den,
                                   num_buckets=num_buckets)

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


def _pagerank_broadcast(edges, state, ids_ds, *, id_col, iters,
                        base_term, damp_num, damp_den, num_buckets):
    """Bounded-node fast path: ranks broadcast once per iteration, the
    static edge set is ONLY mapped (never shuffled)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    st = state.to_pandas()
    ids = np.sort(st["id"].to_numpy(np.int64))
    order = np.argsort(st["id"].to_numpy(np.int64), kind="mergesort")
    deg = st["deg"].to_numpy(np.int64)[order]
    r = st["r"].to_numpy(np.int64)[order]

    for _ in range(iters):
        contrib_ref = ray.put((ids, r // deg))

        def inflow_partial(t: pa.Table) -> pa.Table:
            kid, c = ray.get(contrib_ref)
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(kid, src)
            vals = c[pos]                     # every src IS a graph node
            uniq, inv = np.unique(dst, return_inverse=True)
            sums = np.zeros(len(uniq), np.int64)
            np.add.at(sums, inv, vals)
            return pa.table({"id": pa.array(uniq),
                             "inflow": pa.array(sums)})

        agg = (edges.map_batches(inflow_partial, batch_format="pyarrow")
               .groupby("id").aggregate(Sum("inflow",
                                            alias_name="inflow"))
               .to_pandas())
        got = np.zeros(len(ids), np.int64)
        pos = np.searchsorted(ids, agg["id"].to_numpy(np.int64))
        got[pos] = agg["inflow"].to_numpy(np.int64)
        r = base_term + damp_num * got // damp_den

    rank_ref = ray.put((ids, r))

    def attach(t: pa.Table) -> pa.Table:
        kid, rv = ray.get(rank_ref)
        node = pc.cast(t[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        pos = np.searchsorted(kid, node)
        pos_c = np.clip(pos, 0, len(kid) - 1)
        hit = (len(kid) > 0) & (kid[pos_c] == node)
        out = np.where(hit, rv[pos_c], np.int64(base_term))
        return pa.table({id_col: pa.array(node),
                         "rank": pa.array(out)})

    return ids_ds.map_batches(attach, batch_format="pyarrow")
