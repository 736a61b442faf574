"""kNN nearest-occurrence queries with exact DuckDB oracles (k=5, query set
= every 100th document's derived point)."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ..functions import points
from ..sources.parquet import read_table
from ..stages.derive import derive_points
from ..stages.knn import knn_broadcast
from .registry import register

K = 5
QUERY_MOD = 100


def _query_points(sf_dir: str) -> pd.DataFrame:
    """The bounded kNN query side (1 per ``QUERY_MOD`` documents) — the
    broadcast pattern. Extraction is DISTRIBUTED: the modulo filter runs
    inside map_batches over the single-column read and only the ~1 %
    survivors cross to the driver (never a full table column — the same
    fix as ``ann_queries._queries_df``)."""
    ds = read_table(sf_dir, "documents", ["doc_id"])

    def pick(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(did % QUERY_MOD == 0))

    qids = np.sort(np.concatenate(
        [b["doc_id"].to_numpy(zero_copy_only=False)
         for b in ds.map_batches(pick, batch_format="pyarrow",
                                 zero_copy_batch=True)
         .iter_batches(batch_format="pyarrow")] or
        [np.empty(0, np.int64)]).astype(np.int64))
    qx, qy = points.derive_xy(qids)
    return pd.DataFrame({"id": qids, "x": qx, "y": qy})


def _points_ds(sf_dir: str):
    ds = read_table(sf_dir, "documents", ["doc_id"])
    ds = ds.map_batches(derive_points("doc_id"), batch_format="pyarrow",
                        zero_copy_batch=True)
    return ds.map_batches(lambda t: t.rename_columns(["id", "x", "y"]),
                          batch_format="pyarrow")


def _knn_sql() -> str:
    x, y = points.sql_xy("doc_id")
    return f"""
    WITH pts AS (SELECT doc_id AS id, {x} AS x, {y} AS y FROM documents),
    q AS (SELECT * FROM pts WHERE id % {QUERY_MOD} = 0),
    d AS (SELECT q.id AS query_id, p.id AS neighbor_id,
                 (q.x - p.x) * (q.x - p.x) + (q.y - p.y) * (q.y - p.y) AS d2
          FROM q, pts p WHERE p.id <> q.id)
    SELECT query_id, neighbor_id, d2, CAST(rank AS BIGINT) AS rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY d2, neighbor_id) AS rank FROM d)
    WHERE rank <= {K}"""


@register("knn_nearest_occurrence", sql=_knn_sql)
def knn_nearest_occurrence(sf_dir: str):
    """k=5 nearest occurrence points per query point (broadcast strategy;
    SURVEY.md §2.5 north-star kNN). Distances bit-match the oracle (shared
    op order); ties break by neighbor id."""
    return knn_broadcast(_points_ds(sf_dir), _query_points(sf_dir), K)


@register("knn_cogroup_nearest", sql=_knn_sql)
def knn_cogroup_nearest(sf_dir: str):
    """The cell-cogrouped kNN scale path as a driver query. At these
    parameters (res=3 ring=1 — every query's true k neighbors fall inside
    the ring on the derived-point distribution) the ring candidates are
    complete, so it shares the exact oracle; the general-parameter
    approximation bound is asserted in
    tests/test_knn_ann.py::test_knn_cell_cogroup_matches_broadcast."""
    import ray.data as rd

    from ..stages.knn import knn_cell_cogroup

    qds = rd.from_pandas(_query_points(sf_dir))
    return knn_cell_cogroup(_points_ds(sf_dir), qds, res=3, k=K, ring=1)


@register("knn_cell_exact_nearest", sql=_knn_sql)
def knn_cell_exact_nearest(sf_dir: str):
    """The cell-cogrouped kNN with certified-radius fallback — EXACT, so it
    shares knn_nearest_occurrence's oracle: the driver gate proves the
    scale path equals the brute-force result bit-for-bit."""
    from ..stages.knn import knn_cell_exact

    return knn_cell_exact(_points_ds(sf_dir), _query_points(sf_dir),
                          res=7, k=K, ring=1)


DW_RADIUS = 0.25     # degrees; ~mean NN spacing of the derived points
DW_RES = 5           # cell width 12.51/32 ≈ 0.39 ≥ radius → ring = 1


def _dwithin_sql() -> str:
    x, y = points.sql_xy("doc_id")
    return f"""
    WITH pts AS (SELECT doc_id AS id, {x} AS x, {y} AS y FROM documents)
    SELECT a.id AS id_a, b.id AS id_b,
           (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
    FROM pts a JOIN pts b ON a.id < b.id
    WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
          <= CAST('{DW_RADIUS}' AS DOUBLE) * CAST('{DW_RADIUS}' AS DOUBLE)"""


@register("dwithin_doc_pairs", sql=_dwithin_sql)
def dwithin_doc_pairs(sf_dir: str):
    """ST_DWithin radius self-join (the literal PostGIS capability of the
    north star): all derived-point pairs within 0.25°, via the grid
    ghost-cell cogroup with the exactly-once smaller-id-home rule — one
    shuffle, no O(n²) scan; the oracle IS the O(n²) scan."""
    from ..stages.knn import dwithin_pairs

    return dwithin_pairs(_points_ds(sf_dir), DW_RADIUS, res=DW_RES)


def _knn_interp_sql() -> str:
    x, y = points.sql_xy("doc_id")
    return f"""
    WITH pts AS (SELECT doc_id AS id, {x} AS x, {y} AS y FROM documents),
    q AS (SELECT * FROM pts WHERE id % {QUERY_MOD} = 0),
    d AS (SELECT q.id AS query_id, p.id AS neighbor_id,
                 (q.x - p.x) * (q.x - p.x) + (q.y - p.y) * (q.y - p.y) AS d2
          FROM q, pts p WHERE p.id <> q.id),
    r AS (SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY d2, neighbor_id) AS rank
            FROM d) WHERE rank <= {K})
    SELECT r.query_id,
           CAST(SUM(dd.n_chars) AS BIGINT) AS sum_chars,
           CAST(COUNT(*) AS BIGINT) AS k,
           CAST(CAST(SUM(dd.n_chars) AS BIGINT) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS mean_chars
    FROM r JOIN documents dd ON dd.doc_id = r.neighbor_id
    GROUP BY r.query_id"""


@register("knn_interpolated_chars", sql=_knn_interp_sql)
def knn_interpolated_chars(sf_dir: str):
    """kNN spatial interpolation (uniform-weight kNN regression): for each
    query point, the mean payload value (n_chars) of its k=5 nearest
    occurrence points. The composition anchor kNN → payload join →
    grouped aggregate: the kNN stage emits only (query_id, neighbor_id)
    key pairs, the payload attaches via ONE partitioned hash join (no
    payload broadcast — document payloads are corpus-scale), and the mean
    is exact (integer sum / integer count, one float division at the
    end). The IDW variant swaps the uniform weight for 1/d² inside the
    same shape."""
    from ray.data.aggregate import Count, Sum

    from ..stages.join import hash_join

    knn = knn_broadcast(_points_ds(sf_dir), _query_points(sf_dir), K)
    pairs = knn.map_batches(
        lambda t: t.select(["query_id", "neighbor_id"])
                   .rename_columns(["query_id", "doc_id"]),
        batch_format="pyarrow")
    docs = read_table(sf_dir, "documents", ["doc_id", "n_chars"])
    j = hash_join(pairs, docs, on=["doc_id"])
    agg = j.groupby("query_id").aggregate(
        Sum("n_chars", alias_name="sum_chars"), Count(alias_name="k"))

    def finish(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["query_id", "sum_chars", "k"])
        s = t["sum_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        k = t["k"].to_numpy(zero_copy_only=False).astype(np.float64)
        return t.append_column("mean_chars", pa.array(s / k))

    return agg.map_batches(finish, batch_format="pyarrow")


# ------------------------------------------------------------- Ripley's K
RIPLEY_RADII = (0.05, 0.10, 0.15, 0.20, 0.25)   # ladder ≤ DW_RADIUS


def _ripley_sql() -> str:
    x, y = points.sql_xy("doc_id")
    rmax = RIPLEY_RADII[-1]
    area = np.float64(points._W) * np.float64(points._H)
    rlist = ", ".join(f"CAST('{r}' AS DOUBLE)" for r in RIPLEY_RADII)
    return f"""
    WITH pts AS (SELECT doc_id AS id, {x} AS x, {y} AS y FROM documents),
    p AS (SELECT (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
          FROM pts a JOIN pts b ON a.id < b.id
          WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                <= CAST('{rmax}' AS DOUBLE) * CAST('{rmax}' AS DOUBLE)),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS np FROM pts),
    radii AS (SELECT unnest([{rlist}]) AS r)
    SELECT radii.r,
           CAST(COALESCE(SUM(CASE WHEN p.d2 <= radii.r * radii.r
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS n_pairs,
           CAST('{area!r}' AS DOUBLE)
             * CAST(2 * COALESCE(SUM(CASE WHEN p.d2 <= radii.r * radii.r
                                          THEN 1 ELSE 0 END), 0) AS DOUBLE)
             / CAST((SELECT np * (np - 1) FROM n) AS DOUBLE) AS k_hat
    FROM radii LEFT JOIN p ON true
    GROUP BY radii.r"""


@register("ripley_k_pairs", sql=_ripley_sql)
def ripley_k_pairs(sf_dir: str):
    """Ripley's K point-pattern statistic at a radius ladder: K̂(r) =
    A·2·|{pairs d ≤ r}| / (n(n−1)) (no edge correction — both sides agree
    on the naive estimator). ONE grid ghost-cell pair sweep at the MAX
    radius (dwithin_pairs — exactly-once per pair), then per-batch
    cumulative bin counts; pair distances never leave the cells, only
    5-row partials shuffle. The final division is one pinned IEEE
    expression on both sides."""
    from ..stages.knn import dwithin_pairs

    rmax = RIPLEY_RADII[-1]
    r2s = np.array([np.float64(r) * np.float64(r) for r in RIPLEY_RADII])
    area = np.float64(points._W) * np.float64(points._H)
    n_pts = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    pairs = dwithin_pairs(_points_ds(sf_dir), rmax, res=5)

    def bin_partial(t: pa.Table) -> pa.Table:
        d2 = t["d2"].to_numpy(zero_copy_only=False)
        cnts = (d2[None, :] <= r2s[:, None]).sum(axis=1).astype(np.int64)
        return pa.table({"r_idx": np.arange(len(r2s), dtype=np.int64),
                         "c": cnts})

    from ray.data.aggregate import Sum
    agg = (pairs.map_batches(bin_partial, batch_format="pyarrow")
           .groupby("r_idx").aggregate(Sum("c", alias_name="c"))
           .to_pandas().set_index("r_idx")["c"])
    n_pairs = np.array([int(agg.get(i, 0)) for i in range(len(r2s))],
                       dtype=np.int64)
    k_hat = (area * (2 * n_pairs).astype(np.float64)) \
        / np.float64(n_pts * (n_pts - 1))
    return pd.DataFrame({"r": np.array(RIPLEY_RADII, np.float64),
                         "n_pairs": n_pairs, "k_hat": k_hat})


# ------------------------------------------------------ integer PageRank
PR_BASE = 10 ** 9
PR_ITERS = 3
PR_NUM, PR_DEN = 85, 100


def _pagerank_sql() -> str:
    x, y = points.sql_xy("doc_id")
    bt = (PR_DEN - PR_NUM) * PR_BASE // PR_DEN
    r = DW_RADIUS
    parts = [f"""
    WITH pts AS (SELECT doc_id AS id, {x} AS x, {y} AS y FROM documents),
    e AS (SELECT a.id AS src, b.id AS dst FROM pts a JOIN pts b
          ON a.id <> b.id
          WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                <= CAST('{r}' AS DOUBLE) * CAST('{r}' AS DOUBLE)),
    r0 AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS d,
                  CAST({PR_BASE} AS BIGINT) AS r
           FROM e GROUP BY 1)"""]
    for k in range(1, PR_ITERS + 1):
        parts.append(f""",
    i{k} AS (SELECT e.dst AS id, CAST(SUM(r{k - 1}.r // r{k - 1}.d)
                                      AS BIGINT) AS f
             FROM e JOIN r{k - 1} ON r{k - 1}.id = e.src GROUP BY 1),
    r{k} AS (SELECT r{k - 1}.id, r{k - 1}.d,
                    {bt} + ({PR_NUM} * COALESCE(i{k}.f, 0)) // {PR_DEN} AS r
             FROM r{k - 1} LEFT JOIN i{k} ON i{k}.id = r{k - 1}.id)""")
    parts.append(f"""
    SELECT d.doc_id, COALESCE(rk.r, {bt}) AS pr
    FROM documents d LEFT JOIN r{PR_ITERS} rk ON rk.id = d.doc_id""")
    return "".join(parts)


@register("pagerank_docs", sql=_pagerank_sql)
def pagerank_docs(sf_dir: str):
    """Integer-exact PageRank over the spatial proximity graph (edges =
    doc pairs within DW_RADIUS, undirected): fixed-point ranks with floor
    division so every per-node sum is pure int64 — the iterative
    value-propagation operator (stages/pagerank.py), bit-exact vs the
    unrolled SQL twin. Edge enumeration reuses the exactly-once grid
    cogroup (dwithin_pairs); isolated docs get the damping base."""
    import pyarrow.compute as pc

    from ..stages.knn import dwithin_pairs
    from ..stages.pagerank import integer_pagerank

    pairs = dwithin_pairs(_points_ds(sf_dir), DW_RADIUS, res=DW_RES)

    def both(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False)
        b = t["id_b"].to_numpy(zero_copy_only=False)
        return pa.table({"src": np.concatenate([a, b]),
                         "dst": np.concatenate([b, a])})

    edges = pairs.map_batches(both, batch_format="pyarrow")
    ids = read_table(sf_dir, "documents", ["doc_id"])
    pr = integer_pagerank(edges, ids, id_col="doc_id", iters=PR_ITERS,
                          base=PR_BASE, damp_num=PR_NUM, damp_den=PR_DEN)
    return pr.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"],
                            "pr": pc.cast(t["rank"], pa.int64())}),
        batch_format="pyarrow")


# ---------------------------------------------------------------- IDW
IDW_W0 = 10 ** 12          # weight numerator: w = W0 // (d2q + 1)
IDW_QSCALE = 1e10          # d² quantization


def _idw_sql() -> str:
    x, y = points.sql_xy("doc_id")
    return f"""
    WITH pts AS (SELECT doc_id AS id, {x} AS x, {y} AS y FROM documents),
    q AS (SELECT * FROM pts WHERE id % {QUERY_MOD} = 0),
    d AS (SELECT q.id AS query_id, p.id AS neighbor_id,
                 (q.x - p.x) * (q.x - p.x) + (q.y - p.y) * (q.y - p.y) AS d2
          FROM q, pts p WHERE p.id <> q.id),
    r AS (SELECT query_id, neighbor_id, d2 FROM (
            SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY d2, neighbor_id) AS rank
            FROM d) WHERE rank <= {K}),
    w AS (SELECT query_id, neighbor_id,
                 CAST({IDW_W0} AS BIGINT)
                 // (CAST(floor(d2 * CAST('{IDW_QSCALE!r}' AS DOUBLE)
                                + CAST(0.5 AS DOUBLE)) AS BIGINT) + 1) AS w
          FROM r)
    SELECT w.query_id,
           CAST(SUM(w.w) AS BIGINT) AS sum_w,
           CAST(SUM(w.w * dd.n_chars) AS BIGINT) AS sum_wy,
           CAST(SUM(w.w * dd.n_chars) AS BIGINT)
               // CAST(SUM(w.w) AS BIGINT) AS idw_chars_q
    FROM w JOIN documents dd ON dd.doc_id = w.neighbor_id
    GROUP BY w.query_id"""


@register("idw_interpolated_chars", sql=_idw_sql)
def idw_interpolated_chars(sf_dir: str):
    """Inverse-distance-weighted spatial interpolation — the weighted
    sibling of `knn_interpolated_chars` in the same kNN → payload-join →
    grouped-aggregate shape. Weights are INTEGER rationals
    w = W0 // (quantized d² + 1), so the weighted sums and the final
    floor-divided estimate are bit-exact against the oracle (no float
    weight ever crosses a block boundary)."""
    from ray.data.aggregate import Sum

    from ..stages.join import hash_join

    knn = knn_broadcast(_points_ds(sf_dir), _query_points(sf_dir), K)

    def weights(t: pa.Table) -> pa.Table:
        d2 = t["d2"].to_numpy(zero_copy_only=False)
        d2q = np.floor(d2 * np.float64(IDW_QSCALE)
                       + np.float64(0.5)).astype(np.int64)
        return pa.table({
            "query_id": t["query_id"],
            "doc_id": t["neighbor_id"],
            "w": pa.array(np.int64(IDW_W0) // (d2q + 1))})

    pairs = knn.map_batches(weights, batch_format="pyarrow")
    docs = read_table(sf_dir, "documents", ["doc_id", "n_chars"])
    j = hash_join(pairs, docs, on=["doc_id"])

    def wy(t: pa.Table) -> pa.Table:
        w = t["w"].to_numpy(zero_copy_only=False)
        y = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"query_id": t["query_id"], "w": pa.array(w),
                         "wy": pa.array(w * y)})

    agg = j.map_batches(wy, batch_format="pyarrow") \
        .groupby("query_id").aggregate(Sum("w", alias_name="sum_w"),
                                       Sum("wy", alias_name="sum_wy"))

    def finish(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["query_id", "sum_w", "sum_wy"])
        sw = t["sum_w"].to_numpy(zero_copy_only=False)
        swy = t["sum_wy"].to_numpy(zero_copy_only=False)
        return t.append_column("idw_chars_q", pa.array(swy // sw))

    return agg.map_batches(finish, batch_format="pyarrow")


# ------------------------------------------------------ triangle counting
TRI_RADIUS = 0.05      # sparse proximity graph (avg degree ~ a dozen)
TRI_RES = 6


def _tri_sql() -> str:
    x, y = points.sql_xy("doc_id")
    return f"""
    WITH pts AS (SELECT doc_id AS id, {x} AS x, {y} AS y FROM documents),
    e AS (SELECT a.id AS ia, b.id AS ib FROM pts a JOIN pts b
          ON a.id < b.id
          WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                <= CAST('{TRI_RADIUS}' AS DOUBLE)
                   * CAST('{TRI_RADIUS}' AS DOUBLE)),
    w AS (SELECT e1.ib AS wb, e2.ib AS wc FROM e e1 JOIN e e2
          ON e2.ia = e1.ia AND e2.ib > e1.ib)
    SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*) FROM w) AS BIGINT) AS n_wedges,
           CAST((SELECT COUNT(*) FROM w JOIN e
                 ON e.ia = w.wb AND e.ib = w.wc) AS BIGINT) AS n_triangles"""


@register("triangle_count_docs", sql=_tri_sql)
def triangle_count_docs(sf_dir: str):
    """Exactly-once triangle counting over the sparse proximity graph
    (node-iterator with id-orientation): every edge is oriented low→high,
    each wedge (b, c) is emitted only at its minimum vertex, and wedges
    are verified against the edge set by ONE two-column hash join — each
    triangle counted exactly once at its smallest vertex, no dedup pass.
    Wedge volume is Σ C(d₊(v), 2) — bounded for the sparse radius chosen
    here; for skewed graphs the standard refinement is degree-ordered
    orientation in the same shape."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..stages.join import hash_join
    from ..stages.knn import dwithin_pairs
    from ..stages.shuffle import grouped_apply

    pairs = dwithin_pairs(_points_ds(sf_dir), TRI_RADIUS,
                          res=TRI_RES).select_columns(["id_a", "id_b"])
    edges = pairs.materialize()
    n_edges = edges.count()

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        out_b, out_c = [], []
        for _, g in df.groupby("id_a", sort=False):
            nb = np.sort(g["id_b"].to_numpy(np.int64))
            k = len(nb)
            if k < 2:
                continue
            iu = np.triu_indices(k, 1)
            out_b.append(nb[iu[0]])
            out_c.append(nb[iu[1]])
        if not out_b:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        return pd.DataFrame({"id_a": np.concatenate(out_b),
                             "id_b": np.concatenate(out_c)})

    w = grouped_apply(edges, ["id_a"], wedges)
    w = w.map_batches(
        lambda t: t.append_column("is_wedge",
                                  pa.array(np.ones(len(t), np.int64))),
        batch_format="pyarrow")
    n_wedges = w.count()

    closed = hash_join(w, edges, on=["id_a", "id_b"])
    n_tri = closed.count()

    return pd.DataFrame({"n_edges": np.array([n_edges], np.int64),
                         "n_wedges": np.array([n_wedges], np.int64),
                         "n_triangles": np.array([n_tri], np.int64)})


# ------------------------------------------------------ k-core decomposition
KC_K = 12        # core order: every kept node has ≥ K neighbors in the core
KC_ROUNDS = 12   # SQL unroll depth; the engine asserts convergence within it


def _kcore_sql() -> str:
    x, y = points.sql_xy("doc_id")
    r = DW_RADIUS
    parts = [f"""
    WITH pts AS (SELECT doc_id AS id, {x} AS x, {y} AS y FROM documents),
    e AS MATERIALIZED (SELECT a.id AS ia, b.id AS ib FROM pts a JOIN pts b
          ON a.id <> b.id
          WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                <= CAST('{r}' AS DOUBLE) * CAST('{r}' AS DOUBLE)),
    a0 AS (SELECT DISTINCT ia AS id FROM e)"""]
    for i in range(1, KC_ROUNDS + 1):
        # MATERIALIZED: each level is referenced twice — inlined CTEs
        # would re-evaluate the whole chain 2^KC_ROUNDS times
        parts.append(f""",
    a{i} AS MATERIALIZED (SELECT e.ia AS id FROM e
             JOIN a{i - 1} x ON x.id = e.ia JOIN a{i - 1} y ON y.id = e.ib
             GROUP BY 1 HAVING COUNT(*) >= {KC_K})""")
    parts.append(f"""
    SELECT e.ia AS doc_id, CAST(COUNT(*) AS BIGINT) AS core_deg
    FROM e JOIN a{KC_ROUNDS} x ON x.id = e.ia
           JOIN a{KC_ROUNDS} y ON y.id = e.ib
    GROUP BY 1""")
    return "".join(parts)


@register("kcore_docs", sql=_kcore_sql)
def kcore_docs(sf_dir: str):
    """K-core decomposition of the spatial proximity graph: iteratively
    peel every node with fewer than KC_K surviving neighbors until a
    fixpoint; output the core members with their within-core degree — the
    dense-subgraph extractor (spam/bot rings, dense dup neighborhoods).
    Distributed peeling: each round is one partial-count degree pass +
    two bucketed semi-joins that shrink the edge set (removed nodes stay
    removed — the peel is monotone, so no re-entry check is needed);
    edges repartition+materialize per round (the iterative-loop lesson,
    NOTES.md). Rounds are bounded by the peel depth, asserted ≤
    KC_ROUNDS so the unrolled SQL twin provably reaches the same
    fixpoint; at the fixpoint the last degree table IS the answer."""
    import pyarrow.compute as pc

    from ..stages.join import hash_join
    from ..stages.knn import dwithin_pairs
    from ..stages.shuffle import partial_group_counts

    pairs = dwithin_pairs(_points_ds(sf_dir), DW_RADIUS, res=DW_RES)

    def both(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False)
        b = t["id_b"].to_numpy(zero_copy_only=False)
        return pa.table({"src": np.concatenate([a, b]),
                         "dst": np.concatenate([b, a])})

    e = pairs.map_batches(both, batch_format="pyarrow").materialize()

    for _ in range(KC_ROUNDS):
        deg = partial_group_counts(
            e.select_columns(["src"]), ["src"]).materialize()
        keep = deg.map_batches(
            lambda t: t.filter(pc.greater_equal(t["n"], KC_K))
            .select(["src"]), batch_format="pyarrow").materialize()
        if keep.count() == deg.count():
            out = deg
            break
        e = hash_join(e, keep, on=["src"])
        e = hash_join(
            e, keep.map_batches(lambda t: t.rename_columns(["dst"]),
                                batch_format="pyarrow"),
            on=["dst"]).repartition(8).materialize()
    else:
        raise RuntimeError(
            f"kcore_docs did not converge within {KC_ROUNDS} rounds — "
            f"raise KC_ROUNDS (and the SQL unroll) together")

    return out.map_batches(
        lambda t: pa.table({"doc_id": t["src"],
                            "core_deg": pc.cast(t["n"], pa.int64())}),
        batch_format="pyarrow")


# ------------------------------------------- Knox space-time interaction
KNOX_MOD = 25                     # subset: event_id % MOD = 0 (O(n²) twin)
KNOX_R = 0.25                     # spatial closeness radius (degrees)
KNOX_TAU = 6 * 3600 * 1_000_000   # temporal closeness window (6 h, µs)


def _knox_sql() -> str:
    x, y = points.sql_xy("event_id")
    return f"""
    WITH e AS (SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS t,
                      {x} AS x, {y} AS y
               FROM events WHERE event_id % {KNOX_MOD} = 0),
    p AS (SELECT CASE WHEN (a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y)
                           <= CAST('{KNOX_R}' AS DOUBLE)
                              * CAST('{KNOX_R}' AS DOUBLE)
                      THEN 1 ELSE 0 END AS sp,
                 CASE WHEN abs(a.t - b.t) <= {KNOX_TAU}
                      THEN 1 ELSE 0 END AS tm
          FROM e a JOIN e b ON a.event_id < b.event_id)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_pts,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(sp) AS BIGINT) AS n_space,
           CAST(SUM(tm) AS BIGINT) AS n_time,
           CAST(SUM(sp * tm) AS BIGINT) AS n_both,
           CAST(SUM(sp) AS BIGINT) * CAST(SUM(tm) AS BIGINT) AS knox_num
    FROM p"""


@register("knox_space_time", sql=_knox_sql)
def knox_space_time(sf_dir: str):
    """Knox space-time interaction test (the classic cluster-epidemiology
    statistic): over the deterministic event subset, count pairs close in
    SPACE (d ≤ KNOX_R), close in TIME (|Δt| ≤ KNOX_TAU), and close in
    BOTH — interaction shows as n_both ≫ n_space·n_time / n_pairs (the
    expectation numerator knox_num is emitted; consumer divides). All
    counts are exact:
    - spatial pairs reuse the exactly-once grid-cell cogroup
      (`dwithin_pairs`);
    - temporal pairs run the SAME ghost-cell idea in 1-D: each point is
      home in its ⌊t/τ⌋ bucket and ghosts into the previous one, each
      bucket sorts (t, id) and counts successors within τ by one
      vectorized searchsorted — a pair is counted only at its EARLIER
      point's home bucket;
    - the joint count attaches times to the spatial pairs with two
      bucketed hash joins (the pair table is radius-bounded, never n²).
    The O(n²) twin evaluates both predicates literally."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..stages.join import hash_join
    from ..stages.knn import dwithin_pairs
    from ..stages.shuffle import grouped_apply

    ds = read_table(sf_dir, "events", ["event_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        keep = eid % KNOX_MOD == 0
        eid = eid[keep].astype(np.int64)
        ts = (t["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))[keep]
        x, y = points.derive_xy(eid)
        return pa.table({"id": pa.array(eid), "x": pa.array(x),
                         "y": pa.array(y), "t": pa.array(ts)})

    # spill, don't pin: the prepped point table feeds FOUR consumers
    # (count, the pair cogroup, both endpoint-time attaches) and the
    # pair table is a shuffle product feeding two — Parquet checkpoints
    # for both (state/spill.py convention), column-pruned re-reads
    from ..state.spill import spill_checkpoint

    read_pts = spill_checkpoint(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True), "knox_pts",
        schema=pa.schema([("id", pa.int64()), ("x", pa.float64()),
                          ("y", pa.float64()), ("t", pa.int64())]))
    n_pts = read_pts(columns=["id"]).count()
    n_pairs = n_pts * (n_pts - 1) // 2

    # --- spatial pairs (exactly-once grid cogroup)
    read_pairs = spill_checkpoint(
        dwithin_pairs(read_pts(columns=["id", "x", "y"]), KNOX_R,
                      res=DW_RES), "knox_pairs",
        schema=pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                          ("d2", pa.float64())]))
    pairs = read_pairs()
    n_space = read_pairs(columns=["id_a"]).count()

    # --- joint count: attach both endpoint times, filter |Δt| ≤ τ
    times = read_pts(columns=["id", "t"])
    ta = times.map_batches(lambda t: t.rename_columns(["id_a", "ta"]),
                           batch_format="pyarrow")
    tb = times.map_batches(lambda t: t.rename_columns(["id_b", "tb"]),
                           batch_format="pyarrow")
    j = hash_join(hash_join(pairs, ta, on=["id_a"]),
                  tb, on=["id_b"])
    n_both = j.map_batches(
        lambda t: t.filter(pc.less_equal(
            pc.abs(pc.subtract(t["ta"], t["tb"])), KNOX_TAU)),
        batch_format="pyarrow").count()

    # --- temporal pairs: 1-D ghost-bucket cogroup, earlier-point home
    def tscatter(t: pa.Table) -> pa.Table:
        tt = t["t"].to_numpy(zero_copy_only=False)
        ids = t["id"].to_numpy(zero_copy_only=False)
        b = tt // KNOX_TAU
        return pa.table({
            "bucket": pa.array(np.concatenate([b, b - 1])),
            "t": pa.array(np.concatenate([tt, tt])),
            "id": pa.array(np.concatenate([ids, ids])),
            "home": pa.array(np.concatenate(
                [np.ones(len(tt), np.int64), np.zeros(len(tt), np.int64)]))})

    def tcount(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, g in df.groupby("bucket", sort=False):
            tt = g["t"].to_numpy(np.int64)
            ids = g["id"].to_numpy(np.int64)
            hm = g["home"].to_numpy(np.int64).astype(bool)
            order = np.lexsort((ids, tt))
            ts_s, hm_s = tt[order], hm[order]
            rank = np.arange(len(ts_s))
            hi = np.searchsorted(ts_s, ts_s + KNOX_TAU, side="right")
            rows.append(int((hi - rank - 1)[hm_s].sum()))
        return pd.DataFrame({"c": pd.Series(rows, dtype="int64")})

    scat = read_pts(columns=["id", "t"]).map_batches(
        tscatter, batch_format="pyarrow")
    tparts = grouped_apply(scat, ["bucket"], tcount)
    n_time = int(tparts.aggregate(Sum("c", alias_name="c"))["c"] or 0)

    return pd.DataFrame({
        "n_pts": np.array([n_pts], np.int64),
        "n_pairs": np.array([n_pairs], np.int64),
        "n_space": np.array([n_space], np.int64),
        "n_time": np.array([n_time], np.int64),
        "n_both": np.array([n_both], np.int64),
        "knox_num": np.array([n_space * n_time], np.int64)})


# ---------------------------------------------------------- semivariogram
def _variogram_sql() -> str:
    x, y = points.sql_xy("doc_id")
    rmax = RIPLEY_RADII[-1]
    rlist = ", ".join(f"CAST('{r}' AS DOUBLE)" for r in RIPLEY_RADII)
    return f"""
    WITH pts AS (SELECT d.doc_id AS id, {x} AS x, {y} AS y, d.n_chars
                 FROM documents d),
    p AS (SELECT (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                     AS d2,
                 (a.n_chars - b.n_chars) * (a.n_chars - b.n_chars) AS sq
          FROM pts a JOIN pts b ON a.id < b.id
          WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                <= CAST('{rmax}' AS DOUBLE) * CAST('{rmax}' AS DOUBLE)),
    radii AS (SELECT row_number() OVER () AS idx, r
              FROM (SELECT unnest([{rlist}]) AS r)),
    binned AS (SELECT (SELECT MIN(idx) FROM radii
                       WHERE p.d2 <= radii.r * radii.r) AS bin, sq
               FROM p)
    SELECT radii.r, CAST(COUNT(sq) AS BIGINT) AS n_pairs,
           CAST(COALESCE(SUM(sq), 0) AS BIGINT) AS sum_sqdiff
    FROM radii LEFT JOIN binned ON binned.bin = radii.idx
    GROUP BY radii.r"""


@register("semivariogram_chars", sql=_variogram_sql)
def semivariogram_chars(sf_dir: str):
    """Empirical semivariogram (geostatistics / kriging step 1): per
    distance bin of the radius ladder, the pair count and the exact
    integer Σ(z_i − z_j)² of the payload over all point pairs in the bin
    (γ̂ = sum/(2n), consumer divides). ONE exactly-once dwithin pair
    sweep at the max radius, two bucketed joins attach the endpoint
    payloads (narrow (id, z) rows only), then 5-row partials."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from ..stages.join import hash_join
    from ..stages.knn import dwithin_pairs

    rmax = RIPLEY_RADII[-1]
    r2s = np.array([np.float64(r) * np.float64(r) for r in RIPLEY_RADII])

    pairs = dwithin_pairs(_points_ds(sf_dir), rmax, res=5)
    docs = read_table(sf_dir, "documents", ["doc_id", "n_chars"])
    a = pairs.map_batches(
        lambda t: pa.table({"doc_id": pc.cast(t["id_a"], pa.int64()),
                            "id_b": pc.cast(t["id_b"], pa.int64()),
                            "d2": t["d2"]}), batch_format="pyarrow")
    ja = hash_join(a, docs.map_batches(
        lambda t: t.rename_columns(["doc_id", "za"]),
        batch_format="pyarrow"), on=["doc_id"])
    jb = ja.map_batches(
        lambda t: pa.table({"doc_id": t["id_b"], "za": t["za"],
                            "d2": t["d2"]}), batch_format="pyarrow")
    jab = hash_join(jb, docs.map_batches(
        lambda t: t.rename_columns(["doc_id", "zb"]),
        batch_format="pyarrow"), on=["doc_id"])

    def bin_partial(t: pa.Table) -> pa.Table:
        d2 = t["d2"].to_numpy(zero_copy_only=False)
        za = t["za"].to_numpy(zero_copy_only=False).astype(np.int64)
        zb = t["zb"].to_numpy(zero_copy_only=False).astype(np.int64)
        sq = (za - zb) * (za - zb)
        b = np.searchsorted(r2s, d2, side="left")
        # d2 == r² boundary: side='left' puts it IN the bin (<= semantics)
        b = np.minimum(b, len(r2s) - 1)
        np_ = np.bincount(b, minlength=len(r2s)).astype(np.int64)
        sm = np.zeros(len(r2s), np.int64)
        np.add.at(sm, b, sq)
        return pa.table({"idx": np.arange(len(r2s), dtype=np.int64),
                         "n_pairs": pa.array(np_),
                         "sum_sqdiff": pa.array(sm)})

    agg = (jab.map_batches(bin_partial, batch_format="pyarrow")
           .groupby("idx").aggregate(
               Sum("n_pairs", alias_name="n_pairs"),
               Sum("sum_sqdiff", alias_name="sum_sqdiff"))
           .to_pandas().set_index("idx"))
    import pandas as pd
    n = [int(agg["n_pairs"].get(i, 0)) for i in range(len(r2s))]
    sm = [int(agg["sum_sqdiff"].get(i, 0)) for i in range(len(r2s))]
    return pd.DataFrame({"r": np.array(RIPLEY_RADII, np.float64),
                         "n_pairs": np.array(n, np.int64),
                         "sum_sqdiff": np.array(sm, np.int64)})


# ----------------------------------------------------- co-location mining
CL_RADIUS = 0.1


def _coloc_sql() -> str:
    x, y = points.sql_xy("doc_id")
    return f"""
    WITH pts AS (SELECT d.doc_id AS id, {x} AS x, {y} AS y, d.lang
                 FROM documents d),
    p AS (SELECT LEAST(a.lang, b.lang) AS lang_a,
                 GREATEST(a.lang, b.lang) AS lang_b
          FROM pts a JOIN pts b ON a.id < b.id
          WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                <= CAST('{CL_RADIUS}' AS DOUBLE)
                   * CAST('{CL_RADIUS}' AS DOUBLE))
    SELECT lang_a, lang_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM p GROUP BY 1, 2"""


@register("colocation_lang_pairs", sql=_coloc_sql)
def colocation_lang_pairs(sf_dir: str):
    """Spatial co-location pattern mining: which attribute classes occur
    NEAR each other — per unordered language pair, the number of document
    pairs within the co-location radius. One exactly-once dwithin sweep,
    two narrow label joins, canonical (min, max) pair key, tiny groupby.
    (The lift/participation-ratio step divides these counts by the class
    totals — left to the consumer, the counts are the exact part.)"""
    import pyarrow.compute as pc

    from ..stages.join import hash_join
    from ..stages.knn import dwithin_pairs
    from ..stages.shuffle import partial_group_counts

    pairs = dwithin_pairs(_points_ds(sf_dir), CL_RADIUS, res=5)
    docs = read_table(sf_dir, "documents", ["doc_id", "lang"])
    a = pairs.map_batches(
        lambda t: pa.table({"doc_id": pc.cast(t["id_a"], pa.int64()),
                            "id_b": pc.cast(t["id_b"], pa.int64())}),
        batch_format="pyarrow")
    ja = hash_join(a, docs.map_batches(
        lambda t: t.rename_columns(["doc_id", "la"]),
        batch_format="pyarrow"), on=["doc_id"])
    jb = ja.map_batches(
        lambda t: pa.table({"doc_id": t["id_b"], "la": t["la"]}),
        batch_format="pyarrow")
    jab = hash_join(jb, docs.map_batches(
        lambda t: t.rename_columns(["doc_id", "lb"]),
        batch_format="pyarrow"), on=["doc_id"])

    def canon(t: pa.Table) -> pa.Table:
        la = t["la"].to_numpy(zero_copy_only=False)
        lb = t["lb"].to_numpy(zero_copy_only=False)
        lo = np.minimum(la, lb)
        hi = np.maximum(la, lb)
        return pa.table({"lang_a": pa.array(lo.astype(object),
                                            pa.string()),
                         "lang_b": pa.array(hi.astype(object),
                                            pa.string())})

    rows = jab.map_batches(canon, batch_format="pyarrow")
    agg = partial_group_counts(rows, ["lang_a", "lang_b"],
                               count_col="n_pairs")
    return agg.map_batches(
        lambda t: t.select(["lang_a", "lang_b", "n_pairs"]),
        batch_format="pyarrow")


# ------------------------------------------------- rectangle overlap join

RECT_RES = 5        # cell 12.51/32 ≈ 0.39 > max rect width 0.104 → ≤4 cells


def _rect_sql() -> str:
    x, y = points.sql_xy("doc_id")
    return f"""
    WITH pts AS (SELECT doc_id AS id, {x} AS x, {y} AS y FROM documents),
    r AS (SELECT id,
            x - (1 + id % 13) * CAST('0.004' AS DOUBLE) AS x1,
            x + (1 + id % 13) * CAST('0.004' AS DOUBLE) AS x2,
            y - (1 + id % 7) * CAST('0.006' AS DOUBLE) AS y1,
            y + (1 + id % 7) * CAST('0.006' AS DOUBLE) AS y2
          FROM pts)
    SELECT a.id AS id_a, b.id AS id_b,
           LEAST(a.x2, b.x2) - GREATEST(a.x1, b.x1) AS xo,
           LEAST(a.y2, b.y2) - GREATEST(a.y1, b.y1) AS yo
    FROM r a JOIN r b ON a.id < b.id
    WHERE LEAST(a.x2, b.x2) - GREATEST(a.x1, b.x1) > 0
      AND LEAST(a.y2, b.y2) - GREATEST(a.y1, b.y1) > 0"""


@register("rect_overlap_doc_pairs", sql=_rect_sql)
def rect_overlap_doc_pairs(sf_dir: str):
    """Rectangle-overlap SELF-JOIN (bbox ``ST_Intersects`` — the PostGIS
    ``&&`` primitive behind the reference's spatial filters): each document
    gets a deterministic box around its derived point (half-extents keyed
    by doc_id), and every strictly-overlapping pair is reported exactly
    once via the PBSM reference-point rule (``stages/knn.rect_overlap_pairs``)
    — one cell shuffle, no O(n²) scan; the oracle IS the O(n²) scan."""
    from ..stages.knn import rect_overlap_pairs

    ds = _points_ds(sf_dir)

    def to_rects(t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        hw = (1 + ids % 13).astype(np.float64) * np.float64(0.004)
        hh = (1 + ids % 7).astype(np.float64) * np.float64(0.006)
        return pa.table({"id": ids, "x1": x - hw, "x2": x + hw,
                         "y1": y - hh, "y2": y + hh})

    rects = ds.map_batches(to_rects, batch_format="pyarrow")
    return rect_overlap_pairs(rects, res=RECT_RES)


# ----------------------------------- per-province NN spacing (Clark–Evans)

NN_QUANT = "1000000000.0"     # d² quantizer: exact integer sums across blocks


def _nn_spacing_sql() -> str:
    from ..state import fixtures
    from .geoqueries import _pip_sql, _points_cte

    x, y = points.sql_xy("doc_id")
    return f"""
    WITH pts AS ({_points_cte()}),
    nn AS (SELECT a.doc_id AS doc_id,
                  MIN((a.x - b.x) * (a.x - b.x)
                      + (a.y - b.y) * (a.y - b.y)) AS d2
           FROM pts a JOIN pts b ON b.doc_id <> a.doc_id
           GROUP BY a.doc_id),
    assigned AS ({_pip_sql(fixtures.province_layer, True)})
    SELECT a.name AS province, COUNT(*) AS n,
           CAST(SUM(CAST(floor(nn.d2 * CAST('{NN_QUANT}' AS DOUBLE)
                                + CAST('0.5' AS DOUBLE)) AS BIGINT))
                AS BIGINT) AS sum_d2q
    FROM nn JOIN assigned a USING (doc_id)
    GROUP BY 1"""


@register("nn_spacing_province", sql=_nn_spacing_sql)
def nn_spacing_province(sf_dir: str):
    """Point-pattern spacing statistic per province (the Clark–Evans
    nearest-neighbour index shape, next to Moran's I / Ripley's K /
    Getis-Ord in the spatial-statistics family): every point's
    nearest-neighbour d² via the cell-cogrouped self-kNN (query side is a
    DATASET — no driver collect; k=1, res=3/ring=1, the parameters the
    driver-certified ``knn_cogroup_nearest`` proves complete on this
    distribution), PIP province label per point, then per-province count
    + exact integer sum of quantized d² (float sums never cross blocks —
    the float-determinism playbook)."""
    from ray.data.aggregate import Count, Sum

    from ..stages.join import hash_join
    from ..stages.knn import knn_cell_cogroup
    from .geoqueries import _docs_points
    from ..stages import assign
    from ..sources.parquet import default_pool

    nn = knn_cell_cogroup(_points_ds(sf_dir), _points_ds(sf_dir),
                          res=3, k=1, ring=1)

    def quant(df: pd.DataFrame) -> pd.DataFrame:
        q = np.floor(df["d2"].to_numpy(np.float64)
                     * np.float64(float(NN_QUANT)) + np.float64(0.5))
        return pd.DataFrame({"doc_id": df["query_id"].astype(np.int64),
                             "d2q": q.astype(np.int64)})

    nnq = nn.map_batches(quant, batch_format="pandas")
    prov = _docs_points(sf_dir).map_batches(
        assign.PIPAssigner, batch_format="pyarrow", batch_size=16384,
        concurrency=default_pool(), num_cpus=1) \
        .select_columns(["doc_id", "province"])
    joined = hash_join(nnq, prov, on=["doc_id"])
    agg = joined.groupby("province").aggregate(
        Count(alias_name="n"), Sum("d2q", alias_name="sum_d2q"))
    return agg.map_batches(
        lambda t: t.rename_columns(["province", "n", "sum_d2q"]),
        batch_format="pyarrow")


# ------------------------------------------------------ link prediction
LP_K = 20        # report the top-K candidate links


def _linkpred_sql() -> str:
    x, y = points.sql_xy("doc_id")
    r = TRI_RADIUS
    return f"""
    WITH pts AS (SELECT doc_id AS id, {x} AS x, {y} AS y FROM documents),
    e AS MATERIALIZED (SELECT a.id AS ia, b.id AS ib FROM pts a JOIN pts b
          ON a.id < b.id
          WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                <= CAST('{r}' AS DOUBLE) * CAST('{r}' AS DOUBLE)),
    b AS MATERIALIZED (SELECT ia AS v, ib AS n FROM e
                       UNION ALL SELECT ib AS v, ia AS n FROM e),
    deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM b GROUP BY 1),
    cn AS (SELECT b1.n AS pa_, b2.n AS pb, CAST(COUNT(*) AS BIGINT) AS cn
           FROM b b1 JOIN b b2 ON b1.v = b2.v AND b1.n < b2.n
           GROUP BY 1, 2),
    nonadj AS (SELECT cn.* FROM cn LEFT JOIN e
               ON e.ia = cn.pa_ AND e.ib = cn.pb WHERE e.ia IS NULL),
    top AS (SELECT * FROM nonadj
            ORDER BY cn DESC, pa_, pb LIMIT {LP_K})
    SELECT t.pa_ AS id_a, t.pb AS id_b, t.cn AS common_neighbors,
           da.d + db.d - t.cn AS union_neighbors
    FROM top t JOIN deg da ON da.v = t.pa_ JOIN deg db ON db.v = t.pb"""


@register("link_pred_common_neighbors", sql=_linkpred_sql)
def link_pred_common_neighbors(sf_dir: str):
    """Link prediction over the sparse proximity graph: the LP_K strongest
    NON-adjacent candidate pairs by common-neighbor count (Jaccard comes
    free as cn / union_neighbors — both reported as exact integers so the
    consumer divides at any precision). The classic friend-of-friend
    recommender shape (Liben-Nowell & Kleinberg 2007).

    Distribution: edges via the dwithin grid cogroup; ONE shuffle
    cogroups each vertex's full neighborhood (both directions), wedge
    pairs are generated per center and PRE-COUNTED per block before the
    (pair)-keyed exchange; candidate pairs and the edge set merge in one
    tagged-union bucket pass that sums wedge counts, drops adjacent
    pairs, and keeps a LOCAL top-K per bucket — the driver merges only
    num_buckets × K rows. Degrees attach at the end by filtering the
    degree dataset to the ≤ 2·K winning nodes (broadcast id set), never
    a node-table join for a K-row answer."""
    from ..stages.knn import dwithin_pairs
    from ..stages.shuffle import grouped_apply, partial_group_counts

    pairs = dwithin_pairs(_points_ds(sf_dir), TRI_RADIUS,
                          res=TRI_RES).select_columns(["id_a", "id_b"])
    edges = pairs.materialize()

    both = edges.map_batches(
        lambda t: pa.table({
            "v": pa.concat_arrays([t["id_a"].combine_chunks(),
                                   t["id_b"].combine_chunks()]),
            "n": pa.concat_arrays([t["id_b"].combine_chunks(),
                                   t["id_a"].combine_chunks()])}),
        batch_format="pyarrow")

    def wedge_counts(df: pd.DataFrame) -> pd.DataFrame:
        """Per-bucket wedge pairs, pre-counted before they shuffle."""
        out_a, out_b = [], []
        for _, g in df.groupby("v", sort=False):
            nb = np.sort(g["n"].to_numpy(np.int64))
            k = len(nb)
            if k < 2:
                continue
            iu = np.triu_indices(k, 1)
            out_a.append(nb[iu[0]])
            out_b.append(nb[iu[1]])
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "cn": pd.Series([], dtype="int64"),
                                 "edge": pd.Series([], dtype="int64")})
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        new = np.empty(len(a), bool)
        new[0] = True
        new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        st = np.nonzero(new)[0]
        cnt = np.diff(np.append(st, len(a)))
        return pd.DataFrame({"id_a": a[st], "id_b": b[st],
                             "cn": cnt.astype(np.int64),
                             "edge": np.zeros(len(st), np.int64)})

    wedges = grouped_apply(both, ["v"], wedge_counts)
    etag = edges.map_batches(
        lambda t: t.append_column(
            "cn", pa.array(np.zeros(len(t), np.int64))).append_column(
            "edge", pa.array(np.ones(len(t), np.int64))),
        batch_format="pyarrow")

    def bucket_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["id_a", "id_b"], sort=False).agg(
            cn=("cn", "sum"), edge=("edge", "sum")).reset_index()
        g = g[(g["edge"] == 0) & (g["cn"] > 0)]
        g = g.sort_values(["cn", "id_a", "id_b"],
                          ascending=[False, True, True]).head(LP_K)
        return g[["id_a", "id_b", "cn"]].astype("int64")

    cand = grouped_apply(wedges.union(etag), ["id_a", "id_b"],
                         bucket_topk)
    top = cand.to_pandas().sort_values(
        ["cn", "id_a", "id_b"],
        ascending=[False, True, True]).head(LP_K).reset_index(drop=True)

    deg = partial_group_counts(both, ["v"], count_col="d")
    if not len(top):
        return pd.DataFrame({
            "id_a": pd.Series([], dtype="int64"),
            "id_b": pd.Series([], dtype="int64"),
            "common_neighbors": pd.Series([], dtype="int64"),
            "union_neighbors": pd.Series([], dtype="int64")})
    want = np.unique(np.concatenate([top["id_a"].to_numpy(np.int64),
                                     top["id_b"].to_numpy(np.int64)]))
    want_ref = ray.put(want)
    dsel = deg.map_batches(
        lambda t: t.filter(pa.array(np.isin(
            t["v"].to_numpy(zero_copy_only=False), ray.get(want_ref)))),
        batch_format="pyarrow").to_pandas()
    dmap = dict(zip(dsel["v"].astype(np.int64),
                    dsel["d"].astype(np.int64)))
    da = top["id_a"].map(dmap).to_numpy(np.int64)
    db = top["id_b"].map(dmap).to_numpy(np.int64)
    cn = top["cn"].to_numpy(np.int64)
    return pd.DataFrame({
        "id_a": top["id_a"].astype(np.int64),
        "id_b": top["id_b"].astype(np.int64),
        "common_neighbors": cn,
        "union_neighbors": da + db - cn})


# ------------------------------------------- local clustering coefficient
def _clustering_sql() -> str:
    x, y = points.sql_xy("doc_id")
    r = TRI_RADIUS
    return f"""
    WITH pts AS (SELECT doc_id AS id, {x} AS x, {y} AS y FROM documents),
    e AS MATERIALIZED (SELECT a.id AS ia, b.id AS ib FROM pts a JOIN pts b
          ON a.id < b.id
          WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                <= CAST('{r}' AS DOUBLE) * CAST('{r}' AS DOUBLE)),
    b AS MATERIALIZED (SELECT ia AS v, ib AS n FROM e
                       UNION ALL SELECT ib AS v, ia AS n FROM e),
    deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM b GROUP BY 1),
    w AS (SELECT b1.v, b1.n AS nb, b2.n AS nc FROM b b1 JOIN b b2
          ON b1.v = b2.v AND b1.n < b2.n),
    tri AS (SELECT w.v, CAST(COUNT(*) AS BIGINT) AS t
            FROM w JOIN e ON e.ia = w.nb AND e.ib = w.nc GROUP BY 1)
    SELECT tri.v AS doc_id, tri.t AS n_triangles, deg.d AS degree
    FROM tri JOIN deg ON deg.v = tri.v"""


@register("node_clustering_coeff", sql=_clustering_sql)
def node_clustering_coeff(sf_dir: str):
    """LOCAL clustering coefficient inputs per node: for every vertex of
    the proximity graph that closes at least one triangle, its triangle
    count and degree — cc = 2T/(d(d−1)) is the consumer's one division
    (reported as the exact integer pair, the same rational-output rule as
    Jaccard in `link_pred_common_neighbors`). The transitivity profile
    behind graph-quality audits.

    Shape: same machinery as `triangle_count_docs` but each triangle is
    credited at ALL THREE corners — wedges keep their center v (emitted
    from the full both-direction neighborhood, pre-counted per bucket),
    one (pair)-keyed hash join against the oriented edge set closes
    them, per-v partial counts, one tiny v-keyed join to attach degrees."""
    from ray.data.aggregate import Sum

    from ..stages.join import hash_join
    from ..stages.knn import dwithin_pairs
    from ..stages.shuffle import grouped_apply, partial_group_counts

    pairs = dwithin_pairs(_points_ds(sf_dir), TRI_RADIUS,
                          res=TRI_RES).select_columns(["id_a", "id_b"])
    edges = pairs.materialize()

    both = edges.map_batches(
        lambda t: pa.table({
            "v": pa.concat_arrays([t["id_a"].combine_chunks(),
                                   t["id_b"].combine_chunks()]),
            "n": pa.concat_arrays([t["id_b"].combine_chunks(),
                                   t["id_a"].combine_chunks()])}),
        batch_format="pyarrow")

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        out_v, out_b, out_c = [], [], []
        for v, g in df.groupby("v", sort=False):
            nb = np.sort(g["n"].to_numpy(np.int64))
            k = len(nb)
            if k < 2:
                continue
            iu = np.triu_indices(k, 1)
            out_v.append(np.full(len(iu[0]), v, np.int64))
            out_b.append(nb[iu[0]])
            out_c.append(nb[iu[1]])
        if not out_v:
            return pd.DataFrame({"v": pd.Series([], dtype="int64"),
                                 "id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        return pd.DataFrame({"v": np.concatenate(out_v),
                             "id_a": np.concatenate(out_b),
                             "id_b": np.concatenate(out_c)})

    w = grouped_apply(both, ["v"], wedges)
    closed = hash_join(w, edges, on=["id_a", "id_b"])
    tri = partial_group_counts(closed.select_columns(["v"]), ["v"],
                               count_col="n_triangles")
    deg = partial_group_counts(both, ["v"], count_col="degree")
    out = hash_join(tri, deg, on=["v"])
    return out.map_batches(
        lambda t: pa.table({
            "doc_id": t["v"],
            "n_triangles": t["n_triangles"],
            "degree": t["degree"]}),
        batch_format="pyarrow")


# ------------------------------------------------ degree assortativity
def _assort_sql() -> str:
    x, y = points.sql_xy("doc_id")
    r = TRI_RADIUS
    return f"""
    WITH pts AS (SELECT doc_id AS id, {x} AS x, {y} AS y FROM documents),
    e AS MATERIALIZED (SELECT a.id AS ia, b.id AS ib FROM pts a JOIN pts b
          ON a.id < b.id
          WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                <= CAST('{r}' AS DOUBLE) * CAST('{r}' AS DOUBLE)),
    b AS (SELECT ia AS v, ib AS n FROM e
          UNION ALL SELECT ib AS v, ia AS n FROM e),
    deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM b GROUP BY 1)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
           CAST(SUM(da.d * db.d) AS BIGINT) AS sum_dadb,
           CAST(SUM(da.d + db.d) AS BIGINT) AS sum_d,
           CAST(SUM(da.d * da.d + db.d * db.d) AS BIGINT) AS sum_d2
    FROM e JOIN deg da ON da.v = e.ia JOIN deg db ON db.v = e.ib"""


@register("degree_assortativity_terms", sql=_assort_sql)
def degree_assortativity_terms(sf_dir: str):
    """Degree-assortativity (Newman 2002) moment terms over the proximity
    graph — the exact integer sums (m, Σdₐd_b, Σ(dₐ+d_b), Σ(dₐ²+d_b²))
    from which the Pearson degree correlation is one rational expression
    (consumer divides; the engine never touches a float). Positive
    assortativity = hubs link to hubs — the structural health check for
    similarity graphs before clustering on them.

    Shape: degrees via both-direction partial counts; each of the two
    endpoint-degree attachments is ONE v-keyed hash join of the edge list
    against the (node, degree) table (no broadcast — node count is
    corpus-scale); the moments reduce as per-batch int64 partials."""
    from ray.data.aggregate import Sum

    from ..stages.join import hash_join
    from ..stages.knn import dwithin_pairs
    from ..stages.shuffle import partial_group_counts

    pairs = dwithin_pairs(_points_ds(sf_dir), TRI_RADIUS,
                          res=TRI_RES).select_columns(["id_a", "id_b"])
    edges = pairs.materialize()
    both = edges.map_batches(
        lambda t: pa.table({
            "v": pa.concat_arrays([t["id_a"].combine_chunks(),
                                   t["id_b"].combine_chunks()])}),
        batch_format="pyarrow")
    deg = partial_group_counts(both, ["v"], count_col="d")

    da = deg.map_batches(lambda t: t.rename_columns(["id_a", "da"]),
                         batch_format="pyarrow")
    db = deg.map_batches(lambda t: t.rename_columns(["id_b", "db"]),
                         batch_format="pyarrow")
    j = hash_join(hash_join(edges, da, on=["id_a"]),
                  db, on=["id_b"])

    def partial(t: pa.Table) -> pa.Table:
        a = t["da"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["db"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "n_edges": pa.array([np.int64(len(a))]),
            "sum_dadb": pa.array([(a * b).sum()]),
            "sum_d": pa.array([(a + b).sum()]),
            "sum_d2": pa.array([(a * a + b * b).sum()])})

    agg = j.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("n_edges", alias_name="n_edges"),
        Sum("sum_dadb", alias_name="sum_dadb"),
        Sum("sum_d", alias_name="sum_d"),
        Sum("sum_d2", alias_name="sum_d2"))
    return pd.DataFrame({k: np.array([agg[k]], np.int64)
                         for k in ["n_edges", "sum_dadb",
                                   "sum_d", "sum_d2"]})
