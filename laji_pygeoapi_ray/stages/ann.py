"""Similarity search over an embedding column (``list<float>``).

Training-data-pipeline capability (not in the reference, which has no
embeddings; required by the engine brief): approximate-nearest-neighbor over
``embeddings.embedding`` with

- :func:`ann_topk_broadcast` — exact brute-force baseline: the Q query
  vectors are broadcast (``ray.put`` once), each batch does one numpy
  matmul against them, emits per-batch top-k candidates, and a tiny
  ``groupby(query_id)`` merge finishes. Scores are *quantized-integer dot
  products*: both numpy and the DuckDB oracle first map every component
  through ``floor(x·10⁶ + 0.5)`` (float64), so all products/sums stay below
  2⁵³ and are EXACT regardless of summation order — bit-identical scores,
  deterministic ranking (ties by neighbor id).

- :class:`LshAnnIndex` / :func:`ann_topk_lsh` — the scale path: sign-random-
  projection LSH buckets (B bits → 2^B buckets, T tables); candidates =
  bucket collisions in any table, then exact re-score. Recall is asserted
  vs the brute-force baseline in tests.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

SCALE = 1_000_000.0


def quantize(mat: np.ndarray) -> np.ndarray:
    """float32/64 (n, d) → integer-valued float64 (exact dot products)."""
    return np.floor(mat.astype(np.float64) * SCALE + 0.5)


def _emb_matrix(batch: pa.Table, col: str) -> np.ndarray:
    """Embedding column → (n, d) ndarray; handles Arrow list arrays and
    Ray's ArrowTensorArray extension (from_pandas round-trips to the latter)."""
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if hasattr(arr, "flatten") and isinstance(arr, (pa.ListArray, pa.LargeListArray, pa.FixedSizeListArray)):
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        d = len(flat) // len(batch)
        return flat.reshape(len(batch), d)
    np_arr = arr.to_numpy(zero_copy_only=False)
    return np.stack(list(np_arr)) if np_arr.dtype == object else np.asarray(np_arr)


def ann_topk_broadcast(emb_ds, queries: pd.DataFrame, k: int,
                       *, id_col: str = "vec_id", emb_col: str = "embedding",
                       exclude_self: bool = True, label_col: str | None = None):
    """Exact top-k by quantized dot product for each broadcast query vector.
    Returns a Dataset (query_id, neighbor_id, score, rank).

    With ``label_col`` (present in BOTH ``queries`` and the corpus batches)
    only DIFFERENT-label neighbors compete — hard-negative mining for
    contrastive training (the nearest wrong-label example per anchor)."""
    qid = queries[id_col].to_numpy(np.int64)
    qm = quantize(np.stack(queries[emb_col].to_numpy()))
    qlab = (queries[label_col].to_numpy(np.int64)
            if label_col is not None else None)
    q_ref = ray.put((qid, qm, qlab))

    def scan(batch: pa.Table) -> pa.Table:
        bqid, bqm, bqlab = ray.get(q_ref)
        pid = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pm = quantize(_emb_matrix(batch, emb_col))
        scores = bqm @ pm.T                      # (Q, n) exact integers
        if bqlab is not None:
            plab = batch[label_col].to_numpy(
                zero_copy_only=False).astype(np.int64)
            scores = np.where(bqlab[:, None] == plab[None, :], -np.inf,
                              scores)
        if exclude_self:
            scores = np.where(bqid[:, None] == pid[None, :], -np.inf, scores)
        kk = min(k, scores.shape[1])
        order = np.lexsort((np.broadcast_to(pid, scores.shape), -scores),
                           axis=1)[:, :kk]
        oq = np.repeat(bqid, kk)
        op = pid[order].ravel()
        os = np.take_along_axis(scores, order, axis=1).ravel()
        keep = np.isfinite(os)
        return pa.table({"query_id": oq[keep], "neighbor_id": op[keep],
                         "score": os[keep]})

    cands = emb_ds.map_batches(scan, batch_format="pyarrow")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["query_id", "score", "neighbor_id"],
                            ascending=[True, False, True], kind="mergesort")
        df = df.groupby("query_id", sort=False).head(k).copy()
        df["rank"] = df.groupby("query_id", sort=False).cumcount() + 1
        return df

    return cands.groupby("query_id").map_groups(finish, batch_format="pandas")


class LshAnnIndex:
    """Actor-pool ANN stage: sign-random-projection LSH over ONE corpus
    shard. ``__init__`` (once per actor) draws the deterministic
    projection planes, hashes the shard into T bucket tables; ``__call__``
    hashes each query batch, gathers bucket collisions, exact-rescored.
    With ``with_rank=False`` it emits unranked shard candidates for the
    cross-shard merge in :func:`ann_topk_lsh`."""

    def __init__(self, corpus_ref, k: int, n_bits: int = 12,
                 n_tables: int = 4, seed: int = 42, with_rank: bool = True):
        self.with_rank = with_rank
        cid, cm = (ray.get(corpus_ref)
                   if isinstance(corpus_ref, ray.ObjectRef) else corpus_ref)
        self.k = k
        self.cid = cid
        self.cm = quantize(cm)
        d = cm.shape[1]
        rng = np.random.default_rng(seed)
        self.planes = [rng.standard_normal((d, n_bits)) for _ in range(n_tables)]
        self.weights = (1 << np.arange(n_bits)).astype(np.int64)
        self.tables = []
        for P in self.planes:
            codes = ((self.cm @ P) > 0) @ self.weights
            order = np.argsort(codes, kind="stable")
            self.tables.append((codes[order], order))

    def _candidates_flat(self, qm: np.ndarray):
        """All bucket-collision (query_idx, candidate_idx) pairs, deduped —
        fully vectorized (the per-table bucket gather uses the
        concatenate-ranges idiom, the cross-table dedup one lexsort)."""
        parts_q, parts_c = [], []
        for P, (codes_sorted, order) in zip(self.planes, self.tables):
            qcodes = ((qm @ P) > 0) @ self.weights
            lo = np.searchsorted(codes_sorted, qcodes, side="left")
            hi = np.searchsorted(codes_sorted, qcodes, side="right")
            lens = hi - lo
            tot = int(lens.sum())
            if tot == 0:
                continue
            starts = np.repeat(np.cumsum(lens) - lens, lens)
            flat = np.arange(tot) - starts + np.repeat(lo, lens)
            parts_c.append(order[flat])
            parts_q.append(np.repeat(np.arange(len(qm)), lens))
        if not parts_q:
            return (np.empty(0, np.int64), np.empty(0, np.int64))
        q = np.concatenate(parts_q)
        c = np.concatenate(parts_c)
        o = np.lexsort((c, q))
        q, c = q[o], c[o]
        keep = np.r_[True, (q[1:] != q[:-1]) | (c[1:] != c[:-1])]
        return q[keep], c[keep]

    def __call__(self, batch: pa.Table) -> pa.Table:
        qid = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        qm = quantize(_emb_matrix(batch, "embedding"))
        qidx, cand = self._candidates_flat(qm)
        if len(cand):
            keep = self.cid[cand] != qid[qidx]
            qidx, cand = qidx[keep], cand[keep]
        if not len(cand):
            cols = {"query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64())}
            if self.with_rank:
                cols["rank"] = pa.array([], pa.int64())
            return pa.table(cols)
        scores = np.einsum("ij,ij->i", self.cm[cand], qm[qidx])
        # per-query top-k: one global lexsort by (query, -score, cid),
        # then positional rank within each query segment
        order = np.lexsort((self.cid[cand], -scores, qidx))
        qs_, cs_, ss_ = qidx[order], cand[order], scores[order]
        first = np.r_[True, qs_[1:] != qs_[:-1]]
        grp_start = np.maximum.accumulate(
            np.where(first, np.arange(len(qs_)), 0))
        pos = np.arange(len(qs_)) - grp_start
        sel = pos < self.k
        cols = {"query_id": qid[qs_[sel]],
                "neighbor_id": self.cid[cs_[sel]],
                "score": ss_[sel]}
        if self.with_rank:
            cols["rank"] = pos[sel] + 1
        return pa.table(cols)


def shard_corpus_refs(emb_ds, n_shards: int, *, id_col: str = "vec_id",
                      emb_col: str = "embedding") -> list:
    """Corpus Dataset → ``n_shards`` object-store refs of (ids, matrix),
    WITHOUT the corpus ever touching the driver: the Dataset's block refs
    are grouped and each group is packed into its shard matrix by a remote
    task whose return value stays in the object store — the driver only
    moves ObjectRefs around."""
    @ray.remote
    def pack(idc, embc, *blocks):
        t = pa.concat_tables([b.select([idc, embc]) for b in blocks],
                             promote_options="default")
        ids = t[idc].to_numpy(zero_copy_only=False).astype(np.int64)
        return ids, _emb_matrix(t, embc)

    refs = emb_ds.to_arrow_refs()
    groups = [refs[i::n_shards] for i in range(n_shards)]
    return [pack.remote(id_col, emb_col, *g) for g in groups if g]


def ann_topk_lsh(emb_ds, queries_ds, k: int, *, n_shards: int = 4,
                 num_buckets: int | None = None, **lsh_kw):
    """Sharded LSH ANN — the scale path: the corpus splits into
    ``n_shards`` object-store shards (no whole-corpus broadcast), each
    shard gets its own :class:`LshAnnIndex` actor pool that every query
    batch streams through, and a final per-query merge keeps the global
    top-k (the same shard-then-merge pattern as ``knn_broadcast``).
    Accepts a Dataset or a pyarrow Table for the corpus side."""
    import ray.data as rd

    from .shuffle import grouped_apply

    if isinstance(emb_ds, pa.Table):
        emb_ds = rd.from_arrow(emb_ds)
    shard_refs = shard_corpus_refs(emb_ds, n_shards)
    per_shard = [
        queries_ds.map_batches(
            LshAnnIndex, fn_constructor_args=(ref, k),
            fn_constructor_kwargs={**lsh_kw, "with_rank": False},
            batch_format="pyarrow", batch_size=4096,
            concurrency=(1, 2), num_cpus=1)
        for ref in shard_refs]
    cands = per_shard[0]
    if len(per_shard) > 1:
        cands = cands.union(*per_shard[1:])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["query_id", "score", "neighbor_id"],
                            ascending=[True, False, True], kind="mergesort")
        df = df.groupby("query_id", sort=False).head(k).copy()
        df["rank"] = df.groupby("query_id", sort=False).cumcount() + 1
        return df

    return grouped_apply(cands, ["query_id"], finish,
                         num_buckets=num_buckets)


def pack_broadcast_side(emb_ds, *, scale: float = 1000.0,
                        id_col: str = "vec_id",
                        emb_col: str = "embedding"):
    """Pack a BOUNDED embedding Dataset into one object-store ref of
    (ids, quantized matrix, squared norms) for the broadcast side of
    :func:`cosine_threshold_pairs`. The packing runs in a REMOTE task
    over the Dataset's block refs — the vectors never land on the driver
    (same pattern as :func:`shard_corpus_refs`).

    Callers must bound the input themselves (a filtered subset / one
    LSH bucket / one shard): packing an unbounded corpus here is exactly
    the 100-TB trap this explicit helper exists to make visible — for a
    full-corpus sweep use :func:`cosine_pairs_lsh` instead."""
    @ray.remote
    def pack(idc, embc, s, *blocks):
        t = pa.concat_tables([b.select([idc, embc]) for b in blocks],
                             promote_options="default")
        ids = t[idc].to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.floor(_emb_matrix(t, embc).astype(np.float64)
                     * s + 0.5).astype(np.int64)
        return ids, m, (m * m).sum(axis=1)

    return pack.remote(id_col, emb_col, scale, *emb_ds.to_arrow_refs())


def cosine_threshold_pairs(emb_ds, subset_ref, *,
                           tau2: tuple[int, int] = (361, 400),
                           scale: float = 1000.0,
                           id_col: str = "vec_id",
                           emb_col: str = "embedding"):
    """Embedding-cosine near-duplicate pairs — EXACT threshold self-join:
    emit (id_a, id_b, dot) for every pair with cosine ≥ τ, computed in
    pure integer arithmetic so the result is bit-stable and SQL-twinnable:

        cos ≥ τ  ⇔  dot > 0  and  den·dot² ≥ num·|a|²·|b|²

    with (num, den) = (τ²·den, den) as an exact rational (default
    361/400 = 0.95²) over ``scale``-quantized int64 components (bounds:
    dim·(scale·max|x|)² products stay far below 2⁶³ — no rounding anywhere).

    ``subset_ref`` (REQUIRED — build with :func:`pack_broadcast_side`) is
    the bounded broadcast side; the full-corpus sweep with no broadcast
    side at all is :func:`cosine_pairs_lsh`."""
    num, den = int(tau2[0]), int(tau2[1])
    if subset_ref is None:
        raise ValueError(
            "cosine_threshold_pairs requires an explicit bounded "
            "subset_ref (pack_broadcast_side); for a full-corpus sweep "
            "use cosine_pairs_lsh — broadcasting the whole corpus is the "
            "O(n^2) trap this signature forbids")

    def scan(batch: pa.Table) -> pa.Table:
        cid, cm, cn2 = ray.get(subset_ref)
        bid = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bm = np.floor(_emb_matrix(batch, emb_col).astype(np.float64)
                      * scale + 0.5).astype(np.int64)
        bn2 = (bm * bm).sum(axis=1)
        d = bm @ cm.T                                  # int64 exact
        ok = ((bid[:, None] < cid[None, :]) & (d > 0)
              & (den * d * d >= num * (bn2[:, None] * cn2[None, :])))
        ia, ib = np.nonzero(ok)
        return pa.table({"id_a": bid[ia], "id_b": cid[ib],
                         "dot": d[ia, ib]})

    return emb_ds.map_batches(scan, batch_format="pyarrow")


def _srp_planes(d: int, n_bits: int, n_tables: int, seed: int) -> np.ndarray:
    """Deterministic sign-random-projection planes, (T, d, B)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, d, n_bits))


def cosine_pairs_lsh(emb_ds, *, tau2: tuple[int, int] = (361, 400),
                     scale: float = 1000.0, n_bits: int = 4,
                     n_tables: int = 128, seed: int = 42,
                     id_col: str = "vec_id", emb_col: str = "embedding",
                     num_buckets: int | None = None, group_cap: int = 65536):
    """Full-corpus cosine near-dup sweep — NO broadcast side: sign-random-
    projection LSH buckets + the exact integer rational-τ verifier inside
    each bucket (the scale path `cosine_threshold_pairs` documents).

    Shape: one map_batches explodes every vector into its T per-table
    bucket keys (band_key = table·2^B + signcode, quantized embedding
    rides along as a fixed-size int64 list); ONE hash shuffle on band_key
    cogroups colliding vectors; each bucket runs the all-pairs integer
    test vectorized; a final (id_a, id_b) shuffle dedups pairs found in
    several tables. Only bucket-collision pairs are ever scored — no
    O(n²) matmul, no whole-corpus object.

    Recall is probabilistic in general (P[collide] = 1-(1-(1-θ/π)^B)^T);
    the defaults (B=4, T=128) are sized for the synthetic fixture's LOW
    τ (cos ≥ 0.3, θ≈72°) where hyperplane LSH is weakest — a borderline
    τ=0.3 pair misses one table with prob ≈0.873, so T=128 leaves a
    per-pair miss prob of ~3e-8 (T=64's ~1.7e-4 measurably dropped ONE
    of the 14,931 qualifying pairs on the sf0.1 fixture — the full
    3-sf sweep now verifies exactness empirically). At real near-dup
    thresholds (τ ≥ 0.9, θ ≤ 26°) a handful of tables gives the same
    recall and the T-fold explode shrinks accordingly. Buckets
    larger than ``group_cap`` (degenerate codes) are skipped, mirroring
    minhash's stop-bucket pruning (`simdedup.py`)."""
    from .shuffle import grouped_apply

    num, den = int(tau2[0]), int(tau2[1])
    weights = (1 << np.arange(n_bits)).astype(np.int64)

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _emb_matrix(t, emb_col).astype(np.float64)
        mq = np.floor(m * scale + 0.5).astype(np.int64)
        d = mq.shape[1]
        planes = _srp_planes(d, n_bits, n_tables, seed)
        n = len(ids)
        keys = np.empty((n_tables, n), dtype=np.int64)
        for ti in range(n_tables):
            codes = ((mq @ planes[ti]) > 0) @ weights
            keys[ti] = ti * (1 << n_bits) + codes
        flat = np.tile(mq, (n_tables, 1))
        return pa.table({
            "band_key": keys.ravel(),
            "id": np.tile(ids, n_tables),
            "emb": pa.FixedSizeListArray.from_arrays(
                pa.array(flat.ravel()), d),
        })

    exploded = emb_ds.map_batches(explode, batch_format="pyarrow")

    def verify_bucket(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("band_key", sort=False):
            if len(g) < 2 or len(g) > group_cap:
                continue
            gids = g["id"].to_numpy(np.int64)
            gm = np.stack(g["emb"].to_numpy()).astype(np.int64)
            n2 = (gm * gm).sum(axis=1)
            dmat = gm @ gm.T
            ok = ((gids[:, None] < gids[None, :]) & (dmat > 0)
                  & (den * dmat * dmat >= num * (n2[:, None] * n2[None, :])))
            ia, ib = np.nonzero(ok)
            if len(ia):
                outs.append(pd.DataFrame({"id_a": gids[ia],
                                          "id_b": gids[ib],
                                          "dot": dmat[ia, ib]}))
        if not outs:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "dot": pd.Series([], dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    pairs = grouped_apply(exploded, ["band_key"], verify_bucket,
                          num_buckets=num_buckets)
    return grouped_apply(
        pairs, ["id_a", "id_b"],
        lambda df: df.drop_duplicates(subset=["id_a", "id_b"]),
        num_buckets=num_buckets)


def fit_ivf_centroids(sample: np.ndarray, n_lists: int,
                      n_iters: int = 8) -> np.ndarray:
    """Deterministic k-means (IVF coarse quantizer): init = evenly-spaced
    sample rows (no RNG), fixed Lloyd iterations, empty clusters re-seeded
    from the farthest points. Pure numpy; fit on a driver-side SAMPLE (the
    quantizer is tiny), applied distributed."""
    sample = np.asarray(sample, dtype=np.float64)
    idx = np.linspace(0, len(sample) - 1, n_lists).astype(np.int64)
    cent = sample[idx].copy()
    for _ in range(n_iters):
        d2 = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = d2.argmin(1)
        for c in range(n_lists):
            m = assign == c
            if m.any():
                cent[c] = sample[m].mean(0)
            else:                       # re-seed from the farthest point
                cent[c] = sample[d2.min(1).argmax()]
    return cent


def ann_topk_ivf(emb_ds, queries: pd.DataFrame, k: int, *,
                 n_lists: int = 16, n_probe: int = 4,
                 id_col: str = "vec_id", emb_col: str = "embedding",
                 num_buckets: int | None = None):
    """IVF ANN — the learned-bucket scale path (complement to the LSH
    variant): a tiny deterministic k-means quantizer (broadcast) routes
    every corpus vector to its nearest list in one map_batches; each query
    replicates to its ``n_probe`` nearest lists; ONE hash shuffle on the
    list id cogroups them and a vectorized per-list exact top-k + per-query
    merge finishes — the same cogroup shape as ``knn_cell_cogroup``, with
    learned Voronoi cells instead of grid cells. Recall vs brute force is
    asserted in tests."""
    from .shuffle import grouped_apply

    qid = queries[id_col].to_numpy(np.int64)
    qm = np.stack(queries[emb_col].to_numpy()).astype(np.float64)
    # fit the quantizer on a deterministic CORPUS sample (hash-rank
    # membership, packed by a remote task — the sample never rides through
    # the driver-side queries table), not on the queries
    from .sampling import id_hash

    @ray.remote
    def pack_sample(idc, embc, mod, *blocks):
        t = pa.concat_tables([b.select([idc, embc]) for b in blocks],
                             promote_options="default")
        ids = t[idc].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (id_hash(ids) % mod) == 0
        m = _emb_matrix(t, embc).astype(np.float64)
        return m[keep]

    sample = ray.get(pack_sample.remote(id_col, emb_col, 4,
                                        *emb_ds.to_arrow_refs()))
    if len(sample) < n_lists:
        sample = qm
    cent = fit_ivf_centroids(sample, n_lists)
    cent_ref = ray.put(cent)
    qmq = quantize(qm)

    def tag_corpus(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _emb_matrix(t, emb_col).astype(np.float64)
        d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        mq = quantize(m)
        return pa.table({"list_id": d2.argmin(1).astype(np.int64),
                         "side": np.zeros(len(t), dtype=np.int8),
                         "id": ids,
                         "emb": pa.FixedSizeListArray.from_arrays(
                             pa.array(mq.ravel()), mq.shape[1])})

    # queries: replicate to n_probe nearest lists (driver-side small table)
    qd2 = ((qm[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
    probes = np.argsort(qd2, axis=1, kind="stable")[:, :n_probe]
    qrep = np.repeat(qmq, n_probe, axis=0)
    q_tbl = pa.table({
        "list_id": probes.ravel().astype(np.int64),
        "side": np.ones(probes.size, dtype=np.int8),
        "id": np.repeat(qid, n_probe),
        "emb": pa.FixedSizeListArray.from_arrays(
            pa.array(qrep.ravel()), qrep.shape[1]),
    })
    import ray.data as rd
    tagged = emb_ds.map_batches(tag_corpus, batch_format="pyarrow") \
        .union(rd.from_arrow(q_tbl))

    def per_list(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("list_id", sort=False):
            pts = g[g["side"] == 0]
            qs = g[g["side"] == 1]
            if pts.empty or qs.empty:
                continue
            pm = np.stack(pts["emb"].to_numpy())
            qm_ = np.stack(qs["emb"].to_numpy())
            pid = pts["id"].to_numpy(np.int64)
            qids_ = qs["id"].to_numpy(np.int64)
            scores = qm_ @ pm.T
            scores = np.where(qids_[:, None] == pid[None, :], -np.inf,
                              scores)
            kk = min(k, scores.shape[1])
            order = np.lexsort((np.broadcast_to(pid, scores.shape),
                                -scores), axis=1)[:, :kk]
            oq = np.repeat(qids_, kk)
            op = pid[order].ravel()
            os_ = np.take_along_axis(scores, order, axis=1).ravel()
            keep = np.isfinite(os_)
            outs.append(pd.DataFrame({"query_id": oq[keep],
                                      "neighbor_id": op[keep],
                                      "score": os_[keep]}))
        if not outs:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 "neighbor_id": pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64")})
        return pd.concat(outs, ignore_index=True)

    cands = grouped_apply(tagged, ["list_id"], per_list,
                          num_buckets=num_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(subset=["query_id", "neighbor_id"])
        df = df.sort_values(["query_id", "score", "neighbor_id"],
                            ascending=[True, False, True], kind="mergesort")
        df = df.groupby("query_id", sort=False).head(k).copy()
        df["rank"] = df.groupby("query_id", sort=False).cumcount() + 1
        return df

    return cands.groupby("query_id").map_groups(finish,
                                                batch_format="pandas")


def exact_seed_centroids(emb_ds, n_clusters: int, *, id_col: str = "vec_id",
                         emb_col: str = "embedding") -> np.ndarray:
    """Deterministic no-RNG centroid seeds: the ``n_clusters`` corpus
    vectors with the lowest ``(id_hash(id), id)`` rank, QUANTIZED — the
    SQL-reproducible init shared by :func:`kmeans_assign_exact` and
    :func:`pq_assign_exact`. Per-batch partial top-k scan, driver merge
    of k rows (k×d floats — never the corpus)."""
    from .sampling import id_hash

    def seed_scan(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = id_hash(ids)
        order = np.lexsort((ids, h))[:n_clusters]
        m = quantize(_emb_matrix(t, emb_col))[order]
        return pa.table({"h": h[order], "id": ids[order],
                         "emb": pa.FixedSizeListArray.from_arrays(
                             pa.array(m.ravel()), m.shape[1])})

    seeds = pa.concat_tables(
        [b for b in emb_ds.map_batches(seed_scan, batch_format="pyarrow")
         .iter_batches(batch_size=None, batch_format="pyarrow")],
        promote_options="default")
    top = np.lexsort((seeds["id"].to_numpy(zero_copy_only=False),
                      seeds["h"].to_numpy(zero_copy_only=False)))[:n_clusters]
    return _emb_matrix(seeds, "emb").astype(np.float64)[top]


def pq_assign_exact(emb_ds, n_sub: int, n_clusters: int, *,
                    id_col: str = "vec_id", emb_col: str = "embedding"):
    """Product-quantization CODE ASSIGNMENT, integer-exact (Jégou et al.
    2011 — the compression layer every 10¹²-vector ANN index runs on):
    the embedding splits into ``n_sub`` contiguous subspaces; each
    subspace's codebook is the shared seed set's subvectors; each vector
    gets the argmin-d² codeword per subspace (ties → lowest index) and
    the packed code Σ cᵢ·kⁱ. Quantized elements make every subspace
    distance an exact integer, so the assignment is SQL-checkable.
    One broadcast (k×d codebook), one stateless map — nothing shuffles."""
    cent = exact_seed_centroids(emb_ds, n_clusters, id_col=id_col,
                                emb_col=emb_col)
    cent_ref = ray.put(cent)

    def assign_fn(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = quantize(_emb_matrix(t, emb_col))
        d = m.shape[1]
        w = d // n_sub
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {id_col: pa.array(ids)}
        code = np.zeros(len(ids), np.int64)
        for s in range(n_sub):
            ms = m[:, s * w:(s + 1) * w]
            cs = c[:, s * w:(s + 1) * w]
            d2 = ((ms[:, None, :] - cs[None, :, :]) ** 2).sum(-1)
            cls = d2.argmin(1).astype(np.int64)
            cols[f"c{s}"] = pa.array(cls)
            code = code * n_clusters + cls
        cols["code"] = pa.array(code)
        return pa.table(cols)

    return emb_ds.map_batches(assign_fn, batch_format="pyarrow")


def kmeans_assign_exact(emb_ds, n_clusters: int, *, id_col: str = "vec_id",
                        emb_col: str = "embedding"):
    """0-iteration Lloyd (seed selection + assignment), INTEGER-EXACT — the
    oracle-certifiable sibling of :func:`kmeans_distributed` (whose float
    partial-sum loop has no summation-order-independent SQL twin). Shares
    the same machinery shapes: per-batch seed-scan partial top-k, driver
    merge of k rows, broadcast centroids, one stateless assignment map.

    Centroids are the ``n_clusters`` corpus vectors with the lowest
    ``(id_hash(id), id)`` rank (the deterministic no-RNG init, with the id
    tiebreak making the rank SQL-reproducible); elements are quantized
    ``floor(x·10⁶ + 0.5)`` so every squared distance is an exact integer
    (≤ 64·(2·10⁶)² ≈ 2.6e14 < 2⁵³) and the argmin (ties → lowest cluster
    index) matches DuckDB bit-for-bit."""
    cent = exact_seed_centroids(emb_ds, n_clusters, id_col=id_col,
                                emb_col=emb_col)
    cent_ref = ray.put(cent)

    def assign_fn(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = quantize(_emb_matrix(t, emb_col))
        d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        return pa.table({id_col: pa.array(
                             t[id_col].to_numpy(zero_copy_only=False)
                             .astype(np.int64)),
                         "cluster": pa.array(
                             d2.argmin(1).astype(np.int64))})

    return emb_ds.map_batches(assign_fn, batch_format="pyarrow")


def kmeans_distributed(emb_ds, n_clusters: int, *, n_iters: int = 10,
                       id_col: str = "vec_id", emb_col: str = "embedding"):
    """Distributed Lloyd k-means over the full embedding corpus — the
    iterative-algorithm pattern: per iteration, ONE map_batches emits
    per-centroid partial (sum, count) rows (a few hundred floats per
    batch — nothing wide moves), the driver reduces them into new
    centroids (tiny: k×d), and the loop stops early when assignments'
    objective is stable. Deterministic: no-RNG init (evenly spaced by
    sorted id order via an id-hash rank) and fixed iteration order.

    Returns (centroids ndarray (k, d), assignment Dataset
    (id_col, cluster)). The per-record assignment pass runs once at the
    end with the final centroids broadcast."""
    import ray.data  # noqa: F401

    # deterministic init: the k vectors whose ids rank lowest under the
    # Knuth hash (uniform over the corpus, no RNG, order-independent)
    from .sampling import id_hash  # type: ignore

    def seed_scan(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = id_hash(ids)
        order = np.argsort(h, kind="stable")[:n_clusters]
        m = _emb_matrix(t, emb_col).astype(np.float64)[order]
        return pa.table({"h": h[order],
                         "emb": pa.FixedSizeListArray.from_arrays(
                             pa.array(m.ravel()), m.shape[1])})

    seeds = pa.concat_tables(
        [b for b in emb_ds.map_batches(seed_scan, batch_format="pyarrow")
         .iter_batches(batch_size=None, batch_format="pyarrow")],
        promote_options="default")
    hs = seeds["h"].to_numpy(zero_copy_only=False)
    top = np.argsort(hs, kind="stable")[:n_clusters]
    cent = _emb_matrix(seeds, "emb").astype(np.float64)[top]

    prev_obj = None
    for _ in range(n_iters):
        cent_ref = ray.put(cent)

        def partial(t: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            m = _emb_matrix(t, emb_col).astype(np.float64)
            d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(-1)
            a = d2.argmin(1)
            k, d = c.shape
            sums = np.zeros((k, d))
            np.add.at(sums, a, m)
            cnt = np.bincount(a, minlength=k).astype(np.float64)
            obj = d2[np.arange(len(m)), a].sum()
            return pa.table({
                "cluster": np.arange(k, dtype=np.int64),
                "sum": pa.FixedSizeListArray.from_arrays(
                    pa.array(sums.ravel()), d),
                "cnt": cnt,
                "obj": np.full(k, obj / k)})

        parts = pa.concat_tables(
            [b for b in emb_ds.map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_size=None, batch_format="pyarrow")],
            promote_options="default")
        cl = parts["cluster"].to_numpy(zero_copy_only=False)
        cnt = np.zeros(n_clusters)
        sums = np.zeros_like(cent)
        np.add.at(sums, cl, _emb_matrix(parts, "sum").astype(np.float64))
        np.add.at(cnt, cl, parts["cnt"].to_numpy(zero_copy_only=False))
        obj = float(parts["obj"].to_numpy(zero_copy_only=False).sum())
        nonempty = cnt > 0
        cent[nonempty] = sums[nonempty] / cnt[nonempty, None]
        if prev_obj is not None and obj >= prev_obj * (1 - 1e-9):
            break
        prev_obj = obj

    cent_ref = ray.put(cent)

    def assign_fn(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _emb_matrix(t, emb_col).astype(np.float64)
        d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        return pa.table({id_col: t[id_col],
                         "cluster": d2.argmin(1).astype(np.int64)})

    return cent, emb_ds.map_batches(assign_fn, batch_format="pyarrow")
