"""ANN similarity-search queries over the embeddings table, oracle-checked
via quantized-integer dot products (exact under any summation order)."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..sources.parquet import read_table
from ..stages.ann import SCALE, ann_topk_broadcast
from .registry import register

K = 5
QUERY_MOD = 100

_QUANT = ("list_transform({col}, x -> floor(CAST(x AS DOUBLE) * "
          f"CAST({SCALE!r} AS DOUBLE) + CAST(0.5 AS DOUBLE)))")


def _queries_df(sf_dir: str,
                cols: tuple = ("vec_id", "embedding")) -> pd.DataFrame:
    """The bounded ANN query set (1 per ``QUERY_MOD`` corpus vectors).

    Extraction is DISTRIBUTED: the modulo predicate runs inside
    ``map_batches`` over the column-pruned read, so only the ~1 %
    survivors ever cross to the driver — never the full embeddings table
    (at 100 TB a driver-side ``pq.read_table`` of the corpus is an OOM
    before the pipeline starts). Sorted by vec_id for a deterministic
    query order regardless of block arrival order."""
    ds = read_table(sf_dir, "embeddings", list(cols))

    def pick(t: pa.Table) -> pa.Table:
        vid = t["vec_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(vid % QUERY_MOD == 0))

    df = ds.map_batches(pick, batch_format="pyarrow",
                        zero_copy_batch=True).to_pandas()
    return df.sort_values("vec_id").reset_index(drop=True)


def _ann_sql() -> str:
    qd = _QUANT.format(col="q.embedding")
    ed = _QUANT.format(col="e.embedding")
    return f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings
               WHERE vec_id % {QUERY_MOD} = 0),
    d AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                 list_dot_product({qd}, {ed}) AS score
          FROM q, embeddings e WHERE e.vec_id <> q.vec_id)
    SELECT query_id, neighbor_id, score, CAST(rank AS BIGINT) AS rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
      FROM d)
    WHERE rank <= {K}"""


@register("ann_topk_dot", sql=_ann_sql)
def ann_topk_dot(sf_dir: str):
    """Exact brute-force top-k by quantized dot product — the ANN baseline
    (one matmul per batch against the broadcast query matrix)."""
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ann_topk_broadcast(ds, _queries_df(sf_dir), K)


@register("ann_topk_lsh_sharded")
def ann_topk_lsh_sharded(sf_dir: str):
    """Sharded LSH ANN (the scale path): corpus split into object-store
    shards (never broadcast whole), per-shard LSH actor pools, per-query
    cross-shard top-k merge. Approximate — no SQL twin; recall ≥ 0.8 vs the
    brute-force baseline is asserted in tests/test_knn_ann.py. The SAME
    plumbing is oracle-certified end-to-end by `ann_topk_lsh_certified`."""
    from ..stages.ann import ann_topk_lsh

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    qds = ray.data.from_pandas(_queries_df(sf_dir))
    return ann_topk_lsh(ds, qds, K, n_shards=4, n_bits=6, n_tables=8)


@register("ann_topk_lsh_certified", sql=_ann_sql)
def ann_topk_lsh_certified(sf_dir: str):
    """The SAME sharded-LSH machinery as `ann_topk_lsh_sharded` (corpus
    shard refs, per-shard LshAnnIndex actor pools — hash, bucket
    searchsorted-gather, exact in-bucket rescore — cross-shard union,
    per-query merge) run at n_bits = 0: every vector hashes to the single
    empty-code bucket, so the candidate set in each shard is PROVABLY the
    whole shard and the exact rescore + merge reproduces brute-force
    top-k exactly. This gives the shard/bucket/merge plumbing itself an
    exact oracle row (the `ann_topk_dot` SQL) — the analogue of what
    `ann_topk_ivf_full_probe` does for IVF — while the default-parameter
    variant stays registered as the approximate rows-only path."""
    from ..stages.ann import ann_topk_lsh

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    qds = ray.data.from_pandas(_queries_df(sf_dir))
    return ann_topk_lsh(ds, qds, K, n_shards=4, n_bits=0, n_tables=1)


def _hardneg_sql() -> str:
    qd = _QUANT.format(col="q.embedding")
    ed = _QUANT.format(col="e.embedding")
    return f"""
    WITH q AS (SELECT vec_id, embedding, label FROM embeddings
               WHERE vec_id % {QUERY_MOD} = 0),
    d AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                 list_dot_product({qd}, {ed}) AS score
          FROM q, embeddings e WHERE e.label <> q.label)
    SELECT query_id, neighbor_id, score, CAST(rank AS BIGINT) AS rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
      FROM d)
    WHERE rank <= {K}"""


@register("hard_negative_topk", sql=_hardneg_sql)
def hard_negative_topk(sf_dir: str):
    """Hard-negative mining for contrastive training: per anchor (the
    bounded query set), the top-k HIGHEST-similarity corpus vectors with a
    DIFFERENT label — the nearest wrong-class examples that make the most
    informative negatives. Same broadcast-matmul shape as `ann_topk_dot`
    (one quantized integer matmul per batch, per-batch top-k partials, one
    per-query merge); the label mask is applied inside the scan so
    same-class rows never become candidates."""
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    qdf = _queries_df(sf_dir, cols=("vec_id", "embedding", "label"))
    return ann_topk_broadcast(ds, qdf, K, label_col="label")


# ----------------------------- hybrid retrieval (reciprocal-rank fusion)
RRF_C = 60             # the standard RRF constant
RRF_SCALE = 10 ** 9    # integer score: RRF_SCALE // (C + rank), floor div
RRF_QTOK_MAX = 2_000_000   # broadcast bound for the query-token side


def _rrf_sql() -> str:
    qd = _QUANT.format(col="q.embedding")
    ed = _QUANT.format(col="e.embedding")
    return f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings
               WHERE vec_id % {QUERY_MOD} = 0),
    ed AS (SELECT q.vec_id AS query_id, e.vec_id AS cand_id,
                  list_dot_product({qd}, {ed}) AS score
           FROM q, embeddings e WHERE e.vec_id <> q.vec_id),
    erank AS (SELECT query_id, cand_id, rk FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY query_id ORDER BY score DESC, cand_id) AS rk
                FROM ed) WHERE rk <= {K}),
    ctok AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' '))
                 AS token FROM documents),
    qtok AS (SELECT doc_id AS query_id, token FROM ctok
             WHERE doc_id % {QUERY_MOD} = 0 AND token <> ''),
    sc AS (SELECT qt.query_id, c.doc_id AS cand_id,
                  CAST(COUNT(*) AS BIGINT) AS shared
           FROM qtok qt JOIN ctok c ON c.token = qt.token
           WHERE c.doc_id <> qt.query_id AND c.token <> ''
           GROUP BY 1, 2),
    trank AS (SELECT query_id, cand_id, rk FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY query_id ORDER BY shared DESC, cand_id) AS rk
                FROM sc) WHERE rk <= {K}),
    fused AS (SELECT query_id, cand_id,
                     CAST(SUM({RRF_SCALE} // ({RRF_C} + rk)) AS BIGINT)
                         AS rrf_int
              FROM (SELECT * FROM erank UNION ALL SELECT * FROM trank)
              GROUP BY 1, 2)
    SELECT query_id, cand_id, rrf_int, CAST(frank AS BIGINT) AS fused_rank
    FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY rrf_int DESC, cand_id) AS frank
          FROM fused)
    WHERE frank <= {K}"""


@register("hybrid_rrf_topk", sql=_rrf_sql)
def hybrid_rrf_topk(sf_dir: str):
    """Hybrid retrieval: fuse an EMBEDDING ranking (quantized-dot top-k,
    the ann_topk_dot machinery) with a LEXICAL ranking (shared distinct
    tokens between the query document and each corpus document) by
    reciprocal-rank fusion — the two-tower + BM25-ish union every modern
    retrieval stack runs. RRF scores are integers
    (RRF_SCALE // (C + rank), floor division on both sides) so the fused
    ordering is bit-stable. Shape: the embedding list reuses the
    broadcast-matmul top-k; the lexical list scores shared distinct
    tokens per (query, cand). When the query-token table fits the
    broadcast bound (``RRF_QTOK_MAX`` — it is sized by the bounded query
    SET, not the corpus), it ships once via ``ray.put`` and scoring runs
    inside the corpus token scan with per-block pair pre-counting, so
    the corpus token strings never shuffle; above the bound it falls
    back to a token-keyed partitioned hash join (same result, one
    exchange). Per-query top-k follows; fusion is one (query, cand)
    groupby over the two rank lists. Ties break by cand_id at every
    stage."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..stages.join import hash_join
    from ..stages.shuffle import grouped_apply

    # --- embedding ranks (existing exact top-k machinery)
    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    er = ann_topk_broadcast(emb, _queries_df(sf_dir), K)
    erank = er.map_batches(
        lambda t: pa.table({"query_id": t["query_id"],
                            "cand_id": t["neighbor_id"],
                            "rk": pc.cast(t["rank"], pa.int64())}),
        batch_format="pyarrow")

    # --- lexical ranks: distinct (doc, token) pairs (each doc lives in
    # exactly one row, so per-batch dedup IS global dedup)
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def tok_pairs(t: pa.Table) -> pa.Table:
        text = pc.fill_null(pc.cast(t["text"], pa.string()), "")
        toks = pc.split_pattern(text, " ")
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ids = np.repeat(t["doc_id"].to_numpy(zero_copy_only=False), lens)
        pairs = pa.table({"doc_id": ids, "token": flat}) \
            .filter(pc.not_equal(flat, ""))
        return pairs.group_by(["doc_id", "token"]).aggregate([])

    # spill to Parquet, not materialize(): the (doc, token) table is
    # corpus-proportional and feeds TWO consumers (query extraction +
    # the scoring scan) — the Parquet checkpoint streams the producer
    # once without pinning a corpus-sized table in the object store
    from ..state.spill import spill_checkpoint

    read_ctok = spill_checkpoint(
        docs.map_batches(tok_pairs, batch_format="pyarrow",
                         zero_copy_batch=True), "rrf_ctok",
        schema=pa.schema([("doc_id", pa.int64()),
                          ("token", pa.string())]))
    ctok = read_ctok()
    qtok = read_ctok().map_batches(
        lambda t: t.filter(pa.array(
            t["doc_id"].to_numpy(zero_copy_only=False) % QUERY_MOD == 0))
        .rename_columns(["query_id", "token"]), batch_format="pyarrow")

    # The query-token side is bounded by the query-set definition (the
    # same contract as the broadcast ANN query matrix). Under the bound,
    # broadcast it and score inside the corpus scan — the corpus token
    # STRINGS never shuffle; above it, fall back to the distributed
    # token-keyed hash join (same result, one big exchange).
    n_qtok = qtok.count()
    if n_qtok <= RRF_QTOK_MAX:
        qdf = qtok.to_pandas()
        qmap: dict = {}
        for tok, qid in zip(qdf["token"], qdf["query_id"]):
            qmap.setdefault(tok, []).append(int(qid))
        qref = ray.put({t: np.array(v, np.int64)
                        for t, v in qmap.items()})

        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "doc_id": pa.array([], pa.int64()),
                          "shared": pa.array([], pa.int64())})

        def score_scan(t: pa.Table) -> pa.Table:
            qm = ray.get(qref)
            toks = t["token"].to_pylist()
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            uniq, inv = np.unique(np.asarray(toks, dtype=object),
                                  return_inverse=True)
            hits = [qm.get(u) for u in uniq]
            lens = np.array([0 if h is None else len(h) for h in hits],
                            np.int64)
            m = lens[inv]
            tot = int(m.sum())
            if tot == 0:
                return empty
            starts = np.zeros(len(uniq), np.int64)
            starts[1:] = np.cumsum(lens)[:-1]
            qcat = np.concatenate([h for h in hits if h is not None])
            off = np.arange(tot) - np.repeat(np.cumsum(m) - m, m)
            qids = qcat[np.repeat(starts[inv], m) + off]
            dids = np.repeat(ids, m)
            keep = qids != dids
            qids, dids = qids[keep], dids[keep]
            if len(qids) == 0:
                return empty
            # pre-count per (query, doc) INSIDE the block: distinct pairs
            # per block ≤ block-docs × queries, ~40× smaller than the raw
            # expansion — only the counted partials ever shuffle
            order = np.lexsort((dids, qids))
            qs_, ds_ = qids[order], dids[order]
            new = np.empty(len(qs_), bool)
            new[0] = True
            new[1:] = (qs_[1:] != qs_[:-1]) | (ds_[1:] != ds_[:-1])
            starts2 = np.nonzero(new)[0]
            cnt = np.diff(np.append(starts2, len(qs_)))
            return pa.table({"query_id": pa.array(qs_[starts2]),
                             "doc_id": pa.array(ds_[starts2]),
                             "shared": pa.array(cnt.astype(np.int64))})

        joined = ctok.map_batches(score_scan, batch_format="pyarrow")
    else:
        joined = hash_join(ctok, qtok, on=["token"])
        joined = joined.map_batches(
            lambda t: (lambda f: pa.table({
                "query_id": f["query_id"], "doc_id": f["doc_id"],
                "shared": pa.array(np.ones(f.num_rows, np.int64))}))(
                t.filter(pc.not_equal(t["doc_id"], t["query_id"]))),
            batch_format="pyarrow")
    from ray.data.aggregate import Sum as _Sum
    sc = joined.groupby(["query_id", "doc_id"]).aggregate(
        _Sum("shared", alias_name="shared")).map_batches(
        lambda t: t.rename_columns(["query_id", "doc_id", "shared"]),
        batch_format="pyarrow")

    def toprank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["query_id", "shared", "doc_id"],
                            ascending=[True, False, True], kind="mergesort")
        df = df.groupby("query_id", sort=False).head(K).copy()
        df["rk"] = df.groupby("query_id", sort=False).cumcount() + 1
        return pd.DataFrame({"query_id": df["query_id"].astype("int64"),
                             "cand_id": df["doc_id"].astype("int64"),
                             "rk": df["rk"].astype("int64")})

    trank = grouped_apply(sc, ["query_id"], toprank)
    trank = trank.map_batches(lambda t: t, batch_format="pyarrow")

    # --- fuse
    def rrf(t: pa.Table) -> pa.Table:
        rk = t["rk"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"query_id": t["query_id"], "cand_id": t["cand_id"],
                         "rrf_int": pa.array(
                             np.int64(RRF_SCALE) // (np.int64(RRF_C) + rk))})

    both = erank.union(trank).map_batches(rrf, batch_format="pyarrow")
    fused = both.groupby(["query_id", "cand_id"]).aggregate(
        Sum("rrf_int", alias_name="rrf_int"))
    fused = fused.map_batches(
        lambda t: t.rename_columns(["query_id", "cand_id", "rrf_int"]),
        batch_format="pyarrow")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["query_id", "rrf_int", "cand_id"],
                            ascending=[True, False, True], kind="mergesort")
        df = df.groupby("query_id", sort=False).head(K).copy()
        df["fused_rank"] = df.groupby("query_id", sort=False).cumcount() + 1
        return df.astype({"query_id": "int64", "cand_id": "int64",
                          "rrf_int": "int64", "fused_rank": "int64"})

    return grouped_apply(fused, ["query_id"], final)


COS_SUB = 250          # subset bound for the exact all-pairs query
COS_SCALE = 1000.0     # per-op quantization (bounds keep int64 exact)


def _cos_sql() -> str:
    q = ("list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * "
         f"CAST({COS_SCALE!r} AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT))")
    return f"""
    WITH q AS (SELECT vec_id, {q} AS e FROM embeddings
               WHERE vec_id < {COS_SUB}),
    n AS (SELECT vec_id, e,
                 CAST(list_dot_product(e, e) AS BIGINT) AS n2 FROM q),
    d AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 CAST(list_dot_product(a.e, b.e) AS BIGINT) AS dot,
                 a.n2 AS na2, b.n2 AS nb2
          FROM n a JOIN n b ON a.vec_id < b.vec_id)
    SELECT id_a, id_b, dot FROM d
    WHERE dot > 0 AND 100 * dot * dot >= 9 * na2 * nb2"""


@register("cosine_neardup_pairs", sql=_cos_sql)
def cosine_neardup_pairs(sf_dir: str):
    """Embedding-cosine near-dup pairs (cos ≥ 0.3 — sized to the synthetic
    embedding distribution, max pairwise cos ≈ 0.44) over the vec_id<250
    subset — exact integer threshold test (9/100 rational), oracle-exact.
    The broadcast side is packed EXPLICITLY from the bounded subset
    (`pack_broadcast_side`); the full-corpus no-broadcast scale path is
    `cosine_neardup_pairs_lsh`."""
    import pyarrow.dataset as pads

    from ..stages.ann import cosine_threshold_pairs, pack_broadcast_side

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filter=(pads.field("vec_id") < COS_SUB))
    return cosine_threshold_pairs(ds, pack_broadcast_side(ds),
                                  tau2=(9, 100))


def _cos_lsh_sql() -> str:
    q = ("list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * "
         f"CAST({COS_SCALE!r} AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT))")
    return f"""
    WITH q AS (SELECT vec_id, {q} AS e FROM embeddings),
    n AS (SELECT vec_id, e,
                 CAST(list_dot_product(e, e) AS BIGINT) AS n2 FROM q),
    d AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 CAST(list_dot_product(a.e, b.e) AS BIGINT) AS dot,
                 a.n2 AS na2, b.n2 AS nb2
          FROM n a JOIN n b ON a.vec_id < b.vec_id)
    SELECT id_a, id_b, dot FROM d
    WHERE dot > 0 AND 100 * dot * dot >= 9 * na2 * nb2"""


@register("cosine_neardup_pairs_lsh", sql=_cos_lsh_sql)
def cosine_neardup_pairs_lsh(sf_dir: str):
    """FULL-corpus cosine near-dup sweep with NO broadcast side: SRP-LSH
    band explode → one band_key shuffle → exact integer rational-τ verify
    inside each bucket → pair dedup. The oracle is the exact all-pairs
    self-join over the whole embeddings table — equality proves the
    bucketed sweep loses no pair on this fixture (params sized for the
    fixture's low τ; see `stages/ann.cosine_pairs_lsh` docstring)."""
    from ..stages.ann import cosine_pairs_lsh

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    return cosine_pairs_lsh(ds, tau2=(9, 100))


@register("ann_topk_ivf")
def ann_topk_ivf_q(sf_dir: str):
    """IVF ANN (learned Voronoi lists, deterministic k-means quantizer,
    n_probe replication, one cogroup shuffle) — approximate; recall ≥ 0.7
    vs brute force asserted in tests/test_knn_ann.py."""
    from ..stages.ann import ann_topk_ivf

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ann_topk_ivf(ds, _queries_df(sf_dir), K, n_lists=8, n_probe=4)


@register("ann_topk_ivf_full_probe", sql=_ann_sql)
def ann_topk_ivf_full_probe(sf_dir: str):
    """The SAME IVF machinery as `ann_topk_ivf` (quantizer fit on a remote
    sample, corpus tagging, n_probe replication, cogroup shuffle, per-list
    exact top-k + per-query merge) run at n_probe = n_lists — every query
    probes every Voronoi list, so the result is PROVABLY the brute-force
    top-k (each global top-k member is top-k within its own list) and the
    whole pipeline gets an exact oracle (the `ann_topk_dot` SQL). The
    default-parameter variant stays registered as the approximate
    rows-only path; this row certifies its plumbing end-to-end."""
    from ..stages.ann import ann_topk_ivf

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ann_topk_ivf(ds, _queries_df(sf_dir), K, n_lists=8, n_probe=8)


KM_K = 8


def _kmeans_assign_sql() -> str:
    from ..stages.sampling import sql_id_hash
    q = _QUANT.format(col="embedding")
    return f"""
    WITH q AS (SELECT vec_id, {q} AS e FROM embeddings),
    seeds AS (SELECT e AS ce,
                     row_number() OVER (
                         ORDER BY {sql_id_hash('vec_id')}, vec_id) - 1
                         AS cluster
              FROM q ORDER BY {sql_id_hash('vec_id')}, vec_id
              LIMIT {KM_K}),
    d AS (SELECT q.vec_id, s.cluster,
                 list_dot_product(q.e, q.e)
                   - 2 * list_dot_product(q.e, s.ce)
                   + list_dot_product(s.ce, s.ce) AS d2
          FROM q CROSS JOIN seeds s),
    a AS (SELECT vec_id, cluster,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY d2, cluster) AS rk
          FROM d)
    SELECT vec_id, CAST(cluster AS BIGINT) AS cluster FROM a
    WHERE rk = 1"""


@register("kmeans_assign_certified", sql=_kmeans_assign_sql)
def kmeans_assign_certified(sf_dir: str):
    """The k-means ASSIGNMENT machinery with an exact oracle: 0-iteration
    Lloyd on quantized integers (seed-scan partial top-k by the Knuth
    id-hash rank, driver merge of k rows, broadcast centroids, one
    stateless distance-argmin map — the same shapes
    `kmeans_embedding_clusters` iterates). Every squared distance is an
    exact integer, so assignment matches the SQL twin bit-for-bit; the
    iterative float loop stays rows-only with its ==local-reference
    test (no summation-order-independent SQL twin exists for it)."""
    from ..stages.ann import kmeans_assign_exact

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    return kmeans_assign_exact(ds, KM_K)


@register("kmeans_embedding_clusters")
def kmeans_embedding_clusters(sf_dir: str):
    """Distributed Lloyd k-means over the embedding corpus (iterative
    map_batches partial-sum pattern, deterministic hash-rank init, early
    stop on objective) → (vec_id, cluster). Equivalence with a local
    reference implementation asserted in tests/test_knn_ann.py (float
    partial-sum reduction, so rows-only rather than hash-oracle)."""
    from ..stages.ann import kmeans_distributed

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    _, assign = kmeans_distributed(ds, 8, n_iters=10)
    return assign


# --------------------------------------------- embedding covariance matrix
EMB_DIM = 64


@register("embedding_covariance", sql=f"""
    WITH dims AS (SELECT unnest(generate_series(1, {EMB_DIM})) AS j),
    q AS (SELECT vec_id, dims.j,
                 CAST(floor(CAST(list_extract(embedding, dims.j) AS DOUBLE)
                            * CAST({1_000_000.0!r} AS DOUBLE)
                            + CAST(0.5 AS DOUBLE)) AS BIGINT) AS q
          FROM embeddings, dims),
    m AS (SELECT a.j AS j, b.j AS k, CAST(SUM(a.q * b.q) AS BIGINT) AS m
          FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.j <= b.j
          GROUP BY 1, 2),
    s AS (SELECT j, CAST(SUM(q) AS BIGINT) AS s FROM q GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings)
    SELECT m.j, m.k, m.m,
           (SELECT n FROM n) * m.m - sj.s * sk.s AS cov_num
    FROM m JOIN s sj ON sj.j = m.j JOIN s sk ON sk.j = m.k""")
def embedding_covariance(sf_dir: str):
    """Embedding-matrix analytics: the d×d covariance structure of the
    corpus, integer-exact — elements are quantized floor(x·10⁶ + 0.5), so
    the per-batch Gram partial Mᵀ=QᵀQ (one int64 matmul per batch, the
    whole reduction is d²=4096 ints) and the dim sums are block-order
    independent; cov_num = n·M_jk − S_j·S_k is the exact covariance
    numerator (consumer divides by n² at whatever precision it wants).
    Upper triangle only (j ≤ k, 1-based dims to match SQL
    list_extract)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..stages.ann import _emb_matrix, quantize

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    iu = np.triu_indices(EMB_DIM)
    jj = (iu[0] + 1).astype(np.int64)
    kk = (iu[1] + 1).astype(np.int64)

    def gram_partial(t: pa.Table) -> pa.Table:
        q = quantize(_emb_matrix(t, "embedding")).astype(np.int64)
        g = q.T @ q                                  # (d, d) int64
        s = q.sum(axis=0)
        rows = len(t)
        return pa.table({
            "j": pa.array(jj), "k": pa.array(kk),
            "m": pa.array(g[iu]),
            "sj": pa.array(s[iu[0]]), "sk": pa.array(s[iu[1]]),
            "nr": pa.array(np.full(len(jj), rows, np.int64))})

    agg = (ds.map_batches(gram_partial, batch_format="pyarrow",
                          batch_size=4096, zero_copy_batch=True)
           .groupby(["j", "k"]).aggregate(
               Sum("m", alias_name="m"), Sum("sj", alias_name="sj"),
               Sum("sk", alias_name="sk"), Sum("nr", alias_name="nr")))

    def finish(t: pa.Table) -> pa.Table:
        n = t["nr"].to_numpy(zero_copy_only=False)
        m = t["m"].to_numpy(zero_copy_only=False)
        sj = t["sj"].to_numpy(zero_copy_only=False)
        sk = t["sk"].to_numpy(zero_copy_only=False)
        return pa.table({
            "j": pc.cast(t["j"], pa.int64()),
            "k": pc.cast(t["k"], pa.int64()),
            "m": pa.array(m),
            "cov_num": pa.array(n * m - sj * sk)})

    return agg.map_batches(finish, batch_format="pyarrow")


# -------------------------------------------- per-label scatter statistics
@register("label_scatter_stats", sql=f"""
    WITH dims AS (SELECT unnest(generate_series(1, {EMB_DIM})) AS j),
    q AS (SELECT label, vec_id, dims.j,
                 CAST(floor(CAST(list_extract(embedding, dims.j) AS DOUBLE)
                            * CAST({1_000_000.0!r} AS DOUBLE)
                            + CAST(0.5 AS DOUBLE)) AS BIGINT) AS q
          FROM embeddings, dims),
    d AS (SELECT label, j, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(q) AS BIGINT) AS s,
                 CAST(SUM(q * q) AS BIGINT) AS s2
          FROM q GROUP BY 1, 2)
    SELECT CAST(label AS BIGINT) AS label, MIN(n) AS n,
           CAST(SUM(n * s2 - s * s) AS BIGINT) AS wss_scaled
    FROM d GROUP BY 1""")
def label_scatter_stats(sf_dir: str):
    """Supervised-embedding quality: per label, the within-class scatter
    (trace of the scatter matrix) in exact integers — per dim
    n·Σq² − (Σq)² summed over dims, on quantized elements, so the
    cross-block reduction is pure int64 (n² × the float WSS). One
    per-batch partial (n, Σq, Σq² per dim as 3 d-vectors) per label; a
    tiny (label) groupby finishes."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Min, Sum

    from ..stages.ann import _emb_matrix, quantize

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def partial(t: pa.Table) -> pa.Table:
        q = quantize(_emb_matrix(t, "embedding")).astype(np.int64)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(lab, return_inverse=True)
        k, d = len(uniq), q.shape[1]
        n = np.bincount(inv, minlength=k).astype(np.int64)
        s = np.zeros((k, d), np.int64)
        s2 = np.zeros((k, d), np.int64)
        np.add.at(s, inv, q)
        np.add.at(s2, inv, q * q)
        out = {"label": pa.array(np.repeat(uniq, d)),
               "j": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
               "n": pa.array(np.repeat(n, d)),
               "s": pa.array(s.ravel()), "s2": pa.array(s2.ravel())}
        return pa.table(out)

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=4096, zero_copy_batch=True)
           .groupby(["label", "j"]).aggregate(
               Sum("n", alias_name="n"), Sum("s", alias_name="s"),
               Sum("s2", alias_name="s2")))

    def finish_dim(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        s = t["s"].to_numpy(zero_copy_only=False)
        s2 = t["s2"].to_numpy(zero_copy_only=False)
        return pa.table({"label": pc.cast(t["label"], pa.int64()),
                         "n": pa.array(n),
                         "w": pa.array(n * s2 - s * s)})

    per_label = (agg.map_batches(finish_dim, batch_format="pyarrow")
                 .groupby("label").aggregate(
                     Min("n", alias_name="n"),
                     Sum("w", alias_name="wss_scaled")))
    return per_label.map_batches(
        lambda t: t.select(["label", "n", "wss_scaled"]),
        batch_format="pyarrow")


PQ_M, PQ_K = 2, 8


def _pq_assign_sql() -> str:
    from ..stages.sampling import sql_id_hash
    q = _QUANT.format(col="embedding")
    h = EMB_DIM // PQ_M

    def sub_cte(s: int) -> str:
        lo, hi = s * h + 1, (s + 1) * h
        return f"""
    d{s} AS (SELECT q.vec_id, s.cluster,
                 list_dot_product(q.e[{lo}:{hi}], q.e[{lo}:{hi}])
                   - 2 * list_dot_product(q.e[{lo}:{hi}], s.ce[{lo}:{hi}])
                   + list_dot_product(s.ce[{lo}:{hi}], s.ce[{lo}:{hi}]) AS d2
          FROM q CROSS JOIN seeds s),
    a{s} AS (SELECT vec_id, cluster,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY d2, cluster) AS rk
          FROM d{s}),
    c{s} AS (SELECT vec_id, cluster AS c{s} FROM a{s} WHERE rk = 1)"""

    return f"""
    WITH q AS (SELECT vec_id, {q} AS e FROM embeddings),
    seeds AS (SELECT e AS ce,
                     row_number() OVER (
                         ORDER BY {sql_id_hash('vec_id')}, vec_id) - 1
                         AS cluster
              FROM q ORDER BY {sql_id_hash('vec_id')}, vec_id
              LIMIT {PQ_K}),{sub_cte(0)},{sub_cte(1)}
    SELECT vec_id, CAST(c0 AS BIGINT) AS c0, CAST(c1 AS BIGINT) AS c1,
           CAST(c0 * {PQ_K} + c1 AS BIGINT) AS code
    FROM c0 JOIN c1 USING (vec_id)"""


@register("pq_code_assign_certified", sql=_pq_assign_sql)
def pq_code_assign_certified(sf_dir: str):
    """Product-quantization code assignment with an exact oracle — the
    compression layer of a 10¹²-scale ANN index (IVF-PQ): M=2 subspaces,
    k=8 codewords each, codebook = the deterministic seed set's
    subvectors (shared with kmeans_assign_certified), packed code
    c0·k + c1. Integer-exact subspace distances ⇒ the SQL twin matches
    bit-for-bit; one k×d broadcast, one stateless map, no shuffle."""
    from ..stages.ann import pq_assign_exact

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    return pq_assign_exact(ds, PQ_M, PQ_K)


# ----------------------------------------------------------- SemDeDup
SD_TAU2 = (9, 64)      # cos ≥ 3/8 ⇔ dot > 0 ∧ 64·dot² ≥ 9·|a|²·|b|²
SD_SCALE = 1000.0      # pairwise quantizer (dot ≤ d·(scale·max|x|)² ≪ 2⁵³)


def _semdedup_sql() -> str:
    from ..stages.sampling import sql_id_hash
    e6 = _QUANT.format(col="embedding")
    p3 = ("list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * "
          f"CAST({SD_SCALE!r} AS DOUBLE) + CAST(0.5 AS DOUBLE)))")
    num, den = SD_TAU2
    return f"""
    WITH q AS (SELECT vec_id, {e6} AS e, {p3} AS p FROM embeddings),
    seeds AS (SELECT e AS ce,
                     row_number() OVER (
                         ORDER BY {sql_id_hash('vec_id')}, vec_id) - 1
                         AS cluster
              FROM q ORDER BY {sql_id_hash('vec_id')}, vec_id
              LIMIT {KM_K}),
    d AS (SELECT q.vec_id, s.cluster,
                 list_dot_product(q.e, q.e)
                   - 2 * list_dot_product(q.e, s.ce)
                   + list_dot_product(s.ce, s.ce) AS d2
          FROM q CROSS JOIN seeds s),
    asg AS (SELECT vec_id, cluster FROM (
              SELECT vec_id, cluster,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY d2, cluster) AS rk
              FROM d) WHERE rk = 1),
    pts AS (SELECT asg.vec_id, asg.cluster, q.p
            FROM asg JOIN q USING (vec_id)),
    dots AS (SELECT a.vec_id AS ua, b.vec_id AS ub,
                    CAST(list_dot_product(a.p, b.p) AS BIGINT) AS dot,
                    CAST(list_dot_product(a.p, a.p) AS BIGINT) AS na,
                    CAST(list_dot_product(b.p, b.p) AS BIGINT) AS nb
             FROM pts a JOIN pts b
               ON a.cluster = b.cluster AND a.vec_id < b.vec_id),
    dup AS (SELECT DISTINCT ub AS vec_id FROM dots
            WHERE dot > 0 AND {den} * dot * dot >= {num} * na * nb)
    SELECT p.vec_id, CAST(p.cluster AS BIGINT) AS cluster,
           CAST(CASE WHEN dup.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
               AS is_kept
    FROM pts p LEFT JOIN dup USING (vec_id)"""


@register("semdedup_reps", sql=_semdedup_sql)
def semdedup_reps(sf_dir: str):
    """SemDeDup (Abbas et al. 2023): semantic deduplication by clustering
    the embedding space and dropping, inside each cluster, every vector
    that is cosine-≥ τ to an earlier-id clustermate (keep-first — the
    deterministic stand-in for the paper's keep-farthest-from-centroid
    rule). Output: every vector with its cluster and is_kept flag.

    Exactness: cluster assignment is the certified 0-iteration integer
    k-means (seed scan + broadcast centroids, `kmeans_assign_certified`);
    the in-cluster near-dup test is the exact integer rational-τ
    comparison (den·dot² ≥ num·|a|²·|b|² on SD_SCALE-quantized
    components) — both SQL-twinnable bit-for-bit.

    Scale shape: one broadcast (k×d centroids), one fused assign+quantize
    map, ONE shuffle keyed by cluster, per-cluster vectorized all-pairs
    (the SemDeDup contract — k grows with the corpus precisely so each
    cluster fits a worker; the paper runs k = 50k on 1e9 points)."""
    from ..stages.ann import SCALE as KM_SCALE
    from ..stages.ann import _emb_matrix, exact_seed_centroids
    from ..stages.shuffle import grouped_apply

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    cent = exact_seed_centroids(ds, KM_K)
    cent_ref = ray.put(cent)
    num, den = SD_TAU2

    def assign_quant(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        raw = _emb_matrix(t, "embedding").astype(np.float64)
        m6 = np.floor(raw * KM_SCALE + 0.5)
        d2 = ((m6[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        p3 = np.floor(raw * SD_SCALE + 0.5).astype(np.int64)
        return pa.table({
            "vec_id": pa.array(t["vec_id"].to_numpy(zero_copy_only=False)
                               .astype(np.int64)),
            "cluster": pa.array(d2.argmin(1).astype(np.int64)),
            "p": pa.FixedSizeListArray.from_arrays(
                pa.array(p3.ravel()), p3.shape[1])})

    asg = ds.map_batches(assign_quant, batch_format="pyarrow")

    def per_cluster(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for cl, g in df.groupby("cluster", sort=False):
            g = g.sort_values("vec_id")
            ids = g["vec_id"].to_numpy(np.int64)
            q = np.stack(g["p"].to_numpy()).astype(np.int64)
            gram = q @ q.T
            n2 = np.diag(gram).copy()
            near = (gram > 0) & (den * gram * gram
                                 >= num * (n2[:, None] * n2[None, :]))
            # dup[j] ⇔ ∃ i < j (ids ascending) with near[i, j]
            dup = np.triu(near, 1).any(axis=0)
            out.append(pd.DataFrame({
                "vec_id": ids, "cluster": np.full(len(ids), cl, np.int64),
                "is_kept": (~dup).astype(np.int64)}))
        if not out:
            return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                 "cluster": pd.Series([], dtype="int64"),
                                 "is_kept": pd.Series([], dtype="int64")})
        return pd.concat(out, ignore_index=True)

    return grouped_apply(asg, ["cluster"], per_cluster, num_buckets=8)


# --------------------------------------------------- kNN classification
KNN_CLS_K = 7


def _knn_cls_sql() -> str:
    qd = _QUANT.format(col="q.embedding")
    ed = _QUANT.format(col="e.embedding")
    return f"""
    WITH q AS (SELECT vec_id, embedding, label FROM embeddings
               WHERE vec_id % {QUERY_MOD} = 0),
    d AS (SELECT q.vec_id AS query_id, q.label AS true_label,
                 e.vec_id AS neighbor_id, e.label AS nb_label,
                 list_dot_product({qd}, {ed}) AS score
          FROM q, embeddings e WHERE e.vec_id <> q.vec_id),
    nn AS (SELECT query_id, true_label, nb_label FROM (
             SELECT *, row_number() OVER (
               PARTITION BY query_id ORDER BY score DESC, neighbor_id)
                 AS rk FROM d) WHERE rk <= {KNN_CLS_K}),
    v AS (SELECT query_id, true_label, nb_label,
                 CAST(COUNT(*) AS BIGINT) AS votes
          FROM nn GROUP BY 1, 2, 3)
    SELECT query_id, CAST(true_label AS BIGINT) AS true_label,
           CAST(nb_label AS BIGINT) AS pred_label, votes
    FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY votes DESC, nb_label) AS vr
          FROM v) WHERE vr = 1"""


@register("knn_label_predict", sql=_knn_cls_sql)
def knn_label_predict(sf_dir: str):
    """kNN classification / weak labeling: predict each query vector's
    label by majority vote among its KNN_CLS_K nearest corpus neighbors
    (exact quantized-dot similarity, self excluded; vote ties → smallest
    label) and report it next to the true label — the model-free labeler
    (and its accuracy audit) every semi-supervised data pipeline runs.

    Shape: the broadcast-matmul exact top-k (`ann_topk_broadcast`)
    produces the bounded (n_queries × k) neighbor list; neighbor labels
    attach WITHOUT a corpus join — the winning neighbor-id set is
    broadcast and the label column is filtered distributed, so only the
    ≤ n_queries·k matching (vec_id, label) rows reach the driver; the
    vote is driver arithmetic over that bounded list."""
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    qdf = _queries_df(sf_dir, cols=("vec_id", "embedding", "label"))
    topk = ann_topk_broadcast(ds, qdf[["vec_id", "embedding"]], KNN_CLS_K) \
        .to_pandas()

    nb_ids = np.unique(topk["neighbor_id"].to_numpy(np.int64))
    nb_ref = ray.put(nb_ids)
    lab = read_table(sf_dir, "embeddings", ["vec_id", "label"])
    lsel = lab.map_batches(
        lambda t: t.filter(pa.array(np.isin(
            t["vec_id"].to_numpy(zero_copy_only=False),
            ray.get(nb_ref)))),
        batch_format="pyarrow").to_pandas()
    lmap = dict(zip(lsel["vec_id"].astype(np.int64),
                    lsel["label"].astype(np.int64)))

    topk["nb_label"] = topk["neighbor_id"].map(lmap).astype(np.int64)
    votes = (topk.groupby(["query_id", "nb_label"], as_index=False)
             .size().rename(columns={"size": "votes"}))
    votes = votes.sort_values(["query_id", "votes", "nb_label"],
                              ascending=[True, False, True])
    top1 = votes.groupby("query_id", as_index=False).head(1)
    tl = dict(zip(qdf["vec_id"].astype(np.int64),
                  qdf["label"].astype(np.int64)))
    return pd.DataFrame({
        "query_id": top1["query_id"].astype(np.int64).to_numpy(),
        "true_label": top1["query_id"].map(tl).astype(np.int64).to_numpy(),
        "pred_label": top1["nb_label"].astype(np.int64).to_numpy(),
        "votes": top1["votes"].astype(np.int64).to_numpy()})


@register("label_centroid_sums", sql=f"""
    WITH dims AS (SELECT unnest(generate_series(1, {EMB_DIM})) AS j),
    q AS (SELECT label, dims.j,
                 CAST(floor(CAST(list_extract(embedding, dims.j) AS DOUBLE)
                            * CAST({1_000_000.0!r} AS DOUBLE)
                            + CAST(0.5 AS DOUBLE)) AS BIGINT) AS q
          FROM embeddings, dims)
    SELECT label, CAST(j AS BIGINT) AS j, CAST(SUM(q) AS BIGINT) AS s,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM q GROUP BY 1, 2""")
def label_centroid_sums(sf_dir: str):
    """Class-separation audit input: EXACT per-label centroid numerators —
    quantized component sums Σq_j and counts per label (centroid_j =
    s_j / n; inter-centroid distances follow at any precision — the
    rational-output rule, same quantization contract as
    embedding_covariance). One int64 reduction per batch per label; only
    |labels|·d partial rows cross the object store."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..stages.ann import _emb_matrix, quantize

    ds = read_table(sf_dir, "embeddings", ["label", "embedding"])
    jj = np.arange(1, EMB_DIM + 1, dtype=np.int64)

    def partial(t: pa.Table) -> pa.Table:
        q = quantize(_emb_matrix(t, "embedding")).astype(np.int64)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = np.unique(lab)
        labs, js, ss, ns = [], [], [], []
        for lv in uniq:
            m = lab == lv
            labs.append(np.full(EMB_DIM, lv, np.int64))
            js.append(jj)
            ss.append(q[m].sum(axis=0))
            ns.append(np.full(EMB_DIM, int(m.sum()), np.int64))
        return pa.table({"label": pa.array(np.concatenate(labs)),
                         "j": pa.array(np.concatenate(js)),
                         "s": pa.array(np.concatenate(ss)),
                         "n": pa.array(np.concatenate(ns))})

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         batch_size=4096, zero_copy_batch=True) \
        .groupby(["label", "j"]).aggregate(Sum("s", alias_name="s"),
                                           Sum("n", alias_name="n"))
    return agg.map_batches(
        lambda t: t.rename_columns(["label", "j", "s", "n"]),
        batch_format="pyarrow")
