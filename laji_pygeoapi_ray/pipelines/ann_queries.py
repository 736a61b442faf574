"""ANN similarity-search queries over the embeddings table, oracle-checked
via quantized-integer dot products (exact under any summation order)."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data

from ..sources.parquet import read_table
from ..stages.ann import SCALE, ann_topk_broadcast
from .registry import register

K = 5
QUERY_MOD = 100

_QUANT = ("list_transform({col}, x -> floor(CAST(x AS DOUBLE) * "
          f"CAST({SCALE!r} AS DOUBLE) + CAST(0.5 AS DOUBLE)))")


def _queries_df(sf_dir: str) -> pd.DataFrame:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    df = t.to_pandas()
    return df[df["vec_id"] % QUERY_MOD == 0].reset_index(drop=True)


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
    brute-force baseline is asserted in tests/test_knn_ann.py."""
    from ..stages.ann import ann_topk_lsh

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    qds = ray.data.from_pandas(_queries_df(sf_dir))
    return ann_topk_lsh(ds, qds, K, n_shards=4, n_bits=6, n_tables=8)
