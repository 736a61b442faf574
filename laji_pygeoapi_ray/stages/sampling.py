"""Deterministic sampling operators for training-data pipelines.

``ds.random_sample`` is seed-per-run and block-order dependent — useless
for reproducible corpus construction. These operators derive every
decision from a Knuth multiplicative hash of the record id,

    h(id) = (id · 2654435761) mod 2³²

which is exact int64 arithmetic on BOTH sides (numpy and DuckDB), so
sample membership, split assignment, and stratified ranks are bit-stable
and oracle-checkable. Each operator is a stateless vectorized map_batches
stage; the stratified top-k adds one bucketed shuffle on the stratum key.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

KNUTH = 2654435761
MOD32 = 1 << 32


def id_hash(ids: np.ndarray) -> np.ndarray:
    """Knuth multiplicative hash. Multiplication mod 2³² depends only on
    ``id mod 2³²``, so the id is reduced FIRST: the product then stays
    below 2⁶⁴ (exact in uint64) for the ENTIRE int64 id range — the naive
    ``id · KNUTH`` overflows int64 (numpy wraps silently, DuckDB raises)
    once ids pass ~3.5e9, i.e. exactly at training-corpus scale. Identical
    values to the naive form for all non-negative ids (the engine's id
    contract; numpy floored-``%`` and SQL truncated-``%`` diverge on
    negative ids)."""
    k = (ids.astype(np.int64) % np.int64(MOD32)).astype(np.uint64)
    return ((k * np.uint64(KNUTH)) % np.uint64(MOD32)).astype(np.int64)


def sql_id_hash(key: str) -> str:
    """DuckDB twin of :func:`id_hash` — the inner product runs in HUGEINT
    for the same 2⁶³-overflow reason (BIGINT multiply raises)."""
    return (f"CAST((CAST(({key}) % {MOD32} AS HUGEINT) * {KNUTH})"
            f" % {MOD32} AS BIGINT)")


def sample_frac(ds, pct: int, *, id_col: str):
    """Deterministic ``pct``-percent sample: keep rows with
    ``h(id) % 100 < pct``. Stable across runs, block orders and cluster
    sizes; sampling rate converges to pct/100 by hash uniformity."""
    def fn(t: pa.Table) -> pa.Table:
        h = id_hash(t[id_col].to_numpy(zero_copy_only=False))
        return t.filter(pa.array((h % 100) < pct))
    return ds.map_batches(fn, batch_format="pyarrow")


def train_val_split(ds, train_pct: int, *, id_col: str,
                    out_col: str = "split"):
    """Deterministic split column: 'train' where ``h(id) % 100 <
    train_pct`` else 'val' — the reproducible corpus-split op (same record
    always lands in the same split, across runs and re-shards)."""
    def fn(t: pa.Table) -> pa.Table:
        h = id_hash(t[id_col].to_numpy(zero_copy_only=False))
        lab = np.where((h % 100) < train_pct, "train", "val")
        return t.append_column(out_col, pa.array(lab, pa.string()))
    return ds.map_batches(fn, batch_format="pyarrow")


def stratified_sample(ds, k: int, *, stratum_col: str, id_col: str,
                      num_buckets: int | None = None):
    """Per-stratum top-k by (hash, id): a deterministic stratified sample
    (k rows per group, hash order ≙ uniform-without-replacement). One
    bucketed shuffle on the stratum key; within each bucket a vectorized
    sort + head(k) per group. SQL twin: ``row_number() OVER (PARTITION BY
    stratum ORDER BY hash, id) <= k``."""
    from .shuffle import grouped_apply

    def add_h(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__h", pa.array(id_hash(t[id_col].to_numpy(
                zero_copy_only=False))))

    def bucket_fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([stratum_col, "__h", id_col],
                            kind="mergesort")
        out = df.groupby(stratum_col, sort=False).head(k)
        return out.drop(columns=["__h"]).reset_index(drop=True)

    return grouped_apply(ds.map_batches(add_h, batch_format="pyarrow"),
                         [stratum_col], bucket_fn,
                         num_buckets=num_buckets)


def weighted_sample(ds, *, id_col: str, weight_col: str, mod: int = 10000):
    """Weight-proportional deterministic Bernoulli sample: keep a row iff
    ``h(id) % mod < weight`` — inclusion probability min(weight, mod)/mod,
    so records are kept in proportion to an integer importance weight
    (length/quality/domain priors in corpus construction) with NO
    randomness: membership is a pure function of the id, reproducible
    across runs, block orders and cluster sizes. SQL twin:
    ``WHERE (id·KNUTH) % 2³² % mod < weight``."""
    def fn(t: pa.Table) -> pa.Table:
        h = id_hash(t[id_col].to_numpy(zero_copy_only=False))
        w = t[weight_col].to_numpy(zero_copy_only=False)
        return t.filter(pa.array((h % mod) < w))
    return ds.map_batches(fn, batch_format="pyarrow")
