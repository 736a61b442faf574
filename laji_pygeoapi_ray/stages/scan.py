"""Distributed ordered prefix scan (running sum over a global order).

The reference never needs a global running total — its per-request pages
are small enough for PostGIS window functions
(``/root/reference/pygeoapi/scripts/edit_db.py:333-460`` pushes ORDER BY
into SQL). At engine scale a ``SUM(x) OVER (ORDER BY t)`` is the classic
*scan* primitive, and a naive implementation (global sort + single ordered
pass) serializes on one worker. This module implements the textbook
two-pass distributed scan (Blelloch 1990):

1. **Range-partition by value**: ``part = t // width`` — a pure function of
   the order column, so equal ``t`` always co-locates and partitions are
   totally ordered by construction (no sampled splits, no sort).
2. **Pass 1 (up-sweep)**: per-batch partial sums keyed by ``part`` → a tiny
   ``groupby(part).sum`` — only (part, sum) pairs cross the object store.
   The driver turns the ≤k partial sums into exclusive prefix offsets
   (k ≈ time-span / width; bytes, not data rows).
3. **Pass 2 (down-sweep)**: one hash shuffle on ``part``; inside each
   partition a vectorized sort + cumsum, plus the broadcast offset.

The input dataset is consumed twice (both passes re-execute the lazy
upstream projection); at scale this trades one cheap re-read of a narrow
projection for never pinning the full point set in the object store.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _partial_part_sums(part_col: str, val_col: str):
    def fn(t: pa.Table) -> pa.Table:
        p = t[part_col].to_numpy(zero_copy_only=False)
        v = t[val_col].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(p, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, v.astype(np.int64))
        return pa.table({part_col: pa.array(uniq), "__psum": pa.array(sums)})
    return fn


def partition_offsets(ds, part_col: str, val_col: str) -> dict[int, int]:
    """Pass 1: exclusive prefix offset per partition. The only driver-side
    materialization is the (part, sum) table — one row per partition."""
    from ray.data.aggregate import Sum

    partial = ds.map_batches(_partial_part_sums(part_col, val_col),
                             batch_format="pyarrow", zero_copy_batch=True)
    rows = partial.groupby(part_col).aggregate(
        Sum("__psum", alias_name="s")).take_all()
    rows.sort(key=lambda r: r[part_col])
    offsets, acc = {}, 0
    for r in rows:
        offsets[int(r[part_col])] = acc
        acc += int(r["s"])
    return offsets


def global_cumsum(ds, order_col: str, val_col: str, *, width: int,
                  out_col: str = "running", agg_equal_keys: bool = True):
    """Running sum of ``val_col`` over the global ascending order of
    ``order_col`` (int64). Equal order keys are first summed into one row
    (``net``) when ``agg_equal_keys`` — the running value is then
    order-independent within ties, i.e. exactly DuckDB's
    ``SUM(net) OVER (ORDER BY t)`` on the per-key aggregate.

    Returns a dataset with columns (order_col, ``net``, out_col), one row
    per distinct order key, partition-parallel except the O(k) offset table.
    """
    part = "__part"

    def tag(t: pa.Table) -> pa.Table:
        o = t[order_col].to_numpy(zero_copy_only=False)
        return t.append_column(part, pa.array(o // np.int64(width)))

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    offsets = partition_offsets(tagged, part, val_col)

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        p = int(df[part].iloc[0])
        base = offsets.get(p, 0)
        if agg_equal_keys:
            g = (df.groupby(order_col, sort=True)[val_col].sum()
                   .astype("int64").reset_index(name="net"))
        else:
            g = df.sort_values(order_col, kind="mergesort")[
                [order_col, val_col]].rename(columns={val_col: "net"})
            g["net"] = g["net"].astype("int64")
        g[out_col] = g["net"].cumsum() + np.int64(base)
        return g

    return (tagged.groupby(part)
                  .map_groups(per_partition, batch_format="pandas"))


def scan_summary(curve_ds, order_col: str, run_col: str):
    """Reduce a cumsum curve to (max, first order-key at max, #keys at max)
    — per-block partials (3 values each), tiny driver combine."""
    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"m": pa.array([], pa.int64()),
                             "first_t": pa.array([], pa.int64()),
                             "n_at": pa.array([], pa.int64())})
        r = t[run_col].to_numpy(zero_copy_only=False)
        o = t[order_col].to_numpy(zero_copy_only=False)
        m = r.max()
        at = o[r == m]
        return pa.table({"m": pa.array([int(m)]),
                         "first_t": pa.array([int(at.min())]),
                         "n_at": pa.array([int(len(at))])})

    rows = curve_ds.map_batches(partial, batch_format="pyarrow",
                                zero_copy_batch=True).take_all()
    m = max(r["m"] for r in rows)
    tops = [r for r in rows if r["m"] == m]
    return {"max_value": int(m),
            "first_at": int(min(r["first_t"] for r in tops)),
            "n_at": int(sum(r["n_at"] for r in tops))}
