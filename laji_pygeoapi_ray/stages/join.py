"""Explicit partitioned hash join — both-sides-large equi-join.

The reference's only joins are broadcast lookups (SURVEY.md §2.5); the
engine additionally ships the portable large-large pattern from the Ray
guide: tag both sides, shuffle ONCE on the hashed key into shared buckets,
and run a vectorized ``pandas.merge`` per bucket. Skewed keys hash across
buckets only if distinct; a single giant key should use the broadcast path
(its small side fits memory by definition of the skew).

For small right sides prefer ``broadcast_join`` (dict/merge against a
``ray.put`` table inside ``map_batches`` — no shuffle at all).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .shuffle import grouped_apply


def hash_join(left_ds, right_ds, *, on: list[str], how: str = "inner",
              num_buckets: int = 64):
    """Partitioned hash join on ``on`` (columns present on both sides;
    non-key column names must not collide — pre-rename)."""
    lschema, rschema = left_ds.schema(), right_ds.schema()
    lcols, rcols = lschema.names, rschema.names
    all_cols = list(dict.fromkeys(lcols + rcols))
    # typed null-fill: an untyped pa.nulls column gives the two union sides
    # DIFFERENT schemas for the same column name (Ray warns and downstream
    # consumers may mis-concat); take each column's type from whichever
    # side defines it
    types = {}
    for name, typ in zip(rschema.names, rschema.types):
        types[name] = typ
    for name, typ in zip(lschema.names, lschema.types):
        types[name] = typ

    def tag(side: int, present: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            out = {"__side": pa.array(np.full(len(t), side, dtype=np.int8))}
            for c in all_cols:
                out[c] = (t[c] if c in present
                          else pa.nulls(len(t), types[c]))
            return pa.table(out)
        return fn

    tagged = (left_ds.map_batches(tag(0, lcols), batch_format="pyarrow")
              .union(right_ds.map_batches(tag(1, rcols),
                                          batch_format="pyarrow")))

    def bucket_fn(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["__side"] == 0][lcols]
        right = df[df["__side"] == 1][rcols]
        return left.merge(right, on=on, how=how)

    return grouped_apply(tagged, list(on), bucket_fn,
                         num_buckets=num_buckets)


def broadcast_join(ds, small: pd.DataFrame, *, on: list[str],
                   how: str = "left"):
    """Broadcast join: the small side is ``ray.put`` once; every batch does
    a local pandas merge — zero shuffle (the taxonomy-join pattern,
    process_data.py:22)."""
    ref = ray.put(small)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return df.merge(ray.get(ref), on=on, how=how)

    return ds.map_batches(fn, batch_format="pandas")
