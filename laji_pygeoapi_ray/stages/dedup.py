"""Exact deduplication — keep-latest-per-key.

Reproduces the reference's ``remove_duplicates``
(``/root/reference/pygeoapi/scripts/edit_db.py:333-379``):
``SELECT DISTINCT ON (id) … ORDER BY id, load_date DESC`` — i.e. per key keep
the row with the greatest order column(s); upsert is implemented as
append-then-keep-latest (SURVEY.md §2.8). The engine generalizes the key
(``Havainnon_tunniste`` / ``image_id`` / any tuple) and requires explicit
tie-break columns so the result is deterministic (the reference's DISTINCT ON
tie-break is unspecified; SURVEY.md §7.4 "hard parts").

Execution: one bucketed shuffle (stages/shuffle.py), then a vectorized
sort + drop_duplicates per bucket — no per-key Python.
"""
from __future__ import annotations

import pandas as pd

from .shuffle import grouped_apply


def dedup_keep_latest(ds, key_cols: list[str], order_cols: list[str],
                      *, descending: bool = True,
                      num_buckets: int | None = None):
    """Keep, per key tuple, the row that sorts FIRST by
    (order_cols DESC when ``descending`` — keep-latest — else ASC —
    keep-first) — ties broken by the last order column, so pass a unique
    column (e.g. the record id) last."""
    keys = list(key_cols)
    order = list(order_cols)

    def bucket_fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(by=keys + order,
                            ascending=[True] * len(keys)
                            + [not descending] * len(order),
                            kind="mergesort")
        return df.drop_duplicates(subset=keys, keep="first")

    return grouped_apply(ds, keys, bucket_fn, num_buckets=num_buckets)
