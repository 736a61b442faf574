"""merge_similar_observations — the flagship CSV-driven grouped merge.

Reproduces the semantics of the reference's PostGIS-pushed merge
(``/root/reference/pygeoapi/scripts/edit_db.py:381-460``; declarative spec =
the ``merge_option`` column of ``scripts/resources/lookup_table_columns.csv``):

- GROUP BY the ``GROUPBY`` columns;
- ``FIRST``      → first value in deterministic group order, NULLs included
                   (the reference's ``(ARRAY_AGG(col))[1]``);
- ``AGGREGATE``  → ``string_agg(col, ', ')`` over values that are neither
                   NULL nor the literal string ``'nan'`` (``edit_db.py:418``),
                   in deterministic group order; empty → NULL;
- ``SUM``        → sum, NULL when all inputs NULL (``edit_db.py:396,419-420``);
- ``MAX``        → max;
- plus ``Yhdistetty`` = the number of merged observations (the reference
  derives it from the merged id list, ``edit_db.py:442-446``; with non-null
  ids that equals the group row count, which is what we compute).

The reference's in-group order is PostgreSQL insertion order — not
reproducible; the engine instead REQUIRES explicit ``order_cols``
(SURVEY.md §7.4) so Ray and the DuckDB oracle (``first(col ORDER BY …)`` /
``string_agg(col, ', ' ORDER BY …)``) agree exactly.

Execution: bucketed shuffle + vectorized pandas group-aggregate per bucket
(see stages/shuffle.py). For a pathological giant single key, pre-split it
with a salt column, merge partials, then run a second pass over the
(tiny) salted partials — ``merge_salted`` below.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from .shuffle import grouped_apply


@dataclass(frozen=True)
class MergeSpec:
    groupby: list[str]
    order: list[str]                       # deterministic in-group ordering
    first: list[str] = field(default_factory=list)
    aggregate: list[str] = field(default_factory=list)   # str columns only
    sum: list[str] = field(default_factory=list)
    max: list[str] = field(default_factory=list)
    count_col: str | None = "Yhdistetty"


def merge_bucket(df: pd.DataFrame, spec: MergeSpec) -> pd.DataFrame:
    """Vectorized merge of one bucket (thousands of key-groups at once)."""
    keys = spec.groupby
    df = df.sort_values(by=keys + spec.order, kind="mergesort")
    grouped = df.groupby(keys, sort=False, dropna=False)

    # FIRST (NULLs included): the first physical row per group after sorting
    out = df.drop_duplicates(subset=keys, keep="first")[keys + spec.first]
    out = out.set_index(pd.MultiIndex.from_frame(out[keys])
                        if len(keys) > 1 else out[keys[0]])
    parts = [out.drop(columns=keys)]

    if spec.sum:
        parts.append(grouped[spec.sum].sum(min_count=1)
                     .rename(columns=lambda c: c))
    if spec.max:
        parts.append(grouped[spec.max].max())
    for col in spec.aggregate:
        vals = df[df[col].notna() & (df[col] != "nan")]
        agg = vals.groupby(keys, sort=False, dropna=False)[col].agg(", ".join)
        parts.append(agg.reindex(parts[0].index).to_frame(col))
    if spec.count_col:
        parts.append(grouped.size().rename(spec.count_col).astype("int64"))

    merged = pd.concat(parts, axis=1)
    merged.index.names = keys if len(keys) > 1 else [keys[0]]
    return merged.reset_index()


def merge_similar(ds, spec: MergeSpec, *, num_buckets: int = 64):
    """Distributed merge: one shuffle on the hashed GROUPBY tuple, vectorized
    per-bucket aggregation."""
    return grouped_apply(ds, spec.groupby, lambda df: merge_bucket(df, spec),
                         num_buckets=num_buckets)


def merge_salted(ds, spec: MergeSpec, *, salt_mod: int = 16,
                 num_buckets: int = 64):
    """Two-phase skew-tolerant merge (SURVEY.md §4 "Skew") for giant single
    keys (e.g. the Helsinki-cluster cell): phase 1 splits every group by a
    RANGE-salt of the primary order column and merges each (key, salt)
    sub-group; phase 2 combines the per-salt partials.

    The salt is *range-based* (bucketed on the primary order column between
    its global min/max), so partials are contiguous in group order:
    sorting partials by salt reproduces the global order — FIRST picks the
    first partial's value and AGGREGATE concatenates partial strings in salt
    order, both exactly equal to the single-phase result (see
    tests/test_shuffle_ops.py::test_salted_merge_equals_plain). Float SUMs
    may differ from single-phase in the last ulp (different summation
    order); integral sums are exact.
    """
    import pyarrow as pa
    from ray.data.aggregate import Max as RMax, Min as RMin

    order0 = spec.order[0]
    lohi = ds.aggregate(RMin(order0), RMax(order0))
    lo, hi = float(lohi[f"min({order0})"]), float(lohi[f"max({order0})"])
    span = (hi - lo) or 1.0

    def add_salt(t: pa.Table) -> pa.Table:
        o = t[order0].to_numpy(zero_copy_only=False).astype(np.float64)
        salt = np.clip(((o - lo) / span * salt_mod).astype(np.int64),
                       0, salt_mod - 1)
        return t.append_column("__salt", pa.array(salt))

    spec1 = MergeSpec(groupby=spec.groupby + ["__salt"], order=spec.order,
                      first=spec.first, aggregate=spec.aggregate,
                      sum=spec.sum, max=spec.max, count_col="__n")
    partials = merge_similar(ds.map_batches(add_salt, batch_format="pyarrow"),
                             spec1, num_buckets=num_buckets)

    def phase2(df: pd.DataFrame) -> pd.DataFrame:
        keys = spec.groupby
        df = df.sort_values(by=keys + ["__salt"], kind="mergesort")
        grouped = df.groupby(keys, sort=False, dropna=False)
        out = df.drop_duplicates(subset=keys, keep="first")[keys + spec.first]
        out = out.set_index(pd.MultiIndex.from_frame(out[keys])
                            if len(keys) > 1 else out[keys[0]])
        parts = [out.drop(columns=keys)]
        if spec.sum:
            parts.append(grouped[spec.sum].sum(min_count=1))
        if spec.max:
            parts.append(grouped[spec.max].max())
        for col in spec.aggregate:
            vals = df[df[col].notna()]
            agg = vals.groupby(keys, sort=False, dropna=False)[col].agg(", ".join)
            parts.append(agg.reindex(parts[0].index).to_frame(col))
        if spec.count_col:
            parts.append(grouped["__n"].sum().rename(spec.count_col).astype("int64"))
        merged = pd.concat(parts, axis=1)
        merged.index.names = keys if len(keys) > 1 else [keys[0]]
        return merged.reset_index()

    return grouped_apply(partials, spec.groupby, phase2,
                         num_buckets=max(8, num_buckets // 4))
