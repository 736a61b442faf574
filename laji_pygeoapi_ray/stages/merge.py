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


def _group_ids(df: pd.DataFrame, keys: list[str]) -> np.ndarray:
    """Integer group id per row (first-occurrence order). Keys are
    stringified first so every missing-value representation (None / NaN /
    NaT across Arrow→pandas block boundaries) collapses to one <NA> —
    grouping on raw object columns can split a group whose key mixes None
    and NaN, and a NaN-bearing MultiIndex breaks pd.concat alignment
    (observed: duplicated output groups on the 23-key occurrence spec)."""
    ks = [df[c].astype("string") for c in keys]
    return df.groupby(ks, sort=False, dropna=False).ngroup().to_numpy()


def merge_bucket(df: pd.DataFrame, spec: MergeSpec) -> pd.DataFrame:
    """Vectorized merge of one bucket (thousands of key-groups at once);
    all partials align on a dense integer group id (never on raw keys)."""
    keys = spec.groupby
    df = df.sort_values(by=keys + spec.order, kind="mergesort")
    df = df.assign(__gid=_group_ids(df, keys))
    grouped = df.groupby("__gid", sort=True)

    # FIRST (NULLs included): the first physical row per group after sorting
    firsts = df.drop_duplicates(subset="__gid", keep="first")
    firsts = firsts.sort_values("__gid").set_index("__gid")
    parts = [firsts[keys + spec.first]]

    if spec.sum:
        parts.append(grouped[spec.sum].sum(min_count=1))
    if spec.max:
        parts.append(grouped[spec.max].max())
    for col in spec.aggregate:
        vals = df[df[col].notna() & (df[col] != "nan")]
        agg = vals.groupby("__gid", sort=True)[col].agg(", ".join)
        parts.append(agg.reindex(parts[0].index).to_frame(col))
    if spec.count_col:
        parts.append(grouped.size().rename(spec.count_col).astype("int64"))

    return pd.concat(parts, axis=1).reset_index(drop=True)


def merge_similar(ds, spec: MergeSpec, *,
                  num_buckets: int | None = None):
    """Distributed merge: one shuffle on the hashed GROUPBY tuple, vectorized
    per-bucket aggregation."""
    return grouped_apply(ds, spec.groupby, lambda df: merge_bucket(df, spec),
                         num_buckets=num_buckets)


def merge_salted(ds, spec: MergeSpec, *, salt_mod: int = 16,
                 num_buckets: int | None = None):
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

    from .shuffle import default_num_buckets
    if num_buckets is None:
        num_buckets = default_num_buckets()

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
        df = df.assign(__gid=_group_ids(df, keys))
        grouped = df.groupby("__gid", sort=True)
        firsts = df.drop_duplicates(subset="__gid", keep="first")
        firsts = firsts.sort_values("__gid").set_index("__gid")
        parts = [firsts[keys + spec.first]]
        if spec.sum:
            parts.append(grouped[spec.sum].sum(min_count=1))
        if spec.max:
            parts.append(grouped[spec.max].max())
        for col in spec.aggregate:
            vals = df[df[col].notna()]
            agg = vals.groupby("__gid", sort=True)[col].agg(", ".join)
            parts.append(agg.reindex(parts[0].index).to_frame(col))
        if spec.count_col:
            parts.append(grouped["__n"].sum().rename(spec.count_col).astype("int64"))
        return pd.concat(parts, axis=1).reset_index(drop=True)

    return grouped_apply(partials, spec.groupby, phase2,
                         num_buckets=max(8, num_buckets // 4))


def merge_spec_from_csv(order: list[str],
                        count_col: str = "Yhdistetty") -> MergeSpec:
    """Build the occurrence MergeSpec straight from the lookup CSV's
    merge_option column (the reference reads the same spec at
    edit_db.py:389-399): 23 GROUPBY keys; FIRST/AGGREGATE/MAX per column;
    the single MAX column; SUM exists in code but no shipped column uses it.
    Geometry ('' merge_option) and the count column are excluded from
    aggregation."""
    from .. import spec as specmod

    mc = specmod.merge_columns()
    return MergeSpec(
        groupby=mc.get("GROUPBY", []),
        order=order,
        first=mc.get("FIRST", []),
        aggregate=[c for c in mc.get("AGGREGATE", []) if c != count_col],
        sum=mc.get("SUM", []),
        max=mc.get("MAX", []),
        count_col=count_col,
    )
