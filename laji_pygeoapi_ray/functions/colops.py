"""Vectorized column operators — the per-batch transform family of
SURVEY.md §2.2, re-expressed as pure pyarrow.compute / numpy kernels.

Semantics reproduced (file:line into /root/reference):
- ``combine_similar_columns``       process_data.py:41-84
- ``compute_individual_count``      compute_variables.py:34-47
- ``compute_collection_id``         compute_variables.py:49-64
- ``map_values`` (multi-valued)     compute_variables.py:66-77
- ``compute_areas``                 compute_variables.py:79-98
- strip-URL / direct enum maps      compute_variables.py:154-197
- URL id prefix strip               convert_api_filters.py:59-65
"""
from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

URL_PREFIX_RE = r"http://[^/]+\.fi/"
FAMILY_RE = re.compile(r"^(.*)\[\d+\]$")


def dict_map(arr: pa.Array, mapping: dict, *, keep_on_miss: bool = False) -> pa.Array:
    """Vectorized dict lookup over a string array via ``pc.index_in``
    against the mapping's key array + ``pc.take`` from its value array —
    no Python loop over rows. Miss → null (the enum maps) or the original
    value (the value-range fallback)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.cast(arr, pa.string())
    keys = pa.array(list(mapping.keys()), pa.string())
    vals = pa.array([mapping[k] for k in mapping], pa.string())
    idx = pc.index_in(arr, value_set=keys)
    mapped = pc.take(vals, idx)
    if keep_on_miss:
        # miss = input valid but key absent (idx null) → keep the input
        mapped = pc.if_else(pc.and_(pc.is_valid(arr), pc.is_null(idx)),
                            arr, mapped)
    return mapped


def combine_similar_columns(batch: pa.Table) -> pa.Table:
    """Find ``base[0..n]`` column families; per row join their non-null
    values with ', ' into one ``base`` column; drop the originals."""
    families: dict[str, list[str]] = {}
    for name in batch.column_names:
        m = FAMILY_RE.match(name)
        if m:
            families.setdefault(m.group(1), []).append(name)
    for base, cols in families.items():
        cols.sort(key=lambda c: int(c[len(base) + 1:-1]))
        # iterative null-skipping fold (pyarrow 16's null_handling='skip'
        # DROPS all-null rows from the output instead of emitting null, so
        # it can't be used): both-valid → 'acc, m'; m-only → m; else acc.
        joined = None
        for c in cols:
            m = pc.cast(batch[c], pa.string())
            if isinstance(m, pa.ChunkedArray):
                m = m.combine_chunks()
            if joined is None:
                joined = m
                continue
            concat = pc.binary_join_element_wise(joined, m, pa.scalar(", "))
            joined = pc.if_else(pc.is_valid(concat), concat,
                                pc.if_else(pc.is_valid(m), m, joined))
        batch = batch.drop_columns(cols).append_column(base, joined)
    return batch


def compute_individual_count(col: pa.Array) -> pa.Array:
    """x > 0 → 'paikalla', x ≤ 0 → 'poissa', null → null."""
    return pc.if_else(pc.greater(col, 0), pa.scalar("paikalla"),
                      pc.if_else(pc.less_equal(col, 0),
                                 pa.scalar("poissa"),
                                 pa.scalar(None, pa.string())))


def strip_to_id(col: pa.Array) -> pa.Array:
    """'http://tun.fi/HR.3553' → 'HR.3553' (split('/')[-1])."""
    return pc.replace_substring_regex(pc.cast(col, pa.string()),
                                      r"^.*/", "")


def compute_collection_id(col: pa.Array, collection_names: dict) -> pa.Array:
    """Strip URL, dict-map id → long collection name (miss → null)."""
    return dict_map(strip_to_id(col), collection_names)


def strip_url_prefix(col: pa.Array) -> pa.Array:
    """Remove the ``http://*.fi/`` id prefix (convert_api_filters.py:59-65)."""
    return pc.replace_substring_regex(pc.cast(col, pa.string()),
                                      URL_PREFIX_RE, "")


def _map_list_values(col: pa.Array, mapping: dict, *, strip_prefix: bool,
                     keep_on_miss: bool) -> pa.Array:
    """Split a ', '-joined cell, optionally strip the URL prefix per value,
    dict-map each value, re-join — the multi-valued mapper shared by
    ``map_values`` and ``compute_areas``."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.cast(col, pa.string())
    lists = pc.split_pattern(col, ", ")
    flat = lists.flatten()
    if strip_prefix:
        flat = pc.replace_substring_regex(flat, URL_PREFIX_RE, "")
    mapped = dict_map(flat, mapping, keep_on_miss=keep_on_miss)
    rebuilt = pa.ListArray.from_arrays(lists.offsets, mapped)
    joined = pc.binary_join(rebuilt, ", ")
    return pc.if_else(pc.is_valid(col), joined,
                      pa.nulls(len(col), pa.string()))


def map_values(col: pa.Array, value_ranges: dict) -> pa.Array:
    """Multi-valued enum mapper: split ', ', strip URL prefix, map with
    keep-original fallback, re-join."""
    return _map_list_values(col, value_ranges, strip_prefix=True,
                            keep_on_miss=True)


def compute_areas(col: pa.Array, area_mapping: dict) -> pa.Array:
    """Municipality display-name list → ELY / Elinvoimakeskus list
    (keep-original fallback; null passthrough)."""
    return _map_list_values(col, area_mapping, strip_prefix=False,
                            keep_on_miss=True)


def enum_map_strip_url(col: pa.Array, value_ranges: dict) -> pa.Array:
    """Strip URL prefix then dict-map; miss → null."""
    return dict_map(strip_url_prefix(col), value_ranges)


def enum_map_direct(col: pa.Array, value_ranges: dict) -> pa.Array:
    """Direct dict-map; miss → null."""
    return dict_map(pc.cast(col, pa.string()), value_ranges)


def local_id_encode(col: pa.Array) -> pa.Array:
    """unitId '#' → '_' (compute_variables.py:240)."""
    return pc.replace_substring(pc.cast(col, pa.string()), "#", "_")


def local_id_decode(col: pa.Array) -> pa.Array:
    """The serving-path inverse: ALL '_' → '#', matching the reference's
    ``str(identifier).replace('_', '#')`` (lajiapi_provider.py:141) — the
    round trip is faithful because upstream unit ids contain no literal
    underscores. Vectorized."""
    return pc.replace_substring(pc.cast(col, pa.string()), "_", "#")
