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
import pyarrow.compute as pc
import ray

from .shuffle import grouped_apply


def _tag_union(left_ds, right_ds):
    """Tag both sides with ``__side`` and union into one dataset with the
    column-union schema (typed null-fill; int columns absent on one side
    carried as pandas nullable Int64/UInt64 so values above 2^53 survive).
    Shared by ``hash_join`` and ``sort_merge_join``. Returns
    (tagged, lcols, rcols, types, all_cols)."""
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

    # Integer columns that are ABSENT on one side get null-filled there;
    # the pandas conversion inside grouped_apply would upcast such a column
    # to float64 for the whole bucket — LOSSY above 2^53 (e.g. packed cell
    # ids carry the resolution in bits 58+). Carry exactly those columns as
    # pandas nullable Int64 end-to-end instead; columns present on both
    # sides (the join keys in particular) keep the fast numpy path.
    int_nullable = [c for c in all_cols
                    if (c not in lcols or c not in rcols)
                    and pa.types.is_integer(types[c])]

    def tag(side: int, present: list[str]):
        def fn(t: pa.Table):
            n = len(t)
            side_col = np.full(n, side, dtype=np.int8)
            if not int_nullable:
                out = {"__side": pa.array(side_col)}
                for c in all_cols:
                    out[c] = (t[c] if c in present
                              else pa.nulls(n, types[c]))
                return pa.table(out)
            data = {"__side": pd.Series(side_col)}
            for c in all_cols:
                if c in int_nullable:
                    # unsigned sources stay unsigned (UInt64) — an
                    # astype(int64) would wrap values >= 2^63 negative
                    np_t = (np.uint64
                            if pa.types.is_unsigned_integer(types[c])
                            else np.int64)
                    if c in present:
                        vals = t[c].to_numpy(zero_copy_only=False)
                        mask = pc.is_null(t[c]).to_numpy(
                            zero_copy_only=False)
                        if mask.any():
                            vals = np.where(mask, 0, vals)
                        data[c] = pd.arrays.IntegerArray(
                            vals.astype(np_t), mask=mask.copy())
                    else:
                        data[c] = pd.arrays.IntegerArray(
                            np.zeros(n, np_t), mask=np.ones(n, bool))
                else:
                    col = (t[c] if c in present
                           else pa.nulls(n, types[c]))
                    data[c] = col.to_pandas()
            return pd.DataFrame(data)
        return fn

    tagged = (left_ds.map_batches(tag(0, lcols), batch_format="pyarrow")
              .union(right_ds.map_batches(tag(1, rcols),
                                          batch_format="pyarrow")))
    return tagged, lcols, rcols, types, all_cols


def hash_join(left_ds, right_ds, *, on: list[str], how: str = "inner",
              num_buckets: int = 64):
    """Partitioned hash join on ``on`` (columns present on both sides;
    non-key column names must not collide — pre-rename)."""
    tagged, lcols, rcols, types, all_cols = _tag_union(left_ds, right_ds)

    def bucket_fn(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["__side"] == 0][lcols]
        right = df[df["__side"] == 1][rcols]
        return left.merge(right, on=on, how=how)

    # restore source dtypes: inside a bucket each side's columns are
    # null-filled for the other side's rows, so pandas upcasts int64
    # columns to float64 for the WHOLE bucket — cast the join output back
    return grouped_apply(tagged, list(on), bucket_fn,
                         num_buckets=num_buckets,
                         out_dtypes={c: types[c] for c in all_cols})


def broadcast_join(ds, small: pd.DataFrame, *, on: list[str],
                   how: str = "left"):
    """Broadcast join: the small side is ``ray.put`` once; every batch does
    a local pandas merge — zero shuffle (the taxonomy-join pattern,
    process_data.py:22)."""
    ref = ray.put(small)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return df.merge(ray.get(ref), on=on, how=how)

    return ds.map_batches(fn, batch_format="pandas")


class BloomFilter:
    """Deterministic blocked Bloom filter over int64 keys (k=4 probes via
    splitmix64 re-hash; m bits). Vectorized build + probe; false-positive
    rate ~ (1-e^(-kn/m))^k. The canonical big-side PRE-FILTER: broadcast
    the small side's filter, drop most non-matching rows before the exact
    join — no correctness loss (no false negatives), the exact verify
    removes false positives."""

    def __init__(self, n_bits_log2: int = 20, probes: int = 4):
        self.m = 1 << n_bits_log2
        self.probes = probes
        self.bits = np.zeros(self.m // 8, dtype=np.uint8)

    @staticmethod
    def _mix(x: "np.ndarray", salt: int) -> "np.ndarray":
        x = x.astype(np.uint64) + np.uint64(
            (salt * 0x9E3779B97F4A7C15) % (1 << 64))
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))

    def add(self, keys: "np.ndarray") -> None:
        for s in range(self.probes):
            pos = (self._mix(keys, s) % np.uint64(self.m)).astype(np.int64)
            np.bitwise_or.at(self.bits, pos >> 3,
                             (1 << (pos & 7)).astype(np.uint8))

    def might_contain(self, keys: "np.ndarray") -> "np.ndarray":
        out = np.ones(len(keys), dtype=bool)
        for s in range(self.probes):
            pos = (self._mix(keys, s) % np.uint64(self.m)).astype(np.int64)
            out &= (self.bits[pos >> 3] & (1 << (pos & 7))) != 0
        return out


def bloom_semi_join(big_ds, small_keys: "np.ndarray", on: str,
                    *, n_bits_log2: int = 20):
    """Semi join big ⋉ small with a broadcast Bloom pre-filter + exact
    verify: the filter (128 KB at 2^20 bits) drops almost every
    non-matching big-side row inside the scan; the surviving rows get the
    exact membership check against the (sorted) key set — the result is
    EXACT, the filter only saves work. At 100 TB the small side's keys may
    themselves be partial-deduped first; only the filter + key array are
    broadcast."""
    bf = BloomFilter(n_bits_log2)
    keys = np.unique(small_keys.astype(np.int64))
    bf.add(keys)
    import ray
    ref = ray.put((bf.bits, keys))

    def fn(t: pa.Table) -> pa.Table:
        bits, ks = ray.get(ref)
        f = BloomFilter.__new__(BloomFilter)
        f.m = len(bits) * 8
        f.probes = 4
        f.bits = bits
        v = t[on].to_numpy(zero_copy_only=False).astype(np.int64)
        cand = f.might_contain(v)
        if not cand.any():
            return t.slice(0, 0)
        t = t.filter(pa.array(cand))
        v = t[on].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(ks, v)
        exact = (pos < len(ks)) & (ks[np.minimum(pos, len(ks) - 1)] == v)
        return t.filter(pa.array(exact))

    return big_ds.map_batches(fn, batch_format="pyarrow")


def range_boundaries(ds, col: str, num_ranges: int, *,
                     n_bins: int = 4096) -> "np.ndarray":
    """Approximate equal-COUNT range boundaries of a numeric column from
    ONE per-batch histogram pass (combine-before-shuffle: each batch ships
    n_bins ints, the driver folds them). Deterministic; boundary precision
    only affects partition balance, never correctness — both join sides
    range-tag with the same searchsorted."""
    from ray.data.aggregate import Max, Min

    stats = ds.aggregate(Min(col), Max(col))
    if stats is None or stats.get(f"min({col})") is None:
        return np.empty(0, np.float64)      # empty input: no boundaries
    lo = float(stats[f"min({col})"])
    hi = float(stats[f"max({col})"])
    if not lo < hi:
        return np.empty(0, np.float64)
    width = (hi - lo) / n_bins

    def hist(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.clip(((v - lo) / width).astype(np.int64), 0, n_bins - 1)
        return pa.table({"bin": np.arange(n_bins, dtype=np.int64),
                         "cnt": np.bincount(b, minlength=n_bins)
                         .astype(np.int64)})

    total = np.zeros(n_bins, dtype=np.int64)
    for bt in (ds.map_batches(hist, batch_format="pyarrow")
               .iter_batches(batch_size=None, batch_format="pyarrow")):
        # np.add.at, NOT fancy-index +=: Ray may coalesce several per-call
        # histogram tables into one block, so a batch can repeat bin ids —
        # fancy-index += applies only one add per duplicate and undercounts
        np.add.at(total, bt["bin"].to_numpy(zero_copy_only=False),
                  bt["cnt"].to_numpy(zero_copy_only=False))
    cum = np.cumsum(total)
    n = int(cum[-1])
    bounds = {float(lo + (int(np.searchsorted(cum, i * n // num_ranges))
                          + 1) * width)
              for i in range(1, num_ranges)}
    return np.array(sorted(bounds), np.float64)


def sort_merge_join(left_ds, right_ds, *, on: str, how: str = "inner",
                    num_ranges: int = 16):
    """RANGE-partitioned sort-merge join on one numeric key — the third
    join backend next to ``hash_join`` (hash-bucketed) and
    ``broadcast_join`` (no shuffle), certified against the same oracle by
    orders_by_mktsegment_sortmerge. Boundaries come from one histogram
    pass over the LEFT key (approximate equal-count, so a skewed key
    space still balances); both sides tag ranges with the identical
    searchsorted, so co-location is exact wherever the boundaries land;
    each range sorts its two slices by key and merges. Unlike the hash
    backend the output arrives range-ORDERED by key — the property a
    downstream merge consumer (as-of, interval join, range-partitioned
    write) can exploit without re-sorting."""
    from .shuffle import cast_columns

    tagged, lcols, rcols, types, all_cols = _tag_union(left_ds, right_ds)
    bounds = range_boundaries(left_ds, on, num_ranges)
    bref = ray.put(bounds)

    def add_range(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(bref)
        df = df.copy(deep=False)
        keys = df[on].to_numpy()
        df["__range"] = np.searchsorted(
            b, keys.astype(np.float64), side="right").astype(np.int64) \
            if len(b) else np.zeros(len(df), np.int64)
        return df

    def merge_range(df: pd.DataFrame) -> pd.DataFrame:
        left = (df[df["__side"] == 0][lcols]
                .sort_values(on, kind="mergesort"))
        right = (df[df["__side"] == 1][rcols]
                 .sort_values(on, kind="mergesort"))
        return left.merge(right, on=on, how=how, sort=False)

    out = (tagged.map_batches(add_range, batch_format="pandas")
           .groupby("__range")
           .map_groups(lambda df: merge_range(
               df.drop(columns=["__range"])), batch_format="pandas"))
    return out.map_batches(
        lambda t: cast_columns(t, {c: types[c] for c in all_cols
                                   if c in t.column_names}),
        batch_format="pyarrow", zero_copy_batch=True)


def skew_split_join(big_ds, small_df: "pd.DataFrame", *, on: str,
                    hot_keys: "np.ndarray"):
    """Skew-mitigated inner equi-join of a BIG fact side against a small
    dimension when a few keys dominate the fact table (the join sibling
    of the salted-aggregation pattern): rows with a HOT key join against
    a broadcast slice of the dimension inside ``map_batches`` (those
    keys never enter the shuffle, so no bucket receives a
    data-scale-sized group), while the cold remainder takes the normal
    bucketed ``hash_join``. Result equals a plain join — certified by
    the hash_join-equality property test on zipf data
    (tests/test_round4f_kernels.py). ``hot_keys`` typically comes from
    a heavy-hitter pass (shuffle.heavy_hitters_exact)."""
    hot = np.unique(np.asarray(hot_keys, dtype=np.int64))
    hot_dim = small_df[small_df[on].isin(hot)]
    cold_dim = small_df[~small_df[on].isin(hot)]
    ref = ray.put((hot, hot_dim))

    def _is_hot(h: "np.ndarray", keys: "np.ndarray") -> "np.ndarray":
        if not len(h):
            return np.zeros(len(keys), bool)
        pos = np.searchsorted(h, keys)
        return (pos < len(h)) & (h[np.minimum(pos, len(h) - 1)] == keys)

    def hot_part(df: "pd.DataFrame") -> "pd.DataFrame":
        h, dim = ray.get(ref)
        return df[_is_hot(h, df[on].to_numpy())].merge(dim, on=on,
                                                       how="inner")

    def cold_part(df: "pd.DataFrame") -> "pa.Table":
        h, _ = ray.get(ref)
        out = df[~_is_hot(h, df[on].to_numpy())]
        # emit ARROW so hash_join's _tag_union sees arrow types (a
        # pandas-block schema carries numpy object dtypes that crash
        # pa.types predicates)
        return pa.Table.from_pandas(out, preserve_index=False)

    import ray.data as rd

    # ONE scan of the fact side: both branches consume the same
    # materialized blocks (Ray does not dedupe a shared upstream plan
    # across a union — without this the full read+prep lineage runs
    # twice, doubling fact-side I/O; the blocks spill to the object
    # store, which is the cheaper side of the tradeoff whenever the
    # upstream includes real per-row compute)
    big_ds = big_ds.materialize()
    hot_out = big_ds.map_batches(hot_part, batch_format="pandas")
    cold_big = big_ds.map_batches(cold_part, batch_format="pandas")
    if len(cold_dim):
        cold_out = hash_join(
            cold_big,
            rd.from_arrow(pa.Table.from_pandas(
                cold_dim.reset_index(drop=True), preserve_index=False)),
            on=[on], num_buckets=16)
        return hot_out.union(cold_out)
    return hot_out
