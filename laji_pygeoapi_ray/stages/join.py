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

import itertools
import os as _os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .shuffle import grouped_apply

# per-WORKER-PROCESS batch sequence for the skew-join hot-bucket salt
# (module state lives in each worker, not in the pickled closure — a
# closure-level counter would restart at 0 in every task)
_ROUTE_SEQ = itertools.count()


def _normalize_pa_type(typ):
    """Coerce a schema-probe type entry to a pyarrow DataType. Ray's
    ``Dataset.schema()`` over PANDAS blocks yields pa types for
    numeric/datetime columns but raw ``<class 'object'>`` for
    object-dtype (string) columns — which crashes ``pa.types.is_integer``
    / ``pa.nulls`` on contact. Map object→string (the engine's pandas
    object columns are always strings) and numpy dtypes through
    ``pa.from_numpy_dtype``."""
    if isinstance(typ, pa.DataType):
        return typ
    if typ is object:
        return pa.string()
    return pa.from_numpy_dtype(np.dtype(typ))


def _tag_union(left_ds, right_ds, *, left_schema=None, right_schema=None,
               force_nullable_int=()):
    """Tag both sides with ``__side`` and union into one dataset with the
    column-union schema (typed null-fill; int columns absent on one side
    carried as pandas nullable Int64/UInt64 so values above 2^53 survive).
    Shared by ``hash_join`` and ``sort_merge_join``. Returns
    (tagged, lcols, rcols, types, all_cols). Pass ``left_schema`` /
    ``right_schema`` (ray Schema or pa.Schema — anything with
    .names/.types) when known to skip the ``Dataset.schema()`` limit-1
    probe, which costs a prefix execution of the lineage.

    ``force_nullable_int``: integer columns that are PRESENT on both
    sides but may carry nulls (e.g. ``skew_split_join``'s null-filled
    dim columns on cold fact rows). Such columns would otherwise take
    the plain ``to_pandas()`` path, which converts int-with-nulls to
    float64 — silently rounding values above 2^53 (packed cell ids).
    Listing them here carries them as pandas nullable Int64/UInt64
    end-to-end instead."""
    lschema = left_schema if left_schema is not None else left_ds.schema()
    rschema = (right_schema if right_schema is not None
               else right_ds.schema())
    lcols, rcols = lschema.names, rschema.names
    all_cols = list(dict.fromkeys(lcols + rcols))
    # typed null-fill: an untyped pa.nulls column gives the two union sides
    # DIFFERENT schemas for the same column name (Ray warns and downstream
    # consumers may mis-concat); take each column's type from whichever
    # side defines it
    types = {}
    for name, typ in zip(rschema.names, rschema.types):
        types[name] = _normalize_pa_type(typ)
    for name, typ in zip(lschema.names, lschema.types):
        types[name] = _normalize_pa_type(typ)

    # Integer columns that are ABSENT on one side get null-filled there;
    # the pandas conversion inside grouped_apply would upcast such a column
    # to float64 for the whole bucket — LOSSY above 2^53 (e.g. packed cell
    # ids carry the resolution in bits 58+). Carry exactly those columns as
    # pandas nullable Int64 end-to-end instead; columns present on both
    # sides (the join keys in particular) keep the fast numpy path.
    int_nullable = [c for c in all_cols
                    if ((c not in lcols or c not in rcols)
                        or c in force_nullable_int)
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
                        # fill nulls IN ARROW first: to_numpy on an int
                        # column with nulls yields float64 (NaN-filled),
                        # which would round the non-null values > 2^53
                        mask = pc.is_null(t[c]).to_numpy(
                            zero_copy_only=False)
                        vals = pc.fill_null(t[c], 0).to_numpy(
                            zero_copy_only=False)
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
              num_buckets: int | None = None,
              left_schema=None, right_schema=None):
    """Partitioned hash join on ``on`` (columns present on both sides;
    non-key column names must not collide — pre-rename). ``num_buckets``
    defaults to ``shuffle.default_num_buckets()`` (~2× cluster cores,
    floor 16) so the shuffle fan-out tracks the cluster, not a constant.
    Pass ``left_schema`` / ``right_schema`` when known statically to
    skip ``_tag_union``'s limit-1 ``Dataset.schema()`` probes (a prefix
    execution of each lineage).

    NULL join keys follow SQL semantics: a NULL never equals a NULL
    (pandas merge would match NaN==NaN and emit a null-key cross
    product), so null-key rows are excluded from the match and
    re-appended unmatched per ``how``. Caveat: an INT key column that
    carries nulls reaches the bucket as NaN-filled float64, which
    rounds non-null key values above 2^53 — declare such keys upstream
    (fill or split) before joining."""
    tagged, lcols, rcols, types, all_cols = _tag_union(
        left_ds, right_ds, left_schema=left_schema,
        right_schema=right_schema)

    def _nullkey(d: pd.DataFrame) -> "np.ndarray":
        m = np.zeros(len(d), bool)
        for k in on:
            m |= d[k].isna().to_numpy()
        return m

    def bucket_fn(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["__side"] == 0][lcols]
        right = df[df["__side"] == 1][rcols]
        lm, rm = _nullkey(left), _nullkey(right)
        out = left[~lm].merge(right[~rm], on=on, how=how)
        extras = []
        if how in ("left", "outer") and lm.any():
            extras.append(left[lm])     # unmatched; concat null-fills
        if how in ("right", "outer") and rm.any():
            extras.append(right[rm])
        if extras:
            out = pd.concat([out] + extras, ignore_index=True)
        return out

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
        # splitmix64 over (x + salt·golden): delegate the finalizer to
        # the single shared implementation (textkernels.mix64) so the
        # hash stream can never silently diverge between copies
        from ..functions.textkernels import mix64
        return mix64(x.astype(np.uint64) + np.uint64(
            (salt * 0x9E3779B97F4A7C15) % (1 << 64)))

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


def _merge_weighted_samples(q: "np.ndarray", w: "np.ndarray",
                            keep: int) -> tuple["np.ndarray", "np.ndarray"]:
    """Compress weighted quantile samples to ≤ ``keep`` points: sort by
    value, walk the cumulative weight, keep the sample at each of ``keep``
    evenly spaced weight targets (each kept point carries total/keep).
    Precision only affects partition balance, never correctness."""
    order = np.argsort(q, kind="mergesort")
    q, w = q[order], w[order]
    cum = np.cumsum(w)
    total = float(cum[-1])
    targets = (np.arange(1, keep + 1) / keep) * total
    idx = np.minimum(np.searchsorted(cum, targets), len(q) - 1)
    return q[idx], np.full(len(idx), total / keep)


def range_boundaries(ds, col: str, num_ranges: int, *,
                     sample_per_batch: int = 256,
                     driver_keep: int = 4096) -> "np.ndarray":
    """Approximate equal-COUNT range boundaries of a numeric column from
    ONE scan (sample-sort / TeraSort style): each batch ships ≤
    ``sample_per_batch`` weighted local quantiles (a few KB), a distributed
    combine layer compresses runs of those samples, and the driver folds
    the remainder into boundaries. Replaces the former min/max-aggregate +
    histogram design, which scanned the input twice. Deterministic (evenly
    spaced order statistics, no RNG); boundary precision only affects
    partition balance, never correctness — both join sides range-tag with
    the same searchsorted."""

    def sample(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = np.sort(v[~np.isnan(v)])
        if not len(v):
            return pa.table({"q": pa.array([], pa.float64()),
                             "w": pa.array([], pa.float64())})
        k = min(sample_per_batch, len(v))
        idx = np.unique(np.round(np.linspace(0, len(v) - 1, k))
                        .astype(np.int64))
        return pa.table({"q": v[idx],
                         "w": np.full(len(idx), len(v) / len(idx),
                                      np.float64)})

    def combine(t: pa.Table) -> pa.Table:
        # distributed pre-fold: ≤64k sample rows in → ≤1024 out, so the
        # driver never sees more than ~(input_batches/256) samples; at
        # extreme scale stack another identical layer
        q = t["q"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        if len(q) <= 1024:
            return t
        q, w = _merge_weighted_samples(q, w, 1024)
        return pa.table({"q": q, "w": w})

    qs, ws = [], []
    for bt in (ds.map_batches(sample, batch_format="pyarrow")
               .map_batches(combine, batch_format="pyarrow",
                            batch_size=65536)
               .iter_batches(batch_size=None, batch_format="pyarrow")):
        qs.append(bt["q"].to_numpy(zero_copy_only=False))
        ws.append(bt["w"].to_numpy(zero_copy_only=False))
    if not qs:
        return np.empty(0, np.float64)
    q, w = np.concatenate(qs), np.concatenate(ws)
    if not len(q) or q.min() == q.max():
        return np.empty(0, np.float64)      # empty / single-valued input
    if len(q) > driver_keep:
        q, w = _merge_weighted_samples(q, w, driver_keep)
    order = np.argsort(q, kind="mergesort")
    q, w = q[order], w[order]
    cum = np.cumsum(w)
    total = float(cum[-1])
    bounds = {float(q[min(int(np.searchsorted(
        cum, i * total / num_ranges)), len(q) - 1)])
        for i in range(1, num_ranges)}
    return np.array(sorted(bounds), np.float64)


def sort_merge_join(left_ds, right_ds, *, on: str, how: str = "inner",
                    num_ranges: int = 16,
                    left_schema=None, right_schema=None):
    """RANGE-partitioned sort-merge join on one numeric key — the third
    join backend next to ``hash_join`` (hash-bucketed) and
    ``broadcast_join`` (no shuffle), certified against the same oracle by
    orders_by_mktsegment_sortmerge. Boundaries come from ONE weighted-
    sample pass over the LEFT key (approximate equal-count, so a skewed
    key space still balances) — so the left lineage executes twice
    (boundary scan + join scan), never three times, and nothing is
    materialized. Pass ``left_schema`` / ``right_schema`` when known
    statically to also skip ``_tag_union``'s limit-1 ``Dataset.schema()``
    probes (a prefix execution of each lineage — with them the left side
    really is exactly two full scans and the right exactly one).
    Both sides tag ranges with the identical searchsorted,
    so co-location is exact wherever the boundaries land; each range
    sorts its two slices by key and merges. Unlike the hash backend the
    output arrives range-ORDERED by key — the property a downstream
    merge consumer (as-of, interval join, range-partitioned write) can
    exploit without re-sorting."""
    from .shuffle import cast_columns

    tagged, lcols, rcols, types, all_cols = _tag_union(
        left_ds, right_ds, left_schema=left_schema,
        right_schema=right_schema)
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
        # SQL NULL-key semantics (NaN never matches NaN) — the hash
        # backend's convention
        lm = left[on].isna().to_numpy()
        rm = right[on].isna().to_numpy()
        out = left[~lm].merge(right[~rm], on=on, how=how, sort=False)
        extras = []
        if how in ("left", "outer") and lm.any():
            extras.append(left[lm])
        if how in ("right", "outer") and rm.any():
            extras.append(right[rm])
        if extras:
            out = pd.concat([out] + extras, ignore_index=True)
        return out

    out = (tagged.map_batches(add_range, batch_format="pandas")
           .groupby("__range")
           .map_groups(lambda df: merge_range(
               df.drop(columns=["__range"])), batch_format="pandas"))
    return out.map_batches(
        lambda t: cast_columns(t, {c: types[c] for c in all_cols
                                   if c in t.column_names}),
        batch_format="pyarrow", zero_copy_batch=True)


def skew_split_join(big_ds, small_df: "pd.DataFrame", *, on: str,
                    hot_keys: "np.ndarray", num_buckets: int | None = None,
                    fact_schema: "pa.Schema | None" = None):
    """Skew-mitigated inner equi-join of a BIG fact side against a
    dimension when a few keys dominate the fact table (the join sibling
    of the salted-aggregation pattern), as a SINGLE-PASS tag-and-route:
    one ``map_batches`` over the fact side inline-joins HOT-key rows
    against the broadcast hot slice of the dimension and tags them
    ``__hot=1`` with a round-robin bucket (so the hot key's mass spreads
    UNIFORMLY across the shuffle instead of landing in one
    data-scale-sized hash bucket), while cold rows tag
    ``__hot=0, __bucket=hash(key)``; the cold dimension slice tags the
    same key-hash buckets and the single bucketed exchange finishes the
    cold join per bucket, passing hot rows through untouched. The fact
    side is scanned exactly ONCE and nothing is materialized — the former
    design's full-fact ``materialize()`` (an object-store/spill storm at
    100 TB) is gone. Result equals a plain join — certified by the
    plain-merge property test on zipf data (tests/test_round4f_kernels.py)
    and the ``activity_weighted_value`` oracle. ``hot_keys`` typically
    comes from a heavy-hitter pass (shuffle.heavy_hitters_exact);
    ``num_buckets`` defaults to ``default_num_buckets()``. Pass
    ``fact_schema`` (callers usually know it statically — parquet
    fragment metadata / the prep stage's declared output) to skip even
    the limit-1 ``Dataset.schema()`` probe, making the fact lineage
    execute EXACTLY once."""
    import ray.data as rd

    from .shuffle import add_bucket, cast_columns, default_num_buckets

    nb = num_buckets or default_num_buckets()
    hot = np.unique(np.asarray(hot_keys, dtype=np.int64))
    hot_dim = small_df[small_df[on].isin(hot)].reset_index(drop=True)
    cold_dim = small_df[~small_df[on].isin(hot)].reset_index(drop=True)
    ref = ray.put((hot, hot_dim))

    if fact_schema is None:
        fact_schema = big_ds.schema()
    fact_cols = list(fact_schema.names)
    dim_schema = pa.Schema.from_pandas(small_df, preserve_index=False)
    dim_extra = [c for c in dim_schema.names if c != on]
    out_cols = fact_cols + dim_extra
    types = {n: t for n, t in zip(fact_schema.names, fact_schema.types)}
    for c in dim_extra:
        types[c] = dim_schema.field(c).type
    combined = pa.schema(
        [pa.field(c, types[c]) for c in out_cols]
        + [pa.field("__hot", pa.int8()), pa.field("__bucket", pa.int64())])

    def _is_hot(h: "np.ndarray", keys: "np.ndarray") -> "np.ndarray":
        if not len(h):
            return np.zeros(len(keys), bool)
        pos = np.searchsorted(h, keys)
        return (pos < len(h)) & (h[np.minimum(pos, len(h) - 1)] == keys)

    def _null_fill(df: "pd.DataFrame", cols: list[str]) -> "pd.DataFrame":
        n = len(df)
        for c in cols:
            t = types[c]
            if pa.types.is_integer(t):
                np_t = (np.uint64 if pa.types.is_unsigned_integer(t)
                        else np.int64)
                df[c] = pd.arrays.IntegerArray(np.zeros(n, np_t),
                                               mask=np.ones(n, bool))
            elif pa.types.is_floating(t):
                df[c] = np.full(n, np.nan)
            else:
                df[c] = pd.Series([None] * n, index=df.index,
                                  dtype="object")
        return df

    def route(df: "pd.DataFrame") -> "pa.Table":
        h, hdim = ray.get(ref)
        ishot = _is_hot(h, df[on].to_numpy().astype(np.int64))
        hot_rows = df[ishot].merge(hdim, on=on, how="inner")
        hot_rows["__hot"] = np.int8(1)
        # round-robin bucket: the whole point — a hot key's rows spread
        # uniformly instead of hashing into one giant bucket. The start
        # offset is salted per batch from sampled ROW CONTENT (first /
        # middle / last row, all columns) XOR a per-worker monotonic
        # sequence XOR the worker pid: restarting at 0 every batch
        # would concentrate the hot mass in the low buckets whenever
        # per-batch hot counts are below nb; a (first-key, size) salt
        # degenerates the same way on a fact table CLUSTERED by the hot
        # key (every full batch shares one key and one length); and
        # content alone STILL degenerates when the clustered hot key's
        # payload columns are constant — byte-identical batches hash to
        # one offset. The (pid, sequence) term makes every batch's
        # offset distinct across workers and across batches within a
        # worker, at the cost of bucket PLACEMENT being scheduling-
        # dependent — acceptable because bucket choice never affects
        # the result rows (hot rows pass through the exchange
        # untouched); only the result's row content must be
        # deterministic, and it is.
        if len(hot_rows):
            # resolve the sequence through sys.modules, NOT the closure:
            # cloudpickle snapshots a nested function's referenced
            # globals by value, which would hand every task a fresh
            # copy of the counter frozen at graph-build time
            from laji_pygeoapi_ray.stages import join as _self
            # sample the KEY column only: hash_pandas_object raises
            # TypeError on unhashable payload cells (list/array columns),
            # and the key alone (with pid+sequence below) already de-
            # correlates clustered batches
            samp = df[[on]].iloc[[0, len(df) // 2, len(df) - 1]]
            seed = np.array([pd.util.hash_pandas_object(
                samp, index=False).to_numpy(np.uint64).sum()
                ^ np.uint64(len(df))
                ^ (np.uint64(_os.getpid()) << np.uint64(24))
                ^ np.uint64(next(_self._ROUTE_SEQ))])
            off = int(BloomFilter._mix(seed, 1)[0] % np.uint64(nb))
            hot_rows["__bucket"] = ((np.arange(len(hot_rows)) + off)
                                    % nb).astype(np.int64)
        else:
            hot_rows["__bucket"] = np.empty(0, np.int64)
        cold = _null_fill(df[~ishot].copy(deep=False), dim_extra)
        cold["__hot"] = np.int8(0)
        cold = add_bucket(cold, [on], nb)
        out = pd.concat([hot_rows, cold], ignore_index=True)
        return pa.Table.from_pandas(out[combined.names], schema=combined,
                                    preserve_index=False)

    routed = big_ds.map_batches(route, batch_format="pandas")
    if not len(cold_dim):
        # every dim key is hot: the inner join is complete map-side
        return routed.map_batches(
            lambda t: t.filter(pc.equal(t["__hot"], 1))
            .select(out_cols), batch_format="pyarrow",
            zero_copy_batch=True)

    dim_table = pa.Table.from_pandas(
        add_bucket(cold_dim.assign(__hot=np.int8(0)), [on], nb),
        preserve_index=False)
    dim_ds = rd.from_arrow(dim_table)
    # schemas are statically known — passing them skips _tag_union's
    # Dataset.schema() limit-1 probes, so the fact lineage executes
    # exactly once (the route pass). dim_extra int columns are
    # null-filled on cold fact rows yet PRESENT on both union sides, so
    # they must be declared force_nullable_int — the default to_pandas
    # path would float64-round packed ids above 2^53.
    tagged, lcols, rcols, ttypes, all_cols = _tag_union(
        routed, dim_ds, left_schema=combined,
        right_schema=dim_table.schema,
        force_nullable_int=[c for c in dim_extra
                            if pa.types.is_integer(types[c])])

    def bucket_fn(df: "pd.DataFrame") -> "pd.DataFrame":
        done = df[(df["__side"] == 0) & (df["__hot"] == 1)][out_cols]
        fact = df[(df["__side"] == 0) & (df["__hot"] == 0)][fact_cols]
        dim = df[df["__side"] == 1][dim_schema.names]
        got = fact.merge(dim, on=on, how="inner")[out_cols]
        return pd.concat([done, got], ignore_index=True)

    out = (tagged.groupby("__bucket")
           .map_groups(bucket_fn, batch_format="pandas"))
    return out.map_batches(
        lambda t: cast_columns(t, {c: types[c] for c in out_cols
                                   if c in t.column_names}),
        batch_format="pyarrow", zero_copy_batch=True)
