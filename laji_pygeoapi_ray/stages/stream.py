"""Stream-shaped operators over bounded logs (ray_guide 'Streaming-shaped
workloads'): tumbling-window aggregation, as-of joins, session windows, and
distributed top-k. Ray Data has no event-time runtime; these treat the input
as an ordered, partitioned log — the ordering assumption of each operator is
in its docstring. The reference itself is batch (SURVEY.md §2.8: no windows,
watermark = a single date), so these extend the engine for the
training-data/stream use cases the brief requires."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .shuffle import grouped_apply

US_PER_HOUR = 3_600_000_000


def tumbling_window_key(ts_us: np.ndarray, width_us: int) -> np.ndarray:
    """Event-time tumbling-window id = floor-division of epoch-µs by the
    window width (exact integer math; the DuckDB twin is
    ``epoch_us(ts) // width``). Assumes non-negative epochs."""
    return ts_us // np.int64(width_us)


def add_window_column(ts_col: str, width_us: int = US_PER_HOUR,
                      out_col: str = "window"):
    def fn(t: pa.Table) -> pa.Table:
        ts = t[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        w = tumbling_window_key(ts.astype(np.int64), width_us)
        return t.append_column(out_col, pa.array(w))
    return fn


def asof_join(left_ds, right_ds, *, key: str, left_ts: str,
              right_ts: str, num_buckets: int | None = None,
              right_tie: str | None = None):
    """As-of (backward, inclusive) join: for each left row, the latest right
    row with the same ``key`` and ``right_ts <= left_ts``.

    Distribution: both sides shuffle ONCE by hashed key into shared buckets
    (tagged union), then a vectorized ``pandas.merge_asof`` per bucket.
    Caller pre-renames right-side columns so only ``key`` collides.

    Determinism: equal ``(key, right_ts)`` pairs on the right would make the
    matched row engine-dependent. Pass ``right_tie`` (a right-side column) to
    canonicalize: only the row with the MAX ``right_tie`` per (key, right_ts)
    survives — mirror the same rule in any SQL twin. Without it the result is
    deterministic only for unique (key, right_ts) pairs.

    Tag-union via the shared hardened ``join._tag_union``: integer columns
    absent on one side ride pandas nullable Int64/UInt64 through the
    bucket so values above 2^53 survive (a local ``pa.nulls`` fill would
    float64-upcast them in mixed buckets — the join.py hardening lesson),
    and ``out_dtypes`` restores the declared Arrow schema on the way out."""
    from .join import _tag_union

    tagged, lcols, rcols, types, all_cols = _tag_union(left_ds, right_ds)

    def bucket_fn(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["__side"] == 0][lcols].sort_values(
            left_ts, kind="mergesort")
        right = df[df["__side"] == 1][rcols]
        if right_tie is not None:
            right = (right.sort_values([key, right_ts, right_tie],
                                       kind="mergesort")
                     .drop_duplicates([key, right_ts], keep="last"))
        right = right.sort_values(right_ts, kind="mergesort")
        if left.empty:
            # typed ARROW empty: Ray drops the schema of an empty PANDAS
            # block (forks the union schema and warns); an Arrow empty
            # keeps it
            return pa.table({c: pa.array([], types[c]) for c in all_cols})
        return pd.merge_asof(left, right, left_on=left_ts,
                             right_on=right_ts, by=key,
                             direction="backward",
                             allow_exact_matches=True)

    return grouped_apply(tagged, [key], bucket_fn, num_buckets=num_buckets,
                         out_dtypes={c: types[c] for c in all_cols})


def session_windows(df: pd.DataFrame, key: str, ts_col: str,
                    gap_us: int) -> pd.DataFrame:
    """Session windowing over one partition (driver/test-scale kernel, used
    inside ``groupby(key).map_groups``): a new session starts when the gap
    to the previous event of the same key exceeds ``gap_us``."""
    df = df.sort_values([key, ts_col], kind="mergesort").reset_index(drop=True)
    ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
    newkey = df[key].ne(df[key].shift()).to_numpy()
    gap = np.empty(len(df), dtype=bool)
    gap[0] = True
    gap[1:] = (ts[1:] - ts[:-1]) > gap_us
    df["session_id"] = np.cumsum(newkey | gap) - 1
    return df


def topk_by(ds, value_col: str, k: int, *, tie_col: str,
            descending: bool = True):
    """Distributed top-k: per-batch partial top-k (vectorized lexsort) then
    a single tiny driver-side merge — no global sort. Ties break by
    ``tie_col`` ascending. Returns a pyarrow Table with a ``rank`` column."""
    def partial(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False)
        tie = t[tie_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, -v if descending else v))[:k]
        return t.take(pa.array(order))

    parts = ds.map_batches(partial, batch_format="pyarrow")
    merged = pa.concat_tables(
        [b for b in parts.iter_batches(batch_size=None,
                                       batch_format="pyarrow")],
        promote_options="default")
    v = merged[value_col].to_numpy(zero_copy_only=False)
    tie = merged[tie_col].to_numpy(zero_copy_only=False)
    order = np.lexsort((tie, -v if descending else v))[:k]
    out = merged.take(pa.array(order))
    return out.append_column("rank", pa.array(np.arange(1, len(out) + 1)))


def session_window_agg(df: pd.DataFrame, key: str, ts_col: str,
                       gap_us: int) -> pd.DataFrame:
    """Per-key session aggregation (one bucket): sessions numbered 1.. per
    key (gap > gap_us starts a new one); emits (key, session_id, n_events,
    start_ts, end_ts). Exact integer µs math — SQL twin uses lag/epoch_us."""
    df = df.sort_values([key, ts_col], kind="mergesort").reset_index(drop=True)
    ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
    newkey = df[key].ne(df[key].shift()).to_numpy()
    gap = np.empty(len(df), dtype=bool)
    if len(df):
        gap[0] = True
        gap[1:] = (ts[1:] - ts[:-1]) > gap_us
    starts = (newkey | gap).astype(np.int64)
    # per-key 1-based numbering: global cumsum minus the key's offset
    g = np.cumsum(starts)
    first_of_key = np.where(newkey)[0]
    offsets = np.zeros(len(df), dtype=np.int64)
    if len(first_of_key):
        offsets = (g[first_of_key] - 1)[np.cumsum(newkey) - 1]
    df["session_id"] = g - offsets
    out = (df.groupby([key, "session_id"], sort=False)
           .agg(n_events=(ts_col, "size"), start_ts=(ts_col, "min"),
                end_ts=(ts_col, "max")).reset_index())
    return out


def session_windows_ds(ds, key: str, ts_col: str, gap_us: int,
                       *, num_buckets: int | None = None):
    """Distributed session windows: one shuffle on the key hash, vectorized
    per-bucket sessionization."""
    return grouped_apply(ds, [key],
                         lambda df: session_window_agg(df, key, ts_col,
                                                       gap_us),
                         num_buckets=num_buckets)


def interval_join(left_ds, intervals_ds, *, key: str, ts_col: str,
                  start_col: str, end_col: str,
                  id_cols: tuple = ("session_id",),
                  num_buckets: int | None = None):
    """Range join: each left row matched to the interval of the same
    ``key`` with ``start <= ts <= end`` (the brief's 'range join' operator
    Ray Data lacks).

    Distribution: ONE hash shuffle on ``key`` co-locates rows with their
    intervals (tagged union); per bucket, intervals sort by start and a
    vectorized ``searchsorted`` assigns each row its covering interval.

    Partitioning assumption (documented per the custom-operator rule):
    intervals of one key are DISJOINT (e.g. session windows) — with
    overlapping intervals only the latest-starting match is emitted.
    Unmatched left rows are dropped (inner join).

    Tag-union via the shared hardened ``join._tag_union`` (absent-side
    integer columns ride pandas nullable Int64 so values above 2^53
    survive the mixed bucket — the join.py hardening lesson)."""
    from .join import _tag_union

    tagged, lcols, icols, types, _ = _tag_union(left_ds, intervals_ds)
    out_cols = list(lcols) + [c for c in id_cols if c not in lcols]

    def bucket_fn(df: pd.DataFrame) -> pd.DataFrame:
        # one vectorized merge_asof over the whole bucket (by=key): latest
        # interval starting <= ts, then the end-bound refine — no per-key
        # Python loop
        left = df[df["__side"] == 0][lcols].sort_values(
            ts_col, kind="mergesort")
        ivs = df[df["__side"] == 1][icols].sort_values(
            start_col, kind="mergesort")
        if left.empty or ivs.empty:
            # typed ARROW empty: Ray drops the schema of an empty PANDAS
            # block; an Arrow empty keeps it
            return pa.table({c: pa.array([], types[c]) for c in out_cols})
        m = pd.merge_asof(left, ivs, left_on=ts_col, right_on=start_col,
                          by=key, direction="backward",
                          allow_exact_matches=True)
        ok = m[start_col].notna() & (m[ts_col] <= m[end_col])
        return m[ok][out_cols].reset_index(drop=True)

    out_dtypes = {c: types[c] for c in out_cols}
    return grouped_apply(tagged, [key], bucket_fn, num_buckets=num_buckets,
                         out_dtypes=out_dtypes)


def interval_join_all(left_ds, intervals_ds, *, key: str, ts_col: str,
                      start_col: str, end_col: str,
                      id_cols: tuple = ("interval_id",),
                      bin_us: int = US_PER_HOUR,
                      num_buckets: int | None = None):
    """Range join, GENERAL case: emit EVERY interval of the same ``key``
    covering each left row (overlapping intervals allowed — the
    generalization of :func:`interval_join`'s disjoint contract).

    Distribution: intervals replicate to every ``bin_us`` time bin they
    overlap; left rows go to their single bin; one hash shuffle on
    (key, bin) co-locates candidates; a vectorized per-bucket merge +
    range filter finishes. No row is double-emitted: an interval meets a
    row only in the row's own bin. Partitioning assumption: intervals
    spanning many bins replicate proportionally — pick ``bin_us`` near
    the typical interval width.

    ``__bin`` is derived per side BEFORE the shared hardened
    ``join._tag_union`` (absent-side integer columns ride pandas nullable
    Int64 so values above 2^53 survive the mixed bucket — the join.py
    hardening lesson); ``__bin`` itself is present on both sides, so the
    group key keeps the fast numpy path."""
    from .join import _tag_union

    lschema, ischema = left_ds.schema(), intervals_ds.schema()
    lcols, icols = list(lschema.names), list(ischema.names)

    def add_bin_left(t: pa.Table) -> pa.Table:
        ts = t[ts_col].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        return t.append_column("__bin", pa.array(ts // np.int64(bin_us)))

    def explode_right(t: pa.Table) -> pa.Table:
        st = t[start_col].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        en = t[end_col].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        b0 = st // np.int64(bin_us)
        b1 = en // np.int64(bin_us)
        reps = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(t)), reps)
        offs = (np.arange(int(reps.sum()))
                - np.repeat(np.cumsum(reps) - reps, reps))
        bins = b0[idx] + offs
        return t.take(pa.array(idx)).append_column("__bin", pa.array(bins))

    # no explicit schemas: the inputs may carry pandas block schemas whose
    # .types are numpy/Python classes — let _tag_union probe the mapped
    # pyarrow datasets, whose schemas are always Arrow-typed
    tagged, _, _, types, _ = _tag_union(
        left_ds.map_batches(add_bin_left, batch_format="pyarrow"),
        intervals_ds.map_batches(explode_right, batch_format="pyarrow"))
    out_cols = list(lcols) + [c for c in (*id_cols, start_col, end_col)
                              if c not in lcols]

    def bucket_fn(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["__side"] == 0]
        ivs = df[df["__side"] == 1]
        if left.empty or ivs.empty:
            # typed ARROW empty: Ray drops the schema of an empty PANDAS
            # block; an Arrow empty keeps it
            return pa.table({c: pa.array([], types[c]) for c in out_cols})
        m = left[["__bin"] + list(lcols)].merge(
            ivs[["__bin", key] + [c for c in icols if c != key]],
            on=["__bin", key])
        ok = (m[start_col] <= m[ts_col]) & (m[ts_col] <= m[end_col])
        return m[ok][out_cols].reset_index(drop=True)

    out_dtypes = {c: types[c] for c in out_cols}
    return grouped_apply(tagged, [key, "__bin"], bucket_fn,
                         num_buckets=num_buckets, out_dtypes=out_dtypes)


def pareto_mask_2d(p: "np.ndarray", d: "np.ndarray") -> "np.ndarray":
    """2-D skyline membership (maximize ``p``, minimize ``d``): True where
    no other row has (p' ≥ p ∧ d' ≤ d) with at least one strict. Exact
    duplicates on the front all survive (neither dominates). Vectorized:
    per-price min-d, exclusive/inclusive running minima over descending
    price, two comparisons — O(n log n).

    dominated(b) ⇔ min{d' : p' > p_b} ≤ d_b  ∨  min{d' : p' ≥ p_b} < d_b
    (the second catches equal-price strictly-earlier rows; b itself never
    triggers it since d_b < d_b is false)."""
    import numpy as np

    p = np.asarray(p, dtype=np.int64)
    d = np.asarray(d, dtype=np.int64)
    uniq, inv = np.unique(p, return_inverse=True)      # ascending prices
    md = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(md, inv, d)
    # running minima over DESCENDING price
    md_desc = md[::-1]
    m2_desc = np.minimum.accumulate(md_desc)           # inclusive
    m1_desc = np.empty_like(m2_desc)                   # exclusive
    m1_desc[0] = np.iinfo(np.int64).max
    m1_desc[1:] = m2_desc[:-1]
    m1 = m1_desc[::-1][inv]
    m2 = m2_desc[::-1][inv]
    return ~((m1 <= d) | (m2 < d))
