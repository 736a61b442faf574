"""Bucketed shuffle-apply — the engine's scalable grouped-operator substrate.

A bare ``ds.groupby(high_cardinality_key).map_groups(fn)`` calls Python once
per group; at 10^12-row scale (millions of groups) the per-group interpreter
overhead dominates. Instead we shuffle ONCE on a low-cardinality hash bucket
of the key (`bucket = stable_hash(key) % B`), and inside each bucket run a
*vectorized* pandas/pyarrow group-aggregate over thousands of key-groups at
C speed. Skewed *individual* keys don't skew buckets (hash mixes them);
a pathological giant single key is handled by the two-phase salted path in
``stages/merge.py``.

This reproduces the role of the reference's PostGIS-pushed grouped SQL
(``/root/reference/pygeoapi/scripts/edit_db.py:333-460``) as a Ray Data
shuffle: one all-to-all exchange on ``__bucket``, then embarrassingly
parallel per-bucket compute.
"""
from __future__ import annotations

from collections.abc import Callable

import pandas as pd


BUCKET_COL = "__bucket"


def default_num_buckets(*, per_cpu: int = 2, floor: int = 16,
                        cap: int = 4096) -> int:
    """Shuffle fan-out derived from the CLUSTER, not a constant: ~2× total
    cores (enough buckets that every core gets work and stragglers
    rebalance), floored at 16 (single small node) and capped at 4096 (a
    bucket per ~2 cores of a 2048-core cluster — beyond that per-bucket
    scheduling overhead dominates). Falls back to ``os.cpu_count()`` when
    Ray isn't initialised (pure-driver planning paths).

    CONTRACT: this bounds fan-out by the CLUSTER only — it has no data
    term, so on a small cluster over a large corpus a bucket is
    data/buckets rows materialized as ONE pandas frame inside a single
    ``map_groups`` task. Callers shuffling corpus-proportional streams
    whose size they know (or can bound) should pass an explicit
    ``num_buckets ≈ rows / heap_budget`` when that exceeds the derived
    value; iterative loops should size DOWN to their (small) loop state
    instead (see ``cluster_pairs_ds``)."""
    import os

    import ray

    cpus = 0
    try:
        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        cpus = 0
    if not cpus:
        cpus = os.cpu_count() or 8
    return max(floor, min(cap, per_cpu * cpus))


def cast_columns(t, dtypes: dict):
    """Cast named columns of an Arrow table to the given Arrow types,
    converting float NaN to null first when the target is integral.

    Pandas represents int64-with-nulls as float64+NaN, so any bucket_fn
    whose bucket mixes nulls into an integer column (tagged unions, outer
    joins) emits float64 blocks; this restores the declared schema so the
    output hashes/compares as BIGINT, not DOUBLE."""
    import pyarrow as pa
    import pyarrow.compute as pc

    cols = {}
    for name in t.column_names:
        col = t[name]
        want = dtypes.get(name)
        if want is None or col.type == want:
            cols[name] = col
            continue
        if pa.types.is_floating(col.type) and not pa.types.is_floating(want):
            col = pc.if_else(pc.is_nan(col), pa.scalar(None, col.type), col)
        cols[name] = pc.cast(col, want)
    return pa.table(cols)


def add_bucket(df: pd.DataFrame, key_cols: list[str], num_buckets: int) -> pd.DataFrame:
    """Append a stable hash-bucket column of the key tuple (deterministic
    across processes: pandas.util.hash_pandas_object uses a fixed key)."""
    h = pd.util.hash_pandas_object(
        df[list(key_cols)].astype("string"), index=False).to_numpy()
    df = df.copy(deep=False)
    df[BUCKET_COL] = (h % num_buckets).astype("int64")
    return df


def grouped_apply(ds, key_cols: list[str],
                  bucket_fn: Callable[[pd.DataFrame], pd.DataFrame],
                  *, num_buckets: int | None = None,
                  out_dtypes: dict | None = None):
    """Shuffle ``ds`` by hash bucket of ``key_cols`` and apply ``bucket_fn``
    to each bucket (a pandas DataFrame holding *all* rows of *all* keys in
    the bucket — bucket_fn must do its own within-bucket groupby).

    num_buckets sizes the shuffle parallelism: ~2-4× the cluster cores,
    bounded so each bucket fits a worker's heap; the default derives from
    ``ray.cluster_resources()`` (``default_num_buckets``) so a 100-node
    cluster never runs a sandbox-sized 16-bucket shuffle.

    out_dtypes (column name → pyarrow type) restores output columns that
    pandas upcast (int64-with-null → float64) back to their declared Arrow
    types — pass it whenever bucket_fn sees tagged-union / outer-join nulls
    in integer columns.
    """
    if num_buckets is None:
        num_buckets = default_num_buckets()
    ds = ds.map_batches(lambda df: add_bucket(df, key_cols, num_buckets),
                        batch_format="pandas")
    out = (ds.groupby(BUCKET_COL)
             .map_groups(lambda df: bucket_fn(df.drop(columns=[BUCKET_COL])),
                         batch_format="pandas"))
    if out_dtypes:
        out = out.map_batches(lambda t: cast_columns(t, out_dtypes),
                              batch_format="pyarrow", zero_copy_batch=True)
    return out


def partial_group_counts(ds, key_cols: list[str], count_col: str = "n",
                         *, partial_blocks: int | None = None):
    """Pre-aggregated grouped COUNT: emit per-batch partial counts (a few
    rows per batch) and sum them in a tiny final groupby — the wide input
    never shuffles (the 'combine before groupby' rule, SURVEY.md §2.6 /
    ray_guide 'Aggregation at scale'). Use instead of
    ``groupby(key).aggregate(Count())`` whenever only counts are needed.

    ``partial_blocks``: repartition (cheap split/merge, NO shuffle) the
    partial-count rows to this block count before the final groupby.
    Ray's sort-based groupby mirrors its INPUT block count, so a large
    partial table arriving in 1-2 blocks sorts serially (measured: 68k
    two-key rows at 2 blocks → 6.9 s, at 16 → 1.1 s). Set it when the
    partial cardinality is high (space-time cubes: |cells|·|hours|) and
    the upstream block count is small."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    keys = list(key_cols)

    def partial(t: "pa.Table") -> "pa.Table":
        import pyarrow as pa
        import pyarrow.compute as pc
        sel = t.select(keys)
        # decode dictionary keys so downstream groupby sees plain strings
        cols = [pc.cast(sel[k], pa.string())
                if pa.types.is_dictionary(sel[k].type) else sel[k]
                for k in keys]
        sel = pa.table(dict(zip(keys, cols)))
        out = sel.group_by(keys).aggregate([([], "count_all")])
        return out.rename_columns(keys + [count_col])

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=65536, zero_copy_batch=True)
    if partial_blocks:
        partials = partials.repartition(partial_blocks)
    agg = partials.groupby(keys).aggregate(
        Sum(count_col, alias_name=count_col))
    return agg.map_batches(lambda t: t.rename_columns(keys + [count_col]),
                           batch_format="pyarrow")


def kth_values_2pass(ds, col: str, ks: list[int], *, n_bins: int = 4096):
    """Distributed EXACT order statistics (the quantile/percentile
    operator): values of the k-th smallest elements (0-indexed) of
    ``col`` for EVERY k in ``ks`` — sharing ONE histogram pass and ONE
    candidate scan, without a global sort.

    Pass 1: per-batch histograms over [min, max] (a few thousand ints per
    batch — combine-before-shuffle), summed into one global histogram;
    the cumulative count locates the bin containing each rank.
    Pass 2: only the located bins' values leave the scan (|ks|·n/n_bins
    rows in expectation); each exact element is selected driver-side
    from its small bin.

    Scale contract: the candidate bins must fit in driver memory — with
    uniform-ish data that is |ks|·n/n_bins rows; a pathological
    single-value bin degenerates to that value being the answer anyway
    (all equal). Returns (values list aligned with ks, n).

    Nulls and NaNs are EXCLUDED (SQL percentile semantics): ranks count
    the non-null population only and n is the non-null count. (An int
    column WITH nulls reaches numpy as NaN-filled float64; without the
    mask a NaN would bin at 0 via the NaN→INT64_MIN cast yet sort to
    the END of its bin — a silently wrong, possibly-NaN answer.)"""
    import numpy as np
    import pyarrow as pa

    def mm(t: "pa.Table") -> "pa.Table":
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return pa.table({"lo": pa.array([np.inf]),
                             "hi": pa.array([-np.inf]),
                             "nn": pa.array([0], pa.int64())})
        return pa.table({"lo": pa.array([float(v.min())]),
                         "hi": pa.array([float(v.max())]),
                         "nn": pa.array([len(v)], pa.int64())})

    lo, hi, n = np.inf, -np.inf, 0
    for bt in (ds.map_batches(mm, batch_format="pyarrow")
               .iter_batches(batch_size=None, batch_format="pyarrow")):
        lo = min(lo, float(bt["lo"].to_numpy().min()))
        hi = max(hi, float(bt["hi"].to_numpy().max()))
        n += int(bt["nn"].to_numpy().sum())
    if n == 0:
        raise ValueError(f"kth_values_2pass: no non-null values in {col!r}")
    for k in ks:
        if not 0 <= k < n:
            raise ValueError(f"k={k} out of range for n={n}")
    if lo == hi:
        return [lo] * len(ks), n
    width = (hi - lo) / n_bins

    def hist(t: "pa.Table") -> "pa.Table":
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        b = np.clip(((v - lo) / width).astype(np.int64), 0, n_bins - 1)
        cnt = np.bincount(b, minlength=n_bins)
        return pa.table({"bin": np.arange(n_bins, dtype=np.int64),
                         "cnt": cnt.astype(np.int64)})

    parts = ds.map_batches(hist, batch_format="pyarrow")
    total = np.zeros(n_bins, dtype=np.int64)
    for bt in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        total[bt["bin"].to_numpy(zero_copy_only=False)] += \
            bt["cnt"].to_numpy(zero_copy_only=False)
    cum = np.cumsum(total)
    bins = {int(np.searchsorted(cum, k + 1)) for k in ks}
    bin_arr = np.array(sorted(bins), dtype=np.int64)

    def in_bins(t: "pa.Table") -> "pa.Table":
        # recompute the EXACT pass-1 bin function — boundary compares
        # against lo + b·width can disagree with ((v−lo)/width) truncation
        # by one ulp and silently drop/duplicate boundary rows
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        vb = np.clip(((v - lo) / width).astype(np.int64), 0, n_bins - 1)
        keep = np.isin(vb, bin_arr) & ~np.isnan(v)
        return t.select([col]).filter(pa.array(keep))

    cand = np.concatenate(
        [bt[col].to_numpy(zero_copy_only=False) for bt in
         ds.map_batches(in_bins, batch_format="pyarrow")
         .iter_batches(batch_size=None, batch_format="pyarrow")] or
        [np.array([], dtype=np.float64)])
    cb = np.clip(((cand - lo) / width).astype(np.int64), 0, n_bins - 1)
    out = []
    for k in ks:
        b = int(np.searchsorted(cum, k + 1))
        below = int(cum[b - 1]) if b else 0
        vals = np.sort(cand[cb == b])
        out.append(float(vals[k - below]))
    return out, n


def kth_value_2pass(ds, col: str, k: int, *, n_bins: int = 4096):
    """Single-rank convenience wrapper over :func:`kth_values_2pass`.
    Returns (value, n)."""
    vals, n = kth_values_2pass(ds, col, [k], n_bins=n_bins)
    return vals[0], n


HLL_P = 12                       # 4096 registers, ~1.6% standard error


def hll_partial(ids: "np.ndarray") -> "np.ndarray":
    """int64 keys → a 2^p-register HyperLogLog partial (uint8 registers).
    Deterministic splitmix64 hash; partials merge by elementwise max —
    the canonical distributed-sketch shape (combine inside map_batches,
    tiny merge at the end)."""
    import numpy as np

    from ..functions.textkernels import mix64

    x = mix64(ids.astype(np.uint64))    # the one shared splitmix64
    m = np.uint64(1) << np.uint64(HLL_P)
    idx = (x & (m - np.uint64(1))).astype(np.int64)
    rest = x >> np.uint64(HLL_P)
    # rank = leading-zero count of the remaining 64-p bits + 1
    #      = nbits - bit_length(rest) + 1, via the frexp exponent —
    # EXACT because rest < 2^(64-p) ≤ 2^52 < 2^53 converts to float64
    # losslessly and frexp returns its true binary exponent (log2 would
    # round 2^k−1 up for large k); rest == 0 → exponent 0 → nbits+1.
    # Replaces a 52-pass boolean-mask loop on the sketch hot path
    # (bit-identity vs the loop asserted in tests/test_shuffle_ops.py).
    nbits = 64 - HLL_P
    _, exp = np.frexp(rest.astype(np.float64))
    rank = (nbits + 1 - exp).astype(np.uint8)
    regs = np.zeros(1 << HLL_P, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: "np.ndarray") -> float:
    """Registers → cardinality estimate (HLL with the small-range
    linear-counting correction)."""
    import numpy as np

    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = float(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


def hll_distinct(ds, col: str) -> float:
    """Distributed approximate COUNT DISTINCT: per-batch HLL partials
    (4 KB each) merged by max — the wide input never shuffles."""
    import numpy as np
    import pyarrow as pa

    def partial(t: "pa.Table") -> "pa.Table":
        regs = hll_partial(t[col].to_numpy(zero_copy_only=False)
                           .astype(np.int64))
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    merged = np.zeros(1 << HLL_P, dtype=np.uint8)
    for b in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        for rb in b["regs"].to_pylist():
            merged = np.maximum(merged, np.frombuffer(rb, dtype=np.uint8))
    return hll_estimate(merged)


def heavy_hitters_exact(ds, make_items, k: int, *,
                        m: int = 1024, cand_cap: int = 4096):
    """EXACT top-k most-frequent items with a CERTIFICATE, without ever
    shuffling the full item-frequency table (the vocabulary groupby in
    ``vocab_top_tokens`` moves every distinct item; at 10^12-row scale the
    distinct-token set itself is shuffle-dominant — this operator moves only
    ``m`` candidates per batch plus one recount of ≤ ``cand_cap`` items).

    Space-saving-style two-pass:

    Pass 1 (candidate sketch): per batch, EXACT in-batch counts (Arrow
    group_by — the batch fits memory), keep only the top-``m``; also emit
    the batch's m-th-largest count as that batch's drop threshold. A null
    item row carries the threshold so one groupby-sum yields both the
    summed candidate counters c_hat and the global drop bound
    ``D = Σ_b thresh_b``. For every item: ``f_true − D ≤ c_hat ≤ f_true``;
    an item surviving NO batch summary has ``f_true ≤ D``.

    Pass 2 (exact recount): the top-``cand_cap`` candidates by c_hat are
    broadcast (``ray.put``) and exactly recounted with per-batch partials;
    the final top-k is exact — PROVABLY, whenever the k-th exact count
    strictly exceeds the largest count any dropped item could hide
    (``D`` for never-surfaced items, ``c_hat_cap + D`` for pruned
    candidates). The ``certified`` flag carries that proof; a False flag
    turns the driver row red rather than silently approximating.

    ``make_items(batch: pa.Table) -> pa.Array[string]`` defines the item
    stream (e.g. exploded tokens).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    from .stream import topk_by

    def sketch(t: "pa.Table") -> "pa.Table":
        items = make_items(t)
        if isinstance(items, pa.ChunkedArray):
            items = items.combine_chunks()
        cnt = (pa.table({"item": items})
               .group_by(["item"]).aggregate([([], "count_all")])
               .rename_columns(["item", "n"]))
        n = cnt["n"].to_numpy(zero_copy_only=False)
        it = cnt["item"].to_numpy(zero_copy_only=False)
        order = np.lexsort((it, -n))
        # largest DROPPED count is the batch's exact drop bound
        thresh = int(n[order[m]]) if len(n) > m else 0
        keep = order[:m]
        return pa.table({
            "item": pa.array(np.append(it[keep], [None]), pa.string()),
            "n": pa.array(np.append(n[keep], [thresh]), pa.int64())})

    agg = (ds.map_batches(sketch, batch_format="pyarrow",
                          batch_size=65536, zero_copy_batch=True)
             .groupby("item").aggregate(Sum("n", alias_name="n"))
             .map_batches(lambda t: t.rename_columns(["item", "n"]),
                          batch_format="pyarrow"))
    # the aggregated sketch is small (surviving candidates only) — pin it
    # once so the null-sentinel split doesn't re-run the scan
    agg = agg.materialize()
    cand = topk_by(
        agg.map_batches(lambda t: t.filter(pc.is_valid(t["item"])),
                        batch_format="pyarrow"),
        "n", cand_cap, tie_col="item")
    null_rows = (agg.map_batches(
        lambda t: t.filter(pc.is_null(t["item"])),
        batch_format="pyarrow").take_all())
    d_bound = int(null_rows[0]["n"]) if null_rows else 0
    pruned = len(cand) == cand_cap
    chat_cap = int(cand["n"][-1].as_py()) if pruned else 0

    cand_ref = ray.put(cand["item"].to_pylist())

    def recount(t: "pa.Table") -> "pa.Table":
        keys = pa.array(ray.get(cand_ref), pa.string())
        items = make_items(t)
        if isinstance(items, pa.ChunkedArray):
            items = items.combine_chunks()
        mask = pc.is_in(items, value_set=keys)
        cnt = (pa.table({"item": items.filter(mask)})
               .group_by(["item"]).aggregate([([], "count_all")])
               .rename_columns(["item", "n"]))
        return cnt

    exact = (ds.map_batches(recount, batch_format="pyarrow",
                            batch_size=65536, zero_copy_batch=True)
               .groupby("item").aggregate(Sum("n", alias_name="n"))
               .map_batches(lambda t: t.rename_columns(["item", "n"]),
                            batch_format="pyarrow"))
    top = topk_by(exact, "n", k, tie_col="item")
    kth = int(top["n"][-1].as_py()) if len(top) >= k else 0
    hide = max(d_bound, (chat_cap + d_bound) if pruned else 0)
    certified = hide == 0 or kth > hide
    return top.append_column(
        "certified", pa.array([certified] * len(top), pa.bool_()))


KMV_K = 1024


def kmv_partial(keys: "np.ndarray", k: int = KMV_K) -> "np.ndarray":
    """int64 keys → bottom-k DISTINCT splitmix64 hashes (sorted uint64) —
    the KMV / bottom-k distinct sketch partial (Bar-Yossef et al. 2002).
    Partials merge by union + re-truncate; an UNSATURATED merged sketch
    (< k hashes) is the exact distinct set of hashes, and splitmix64 is a
    bijection on uint64, so its size IS the exact NDV."""
    import numpy as np

    from ..functions.textkernels import mix64

    h = np.unique(mix64(keys.astype(np.int64).view(np.uint64)))
    return h[:k]


def kmv_merge(parts: list, k: int = KMV_K) -> "np.ndarray":
    import numpy as np

    if not parts:
        return np.empty(0, np.uint64)
    return np.unique(np.concatenate(parts))[:k]


def kmv_estimate(h: "np.ndarray", k: int = KMV_K) -> float:
    """Unsaturated → exact count; saturated → (k−1)·2⁶⁴ / kth-smallest."""
    if len(h) < k:
        return float(len(h))
    return (k - 1) * 2.0 ** 64 / float(h[k - 1] + 1)


def cents_quantized(values: "np.ndarray") -> "np.ndarray":
    """The engine-wide 2-decimal money quantization (floor(x·100 + 0.5)
    as int64) — the SQL twin is ``CAST(floor(value * 100 + 0.5) AS
    BIGINT)``. One definition so the float playbook's rounding rule
    can't drift between queries."""
    import numpy as np

    return np.floor(values * 100 + 0.5).astype(np.int64)


def doubled_midranks(counts: "np.ndarray") -> "np.ndarray":
    """DOUBLED midranks over a value histogram sorted by value:
    a tied value with nt occurrences after cum_before smaller ones has
    midrank cum_before + (nt+1)/2; ×2 keeps it int64-exact. The
    load-bearing exactness trick of the rank-statistics family
    (Mann-Whitney / Kruskal-Wallis / Spearman / Wilcoxon); SQL twin:
    ``2 * (SUM(nt) OVER (ORDER BY v) - nt) + nt + 1``."""
    import numpy as np

    nt = np.asarray(counts, dtype=np.int64)
    cum = np.cumsum(nt)
    return 2 * (cum - nt) + nt + 1
