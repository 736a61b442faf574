"""Scan-primitive queries: global ordered running sums (sweep line).

The concurrency curve is the classic interval sweep — each event opens an
interval at its timestamp and closes it after a deterministic duration
(a pure integer function of event_id, so the DuckDB oracle reproduces it
exactly); the running sum of +1/-1 deltas over the global time order is the
number of concurrently-open intervals. The running sum itself is computed
by the two-pass distributed scan in ``stages/scan.py`` — no global sort,
no single-worker ordered pass.
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..sources.parquet import read_table
from ..stages.pack import pack_layout, token_counts, window_coverage
from ..stages.scan import global_cumsum, scan_summary
from .registry import register

# Deterministic interval duration: 60 s + (event_id % 240) s, in µs.
DUR_BASE_US = 60_000_000
DUR_MOD = 240
DUR_STEP_US = 1_000_000
# Range-partition width for the scan: 6 h of epoch-µs → ~120 partitions
# over the 30-day synthetic log; at scale, width stays span/O(cores).
SCAN_WIDTH_US = 21_600_000_000

_PTS_SQL = f"""
    pts AS (
        SELECT CAST(epoch_us(ts) AS BIGINT) AS t, 1 AS d FROM events
        UNION ALL
        SELECT CAST(epoch_us(ts) AS BIGINT) + {DUR_BASE_US}
               + (event_id % {DUR_MOD}) * {DUR_STEP_US}, -1 FROM events),
    agg AS (SELECT t, CAST(SUM(d) AS BIGINT) AS net FROM pts GROUP BY t),
    c AS (SELECT t, net,
                 CAST(SUM(net) OVER (ORDER BY t) AS BIGINT) AS conc
          FROM agg)
"""


def _sweep_points(sf_dir: str):
    """events → (t, d) sweep points: one +1 at the start, one -1 at the
    deterministic end, built vectorized (2n rows per batch, 2 int64 cols)."""
    ds = read_table(sf_dir, "events", ["event_id", "ts"])

    def to_points(t: pa.Table) -> pa.Table:
        ts = (t["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        end = (ts + np.int64(DUR_BASE_US)
               + (eid % np.int64(DUR_MOD)) * np.int64(DUR_STEP_US))
        n = len(ts)
        d = np.empty(2 * n, dtype=np.int64)
        d[:n], d[n:] = 1, -1
        return pa.table({"t": pa.array(np.concatenate([ts, end])),
                         "d": pa.array(d)})

    return ds.map_batches(to_points, batch_format="pyarrow",
                          zero_copy_batch=True)


@register("event_concurrency_curve", sql=f"""
    WITH {_PTS_SQL}
    SELECT t, net, conc FROM c""")
def event_concurrency_curve(sf_dir: str):
    """Full concurrency curve: one row per distinct sweep timestamp with the
    net delta and the running count of open intervals — the distributed
    scan's output verified end-to-end against the SQL window sum."""
    return global_cumsum(_sweep_points(sf_dir), "t", "d",
                         width=SCAN_WIDTH_US, out_col="conc")


@register("max_concurrent_events", sql=f"""
    WITH {_PTS_SQL}
    SELECT CAST(MAX(conc) AS BIGINT) AS max_concurrency,
           CAST(MIN(t) FILTER (WHERE conc = (SELECT MAX(conc) FROM c))
                AS BIGINT) AS first_peak_t,
           CAST(COUNT(*) FILTER (WHERE conc = (SELECT MAX(conc) FROM c))
                AS BIGINT) AS n_peak_ts
    FROM c""")
def max_concurrent_events(sf_dir: str):
    """Peak concurrency summary — the curve reduced by per-block partials
    (3 ints per block) and a tiny driver combine; the curve itself never
    materializes on the driver."""
    curve = event_concurrency_curve(sf_dir)
    s = scan_summary(curve, "t", "conc")
    return pa.table({"max_concurrency": pa.array([s["max_value"]]),
                     "first_peak_t": pa.array([s["first_at"]]),
                     "n_peak_ts": pa.array([s["n_at"]])})


# --- Sequence packing (concat-and-chunk) --------------------------------
# Tokens per training window; small enough that sf0.01's ~20k-token corpus
# spans tens of windows so the oracle exercises many boundaries.
PACK_WINDOW = 512
# doc_id range-partition width for the layout scan (~4 partitions at
# sf0.01, ~40 at sf0.1; at scale: id-span / O(cores)).
PACK_SCAN_WIDTH = 128

_LAYOUT_SQL = f"""
    tok AS (SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n
            FROM documents),
    cum AS (SELECT doc_id, n,
                   CAST(SUM(n) OVER (ORDER BY doc_id) AS BIGINT) AS c
            FROM tok),
    layout AS (SELECT doc_id, n AS n_tokens, c - n AS start_offset,
                      (c - n) // {PACK_WINDOW} AS first_window,
                      (c - 1) // {PACK_WINDOW} AS last_window,
                      (c - 1) // {PACK_WINDOW} - (c - n) // {PACK_WINDOW} + 1
                          AS n_windows
               FROM cum)
"""


@register("pack_doc_layout", sql=f"WITH {_LAYOUT_SQL} SELECT * FROM layout")
def pack_doc_layout(sf_dir: str):
    """GPT-style sequence packing: concatenate documents in doc_id order
    and slice the token stream into fixed {PACK_WINDOW}-token windows; per
    doc, its stream offset and the windows it touches. The offsets come
    from the distributed scan — only (doc_id, n_tokens) pairs shuffle."""
    tok = token_counts(read_table(sf_dir, "documents", ["doc_id", "text"]))
    return pack_layout(tok, PACK_WINDOW, width=PACK_SCAN_WIDTH)


@register("pack_window_coverage", sql=f"""
    WITH {_LAYOUT_SQL},
    u AS (SELECT first_window, last_window,
                 unnest(generate_series(first_window, last_window))
                     AS window_id
          FROM layout)
    SELECT window_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (WHERE first_window = last_window)
                AS BIGINT) AS n_full_docs
    FROM u GROUP BY window_id""")
def pack_window_coverage(sf_dir: str):
    """Per-window composition of the packed layout: docs overlapping each
    window and docs fully contained — the doc→window expansion is a
    vectorized repeat pre-aggregated per batch (only counts shuffle)."""
    return window_coverage(pack_doc_layout(sf_dir))


# --------------------------- STR R-tree bulk load (Sort-Tile-Recursive)

STR_S = 8           # slices per axis → S² leaves
STR_XPARTS = 64     # fixed range partitions for the distributed rank
STR_YPARTS = 64


def _str_sql_ctes() -> str:
    """The shared STR CTE chain (pts → ranks → lf leaf assignment) —
    composed by BOTH _str_sql and _strq_sql so neither depends on string
    surgery over the other."""
    from .geoqueries import _points_cte

    return f"""pts AS ({_points_cte()}),
    tot AS (SELECT COUNT(*) AS cnt FROM pts),
    rx AS (SELECT doc_id, x, y,
                  row_number() OVER (ORDER BY x, doc_id) - 1 AS rk
           FROM pts),
    sl AS (SELECT doc_id, x, y,
                  CAST((rk * {STR_S}) // tot.cnt AS BIGINT) AS slice
           FROM rx CROSS JOIN tot),
    ry AS (SELECT *, row_number() OVER (PARTITION BY slice
                                        ORDER BY y, doc_id) - 1 AS rky,
                  COUNT(*) OVER (PARTITION BY slice) AS m
           FROM sl),
    lf AS (SELECT doc_id, x, y,
                  CAST(slice * {STR_S} + (rky * {STR_S}) // m AS BIGINT)
                      AS leaf
           FROM ry)"""


def _str_sql() -> str:
    return f"""
    WITH {_str_sql_ctes()}
    SELECT leaf, CAST(COUNT(*) AS BIGINT) AS n,
           MIN(x) AS min_x, MAX(x) AS max_x,
           MIN(y) AS min_y, MAX(y) AS max_y
    FROM lf GROUP BY leaf"""


def _part_counts(ds, col: str) -> dict[int, int]:
    """Tiny pass-1: exact row count per range partition (driver holds one
    row per partition — the scan.py up-sweep shape)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        p = t[col].to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(p, return_counts=True)
        return pa.table({col: pa.array(uniq.astype(np.int64)),
                         "__c": pa.array(cnt.astype(np.int64))})

    rows = (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(col).aggregate(Sum("__c", alias_name="c")).take_all())
    return {int(r[col]): int(r["c"]) for r in rows}


def _str_leaf_points(sf_dir: str):
    """The STR bulk-load core shared by str_rtree_leaves (directory) and
    str_rtree_range_query (query path): leaf-assigned points (leaf, x, y).

    Both global ranks are the two-pass distributed scan shape (no global
    sort): a fixed range partition on the coordinate (pure function →
    totally ordered by construction), a count-per-partition up-sweep
    (driver holds ≤ STR_XPARTS·STR_YPARTS ints), then one hash shuffle
    per axis with an in-partition vectorized sort + broadcast offset.
    Ties break by (coord, doc_id); leaf arithmetic is pure int64."""
    from ..functions.points import FIN_X0, FIN_X1, FIN_Y0, FIN_Y1
    from ..stages.shuffle import grouped_apply
    from .knn_queries import _points_ds
    from ray.data.aggregate import Count, Max, Min

    S = STR_S
    pwx = (FIN_X1 - FIN_X0) / STR_XPARTS
    pwy = (FIN_Y1 - FIN_Y0) / STR_YPARTS

    def xtag(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False)
        xp = np.clip(np.floor((x - FIN_X0) / pwx).astype(np.int64),
                     0, STR_XPARTS - 1)
        return pa.table({"id": t["id"], "x": t["x"], "y": t["y"],
                         "xpart": pa.array(xp)})

    base = _points_ds(sf_dir).map_batches(xtag, batch_format="pyarrow")

    xcounts = _part_counts(base, "xpart")
    n_total = sum(xcounts.values())
    xoffs, acc = {}, 0
    for p in sorted(xcounts):
        xoffs[p] = acc
        acc += xcounts[p]

    def slice_assign(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for xp, g in df.groupby("xpart", sort=False):
            x = g["x"].to_numpy(np.float64)
            gid = g["id"].to_numpy(np.int64)
            order = np.lexsort((gid, x))
            grank = np.empty(len(g), np.int64)
            grank[order] = xoffs[int(xp)] + np.arange(len(g))
            outs.append(pd.DataFrame({
                "id": gid, "x": x, "y": g["y"].to_numpy(np.float64),
                "slice": (grank * S) // n_total}))
        return (pd.concat(outs, ignore_index=True) if outs
                else pd.DataFrame({"id": pd.Series([], dtype="int64"),
                                   "x": pd.Series([], dtype="float64"),
                                   "y": pd.Series([], dtype="float64"),
                                   "slice": pd.Series([], dtype="int64")}))

    # spill, don't pin: the slice shuffle feeds BOTH the y-count pass and
    # the leaf pass (without a checkpoint the hash shuffle re-executes
    # per consumer), and its output is corpus-proportional — Parquet is
    # the scale-safe checkpoint medium (state/spill.py convention)
    from ..state.spill import spill_checkpoint

    sliced = spill_checkpoint(
        grouped_apply(base, ["xpart"], slice_assign),
        "str_sliced",
        schema=pa.schema([("id", pa.int64()), ("x", pa.float64()),
                          ("y", pa.float64()), ("slice", pa.int64())]))()

    def ytag(t: pa.Table) -> pa.Table:
        y = t["y"].to_numpy(zero_copy_only=False)
        yp = np.clip(np.floor((y - FIN_Y0) / pwy).astype(np.int64),
                     0, STR_YPARTS - 1)
        sl = t["slice"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"id": t["id"], "x": t["x"], "y": t["y"],
                         "slice": t["slice"],
                         "part2": pa.array(sl * STR_YPARTS + yp)})

    tagged = sliced.map_batches(ytag, batch_format="pyarrow")

    ycounts = _part_counts(tagged, "part2")
    yoffs, m_slice = {}, {}
    acc_slice = None
    acc = 0
    for p2 in sorted(ycounts):
        sl = p2 // STR_YPARTS
        if sl != acc_slice:
            acc_slice, acc = sl, 0
        yoffs[p2] = acc
        acc += ycounts[p2]
        m_slice[sl] = m_slice.get(sl, 0) + ycounts[p2]

    def leaf_assign(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for p2, g in df.groupby("part2", sort=False):
            y = g["y"].to_numpy(np.float64)
            gid = g["id"].to_numpy(np.int64)
            sl = int(p2) // STR_YPARTS
            order = np.lexsort((gid, y))
            rky = np.empty(len(g), np.int64)
            rky[order] = yoffs[int(p2)] + np.arange(len(g))
            outs.append(pd.DataFrame({
                "leaf": sl * S + (rky * S) // m_slice[sl],
                "x": g["x"].to_numpy(np.float64), "y": y}))
        return (pd.concat(outs, ignore_index=True) if outs
                else pd.DataFrame({"leaf": pd.Series([], dtype="int64"),
                                   "x": pd.Series([], dtype="float64"),
                                   "y": pd.Series([], dtype="float64")}))

    return grouped_apply(tagged, ["part2"], leaf_assign)


STRIDX_VERSION = 1


def _str_index_layout(sf_dir: str) -> str:
    """Idempotent persisted STR index (the `_events_day_layout` pattern):
    the leaf-assigned point table is BUILT ONCE per corpus into a
    deterministic directory and every STR query — leaves directory and
    range query alike, across repeated invocations — reads the same
    files. This is what makes the docstring claim 'the build is paid
    once' true as implemented: a per-call ``spill_checkpoint`` would
    rebuild and re-spill the corpus-sized table on every query. Files
    are written per leaf-bucket block, so each carries a narrow ``leaf``
    range and row-group statistics serve ``leaf IN (...)`` pushdown.

    Placement follows the spill convention: the root honors
    ``LAJI_RAY_SPILL_DIR`` and the build REFUSES the node-local default
    on a multi-node cluster (``spill._require_shared_root`` — remote
    write tasks' files would be invisible to the driver re-read, which
    here would stamp ``_DONE`` on a silently partial index). The index
    is a PERSISTENT artifact, not per-process scratch: the spill sweep
    only ever touches ``{tag}-{pid}-{uuid}``-named checkpoint dirs, so
    the index tree is safe whether it sits beside the default spill
    root (/tmp) or nested under a user-provided one. Crashed builders'
    ``*.tmp.*`` leftovers (corpus-sized) are reaped under the same
    ``spill._reap_ok`` policy. Promotion is concurrency-safe
    (``spill.claim_layout``): each builder writes a unique tmp dir and
    claims the final path with an atomic ``os.rename``; losers defer to
    the winner's ``_DONE`` marker (no pre-emptive rmtree of a dir
    another process may have just promoted)."""
    import hashlib

    from ..state.spill import (_require_shared_root, claim_layout,
                               write_empty_sentinel)

    tag = hashlib.md5(f"{sf_dir}v{STRIDX_VERSION}".encode()) \
        .hexdigest()[:12]
    root = os.path.join(os.environ.get("LAJI_RAY_SPILL_DIR", "/tmp"),
                        "laji_ray_str_index")
    out = os.path.join(root, tag)
    if os.path.exists(os.path.join(out, "_DONE")):
        return out                  # hot path: skip the shared-root probe
    _require_shared_root()

    def build(tmp: str) -> None:
        _str_leaf_points(sf_dir).write_parquet(tmp)
        if not any(os.scandir(tmp)):
            # empty corpus: keep the re-read typed (static schema)
            write_empty_sentinel(tmp, pa.schema([("leaf", pa.int64()),
                                                 ("x", pa.float64()),
                                                 ("y", pa.float64())]))

    return claim_layout(out, build)


def _str_directory(leaves):
    """Leaf directory (leaf, n, MBR) — the R-tree leaf level (≤ S² rows)."""
    from ray.data.aggregate import Count, Max, Min

    agg = leaves.groupby("leaf").aggregate(
        Count(alias_name="n"),
        Min("x", alias_name="min_x"), Max("x", alias_name="max_x"),
        Min("y", alias_name="min_y"), Max("y", alias_name="max_y"))
    return agg.map_batches(
        lambda t: t.rename_columns(["leaf", "n", "min_x", "max_x",
                                    "min_y", "max_y"]),
        batch_format="pyarrow")


@register("str_rtree_leaves", sql=_str_sql)
def str_rtree_leaves(sf_dir: str):
    """Distributed R-tree BULK LOAD via Sort-Tile-Recursive packing
    (Leutenegger et al. 1997) — how the polygon/point side of the spatial
    join gets an index built at 100-TB scale. Rank-by-x → S vertical
    slices → rank-by-y within slice → S leaves per slice; output is the
    leaf directory (leaf id, count, MBR), i.e. the R-tree leaf level.
    Build machinery in ``_str_leaf_points`` (two-pass distributed ranks,
    no global sort), persisted once per corpus by ``_str_index_layout``
    and shared with the range query; SQL twin: the same ranks via window
    functions."""
    import ray.data as rd

    return _str_directory(
        rd.read_parquet(_str_index_layout(sf_dir)))


# query rectangle (inside the Finnish bbox, off-grid so leaf MBRs
# straddle it): index correctness means hits-through-the-index equals
# the oracle's PLAIN point-in-rect count
STRQ_X0, STRQ_X1 = 23.70, 26.30
STRQ_Y0, STRQ_Y1 = 60.10, 62.80


def _strq_sql() -> str:
    from .geoqueries import _points_cte

    lf_cte = _str_sql_ctes() + ","
    qx0, qx1 = f"CAST('{STRQ_X0!r}' AS DOUBLE)", \
        f"CAST('{STRQ_X1!r}' AS DOUBLE)"
    qy0, qy1 = f"CAST('{STRQ_Y0!r}' AS DOUBLE)", \
        f"CAST('{STRQ_Y1!r}' AS DOUBLE)"
    return f"""
    WITH {lf_cte}
    d AS (SELECT leaf, CAST(COUNT(*) AS BIGINT) AS n,
                 MIN(x) AS min_x, MAX(x) AS max_x,
                 MIN(y) AS min_y, MAX(y) AS max_y
          FROM lf GROUP BY 1),
    c AS (SELECT * FROM d
          WHERE max_x >= {qx0} AND min_x <= {qx1}
            AND max_y >= {qy0} AND min_y <= {qy1})
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_leaves,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_leaves_scanned,
           (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM c)
               AS n_pts_scanned,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM ({_points_cte()}) p
            WHERE p.x >= {qx0} AND p.x <= {qx1}
              AND p.y >= {qy0} AND p.y <= {qy1}) AS n_hits"""


@register("str_rtree_range_query", sql=_strq_sql)
def str_rtree_range_query(sf_dir: str):
    """Index-accelerated range query THROUGH the STR R-tree: prune the
    leaf directory to MBRs intersecting the query rectangle, refine only
    the points of surviving leaves, report the pruning profile
    (n_leaves, n_leaves_scanned, n_pts_scanned) plus the hit count. The
    oracle computes n_hits as the PLAIN point-in-rect count — so a
    pruning bug that drops a leaf shows up as a value mismatch, not just
    a stats drift (the index-correctness invariant: every point in the
    rect lies in a leaf whose MBR intersects it). Scale shape: the
    built index is PERSISTED once per corpus (``_str_index_layout`` —
    idempotent deterministic directory, shared with ``str_rtree_leaves``
    and across repeated queries, so the build is genuinely paid once and
    every query reads the same files; the leaf-bucketed writer gives
    each file a narrow leaf range); the directory is ≤ S² rows
    (driver-held); refine reads with a ``leaf IN (...)`` pushdown
    filter, so row groups of non-intersecting leaves are pruned by
    statistics and never leave disk — points never shuffle for the
    query."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import ray.data as rd

    idx_path = _str_index_layout(sf_dir)

    def read_pts(filter=None):
        kw = {"filter": filter} if filter is not None else {}
        return rd.read_parquet(idx_path, **kw)

    d = _str_directory(read_pts()).to_pandas()
    cand = d[(d["max_x"] >= STRQ_X0) & (d["min_x"] <= STRQ_X1)
             & (d["max_y"] >= STRQ_Y0) & (d["min_y"] <= STRQ_Y1)]
    leaf_set = np.sort(cand["leaf"].to_numpy(np.int64))
    ref = ray.put(leaf_set)

    def refine(t: pa.Table) -> pa.Table:
        ls = ray.get(ref)
        leaf = t["leaf"].to_numpy(zero_copy_only=False)
        # belt-and-braces: file pruning already dropped foreign leaves
        pos = np.searchsorted(ls, leaf)
        in_leaf = (pos < len(ls)) & (ls[np.minimum(pos, len(ls) - 1)]
                                     == leaf)
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        hit = (in_leaf & (x >= STRQ_X0) & (x <= STRQ_X1)
               & (y >= STRQ_Y0) & (y <= STRQ_Y1))
        return pa.table({"h": pa.array([int(hit.sum())], pa.int64())})

    if not len(leaf_set):         # no leaf intersects the rect: 0 hits
        n_hits = 0
    else:
        pruned = read_pts(filter=pads.field("leaf").isin(
            [int(v) for v in leaf_set]))
        n_hits = sum(pc.sum(b["h"]).as_py() or 0
                     for b in pruned
                     .map_batches(refine, batch_format="pyarrow")
                     .iter_batches(batch_size=None,
                                   batch_format="pyarrow"))
    return pa.table({
        "n_leaves": pa.array([len(d)], pa.int64()),
        "n_leaves_scanned": pa.array([len(cand)], pa.int64()),
        "n_pts_scanned": pa.array([int(cand["n"].sum())], pa.int64()),
        "n_hits": pa.array([int(n_hits)], pa.int64())})


# ------------------------- temporal zone-map / partition-pruned read

TP_DAY_US = 86_400_000_000
# exact query window: 2024-01-10 06:00 → 2024-01-13 18:00 (µs epoch) —
# deliberately mid-day so boundary partitions are READ but only
# partially HIT (scanned > hits measures the read amplification)
TP_T0 = 1_704_866_400_000_000
TP_T1 = 1_705_168_800_000_000
TP_VERSION = 1


def _events_day_layout(sf_dir: str) -> str:
    """Idempotent layout step: events re-written TIME-PARTITIONED (hive
    ``day=<epoch-day>/`` directories) under /tmp — the temporal sibling
    of the Hilbert spatial layout. At scale this is the streaming
    partitioned sink every event table gets written through anyway."""
    import hashlib
    import os

    from ..state.spill import claim_layout

    tag = hashlib.md5(f"{sf_dir}v{TP_VERSION}".encode()).hexdigest()[:12]
    out = f"/tmp/laji_ray_events_days/{tag}"

    def tag_day(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        return t.append_column("day", pa.array(ts // TP_DAY_US))

    def build(tmp: str) -> None:
        import ray.data
        ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                   columns=["event_id", "ts", "value"])
        ds.map_batches(tag_day, batch_format="pyarrow") \
            .write_parquet(tmp, partition_cols=["day"])

    # concurrency-safe atomic materialization: unique per-process tmp +
    # one atomic rename — an interrupted first run can never leave
    # partial day=*/ files that a rerun would append to, and concurrent
    # first-callers never share a build dir
    return claim_layout(out, build)


@register("time_pruned_read", sql=f"""
    WITH e AS (SELECT CAST(epoch_us(ts) AS BIGINT) AS tus, value
               FROM events),
    d AS (SELECT tus, value, tus // {TP_DAY_US} AS day FROM e)
    SELECT
      CAST((SELECT COUNT(DISTINCT day) FROM d) AS BIGINT) AS n_files_total,
      CAST((SELECT COUNT(DISTINCT day) FROM d
            WHERE day BETWEEN {TP_T0 // TP_DAY_US} AND {TP_T1 // TP_DAY_US})
          AS BIGINT) AS n_files_read,
      CAST((SELECT COUNT(*) FROM d
            WHERE day BETWEEN {TP_T0 // TP_DAY_US} AND {TP_T1 // TP_DAY_US})
          AS BIGINT) AS n_scanned,
      CAST((SELECT COUNT(*) FROM d
            WHERE tus >= {TP_T0} AND tus < {TP_T1}) AS BIGINT) AS n_hits,
      CAST((SELECT COALESCE(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)),
                            0)
            FROM d WHERE tus >= {TP_T0} AND tus < {TP_T1}) AS BIGINT)
          AS sum_value_q""")
def time_pruned_read(sf_dir: str):
    """Temporal partition pruning end-to-end (the time-axis sibling of
    `hilbert_pruned_read`): events written once into a day-partitioned
    hive layout, then a time-range query PRUNES AT THE READ — only the
    partitions whose day range overlaps the predicate are opened (pure
    directory metadata, zero data I/O for the rest), the exact µs filter
    runs inside map_batches over the survivors, and the result reports
    the prune ratio (files read / total) next to the exact hit count and
    value sum. The oracle recomputes all five numbers from the raw
    table."""
    import glob
    import os

    import ray.data

    path = _events_day_layout(sf_dir)
    dirs = sorted(glob.glob(os.path.join(path, "day=*")))
    days = np.array([int(d.rsplit("=", 1)[1]) for d in dirs])
    lo, hi = TP_T0 // TP_DAY_US, TP_T1 // TP_DAY_US
    keep = [d for d, dy in zip(dirs, days) if lo <= dy <= hi]
    n_total, n_read = len(dirs), len(keep)

    files = sorted(f for d in keep
                   for f in glob.glob(os.path.join(d, "*.parquet")))
    ds = ray.data.read_parquet(files, columns=["ts", "value"])

    def scan(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        hit = (ts >= TP_T0) & (ts < TP_T1)
        vq = np.floor(v * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "scanned": pa.array([len(ts)], pa.int64()),
            "hits": pa.array([int(hit.sum())], pa.int64()),
            "sv": pa.array([int(vq[hit].sum())], pa.int64())})

    from ray.data.aggregate import Sum
    agg = ds.map_batches(scan, batch_format="pyarrow").aggregate(
        Sum("scanned", alias_name="s"), Sum("hits", alias_name="h"),
        Sum("sv", alias_name="sv"))
    return pa.table({
        "n_files_total": pa.array([n_total], pa.int64()),
        "n_files_read": pa.array([n_read], pa.int64()),
        "n_scanned": pa.array([int(agg["s"])], pa.int64()),
        "n_hits": pa.array([int(agg["h"])], pa.int64()),
        "sum_value_q": pa.array([int(agg["sv"])], pa.int64())})


# --------------------------- distributed ntile (equi-depth bucketing)

NT_B = 16          # buckets (the equi-depth partition plan size)
NT_VPARTS = 64     # fixed value-range partitions for the distributed rank
NT_V0, NT_V1 = 0.0, 1024.0   # value domain cover (clipped, skew-tolerant)


@register("ntile_event_buckets", sql=f"""
    WITH r AS (SELECT value,
                      ntile({NT_B}) OVER (ORDER BY value, event_id)
                          AS bucket
               FROM events)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(value) AS min_value, MAX(value) AS max_value
    FROM r GROUP BY 1""")
def ntile_event_buckets(sf_dir: str):
    """Equi-depth bucketing (ntile) of events by value — the histogram/
    range-partition PLANNER primitive (each bucket's [min, max] becomes a
    balanced shard boundary), certified against the SQL window ntile
    including its uneven-remainder rule (the first n % B buckets take one
    extra row). Global rank without a global sort: fixed value-range
    partition (a pure function, totally ordered by construction) →
    count-per-partition up-sweep (driver holds ≤ NT_VPARTS ints) → one
    hash shuffle with in-partition vectorized (value, event_id) sort +
    broadcast offsets — the str_rtree_leaves two-pass scan shape. Bucket
    assignment from the 0-based rank is pure int64."""
    from ..stages.shuffle import grouped_apply

    pw = (NT_V1 - NT_V0) / NT_VPARTS
    ds = read_table(sf_dir, "events", ["event_id", "value"])

    def vtag(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        vp = np.clip(np.floor((v - NT_V0) / pw).astype(np.int64),
                     0, NT_VPARTS - 1)
        return pa.table({"event_id": t["event_id"], "value": t["value"],
                         "vpart": pa.array(vp)})

    # 16 blocks before the bucketed shuffle: Ray's sort-based groupby
    # mirrors input block count (100k rows in 2 read blocks sort serially).
    # LAZY on purpose: vtag is a pure same-width projection of the pruned
    # 2-column scan, so re-executing it for each of the two passes costs
    # less I/O than pinning or spilling a same-sized table
    base = ds.map_batches(vtag, batch_format="pyarrow",
                          zero_copy_batch=True).repartition(16)
    counts = _part_counts(base, "vpart")
    n_total = sum(counts.values())
    offs, acc = {}, 0
    for p in sorted(counts):
        offs[p] = acc
        acc += counts[p]
    q, rem = divmod(n_total, NT_B)

    def bucket_assign(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for vp, g in df.groupby("vpart", sort=False):
            v = g["value"].to_numpy(np.float64)
            gid = g["event_id"].to_numpy(np.int64)
            order = np.lexsort((gid, v))
            rank = np.empty(len(g), np.int64)
            rank[order] = offs[int(vp)] + np.arange(len(g))
            head = rem * (q + 1)
            bucket = np.where(rank < head, rank // max(q + 1, 1),
                              rem + (rank - head) // max(q, 1)) + 1
            outs.append(pd.DataFrame({"bucket": bucket, "value": v}))
        return (pd.concat(outs, ignore_index=True) if outs
                else pd.DataFrame({"bucket": pd.Series([], dtype="int64"),
                                   "value": pd.Series([], dtype="float64")}))

    from ray.data.aggregate import Count, Max, Min
    rows = grouped_apply(base, ["vpart"], bucket_assign)
    agg = rows.groupby("bucket").aggregate(
        Count(alias_name="n"),
        Min("value", alias_name="min_value"),
        Max("value", alias_name="max_value"))
    return agg.map_batches(
        lambda t: t.rename_columns(["bucket", "n", "min_value",
                                    "max_value"]),
        batch_format="pyarrow")


# ------------------------------- RAG chunking layout (overlapping windows)
CHUNK_W = 128   # tokens per chunk
CHUNK_S = 96    # stride (CHUNK_W - CHUNK_S = 32-token overlap)


@register("rag_chunk_layout", sql=f"""
    WITH tok AS (SELECT doc_id,
                        CAST(len(string_split(text, ' ')) AS BIGINT) AS n
                 FROM documents),
    ch AS (SELECT doc_id, n,
                  unnest(generate_series(0,
                      CASE WHEN n > {CHUNK_W}
                           THEN (n - {CHUNK_W} + {CHUNK_S} - 1) // {CHUNK_S}
                           ELSE 0 END)) AS chunk_idx
           FROM tok)
    SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(chunk_idx * {CHUNK_S} AS BIGINT) AS start_tok,
           CAST(least({CHUNK_W}, n - chunk_idx * {CHUNK_S}) AS BIGINT)
               AS chunk_len
    FROM ch""")
def rag_chunk_layout(sf_dir: str):
    """RAG-style document chunking layout: per document, overlapping
    CHUNK_W-token windows at CHUNK_S stride (the per-document sibling of
    the cross-document `pack_doc_layout`; retrieval chunkers overlap,
    packers don't). Emits (doc_id, chunk_idx, start_tok, chunk_len) — a
    pure streaming per-row transform: token count via the shared
    tokenizer contract, then a vectorized ragged expand (repeat/arange),
    no shuffle at all; chunk arithmetic is int64 on both sides. The text
    payload never leaves the scan — a downstream embedding stage would
    slice tokens by (start_tok, chunk_len) against the same layout."""
    tok = token_counts(read_table(sf_dir, "documents", ["doc_id", "text"]))

    def expand(t: pa.Table) -> pa.Table:
        n = t["n_tokens"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        extra = np.maximum(n - CHUNK_W, 0)
        m = 1 + (extra + CHUNK_S - 1) // CHUNK_S
        tot = int(m.sum())
        idx = np.repeat(np.arange(len(m)), m)
        ci = np.arange(tot) - np.repeat(np.cumsum(m) - m, m)
        start = ci * CHUNK_S
        return pa.table({
            "doc_id": pa.array(ids[idx]),
            "chunk_idx": pa.array(ci),
            "start_tok": pa.array(start),
            "chunk_len": pa.array(np.minimum(CHUNK_W, n[idx] - start))})

    return tok.map_batches(expand, batch_format="pyarrow",
                           zero_copy_batch=True)


# ------------------------------- length-bucketed (smart) batching audit
LB_BATCH = 32     # micro-batch size in documents


@register("length_bucket_padding", sql=f"""
    WITH tok AS (SELECT doc_id,
                        CAST(len(string_split(text, ' ')) AS BIGINT) AS n
                 FROM documents),
    r AS (SELECT n, (row_number() OVER (ORDER BY n, doc_id) - 1)
                        // {LB_BATCH} AS batch_id
          FROM tok)
    SELECT CAST(batch_id AS BIGINT) AS batch_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX(n) AS BIGINT) AS max_len,
           CAST(COUNT(*) * MAX(n) - SUM(n) AS BIGINT) AS pad_waste
    FROM r GROUP BY 1""")
def length_bucket_padding(sf_dir: str):
    """SMART-BATCHING audit (the padding-efficiency report behind every
    variable-length training loader): documents sorted by token length
    (ties → doc_id) and cut into LB_BATCH-document micro-batches; per
    batch, the max length and the padding waste Σ(max − len) that a
    pad-to-longest collator would burn. Length-sorted batching turns the
    waste profile from O(max_len) to near-zero — this query MEASURES it.

    Global rank without a global sort (the ntile/str-rtree two-pass
    shape): the LENGTH ITSELF is the range-partition key (a pure
    function, totally ordered), pass 1 counts rows per length (driver
    holds ≤ |distinct lengths| ints), pass 2 cogroups by length and
    assigns ranks by in-length doc_id order + broadcast offsets; batch
    arithmetic and waste are pure int64."""
    from ray.data.aggregate import Count, Max, Sum

    from ..stages.shuffle import grouped_apply

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    # spill, don't pin: the (doc, n_tokens) projection is docs-
    # proportional and MUCH narrower than its source (re-scanning would
    # re-read the wide text column per consumer); two passes re-read
    # the Parquet
    from ..state.spill import spill_checkpoint

    read_tok = spill_checkpoint(
        token_counts(docs), "lbp_tok",
        schema=pa.schema([("doc_id", pa.int64()),
                          ("n_tokens", pa.int64())]))
    tok = read_tok()
    counts = _part_counts(read_tok(), "n_tokens")
    offs, acc = {}, 0
    for ln in sorted(counts):
        offs[ln] = acc
        acc += counts[ln]

    def assign_batches(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for ln, g in df.groupby("n_tokens", sort=False):
            gid = np.sort(g["doc_id"].to_numpy(np.int64))
            rank = offs[int(ln)] + np.arange(len(gid))
            outs.append(pd.DataFrame({
                "batch_id": rank // LB_BATCH,
                "n": np.full(len(gid), ln, np.int64)}))
        return (pd.concat(outs, ignore_index=True) if outs
                else pd.DataFrame({"batch_id": pd.Series([], dtype="int64"),
                                   "n": pd.Series([], dtype="int64")}))

    rows = grouped_apply(tok, ["n_tokens"], assign_batches)
    agg = rows.groupby("batch_id").aggregate(
        Count(alias_name="n_docs"), Max("n", alias_name="max_len"),
        Sum("n", alias_name="sum_len"))

    def finish(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["batch_id", "n_docs", "max_len", "sum_len"])
        nd = t["n_docs"].to_numpy(zero_copy_only=False)
        mx = t["max_len"].to_numpy(zero_copy_only=False)
        sm = t["sum_len"].to_numpy(zero_copy_only=False)
        return pa.table({"batch_id": t["batch_id"],
                         "n_docs": pa.array(nd.astype(np.int64)),
                         "max_len": pa.array(mx.astype(np.int64)),
                         "pad_waste": pa.array(
                             (nd * mx - sm).astype(np.int64))})

    return agg.map_batches(finish, batch_format="pyarrow")


# ------------------------------------------------------------ compaction plan

COMPACT_TARGET = 5_000       # target output-file payload (chars)
_IY_SHIFT = 29               # cells.IY_SHIFT — width strides whole iy rows


def _compact_sql() -> str:
    from ..functions import cells, points

    x, y = points.sql_xy("doc_id")
    return f"""
    WITH base AS (SELECT doc_id, n_chars, {x} AS x, {y} AS y FROM documents),
    f AS (SELECT {cells.sql_cell('x', 'y', 7)} AS cell7,
                 CAST(SUM(n_chars) AS BIGINT) AS bytes
          FROM base GROUP BY 1)
    SELECT cell7, bytes,
           CAST((CAST(SUM(bytes) OVER (ORDER BY cell7) AS BIGINT) - bytes)
                // {COMPACT_TARGET} AS BIGINT) AS file_group
    FROM f"""


@register("compaction_plan", sql=_compact_sql)
def compaction_plan(sf_dir: str):
    """Table-maintenance compaction plan — the Lance/Delta ``OPTIMIZE``
    shape: per-tile fragment sizes in spatial (Morton) order are packed
    into ~target-size output files by splitting the ordered run at
    cumulative-size boundaries (group = exclusive-prefix-sum // target).
    A fragment never splits; every output group is ≥ target except the
    last — the standard sorted-run bin pack.

    Distribution: per-tile sizes via batch-partial sums (the doc table
    never shuffles), then the two-pass distributed prefix sum
    (stages/scan.global_cumsum) over the tile order — driver state is one
    row per key-range partition, no global sort."""
    from ray.data.aggregate import Sum

    from ..stages.derive import derive_and_encode

    ds = read_table(sf_dir, "documents", ["doc_id", "n_chars"])
    ds = ds.map_batches(derive_and_encode("doc_id", (7,)),
                        batch_format="pyarrow", zero_copy_batch=True)

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "cell7": t["cell7"].to_numpy(zero_copy_only=False),
            "bytes": t["n_chars"].to_numpy(zero_copy_only=False)
            .astype(np.int64)})
        return pa.Table.from_pandas(
            df.groupby("cell7", as_index=False).sum(), preserve_index=False)

    fine = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("cell7").aggregate(Sum("bytes", alias_name="bytes")) \
        .map_batches(lambda t: t.rename_columns(["cell7", "bytes"]),
                     batch_format="pyarrow")

    run = global_cumsum(fine, "cell7", "bytes",
                        width=np.int64(8) << _IY_SHIFT)

    def finish(t: pa.Table) -> pa.Table:
        net = t["net"].to_numpy(zero_copy_only=False)
        running = t["running"].to_numpy(zero_copy_only=False)
        return pa.table({
            "cell7": t["cell7"], "bytes": pa.array(net),
            "file_group": pa.array((running - net) // COMPACT_TARGET)})

    return run.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------- lateness audit

LATE_WIDTH = 4096      # event_id range per scan partition


@register("lateness_audit", sql="""
    WITH e AS (SELECT event_id, event_type,
                      CAST(epoch_us(ts) AS BIGINT) AS t FROM events),
    r AS (SELECT *, MAX(t) OVER (ORDER BY event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS pm
          FROM e)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN pm IS NOT NULL AND t < pm
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           CAST(COALESCE(MAX(CASE WHEN pm IS NOT NULL AND pm > t
                                  THEN pm - t END), 0) AS BIGINT)
               AS max_lateness_us
    FROM r GROUP BY 1""")
def lateness_audit(sf_dir: str):
    """Out-of-orderness audit of the ingest log — the statistic that
    sizes a streaming watermark: treating event_id as ARRIVAL order, an
    event is late iff its event time is below the running max of
    everything that arrived before it; report per-type late counts and
    the worst lateness. The running MAX is the same two-pass distributed
    scan as global_cumsum with (max, -inf) replacing (sum, 0): pass 1
    per-id-range maxima (one row each to the driver), pass 2 exclusive
    ``np.maximum.accumulate`` within each range seeded by the prefix —
    no global sort, no serial pass."""
    import pyarrow.compute as pc

    from ..stages.shuffle import grouped_apply

    ev = read_table(sf_dir, "events", ["event_id", "event_type", "ts"])
    ds = ev.map_batches(
        lambda t: pa.table({
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "event_type": pc.cast(t["event_type"], pa.string()),
            "t": pc.cast(t["ts"], pa.int64()),
            "part": pc.divide(pc.cast(t["event_id"], pa.int64()),
                              LATE_WIDTH)}),
        batch_format="pyarrow")

    # pass 1: per-partition max event time (one row per id range)
    from ray.data.aggregate import Max
    rows = ds.groupby("part").aggregate(Max("t", alias_name="m")).take_all()
    rows.sort(key=lambda r: r["part"])
    prefix, acc = {}, np.iinfo(np.int64).min
    for r in rows:
        prefix[int(r["part"])] = acc
        acc = max(acc, int(r["m"]))

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for p, g in df.groupby("part", sort=False):
            g = g.sort_values("event_id", kind="mergesort")
            t = g["t"].to_numpy(np.int64)
            run = np.maximum.accumulate(t)
            excl = np.empty(len(t), np.int64)
            excl[0] = prefix[int(p)]
            excl[1:] = np.maximum(run[:-1], prefix[int(p)])
            late = t < excl
            lateness = np.where(late, excl - t, 0)
            out.append(pd.DataFrame({
                "event_type": g["event_type"].to_numpy(),
                "n_events": 1,
                "n_late": late.astype(np.int64),
                "max_lateness_us": lateness}))
        allp = pd.concat(out, ignore_index=True)
        return allp.groupby("event_type", as_index=False).agg(
            n_events=("n_events", "sum"), n_late=("n_late", "sum"),
            max_lateness_us=("max_lateness_us", "max"))

    from ray.data.aggregate import Sum
    partials = grouped_apply(ds, ["part"], per_part)
    agg = partials.groupby("event_type").aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("n_late", alias_name="n_late"),
        Max("max_lateness_us", alias_name="max_lateness_us"))
    return agg.map_batches(lambda t: t.rename_columns(
        ["event_type", "n_events", "n_late", "max_lateness_us"]),
        batch_format="pyarrow")


# ----------------------------------------------------------- zone-map stats

ZM_WIDTH = 2048          # rows per zone (block) keyed by event_id range
ZM_PRED = 400.0          # audit predicate: value >= ZM_PRED


@register("zonemap_prune_stats", sql=f"""
    WITH e AS (SELECT event_id // {ZM_WIDTH} AS zone, value FROM events)
    SELECT zone, CAST(COUNT(*) AS BIGINT) AS n,
           MIN(value) AS vmin, MAX(value) AS vmax,
           CAST(SUM(CASE WHEN value >= {ZM_PRED} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_match,
           CAST(CASE WHEN MAX(value) < {ZM_PRED} THEN 1 ELSE 0 END
                AS BIGINT) AS prunable
    FROM e GROUP BY zone""")
def zonemap_prune_stats(sf_dir: str):
    """Zone-map (min/max statistics) audit — the storage-layer pruning
    structure Lance/Parquet readers consult: per id-range zone, the
    value min/max, the actual match count for the audit predicate, and
    whether the zone is prunable (max < threshold). min/max are
    SELECTION (hash-exact floats); everything else integer. Per-batch
    partial zone aggregates; the event table never shuffles — zones are
    id-range-aligned so each read block covers whole zones."""
    from ray.data.aggregate import Max, Min, Sum

    ev = read_table(sf_dir, "events", ["event_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        z = (t["event_id"].to_numpy(zero_copy_only=False)
             // ZM_WIDTH).astype(np.int64)
        v = t["value"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"zone": z, "v": v})
        g = df.groupby("zone").agg(
            n=("v", "size"), vmin=("v", "min"), vmax=("v", "max"),
            n_match=("v", lambda s: int((s >= ZM_PRED).sum())))
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    agg = ev.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("zone").aggregate(
            Sum("n", alias_name="n"), Min("vmin", alias_name="vmin"),
            Max("vmax", alias_name="vmax"),
            Sum("n_match", alias_name="n_match"))

    def finish(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["zone", "n", "vmin", "vmax", "n_match"])
        vmax = t["vmax"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "prunable", pa.array((vmax < ZM_PRED).astype(np.int64)))

    return agg.map_batches(finish, batch_format="pyarrow")
