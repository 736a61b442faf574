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

import numpy as np
import pyarrow as pa

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
