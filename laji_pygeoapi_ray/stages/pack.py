"""Sequence packing: concat-and-chunk token-window layout.

LLM pretraining lays a corpus out by concatenating documents in a fixed
global order and slicing the resulting token stream into fixed-length
windows (GPT-style "pack then chunk": every window is exactly full and a
document may straddle a window boundary). The reference engine has no such
operator — its unit of layout is the occurrence page
(``/root/reference/pygeoapi/scripts/main.py:91-115``) — so this is part of
the training-data extension set (SURVEY §2 extensions).

The whole layout is a pure function of the exclusive prefix sum of
per-document token counts over the order key, which the distributed
two-pass scan (``stages/scan.py``) computes without a global sort or a
single-worker ordered pass. Every downstream column (window ids, straddle
flags, per-window composition) then derives vectorized from
``(n_tokens, cumsum)`` — the text itself never shuffles; only
``(doc_id, n_tokens)`` pairs move.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .scan import global_cumsum


def token_counts(ds, id_col: str = "doc_id", text_col: str = "text"):
    """(id, text) → (id, n_tokens) with the shared tokenizer contract
    (``' '``-separated fields, empty fields included — equals DuckDB's
    ``len(string_split(text, ' '))``)."""
    def fn(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            pc.fill_null(pc.cast(t[text_col], pa.string()), ""), " ")
        n = pc.cast(pc.list_value_length(toks), pa.int64())
        return pa.table({id_col: t[id_col], "n_tokens": n})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def pack_layout(tok_ds, window: int, *, width: int, id_col: str = "doc_id"):
    """Concat-and-chunk layout over ascending ``id_col`` order: per doc,
    its half-open token span [start_offset, start_offset + n_tokens) in the
    concatenated stream and the window ids that span touches.

    Output columns: id_col, n_tokens, start_offset, first_window,
    last_window, n_windows — all int64, one row per document.
    """
    cum = global_cumsum(tok_ds, id_col, "n_tokens", width=width,
                        out_col="cum")

    def layout(t: pa.Table) -> pa.Table:
        n = t["net"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["cum"].to_numpy(zero_copy_only=False).astype(np.int64)
        start = c - n
        first = start // np.int64(window)
        last = (c - 1) // np.int64(window)
        return pa.table({id_col: t[id_col], "n_tokens": pa.array(n),
                         "start_offset": pa.array(start),
                         "first_window": pa.array(first),
                         "last_window": pa.array(last),
                         "n_windows": pa.array(last - first + 1)})

    return cum.map_batches(layout, batch_format="pyarrow",
                           zero_copy_batch=True)


def window_coverage(layout_ds):
    """Per-window composition: how many documents overlap each window and
    how many of those sit fully inside it. The doc→window expansion is a
    vectorized repeat (a doc touching w windows emits w pairs, w is tiny:
    ceil(n_tokens/window)+1), pre-aggregated per batch so only
    (window_id, count) partials shuffle."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        first = t["first_window"].to_numpy(zero_copy_only=False)
        last = t["last_window"].to_numpy(zero_copy_only=False)
        span = (last - first + 1).astype(np.int64)
        total = int(span.sum())
        if total == 0:
            return pa.table({"window_id": pa.array([], pa.int64()),
                             "n_docs": pa.array([], pa.int64()),
                             "n_full_docs": pa.array([], pa.int64())})
        base = np.repeat(np.cumsum(span) - span, span)
        wid = np.repeat(first, span) + (np.arange(total) - base)
        full = np.repeat(span == 1, span)
        uniq, inv = np.unique(wid, return_inverse=True)
        nd = np.bincount(inv).astype(np.int64)
        nf = np.bincount(inv, weights=full).astype(np.int64)
        return pa.table({"window_id": pa.array(uniq),
                         "n_docs": pa.array(nd),
                         "n_full_docs": pa.array(nf)})

    p = layout_ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    agg = p.groupby("window_id").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("n_full_docs", alias_name="n_full_docs"))

    def cast64(t: pa.Table) -> pa.Table:
        return pa.table({c: pc.cast(t[c], pa.int64())
                         for c in t.column_names})

    return agg.map_batches(cast64, batch_format="pyarrow",
                           zero_copy_batch=True)
