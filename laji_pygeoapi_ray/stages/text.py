"""Text-analysis map_batches stages (training-data pipeline ops):
token/quality stats, MD5 fingerprinting, language ID.

All stages are per-batch; LangIdStage is an actor-pool stage (profiles
built once per actor in ``__init__`` from a broadcast training sample)."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..functions import textkernels as tk


def text_stats_stage(text_col: str = "text"):
    def fn(batch: pa.Table) -> pa.Table:
        stats = tk.token_stats(batch[text_col])
        for name, arr in stats.items():
            batch = batch.append_column(name, pa.array(arr))
        return batch
    return fn


def fingerprint_stage(text_col: str = "text", out_col: str = "fp"):
    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            out_col, pa.array(tk.md5_fingerprint(batch[text_col].to_pylist())))
    return fn


class LangIdStage:
    """Actor-pool language ID: the char-trigram profiles are fit ONCE per
    actor from a broadcast labelled sample; per batch only ``predict`` runs."""

    def __init__(self, train_ref):
        texts, labels = (ray.get(train_ref)
                         if isinstance(train_ref, ray.ObjectRef) else train_ref)
        self.model = tk.LangProfile().fit(texts, labels)

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = self.model.predict(batch["text"].to_pylist())
        return batch.append_column("lang_pred", pa.array(preds, pa.string()))


def simhash_stage(text_col: str = "text", out_col: str = "simhash",
                  shingle_n: int = 3):
    """Batched SimHash: grams via one Arrow split + numpy index math,
    SQL-twinnable gram hashes (``tk.poly_mix_hash``: byte polynomial mod
    2^31-1 + splitmix64 finalizer — reproducible in DuckDB, so the whole
    simhash pipeline carries an exact oracle), per-doc DISTINCT (simhash
    votes count each distinct shingle once), bit votes via one
    ``add.reduceat`` per batch — no per-doc Python loop."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        n = shingle_n
        text = pc.fill_null(pc.cast(batch[text_col], pa.string()), "")
        toks = pc.split_pattern(text, " ")
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        counts = np.maximum(lens - n + 1, 0)
        total = int(counts.sum())
        starts = np.cumsum(counts) - counts
        tok0 = np.cumsum(lens) - lens
        pos = np.arange(total) - np.repeat(starts, counts)
        base = np.repeat(tok0, counts) + pos
        parts = [flat.take(pa.array(base + j)) for j in range(n)]
        grams = pc.binary_join_element_wise(*parts, " ")
        gh = tk.poly_mix_hash(grams)
        # per-doc distinct (votes count each distinct shingle once)
        doc_of = np.repeat(np.arange(len(batch)), counts)
        order = np.lexsort((gh, doc_of))
        gh_s, doc_s = gh[order], doc_of[order]
        keep = np.ones(len(gh_s), dtype=bool)
        keep[1:] = (gh_s[1:] != gh_s[:-1]) | (doc_s[1:] != doc_s[:-1])
        gh_s, doc_s = gh_s[keep], doc_s[keep]
        bits = ((gh_s[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        votes_flat = 2 * bits - 1
        out = np.zeros(len(batch), dtype=np.int64)
        if len(doc_s):
            seg = np.flatnonzero(np.r_[True, doc_s[1:] != doc_s[:-1]])
            votes = np.add.reduceat(votes_flat, seg, axis=0)
            docs_present = doc_s[seg]
            v = ((votes >= 0).astype(np.uint64)
                 << np.arange(64, dtype=np.uint64)[None, :]).sum(
                     axis=1, dtype=np.uint64)
            out[docs_present] = v.astype(np.int64)
        return batch.append_column(out_col, pa.array(out))
    return fn


def minhash_stage(text_col: str = "text", shingle_n: int = 3,
                  bands: int = 16):
    """Per row emit the LSH band bucket keys as a list column ``bands``
    (explode downstream for the bucket groupby).

    Fully vectorized: grams via one Arrow split + numpy index math (the
    shingle_explode machinery), SQL-twinnable gram hashing
    (``tk.poly_mix_hash`` — deterministic across processes AND across
    engines, so the minhash clusters query carries an exact DuckDB
    oracle), signatures via one ``minimum.reduceat`` per permutation,
    band keys via a multiply-xor fold. No per-doc Python loop."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        n = shingle_n
        text = pc.fill_null(pc.cast(batch[text_col], pa.string()), "")
        toks = pc.split_pattern(text, " ")
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        counts = np.maximum(lens - n + 1, 0)
        total = int(counts.sum())
        starts = np.cumsum(counts) - counts
        tok0 = np.cumsum(lens) - lens
        pos = np.arange(total) - np.repeat(starts, counts)
        base = np.repeat(tok0, counts) + pos
        parts = [flat.take(pa.array(base + j)) for j in range(n)]
        grams = pc.binary_join_element_wise(*parts, " ")
        gh = tk.poly_mix_hash(grams)

        has = counts > 0
        keys = np.zeros((len(batch), bands), dtype=np.int64)
        if has.any():
            sig = tk.minhash_signature_batch(gh, starts[has])
            keys[has] = tk.minhash_bands_batch(sig, bands)
        # docs with no grams get NO bands (old path: empty-signature rows
        # still emitted bands of the max-sentinel; those never matched
        # anything, so dropping them is behavior-equivalent and cheaper)
        offsets = np.zeros(len(batch) + 1, dtype=np.int32)
        np.cumsum(has * bands, out=offsets[1:])
        col = pa.ListArray.from_arrays(pa.array(offsets),
                                       pa.array(keys[has].ravel(), pa.int64()))
        return batch.append_column("bands", col)
    return fn


def token_values(text_arr) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace-token VALUES straight from the Arrow string buffers:
    v = bytes·256 + first byte per token over the flat token stream, plus
    per-row token counts. The SQL twin of every consumer uses
    ``length(t)·256 + unicode(t)`` (ASCII corpus ⇒ identical). Shared by
    :func:`rolling_fingerprint_stage` and the DSIR bucket kernels."""
    import pyarrow.compute as pc

    text = pc.fill_null(pc.cast(text_arr, pa.string()), "")
    toks = pc.split_pattern(text, " ")
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    if flat.offset:          # sliced array: realign (rare) so the
        # raw-buffer reads below index from 0
        flat = pa.array(flat.to_pylist(), pa.string())
    lens_doc = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    # per-token length (bytes == chars for ASCII) + first byte, pure
    # numpy over the Arrow buffers
    off = np.frombuffer(flat.buffers()[1], dtype=np.int32,
                        count=len(flat) + 1).astype(np.int64)
    data = np.frombuffer(flat.buffers()[2], dtype=np.uint8) \
        if flat.buffers()[2] is not None else np.array([], np.uint8)
    tlen = np.diff(off)
    if len(data):
        first = np.where(tlen > 0,
                         data[np.minimum(off[:-1], len(data) - 1)],
                         0).astype(np.int64)
    else:   # every text empty/null: no data buffer to index (observed:
        # IndexError on an all-empty batch — a real corpus HAS those)
        first = np.zeros(len(tlen), np.int64)
    return tlen * 256 + first, lens_doc


def window_index(lens_doc: np.ndarray, window: int):
    """Flat sliding-window index arithmetic over a token stream segmented
    by ``lens_doc``: returns (counts, starts, basei) where row i owns
    windows [starts[i], starts[i]+counts[i]) and window j starts at flat
    token index basei[j] (same construction as ``shingle_explode``)."""
    counts = np.maximum(lens_doc - window + 1, 0)
    total = int(counts.sum())
    starts = np.cumsum(counts) - counts
    tok0 = np.cumsum(lens_doc) - lens_doc
    pos = np.arange(total) - np.repeat(starts, counts)
    basei = np.repeat(tok0, counts) + pos
    return counts, starts, basei


def rolling_fingerprint_stage(text_col: str = "text",
                              id_col: str = "doc_id",
                              window: int = 4, base: int = 33):
    """Document fingerprinting via polynomial rolling hash (winnowing-lite):
    token value v = chars·256 + first-codepoint, window hash
    h = ((v₀·B + v₁)·B + v₂)·B + v₃ (B=33, exact in int64 — no modulus
    needed at these bounds), per-doc fingerprint = MIN window hash +
    window count. Fully vectorized: token first-bytes and lengths come
    straight from the Arrow string buffers (offsets + data), windows via
    the same numpy index arithmetic as shingle_explode. SQL twin uses
    ``length(t)·256 + unicode(t)`` per token (ASCII corpus ⇒ identical)."""

    def fn(batch: pa.Table) -> pa.Table:
        v, lens_doc = token_values(batch[text_col])
        counts, starts, basei = window_index(lens_doc, window)
        total = len(basei)
        h = np.zeros(total, dtype=np.int64)
        for j in range(window):
            h = h * base + v[basei + j]
        doc_ids = batch[id_col].to_numpy(zero_copy_only=False)
        # per-doc min via minimum.reduceat (counts>0 rows only)
        has = counts > 0
        mins = np.full(len(doc_ids), -1, dtype=np.int64)
        if total:
            mins_present = np.minimum.reduceat(h, starts[has])
            mins[has] = mins_present
        return pa.table({
            id_col: pa.array(doc_ids, pa.int64()),
            "fingerprint": pa.array(mins),
            "n_windows": pa.array(counts),
        })
    return fn


def repetition_stage(text_col: str = "text"):
    """Gopher-style repetition-signal columns (see
    ``textkernels.repetition_stats``)."""
    def fn(batch: pa.Table) -> pa.Table:
        stats = tk.repetition_stats(batch[text_col])
        for name, arr in stats.items():
            batch = batch.append_column(name, pa.array(arr))
        return batch
    return fn


def bench_gram_stage(k: int, bench_mod: int, id_col: str = "doc_id",
                     text_col: str = "text"):
    """Small-side build for decontamination: per batch, the distinct
    k-gram hashes of the benchmark docs (``id % bench_mod == 0``). Only
    hashes leave the batch; the driver unions the ≤|bench|·len partials."""
    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        keep = ids % bench_mod == 0
        if not keep.any():
            return pa.table({"gram_h": pa.array([], pa.uint64())})
        texts = batch[text_col].filter(pa.array(keep))
        _, _, h = tk.gram_hash_arrays(texts, k)
        return pa.table({"gram_h": pa.array(np.unique(h))})
    return fn


class ContaminationStage:
    """Flag training docs sharing any word-k-gram with the benchmark set —
    the eval-decontamination primitive of a pretraining pipeline (13-gram
    overlap in GPT-3/The Pile; k is a parameter here). The benchmark gram
    set is broadcast ONCE (``ray.put`` ref resolved in ``__init__``, once
    per actor); each batch is a vectorized sorted-membership probe."""

    def __init__(self, bench_ref, k: int, bench_mod: int,
                 id_col: str = "doc_id", text_col: str = "text"):
        self.grams = np.sort(ray.get(bench_ref))
        self.k, self.mod = k, bench_mod
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        keep = ids % self.mod != 0
        ids = ids[keep]
        texts = batch[self.text_col].filter(pa.array(keep))
        n, d, h = tk.gram_hash_arrays(texts, self.k)
        pos = np.searchsorted(self.grams, h)
        pos[pos >= len(self.grams)] = 0
        hit = (self.grams[pos] == h) if len(self.grams) else \
            np.zeros(len(h), bool)
        cont = np.bincount(d[hit], minlength=len(n)).astype(np.int64)
        return pa.table({self.id_col: pa.array(ids),
                         "n_grams": pa.array(n),
                         "contaminated_n": pa.array(cont),
                         "is_contaminated": pa.array(cont > 0)})
