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
        texts = batch[text_col].to_pylist()
        stats = tk.token_stats(texts)
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
    def fn(batch: pa.Table) -> pa.Table:
        out = np.empty(len(batch), dtype=np.int64)
        for i, t in enumerate(batch[text_col].to_pylist()):
            out[i] = tk.simhash64(tk.shingle_hashes(tk.word_shingles(t, shingle_n)))
        return batch.append_column(out_col, pa.array(out))
    return fn


def minhash_stage(text_col: str = "text", shingle_n: int = 3,
                  bands: int = 16):
    """Per row emit the LSH band bucket keys as a list column ``bands``
    (explode downstream for the bucket groupby)."""
    def fn(batch: pa.Table) -> pa.Table:
        keys = []
        for t in batch[text_col].to_pylist():
            sig = tk.minhash_signature(tk.shingle_hashes(tk.word_shingles(t, shingle_n)))
            keys.append(tk.minhash_bands(sig, bands))
        return batch.append_column("bands", pa.array(keys, pa.list_(pa.int64())))
    return fn
