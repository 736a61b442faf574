"""ViT-style patch extraction over the image table.

Training pipelines for vision transformers cut every image into a grid of
P×P patches; this stage does the decode → patchify → per-patch reduce
step as an actor-pool ``map_batches`` (codec state in ``__init__``, wide
binary rows in small batches, bytes dropped at the stage boundary — the
same contract as ``ImageDecodeStage``).

Per image it emits integer patch statistics with a built-in conservation
proof: the sum over all patch sums must equal the whole-image channel sum
computed by an INDEPENDENT reduction order — any patch-grid or indexing
bug breaks the equality (exact int64, no float tolerance). The patch
count comes from the DECODED array shape, so it also certifies that the
stored (w, h) metadata matches the pixels.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import codec


class PatchStage:
    """Actor stage: decode + P×P patchify.

    Output columns (appended): ``n_patches`` (from the decoded shape),
    ``conserve_ok`` (Σ patch sums == image sum), ``patch_sum_min`` /
    ``patch_sum_max`` (int64 over the patch grid), ``top_patch_idx``
    (row-major index of the max-energy patch; energy = per-patch sum of
    squared channel values; deterministic ties → lowest index).
    """

    def __init__(self, patch: int = 8, drop_bytes: bool = True,
                 strict: bool = False):
        self.p = int(patch)
        self.drop_bytes = drop_bytes
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        p = self.p
        n = len(batch)
        fmts = batch["fmt"].to_pylist()
        datas = batch["bytes"].to_pylist()
        n_patches = np.zeros(n, dtype=np.int64)
        conserve = np.zeros(n, dtype=bool)
        smin = np.zeros(n, dtype=np.int64)
        smax = np.zeros(n, dtype=np.int64)
        top = np.zeros(n, dtype=np.int64)
        ok = np.ones(n, dtype=bool)
        for i, (fmt, data) in enumerate(zip(fmts, datas)):
            try:
                img = codec.decode(data, fmt).astype(np.int64)
                h, w, _ = img.shape
                gh, gw = h // p, w // p
                patches = img[:gh * p, :gw * p].reshape(gh, p, gw, p, 3)
                sums = patches.sum(axis=(1, 3, 4))          # (gh, gw)
                energy = (patches * patches).sum(axis=(1, 3, 4))
                n_patches[i] = gh * gw
                # independent reduction order: flat sum over the raw array
                conserve[i] = int(sums.sum()) == int(img.sum())
                smin[i] = sums.min()
                smax[i] = sums.max()
                top[i] = int(energy.argmax())               # row-major
            except Exception:
                if self.strict:
                    raise
                ok[i] = False
        mask = None if ok.all() else ~ok
        batch = batch.append_column("n_patches", pa.array(n_patches,
                                                          mask=mask))
        batch = batch.append_column("conserve_ok",
                                    pa.array(conserve & ok))
        batch = batch.append_column("patch_sum_min", pa.array(smin,
                                                              mask=mask))
        batch = batch.append_column("patch_sum_max", pa.array(smax,
                                                              mask=mask))
        batch = batch.append_column("top_patch_idx", pa.array(top,
                                                              mask=mask))
        if self.drop_bytes and "bytes" in batch.column_names:
            batch = batch.drop_columns(["bytes"])
        return batch
