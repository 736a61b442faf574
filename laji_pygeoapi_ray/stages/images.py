"""Image map_batches stages (actor pools — wide binary rows, small batches).

The multimodal plumbing demanded by the brief: decode / verify / feature-
extract / thumbnail over the opaque ``bytes`` column, with the Ray-side
contracts (schema, batch size, actor signature, zero-copy binary in/out)
fully real; the codecs themselves are the engine's own (functions/codec.py —
real PNG, deterministic lossy qz6; PIL/cv2 don't exist in this container)."""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import codec
from ..sources.images import content_seed


class ImageDecodeStage:
    """Actor stage: decode each row's bytes, emit pixel features and the
    decode-verification metrics of the north rule:

    - ``psnr``      vs the deterministically-reconstructed original
                    (∞ → stored as 99.0 for lossless; ≥ 40 dB required),
    - ``ahash_dec`` average-hash of the DECODED pixels,
    - ``mean_lum``  mean luma (the per-tile aggregation payload).

    Runs as an actor pool with small batches (rows are wide: bytes payload
    dominates block size — SURVEY.md §7.4)."""

    def __init__(self, check_psnr: bool = True, drop_bytes: bool = False,
                 strict: bool = False):
        # drop_bytes: once decoded+verified, the (dominant) binary payload
        # need not travel further — downstream stages see only features.
        # Keeping it in crossed the object store between the decode and PIP
        # actor pools and cost ~20 % of the image-pipeline wall time.
        # strict=False: a corrupt row degrades (decode_ok=False, null
        # features) instead of failing the whole batch/shard — the row-level
        # analogue of the reference's failed-page tolerance
        # (load_data.py:231,238); strict=True re-raises (tests).
        self.check_psnr = check_psnr
        self.drop_bytes = drop_bytes
        self.strict = strict
        self.luma_w = np.array([0.299, 0.587, 0.114])

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts = batch["fmt"].to_pylist()
        datas = batch["bytes"].to_pylist()
        nos = batch["img_no"].to_numpy(zero_copy_only=False)
        psnr = np.empty(len(batch), dtype=np.float64)
        ahash = np.empty(len(batch), dtype=np.int64)
        mean_lum = np.empty(len(batch), dtype=np.float64)
        ok = np.ones(len(batch), dtype=bool)
        for i, (fmt, data) in enumerate(zip(fmts, datas)):
            try:
                img = codec.decode(data, fmt)
                # one luma pass feeds both the hash and the feature (a
                # separate ahash64+mean computation cost an extra
                # full-image matmul per row — ~15 % of the decode stage)
                luma = img.astype(np.float64) @ self.luma_w
                ahash[i] = codec.ahash64_from_luma(luma)
                mean_lum[i] = float(luma.mean())
                if self.check_psnr:
                    orig = codec.procedural_image(content_seed(int(nos[i])),
                                                  img.shape[0], img.shape[1])
                    p = codec.psnr(img, orig)
                    psnr[i] = 99.0 if p == float("inf") else p
                else:
                    psnr[i] = np.nan
            except Exception:
                if self.strict:
                    raise
                ok[i] = False
                ahash[i] = 0
                psnr[i] = np.nan
                mean_lum[i] = np.nan
        batch = batch.append_column("psnr", pa.array(
            psnr, mask=~ok if not ok.all() else None))
        batch = batch.append_column("ahash_dec", pa.array(
            ahash, mask=~ok if not ok.all() else None))
        batch = batch.append_column("mean_lum", pa.array(
            mean_lum, mask=~ok if not ok.all() else None))
        batch = batch.append_column("decode_ok", pa.array(ok))
        if self.drop_bytes and "bytes" in batch.column_names:
            batch = batch.drop_columns(["bytes"])
        return batch


class ThumbnailStage:
    """Actor stage: block-mean 16×16 thumbnail re-encoded as PNG into a new
    binary column (the resize/feature-extract plumbing op)."""

    def __init__(self, size: int = 16):
        self.size = size

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for fmt, data in zip(batch["fmt"].to_pylist(),
                             batch["bytes"].to_pylist()):
            img = codec.decode(data, fmt)
            thumb = codec.block_resize(img, self.size, self.size)
            out.append(codec.png_encode(thumb))
        return batch.append_column("thumb_png", pa.array(out, pa.binary()))


class AugmentStage:
    """Actor stage: deterministic training-time augmentations (horizontal
    flip → 90° rotation → 2×2 sum-pool pyramid level) with their exact
    integer invariants computed from the ACTUAL augmented pixels:

    - flip/rotation permute pixels → the int64 channel-sum is preserved,
    - rot90 swaps the output dims to (w, h),
    - 2×2 sum-pooling preserves the total sum exactly (even dims).

    Each invariant is *measured* on the augmented arrays (not assumed), so
    a broken flip/rot/pool kernel flips the corresponding flag; the
    aggregate query's SQL twin pins the per-format counts. Bytes drop
    after decode (payload never travels past the pool)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        sum_ok = np.zeros(n, dtype=bool)
        dims_ok = np.zeros(n, dtype=bool)
        pool_ok = np.zeros(n, dtype=bool)
        for i, (fmt, data) in enumerate(zip(batch["fmt"].to_pylist(),
                                            batch["bytes"].to_pylist())):
            img = codec.decode(data, fmt)
            s0 = int(img.sum(dtype=np.int64))
            aug = np.rot90(img[:, ::-1], 1)
            sum_ok[i] = int(aug.sum(dtype=np.int64)) == s0
            dims_ok[i] = aug.shape[:2] == (img.shape[1], img.shape[0])
            h2, w2 = img.shape[0] // 2, img.shape[1] // 2
            if (img.ndim != 3 or h2 == 0 or w2 == 0
                    or img.shape[0] % 2 or img.shape[1] % 2):
                # odd dims / non-HWC layout: a trimmed pool cannot
                # preserve the total sum — flag instead of raising (one
                # malformed image must not kill the whole pipeline)
                pool_ok[i] = False
            else:
                c = img.shape[2]
                pool = img.astype(np.int64).reshape(h2, 2, w2, 2, c) \
                          .sum(axis=(1, 3))
                pool_ok[i] = int(pool.sum()) == s0
        batch = batch.append_column("aug_sum_ok", pa.array(sum_ok))
        batch = batch.append_column("aug_dims_ok", pa.array(dims_ok))
        batch = batch.append_column("aug_pool_ok", pa.array(pool_ok))
        return batch.drop_columns(["bytes"])


class ImageEmbedStage:
    """Actor stage: decode → 8×8 block-mean luma → L2-normalized 64-d
    embedding (``img_vec`` list<float> column) — the multimodal bridge from
    the binary payload to the ANN/near-dup operators (stages/ann.py).
    Identical pixels ⇒ identical embeddings; near-identical pixels (lossy
    re-encodes, small edits) ⇒ cosine ≈ 1."""

    def __init__(self, size: int = 8, drop_bytes: bool = True):
        self.size = size
        self.drop_bytes = drop_bytes
        self.luma_w = np.array([0.299, 0.587, 0.114])

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = np.empty((len(batch), self.size * self.size),
                        dtype=np.float32)
        for i, (fmt, data) in enumerate(zip(batch["fmt"].to_pylist(),
                                            batch["bytes"].to_pylist())):
            img = codec.decode(data, fmt)
            luma = codec.block_resize(img, self.size, self.size
                                      ).astype(np.float64) @ self.luma_w
            v = luma.ravel()
            v = v - v.mean()
            norm = np.linalg.norm(v) or 1.0
            vecs[i] = (v / norm).astype(np.float32)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.ravel(), pa.float32()), self.size * self.size)
        batch = batch.append_column("img_vec", col)
        if self.drop_bytes and "bytes" in batch.column_names:
            batch = batch.drop_columns(["bytes"])
        return batch


class TranscodeStage:
    """Actor stage: decode each row and RE-ENCODE it as lossless PNG (the
    write path of an image pipeline — normalization to one storage
    format), then decode the re-encoded bytes and require EXACT pixel
    equality (PNG is lossless, so any mismatch is an encoder/decoder
    regression). Emits ``transcode_ok`` plus the re-encoded size; bytes
    are dropped at the stage boundary (the payload never travels on)."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts = batch["fmt"].to_pylist()
        datas = batch["bytes"].to_pylist()
        ok = np.zeros(len(batch), dtype=bool)
        out_bytes = np.zeros(len(batch), dtype=np.int64)
        for i, (fmt, data) in enumerate(zip(fmts, datas)):
            try:
                img = codec.decode(data, fmt)
                enc = codec.png_encode(img)
                rt = codec.png_decode(enc)
                ok[i] = rt.shape == img.shape and bool((rt == img).all())
                out_bytes[i] = len(enc)
            except Exception:
                if self.strict:
                    raise
        keep = [c for c in batch.column_names if c != "bytes"]
        out = batch.select(keep)
        out = out.append_column("transcode_ok", pa.array(ok))
        return out.append_column("png_bytes", pa.array(out_bytes))


RESIZE_MAX_SIDE = 224


class ResizeStage:
    """Actor stage: nearest-neighbor resize to the integer RESIZE plan
    (longest side → RESIZE_MAX_SIDE, aspect preserved by exact integer
    arithmetic: nw = max(1, (w·S)//m), nh = max(1, (h·S)//m) with
    m = max(w, h)) — the thumbnail/preproc step of every vision loader.
    Gates measured on the ACTUAL resized array (the decode-verify trust
    model): output dims equal the plan, and the resized top-left pixel
    equals the source top-left (NN index 0 maps to 0 by construction).
    Bytes drop at the stage boundary."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        dims_ok = np.zeros(n, dtype=bool)
        corner_ok = np.zeros(n, dtype=bool)
        tgt_px = np.zeros(n, dtype=np.int64)
        for i, (fmt, data) in enumerate(zip(batch["fmt"].to_pylist(),
                                            batch["bytes"].to_pylist())):
            img = codec.decode(data, fmt)
            h, w = img.shape[0], img.shape[1]
            m = max(w, h)
            nw = max(1, (w * RESIZE_MAX_SIDE) // m)
            nh = max(1, (h * RESIZE_MAX_SIDE) // m)
            iy = (np.arange(nh) * h) // nh
            ix = (np.arange(nw) * w) // nw
            out = img[iy][:, ix]
            dims_ok[i] = out.shape[:2] == (nh, nw)
            corner_ok[i] = bool((out[0, 0] == img[0, 0]).all())
            tgt_px[i] = nh * nw
        batch = batch.append_column("rz_dims_ok", pa.array(dims_ok))
        batch = batch.append_column("rz_corner_ok", pa.array(corner_ok))
        batch = batch.append_column("rz_px", pa.array(tgt_px))
        return batch.drop_columns(["bytes"])
