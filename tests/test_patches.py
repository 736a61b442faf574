"""PatchStage (ViT patchify) semantics on hand-built images."""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from laji_pygeoapi_ray.functions import codec
from laji_pygeoapi_ray.stages.patches import PatchStage


def _batch(imgs):
    return pa.table({
        "fmt": pa.array(["png"] * len(imgs)),
        "bytes": pa.array([codec.png_encode(im) for im in imgs],
                          pa.binary()),
    })


def test_patch_counts_and_conservation():
    rng = np.random.default_rng(7)
    imgs = [rng.integers(0, 256, (32, 32, 3), dtype=np.uint8),
            rng.integers(0, 256, (64, 32, 3), dtype=np.uint8)]
    out = PatchStage(patch=8, strict=True)(_batch(imgs))
    assert out["n_patches"].to_pylist() == [16, 32]
    assert out["conserve_ok"].to_pylist() == [True, True]
    assert "bytes" not in out.column_names
    # exact min/max vs a straightforward reference loop
    im = imgs[0].astype(np.int64)
    ref = [im[y:y + 8, x:x + 8].sum()
           for y in range(0, 32, 8) for x in range(0, 32, 8)]
    assert out["patch_sum_min"][0].as_py() == min(ref)
    assert out["patch_sum_max"][0].as_py() == max(ref)


def test_top_patch_index_row_major_deterministic():
    # all-zero image except one bright patch at grid (row=2, col=1) of a
    # 32x32 / P=8 grid -> row-major index 2*4+1 = 9
    im = np.zeros((32, 32, 3), dtype=np.uint8)
    im[16:24, 8:16] = 200
    out = PatchStage(patch=8, strict=True)(_batch([im]))
    assert out["top_patch_idx"][0].as_py() == 9
    # uniform image: every patch ties -> argmax picks the LOWEST index
    flat = np.full((32, 32, 3), 7, dtype=np.uint8)
    out2 = PatchStage(patch=8, strict=True)(_batch([flat]))
    assert out2["top_patch_idx"][0].as_py() == 0


def test_corrupt_row_degrades_not_raises():
    im = np.zeros((32, 32, 3), dtype=np.uint8)
    t = pa.table({"fmt": pa.array(["png", "png"]),
                  "bytes": pa.array([codec.png_encode(im), b"garbage"],
                                    pa.binary())})
    out = PatchStage(patch=8)(t)
    assert out["conserve_ok"].to_pylist() == [True, False]
    assert out["n_patches"].to_pylist() == [16, None]
