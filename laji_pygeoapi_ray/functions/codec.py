"""Image codecs + pixel kernels (pure numpy + stdlib zlib — the container
ships no PIL/cv2, so the codec layer is self-contained):

- ``png`` — a REAL (minimal) PNG codec: 8-bit RGB, filter 0, zlib IDAT.
  Lossless; decoded pixels are exactly the source array.
- ``qz6`` — the engine's deterministic LOSSY format (the JPEG stand-in per
  the brief's "stub the decode step behind a deterministic fake"): 6-bit
  per-channel quantization + zlib. Reconstruction replicates the top bits
  (q<<2 | q>>4), giving PSNR ≈ 44-46 dB on the procedural corpus — above
  the north-rule's ≥ 40 dB invariant, so the PSNR gate is exercised for
  real (5-bit quantization lands at ~38 dB and FAILS it; measured).

Also: PSNR, average-hash (the ``phash`` column), block-mean resize, and the
procedural image generator used by the synthetic input table.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def png_encode(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → PNG bytes (color type 2, bit depth 8, filter 0)."""
    h, w, _ = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    rows = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    rows[:, 1:] = img.reshape(h, w * 3)
    return (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(rows.tobytes(), 6))
            + _chunk(b"IEND", b""))


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8. Supports what the encoder emits
    (RGB8, filter 0) — other filter types raise."""
    assert data[:8] == PNG_SIG, "not a PNG"
    pos, idat, w, h = 8, [], 0, 0
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 2:
                raise NotImplementedError("only RGB8 PNGs supported")
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    rows = raw.reshape(h, 1 + w * 3)
    if (rows[:, 0] != 0).any():
        raise NotImplementedError("only filter type 0 supported")
    return rows[:, 1:].reshape(h, w, 3).copy()


def qz6_encode(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → lossy 'qz6' bytes: 6-bit quantization + zlib,
    with a tiny header carrying the shape."""
    h, w, _ = img.shape
    q = (img >> 2).astype(np.uint8)
    return struct.pack(">II", w, h) + zlib.compress(q.tobytes(), 6)


def qz6_decode(data: bytes) -> np.ndarray:
    w, h = struct.unpack(">II", data[:8])
    q = np.frombuffer(zlib.decompress(data[8:]), dtype=np.uint8)
    q = q.reshape(h, w, 3)
    return ((q << 2) | (q >> 4)).astype(np.uint8)


CODECS = {
    "png": (png_encode, png_decode, True),    # (encode, decode, lossless)
    "qz6": (qz6_encode, qz6_decode, False),
}


def decode(data: bytes, fmt: str) -> np.ndarray:
    return CODECS[fmt][1](data)


def decode_any(data: bytes) -> np.ndarray:
    """Decode by container sniff (PNG signature => png, else qz6)."""
    return png_decode(data) if data[:8] == PNG_SIG else qz6_decode(data)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images)."""
    # exact integer SSE (uint8 inputs) — same mse up to float-summation
    # ulps, ~3x cheaper than the float64-temporaries path; every consumer
    # is a >=40dB / ==inf gate with wide margin
    d = a.astype(np.int32) - b.astype(np.int32)
    sse = int((d * d).sum(dtype=np.int64))
    if sse == 0:
        return float("inf")
    mse = sse / a.size
    return float(20.0 * np.log10(255.0) - 10.0 * np.log10(mse))


def block_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Block-mean downsample; h/w must be integer multiples of the target."""
    h, w, c = img.shape
    fh, fw = h // out_h, w // out_w
    return (img[:out_h * fh, :out_w * fw]
            .reshape(out_h, fh, out_w, fw, c)
            .mean(axis=(1, 3)).astype(np.uint8))


def ahash64_from_luma(luma: np.ndarray) -> np.int64:
    """Average hash from a precomputed luma plane (see :func:`ahash64`)."""
    h, w = luma.shape
    blocks = luma.reshape(8, h // 8, 8, w // 8).mean(axis=(1, 3))
    bits = (blocks > blocks.mean()).ravel()
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    return (bits.astype(np.uint64) * weights).sum(dtype=np.uint64).astype(np.int64)


def ahash64(img: np.ndarray) -> np.int64:
    """Average hash: 8×8 block-mean luma vs its mean → 64-bit signature
    (the table's ``phash`` column; exact equality ⇒ duplicate pixels)."""
    return ahash64_from_luma(img.astype(np.float64)
                             @ np.array([0.299, 0.587, 0.114]))


_GRID_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray, np.ndarray]] = {}


def _grids(h: int, w: int):
    """Cached coordinate vectors + the (xx+yy)/(h+w) plane for (h, w)."""
    key = (h, w)
    if key not in _GRID_CACHE:
        ys = np.arange(h, dtype=np.float64)
        xs = np.arange(w, dtype=np.float64)
        plane = (xs[None, :] + ys[:, None]) / (h + w)
        _GRID_CACHE[key] = (ys, xs, plane)
    return _GRID_CACHE[key]


def _block_pattern(seed: int, h: int, w: int) -> np.ndarray:
    """Deterministic per-seed 8×8 block-offset pattern (±30 luma), upsampled
    to (h, w). Smooth sine gradients alone gave only a few thousand distinct
    8×8 average-hash bit patterns — at 20k images, 84 % of rows collided on
    phash; this term makes block means effectively random per seed, so
    accidental collisions vanish while planted same-seed duplicates still
    hash identically."""
    idx = np.arange(64, dtype=np.uint64)
    x = (np.uint64(seed) * np.uint64(2654435761)
         + idx * np.uint64(0x9E3779B97F4A7C15))
    # splitmix-style avalanche: a LINEAR seed+idx mix cancels out under the
    # hash's mean-thresholding (the seed term is common to all 64 cells) —
    # measured 14 % ahash collisions at 20k seeds without it
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(29)
    block = (x % np.uint64(61)).astype(np.float64).reshape(8, 8) - 30.0
    # pure replication — bit-identical to np.kron(block, ones) and ~4x faster
    return block.repeat(h // 8, axis=0).repeat(w // 8, axis=1)


def procedural_image(seed: int, h: int, w: int) -> np.ndarray:
    """Deterministic procedural RGB image: per-channel phase-shifted sine
    gradients (separable: trig is O(h+w)) + a per-seed block-offset pattern
    keyed by ``seed``."""
    ys, xs, plane = _grids(h, w)
    s = np.float64((seed * 2654435761) % 4294967296) / 4294967296.0
    blocks = _block_pattern(seed, h, w)
    img = np.empty((h, w, 3), dtype=np.uint8)
    for c in range(3):
        f = 0.03 + 0.1 * ((s * (c + 2)) % 1.0)
        phase = 6.28318 * ((s * (c + 7)) % 1.0)
        sin_row = np.sin(xs * f + phase)            # (w,)
        cos_col = np.cos(ys * f * 1.3 + phase * 0.5)  # (h,)
        # in-place op chain — identical float64 op order to the original
        # ((sin+cos) + plane + 2.0) / 4.0 * 255.0 + blocks expression,
        # with one (h, w) temporary instead of six
        wave = np.add.outer(cos_col, sin_row)       # = sin[None]+cos[:,None]
        wave += plane
        wave += 2.0
        wave /= 4.0
        wave *= 255.0
        wave += blocks
        np.clip(wave, 0, 255, out=wave)
        img[:, :, c] = wave.astype(np.uint8)
    return img
