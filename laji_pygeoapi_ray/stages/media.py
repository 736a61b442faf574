"""Video / audio actor-pool stages — the remaining multimodal plumbing the
brief demands (decode / feature-extract / resize / frame-sample over opaque
``binary`` columns with typed metadata).

No video/audio libraries exist in this container, so the CODECS are
deterministic fakes (clearly marked): ``vraw`` packs H×W×3 uint8 frames
behind a 16-byte header; ``araw`` packs int16 PCM behind an 8-byte header.
Everything Ray-side — schema, actor signature, small batches for wide
binary rows, drop-payload-after-decode, per-row degrade-don't-die — is
real and tested, so swapping in a real decoder is a one-function change.
"""
from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

VIDEO_MAGIC = b"VRAW"
AUDIO_MAGIC = b"ARAW"


# ------------------------------------------------ deterministic fake codecs

def vraw_encode(frames: np.ndarray) -> bytes:
    """(n, h, w, 3) uint8 → bytes. DETERMINISTIC FAKE video container."""
    n, h, w, c = frames.shape
    assert c == 3
    return (VIDEO_MAGIC + struct.pack("<III", n, h, w)
            + frames.astype(np.uint8).tobytes())

def vraw_decode(buf: bytes) -> np.ndarray:
    if buf[:4] != VIDEO_MAGIC:
        raise ValueError("not a vraw stream")
    n, h, w = struct.unpack_from("<III", buf, 4)
    return np.frombuffer(buf, np.uint8, n * h * w * 3, 16).reshape(n, h, w, 3)

def synth_video(key: int, n_frames: int = 8, h: int = 16,
                w: int = 16) -> bytes:
    """Deterministic procedural clip: each frame is a phase-shifted
    gradient keyed by (key, frame)."""
    t = np.arange(n_frames)[:, None, None, None]
    yy = np.arange(h)[None, :, None, None]
    xx = np.arange(w)[None, None, :, None]
    ch = np.arange(3)[None, None, None, :]
    img = (key * 37 + t * 11 + yy * 5 + xx * 3 + ch * 29) % 256
    return vraw_encode(img.astype(np.uint8))

def araw_encode(pcm: np.ndarray, rate: int = 16000) -> bytes:
    return AUDIO_MAGIC + struct.pack("<I", rate) + \
        pcm.astype("<i2").tobytes()

def araw_decode(buf: bytes) -> tuple[np.ndarray, int]:
    if buf[:4] != AUDIO_MAGIC:
        raise ValueError("not an araw stream")
    (rate,) = struct.unpack_from("<I", buf, 4)
    return np.frombuffer(buf, "<i2", offset=8).astype(np.float64), rate

def synth_audio(key: int, n: int = 4096, rate: int = 16000) -> bytes:
    """Deterministic sine mix keyed by the record id."""
    t = np.arange(n, dtype=np.float64) / rate
    f = 220.0 + (key % 32) * 55.0
    sig = (np.sin(2 * np.pi * f * t)
           + 0.5 * np.sin(2 * np.pi * 2 * f * t + key))
    return araw_encode(np.clip(sig * 12000, -32768, 32767), rate)


# --------------------------------------------------------- actor-pool stages

class FrameSampleStage:
    """Actor stage: sample every ``stride``-th frame of each clip and emit
    ONE ROW PER SAMPLED FRAME (video_id, frame_idx, frame_mean, frame_png-
    style features) — the frame-sample explode of a video training
    pipeline. Wide binary rows ⇒ run with small ``batch_size``; payload is
    dropped after decode."""

    def __init__(self, stride: int = 2, strict: bool = False):
        self.stride = stride
        self.strict = strict
        self.luma_w = np.array([0.299, 0.587, 0.114])

    # integer luma weights (ITU-R 601 ×1000): keeps the per-frame luma SUM
    # exact in int64, so it has a bit-stable SQL twin
    LUMA_INT = np.array([299, 587, 114], dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids, idxs, means, hashes, lsums = [], [], [], [], []
        for vid, data in zip(batch["video_id"].to_pylist(),
                             batch["bytes"].to_pylist()):
            try:
                frames = vraw_decode(data)
            except Exception:
                if self.strict:
                    raise
                continue  # degrade-don't-die: skip the corrupt clip
            sel = np.arange(0, len(frames), self.stride)
            fint = frames[sel].astype(np.int64)
            lsum = (fint @ self.LUMA_INT).sum(axis=(1, 2))
            luma = frames[sel].astype(np.float64) @ self.luma_w
            m = luma.mean(axis=(1, 2))
            bits = (luma > m[:, None, None])
            # 64-bit frame hash from an 8x8 block-mean of the bit plane
            h, w = luma.shape[1:]
            bh = bits.reshape(len(sel), 8, h // 8, 8, w // 8).mean((2, 4)) > .5
            weights = (1 << np.arange(64, dtype=np.uint64))
            fh = (bh.reshape(len(sel), 64) @ weights).astype(np.int64)
            vids.extend([vid] * len(sel))
            idxs.append(sel)
            means.append(m)
            hashes.append(fh)
            lsums.append(lsum)
        if not idxs:
            return pa.table({"video_id": pa.array([], pa.int64()),
                             "frame_idx": pa.array([], pa.int64()),
                             "frame_mean": pa.array([], pa.float64()),
                             "frame_hash": pa.array([], pa.int64()),
                             "frame_lumasum": pa.array([], pa.int64())})
        return pa.table({
            "video_id": pa.array(vids, pa.int64()),
            "frame_idx": np.concatenate(idxs),
            "frame_mean": np.concatenate(means),
            "frame_hash": np.concatenate(hashes),
            "frame_lumasum": np.concatenate(lsums),
        })


class AudioFeatureStage:
    """Actor stage: decode PCM → (rms, zero_crossing_rate, dominant-band
    energy ratio) per clip — the audio feature-extract plumbing."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        rms = np.full(n, np.nan)
        zcr = np.full(n, np.nan)
        ok = np.zeros(n, dtype=bool)
        for i, data in enumerate(batch["bytes"].to_pylist()):
            try:
                pcm, rate = araw_decode(data)
            except Exception:
                if self.strict:
                    raise
                continue
            ok[i] = True
            rms[i] = float(np.sqrt(np.mean(pcm * pcm)))
            zcr[i] = float(np.mean(np.signbit(pcm[1:]) !=
                                   np.signbit(pcm[:-1])))
        batch = batch.drop_columns(["bytes"])
        batch = batch.append_column("rms", pa.array(rms, mask=~ok))
        batch = batch.append_column("zcr", pa.array(zcr, mask=~ok))
        return batch.append_column("decode_ok", pa.array(ok))
