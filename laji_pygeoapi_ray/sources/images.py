"""The primary input table: image + caption pairs, per BASELINE.json
``input_hint`` — columns exactly
``(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64)``.

The design target is a Lance table; the container ships no ``lance``
package, so the physical stand-in is Parquet with the same schema (each
file ≙ a Lance fragment: both are columnar, fragment-parallel reads —
``ray.data.read_parquet`` maps 1:1 onto ``read_lance``).

Synthesis is fully deterministic (no external data): procedural pixels
keyed by the image number, encoded as real PNG (lossless) or ``qz6``
(deterministic lossy, PSNR ≈ 44-46 dB — functions/codec.py); captions carry
Finnish diacritics and the ids carry ``#`` to exercise the reference's
``#``↔``_`` local-id encoding (``compute_variables.py:240``,
``lajiapi_provider.py:147``). Every 50th image (n ≡ 17 mod 50, n ≥ 50)
duplicates the pixels of image n−50 → same ``phash``, different id: the
planted near-dup pairs for phash dedup (FIXTURES.md F1/F5).

Generation runs THROUGH Ray Data (``ray.data.range → map_batches →
write_parquet``) so the bench corpus is built in parallel and written
sharded; a done-marker makes it idempotent.
"""
from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa
import ray.data

from ..functions import codec

ID_RE = re.compile(r"IMG\.(\d+)#")
DIMS = [(32, 32), (64, 64), (128, 128), (64, 32)]   # (h, w) variants
DUP_MOD, DUP_OFF = 50, 17

IMAGE_SCHEMA = pa.schema([
    ("image_id", pa.string()),
    ("bytes", pa.binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("fmt", pa.string()),
    ("caption", pa.string()),
    ("phash", pa.int64()),
])


CONTENT_VERSION = 3  # bump to invalidate cached /tmp corpora


def content_seed(n: int) -> int:
    """Pixel-content seed: planted-dup rows (n ≡ 17 mod 50) collapse
    recursively to the family root, so every member shares the SAME pixels
    (v1 chained n→n−50 without collapsing, which made only the first pair
    actual duplicates — fixed, CONTENT_VERSION bumped)."""
    while n >= DUP_MOD and n % DUP_MOD == DUP_OFF:
        n -= DUP_MOD
    return n


def image_row(n: int) -> dict:
    s = content_seed(n)
    h, w = DIMS[s % len(DIMS)]
    img = codec.procedural_image(s, h, w)
    fmt = "png" if s % 3 == 0 else "qz6"
    enc = codec.CODECS[fmt][0]
    return {
        "image_id": f"http://tun.fi/IMG.{n}#{n % 7}",
        "bytes": enc(img),
        "w": np.int32(w),
        "h": np.int32(h),
        "fmt": fmt,
        "caption": f"Havainto {n}: metsässä nähty yksilö lähellä jokea (erä {n % 7})",
        "phash": codec.ahash64(img),
    }


def build_batch(batch: pa.Table) -> pa.Table:
    """map_batches kernel: a block of image numbers → image rows."""
    rows = [image_row(int(n)) for n in batch["id"].to_pylist()]
    return pa.Table.from_pylist(rows, schema=IMAGE_SCHEMA)


def images_table(n_images: int) -> pa.Table:
    """Driver-side (small n) synthesis — unit tests."""
    return pa.Table.from_pylist([image_row(n) for n in range(n_images)],
                                schema=IMAGE_SCHEMA)


def materialize_images(n_images: int, base_dir: str = "/tmp/laji_ray_images",
                       *, shards: int = 16) -> str:
    """Generate the image table through Ray Data and write it sharded; the
    done-marker makes repeated calls no-ops (resume-friendly), and
    concurrent first-callers (e.g. a test session and a bench run on a
    fresh box) each build into their own tmp dir and race for ONE atomic
    rename — the old shared ``.tmp`` + ``os.replace`` here crashed the
    loser with ENOTEMPTY and could interleave two writers' shard files
    into a doubled corpus under a valid marker."""
    from ..state.spill import claim_layout

    out = os.path.join(base_dir, f"n{n_images}v{CONTENT_VERSION}")

    def build(tmp: str) -> None:
        ds = ray.data.range(n_images, override_num_blocks=max(shards, 1))
        ds = ds.map_batches(build_batch, batch_format="pyarrow",
                            batch_size=512)
        # one file per shard (write_parquet would otherwise coalesce small
        # datasets into a single file, defeating fragment-parallel reads
        # and the ETL's file-group sharding)
        ds.repartition(max(shards, 1)).write_parquet(
            tmp, min_rows_per_file=max(1, n_images // max(shards, 1)))

    return claim_layout(out, build, marker_text=str(n_images))


def read_images(path: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(path)


def parse_image_no(batch: pa.Table) -> pa.Table:
    """Extract the integer image number from image_id (the reference parses
    its unitId the same way; vectorized regex)."""
    import pyarrow.compute as pc
    m = pc.extract_regex(batch["image_id"], r"IMG\.(?P<no>\d+)#")
    no = pc.cast(pc.struct_field(m, "no"), pa.int64())
    return batch.append_column("img_no", no)


def local_id(batch: pa.Table) -> pa.Table:
    """``Paikallinen_tunniste`` = image_id with '#'→'_'
    (``compute_variables.py:240``; inverse decode at
    ``lajiapi_provider.py:147``)."""
    import pyarrow.compute as pc
    return batch.append_column(
        "local_id", pc.replace_substring(batch["image_id"], "#", "_"))
