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


def read_lance(sf_dir: str, name: str, columns=None, *,
               min_blocks: int | None = None):
    """Column-pruned, size-aware-block Lance read over the testdata layout
    — the exact ``parquet.read_table(sf_dir, name, columns)`` signature,
    so a call site swaps formats by changing one import. Raises a clear
    ImportError naming the Parquet fallback while the container ships no
    wheel (probe log in NOTES.md); the parity test in
    tests/test_guards.py auto-activates when one appears."""
    if not HAVE_LANCE:
        raise ImportError(
            "no `lance` wheel in this environment (see NOTES.md probe "
            "log); use laji_pygeoapi_ray.sources.parquet.read_table over "
            "the Parquet stand-in tables instead")
    import math
    import os

    from .parquet import TARGET_BLOCK_BYTES, cluster_cpus

    path = f"{sf_dir}/{name}.lance"
    size = sum(os.path.getsize(os.path.join(dp, f))
               for dp, _, fs in os.walk(path) for f in fs) or 1
    lo = min_blocks if min_blocks is not None else min(8, cluster_cpus())
    blocks = max(lo, math.ceil(size / TARGET_BLOCK_BYTES))
    return ray.data.read_lance(path, columns=columns,
                               override_num_blocks=blocks)
