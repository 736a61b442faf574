"""Lance source gate.

The input contract (BASELINE.json ``input_hint`` / SURVEY §1.4) names
Lance tables of image+caption pairs; this container ships no ``lance``
wheel (probe recorded per round in NOTES.md), so the engine reads the
Parquet stand-ins through :func:`..sources.parquet.read_table`. This
module pins the SAME source interface for the day a wheel appears:
fragment-parallel scan, column pruning at the read, block sizing by
bytes — so swapping formats is a one-import change for callers.

``read_lance`` raises a clear ImportError (with the Parquet fallback
named) when the wheel is absent; the format-parity test in
tests/test_guards.py is skipif-gated on availability.
"""
from __future__ import annotations

import math
import os

from .parquet import TARGET_BLOCK_BYTES, cluster_cpus

try:                                            # pragma: no cover - env gate
    import lance  # type: ignore  # noqa: F401
    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_lance(sf_dir: str, name: str, columns=None, *,
               min_blocks: int | None = None):
    """Column-pruned, size-aware-block Lance read — the same contract as
    ``parquet.read_table`` (callers never see the format)."""
    if not HAVE_LANCE:
        raise ImportError(
            "no `lance` wheel in this environment (see NOTES.md probe "
            "log); use laji_pygeoapi_ray.sources.parquet.read_table over "
            "the Parquet stand-in tables instead")
    import ray.data

    path = f"{sf_dir}/{name}.lance"
    size = sum(os.path.getsize(os.path.join(dp, f))
               for dp, _, fs in os.walk(path) for f in fs) or 1
    lo = min_blocks if min_blocks is not None else min(8, cluster_cpus())
    blocks = max(lo, math.ceil(size / TARGET_BLOCK_BYTES))
    return ray.data.read_lance(path, columns=columns,
                               override_num_blocks=blocks)
