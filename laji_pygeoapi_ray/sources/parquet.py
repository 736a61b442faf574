"""Parquet read helpers: prune columns at the read and size the block count
to the file, not to the CPU count — Ray's default can shatter a 200 KB table
into 64 blocks of ~80 rows, after which every downstream operator pays 64×
task overhead (measured: a 5 000-row groupby at 10 s wall). Blocks are
capped between ``min_blocks`` (keep CPU-bound downstream stages parallel)
and one block per ~8 MiB (keep tasks meaningful)."""
from __future__ import annotations

import math
import os

import ray
import ray.data

TARGET_BLOCK_BYTES = 8 * 1024 * 1024


def cluster_cpus() -> int:
    try:
        return int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        return 8


def read_table(sf_dir: str, name: str, columns=None, *,
               min_blocks: int | None = None) -> "ray.data.Dataset":
    path = f"{sf_dir}/{name}.parquet"
    size = os.path.getsize(path)
    lo = min_blocks if min_blocks is not None else min(8, cluster_cpus())
    blocks = max(lo, math.ceil(size / TARGET_BLOCK_BYTES))
    return ray.data.read_parquet(path, columns=columns,
                                 override_num_blocks=blocks)


def default_pool(frac: float = 1.0) -> tuple[int, int]:
    """Actor-pool sizing: (1, frac × (CPUs − 2)) — min 1 so that on small
    clusters two coexisting pools can never pin every CPU (pinned actor
    pools + starved read/write tasks deadlock the pipeline; measured on the
    4-CPU test session), max leaves headroom for the read/write stages."""
    cpus = cluster_cpus()
    return (1, max(2, int((cpus - 2) * frac)))


def fixed_pool(frac: float = 1.0) -> int:
    """FIXED actor-pool size: frac × (CPUs − 2), min 2. Prefer this over the
    autoscaling ``default_pool`` for short compute-bound stages — measured
    on the image decode stage at sf0.1/32 CPUs, the (1, 30) autoscaling
    pool ramps too slowly and costs ~2× wall time vs 30 pre-started
    actors (4.6 s → 2.4 s with batch_size 512)."""
    return max(2, int((cluster_cpus() - 2) * frac))


def build_cell_index(data_dir: str, cell_col: str = "cell7") -> dict:
    """``update_indexes`` analogue (``edit_db.py:298-331`` builds PostGIS
    GIST indexes after each load): because the maintenance pass writes the
    sink tile-SORTED, each Parquet file covers a narrow ``cell`` range —
    this records (min, max) per file from row-group STATISTICS (no data
    scan) into ``_cell_index.json``, giving file-level spatial pruning on
    top of hive partition pruning."""
    import glob as _glob
    import json
    import os

    import pyarrow.parquet as pq

    index = {}
    for f in sorted(_glob.glob(os.path.join(data_dir, "**", "*.parquet"),
                               recursive=True)):
        md = pq.read_metadata(f)
        names = md.schema.to_arrow_schema().names
        if cell_col not in names:
            continue
        ci = names.index(cell_col)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            s = md.row_group(rg).column(ci).statistics
            if s is None:
                lo = None
                break
            lo = s.min if lo is None else min(lo, s.min)
            hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            index[os.path.relpath(f, data_dir)] = [int(lo), int(hi)]
    out = {"cell_col": cell_col, "files": index}
    path = os.path.join(data_dir, "_cell_index.json")
    # unique tmp: concurrent rebuilds over the same layout write identical
    # deterministic content, but a SHARED tmp name lets one writer rename
    # the other's half-written file away (loser crashes on the replace)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    os.replace(tmp, path)
    return out


def read_cell_pruned(data_dir: str, cells: "set[int] | list[int]",
                     **read_kwargs):
    """Read ONLY the files whose recorded cell range intersects ``cells``
    (requires :func:`build_cell_index` to have run; falls back to the full
    directory without one). Composes with the in-batch exact cell filter —
    this layer just keeps irrelevant files on disk."""
    import json
    import os

    import ray.data

    idx_path = os.path.join(data_dir, "_cell_index.json")
    if not os.path.exists(idx_path):
        return ray.data.read_parquet(data_dir, **read_kwargs)
    with open(idx_path) as fh:
        idx = json.load(fh)
    want = sorted(cells)
    import numpy as np
    w = np.asarray(want, dtype=np.int64)
    keep = []
    for rel, (lo, hi) in sorted(idx["files"].items()):
        pos = np.searchsorted(w, lo)
        if pos < len(w) and w[pos] <= hi:
            keep.append(os.path.join(data_dir, rel))
    if not keep:
        # empty selection: read zero rows via an impossible filter on one
        # file to preserve the schema
        first = os.path.join(data_dir, sorted(idx["files"])[0])
        import pyarrow.dataset as pads
        return ray.data.read_parquet(
            first, filter=pads.field(idx["cell_col"]) < -1, **read_kwargs)
    return ray.data.read_parquet(keep, **read_kwargs)
