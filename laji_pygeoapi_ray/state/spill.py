"""Parquet spill-checkpoint — the scale-safe way to feed TWO consumers
from one expensive lineage.

``ds.materialize()`` pins every block in the Ray object store; at the
target scale (10^12-image corpora — embeddings alone ~0.5 PB) that is an
object-store/spill storm before the second consumer even starts. Writing
the intermediate ONCE to partitioned Parquet and reading it twice costs
one extra round-trip through storage but:

- the write streams with backpressure (no full-pipeline pinning),
- each consumer's read is column-pruned to what IT needs,
- the checkpoint doubles as a resume point (partitioned files — a failed
  downstream can re-read without re-running the producer),
- the object store stays free for the shuffles that actually need it.

Use ``materialize()`` only for SMALL intermediates (aggregates, edge
lists, boundary tables); use ``spill_checkpoint`` whenever the
intermediate is proportional to the input.
"""
from __future__ import annotations

import os
import uuid


SPILL_ROOT = os.environ.get("LAJI_RAY_SPILL_DIR", "/tmp/laji_ray_spill")


def spill_checkpoint(ds, tag: str, *, columns: list[str] | None = None):
    """Write ``ds`` once to partitioned Parquet under a fresh directory
    and return a function ``read(columns=None, filter=None) -> Dataset``
    so each consumer re-reads exactly the columns it needs — and, with a
    pyarrow dataset ``filter`` expression on a physical column, only the
    row groups whose statistics intersect it (how a persisted index,
    e.g. the STR R-tree leaf layout, serves selective queries without
    scanning the whole spill; hive ``partition_cols`` is deliberately
    NOT used — its read-back retypes partition keys as strings). The
    producer lineage executes exactly once (certified by
    tests/test_round4f_kernels.py::test_spill_checkpoint_single_execution).
    """
    import ray.data as rd

    path = os.path.join(SPILL_ROOT, f"{tag}-{uuid.uuid4().hex[:12]}")
    os.makedirs(path, exist_ok=True)
    if columns:
        ds = ds.select_columns(columns)
    ds.write_parquet(path)

    def read(columns: list[str] | None = None, filter=None):
        kw = {}
        if columns is not None:
            kw["columns"] = columns
        if filter is not None:
            kw["filter"] = filter
        return rd.read_parquet(path, **kw)

    return read
