"""Parquet spill-checkpoint — the scale-safe way to feed TWO consumers
from one expensive lineage.

``ds.materialize()`` pins every block in the Ray object store; at the
target scale (10^12-image corpora — embeddings alone ~0.5 PB) that is an
object-store/spill storm before the second consumer even starts. Writing
the intermediate ONCE to partitioned Parquet and reading it twice costs
one extra round-trip through storage but:

- the write streams with backpressure (no full-pipeline pinning),
- each consumer's read is column-pruned to what IT needs,
- the checkpoint doubles as a resume point within the producing process
  (the files exist on disk until process exit — a failed downstream can
  re-read without re-running the producer),
- the object store stays free for the shuffles that actually need it.

Use ``materialize()`` only for SMALL intermediates (aggregates, edge
lists, boundary tables); use ``spill_checkpoint`` whenever the
intermediate is proportional to the input.

MULTI-NODE: the default root is node-local ``/tmp`` — correct only when
driver and workers share a filesystem (this sandbox; single-node). On a
real cluster ``LAJI_RAY_SPILL_DIR`` MUST point at shared storage
(NFS / object store mount), or remote write tasks' files are invisible
to the driver-side re-read; ``spill_checkpoint`` refuses to run
node-local on a multi-node cluster rather than silently dropping rows.

LIFECYCLE: each checkpoint directory is removed at process exit
(``atexit``, best-effort) — consumers are lazy Datasets but are consumed
within the producing process. A time-based sweep additionally clears
directories older than 6 h left behind by killed processes.
"""
from __future__ import annotations

import atexit
import os
import shutil
import time
import uuid


SPILL_ROOT = os.environ.get("LAJI_RAY_SPILL_DIR", "/tmp/laji_ray_spill")

_STALE_AFTER_S = 6 * 3600
_DEAD_GRACE_S = 60
_swept = False
_live_by_tag: dict[str, str] = {}   # this process's newest dir per tag


def _cleanup(path: str) -> None:
    shutil.rmtree(path, ignore_errors=True)


def _owner_pid(dirname: str) -> int | None:
    """Spill dirs are named ``{tag}-{pid}-{uuid}``; return the embedded
    owner pid, or None for unparseable (legacy) names."""
    parts = dirname.rsplit("-", 2)
    if len(parts) == 3 and parts[1].isdigit():
        return int(parts[1])
    return None


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True                 # exists, owned by someone else


def _sweep_stale() -> None:
    """Best-effort removal of leftover spill dirs. A dir whose OWNER
    process (pid embedded in the name) is still alive is never touched —
    age alone must not reap a >6 h-running producer's checkpoint out
    from under it. Owner-dead dirs go after a short grace (to dodge a
    just-created-dir race); unparseable legacy names keep the 6 h age
    rule. Single-node semantics: pids are only meaningful on the node
    that owns SPILL_ROOT, which is exactly the default-/tmp case this
    sweep exists for (a shared LAJI_RAY_SPILL_DIR on a real cluster is
    operator-managed storage; the sweep still only removes clearly-dead
    or ancient dirs)."""
    global _swept
    _swept = True
    try:
        now = time.time()
        for ent in os.scandir(SPILL_ROOT):
            try:
                if not ent.is_dir():
                    continue
                age = now - ent.stat().st_mtime
                pid = _owner_pid(ent.name)
                if pid is not None and _pid_alive(pid):
                    continue        # owner still running: never reap
                stale = (age > _DEAD_GRACE_S if pid is not None
                         else age > _STALE_AFTER_S)
                if stale:
                    shutil.rmtree(ent.path, ignore_errors=True)
            except OSError:
                pass
    except OSError:
        pass


def _require_shared_root() -> None:
    """Refuse a node-local default root on a multi-node cluster: the
    driver-side re-read would silently see only driver-local files."""
    if os.environ.get("LAJI_RAY_SPILL_DIR"):
        return                      # user-provided root: trusted shared
    try:
        import ray
        if not ray.is_initialized():
            return
        alive = [n for n in ray.nodes() if n.get("Alive")]
    except Exception:
        return
    if len(alive) > 1:
        raise RuntimeError(
            "spill_checkpoint: default spill root is node-local /tmp but "
            "the cluster has multiple nodes — set LAJI_RAY_SPILL_DIR to "
            "a shared filesystem path visible to every node.")


def spill_checkpoint(ds, tag: str, *, columns: list[str] | None = None,
                     schema=None):
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

    EMPTY producers: Ray's parquet sink skips empty blocks — an empty
    intermediate writes ZERO files, every column-pruned re-read crashes
    with a KeyError, and the schema is unrecoverable after the fact
    (``Dataset.schema()`` of an executed-empty lineage returns None;
    empty blocks never reach a pass-through UDF either). Pass
    ``schema`` (a ``pa.Schema`` — producers of empty-able intermediates
    know theirs statically) and a zero-row sentinel file keeps the
    re-read typed; otherwise a free metadata probe
    (``schema(fetch_if_missing=False)``) is tried, and if the spill
    still ends up empty-and-untyped, ``read`` raises a clear error
    instead of the former KeyError."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    _require_shared_root()
    if not _swept:
        _sweep_stale()
    path = os.path.join(
        SPILL_ROOT, f"{tag}-{os.getpid()}-{uuid.uuid4().hex[:12]}")
    os.makedirs(path, exist_ok=True)
    atexit.register(_cleanup, path)
    # in-process reclamation for LONG-LIVED processes (a serving loop
    # answering the same query repeatedly): re-spilling a tag supersedes
    # the previous checkpoint — its readers were consumed within that
    # invocation — so drop the old dir now instead of accumulating one
    # corpus-proportional copy per request until process exit
    prev = _live_by_tag.get(tag)
    if prev is not None:
        shutil.rmtree(prev, ignore_errors=True)
    _live_by_tag[tag] = path
    if columns:
        ds = ds.select_columns(columns)
        if schema is not None:
            schema = pa.schema([schema.field(c) for c in columns])
    if schema is None:
        try:                        # metadata-only probe: no execution
            s = ds.schema(fetch_if_missing=False)
            if s is not None and s.names and all(
                    isinstance(t, pa.DataType) for t in s.types):
                schema = pa.schema(list(zip(s.names, s.types)))
        except Exception:
            schema = None
    ds.write_parquet(path)
    if not any(os.scandir(path)) and schema is not None:
        pq.write_table(schema.empty_table(),
                       os.path.join(path, "empty.parquet"))

    def read(columns: list[str] | None = None, filter=None):
        if not any(os.scandir(path)):
            raise RuntimeError(
                f"spill_checkpoint({tag!r}): producer was empty and its "
                "schema is not statically known — pass schema= so the "
                "re-read stays typed")
        kw = {}
        if columns is not None:
            kw["columns"] = columns
        if filter is not None:
            kw["filter"] = filter
        return rd.read_parquet(path, **kw)

    return read
