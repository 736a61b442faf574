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
import threading
import time
import uuid


SPILL_ROOT = os.environ.get("LAJI_RAY_SPILL_DIR", "/tmp/laji_ray_spill")

_STALE_AFTER_S = 6 * 3600
_DEAD_GRACE_S = 60
_swept = False
# this process's newest dir per (thread, tag): keyed by thread so a
# concurrent request on another thread re-spilling the SAME tag never
# reaps a checkpoint whose consumers are still mid-flight
_live_by_tag: dict[tuple[int, str], str] = {}


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


def _reap_ok(pid: int | None, age: float) -> bool:
    """Shared reap policy for leftover scratch dirs (spill checkpoints
    and STR-index tmp builds). Pid liveness is only evidence on the
    node-local DEFAULT root — on a user-provided ``LAJI_RAY_SPILL_DIR``
    (shared storage) the owner may live on ANOTHER node / pid namespace,
    where ``os.kill(pid, 0)`` raising says nothing, so a dead-looking
    pid must NOT shortcut the grace period (it would reap a live remote
    driver's checkpoint 60 s after creation). Policy: local root +
    dead owner → short grace; everything else → the conservative 6 h
    age rule, and a locally-ALIVE owner pid is never reaped."""
    if pid is not None and _pid_alive(pid):
        return False                # owner (or a pid twin) running here
    if pid is not None and "LAJI_RAY_SPILL_DIR" not in os.environ:
        return age > _DEAD_GRACE_S  # local root: pid evidence is real
    return age > _STALE_AFTER_S


def _sweep_stale() -> None:
    """Best-effort removal of leftover spill dirs. ONLY directories
    matching this module's ``{tag}-{pid}-{uuid}`` naming are candidates
    — anything else under the root (e.g. the persistent STR-index tree
    when LAJI_RAY_SPILL_DIR nests it inside) is a foreign artifact the
    sweep must never touch. Reaping follows ``_reap_ok``: a dir whose
    owner pid is alive is never removed; owner-dead dirs go after a
    short grace on the node-local default root (where pids are
    meaningful), and only after the 6 h age bound on a shared root
    (where a dead-looking pid may be a live remote driver)."""
    global _swept
    _swept = True
    try:
        now = time.time()
        for ent in os.scandir(SPILL_ROOT):
            try:
                if not ent.is_dir():
                    continue
                pid = _owner_pid(ent.name)
                if pid is None:
                    continue        # not a spill dir: never touch
                if _reap_ok(pid, now - ent.stat().st_mtime):
                    shutil.rmtree(ent.path, ignore_errors=True)
            except OSError:
                pass
    except OSError:
        pass


def write_empty_sentinel(path: str, schema) -> None:
    """Ray's parquet sink skips empty blocks, so an empty producer
    writes ZERO files and any column-pruned re-read crashes untyped.
    Drop a zero-row file carrying the statically-known schema so the
    directory re-reads typed — the single implementation of the
    empty-spill contract (spill checkpoints and the persisted STR index
    both use it)."""
    import pyarrow.parquet as pq

    pq.write_table(schema.empty_table(),
                   os.path.join(path, "empty.parquet"))


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


def reap_stale_tmp(root: str) -> None:
    """Best-effort removal of ``*.tmp.{pid}.{uuid}`` leftovers under a
    layout root (crashed builders leak corpus-sized partial builds there;
    the spill sweep never scans foreign roots). Same conservative policy
    as the spill sweep: a locally-alive owner is never reaped; dead-owner
    dirs go after a short grace on the node-local default root, 6 h age
    otherwise."""
    try:
        now = time.time()
        for ent in os.scandir(root):
            try:
                if not ent.is_dir() or ".tmp." not in ent.name:
                    continue
                pid_s = ent.name.split(".tmp.", 1)[1].split(".", 1)[0]
                pid = int(pid_s) if pid_s.isdigit() else None
                if pid != os.getpid() and _reap_ok(
                        pid, now - ent.stat().st_mtime):
                    shutil.rmtree(ent.path, ignore_errors=True)
            except OSError:
                pass
    except OSError:
        pass


# rename-contention backoff before a marker-less `out` is declared a
# stale partial from a crashed build (module-level so tests can shrink it)
_CLAIM_BACKOFF = (0.0, 0.5, 1.0, 2.0, 4.0, 8.0)


def claim_layout(out: str, build, *, marker_text: str = "") -> str:
    """Concurrency-safe idempotent materialization of a persistent layout
    directory (synthesized fixture corpora, persisted indexes, partitioned
    re-layouts). ``build(tmp_dir)`` writes the full content into a UNIQUE
    per-process tmp dir; the final path is claimed with one atomic
    ``os.rename`` and stamped with a ``_DONE`` marker. Concurrent builders
    each write their own tmp and the losers defer to the winner's marker —
    never a shared tmp dir (two Ray writers interleaving shard files) and
    never a pre-emptive rmtree of a dir another process just promoted,
    the two failure modes of the old ``out + ".tmp"`` + ``os.replace``
    pattern (observed: ENOTEMPTY crash, and a potential doubled corpus
    under a valid marker). Crashed builders' tmp leftovers in the same
    root are reaped under the shared ``_reap_ok`` policy."""
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    root = os.path.dirname(out)
    os.makedirs(root, exist_ok=True)
    reap_stale_tmp(root)
    tmp = f"{out}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp)
    try:
        build(tmp)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    for wait in _CLAIM_BACKOFF:
        time.sleep(wait)
        if os.path.exists(marker):          # another builder won
            shutil.rmtree(tmp, ignore_errors=True)
            return out
        try:
            os.rename(tmp, out)             # atomic claim
            with open(marker, "w") as f:
                f.write(marker_text)
            return out
        except OSError:
            continue    # out exists: a winner is mid-promotion — wait
            #             for its marker on the next iteration
    # patience exhausted and still no marker: `out` is a stale partial
    # from a crashed build — clear it and claim
    shutil.rmtree(out, ignore_errors=True)
    try:
        os.rename(tmp, out)
        with open(marker, "w") as f:
            f.write(marker_text)
        return out
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        if os.path.exists(marker):          # raced another recoverer
            return out
        raise


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
    # corpus-proportional copy per request until process exit. Keyed by
    # thread: another thread's same-tag checkpoint may still be live.
    key = (threading.get_ident(), tag)
    prev = _live_by_tag.get(key)
    if prev is not None:
        shutil.rmtree(prev, ignore_errors=True)
    _live_by_tag[key] = path
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
        write_empty_sentinel(path, schema)

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
