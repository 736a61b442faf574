"""The bulk ETL job — the engine's equivalent of the reference's weekly
CronJob (``main.py`` lifecycle, SURVEY.md §3.1), with per-shard
checkpoint/resume and a maintenance pass:

1. **Enrich + append** (per input shard, resumable): read the shard's
   Lance-fragment files → parse img_no → decode-verify (PSNR) → derive
   point + res-7 tile → PIP region labels → local id → write
   ``out/shards/<shard>/`` partitioned Parquet + manifest marker with
   lineage (input files, transform version) and counters. A rerun skips
   shards whose marker exists (resume).
2. **Maintenance** (mirrors the reference's background thread,
   ``main.py:117-129``): global dedup by phash keep-first
   (``remove_duplicates`` semantics) over all shard output → write
   ``out/merged/`` → per-province metadata aggregates (bbox, counts,
   quality≙PSNR stats; mirroring ``edit_metadata.py:24-86``) →
   ``metadata.json``.

Append-then-dedup makes resume exactly-once-equivalent: re-processing a
shard only re-appends rows the dedup collapses (SURVEY.md §2.8 upsert).

On a multi-node cluster each shard is an independent sub-job (``ray job
submit`` per shard or one driver looping); locally the loop runs shards
sequentially, each internally parallel.
"""
from __future__ import annotations

import glob
import os
import shutil

import pyarrow as pa
import ray.data

from .. import __version__
from ..functions import cells, points
from ..sources import images as imgsrc
from ..sources.parquet import default_pool
from ..stages import assign
from ..stages.dedup import dedup_keep_latest
from ..stages.images import ImageDecodeStage
from ..stages.shuffle import partial_group_counts
from ..state.checkpoint import RunManifest, atomic_write_json

TRANSFORM_VERSION = f"enrich-v1+{__version__}"


def _enrich(ds, layers_ref, concurrency) -> "ray.data.Dataset":
    ds = ds.map_batches(imgsrc.parse_image_no, batch_format="pyarrow")
    ds = ds.map_batches(ImageDecodeStage,
                        fn_constructor_kwargs={"drop_bytes": True},
                        batch_format="pyarrow",
                        batch_size=256, concurrency=concurrency, num_cpus=1)

    def derive(t: pa.Table) -> pa.Table:
        no = t["img_no"].to_numpy(zero_copy_only=False)
        x, y = points.derive_xy(no)
        t = t.append_column("x", pa.array(x)).append_column("y", pa.array(y))
        return t.append_column("cell7", pa.array(cells.encode(x, y, 7)))

    ds = ds.map_batches(derive, batch_format="pyarrow")
    ds = ds.map_batches(assign.PIPAssigner, fn_constructor_args=(layers_ref,),
                        batch_format="pyarrow", batch_size=8192,
                        concurrency=concurrency, num_cpus=1)
    return ds.map_batches(imgsrc.local_id, batch_format="pyarrow")


def shard_checksum(shard_dir: str) -> int:
    """Order-independent content checksum of a written shard: XOR of
    mix64(polyhash(image_id)) over every row (one narrow column read).
    Recorded in the manifest at write time; :func:`verify_etl_output`
    recomputes it to prove a partition survived intact — the anti-entropy
    check a resumable 100-TB sink runs before trusting a resume skip
    (same hash construction as the ``table_checksum_ranges`` query)."""
    import numpy as np
    import pyarrow.parquet as pq

    from ..functions import textkernels as tk

    files = sorted(glob.glob(os.path.join(shard_dir, "*.parquet")))
    acc = np.uint64(0)
    for f in files:
        col = pq.read_table(f, columns=["image_id"])["image_id"]
        if len(col):
            acc ^= np.bitwise_xor.reduce(tk.poly_mix_hash(
                col.combine_chunks()))
    return int(acc)


def verify_etl_output(out_dir: str) -> dict:
    """Recompute every done shard's checksum against the manifest —
    returns {shard_id: bool}. A False entry means the partition on disk
    no longer matches what the run recorded (corruption or partial
    rewrite) and must be re-run rather than resume-skipped."""
    manifest = RunManifest(out_dir, TRANSFORM_VERSION)
    out = {}
    for shard_id, entry in manifest.data.get("shards", {}).items():
        if entry.get("status") != "done":
            continue
        want = entry.get("counters", {}).get("checksum_xor")
        shard_dir = os.path.join(out_dir, "shards", shard_id)
        out[shard_id] = (want is not None and os.path.isdir(shard_dir)
                         and shard_checksum(shard_dir) == want)
    return out


def run_etl(sf_dir: str, out_dir: str, *, shards: int = 4,
            resume: bool = True) -> RunManifest:
    """Enrich+append phase with per-shard resume."""
    from .image_queries import n_images_for

    img_path = imgsrc.materialize_images(n_images_for(sf_dir))
    files = sorted(glob.glob(os.path.join(img_path, "*.parquet")))
    groups = [files[i::shards] for i in range(shards)]
    manifest = RunManifest(out_dir, TRANSFORM_VERSION)
    if not resume:
        manifest.data["shards"] = {}
        manifest.save()
    layers_ref = assign.put_layers()
    for i, group in enumerate(groups):
        if not group:
            continue
        shard_id = f"shard_{i:04d}"
        shard_dir = os.path.join(out_dir, "shards", shard_id)
        if resume and manifest.is_done(shard_id) and os.path.isdir(shard_dir):
            want = manifest.data["shards"][shard_id].get(
                "counters", {}).get("checksum_xor")
            if want is None or shard_checksum(shard_dir) == want:
                continue
            # recorded checksum no longer matches the bytes on disk —
            # the resume skip cannot be trusted; fall through and
            # rewrite the shard (the verify-before-skip contract)
        tmp = shard_dir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(shard_dir, ignore_errors=True)
        try:
            ds = ray.data.read_parquet(group)
            enriched = _enrich(ds, layers_ref, default_pool(0.3))
            enriched.write_parquet(tmp)
        except Exception as exc:  # degrade-don't-die: the reference keeps
            # going past failed pages, accounting the loss
            # (load_data.py:231,238); the engine records the failed shard
            # with its lineage and continues — resume retries it.
            manifest.data["shards"][shard_id] = {
                "status": "failed", "input_files": sorted(group),
                "error": f"{type(exc).__name__}: {exc}"[:500],
            }
            manifest.save()
            shutil.rmtree(tmp, ignore_errors=True)
            continue
        os.makedirs(os.path.dirname(shard_dir), exist_ok=True)
        os.replace(tmp, shard_dir)
        import pyarrow.parquet as pq
        shard_files = glob.glob(os.path.join(shard_dir, "*.parquet"))
        rows = sum(pq.read_metadata(f).num_rows for f in shard_files)
        # per-shard verification metrics (the reference's run-summary
        # counters, main.py:261-268): PSNR floor + per-format counts read
        # back from the written columns (cheap: two narrow columns)
        stats = pq.read_table(shard_files, columns=["psnr", "fmt"])
        import pyarrow.compute as pc
        fmt_counts = {
            str(k): int(v) for k, v in zip(
                *(a.to_pylist() for a in pc.value_counts(
                    stats["fmt"]).flatten()))}
        manifest.mark_done(shard_id, input_files=group, rows=rows,
                           counters={"rows": rows,
                                     "min_psnr_db": float(pc.min(
                                         stats["psnr"]).as_py()),
                                     "fmt_counts": fmt_counts,
                                     "checksum_xor": shard_checksum(
                                         shard_dir)})
    done = [s for s in manifest.data["shards"].values()
            if s["status"] == "done"]
    manifest.set_counters({
        "shards_done": len(done),
        "shards_failed": len(manifest.data["shards"]) - len(done),
        "rows_processed": int(sum(s["rows"] for s in done)),
    })
    return manifest


def run_maintenance(out_dir: str) -> dict:
    """Dedup + metadata pass over all shard output (the reference's
    ``remove_duplicates`` → ``create_metadata`` chain)."""
    shard_files = sorted(glob.glob(os.path.join(out_dir, "shards", "*",
                                                "*.parquet")))
    ds = ray.data.read_parquet(shard_files)
    deduped = dedup_keep_latest(ds, ["phash"], ["image_id"],
                                descending=False)
    # tile-ordered output layout (SURVEY.md §2.7: global sort by cell id) —
    # queries that prune by cell then touch contiguous row groups — under a
    # province=<name> hive partition per region: the reference's
    # per-province table split (``main.py:193-198``, ``edit_db.py:262-296``)
    # as partitioned directories, so per-region serving reads prune at the
    # path level and a partial rewrite touches one region only
    deduped = deduped.sort("cell7")
    merged_dir = os.path.join(out_dir, "merged")
    tmp = merged_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(merged_dir, ignore_errors=True)
    deduped.write_parquet(tmp, partition_cols=["province"])
    os.replace(tmp, merged_dir)
    # the reference rebuilds its GIST indexes after every load
    # (edit_db.py:298-331); here that is the per-file cell-range index the
    # pruned reader uses for file-level skipping
    from ..sources.parquet import build_cell_index
    build_cell_index(merged_dir)

    # per-province metadata (edit_metadata.py:122-207 analogue)
    from ray.data.aggregate import Count, Max, Min

    mds = ray.data.read_parquet(merged_dir)
    agg = mds.groupby("province").aggregate(
        Count(alias_name="count"),
        Min("x", alias_name="min_x"), Max("x", alias_name="max_x"),
        Min("y", alias_name="min_y"), Max("y", alias_name="max_y"),
        Min("psnr", alias_name="min_psnr"))
    records = []
    for row in agg.iter_rows():
        prov = row["province"]
        records.append({
            "id": f"ID_{prov}",
            "title": prov,
            "bbox": [row["min_x"], row["min_y"], row["max_x"], row["max_y"]],
            "count": row["count"],
            "description": f"This dataset has {row['count']} point occurrence "
                           f"features in {prov}",
            "min_psnr_db": row["min_psnr"],
        })
    meta = {"collections": sorted(records, key=lambda r: r["id"]),
            "total": int(sum(r["count"] for r in records))}
    atomic_write_json(os.path.join(out_dir, "metadata.json"), meta)
    return meta


def run_geometry_etl(sf_dir: str, out_dir: str) -> dict:
    """Mixed-geometry ETL with the reference's (region, geom_type) sink
    layout: synthesize the mixed feature set over ``documents`` → normalize
    GCs + validate/repair (real WKB stage) → PIP province → ONE partitioned
    Parquet write with ``partition_cols=["province", "geom_group"]`` — the
    66-PostGIS-table scheme (``edit_db.py:262-296``, ``main.py:193-198``,
    SURVEY.md §1.4) realized as hive directories, so a resumed/partial run
    skips finished partitions and per-(region, type) queries prune at the
    path level. Returns the run summary counters (conversion/repair counts
    mirroring ``process_data.py``'s accounting)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..stages import geometry as geomstage
    from ..stages.derive import derive_and_encode
    from .image_queries import n_images_for  # noqa: F401  (pool sizing peer)

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    ds = ds.map_batches(derive_and_encode("doc_id", (7,)),
                        batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(geomstage.build_geometry(), batch_format="pyarrow")
    ds = ds.map_batches(geomstage.normalize_validate, batch_format="pyarrow")
    layers_ref = assign.put_layers()
    ds = ds.map_batches(assign.PIPAssigner, fn_constructor_args=(layers_ref,),
                        batch_format="pyarrow", batch_size=16384,
                        concurrency=default_pool(), num_cpus=1)
    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    ds.write_parquet(tmp, partition_cols=["province", "geom_group"])
    os.replace(tmp, out_dir)

    files = sorted(glob.glob(os.path.join(out_dir, "**", "*.parquet"),
                             recursive=True))
    rows = sum(pq.read_metadata(f).num_rows for f in files)
    # counter columns are per-batch constants; summing distinct per-file
    # firsts over-counts, so re-aggregate from the written narrow columns
    stats = pq.read_table(files, columns=["n_converted", "n_repaired"])
    summary = {
        "rows": int(rows),
        "partitions": len({os.path.dirname(f) for f in files}),
        "max_converted_per_batch": int(pc.max(stats["n_converted"]).as_py())
        if rows else 0,
    }
    atomic_write_json(os.path.join(out_dir, "geometry_manifest.json"),
                      summary)
    return summary


def run_incremental_ingest(input_path, out_dir: str) -> dict:
    """Watermark-filtered incremental ingest — the reference's
    ``PAGES=latest`` mode (``main.py:185-186`` passes
    ``loadedSameOrAfter=last_update``; ``edit_db.py:32-66`` then upserts):

    1. read ONLY records with ``ts >= watermark`` (inclusive, like
       loadedSameOrAfter) — pushed down as a Parquet read filter, so old
       row groups never leave storage;
    2. append the delta under ``out/deltas/delta_NNNN`` (lineage in the
       manifest);
    3. reconcile ``out/current`` = keep-latest dedup by ``event_id`` over
       base + all deltas (append-then-dedup makes the boundary row that
       re-enters via the inclusive watermark collapse — exactly-once-
       equivalent);
    4. advance the watermark to the max ``ts`` processed.

    Returns the run summary. A first run (no watermark) ingests
    everything."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    manifest = RunManifest(out_dir, TRANSFORM_VERSION + "+ingest")
    wm = manifest.data.get("watermark_ts")
    kwargs = {}
    if wm is not None:
        import numpy as np
        kwargs["filter"] = (pads.field("ts")
                            >= np.datetime64(wm, "us").item())
    ds = ray.data.read_parquet(input_path, **kwargs)

    delta_no = len([k for k in manifest.data["shards"]
                    if k.startswith("delta_")])
    delta_id = f"delta_{delta_no:04d}"
    delta_dir = os.path.join(out_dir, "deltas", delta_id)
    tmp = delta_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)   # an all-filtered (empty) delta still
    ds.write_parquet(tmp)             # commits an empty marker directory
    os.makedirs(os.path.dirname(delta_dir), exist_ok=True)
    os.replace(tmp, delta_dir)

    delta_files = sorted(glob.glob(os.path.join(delta_dir, "*.parquet")))
    rows = sum(pq.read_metadata(f).num_rows for f in delta_files)
    max_ts = None
    if rows:
        ts = pq.read_table(delta_files, columns=["ts"])["ts"]
        max_ts = str(pc.max(ts).as_py())
    manifest.mark_done(delta_id, input_files=delta_files, rows=rows,
                       counters={"watermark_in": wm,
                                 "watermark_out": max_ts})
    if max_ts is not None:
        manifest.data["watermark_ts"] = max_ts
        manifest.save()

    all_files = sorted(glob.glob(os.path.join(out_dir, "deltas", "*",
                                              "*.parquet")))
    merged = dedup_keep_latest(ray.data.read_parquet(all_files),
                               ["event_id"], ["ts"])
    current = os.path.join(out_dir, "current")
    tmp = current + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(current, ignore_errors=True)
    merged.write_parquet(tmp)
    os.replace(tmp, current)
    cur_rows = sum(pq.read_metadata(f).num_rows for f in
                   glob.glob(os.path.join(current, "*.parquet")))
    return {"delta_rows": int(rows), "current_rows": int(cur_rows),
            "watermark": manifest.data.get("watermark_ts")}


def incremental_window_counts(delta_ds, state_dir: str) -> str:
    """Streaming-materialized-view maintenance (§2.8): keep a tumbling-
    window count table ``(event_type, window, n)`` up to date across
    micro-batches. Each call folds ONE delta in:

      partial counts of the delta (combine-before-shuffle — only a few
      rows per batch leave the scan) → union with the current state →
      groupby sum → atomic swap of ``state_dir``.

    Windows are exact integer epoch-µs floor-divisions, so incremental
    maintenance commutes: applying deltas in any order/slicing equals the
    batch recompute (asserted in tests). State stays tiny (one row per
    (type, window)), so the swap is cheap; at 10^12-event scale the state
    table is still only O(types × hours)."""
    import pyarrow.compute as pc  # noqa: F401  (stage imports)

    from ..stages.shuffle import partial_group_counts
    from ..stages.stream import add_window_column

    delta = delta_ds.map_batches(add_window_column("ts"),
                                 batch_format="pyarrow")
    partial = partial_group_counts(delta.map_batches(
        lambda t: t.select(["event_type", "window"]),
        batch_format="pyarrow"), ["event_type", "window"])

    cur_files = sorted(glob.glob(os.path.join(state_dir, "*.parquet")))
    if cur_files:
        cur = ray.data.read_parquet(cur_files)
        unioned = cur.union(partial)
    else:
        unioned = partial
    from ray.data.aggregate import Sum
    new = unioned.groupby(["event_type", "window"]).aggregate(
        Sum("n", alias_name="n")).map_batches(
        lambda t: t.rename_columns(["event_type", "window", "n"]),
        batch_format="pyarrow")
    # coalesce before the swap: union + groupby mirror the input block
    # count, so without this the state table gains files every fold (the
    # same geometric-growth trap as iterative label propagation, NOTES.md)
    new = new.repartition(1)
    tmp = state_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    new.write_parquet(tmp)
    shutil.rmtree(state_dir, ignore_errors=True)
    os.replace(tmp, state_dir)
    return state_dir


def run_occurrence_etl(jsonl_dir: str, out_dir: str) -> dict:
    """The reference's ACTUAL ingest path end-to-end (``main.py:75-131``):
    paged occurrence JSON → flatten (json_normalize convention) →
    ComputeAllStage actor pool (taxonomy/collection/enum state broadcast
    once) → fixed 57-column virva schema → Parquet. Ragged input in, fixed
    schema out."""
    import ray

    from ..sources import occurrence_json as occ
    from ..stages.compute_all import ComputeAllStage

    ds = occ.read_occurrence_json(jsonl_dir)
    state_ref = ray.put({
        "taxonomy": occ.TAXONOMY,
        "collection_names": occ.COLLECTIONS,
        "value_ranges": {"MALE": "koiras", "FEMALE": "naaras"},
    })
    ds = ds.map_batches(ComputeAllStage, fn_constructor_args=(state_ref,),
                        batch_format="pyarrow", batch_size=4096,
                        concurrency=default_pool(0.5), num_cpus=1)
    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    ds.write_parquet(tmp)
    os.replace(tmp, out_dir)
    import pyarrow.parquet as pq
    files = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
    rows = sum(pq.read_metadata(f).num_rows for f in files)
    return {"rows": int(rows), "files": len(files)}


def compact_parquet(data_dir: str, *, target_mb: int = 128,
                    sort_by: str | None = None) -> dict:
    """Compaction maintenance (the small-files antidote for the
    delta-append ingest): read every fragment, optionally restore the
    tile-sort order, and rewrite into files sized ~``target_mb`` (one
    atomic directory swap — readers never see a partial state). At scale
    this runs per partition directory, so a failed compaction affects one
    partition only. Returns (files_before, files_after, rows)."""
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(data_dir, "*.parquet")))
    if not files:
        return {"files_before": 0, "files_after": 0, "rows": 0}
    total_bytes = sum(os.path.getsize(f) for f in files)
    rows = sum(pq.read_metadata(f).num_rows for f in files)
    n_out = max(1, round(total_bytes / (target_mb << 20)))
    ds = ray.data.read_parquet(files)
    if sort_by:
        ds = ds.sort(sort_by)
    tmp = data_dir + ".compact_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.repartition(n_out).write_parquet(
        tmp, min_rows_per_file=max(1, rows // n_out))
    bak = data_dir + ".compact_old"
    shutil.rmtree(bak, ignore_errors=True)
    os.replace(data_dir, bak)
    os.replace(tmp, data_dir)
    shutil.rmtree(bak, ignore_errors=True)
    after = len(glob.glob(os.path.join(data_dir, "*.parquet")))
    return {"files_before": len(files), "files_after": after,
            "rows": int(rows)}
