"""The flagship pipeline: the engine's equivalent of the reference's weekly
bulk ETL (``/root/reference/pygeoapi/scripts/main.py:75-131`` trace in
SURVEY.md §3.1), Ray-Data-first:

    read_parquet (pruned columns)
      → map_batches: derive point + encode tile cells (res 7)   [stateless]
      → map_batches: PIPAssigner actor pool                      [stateful]
      → (callers continue with dedup / merge / tile agg / partitioned write)

The pipeline object is lazy; the driver/bench consumes it with a count,
an aggregate, or a partitioned write.
"""
from __future__ import annotations

import ray.data

from ..stages import assign
from ..stages.derive import derive_and_encode


def flagship(sf_dir: str, *, concurrency=(1, 4)) -> "ray.data.Dataset":
    """documents → points → cells → region labels (lazy Dataset)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "n_chars"])
    ds = ds.map_batches(derive_and_encode("doc_id", (7,)),
                        batch_format="pyarrow", zero_copy_batch=True)
    layers_ref = assign.put_layers()
    ds = ds.map_batches(assign.PIPAssigner,
                        fn_constructor_args=(layers_ref,),
                        batch_format="pyarrow", batch_size=32768,
                        concurrency=concurrency, num_cpus=1)
    return ds


def flagship_images(sf_dir: str, *, concurrency=None) -> "ray.data.Dataset":
    """The full north-star pipeline over the image+caption input table:

    read (Parquet ≙ Lance fragments) → parse img_no from image_id →
    decode + PSNR-verify + features (actor pool, small batches) →
    derive point → encode res-7 tile → PIP region labels (actor pool) →
    local id ('#'→'_'). Callers continue with phash dedup / tile agg /
    partitioned write (see pipelines/image_queries.py and
    pipelines/etl.py)."""
    import pyarrow as pa

    from ..functions import cells, points
    from ..sources import images as imgsrc
    from ..stages.images import ImageDecodeStage

    # autoscaling (1, N) pools here — this pipeline runs TWO actor pools
    # (decode + PIP); two FIXED pools pin every CPU and deadlock small
    # sessions (NOTES.md). Single-pool pipelines use fixed_pool instead.
    from ..sources.parquet import default_pool
    from .image_queries import images_ds
    if concurrency is None:
        concurrency = default_pool()
    ds = images_ds(sf_dir)
    ds = ds.map_batches(imgsrc.parse_image_no, batch_format="pyarrow")
    ds = ds.map_batches(ImageDecodeStage,
                        fn_constructor_kwargs={"drop_bytes": True},
                        batch_format="pyarrow",
                        batch_size=512, concurrency=concurrency, num_cpus=1)

    def derive(t: pa.Table) -> pa.Table:
        no = t["img_no"].to_numpy(zero_copy_only=False)
        x, y = points.derive_xy(no)
        t = t.append_column("x", pa.array(x)).append_column("y", pa.array(y))
        return t.append_column("cell7", pa.array(cells.encode(x, y, 7)))

    ds = ds.map_batches(derive, batch_format="pyarrow")
    layers_ref = assign.put_layers()
    ds = ds.map_batches(assign.PIPAssigner,
                        fn_constructor_args=(layers_ref,),
                        batch_format="pyarrow", batch_size=8192,
                        concurrency=concurrency, num_cpus=1)
    return ds.map_batches(imgsrc.local_id, batch_format="pyarrow")


def _n_images(sf_dir: str) -> int:
    from .image_queries import n_images_for
    return n_images_for(sf_dir)
