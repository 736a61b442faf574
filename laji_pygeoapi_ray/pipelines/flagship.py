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
