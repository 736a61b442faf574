"""laji_pygeoapi_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch re-expression of the query and transform semantics of the
reference system luomus/laji-pygeoapi (a pygeoapi + PostGIS OGC API Features
service; see /root/reference) as an idiomatic Ray Data pipeline engine:

- ``ray.data.Dataset`` pipelines of zero-copy Arrow ``map_batches`` stages,
- stateful stages (polygon index for point-in-polygon, kNN indexes) as
  actor pools,
- wide operations (dedup, merge-similar-observations, tile aggregation) as
  ``groupby``/``map_groups`` shuffles with explicit skew handling,
- partitioned, resumable Parquet output with per-partition lineage.

No code is ported from the reference; file:line citations in docstrings point
at the reference behavior each operator reproduces.

Sub-packages:
    functions/  pure vectorized kernels (numpy / pyarrow.compute), each with a
                DuckDB-SQL twin used as the correctness oracle
    stages/     map_batches stage callables (stateless fns + actor classes)
    sources/    readers / writers / synthetic-input generators
    state/      broadcast side tables, polygon fixtures, checkpoint manifest
    pipelines/  end-to-end pipeline compositions + the query layer
"""

__version__ = "0.1.0"
