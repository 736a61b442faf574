"""Serving-path queries: predicate pushdown (bbox cell-prune + exact refine
+ property filter), oracle-checked."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions import points
from ..sources.parquet import read_table
from ..stages.derive import derive_and_encode
from .query import bbox_predicate
from .registry import register

BBOX = [60.0, 24.6, 60.4, 25.3]   # pygeoapi order [ymin, xmin, ymax, xmax]


def _bbox_sql() -> str:
    x, y = points.sql_xy("doc_id")
    return f"""
    WITH pts AS (SELECT d.doc_id, d.lang, {x} AS x, {y} AS y
                 FROM documents d)
    SELECT doc_id, lang, x, y FROM pts
    WHERE lang = 'en'
      AND x >= CAST('24.6' AS DOUBLE) AND x <= CAST('25.3' AS DOUBLE)
      AND y >= CAST('60.0' AS DOUBLE) AND y <= CAST('60.4' AS DOUBLE)"""


@register("filtered_docs_bbox", sql=_bbox_sql)
def filtered_docs_bbox(sf_dir: str):
    """The serving path (SURVEY.md §3.2) as a pipeline: property filter
    (lang = 'en') + bbox predicate = coarse res-7 cell-cover prune (the
    GIST-scan analogue) then the exact x/y refine — both inside one
    vectorized map_batches."""
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "documents", ["doc_id", "lang"])
    ds = ds.map_batches(derive_and_encode("doc_id", (7,)),
                        batch_format="pyarrow", zero_copy_batch=True)
    cover, exact = bbox_predicate(BBOX, 7)
    cover_arr = np.asarray(sorted(cover), dtype=np.int64)

    def fn(t: pa.Table) -> pa.Table:
        c = t["cell7"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(cover_arr, c)
        keep = (pos < len(cover_arr)) & (
            cover_arr[np.minimum(pos, len(cover_arr) - 1)] == c)
        t = t.filter(pa.array(keep))
        if len(t) == 0:
            return t.select(["doc_id", "lang", "x", "y"])
        t = t.filter(pc.and_(exact(t), pc.equal(t["lang"], "en")))
        return t.select(["doc_id", "lang", "x", "y"])

    return ds.map_batches(fn, batch_format="pyarrow")
