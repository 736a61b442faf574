"""The composed training-corpus build — every engine family in ONE
pipeline, the end-to-end story of the brief:

    image+caption table (Lance-shaped)
      → decode + PSNR-verify                       [actor pool]
      → caption quality gate (token stats)          [vectorized text]
      → visual exact-dup removal (phash keep-first) [fingerprint shuffle]
      → deterministic train/val split (hash)        [sampling]
      → spatial enrichment (derive → tile → PIP)    [geo actor pool]
      → write hive-partitioned by (split, province) [resumable sink]

Every stage is an operator certified elsewhere by its own oracle/test;
this module certifies the COMPOSITION (row accounting at each gate).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import cells, points
from ..sources import images as imgsrc
from ..sources.parquet import default_pool
from ..stages import assign
from ..stages.dedup import dedup_keep_latest
from ..stages.images import ImageDecodeStage
from ..stages.sampling import train_val_split
from .image_queries import images_ds
from .registry import register

MIN_CAPTION_TOKENS = 5


def build_training_corpus(sf_dir: str, out_dir: str | None = None):
    """Returns (dataset, counters); writes the partitioned corpus when
    ``out_dir`` is given.

    Row accounting streams: each gate interposes a pass-through counting
    stage (``state/metrics.py`` — fire-and-forget per-block increments to
    a zero-CPU actor) so the pipeline is consumed exactly ONCE by its
    real sink; nothing is materialized just to be counted. With
    ``out_dir`` the counters are resolved after the write; without it the
    caller consumes the returned dataset, then ``counters.resolve()``."""
    from ..state.metrics import StageMetrics

    counters = StageMetrics()
    ds = counters.counted(images_ds(sf_dir), "input")
    ds = ds.map_batches(imgsrc.parse_image_no, batch_format="pyarrow")
    ds = ds.map_batches(ImageDecodeStage,
                        fn_constructor_kwargs={"drop_bytes": True},
                        batch_format="pyarrow", batch_size=512,
                        concurrency=default_pool(0.5), num_cpus=1)

    def quality_gate(t: pa.Table) -> pa.Table:
        # decoded ok + caption long enough (BPE-ish class count)
        ntok = pc.add(pc.count_substring(
            pc.cast(t["caption"], pa.string()), " "), 1)
        keep = pc.and_(t["decode_ok"],
                       pc.greater_equal(ntok, MIN_CAPTION_TOKENS))
        return t.filter(keep)

    ds = ds.map_batches(quality_gate, batch_format="pyarrow")
    ds = counters.counted(ds, "after_quality")

    # visual exact-dup removal: keep-first per phash
    ds = dedup_keep_latest(ds, ["phash"], ["image_id"],
                           descending=False)
    ds = counters.counted(ds, "after_dedup")

    ds = train_val_split(ds, 80, id_col="img_no")

    def enrich(t: pa.Table) -> pa.Table:
        no = t["img_no"].to_numpy(zero_copy_only=False)
        x, y = points.derive_xy(no)
        t = t.append_column("x", pa.array(x)).append_column("y", pa.array(y))
        return t.append_column("cell7", pa.array(cells.encode(x, y, 7)))

    ds = ds.map_batches(enrich, batch_format="pyarrow")
    layers_ref = assign.put_layers()
    ds = ds.map_batches(assign.PIPAssigner, fn_constructor_args=(layers_ref,),
                        batch_format="pyarrow", batch_size=8192,
                        concurrency=default_pool(0.3), num_cpus=1)
    if out_dir is not None:
        import os
        import shutil
        tmp = out_dir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)
        ds.write_parquet(tmp, partition_cols=["split", "province"])
        os.replace(tmp, out_dir)
        counters.resolve()
    return ds, counters


def _corpus_sql() -> str:
    """SQL twin of the WHOLE composed pipeline: caption quality gate →
    phash keep-first dedup → hash split → PIP province → counts. The
    decode/PSNR gate keeps every synthetic image by construction (that
    very fact is oracle-proven by `image_decode_verify`), so the SQL
    models it as a no-op; every other stage is reproduced exactly."""
    from ..functions import points
    from ..functions.pip import sql_pip_assign
    from ..stages.sampling import sql_id_hash
    from ..state import fixtures
    from .image_queries import ORACLE_N, _img_no_sql, _img_path_sql

    x, y = points.sql_xy("img_no")
    pts_cte = f"""
        SELECT img_no, {x} AS x, {y} AS y FROM (
          SELECT {_img_no_sql()} AS img_no, image_id, phash
          FROM {_img_path_sql(ORACLE_N)}
          WHERE len(string_split(caption, ' ')) >= {MIN_CAPTION_TOKENS}
          QUALIFY image_id = MIN(image_id) OVER (PARTITION BY phash)
        )"""
    layer = fixtures.province_layer()
    pip = sql_pip_assign(pts_cte, "img_no",
                         fixtures.edges_values_sql(layer),
                         fixtures.names_values_sql(layer))
    return f"""
    WITH assigned AS ({pip})
    SELECT CASE WHEN {sql_id_hash('img_no')} % 100 < 80
                THEN 'train' ELSE 'val' END AS split,
           name AS province, CAST(COUNT(*) AS BIGINT) AS n
    FROM assigned GROUP BY 1, 2"""


@register("training_corpus_counts", sql=_corpus_sql)
def training_corpus_counts(sf_dir: str):
    """Per-(split, province) record counts of the fully-built training
    corpus — the composed pipeline's observable output, oracle-checked
    end-to-end (decode → quality gate → phash dedup → split → PIP all in
    one equality)."""
    from ..stages.shuffle import partial_group_counts

    ds, _ = build_training_corpus(sf_dir)
    return partial_group_counts(
        ds.map_batches(lambda t: t.select(["split", "province"]),
                       batch_format="pyarrow"), ["split", "province"])
