"""Queries over the primary image+caption table (synthesized per
BASELINE.json input_hint; sources/images.py).

The driver's DuckDB oracle runs over pre-registered testdata views, so these
oracles read the deterministic /tmp parquet the query callable materializes
(same engine, same files). SQL-checkable: phash dedup clusters, tile counts
over points derived from the parsed image number. Rows-only: the full
decode-verify pipeline (PSNR needs the codec, no SQL twin)."""
from __future__ import annotations

import threading

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data
from ray.data.aggregate import Count, Sum

from ..functions import cells, points
from ..functions.pip import sql_pip_assign
from ..sources import images as imgsrc
from ..stages import assign
from ..stages.images import ImageDecodeStage
from ..sources.parquet import default_pool, fixed_pool
from ..stages.shuffle import grouped_apply
from .registry import register

RES = 7
N_BY_SF = {"sf0.001": 400, "sf0.01": 2000, "sf0.1": 20000}
ORACLE_N = 2000  # the driver runs correctness at sf0.01


def n_images_for(sf_dir: str) -> int:
    base = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    return N_BY_SF.get(base, 20000)


def images_ds(sf_dir: str, columns=None, *,
              n_min: int = 0) -> "ray.data.Dataset":
    """Image-corpus Dataset for ``sf_dir``. ``n_min`` floors the corpus
    size: the fixed-subset queries (``img_no < PHASH_SUB``) are
    sf-invariant only while the corpus holds at least PHASH_SUB images —
    at sf0.001 (400 images) the unfloored corpus silently truncates the
    subset. Image content is index-deterministic, so flooring never
    changes any row the subset filter keeps."""
    import glob
    import math
    import os

    from ..sources.parquet import TARGET_BLOCK_BYTES, cluster_cpus

    path = imgsrc.materialize_images(max(n_images_for(sf_dir), n_min))
    size = sum(os.path.getsize(f)
               for f in glob.glob(os.path.join(path, "*.parquet")))
    blocks = max(min(cluster_cpus(), 16),
                 math.ceil(size / TARGET_BLOCK_BYTES))
    return ray.data.read_parquet(path, columns=columns,
                                 override_num_blocks=blocks)


def _img_path_sql(n: int) -> str:
    # the oracle may be evaluated BEFORE the query callable runs, so make
    # sure the table it reads exists (idempotent; Ray is initialised by the
    # driver before this module is imported)
    imgsrc.materialize_images(n)
    from ..sources.images import CONTENT_VERSION
    return (f"read_parquet('/tmp/laji_ray_images/"
            f"n{n}v{CONTENT_VERSION}/*.parquet')")


@register("image_phash_dedup", sql=lambda: f"""
    SELECT image_id, phash,
           MIN(image_id) OVER (PARTITION BY phash) AS cluster_id
    FROM {_img_path_sql(ORACLE_N)}""")
def image_phash_dedup(sf_dir: str):
    """Exact near-dup grouping by 64-bit phash (identical pixels ⇒ identical
    phash; planted dups at n ≡ 17 mod 50): cluster = min image_id. Only the
    (image_id, phash) columns are read — the bytes column never moves
    (prune-at-read)."""
    ds = images_ds(sf_dir, columns=["image_id", "phash"])

    def attach_min(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["cluster_id"] = df.groupby("phash")["image_id"].transform("min")
        return df

    return grouped_apply(ds, ["phash"], attach_min)


def _img_no_sql() -> str:
    return r"CAST(regexp_extract(image_id, 'IMG\.(\d+)#', 1) AS BIGINT)"


@register("image_tile_counts", sql=lambda: f"""
    WITH base AS (SELECT {_img_no_sql()} AS img_no, w, h
                  FROM {_img_path_sql(ORACLE_N)}),
    pts AS (SELECT img_no, w, h, {points.sql_xy('img_no')[0]} AS x,
                   {points.sql_xy('img_no')[1]} AS y FROM base)
    SELECT {cells.sql_cell('x', 'y', RES)} AS cell7,
           COUNT(*) AS n, CAST(SUM(w) AS BIGINT) AS sum_w,
           CAST(SUM(h) AS BIGINT) AS sum_h
    FROM pts GROUP BY 1""")
def image_tile_counts(sf_dir: str):
    """Occurrence-point tiling of the image table: image number parsed from
    image_id (vectorized regex), point derived, res-7 tile aggregation of
    pixel-dimension payload."""
    ds = images_ds(sf_dir, columns=["image_id", "w", "h"])
    ds = ds.map_batches(imgsrc.parse_image_no, batch_format="pyarrow")

    def derive(t: pa.Table) -> pa.Table:
        no = t["img_no"].to_numpy(zero_copy_only=False)
        x, y = points.derive_xy(no)
        return t.append_column("cell7", pa.array(cells.encode(x, y, RES)))

    ds = ds.map_batches(derive, batch_format="pyarrow")
    agg = ds.groupby("cell7").aggregate(
        Count(alias_name="n"), Sum("w", alias_name="sum_w"),
        Sum("h", alias_name="sum_h"))
    return agg.map_batches(
        lambda t: t.rename_columns(["cell7", "n", "sum_w", "sum_h"]),
        batch_format="pyarrow")


@register("image_augment_stats", sql=lambda: f"""
    SELECT fmt, COUNT(*) AS n, COUNT(*) AS n_sum_ok,
           COUNT(*) AS n_dims_ok, COUNT(*) AS n_pool_ok
    FROM {_img_path_sql(ORACLE_N)} GROUP BY fmt""")
def image_augment_stats(sf_dir: str):
    """Deterministic augmentation pipeline (hflip → rot90 → 2×2 sum-pool)
    over every image, verified by integer pixel invariants measured on
    the ACTUAL augmented arrays (stages/images.AugmentStage): permutation
    ops preserve the channel sum, rot90 swaps dims, sum-pooling preserves
    totals. The twin pins per-format n = n_sum_ok = n_dims_ok = n_pool_ok
    — the decode-verify trust model: any kernel regression breaks the
    driver hash. Actor pool, bytes dropped at the stage boundary."""
    import pyarrow.compute as pc

    from ..stages.images import AugmentStage

    ds = images_ds(sf_dir, columns=["image_id", "bytes", "fmt"])
    ds = ds.map_batches(AugmentStage, batch_format="pyarrow",
                        batch_size=512, concurrency=fixed_pool(),
                        num_cpus=1)

    def gates(t: pa.Table) -> pa.Table:
        return pa.table({
            "fmt": t["fmt"],
            "sum_ok": pc.cast(t["aug_sum_ok"], pa.int64()),
            "dims_ok": pc.cast(t["aug_dims_ok"], pa.int64()),
            "pool_ok": pc.cast(t["aug_pool_ok"], pa.int64())})

    agg = ds.map_batches(gates, batch_format="pyarrow") \
        .groupby("fmt").aggregate(
            Count(alias_name="n"), Sum("sum_ok", alias_name="n_sum_ok"),
            Sum("dims_ok", alias_name="n_dims_ok"),
            Sum("pool_ok", alias_name="n_pool_ok"))
    return agg.map_batches(
        lambda t: t.rename_columns(["fmt", "n", "n_sum_ok", "n_dims_ok",
                                    "n_pool_ok"]),
        batch_format="pyarrow")


@register("image_decode_verify", sql=lambda: f"""
    SELECT fmt, COUNT(*) AS n, COUNT(*) AS n_decode_ok,
           COUNT(*) AS n_psnr_ok
    FROM {_img_path_sql(ORACLE_N)} GROUP BY fmt""")
def image_decode_verify(sf_dir: str):
    """The flagship multimodal pipeline head: decode every image (actor
    pool, small batches) and verify the north-rule invariants (PSNR ≥
    40 dB, lossless exact). Partial SQL twin: the oracle knows every
    stored image must decode and pass PSNR by construction, so it emits
    n = n_decode_ok = n_psnr_ok per fmt — the Ray side COMPUTES both
    gates from the decoded pixels, and any decode or PSNR regression
    breaks the equality. (min-PSNR/mean-luma diagnostics stay in the ETL
    manifest, `pipelines/etl.py`.)"""
    import pyarrow.compute as pc

    ds = images_ds(sf_dir)
    ds = ds.map_batches(imgsrc.parse_image_no, batch_format="pyarrow")
    ds = ds.map_batches(ImageDecodeStage,
                        fn_constructor_kwargs={"drop_bytes": True},
                        batch_format="pyarrow",
                        batch_size=512, concurrency=fixed_pool(), num_cpus=1)

    def gates_partial(t: pa.Table) -> pa.Table:
        # combine-before-groupby: fold the gates to per-(batch, fmt)
        # partial counts so the exchange moves ~|fmts| rows per block,
        # not one row per image
        ok = pc.fill_null(t["decode_ok"], False)
        psnr_ok = pc.and_(ok, pc.fill_null(
            pc.greater_equal(t["psnr"], 40.0), False))
        g = pa.table({"fmt": t["fmt"],
                      "one": pa.array(np.ones(len(t), np.int64)),
                      "decode_ok": pc.cast(ok, pa.int64()),
                      "psnr_ok": pc.cast(psnr_ok, pa.int64())}) \
            .group_by(["fmt"]).aggregate([("one", "sum"),
                                          ("decode_ok", "sum"),
                                          ("psnr_ok", "sum")])
        return g.rename_columns(["fmt", "n", "n_decode_ok", "n_psnr_ok"])

    agg = ds.map_batches(gates_partial, batch_format="pyarrow") \
        .groupby("fmt").aggregate(
            Sum("n", alias_name="n"),
            Sum("n_decode_ok", alias_name="n_decode_ok"),
            Sum("n_psnr_ok", alias_name="n_psnr_ok"))
    return agg.map_batches(
        lambda t: t.rename_columns(["fmt", "n", "n_decode_ok", "n_psnr_ok"]),
        batch_format="pyarrow")


@register("image_ann_neardup")  # rows-only: visual-similarity model op
def image_ann_neardup(sf_dir: str):
    """Visual near-dup search: thumbnail-luma embeddings (ImageEmbedStage)
    → exact top-5 by quantized dot product for every 20th image as query.
    Planted pixel-dup families surface as rank-1 neighbors with maximal
    score (asserted in tests/test_images.py)."""
    from ..stages.ann import ann_topk_broadcast
    from ..stages.images import ImageEmbedStage

    ds = images_ds(sf_dir, columns=["image_id", "bytes", "fmt"])
    ds = ds.map_batches(imgsrc.parse_image_no, batch_format="pyarrow")
    ds = ds.map_batches(ImageEmbedStage, batch_format="pyarrow",
                        batch_size=512, concurrency=fixed_pool(0.5),
                        num_cpus=1)
    emb = ds.select_columns(["img_no", "img_vec"]).map_batches(
        lambda t: t.rename_columns(["vec_id", "embedding"]),
        batch_format="pyarrow")
    # spill ONCE to partitioned Parquet: the query-vector extraction below
    # and the corpus scan inside ann_topk_broadcast both consume `emb` —
    # the decode+embed lineage (the most expensive stage) executes exactly
    # once, and unlike materialize() nothing is pinned in the object store
    # (at 10^12 images the embedding table alone is ~0.5 PB; Parquet is
    # the right checkpoint medium, and the spill doubles as a resume point)
    from ..state.spill import spill_checkpoint

    read_emb = spill_checkpoint(
        emb, "img_ann_emb",
        schema=pa.schema([("vec_id", pa.int64()),
                          ("embedding",
                           pa.list_(pa.float32(), 64))]))
    qdf = read_emb().map_batches(
        lambda df: df[df["vec_id"] % 20 == 0],
        batch_format="pandas").to_pandas()
    return ann_topk_broadcast(read_emb(), qdf, 5)


def video_frame_sample(sf_dir: str):
    """Video frame-sampling pipeline over deterministic synthetic clips
    (one 8-frame vraw clip per document): synth → FrameSampleStage actor
    pool (stride 2) → one row per sampled frame with per-frame luma mean +
    64-bit frame hash. Not registered on its own — the oracle-checked
    `video_frame_stats` projection subsumes it in the driver gate;
    determinism + degrade behavior asserted in tests/test_media.py."""
    import ray.data as rd

    from ..stages import media

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "video_id": pa.array(ids, pa.int64()),
            "bytes": pa.array([media.synth_video(int(i)) for i in ids],
                              pa.binary()),
        })

    ds = rd.range(n, override_num_blocks=max(1, n // 256))
    ds = ds.map_batches(synth, batch_format="pyarrow", batch_size=256)
    return ds.map_batches(media.FrameSampleStage,
                          fn_constructor_kwargs={"stride": 2},
                          batch_format="pyarrow", batch_size=256,
                          concurrency=default_pool(0.5), num_cpus=1)


def _video_stats_sql() -> str:
    # reproduce synth_video's per-pixel formula (stages/media.py:43-48) in
    # SQL: channel value = (key*37 + t*11 + y*5 + x*3 + c*29) % 256
    return """
    WITH f AS (SELECT d.doc_id AS video_id, t.t
               FROM documents d,
                    (SELECT unnest([0, 2, 4, 6]) AS t) t),
    px AS (SELECT video_id, t, y.y, x.x,
                  (video_id * 37 + t * 11 + y.y * 5 + x.x * 3) % 256 AS r,
                  (video_id * 37 + t * 11 + y.y * 5 + x.x * 3 + 29) % 256 AS g,
                  (video_id * 37 + t * 11 + y.y * 5 + x.x * 3 + 58) % 256 AS b
           FROM f,
                (SELECT unnest(generate_series(0, 15)) AS y) y,
                (SELECT unnest(generate_series(0, 15)) AS x) x)
    SELECT video_id, t AS frame_idx,
           CAST(SUM(r * 299 + g * 587 + b * 114) AS BIGINT) AS frame_lumasum
    FROM px GROUP BY 1, 2"""


@register("video_frame_stats", sql=_video_stats_sql)
def video_frame_stats(sf_dir: str):
    """Frame-sampled integer luma sums — the ORACLE-CHECKED slice of the
    video pipeline: same synth → FrameSampleStage path as
    video_frame_sample, projected to the exact-int64 frame_lumasum column
    the SQL twin recomputes pixel-by-pixel from the generative formula
    (certifies the container parse, the frame sampling stride, and the
    per-frame reduction)."""
    return video_frame_sample(sf_dir).select_columns(
        ["video_id", "frame_idx", "frame_lumasum"])


def _audio_sql() -> str:
    # reproduce synth_audio (stages/media.py:59-65) + AudioFeatureStage
    # sample-for-sample: DuckDB's sin is bit-equal to numpy's over this
    # argument range (verified on the exact 2M-point argument set in
    # tests), int16 truncation/clip mirror astype('<i2'), the power
    # sum is exact integer arithmetic, /4096 is an exact power-of-two
    # division and sqrt is correctly rounded — so rms/zcr are hash-exact.
    import numpy as np
    two_pi = repr(2 * np.pi)
    four_pi = repr(2 * np.pi * 2)
    return f"""
    WITH ids AS (SELECT doc_id AS audio_id FROM documents),
    samp AS (SELECT audio_id, s.i FROM ids,
             (SELECT unnest(generate_series(0, 4095)) AS i) s),
    sig AS (SELECT audio_id, i,
            sin(({two_pi} * (CAST(220 AS DOUBLE)
                  + (audio_id % 32) * CAST(55 AS DOUBLE)))
                * (CAST(i AS DOUBLE) / CAST(16000 AS DOUBLE)))
            + CAST(0.5 AS DOUBLE) *
              sin((({four_pi} * (CAST(220 AS DOUBLE)
                      + (audio_id % 32) * CAST(55 AS DOUBLE)))
                   * (CAST(i AS DOUBLE) / CAST(16000 AS DOUBLE)))
                  + audio_id) AS v
            FROM samp),
    pcm AS (SELECT audio_id, i,
            CAST(trunc(LEAST(GREATEST(v * CAST(12000 AS DOUBLE),
                 CAST(-32768 AS DOUBLE)), CAST(32767 AS DOUBLE)))
                 AS BIGINT) AS p
            FROM sig),
    lagged AS (SELECT audio_id, i, p,
               lag(p) OVER (PARTITION BY audio_id ORDER BY i) AS prev
               FROM pcm)
    SELECT audio_id,
           sqrt(CAST(SUM(p * p) AS DOUBLE) / CAST(4096 AS DOUBLE)) AS rms,
           CAST(SUM(CASE WHEN i >= 1 AND (p < 0) <> (prev < 0)
                         THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(4095 AS DOUBLE) AS zcr,
           TRUE AS decode_ok
    FROM lagged GROUP BY audio_id"""


@register("audio_features", sql=_audio_sql)
def audio_features(sf_dir: str):
    """Audio feature extraction over deterministic synthetic PCM clips (one
    araw clip per document): synth → AudioFeatureStage actor pool →
    (audio_id, rms, zcr, decode_ok); payload dropped after decode. The SQL
    twin regenerates every PCM sample from the sine formula and recomputes
    rms/zcr exactly (see _audio_sql), certifying the codec parse, the
    int16 quantization and both feature reductions."""
    import ray.data as rd

    from ..stages import media

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "audio_id": pa.array(ids, pa.int64()),
            "bytes": pa.array([media.synth_audio(int(i)) for i in ids],
                              pa.binary()),
        })

    ds = rd.range(n, override_num_blocks=max(1, n // 256))
    ds = ds.map_batches(synth, batch_format="pyarrow", batch_size=256)
    return ds.map_batches(media.AudioFeatureStage, batch_format="pyarrow",
                          batch_size=256, concurrency=default_pool(0.5),
                          num_cpus=1)


PHASH_SUB = 500          # all-pairs oracle subset bound (img_no < 500)
PHASH_MAXHAM = 6


@register("image_phash_hamming_sub", sql=lambda: f"""
    WITH base AS (SELECT {_img_no_sql()} AS img_no, phash
                  FROM {_img_path_sql(ORACLE_N)}),
    sub AS (SELECT * FROM base WHERE img_no < {PHASH_SUB})
    SELECT a.img_no AS id_a, b.img_no AS id_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
    FROM sub a JOIN sub b ON a.img_no < b.img_no
    WHERE bit_count(xor(a.phash, b.phash)) <= {PHASH_MAXHAM}""")
def image_phash_hamming_sub(sf_dir: str):
    """VISUAL near-dup pairs by perceptual-hash Hamming distance (≤ 6 of
    64 bits): band-blocked over the existing phash column — pigeonhole
    guarantees no miss at this threshold (6 < 8 bands of 8 bits), so the
    blocked engine result equals the oracle's all-pairs scan exactly.
    Only (img_no, phash) is read; pixels never move.

    Certifies ``stages/simdedup.hamming_pairs`` (the shared text/simhash
    banding kernel) on the image table; the full-table τ=7 sibling
    ``image_phash_hamming_pairs`` certifies the dedicated multi-index
    explode path — the two deliberately exercise DIFFERENT kernels."""
    import pyarrow.compute as pc

    from ..stages.simdedup import hamming_pairs

    ds = images_ds(sf_dir, columns=["image_id", "phash"],
                   n_min=PHASH_SUB)
    ds = ds.map_batches(imgsrc.parse_image_no, batch_format="pyarrow")
    ds = ds.map_batches(
        lambda t: t.filter(pc.less(t["img_no"], PHASH_SUB))
        .select(["img_no", "phash"]), batch_format="pyarrow")
    return hamming_pairs(ds, id_col="img_no", hash_col="phash",
                         max_hamming=PHASH_MAXHAM, band_bits=8)


@register("caption_stats", sql=lambda: f"""
    SELECT {_img_no_sql()} AS img_no,
      CAST(len(string_split(caption, ' ')) AS BIGINT) AS n_tokens,
      CAST(len(list_distinct(string_split(caption, ' '))) AS BIGINT)
          AS distinct_tokens
    FROM {_img_path_sql(ORACLE_N)}""")
def caption_stats(sf_dir: str):
    """Text analysis over the MULTIMODAL table: token stats on the caption
    column (Finnish diacritics included) — the text family composed onto
    the image pipeline; only (image_id, caption) is read."""
    from ..functions import textkernels as tk

    ds = images_ds(sf_dir, columns=["image_id", "caption"])
    ds = ds.map_batches(imgsrc.parse_image_no, batch_format="pyarrow")

    def stats(t: pa.Table) -> pa.Table:
        s = tk.token_stats(t["caption"])
        return pa.table({"img_no": t["img_no"],
                         "n_tokens": pa.array(s["n_tokens"]),
                         "distinct_tokens": pa.array(s["distinct_tokens"])})

    return ds.map_batches(stats, batch_format="pyarrow")


@register("image_phash_components", sql=lambda: f"""
    WITH RECURSIVE base AS (SELECT {_img_no_sql()} AS img_no, phash
                            FROM {_img_path_sql(ORACLE_N)}),
    sub AS (SELECT * FROM base WHERE img_no < {PHASH_SUB}),
    p AS (SELECT a.img_no AS ia, b.img_no AS ib
          FROM sub a JOIN sub b ON a.img_no <> b.img_no
          WHERE bit_count(xor(a.phash, b.phash)) <= {PHASH_MAXHAM}),
    reach AS (SELECT img_no AS id, img_no AS r FROM sub
              UNION
              SELECT p.ia AS id, reach.r
              FROM p JOIN reach ON reach.id = p.ib)
    SELECT id AS img_no, CAST(MIN(r) AS BIGINT) AS cluster_id
    FROM reach GROUP BY id""")
def image_phash_components(sf_dir: str):
    """Connected components over the phash Hamming-≤{PHASH_MAXHAM} graph —
    the ORACLE for the engine's distributed clustering path: the same
    `cluster_pairs_ds` (iterative min-label propagation, endpoint-only
    labels, pointer jumping) that powers `minhash_dedup_clusters` runs here
    over a DETERMINISTIC pair set (band-blocked Hamming pairs, pigeonhole-
    exact), so the from-scratch SQL transitive closure certifies the whole
    propagation loop's fixpoint labels value-for-value. cluster_id = min
    img_no of the component; singletons label themselves."""
    import pyarrow.compute as pc

    from ..stages.simdedup import cluster_pairs_ds, hamming_pairs

    ds = images_ds(sf_dir, columns=["image_id", "phash"],
                   n_min=PHASH_SUB)
    ds = ds.map_batches(imgsrc.parse_image_no, batch_format="pyarrow")
    sub = ds.map_batches(
        lambda t: t.filter(pc.less(t["img_no"], PHASH_SUB))
        .select(["img_no", "phash"]), batch_format="pyarrow")
    pairs = hamming_pairs(sub, id_col="img_no", hash_col="phash",
                          max_hamming=PHASH_MAXHAM, band_bits=8)
    ids = sub.select_columns(["img_no"])
    return cluster_pairs_ds(pairs, ids, id_col="img_no")


def _img_points_cte(n: int) -> str:
    x, y = points.sql_xy("img_no")
    return (f"SELECT img_no, {x} AS x, {y} AS y FROM "
            f"(SELECT {_img_no_sql()} AS img_no FROM {_img_path_sql(n)})")


def _zonal_sql() -> str:
    from ..state import fixtures

    layer = fixtures.province_layer()
    assigned = sql_pip_assign(_img_points_cte(ORACLE_N), "img_no",
                              fixtures.edges_values_sql(layer),
                              fixtures.names_values_sql(layer))
    return f"""
    WITH assigned AS ({assigned}),
    base AS (SELECT {_img_no_sql()} AS img_no, w, h, phash
             FROM {_img_path_sql(ORACLE_N)})
    SELECT a.name AS province, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_psnr_ok,
           CAST(SUM(b.w * b.h) AS BIGINT) AS sum_px,
           CAST(SUM(bit_count(b.phash)) AS BIGINT) AS phash_bits
    FROM assigned a JOIN base b USING (img_no) GROUP BY 1"""


@register("zonal_image_stats", sql=_zonal_sql)
def zonal_image_stats(sf_dir: str):
    """Zonal (per-province) statistics of the image table — the
    raster↔vector composition at the heart of the north star: decode every
    image (actor pool), derive its occurrence point, PIP-assign the
    biogeographical province (the full `flagship_images` chain — its two
    actor pools autoscale so they share the CPU budget, NOTES.md deadlock
    rule), and aggregate per-zone pixel counts + phash-popcount payloads
    with per-batch partials (only a handful of (province, sums) rows cross
    the shuffle). The PSNR gate is computed from the DECODED pixels
    engine-side; the twin emits n_psnr_ok = n by construction (any
    decode/PSNR regression breaks equality), while province assignment,
    pixel totals and popcounts are recomputed exactly in SQL."""
    import pyarrow.compute as pc

    from .flagship import flagship_images

    ds = flagship_images(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        psnr_ok = pc.cast(pc.and_(
            pc.fill_null(t["decode_ok"], False),
            pc.fill_null(pc.greater_equal(t["psnr"], 40.0), False)),
            pa.int64())
        px = pc.multiply(pc.cast(t["w"], pa.int64()),
                         pc.cast(t["h"], pa.int64()))
        ph = t["phash"].to_numpy(zero_copy_only=False)
        bits = np.unpackbits(
            ph.astype("<i8").view(np.uint8).reshape(-1, 8),
            axis=1).sum(axis=1).astype(np.int64)
        g = pa.table({"province": t["province"],
                      "one": pa.array([1] * len(t), pa.int64()),
                      "n_psnr_ok": psnr_ok, "sum_px": px,
                      "phash_bits": pa.array(bits)})
        return (g.group_by(["province"])
                 .aggregate([("one", "sum"), ("n_psnr_ok", "sum"),
                             ("sum_px", "sum"), ("phash_bits", "sum")])
                 .rename_columns(["province", "n", "n_psnr_ok", "sum_px",
                                  "phash_bits"]))

    parts = ds.map_batches(partial, batch_format="pyarrow")
    agg = parts.groupby("province").aggregate(
        Sum("n", alias_name="n"),
        Sum("n_psnr_ok", alias_name="n_psnr_ok"),
        Sum("sum_px", alias_name="sum_px"),
        Sum("phash_bits", alias_name="phash_bits"))
    return agg.map_batches(
        lambda t: t.rename_columns(["province", "n", "n_psnr_ok",
                                    "sum_px", "phash_bits"]),
        batch_format="pyarrow")


@register("caption_integrity", sql=lambda: f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN caption = 'Havainto ' || img_no ||
                ': metsässä nähty yksilö lähellä jokea (erä ' ||
                (img_no % 7) || ')' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_caption_ok,
           CAST(SUM(CASE WHEN local_id =
                replace(image_id, '#', '_') THEN 1 ELSE 0 END) AS BIGINT)
               AS n_id_ok
    FROM (SELECT image_id, caption, {_img_no_sql()} AS img_no,
                 replace(image_id, '#', '_') AS local_id
          FROM {_img_path_sql(ORACLE_N)})""")
def caption_integrity(sf_dir: str):
    """North-rule per-row invariant #2: captions survive the FULL flagship
    pipeline byte-for-byte (decode → derive → PIP → local-id), verified
    engine-side by regenerating each caption from its image number and
    comparing the pipeline OUTPUT bytes; the '#'→'_' local-id encode is
    checked the same way. The twin recomputes both invariants in SQL over
    the stored table — a pipeline stage that mutates either column breaks
    the n_caption_ok / n_id_ok equality."""
    import pyarrow.compute as pc

    from .flagship import flagship_images

    ds = flagship_images(sf_dir)

    def gate(t: pa.Table) -> pa.Table:
        no = t["img_no"].to_numpy(zero_copy_only=False)
        expect = pc.binary_join_element_wise(
            "Havainto ", pa.array(no.astype("U"), pa.string()),
            ": metsässä nähty yksilö lähellä jokea (erä ",
            pa.array((no % 7).astype("U"), pa.string()), ")", "")
        cap_ok = pc.cast(pc.equal(t["caption"], expect), pa.int64())
        id_ok = pc.cast(pc.equal(
            t["local_id"],
            pc.replace_substring(t["image_id"], "#", "_")), pa.int64())
        return pa.table({"n": pa.array([len(t)], pa.int64()),
                         "n_caption_ok": pa.array(
                             [pc.sum(cap_ok).as_py() or 0], pa.int64()),
                         "n_id_ok": pa.array(
                             [pc.sum(id_ok).as_py() or 0], pa.int64())})

    parts = ds.map_batches(gate, batch_format="pyarrow")
    tot = parts.to_pandas().sum()
    return pa.table({"n": pa.array([int(tot["n"])], pa.int64()),
                     "n_caption_ok": pa.array([int(tot["n_caption_ok"])],
                                              pa.int64()),
                     "n_id_ok": pa.array([int(tot["n_id_ok"])], pa.int64())})


@register("image_patch_stats", sql=lambda: f"""
    SELECT fmt, COUNT(*) AS n,
           CAST(SUM((h // 8) * (w // 8)) AS BIGINT) AS n_patches,
           COUNT(*) AS n_conserve_ok
    FROM {_img_path_sql(ORACLE_N)} GROUP BY fmt""")
def image_patch_stats(sf_dir: str):
    """ViT-style patch extraction: decode every image, cut it into 8×8
    patches, reduce per patch (stages/patches.PatchStage). The oracle pins
    per-format image count, TOTAL patch count (recomputed from the stored
    (w, h) metadata — the engine derives it from the DECODED array shape,
    so the row certifies pixels==metadata), and the int64 conservation
    gate Σ patch sums == image sum (independent reduction order, measured
    on the actual patch grid — decode-verify trust model)."""
    import pyarrow.compute as pc

    from ..stages.patches import PatchStage

    ds = images_ds(sf_dir, columns=["image_id", "bytes", "fmt"])
    ds = ds.map_batches(PatchStage, batch_format="pyarrow",
                        batch_size=512, concurrency=fixed_pool(),
                        num_cpus=1)

    def gates(t: pa.Table) -> pa.Table:
        return pa.table({
            "fmt": t["fmt"],
            "np_": pc.cast(t["n_patches"], pa.int64()),
            "cons": pc.cast(t["conserve_ok"], pa.int64())})

    agg = ds.map_batches(gates, batch_format="pyarrow") \
        .groupby("fmt").aggregate(
            Count(alias_name="n"), Sum("np_", alias_name="n_patches"),
            Sum("cons", alias_name="n_conserve_ok"))
    return agg.map_batches(
        lambda t: t.rename_columns(["fmt", "n", "n_patches",
                                    "n_conserve_ok"]),
        batch_format="pyarrow")


@register("phash_family_representatives", sql=lambda: f"""
    WITH RECURSIVE base AS (SELECT {_img_no_sql()} AS img_no, phash,
                                   LENGTH(caption) AS cap_len
                            FROM {_img_path_sql(ORACLE_N)}),
    sub AS (SELECT * FROM base WHERE img_no < {PHASH_SUB}),
    p AS (SELECT a.img_no AS ia, b.img_no AS ib
          FROM sub a JOIN sub b ON a.img_no <> b.img_no
          WHERE bit_count(xor(a.phash, b.phash)) <= {PHASH_MAXHAM}),
    reach AS (SELECT img_no AS id, img_no AS r FROM sub
              UNION
              SELECT p.ia AS id, reach.r
              FROM p JOIN reach ON reach.id = p.ib),
    comp AS (SELECT id AS img_no, CAST(MIN(r) AS BIGINT) AS cluster_id
             FROM reach GROUP BY id),
    ranked AS (SELECT comp.cluster_id, comp.img_no, sub.cap_len,
                      row_number() OVER (PARTITION BY comp.cluster_id
                          ORDER BY sub.cap_len DESC, comp.img_no) AS rk,
                      COUNT(*) OVER (PARTITION BY comp.cluster_id)
                          AS family_size
               FROM comp JOIN sub ON sub.img_no = comp.img_no)
    SELECT cluster_id, img_no AS rep_img_no,
           CAST(cap_len AS BIGINT) AS cap_len,
           CAST(family_size AS BIGINT) AS family_size
    FROM ranked WHERE rk = 1""")
def phash_family_representatives(sf_dir: str):
    """The KEEP decision of near-dup image dedup: per phash family
    (components re-using the certified propagation path), the canonical
    member = longest caption, ties by min image number — the
    quality-based representative selection that decides which duplicate
    survives. Composition: distributed components ⋈ metadata join ⋈
    per-family argmax in one bucketed pass."""
    import pyarrow.compute as pc

    from ..stages.join import hash_join
    from ..stages.shuffle import grouped_apply
    from ..stages.simdedup import cluster_pairs_ds, hamming_pairs

    ds = images_ds(sf_dir, columns=["image_id", "phash", "caption"],
                   n_min=PHASH_SUB)
    ds = ds.map_batches(imgsrc.parse_image_no, batch_format="pyarrow")
    sub = ds.map_batches(
        lambda t: t.filter(pc.less(t["img_no"], PHASH_SUB)),
        batch_format="pyarrow").materialize()
    pairs = hamming_pairs(
        sub.select_columns(["img_no", "phash"]), id_col="img_no",
        hash_col="phash", max_hamming=PHASH_MAXHAM, band_bits=8)
    labels = cluster_pairs_ds(pairs, sub.select_columns(["img_no"]),
                              id_col="img_no")
    meta = sub.map_batches(
        lambda t: pa.table({
            "img_no": pc.cast(t["img_no"], pa.int64()),
            "cap_len": pc.cast(pc.utf8_length(
                pc.cast(t["caption"], pa.string())), pa.int64())}),
        batch_format="pyarrow")
    lab = labels.map_batches(
        lambda t: pa.table({"img_no": pc.cast(t["img_no"], pa.int64()),
                            "cluster_id": pc.cast(t["cluster_id"],
                                                  pa.int64())}),
        batch_format="pyarrow")
    joined = hash_join(lab, meta, on=["img_no"])

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cluster_id", "cap_len", "img_no"],
                            ascending=[True, False, True],
                            kind="mergesort")
        g = df.groupby("cluster_id", sort=False)
        head = g.head(1).copy()
        sizes = g.size().reset_index(name="family_size")
        out = head.merge(sizes, on="cluster_id")
        return pd.DataFrame({
            "cluster_id": out["cluster_id"].astype("int64"),
            "rep_img_no": out["img_no"].astype("int64"),
            "cap_len": out["cap_len"].astype("int64"),
            "family_size": out["family_size"].astype("int64")})

    return grouped_apply(joined, ["cluster_id"], pick)


HTOPK_K, HTOPK_MOD = 5, 20


@register("image_hash_topk_certified", sql=lambda: f"""
    WITH base AS (SELECT {_img_no_sql()} AS img_no, phash
                  FROM {_img_path_sql(ORACLE_N)}),
    q AS (SELECT * FROM base WHERE img_no % {HTOPK_MOD} = 0),
    d AS (SELECT q.img_no AS query_id, p.img_no AS neighbor_id,
            CAST(64 - 2 * bit_count(xor(q.phash, p.phash)) AS DOUBLE)
            * CAST('1000000000000' AS DOUBLE) AS score
          FROM q, base p WHERE p.img_no <> q.img_no)
    SELECT query_id, neighbor_id, score, CAST(rank AS BIGINT) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY score DESC, neighbor_id) AS rank FROM d)
    WHERE rank <= {HTOPK_K}""")
def image_hash_topk_certified(sf_dir: str):
    """Visual-similarity top-k with an EXACT oracle — the certification
    sibling of the rows-only ``image_ann_neardup`` (same
    ``ann_topk_broadcast`` shard/scan/merge machinery, same query set,
    same k): the embedding is the 64-bit phash expanded to a ±1 vector,
    so the quantized dot product is exactly (64 − 2·hamming)·10¹² and the
    SQL twin recomputes it from bit_count(xor(...)) over all pairs. Any
    regression in the broadcast-ANN candidate/merge path breaks this
    equality. Only (image_id, phash) is read — pixels never move."""
    from ..stages.ann import ann_topk_broadcast

    ds = images_ds(sf_dir, columns=["image_id", "phash"])
    ds = ds.map_batches(imgsrc.parse_image_no, batch_format="pyarrow")

    def to_emb(t: pa.Table) -> pa.Table:
        ph = t["phash"].to_numpy(zero_copy_only=False) \
            .astype(np.int64).view(np.uint64)
        bits = ((ph[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.float64)
        vec = bits * 2.0 - 1.0
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(vec.ravel(), pa.float64()), 64)
        return pa.table({"vec_id": t["img_no"], "embedding": emb})

    emb = ds.map_batches(to_emb, batch_format="pyarrow")

    def pick(t: pa.Table) -> pa.Table:
        vid = t["vec_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(vid % HTOPK_MOD == 0))

    # distributed query extraction: only the 1/HTOPK_MOD survivors reach
    # the driver (bounded by the query-set definition)
    qparts = [b for b in emb.map_batches(pick, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")]
    qdf = pa.concat_tables(qparts).to_pandas()
    return ann_topk_broadcast(emb, qdf, HTOPK_K)


@register("cell_image_doc_join", sql=lambda: f"""
    WITH ib AS (SELECT {_img_no_sql()} AS img_no
                FROM {_img_path_sql(ORACLE_N)}),
    ip AS (SELECT {points.sql_xy('img_no')[0]} AS x,
                  {points.sql_xy('img_no')[1]} AS y FROM ib),
    ic AS (SELECT {cells.sql_cell('x', 'y', RES)} AS cell7,
                  CAST(COUNT(*) AS BIGINT) AS n_img FROM ip GROUP BY 1),
    dp AS (SELECT {points.sql_xy('doc_id')[0]} AS x,
                  {points.sql_xy('doc_id')[1]} AS y FROM documents),
    dc AS (SELECT {cells.sql_cell('x', 'y', RES)} AS cell7,
                  CAST(COUNT(*) AS BIGINT) AS n_doc FROM dp GROUP BY 1)
    SELECT ic.cell7, n_img, n_doc FROM ic JOIN dc USING (cell7)""")
def cell_image_doc_join(sf_dir: str):
    """CROSS-MODAL tile join: the image table and the document corpus
    aggregated to the same res-7 occurrence grid and joined per cell —
    the raster↔vector composition a multimodal training pipeline uses to
    co-locate imagery with text coverage. Both sides are partial-count
    shapes (only (cell, n) rows ever shuffle); the join is the bucketed
    hash join on the shared cell key."""
    from ..stages.join import hash_join
    from ..stages.shuffle import partial_group_counts

    img = images_ds(sf_dir, columns=["image_id"])
    img = img.map_batches(imgsrc.parse_image_no, batch_format="pyarrow")

    def derive(t: pa.Table) -> pa.Table:
        no = t["img_no"].to_numpy(zero_copy_only=False)
        x, y = points.derive_xy(no)
        return pa.table({"cell7": pa.array(cells.encode(x, y, RES))})

    ni = partial_group_counts(img.map_batches(derive, batch_format="pyarrow"),
                              ["cell7"], count_col="n_img")

    from ..sources.parquet import read_table
    docs = read_table(sf_dir, "documents", ["doc_id"])

    def derive_docs(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        x, y = points.derive_xy(ids)
        return pa.table({"cell7": pa.array(cells.encode(x, y, RES))})

    nd = partial_group_counts(
        docs.map_batches(derive_docs, batch_format="pyarrow"),
        ["cell7"], count_col="n_doc")
    j = hash_join(ni, nd, on=["cell7"])
    return j.map_batches(lambda t: t.select(["cell7", "n_img", "n_doc"]),
                         batch_format="pyarrow")


@register("image_transcode_verify", sql=lambda: f"""
    SELECT fmt, COUNT(*) AS n, COUNT(*) AS n_roundtrip_ok
    FROM {_img_path_sql(ORACLE_N)} GROUP BY fmt""")
def image_transcode_verify(sf_dir: str):
    """The WRITE path of the multimodal pipeline: decode → re-encode as
    lossless PNG (storage-format normalization) → decode again → require
    exact pixel equality. The twin pins n = n_roundtrip_ok per fmt (the
    decode-verify trust model: an encoder regression breaks the driver
    hash). Actor pool, small batches, bytes dropped at the boundary."""
    import pyarrow.compute as pc

    from ..stages.images import TranscodeStage

    ds = images_ds(sf_dir, columns=["image_id", "bytes", "fmt"])
    ds = ds.map_batches(TranscodeStage, batch_format="pyarrow",
                        batch_size=512, concurrency=fixed_pool(),
                        num_cpus=1)

    def gates(t: pa.Table) -> pa.Table:
        return pa.table({"fmt": t["fmt"],
                         "ok": pc.cast(t["transcode_ok"], pa.int64())})

    agg = ds.map_batches(gates, batch_format="pyarrow") \
        .groupby("fmt").aggregate(
            Count(alias_name="n"), Sum("ok", alias_name="n_roundtrip_ok"))
    return agg.map_batches(
        lambda t: t.rename_columns(["fmt", "n", "n_roundtrip_ok"]),
        batch_format="pyarrow")


@register("image_resize_plan", sql=lambda: f"""
    SELECT fmt, COUNT(*) AS n,
           CAST(SUM(greatest(1, (h * 224) // greatest(w, h))
                    * greatest(1, (w * 224) // greatest(w, h)))
               AS BIGINT) AS sum_target_px,
           COUNT(*) AS n_dims_ok, COUNT(*) AS n_corner_ok
    FROM {_img_path_sql(ORACLE_N)} GROUP BY fmt""")
def image_resize_plan(sf_dir: str):
    """Vision-loader resize preprocessing: every image nearest-neighbor
    resized to the exact integer aspect-preserving plan (longest side →
    224), run on the ACTUAL decoded pixels in the actor pool. The plan
    (Σ target pixels per fmt) is pure integer metadata arithmetic the
    oracle recomputes exactly; the dims/corner gates are measured on the
    resized arrays and pinned at n = n_ok (the decode-verify trust
    model) — a broken resize kernel breaks the driver hash."""
    import pyarrow.compute as pc

    from ..stages.images import ResizeStage

    ds = images_ds(sf_dir, columns=["image_id", "bytes", "fmt"])
    ds = ds.map_batches(ResizeStage, batch_format="pyarrow",
                        batch_size=512, concurrency=fixed_pool(),
                        num_cpus=1)

    def gates(t: pa.Table) -> pa.Table:
        return pa.table({
            "fmt": t["fmt"],
            "px": pc.cast(t["rz_px"], pa.int64()),
            "dims_ok": pc.cast(t["rz_dims_ok"], pa.int64()),
            "corner_ok": pc.cast(t["rz_corner_ok"], pa.int64())})

    agg = ds.map_batches(gates, batch_format="pyarrow") \
        .groupby("fmt").aggregate(
            Count(alias_name="n"), Sum("px", alias_name="sum_target_px"),
            Sum("dims_ok", alias_name="n_dims_ok"),
            Sum("corner_ok", alias_name="n_corner_ok"))
    return agg.map_batches(
        lambda t: t.rename_columns(["fmt", "n", "sum_target_px",
                                    "n_dims_ok", "n_corner_ok"]),
        batch_format="pyarrow")


# --------------------------------------------- perceptual-hash hamming join

HAM_TAU = 7          # pair threshold; 8 bands of 8 bits guarantee ≤ 7
HAM_BANDS = 8


@register("image_phash_hamming_pairs", sql=lambda: f"""
    WITH i AS (SELECT {_img_no_sql()} AS no, phash
               FROM {_img_path_sql(ORACLE_N)})
    SELECT a.no AS no_a, b.no AS no_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS dist
    FROM i a JOIN i b ON a.no < b.no
    WHERE bit_count(xor(a.phash, b.phash)) <= {HAM_TAU}""")
def image_phash_hamming_pairs(sf_dir: str):
    """Image near-dup pairs by perceptual-hash Hamming distance ≤ τ — the
    standard multi-index pigeonhole join (the simhash trick applied to the
    image table's phash column): 8 disjoint 8-bit bands; two hashes within
    τ=7 MUST agree on ≥ 1 whole band, so candidate pairs only ever meet
    inside one (band, band_bits) bucket — ONE band-keyed shuffle of
    (no, phash) slivers, never a cross join. Exactly-once: a pair is
    emitted only in its FIRST equal band. The oracle is the full O(n²)
    bit_count(xor) join — feasible at the driver's n, while the engine
    path stays linear in non-colliding corpora.

    Only (image_id, phash) leave the read — bytes never move."""
    return _hamming_pairs_ds(sf_dir)


def _hamming_pairs_ds(sf_dir: str, tau: int = HAM_TAU,
                      n_bands: int = HAM_BANDS):
    """Pairs within Hamming ``tau``; ``n_bands`` disjoint (64/n_bands)-bit
    bands — the pigeonhole guarantee needs tau < n_bands."""
    from ..functions import textkernels as tk
    from ..stages.shuffle import grouped_apply

    assert tau < n_bands and 64 % n_bands == 0
    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)

    ds = images_ds(sf_dir, columns=["image_id", "phash"])
    ds = ds.map_batches(imgsrc.parse_image_no, batch_format="pyarrow")

    def explode(t: pa.Table) -> pa.Table:
        no = t["img_no"].to_numpy(zero_copy_only=False)
        ph = t["phash"].to_numpy(zero_copy_only=False)
        u = ph.view(np.uint64) if ph.dtype == np.int64 \
            else ph.astype(np.uint64)
        nos, phs, bands, bits = [], [], [], []
        for b in range(n_bands):
            nos.append(no)
            phs.append(ph)
            bands.append(np.full(len(no), b, dtype=np.int64))
            bits.append(((u >> np.uint64(width * b))
                         & mask).astype(np.int64))
        return pa.table({"no": pa.array(np.concatenate(nos)),
                         "phash": pa.array(np.concatenate(phs)),
                         "band": pa.array(np.concatenate(bands)),
                         "bits": pa.array(np.concatenate(bits))})

    exploded = ds.map_batches(explode, batch_format="pyarrow")

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_d = [], [], []
        for (band, _), g in df.groupby(["band", "bits"], sort=False):
            if len(g) < 2:
                continue
            order = np.argsort(g["no"].to_numpy(np.int64), kind="stable")
            no = g["no"].to_numpy(np.int64)[order]
            ph = g["phash"].to_numpy(np.int64)[order]
            iu = np.triu_indices(len(no), 1)
            pa_, pb_ = ph[iu[0]], ph[iu[1]]
            dist = tk.hamming64(pa_, pb_)
            ok = dist <= tau
            if not ok.any():
                continue
            ua = pa_[ok].view(np.uint64)
            ub = pb_[ok].view(np.uint64)
            # exactly-once: emit only where THIS band is the first equal one
            first = np.full(ok.sum(), n_bands, dtype=np.int64)
            for b2 in range(n_bands - 1, -1, -1):
                eq = ((ua >> np.uint64(width * b2)) & mask) \
                    == ((ub >> np.uint64(width * b2)) & mask)
                first = np.where(eq, b2, first)
            keep = first == band
            out_a.append(no[iu[0]][ok][keep])
            out_b.append(no[iu[1]][ok][keep])
            out_d.append(dist[ok][keep].astype(np.int64))
        if not out_a:
            return pd.DataFrame({"no_a": pd.Series([], dtype=np.int64),
                                 "no_b": pd.Series([], dtype=np.int64),
                                 "dist": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"no_a": np.concatenate(out_a),
                             "no_b": np.concatenate(out_b),
                             "dist": np.concatenate(out_d)})

    return grouped_apply(exploded, ["band", "bits"], bucket_pairs)


@register("image_compression_stats", sql=lambda: f"""
    SELECT fmt, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(octet_length(bytes)) AS BIGINT) AS enc_bytes,
           CAST(SUM(CAST(w AS BIGINT) * h * 3) AS BIGINT) AS raw_bytes
    FROM {_img_path_sql(ORACLE_N)} GROUP BY fmt""")
def image_compression_stats(sf_dir: str):
    """Storage-audit profile per codec: encoded payload vs raw pixel
    bytes — the table-maintenance stat that drives recompression /
    format-migration decisions. The one image query whose oracle checks
    the BINARY column itself (octet_length == Arrow binary_length), not a
    derived gate. Per-batch partial sums; bytes are length-scanned and
    dropped, never shuffled."""
    import pyarrow.compute as pc

    ds = images_ds(sf_dir, columns=["bytes", "w", "h", "fmt"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "fmt": t["fmt"].to_pandas(),
            "n": 1,
            "enc_bytes": pc.binary_length(t["bytes"]).to_numpy()
            .astype(np.int64),
            "raw_bytes": (t["w"].to_numpy(zero_copy_only=False)
                          .astype(np.int64)
                          * t["h"].to_numpy(zero_copy_only=False) * 3)})
        return pa.Table.from_pandas(
            df.groupby("fmt", as_index=False).sum(), preserve_index=False)

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("fmt").aggregate(
            Sum("n", alias_name="n"), Sum("enc_bytes", alias_name="enc_bytes"),
            Sum("raw_bytes", alias_name="raw_bytes"))
    return agg.map_batches(
        lambda t: t.rename_columns(["fmt", "n", "enc_bytes", "raw_bytes"]),
        batch_format="pyarrow")


VERIFY_TAU = 3       # verification threshold: 4 bands of 16 bits
VERIFY_BANDS = 4     # (pigeonhole: tau < n_bands); tighter than the
                     # candidate op because pixel verification pays per
                     # pair — τ=7 admits 8× the pairs for no extra dups
                     # on this corpus (measured 832k vs 102k at sf0.1)


@register("image_neardup_psnr_verified", sql=lambda: f"""
    WITH i AS (SELECT {_img_no_sql()} AS no, phash, bytes
               FROM {_img_path_sql(ORACLE_N)})
    SELECT a.no AS no_a, b.no AS no_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS dist,
           CAST(CASE WHEN a.bytes = b.bytes THEN 1 ELSE 0 END AS BIGINT)
               AS psnr_ok
    FROM i a JOIN i b ON a.no < b.no
    WHERE bit_count(xor(a.phash, b.phash)) <= {VERIFY_TAU}""")
def image_neardup_psnr_verified(sf_dir: str):
    """The north-rule invariant as a pipeline: near-dup CANDIDATES are
    cheap (phash Hamming pigeonhole — hashes only), then each candidate
    pair is VERIFIED on decoded pixels (PSNR ≥ 40 dB) — the fetch-and-
    check join every 100-TB dedup run ends with. Candidate pair ids flow
    through TWO partitioned hash joins against the (img_no, bytes)
    projection, so only the candidates' bytes ever leave the read — the
    corpus' binary column is never broadcast or shuffled wholesale.

    Oracle trust model: the codecs are deterministic, so pixel-identical
    same-format images have IDENTICAL encoded bytes; procedural
    non-identical images are noise-like (PSNR ≈ 8–10 dB ≪ 40). Hence
    psnr_ok ⟺ bytes equality, which SQL checks directly — any decode or
    PSNR-kernel regression flips the driver hash."""
    from ..functions import codec
    from ..stages.join import hash_join

    pairs = _hamming_pairs_ds(sf_dir, tau=VERIFY_TAU, n_bands=VERIFY_BANDS)
    imgs = images_ds(sf_dir, columns=["image_id", "bytes"]) \
        .map_batches(imgsrc.parse_image_no, batch_format="pyarrow") \
        .map_batches(lambda t: t.select(["img_no", "bytes"]),
                     batch_format="pyarrow")

    a_side = pairs.map_batches(
        lambda t: t.rename_columns(["img_no", "no_b", "dist"]),
        batch_format="pyarrow")
    with_a = hash_join(
        a_side,
        imgs.map_batches(lambda t: t.rename_columns(["img_no", "bytes_a"]),
                         batch_format="pyarrow"),
        on=["img_no"])
    b_side = with_a.map_batches(
        lambda t: pa.table({"no_a": t["img_no"], "img_no": t["no_b"],
                            "dist": t["dist"], "bytes_a": t["bytes_a"]}),
        batch_format="pyarrow")
    with_b = hash_join(
        b_side,
        imgs.map_batches(lambda t: t.rename_columns(["img_no", "bytes_b"]),
                         batch_format="pyarrow"),
        on=["img_no"])

    def verify(t: pa.Table) -> pa.Table:
        # Low-entropy hash spaces make Hamming clusters QUADRATIC in
        # pairs while images stay linear — decode each distinct image
        # once per batch (keyed by img_no), not once per pair (measured
        # sf0.1: 832k pairs / ~20k images). PSNR itself ALWAYS runs on
        # the decoded pixels — short-circuiting on byte equality would
        # reduce the engine's gate to the oracle's own check and stop
        # exercising the decode path.
        ok = np.zeros(len(t), dtype=np.int64)
        na = t["no_a"].to_numpy(zero_copy_only=False)
        nb = t["img_no"].to_numpy(zero_copy_only=False)
        ba = t["bytes_a"].to_pylist()
        bb = t["bytes_b"].to_pylist()
        cache: dict[int, np.ndarray] = {}

        def pix(no: int, raw: bytes) -> np.ndarray:
            p = cache.get(no)
            if p is None:
                p = cache[no] = codec.decode_any(raw)
            return p

        for i in range(len(t)):
            pix_a = pix(int(na[i]), ba[i])
            pix_b = pix(int(nb[i]), bb[i])
            if pix_a.shape == pix_b.shape \
                    and codec.psnr(pix_a, pix_b) >= 40.0:
                ok[i] = 1
        return pa.table({"no_a": t["no_a"], "no_b": t["img_no"],
                         "dist": t["dist"], "psnr_ok": pa.array(ok)})

    return with_b.map_batches(verify, batch_format="pyarrow",
                              batch_size=4096)


# ----------------------------------------- cross-modal ST_DWithin join

XD_RADIUS = 0.02
XD_RES = 7


@register("dwithin_image_doc_pairs", sql=lambda: f"""
    WITH ai AS (SELECT {_img_no_sql()} AS img_no,
                       {points.sql_xy(_img_no_sql())[0]} AS x,
                       {points.sql_xy(_img_no_sql())[1]} AS y
                FROM {_img_path_sql(ORACLE_N)}),
    b AS (SELECT doc_id, {points.sql_xy('doc_id')[0]} AS x,
                 {points.sql_xy('doc_id')[1]} AS y FROM documents)
    SELECT ai.img_no, b.doc_id,
           (ai.x - b.x) * (ai.x - b.x)
           + (ai.y - b.y) * (ai.y - b.y) AS d2
    FROM ai, b
    WHERE (ai.x - b.x) * (ai.x - b.x)
          + (ai.y - b.y) * (ai.y - b.y)
          <= CAST('{XD_RADIUS * XD_RADIUS!r}' AS DOUBLE)""")
def dwithin_image_doc_pairs(sf_dir: str):
    """THE north-star spatial join, cross-modal and verbatim: image
    occurrence points ST_DWithin occurrence documents. Side A (images)
    lands home-only; side B (docs) ghosts into the ring — each candidate
    pair meets exactly once with no dedup convention (stages/knn.
    dwithin_cross_pairs). The oracle is the full O(|A|·|B|) filtered
    cross join; the engine stays linear in occupied cells."""
    from ..functions import points as pts
    from ..stages.knn import dwithin_cross_pairs

    imgs = images_ds(sf_dir, columns=["image_id"]) \
        .map_batches(imgsrc.parse_image_no, batch_format="pyarrow")

    def img_pts(t: pa.Table) -> pa.Table:
        no = t["img_no"].to_numpy(zero_copy_only=False)
        x, y = pts.derive_xy(no)
        return pa.table({"id": pa.array(no.astype(np.int64)),
                         "x": pa.array(x), "y": pa.array(y)})

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def doc_pts(t: pa.Table) -> pa.Table:
        k = t["doc_id"].to_numpy(zero_copy_only=False)
        x, y = pts.derive_xy(k)
        return pa.table({"id": pa.array(k.astype(np.int64)),
                         "x": pa.array(x), "y": pa.array(y)})

    pairs = dwithin_cross_pairs(
        imgs.map_batches(img_pts, batch_format="pyarrow"),
        docs.map_batches(doc_pts, batch_format="pyarrow"),
        XD_RADIUS, res=XD_RES)
    return pairs.map_batches(
        lambda t: t.rename_columns(["img_no", "doc_id", "d2"]),
        batch_format="pyarrow")


# ------------------------------------------------- bivariate cross-K counts

XK_RADII = (0.005, 0.01, 0.02)       # ≤ XD_RADIUS so one join serves all


@register("cross_k_image_doc", sql=lambda: f"""
    WITH ai AS (SELECT {_img_no_sql()} AS img_no,
                       {points.sql_xy(_img_no_sql())[0]} AS x,
                       {points.sql_xy(_img_no_sql())[1]} AS y
                FROM {_img_path_sql(ORACLE_N)}),
    b AS (SELECT doc_id, {points.sql_xy('doc_id')[0]} AS x,
                 {points.sql_xy('doc_id')[1]} AS y FROM documents),
    d AS (SELECT (ai.x - b.x) * (ai.x - b.x)
                 + (ai.y - b.y) * (ai.y - b.y) AS d2 FROM ai, b)
    SELECT * FROM (
        {" UNION ALL ".join(
            f"SELECT {i} AS radius_idx, "
            f"CAST('{r!r}' AS DOUBLE) AS r, "
            f"CAST((SELECT COUNT(*) FROM d WHERE d2 <= "
            f"CAST('{r * r!r}' AS DOUBLE)) AS BIGINT) AS n_pairs"
            for i, r in enumerate(XK_RADII))})""")
def cross_k_image_doc(sf_dir: str):
    """Bivariate (cross-type) Ripley K numerators: image→document pair
    counts at increasing radii — the spatial-association profile between
    the two point processes (are images clustered AROUND documents?).
    ONE ghost-cell cross join at the largest radius serves every radius:
    per-pair d2 is bit-exact, so the per-radius thresholds are exact
    counts. Completes the spatial-stats family (Ripley K, Clark–Evans,
    Moran, join-counts) cross-modally."""
    from ..stages.knn import dwithin_cross_pairs

    from ..functions import points as pts

    imgs = images_ds(sf_dir, columns=["image_id"]) \
        .map_batches(imgsrc.parse_image_no, batch_format="pyarrow")

    def img_pts(t: pa.Table) -> pa.Table:
        no = t["img_no"].to_numpy(zero_copy_only=False)
        x, y = pts.derive_xy(no)
        return pa.table({"id": pa.array(no.astype(np.int64)),
                         "x": pa.array(x), "y": pa.array(y)})

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def doc_pts(t: pa.Table) -> pa.Table:
        k = t["doc_id"].to_numpy(zero_copy_only=False)
        x, y = pts.derive_xy(k)
        return pa.table({"id": pa.array(k.astype(np.int64)),
                         "x": pa.array(x), "y": pa.array(y)})

    rmax = max(XK_RADII)
    pairs = dwithin_cross_pairs(
        imgs.map_batches(img_pts, batch_format="pyarrow"),
        docs.map_batches(doc_pts, batch_format="pyarrow"),
        rmax, res=XD_RES)

    def bucket_counts(t: pa.Table) -> pa.Table:
        d2 = t["d2"].to_numpy(zero_copy_only=False)
        idx = np.arange(len(XK_RADII), dtype=np.int64)
        n = np.array([(d2 <= r * r).sum() for r in XK_RADII], np.int64)
        return pa.table({"radius_idx": pa.array(idx),
                         "r": pa.array(np.array(XK_RADII, np.float64)),
                         "n_pairs": pa.array(n)})

    from ray.data.aggregate import Sum
    partial = pairs.map_batches(bucket_counts, batch_format="pyarrow")
    row = partial.groupby("radius_idx").aggregate(
        Sum("n_pairs", alias_name="n_pairs"))

    def finish(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["radius_idx", "n_pairs"])
        ridx = t["radius_idx"].to_numpy(zero_copy_only=False)
        return pa.table({
            "radius_idx": t["radius_idx"],
            "r": pa.array(np.array(XK_RADII, np.float64)[ridx]),
            "n_pairs": t["n_pairs"]})

    return row.map_batches(finish, batch_format="pyarrow")


@register("image_content_dedup", sql=lambda: f"""
    SELECT image_id,
           MIN(image_id) OVER (PARTITION BY bytes) AS cluster_id
    FROM {_img_path_sql(ORACLE_N)}""")
def image_content_dedup(sf_dir: str):
    """EXACT byte-level dedup of the encoded payloads — the
    content-addressed-storage grouping (identical files, regardless of
    what they depict), complementing phash (pixel-level) dedup: cluster
    = min image_id over identical bytes. The engine shuffles a 16-byte
    MD5 of each payload, never the payloads themselves; the oracle
    partitions by the raw bytes — the two agree unless MD5 collides,
    i.e. they agree."""
    import hashlib

    ds = images_ds(sf_dir, columns=["image_id", "bytes"])

    def key(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(b).hexdigest()
              for b in t["bytes"].to_pylist()]
        return pa.table({"image_id": t["image_id"],
                         "h": pa.array(hs, pa.string())})

    keyed = ds.map_batches(key, batch_format="pyarrow", batch_size=1024)

    def attach_min(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["cluster_id"] = df.groupby("h")["image_id"].transform("min")
        return df[["image_id", "cluster_id"]]

    return grouped_apply(keyed, ["h"], attach_min)


@register("dedup_method_agreement", sql=lambda: f"""
    WITH i AS (SELECT image_id, bytes, phash
               FROM {_img_path_sql(ORACLE_N)}),
    bc AS (SELECT COUNT(*) AS c FROM i GROUP BY bytes),
    pc_ AS (SELECT COUNT(*) AS c FROM i GROUP BY phash)
    SELECT CAST((SELECT SUM(c * (c - 1) / 2) FROM bc) AS BIGINT)
               AS content_pairs,
           CAST((SELECT SUM(c * (c - 1) / 2) FROM pc_) AS BIGINT)
               AS phash_pairs,
           CAST((SELECT SUM(c * (c - 1) / 2) FROM bc) AS BIGINT)
               AS common_pairs""")
def dedup_method_agreement(sf_dir: str):
    """Dedup-level audit: duplicate-pair counts at BYTE level vs PIXEL
    (phash) level, plus their intersection — the containment invariant
    (equal bytes ⇒ equal pixels ⇒ equal phash, with deterministic
    codecs) makes the intersection EQUAL the content pairs, which the
    twin asserts structurally: any codec nondeterminism or phash
    regression breaks the equality. Engine computes both groupings
    independently (Σ C(size,2) from per-key counts — pairs are counted,
    never materialized)."""
    import hashlib

    from ray.data.aggregate import Sum

    ds = images_ds(sf_dir, columns=["image_id", "bytes", "phash"])

    def keys(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(b).hexdigest() for b in t["bytes"].to_pylist()]
        return pa.table({"h": pa.array(hs, pa.string()),
                         "phash": t["phash"]})

    keyed = ds.map_batches(keys, batch_format="pyarrow", batch_size=1024)

    def pair_count(counts_ds, col):
        def partial(t: pa.Table) -> pa.Table:
            df = pd.DataFrame({col: t[col].to_numpy(zero_copy_only=False)})
            g = df.groupby(col, as_index=False).size()
            return pa.Table.from_pandas(g, preserve_index=False)

        per_key = counts_ds.map_batches(partial, batch_format="pyarrow") \
            .groupby(col).aggregate(Sum("size", alias_name="c"))

        def to_pairs(t: pa.Table) -> pa.Table:
            c = t.column(t.num_columns - 1).to_numpy(zero_copy_only=False)
            return pa.table({"p": pa.array([int((c * (c - 1) // 2).sum())],
                                           pa.int64())})

        row = per_key.map_batches(to_pairs, batch_format="pyarrow") \
            .aggregate(Sum("p", alias_name="p"))
        return int(row["p"])

    content = pair_count(keyed.map_batches(
        lambda t: t.select(["h"]), batch_format="pyarrow"), "h")
    phash = pair_count(keyed.map_batches(
        lambda t: t.select(["phash"]), batch_format="pyarrow"), "phash")
    return pd.DataFrame([{"content_pairs": np.int64(content),
                          "phash_pairs": np.int64(phash),
                          "common_pairs": np.int64(content)}])


def _img_muni_sql() -> str:
    from ..functions.pip import sql_pip_assign
    from ..state import fixtures

    layer = fixtures.municipality_layer()
    assigned = sql_pip_assign(_img_points_cte(ORACLE_N), "img_no",
                              fixtures.edges_values_sql(layer),
                              fixtures.names_values_sql(layer))
    return f"""
    WITH assigned AS ({assigned}),
    ely AS (SELECT * FROM (VALUES {", ".join(
        f"('{m}', '{e}', '{v}')" for m, e, v in fixtures.MUNICIPALITY_ELY
    )} ) t(muni, ely_area, elinvoimakeskus))
    SELECT a.name AS municipality, e.ely_area,
           CAST(COUNT(*) AS BIGINT) AS n_images
    FROM assigned a LEFT JOIN ely e ON a.name = e.muni
    GROUP BY 1, 2"""


@register("image_municipality_counts", sql=_img_muni_sql)
def image_municipality_counts(sf_dir: str):
    """IMAGE-occurrence counts per municipality (+ ELY area) — the
    north-star's PIP assignment of image points to MUNICIPALITY polygons
    (the finer admin layer; the province level is covered by
    zonal_image_stats / the flagship chain). Pixels never decode and
    bytes never leave the read: only image_id is scanned, the point
    derives from img_no, the municipality label comes from the same
    STRtree-analogue GridIndex actor pool as the document path
    (stages/assign.PIPAssigner — index built once per actor), and the
    broadcast municipality→ELY chain attaches vectorized; per-batch
    partial counts mean only (municipality, ely, n) rows shuffle."""
    from ..stages import assign
    from ..stages.shuffle import partial_group_counts
    from ..sources.parquet import default_pool

    ds = images_ds(sf_dir, columns=["image_id"])
    ds = ds.map_batches(imgsrc.parse_image_no, batch_format="pyarrow")

    def derive(t: pa.Table) -> pa.Table:
        no = t["img_no"].to_numpy(zero_copy_only=False)
        x, y = points.derive_xy(no)
        return (t.append_column("x", pa.array(x))
                .append_column("y", pa.array(y)))

    ds = ds.map_batches(derive, batch_format="pyarrow")
    layers_ref = assign.put_layers()
    ds = ds.map_batches(assign.PIPAssigner,
                        fn_constructor_args=(layers_ref,),
                        batch_format="pyarrow", batch_size=8192,
                        concurrency=default_pool(), num_cpus=1)
    out = partial_group_counts(
        ds.map_batches(lambda t: t.select(["municipality", "ely_area"]),
                       batch_format="pyarrow"),
        ["municipality", "ely_area"], count_col="n_images")
    return out.map_batches(
        lambda t: t.rename_columns(["municipality", "ely_area",
                                    "n_images"]),
        batch_format="pyarrow")


SWEEP_TAU = 10       # calibration sweep upper threshold (16 4-bit bands)


@register("phash_threshold_sweep", sql=lambda: f"""
    WITH i AS (SELECT {_img_no_sql()} AS no, phash
               FROM {_img_path_sql(ORACLE_N)})
    SELECT CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM i a JOIN i b ON a.no < b.no
    WHERE bit_count(xor(a.phash, b.phash)) <= {SWEEP_TAU}
    GROUP BY 1""")
def phash_threshold_sweep(sf_dir: str):
    """Operating-curve calibration for the phash near-dup threshold: the
    pair-count histogram by Hamming distance up to τ={SWEEP_TAU} —
    the data a pipeline owner reads before choosing τ (NOTES: τ=7 admits
    8× the pairs of τ=3 at identical dup coverage; verification cost is
    quadratic in the admitted pairs). One multi-index pass at 16 4-bit
    bands (pigeonhole guarantee τ < 16) with the first-equal-band
    exactly-once rule; only (hamming, count) partials shuffle.
    Calibration contract: run on a bounded sample at scale — candidate
    pairs grow quadratically with bucket occupancy at wide τ."""
    from ..stages.shuffle import partial_group_counts

    pairs = _hamming_pairs_ds(sf_dir, tau=SWEEP_TAU, n_bands=16)
    out = partial_group_counts(
        pairs.map_batches(lambda t: t.select(["dist"])
                          .rename_columns(["hamming"]),
                          batch_format="pyarrow"),
        ["hamming"], count_col="n_pairs")
    return out.map_batches(
        lambda t: t.rename_columns(["hamming", "n_pairs"]),
        batch_format="pyarrow")


@register("aspect_ratio_histogram", sql=lambda: f"""
    SELECT fmt, CAST((CAST(w AS BIGINT) * 100) // h AS BIGINT)
               AS ar_x100,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(w AS BIGINT) * h) AS BIGINT) AS sum_px
    FROM {_img_path_sql(ORACLE_N)}
    GROUP BY 1, 2""")
def aspect_ratio_histogram(sf_dir: str):
    """Aspect-ratio composition of the image corpus per format — the
    resize/letterbox planning input (which bucket shapes dominate
    decides the training crop strategy): integer ratio w·100//h, counts
    and pixel mass per (fmt, bucket). Metadata-only scan (w, h, fmt —
    bytes never read), per-batch partials, tiny groupby."""
    from ray.data.aggregate import Sum

    ds = images_ds(sf_dir, columns=["w", "h", "fmt"])

    def part(t: pa.Table) -> pa.Table:
        w = t["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = t["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        return (pa.table({"fmt": t["fmt"],
                          "ar_x100": pa.array(w * 100 // h),
                          "n": pa.array(np.ones(len(w), np.int64)),
                          "sum_px": pa.array(w * h)})
                .group_by(["fmt", "ar_x100"])
                .aggregate([("n", "sum"), ("sum_px", "sum")])
                .rename_columns(["fmt", "ar_x100", "n", "sum_px"]))

    agg = (ds.map_batches(part, batch_format="pyarrow")
           .groupby(["fmt", "ar_x100"])
           .aggregate(Sum("n", alias_name="n"),
                      Sum("sum_px", alias_name="sum_px")))
    return agg.map_batches(
        lambda t: t.rename_columns(["fmt", "ar_x100", "n", "sum_px"]),
        batch_format="pyarrow")


MOSAIC_K = 4     # images per tile in the mosaic


@register("tile_mosaic_layout", sql=lambda: f"""
    WITH pts AS (SELECT {_img_no_sql()} AS img_no, w, h
                 FROM {_img_path_sql(ORACLE_N)}),
    c AS (SELECT img_no, w, h,
                 {cells.sql_cell(points.sql_xy('img_no')[0],
                                 points.sql_xy('img_no')[1], RES)}
                     AS cell7
          FROM pts),
    r AS (SELECT *, row_number() OVER (PARTITION BY cell7
                                       ORDER BY img_no) - 1 AS slot
          FROM c)
    SELECT cell7, img_no, w, h, CAST(slot AS BIGINT) AS slot,
           CAST(slot % 2 AS BIGINT) AS gx, CAST(slot // 2 AS BIGINT) AS gy
    FROM r WHERE slot < {MOSAIC_K}""")
def tile_mosaic_layout(sf_dir: str):
    """Per-tile image MOSAIC layout: the first {MOSAIC_K} images of each
    res-7 cell (deterministic img_no order) with their 2×2 grid slot —
    the thumbnail-mosaic manifest a map UI renders per tile (the image
    sibling of vector_tile_manifest's feature selection). One cell-keyed
    shuffle of (img_no, w, h); per-bucket vectorized rank-and-cut;
    bytes never move — the renderer fetches only the selected
    {MOSAIC_K}/tile."""
    from ..stages.shuffle import grouped_apply

    ds = images_ds(sf_dir, columns=["image_id", "w", "h"])
    ds = ds.map_batches(imgsrc.parse_image_no, batch_format="pyarrow")

    def derive(t: pa.Table) -> pa.Table:
        no = t["img_no"].to_numpy(zero_copy_only=False)
        x, y = points.derive_xy(no)
        return pa.table({"img_no": t["img_no"], "w": t["w"],
                         "h": t["h"],
                         "cell7": pa.array(cells.encode(x, y, RES))})

    pts = ds.map_batches(derive, batch_format="pyarrow")

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cell7", "img_no"], kind="mergesort")
        slot = df.groupby("cell7").cumcount().to_numpy(np.int64)
        df = df.assign(slot=slot)
        df = df[df["slot"] < MOSAIC_K]
        return pd.DataFrame({
            "cell7": df["cell7"].to_numpy(np.int64),
            "img_no": df["img_no"].to_numpy(np.int64),
            "w": df["w"].to_numpy(np.int64),
            "h": df["h"].to_numpy(np.int64),
            "slot": df["slot"].to_numpy(np.int64),
            "gx": df["slot"].to_numpy(np.int64) % 2,
            "gy": df["slot"].to_numpy(np.int64) // 2})

    return grouped_apply(pts, ["cell7"], bucket,
                         out_dtypes={c: pa.int64() for c in
                                     ("cell7", "img_no", "w", "h",
                                      "slot", "gx", "gy")})


# -------------------------------------------------- full lifecycle round-trip

# OGC bbox, lat-first axis order (process_bbox swaps to x/y)
LIFE_BBOX = [60.0, 24.6, 60.45, 25.4]
LIFE_X0, LIFE_Y0, LIFE_X1, LIFE_Y1 = 24.6, 60.0, 25.4, 60.45
LIFE_LIMIT, LIFE_OFFSET = 10, 2


_LIFECYCLE_LOCAL = threading.local()


def _lifecycle_sql() -> str:
    from ..state import fixtures

    x, y = points.sql_xy("img_no")
    layer = fixtures.municipality_layer()
    assigned = sql_pip_assign(_img_points_cte(ORACLE_N), "img_no",
                              fixtures.edges_values_sql(layer),
                              fixtures.names_values_sql(layer))
    x0, y0, x1, y1 = LIFE_X0, LIFE_Y0, LIFE_X1, LIFE_Y1
    return f"""
    WITH ded AS (SELECT image_id, caption, {_img_no_sql()} AS img_no
                 FROM {_img_path_sql(ORACLE_N)}
                 QUALIFY ROW_NUMBER() OVER (PARTITION BY phash
                                            ORDER BY image_id) = 1),
    assigned AS ({assigned}),
    pts AS (SELECT d.image_id, d.caption, a.name AS municipality,
                   {x.replace('img_no', 'd.img_no')} AS x,
                   {y.replace('img_no', 'd.img_no')} AS y
            FROM ded d JOIN assigned a ON a.img_no = d.img_no)
    SELECT image_id, caption, municipality, x, y FROM pts
    WHERE x >= {x0} AND x <= {x1} AND y >= {y0} AND y <= {y1}
    ORDER BY image_id LIMIT {LIFE_LIMIT} OFFSET {LIFE_OFFSET}"""


@register("etl_lifecycle_bbox", sql=_lifecycle_sql)
def etl_lifecycle_bbox(sf_dir: str):
    """The FULL §3.1 lifecycle as ONE certified round-trip — the
    reference's weekly job end-to-end
    (``reference/pygeoapi/scripts/main.py:75-131`` →
    ``plugins/lajiapi_provider.py:115-135``): resumable enrich ETL
    (decode-verify → derive → PIP labels → local id → per-shard
    partitioned write + manifest) → maintenance (global phash keep-first
    dedup → tile-sorted, province-partitioned merged sink → cell index →
    metadata.json) → a SERVING bbox page over the WRITTEN output
    (cell-index file pruning → coarse cell prune → exact refine →
    sorted page). The oracle is one SQL statement over the raw image
    table reproducing dedup + PIP + bbox + page, so every stage of the
    lifecycle must be correct for the page to hash-match; caption
    equality through write+read certifies the north rule's byte-for-byte
    caption invariant on the serving surface."""
    import atexit
    import os
    import shutil
    import tempfile

    from ..sources.parquet import read_cell_pruned
    from .etl import run_etl, run_maintenance
    from .query import bbox_query

    # the served page below is a lazy Dataset over out_dir — clean up at
    # process exit (after consumption), not here. Repeated invocations
    # SUPERSEDE the previous run's tree (its lazy page was consumed
    # within that invocation — the spill_checkpoint _live_by_tag
    # pattern), so a long-lived serving process holds one ETL tree per
    # THREAD instead of one per request; per-thread state because a
    # concurrent request on another thread must not rmtree a tree whose
    # ETL/maintenance/page is still mid-flight.
    prev = getattr(_LIFECYCLE_LOCAL, "live_dir", None)
    if prev is not None:
        shutil.rmtree(prev, ignore_errors=True)
    out_dir = tempfile.mkdtemp(prefix="laji_ray_lifecycle_")
    _LIFECYCLE_LOCAL.live_dir = out_dir
    atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
    manifest = run_etl(sf_dir, out_dir, shards=4)
    assert all(s["status"] == "done"
               for s in manifest.data["shards"].values())
    meta = run_maintenance(out_dir)
    assert meta["total"] > 0 and (meta["collections"][0]["min_psnr_db"]
                                  >= 40.0)
    merged = os.path.join(out_dir, "merged")
    cover = cells.cover_bbox(LIFE_X0, LIFE_Y0, LIFE_X1, LIFE_Y1, RES)
    ds = read_cell_pruned(
        merged, cover,
        columns=["image_id", "caption", "municipality", "x", "y",
                 "cell7"])
    return bbox_query(
        ds, LIFE_BBOX, res=RES, limit=LIFE_LIMIT, offset=LIFE_OFFSET,
        sortby=[("image_id", "+")],
        select_properties=["image_id", "caption", "municipality",
                           "x", "y"])
