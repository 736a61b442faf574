"""Image payload tests: codec round-trips, PSNR invariant, phash dups,
pipeline stages, oracle parity for the image queries."""
from __future__ import annotations

import numpy as np
import pytest

from laji_pygeoapi_ray.functions import codec
from laji_pygeoapi_ray.sources import images as imgsrc
from tests.conftest import SF_UNIT, assert_query_matches_oracle, duck_con, normalize, to_pandas


def test_png_roundtrip_exact():
    img = codec.procedural_image(7, 64, 32)
    assert np.array_equal(codec.png_decode(codec.png_encode(img)), img)


def test_qz6_psnr_above_40():
    for seed in range(10):
        img = codec.procedural_image(seed, 64, 64)
        dec = codec.qz6_decode(codec.qz6_encode(img))
        assert codec.psnr(img, dec) >= 40.0, seed


def test_ahash_dup_and_resize():
    a = codec.procedural_image(3, 64, 64)
    b = codec.procedural_image(3, 64, 64)
    c = codec.procedural_image(4, 64, 64)
    assert codec.ahash64(a) == codec.ahash64(b)
    assert codec.ahash64(a) != codec.ahash64(c)
    th = codec.block_resize(a, 16, 16)
    assert th.shape == (16, 16, 3)


def test_images_table_schema_and_planted_dups():
    t = imgsrc.images_table(120)
    assert t.schema.equals(imgsrc.IMAGE_SCHEMA)
    ph = t["phash"].to_pylist()
    ids = t["image_id"].to_pylist()
    # n=67 duplicates n=17's pixels → same phash, different id
    assert ph[67] == ph[17] and ids[67] != ids[17]
    assert ph[66] != ph[16]
    # captions carry diacritics; ids carry '#'
    assert "ä" in t["caption"][0].as_py()
    assert "#" in ids[0]


def test_decode_stage_invariants():
    import pyarrow as pa
    from laji_pygeoapi_ray.stages.images import ImageDecodeStage
    t = imgsrc.images_table(60)
    t = imgsrc.parse_image_no(t)
    out = ImageDecodeStage()(t)
    psnr = np.asarray(out["psnr"].to_pylist())
    fmts = np.asarray(out["fmt"].to_pylist())
    assert (psnr >= 40.0).all()
    assert (psnr[fmts == "png"] == 99.0).all()       # lossless exact
    # caption byte-equality through the stage
    assert out["caption"].to_pylist() == t["caption"].to_pylist()


def test_local_id_roundtrip():
    t = imgsrc.images_table(5)
    out = imgsrc.local_id(t)
    lid = out["local_id"][0].as_py()
    assert "#" not in lid and "_" in lid
    # decode inverse (lajiapi_provider.py:147): '_'→'#' restores the id
    head, _, tail = lid.rpartition("_")
    assert head + "#" + tail == t["image_id"][0].as_py()


@pytest.mark.parametrize("name", ["image_phash_dedup", "image_tile_counts"])
def test_image_query_matches_oracle(name):
    """Oracle parity at the unit scale (n=400): rebuild the oracle SQL for
    the unit-sized /tmp table rather than the sf0.01-sized one."""
    import __ray_entry__ as e
    import pandas as pd
    from laji_pygeoapi_ray.pipelines import image_queries as iq

    got = normalize(to_pandas(e.queries()[name](SF_UNIT)))
    n_unit = iq.n_images_for(SF_UNIT)
    from laji_pygeoapi_ray.sources.images import CONTENT_VERSION as _cv
    sql = e.oracle_sql()[name].replace(f"/n{iq.ORACLE_N}v{_cv}/", f"/n{n_unit}v{_cv}/")
    con = duck_con(SF_UNIT)
    exp = normalize(con.sql(sql).df())
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)


def test_thumbnail_stage():
    from laji_pygeoapi_ray.stages.images import ThumbnailStage
    t = imgsrc.images_table(8)
    out = ThumbnailStage(size=16)(t)
    thumb = codec.png_decode(out["thumb_png"][0].as_py())
    assert thumb.shape == (16, 16, 3)
    # deterministic: same input → same thumbnail bytes
    out2 = ThumbnailStage(size=16)(t)
    assert out2["thumb_png"].to_pylist() == out["thumb_png"].to_pylist()


def test_image_embed_ann_finds_planted_dups():
    import ray.data as rd
    from laji_pygeoapi_ray.stages.ann import ann_topk_broadcast
    from laji_pygeoapi_ray.stages.images import ImageEmbedStage

    t = imgsrc.images_table(120)
    t = imgsrc.parse_image_no(t)
    emb_t = ImageEmbedStage()(t).select(["img_no", "img_vec"])
    emb_t = emb_t.rename_columns(["vec_id", "embedding"])
    emb = rd.from_arrow(emb_t)
    qdf = emb_t.to_pandas()
    qdf = qdf[qdf["vec_id"].isin([17, 67])].reset_index(drop=True)
    out = ann_topk_broadcast(emb, qdf, 3).to_pandas()
    # planted pair (17, 67) shares pixels → each other's rank-1 neighbor
    top17 = out[(out["query_id"] == 17) & (out["rank"] == 1)]
    top67 = out[(out["query_id"] == 67) & (out["rank"] == 1)]
    assert top17["neighbor_id"].iloc[0] == 67
    assert top67["neighbor_id"].iloc[0] == 17


def test_decode_stage_tolerates_corrupt_rows():
    import pyarrow as pa
    from laji_pygeoapi_ray.stages.images import ImageDecodeStage
    t = imgsrc.images_table(6)
    t = imgsrc.parse_image_no(t)
    bad = t.column_names.index("bytes")
    payloads = t["bytes"].to_pylist()
    payloads[2] = b"garbage"
    t = t.set_column(bad, "bytes", pa.array(payloads, pa.binary()))
    out = ImageDecodeStage()(t)
    ok = out["decode_ok"].to_pylist()
    assert ok == [True, True, False, True, True, True]
    assert out["psnr"][2].as_py() is None
    # strict mode raises instead
    import pytest as _pytest
    with _pytest.raises(Exception):
        ImageDecodeStage(strict=True)(t)


def test_training_corpus_composition(tmp_path):
    """Row accounting through the composed corpus build: quality gate and
    dedup shrink monotonically, split partitions the survivors, the hive
    sink holds exactly the final rows."""
    import glob
    import os

    import pyarrow.parquet as pq

    from laji_pygeoapi_ray.pipelines.corpus import build_training_corpus
    from tests.conftest import SF_UNIT

    out = str(tmp_path / "corpus")
    ds, c = build_training_corpus(SF_UNIT, out)
    assert c["input"] == 400
    assert 0 < c["after_quality"] <= c["input"]
    assert 0 < c["after_dedup"] <= c["after_quality"]
    files = glob.glob(os.path.join(out, "**", "*.parquet"), recursive=True)
    rows = sum(pq.read_metadata(f).num_rows for f in files)
    assert rows == c["after_dedup"]
    dirs = {os.path.relpath(os.path.dirname(f), out) for f in files}
    assert all(d.startswith("split=") and "province=" in d for d in dirs)
    assert {d.split(os.sep)[0] for d in dirs} == {"split=train", "split=val"}


def test_lance_adapter_falls_back_to_parquet():
    """The Lance adapter (sources/lance.py) reads the Parquet stand-in
    with identical schema when the lance wheel is absent; when present it
    routes .lance paths to ray.data.read_lance (gated, not testable in
    this container — HAVE_LANCE is False here by construction)."""
    from laji_pygeoapi_ray.pipelines.image_queries import n_images_for
    from laji_pygeoapi_ray.sources import images as imgsrc
    from laji_pygeoapi_ray.sources.lance import HAVE_LANCE, read_image_table
    from tests.conftest import SF_UNIT

    path = imgsrc.materialize_images(n_images_for(SF_UNIT))
    ds = read_image_table(path, columns=["image_id", "phash"])
    assert set(ds.schema().names) == {"image_id", "phash"}
    assert ds.count() == 400
    assert not HAVE_LANCE   # container ships no lance wheel (NOTES.md)


def test_augment_stage_invariants_are_measured():
    """AugmentStage computes invariants from the augmented arrays; a
    correct kernel yields all-true flags, and the flags are falsifiable
    (a lossy 'augmentation' would break sum preservation)."""
    import numpy as np
    import pyarrow as pa

    from laji_pygeoapi_ray.functions import codec
    from laji_pygeoapi_ray.stages.images import AugmentStage

    img = codec.procedural_image(123, 32, 64)
    batch = pa.table({
        "fmt": ["png"], "bytes": [codec.png_encode(img)],
        "image_id": ["x"]})
    out = AugmentStage()(batch)
    assert out["aug_sum_ok"].to_pylist() == [True]
    assert out["aug_dims_ok"].to_pylist() == [True]
    assert out["aug_pool_ok"].to_pylist() == [True]
    assert "bytes" not in out.column_names
    # falsifiability: the flip+rot pipeline on a DIFFERENT image would
    # not preserve this image's sum — i.e. the flag tracks real pixels
    other = codec.procedural_image(124, 32, 64)
    assert int(other.sum(dtype=np.int64)) != int(img.sum(dtype=np.int64))


def test_transcode_stage_roundtrip_and_degrade():
    """Exact PNG roundtrip on good rows; corrupt bytes degrade to
    transcode_ok=False (strict=False) instead of killing the batch."""
    import pyarrow as pa

    from laji_pygeoapi_ray.sources.images import images_table
    from laji_pygeoapi_ray.stages.images import TranscodeStage

    t = images_table(6)
    good = TranscodeStage()(t)
    assert good["transcode_ok"].to_pylist() == [True] * 6
    assert all(b > 0 for b in good["png_bytes"].to_pylist())
    assert "bytes" not in good.column_names

    data = t.to_pydict()
    data["bytes"][2] = b"not an image"
    bad = TranscodeStage()(pa.Table.from_pydict(data, schema=t.schema))
    oks = bad["transcode_ok"].to_pylist()
    assert oks[2] is False and sum(oks) == 5
    import pytest

    with pytest.raises(Exception):
        TranscodeStage(strict=True)(pa.Table.from_pydict(data,
                                                         schema=t.schema))


def test_images_ds_n_min_floor():
    """The fixed-subset queries (``img_no < PHASH_SUB``) are sf-invariant
    only if the corpus holds ≥ PHASH_SUB images: at the unit scale the
    corpus is 400, so without the floor the subset silently truncates
    (caught by the sf0.001 cross-scale sweep, round 5)."""
    from laji_pygeoapi_ray.pipelines import image_queries as iq

    assert iq.n_images_for(SF_UNIT) < iq.PHASH_SUB  # the hazard is real
    floored = iq.images_ds(SF_UNIT, columns=["image_id"],
                           n_min=iq.PHASH_SUB)
    assert floored.count() >= iq.PHASH_SUB
