"""Round-4 contract guards: uint64-safe hash_join, sentinel
preconditions failing loudly, AugmentStage odd-dim degrade, the
decontamination broadcast bound, and pagerank path agreement."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data


def test_hash_join_uint64_above_2_63_survives():
    """A uint64 payload column absent on one side must round-trip values
    >= 2^63 (an astype(int64) would wrap them negative)."""
    from laji_pygeoapi_ray.stages.join import hash_join

    big = np.uint64(2 ** 63) + np.uint64(7)
    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "u": pa.array([big, np.uint64(5), np.uint64(2 ** 64 - 1)],
                      pa.uint64())}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 4], pa.int64()),
        "v": pa.array([10, 20, 40], pa.int64())}))
    out = hash_join(left, right, on=["k"], how="inner",
                    num_buckets=4).to_pandas().sort_values("k")
    assert out["k"].tolist() == [1, 2]
    got = sorted(int(x) for x in out["u"])
    assert got == [5, 2 ** 63 + 7]
    # outer: the uint64 column is null-filled on right-only rows but keeps
    # its huge values on left rows. Check at the ARROW level (what
    # downstream stages consume) — a driver to_pandas() of mixed
    # null/non-null uint64 blocks would itself degrade to float64.
    outer_ds = hash_join(left, right, on=["k"], how="outer", num_buckets=4)
    tbl = pa.concat_tables(
        [b for b in outer_ds.iter_batches(batch_format="pyarrow")
         if b.num_rows],
        promote_options="default")
    assert tbl.schema.field("u").type == pa.uint64()
    by_k = {k.as_py(): u.as_py() for k, u in zip(tbl["k"], tbl["u"])}
    assert by_k[3] == 2 ** 64 - 1
    assert by_k[4] is None


def test_cluster_pairs_ds_rejects_negative_ids():
    from laji_pygeoapi_ray.stages.simdedup import cluster_pairs_ds

    pairs = ray.data.from_arrow(pa.table({
        "id_a": pa.array([-5, 1], pa.int64()),
        "id_b": pa.array([2, 3], pa.int64())}))
    ids = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64())}))
    with pytest.raises(Exception, match="non-negative"):
        cluster_pairs_ds(pairs, ids, num_buckets=2).to_pandas()


def test_integer_pagerank_rejects_negative_ids():
    from laji_pygeoapi_ray.stages.pagerank import integer_pagerank

    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([0, -1], pa.int64()),
        "dst": pa.array([1, 0], pa.int64())}))
    ids = ray.data.from_arrow(pa.table({"id": pa.array([0, 1], pa.int64())}))
    with pytest.raises(Exception, match="non-negative"):
        integer_pagerank(edges, ids, iters=1, num_buckets=2).to_pandas()


def test_pagerank_broadcast_and_shuffle_paths_agree():
    """The bounded-node broadcast fast path and the unbounded shuffle path
    must produce bit-identical integer ranks (documented contract)."""
    from laji_pygeoapi_ray.stages.pagerank import integer_pagerank

    rng = np.random.default_rng(7)
    n = 40
    src = rng.integers(0, n, 120).astype(np.int64)
    dst = rng.integers(0, n, 120).astype(np.int64)
    # undirected convention used by repo callers: both directions
    e = pa.table({"src": np.concatenate([src, dst]),
                  "dst": np.concatenate([dst, src])})
    ids = pa.table({"id": np.arange(n + 5, dtype=np.int64)})  # +5 isolated

    def run(threshold):
        out = integer_pagerank(
            ray.data.from_arrow(e), ray.data.from_arrow(ids),
            iters=3, num_buckets=4, broadcast_threshold=threshold)
        return out.to_pandas().sort_values("id").reset_index(drop=True)

    fast = run(10 ** 9)   # broadcast path
    slow = run(0)         # forced shuffle path
    pd.testing.assert_frame_equal(fast, slow)


def test_augment_stage_odd_dims_flags_not_raises():
    from laji_pygeoapi_ray.functions import codec
    from laji_pygeoapi_ray.stages.images import AugmentStage

    even = (np.arange(8 * 6 * 3, dtype=np.uint8).reshape(8, 6, 3))
    odd = (np.arange(7 * 6 * 3, dtype=np.uint8).reshape(7, 6, 3))
    batch = pa.table({
        "fmt": pa.array(["png", "png"]),
        "bytes": pa.array([codec.png_encode(even), codec.png_encode(odd)],
                          pa.binary())})
    out = AugmentStage()(batch)
    assert out["aug_pool_ok"].to_pylist() == [True, False]
    assert out["aug_sum_ok"].to_pylist() == [True, True]


def test_decontaminate_gram_bound_enforced(monkeypatch):
    from laji_pygeoapi_ray.pipelines import text_queries as tq

    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": pd.array([0, 11, 22], dtype="int64"),  # all benchmark
        "text": ["a b c d e", "f g h i j", "k l m n o"]}))
    monkeypatch.setattr(tq, "DECON_MAX_GRAMS", 1)
    with pytest.raises(ValueError, match="hash_join"):
        tq.decontaminate_grams(docs)


def test_lance_gate_contract():
    """The Lance source gate: absent wheel -> clear ImportError naming the
    Parquet fallback; present wheel -> format parity with read_table."""
    from laji_pygeoapi_ray.sources import lance as lsrc

    if not lsrc.HAVE_LANCE:
        with pytest.raises(ImportError, match="read_table"):
            lsrc.read_lance("/root/testdata/sf0.001", "documents")
        return
    # format parity (runs only when a wheel exists)
    from laji_pygeoapi_ray.sources.parquet import read_table
    a = lsrc.read_lance("/root/testdata/sf0.001", "documents",
                        ["doc_id"]).to_pandas().sort_values("doc_id")
    b = read_table("/root/testdata/sf0.001", "documents",
                   ["doc_id"]).to_pandas().sort_values("doc_id")
    assert a["doc_id"].tolist() == b["doc_id"].tolist()


def test_dsir_gram_total_bound_enforced():
    """The DSIR integer cross-difference requires tt*rt <= 2^48; beyond
    it the scorer must fail loudly with the normalization advice rather
    than silently overflow int64."""
    import pytest

    from laji_pygeoapi_ray.pipelines.text_queries import _dsir_check_totals

    _dsir_check_totals(1 << 20, 1 << 20)          # fine
    with pytest.raises(ValueError, match="bucket-normalize"):
        _dsir_check_totals(1 << 30, 1 << 30)


def test_hybrid_rrf_fallback_join_path_matches_broadcast(monkeypatch):
    """Force the distributed token-join fallback (RRF_QTOK_MAX = 0) and
    check it fuses to exactly the same rows as the broadcast fast path."""
    from laji_pygeoapi_ray.pipelines import ann_queries as aq

    sf = "/root/testdata/sf0.001"
    fast = aq.hybrid_rrf_topk(sf).to_pandas()
    monkeypatch.setattr(aq, "RRF_QTOK_MAX", 0)
    slow = aq.hybrid_rrf_topk(sf).to_pandas()
    cols = list(fast.columns)
    fast = fast.sort_values(cols).reset_index(drop=True)
    slow = slow.sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow, check_exact=True)


def test_resize_stage_plan_and_gates():
    from laji_pygeoapi_ray.functions import codec
    from laji_pygeoapi_ray.stages.images import RESIZE_MAX_SIDE, ResizeStage

    imgs = [(np.arange(7 * 5 * 3, dtype=np.uint8).reshape(7, 5, 3)),
            (np.arange(300 * 450 * 3, dtype=np.uint8).reshape(300, 450, 3)
             % 251).astype(np.uint8)]
    batch = pa.table({
        "fmt": pa.array(["png", "png"]),
        "bytes": pa.array([codec.png_encode(i) for i in imgs],
                          pa.binary())})
    out = ResizeStage()(batch)
    assert out["rz_dims_ok"].to_pylist() == [True, True]
    assert out["rz_corner_ok"].to_pylist() == [True, True]
    px = out["rz_px"].to_pylist()
    for img, p in zip(imgs, px):
        h, w = img.shape[:2]
        m = max(h, w)
        assert p == max(1, (h * RESIZE_MAX_SIDE) // m) \
            * max(1, (w * RESIZE_MAX_SIDE) // m)
