"""Planted-case tests for dedup + merge (golden semantics mirroring the
reference's test_edit_db.py:262-352) and salted-vs-plain merge equality."""
from __future__ import annotations

import pandas as pd
import pytest
import ray.data

from laji_pygeoapi_ray.stages.dedup import dedup_keep_latest
from laji_pygeoapi_ray.stages.merge import MergeSpec, merge_similar, merge_salted


def _planted_df():
    # two mergeable groups + one singleton; exercises FIRST/AGGREGATE/SUM/MAX,
    # NULL + 'nan' filtering, and Yhdistetty counts
    return pd.DataFrame({
        "species": ["susi", "susi", "karhu", "karhu", "ilves"],
        "date":    ["2024-01-01"] * 2 + ["2024-02-02"] * 2 + ["2024-03-03"],
        "obs_id":  ["obs1", "obs2", "obs3", "obs4", "obs5"],
        "notes":   ["a", None, "nan", "b", None],
        "count":   [5, 3, None, None, 7],
        "acc":     [10.0, 100.0, 50.0, 25.0, 1.0],
        "name":    [None, "Wolf", "Bear", "Bear2", "Lynx"],
        "ord":     [1, 2, 1, 2, 1],
    })


SPEC = MergeSpec(groupby=["species", "date"], order=["ord"],
                 first=["name"], aggregate=["obs_id", "notes"],
                 sum=["count"], max=["acc"], count_col="Yhdistetty")


def _run(fn):
    ds = ray.data.from_pandas(_planted_df())
    out = fn(ds, SPEC, num_buckets=4).to_pandas()
    return out.sort_values("species").reset_index(drop=True)


@pytest.mark.parametrize("fn", [merge_similar, merge_salted])
def test_merge_planted_golden(fn):
    out = _run(fn)
    by = out.set_index("species")
    # SUM: 5+3=8 (the reference's golden value, test_edit_db.py:288-352)
    assert by.loc["susi", "count"] == 8
    # all-NULL SUM stays NULL
    assert pd.isna(by.loc["karhu", "count"])
    # AGGREGATE joins in ord order
    assert by.loc["susi", "obs_id"] == "obs1, obs2"
    # AGGREGATE filters NULL and literal 'nan'
    assert by.loc["susi", "notes"] == "a"
    assert by.loc["karhu", "notes"] == "b"
    assert pd.isna(by.loc["ilves", "notes"])
    # FIRST includes a NULL first value (ARRAY_AGG[1] semantics)
    assert pd.isna(by.loc["susi", "name"])
    assert by.loc["karhu", "name"] == "Bear"
    # MAX + Yhdistetty
    assert by.loc["susi", "acc"] == 100.0
    assert by.loc["susi", "Yhdistetty"] == 2
    assert by.loc["ilves", "Yhdistetty"] == 1
    assert len(out) == 3


def test_salted_merge_equals_plain():
    import numpy as np
    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame({
        "k": rng.integers(0, 3, n),          # giant keys (heavy skew)
        "ord": np.arange(n),
        "s": [f"v{i}" for i in range(n)],
        "q": rng.integers(0, 100, n).astype("float64"),
    })
    spec = MergeSpec(groupby=["k"], order=["ord"], first=["s"],
                     aggregate=["s"], sum=["q"], max=["q"],
                     count_col="n")
    # first+aggregate+sum+max on same col would collide; use separate specs
    spec = MergeSpec(groupby=["k"], order=["ord"], first=[],
                     aggregate=["s"], sum=["q"], max=[], count_col="n")
    a = merge_similar(ray.data.from_pandas(df), spec, num_buckets=4).to_pandas()
    b = merge_salted(ray.data.from_pandas(df), spec, salt_mod=8,
                     num_buckets=4).to_pandas()
    a = a.sort_values("k").reset_index(drop=True)[sorted(a.columns)]
    b = b.sort_values("k").reset_index(drop=True)[sorted(b.columns)]
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_dedup_keep_latest_planted():
    df = pd.DataFrame({
        "id":   ["a", "a", "a", "b"],
        "load": ["2024-01-01", "2024-03-01", "2024-02-01", "2024-01-01"],
        "v":    [1, 2, 3, 4],
    })
    out = dedup_keep_latest(ray.data.from_pandas(df), ["id"], ["load", "v"],
                            num_buckets=2).to_pandas()
    out = out.sort_values("id").reset_index(drop=True)
    assert out["v"].tolist() == [2, 4]          # keep-latest by load date
    first = dedup_keep_latest(ray.data.from_pandas(df), ["id"], ["load", "v"],
                              descending=False, num_buckets=2).to_pandas()
    assert sorted(first["v"].tolist()) == [1, 4]


def test_read_planner_blocks_and_pruning():
    """get_pages/get_last_page analogue: the read planner sizes block count
    from file bytes and prunes columns at the read."""
    from laji_pygeoapi_ray.sources.parquet import read_table
    from tests.conftest import SF_UNIT

    ds = read_table(SF_UNIT, "documents", ["doc_id"])
    assert ds.schema().names == ["doc_id"]          # column pruning
    assert ds.count() == 500
    # block count is bounded: at least 1, at most a small multiple of CPUs
    nb = ds.materialize().num_blocks()
    assert 1 <= nb <= 64


def test_kth_value_2pass_edges():
    import numpy as np
    import pandas as pd
    import ray.data

    from laji_pygeoapi_ray.stages.shuffle import kth_value_2pass

    rng = np.random.default_rng(7)
    vals = np.concatenate([rng.normal(0, 1, 999), [5.0]])
    ds = ray.data.from_pandas(pd.DataFrame({"value": vals}))
    srt = np.sort(vals)
    for k in (0, 1, 499, 998, 999):
        v, n = kth_value_2pass(ds, "value", k, n_bins=64)
        assert n == 1000 and v == srt[k], (k, v, srt[k])
    # all-equal column short-circuits
    ds2 = ray.data.from_pandas(pd.DataFrame({"value": [3.0] * 10}))
    v, _ = kth_value_2pass(ds2, "value", 4)
    assert v == 3.0


def test_hll_distinct_accuracy():
    """HLL sketch within its 1.6% design error vs exact COUNT DISTINCT,
    and merge-invariant across block splits."""
    import numpy as np
    import pandas as pd
    import ray.data

    from laji_pygeoapi_ray.stages.shuffle import hll_distinct

    rng = np.random.default_rng(3)
    ids = rng.integers(0, 5000, 20000)
    exact = len(np.unique(ids))
    for blocks in (1, 8):
        ds = ray.data.from_pandas(pd.DataFrame({"k": ids})) \
            .repartition(blocks)
        est = hll_distinct(ds, "k")
        assert abs(est - exact) / exact < 0.05, (blocks, est, exact)


def test_heavy_hitters_exact_and_certification():
    """Two-pass certified heavy hitters: exact top-k equality vs a local
    count on a Zipf-ish stream, block-count invariance, and the
    certification flag correctly reporting both the provable and the
    unprovable regime."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data

    from laji_pygeoapi_ray.stages.shuffle import heavy_hitters_exact

    rng = np.random.default_rng(11)
    # heavy head + long uniform tail
    head = np.repeat([f"h{i:02d}" for i in range(10)],
                     [4000 - 300 * i for i in range(10)])
    tail = np.array([f"t{i:04d}" for i in
                     rng.integers(0, 3000, 20000)])
    items = np.concatenate([head, tail])
    rng.shuffle(items)
    truth = pd.Series(items).value_counts()

    def mk(t):
        return t["item"].combine_chunks()

    for blocks in (1, 8):
        ds = ray.data.from_pandas(pd.DataFrame({"item": items})) \
            .repartition(blocks)
        out = heavy_hitters_exact(ds, mk, 5, m=512, cand_cap=1024)
        assert out["certified"].to_pylist() == [True] * 5
        got = dict(zip(out["item"].to_pylist(), out["n"].to_pylist()))
        for it, n in got.items():
            assert truth[it] == n, (blocks, it, n, truth[it])
        assert sorted(got.values(), reverse=True) == \
            sorted(truth.head(5).values, reverse=True)

    # unprovable regime: m so small the drop bound swamps the kth count
    ds = ray.data.from_pandas(pd.DataFrame({"item": items})).repartition(8)
    out = heavy_hitters_exact(ds, mk, 5, m=2, cand_cap=4)
    assert out["certified"].to_pylist() == [False] * len(out)


def test_pareto_mask_matches_bruteforce():
    """Skyline kernel vs the literal O(n²) dominance scan, including
    duplicate points and ties on one axis."""
    import numpy as np

    from laji_pygeoapi_ray.stages.stream import pareto_mask_2d

    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(1, 120))
        p = rng.integers(0, 12, n).astype(np.int64)   # many ties
        d = rng.integers(0, 12, n).astype(np.int64)
        got = pareto_mask_2d(p, d)
        dom = (p[:, None] >= p[None, :]) & (d[:, None] <= d[None, :]) \
            & ((p[:, None] > p[None, :]) | (d[:, None] < d[None, :]))
        exp = ~dom.any(axis=0)
        assert (got == exp).all(), (trial, p, d)


def test_grouped_apply_and_hash_join_invariant_to_bucket_count():
    """The property the derived-fan-out defaults rely on: bucket count
    only sizes parallelism — per-key colocation (all rows of a key in
    one bucket) holds for ANY count, so results are identical across
    counts. Locks the fan-out audit against a future bucket-leaking
    bucket_fn."""
    import numpy as np
    import pandas as pd
    import ray.data

    from laji_pygeoapi_ray.stages.join import hash_join
    from laji_pygeoapi_ray.stages.shuffle import grouped_apply

    rng = np.random.default_rng(13)
    big = np.int64(1) << 60                       # >2^53 value-integrity key
    df = pd.DataFrame({
        "k": rng.integers(0, 37, 900),
        "v": rng.integers(0, 10**6, 900).astype(np.int64) + big})
    right = pd.DataFrame({"k": np.arange(37), "w": np.arange(37) * 7})

    def agg(d: pd.DataFrame) -> pd.DataFrame:
        return d.groupby("k", as_index=False).agg(
            n=("v", "size"), lo=("v", "min"), hi=("v", "max"))

    outs, joins = [], []
    for nb in (1, 3, 16, 64):
        ds = ray.data.from_pandas(df).repartition(4)
        o = grouped_apply(ds, ["k"], agg, num_buckets=nb).to_pandas()
        outs.append(o.sort_values("k").reset_index(drop=True))
        j = hash_join(ray.data.from_pandas(df).repartition(4),
                      ray.data.from_pandas(right).repartition(2),
                      on=["k"], num_buckets=nb).to_pandas()
        joins.append(j.sort_values(["k", "v"]).reset_index(drop=True)
                     [["k", "v", "w"]])
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)
    for j in joins[1:]:
        pd.testing.assert_frame_equal(joins[0], j)


def test_hll_rank_vectorization_bit_identical():
    """The frexp-based HLL rank must equal the bit-scan definition on
    the full register path (regression for the vectorized rewrite)."""
    import numpy as np

    from laji_pygeoapi_ray.stages.shuffle import HLL_P, hll_partial

    rng = np.random.default_rng(3)
    ids = rng.integers(-(2**62), 2**62, 500_000).astype(np.int64)
    got = hll_partial(ids)

    # independent reference: same splitmix64, loop-scan rank
    x = ids.astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    m = np.uint64(1) << np.uint64(HLL_P)
    idx = (x & (m - np.uint64(1))).astype(np.int64)
    rest = x >> np.uint64(HLL_P)
    nbits = 64 - HLL_P
    rank = np.full(len(x), nbits + 1, dtype=np.uint8)
    for b in range(nbits):
        hit = (rest >> np.uint64(nbits - 1 - b)) & np.uint64(1)
        newly = (rank == nbits + 1) & (hit == 1)
        rank[newly] = b + 1
    want = np.zeros(1 << HLL_P, dtype=np.uint8)
    np.maximum.at(want, idx, rank)
    assert (got == want).all()


def test_kth_values_2pass_excludes_nulls_sql_semantics():
    """Order statistics ignore NULL/NaN (SQL percentile semantics): n
    counts non-null rows only and a NaN can never be returned as a
    value; all-equal early path returns the REAL n and validates ks."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data

    from laji_pygeoapi_ray.stages.shuffle import kth_values_2pass

    df = pd.DataFrame({"v": [np.nan, 3.0, 1.0, np.nan, 2.0]})
    ds = ray.data.from_pandas(df).repartition(2)
    vals, n = kth_values_2pass(ds, "v", [0, 1, 2])
    assert n == 3 and vals == [1.0, 2.0, 3.0]
    with pytest.raises(ValueError):
        kth_values_2pass(ray.data.from_pandas(df), "v", [3])  # > non-null
    # all-equal early path: real n, validated k
    eq = ray.data.from_pandas(pd.DataFrame({"v": [7.0, np.nan, 7.0]}))
    vals, n = kth_values_2pass(eq, "v", [0, 1])
    assert n == 2 and vals == [7.0, 7.0]
    with pytest.raises(ValueError):
        kth_values_2pass(
            ray.data.from_pandas(pd.DataFrame({"v": [7.0]})), "v", [1])
    with pytest.raises(ValueError):
        kth_values_2pass(
            ray.data.from_pandas(pd.DataFrame({"v": [np.nan]})), "v", [0])
