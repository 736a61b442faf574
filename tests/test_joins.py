"""Join queries vs oracles."""
from __future__ import annotations

import pytest

from tests.conftest import SF_UNIT, assert_query_matches_oracle


@pytest.mark.parametrize("name", [
    "orders_by_mktsegment", "supplier_nation_broadcast",
    "distinct_event_types",
])
def test_query_matches_oracle(name):
    assert_query_matches_oracle(name, SF_UNIT)


def test_bloom_filter_no_false_negatives():
    import numpy as np

    from laji_pygeoapi_ray.stages.join import BloomFilter

    rng = np.random.default_rng(5)
    members = rng.integers(0, 10**12, 5000)
    others = rng.integers(10**12, 2 * 10**12, 20000)
    bf = BloomFilter(n_bits_log2=18)
    bf.add(members)
    assert bf.might_contain(members).all()          # NEVER a false negative
    fp = bf.might_contain(others).mean()
    assert fp < 0.05, fp                            # small false-positive rate


def test_sample_frac_block_order_invariant():
    """Hash sampling must select the SAME rows regardless of block layout
    (ds.random_sample cannot guarantee this)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from laji_pygeoapi_ray.stages.sampling import sample_frac

    df = pd.DataFrame({"doc_id": np.arange(5000)})
    sel = []
    for blocks in (1, 7):
        ds = ray.data.from_pandas(df).repartition(blocks)
        out = sample_frac(ds, 10, id_col="doc_id").to_pandas()
        sel.append(sorted(out["doc_id"]))
    assert sel[0] == sel[1] and 300 < len(sel[0]) < 700


def test_hash_join_preserves_ints_above_2_53():
    """Regression: null-filled int columns used to ride through the bucket
    shuffle as float64, silently rounding ids above 2^53 (packed cell ids
    carry resolution bits at 58+)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from laji_pygeoapi_ray.stages.join import hash_join

    base = np.int64(5) << np.int64(58)
    keys = base + np.arange(8, dtype=np.int64)       # ulp(float64) here=256
    left = rd.from_arrow(pa.table({"k": keys, "payload_a": keys + 1}))
    right = rd.from_arrow(pa.table({"k": keys[::2], "payload_b": keys[::2]}))
    out = hash_join(left, right, on=["k"], num_buckets=4).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert out["k"].dtype.kind == "i" and out["payload_a"].dtype.kind == "i"
    assert list(out["k"]) == list(keys[::2])
    assert list(out["payload_a"]) == list(keys[::2] + 1)
    assert list(out["payload_b"]) == list(keys[::2])


def test_cluster_pairs_ds_preserves_ints_above_2_53():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from laji_pygeoapi_ray.stages.simdedup import cluster_pairs_ds

    base = np.int64(5) << np.int64(58)
    # path graph 0-1-2-3 (forces propagation rounds + pointer jumping)
    # plus the far pair (100, 101) and singleton 200
    ids = base + np.array([0, 1, 2, 3, 100, 101, 200], dtype=np.int64)
    pairs = pd.DataFrame({"id_a": base + np.array([0, 1, 2, 100]),
                          "id_b": base + np.array([1, 2, 3, 101])})
    out = cluster_pairs_ds(pairs, rd.from_arrow(pa.table({"doc_id": ids})),
                           id_col="doc_id", num_buckets=2).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == {base + 0: base, base + 1: base, base + 2: base,
                   base + 3: base, base + 100: base + 100,
                   base + 101: base + 100, base + 200: base + 200}


def test_join_null_keys_never_match_sql_semantics():
    """SQL equi-join semantics on NULL keys: NULL = NULL is not a match.
    Inner drops null-key rows; left/outer pass them through unmatched —
    pandas merge alone would emit a null-key cross product."""
    import numpy as np
    import pandas as pd
    import ray.data

    from laji_pygeoapi_ray.stages.join import hash_join, sort_merge_join

    left = pd.DataFrame({"k": [1.0, np.nan, np.nan, 2.0],
                         "lv": [10, 20, 30, 40]})
    right = pd.DataFrame({"k": [np.nan, 2.0], "rv": [100, 200]})

    inner = hash_join(ray.data.from_pandas(left),
                      ray.data.from_pandas(right),
                      on=["k"], num_buckets=3).to_pandas()
    assert len(inner) == 1 and float(inner["k"].iloc[0]) == 2.0

    lj = hash_join(ray.data.from_pandas(left),
                   ray.data.from_pandas(right),
                   on=["k"], how="left", num_buckets=3).to_pandas()
    assert len(lj) == 4                       # every left row exactly once
    nulls = lj[lj["k"].isna()]
    assert len(nulls) == 2 and nulls["rv"].isna().all()

    sm = sort_merge_join(ray.data.from_pandas(left),
                         ray.data.from_pandas(right),
                         on="k", num_ranges=2).to_pandas()
    assert len(sm) == 1 and float(sm["k"].iloc[0]) == 2.0


@pytest.mark.parametrize("how", ["inner", "left"])
def test_join_backends_agree_randomized(how):
    """hash_join and sort_merge_join must produce identical result SETS on
    a randomized fixture with key skew, nulls on both sides and values
    above 2^53 — the backend-certifying oracle exercises one query shape;
    this covers the space around it (nulls never match per SQL semantics
    in BOTH backends)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from laji_pygeoapi_ray.stages.join import hash_join, sort_merge_join

    rng = np.random.default_rng(11)
    big = (1 << 60) + 1
    nl, nr = 300, 200
    lk = rng.integers(0, 40, nl).astype(np.float64)
    rk = rng.integers(0, 50, nr).astype(np.float64)
    lk[rng.random(nl) < 0.05] = np.nan          # null keys
    rk[rng.random(nr) < 0.05] = np.nan
    left = pa.table({"k": pa.array(lk),
                     "lv": pa.array(big + rng.integers(0, 1000, nl),
                                    pa.int64())})
    right = pa.table({"k": pa.array(rk),
                      "rv": pa.array(big + rng.integers(0, 1000, nr),
                                     pa.int64())})

    def collect(ds):
        rows = ds.take_all()
        # None/NaN sentinels keep the tuples sortable
        return sorted((float("-inf") if r["k"] is None or r["k"] != r["k"]
                       else r["k"], r["lv"],
                       -1 if r.get("rv") is None else r["rv"])
                      for r in rows)

    h = collect(hash_join(ray.data.from_arrow(left),
                          ray.data.from_arrow(right),
                          on=["k"], how=how, num_buckets=6))
    s = collect(sort_merge_join(ray.data.from_arrow(left),
                                ray.data.from_arrow(right),
                                on="k", how=how, num_ranges=5))
    assert h == s
    # cross-check cardinality against pandas with SQL null semantics
    ldf, rdf = left.to_pandas(), right.to_pandas()
    lnn, rnn = ldf[ldf["k"].notna()], rdf[rdf["k"].notna()]
    n_inner = len(lnn.merge(rnn, on="k", how="inner"))
    want = n_inner if how == "inner" else n_inner + ldf["k"].isna().sum() \
        + len(lnn) - len(lnn.merge(rnn[["k"]].drop_duplicates(), on="k"))
    assert len(h) == want
