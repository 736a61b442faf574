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
