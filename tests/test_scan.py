"""Unit tests for the two-pass distributed prefix scan (stages/scan.py):
exactness vs a local cumsum, block-count invariance, partition-boundary
carry (offsets), tie aggregation, and the summary reducer."""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from laji_pygeoapi_ray.stages.scan import (global_cumsum, partition_offsets,
                                           scan_summary)


def _curve_df(ds, width):
    out = global_cumsum(ds, "t", "d", width=width, out_col="run").to_pandas()
    return out.sort_values("t").reset_index(drop=True)


def _local_truth(df):
    g = df.groupby("t", sort=True)["d"].sum().reset_index(name="net")
    g["run"] = g["net"].cumsum()
    return g.astype("int64")


def test_cumsum_matches_local_and_is_block_invariant():
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "t": rng.integers(0, 1000, 5000).astype("int64"),
        "d": rng.choice([-3, -1, 1, 2], 5000).astype("int64")})
    truth = _local_truth(df)
    for blocks in (1, 7):
        ds = ray.data.from_pandas(df).repartition(blocks)
        # width 64 → ~16 partitions, many cross-partition carries
        out = _curve_df(ds, width=64)
        pd.testing.assert_frame_equal(out[["t", "net", "run"]], truth)
    # degenerate width: everything in ONE partition must also agree
    out = _curve_df(ray.data.from_pandas(df), width=10**9)
    pd.testing.assert_frame_equal(out[["t", "net", "run"]], truth)


def test_partition_offsets_are_exclusive_prefix():
    df = pd.DataFrame({"t": [0, 5, 10, 15, 25], "d": [1, 2, 3, 4, 5]})
    df["__part"] = df["t"] // 10
    ds = ray.data.from_pandas(df.astype({"t": "int64", "d": "int64"}))
    off = partition_offsets(ds, "__part", "d")
    assert off == {0: 0, 1: 3, 2: 10}


def test_ties_aggregate_before_running_sum():
    # equal order keys collapse to one row; running value is tie-order-free
    df = pd.DataFrame({"t": [1, 1, 1, 2], "d": [5, -2, 1, 1]})
    out = _curve_df(ray.data.from_pandas(df.astype("int64")), width=1)
    assert out["t"].tolist() == [1, 2]
    assert out["net"].tolist() == [4, 1]
    assert out["run"].tolist() == [4, 5]


def test_scan_summary_reduction():
    df = pd.DataFrame({"t": [1, 2, 3, 4, 5, 6],
                       "d": [1, 1, -1, 1, -1, -1]})  # runs 1,2,1,2,1,0
    curve = global_cumsum(ray.data.from_pandas(df.astype("int64")),
                          "t", "d", width=2, out_col="run")
    s = scan_summary(curve, "t", "run")
    assert s == {"max_value": 2, "first_at": 2, "n_at": 2}
