"""Stream-shaped / set-op / top-k queries vs oracles + session windows."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_UNIT, assert_query_matches_oracle


@pytest.mark.parametrize("name", [
    "tumbling_hour_events", "asof_view_purchase", "topk_orders",
    "upsert_events", "pricing_summary", "tile_polygons",
    "session_windows_events", "sliding_2h_1h_events",
])
def test_query_matches_oracle(name):
    assert_query_matches_oracle(name, SF_UNIT)


def test_session_windows_kernel():
    from laji_pygeoapi_ray.stages.stream import session_windows
    df = pd.DataFrame({
        "k": ["a", "a", "a", "b", "b"],
        "ts": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:10:00",
                              "2024-01-01 02:00:00", "2024-01-01 00:00:00",
                              "2024-01-01 00:20:00"]),
    })
    out = session_windows(df, "k", "ts", gap_us=30 * 60 * 1_000_000)
    # a: two sessions (10-min gap, then 110-min gap); b: one session
    assert out["session_id"].tolist() == [0, 0, 1, 2, 2]


def test_asof_join_preserves_int64_above_2_53():
    """Absent-one-side int64 columns in the as-of tagged union must ride
    pandas nullable Int64 through the bucket (round-5 hardening): the old
    pa.nulls fill float64-upcast them in mixed buckets, silently rounding
    values above 2^53."""
    import pyarrow as pa
    import ray

    from laji_pygeoapi_ray.stages.stream import asof_join

    big = (1 << 60) + 1          # rounds to 2^60 through float64
    left = ray.data.from_arrow(pa.table({
        "user": pa.array([1, 1, 2], pa.int64()),
        "ts": pa.array(
            pd.to_datetime(["2024-01-01 01:00", "2024-01-01 03:00",
                            "2024-01-01 02:00"]).astype("datetime64[us]")),
        "left_big": pa.array([big, big + 2, big + 4], pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "user": pa.array([1, 1, 2], pa.int64()),
        "rts": pa.array(
            pd.to_datetime(["2024-01-01 00:30", "2024-01-01 02:30",
                            "2024-01-01 02:30"]).astype("datetime64[us]")),
        "right_big": pa.array([big + 1, big + 3, big + 5], pa.int64()),
    }))
    # read via Arrow: a pandas conversion of int64-with-nulls would
    # float64-upcast IN THE TEST and mask the engine's exactness
    rows = sorted(asof_join(left, right, key="user", left_ts="ts",
                            right_ts="rts").take_all(),
                  key=lambda r: r["left_big"])
    assert [r["left_big"] for r in rows] == [big, big + 2, big + 4]
    # user 1: 01:00 matches 00:30, 03:00 matches 02:30; user 2 unmatched
    assert [r["right_big"] for r in rows] == [big + 1, big + 3, None]


def test_interval_join_preserves_int64_above_2_53():
    """Same hazard for the range join: the interval-id column (right-only
    int64) must survive above 2^53 exactly."""
    import pyarrow as pa
    import ray

    from laji_pygeoapi_ray.stages.stream import interval_join

    big = (1 << 59) + 7
    left = ray.data.from_arrow(pa.table({
        "user": pa.array([1, 1, 2], pa.int64()),
        "ts": pa.array(
            pd.to_datetime(["2024-01-01 01:00", "2024-01-01 05:00",
                            "2024-01-01 01:30"]).astype("datetime64[us]")),
    }))
    ivs = ray.data.from_arrow(pa.table({
        "user": pa.array([1, 2], pa.int64()),
        "start": pa.array(
            pd.to_datetime(["2024-01-01 00:00", "2024-01-01 01:00"]
                           ).astype("datetime64[us]")),
        "end": pa.array(
            pd.to_datetime(["2024-01-01 02:00", "2024-01-01 02:00"]
                           ).astype("datetime64[us]")),
        "interval_id": pa.array([big, big + 1], pa.int64()),
    }))
    rows = sorted(interval_join(left, ivs, key="user", ts_col="ts",
                                start_col="start", end_col="end",
                                id_cols=("interval_id",)).take_all(),
                  key=lambda r: r["user"])
    # 05:00 falls outside user 1's interval → dropped (inner join)
    assert len(rows) == 2
    assert [r["interval_id"] for r in rows] == [big, big + 1]


def test_asof_join_randomized_equals_pandas_reference():
    """Distributed as-of join == single-process merge_asof on a randomized
    fixture with heavy key ties, equal timestamps (right_tie canonical-
    ization) and keys missing from either side — the oracle query covers
    one data shape; this covers the space around it."""
    import pyarrow as pa
    import ray

    from laji_pygeoapi_ray.stages.stream import asof_join

    rng = np.random.default_rng(42)
    nl, nr = 400, 300
    lk = rng.integers(0, 25, nl)
    rk = rng.integers(0, 30, nr)
    lts = pd.to_datetime(rng.integers(0, 500, nl), unit="s") \
        .astype("datetime64[us]")
    rts = pd.to_datetime(rng.integers(0, 500, nr), unit="s") \
        .astype("datetime64[us]")
    lval = rng.integers(0, 10**6, nl)
    rval = rng.integers(0, 10**6, nr)
    left = pd.DataFrame({"k": lk, "ts": lts, "lv": lval})
    right = pd.DataFrame({"k": rk, "rts": rts, "rv": rval})

    got = (asof_join(ray.data.from_arrow(pa.Table.from_pandas(left)),
                     ray.data.from_arrow(pa.Table.from_pandas(right)),
                     key="k", left_ts="ts", right_ts="rts",
                     right_tie="rv", num_buckets=7)
           .to_pandas().sort_values(["k", "ts", "lv"])
           .reset_index(drop=True))

    # reference: canonicalize right ties (max rv per (k, rts)), then
    # plain merge_asof over the whole frame
    ref_r = (right.sort_values(["k", "rts", "rv"])
             .drop_duplicates(["k", "rts"], keep="last")
             .sort_values("rts"))
    ref = pd.merge_asof(left.sort_values("ts"), ref_r,
                        left_on="ts", right_on="rts", by="k",
                        direction="backward")
    ref = ref.sort_values(["k", "ts", "lv"]).reset_index(drop=True)
    assert len(got) == len(ref) == nl
    pd.testing.assert_frame_equal(
        got[["k", "ts", "lv", "rts", "rv"]],
        ref[["k", "ts", "lv", "rts", "rv"]],
        check_dtype=False, check_exact=True)


def test_interval_join_all_randomized_equals_bruteforce():
    """interval_join_all (bin-replicated general range join) == the O(n·m)
    pandas cross-filter on a randomized overlapping-interval fixture —
    exercises multi-bin replication, bin-boundary intervals and
    overlapping intervals per key."""
    import pyarrow as pa
    import ray

    from laji_pygeoapi_ray.stages.stream import interval_join_all

    rng = np.random.default_rng(3)
    ne, ni = 300, 60
    ek = rng.integers(0, 6, ne)
    ets = pd.to_datetime(rng.integers(0, 7200, ne), unit="s") \
        .astype("datetime64[us]")
    ik = rng.integers(0, 6, ni)
    st = rng.integers(0, 7200, ni)
    dur = rng.integers(0, 5400, ni)          # spans several 1h bins
    left = pd.DataFrame({"k": ek, "ts": ets,
                         "eid": np.arange(ne, dtype=np.int64)})
    ivs = pd.DataFrame({
        "k": ik,
        "start": pd.to_datetime(st, unit="s").astype("datetime64[us]"),
        "end": pd.to_datetime(st + dur, unit="s").astype("datetime64[us]"),
        "iid": np.arange(ni, dtype=np.int64)})

    got = (interval_join_all(
        ray.data.from_arrow(pa.Table.from_pandas(left)),
        ray.data.from_arrow(pa.Table.from_pandas(ivs)),
        key="k", ts_col="ts", start_col="start", end_col="end",
        id_cols=("iid",), num_buckets=5)
        .to_pandas().sort_values(["eid", "iid"]).reset_index(drop=True))

    m = left.merge(ivs, on="k")
    ref = (m[(m["start"] <= m["ts"]) & (m["ts"] <= m["end"])]
           [["k", "ts", "eid", "iid", "start", "end"]]
           .sort_values(["eid", "iid"]).reset_index(drop=True))
    assert len(got) == len(ref)
    pd.testing.assert_frame_equal(
        got[["k", "eid", "iid"]].astype("int64"),
        ref[["k", "eid", "iid"]].astype("int64"),
        check_exact=True)
