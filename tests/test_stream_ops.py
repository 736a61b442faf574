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
