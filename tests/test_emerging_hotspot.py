"""Planted-fixture test for emerging_hotspot_classes: the clean testdata
only exercises the 'none'/'persistent' branches of the classification
ladder, so this builds an events table that forces every class — and then
runs the FULL engine-vs-DuckDB compare on it (both sides recompute the
per-day G* flags and the MK trend from scratch), plus asserts each planted
cell lands in its intended class."""
import os

import numpy as np
import pandas as pd
import pytest

from laji_pygeoapi_ray.functions import cells, points
from laji_pygeoapi_ray.pipelines.geoqueries import (
    TREND_RES, TREND_T0_US, US_PER_DAY)
from tests.conftest import SF_UNIT, TABLES, assert_query_matches_oracle

N_LAT = 1 << TREND_RES
N_DAYS = 10


def _ids_by_cell():
    ids = np.arange(300_000, dtype=np.int64)
    x, y = points.derive_xy(ids)
    cell = cells.encode(x, y, TREND_RES)
    ix = (cell & ((1 << cells.IY_SHIFT) - 1)).astype(np.int64)
    iy = ((cell >> cells.IY_SHIFT)
          & ((1 << cells.IY_SHIFT) - 1)).astype(np.int64)
    by = {}
    for i, cx, cy in zip(ids, ix, iy):
        by.setdefault((int(cx), int(cy)), int(i))
    return by


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ehs")
    for t in TABLES:
        if t != "events":
            os.symlink(f"{SF_UNIT}/{t}.parquet", d / f"{t}.parquet")
    by = _ids_by_cell()

    # spike cells ≥ 4 apart (disjoint 3×3 neighborhoods), away from edges
    spots = {"new": (5, 5), "intensifying": (5, 15), "diminishing": (5, 25),
             "persistent": (15, 5), "historical": (15, 15),
             "occasional": (15, 25)}
    for s in spots.values():
        assert s in by, f"no derivable id lands in cell {s}"
    # per-day spike counts: high everywhere it should be hot (comfortable
    # z margin over the ~100-event background), strictly monotone where a
    # significant MK trend is wanted
    plan = {
        "new": [0] * 9 + [150],
        "intensifying": list(range(110, 210, 10)),
        "diminishing": list(range(200, 100, -10)),
        "persistent": [150] * 10,
        "historical": [150] + [0] * 9,
        "occasional": [150] + [0] * 8 + [150],
    }
    # background: 100 far-from-spike cells, 1 event per day each
    bg = []
    for (cx, cy), i in by.items():
        if all(max(abs(cx - sx), abs(cy - sy)) > 3
               for sx, sy in spots.values()):
            bg.append(i)
        if len(bg) == 100:
            break

    eid, ts = [], []
    for day in range(N_DAYS):
        t_us = TREND_T0_US + day * US_PER_DAY + 12 * 3_600_000_000
        for i in bg:
            eid.append(i)
            ts.append(t_us)
        for name, (cx, cy) in spots.items():
            n = plan[name][day]
            eid.extend([by[(cx, cy)]] * n)
            ts.extend([t_us] * n)
    pd.DataFrame({
        "event_id": np.array(eid, np.int64),
        "ts": pd.to_datetime(np.array(ts, np.int64), unit="us"),
    }).to_parquet(d / "events.parquet", index=False)
    return str(d), {name: by[c] for name, c in spots.items()}


def test_all_classes_planted(planted_dir):
    sf_dir, spike_ids = planted_dir
    # full engine-vs-oracle compare on the planted table
    assert_query_matches_oracle("emerging_hotspot_classes", sf_dir)

    import __ray_entry__ as e
    out = e.queries()["emerging_hotspot_classes"](sf_dir).to_pandas()
    x, y = points.derive_xy(np.array(list(spike_ids.values()), np.int64))
    cell_of = dict(zip(spike_ids.keys(),
                       cells.encode(x, y, TREND_RES).tolist()))
    got = dict(zip(out["cell5"], out["cls"]))
    for want, cell in cell_of.items():
        assert got[cell] == want, (want, cell, got[cell])
    assert (out["cls"] == "none").sum() >= 90   # background cells
