"""Hilbert curve invariants (functions/hilbert.py) — exhaustive at order 4."""
from __future__ import annotations

import numpy as np

from laji_pygeoapi_ray.functions.hilbert import sql_hilbert_ctes, xy_to_d


def _full_grid(order: int):
    n = 1 << order
    iy, ix = np.divmod(np.arange(n * n, dtype=np.int64), n)
    return ix, iy


def test_bijection_and_unit_step_locality():
    # the defining Hilbert property: d is a bijection onto [0, n²) and
    # consecutive indices are 4-neighbors (|Δx| + |Δy| == 1)
    order = 4
    ix, iy = _full_grid(order)
    d = xy_to_d(ix, iy, order)
    n2 = (1 << order) ** 2
    assert sorted(d.tolist()) == list(range(n2))
    o = np.argsort(d)
    step = np.abs(np.diff(ix[o])) + np.abs(np.diff(iy[o]))
    assert (step == 1).all()


def test_known_small_values():
    # order-1 curve: (0,0)=0 (0,1)=1 (1,1)=2 (1,0)=3
    ix = np.array([0, 0, 1, 1])
    iy = np.array([0, 1, 1, 0])
    assert xy_to_d(ix, iy, 1).tolist() == [0, 1, 2, 3]


def test_sql_twin_bit_exact():
    import duckdb

    order = 5
    ix, iy = _full_grid(order)
    d = xy_to_d(ix, iy, order)
    con = duckdb.connect()
    con.sql("CREATE TABLE g AS SELECT "
            "CAST(range AS BIGINT) AS id, "
            f"CAST(range % {1 << order} AS BIGINT) AS hx, "
            f"CAST(range // {1 << order} AS BIGINT) AS hy "
            f"FROM range({(1 << order) ** 2})")
    got = con.sql(
        "WITH src AS (SELECT id, hx, hy FROM g),\n    "
        + sql_hilbert_ctes("src", order)
        + "\nSELECT id, hd FROM hd ORDER BY id").df()
    # grid built as ix = id % n, iy = id // n — same layout as _full_grid
    assert got["hd"].to_numpy().tolist() == d.tolist()
