"""Property-based tests (hypothesis) for the determinism-critical kernels:
random inputs, engine kernel vs DuckDB twin — beyond the golden cases.
(The reference has no property-based tests at all, SURVEY.md §5.)"""
from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from laji_pygeoapi_ray.functions import cells, points
from laji_pygeoapi_ray.functions.pip import crossing_parity
from laji_pygeoapi_ray.stages.merge import MergeSpec, merge_bucket
from laji_pygeoapi_ray.state import fixtures


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**31 - 1),
                min_size=1, max_size=50, unique=True))
def test_derive_xy_matches_sql(keys):
    con = duckdb.connect()
    x_sql, y_sql = points.sql_xy("k")
    vals = ", ".join(f"({k})" for k in keys)
    df = con.sql(f"SELECT k, {x_sql} AS x, {y_sql} AS y "
                 f"FROM (VALUES {vals}) t(k) ORDER BY k").df()
    ks = np.sort(np.asarray(keys, dtype=np.int64))
    x, y = points.derive_xy(ks)
    assert np.array_equal(x, df["x"].to_numpy())
    assert np.array_equal(y, df["y"].to_numpy())


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(
    st.floats(min_value=19.08, max_value=31.59, allow_nan=False),
    st.floats(min_value=59.45, max_value=70.09, allow_nan=False)),
    min_size=1, max_size=30))
def test_cell_encode_matches_sql_and_invariants(pts):
    con = duckdb.connect()
    cell_sql = cells.sql_cell("x", "y", 8)
    vals = ", ".join(f"(CAST('{x!r}' AS DOUBLE), CAST('{y!r}' AS DOUBLE))"
                     for x, y in pts)
    df = con.sql(f"SELECT {cell_sql} AS c FROM (VALUES {vals}) t(x, y)").df()
    x = np.asarray([p[0] for p in pts])
    y = np.asarray([p[1] for p in pts])
    c = cells.encode(x, y, 8)
    assert np.array_equal(c, df["c"].to_numpy())
    # parent is the true quadtree ancestor; point lies inside its cell bounds
    c6 = cells.parent(c, 6)
    assert np.array_equal(c6, cells.encode(x, y, 6))
    x0, y0, x1, y1 = cells.cell_bounds_np(c, 8)
    assert ((x >= x0) & (x <= x1) & (y >= y0) & (y <= y1)).all()


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(
    st.floats(min_value=19.2, max_value=31.4, allow_nan=False),
    st.floats(min_value=59.6, max_value=70.0, allow_nan=False)),
    min_size=1, max_size=40))
def test_pip_matches_sql_on_random_points(pts):
    con = duckdb.connect()
    layer = fixtures.province_layer()
    edges = fixtures.edges_values_sql(layer)
    vals = ", ".join(
        f"({i}, CAST('{x!r}' AS DOUBLE), CAST('{y!r}' AS DOUBLE))"
        for i, (x, y) in enumerate(pts))
    from laji_pygeoapi_ray.functions.pip import sql_pip_assign
    sql = sql_pip_assign(f"SELECT * FROM (VALUES {vals}) t(i, x, y)",
                         "i", edges)
    df = con.sql(sql).df().sort_values("i")
    x = np.asarray([p[0] for p in pts])
    y = np.asarray([p[1] for p in pts])
    expected = np.full(len(pts), -1, dtype=np.int64)
    for poly in layer:
        inside = crossing_parity(x, y, poly.ring)
        expected[inside] = poly.pid
    got = df["pid"].fillna(-1).to_numpy().astype(np.int64)
    assert np.array_equal(expected, got)


_val = st.one_of(st.none(), st.just("nan"),
                 st.text(alphabet="abcxyzäö", min_size=1, max_size=4))


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["g1", "g2", None]),
                          _val, st.one_of(st.none(),
                                          st.integers(0, 100))),
                min_size=1, max_size=25))
def test_merge_bucket_matches_duckdb(rows):
    """Randomized merge parity: FIRST (nulls included), AGGREGATE with the
    NULL+'nan' filter, SUM with all-null→null, count — vs DuckDB on the
    same frame with ids as the deterministic order."""
    df = pd.DataFrame(rows, columns=["k", "s", "v"])
    df["id"] = np.arange(len(df), dtype=np.int64)
    df["v"] = df["v"].astype("float64")
    spec = MergeSpec(groupby=["k"], order=["id"], first=["s"],
                     aggregate=["s"], sum=["v"], count_col="n")
    # first+aggregate on the same column isn't representable in one frame —
    # duplicate it
    df["s2"] = df["s"]
    spec = MergeSpec(groupby=["k"], order=["id"], first=["s2"],
                     aggregate=["s"], sum=["v"], count_col="n")
    got = merge_bucket(df.copy(), spec)
    got = got.sort_values("k", na_position="last").reset_index(drop=True)

    con = duckdb.connect()
    con.register("t", df)
    exp = con.sql("""
        SELECT k, first(s2 ORDER BY id) AS s2,
               SUM(v) AS v,
               string_agg(s, ', ' ORDER BY id)
                 FILTER (s IS NOT NULL AND s <> 'nan') AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM t GROUP BY k""").df()
    exp = exp.sort_values("k", na_position="last").reset_index(drop=True)
    assert len(got) == len(exp)
    for col in ("k", "s2", "s", "n"):
        a = got[col].astype("object").where(got[col].notna(), None)
        b = exp[col].astype("object").where(exp[col].notna(), None)
        assert list(a) == list(b), (col, list(a), list(b))
    assert np.allclose(got["v"].fillna(-1), exp["v"].fillna(-1))


# ---------------------------------------------- round-2 kernels (hypothesis)

def test_cluster_propagation_matches_union_find():
    """Distributed min-label propagation (with pointer jumping) ==
    driver union-find on ONE graph containing every adversarial topology
    as disjoint components — worst-case path, star, forest, seeded random,
    singletons. A single propagation run covers all components at the cost
    of the deepest one (each Ray round is seconds of fixed shuffle cost at
    the 4-CPU test session, so per-case runs were minutes)."""
    import ray.data

    from laji_pygeoapi_ray.stages import simdedup

    rng = np.random.default_rng(11)
    pairs = (
        [(i, i + 1) for i in range(8)]                   # path 0..8
        + [(10, j) for j in range(11, 19)]               # star 10..18
        + [(20, 21), (21, 22), (24, 25), (27, 28), (28, 29)]  # forest
        + [tuple(sorted(p + 30)) for p in
           rng.integers(0, 20, (15, 2)) if p[0] != p[1]]  # random 30..49
    )                                                     # 50.. singletons
    pdf = pd.DataFrame(pairs, columns=["id_a", "id_b"])
    ids = np.arange(54, dtype=np.int64)
    exp = (simdedup.cluster_pairs(pdf, ids)
           .sort_values("doc_id").reset_index(drop=True))
    got = (simdedup.cluster_pairs_ds(
               ray.data.from_pandas(pdf),
               ray.data.from_pandas(pd.DataFrame({"doc_id": ids})),
               num_buckets=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert (got["cluster_id"].to_numpy()
            == exp["cluster_id"].to_numpy()).all()


@settings(max_examples=50, deadline=None)
@given(st.lists(st.sampled_from(["2020", "2021-03", "2022-07-15",
                                 "2020/2021-06", "2019-01-01/..",
                                 "../2020-02"]),
                min_size=1, max_size=4))
def test_time_ranges_well_formed(items):
    """Every grammar production yields [start,end) with start < end (or an
    open side), and comma lists concatenate."""
    from laji_pygeoapi_ray.pipelines.serving import time_ranges

    value = ",".join(items)
    rs = time_ranges(value)
    assert len(rs) == len(items)
    for lo, hi in rs:
        assert lo is not None or hi is not None
        if lo is not None and hi is not None:
            assert lo < hi


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet="abc d", min_size=0, max_size=30),
                min_size=1, max_size=10))
def test_token_stats_matches_python(texts):
    """Vectorized token_stats == the straightforward per-doc computation."""
    from laji_pygeoapi_ray.functions import textkernels as tk

    got = tk.token_stats(texts)
    for i, t in enumerate(texts):
        toks = t.split(" ")
        assert got["n_tokens"][i] == len(toks)
        assert got["distinct_tokens"][i] == len(set(toks))
        assert got["stop_tokens"][i] == sum(
            tok in tk.STOPWORDS for tok in toks)


def test_id_hash_full_int64_range_sql_parity():
    """id_hash must stay exact (and non-raising, both sides) over the FULL
    int64 id range — the naive ``id·KNUTH`` form silently wraps numpy and
    raises DuckDB once ids pass ~3.5e9 (training-corpus scale). Engine,
    DuckDB twin and the mathematical value must agree everywhere."""
    import duckdb
    import numpy as np

    from laji_pygeoapi_ray.stages.sampling import (KNUTH, MOD32, id_hash,
                                                   sql_id_hash)

    ids = np.array([0, 1, 2, 12345, 2**31 - 1, 2**32 - 1, 2**32,
                    2**40 + 7, 2**62 - 3, 2**63 - 1], np.int64)
    want = [(int(i) * KNUTH) % MOD32 for i in ids.tolist()]
    assert id_hash(ids).tolist() == want
    assert id_hash(ids).dtype == np.int64
    lst = ", ".join(str(int(i)) for i in ids.tolist())
    got = duckdb.sql(
        f"SELECT {sql_id_hash('id')} AS h "
        f"FROM (SELECT unnest([{lst}]) AS id)").df()["h"].tolist()
    assert got == want
