"""Planted-corruption test for referential_integrity_audit: build a tiny
warehouse with KNOWN violations of every checked constraint and assert the
audit reports the exact counts (the zero-violation case is covered by the
oracle sweep over the clean testdata)."""
import numpy as np
import pandas as pd
import pytest

from laji_pygeoapi_ray.pipelines.join_queries import (
    referential_integrity_audit)


@pytest.fixture(scope="module")
def corrupt_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corrupt_wh")
    # customers 1..5; customer 5 never referenced by any order
    pd.DataFrame({
        "c_custkey": np.arange(1, 6, dtype=np.int64),
        "c_name": [f"c{i}" for i in range(1, 6)],
        "c_nationkey": np.zeros(5, np.int64),
        "c_acctbal": np.linspace(0.0, 4.0, 5),
        "c_mktsegment": ["BUILDING"] * 5,
    }).to_parquet(d / "customer.parquet", index=False)
    # orders 10..14 (+ order 12 duplicated twice more → 3 dup-pk rows);
    # orders 13, 14 reference missing customers 8, 9 → 2 orphan rows
    pd.DataFrame({
        "o_orderkey": np.array([10, 11, 12, 12, 12, 13, 14], np.int64),
        "o_custkey": np.array([1, 2, 3, 3, 3, 8, 9], np.int64),
        "o_orderdate": pd.to_datetime(["1996-01-02"] * 7),
        "o_totalprice": np.ones(7),
        "o_orderstatus": ["O"] * 7,
        "o_orderpriority": ["1-URGENT"] * 7,
    }).to_parquet(d / "orders.parquet", index=False)
    # lineitems: 2 orphans (orderkey 99), one duplicated (orderkey,
    # linenumber) pair → 2 dup rows, one zero + one negative quantity
    pd.DataFrame({
        "l_orderkey": np.array([10, 10, 11, 12, 99, 99], np.int64),
        "l_linenumber": np.array([1, 1, 1, 1, 1, 2], np.int64),
        "l_quantity": np.array([5.0, 0.0, -3.0, 2.0, 1.0, 1.0]),
        "l_partkey": np.ones(6, np.int64),
        "l_suppkey": np.ones(6, np.int64),
        "l_extendedprice": np.ones(6),
        "l_discount": np.zeros(6),
        "l_returnflag": ["N"] * 6,
        "l_shipdate": pd.to_datetime(["1996-02-01"] * 6),
    }).to_parquet(d / "lineitem.parquet", index=False)
    return str(d)


def test_planted_violations_exact(corrupt_dir):
    out = referential_integrity_audit(corrupt_dir).to_pandas()
    got = dict(zip(out["chk"], out["violations"]))
    assert got == {
        "customer_unreferenced_rows": 2,   # custkeys 4 and 5
        "lineitem_dup_line_rows": 2,       # (10, 1) twice
        "lineitem_nonpositive_qty_rows": 2,
        "lineitem_orphan_rows": 2,         # orderkey 99 twice
        "orders_dup_pk_rows": 3,           # orderkey 12 three times
        "orders_orphan_rows": 2,           # custkeys 8, 9
    }
    assert out["violations"].dtype == np.int64
