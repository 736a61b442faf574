"""Join + set-op queries with exact oracles: partitioned hash join,
broadcast join, distinct."""
from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data
from ray.data.aggregate import Count, Max

from ..sources.parquet import read_table
from ..stages.join import broadcast_join, hash_join
from ..stages.shuffle import partial_group_counts
from .registry import register


@register("orders_by_mktsegment", sql="""
    SELECT c.c_mktsegment AS mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
           MAX(o.o_totalprice) AS max_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1""")
def orders_by_mktsegment(sf_dir: str):
    """Large-large partitioned hash join (orders ⋈ customer on custkey,
    one shuffle on the hashed key) followed by a grouped aggregate."""
    orders = read_table(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = read_table(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    cust = cust.map_batches(
        lambda t: t.rename_columns(["o_custkey", "mktsegment"]),
        batch_format="pyarrow")
    joined = hash_join(orders, cust, on=["o_custkey"], num_buckets=16)
    agg = joined.groupby("mktsegment").aggregate(
        Count(alias_name="n"), Max("o_totalprice", alias_name="max_price"))
    return agg.map_batches(
        lambda t: t.rename_columns(["mktsegment", "n", "max_price"]),
        batch_format="pyarrow")


@register("supplier_nation_broadcast", sql="""
    SELECT s.s_suppkey, s.s_name, n.n_name AS nation
    FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey""")
def supplier_nation_broadcast(sf_dir: str):
    """Broadcast left join (dimension side ray.put once, merged per batch —
    the taxonomy-join pattern, process_data.py:22)."""
    sup = read_table(sf_dir, "supplier", ["s_suppkey", "s_name",
                                          "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"]).to_pandas()
    nat = nat.rename(columns={"n_nationkey": "s_nationkey",
                              "n_name": "nation"})
    out = broadcast_join(sup, nat, on=["s_nationkey"], how="left")
    return out.map_batches(lambda df: df[["s_suppkey", "s_name", "nation"]],
                           batch_format="pandas")


@register("distinct_event_types", sql="""
    SELECT DISTINCT event_type FROM events""")
def distinct_event_types(sf_dir: str):
    """Distinct values of one column — via the pre-aggregated counts path
    (no full-row shuffle), projecting the keys."""
    ds = read_table(sf_dir, "events", ["event_type"])
    out = partial_group_counts(ds, ["event_type"])
    return out.map_batches(lambda t: t.select(["event_type"]),
                           batch_format="pyarrow")


@register("orders_by_mktsegment_native", sql="""
    SELECT c.c_mktsegment AS mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
           MAX(o.o_totalprice) AS max_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1""")
def orders_by_mktsegment_native(sf_dir: str):
    """Same join + aggregate through Ray Data's NATIVE hash join
    (``Dataset.join``, Ray ≥ 2.46) — shares orders_by_mktsegment's oracle,
    so the engine's bucketed join and Ray's built-in are both certified
    against the same SQL. The bucketed version stays the portable default;
    this validates the native backend as a drop-in."""
    orders = read_table(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = read_table(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = orders.join(cust, join_type="inner", num_partitions=16,
                         on=("o_custkey",), right_on=("c_custkey",))
    agg = joined.groupby("c_mktsegment").aggregate(
        Count(alias_name="n"), Max("o_totalprice", alias_name="max_price"))
    return agg.map_batches(
        lambda t: t.rename_columns(["mktsegment", "n", "max_price"]),
        batch_format="pyarrow")


@register("bloom_semijoin_orders", sql="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE o.o_custkey IN (SELECT c_custkey FROM customer
                          WHERE c_mktsegment = 'BUILDING')""")
def bloom_semijoin_orders(sf_dir: str):
    """Semi join with a broadcast Bloom pre-filter (128 KB) + exact
    verify: the big side is pruned inside the scan before any join
    machinery — EXACT result (no false negatives; false positives removed
    by the membership check), certified by the plain IN-subquery oracle."""
    import numpy as np

    from ..stages.join import bloom_semi_join

    keys = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    import pyarrow.compute as pc
    sel = keys.filter(pc.equal(keys["c_mktsegment"], "BUILDING"))
    small = sel["c_custkey"].to_numpy(zero_copy_only=False)
    orders = read_table(sf_dir, "orders",
                        ["o_orderkey", "o_custkey", "o_totalprice"])
    return bloom_semi_join(orders, np.asarray(small), "o_custkey")
