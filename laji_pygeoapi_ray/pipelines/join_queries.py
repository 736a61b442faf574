"""Join + set-op queries with exact oracles: partitioned hash join,
broadcast join, distinct."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data
from ray.data.aggregate import Count, Max

from ..sources.parquet import read_table
from ..stages.join import broadcast_join, hash_join
from ..stages.shuffle import partial_group_counts
from .registry import register


_MKTSEG_SQL = """
    SELECT c.c_mktsegment AS mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
           MAX(o.o_totalprice) AS max_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1"""


def _orders_mktsegment_agg(sf_dir: str, join_fn):
    """Shared read → join → aggregate shape certifying each join backend
    against the SAME oracle (_MKTSEG_SQL); ``join_fn(orders, cust)``
    supplies the backend."""
    orders = read_table(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = read_table(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    cust = cust.map_batches(
        lambda t: t.rename_columns(["o_custkey", "mktsegment"]),
        batch_format="pyarrow")
    agg = join_fn(orders, cust).groupby("mktsegment").aggregate(
        Count(alias_name="n"), Max("o_totalprice", alias_name="max_price"))
    return agg.map_batches(
        lambda t: t.rename_columns(["mktsegment", "n", "max_price"]),
        batch_format="pyarrow")


@register("orders_by_mktsegment", sql=_MKTSEG_SQL)
def orders_by_mktsegment(sf_dir: str):
    """Large-large partitioned hash join (orders ⋈ customer on custkey,
    one shuffle on the hashed key) followed by a grouped aggregate."""
    return _orders_mktsegment_agg(
        sf_dir, lambda o, c: hash_join(o, c, on=["o_custkey"]))


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
    by the membership check), certified by the plain IN-subquery oracle.
    The build side's segment predicate is PUSHED INTO the Parquet read
    (row-group/page pruning), so only the selected keys — the semi-join's
    small side by contract — ever cross to the driver, not the whole
    customer table."""
    import numpy as np
    import pyarrow.dataset as pads
    import ray.data as rd

    from ..stages.join import bloom_semi_join

    keys_ds = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"],
        filter=(pads.field("c_mktsegment") == "BUILDING"))
    small = np.concatenate(
        [b["c_custkey"].to_numpy(zero_copy_only=False)
         for b in keys_ds.iter_batches(batch_format="pyarrow")] or
        [np.empty(0, np.int64)])
    orders = read_table(sf_dir, "orders",
                        ["o_orderkey", "o_custkey", "o_totalprice"])
    return bloom_semi_join(orders, np.asarray(small), "o_custkey")


Q5_REGION = "ASIA"
Q5_LO, Q5_HI = "1996-01-01", "1997-01-01"


@register("local_supplier_volume", sql=f"""
    SELECT n.n_name AS nation,
           CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))
               AS BIGINT) AS revenue_x10000,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = '{Q5_REGION}' AND c.c_nationkey = s.s_nationkey
      AND o.o_orderdate >= TIMESTAMP '{Q5_LO}'
      AND o.o_orderdate < TIMESTAMP '{Q5_HI}'
    GROUP BY 1""")
def local_supplier_volume(sf_dir: str):
    """TPC-H-Q5-shape six-table join — the engine's multi-way join
    composition anchor: two chained LARGE-LARGE partitioned hash joins
    (orders⋈customer on custkey, then ⋈lineitem on orderkey — each ONE
    shuffle of only the carried key/int columns), with the three dimension
    tables (supplier→nation→region) collapsed into one broadcast
    suppkey→(nationkey, name, in-region) lookup applied per batch, the
    local-supplier predicate (c_nationkey = s_nationkey) filtered
    vectorized, and revenue pre-aggregated per batch before a 5-row
    groupby. Revenue is summed in exact integer cents×discount-percent
    units (floor(x·100 + 0.5) quantization — 2-decimal money, same trick
    as the quantized ANN dot products), so the float-order-dependence of
    a naive SUM(price·(1−disc)) disappears and the oracle is hash-exact.
    Date range pruned at the orders read."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import ray
    from ray.data.aggregate import Sum

    lo = np.datetime64(Q5_LO, "us")
    hi = np.datetime64(Q5_HI, "us")
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=((pads.field("o_orderdate") >= lo)
                & (pads.field("o_orderdate") < hi)))
    orders = orders.map_batches(
        lambda t: t.select(["o_orderkey", "o_custkey"])
        .rename_columns(["o_orderkey", "c_custkey"]),
        batch_format="pyarrow")
    cust = read_table(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    oc = hash_join(orders, cust, on=["c_custkey"])
    oc = oc.map_batches(lambda t: t.select(["o_orderkey", "c_nationkey"]),
                        batch_format="pyarrow")

    li = read_table(sf_dir, "lineitem",
                    ["l_orderkey", "l_suppkey", "l_extendedprice",
                     "l_discount"])
    li = li.map_batches(lambda t: t.rename_columns(
        ["o_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]),
        batch_format="pyarrow")
    ol = hash_join(li, oc, on=["o_orderkey"])

    # dimension collapse: suppkey → (nationkey, nation name) for in-region
    # suppliers only, broadcast once
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    rk = {k.as_py(): v.as_py() for k, v in zip(reg["r_regionkey"],
                                               reg["r_name"])}
    nname = {k.as_py(): (v.as_py(), rk[g.as_py()])
             for k, v, g in zip(nat["n_nationkey"], nat["n_name"],
                                nat["n_regionkey"])}
    # dense index arrays (suppkeys/nationkeys are small dense ints):
    # nat_of_supp[suppkey] = nationkey if the supplier's region matches,
    # else -1; name_of_nat[nationkey] = nation name — O(1) vectorized
    # gather per batch, no per-row dict probes
    skeys = np.asarray(sup["s_suppkey"].to_numpy())
    snats = np.asarray(sup["s_nationkey"].to_numpy())
    nat_of_supp = np.full(int(skeys.max()) + 1, -1, dtype=np.int64)
    in_region = np.array([nname[n][1] == Q5_REGION for n in snats])
    nat_of_supp[skeys[in_region]] = snats[in_region]
    max_nat = max(nname)
    name_of_nat = np.array([nname.get(n, ("",))[0]
                            for n in range(max_nat + 1)])
    dim_ref = ray.put((nat_of_supp, name_of_nat))

    def finish(t: pa.Table) -> pa.Table:
        nat_of_supp, name_of_nat = ray.get(dim_ref)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        cn = t["c_nationkey"].to_numpy(zero_copy_only=False)
        s_nat = nat_of_supp[np.clip(sk, 0, len(nat_of_supp) - 1)]
        keep = (s_nat >= 0) & (s_nat == cn)
        if not keep.any():
            return pa.table({"nation": pa.array([], pa.string()),
                             "revenue_x10000": pa.array([], pa.int64()),
                             "n_items": pa.array([], pa.int64())})
        names = name_of_nat[s_nat[keep]]
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        disc = t["l_discount"].to_numpy(zero_copy_only=False)[keep]
        cents = np.floor(price * 100.0 + 0.5).astype(np.int64)
        dpct = 100 - np.floor(disc * 100.0 + 0.5).astype(np.int64)
        rev = cents * dpct
        part = (pa.table({"nation": pa.array(names), "rev": pa.array(rev)})
                .group_by(["nation"])
                .aggregate([("rev", "sum"), ([], "count_all")]))
        return part.rename_columns(["nation", "revenue_x10000", "n_items"])

    parts = ol.map_batches(finish, batch_format="pyarrow")
    agg = parts.groupby("nation").aggregate(
        Sum("revenue_x10000", alias_name="revenue_x10000"),
        Sum("n_items", alias_name="n_items"))
    return agg.map_batches(lambda t: t.rename_columns(
        ["nation", "revenue_x10000", "n_items"]), batch_format="pyarrow")


@register("orders_left_join_building", sql="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_nationkey
    FROM orders o LEFT JOIN (SELECT c_custkey, c_nationkey FROM customer
                             WHERE c_mktsegment = 'BUILDING') c
      ON o.o_custkey = c.c_custkey""")
def orders_left_join_building(sf_dir: str):
    """LEFT OUTER partitioned hash join: every order survives; orders
    whose customer is outside the BUILDING segment carry a NULL
    c_nationkey. Certifies `hash_join(how="left")` end-to-end including
    the null-int dtype restore (`grouped_apply(out_dtypes=...)`) — the
    outer-join analogue of `orders_by_mktsegment`."""
    import pyarrow.compute as pc

    from ..stages.join import hash_join

    orders = read_table(sf_dir, "orders",
                        ["o_orderkey", "o_custkey", "o_totalprice"])
    orders = orders.map_batches(
        lambda t: t.rename_columns(["o_orderkey", "c_custkey",
                                    "o_totalprice"]),
        batch_format="pyarrow")
    cust = read_table(sf_dir, "customer",
                      ["c_custkey", "c_nationkey", "c_mktsegment"])
    cust = cust.map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING"))
                   .select(["c_custkey", "c_nationkey"]),
        batch_format="pyarrow")
    j = hash_join(orders, cust, on=["c_custkey"], how="left")
    return j.map_batches(
        lambda t: t.select(["o_orderkey", "o_totalprice", "c_nationkey"]),
        batch_format="pyarrow")


@register("selfjoin_size_users", sql="""
    WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
               FROM events GROUP BY user_id)
    SELECT CAST(SUM(c * c) AS BIGINT) AS join_rows,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(MAX(c) AS BIGINT) AS max_rows_per_user
    FROM c""")
def selfjoin_size_users(sf_dir: str):
    """Exact join-cardinality profile WITHOUT building the join — the
    planner / skew-detector stat: |events ⋈ events on user_id| = Σ c(u)²
    plus the hottest key. Per-batch partial counts → one tiny user-keyed
    groupby → 3-int global fold; the event table never self-joins (the
    oracle's subquery is the cheap equivalent; a literal COUNT(*) over
    the join would be the O(Σc²) blowup this stat exists to predict)."""
    from ray.data.aggregate import Count, Max, Sum

    from ..stages.shuffle import partial_group_counts

    ev = read_table(sf_dir, "events", ["user_id"])
    per_user = partial_group_counts(ev, ["user_id"]).map_batches(
        lambda t: t.rename_columns(["user_id", "c"]),
        batch_format="pyarrow")

    def sq(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False)
        return pa.table({"c2": pa.array(c * c), "c": t["c"]})

    row = per_user.map_batches(sq, batch_format="pyarrow").aggregate(
        Sum("c2", alias_name="join_rows"),
        Count(alias_name="n_users"),
        Max("c", alias_name="max_rows_per_user"))
    return pd.DataFrame([{
        "join_rows": np.int64(row["join_rows"]),
        "n_users": np.int64(row["n_users"]),
        "max_rows_per_user": np.int64(row["max_rows_per_user"])}])


US_PER_DAY = 86_400_000_000


@register("ship_latency_by_priority", sql=f"""
    WITH j AS (SELECT o.o_orderpriority AS priority,
                      (CAST(epoch_us(l.l_shipdate) AS BIGINT)
                       - CAST(epoch_us(o.o_orderdate) AS BIGINT))
                          // {US_PER_DAY} AS days
               FROM lineitem l JOIN orders o
                    ON l.l_orderkey = o.o_orderkey)
    SELECT priority, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(days) AS BIGINT) AS sum_days,
           CAST(MAX(days) AS BIGINT) AS max_days
    FROM j GROUP BY priority""")
def ship_latency_by_priority(sf_dir: str):
    """Order-aging report: per order priority, the lineitem-level
    ship-latency profile (exact integer day diffs by epoch floor-div) —
    the classic fulfillment SLA join. Partitioned hash join on orderkey
    (orders side pruned to 2 columns), per-batch partials to ≤5 rows."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Max, Sum
    from ..stages.join import hash_join

    li = read_table(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]) \
        .map_batches(lambda t: pa.table({
            "l_orderkey": t["l_orderkey"],
            "ship_t": pc.cast(t["l_shipdate"], pa.int64())}),
            batch_format="pyarrow")
    od = read_table(sf_dir, "orders", ["o_orderkey", "o_orderdate",
                                       "o_orderpriority"]) \
        .map_batches(lambda t: pa.table({
            "l_orderkey": t["o_orderkey"],
            "order_t": pc.cast(t["o_orderdate"], pa.int64()),
            "priority": t["o_orderpriority"]}),
            batch_format="pyarrow")

    joined = hash_join(li, od, on=["l_orderkey"])

    def partial(t: pa.Table) -> pa.Table:
        days = ((t["ship_t"].to_numpy(zero_copy_only=False)
                 - t["order_t"].to_numpy(zero_copy_only=False))
                // US_PER_DAY)
        df = pd.DataFrame({
            "priority": t["priority"].to_numpy(zero_copy_only=False),
            "n": 1, "sum_days": days, "max_days": days})
        return pa.Table.from_pandas(
            df.groupby("priority", as_index=False).agg(
                n=("n", "sum"), sum_days=("sum_days", "sum"),
                max_days=("max_days", "max")), preserve_index=False)

    agg = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby("priority").aggregate(
            Sum("n", alias_name="n"), Sum("sum_days", alias_name="sum_days"),
            Max("max_days", alias_name="max_days"))
    return agg.map_batches(
        lambda t: t.rename_columns(["priority", "n", "sum_days",
                                    "max_days"]),
        batch_format="pyarrow")


BASKET_TOPK = 20


@register("basket_part_pairs_topk", sql=f"""
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    p AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
          FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                           AND a.l_partkey < b.l_partkey),
    c AS (SELECT pa, pb, CAST(COUNT(*) AS BIGINT) AS n FROM p
          GROUP BY 1, 2)
    SELECT pa, pb, n FROM c
    QUALIFY row_number() OVER (ORDER BY n DESC, pa, pb)
        <= {BASKET_TOPK}""")
def basket_part_pairs_topk(sf_dir: str):
    """Market-basket mining: the top-{K} part pairs by co-occurrence
    support across orders (the association-rule support count; the
    parts sibling of event_type_lift). TWO shuffles total — the
    information-theoretic minimum (pair generation needs order
    co-location; counting needs pair co-location): an order-keyed
    grouped_apply emits each order's distinct-part pairs PRE-COUNTED
    per bucket (vectorized run-length pair expansion, no per-group
    Python loop), then a pair-keyed grouped_apply sums and takes the
    per-bucket top-K (complete because every pair lives in exactly one
    bucket; a Ray two-key groupby().aggregate over ~100k size-1 groups
    measured 56 s where this pandas-in-bucket sum is 0.3 s). The
    driver merges ≤ buckets·K rows. Deterministic ties (n desc, pa,
    pb)."""
    from ..stages.shuffle import grouped_apply

    li = read_table(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    _EMPTY = {"pa": pd.Series([], dtype=np.int64),
              "pb": pd.Series([], dtype=np.int64),
              "n": pd.Series([], dtype=np.int64)}

    def per_order(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates().sort_values(
            ["l_orderkey", "l_partkey"], kind="mergesort")
        ok = df["l_orderkey"].to_numpy(np.int64)
        pk = df["l_partkey"].to_numpy(np.int64)
        n = len(ok)
        if n == 0:
            return pd.DataFrame(_EMPTY)
        change = np.empty(n, bool)
        change[:-1] = ok[1:] != ok[:-1]
        change[-1] = True
        ends = np.flatnonzero(change) + 1
        grp = np.cumsum(np.concatenate(
            ([0], change[:-1].astype(np.int64))))
        tail = ends[grp] - np.arange(n) - 1
        total = int(tail.sum())
        if total == 0:
            return pd.DataFrame(_EMPTY)
        rep = np.repeat(np.arange(n), tail)
        cum = np.concatenate(([0], np.cumsum(tail)[:-1]))
        off = np.arange(total) - np.repeat(cum, tail) + 1
        # sorted-within-order + distinct ⇒ pa < pb by construction
        d = pd.DataFrame({"pa": pk[rep], "pb": pk[rep + off]})
        return d.groupby(["pa", "pb"], as_index=False).size() \
            .rename(columns={"size": "n"})

    pairs = grouped_apply(li, ["l_orderkey"], per_order)

    def bucket_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["pa", "pb"], as_index=False)["n"].sum()
        g = g.sort_values(["n", "pa", "pb"],
                          ascending=[False, True, True],
                          kind="mergesort")
        return g.head(BASKET_TOPK)

    winners = grouped_apply(pairs, ["pa", "pb"], bucket_topk).to_pandas()
    winners = winners.sort_values(["n", "pa", "pb"],
                                  ascending=[False, True, True],
                                  kind="mergesort").head(BASKET_TOPK)
    return winners.reset_index(drop=True)


# ------------------------------------------------ returned-item revenue
# TPC-H Q10 shape: who returned the most merchandise in a quarter?
# (reference analogue: edit_db.py's revenue-style SQL aggregates composed
# with the provider's customer lookups — here as one distributed plan).

Q10_LO = "1996-01-01"
Q10_HI = "1996-07-01"
Q10_K = 20


@register("returned_item_topk", sql=f"""
    WITH r AS (
      SELECT o.o_custkey AS c_custkey,
             CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                  * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))
                 AS BIGINT) AS revenue_x10000
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_returnflag = 'R'
        AND o.o_orderdate >= TIMESTAMP '{Q10_LO}'
        AND o.o_orderdate < TIMESTAMP '{Q10_HI}'
      GROUP BY 1),
    t AS (SELECT * FROM r
          QUALIFY row_number() OVER
              (ORDER BY revenue_x10000 DESC, c_custkey) <= {Q10_K})
    SELECT t.c_custkey, c.c_name, t.revenue_x10000, c.c_acctbal,
           n.n_name AS nation
    FROM t JOIN customer c ON c.c_custkey = t.c_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey""")
def returned_item_topk(sf_dir: str):
    """TPC-H-Q10-shape returned-item revenue: top-{K} customers by exact
    integer revenue (cents × discount-percent, the Q5 quantization) over
    'R'-flagged lineitems in a date quarter. Scale shape: BOTH fact reads
    are predicate-pruned at the Parquet scan (returnflag on lineitem, the
    date window on orders — only keys + 2 money columns leave storage);
    ONE large-large hash join on orderkey; revenue pre-summed per batch
    BEFORE the custkey groupby so the shuffle carries one row per
    (batch, custkey); top-K via per-block partial + driver merge (no
    global sort); customer attributes attached AFTER selection by a
    K-row pruned read (the 100-TB customer table is never scanned
    wholesale), nation name via a 25-row broadcast gather."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    from ray.data.aggregate import Sum

    from ..stages.stream import topk_by

    lo = np.datetime64(Q10_LO, "us")
    hi = np.datetime64(Q10_HI, "us")
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"],
        filter=((pads.field("o_orderdate") >= lo)
                & (pads.field("o_orderdate") < hi)))
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_returnflag") == "R"))

    def to_rev(t: pa.Table) -> pa.Table:
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        cents = np.floor(price * 100.0 + 0.5).astype(np.int64)
        dpct = 100 - np.floor(disc * 100.0 + 0.5).astype(np.int64)
        return pa.table({"o_orderkey": t["l_orderkey"],
                         "rev": pa.array(cents * dpct)})

    li = li.map_batches(to_rev, batch_format="pyarrow")
    joined = hash_join(li, orders, on=["o_orderkey"])

    def partial_sum(t: pa.Table) -> pa.Table:
        part = (t.select(["o_custkey", "rev"]).group_by(["o_custkey"])
                .aggregate([("rev", "sum")]))
        return part.rename_columns(["c_custkey", "revenue_x10000"])

    per_cust = (joined.map_batches(partial_sum, batch_format="pyarrow")
                .groupby("c_custkey")
                .aggregate(Sum("revenue_x10000",
                               alias_name="revenue_x10000"))
                .map_batches(lambda t: t.rename_columns(
                    ["c_custkey", "revenue_x10000"]),
                    batch_format="pyarrow"))
    top = topk_by(per_cust, "revenue_x10000", Q10_K, tie_col="c_custkey")
    top = top.drop_columns(["rank"])

    keys = top["c_custkey"].to_pylist()
    if not keys:
        # empty date-window/returnflag selection: return a TYPED empty
        # table (the cross_source_dup_matrix convention) — the pruned
        # customer read with filters=[("c_custkey","in",[])] and the
        # arrow join/sort below must never run on untyped empties
        return pa.table({"c_custkey": pa.array([], pa.int64()),
                         "c_name": pa.array([], pa.string()),
                         "revenue_x10000": pa.array([], pa.int64()),
                         "c_acctbal": pa.array([], pa.float64()),
                         "nation": pa.array([], pa.string())})
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
        filters=[("c_custkey", "in", keys)])
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    name_of_nat = np.asarray(nat["n_name"])[
        np.argsort(nat["n_nationkey"].to_numpy())]
    out = (top.join(cust, keys=["c_custkey"])
           .sort_by([("revenue_x10000", "descending"),
                     ("c_custkey", "ascending")]))
    nation = name_of_nat[out["c_nationkey"].to_numpy(zero_copy_only=False)]
    return pa.table({"c_custkey": out["c_custkey"],
                     "c_name": out["c_name"],
                     "revenue_x10000": out["revenue_x10000"],
                     "c_acctbal": out["c_acctbal"],
                     "nation": pa.array(nation)})


# ------------------------------------------- referential-integrity audit

def _keyed_counts(ds, cols: list[str]):
    """Per-batch (key → row count) partials — the only thing that ever
    shuffles in the audit (distinct keys + an int, never wide rows)."""
    def part(t: pa.Table) -> pa.Table:
        g = t.select(cols).group_by(cols).aggregate([([], "count_all")])
        return g.rename_columns(list(cols) + ["cnt"])
    return ds.map_batches(part, batch_format="pyarrow")


def _audit_partials(parts, key_cols: list[str], finish, chk: str):
    """One key-hash shuffle, then ``finish(per-key totals) -> int`` per
    bucket; returns a LAZY Dataset of ≤ num_buckets (chk, n) rows so all
    of an audit's checks can union into one streaming topology (they
    execute concurrently on a single consumption instead of one blocking
    ``to_pandas`` per check)."""
    from ..stages.shuffle import grouped_apply

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        tot = df.groupby(key_cols, as_index=False).sum(numeric_only=True)
        return pd.DataFrame({"chk": [chk],
                             "n": pd.Series([finish(tot)],
                                            dtype=np.int64)})

    return grouped_apply(parts, key_cols, bucket)


@register("referential_integrity_audit", sql="""
    SELECT 'customer_unreferenced_rows' AS chk,
           CAST(COUNT(*) AS BIGINT) AS violations
    FROM customer c WHERE NOT EXISTS
        (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'lineitem_dup_line_rows', CAST(COALESCE(SUM(c), 0) AS BIGINT)
    FROM (SELECT COUNT(*) AS c FROM lineitem
          GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1)
    UNION ALL
    SELECT 'lineitem_nonpositive_qty_rows', CAST(COUNT(*) AS BIGINT)
    FROM lineitem WHERE l_quantity <= 0
    UNION ALL
    SELECT 'lineitem_orphan_rows', CAST(COUNT(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS
        (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'orders_dup_pk_rows', CAST(COALESCE(SUM(c), 0) AS BIGINT)
    FROM (SELECT COUNT(*) AS c FROM orders
          GROUP BY o_orderkey HAVING COUNT(*) > 1)
    UNION ALL
    SELECT 'orders_orphan_rows', CAST(COUNT(*) AS BIGINT)
    FROM orders o WHERE NOT EXISTS
        (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)""")
def referential_integrity_audit(sf_dir: str):
    """Constraint-validation audit over the warehouse tables — the
    pre-ingest sibling of table_checksum_ranges (a real pipeline runs it
    before trusting an upstream drop): foreign-key orphan row counts in
    BOTH directions (lineitem→orders, orders→customer, plus the
    unreferenced-dimension coverage stat), duplicate-primary-key row
    counts, and a domain check (non-positive quantity). Scale shape:
    every check reduces each side to per-batch (key → count) partials
    FIRST, so the only shuffles carry distinct keys + one int64 — wide
    rows never move; the domain check is a scan-local partial sum with
    no shuffle at all; all six checks union into ONE lazy topology and
    execute concurrently on a single consumption. Nonzero-violation
    detection is proven by the planted-corruption pytest
    (tests/test_integrity_audit.py)."""
    import pyarrow.compute as pc

    def _k(table: str, cols: list[str]):
        ds = _keyed_counts(read_table(sf_dir, table, cols), cols)
        return ds.map_batches(
            lambda t, n=len(cols): t.rename_columns(
                [f"k{i}" for i in range(n)] + ["cnt"]),
            batch_format="pyarrow")

    def orphan(a_parts, b_parts, chk: str):
        a = a_parts.map_batches(
            lambda t: t.rename_columns(["k0", "a_cnt"])
            .append_column("b_cnt", pa.array(
                np.zeros(t.num_rows, np.int64))), batch_format="pyarrow")
        b = b_parts.map_batches(
            lambda t: pa.table(
                {"k0": t[0],
                 "a_cnt": pa.array(np.zeros(t.num_rows, np.int64)),
                 "b_cnt": t[1]}), batch_format="pyarrow")
        return _audit_partials(
            a.union(b), ["k0"],
            lambda tot: int(tot.loc[tot["b_cnt"] == 0, "a_cnt"].sum()),
            chk)

    def dup_rows(parts, nkeys: int, chk: str):
        return _audit_partials(
            parts, [f"k{i}" for i in range(nkeys)],
            lambda tot: int(tot.loc[tot["cnt"] > 1, "cnt"].sum()), chk)

    li_k = _k("lineitem", ["l_orderkey"])
    orders_k = _k("orders", ["o_orderkey"])
    cust_k = _k("customer", ["c_custkey"])
    ord_cust_k = _k("orders", ["o_custkey"])

    checks = [
        orphan(cust_k, ord_cust_k, "customer_unreferenced_rows"),
        dup_rows(_k("lineitem", ["l_orderkey", "l_linenumber"]), 2,
                 "lineitem_dup_line_rows"),
        orphan(li_k, orders_k, "lineitem_orphan_rows"),
        dup_rows(orders_k, 1, "orders_dup_pk_rows"),
        orphan(ord_cust_k, cust_k, "orders_orphan_rows"),
        read_table(sf_dir, "lineitem", ["l_quantity"]).map_batches(
            lambda t: pa.table(
                {"chk": pa.array(["lineitem_nonpositive_qty_rows"]),
                 "n": pa.array(
                     [pc.sum(pc.less_equal(t["l_quantity"],
                                           0.0)).as_py() or 0],
                     pa.int64())}), batch_format="pyarrow"),
    ]
    allp = checks[0]
    for c in checks[1:]:
        allp = allp.union(c)
    df = allp.to_pandas()
    tot = (df.groupby("chk", as_index=False)["n"].sum()
           .sort_values("chk", kind="mergesort"))
    return pa.table({"chk": pa.array(tot["chk"].tolist()),
                     "violations": pa.array(
                         tot["n"].to_numpy(np.int64), pa.int64())})


@register("orders_by_mktsegment_sortmerge", sql=_MKTSEG_SQL)
def orders_by_mktsegment_sortmerge(sf_dir: str):
    """Same join + aggregate through the RANGE-partitioned sort-merge
    backend (``stages/join.sort_merge_join``) — the third certified join
    strategy next to the hash-bucketed and Ray-native variants (all three
    share this oracle via _orders_mktsegment_agg). Boundaries from one
    histogram pass over the left key; output arrives range-ordered by
    custkey, which a downstream merge consumer could exploit."""
    from ..stages.join import sort_merge_join

    return _orders_mktsegment_agg(
        sf_dir, lambda o, c: sort_merge_join(o, c, on="o_custkey",
                                             num_ranges=16))


# ----------------------- skew-split join certification (hot-key path)

SKEW_HOT_K = 8


@register("activity_weighted_value", sql="""
    WITH u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
               FROM events GROUP BY 1)
    SELECT e.event_type,
           CAST(SUM(CAST(floor(e.value * 100 + 0.5) AS BIGINT)
                    * u.n_events) AS BIGINT) AS weighted_cents,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events e JOIN u ON u.user_id = e.user_id
    GROUP BY 1""")
def activity_weighted_value(sf_dir: str):
    """Activity-weighted value per event type (each event weighted by
    its user's total activity — the engagement-weighted revenue shape)
    THROUGH the skew-mitigated join: the top-{K} heaviest users join a
    broadcast dimension slice inside the scan (their rows never enter
    the shuffle — on a real log the head user can dominate a hash
    bucket), the cold tail takes the bucketed hash join, and the oracle
    — a plain join — certifies that the split is invisible in the
    result. Dimension = the per-user event-count profile (bounded by
    |users|, asserted; at a data-scale user axis the dim itself stays a
    Dataset and hot keys come from shuffle.heavy_hitters_exact)."""
    from ray.data.aggregate import Sum

    from ..stages.join import skew_split_join
    from ..stages.shuffle import partial_group_counts

    ev = read_table(sf_dir, "events",
                    ["user_id", "event_type", "value"])

    dim = partial_group_counts(
        ev.map_batches(lambda t: t.select(["user_id"]),
                       batch_format="pyarrow"),
        ["user_id"], count_col="n_events").to_pandas()
    dim = dim.rename(columns=dict(zip(dim.columns,
                                      ["user_id", "n_events"])))
    assert len(dim) <= 1_000_000, (
        "activity_weighted_value: per-user dim exceeds the bounded "
        "broadcast contract — switch to the Dataset-dim hash path")
    hot = (dim.sort_values(["n_events", "user_id"],
                           ascending=[False, True])
           .head(SKEW_HOT_K)["user_id"].to_numpy(np.int64))

    def prep(t: pa.Table) -> pa.Table:
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100 + 0.5) \
            .astype(np.int64)
        return pa.table({"user_id": t["user_id"],
                         "event_type": t["event_type"],
                         "cents": pa.array(cents)})

    joined = skew_split_join(
        ev.map_batches(prep, batch_format="pyarrow"), dim,
        on="user_id", hot_keys=hot,
        # prep's output schema is declared statically → no schema probe,
        # the fact lineage executes exactly once
        fact_schema=pa.schema([("user_id", pa.int64()),
                               ("event_type", pa.string()),
                               ("cents", pa.int64())]))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        w = (df["cents"].to_numpy(np.int64)
             * df["n_events"].to_numpy(np.int64))
        out = pd.DataFrame({"event_type": df["event_type"], "w": w,
                            "one": np.ones(len(df), np.int64)})
        return (out.groupby("event_type", as_index=False)
                .agg(weighted_cents=("w", "sum"), n=("one", "sum")))

    agg = (joined.map_batches(partial, batch_format="pandas")
           .groupby("event_type")
           .aggregate(Sum("weighted_cents", alias_name="weighted_cents"),
                      Sum("n", alias_name="n")))
    return agg.map_batches(
        lambda t: t.rename_columns(["event_type", "weighted_cents", "n"]),
        batch_format="pyarrow")
