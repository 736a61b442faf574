"""Shuffle-operator queries: exact dedup (keep-latest / keep-first) and the
CSV-spec merge aggregate, each with an exact DuckDB oracle.

Reference semantics: ``remove_duplicates`` (``edit_db.py:333-379``),
``merge_similar_observations`` (``edit_db.py:381-460``),
``get_quality_frequency`` (``edit_db.py:160-187``)."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count

from ..functions import cells
from ..functions import points as _pts
from ..sources.parquet import read_table
from ..stages.dedup import dedup_keep_latest
from ..stages.merge import MergeSpec, merge_similar
from .registry import register


@register("dedup_events_latest", sql="""
    SELECT event_id, ts, user_id, event_type, value, props FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1""")
def dedup_events_latest(sf_dir: str):
    """Keep-latest-per-key dedup (``DISTINCT ON … ORDER BY load_date DESC``,
    ``edit_db.py:364-369``) over the events stream: key=user_id,
    order=(ts, event_id) DESC."""
    ds = read_table(sf_dir, "events")
    return dedup_keep_latest(ds, ["user_id"], ["ts", "event_id"])


@register("dedup_docs_first", sql="""
    SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id, text
    FROM documents GROUP BY text""")
def dedup_docs_first(sf_dir: str):
    """Exact content dedup: one row per distinct document text, keeping the
    smallest doc_id (first-arrival semantics, SURVEY.md §2.5 anti/semi-join
    note). The training-data 'exact dedup' primitive."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    return dedup_keep_latest(ds, ["text"], ["doc_id"], descending=False)


MERGE_SPEC_LINEITEM = MergeSpec(
    groupby=["l_partkey", "l_suppkey"],
    order=["l_orderkey", "l_linenumber"],
    first=["l_returnflag"],
    aggregate=["orderkey_str"],
    sum=["l_quantity"],
    max=["l_extendedprice"],
    count_col="yhdistetty",
)


@register("merge_similar_lineitem", sql="""
    SELECT l_partkey, l_suppkey,
           first(l_returnflag ORDER BY l_orderkey, l_linenumber) AS l_returnflag,
           string_agg(CAST(l_orderkey AS VARCHAR), ', '
                      ORDER BY l_orderkey, l_linenumber) AS orderkey_str,
           SUM(l_quantity) AS l_quantity,
           MAX(l_extendedprice) AS l_extendedprice,
           CAST(COUNT(*) AS BIGINT) AS yhdistetty
    FROM lineitem GROUP BY l_partkey, l_suppkey""")
def merge_similar_lineitem(sf_dir: str):
    """The merge_similar_observations semantics (FIRST / AGGREGATE / SUM /
    MAX / Yhdistetty, ``edit_db.py:381-460``) exercised on lineitem:
    GROUPBY (l_partkey, l_suppkey), deterministic in-group order
    (l_orderkey, l_linenumber). l_quantity is integral so the distributed
    SUM is bit-exact vs the oracle."""
    ds = read_table(
        sf_dir, "lineitem",
        ["l_partkey", "l_suppkey", "l_orderkey", "l_linenumber",
         "l_returnflag", "l_quantity", "l_extendedprice"])

    def add_strcol(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.append_column(
            "orderkey_str", pc.cast(t["l_orderkey"], pa.string()))

    ds = ds.map_batches(add_strcol, batch_format="pyarrow")
    return merge_similar(ds, MERGE_SPEC_LINEITEM)


@register("quality_freq_events", sql="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           floor(CAST(COUNT(*) AS DOUBLE)
                 / CAST((SELECT COUNT(*) FROM events) AS DOUBLE)
                 * CAST(100.0 AS DOUBLE) * CAST(100.0 AS DOUBLE)
                 + CAST(0.5 AS DOUBLE)) / CAST(100.0 AS DOUBLE) AS pct
    FROM events GROUP BY event_type""")
def quality_freq_events(sf_dir: str):
    """``get_quality_frequency`` (``edit_db.py:160-187``): grouped count ÷
    total × 100, rounded to 2 decimals — round-half-up implemented as
    floor(x·100 + 0.5)/100 identically on both sides (numpy rounds
    half-to-even, DuckDB half-away; floor is unambiguous)."""
    ds = read_table(sf_dir, "events", ["event_type"])
    total = ds.count()
    agg = ds.groupby("event_type").aggregate(Count(alias_name="n"))

    def add_pct(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        pct = np.floor(n / np.float64(total) * np.float64(100.0)
                       * np.float64(100.0) + np.float64(0.5)) / np.float64(100.0)
        t = t.append_column("pct", pa.array(pct))
        return t.rename_columns(["event_type", "n", "pct"])

    return agg.map_batches(add_pct, batch_format="pyarrow")


@register("table_dates_events", sql="""
    SELECT event_type,
           strftime(MIN(ts), '%Y-%m-%dT%H:%M:%SZ') AS time_start,
           strftime(MAX(ts), '%Y-%m-%dT%H:%M:%SZ') AS time_end
    FROM events GROUP BY event_type""")
def table_dates_events(sf_dir: str):
    """``get_table_dates`` (edit_db.py:189-212): per-partition temporal
    extent formatted RFC3339 — the metadata temporal-extent aggregate."""
    from ray.data.aggregate import Max, Min

    ds = read_table(sf_dir, "events", ["event_type", "ts"])
    agg = ds.groupby("event_type").aggregate(
        Min("ts", alias_name="t0"), Max("ts", alias_name="t1"))

    def fmt(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={df.columns[0]: "event_type"})
        out = pd.DataFrame({
            "event_type": df["event_type"],
            "time_start": pd.to_datetime(df["t0"]).dt.strftime(
                "%Y-%m-%dT%H:%M:%SZ"),
            "time_end": pd.to_datetime(df["t1"]).dt.strftime(
                "%Y-%m-%dT%H:%M:%SZ"),
        })
        return out

    return agg.map_batches(fmt, batch_format="pandas")


@register("median_event_value", sql="""
    WITH r AS (SELECT value, row_number() OVER (ORDER BY value, event_id)
                          AS rn, COUNT(*) OVER () AS n
               FROM events)
    SELECT value AS median_value, CAST(n AS BIGINT) AS n
    FROM r WHERE rn = (n - 1) // 2 + 1""")
def median_event_value(sf_dir: str):
    """Distributed EXACT median (k = (n-1)//2 order statistic) of
    events.value via two-pass histogram selection — no global sort; only
    one histogram bin's values ever reach the driver."""
    from ..stages.shuffle import kth_value_2pass

    ds = read_table(sf_dir, "events", ["event_id", "value"])
    n = ds.count()
    v, n2 = kth_value_2pass(read_table(sf_dir, "events", ["value"]),
                            "value", (n - 1) // 2)
    return pa.table({"median_value": pa.array([v], pa.float64()),
                     "n": pa.array([n], pa.int64())})


@register("topk_orders_per_segment", sql="""
    SELECT mktsegment, o_orderkey, o_totalprice, CAST(rk AS BIGINT) AS rk
    FROM (SELECT c.c_mktsegment AS mktsegment, o.o_orderkey, o.o_totalprice,
                 row_number() OVER (PARTITION BY c.c_mktsegment
                     ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rk
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
    WHERE rk <= 3""")
def topk_orders_per_segment(sf_dir: str):
    """Top-k PER GROUP (top-3 orders by price per market segment): join +
    one bucketed shuffle on the group key + per-group vectorized
    sort/head — the grouped ranking operator (no global sort, no per-group
    Python)."""
    from ..stages.join import hash_join
    from ..stages.shuffle import grouped_apply

    orders = read_table(sf_dir, "orders", ["o_custkey", "o_orderkey",
                                           "o_totalprice"])
    cust = read_table(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    cust = cust.map_batches(
        lambda t: t.rename_columns(["o_custkey", "mktsegment"]),
        batch_format="pyarrow")
    joined = hash_join(orders, cust, on=["o_custkey"])

    def bucket_fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["mktsegment", "o_totalprice", "o_orderkey"],
                            ascending=[True, False, True],
                            kind="mergesort")
        out = df.groupby("mktsegment", sort=False).head(3).copy()
        out["rk"] = out.groupby("mktsegment", sort=False).cumcount() + 1
        return out[["mktsegment", "o_orderkey", "o_totalprice", "rk"]]

    return grouped_apply(joined, ["mktsegment"], bucket_fn, num_buckets=8)


@register("median_value_by_type", sql="""
    WITH r AS (SELECT event_type, value,
                      row_number() OVER (PARTITION BY event_type
                          ORDER BY value, event_id) AS rn,
                      COUNT(*) OVER (PARTITION BY event_type) AS n
               FROM events)
    SELECT event_type, value AS median_value, CAST(n AS BIGINT) AS n
    FROM r WHERE rn = (n - 1) // 2 + 1""")
def median_value_by_type(sf_dir: str):
    """Grouped EXACT median (k = (n-1)//2 per group, ties by event_id):
    one bucketed shuffle on the group key, per-group vectorized order
    selection."""
    from ..stages.shuffle import grouped_apply

    ds = read_table(sf_dir, "events", ["event_type", "event_id", "value"])

    def bucket_fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["event_type", "value", "event_id"],
                            kind="mergesort")
        g = df.groupby("event_type", sort=False)
        n = g["value"].transform("size")
        pos = g.cumcount()
        sel = df[pos == (n - 1) // 2].copy()
        sel["n"] = n[pos == (n - 1) // 2]
        return sel.rename(columns={"value": "median_value"})[
            ["event_type", "median_value", "n"]]

    return grouped_apply(ds, ["event_type"], bucket_fn, num_buckets=8)


EVENT_TYPES = ("click", "purchase", "view")   # fixture enum, fixed order


@register("event_hour_pivot", sql=f"""
    SELECT CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS hour,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END), 0)
                AS BIGINT) AS n_click,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END), 0)
                AS BIGINT) AS n_purchase,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1 END), 0)
                AS BIGINT) AS n_view
    FROM events GROUP BY 1""")
def event_hour_pivot(sf_dir: str):
    """Pivot (long → wide): per-hour counts spread into one column per
    event type — pre-aggregated partial counts shuffle (a few rows per
    batch), then a vectorized reshape of the tiny grouped result."""
    from ..stages.shuffle import partial_group_counts
    from ..stages.stream import add_window_column

    ds = read_table(sf_dir, "events", ["event_type", "ts"])
    ds = ds.map_batches(add_window_column("ts", out_col="hour"),
                        batch_format="pyarrow")
    long = partial_group_counts(
        ds.map_batches(lambda t: t.select(["event_type", "hour"]),
                       batch_format="pyarrow"), ["event_type", "hour"])

    def pivot(df: pd.DataFrame) -> pd.DataFrame:
        wide = (df.pivot_table(index="hour", columns="event_type",
                               values="n", aggfunc="sum", fill_value=0)
                .reindex(columns=list(EVENT_TYPES), fill_value=0)
                .reset_index())
        wide.columns = ["hour"] + [f"n_{t}" for t in EVENT_TYPES]
        for c in wide.columns:
            wide[c] = wide[c].astype("int64")
        return wide

    # the grouped result is tiny (hours × types) — one reshape batch
    return pivot(long.to_pandas())


@register("event_lag_gaps", sql="""
    SELECT event_id, user_id,
           CAST(lag(event_id) OVER w AS DOUBLE) AS prev_event_id,
           CAST(CAST(epoch_us(ts) AS BIGINT)
                - CAST(epoch_us(lag(ts) OVER w) AS BIGINT) AS DOUBLE)
               AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""")
def event_lag_gaps(sf_dir: str):
    """Window lag/lead: each event paired with its user's previous event
    and the gap in µs (ties by event_id) — one key shuffle, per-user
    vectorized shift (the window-function family)."""
    from ..stages.shuffle import grouped_apply

    ds = read_table(sf_dir, "events", ["event_id", "user_id", "ts"])

    def bucket_fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort").reset_index(drop=True)
        g = df.groupby("user_id", sort=False)
        prev = g["event_id"].shift()
        ts_us = df["ts"].to_numpy("datetime64[us]").astype("int64")
        prev_ts = pd.Series(ts_us).groupby(
            df["user_id"].to_numpy(), sort=False).shift()
        out = pd.DataFrame({
            "event_id": df["event_id"],
            "user_id": df["user_id"],
            "prev_event_id": prev.astype("float64"),
            "gap_us": (ts_us - prev_ts).astype("float64"),
        })
        return out

    out = grouped_apply(ds, ["user_id"], bucket_fn)

    def nullify(t: pa.Table) -> pa.Table:
        import numpy as np
        cols = {}
        for c in t.column_names:
            if c in ("prev_event_id", "gap_us"):
                v = t[c].to_numpy(zero_copy_only=False)
                cols[c] = pa.array(v, mask=np.isnan(v))
            else:
                cols[c] = t[c]
        return pa.table(cols)

    return out.map_batches(nullify, batch_format="pyarrow")


@register("rollup_geom_counts", sql=lambda: f"""
    WITH assigned AS ({__import__('laji_pygeoapi_ray.pipelines.geoqueries',
        fromlist=['_pip_sql'])._pip_sql(
            __import__('laji_pygeoapi_ray.state.fixtures',
                       fromlist=['province_layer']).province_layer, True)}),
    base AS (SELECT a.name AS province,
                    {__import__('laji_pygeoapi_ray.stages.geometry',
                                fromlist=['sql_geom_group'])
                     .sql_geom_group('doc_id')} AS geom_group
             FROM assigned a)
    SELECT COALESCE(province, '(all)') AS province,
           COALESCE(geom_group, '(all)') AS geom_group,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM base GROUP BY ROLLUP (province, geom_group)""")
def rollup_geom_counts(sf_dir: str):
    """ROLLUP / grouping-sets: counts at (province, geom_group),
    (province) and () levels from ONE partial-counts pass — the coarser
    levels re-aggregate the tiny finest-level result, never the input."""
    from ..stages import assign, geometry as geomstage
    from ..stages.derive import derive_and_encode
    from ..stages.shuffle import partial_group_counts
    from ..sources.parquet import fixed_pool

    ds = read_table(sf_dir, "documents", ["doc_id"])
    ds = ds.map_batches(derive_and_encode("doc_id", (7,)),
                        batch_format="pyarrow", zero_copy_batch=True)
    # CPU-bound WKB repair: split across cores (see geom_split_counts —
    # explicit small batches keep operator fusion from collapsing the
    # repair into one task)
    ds = ds.repartition(32)
    ds = ds.map_batches(geomstage.build_geometry(), batch_format="pyarrow",
                        batch_size=256)
    ds = ds.map_batches(geomstage.normalize_validate,
                        batch_format="pyarrow", batch_size=256)
    # fixed pre-started pool (autoscaling ramps too slowly here)
    ds = ds.map_batches(assign.PIPAssigner, batch_format="pyarrow",
                        batch_size=512, concurrency=fixed_pool(),
                        num_cpus=1)
    fine = partial_group_counts(
        ds.map_batches(lambda t: t.select(["province", "geom_group"]),
                       batch_format="pyarrow"),
        ["province", "geom_group"]).to_pandas()   # tiny: 21×3 rows

    lvl1 = (fine.groupby("province", as_index=False)["n"].sum()
            .assign(geom_group="(all)"))
    total = pd.DataFrame({"province": ["(all)"], "geom_group": ["(all)"],
                          "n": [fine["n"].sum()]})
    out = pd.concat([fine, lvl1, total], ignore_index=True)
    out["n"] = out["n"].astype("int64")
    return out[["province", "geom_group", "n"]]


@register("hll_distinct_users", sql="""
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT)
               AS exact_distinct_users,
           TRUE AS hll_within_5pct
    FROM events""")
def hll_distinct_users(sf_dir: str):
    """HyperLogLog distinct-user sketch over events (p=12, ~1.6 % err):
    4 KB partials per batch, max-merge. Oracle-bearing now: the exact
    distinct count is computed DISTRIBUTED (per-batch unique partials →
    one dedup shuffle → count — the `distinct` operator) and
    value-checked against COUNT(DISTINCT); the sketch is certified by the
    hll_within_5pct flag, which goes false (→ red driver row) if the HLL
    estimate drifts beyond ±5 % of the exact count."""
    import pyarrow.compute as pc

    from ..stages.shuffle import grouped_apply, hll_distinct

    ds = read_table(sf_dir, "events", ["user_id"])
    est = hll_distinct(ds, "user_id")
    # exact distinct, distributed: per-batch unique → hash dedup shuffle
    partials = ds.map_batches(
        lambda t: pa.table({"user_id": pc.unique(t["user_id"])}),
        batch_format="pyarrow")
    exact = grouped_apply(partials, ["user_id"],
                          lambda df: df.drop_duplicates()).count()
    return pa.table({
        "exact_distinct_users": pa.array([exact], pa.int64()),
        "hll_within_5pct": pa.array([abs(est - exact) <= 0.05 * exact],
                                    pa.bool_())})


PCTS = (50, 90, 99)


@register("event_value_percentiles", sql=f"""
    WITH r AS (SELECT value, row_number() OVER (ORDER BY value) AS rn,
                      COUNT(*) OVER () AS n
               FROM events)
    SELECT CAST(p AS BIGINT) AS pct, v AS value FROM (
      {" UNION ALL ".join(
          f"SELECT {p} AS p, (SELECT value FROM r "
          f"WHERE rn = (n - 1) * {p} // 100 + 1) AS v"
          for p in PCTS)})""")
def event_value_percentiles(sf_dir: str):
    """EXACT p50/p90/p99 of events.value in ONE shared histogram pass +
    ONE candidate-bin scan (`kth_values_2pass` — the multi-rank order
    statistic; a naive implementation pays one full pass per
    percentile)."""
    from ..stages.shuffle import kth_values_2pass

    ds = read_table(sf_dir, "events", ["value"])
    n = ds.count()
    ks = [(n - 1) * p // 100 for p in PCTS]
    vals, _ = kth_values_2pass(read_table(sf_dir, "events", ["value"]),
                               "value", ks)
    return pa.table({"pct": pa.array(list(PCTS), pa.int64()),
                     "value": pa.array(vals, pa.float64())})


PROFILE_NUM = ("l_quantity", "l_discount", "l_tax")
PROFILE_STR = ("l_returnflag", "l_linestatus")


@register("profile_lineitem", sql=lambda: " UNION ALL ".join(
    [f"""SELECT '{c}' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
         MIN({c}) AS min_d, MAX({c}) AS max_d,
         CAST(NULL AS VARCHAR) AS min_s, CAST(NULL AS VARCHAR) AS max_s,
         CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv FROM lineitem"""
     for c in PROFILE_NUM] +
    [f"""SELECT '{c}', CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(*) - COUNT({c}) AS BIGINT),
         CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), MIN({c}), MAX({c}),
         CAST(COUNT(DISTINCT {c}) AS BIGINT) FROM lineitem"""
     for c in PROFILE_STR]))
def profile_lineitem(sf_dir: str):
    """Column profiler — the schema-statistics pass every 100-TB ingest
    runs first: per-column row/null counts, min/max, and EXACT distinct
    counts for bounded-cardinality columns, in ONE scan of only the
    profiled columns. Per-batch partials (a handful of stats rows + the
    batch's distinct values per column) are the only thing that shuffles;
    one `grouped_apply` bucket per column folds them. The distinct-count
    contract is bounded-cardinality columns (enums, flags, quantized
    measures) — unbounded keys belong to the HLL profiler path
    (`hll_distinct_users`)."""
    import pyarrow.compute as pc

    from ..stages.shuffle import grouped_apply

    cols = list(PROFILE_NUM) + list(PROFILE_STR)
    ds = read_table(sf_dir, "lineitem", cols)

    def partial(t: pa.Table) -> pa.Table:
        out = {"col": [], "n_rows": [], "n_nulls": [], "min_d": [],
               "max_d": [], "min_s": [], "max_s": [], "val": []}

        def emit(c, n, nulls, mn_d, mx_d, mn_s, mx_s, val):
            out["col"].append(c); out["n_rows"].append(n)
            out["n_nulls"].append(nulls); out["min_d"].append(mn_d)
            out["max_d"].append(mx_d); out["min_s"].append(mn_s)
            out["max_s"].append(mx_s); out["val"].append(val)

        for c in PROFILE_NUM:
            a = t[c]
            mm = pc.min_max(a)
            emit(c, len(a), a.null_count,
                 mm["min"].as_py(), mm["max"].as_py(), None, None, None)
            for v in pc.unique(pc.drop_null(a)).to_pylist():
                emit(c, 0, 0, None, None, None, None, repr(v))
        for c in PROFILE_STR:
            a = t[c]
            mm = pc.min_max(a)
            emit(c, len(a), a.null_count, None, None,
                 mm["min"].as_py(), mm["max"].as_py(), None)
            for v in pc.unique(pc.drop_null(a)).to_pylist():
                emit(c, 0, 0, None, None, None, None, v)
        return pa.table({
            "col": pa.array(out["col"], pa.string()),
            "n_rows": pa.array(out["n_rows"], pa.int64()),
            "n_nulls": pa.array(out["n_nulls"], pa.int64()),
            "min_d": pa.array(out["min_d"], pa.float64()),
            "max_d": pa.array(out["max_d"], pa.float64()),
            "min_s": pa.array(out["min_s"], pa.string()),
            "max_s": pa.array(out["max_s"], pa.string()),
            "val": pa.array(out["val"], pa.string())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536, zero_copy_batch=True)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c, g in df.groupby("col", sort=True):
            stats = g[g["val"].isna()]
            rows.append({
                "col": c,
                "n_rows": int(stats["n_rows"].sum()),
                "n_nulls": int(stats["n_nulls"].sum()),
                "min_d": stats["min_d"].min(),
                "max_d": stats["max_d"].max(),
                "min_s": stats["min_s"].min(),
                "max_s": stats["max_s"].max(),
                "ndv": int(g["val"].nunique())})
        return pd.DataFrame(rows)

    return grouped_apply(parts, ["col"], fold, num_buckets=8,
                         out_dtypes={"n_rows": pa.int64(),
                                     "n_nulls": pa.int64(),
                                     "ndv": pa.int64(),
                                     "min_s": pa.string(),
                                     "max_s": pa.string()})


HIST_W, HIST_NB = 10.0, 50    # fixed-width histogram over events.value


@register("event_value_histogram", sql=f"""
    WITH b AS (SELECT LEAST(GREATEST(CAST(floor(value / {HIST_W!r})
                   AS BIGINT), 0), {HIST_NB - 1}) AS bin FROM events)
    SELECT bin, CAST(bin AS DOUBLE) * {HIST_W!r} AS lo_edge,
           COUNT(*) AS n
    FROM b GROUP BY bin""")
def event_value_histogram(sf_dir: str):
    """Fixed-width histogram (the profiling/distribution operator): bin =
    clamp(floor(value/width)) per batch, per-batch partial counts, one
    tiny groupby-sum — the input never shuffles (same combine-before-
    shuffle shape as `partial_group_counts`, same binning arithmetic as
    the exact-quantile pass in `shuffle.kth_values_2pass`)."""
    from ..stages.shuffle import partial_group_counts

    ds = read_table(sf_dir, "events", ["value"])

    def binit(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        b = np.clip(np.floor(v / np.float64(HIST_W)).astype(np.int64),
                    0, HIST_NB - 1)
        return pa.table({"bin": b})

    cnt = partial_group_counts(
        ds.map_batches(binit, batch_format="pyarrow"), ["bin"])

    def edges(t: pa.Table) -> pa.Table:
        b = t["bin"].to_numpy(zero_copy_only=False)
        lo = b.astype(np.float64) * np.float64(HIST_W)
        t = t.append_column("lo_edge", pa.array(lo))
        return t.select(["bin", "lo_edge", "n"])

    return cnt.map_batches(edges, batch_format="pyarrow")


def _travel_sql() -> str:
    from ..functions import points
    x, y = points.sql_xy("event_id")
    return f"""
    WITH e AS (SELECT user_id, ts, event_id, {x} AS x, {y} AS y
               FROM events),
    l AS (SELECT user_id, x - lag(x) OVER w AS dx, y - lag(y) OVER w AS dy
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    q AS (SELECT user_id,
                 CAST(floor((dx * dx + dy * dy) * 1000000000.0 + 0.5)
                      AS BIGINT) AS dq
          FROM l)
    SELECT user_id, CAST(COUNT(dq) AS BIGINT) AS n_steps,
           CAST(COALESCE(SUM(dq), 0) AS BIGINT) AS travel_q
    FROM q GROUP BY user_id"""


@register("user_travel_stats", sql=_travel_sql)
def user_travel_stats(sf_dir: str):
    """Trajectory aggregation (the movement-analytics composite): each
    user's events ordered by time form a path over their derived points;
    per user emit the step count and the path's total squared step length
    in exact integer nano-units (floor(d²·1e9 + 0.5) per step, summed as
    int64 — float-order-independent across blocks, same playbook as the
    quantized revenue/dot-product sums). ONE key shuffle on user_id +
    per-user vectorized lag/diff — window function ∘ geometry ∘ grouped
    aggregate in a single bucketed pass."""
    from ..functions import points as pts
    from ..stages.shuffle import grouped_apply

    ds = read_table(sf_dir, "events", ["event_id", "user_id", "ts"])

    def bucket_fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort").reset_index(drop=True)
        x, y = pts.derive_xy(df["event_id"].to_numpy(np.int64))
        uid = df["user_id"].to_numpy(np.int64)
        new_user = np.empty(len(df), dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        dx = np.empty(len(df)); dy = np.empty(len(df))
        dx[0] = dy[0] = np.nan
        dx[1:] = x[1:] - x[:-1]
        dy[1:] = y[1:] - y[:-1]
        dq = np.floor((dx * dx + dy * dy) * 1000000000.0 + 0.5)
        dq[new_user] = np.nan
        step = (~new_user).astype(np.int64)
        trav = np.where(np.isnan(dq), 0.0, dq).astype(np.int64)
        out = pd.DataFrame({"user_id": uid, "s": step, "t": trav})
        g = out.groupby("user_id", as_index=False).agg(
            n_steps=("s", "sum"), travel_q=("t", "sum"))
        return g

    return grouped_apply(ds, ["user_id"], bucket_fn)


# --------------------------------------------------- gaps-and-islands
US_PER_DAY_GI = 86_400_000_000


@register("supplier_ship_islands", sql=f"""
    WITH iv AS (SELECT l_suppkey,
                       CAST(epoch_us(l_shipdate) AS BIGINT)
                           // {US_PER_DAY_GI} AS d0,
                       CAST(epoch_us(l_shipdate) AS BIGINT)
                           // {US_PER_DAY_GI}
                           + CAST(l_quantity AS BIGINT) AS d1
                FROM lineitem),
    o AS (SELECT l_suppkey, d0, d1,
                 CASE WHEN d0 > COALESCE(MAX(d1) OVER (
                          PARTITION BY l_suppkey ORDER BY d0, d1
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), d0 - 1)
                      THEN 1 ELSE 0 END AS brk
          FROM iv),
    g AS (SELECT l_suppkey, d0, d1,
                 SUM(brk) OVER (PARTITION BY l_suppkey ORDER BY d0, d1
                                ROWS UNBOUNDED PRECEDING) AS isl
          FROM o),
    i AS (SELECT l_suppkey, isl, MIN(d0) AS a, MAX(d1) AS b
          FROM g GROUP BY 1, 2)
    SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(b - a) AS BIGINT) AS covered_days
    FROM i GROUP BY 1""")
def supplier_ship_islands(sf_dir: str):
    """Gaps-and-islands: per supplier, merge the overlapping-or-touching
    activity intervals [ship day, ship day + quantity days) into islands
    and report island count + covered days. ONE supplier-keyed shuffle;
    inside each bucket the classic running-max break detector (vectorized
    cummax + cumsum) — deterministic because ties order by (d0, d1) and
    the running max is tie-order invariant."""
    import pyarrow.compute as pc

    from ..stages.shuffle import grouped_apply

    li = read_table(sf_dir, "lineitem",
                    ["l_suppkey", "l_shipdate", "l_quantity"])

    def iv(t: pa.Table) -> pa.Table:
        d0 = (pc.cast(t["l_shipdate"], pa.int64())
              .to_numpy(zero_copy_only=False)) // US_PER_DAY_GI
        q = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"l_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                         "d0": pa.array(d0), "d1": pa.array(d0 + q)})

    ds = li.map_batches(iv, batch_format="pyarrow")

    def islands(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["l_suppkey", "d0", "d1"],
                            kind="mergesort").reset_index(drop=True)
        k = df["l_suppkey"].to_numpy(np.int64)
        d0 = df["d0"].to_numpy(np.int64)
        d1 = df["d1"].to_numpy(np.int64)
        new_key = np.empty(len(df), dtype=bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        seg = np.cumsum(new_key) - 1
        # segmented running max of d1 via the offset trick: day values span
        # far less than 2^40, so adding seg·2^40 makes cross-segment values
        # strictly dominated and a single maximum.accumulate suffices
        off = seg << 40
        seg_cummax = np.maximum.accumulate(d1 + off) - off
        prev_max = np.empty(len(df), np.int64)
        prev_max[1:] = seg_cummax[:-1]
        prev_max[new_key] = d0[new_key] - 1     # first row of a key breaks
        brk = (d0 > prev_max).astype(np.int64)
        isl = np.cumsum(brk)                    # unique across keys too
        out = pd.DataFrame({"k": k, "isl": isl, "a": d0, "b": d1})
        gi = out.groupby(["k", "isl"], as_index=False).agg(
            a=("a", "min"), b=("b", "max"))
        cov = (gi["b"] - gi["a"]).to_numpy(np.int64)
        gi2 = pd.DataFrame({"k": gi["k"], "cov": cov})
        gg = gi2.groupby("k", as_index=False).agg(
            n_islands=("cov", "count"), covered_days=("cov", "sum"))
        return pd.DataFrame({"l_suppkey": gg["k"].astype("int64"),
                             "n_islands": gg["n_islands"].astype("int64"),
                             "covered_days": gg["covered_days"]
                             .astype("int64")})

    return grouped_apply(ds, ["l_suppkey"], islands)


# --------------------------------------------- trajectory simplification
DP_TOL = 0.3


@register("simplified_trajectories", sql="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(1 AS BIGINT) AS endpoints_ok,
           CAST(1 AS BIGINT) AS within_tol_ok
    FROM events GROUP BY 1""")
def simplified_trajectories(sf_dir: str):
    """Douglas–Peucker trajectory simplification per user
    (stages/simplify.py): deterministic first-argmax splits over the
    time-ordered derived points, ONE user-keyed shuffle. The oracle is
    the decode-verify trust model: n_points is SQL-exact and the two
    boolean gates — endpoints kept; every dropped vertex re-MEASURED
    within tol of its kept segment — are computed on the actual
    simplification output, so any kernel regression flips a gate and
    breaks the value hash."""
    from ..functions import points as pts
    from ..stages.shuffle import grouped_apply
    from ..stages.simplify import douglas_peucker_mask, \
        verify_simplification

    ds = read_table(sf_dir, "events", ["event_id", "user_id", "ts"])

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort").reset_index(drop=True)
        out_u, out_n, out_e, out_w = [], [], [], []
        for uid, g in df.groupby("user_id", sort=False):
            x, y = pts.derive_xy(g["event_id"].to_numpy(np.int64))
            keep = douglas_peucker_mask(x, y, DP_TOL)
            out_u.append(uid)
            out_n.append(len(g))
            out_e.append(int(bool(keep[0]) and bool(keep[-1])))
            out_w.append(int(verify_simplification(x, y, keep, DP_TOL)))
        return pd.DataFrame({
            "user_id": pd.Series(out_u, dtype="int64"),
            "n_points": pd.Series(out_n, dtype="int64"),
            "endpoints_ok": pd.Series(out_e, dtype="int64"),
            "within_tol_ok": pd.Series(out_w, dtype="int64")})

    return grouped_apply(ds, ["user_id"], per_user)


# ---------------------------------------------------- bearing rose (octants)
def _octant_case(dx: str, dy: str) -> str:
    """Octant 0..7 counter-clockwise from east, by sign/|.|-comparisons
    only (no trig): identical integer semantics on both sides. Boundary
    rays (|dx|==|dy|, axes) are assigned deterministically by the chain
    order below."""
    return f"""CASE
        WHEN {dy} >= 0 AND {dx} > 0 AND {dx} > {dy} THEN 0
        WHEN {dy} > 0 AND {dx} > 0 THEN 1
        WHEN {dy} > 0 AND -{dx} < {dy} THEN 2
        WHEN {dy} > 0 THEN 3
        WHEN {dy} <= 0 AND {dx} < 0 AND -{dx} > -{dy} THEN 4
        WHEN {dy} < 0 AND {dx} < 0 THEN 5
        WHEN {dy} < 0 AND {dx} < -{dy} THEN 6
        ELSE 7 END"""


@register("step_bearing_rose", sql=lambda: (lambda x, y: f"""
    WITH e AS (SELECT user_id, ts, event_id,
                      CAST(floor({x} * 1000000) AS BIGINT) AS qx,
                      CAST(floor({y} * 1000000) AS BIGINT) AS qy
               FROM events),
    st AS (SELECT lead(qx) OVER w - qx AS dx,
                  lead(qy) OVER w - qy AS dy
           FROM e WINDOW w AS (PARTITION BY user_id
                               ORDER BY ts, event_id)),
    s AS (SELECT dx, dy FROM st
          WHERE dx IS NOT NULL AND NOT (dx = 0 AND dy = 0))
    SELECT CAST({_octant_case('dx', 'dy')} AS BIGINT) AS octant,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM s GROUP BY 1""")(*_pts.sql_xy("event_id")))
def step_bearing_rose(sf_dir: str):
    """Movement-direction histogram (wind-rose): octant of every
    trajectory step, computed with pure integer sign/magnitude
    comparisons (no trig, boundary rays deterministic) — per-user lag
    inside one key shuffle, per-batch octant bincounts, 8-row result."""
    from ..functions import points as pts
    from ..stages.shuffle import grouped_apply

    ds = read_table(sf_dir, "events", ["event_id", "user_id", "ts"])

    def steps(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort").reset_index(drop=True)
        u = df["user_id"].to_numpy(np.int64)
        x, y = pts.derive_xy(df["event_id"].to_numpy(np.int64))
        qx = np.floor(x * 1e6).astype(np.int64)
        qy = np.floor(y * 1e6).astype(np.int64)
        same = np.empty(len(df), dtype=bool)
        same[:-1] = u[1:] == u[:-1]
        same[-1] = False
        nxt = np.flatnonzero(same) + 1
        dx = qx[nxt] - qx[same]
        dy = qy[nxt] - qy[same]
        keep = ~((dx == 0) & (dy == 0))
        dx, dy = dx[keep], dy[keep]
        oct_ = np.full(len(dx), 7, np.int64)
        done = (dy >= 0) & (dx > 0) & (dx > dy)
        oct_[done] = 0
        for code, cond in (
                (1, (dy > 0) & (dx > 0)),
                (2, (dy > 0) & (-dx < dy)),
                (3, dy > 0),
                (4, (dy <= 0) & (dx < 0) & (-dx > -dy)),
                (5, (dy < 0) & (dx < 0)),
                (6, (dy < 0) & (dx < -dy))):
            sel = cond & ~done
            oct_[sel] = code
            done |= cond
        cnt = np.bincount(oct_, minlength=8).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"octant": nz.astype("int64"),
                             "n": cnt[nz]})

    partials = grouped_apply(ds, ["user_id"], steps)

    from ray.data.aggregate import Sum
    out = partials.groupby("octant").aggregate(Sum("n", alias_name="n"))
    return out.map_batches(
        lambda t: t.select(["octant", "n"]), batch_format="pyarrow")


# ------------------------------------------------------ stay-point anchors
STAY_K = 3            # next K steps must stay within the radius
STAY_R_U = 300_000    # stay radius (µdeg)


@register("stay_point_anchors", sql=lambda: (lambda x, y: f"""
    WITH e AS (SELECT user_id, ts, event_id,
                      CAST(floor({x} * 1000000) AS BIGINT) AS qx,
                      CAST(floor({y} * 1000000) AS BIGINT) AS qy
               FROM events),
    w AS (SELECT user_id, event_id, qx, qy,
                 lead(qx, 1) OVER win AS x1, lead(qy, 1) OVER win AS y1,
                 lead(qx, 2) OVER win AS x2, lead(qy, 2) OVER win AS y2,
                 lead(qx, 3) OVER win AS x3, lead(qy, 3) OVER win AS y3
          FROM e WINDOW win AS (PARTITION BY user_id
                                ORDER BY ts, event_id))
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_anchors
    FROM w
    WHERE x3 IS NOT NULL
      AND (x1-qx)*(x1-qx)+(y1-qy)*(y1-qy)
          <= {STAY_R_U}::BIGINT*{STAY_R_U}::BIGINT
      AND (x2-qx)*(x2-qx)+(y2-qy)*(y2-qy)
          <= {STAY_R_U}::BIGINT*{STAY_R_U}::BIGINT
      AND (x3-qx)*(x3-qx)+(y3-qy)*(y3-qy)
          <= {STAY_R_U}::BIGINT*{STAY_R_U}::BIGINT
    GROUP BY 1""")(*_pts.sql_xy("event_id")))
def stay_point_anchors(sf_dir: str):
    """Stay-point detection (trajectory mining, Li et al. 2008 shape): a
    point is a stay anchor when its next K=3 points all remain within the
    stay radius — the window-expressible (non-greedy) variant, exact in
    µdeg integers. One user-keyed shuffle, vectorized shifted-distance
    tests, per-user anchor counts."""
    from ..functions import points as pts
    from ..stages.shuffle import grouped_apply

    r2 = np.int64(STAY_R_U) * np.int64(STAY_R_U)
    ds = read_table(sf_dir, "events", ["event_id", "user_id", "ts"])

    def anchors(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort").reset_index(drop=True)
        u = df["user_id"].to_numpy(np.int64)
        x, y = pts.derive_xy(df["event_id"].to_numpy(np.int64))
        qx = np.floor(x * 1e6).astype(np.int64)
        qy = np.floor(y * 1e6).astype(np.int64)
        n = len(df)
        ok = np.ones(n, dtype=bool)
        for k in range(1, STAY_K + 1):
            same = np.zeros(n, dtype=bool)
            same[:n - k] = u[k:] == u[:n - k]
            d2 = np.full(n, np.int64(1) << 62, np.int64)
            dx = qx[k:] - qx[:n - k]
            dy = qy[k:] - qy[:n - k]
            d2[:n - k] = dx * dx + dy * dy
            ok &= same & (d2 <= r2)
        out = pd.DataFrame({"user_id": u[ok]})
        g = out.groupby("user_id", as_index=False).size()
        return pd.DataFrame({"user_id": g["user_id"].astype("int64"),
                             "n_anchors": g["size"].astype("int64")})

    return grouped_apply(ds, ["user_id"], anchors)


# ------------------------------------------------------------- OD matrix
OD_RES = 4


@register("od_matrix_cells", sql=lambda: (lambda x, y: f"""
    WITH e AS (SELECT user_id, ts, event_id, {x} AS x, {y} AS y
               FROM events),
    c AS (SELECT user_id, ts, event_id,
                 {cells.sql_cell('x', 'y', OD_RES)} AS cell FROM e),
    s AS (SELECT cell AS o_cell, lead(cell) OVER w AS d_cell
          FROM c WINDOW w AS (PARTITION BY user_id
                              ORDER BY ts, event_id))
    SELECT o_cell, d_cell, CAST(COUNT(*) AS BIGINT) AS n
    FROM s WHERE d_cell IS NOT NULL AND d_cell <> o_cell
    GROUP BY 1, 2""")(*_pts.sql_xy("event_id")))
def od_matrix_cells(sf_dir: str):
    """Origin-destination matrix (movement analytics): per ordered pair of
    DIFFERENT res-4 cells, the number of consecutive-event transitions —
    one user-keyed shuffle builds the steps, per-batch (o, d) partial
    counts finish (the OD table is ≤ 16^2 × occupied², tiny)."""
    from ..functions import cells as _c
    from ..functions import points as pts
    from ..stages.shuffle import grouped_apply, partial_group_counts

    ds = read_table(sf_dir, "events", ["event_id", "user_id", "ts"])

    def steps(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort").reset_index(drop=True)
        u = df["user_id"].to_numpy(np.int64)
        x, y = pts.derive_xy(df["event_id"].to_numpy(np.int64))
        cell = _c.encode(x, y, OD_RES)
        n = len(df)
        same = np.zeros(n, dtype=bool)
        same[:-1] = u[1:] == u[:-1]
        o = cell[:-1][same[:-1]]
        d = cell[1:][same[:-1]]
        keep = o != d
        return pd.DataFrame({"o_cell": o[keep], "d_cell": d[keep]})

    trans = grouped_apply(ds, ["user_id"], steps)
    agg = partial_group_counts(trans, ["o_cell", "d_cell"])
    return agg.map_batches(
        lambda t: t.select(["o_cell", "d_cell", "n"]),
        batch_format="pyarrow")


# ----------------------------------------- co-occurrence / association lift
TYPE_CARD_MAX = 1024   # guard: the type-count table must stay broadcastable


@register("event_type_lift", sql="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    tc AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
           FROM ut GROUP BY 1),
    nu AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n FROM ut),
    pr AS (SELECT a.event_type AS ta, b.event_type AS tb
           FROM ut a JOIN ut b
           ON a.user_id = b.user_id AND a.event_type < b.event_type),
    pc AS (SELECT ta, tb, CAST(COUNT(*) AS BIGINT) AS n_both
           FROM pr GROUP BY 1, 2)
    SELECT pc.ta AS type_a, pc.tb AS type_b, pc.n_both,
           ca.n AS n_a, cb.n AS n_b,
           pc.n_both * nu.n AS lift_num, ca.n * cb.n AS lift_den
    FROM pc JOIN tc ca ON ca.event_type = pc.ta
            JOIN tc cb ON cb.event_type = pc.tb, nu""")
def event_type_lift(sf_dir: str):
    """Association-rule mining (market-basket lift): for every unordered
    pair of event types, the number of users exhibiting BOTH, plus the
    exact integer lift rational lift = (n_both·n_users)/(n_a·n_b) —
    lift ≫ 1 flags behaviorally coupled actions. Shape: one shuffle
    builds the global distinct (user, type) table (per-batch dedup
    partials, then the count groupby doubles as the dedup); per-user
    pairs expand inside a user-keyed bucket pass (pairs per user ≤
    C(#types, 2), bounded); marginals are a type-cardinality table
    ASSERTED broadcastable (TYPE_CARD_MAX) and attached in the finisher —
    the fallback at unbounded cardinality is a hash_join on both type
    keys."""
    import pyarrow.compute as pc_

    from ..stages.shuffle import grouped_apply, partial_group_counts

    ds = read_table(sf_dir, "events", ["user_id", "event_type"])
    # spill, don't pin: the distinct (user, type) table is the product
    # of a real shuffle (re-running it per consumer would triple the
    # exchange) and is users-proportional — Parquet checkpoint, three
    # column-pruned re-reads
    from ..state.spill import spill_checkpoint

    read_ut = spill_checkpoint(
        partial_group_counts(ds, ["user_id", "event_type"])
        .select_columns(["user_id", "event_type"]), "lift_ut",
        schema=pa.schema([("user_id", pa.int64()),
                          ("event_type", pa.string())]))
    ut = read_ut()

    tc = partial_group_counts(read_ut(columns=["event_type"]),
                              ["event_type"]).to_pandas()
    if len(tc) > TYPE_CARD_MAX:
        raise RuntimeError(
            f"event_type_lift: {len(tc)} distinct types > TYPE_CARD_MAX "
            f"({TYPE_CARD_MAX}) — switch the marginal attach to hash_join")
    counts = dict(zip(tc["event_type"], tc["n"].astype(np.int64)))
    n_users = partial_group_counts(read_ut(columns=["user_id"]),
                                   ["user_id"]).count()

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        outa, outb = [], []
        for _, g in df.groupby("user_id", sort=False):
            ts = np.sort(g["event_type"].to_numpy(dtype=object))
            k = len(ts)
            if k < 2:
                continue
            iu = np.triu_indices(k, 1)
            outa.append(ts[iu[0]])
            outb.append(ts[iu[1]])
        if not outa:
            return pd.DataFrame({"ta": pd.Series([], dtype="string"),
                                 "tb": pd.Series([], dtype="string")})
        return pd.DataFrame({"ta": np.concatenate(outa),
                             "tb": np.concatenate(outb)})

    pr = grouped_apply(ut, ["user_id"], pairs)
    pcnt = partial_group_counts(pr, ["ta", "tb"], count_col="n_both")

    def finish(t: pa.Table) -> pa.Table:
        ta = t["ta"].to_pylist()
        tb = t["tb"].to_pylist()
        nb = t["n_both"].to_numpy(zero_copy_only=False)
        na = np.array([counts[a] for a in ta], np.int64)
        nbv = np.array([counts[b] for b in tb], np.int64)
        return pa.table({
            "type_a": pc_.cast(t["ta"], pa.string()),
            "type_b": pc_.cast(t["tb"], pa.string()),
            "n_both": pa.array(nb), "n_a": pa.array(na),
            "n_b": pa.array(nbv),
            "lift_num": pa.array(nb * n_users),
            "lift_den": pa.array(na * nbv)})

    return pcnt.map_batches(finish, batch_format="pyarrow")


# -------------------------------------------- segment raster line density
SEG_CW = 10_000   # cell width on the 1e-4° integer lattice (= 1°)


def _segdensity_sql() -> str:
    x, y = _pts.sql_xy("event_id")
    CW = SEG_CW
    corners = [
        f"(x2-x1)*(cy*{CW}-y1) - (y2-y1)*(cx*{CW}-x1)",
        f"(x2-x1)*(cy*{CW}-y1) - (y2-y1)*((cx+1)*{CW}-x1)",
        f"(x2-x1)*((cy+1)*{CW}-y1) - (y2-y1)*(cx*{CW}-x1)",
        f"(x2-x1)*((cy+1)*{CW}-y1) - (y2-y1)*((cx+1)*{CW}-x1)"]
    cs = ", ".join(corners)
    return f"""
    WITH e AS (SELECT user_id, ts, event_id,
               CAST(floor({x} * 10000 + 0.5) AS BIGINT) AS qx,
               CAST(floor({y} * 10000 + 0.5) AS BIGINT) AS qy FROM events),
    s AS (SELECT qx AS x1, qy AS y1,
                 lead(qx) OVER w AS x2, lead(qy) OVER w AS y2
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    seg AS (SELECT x1, y1, x2, y2 FROM s WHERE x2 IS NOT NULL),
    cand AS (SELECT seg.*, ux.cx, uy.cy
             FROM seg
             CROSS JOIN LATERAL (SELECT unnest(generate_series(
                 least(x1,x2)//{CW}, greatest(x1,x2)//{CW})) AS cx) ux
             CROSS JOIN LATERAL (SELECT unnest(generate_series(
                 least(y1,y2)//{CW}, greatest(y1,y2)//{CW})) AS cy) uy)
    SELECT cx, cy, CAST(COUNT(*) AS BIGINT) AS n_segs
    FROM cand WHERE least({cs}) <= 0 AND greatest({cs}) >= 0
    GROUP BY 1, 2"""


@register("segment_cell_density", sql=_segdensity_sql)
def segment_cell_density(sf_dir: str):
    """Line-density rasterization: per 1° grid cell, the number of
    trajectory SEGMENTS (consecutive same-user event points) whose closed
    segment intersects the closed cell square — the vector-line → raster
    operator (road/route density surfaces). Exactness: coordinates live
    on the 1e-4° integer lattice and cell corners are integer multiples
    of SEG_CW, so the separating-axis test is pure int64 cross products —
    a segment intersects the cell iff its bbox covers it (guaranteed by
    the candidate enumeration) and the four cell corners do not all lie
    strictly on one side of the supporting line. Shape: one user-keyed
    shuffle builds segments, per-batch VECTORIZED ragged bbox-cell
    expansion (repeat/arange, no Python loop) + corner test, per-batch
    partial counts; only (cx, cy) pairs ever shuffle. Boundary-touching
    segments count in BOTH cells (closed/closed, deterministic on both
    sides)."""
    from ..functions import points as pts
    from ..stages.shuffle import grouped_apply, partial_group_counts

    CW = np.int64(SEG_CW)
    ds = read_table(sf_dir, "events", ["event_id", "user_id", "ts"])

    def segs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort").reset_index(drop=True)
        u = df["user_id"].to_numpy(np.int64)
        x, y = pts.derive_xy(df["event_id"].to_numpy(np.int64))
        qx = np.floor(x * 1e4 + 0.5).astype(np.int64)
        qy = np.floor(y * 1e4 + 0.5).astype(np.int64)
        same = u[1:] == u[:-1]
        return pd.DataFrame({"x1": qx[:-1][same], "y1": qy[:-1][same],
                             "x2": qx[1:][same], "y2": qy[1:][same]})

    seg = grouped_apply(ds, ["user_id"], segs)

    def rasterize(t: pa.Table) -> pa.Table:
        x1 = t["x1"].to_numpy(zero_copy_only=False)
        y1 = t["y1"].to_numpy(zero_copy_only=False)
        x2 = t["x2"].to_numpy(zero_copy_only=False)
        y2 = t["y2"].to_numpy(zero_copy_only=False)
        gx0, gx1 = np.minimum(x1, x2) // CW, np.maximum(x1, x2) // CW
        gy0, gy1 = np.minimum(y1, y2) // CW, np.maximum(y1, y2) // CW
        ny = gy1 - gy0 + 1
        m = (gx1 - gx0 + 1) * ny
        tot = int(m.sum())
        idx = np.repeat(np.arange(len(m)), m)
        off = np.arange(tot) - np.repeat(np.cumsum(m) - m, m)
        cx = gx0[idx] + off // ny[idx]
        cy = gy0[idx] + off % ny[idx]
        dx, dy = x2[idx] - x1[idx], y2[idx] - y1[idx]
        bx, by = x1[idx], y1[idx]
        c00 = dx * (cy * CW - by) - dy * (cx * CW - bx)
        c01 = dx * (cy * CW - by) - dy * ((cx + 1) * CW - bx)
        c10 = dx * ((cy + 1) * CW - by) - dy * (cx * CW - bx)
        c11 = dx * ((cy + 1) * CW - by) - dy * ((cx + 1) * CW - bx)
        lo = np.minimum(np.minimum(c00, c01), np.minimum(c10, c11))
        hi = np.maximum(np.maximum(c00, c01), np.maximum(c10, c11))
        keep = (lo <= 0) & (hi >= 0)
        return pa.table({"cx": pa.array(cx[keep]),
                         "cy": pa.array(cy[keep])})

    hits = seg.map_batches(rasterize, batch_format="pyarrow",
                           batch_size=16384)
    agg = partial_group_counts(hits, ["cx", "cy"], count_col="n_segs")
    return agg.map_batches(lambda t: t.select(["cx", "cy", "n_segs"]),
                           batch_format="pyarrow")


@register("kmv_distinct_by_type", sql="""
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS ndv,
           TRUE AS kmv_ok
    FROM events GROUP BY event_type""")
def kmv_distinct_by_type(sf_dir: str):
    """Bottom-k (KMV) distinct sketch per group, next to the HLL family:
    per-batch bottom-k distinct splitmix64 hashes per event_type (tiny
    partials; the wide table never shuffles), merged by union+truncate.
    Certified the same way as ``hll_distinct_users``: the exact NDV is
    computed distributed (per-batch unique pairs → dedup shuffle →
    per-type count) and value-checked against COUNT(DISTINCT); kmv_ok
    goes false (→ red driver row) if the sketch drifts — an UNSATURATED
    sketch must be EXACT (splitmix64 is a uint64 bijection), a saturated
    one must land within ±10 % ((k−1)·2⁶⁴/h_k estimator, k=1024 → ~3 %
    expected error)."""
    import pyarrow.compute as pc

    from ..stages.shuffle import (KMV_K, grouped_apply, kmv_estimate,
                                  kmv_partial)

    ds = read_table(sf_dir, "events", ["event_type", "user_id"])

    # ---- exact NDV, distributed (the oracle's value) ----
    pair_partials = ds.map_batches(
        lambda t: pa.table({"event_type": t["event_type"],
                            "user_id": t["user_id"]})
        .group_by(["event_type", "user_id"]).aggregate([]),
        batch_format="pyarrow")
    dedup = grouped_apply(pair_partials, ["event_type", "user_id"],
                          lambda df: df.drop_duplicates())
    exact_rows = dedup.groupby("event_type").count().take_all()
    exact = {r["event_type"]: int(r["count()"]) for r in exact_rows}

    # ---- KMV sketch, distributed ----
    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_t, out_h = [], []
        for ty in np.unique(et):
            hh = kmv_partial(uid[et == ty])
            out_t.extend([str(ty)] * len(hh))
            out_h.append(hh)
        return pa.table({
            "event_type": pa.array(out_t, pa.string()),
            "h": pa.array(np.concatenate(out_h) if out_h
                          else np.empty(0, np.uint64), pa.uint64())})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for ty, g in df.groupby("event_type", sort=False):
            h = np.unique(g["h"].to_numpy().astype(np.uint64))[:KMV_K]
            out.append((ty, kmv_estimate(h)))
        return pd.DataFrame({"event_type": [t for t, _ in out],
                             "est": [e for _, e in out]})

    sk = grouped_apply(ds.map_batches(partial, batch_format="pyarrow"),
                       ["event_type"], merge, num_buckets=8)
    ests = {r["event_type"]: float(r["est"]) for r in sk.take_all()}

    types = sorted(exact)
    ndv = [exact[t] for t in types]
    ok = [abs(ests[t] - exact[t]) <= 0.1 * exact[t] for t in types]
    return pa.table({"event_type": pa.array(types, pa.string()),
                     "ndv": pa.array(ndv, pa.int64()),
                     "kmv_ok": pa.array(ok, pa.bool_())})


def _skyline_sql() -> str:
    # window formulation of the dominance test (the O(n²) NOT EXISTS twin
    # is correct but quadratic — tests/test_shuffle_ops.py checks the
    # kernel against the literal brute-force dominance scan instead):
    # dominated(b) ⇔ min{d: p' > p_b} ≤ d_b ∨ min{d: p' ≥ p_b} < d_b
    return """
    WITH o AS (SELECT o_orderkey,
                      CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS p,
                      CAST(epoch_us(o_orderdate) AS BIGINT)
                          // 86400000000 AS d
               FROM orders),
    pp AS (SELECT p, MIN(d) AS md FROM o GROUP BY p),
    w AS (SELECT p,
                 MIN(md) OVER (ORDER BY p DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING) AS m1,
                 MIN(md) OVER (ORDER BY p DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS m2
          FROM pp)
    SELECT o.o_orderkey, o.p AS price_q, o.d AS day
    FROM o JOIN w USING (p)
    WHERE NOT (COALESCE(w.m1, 9223372036854775807) <= o.d OR w.m2 < o.d)"""


@register("skyline_orders", sql=_skyline_sql)
def skyline_orders(sf_dir: str):
    """SKYLINE / Pareto-front query (dominance analysis: the orders no
    other order beats on BOTH higher price and earlier date). Classic
    distributed shape: each block computes its local skyline vectorized
    (``pareto_mask_2d``, O(m log m)); the global skyline is provably a
    subset of the union of local skylines, so one small final pass over
    the union finishes exactly. Integer cents + epoch-days; the oracle
    is the literal NOT EXISTS dominance scan (and a brute-force pytest
    checks the kernel independently)."""
    from ..stages.stream import pareto_mask_2d

    ds = read_table(sf_dir, "orders",
                    ["o_orderkey", "o_totalprice", "o_orderdate"])

    def prep(t: pa.Table) -> pa.Table:
        price = t["o_totalprice"].to_numpy(zero_copy_only=False)
        day = (t["o_orderdate"].to_numpy(zero_copy_only=False)
               .astype("datetime64[us]").astype(np.int64)
               // 86_400_000_000)
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "price_q": pa.array(np.floor(price * 100.0 + 0.5)
                                .astype(np.int64)),
            "day": pa.array(day)})

    def local_sky(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        keep = pareto_mask_2d(t["price_q"].to_numpy(zero_copy_only=False),
                              t["day"].to_numpy(zero_copy_only=False))
        return t.filter(pa.array(keep))

    local = ds.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .map_batches(local_sky, batch_format="pyarrow")
    # final exact pass over the (small) union of local skylines
    return local.repartition(1).map_batches(local_sky,
                                            batch_format="pyarrow",
                                            batch_size=None)


# ------------------------------------------- trajectory similarity
TRAJ_MOD = 10            # bounded trajectory-pair query set: users % MOD = 0
TRAJ_MAX_POINTS = 2_000_000   # broadcast bound for the subset point pack


def _hausdorff_sql() -> str:
    x, y = _pts.sql_xy("event_id")
    return f"""
    WITH e AS (SELECT user_id, {x} AS x, {y} AS y FROM events
               WHERE user_id % {TRAJ_MOD} = 0),
    p AS (SELECT DISTINCT user_id, x, y FROM e),
    dir AS (SELECT a.user_id AS su, b.user_id AS tu, a.x, a.y,
                   MIN((a.x - b.x) * (a.x - b.x)
                       + (a.y - b.y) * (a.y - b.y)) AS md
            FROM p a JOIN p b ON a.user_id <> b.user_id
            GROUP BY 1, 2, 3, 4),
    hdir AS (SELECT su, tu, MAX(md) AS h FROM dir GROUP BY 1, 2)
    SELECT LEAST(su, tu) AS user_a, GREATEST(su, tu) AS user_b,
           MAX(h) AS hausdorff_d2
    FROM hdir GROUP BY 1, 2"""


@register("trajectory_hausdorff_pairs", sql=_hausdorff_sql)
def trajectory_hausdorff_pairs(sf_dir: str):
    """Trajectory similarity: the symmetric Hausdorff distance (squared,
    euclidean over the derived lattice points) between every pair of
    trajectories in the bounded user subset — the set-distance primitive
    behind trajectory clustering / map-matching QA. NO quantization
    anywhere: Hausdorff is max∘min SELECTION over identically-written
    float products, and selection (unlike summation) has no order
    sensitivity, so the doubles match DuckDB bit-for-bit (the Theil-Sen
    lesson).

    Shape: the subset (user % TRAJ_MOD) is the bounded query set — its
    distinct points are collected through a DISTRIBUTED filter (guarded
    by TRAJ_MAX_POINTS), packed per user, and broadcast once; the pair
    list distributes as a Dataset and each pair computes its two directed
    maxes as one vectorized (|A|×|B|) block — pairwise work runs on
    workers, the driver only holds the bounded pack."""
    ev = read_table(sf_dir, "events", ["event_id", "user_id"])

    def pick(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(uid % TRAJ_MOD == 0))
        x, y = _pts.derive_xy(t["event_id"].to_numpy(zero_copy_only=False)
                              .astype(np.int64))
        return pa.table({"user_id": pa.array(
            t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)),
            "x": pa.array(x), "y": pa.array(y)}) \
            .group_by(["user_id", "x", "y"]).aggregate([])

    sub = ev.map_batches(pick, batch_format="pyarrow").to_pandas() \
        .drop_duplicates().sort_values(["user_id", "x", "y"])
    if len(sub) > TRAJ_MAX_POINTS:
        raise ValueError(
            f"trajectory_hausdorff_pairs: subset has {len(sub)} points > "
            f"TRAJ_MAX_POINTS={TRAJ_MAX_POINTS}; raise TRAJ_MOD or move "
            "the pair stage to a cogrouped shuffle")
    users = np.sort(sub["user_id"].unique().astype(np.int64))
    packs = {int(u): (g["x"].to_numpy(np.float64),
                      g["y"].to_numpy(np.float64))
             for u, g in sub.groupby("user_id")}
    pack_ref = ray.put(packs)

    ia, ib = np.triu_indices(len(users), 1)
    pairs = ray.data.from_pandas(pd.DataFrame({
        "user_a": users[ia], "user_b": users[ib]}))

    def hausdorff(t: pa.Table) -> pa.Table:
        pk = ray.get(pack_ref)
        ua = t["user_a"].to_numpy(zero_copy_only=False)
        ub = t["user_b"].to_numpy(zero_copy_only=False)
        out = np.empty(len(ua), np.float64)
        for i in range(len(ua)):
            ax, ay = pk[int(ua[i])]
            bx, by = pk[int(ub[i])]
            d2 = ((ax[:, None] - bx[None, :]) * (ax[:, None] - bx[None, :])
                  + (ay[:, None] - by[None, :])
                  * (ay[:, None] - by[None, :]))
            out[i] = max(d2.min(axis=1).max(), d2.min(axis=0).max())
        return pa.table({"user_a": pa.array(ua), "user_b": pa.array(ub),
                         "hausdorff_d2": pa.array(out)})

    return pairs.map_batches(hausdorff, batch_format="pyarrow")


# --------------------------------------------- robust (MAD) outliers
MAD_C = 5.0     # |value − median| ≥ C·MAD flags an outlier


@register("mad_event_outliers", sql=f"""
    WITH m AS (SELECT value AS med FROM (
                 SELECT value, row_number() OVER (ORDER BY value, event_id)
                            AS rn, COUNT(*) OVER () AS n
                 FROM events) WHERE rn = (n - 1) // 2 + 1),
    d AS (SELECT event_id, event_type,
                 abs(value - (SELECT med FROM m)) AS dev
          FROM events),
    md AS (SELECT dev AS mad FROM (
             SELECT dev, row_number() OVER (ORDER BY dev, event_id) AS rn,
                    COUNT(*) OVER () AS n
             FROM d) WHERE rn = (n - 1) // 2 + 1)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN dev >= CAST('{MAD_C!r}' AS DOUBLE)
                                     * (SELECT mad FROM md)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM d GROUP BY 1""")
def mad_event_outliers(sf_dir: str):
    """ROBUST anomaly detection: per event type, count values whose
    absolute deviation from the global median exceeds C × MAD (median
    absolute deviation) — the outlier rule that, unlike the z-score
    sibling `event_value_outliers`, is itself immune to the outliers it
    hunts. Both medians are exact (n−1)//2 order statistics.

    Shape: two chained 2-pass histogram selections (`kth_value_2pass` —
    per-batch histograms combine before any shuffle; only one bin's
    values ever reach the driver), then one vectorized flag-and-count
    scan emitting ≤ |types|-row partials. The deviation is the same
    float expression on both sides and the median/MAD are selected (not
    summed) values, so the comparison is bit-exact with no quantization."""
    import pyarrow.compute as pc

    from ..stages.shuffle import kth_value_2pass, partial_group_counts

    ev = read_table(sf_dir, "events", ["event_type", "value"])
    n = ev.count()
    med, _ = kth_value_2pass(read_table(sf_dir, "events", ["value"]),
                             "value", (n - 1) // 2)

    dev = ev.map_batches(
        lambda t: pa.table({
            "event_type": t["event_type"],
            "dev": pa.array(np.abs(
                t["value"].to_numpy(zero_copy_only=False)
                .astype(np.float64) - med))}),
        batch_format="pyarrow")
    mad, _ = kth_value_2pass(dev.select_columns(["dev"]), "dev",
                             (n - 1) // 2)
    thr = MAD_C * mad

    def flags(t: pa.Table) -> pa.Table:
        d = t["dev"].to_numpy(zero_copy_only=False)
        tt = pa.table({"event_type": t["event_type"],
                       "one": pa.array(np.ones(len(d), np.int64)),
                       "o": pa.array((d >= thr).astype(np.int64))})
        g = tt.group_by(["event_type"]).aggregate(
            [("one", "sum"), ("o", "sum")])
        return g.rename_columns(["event_type", "n_total", "n_outliers"])

    from ray.data.aggregate import Sum
    agg = dev.map_batches(flags, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Sum("n_total", alias_name="n_total"),
            Sum("n_outliers", alias_name="n_outliers"))
    return agg.map_batches(
        lambda t: t.rename_columns(["event_type", "n_total", "n_outliers"]),
        batch_format="pyarrow")


# ------------------------------------------------ winsorized statistics
WINSOR_LO_PCT = 5       # clip below the exact p5 / above the exact p95
WINSOR_HI_PCT = 95


@register("winsorized_value_stats", sql=f"""
    WITH r AS (SELECT value,
                      row_number() OVER (ORDER BY value, event_id) AS rn,
                      COUNT(*) OVER () AS n
               FROM events),
    lo AS (SELECT value AS v FROM r
           WHERE rn = ((n - 1) * {WINSOR_LO_PCT}) // 100 + 1),
    hi AS (SELECT value AS v FROM r
           WHERE rn = ((n - 1) * {WINSOR_HI_PCT}) // 100 + 1)
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(floor(greatest((SELECT v FROM lo),
                                        least((SELECT v FROM hi), value))
                                * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_q,
           CAST(SUM(CASE WHEN value < (SELECT v FROM lo)
                           OR value > (SELECT v FROM hi)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
    FROM events""")
def winsorized_value_stats(sf_dir: str):
    """Winsorized mean inputs: values clipped at the EXACT p5/p95 order
    statistics (rank ⌊(n−1)·p⌋, the numpy 'lower' convention), then the
    cent-quantized sum and the clip count — the robust-mean preprocessing
    every metric pipeline applies before averaging heavy-tailed values.

    Shape: two ranks from ONE shared 2-pass histogram selection
    (`kth_values_2pass` — both percentiles priced at one pass), then a
    single vectorized clip-quantize-sum scan emitting 3-int partials."""
    from ray.data.aggregate import Sum

    from ..stages.shuffle import kth_values_2pass

    ev = read_table(sf_dir, "events", ["value"])
    n = ev.count()
    ks = [((n - 1) * WINSOR_LO_PCT) // 100, ((n - 1) * WINSOR_HI_PCT) // 100]
    (lo, hi), _ = kth_values_2pass(ev, "value", ks)

    def partial(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        wv = np.maximum(lo, np.minimum(hi, v))
        q = np.floor(wv * 100.0 + 0.5).astype(np.int64)
        clipped = ((v < lo) | (v > hi)).sum()
        return pa.table({"n": pa.array([np.int64(len(v))]),
                         "sum_q": pa.array([q.sum()]),
                         "n_clipped": pa.array([np.int64(clipped)])})

    agg = ev.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"), Sum("sum_q", alias_name="sum_q"),
        Sum("n_clipped", alias_name="n_clipped"))
    return pd.DataFrame({k: np.array([agg[k]], np.int64)
                         for k in ["n", "sum_q", "n_clipped"]})


# ------------------------------------------------ traffic concentration
TOPSHARE_PCT = 1     # the "top 1 % of users" Lorenz point


@register("top1pct_user_share", sql=f"""
    WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
               FROM events GROUP BY 1),
    k AS (SELECT CAST(ceil(COUNT(*) * {TOPSHARE_PCT} / 100.0) AS BIGINT)
              AS k, CAST(COUNT(*) AS BIGINT) AS n_users,
              CAST(SUM(n) AS BIGINT) AS sum_total
          FROM c),
    r AS (SELECT n, row_number() OVER (ORDER BY n DESC, user_id) AS rk
          FROM c)
    SELECT k.n_users, k.k AS top_k,
           CAST((SELECT SUM(n) FROM r, k WHERE rk <= k.k) AS BIGINT)
               AS sum_top,
           k.sum_total
    FROM k""")
def top1pct_user_share(sf_dir: str):
    """Traffic concentration (the Lorenz point behind skew planning): the
    share of all events generated by the top {TOPSHARE_PCT} % heaviest
    users — reported as the exact integer pair (Σ top-k counts, Σ all)
    plus the population terms. The operational skew audit: a high share
    means user-keyed shuffles need salting.

    Shape: per-user partial counts (one key shuffle of count rows), a
    LOCAL top-k per bucket (k bounded by the global k), driver merge of
    num_buckets·k rows — the user count table never collects."""
    from ray.data.aggregate import Sum

    from ..stages.shuffle import grouped_apply, partial_group_counts

    ev = read_table(sf_dir, "events", ["user_id"])
    # spill, don't pin: the per-user count table is a shuffle product
    # (re-running per consumer would triple the exchange) and is
    # users-proportional; three consumers re-read the Parquet
    from ..state.spill import spill_checkpoint

    read_cnt = spill_checkpoint(
        partial_group_counts(ev, ["user_id"], count_col="n"),
        "topshare_cnt",
        schema=pa.schema([("user_id", pa.int64()), ("n", pa.int64())]))
    cnt = read_cnt()
    n_users = read_cnt(columns=["user_id"]).count()
    agg = read_cnt(columns=["n"]).aggregate(Sum("n", alias_name="s"))
    sum_total = int(agg["s"])
    k = int(-(-n_users * TOPSHARE_PCT // 100))   # ceil

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["n", "user_id"],
                            ascending=[False, True]).head(k)
        return df[["user_id", "n"]].astype("int64")

    top = grouped_apply(cnt, ["user_id"], local_topk) \
        .to_pandas()
    top = top.sort_values(["n", "user_id"],
                          ascending=[False, True]).head(k)
    return pd.DataFrame({
        "n_users": np.array([n_users], np.int64),
        "top_k": np.array([k], np.int64),
        "sum_top": np.array([int(top["n"].sum())], np.int64),
        "sum_total": np.array([sum_total], np.int64)})


# ----------------- deterministic multiplier bootstrap (uncertainty)

BOOT_B = 32                      # replicates
BOOT_SALT = 1_000_003            # replicate salt (prime)
BOOT_KNUTH = 2654435761


@register("bootstrap_mean_replicates", sql=f"""
    WITH r AS (SELECT unnest(generate_series(0, {BOOT_B - 1})) AS rep),
    w AS (SELECT r.rep,
                 (((((CAST(e.event_id AS HUGEINT) + r.rep * {BOOT_SALT})
                     * {BOOT_KNUTH}) % 4294967296) >> 17) & 1)
                 + (((((CAST(e.event_id AS HUGEINT) + r.rep * {BOOT_SALT})
                       * {BOOT_KNUTH}) % 4294967296) >> 18) & 1) AS w,
                 CAST(floor(e.value * 100 + 0.5) AS BIGINT) AS cents
          FROM events e CROSS JOIN r)
    SELECT rep, CAST(SUM(w) AS BIGINT) AS n_eff,
           CAST(SUM(w * cents) AS BIGINT) AS sum_cents
    FROM w GROUP BY rep""")
def bootstrap_mean_replicates(sf_dir: str):
    """Deterministic multiplier bootstrap for the mean event value:
    {BOOT_B} replicates, each reweighting every row by
    w ∈ {{0,1,2}} (two mid bits of the salted Knuth hash — mean 1,
    Binomial(2,½), the Rubin-style random-weight bootstrap that never
    resamples rows across workers); output per replicate is the exact
    integer (Σw, Σw·cents) pair, so the consumer gets the replicate
    means and a CI with zero nondeterminism — reruns and the SQL twin
    agree bit-for-bit. Shape: all {BOOT_B} replicates computed
    vectorized per batch (one id-vector × salt-vector broadcast), ≤
    {BOOT_B} partial rows per batch, one tiny groupby — the events
    table is scanned ONCE, never {BOOT_B} times."""
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "events", ["event_id", "value"])
    salts = (np.arange(BOOT_B, dtype=np.uint64)
             * np.uint64(BOOT_SALT))

    def part(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100 + 0.5) \
            .astype(np.int64)
        h = ((eid[:, None] + salts[None, :])
             * np.uint64(BOOT_KNUTH)) % np.uint64(1 << 32)
        w = (((h >> np.uint64(17)) & np.uint64(1))
             + ((h >> np.uint64(18)) & np.uint64(1))).astype(np.int64)
        return pa.table({
            "rep": pa.array(np.arange(BOOT_B, dtype=np.int64)),
            "n_eff": pa.array(w.sum(axis=0)),
            "sum_cents": pa.array((w * cents[:, None]).sum(axis=0))})

    agg = (ds.map_batches(part, batch_format="pyarrow", batch_size=65536)
           .groupby("rep")
           .aggregate(Sum("n_eff", alias_name="n_eff"),
                      Sum("sum_cents", alias_name="sum_cents")))
    return agg.map_batches(
        lambda t: t.rename_columns(["rep", "n_eff", "sum_cents"]),
        batch_format="pyarrow")


# ------------------- deterministic permutation test (two-sample)

PERM_P = 64                      # permutations
PERM_SALT = 7_368_787            # prime salt stream


@register("permutation_test_events", sql=f"""
    WITH base AS (SELECT event_id,
                         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
                         CASE WHEN event_type = 'purchase'
                              THEN 1 ELSE 0 END AS grp
                  FROM events
                  WHERE event_type IN ('view', 'purchase')),
    p AS (SELECT unnest(generate_series(0, {PERM_P - 1})) AS perm),
    w AS (SELECT p.perm,
                 ((((CAST(b.event_id AS HUGEINT) + p.perm * {PERM_SALT})
                    * {BOOT_KNUTH}) % 4294967296) >> 17) & 1 AS flip,
                 b.grp, b.cents
          FROM base b CROSS JOIN p),
    s AS (SELECT perm,
                 CAST(SUM(CASE WHEN (grp + flip) % 2 = 1
                               THEN cents ELSE 0 END) AS BIGINT) AS sum_a,
                 CAST(SUM(CASE WHEN (grp + flip) % 2 = 1
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                 CAST(SUM(cents) AS BIGINT) AS sum_all,
                 CAST(COUNT(*) AS BIGINT) AS n_all
          FROM w GROUP BY perm)
    SELECT perm, n_a, sum_a, n_all - n_a AS n_b,
           sum_all - sum_a AS sum_b
    FROM s""")
def permutation_test_events(sf_dir: str):
    """Deterministic two-sample permutation test scaffold (purchase vs
    view mean value): {PERM_P} pseudo-permutations, each flipping every
    row's group label by one salted Knuth hash bit (a random-flip
    permutation — exchangeable under H0), emitting the EXACT integer
    (n, Σcents) of both permuted groups; the consumer computes the
    permuted mean differences and the p-value as a pure integer-ratio
    comparison against the observed difference, bit-identical across
    reruns and the SQL twin. Shape: one scan, all {PERM_P} flips
    vectorized per batch (id × salt broadcast), ≤ {PERM_P} partial rows
    per batch, one tiny groupby."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    import pyarrow.dataset as pads

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"],
        filter=(pads.field("event_type").isin(["view", "purchase"])))
    salts = (np.arange(PERM_P, dtype=np.uint64)
             * np.uint64(PERM_SALT))

    def part(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100 + 0.5) \
            .astype(np.int64)
        grp = pc.equal(t["event_type"], "purchase").to_numpy(
            zero_copy_only=False).astype(np.int64)
        h = ((eid[:, None] + salts[None, :])
             * np.uint64(BOOT_KNUTH)) % np.uint64(1 << 32)
        flip = ((h >> np.uint64(17)) & np.uint64(1)).astype(np.int64)
        in_a = (grp[:, None] + flip) % 2 == 1
        return pa.table({
            "perm": pa.array(np.arange(PERM_P, dtype=np.int64)),
            "n_a": pa.array(in_a.sum(axis=0).astype(np.int64)),
            "sum_a": pa.array(
                (np.where(in_a, cents[:, None], 0)).sum(axis=0)),
            "n_all": pa.array(np.full(PERM_P, len(eid), np.int64)),
            "sum_all": pa.array(
                np.full(PERM_P, int(cents.sum()), np.int64))})

    agg = (ds.map_batches(part, batch_format="pyarrow", batch_size=65536)
           .groupby("perm")
           .aggregate(Sum("n_a", alias_name="n_a"),
                      Sum("sum_a", alias_name="sum_a"),
                      Sum("n_all", alias_name="n_all"),
                      Sum("sum_all", alias_name="sum_all")))

    def finish(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["perm", "n_a", "sum_a", "n_all", "sum_all"])
        return pa.table({
            "perm": t["perm"], "n_a": t["n_a"], "sum_a": t["sum_a"],
            "n_b": pc.subtract(t["n_all"], t["n_a"]),
            "sum_b": pc.subtract(t["sum_all"], t["sum_a"])})

    return agg.map_batches(finish, batch_format="pyarrow")


@register("benford_digit_audit", sql="""
    WITH c AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
               FROM events WHERE value > 0),
    d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
              AS digit
          FROM c WHERE cents > 0)
    SELECT digit, CAST(COUNT(*) AS BIGINT) AS n
    FROM d GROUP BY 1""")
def benford_digit_audit(sf_dir: str):
    """Benford first-significant-digit audit of event values — the
    classic fabricated-data / unit-mixup screen a warehouse runs on
    money columns (the consumer compares the digit histogram against
    log10(1+1/d) with a chi² whose terms are pure integers). Exact:
    digits come from the DECIMAL STRING of the integer cents (no float
    log10 — a boundary value like 999.995 must round the same way on
    both sides, which the shared floor(x·100+0.5) quantization
    guarantees). One scan, ≤9 partial rows per batch."""
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "events", ["value"])

    def part(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100 + 0.5).astype(np.int64)
        cents = cents[(v > 0) & (cents > 0)]
        if not len(cents):
            return pa.table({"digit": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        # first digit: strip by powers of ten (integer arithmetic only)
        x = cents.copy()
        while (x >= 10).any():
            x = np.where(x >= 10, x // 10, x)
        dig, cnt = np.unique(x, return_counts=True)
        return pa.table({"digit": pa.array(dig),
                         "n": pa.array(cnt.astype(np.int64))})

    agg = (ds.map_batches(part, batch_format="pyarrow", batch_size=65536)
           .groupby("digit").aggregate(Sum("n", alias_name="n")))
    return agg.map_batches(lambda t: t.rename_columns(["digit", "n"]),
                           batch_format="pyarrow")


@register("mannwhitney_u_events", sql="""
    WITH base AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT)
                      AS cents,
                      CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END AS grp
                  FROM events
                  WHERE event_type IN ('view', 'purchase')),
    h AS (SELECT cents, CAST(SUM(grp) AS BIGINT) AS na,
                 CAST(COUNT(*) AS BIGINT) AS nt
          FROM base GROUP BY 1),
    w AS (SELECT cents, na, nt,
                 CAST(SUM(nt) OVER (ORDER BY cents) AS BIGINT) AS cum
          FROM h),
    -- doubled midrank of tied value v: 2·cum_before + nt + 1
    r AS (SELECT na, 2 * (cum - nt) + nt + 1 AS mr2 FROM w),
    s AS (SELECT CAST(SUM(na * mr2) AS BIGINT) AS ranksum2,
                 CAST(SUM(na) AS BIGINT) AS n_a FROM r),
    g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM base)
    SELECT COALESCE(s.n_a, 0) AS n_a,
           g.n_all - COALESCE(s.n_a, 0) AS n_b,
           COALESCE(s.ranksum2 - s.n_a * (s.n_a + 1), 0) AS u2_a
    FROM s, g""")
def mannwhitney_u_events(sf_dir: str):
    """Mann-Whitney U (Wilcoxon rank-sum) between purchase and view
    values — the classical nonparametric two-sample test, EXACT via
    DOUBLED midranks (tied value with nt occurrences gets midrank
    cum_before + (nt+1)/2; ×2 keeps everything int64, so
    U2 = 2·U = 2·R_a − n_a(n_a+1) is order-independent and hash-exact;
    the consumer forms z with the tie-corrected variance from the same
    histogram). Shape: values quantize to cents inside the scan; the
    ONLY shuffle carries the bounded (cents, group-count) histogram
    (≤ distinct cents rows); the rank prefix sum folds on that bounded
    table — raw events never shuffle."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"],
        filter=(pads.field("event_type").isin(["view", "purchase"])))

    def part(t: pa.Table) -> pa.Table:
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100 + 0.5) \
            .astype(np.int64)
        grp = pc.equal(t["event_type"], "purchase").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return (pa.table({"cents": pa.array(cents), "na": pa.array(grp),
                          "nt": pa.array(np.ones(len(cents), np.int64))})
                .group_by(["cents"])
                .aggregate([("na", "sum"), ("nt", "sum")])
                .rename_columns(["cents", "na", "nt"]))

    h = (ds.map_batches(part, batch_format="pyarrow", batch_size=65536)
         .groupby("cents")
         .aggregate(Sum("na", alias_name="na"),
                    Sum("nt", alias_name="nt"))
         .to_pandas())
    h = h.rename(columns=dict(zip(h.columns, ["cents", "na", "nt"])))
    h = h.sort_values("cents", kind="mergesort")
    assert len(h) <= 1_000_000     # bounded-histogram contract
    from ..stages.shuffle import doubled_midranks
    nt = h["nt"].to_numpy(np.int64)
    na = h["na"].to_numpy(np.int64)
    mr2 = doubled_midranks(nt)
    n_a = int(na.sum())
    n_all = int(nt.sum())
    ranksum2 = int((na * mr2).sum())
    return pd.DataFrame({
        "n_a": np.array([n_a], np.int64),
        "n_b": np.array([n_all - n_a], np.int64),
        "u2_a": np.array([ranksum2 - n_a * (n_a + 1)], np.int64)})


@register("kruskal_rank_sums", sql="""
    WITH base AS (SELECT event_type,
                         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
                  FROM events),
    h AS (SELECT cents, event_type, CAST(COUNT(*) AS BIGINT) AS n
          FROM base GROUP BY 1, 2),
    t AS (SELECT cents, CAST(SUM(n) AS BIGINT) AS nt FROM h GROUP BY 1),
    w AS (SELECT cents, nt,
                 2 * (CAST(SUM(nt) OVER (ORDER BY cents) AS BIGINT) - nt)
                 + nt + 1 AS mr2
          FROM t)
    SELECT h.event_type, CAST(SUM(h.n) AS BIGINT) AS n_j,
           CAST(SUM(h.n * w.mr2) AS BIGINT) AS ranksum2
    FROM h JOIN w ON w.cents = h.cents
    GROUP BY 1""")
def kruskal_rank_sums(sf_dir: str):
    """Kruskal-Wallis rank sums — the k-sample sibling of the
    Mann-Whitney machinery: per event type, the group size and the
    DOUBLED-midrank sum over all five groups' pooled values; the
    consumer forms H = 12/(N(N+1))·Σ(R_j²/n_j)/4 − 3(N+1) with the tie
    correction from the same histogram (rational-output rule — every
    emitted number is int64). Same bounded-histogram shape: only
    (cents, type, count) rows shuffle."""
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "events", ["event_type", "value"])

    def part(t: pa.Table) -> pa.Table:
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100 + 0.5) \
            .astype(np.int64)
        return (pa.table({"cents": pa.array(cents),
                          "event_type": t["event_type"],
                          "n": pa.array(np.ones(len(cents), np.int64))})
                .group_by(["cents", "event_type"])
                .aggregate([("n", "sum")])
                .rename_columns(["cents", "event_type", "n"]))

    h = (ds.map_batches(part, batch_format="pyarrow", batch_size=65536)
         .groupby(["cents", "event_type"])
         .aggregate(Sum("n", alias_name="n"))
         .to_pandas())
    h = h.rename(columns=dict(zip(h.columns,
                                  ["cents", "event_type", "n"])))
    assert len(h) <= 2_000_000     # bounded joint histogram contract
    tot = (h.groupby("cents", as_index=False)["n"].sum()
           .sort_values("cents", kind="mergesort"))
    from ..stages.shuffle import doubled_midranks
    tot["mr2"] = doubled_midranks(tot["n"].to_numpy(np.int64))
    m = h.merge(tot[["cents", "mr2"]], on="cents")
    out = (m.assign(rs2=m["n"] * m["mr2"])
           .groupby("event_type", as_index=False)
           .agg(n_j=("n", "sum"), ranksum2=("rs2", "sum")))
    out["n_j"] = out["n_j"].astype(np.int64)
    out["ranksum2"] = out["ranksum2"].astype(np.int64)
    return out


@register("spearman_value_hour", sql="""
    WITH base AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT)
                      AS cents,
                      CAST(epoch_us(ts) AS BIGINT)
                          // 3600000000 % 24 AS hr
                  FROM events),
    j AS (SELECT cents, hr, CAST(COUNT(*) AS BIGINT) AS n
          FROM base GROUP BY 1, 2),
    cv AS (SELECT cents, CAST(SUM(n) AS BIGINT) AS nt FROM j GROUP BY 1),
    rv AS (SELECT cents,
                  2 * (CAST(SUM(nt) OVER (ORDER BY cents) AS BIGINT)
                       - nt) + nt + 1 AS ra2
           FROM cv),
    ch AS (SELECT hr, CAST(SUM(n) AS BIGINT) AS nt FROM j GROUP BY 1),
    rh AS (SELECT hr,
                  2 * (CAST(SUM(nt) OVER (ORDER BY hr) AS BIGINT)
                       - nt) + nt + 1 AS rb2
           FROM ch),
    m AS (SELECT j.n, rv.ra2, rh.rb2
          FROM j JOIN rv ON rv.cents = j.cents
          JOIN rh ON rh.hr = j.hr)
    SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(SUM(n * ra2) AS BIGINT) AS sa,
           CAST(SUM(n * rb2) AS BIGINT) AS sb,
           CAST(SUM(n * ra2 * rb2) AS BIGINT) AS sab,
           CAST(SUM(n * ra2 * ra2) AS BIGINT) AS saa,
           CAST(SUM(n * rb2 * rb2) AS BIGINT) AS sbb
    FROM m""")
def spearman_value_hour(sf_dir: str):
    """Spearman rank correlation between event value and hour-of-day —
    the tie-robust monotonic-association test (is spend higher late at
    night?): both variables replaced by DOUBLED midranks (exact int64,
    the Mann-Whitney machinery applied twice), reduced to the six exact
    Pearson moment terms over ranks — the consumer forms
    ρ = (n·Σab − Σa·Σb) / √((n·Σa²−(Σa)²)(n·Σb²−(Σb)²)) at any
    precision (rational-output rule; cell_layer_corr_terms' contract).
    Shape: ONLY the bounded (cents × 24-hour) joint histogram shuffles;
    marginal rank prefix sums fold on the bounded axes."""
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "events", ["value", "ts"])

    def part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100 + 0.5) \
            .astype(np.int64)
        hr = (pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
              // 3_600_000_000) % 24
        return (pa.table({"cents": pa.array(cents), "hr": pa.array(hr),
                          "n": pa.array(np.ones(len(cents), np.int64))})
                .group_by(["cents", "hr"]).aggregate([("n", "sum")])
                .rename_columns(["cents", "hr", "n"]))

    j = (ds.map_batches(part, batch_format="pyarrow", batch_size=65536)
         .groupby(["cents", "hr"])
         .aggregate(Sum("n", alias_name="n"))
         .to_pandas())
    j = j.rename(columns=dict(zip(j.columns, ["cents", "hr", "n"])))
    assert len(j) <= 2_000_000     # bounded joint histogram contract

    from ..stages.shuffle import doubled_midranks

    def ranks2(tot: pd.DataFrame, key: str) -> dict:
        tot = tot.sort_values(key, kind="mergesort")
        return dict(zip(tot[key],
                        doubled_midranks(tot["n"].to_numpy(np.int64))))

    ra = ranks2(j.groupby("cents", as_index=False)["n"].sum(), "cents")
    rb = ranks2(j.groupby("hr", as_index=False)["n"].sum(), "hr")
    n = j["n"].to_numpy(np.int64)
    a = np.array([ra[c] for c in j["cents"]], np.int64)
    b = np.array([rb[h] for h in j["hr"]], np.int64)
    return pd.DataFrame({
        "n_rows": np.array([int(n.sum())], np.int64),
        "sa": np.array([int((n * a).sum())], np.int64),
        "sb": np.array([int((n * b).sum())], np.int64),
        "sab": np.array([int((n * a * b).sum())], np.int64),
        "saa": np.array([int((n * a * a).sum())], np.int64),
        "sbb": np.array([int((n * b * b).sum())], np.int64)})


WSR_SPLIT_US = 1_705_363_200_000_000   # 2024-01-16T00:00Z: month midpoint


@register("wilcoxon_signed_rank_users", sql=f"""
    WITH p AS (SELECT user_id,
                      CAST(SUM(CASE WHEN CAST(epoch_us(ts) AS BIGINT)
                                         < {WSR_SPLIT_US}
                                    THEN CAST(floor(value * 100 + 0.5)
                                              AS BIGINT) ELSE 0 END)
                           AS BIGINT) AS a,
                      CAST(SUM(CASE WHEN CAST(epoch_us(ts) AS BIGINT)
                                         >= {WSR_SPLIT_US}
                                    THEN CAST(floor(value * 100 + 0.5)
                                              AS BIGINT) ELSE 0 END)
                           AS BIGINT) AS b
               FROM events GROUP BY 1),
    d AS (SELECT user_id, b - a AS diff, abs(b - a) AS ad
          FROM p WHERE b - a <> 0),
    h AS (SELECT ad, CAST(COUNT(*) AS BIGINT) AS nt FROM d GROUP BY 1),
    r AS (SELECT ad,
                 2 * (CAST(SUM(nt) OVER (ORDER BY ad) AS BIGINT) - nt)
                 + nt + 1 AS mr2
          FROM h)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COALESCE(SUM(CASE WHEN d.diff > 0
                                  THEN r.mr2 ELSE 0 END), 0)
                AS BIGINT) AS w_plus2,
           CAST(COALESCE(SUM(r.mr2), 0) AS BIGINT) AS w_total2
    FROM d JOIN r ON r.ad = d.ad""")
def wilcoxon_signed_rank_users(sf_dir: str):
    """Wilcoxon signed-rank test — the PAIRED nonparametric test
    completing the trio (Mann-Whitney: independent two-sample;
    Kruskal-Wallis: k-sample): per user, total spend in the first vs
    second half of the log; zero diffs dropped, |diff| replaced by
    DOUBLED midranks, W⁺ = Σ ranks of positive diffs — all int64, the
    consumer forms z from (w_plus2, w_total2, n_pairs) plus the tie
    term derivable from the same histogram. Shape: per-user paired sums
    via one user-keyed partial aggregate; the |diff| rank fold runs on
    the bounded per-user table (≤ |users| rows, asserted)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "events", ["user_id", "ts", "value"])

    def part(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100 + 0.5) \
            .astype(np.int64)
        first = us < WSR_SPLIT_US
        return (pa.table({"user_id": t["user_id"],
                          "a": pa.array(np.where(first, cents, 0)),
                          "b": pa.array(np.where(first, 0, cents))})
                .group_by(["user_id"])
                .aggregate([("a", "sum"), ("b", "sum")])
                .rename_columns(["user_id", "a", "b"]))

    p = (ds.map_batches(part, batch_format="pyarrow", batch_size=65536)
         .groupby("user_id")
         .aggregate(Sum("a", alias_name="a"), Sum("b", alias_name="b"))
         .to_pandas())
    p = p.rename(columns=dict(zip(p.columns, ["user_id", "a", "b"])))
    assert len(p) <= 2_000_000      # bounded per-user fold contract
    diff = (p["b"] - p["a"]).to_numpy(np.int64)
    diff = diff[diff != 0]
    ad = np.abs(diff)
    from ..stages.shuffle import doubled_midranks
    uniq, cnt = np.unique(ad, return_counts=True)
    rank2 = doubled_midranks(cnt)[np.searchsorted(uniq, ad)]
    return pd.DataFrame({
        "n_pairs": np.array([len(diff)], np.int64),
        "w_plus2": np.array([int(rank2[diff > 0].sum())], np.int64),
        "w_total2": np.array([int(rank2.sum())], np.int64)})


@register("friedman_rank_sums", sql="""
    WITH p AS (SELECT user_id, event_type,
                      CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                           AS BIGINT) AS cents
               FROM events GROUP BY 1, 2),
    full_u AS (SELECT user_id FROM p
               GROUP BY 1 HAVING COUNT(*) = 5),
    r AS (SELECT p.user_id, p.event_type,
                 2 * (CAST(COUNT(*) FILTER (WHERE p2.cents < p.cents)
                           AS BIGINT))
                 + CAST(COUNT(*) FILTER (WHERE p2.cents = p.cents)
                        AS BIGINT) + 1 AS mr2
          FROM p JOIN full_u USING (user_id)
          JOIN p p2 ON p2.user_id = p.user_id
          GROUP BY 1, 2)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(SUM(mr2) AS BIGINT) AS ranksum2
    FROM r GROUP BY 1""")
def friedman_rank_sums(sf_dir: str):
    """Friedman rank sums — the BLOCKED k-sample test closing the rank
    family (blocks = users, treatments = the 5 event types, ranks
    WITHIN each user): per type, the number of complete blocks and the
    doubled-midrank sum; the consumer forms the Friedman χ² (or
    Kendall's W concordance) from these integers. Only users with all
    5 types count (complete blocks — the classical requirement).
    Shape: per-(user, type) cent sums via one partial aggregate; the
    within-block ranking needs each user's ≤5 rows co-located — one
    user-keyed grouped_apply; ≤ 5 output rows."""
    from ray.data.aggregate import Sum

    from ..stages.shuffle import (cents_quantized, doubled_midranks,
                                  grouped_apply)

    ds = read_table(sf_dir, "events", ["user_id", "event_type", "value"])

    def part(t: pa.Table) -> pa.Table:
        cents = cents_quantized(
            t["value"].to_numpy(zero_copy_only=False))
        return (pa.table({"user_id": t["user_id"],
                          "event_type": t["event_type"],
                          "cents": pa.array(cents)})
                .group_by(["user_id", "event_type"])
                .aggregate([("cents", "sum")])
                .rename_columns(["user_id", "event_type", "cents"]))

    p = (ds.map_batches(part, batch_format="pyarrow", batch_size=65536)
         .groupby(["user_id", "event_type"])
         .aggregate(Sum("cents", alias_name="cents"))
         .map_batches(lambda t: t.rename_columns(
             ["user_id", "event_type", "cents"]),
             batch_format="pyarrow"))

    def block_rank(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for uid, g in df.groupby("user_id", sort=False):
            if len(g) != 5:
                continue            # incomplete block
            c = g["cents"].to_numpy(np.int64)
            uniq, inv, cnt = np.unique(c, return_inverse=True,
                                       return_counts=True)
            mr2 = doubled_midranks(cnt)[inv]
            out.append(pd.DataFrame({
                "event_type": g["event_type"].to_numpy(),
                "mr2": mr2,
                "one": np.ones(len(g), np.int64)}))
        if not out:
            return pd.DataFrame({
                "event_type": pd.Series([], dtype=object),
                "mr2": pd.Series([], dtype=np.int64),
                "one": pd.Series([], dtype=np.int64)})
        d = pd.concat(out, ignore_index=True)
        return (d.groupby("event_type", as_index=False)
                .agg(n_blocks=("one", "sum"), ranksum2=("mr2", "sum")))

    parts = grouped_apply(p, ["user_id"], block_rank)
    agg = (parts.groupby("event_type")
           .aggregate(Sum("n_blocks", alias_name="n_blocks"),
                      Sum("ranksum2", alias_name="ranksum2")))
    return agg.map_batches(
        lambda t: t.rename_columns(["event_type", "n_blocks",
                                    "ranksum2"]),
        batch_format="pyarrow")


@register("kendall_tau_terms", sql="""
    WITH base AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT)
                      AS cents,
                      CAST(epoch_us(ts) AS BIGINT)
                          // 3600000000 % 24 AS hr
                  FROM events),
    j AS (SELECT cents, hr, CAST(COUNT(*) AS BIGINT) AS n
          FROM base GROUP BY 1, 2),
    g AS (SELECT c.cents, h.hr, CAST(COALESCE(j.n, 0) AS BIGINT) AS n
          FROM (SELECT DISTINCT cents FROM j) c
          CROSS JOIN (SELECT unnest(generate_series(0, 23)) AS hr) h
          LEFT JOIN j ON j.cents = c.cents AND j.hr = h.hr),
    a AS (SELECT cents, hr, n,
                 CAST(COALESCE(SUM(n) OVER (PARTITION BY hr
                          ORDER BY cents ROWS BETWEEN UNBOUNDED
                          PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                     AS below
          FROM g),
    b AS (SELECT cents, hr, n,
                 CAST(COALESCE(SUM(below) OVER (PARTITION BY cents
                          ORDER BY hr ROWS BETWEEN UNBOUNDED
                          PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                     AS cless,
                 CAST(COALESCE(SUM(below) OVER (PARTITION BY cents
                          ORDER BY hr DESC ROWS BETWEEN UNBOUNDED
                          PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                     AS cmore
          FROM a),
    mx AS (SELECT CAST(SUM(s * (s - 1) // 2) AS BIGINT) AS tied_x
           FROM (SELECT CAST(SUM(n) AS BIGINT) AS s FROM j GROUP BY cents)),
    my AS (SELECT CAST(SUM(s * (s - 1) // 2) AS BIGINT) AS tied_y
           FROM (SELECT CAST(SUM(n) AS BIGINT) AS s FROM j GROUP BY hr)),
    mxy AS (SELECT CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS tied_xy,
                   CAST(SUM(n) AS BIGINT) AS n_rows FROM j),
    cd AS (SELECT CAST(COALESCE(SUM(n * cless), 0) AS BIGINT)
                      AS concordant,
                  CAST(COALESCE(SUM(n * cmore), 0) AS BIGINT)
                      AS discordant
           FROM b)
    SELECT CAST(COALESCE(mxy.n_rows, 0) AS BIGINT) AS n_rows,
           cd.concordant, cd.discordant,
           CAST(COALESCE(mx.tied_x, 0) AS BIGINT) AS tied_x,
           CAST(COALESCE(my.tied_y, 0) AS BIGINT) AS tied_y,
           CAST(COALESCE(mxy.tied_xy, 0) AS BIGINT) AS tied_xy
    FROM cd, mx, my, mxy""")
def kendall_tau_terms(sf_dir: str):
    """Kendall's τ-b terms (value × hour-of-day) — the pair-concordance
    correlation completing the association suite (Spearman ranks values;
    Kendall counts ORDERED PAIRS, robust to monotone transforms of
    either axis): exact integer concordant/discordant pair counts via a
    2-D EXCLUSIVE prefix sum over the densified bounded joint grid
    (distinct cents × 24 — no pair enumeration; the O(n²) pair space
    collapses onto a ≤240k-cell grid), plus the three tie-pair counts
    from the marginals; the consumer forms
    τ_b = (C − D)/√((T₀−Tx)(T₀−Ty)). Only the joint histogram
    shuffles."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from ..stages.shuffle import cents_quantized

    ds = read_table(sf_dir, "events", ["value", "ts"])

    def part(t: pa.Table) -> pa.Table:
        cents = cents_quantized(
            t["value"].to_numpy(zero_copy_only=False))
        hr = (pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
              // 3_600_000_000) % 24
        return (pa.table({"cents": pa.array(cents), "hr": pa.array(hr),
                          "n": pa.array(np.ones(len(cents), np.int64))})
                .group_by(["cents", "hr"]).aggregate([("n", "sum")])
                .rename_columns(["cents", "hr", "n"]))

    j = (ds.map_batches(part, batch_format="pyarrow", batch_size=65536)
         .groupby(["cents", "hr"])
         .aggregate(Sum("n", alias_name="n"))
         .to_pandas())
    j = j.rename(columns=dict(zip(j.columns, ["cents", "hr", "n"])))
    assert len(j) <= 2_000_000     # bounded joint histogram contract

    cents_vals = np.sort(j["cents"].unique())
    ci = np.searchsorted(cents_vals, j["cents"].to_numpy(np.int64))
    M = np.zeros((len(cents_vals), 24), np.int64)
    M[ci, j["hr"].to_numpy(np.int64)] = j["n"].to_numpy(np.int64)
    below = np.vstack([np.zeros((1, 24), np.int64),
                       np.cumsum(M, axis=0)[:-1]])
    cless = np.hstack([np.zeros((len(cents_vals), 1), np.int64),
                       np.cumsum(below, axis=1)[:, :-1]])
    cmore = np.hstack([np.cumsum(below[:, ::-1], axis=1)[:, :-1][:, ::-1],
                       np.zeros((len(cents_vals), 1), np.int64)])
    concordant = int((M * cless).sum())
    discordant = int((M * cmore).sum())
    nx = M.sum(axis=1)
    ny = M.sum(axis=0)
    n_rows = int(M.sum())
    import pandas as pd
    return pd.DataFrame({
        "n_rows": np.array([n_rows], np.int64),
        "concordant": np.array([concordant], np.int64),
        "discordant": np.array([discordant], np.int64),
        "tied_x": np.array([int((nx * (nx - 1) // 2).sum())], np.int64),
        "tied_y": np.array([int((ny * (ny - 1) // 2).sum())], np.int64),
        "tied_xy": np.array([int((M * (M - 1) // 2).sum())], np.int64)})
