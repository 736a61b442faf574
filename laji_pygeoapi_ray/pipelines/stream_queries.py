"""Stream-shaped / set-op / ordering queries with exact DuckDB oracles:
tumbling windows, as-of join, top-k, upsert-as-union+dedup, a generic
grouped-aggregate anchor, and the raster→vector tile polygons."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..functions import cells, points
from ..sources.parquet import read_table
from ..stages.dedup import dedup_keep_latest
from ..stages.derive import derive_and_encode
from ..stages.stream import (US_PER_HOUR, add_window_column, asof_join,
                             topk_by)
from .registry import register

RES = 7


@register("tumbling_hour_events", sql=f"""
    SELECT event_type, CAST(epoch_us(ts) AS BIGINT) // {US_PER_HOUR} AS window,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(value) AS min_value, MAX(value) AS max_value
    FROM events GROUP BY 1, 2""")
def tumbling_hour_events(sf_dir: str):
    """Event-time tumbling-window aggregate (1 h) per event type — the
    engine's window operator over the bounded events log (exact integer
    window keys: epoch-µs floor-division)."""
    ds = read_table(sf_dir, "events", ["event_type", "ts", "value"])
    ds = ds.map_batches(add_window_column("ts"), batch_format="pyarrow")
    agg = ds.groupby(["event_type", "window"]).aggregate(
        Count(alias_name="n"), Min("value", alias_name="min_value"),
        Max("value", alias_name="max_value"))
    return agg.map_batches(lambda t: t.rename_columns(
        ["event_type", "window", "n", "min_value", "max_value"]),
        batch_format="pyarrow")


@register("asof_view_purchase", sql="""
    WITH v AS (SELECT user_id, ts AS view_ts,
                      MAX(event_id) AS view_event_id
               FROM events WHERE event_type = 'view' GROUP BY 1, 2),
    p AS (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id, p.ts,
           CAST(v.view_event_id AS DOUBLE) AS view_event_id, v.view_ts
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND p.ts >= v.view_ts""")
def asof_view_purchase(sf_dir: str):
    """As-of join: each purchase matched to the latest preceding view by the
    same user (backward, inclusive) — the engine's merge_asof operator,
    distributed by hashed key. Right-side ties (same user, same view_ts)
    are canonicalized to the max view_event_id on BOTH sides; unmatched
    purchases emit NULL (not NaN/NaT) so the result hashes identically to
    the SQL ASOF LEFT JOIN."""
    ev = read_table(sf_dir, "events", ["event_id", "user_id", "ts",
                                       "event_type"])

    def split(kind):
        def fn(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return t.filter(pc.equal(t["event_type"], kind)).drop_columns(
                ["event_type"])
        return fn

    left = ev.map_batches(split("purchase"), batch_format="pyarrow")
    right = ev.map_batches(split("view"), batch_format="pyarrow").map_batches(
        lambda t: t.rename_columns(["view_event_id", "user_id", "view_ts"]),
        batch_format="pyarrow")

    out = asof_join(left, right, key="user_id", left_ts="ts",
                    right_ts="view_ts", right_tie="view_event_id")

    def finalize(df: pd.DataFrame) -> pa.Table:
        vals = df["view_event_id"].to_numpy(dtype="float64", na_value=np.nan)
        return pa.table({
            "event_id": pa.array(df["event_id"].to_numpy(dtype="int64")),
            "user_id": pa.array(df["user_id"].to_numpy(dtype="int64")),
            "ts": pa.array(df["ts"].to_numpy(dtype="datetime64[us]")),
            # masked array: unmatched rows become Arrow NULL, not NaN —
            # NaN and NULL hash differently in the oracle compare
            "view_event_id": pa.array(vals, mask=np.isnan(vals)),
            "view_ts": pa.Array.from_pandas(
                df["view_ts"], type=pa.timestamp("us")),
        })

    return out.map_batches(finalize, batch_format="pandas")


@register("topk_orders", sql="""
    SELECT o_orderkey, o_custkey, o_totalprice, CAST(rank AS BIGINT) AS rank
    FROM (SELECT o_orderkey, o_custkey, o_totalprice, row_number() OVER (
            ORDER BY o_totalprice DESC, o_orderkey) AS rank FROM orders)
    WHERE rank <= 10""")
def topk_orders(sf_dir: str):
    """Distributed top-k (k=10 by total price, ties by key): per-batch
    partial top-k + tiny final merge — no global sort (SURVEY.md §2.7)."""
    ds = read_table(sf_dir, "orders",
                    ["o_orderkey", "o_custkey", "o_totalprice"])
    return topk_by(ds, "o_totalprice", 10, tie_col="o_orderkey")


@register("upsert_events", sql=f"""
    WITH delta AS (SELECT event_id, ts + INTERVAL 1 HOUR AS ts, user_id,
                          event_type, value + CAST(1000.0 AS DOUBLE) AS value,
                          props
                   FROM events WHERE event_id % 10 = 0),
    unioned AS (SELECT * FROM events UNION ALL SELECT * FROM delta)
    SELECT event_id, ts, user_id, event_type, value, props FROM (
      SELECT *, row_number() OVER (
        PARTITION BY event_id ORDER BY ts DESC) AS rn FROM unioned)
    WHERE rn = 1""")
def upsert_events(sf_dir: str):
    """Upsert = append + keep-latest dedup (the reference's PAGES=latest
    semantics, SURVEY.md §2.8): a delta batch (every 10th event re-delivered
    1 h later with updated value) unioned onto the base then deduped by id
    keeping the latest timestamp."""
    base = read_table(sf_dir, "events")

    def make_delta(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.equal(pc.subtract(t["event_id"],
                                    pc.multiply(pc.divide(t["event_id"],
                                                          pa.scalar(10, pa.int64())),
                                                pa.scalar(10, pa.int64()))),
                        pa.scalar(0, pa.int64()))
        t = t.filter(keep)
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        ts = ts + np.timedelta64(US_PER_HOUR, "us")
        val = t["value"].to_numpy(zero_copy_only=False) + np.float64(1000.0)
        return pa.table({"event_id": t["event_id"], "ts": pa.array(ts),
                         "user_id": t["user_id"],
                         "event_type": t["event_type"],
                         "value": pa.array(val), "props": t["props"]})

    delta = read_table(sf_dir, "events").map_batches(make_delta,
                                                     batch_format="pyarrow")
    unioned = base.union(delta)
    return dedup_keep_latest(unioned, ["event_id"], ["ts"])


@register("pricing_summary", sql="""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS count_order,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus""")
def pricing_summary(sf_dir: str):
    """TPC-H-Q1-style grouped aggregate anchor for the generic
    filter→groupby→aggregate path (order-independent aggregates only, so
    the distributed result is bit-exact)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "lineitem",
                    ["l_returnflag", "l_linestatus", "l_quantity",
                     "l_extendedprice", "l_shipdate"])
    cutoff = pa.scalar(np.datetime64("1998-09-02T00:00:00", "us"))
    ds = ds.map_batches(
        lambda t: t.filter(pc.less_equal(t["l_shipdate"], cutoff)),
        batch_format="pyarrow")
    agg = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Count(alias_name="count_order"),
        Min("l_extendedprice", alias_name="min_price"),
        Max("l_extendedprice", alias_name="max_price"))
    return agg.map_batches(lambda t: t.rename_columns(
        ["l_returnflag", "l_linestatus", "sum_qty", "count_order",
         "min_price", "max_price"]), batch_format="pyarrow")


def _tile_poly_sql() -> str:
    x, y = points.sql_xy("doc_id")
    cell = cells.sql_cell("x", "y", RES)
    bx0, by0, bx1, by1 = cells.sql_cell_bounds("cell7", RES)
    return f"""
    WITH pts AS (SELECT doc_id, x, y, {cell} AS cell7
                 FROM (SELECT doc_id, {x} AS x, {y} AS y FROM documents)),
    agg AS (SELECT cell7, COUNT(*) AS n FROM pts GROUP BY cell7)
    SELECT cell7, CAST(n AS BIGINT) AS n,
           {bx0} AS x0, {by0} AS y0, {bx1} AS x1, {by1} AS y1
    FROM agg"""


@register("tile_polygons", sql=_tile_poly_sql)
def tile_polygons(sf_dir: str):
    """Raster→vector: each occupied res-7 tile becomes a vector feature
    (its bbox polygon corners) with its occurrence count — the 'vectorize'
    direction of the tile-aggregation requirement (SURVEY.md §2.6)."""
    ds = read_table(sf_dir, "documents", ["doc_id"])
    ds = ds.map_batches(derive_and_encode("doc_id", (RES,)),
                        batch_format="pyarrow", zero_copy_batch=True)
    agg = ds.groupby(f"cell{RES}").aggregate(Count(alias_name="n"))

    def bounds(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["cell7", "n"])
        c = t["cell7"].to_numpy(zero_copy_only=False)
        x0, y0, x1, y1 = cells.cell_bounds_np(c, RES)
        for name, arr in zip(("x0", "y0", "x1", "y1"), (x0, y0, x1, y1)):
            t = t.append_column(name, pa.array(arr))
        return t

    return agg.map_batches(bounds, batch_format="pyarrow")


GAP_US = 30 * 60 * 1_000_000   # 30-minute session gap


@register("session_windows_events", sql=f"""
    WITH o AS (SELECT user_id, ts,
        CASE WHEN lag(ts) OVER w IS NULL
               OR CAST(epoch_us(ts) AS BIGINT)
                  - CAST(epoch_us(lag(ts) OVER w) AS BIGINT) > {GAP_US}
             THEN 1 ELSE 0 END AS new_s
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    s AS (SELECT user_id, ts, SUM(new_s) OVER (
            PARTITION BY user_id ORDER BY ts
            ROWS UNBOUNDED PRECEDING) AS session_id FROM o)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts) AS start_ts, MAX(ts) AS end_ts
    FROM s GROUP BY 1, 2""")
def session_windows_events(sf_dir: str):
    """Session windows (gap > 30 min) per user over the events log —
    sessions numbered 1.. per user, aggregated to (n_events, start, end)."""
    from ..stages.stream import session_windows_ds
    ds = read_table(sf_dir, "events", ["user_id", "ts"])
    return session_windows_ds(ds, "user_id", "ts", GAP_US)


@register("sliding_2h_1h_events", sql=f"""
    WITH base AS (SELECT event_type,
                         CAST(epoch_us(ts) AS BIGINT) // {US_PER_HOUR} AS h
                  FROM events),
    expanded AS (SELECT event_type, h AS w FROM base
                 UNION ALL SELECT event_type, h - 1 AS w FROM base)
    SELECT event_type, w AS window_start_hour,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM expanded GROUP BY 1, 2""")
def sliding_2h_1h_events(sf_dir: str):
    """Sliding windows (width 2 h, slide 1 h): each event replicates into
    the two windows covering it (exact integer window ids), then the
    pre-aggregated count path — the overlapping-window operator."""
    import numpy as np

    from ..stages.shuffle import partial_group_counts
    from ..stages.stream import tumbling_window_key

    ds = read_table(sf_dir, "events", ["event_type", "ts"])

    def expand(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        h = tumbling_window_key(ts.astype(np.int64), US_PER_HOUR)
        et = t["event_type"]
        return pa.table({
            "event_type": pa.concat_arrays(
                [et.combine_chunks(), et.combine_chunks()]),
            "window_start_hour": np.concatenate([h, h - 1]),
        })

    out = partial_group_counts(ds.map_batches(expand, batch_format="pyarrow"),
                               ["event_type", "window_start_hour"])
    return out


@register("event_session_join", sql=f"""
    WITH o AS (SELECT user_id, ts,
        CASE WHEN lag(ts) OVER w IS NULL
               OR CAST(epoch_us(ts) AS BIGINT)
                  - CAST(epoch_us(lag(ts) OVER w) AS BIGINT) > {GAP_US}
             THEN 1 ELSE 0 END AS new_s
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    sids AS (SELECT user_id, ts, SUM(new_s) OVER (
            PARTITION BY user_id ORDER BY ts
            ROWS UNBOUNDED PRECEDING) AS session_id FROM o),
    s AS (SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                 MIN(ts) AS start_ts, MAX(ts) AS end_ts
          FROM sids GROUP BY 1, 2)
    SELECT e.event_id, e.user_id, e.ts, s.session_id
    FROM events e JOIN s
      ON e.user_id = s.user_id
     AND e.ts BETWEEN s.start_ts AND s.end_ts""")
def event_session_join(sf_dir: str):
    """Range (interval) join: every event matched to its covering session
    window — sessions computed by the engine's session operator, then one
    hash shuffle co-locates events with their user's intervals and a
    vectorized searchsorted assigns the covering interval (disjoint-
    intervals contract). Oracle: the SQL BETWEEN join on the same window
    definition."""
    from ..stages.stream import interval_join, session_windows_ds

    ev = read_table(sf_dir, "events", ["event_id", "user_id", "ts"])
    sessions = session_windows_ds(
        read_table(sf_dir, "events", ["user_id", "ts"]),
        "user_id", "ts", GAP_US)
    return interval_join(ev, sessions, key="user_id", ts_col="ts",
                         start_col="start_ts", end_col="end_ts")


@register("running_user_totals", sql="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents,
           CAST(row_number() OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS BIGINT) AS event_no
    FROM events""")
def running_user_totals(sf_dir: str):
    """Running (cumulative) aggregate per user: one key shuffle, per-user
    vectorized cumsum over the deterministic (ts, event_id) order. The
    accumulator is INTEGER CENTS (floor(value·100+0.5)) — float running
    sums are NOT portable across engines (DuckDB's window SUM reduces via
    a segment tree, a different addition order); integer sums are exact
    under any order."""
    import numpy as np

    from ..stages.shuffle import grouped_apply

    ds = read_table(sf_dir, "events",
                    ["event_id", "user_id", "ts", "value"])

    def bucket_fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort").reset_index(drop=True)
        cents = np.floor(df["value"].to_numpy(np.float64) * 100.0
                         + 0.5).astype(np.int64)
        g = df.groupby("user_id", sort=False)
        df["running_cents"] = pd.Series(cents).groupby(
            df["user_id"].to_numpy(), sort=False).cumsum()
        df["event_no"] = g.cumcount() + 1
        return df[["event_id", "user_id", "ts", "running_cents",
                   "event_no"]]

    return grouped_apply(ds, ["user_id"], bucket_fn)


VALUE_FLOOR = 200.0   # sparsifies the sets so the difference is non-empty


@register("viewers_never_purchased", sql=f"""
    SELECT user_id FROM events
    WHERE event_type = 'view' AND value > CAST('{VALUE_FLOOR}' AS DOUBLE)
    EXCEPT
    SELECT user_id FROM events
    WHERE event_type = 'purchase' AND value > CAST('{VALUE_FLOOR}' AS DOUBLE)""")
def viewers_never_purchased(sf_dir: str):
    """Set difference (EXCEPT): users with high-value views minus users
    with high-value purchases — per-batch partial distinct sets, one
    bucketed anti-join on the key hash; the wide input never shuffles
    (only distinct keys do)."""
    import pyarrow.compute as pc

    from ..stages.shuffle import grouped_apply

    ds = read_table(sf_dir, "events", ["user_id", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_in(t["event_type"],
                     value_set=pa.array(["view", "purchase"])),
            pc.greater(t["value"], VALUE_FLOOR))
        t = t.filter(keep).select(["user_id", "event_type"])
        return t.group_by(["user_id", "event_type"]).aggregate([])

    dist = ds.map_batches(partial, batch_format="pyarrow")

    def bucket_fn(df: pd.DataFrame) -> pd.DataFrame:
        viewers = set(df[df["event_type"] == "view"]["user_id"])
        buyers = set(df[df["event_type"] == "purchase"]["user_id"])
        out = sorted(viewers - buyers)
        return pd.DataFrame({"user_id": pd.array(out, dtype="int64")})

    return grouped_apply(dist, ["user_id"], bucket_fn)


@register("event_sliding_window_join", sql=f"""
    WITH w AS (SELECT DISTINCT event_type,
                      CAST(epoch_us(ts) AS BIGINT) // {US_PER_HOUR} AS h
               FROM events),
    wins AS (SELECT event_type, h AS win_start_hour FROM w
             UNION SELECT event_type, h - 1 AS win_start_hour FROM w),
    occupied AS (SELECT DISTINCT event_type,
                        CAST(epoch_us(ts) AS BIGINT) // {US_PER_HOUR} AS h
                 FROM events)
    SELECT e.event_id, e.event_type,
           ws.win_start_hour
    FROM events e JOIN wins ws
      ON e.event_type = ws.event_type
     AND CAST(epoch_us(e.ts) AS BIGINT) // {US_PER_HOUR}
         IN (ws.win_start_hour, ws.win_start_hour + 1)""")
def event_sliding_window_join(sf_dir: str):
    """OVERLAPPING range join: every event joined to BOTH 2h/1h sliding
    windows covering it — interval_join_all (bin replication, per-bucket
    merge + range filter), with the window set derived from the data. The
    oracle enumerates window membership arithmetically."""
    import numpy as np

    from ..stages.shuffle import grouped_apply
    from ..stages.stream import interval_join_all, tumbling_window_key

    ev = read_table(sf_dir, "events", ["event_id", "event_type", "ts"])

    # window table: one row per (event_type, win_start_hour) with real
    # timestamp bounds [start, end] (end inclusive = 2h - 1µs)
    def wins(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        h = tumbling_window_key(ts.astype(np.int64), US_PER_HOUR)
        et = t["event_type"]
        return pa.table({
            "event_type": pa.concat_arrays([et.combine_chunks()] * 2),
            "win_start_hour": np.concatenate([h, h - 1])})

    w = ev.map_batches(wins, batch_format="pyarrow")
    w = grouped_apply(w, ["event_type", "win_start_hour"],
                      lambda df: df.drop_duplicates())

    def bounds(df: pd.DataFrame) -> pd.DataFrame:
        s = df["win_start_hour"].to_numpy("int64") * US_PER_HOUR
        df = df.copy()
        df["win_start"] = pd.to_datetime(s, unit="us")
        df["win_end"] = pd.to_datetime(s + 2 * US_PER_HOUR - 1, unit="us")
        return df

    w = w.map_batches(bounds, batch_format="pandas")
    out = interval_join_all(ev, w, key="event_type", ts_col="ts",
                            start_col="win_start", end_col="win_end",
                            id_cols=("win_start_hour",))
    return out.map_batches(
        lambda t: t.select(["event_id", "event_type", "win_start_hour"]),
        batch_format="pyarrow")


# ------------------------------------------------------------ funnel
FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_W_US = 6 * US_PER_HOUR      # max gap between consecutive steps


@register("funnel_conversion", sql=f"""
    WITH e AS (SELECT user_id, event_type,
                      CAST(epoch_us(ts) AS BIGINT) AS t FROM events),
    s1 AS (SELECT user_id, MIN(t) AS t1 FROM e
           WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY 1),
    s2 AS (SELECT e.user_id, MIN(e.t) AS t2 FROM e JOIN s1 USING (user_id)
           WHERE e.event_type = '{FUNNEL_STEPS[1]}'
             AND e.t > s1.t1 AND e.t <= s1.t1 + {FUNNEL_W_US}
           GROUP BY 1),
    s3 AS (SELECT e.user_id, MIN(e.t) AS t3 FROM e JOIN s2 USING (user_id)
           WHERE e.event_type = '{FUNNEL_STEPS[2]}'
             AND e.t > s2.t2 AND e.t <= s2.t2 + {FUNNEL_W_US}
           GROUP BY 1)
    SELECT CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_step1,
           CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n_step2,
           CAST((SELECT COUNT(*) FROM s3) AS BIGINT) AS n_step3""")
def funnel_conversion(sf_dir: str):
    """Funnel analysis (view → click → purchase): per user the GREEDY
    earliest chain — t1 = first view, t2 = first later click within the
    gap window, t3 = first later purchase within the window of t2 —
    counted per completed step. ONE shuffle keyed by user (grouped
    scan; events of one user sort locally, epoch-µs integers end to
    end), then a 3-int global sum. The greedy-first semantics make the
    result order-deterministic on both sides."""
    import pyarrow.compute as pc

    from ..stages.shuffle import grouped_apply

    ev = read_table(sf_dir, "events", ["user_id", "event_type", "ts"])

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "event_type": t["event_type"],
            "t": pc.cast(t["ts"], pa.int64())})

    ds = ev.map_batches(to_us, batch_format="pyarrow")

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, g in df.groupby("user_id", sort=False):
            et = g["event_type"].to_numpy()
            t = g["t"].to_numpy(np.int64)
            steps = [0, 0, 0]
            tv = t[et == FUNNEL_STEPS[0]]
            if len(tv):
                steps[0] = 1
                t1 = tv.min()
                tc = t[(et == FUNNEL_STEPS[1]) & (t > t1)
                       & (t <= t1 + FUNNEL_W_US)]
                if len(tc):
                    steps[1] = 1
                    t2 = tc.min()
                    tp = t[(et == FUNNEL_STEPS[2]) & (t > t2)
                           & (t <= t2 + FUNNEL_W_US)]
                    if len(tp):
                        steps[2] = 1
            rows.append(steps)
        a = (np.asarray(rows, dtype=np.int64).sum(axis=0)
             if rows else np.zeros(3, np.int64))
        return pd.DataFrame({"s1": [a[0]], "s2": [a[1]], "s3": [a[2]]})

    partials = grouped_apply(ds, ["user_id"], per_user)
    agg = partials.aggregate(Sum("s1", alias_name="n_step1"),
                             Sum("s2", alias_name="n_step2"),
                             Sum("s3", alias_name="n_step3"))
    return pd.DataFrame({
        "n_step1": np.array([agg["n_step1"]], np.int64),
        "n_step2": np.array([agg["n_step2"]], np.int64),
        "n_step3": np.array([agg["n_step3"]], np.int64)})


# ------------------------------------------------------- snapshot diff (CDC)
@register("snapshot_diff_events", sql="""
    WITH o AS (SELECT event_id, value FROM events WHERE event_id % 7 <> 0),
    n AS (SELECT event_id,
                 CASE WHEN event_id % 5 = 0 THEN value + 1.0 ELSE value END
                     AS value
          FROM events WHERE event_id % 11 <> 0)
    SELECT COALESCE(o.event_id, n.event_id) AS event_id,
           CASE WHEN o.event_id IS NULL THEN 'insert'
                WHEN n.event_id IS NULL THEN 'delete'
                ELSE 'update' END AS op,
           o.value AS value_old, n.value AS value_new
    FROM o FULL OUTER JOIN n ON o.event_id = n.event_id
    WHERE o.event_id IS NULL OR n.event_id IS NULL OR o.value <> n.value""")
def snapshot_diff_events(sf_dir: str):
    """Change-data-capture: diff two table snapshots into insert / delete /
    update rows — the incremental-sync primitive (and the engine's FULL
    OUTER join certification: hash_join(how="outer") with null sides in
    BOTH directions). Snapshots are deterministic views of the events
    table (old drops id%7==0, new drops id%11==0 and bumps value on
    id%5==0); unchanged rows are suppressed inside the bucketed join, so
    only the changed slice leaves the shuffle."""
    import pyarrow.compute as pc

    from ..stages.join import hash_join

    ev = read_table(sf_dir, "events", ["event_id", "value"])

    def mk_old(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        m = (eid % 7) != 0
        return pa.table({"event_id": pa.array(eid[m]),
                         "value_old": pa.array(
                             t["value"].to_numpy(
                                 zero_copy_only=False)[m])})

    def mk_new(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        m = (eid % 11) != 0
        v = np.where((eid % 5) == 0, v + np.float64(1.0), v)
        return pa.table({"event_id": pa.array(eid[m]),
                         "value_new": pa.array(v[m])})

    old = ev.map_batches(mk_old, batch_format="pyarrow")
    new = ev.map_batches(mk_new, batch_format="pyarrow")
    joined = hash_join(old, new, on=["event_id"], how="outer")

    def classify(t: pa.Table) -> pa.Table:
        vo, vn = t["value_old"], t["value_new"]
        miss_o = pc.is_null(vo).to_numpy(zero_copy_only=False)
        miss_n = pc.is_null(vn).to_numpy(zero_copy_only=False)
        vov = vo.to_numpy(zero_copy_only=False)
        vnv = vn.to_numpy(zero_copy_only=False)
        changed = miss_o | miss_n | (vov != vnv)
        op = np.where(miss_o, "insert",
                      np.where(miss_n, "delete", "update"))
        out = pa.table({"event_id": pc.cast(t["event_id"], pa.int64()),
                        "op": pa.array(op.astype(object), pa.string()),
                        "value_old": vo, "value_new": vn})
        return out.filter(pa.array(changed))

    return joined.map_batches(classify, batch_format="pyarrow")


# ------------------------------------------------------- cohort retention
US_PER_DAY = 24 * US_PER_HOUR
COHORT_T0_US = 1_704_067_200_000_000     # 2024-01-01T00:00Z


@register("cohort_retention", sql=f"""
    WITH e AS (SELECT user_id,
                      (CAST(epoch_us(ts) AS BIGINT) - {COHORT_T0_US})
                          // {US_PER_DAY} AS day FROM events),
    f AS (SELECT user_id, MIN(day) AS cohort FROM e GROUP BY 1),
    a AS (SELECT DISTINCT e.user_id, f.cohort, e.day - f.cohort AS age
          FROM e JOIN f USING (user_id))
    SELECT cohort AS cohort_day, age AS age_days,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM a GROUP BY 1, 2""")
def cohort_retention(sf_dir: str):
    """Cohort retention matrix: users grouped by first-seen day, counted
    on each later active day (age = day − cohort). Per-batch distinct
    (user, day) partials shrink the log before ONE user-keyed shuffle in
    which each user's bucket yields its cohort (min day) AND its ages in
    the same pass — no separate first-seen join; a tiny (cohort, age)
    groupby finishes."""
    import pyarrow.compute as pc

    from ..stages.shuffle import grouped_apply, partial_group_counts

    ev = read_table(sf_dir, "events", ["user_id", "ts"])

    def to_day(t: pa.Table) -> pa.Table:
        d = (pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
             - COHORT_T0_US) // US_PER_DAY
        return pa.table({"user_id": pc.cast(t["user_id"], pa.int64()),
                         "day": pa.array(d)})

    def ages(df: pd.DataFrame) -> pd.DataFrame:
        # all rows of a user co-locate here, so the (user, day) dedup can
        # happen in-bucket — no separate distinct shuffle
        df = df.drop_duplicates(["user_id", "day"])
        g = df.groupby("user_id")["day"]
        cohort = g.transform("min")
        return pd.DataFrame({
            "cohort_day": cohort.astype("int64"),
            "age_days": (df["day"] - cohort).astype("int64")})

    rows = grouped_apply(ev.map_batches(to_day, batch_format="pyarrow"),
                         ["user_id"], ages)
    agg = partial_group_counts(rows, ["cohort_day", "age_days"],
                               count_col="n_users")
    return agg.map_batches(
        lambda t: t.select(["cohort_day", "age_days", "n_users"]),
        batch_format="pyarrow")


# ------------------------------------------------- trailing window frame
TRAIL_N = 4


@register("trailing_user_values", sql=f"""
    WITH q AS (SELECT event_id, user_id, ts,
                      CAST(floor(value * 100 + 0.5) AS BIGINT) AS q
               FROM events)
    SELECT event_id, user_id,
           CAST(SUM(q) OVER w AS BIGINT) AS trail_q,
           CAST(COUNT(*) OVER w AS BIGINT) AS trail_n
    FROM q
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN {TRAIL_N - 1} PRECEDING AND CURRENT ROW)""")
def trailing_user_values(sf_dir: str):
    """Bounded window FRAME aggregate (the ROWS BETWEEN sibling of the
    cumulative `running_user_totals`): per user ordered by time, the
    trailing-{TRAIL_N}-row sum of cent-quantized values plus the frame
    row count. ONE user-keyed shuffle; inside each bucket the sliding sum
    is cumsum-minus-shifted-cumsum (vectorized, segment-aware), integers
    end to end."""
    import pyarrow.compute as pc

    from ..stages.shuffle import grouped_apply

    ev = read_table(sf_dir, "events",
                    ["event_id", "user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "t": pc.cast(t["ts"], pa.int64()),
            "q": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64))})

    ds = ev.map_batches(prep, batch_format="pyarrow")

    def trail(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "t", "event_id"],
                            kind="mergesort").reset_index(drop=True)
        u = df["user_id"].to_numpy(np.int64)
        q = df["q"].to_numpy(np.int64)
        n = len(df)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = u[1:] != u[:-1]
        pos = np.arange(n, dtype=np.int64)
        start_idx = np.maximum.accumulate(np.where(new_key, pos, 0))
        rank = pos - start_idx                     # 0-based row in its key
        lo = np.maximum(rank - (TRAIL_N - 1), 0)   # frame start (in-key)
        cs = np.concatenate([[0], np.cumsum(q)])
        frame_from = start_idx + lo
        trail_q = cs[pos + 1] - cs[frame_from]
        trail_n = pos + 1 - frame_from
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "user_id": df["user_id"].astype("int64"),
            "trail_q": trail_q.astype("int64"),
            "trail_n": trail_n.astype("int64")})

    return grouped_apply(ds, ["user_id"], trail)


# -------------------------------------------------- JSON property extract
@register("props_json_stats", sql="""
    WITH j AS (SELECT event_type,
                      CAST(json_extract_string(props, '$.k') AS BIGINT)
                          AS k
               FROM events)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(MIN(k) AS BIGINT) AS min_k, CAST(MAX(k) AS BIGINT) AS max_k
    FROM j GROUP BY 1""")
def props_json_stats(sf_dir: str):
    """Semi-structured column parsing: extract the integer property from
    the JSON `props` column (vectorized Arrow RE2 — the same extraction
    DuckDB does with json_extract_string) and aggregate per event type.
    Per-batch parse + partial moments; only tiny partials shuffle."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Max, Min, Sum

    ev = read_table(sf_dir, "events", ["event_type", "props"])

    def parse(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(pc.cast(t["props"], pa.string()),
                              r'"k": (?P<v>\d+)')
        k = pc.cast(pc.struct_field(ex, "v"), pa.int64())
        return pa.table({"event_type": t["event_type"], "k": k})

    agg = (ev.map_batches(parse, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("event_type").aggregate(
               Count(alias_name="n"), Sum("k", alias_name="sum_k"),
               Min("k", alias_name="min_k"), Max("k", alias_name="max_k")))
    return agg.map_batches(
        lambda t: t.rename_columns(["event_type", "n", "sum_k",
                                    "min_k", "max_k"]),
        batch_format="pyarrow")


# ------------------------------------------------ integer z-score outliers
OUTLIER_Z = 3


@register("event_value_outliers", sql=f"""
    WITH q AS (SELECT event_type,
                      CAST(floor(value * 100 + 0.5) AS BIGINT) AS q
               FROM events),
    m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(q) AS BIGINT) AS s,
                 CAST(SUM(q * q) AS BIGINT) AS s2
          FROM q GROUP BY 1)
    SELECT m.event_type, m.n,
           CAST(SUM(CASE WHEN (m.n * q.q - m.s) * (m.n * q.q - m.s)
                              > {OUTLIER_Z * OUTLIER_Z}
                                * (m.n * m.s2 - m.s * m.s)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM q JOIN m USING (event_type) GROUP BY 1, 2""")
def event_value_outliers(sf_dir: str):
    """Anomaly detection: per event type, count values more than Z=3
    standard deviations from the type mean — with the SAME integer
    centering trick as Moran's I ((n·q − S)² > Z²·(n·Σq² − S²), cent-
    quantized), so the z-test is exact int64 and never divides. Two
    passes: per-batch partial moments → a broadcast dict of per-type
    (n, S, Σq²) → a vectorized per-batch outlier count. Int64-safe while
    n·q_max < 3e9 (document-scale guard; the moments themselves are
    per-type scalars and could widen to Python ints if ever needed)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    ev = read_table(sf_dir, "events", ["event_type", "value"])

    def quant(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "event_type": t["event_type"],
            "q": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64))})

    # LAZY on purpose: the quantized projection is the SAME width as the
    # pruned 2-column source scan, so re-executing the cheap scan+quantize
    # for each of the two passes costs less I/O than any checkpoint
    # medium (spill would write a same-sized table and read it twice)
    qd = ev.map_batches(quant, batch_format="pyarrow")

    def moments(t: pa.Table) -> pa.Table:
        q = t["q"].to_numpy(zero_copy_only=False)
        et = t["event_type"]
        tt = pa.table({"event_type": et, "one": np.ones(len(q), np.int64),
                       "s": q, "s2": q * q})
        g = tt.group_by(["event_type"]).aggregate(
            [("one", "sum"), ("s", "sum"), ("s2", "sum")])
        return g.rename_columns(["event_type", "n", "s", "s2"])

    agg = (qd.map_batches(moments, batch_format="pyarrow")
           .groupby("event_type").aggregate(
               Sum("n", alias_name="n"), Sum("s", alias_name="s"),
               Sum("s2", alias_name="s2"))).to_pandas()
    mom = {r["event_type"]: (int(r["n"]), int(r["s"]), int(r["s2"]))
           for _, r in agg.iterrows()}
    mom_ref = ray.put(mom)

    def count_outliers(t: pa.Table) -> pa.Table:
        mm = ray.get(mom_ref)
        q = t["q"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(
            t["event_type"].to_numpy(zero_copy_only=False),
            return_inverse=True)
        ns = np.array([mm[e][0] for e in uniq], np.int64)[inv]
        ss = np.array([mm[e][1] for e in uniq], np.int64)[inv]
        s2 = np.array([mm[e][2] for e in uniq], np.int64)[inv]
        lhs = (ns * q - ss)
        out = (lhs * lhs > OUTLIER_Z * OUTLIER_Z
               * (ns * s2 - ss * ss)).astype(np.int64)
        tt = pa.table({"event_type": t["event_type"], "o": out})
        g = tt.group_by(["event_type"]).aggregate([("o", "sum")])
        return g.rename_columns(["event_type", "n_outliers"])

    res = (qd.map_batches(count_outliers, batch_format="pyarrow")
           .groupby("event_type").aggregate(
               Sum("n_outliers", alias_name="n_outliers")))

    def finish(t: pa.Table) -> pa.Table:
        mm = ray.get(mom_ref)
        et = t["event_type"].to_pylist()
        n = np.array([mm[e][0] for e in et], np.int64)
        return pa.table({"event_type": t["event_type"],
                         "n": pa.array(n),
                         "n_outliers": pc.cast(t["n_outliers"],
                                               pa.int64())})

    return res.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------- grouping-sets cube
@register("event_rollup_cube", sql=f"""
    WITH q AS (SELECT event_type,
                      (CAST(epoch_us(ts) AS BIGINT) - {COHORT_T0_US})
                          // {US_PER_DAY} AS day,
                      CAST(floor(value * 100 + 0.5) AS BIGINT) AS q
               FROM events)
    SELECT COALESCE(event_type, '*') AS event_type,
           COALESCE(day, -1) AS day,
           CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(q) AS BIGINT) AS sum_q
    FROM q GROUP BY GROUPING SETS ((event_type), (day),
                                   (event_type, day))""")
def event_rollup_cube(sf_dir: str):
    """Multi-granularity aggregation (GROUP BY GROUPING SETS) in ONE scan:
    per type, per day, and per (type, day) counts + cent-quantized sums,
    with '*' / -1 as the rolled-up coordinate. Each batch emits partial
    rows for all three granularities (≤ 3·|groups| rows — the wide input
    never shuffles), one composite-key groupby finishes."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    ev = read_table(sf_dir, "events", ["event_type", "ts", "value"])

    def partials(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        day = ((pc.cast(t["ts"], pa.int64())
                .to_numpy(zero_copy_only=False) - COHORT_T0_US)
               // US_PER_DAY)
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        q = np.floor(v * 100.0 + 0.5).astype(np.int64)
        star = np.full(len(et), "*", dtype=object)
        neg = np.full(len(et), -1, np.int64)
        one = np.ones(len(et), np.int64)
        tt = pa.table({
            "event_type": pa.array(np.concatenate([et, star, et]),
                                   pa.string()),
            "day": pa.array(np.concatenate([neg, day, day])),
            "one": pa.array(np.concatenate([one, one, one])),
            "q": pa.array(np.concatenate([q, q, q]))})
        g = tt.group_by(["event_type", "day"]).aggregate(
            [("one", "sum"), ("q", "sum")])
        return g.rename_columns(["event_type", "day", "n", "sum_q"])

    agg = (ev.map_batches(partials, batch_format="pyarrow")
           .groupby(["event_type", "day"]).aggregate(
               Sum("n", alias_name="n"), Sum("sum_q", alias_name="sum_q")))
    return agg.map_batches(
        lambda t: t.select(["event_type", "day", "n", "sum_q"]),
        batch_format="pyarrow")


# ------------------------------------------------- percentile-rank transform
@register("value_percent_rank", sql="""
    WITH q AS (SELECT event_id, event_type,
                      CAST(floor(value * 100 + 0.5) AS BIGINT) AS q
               FROM events)
    SELECT event_id,
           CAST(rank() OVER (PARTITION BY event_type
                             ORDER BY q) - 1 AS BIGINT) AS rank_lt,
           CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
    FROM q""")
def value_percent_rank(sf_dir: str):
    """Rank / CDF transform (feature engineering): every event's rank
    among its type's cent-quantized values (rank_lt = number of STRICTLY
    smaller values — ties share the rank, SQL rank() semantics) plus the
    type count; percent_rank = rank_lt/(n−1) is the consumer's one
    division. ONE type-keyed shuffle, per-bucket vectorized sort +
    searchsorted."""
    import pyarrow.compute as pc

    from ..stages.shuffle import grouped_apply

    ev = read_table(sf_dir, "events", ["event_id", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "event_type": t["event_type"],
            "q": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64))})

    ds = ev.map_batches(prep, batch_format="pyarrow")

    def ranks(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, g in df.groupby("event_type", sort=False):
            q = g["q"].to_numpy(np.int64)
            sq = np.sort(q)
            rl = np.searchsorted(sq, q, side="left").astype(np.int64)
            out.append(pd.DataFrame({
                "event_id": g["event_id"].to_numpy(np.int64),
                "rank_lt": rl,
                "n": np.full(len(q), len(q), np.int64)}))
        return (pd.concat(out, ignore_index=True) if out
                else pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                   "rank_lt": pd.Series([], dtype="int64"),
                                   "n": pd.Series([], dtype="int64")}))

    return grouped_apply(ds, ["event_type"], ranks, num_buckets=8)


# --------------------------------------------- sequence-motif mining (CEP)
MOTIF_K = 25    # report the top-K 3-step behavioral motifs


@register("event_trigram_motifs", sql=f"""
    WITH e AS (SELECT user_id, event_type,
                      CAST(epoch_us(ts) AS BIGINT) AS t, event_id
               FROM events),
    s AS (SELECT user_id, event_type AS a,
                 lead(event_type, 1) OVER w AS b,
                 lead(event_type, 2) OVER w AS c
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
    g AS (SELECT a, b, c, CAST(COUNT(*) AS BIGINT) AS n FROM s
          WHERE c IS NOT NULL GROUP BY 1, 2, 3)
    SELECT a, b, c, n FROM g
    ORDER BY n DESC, a, b, c LIMIT {MOTIF_K}""")
def event_trigram_motifs(sf_dir: str):
    """Sequence-motif mining (complex-event-processing shape): the MOTIF_K
    most frequent CONTIGUOUS 3-step event-type sequences across per-user
    event streams — the frequent-subsequence primitive behind funnel
    discovery and session modelling (funnel_conversion checks ONE known
    pattern; this one finds which patterns exist). Deterministic stream
    order: (t, event_id) inside each user.

    Shape: ONE shuffle keyed by user (grouped scan), per-user vectorized
    shift comparison (no Python loop over events: the sorted type codes
    are compared as three strided views), per-bucket trigram PRE-COUNTS
    (cardinality ≤ |types|³, tiny) and one final sum + top-K — the event
    log itself never shuffles twice and nothing wide reaches the driver."""
    import pyarrow.compute as pc

    from ..stages.shuffle import grouped_apply

    ev = read_table(sf_dir, "events", ["event_id", "user_id",
                                       "event_type", "ts"])
    ds = ev.map_batches(
        lambda t: pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "event_type": pc.cast(t["event_type"], pa.string()),
            "t": pc.cast(t["ts"], pa.int64()),
            "event_id": pc.cast(t["event_id"], pa.int64())}),
        batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # encode types once per bucket; trigram key = base-|codes| int
        codes, uniq = pd.factorize(df["event_type"], sort=True)
        k = len(uniq)
        df = df.assign(_c=codes).sort_values(
            ["user_id", "t", "event_id"], kind="mergesort")
        c = df["_c"].to_numpy(np.int64)
        u = df["user_id"].to_numpy(np.int64)
        if len(c) < 3:
            return pd.DataFrame({"a": pd.Series([], dtype="object"),
                                 "b": pd.Series([], dtype="object"),
                                 "c": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        same = (u[:-2] == u[1:-1]) & (u[1:-1] == u[2:])
        tri = (c[:-2] * k + c[1:-1]) * k + c[2:]
        tri = tri[same]
        if not len(tri):
            return pd.DataFrame({"a": pd.Series([], dtype="object"),
                                 "b": pd.Series([], dtype="object"),
                                 "c": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        vals, cnts = np.unique(tri, return_counts=True)
        ua = uniq.to_numpy()
        return pd.DataFrame({"a": ua[vals // (k * k)],
                             "b": ua[(vals // k) % k],
                             "c": ua[vals % k],
                             "n": cnts.astype(np.int64)})

    partials = grouped_apply(ds, ["user_id"], per_bucket)
    agg = partials.groupby(["a", "b", "c"]).aggregate(
        Sum("n", alias_name="n"))
    df = agg.to_pandas().rename(columns=lambda s: s.replace("sum(n)", "n"))
    df.columns = ["a", "b", "c", "n"]
    df = df.sort_values(["n", "a", "b", "c"],
                        ascending=[False, True, True, True]).head(MOTIF_K)
    return df.reset_index(drop=True).astype({"n": "int64"})


# ------------------------------------------------- state-machine dwell time
@register("dwell_time_by_type", sql="""
    WITH e AS (SELECT user_id, event_type,
                      CAST(epoch_us(ts) AS BIGINT) AS t, event_id
               FROM events),
    l AS (SELECT user_id, event_type, t,
                 lead(t) OVER (PARTITION BY user_id
                               ORDER BY t, event_id) AS nxt
          FROM e)
    SELECT event_type,
           CAST(COUNT(nxt) AS BIGINT) AS n_intervals,
           CAST(COALESCE(SUM(nxt - t), 0) AS BIGINT) AS dwell_us
    FROM l GROUP BY 1""")
def dwell_time_by_type(sf_dir: str):
    """State-machine dwell time: treating each user's event stream as a
    state sequence (state = event_type until the next event), the total
    microseconds spent in each state and the interval count — the
    session-analytics / device-state metric. Exact integer epoch-µs;
    stream order (t, event_id) is total, so both sides see identical
    intervals.

    Shape: ONE shuffle keyed by user, per-bucket vectorized sort + shift
    (the user_travel_stats lag pattern), per-bucket ≤ |types|-row dwell
    partials, tiny final sum."""
    import pyarrow.compute as pc

    from ..stages.shuffle import grouped_apply

    ev = read_table(sf_dir, "events", ["event_id", "user_id",
                                       "event_type", "ts"])
    ds = ev.map_batches(
        lambda t: pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "event_type": pc.cast(t["event_type"], pa.string()),
            "t": pc.cast(t["ts"], pa.int64()),
            "event_id": pc.cast(t["event_id"], pa.int64())}),
        batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "t", "event_id"],
                            kind="mergesort")
        u = df["user_id"].to_numpy(np.int64)
        t = df["t"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        if len(t) == 0:
            return pd.DataFrame({
                "event_type": pd.Series([], dtype="object"),
                "n_intervals": pd.Series([], dtype="int64"),
                "dwell_us": pd.Series([], dtype="int64")})
        has_next = np.empty(len(t), bool)
        has_next[:-1] = u[:-1] == u[1:]
        has_next[-1] = False
        gap = np.zeros(len(t), np.int64)
        gap[:-1] = t[1:] - t[:-1]
        gap[~has_next] = 0
        out = pd.DataFrame({"event_type": et,
                            "n": has_next.astype(np.int64), "d": gap})
        g = out.groupby("event_type", as_index=False).agg(
            n_intervals=("n", "sum"), dwell_us=("d", "sum"))
        return g

    partials = grouped_apply(ds, ["user_id"], per_bucket)
    agg = partials.groupby("event_type").aggregate(
        Sum("n_intervals", alias_name="n_intervals"),
        Sum("dwell_us", alias_name="dwell_us"))
    return agg.map_batches(
        lambda t: t.rename_columns(["event_type", "n_intervals",
                                    "dwell_us"]),
        batch_format="pyarrow")


# ----------------------------------------- group-aware split leakage audit
SPLIT_VAL_PCT = 20     # h(user) % 100 < PCT → validation


def _group_split_sql() -> str:
    from ..stages.sampling import sql_id_hash
    h = sql_id_hash("user_id")
    return f"""
    WITH e AS (SELECT user_id,
                      CASE WHEN ({h}) % 100 < {SPLIT_VAL_PCT}
                           THEN 'val' ELSE 'train' END AS split
               FROM events),
    s AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS n_events,
                 CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
          FROM e GROUP BY 1),
    leak AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM (
               SELECT user_id FROM e GROUP BY user_id
               HAVING COUNT(DISTINCT split) > 1))
    SELECT split, n_events, n_users,
           (SELECT n FROM leak) AS n_leaked_users
    FROM s"""


@register("group_split_audit", sql=_group_split_sql)
def group_split_audit(sf_dir: str):
    """GROUP-aware train/validation split + leakage audit: events split by
    a deterministic hash of their USER (never the event id — the rule
    that prevents the same user's behavior from leaking across splits),
    with per-split event/user counts and a machine-checked leaked-user
    count (must be 0 by construction; the audit PROVES it rather than
    assuming it — the eval-integrity gate every training pipeline needs).

    Shape: the split tag is a pure row-local hash (no shuffle); per-batch
    partial (split, distinct-user, count) rows pre-aggregate before one
    tiny groupby; the leak check rides the same per-user partials."""
    import pyarrow.compute as pc

    from ..stages.sampling import id_hash
    from ..stages.shuffle import grouped_apply

    ev = read_table(sf_dir, "events", ["user_id"])

    def tag(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        val = (id_hash(uid) % 100) < SPLIT_VAL_PCT
        tt = pa.table({
            "user_id": pa.array(uid),
            "split": pa.array(np.where(val, "val", "train"))})
        return tt.group_by(["user_id", "split"]).aggregate(
            [([], "count_all")]).rename_columns(
            ["user_id", "split", "n"])

    partials = ev.map_batches(tag, batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "split"], as_index=False)["n"].sum()
        per_user = g.groupby("user_id").agg(
            n_splits=("split", "nunique"))
        leaked = int((per_user["n_splits"] > 1).sum())
        s = g.groupby("split", as_index=False).agg(
            n_events=("n", "sum"), n_users=("user_id", "nunique"))
        s["leaked"] = leaked
        return s

    b = grouped_apply(partials, ["user_id"], per_bucket)
    agg = b.groupby("split").aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("n_users", alias_name="n_users"),
        Sum("leaked", alias_name="n_leaked_users"))
    return agg.map_batches(
        lambda t: t.rename_columns(["split", "n_events", "n_users",
                                    "n_leaked_users"]),
        batch_format="pyarrow")


# ------------------------------------------------- rate-limit audit
RL_WINDOW_US = 3_600_000_000     # trailing 1 h window
RL_MAX = 4                       # allowed events per user per window


@register("rate_limit_violations", sql=f"""
    WITH e AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t
               FROM events),
    w AS (SELECT user_id,
                 COUNT(*) OVER (PARTITION BY user_id ORDER BY t
                                RANGE BETWEEN {RL_WINDOW_US} PRECEDING
                                          AND CURRENT ROW) AS in_window
          FROM e)
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN in_window > {RL_MAX} THEN 1 ELSE 0 END)
               AS BIGINT) AS n_violations
    FROM w GROUP BY 1""")
def rate_limit_violations(sf_dir: str):
    """Rate-limit audit (sliding-window counting, the API-quota / abuse
    screen): per user, how many events arrive when more than RL_MAX
    events (inclusive of self) fall in the trailing RL_WINDOW. RANGE
    window semantics: ties in t all see the full tied group (DuckDB RANGE
    CURRENT ROW includes peers) — the engine reproduces that with a
    right-searchsorted over the sorted timestamp array minus a
    left-searchsorted at t − window.

    Shape: ONE user-keyed shuffle; per-user vectorized two-searchsorted
    trailing count (no per-event loop); per-bucket (user, counts)
    partials only."""
    import pyarrow.compute as pc

    from ..stages.shuffle import grouped_apply

    ev = read_table(sf_dir, "events", ["user_id", "ts"])
    ds = ev.map_batches(
        lambda t: pa.table({"user_id": pc.cast(t["user_id"], pa.int64()),
                            "t": pc.cast(t["ts"], pa.int64())}),
        batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "t"], kind="mergesort")
        rows = []
        for uid, g in df.groupby("user_id", sort=False):
            t = g["t"].to_numpy(np.int64)
            hi = np.searchsorted(t, t, side="right")
            lo = np.searchsorted(t, t - RL_WINDOW_US, side="left")
            viol = int(((hi - lo) > RL_MAX).sum())
            rows.append((uid, len(t), viol))
        return pd.DataFrame(rows, columns=["user_id", "n_events",
                                           "n_violations"]) \
            .astype("int64") if rows else \
            pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                          "n_events": pd.Series([], dtype="int64"),
                          "n_violations": pd.Series([], dtype="int64")})

    return grouped_apply(ds, ["user_id"], per_bucket)


# --------------------------------------------------- burst detection
BURST_Z = 3      # hours with count > mean + 3σ (over occupied hours)


@register("burst_hours_by_type", sql=f"""
    WITH h AS (SELECT event_type,
                      CAST(epoch_us(ts) AS BIGINT) // {US_PER_HOUR} AS hr,
                      CAST(COUNT(*) AS BIGINT) AS n
               FROM events GROUP BY 1, 2),
    m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k,
                 CAST(SUM(n) AS BIGINT) AS s,
                 CAST(SUM(n * n) AS BIGINT) AS s2
          FROM h GROUP BY 1)
    SELECT m.event_type, m.k AS n_hours,
           CAST(SUM(CASE WHEN h.n * m.k > m.s
                          AND (h.n * m.k - m.s) * (h.n * m.k - m.s)
                              > {BURST_Z * BURST_Z}
                                * (m.k * m.s2 - m.s * m.s)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_burst_hours
    FROM h JOIN m USING (event_type) GROUP BY 1, 2""")
def burst_hours_by_type(sf_dir: str):
    """Burst detection over the hourly rate series: per event type, count
    the occupied hours whose event count exceeds mean + Z·σ of that
    type's hourly counts — the traffic-spike / incident screen, at the
    BUCKET level rather than the row level (the aggregate sibling of
    `event_value_outliers`). The z-test runs on the integer-centered
    form (n·k − S)² > Z²·(k·Σn² − S²) with the one-sided n·k > S guard,
    so it is exact int64 and never divides or roots.

    Shape: per-batch partial (type, hour) counts → one small groupby
    (|types|·|hours| rows); moments per type are a ≤ |types|-row
    broadcast; the flag pass re-scans only the hourly count table."""
    from ..stages.shuffle import partial_group_counts

    ev = read_table(sf_dir, "events", ["event_type", "ts"])
    hrs = ev.map_batches(
        lambda t: pa.table({
            "event_type": t["event_type"],
            "hr": pa.array(t["ts"].to_numpy(zero_copy_only=False)
                           .astype(np.int64) // US_PER_HOUR)}),
        batch_format="pyarrow")
    hcnt = partial_group_counts(hrs, ["event_type", "hr"],
                                count_col="n").materialize()

    mom = hcnt.to_pandas().groupby("event_type").agg(
        k=("n", "size"), s=("n", "sum"),
        s2=("n", lambda v: int((v.astype(np.int64) ** 2).sum())))
    mref = ray.put({et: (int(r.k), int(r.s), int(r.s2))
                    for et, r in mom.iterrows()})

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        mm = ray.get(mref)
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            k, s, s2 = mm[et]
            n = g["n"].to_numpy(np.int64)
            c = n * k - s
            burst = (c > 0) & (c * c > BURST_Z * BURST_Z * (k * s2 - s * s))
            rows.append((et, k, int(burst.sum())))
        return pd.DataFrame(rows, columns=["event_type", "n_hours",
                                           "n_burst_hours"]) if rows else \
            pd.DataFrame({"event_type": pd.Series([], dtype="object"),
                          "n_hours": pd.Series([], dtype="int64"),
                          "n_burst_hours": pd.Series([], dtype="int64")})

    partial = hcnt.map_batches(flag, batch_format="pandas")
    agg = partial.groupby("event_type").aggregate(
        Sum("n_burst_hours", alias_name="n_burst_hours"),
        Max("n_hours", alias_name="n_hours"))
    return agg.map_batches(
        lambda t: t.select(["event_type", "n_hours", "n_burst_hours"]),
        batch_format="pyarrow")


# ------------------------------------------- gap imputation (LOCF ffill)
FFILL_MASK_MOD = 13      # event_id % MOD == 0 → value treated as missing


@register("ffill_event_values", sql=f"""
    WITH e AS (SELECT user_id, event_type, event_id,
                      CAST(epoch_us(ts) AS BIGINT) AS t,
                      CASE WHEN event_id % {FFILL_MASK_MOD} = 0 THEN NULL
                           ELSE value END AS v
               FROM events),
    f AS (SELECT user_id, event_type,
                 last_value(v IGNORE NULLS) OVER (
                     PARTITION BY user_id ORDER BY t, event_id) AS fv
          FROM e)
    SELECT event_type,
           CAST(COUNT(fv) AS BIGINT) AS n_filled,
           CAST(COALESCE(SUM(CAST(floor(fv * 100 + 0.5) AS BIGINT)), 0)
               AS BIGINT) AS sum_q
    FROM f GROUP BY 1""")
def ffill_event_values(sf_dir: str):
    """Gap imputation by last-observation-carried-forward (the sensor /
    telemetry cleaning step): values at masked positions (a deterministic
    id rule stands in for real nulls) take the user's most recent earlier
    value; rows before any observation stay missing. Reported as exact
    per-type (filled-count, cent-quantized sum) — quantization AFTER the
    fill, so the carried doubles compare bit-for-bit.

    Shape: ONE user-keyed shuffle; per-user vectorized LOCF (boolean
    mask → np.maximum.accumulate over observation indices — no Python
    loop); per-bucket ≤|types|-row partials."""
    import pyarrow.compute as pc

    from ..stages.shuffle import grouped_apply

    ev = read_table(sf_dir, "events", ["event_id", "user_id",
                                       "event_type", "ts", "value"])
    ds = ev.map_batches(
        lambda t: pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "event_type": t["event_type"],
            "t": pc.cast(t["ts"], pa.int64()),
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "value": t["value"]}),
        batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "t", "event_id"],
                            kind="mergesort")
        u = df["user_id"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        v = df["value"].to_numpy(np.float64)
        obs = (eid % FFILL_MASK_MOD) != 0
        idx = np.where(obs, np.arange(len(v)), -1)
        # reset carry at user boundaries: maximum.accumulate per segment
        new_user = np.empty(len(v), bool)
        if len(v):
            new_user[0] = True
            new_user[1:] = u[1:] != u[:-1]
        seg = np.cumsum(new_user) - 1 if len(v) else np.empty(0, np.int64)
        # per-segment accumulate: offset trick — make idx strictly
        # segment-local by adding seg*BIG, accumulate, then undo
        BIG = np.int64(1) << 32
        carried = np.maximum.accumulate(
            np.where(obs, np.arange(len(v)) + seg * BIG, seg * BIG - 1))
        src = carried - seg * BIG
        filled = src >= 0
        fv = np.where(filled, v[np.clip(src, 0, None)], np.nan)
        q = np.where(filled,
                     np.floor(fv * 100.0 + 0.5), 0.0).astype(np.int64)
        out = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                            "n": filled.astype(np.int64), "s": q})
        return out.groupby("event_type", as_index=False).agg(
            n_filled=("n", "sum"), sum_q=("s", "sum"))

    partials = grouped_apply(ds, ["user_id"], per_bucket)
    agg = partials.groupby("event_type").aggregate(
        Sum("n_filled", alias_name="n_filled"),
        Sum("sum_q", alias_name="sum_q"))
    return agg.map_batches(
        lambda t: t.rename_columns(["event_type", "n_filled", "sum_q"]),
        batch_format="pyarrow")


# -------------------------------------------------- trailing active users
US_PER_DAY = 86_400_000_000
WAU_WINDOW = 7          # trailing 7 calendar days (inclusive)


@register("trailing_7d_active_users", sql=f"""
    WITH du AS (SELECT DISTINCT
                    CAST(epoch_us(ts) AS BIGINT) // {US_PER_DAY} AS day,
                    user_id
                FROM events),
    days AS (SELECT DISTINCT day FROM du)
    SELECT d.day,
           CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS active_users
    FROM days d JOIN du u
      ON u.day BETWEEN d.day - {WAU_WINDOW - 1} AND d.day
    GROUP BY 1""")
def trailing_7d_active_users(sf_dir: str):
    """Weekly-active-users (WAU) curve: for every OBSERVED day, the count
    of distinct users active in the trailing {WAU_WINDOW}-day window —
    the canonical engagement metric whose sliding DISTINCT makes it a
    shuffle-design exercise, not a window function.

    Shape: per-batch DISTINCT (day, user) partials shrink the log first;
    each distinct activity row then expands to the ≤{WAU_WINDOW} report
    days it supports (bounded replication — the interval-join bin trick
    in time); in-bucket (day, user) dedup + per-day partial counts. The
    raw log shuffles ONCE as its distinct day-user projection, never as
    rows."""
    import pyarrow.compute as pc

    from ..stages.shuffle import grouped_apply, partial_group_counts

    ev = read_table(sf_dir, "events", ["user_id", "ts"])

    def day_user(t: pa.Table) -> pa.Table:
        d = (t["ts"].to_numpy(zero_copy_only=False).astype(np.int64)
             // US_PER_DAY)
        tt = pa.table({"day": pa.array(d),
                       "user_id": pc.cast(t["user_id"], pa.int64())})
        return tt.group_by(["day", "user_id"]).aggregate([])

    # spill, don't pin: the distinct (day, user) projection is
    # users×days-proportional and feeds TWO consumers (the observed-day
    # extraction and the window expansion) — Parquet streams the
    # producer once without holding the table in the object store
    from ..state.spill import spill_checkpoint

    read_du = spill_checkpoint(
        ev.map_batches(day_user, batch_format="pyarrow"), "wau_du",
        schema=pa.schema([("day", pa.int64()), ("user_id", pa.int64())]))
    du = read_du()

    # observed report days (small: one row per distinct day)
    days = np.sort(np.unique(np.concatenate(
        [b["day"].to_numpy(zero_copy_only=False)
         for b in read_du(columns=["day"])
         .iter_batches(batch_format="pyarrow")])))
    days_ref = ray.put(days)

    def expand(t: pa.Table) -> pa.Table:
        dset = ray.get(days_ref)
        d = t["day"].to_numpy(zero_copy_only=False)
        u = t["user_id"].to_numpy(zero_copy_only=False)
        # report days supported by activity day d: observed days in
        # [d, d + W - 1]
        lo = np.searchsorted(dset, d, side="left")
        hi = np.searchsorted(dset, d + WAU_WINDOW - 1, side="right")
        m = hi - lo
        tot = int(m.sum())
        if tot == 0:
            return pa.table({"day": pa.array([], pa.int64()),
                             "user_id": pa.array([], pa.int64())})
        off = np.arange(tot) - np.repeat(np.cumsum(m) - m, m)
        rep = dset[np.repeat(lo, m) + off]
        out = pa.table({"day": pa.array(rep),
                        "user_id": pa.array(np.repeat(u, m))})
        return out.group_by(["day", "user_id"]).aggregate([])

    cover = du.map_batches(expand, batch_format="pyarrow")

    # a user may repeat across source buckets for the same report day →
    # dedup inside ONE shuffle keyed by (day, user) bucket hash, then
    # per-day partial counts summed
    dd = grouped_apply(cover, ["day", "user_id"],
                       lambda df: df.drop_duplicates(["day", "user_id"]))
    return partial_group_counts(dd, ["day"], count_col="active_users")


# ------------------------------------------------------------ TTL dedup

TTL_US = 3_600_000_000        # 1 h debounce window


@register("ttl_dedup_events", sql=f"""
    WITH e AS (SELECT event_id, user_id, event_type,
                      CAST(epoch_us(ts) AS BIGINT) AS t FROM events),
    l AS (SELECT *, lag(t) OVER (PARTITION BY user_id, event_type
                                 ORDER BY t, event_id) AS prev
          FROM e)
    SELECT event_id, user_id, event_type, t
    FROM l WHERE prev IS NULL OR t - prev > {TTL_US}""")
def ttl_dedup_events(sf_dir: str):
    """Debounce / TTL dedup — the streaming-state dedup every event
    ingester runs: within a (user, event_type) key, drop an event that
    arrives ≤ TTL after its predecessor. Exact integer epoch-µs; stream
    order (t, event_id) is total so both sides see identical
    predecessors.

    Shape: ONE key shuffle, per-bucket vectorized sort + shift — at
    scale this is the keyed-state operator with per-key last-seen
    watermarks; the bounded-log twin is the lag() window."""
    import pyarrow.compute as pc

    from ..stages.shuffle import grouped_apply

    ev = read_table(sf_dir, "events", ["event_id", "user_id",
                                       "event_type", "ts"])
    ds = ev.map_batches(
        lambda t: pa.table({
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "event_type": pc.cast(t["event_type"], pa.string()),
            "t": pc.cast(t["ts"], pa.int64())}),
        batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "event_type", "t", "event_id"],
                            kind="mergesort")
        u = df["user_id"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        t = df["t"].to_numpy(np.int64)
        keep = np.ones(len(df), dtype=bool)
        if len(df) > 1:
            same = (u[1:] == u[:-1]) & (et[1:] == et[:-1])
            keep[1:] = ~same | (t[1:] - t[:-1] > TTL_US)
        return df[keep]

    return grouped_apply(ds, ["user_id", "event_type"], per_bucket)


# --------------------------------------------- incremental view maintenance

IVM_RES = 5
IVM_INS_MOD = 10          # every 10th event spawns an insert...
IVM_INS_SHIFT = 10_000_000   # ...re-keyed into a different point
IVM_DEL_MOD = 17          # every 17th original event is deleted


def _ivm_sql() -> str:
    x, y = points.sql_xy("k")
    return f"""
    WITH logical AS (
        SELECT event_id AS k FROM events WHERE event_id % {IVM_DEL_MOD} <> 0
        UNION ALL
        SELECT event_id + {IVM_INS_SHIFT} FROM events
        WHERE event_id % {IVM_INS_MOD} = 0),
    pts AS (SELECT {cells.sql_cell(x, y, IVM_RES)} AS cell5 FROM logical)
    SELECT cell5, CAST(COUNT(*) AS BIGINT) AS n
    FROM pts GROUP BY 1"""


@register("ivm_cell_counts", sql=_ivm_sql)
def ivm_cell_counts(sf_dir: str):
    """Incremental view maintenance: the per-cell count view is updated by
    DELTA ALGEBRA — signed per-cell partial counts from the change batch
    (+1 per insert's cell, −1 per delete's cell) merged into the base
    aggregate, zero-count groups retired — never by rescanning the
    logical table the oracle recomputes from scratch. The change batch
    is deterministic (every {ins}th event inserts a re-keyed copy, every
    {del}th is deleted) so both sides see the same mutation stream.

    Scale shape: the merge shuffles only per-cell AGGREGATES (base view +
    delta partials), exactly the compaction step of a streaming
    materialized view."""
    from ray.data.aggregate import Sum

    from ..stages.shuffle import partial_group_counts

    key = f"cell{IVM_RES}"
    ev = read_table(sf_dir, "events", ["event_id"])

    base = partial_group_counts(
        ev.map_batches(derive_and_encode("event_id", (IVM_RES,)),
                       batch_format="pyarrow", zero_copy_batch=True),
        [key]).map_batches(
        lambda t: t.rename_columns(["cell5", "d"]), batch_format="pyarrow")

    def delta(t: pa.Table) -> pa.Table:
        k = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ins = k[k % IVM_INS_MOD == 0] + IVM_INS_SHIFT
        dele = k[k % IVM_DEL_MOD == 0]
        import pyarrow as _pa

        from ..functions import cells as _cells
        from ..functions import points as _points
        xi, yi = _points.derive_xy(ins)
        xd, yd = _points.derive_xy(dele)
        ci = _cells.encode(xi, yi, IVM_RES)
        cd = _cells.encode(xd, yd, IVM_RES)
        cell = np.concatenate([ci, cd])
        sign = np.concatenate([np.ones(len(ci), np.int64),
                               -np.ones(len(cd), np.int64)])
        df = pd.DataFrame({"cell5": cell, "d": sign})
        return _pa.Table.from_pandas(
            df.groupby("cell5", as_index=False).sum(), preserve_index=False)

    deltas = ev.map_batches(delta, batch_format="pyarrow",
                            zero_copy_batch=True)

    merged = base.union(deltas).groupby("cell5").aggregate(
        Sum("d", alias_name="n"))

    def finish(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["cell5", "n"])
        n = t["n"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(n > 0))

    return merged.map_batches(finish, batch_format="pyarrow")


# ------------------------------------------------- time-weighted integral

def _twa_sql() -> str:
    return """
    WITH e AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t,
                      CAST(round(value * 100) AS BIGINT) AS cents,
                      event_id
               FROM events),
    l AS (SELECT user_id, t, cents,
                 lead(t) OVER (PARTITION BY user_id
                               ORDER BY t, event_id) AS nxt
          FROM e)
    SELECT user_id,
           CAST(COUNT(nxt) AS BIGINT) AS n_intervals,
           CAST(COALESCE(SUM(nxt - t), 0) AS BIGINT) AS span_us,
           CAST(COALESCE(SUM(cents * (nxt - t)), 0) AS BIGINT)
               AS integral_cent_us
    FROM l GROUP BY user_id"""


@register("time_weighted_avg_user", sql=_twa_sql)
def time_weighted_avg_user(sf_dir: str):
    """Time-weighted average (sensor/billing semantics): per user, the
    step-function integral of value over the observed span — value holds
    until the next event, so the integral is Σ valueᵢ·(tᵢ₊₁−tᵢ). EXACT:
    the value column is fixed-point (2 decimals — verified corpus-wide),
    so cents × µs stays int64 (bound: span·max_cents ≈ 2.6e12 · 5e4 =
    1.3e17 ≪ 2⁶³); the consumer divides integral/span at any precision
    (the rational-output rule). ONE user shuffle, vectorized lag."""
    import pyarrow.compute as pc

    from ..stages.shuffle import grouped_apply

    ev = read_table(sf_dir, "events", ["event_id", "user_id", "ts",
                                       "value"])

    def conv(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "t": pc.cast(t["ts"], pa.int64()),
            "cents": pa.array(np.round(v * 100).astype(np.int64)),
            "event_id": pc.cast(t["event_id"], pa.int64())})

    ds = ev.map_batches(conv, batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "t", "event_id"], kind="mergesort")
        u = df["user_id"].to_numpy(np.int64)
        t = df["t"].to_numpy(np.int64)
        c = df["cents"].to_numpy(np.int64)
        n = len(df)
        has_next = np.zeros(n, bool)
        if n > 1:
            has_next[:-1] = u[:-1] == u[1:]
        gap = np.zeros(n, np.int64)
        if n > 1:
            gap[:-1] = t[1:] - t[:-1]
        gap[~has_next] = 0
        out = pd.DataFrame({
            "user_id": u, "n_intervals": has_next.astype(np.int64),
            "span_us": gap, "integral_cent_us": c * gap})
        return out.groupby("user_id", as_index=False).sum()

    return grouped_apply(ds, ["user_id"], per_bucket)


# ------------------------------------------------ inter-arrival histogram

IA_BUCKETS = 50           # power-of-2 µs buckets: [2^k, 2^(k+1))


def _ia_case() -> str:
    terms = " ".join(
        f"WHEN gap < {1 << (k + 1)} THEN {k}" for k in range(IA_BUCKETS))
    return f"CASE WHEN gap < 1 THEN -1 {terms} ELSE {IA_BUCKETS} END"


@register("interarrival_histogram", sql=lambda: f"""
    WITH e AS (SELECT user_id, event_type,
                      CAST(epoch_us(ts) AS BIGINT) AS t, event_id
               FROM events),
    l AS (SELECT event_type,
                 t - lag(t) OVER (PARTITION BY user_id, event_type
                                  ORDER BY t, event_id) AS gap
          FROM e),
    g AS (SELECT event_type, {_ia_case()} AS bucket
          FROM l WHERE gap IS NOT NULL)
    SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM g GROUP BY 1, 2""")
def interarrival_histogram(sf_dir: str):
    """Inter-arrival-time distribution per event type: log₂ histogram of
    consecutive gaps within each (user, type) stream — the burstiness /
    rate-model profile. Buckets are EXACT integer comparisons against
    powers of two (bucket k ⟺ gap ∈ [2ᵏ, 2ᵏ⁺¹)) — no float log; engine
    uses one ``searchsorted`` against the boundary table, twin uses the
    generated CASE ladder. One key shuffle, per-bucket lag, tiny
    (type × bucket) partials."""
    import pyarrow.compute as pc

    from ..stages.shuffle import grouped_apply

    ev = read_table(sf_dir, "events", ["event_id", "user_id",
                                       "event_type", "ts"])
    ds = ev.map_batches(
        lambda t: pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "event_type": pc.cast(t["event_type"], pa.string()),
            "t": pc.cast(t["ts"], pa.int64()),
            "event_id": pc.cast(t["event_id"], pa.int64())}),
        batch_format="pyarrow")

    bounds = np.array([1 << (k + 1) for k in range(IA_BUCKETS)],
                      dtype=np.int64)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "event_type", "t", "event_id"],
                            kind="mergesort")
        u = df["user_id"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        t = df["t"].to_numpy(np.int64)
        n = len(df)
        same = np.zeros(n, bool)
        if n > 1:
            same[1:] = (u[1:] == u[:-1]) & (et[1:] == et[:-1])
        gap = np.zeros(n, np.int64)
        if n > 1:
            gap[1:] = t[1:] - t[:-1]
        b = np.searchsorted(bounds, gap, side="right").astype(np.int64)
        b[gap < 1] = -1
        out = pd.DataFrame({"event_type": et[same], "bucket": b[same]})
        g = out.groupby(["event_type", "bucket"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    from ray.data.aggregate import Sum
    partials = grouped_apply(ds, ["user_id", "event_type"], per_bucket)
    agg = partials.groupby(["event_type", "bucket"]).aggregate(
        Sum("n", alias_name="n"))
    return agg.map_batches(
        lambda t: t.rename_columns(["event_type", "bucket", "n"]),
        batch_format="pyarrow")


# --------------------------------------------------- SLA percentile report

PCTS = (50, 95, 99)


@register("latency_percentiles_by_type", sql=f"""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           quantile_disc(value, 0.50) AS p50,
           quantile_disc(value, 0.95) AS p95,
           quantile_disc(value, 0.99) AS p99
    FROM events GROUP BY event_type""")
def latency_percentiles_by_type(sf_dir: str):
    """Per-type SLA report: exact DISCRETE p50/p95/p99 (the element at
    sorted index ⌈n·q⌉−1, matching quantile_disc) — selection, not
    interpolation, so the floats are hash-exact. One type-keyed shuffle;
    per-type vectorized sort + three index picks."""
    import pyarrow.compute as pc

    from ..stages.shuffle import grouped_apply

    ev = read_table(sf_dir, "events", ["event_type", "value"])
    ds = ev.map_batches(
        lambda t: pa.table({
            "event_type": pc.cast(t["event_type"], pa.string()),
            "value": pc.cast(t["value"], pa.float64())}),
        batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            v = np.sort(g["value"].to_numpy(np.float64))
            n = len(v)
            idx = [int(np.ceil(n * q / 100.0)) - 1 for q in PCTS]
            rows.append({"event_type": et, "n": np.int64(n),
                         "p50": v[idx[0]], "p95": v[idx[1]],
                         "p99": v[idx[2]]})
        return pd.DataFrame(rows)

    return grouped_apply(ds, ["event_type"], per_bucket, num_buckets=8)


# ------------------------------------------------------- seasonality matrix

US_PER_DAY = 86_400_000_000


@register("seasonality_matrix", sql=f"""
    WITH e AS (SELECT CAST(epoch_us(ts) AS BIGINT) AS t,
                      CAST(round(value * 100) AS BIGINT) AS cents
               FROM events)
    SELECT ((t // {US_PER_DAY}) + 4) % 7 AS dow,
           (t % {US_PER_DAY}) // {US_PER_HOUR} AS hod,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM e GROUP BY 1, 2""")
def seasonality_matrix(sf_dir: str):
    """Weekday × hour-of-day seasonality profile (counts + exact cent
    sums) — the 7×24 load matrix behind capacity planning. Day-of-week
    by pure epoch arithmetic ((days+4) % 7 — 1970-01-01 was a Thursday)
    so both sides share ONE definition, no calendar-function semantics.
    Per-batch partials to ≤168 rows; the log never shuffles."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    ev = read_table(sf_dir, "events", ["ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        tt = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.round(t["value"].to_numpy(zero_copy_only=False)
                         * 100).astype(np.int64)
        dow = ((tt // US_PER_DAY) + 4) % 7
        hod = (tt % US_PER_DAY) // US_PER_HOUR
        df = pd.DataFrame({"dow": dow, "hod": hod, "n": 1, "cents": cents})
        return pa.Table.from_pandas(
            df.groupby(["dow", "hod"], as_index=False).sum(),
            preserve_index=False)

    agg = ev.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby(["dow", "hod"]).aggregate(
            Sum("n", alias_name="n"), Sum("cents", alias_name="cents"))
    return agg.map_batches(
        lambda t: t.rename_columns(["dow", "hod", "n", "cents"]),
        batch_format="pyarrow")


# --------------------------------------------------- user acquisition curve

@register("user_acquisition_curve", sql=f"""
    WITH f AS (SELECT user_id,
                      MIN(CAST(epoch_us(ts) AS BIGINT) // {US_PER_DAY})
                          AS day FROM events GROUP BY user_id),
    d AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users FROM f
          GROUP BY day)
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT)
               AS cum_users
    FROM d""")
def user_acquisition_curve(sf_dir: str):
    """Cumulative-distinct curve: first-seen day per user → daily new
    users → running total (the acquisition/growth chart, and the general
    shape of any cumulative-DISTINCT metric: distinct-accumulation
    reduces to MIN-per-key + prefix sum — no per-day distinct sets).
    Per-batch per-user min partials, one tiny user groupby, then the
    two-pass distributed prefix sum over days."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Min
    from ..stages.scan import global_cumsum

    ev = read_table(sf_dir, "events", ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        u = pc.cast(t["user_id"], pa.int64()).to_numpy(
            zero_copy_only=False)
        d = (pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
             // US_PER_DAY)
        df = pd.DataFrame({"user_id": u, "day": d})
        return pa.Table.from_pandas(
            df.groupby("user_id", as_index=False).min(),
            preserve_index=False)

    first = ev.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .groupby("user_id").aggregate(Min("day", alias_name="day"))

    def day_one(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["user_id", "day"])
        return pa.table({"day": t["day"],
                         "one": pa.array(np.ones(len(t), np.int64))})

    days = first.map_batches(day_one, batch_format="pyarrow")
    run = global_cumsum(days, "day", "one", width=4,
                        out_col="cum_users")
    return run.map_batches(
        lambda t: t.rename_columns(["day", "new_users", "cum_users"]),
        batch_format="pyarrow")


@register("km_session_survival", sql=f"""
    WITH o AS (SELECT user_id, ts,
        CASE WHEN lag(ts) OVER w IS NULL
               OR CAST(epoch_us(ts) AS BIGINT)
                  - CAST(epoch_us(lag(ts) OVER w) AS BIGINT) > {GAP_US}
             THEN 1 ELSE 0 END AS new_s
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    s AS (SELECT user_id, ts, SUM(new_s) OVER (
            PARTITION BY user_id ORDER BY ts
            ROWS UNBOUNDED PRECEDING) AS session_id FROM o),
    g AS (SELECT user_id, session_id,
                 (CAST(epoch_us(MAX(ts)) AS BIGINT)
                  - CAST(epoch_us(MIN(ts)) AS BIGINT)) // 1000000 AS dur,
                 CAST(epoch_us(MAX(ts)) AS BIGINT) AS end_us
          FROM s GROUP BY 1, 2),
    mx AS (SELECT MAX(CAST(epoch_us(ts) AS BIGINT)) AS m FROM events),
    t AS (SELECT dur, CASE WHEN mx.m - end_us <= {GAP_US}
                           THEN 0 ELSE 1 END AS ev
          FROM g, mx),
    d AS (SELECT dur, CAST(SUM(ev) AS BIGINT) AS d FROM t
          GROUP BY 1 HAVING SUM(ev) > 0)
    SELECT d.dur AS t_seconds, d.d AS d_events,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM t
            WHERE t.dur >= d.dur) AS n_at_risk
    FROM d""")
def km_session_survival(sf_dir: str):
    """Kaplan-Meier survival input table over SESSION DURATIONS — the
    survival-analysis primitive (how long do user sessions live?): per
    distinct uncensored duration t, the event count d_t and the at-risk
    count n_t = sessions lasting ≥ t; the consumer forms
    Ŝ(t) = Π (1 − d/n) at any precision (the rational-output rule).
    Right-censoring is real, not decorative: a session whose last event
    is within the session gap of the log's end may still be open — it
    contributes to every n_t but never to d_t. Exact integers
    throughout (durations in whole seconds). Shape: sessions from the
    one-shuffle session machinery; per-batch (dur, censored) partials;
    the suffix cumsum for n_at_risk folds on the BOUNDED distinct-
    duration table (≤ #sessions rows; a data-scale duration axis would
    use stages/scan.global_cumsum descending — same math)."""
    import pandas as pd
    import pyarrow.compute as pc

    from ray.data.aggregate import Max as _Max
    from ..stages.shuffle import partial_group_counts
    from ..stages.stream import session_windows_ds

    ds = read_table(sf_dir, "events", ["user_id", "ts"])
    # two consumers (global max probe + the derive scan) of the
    # one-row-per-session table — input-proportional, so spill once to
    # Parquet instead of pinning in the object store (spill.py policy)
    from ..state.spill import spill_checkpoint
    read_sess = spill_checkpoint(
        session_windows_ds(ds, "user_id", "ts", GAP_US), "sess_windows",
        schema=pa.schema([("user_id", pa.int64()),
                          ("session_id", pa.int64()),
                          ("n_events", pa.int64()),
                          ("start_ts", pa.timestamp("us")),
                          ("end_ts", pa.timestamp("us"))]))
    sess = read_sess()

    mend = sess.aggregate(_Max("end_ts"))["max(end_ts)"]
    m_us = int(pd.Timestamp(mend).value // 1000)

    def derive(t: pa.Table) -> pa.Table:
        s_us = (pc.cast(t["start_ts"], pa.int64())
                .to_numpy(zero_copy_only=False))
        e_us = (pc.cast(t["end_ts"], pa.int64())
                .to_numpy(zero_copy_only=False))
        dur = (e_us - s_us) // 1_000_000
        ev = ((m_us - e_us) > GAP_US).astype(np.int64)
        return pa.table({"dur": pa.array(dur), "ev": pa.array(ev)})

    cnt = partial_group_counts(
        sess.map_batches(derive, batch_format="pyarrow"),
        ["dur", "ev"]).to_pandas()
    cnt = cnt.rename(columns=dict(zip(cnt.columns, ["dur", "ev", "n"])))
    # bounded fold: suffix counts over distinct durations
    tot = (cnt.groupby("dur", as_index=False)["n"].sum()
           .sort_values("dur", ascending=False))
    tot["n_at_risk"] = tot["n"].cumsum()
    risk = dict(zip(tot["dur"], tot["n_at_risk"]))
    d = (cnt[cnt["ev"] == 1].groupby("dur", as_index=False)["n"].sum()
         .rename(columns={"n": "d_events"}))
    d = d[d["d_events"] > 0].sort_values("dur")
    return pd.DataFrame({
        "t_seconds": d["dur"].to_numpy(np.int64),
        "d_events": d["d_events"].to_numpy(np.int64),
        "n_at_risk": np.array([risk[t] for t in d["dur"]], np.int64)})
