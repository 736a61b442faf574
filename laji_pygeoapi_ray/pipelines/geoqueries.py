"""Core geospatial queries: point derivation, cell (tile) assignment,
tile aggregation, and point-in-polygon region labelling.

Each query is a lazy Ray Data pipeline (read → map_batches → [groupby]) and
has an exact DuckDB oracle generated from the same constants. Reference
semantics reproduced: province/municipality labelling
(``compute_variables.py:227-228`` consumed columns), province-keyed
partitioning (``main.py:193-198``), tile rollups analogous to the per-table
``get_table_bbox`` / count / quality aggregates (``edit_db.py:140-260``).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..functions import cells, hexgrid, hilbert, points, s2
from ..sources.parquet import default_pool, fixed_pool, read_table
from ..functions.pip import sql_pip_assign
from ..stages import assign
from ..stages.derive import derive_and_encode
from ..state import fixtures
from .registry import register

RES = 7  # headline tile resolution (H3 res-7 analogue; SURVEY.md §1.4)


def _points_cte(table: str = "documents", key: str = "doc_id") -> str:
    x, y = points.sql_xy(key)
    return f"SELECT {key}, {x} AS x, {y} AS y FROM {table}"


def _docs_points(sf_dir: str, resolutions=(RES,)) -> "ray.data.Dataset":
    ds = read_table(sf_dir, "documents", ["doc_id"])
    return ds.map_batches(derive_and_encode("doc_id", tuple(resolutions)),
                          batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------- cell assign

@register("cell_assign", sql=lambda: (
    f"SELECT doc_id, x, y, {cells.sql_cell('x', 'y', RES)} AS cell7 "
    f"FROM ({_points_cte()})"))
def cell_assign(sf_dir: str):
    """doc_id → derived point + res-7 tile id (the minimum end-to-end slice,
    SURVEY.md §7.1)."""
    return _docs_points(sf_dir).select_columns(["doc_id", "x", "y", f"cell{RES}"])


# ---------------------------------------------------------------- tile agg

@register("tile_counts", sql=lambda: f"""
    WITH pts AS (SELECT d.doc_id, d.n_chars,
                        {cells.sql_cell('p.x', 'p.y', RES)} AS cell7
                 FROM documents d JOIN ({_points_cte()}) p USING (doc_id))
    SELECT cell7, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_chars
    FROM pts GROUP BY cell7""")
def tile_counts(sf_dir: str):
    """Vector→raster tile aggregation: per-res-7-cell count + payload stats
    (the reference's closest analogue: per-table count/extent rollups,
    ``edit_db.py:235-260``)."""
    ds = read_table(sf_dir, "documents", ["doc_id", "n_chars"])
    ds = ds.map_batches(derive_and_encode("doc_id", (RES,)),
                        batch_format="pyarrow", zero_copy_batch=True)
    agg = ds.groupby(f"cell{RES}").aggregate(
        Count(alias_name="n"), Sum("n_chars", alias_name="sum_chars"))

    def add_mean(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = t["sum_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        t = t.append_column("avg_chars", pa.array(s / n))
        return t.rename_columns(["cell7", "n", "sum_chars", "avg_chars"])

    return agg.map_batches(add_mean, batch_format="pyarrow")


@register("tile_bbox", sql=lambda: f"""
    WITH pts AS (SELECT doc_id, x, y, {cells.sql_cell('x', 'y', RES)} AS cell7
                 FROM ({_points_cte()}))
    SELECT cell7, MIN(x) AS min_x, MAX(x) AS max_x,
           MIN(y) AS min_y, MAX(y) AS max_y, COUNT(*) AS n
    FROM pts GROUP BY cell7""")
def tile_bbox(sf_dir: str):
    """Per-tile extent — the ``get_table_bbox`` / ``ST_Extent`` equivalent
    (``edit_db.py:140-158``) keyed by tile instead of table."""
    ds = _docs_points(sf_dir)
    return ds.groupby(f"cell{RES}").aggregate(
        Min("x", alias_name="min_x"), Max("x", alias_name="max_x"),
        Min("y", alias_name="min_y"), Max("y", alias_name="max_y"),
        Count(alias_name="n"),
    ).map_batches(lambda t: t.rename_columns(
        ["cell7", "min_x", "max_x", "min_y", "max_y", "n"]),
        batch_format="pyarrow")


# ---------------------------------------------------------------- PIP labels

def _pip_sql(layer_fn, with_names: bool) -> str:
    layer = layer_fn()
    return sql_pip_assign(
        _points_cte(), "doc_id",
        fixtures.edges_values_sql(layer),
        fixtures.names_values_sql(layer) if with_names else None)


@register("pip_province", sql=lambda: (
    _pip_sql(fixtures.province_layer, True)
    .replace("n.name AS name", "n.name AS province")))
def pip_province(sf_dir: str):
    """Point-in-polygon biogeographical-province label per record — the
    engine-computed stand-in for the warehouse-interpreted
    ``biogeographicalProvinceDisplayname`` (SURVEY.md §2.5)."""
    ds = _docs_points(sf_dir).map_batches(
        assign.PIPAssigner, batch_format="pyarrow", batch_size=16384,
        concurrency=default_pool(), num_cpus=1)
    return ds.select_columns(["doc_id", "province"])


@register("pip_municipality_ely", sql=lambda: f"""
    WITH assigned AS ({_pip_sql(fixtures.municipality_layer, True)}),
    ely AS (SELECT * FROM (VALUES {", ".join(
        f"('{m}', '{e}', '{v}')" for m, e, v in fixtures.MUNICIPALITY_ELY
    )} ) t(muni, ely_area, elinvoimakeskus))
    SELECT a.doc_id, a.name AS municipality, e.ely_area, e.elinvoimakeskus
    FROM assigned a LEFT JOIN ely e ON a.name = e.muni""")
def pip_municipality_ely(sf_dir: str):
    """Municipality PIP label + the broadcast municipality→ELY/Elinvoimakeskus
    chain (``compute_areas``, ``compute_variables.py:79-98``)."""
    ds = _docs_points(sf_dir).map_batches(
        assign.PIPAssigner, batch_format="pyarrow", batch_size=16384,
        concurrency=default_pool(), num_cpus=1)
    return ds.select_columns(["doc_id", "municipality", "ely_area", "elinvoimakeskus"])


@register("province_counts", sql=lambda: f"""
    WITH assigned AS ({_pip_sql(fixtures.province_layer, True)})
    SELECT name AS province, COUNT(*) AS n
    FROM assigned GROUP BY name""")
def province_counts(sf_dir: str):
    """Occurrence count per province — the engine's analogue of the
    per-province table row counts (``edit_db.py:235-260``; partitioning of
    ``main.py:193-198``). Also the skew witness: the Helsinki-cluster
    province holds ~30 % of rows."""
    ds = _docs_points(sf_dir).map_batches(
        assign.PIPAssigner, batch_format="pyarrow", batch_size=16384,
        concurrency=default_pool(), num_cpus=1)
    return ds.groupby("province").aggregate(Count(alias_name="n")).map_batches(
        lambda t: t.rename_columns(["province", "n"]), batch_format="pyarrow")

# ------------------------------------------------------------ lineitem scale

def _li_points_cte() -> str:
    x, y = points.sql_xy("l_orderkey * 8 + l_linenumber")
    return (f"SELECT l_orderkey * 8 + l_linenumber AS li_key, {x} AS x, "
            f"{y} AS y FROM lineitem")


def _li_ds(sf_dir: str):
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def keyed(t: pa.Table) -> pa.Table:
        k = pc.add(pc.multiply(t["l_orderkey"], pa.scalar(8, pa.int64())),
                   pc.cast(t["l_linenumber"], pa.int64()))
        return pa.table({"li_key": k})

    ds = ds.map_batches(keyed, batch_format="pyarrow")
    return ds.map_batches(derive_and_encode("li_key", (RES,)),
                          batch_format="pyarrow", zero_copy_batch=True)


@register("pip_lineitem_province_counts", sql=lambda: f"""
    WITH assigned AS ({sql_pip_assign(_li_points_cte(), "li_key",
                       fixtures.edges_values_sql(fixtures.province_layer()),
                       fixtures.names_values_sql(fixtures.province_layer()))})
    SELECT name AS province, COUNT(*) AS n FROM assigned GROUP BY name""")
def pip_lineitem_province_counts(sf_dir: str):
    """The headline spatial join at table scale: one derived point per
    lineitem row (600k at sf0.1), PIP-labelled against the 21 province
    polygons in the actor pool, counted per province. This is the bench's
    throughput pipeline."""
    from ..stages.shuffle import partial_group_counts
    ds = _li_ds(sf_dir).map_batches(
        assign.PIPAssigner, batch_format="pyarrow", batch_size=65536,
        concurrency=default_pool(), num_cpus=1)
    return partial_group_counts(ds, ["province"])


@register("hot_cells", sql=lambda: f"""
    WITH pts AS (SELECT {cells.sql_cell('x', 'y', RES)} AS cell7
                 FROM ({_points_cte()})),
    agg AS (SELECT cell7, COUNT(*) AS n FROM pts GROUP BY cell7)
    SELECT cell7, CAST(n AS BIGINT) AS n FROM agg
    WHERE CAST(n AS DOUBLE) > CAST('8.0' AS DOUBLE)
          * (SELECT CAST(SUM(n) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             FROM agg)""")
def hot_cells(sf_dir: str):
    """The skew-detection pre-pass (SURVEY.md §4 'Skew'): res-7 cells whose
    occurrence count exceeds 8× the mean occupied-cell load — these are the
    keys the salted two-phase aggregation (stages/merge.merge_salted)
    splits. The planted Helsinki cluster (~30 % of rows in a ~0.8°×0.5°
    box) lights up here."""
    ds = _docs_points(sf_dir)
    agg = ds.groupby(f"cell{RES}").aggregate(Count(alias_name="n"))
    agg = agg.map_batches(lambda t: t.rename_columns(["cell7", "n"]),
                          batch_format="pyarrow")
    counts = agg.to_pandas()    # occupied cells only: small (≤ 16k rows)
    mean = counts["n"].to_numpy(np.float64).sum() / np.float64(len(counts))
    out = counts[counts["n"].to_numpy(np.float64) > np.float64(8.0) * mean]
    return out.reset_index(drop=True)


@register("tile_counts_salted", sql=lambda: f"""
    WITH pts AS (SELECT d.doc_id, d.n_chars,
                        {cells.sql_cell('p.x', 'p.y', RES)} AS cell7
                 FROM documents d JOIN ({_points_cte()}) p USING (doc_id))
    SELECT cell7, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_chars
    FROM pts GROUP BY cell7""")
def tile_counts_salted(sf_dir: str):
    """The SAME tile aggregation as ``tile_counts`` but executed through
    the two-phase range-salted merge (stages/merge.merge_salted) — the
    skewed-cell path. Shares tile_counts' oracle, so the driver gate
    proves salted == unsalted exactly (integral sums; SURVEY.md §7.4)."""
    from ..stages.merge import MergeSpec, merge_salted

    ds = read_table(sf_dir, "documents", ["doc_id", "n_chars"])
    ds = ds.map_batches(derive_and_encode("doc_id", (RES,)),
                        batch_format="pyarrow", zero_copy_batch=True)
    spec = MergeSpec(groupby=[f"cell{RES}"], order=["doc_id"],
                     sum=["n_chars"], count_col="n")
    out = merge_salted(ds, spec, salt_mod=8)

    def finish(df):
        import pandas as pd
        df = df.rename(columns={f"cell{RES}": "cell7",
                                "n_chars": "sum_chars"})
        s = df["sum_chars"].to_numpy(np.float64)
        n = df["n"].to_numpy(np.float64)
        df["avg_chars"] = s / n
        return df[["cell7", "n", "sum_chars", "avg_chars"]]

    return out.map_batches(finish, batch_format="pandas")


# ------------------------------------------- mixed-geometry split (to_db 3-way)

@register("geom_split_counts", sql=lambda: f"""
    WITH assigned AS ({_pip_sql(fixtures.province_layer, True)})
    SELECT name AS province,
           {__import__('laji_pygeoapi_ray.stages.geometry',
                       fromlist=['sql_geom_group']).sql_geom_group('doc_id')}
               AS geom_group,
           COUNT(*) AS n
    FROM assigned GROUP BY 1, 2""")
def geom_split_counts(sf_dir: str):
    """The reference's 3-way geometry-type sink split (``edit_db.py:262-296``
    writes one table per (region, geom_type)): synthesize the mixed feature
    set (Points / LineStrings / Polygons / GeometryCollections), run the
    real normalize+validate WKB stage, PIP the province, and count per
    (province, geom_group). The oracle reproduces the expected
    post-normalization class from the generative rule — the engine side
    derives it from actual WKB round-trips, so a normalization bug breaks
    the match."""
    from ..stages import geometry as geomstage

    # the WKB normalize/repair stage is CPU-bound Python per feature —
    # spread it across cores even when the tiny id read arrives in 1-2
    # blocks (cheap split, no shuffle)
    ds = _docs_points(sf_dir).repartition(32)
    # explicit small batches: the downstream actor pool's batch_size would
    # otherwise fuse the whole table into ONE normalize task (operator
    # fusion adopts the actor op's 16384 batch) — the CPU-bound repair
    # must run as many small batches across the pool
    ds = ds.map_batches(geomstage.build_geometry(), batch_format="pyarrow",
                        batch_size=256)
    ds = ds.map_batches(geomstage.normalize_validate,
                        batch_format="pyarrow", batch_size=256)
    # fixed pre-started pool: the autoscaling (1, N) pool ramps too
    # slowly for this short compute-bound stage (the image-decode lesson)
    ds = ds.map_batches(assign.PIPAssigner, batch_format="pyarrow",
                        batch_size=512, concurrency=fixed_pool(),
                        num_cpus=1)
    out = ds.groupby(["province", "geom_group"]).aggregate(
        Count(alias_name="n"))
    return out.map_batches(lambda t: t.rename_columns(
        ["province", "geom_group", "n"]), batch_format="pyarrow")


# --------------------------------------------- hierarchical tile rollup (H3 band)

@register("tile_rollup_9_to_7", sql=lambda: f"""
    WITH pts AS ({_points_cte()}),
    c AS (SELECT {cells.sql_cell('x', 'y', 9)} AS cell9,
                 {cells.sql_cell('x', 'y', 7)} AS cell7 FROM pts)
    SELECT cell7, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT cell9) AS BIGINT) AS n_subtiles
    FROM c GROUP BY cell7""")
def tile_rollup_9_to_7(sf_dir: str):
    """Hierarchical tile rollup across the north-star's H3 res-7..9 band:
    pre-aggregate at fine res 9 (partial counts — the wide input never
    shuffles), then roll up to res 7 via the EXACT quadtree-parent
    arithmetic (``cells.parent``: ix>>2, iy>>2). The oracle recomputes
    cell7 directly from (x, y), so the parent derivation is what the
    value-hash actually certifies."""
    ds = _docs_points(sf_dir, resolutions=(9,))
    from ..stages.shuffle import partial_group_counts
    c9 = partial_group_counts(ds, ["cell9"])

    def to_parent(t: pa.Table) -> pa.Table:
        c = t["cell9"].to_numpy(zero_copy_only=False)
        return pa.table({"cell7": cells.parent(c, 7), "n": t["n"],
                         "sub": np.ones(len(t), dtype=np.int64)})

    rolled = c9.map_batches(to_parent, batch_format="pyarrow")
    agg = rolled.groupby("cell7").aggregate(
        Sum("n", alias_name="n"), Sum("sub", alias_name="n_subtiles"))
    return agg.map_batches(lambda t: t.rename_columns(
        ["cell7", "n", "n_subtiles"]), batch_format="pyarrow")


@register("cell_majority_lang", sql=lambda: f"""
    WITH pts AS (SELECT d.doc_id, d.lang,
                        {cells.sql_cell('p.x', 'p.y', RES)} AS cell7
                 FROM documents d JOIN ({_points_cte()}) p USING (doc_id)),
    c AS (SELECT cell7, lang, COUNT(*) AS n FROM pts GROUP BY 1, 2)
    SELECT cell7, lang AS majority_lang, CAST(n AS BIGINT) AS n FROM c
    QUALIFY row_number() OVER (PARTITION BY cell7
                               ORDER BY n DESC, lang) = 1""")
def cell_majority_lang(sf_dir: str):
    """Raster MAJORITY (mode) aggregate: the modal document language per
    res-7 tile, deterministic ties (count desc, then lexicographic) — the
    classic zonal-majority / majority-resample GIS operator the square
    tile family lacked. Scale shape: per-batch partial (cell, lang)
    counts (combine-before-shuffle), one tiny groupby-sum, then a bucketed
    per-cell argmax over the already-aggregated table — the wide document
    table never shuffles."""
    import pandas as pd

    from ..stages.shuffle import grouped_apply, partial_group_counts

    key = f"cell{RES}"
    ds = read_table(sf_dir, "documents", ["doc_id", "lang"])
    ds = ds.map_batches(derive_and_encode("doc_id", (RES,)),
                        batch_format="pyarrow", zero_copy_batch=True)
    cnt = partial_group_counts(ds.select_columns([key, "lang"]),
                               [key, "lang"])

    def bucket_fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, "n", "lang"],
                            ascending=[True, False, True], kind="mergesort")
        out = df.groupby(key, sort=False).head(1)
        return out.rename(columns={key: "cell7", "lang": "majority_lang"})[
            ["cell7", "majority_lang", "n"]]

    return grouped_apply(cnt, [key], bucket_fn)


# --------------------------------------------------------- HEX (H3-analogue)

HEX_RES = 7          # 128 hex columns across the bbox — same band as cell7


@register("hex_cell_counts", sql=lambda: f"""
    SELECT hex7, COUNT(*) AS n
    FROM {hexgrid.sql_hex_cte(_points_cte(), 'doc_id', HEX_RES, out='hex7')}
    GROUP BY hex7""")
def hex_cell_counts(sf_dir: str):
    """Per-HEX-cell occurrence counts — the true H3-analogue tiling
    (``functions/hexgrid.py``: pointy-top axial lattice, cube rounding).
    Unlike the quadtree twin ``tile_counts``, every cell has six
    edge-sharing equidistant neighbors (no corner bias in density
    products). The oracle recomputes the fractional-axial + cube-round
    assignment op-for-op in SQL, so the hex ids themselves are what the
    value hash certifies. Scale shape: per-batch partial counts, only
    (hex_id, n) rows shuffle."""
    from ..stages.derive import derive_and_encode_hex
    from ..stages.shuffle import partial_group_counts
    ds = read_table(sf_dir, "documents", ["doc_id"])
    ds = ds.map_batches(derive_and_encode_hex("doc_id", HEX_RES),
                        batch_format="pyarrow", zero_copy_batch=True,
                        batch_size=262144)
    return partial_group_counts(ds, [f"hex{HEX_RES}"])


HEX_COARSE = 5


@register("hex_rollup_7_to_5", sql=lambda: f"""
    WITH h7 AS (SELECT doc_id, hex7 FROM
        {hexgrid.sql_hex_cte(_points_cte(), 'doc_id', HEX_RES, out='hex7')}),
    c7 AS (SELECT hex7, COUNT(*) AS n FROM h7 GROUP BY hex7),
    ctr AS (SELECT hex7, x, y FROM {hexgrid.sql_unpack_center_cte(
        'SELECT hex7 FROM c7', 'hex7', 'hex7', HEX_RES)}),
    h5 AS (SELECT hex7, hex5 FROM {hexgrid.sql_hex_cte(
        'SELECT hex7, x, y FROM ctr', 'hex7', HEX_COARSE, out='hex5')})
    SELECT h5.hex5, CAST(SUM(c7.n) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_subcells
    FROM h5 JOIN c7 USING (hex7) GROUP BY 1""")
def hex_rollup_7_to_5(sf_dir: str):
    """Hierarchical HEX rollup — the H3-style approximate hierarchy:
    hexagons don't nest, so (exactly like H3's aperture parents) a fine
    cell's parent is the coarse hex CONTAINING ITS CENTER. Pre-aggregate
    at res 7 (tiny table), then unpack → center → coarse re-assign →
    re-aggregate; the input points never touch the coarse pass. The twin
    recomputes unpack/center/cube-round bit-for-bit, so the parent ids
    themselves are certified."""
    from ray.data.aggregate import Count, Sum

    from ..stages.derive import derive_and_encode_hex
    from ..stages.shuffle import partial_group_counts

    key = f"hex{HEX_RES}"
    ds = read_table(sf_dir, "documents", ["doc_id"])
    ds = ds.map_batches(derive_and_encode_hex("doc_id", HEX_RES),
                        batch_format="pyarrow", zero_copy_batch=True,
                        batch_size=262144)
    cnt7 = partial_group_counts(ds, [key]).map_batches(
        lambda t: t.rename_columns(["hex7", "n"]), batch_format="pyarrow")

    def to_parent(t: pa.Table) -> pa.Table:
        q, r = hexgrid.unpack(t["hex7"].to_numpy(zero_copy_only=False))
        cx, cy = hexgrid.hex_center(q, r, HEX_RES)
        return t.append_column(
            "hex5", pa.array(hexgrid.hex_id(cx, cy, HEX_COARSE)))

    agg = cnt7.map_batches(to_parent, batch_format="pyarrow") \
        .groupby("hex5").aggregate(Sum("n", alias_name="n"),
                                   Count(alias_name="n_subcells"))
    return agg.map_batches(
        lambda t: t.rename_columns(["hex5", "n", "n_subcells"]),
        batch_format="pyarrow")


# --------------------------------------------------- REAL S2 cell pipelines

S2_LEVEL = 11        # ≈ the H3 res-7 band on the S2 hierarchy
S2_COARSE = 6


def _s2_leaf_sql() -> str:
    return s2.sql_leaf_cte(_points_cte(), "doc_id")


@register("s2_cell_counts", sql=lambda: f"""
    {_s2_leaf_sql()}
    SELECT {s2.sql_parent('s2', S2_LEVEL)} AS s2_{S2_LEVEL},
           COUNT(*) AS n
    FROM s2_leaf GROUP BY 1""")
def s2_cell_counts(sf_dir: str):
    """Per-S2-cell occurrence counts with REAL S2 cell ids
    (functions/s2.py — the public s2geometry face/Hilbert encoding,
    vectorized): the north-star's named tiling key, alongside the
    quadtree fincell twin ``tile_counts``. The oracle re-runs the whole
    sphere→face→(s,t)→Hilbert pipeline as a recursive CTE, so the ids —
    not just the counts — are what the value hash certifies."""
    from ..stages.derive import derive_and_encode_s2
    from ..stages.shuffle import partial_group_counts
    ds = read_table(sf_dir, "documents", ["doc_id"])
    ds = ds.map_batches(derive_and_encode_s2("doc_id", (S2_LEVEL,)),
                        batch_format="pyarrow", zero_copy_batch=True,
                        batch_size=262144)
    return partial_group_counts(ds, [f"s2_{S2_LEVEL}"])


@register("s2_rollup_11_to_6", sql=lambda: f"""
    {_s2_leaf_sql()},
    c11 AS (SELECT {s2.sql_parent('s2', S2_LEVEL)} AS s2_11, COUNT(*) AS n
            FROM s2_leaf GROUP BY 1)
    SELECT {s2.sql_parent('s2_11', S2_COARSE)} AS s2_{S2_COARSE},
           CAST(SUM(n) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_subcells
    FROM c11 GROUP BY 1""")
def s2_rollup_11_to_6(sf_dir: str):
    """Hierarchical S2 rollup: pre-aggregate at level 11, then coarsen to
    level 6 purely by parent bit-arithmetic on the CELL ID (s2.parent —
    no re-encode, no point data in the second shuffle). Certifies that
    the id layout's parent/child algebra matches the from-scratch
    recomputation in the oracle."""
    from ..stages.derive import derive_and_encode_s2
    from ..stages.shuffle import partial_group_counts
    ds = read_table(sf_dir, "documents", ["doc_id"])
    ds = ds.map_batches(derive_and_encode_s2("doc_id", (S2_LEVEL,)),
                        batch_format="pyarrow", zero_copy_batch=True,
                        batch_size=262144)
    c11 = partial_group_counts(ds, [f"s2_{S2_LEVEL}"])

    def to_parent(t: pa.Table) -> pa.Table:
        c = t[f"s2_{S2_LEVEL}"].to_numpy(zero_copy_only=False)
        return pa.table({f"s2_{S2_COARSE}": s2.parent(c, S2_COARSE),
                         "n": t["n"],
                         "sub": np.ones(len(t), dtype=np.int64)})

    rolled = c11.map_batches(to_parent, batch_format="pyarrow")
    agg = rolled.groupby(f"s2_{S2_COARSE}").aggregate(
        Sum("n", alias_name="n"), Sum("sub", alias_name="n_subcells"))
    return agg.map_batches(lambda t: t.rename_columns(
        [f"s2_{S2_COARSE}", "n", "n_subcells"]), batch_format="pyarrow")


# Query parameter: the level-6 S2 cell covering central Helsinki — a
# data-independent constant computed once from the cell algebra itself.
_S2_TARGET = int(s2.encode_lonlat(np.array([24.94]), np.array([60.17]),
                                  level=S2_COARSE)[0])
_S2_LO = int(s2.range_min(np.array([_S2_TARGET], dtype=np.int64))[0])
_S2_HI = int(s2.range_max(np.array([_S2_TARGET], dtype=np.int64))[0])


@register("s2_range_query", sql=lambda: f"""
    {_s2_leaf_sql()}
    SELECT doc_id, s2 FROM s2_leaf
    WHERE s2 BETWEEN {_S2_LO} AND {_S2_HI}""")
def s2_range_query(sf_dir: str):
    """Cell-range containment query — the S2 pruning path the north rule's
    bbox/covering queries rely on: every descendant of a cell occupies ONE
    contiguous leaf-id interval [range_min, range_max], so 'all points
    inside this level-6 cell' is a single BETWEEN on the sorted/indexed
    leaf-id column (no polygon test, no re-encode). Here the leaf ids are
    derived in-flight and range-filtered per batch; on a cell-id-sorted
    layout the same predicate prunes whole files. The oracle re-derives
    the leaf ids from scratch and applies the identical interval."""
    import pyarrow.compute as pc

    from ..stages.derive import derive_and_encode_s2

    ds = read_table(sf_dir, "documents", ["doc_id"])
    ds = ds.map_batches(derive_and_encode_s2("doc_id", (s2.MAX_LEVEL,)),
                        batch_format="pyarrow", zero_copy_batch=True,
                        batch_size=262144)

    def rng(t: pa.Table) -> pa.Table:
        leaf = t[f"s2_{s2.MAX_LEVEL}"]
        keep = pc.and_(pc.greater_equal(leaf, _S2_LO),
                       pc.less_equal(leaf, _S2_HI))
        return pa.table({"doc_id": t["doc_id"],
                         "s2": leaf}).filter(keep)

    return ds.map_batches(rng, batch_format="pyarrow")


def _s2_extents_sql() -> str:
    cells = f"""
    {_s2_leaf_sql()}
    SELECT {s2.sql_parent('s2', S2_LEVEL)} AS k,
           {s2.sql_parent('s2', S2_LEVEL)} AS s2,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM s2_leaf GROUP BY 1, 2"""
    return (s2.sql_uv_rect_cte(cells, "k", S2_LEVEL) + f"""
    SELECT r.k AS s2_{S2_LEVEL}, c.n, r.face,
           r.u_lo, r.u_hi, r.v_lo, r.v_hi
    FROM s2_rect r JOIN s2_cells c ON c.k = r.k""")


@register("s2_cell_extents", sql=_s2_extents_sql)
def s2_cell_extents(sf_dir: str):
    """Vector-tile extents on the REAL S2 key: per level-{S2_LEVEL} cell,
    the occurrence count plus the cell's exact (face, u, v) rectangle —
    the raster↔vector tile-extent op (`tile_polygons`' twin) on the S2
    hierarchy. The rect comes from the cell ID alone (min-leaf decode →
    inverse Hilbert walk → grid floor → rational ST→UV), so the oracle —
    which re-runs encode AND the inverse walk as recursive CTEs — certifies
    both directions of the id↔geometry mapping bit-for-bit. Rational
    arithmetic only: no trig in the rect, hence hash-exact doubles."""
    from ..stages.derive import derive_and_encode_s2
    from ..stages.shuffle import partial_group_counts

    ds = read_table(sf_dir, "documents", ["doc_id"])
    ds = ds.map_batches(derive_and_encode_s2("doc_id", (S2_LEVEL,)),
                        batch_format="pyarrow", zero_copy_batch=True,
                        batch_size=262144)
    counts = partial_group_counts(ds, [f"s2_{S2_LEVEL}"])

    def rect(t: pa.Table) -> pa.Table:
        ids = t[f"s2_{S2_LEVEL}"].to_numpy(zero_copy_only=False)
        face, u_lo, u_hi, v_lo, v_hi = s2.cell_uv_rect(ids, S2_LEVEL)
        return pa.table({f"s2_{S2_LEVEL}": t[f"s2_{S2_LEVEL}"],
                         "n": t["n"], "face": pa.array(face),
                         "u_lo": pa.array(u_lo), "u_hi": pa.array(u_hi),
                         "v_lo": pa.array(v_lo), "v_hi": pa.array(v_hi)})

    return counts.map_batches(rect, batch_format="pyarrow")


@register("focal_density_3x3", sql=lambda: f"""
    WITH pts AS (SELECT {cells.sql_cell('x', 'y', RES)} AS cell
                 FROM ({_points_cte()})),
    c AS (SELECT cell, (cell >> {cells.IY_SHIFT}) & {(1 << cells.IY_SHIFT) - 1} AS iy,
                 cell & {(1 << cells.IY_SHIFT) - 1} AS ix,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM pts GROUP BY 1),
    off AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),
                                  (0,1),(1,-1),(1,0),(1,1)) o(dx, dy)),
    sc AS (SELECT ((CAST({RES} AS BIGINT) << {cells.RES_SHIFT})
                   | ((iy + dy) << {cells.IY_SHIFT}) | (ix + dx)) AS cell7, n
           FROM c, off
           WHERE ix + dx BETWEEN 0 AND {(1 << RES) - 1}
             AND iy + dy BETWEEN 0 AND {(1 << RES) - 1})
    SELECT cell7, CAST(SUM(n) AS BIGINT) AS focal_n FROM sc GROUP BY 1""")
def focal_density_3x3(sf_dir: str):
    """Focal (moving-window) density — the raster convolution primitive:
    per-tile occurrence counts smoothed over each cell's 3×3 neighborhood.
    Scatter-to-neighbors instead of a 9-way self-join: the per-cell count
    table (already tiny — partial counts, the wide input never shuffles)
    emits one (neighbor, n) row per valid offset, then ONE groupby-sum.
    Border cells clip (no phantom neighbors outside the 2^res grid).
    Integer counts → exact oracle. The same shape at res 9 + 5×5 kernel is
    the hot-cell smoothing pass for the skew detector (`hot_cells`)."""
    from ..stages.shuffle import partial_group_counts

    cnt = partial_group_counts(_docs_points(sf_dir), [f"cell{RES}"])

    n_max = (1 << RES) - 1
    mask = (1 << cells.IY_SHIFT) - 1

    def scatter(t: pa.Table) -> pa.Table:
        cell = t[f"cell{RES}"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        ix = cell & mask
        iy = (cell >> cells.IY_SHIFT) & mask
        outc, outn = [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                jx, jy = ix + dx, iy + dy
                ok = (jx >= 0) & (jx <= n_max) & (jy >= 0) & (jy <= n_max)
                outc.append((np.int64(RES) << cells.RES_SHIFT)
                            | (jy[ok] << cells.IY_SHIFT) | jx[ok])
                outn.append(n[ok])
        return pa.table({"cell7": np.concatenate(outc),
                         "n": np.concatenate(outn)})

    sc = cnt.map_batches(scatter, batch_format="pyarrow")
    agg = sc.groupby("cell7").aggregate(Sum("n", alias_name="focal_n"))
    return agg.map_batches(
        lambda t: t.rename_columns(["cell7", "focal_n"]),
        batch_format="pyarrow")


@register("province_cover_cells", sql=lambda: f"""
    WITH g AS (SELECT unnest(generate_series(0, {(1 << (2 * RES)) - 1}))
                   AS i),
    ctr AS (SELECT ((CAST({RES} AS BIGINT) << {cells.RES_SHIFT})
                    | ((i >> {RES}) << {cells.IY_SHIFT})
                    | (i & {(1 << RES) - 1})) AS cell7,
                   {points._d(points.FIN_X0)}
                     + (CAST(i & {(1 << RES) - 1} AS DOUBLE)
                        + CAST(0.5 AS DOUBLE))
                       * {points._d(points._W / (1 << RES))} AS x,
                   {points._d(points.FIN_Y0)}
                     + (CAST(i >> {RES} AS DOUBLE) + CAST(0.5 AS DOUBLE))
                       * {points._d(points._H / (1 << RES))} AS y
            FROM g),
    assigned AS ({sql_pip_assign("SELECT cell7, x, y FROM ctr", "cell7",
                                 fixtures.edges_values_sql(fixtures.province_layer()),
                                 fixtures.names_values_sql(fixtures.province_layer()))})
    SELECT cell7, name AS province FROM assigned
    WHERE name IS NOT NULL""")
def province_cover_cells(sf_dir: str):
    """Polygon cover / polyfill — the vector→raster inverse of
    `tile_polygons` and the H3-`polyfill` / S2-`RegionCoverer` primitive
    behind every polygon-keyed spatial join: every res-{RES} tile whose
    CENTER lies inside a province polygon, labelled with that province.
    The engine enumerates the grid as a streamed `range` (no input table
    — at res 15 this is 10⁹ cells, still just blocks of integers),
    derives exact cell centers, and reuses the PIP actor pool; the twin
    re-derives every center and repeats the crossing test in SQL. The
    center rule makes cover sets disjoint across provinces (boundary
    tiles go to the polygon containing the center point, matching the
    reference's one-province-per-record semantics)."""
    n = 1 << RES
    cw = np.float64(points._W / n)
    ch = np.float64(points._H / n)

    def centers(t: pa.Table) -> pa.Table:
        i = t["id"].to_numpy(zero_copy_only=False)
        ix = i & (n - 1)
        iy = i >> RES
        x = points.FIN_X0 + (ix.astype(np.float64) + 0.5) * cw
        y = points.FIN_Y0 + (iy.astype(np.float64) + 0.5) * ch
        cell = (np.int64(RES) << cells.RES_SHIFT) \
            | (iy << cells.IY_SHIFT) | ix
        return pa.table({"cell7": cell, "x": x, "y": y})

    ds = ray.data.range(n * n, override_num_blocks=16)
    ds = ds.map_batches(centers, batch_format="pyarrow",
                        zero_copy_batch=True)
    ds = ds.map_batches(assign.PIPAssigner, batch_format="pyarrow",
                        batch_size=16384, concurrency=default_pool(),
                        num_cpus=1)

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return (t.select(["cell7", "province"])
                 .filter(pc.is_valid(t["province"])))

    return ds.map_batches(keep, batch_format="pyarrow")


# ------------------------------------------------------------------ DBSCAN
# eps = 0.05° in micro-degrees; minPts = 3 — on the synthetic point field
# this yields a mix of multi-point clusters, border points and noise.
DBSCAN_EPS_U = 50_000
DBSCAN_MINPTS = 3


@register("dbscan_doc_clusters", sql=f"""
    WITH RECURSIVE
    pts AS (SELECT doc_id AS id,
                   CAST(floor(x * 1000000) AS BIGINT) AS qx,
                   CAST(floor(y * 1000000) AS BIGINT) AS qy
            FROM ({_points_cte()})),
    nb AS (SELECT a.id, a.qx, a.qy, CAST(COUNT(*) AS BIGINT) AS n_in_eps
           FROM pts a JOIN pts b
             ON (a.qx - b.qx) * (a.qx - b.qx)
              + (a.qy - b.qy) * (a.qy - b.qy)
              <= {DBSCAN_EPS_U}::BIGINT * {DBSCAN_EPS_U}::BIGINT
           GROUP BY a.id, a.qx, a.qy),
    core AS (SELECT id FROM nb WHERE n_in_eps >= {DBSCAN_MINPTS}),
    e AS (SELECT a.id AS ia, b.id AS ib
          FROM pts a JOIN pts b
            ON (a.qx - b.qx) * (a.qx - b.qx)
             + (a.qy - b.qy) * (a.qy - b.qy)
             <= {DBSCAN_EPS_U}::BIGINT * {DBSCAN_EPS_U}::BIGINT
           AND a.id < b.id
          WHERE a.id IN (SELECT id FROM core)
            AND b.id IN (SELECT id FROM core)),
    ed AS (SELECT ia, ib FROM e UNION ALL SELECT ib, ia FROM e),
    reach(id, lbl) AS (
        SELECT id, id FROM core
        UNION
        SELECT r.id, ed.ib FROM reach r JOIN ed ON ed.ia = r.lbl),
    comp AS (SELECT id, CAST(MIN(lbl) AS BIGINT) AS cl FROM reach
             GROUP BY id),
    bord AS (SELECT p.id, CAST(MIN(c.cl) AS BIGINT) AS cl
             FROM pts p JOIN pts q
               ON (p.qx - q.qx) * (p.qx - q.qx)
                + (p.qy - q.qy) * (p.qy - q.qy)
                <= {DBSCAN_EPS_U}::BIGINT * {DBSCAN_EPS_U}::BIGINT
             JOIN comp c ON c.id = q.id
             WHERE p.id NOT IN (SELECT id FROM core)
             GROUP BY p.id)
    SELECT nb.id, nb.qx, nb.qy, nb.n_in_eps,
           nb.id IN (SELECT id FROM core) AS is_core,
           COALESCE(comp.cl, bord.cl, -1) AS cluster_id
    FROM nb LEFT JOIN comp ON comp.id = nb.id
            LEFT JOIN bord ON bord.id = nb.id""")
def dbscan_doc_clusters(sf_dir: str):
    """Grid DBSCAN over the derived document points (eps=0.05°, minPts=3):
    cluster_id = min id of the core-connected component, border points
    take the MIN core-neighbor label, noise = -1. Oracle computes the same
    semantics via a recursive-CTE transitive closure."""
    from ..stages.dbscan import dbscan, quantized_points
    pts = quantized_points(read_table(sf_dir, "documents", ["doc_id"]),
                           "doc_id")
    return dbscan(pts, eps_u=DBSCAN_EPS_U, minpts=DBSCAN_MINPTS)


# ------------------------------------------------------- raster blob labeling
# 4-connected components of OCCUPIED cells (count >= 1) at a coarse
# resolution — the classic raster "region labeling" / flood-fill operator
# (GDAL sieve / scipy.ndimage.label analogue), here as a pure shuffle
# composition: per-cell partial counts (the wide input never moves) →
# right/up neighbor hash join for the adjacency edges (each undirected
# edge emitted exactly once, from its smaller endpoint) → the existing
# distributed min-label propagation → one tiny per-blob aggregate.
RES_BLOB = 5  # 32×32 grid: dense enough at test sf for multi-cell blobs


@register("cell_blob_stats", sql=lambda: f"""
    WITH RECURSIVE
    pts AS (SELECT {cells.sql_cell('x', 'y', RES_BLOB)} AS cell
            FROM ({_points_cte()})),
    c AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n,
                 cell & {(1 << cells.IY_SHIFT) - 1} AS ix,
                 (cell >> {cells.IY_SHIFT}) & {(1 << cells.IY_SHIFT) - 1} AS iy
          FROM pts GROUP BY 1),
    e AS (SELECT a.cell AS ia, b.cell AS ib FROM c a JOIN c b
          ON (b.ix = a.ix + 1 AND b.iy = a.iy)
          OR (b.ix = a.ix AND b.iy = a.iy + 1)),
    ed AS (SELECT ia, ib FROM e UNION ALL SELECT ib, ia FROM e),
    reach(id, lbl) AS (
        SELECT cell, cell FROM c
        UNION
        SELECT r.id, ed.ib FROM reach r JOIN ed ON ed.ia = r.lbl),
    comp AS (SELECT id, CAST(MIN(lbl) AS BIGINT) AS blob_id FROM reach
             GROUP BY id)
    SELECT blob_id, CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(c.n) AS BIGINT) AS n_docs,
           CAST(MIN(c.ix) AS BIGINT) AS ix0, CAST(MIN(c.iy) AS BIGINT) AS iy0,
           CAST(MAX(c.ix) AS BIGINT) AS ix1, CAST(MAX(c.iy) AS BIGINT) AS iy1
    FROM comp JOIN c ON c.cell = comp.id GROUP BY 1""")
def cell_blob_stats(sf_dir: str):
    """Raster connected-component (blob) stats: label 4-connected occupied
    res-5 cells by the MIN cell id of their component, then aggregate
    size, contained-document count and pixel bbox per blob. Oracle:
    recursive-CTE closure over the same adjacency."""
    from ..stages.join import hash_join
    from ..stages.shuffle import partial_group_counts
    from ..stages.simdedup import cluster_pairs_ds

    key = f"cell{RES_BLOB}"
    mask = (1 << cells.IY_SHIFT) - 1
    nmax = (1 << RES_BLOB) - 1
    # multi-consumer (edge candidates + singleton ids + final join): pin
    # the tiny per-cell count table once
    cnt = partial_group_counts(
        _docs_points(sf_dir, (RES_BLOB,)), [key]).materialize()

    def nbr_candidates(t: pa.Table) -> pa.Table:
        """Each occupied cell → candidate edge rows keyed by its RIGHT and
        UP neighbor ids (clipped at the grid border); the inner join
        against the occupied set keeps real edges — exactly once each."""
        cell = t[key].to_numpy(zero_copy_only=False)
        ix, iy = cell & mask, (cell >> cells.IY_SHIFT) & mask
        outa, outk = [], []
        for dx, dy in ((1, 0), (0, 1)):
            jx, jy = ix + dx, iy + dy
            ok = (jx <= nmax) & (jy <= nmax)
            outa.append(cell[ok])
            outk.append((np.int64(RES_BLOB) << cells.RES_SHIFT)
                        | (jy[ok] << cells.IY_SHIFT) | jx[ok])
        return pa.table({"id_a": np.concatenate(outa),
                         key: np.concatenate(outk)})

    cand = cnt.select_columns([key]).map_batches(
        nbr_candidates, batch_format="pyarrow")
    edges = hash_join(cand, cnt.select_columns([key]), on=[key]).map_batches(
        lambda t: t.rename_columns(["id_a", "id_b"]),
        batch_format="pyarrow")

    ids = cnt.select_columns([key]).map_batches(
        lambda t: t.rename_columns(["id"]), batch_format="pyarrow")
    labels = cluster_pairs_ds(edges, ids, id_col="id")
    lab = hash_join(
        labels.map_batches(lambda t: t.rename_columns([key, "blob_id"]),
                           batch_format="pyarrow"),
        cnt, on=[key])

    def add_xy(t: pa.Table) -> pa.Table:
        cell = t[key].to_numpy(zero_copy_only=False)
        return pa.table({"blob_id": t["blob_id"], "n": t["n"],
                         "ix": cell & mask,
                         "iy": (cell >> cells.IY_SHIFT) & mask})

    per_cell = lab.map_batches(add_xy, batch_format="pyarrow")
    agg = per_cell.groupby("blob_id").aggregate(
        Count(alias_name="n_cells"), Sum("n", alias_name="n_docs"),
        Min("ix", alias_name="ix0"), Min("iy", alias_name="iy0"),
        Max("ix", alias_name="ix1"), Max("iy", alias_name="iy1"))
    return agg.map_batches(
        lambda t: t.rename_columns(
            ["blob_id", "n_cells", "n_docs", "ix0", "iy0", "ix1", "iy1"]),
        batch_format="pyarrow")


# ------------------------------------------------------- spatial statistics
def _morans_consts():
    n = 1 << RES
    n_cells = n * n
    w_pairs = 4 * n * n - 4 * n        # directed rook pairs on the lattice
    return n, n_cells, w_pairs


def _rook_neighbor_sums(cnt, key: str, n: int):
    """Σ_j w_ij x_j for rook adjacency via scatter-to-neighbors: each
    occupied cell sends its count to its ≤4 clipped neighbors; one tiny
    groupby sums arrivals per target cell. The lattice never materializes
    and only the occupied-cell count table shuffles."""
    mask = (1 << cells.IY_SHIFT) - 1

    def scatter(t: pa.Table) -> pa.Table:
        cell = t[key].to_numpy(zero_copy_only=False)
        x = t["n"].to_numpy(zero_copy_only=False)
        ix, iy = cell & mask, (cell >> cells.IY_SHIFT) & mask
        outc, outn = [], []
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            jx, jy = ix + dx, iy + dy
            ok = (jx >= 0) & (jx <= n - 1) & (jy >= 0) & (jy <= n - 1)
            outc.append((np.int64(RES) << cells.RES_SHIFT)
                        | (jy[ok] << cells.IY_SHIFT) | jx[ok])
            outn.append(x[ok])
        return pa.table({key: np.concatenate(outc),
                         "sx": np.concatenate(outn)})

    return (cnt.map_batches(scatter, batch_format="pyarrow")
            .groupby(key).aggregate(Sum("sx", alias_name="sx")))


@register("morans_i_cells", sql=lambda: (lambda n, N, W: f"""
    WITH pts AS (SELECT {cells.sql_cell('x', 'y', RES)} AS cell
                 FROM ({_points_cte()})),
    c AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS x,
                 cell & {(1 << cells.IY_SHIFT) - 1} AS ix,
                 (cell >> {cells.IY_SHIFT}) & {(1 << cells.IY_SHIFT) - 1} AS iy
          FROM pts GROUP BY 1),
    base AS (SELECT CAST(SUM(x) AS BIGINT) AS s,
                    CAST(SUM(x * x) AS BIGINT) AS sx2,
                    CAST(SUM(x * (4 - CASE WHEN ix = 0 THEN 1 ELSE 0 END
                                     - CASE WHEN ix = {n - 1} THEN 1 ELSE 0 END
                                     - CASE WHEN iy = 0 THEN 1 ELSE 0 END
                                     - CASE WHEN iy = {n - 1} THEN 1 ELSE 0 END))
                         AS BIGINT) AS degx
             FROM c),
    cr AS (SELECT CAST(COALESCE(SUM(a.x * b.x), 0) AS BIGINT) AS cross_x
           FROM c a JOIN c b
           ON abs(a.ix - b.ix) + abs(a.iy - b.iy) = 1)
    SELECT CAST({N} AS BIGINT) AS n_cells, CAST({W} AS BIGINT) AS w_pairs,
           base.s AS n_points, cr.cross_x,
           {N * N} * cr.cross_x - {2 * N} * base.s * base.degx
               + base.s * base.s * {W} AS num_scaled,
           {N * N} * base.sx2 - {N} * base.s * base.s AS den_scaled,
           (CAST({N * N} * cr.cross_x - {2 * N} * base.s * base.degx
                 + base.s * base.s * {W} AS DOUBLE)
            / CAST({N * N} * base.sx2 - {N} * base.s * base.s AS DOUBLE))
           * (CAST({N} AS DOUBLE) / CAST({W} AS DOUBLE)) AS morans_i
    FROM base, cr""")(*_morans_consts()))
def morans_i_cells(sf_dir: str):
    """Global Moran's I spatial autocorrelation of per-cell document counts
    on the full res-7 lattice (rook adjacency, binary weights, empty cells
    = 0). Integer-exact: with y_i = N·x_i − S the numerator and denominator
    become pure int64 sums over the SPARSE occupied-cell table —
    num = N²·Σ_adj x_i x_j − 2NS·Σ x_i deg_i + S²·W and
    den = N²·Σx² − N·S² — so no float crosses a block boundary; the single
    final division is pinned to one IEEE expression on both sides. The
    Σ_adj cross term uses the scatter-to-neighbors pattern (occupied cells
    only; the lattice never materializes)."""
    from ..stages.join import hash_join
    from ..stages.shuffle import partial_group_counts

    n, n_cells, w_pairs = _morans_consts()
    key = f"cell{RES}"
    mask = (1 << cells.IY_SHIFT) - 1
    cnt = partial_group_counts(_docs_points(sf_dir), [key]).materialize()

    def base_partials(t: pa.Table) -> pa.Table:
        x = t["n"].to_numpy(zero_copy_only=False)
        cell = t[key].to_numpy(zero_copy_only=False)
        ix, iy = cell & mask, (cell >> cells.IY_SHIFT) & mask
        deg = (4 - (ix == 0) - (ix == n - 1)
               - (iy == 0) - (iy == n - 1)).astype(np.int64)
        return pa.table({"s": pa.array([int(x.sum())], pa.int64()),
                         "sx2": pa.array([int((x * x).sum())], pa.int64()),
                         "degx": pa.array([int((x * deg).sum())],
                                          pa.int64())})

    b = cnt.map_batches(base_partials, batch_format="pyarrow").aggregate(
        Sum("s", alias_name="s"), Sum("sx2", alias_name="sx2"),
        Sum("degx", alias_name="degx"))
    s, sx2, degx = int(b["s"]), int(b["sx2"]), int(b["degx"])

    nbr = _rook_neighbor_sums(cnt, key, n)
    joined = hash_join(nbr.map_batches(
        lambda t: t.rename_columns([key, "sx"]), batch_format="pyarrow"),
        cnt, on=[key])

    def cross_partial(t: pa.Table) -> pa.Table:
        v = (t["sx"].to_numpy(zero_copy_only=False)
             * t["n"].to_numpy(zero_copy_only=False))
        return pa.table({"cx": pa.array([int(v.sum())], pa.int64())})

    cx = joined.map_batches(cross_partial, batch_format="pyarrow") \
        .aggregate(Sum("cx", alias_name="cx"))
    cross_x = int(cx["cx"])

    num = n_cells * n_cells * cross_x - 2 * n_cells * s * degx \
        + s * s * w_pairs
    den = n_cells * n_cells * sx2 - n_cells * s * s
    mi = (np.float64(num) / np.float64(den)) \
        * (np.float64(n_cells) / np.float64(w_pairs))
    import pandas as pd
    return pd.DataFrame({
        "n_cells": np.array([n_cells], np.int64),
        "w_pairs": np.array([w_pairs], np.int64),
        "n_points": np.array([s], np.int64),
        "cross_x": np.array([cross_x], np.int64),
        "num_scaled": np.array([num], np.int64),
        "den_scaled": np.array([den], np.int64),
        "morans_i": np.array([mi], np.float64)})


def _lisa_sql() -> str:
    n, n_cells, _ = _morans_consts()
    mask = (1 << cells.IY_SHIFT) - 1
    deg = (f"(4 - CASE WHEN c.ix = 0 THEN 1 ELSE 0 END"
           f" - CASE WHEN c.ix = {n - 1} THEN 1 ELSE 0 END"
           f" - CASE WHEN c.iy = 0 THEN 1 ELSE 0 END"
           f" - CASE WHEN c.iy = {n - 1} THEN 1 ELSE 0 END)")
    return f"""
    WITH pts AS (SELECT {cells.sql_cell('x', 'y', RES)} AS cell
                 FROM ({_points_cte()})),
    c AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS x,
                 cell & {mask} AS ix,
                 (cell >> {cells.IY_SHIFT}) & {mask} AS iy
          FROM pts GROUP BY 1),
    base AS (SELECT CAST(SUM(x) AS BIGINT) AS s FROM c),
    nb AS (SELECT a.cell, CAST(SUM(b.x) AS BIGINT) AS nsum
           FROM c a JOIN c b
           ON abs(a.ix - b.ix) + abs(a.iy - b.iy) = 1 GROUP BY 1)
    SELECT c.cell AS cell7, c.x, CAST({deg} AS BIGINT) AS deg,
           CAST(COALESCE(nb.nsum, 0) AS BIGINT) AS nsum,
           CAST(({n_cells} * c.x - base.s)
                * ({n_cells} * COALESCE(nb.nsum, 0) - {deg} * base.s)
                AS BIGINT) AS li_num
    FROM c LEFT JOIN nb ON nb.cell = c.cell, base"""


@register("local_moran_cells", sql=_lisa_sql)
def local_moran_cells(sf_dir: str):
    """Local Moran's I (LISA, Anselin 1995) per occupied res-7 cell over
    the full-lattice count surface (rook adjacency, empty cells = 0):
    the hot/cold/outlier classifier behind 'significant cluster' maps.
    Same scaled-integer trick as the global statistic — with
    z_i = N·x_i − S the per-cell numerator z_i·Σ_j w_ij z_j becomes
    li_num = (N·x_i − S)·(N·nsum_i − deg_i·S), pure int64 (neighbors that
    are EMPTY cells contribute exactly −S each via the deg_i term, so the
    sparse occupied-cell table is all that ever shuffles). The consumer
    divides by the global m2 from morans_i_cells. Shape: one partial-count
    pass, the shared rook scatter, one LEFT bucket join back to the count
    table (cells with zero occupied neighbors keep nsum = 0)."""
    import pyarrow.compute as pc

    from ..stages.join import hash_join
    from ..stages.shuffle import partial_group_counts

    n, n_cells, _ = _morans_consts()
    key = f"cell{RES}"
    mask = (1 << cells.IY_SHIFT) - 1
    cnt = partial_group_counts(_docs_points(sf_dir), [key]).materialize()
    s = int(cnt.aggregate(Sum("n", alias_name="s"))["s"])

    nbr = _rook_neighbor_sums(cnt, key, n).map_batches(
        lambda t: t.rename_columns([key, "nsum"]), batch_format="pyarrow")
    joined = hash_join(cnt, nbr, on=[key], how="left")

    def finish(t: pa.Table) -> pa.Table:
        cell = t[key].to_numpy(zero_copy_only=False)
        x = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        nsum = pc.fill_null(pc.cast(t["nsum"], pa.int64()), 0) \
            .to_numpy(zero_copy_only=False)
        ix, iy = cell & mask, (cell >> cells.IY_SHIFT) & mask
        deg = (4 - (ix == 0) - (ix == n - 1)
               - (iy == 0) - (iy == n - 1)).astype(np.int64)
        z = n_cells * x - s
        zn = n_cells * nsum - deg * s
        return pa.table({"cell7": pa.array(cell), "x": pa.array(x),
                         "deg": pa.array(deg), "nsum": pa.array(nsum),
                         "li_num": pa.array(z * zn)})

    return joined.map_batches(finish, batch_format="pyarrow")


# ------------------------------------------------------ Hilbert layout key
HILBERT_ORDER = 8   # 256×256 grid — the write-layout sort key resolution


@register("hilbert_order_docs", sql=lambda: f"""
    WITH src AS (SELECT doc_id AS id,
                        {cells.sql_cell('x', 'y', HILBERT_ORDER)}
                        & {(1 << cells.IY_SHIFT) - 1} AS hx,
                        ({cells.sql_cell('x', 'y', HILBERT_ORDER)}
                         >> {cells.IY_SHIFT})
                        & {(1 << cells.IY_SHIFT) - 1} AS hy
                 FROM ({_points_cte()})),
    {hilbert.sql_hilbert_ctes('src', HILBERT_ORDER)}
    SELECT src.id AS doc_id, src.hx, src.hy, hd.hd AS hilbert_d
    FROM src JOIN hd ON hd.id = src.id""")
def hilbert_order_docs(sf_dir: str):
    """Hilbert space-filling-curve layout key per document (order-8 grid
    over the study bbox): the locality-preserving sort key for the
    partitioned sink — consecutive keys are always 4-neighbors, so a bbox
    reader touches few contiguous key ranges (vs row-major tile ids whose
    scanlines shatter every bbox). Pure streaming column transform, no
    shuffle; the oracle re-runs the identical per-level bit transform as
    staged CTEs (bit-exact, tests/test_hilbert.py proves the twin
    exhaustively)."""
    import pyarrow.compute as pc

    mask = (1 << cells.IY_SHIFT) - 1

    def add_key(t: pa.Table) -> pa.Table:
        cell = t[f"cell{HILBERT_ORDER}"].to_numpy(zero_copy_only=False)
        hx, hy = cell & mask, (cell >> cells.IY_SHIFT) & mask
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "hx": pa.array(hx), "hy": pa.array(hy),
            "hilbert_d": pa.array(hilbert.xy_to_d(hx, hy, HILBERT_ORDER))})

    return _docs_points(sf_dir, (HILBERT_ORDER,)).map_batches(
        add_key, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------- adaptive quadtree leaves
QT_CAP = 4     # max points per leaf (split threshold)
QT_RMAX = 7    # finest split resolution


def _qt_sql() -> str:
    mask = (1 << cells.IY_SHIFT) - 1
    ctes, selects = [], []
    for r in range(QT_RMAX + 1):
        ctes.append(
            f"c{r} AS (SELECT {cells.sql_cell('x', 'y', r)} AS cell, "
            f"CAST(COUNT(*) AS BIGINT) AS n FROM pts GROUP BY 1)")
        if r == 0:
            cond = f"c0.n <= {QT_CAP}" if QT_RMAX > 0 else "TRUE"
            selects.append(
                f"SELECT cell, CAST(0 AS BIGINT) AS res, n FROM c0 "
                f"WHERE {cond}")
        else:
            leaf = f"c{r}.n <= {QT_CAP}" if r < QT_RMAX else "TRUE"
            selects.append(
                f"SELECT c{r}.cell, CAST({r} AS BIGINT) AS res, c{r}.n "
                f"FROM c{r} JOIN c{r - 1} p ON p.cell = "
                f"((CAST({r - 1} AS BIGINT) << {cells.RES_SHIFT}) "
                f"| ((((c{r}.cell >> {cells.IY_SHIFT}) & {mask}) >> 1) "
                f"<< {cells.IY_SHIFT}) | ((c{r}.cell & {mask}) >> 1)) "
                f"WHERE p.n > {QT_CAP} AND {leaf}")
    return (f"WITH pts AS (SELECT x, y FROM ({_points_cte()})),\n    "
            + ",\n    ".join(ctes) + "\n    "
            + "\nUNION ALL\n".join(selects))


@register("adaptive_quadtree_leaves", sql=_qt_sql)
def adaptive_quadtree_leaves(sf_dir: str):
    """Adaptive quadtree partitioning: split every cell with more than
    QT_CAP points until the cap holds or QT_RMAX is reached; emit the leaf
    cells with their counts — the balanced-shard layout for skewed point
    data (dense regions get fine cells, sparse regions coarse ones; each
    leaf becomes one output partition). Counts are monotone along
    ancestors, so "all ancestors over cap" reduces to ONE parent check;
    the whole ladder runs on aggregated per-cell count tables (the wide
    input shuffles zero times — one partial-count pass, then log-depth
    parent rollups + one bucketed join)."""
    from ..stages.join import hash_join
    from ..stages.shuffle import partial_group_counts

    key = f"cell{QT_RMAX}"
    fine = partial_group_counts(
        _docs_points(sf_dir, (QT_RMAX,)), [key]).map_batches(
        lambda t: t.rename_columns(["cell", "n"]), batch_format="pyarrow")

    levels = {QT_RMAX: fine.materialize()}
    for r in range(QT_RMAX - 1, -1, -1):
        child = levels[r + 1]

        def up(t: pa.Table, res=r) -> pa.Table:
            return pa.table({
                "cell": cells.parent(
                    t["cell"].to_numpy(zero_copy_only=False), res),
                "n": t["n"]})

        levels[r] = (child.map_batches(up, batch_format="pyarrow")
                     .groupby("cell").aggregate(Sum("n", alias_name="n"))
                     .map_batches(lambda t: t.rename_columns(["cell", "n"]),
                                  batch_format="pyarrow").materialize())

    def tag(r: int):
        def fn(t: pa.Table) -> pa.Table:
            cell = t["cell"].to_numpy(zero_copy_only=False)
            pc_ = (cells.parent(cell, r - 1) if r > 0
                   else np.full(len(t), -1, np.int64))
            return pa.table({"cell": t["cell"], "n": t["n"],
                             "res": pa.array(np.full(len(t), r, np.int64)),
                             "pcell": pa.array(pc_)})
        return fn

    allcells = None
    for r in range(QT_RMAX + 1):
        part = levels[r].map_batches(tag(r), batch_format="pyarrow")
        allcells = part if allcells is None else allcells.union(part)

    parents = None
    for r in range(QT_RMAX):
        p = levels[r].map_batches(
            lambda t: t.rename_columns(["pcell", "pn"]),
            batch_format="pyarrow")
        parents = p if parents is None else parents.union(p)

    joined = hash_join(allcells, parents, on=["pcell"], how="left")

    def leaves(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = t["n"].to_numpy(zero_copy_only=False)
        res = t["res"].to_numpy(zero_copy_only=False)
        pn = t["pn"].to_numpy(zero_copy_only=False)
        pn = np.where(pc.is_null(t["pn"]).to_numpy(zero_copy_only=False),
                      np.int64(QT_CAP + 1), pn.astype(np.int64))
        keep = (pn > QT_CAP) & ((n <= QT_CAP) | (res == QT_RMAX))
        out = t.filter(pa.array(keep))
        return pa.table({"cell": out["cell"],
                         "res": out["res"],
                         "n": pc.cast(out["n"], pa.int64())})

    return joined.map_batches(leaves, batch_format="pyarrow")


# ----------------------------------------------- spatiotemporal cell trend
TREND_RES = 5
TREND_T0_US = 1_704_067_200_000_000      # 2024-01-01T00:00Z in epoch-µs
US_PER_HOUR = 3_600_000_000


def _trend_sql() -> str:
    x, y = points.sql_xy("event_id")
    return f"""
    WITH e AS (SELECT {cells.sql_cell('p.x', 'p.y', TREND_RES)} AS cell,
                      (CAST(epoch_us(ts) AS BIGINT) - {TREND_T0_US})
                          // {US_PER_HOUR} AS t
               FROM (SELECT event_id, ts, {x} AS x, {y} AS y
                     FROM events) p),
    c AS (SELECT cell, t, CAST(COUNT(*) AS BIGINT) AS y
          FROM e GROUP BY 1, 2)
    SELECT cell AS cell5, CAST(COUNT(*) AS BIGINT) AS n_hours,
           CAST(COUNT(*) AS BIGINT) * CAST(SUM(t * y) AS BIGINT)
               - CAST(SUM(t) AS BIGINT) * CAST(SUM(y) AS BIGINT)
               AS trend_num,
           CAST(COUNT(*) AS BIGINT) * CAST(SUM(t * t) AS BIGINT)
               - CAST(SUM(t) AS BIGINT) * CAST(SUM(t) AS BIGINT)
               AS trend_den
    FROM c GROUP BY 1 HAVING COUNT(*) >= 2"""


def _event_hour_counts(sf_dir: str):
    """(cell, hour) → event count over OBSERVED hours: derive + hour-bucket
    inside the scan, per-batch partial counts — the wide events table never
    shuffles. Shared by the trend-surface and Mann–Kendall queries."""
    import pyarrow.compute as pc

    from ..stages.shuffle import partial_group_counts

    ev = read_table(sf_dir, "events", ["event_id", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        x, y = points.derive_xy(eid)
        tt = (pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
              - TREND_T0_US) // US_PER_HOUR
        return pa.table({"cell": pa.array(cells.encode(x, y, TREND_RES)),
                         "t": pa.array(tt)})

    return partial_group_counts(
        ev.map_batches(derive, batch_format="pyarrow"), ["cell", "t"],
        count_col="y", partial_blocks=16)


@register("cell_trend_hourly", sql=_trend_sql)
def cell_trend_hourly(sf_dir: str):
    """Spatiotemporal trend surface: per res-5 cell, the integer ordinary
    least-squares slope components of hourly event counts over OBSERVED
    hours — trend_num/trend_den = (n·Σty − Σt·Σy)/(n·Σt² − (Σt)²), all
    int64 so block order never matters (the consumer divides). Shape:
    derive + hour-bucket inside the scan, per-batch (cell, hour) partial
    counts, one small groupby for the per-cell moment sums."""
    ct = _event_hour_counts(sf_dir)

    def moments(t: pa.Table) -> pa.Table:
        tt = t["t"].to_numpy(zero_copy_only=False)
        yy = t["y"].to_numpy(zero_copy_only=False)
        return pa.table({"cell": t["cell"],
                         "one": pa.array(np.ones(len(tt), np.int64)),
                         "st": pa.array(tt), "sy": pa.array(yy),
                         "sty": pa.array(tt * yy),
                         "st2": pa.array(tt * tt)})

    agg = (ct.map_batches(moments, batch_format="pyarrow")
           .groupby("cell").aggregate(
               Sum("one", alias_name="n_hours"),
               Sum("st", alias_name="st"), Sum("sy", alias_name="sy"),
               Sum("sty", alias_name="sty"),
               Sum("st2", alias_name="st2")))

    def finish(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["cell", "n_hours", "st", "sy", "sty", "st2"])
        n = t["n_hours"].to_numpy(zero_copy_only=False)
        st = t["st"].to_numpy(zero_copy_only=False)
        sy = t["sy"].to_numpy(zero_copy_only=False)
        sty = t["sty"].to_numpy(zero_copy_only=False)
        st2 = t["st2"].to_numpy(zero_copy_only=False)
        out = pa.table({"cell5": t["cell"],
                        "n_hours": pa.array(n),
                        "trend_num": pa.array(n * sty - st * sy),
                        "trend_den": pa.array(n * st2 - st * st)})
        return out.filter(pa.array(n >= 2))

    return agg.map_batches(finish, batch_format="pyarrow")


# ------------------------------------------- Mann–Kendall emerging hotspot
def _mk_sql() -> str:
    x, y = points.sql_xy("event_id")
    return f"""
    WITH e AS (SELECT {cells.sql_cell('p.x', 'p.y', TREND_RES)} AS cell,
                      (CAST(epoch_us(ts) AS BIGINT) - {TREND_T0_US})
                          // {US_PER_HOUR} AS t
               FROM (SELECT event_id, ts, {x} AS x, {y} AS y
                     FROM events) p),
    c AS (SELECT cell, t, CAST(COUNT(*) AS BIGINT) AS y
          FROM e GROUP BY 1, 2),
    s AS (SELECT a.cell,
                 CAST(SUM(CASE WHEN b.y > a.y THEN 1
                               WHEN b.y < a.y THEN -1 ELSE 0 END)
                      AS BIGINT) AS mk_s
          FROM c a JOIN c b ON b.cell = a.cell AND b.t > a.t
          GROUP BY 1),
    tv AS (SELECT cell,
                  CAST(SUM(tk * (tk - 1) * (2 * tk + 5)) AS BIGINT) AS tie
           FROM (SELECT cell, y, CAST(COUNT(*) AS BIGINT) AS tk
                 FROM c GROUP BY 1, 2) GROUP BY 1),
    nh AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n FROM c GROUP BY 1)
    SELECT nh.cell AS cell5, nh.n AS n_hours, s.mk_s,
           CAST(nh.n * (nh.n - 1) * (2 * nh.n + 5) - tv.tie AS BIGINT)
               AS var18
    FROM nh JOIN s ON s.cell = nh.cell JOIN tv ON tv.cell = nh.cell
    WHERE nh.n >= 2"""


@register("mann_kendall_cells", sql=_mk_sql)
def mann_kendall_cells(sf_dir: str):
    """Emerging-hotspot trend test (the space-time-cube primitive): per
    res-5 cell, the Mann–Kendall S statistic of the hourly event-count
    series over OBSERVED hours plus the tie-corrected variance numerator
    var18 = 18·Var(S) = n(n−1)(2n+5) − Σ_k t_k(t_k−1)(2t_k+5). Both are
    pure int64 — no float crosses a block boundary; the consumer forms
    z = (S∓1)/sqrt(var18/18). Unlike the OLS slope (cell_trend_hourly)
    the statistic is rank-based, so it needs the cell's full hour series
    co-located: one hash shuffle of the per-(cell, hour) COUNT table
    (≤ cells × hours rows — the wide events table never moves), then a
    vectorized boolean-pairwise sign sum per cell (n ≤ 720 here; at a
    longer time axis, switch the per-cell kernel to the O(n log n)
    merge-count). Oracle: per-cell O(n²) self-join on the same counts."""
    import pandas as pd

    from ..stages.shuffle import grouped_apply

    ct = _event_hour_counts(sf_dir)

    def mk_bucket(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for cell, g in df.groupby("cell", sort=False):
            yv = g["y"].to_numpy(np.int64)
            n = len(yv)
            if n < 2:
                continue
            ys = yv[np.argsort(g["t"].to_numpy(np.int64))]
            gt = ys[None, :] > ys[:, None]       # bool n×n: concordant i<j
            lt = ys[None, :] < ys[:, None]
            s = int(np.triu(gt, 1).sum()) - int(np.triu(lt, 1).sum())
            _, tk = np.unique(ys, return_counts=True)
            tk = tk.astype(np.int64)
            tie = int((tk * (tk - 1) * (2 * tk + 5)).sum())
            rows.append((int(cell), n, s,
                         n * (n - 1) * (2 * n + 5) - tie))
        return pd.DataFrame(rows, columns=["cell5", "n_hours", "mk_s",
                                           "var18"]).astype(np.int64)

    return grouped_apply(ct, ["cell"], mk_bucket,
                         out_dtypes={c: pa.int64() for c in
                                     ("cell5", "n_hours", "mk_s", "var18")})


# --------------------------------------------- CUSUM change-point per cell
def _cusum_sql() -> str:
    x, y = points.sql_xy("event_id")
    return f"""
    WITH e AS (SELECT {cells.sql_cell('p.x', 'p.y', TREND_RES)} AS cell,
                      (CAST(epoch_us(ts) AS BIGINT) - {TREND_T0_US})
                          // {US_PER_HOUR} AS t
               FROM (SELECT event_id, ts, {x} AS x, {y} AS y
                     FROM events) p),
    c AS (SELECT cell, t, CAST(COUNT(*) AS BIGINT) AS y
          FROM e GROUP BY 1, 2),
    w AS (SELECT cell, t, y,
                 CAST(SUM(y) OVER (PARTITION BY cell ORDER BY t)
                      AS BIGINT) AS sk,
                 CAST(row_number() OVER (PARTITION BY cell ORDER BY t)
                      AS BIGINT) AS k
          FROM c),
    tot AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS sn FROM c GROUP BY 1),
    st AS (SELECT w.cell, w.k, w.t, tot.n, tot.sn,
                  abs(tot.n * w.sk - w.k * tot.sn) AS dev
           FROM w JOIN tot ON tot.cell = w.cell)
    SELECT cell AS cell5, n AS n_hours, sn AS n_events,
           dev AS cusum_max, t AS t_at, k AS k_at
    FROM (SELECT *, row_number() OVER (
            PARTITION BY cell ORDER BY dev DESC, k) AS rn FROM st)
    WHERE rn = 1 AND n >= 2"""


@register("cusum_change_cells", sql=_cusum_sql)
def cusum_change_cells(sf_dir: str):
    """Change-point detection per cell (CUSUM): over each res-5 cell's
    hourly count series, the maximum absolute deviation of the cumulative
    count from the uniform-rate line — scaled integer-exact as
    dev_k = |n·S_k − k·S_n| (n = observed hours, S_n = total events), so
    the statistic and its arg-hour are pure int64 (the consumer divides
    by n·S_n for the normalized CUSUM). The break hour t_at is where the
    rate shifts. Same one-shuffle shape as mann_kendall_cells; per-cell
    kernel is a vectorized prefix sum + argmax (first max ties k, both
    sides)."""
    import pandas as pd

    from ..stages.shuffle import grouped_apply

    ct = _event_hour_counts(sf_dir)

    def cusum_bucket(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for cell, g in df.groupby("cell", sort=False):
            n = len(g)
            if n < 2:
                continue
            order = np.argsort(g["t"].to_numpy(np.int64))
            tt = g["t"].to_numpy(np.int64)[order]
            yv = g["y"].to_numpy(np.int64)[order]
            sk = np.cumsum(yv)
            sn = int(sk[-1])
            k = np.arange(1, n + 1, dtype=np.int64)
            dev = np.abs(n * sk - k * sn)
            i = int(np.argmax(dev))       # first max == smallest k
            rows.append((int(cell), n, sn, int(dev[i]), int(tt[i]), i + 1))
        return pd.DataFrame(rows, columns=[
            "cell5", "n_hours", "n_events", "cusum_max", "t_at", "k_at"]
        ).astype(np.int64)

    return grouped_apply(ct, ["cell"], cusum_bucket,
                         out_dtypes={c: pa.int64() for c in
                                     ("cell5", "n_hours", "n_events",
                                      "cusum_max", "t_at", "k_at")})


# --------------------------------------------- Theil–Sen robust slope
def _theil_sen_sql() -> str:
    x, y = points.sql_xy("event_id")
    return f"""
    WITH e AS (SELECT {cells.sql_cell('p.x', 'p.y', TREND_RES)} AS cell,
                      (CAST(epoch_us(ts) AS BIGINT) - {TREND_T0_US})
                          // {US_PER_HOUR} AS t
               FROM (SELECT event_id, ts, {x} AS x, {y} AS y
                     FROM events) p),
    c AS (SELECT cell, t, CAST(COUNT(*) AS BIGINT) AS y
          FROM e GROUP BY 1, 2),
    p AS (SELECT a.cell,
                 CAST(b.y - a.y AS DOUBLE) / CAST(b.t - a.t AS DOUBLE)
                     AS slope
          FROM c a JOIN c b ON b.cell = a.cell AND b.t > a.t),
    m AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_pairs
          FROM p GROUP BY 1),
    nh AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n FROM c GROUP BY 1),
    r AS (SELECT cell, slope, row_number() OVER (
              PARTITION BY cell ORDER BY slope) AS rn FROM p)
    SELECT r.cell AS cell5, nh.n AS n_hours, m.n_pairs,
           r.slope AS ts_slope
    FROM r JOIN m ON m.cell = r.cell JOIN nh ON nh.cell = r.cell
    WHERE r.rn = (m.n_pairs - 1) // 2 + 1"""


@register("theil_sen_cells", sql=_theil_sen_sql)
def theil_sen_cells(sf_dir: str):
    """Theil–Sen robust trend per cell: the LOWER MEDIAN of all pairwise
    slopes (y_j − y_i)/(t_j − t_i) of the hourly count series — the
    outlier-resistant sibling of cell_trend_hourly's OLS (one corrupt
    hour moves OLS arbitrarily, moves Theil–Sen not at all). Each slope
    is ONE IEEE division of two int64-derived doubles evaluated
    identically on both sides, and median SELECTION (sort + index
    (m−1)//2) is value-deterministic even under float ties — so the
    estimate is hash-exact without quantization. Same one-shuffle shape
    as mann_kendall_cells; the per-cell kernel is a vectorized pairwise
    slope matrix + partition-select."""
    import pandas as pd

    from ..stages.shuffle import grouped_apply

    ct = _event_hour_counts(sf_dir)

    def ts_bucket(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for cell, g in df.groupby("cell", sort=False):
            n = len(g)
            if n < 2:
                continue
            order = np.argsort(g["t"].to_numpy(np.int64))
            tt = g["t"].to_numpy(np.int64)[order]
            yv = g["y"].to_numpy(np.int64)[order]
            iu = np.triu_indices(n, 1)
            slopes = ((yv[iu[1]] - yv[iu[0]]).astype(np.float64)
                      / (tt[iu[1]] - tt[iu[0]]).astype(np.float64))
            m = len(slopes)
            k = (m - 1) // 2
            med = float(np.partition(slopes, k)[k])
            rows.append((int(cell), n, m, med))
        out = pd.DataFrame(rows, columns=["cell5", "n_hours", "n_pairs",
                                          "ts_slope"])
        return out.astype({"cell5": "int64", "n_hours": "int64",
                           "n_pairs": "int64", "ts_slope": "float64"})

    return grouped_apply(ct, ["cell"], ts_bucket,
                         out_dtypes={"cell5": pa.int64(),
                                     "n_hours": pa.int64(),
                                     "n_pairs": pa.int64(),
                                     "ts_slope": pa.float64()})


# ------------------------------------------- language diversity per cell
@register("cell_lang_impurity", sql=lambda: f"""
    WITH pts AS (SELECT d.lang, {cells.sql_cell('p.x', 'p.y', TREND_RES)}
                     AS cell
                 FROM documents d JOIN ({_points_cte()}) p USING (doc_id)),
    cl AS (SELECT cell, lang, CAST(COUNT(*) AS BIGINT) AS n
           FROM pts GROUP BY 1, 2)
    SELECT cell AS cell5, CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_langs,
           CAST(SUM(n) AS BIGINT) * CAST(SUM(n) AS BIGINT)
               - CAST(SUM(n * n) AS BIGINT) AS imp_num
    FROM cl GROUP BY 1""")
def cell_lang_impurity(sf_dir: str):
    """Categorical diversity surface: per res-5 cell, the Gini impurity of
    the document-language mix as an exact integer rational —
    imp_num/N² = 1 − Σ(n_l/N)² (the consumer divides; entropy would need
    a log, which is never bit-stable across engines — the float playbook's
    transcendental-free rule). Shape: (cell, lang) partial counts, one
    tiny per-cell rollup with Σn and Σn² partials; the wide table never
    shuffles."""
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", ["doc_id", "lang"])
    ds = ds.map_batches(derive_and_encode("doc_id", (TREND_RES,)),
                        batch_format="pyarrow", zero_copy_batch=True,
                        batch_size=65536)
    from ..stages.shuffle import partial_group_counts
    cl = partial_group_counts(
        ds.map_batches(lambda t: t.select([f"cell{TREND_RES}", "lang"]),
                       batch_format="pyarrow"),
        [f"cell{TREND_RES}", "lang"])

    def moments(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        return pa.table({"cell": t[f"cell{TREND_RES}"],
                         "one": pa.array(np.ones(len(n), np.int64)),
                         "s": pa.array(n), "s2": pa.array(n * n)})

    agg = (cl.map_batches(moments, batch_format="pyarrow")
           .groupby("cell").aggregate(
               Sum("s", alias_name="n_docs"),
               Sum("one", alias_name="n_langs"),
               Sum("s2", alias_name="s2")))

    def finish(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["cell5", "n_docs", "n_langs", "s2"])
        nd = t["n_docs"].to_numpy(zero_copy_only=False)
        s2 = t["s2"].to_numpy(zero_copy_only=False)
        return pa.table({"cell5": t["cell5"], "n_docs": t["n_docs"],
                         "n_langs": t["n_langs"],
                         "imp_num": pa.array(nd * nd - s2)})

    return agg.map_batches(finish, batch_format="pyarrow")


# ------------------------------------------------- Sobel gradient raster
SOBEL_RES = 6


def _sobel_sql() -> str:
    mask = (1 << cells.IY_SHIFT) - 1
    return f"""
    WITH pts AS (SELECT {cells.sql_cell('x', 'y', SOBEL_RES)} AS cell
                 FROM ({_points_cte()})),
    c AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS x,
                 cell & {mask} AS ix,
                 (cell >> {cells.IY_SHIFT}) & {mask} AS iy
          FROM pts GROUP BY 1),
    g AS (SELECT a.cell,
                 CAST(SUM(b.x * (b.ix - a.ix)
                          * (2 - abs(b.iy - a.iy))) AS BIGINT) AS gx,
                 CAST(SUM(b.x * (b.iy - a.iy)
                          * (2 - abs(b.ix - a.ix))) AS BIGINT) AS gy
          FROM c a JOIN c b
          ON greatest(abs(a.ix - b.ix), abs(a.iy - b.iy)) = 1
          GROUP BY 1)
    SELECT c.cell AS cell6, c.x AS n,
           CAST(COALESCE(g.gx, 0) AS BIGINT) AS gx,
           CAST(COALESCE(g.gy, 0) AS BIGINT) AS gy
    FROM c LEFT JOIN g ON g.cell = c.cell"""


@register("sobel_gradient_cells", sql=_sobel_sql)
def sobel_gradient_cells(sf_dir: str):
    """Raster gradient (Sobel) of the res-6 document-count surface: per
    occupied cell, the integer convolution gx = Σ x_b·rx·(2−|ry|),
    gy = Σ x_b·ry·(2−|rx|) over its 8-neighborhood (empty neighbors = 0)
    — the slope/aspect primitive for density surfaces (aspect =
    atan2(gy, gx), consumer-side). Scatter-to-neighbors shape (the
    focal_density pattern with signed weights): each occupied cell SENDS
    its count to its ≤8 neighbors with the weight the RECEIVER's kernel
    assigns to that relative offset; one tiny groupby sums arrivals, one
    LEFT bucket join keeps isolated cells at gradient 0."""
    import pyarrow.compute as pc

    from ..stages.join import hash_join
    from ..stages.shuffle import partial_group_counts

    key = f"cell{SOBEL_RES}"
    mask = (1 << cells.IY_SHIFT) - 1
    n = 1 << SOBEL_RES
    cnt = partial_group_counts(
        _docs_points(sf_dir, (SOBEL_RES,)), [key]).materialize()

    def scatter(t: pa.Table) -> pa.Table:
        cell = t[key].to_numpy(zero_copy_only=False)
        x = t["n"].to_numpy(zero_copy_only=False)
        ix, iy = cell & mask, (cell >> cells.IY_SHIFT) & mask
        outc, outgx, outgy = [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                jx, jy = ix + dx, iy + dy
                ok = (jx >= 0) & (jx <= n - 1) & (jy >= 0) & (jy <= n - 1)
                # receiver at (jx, jy) sees this source at rel (-dx, -dy)
                outc.append((np.int64(SOBEL_RES) << cells.RES_SHIFT)
                            | (jy[ok] << cells.IY_SHIFT) | jx[ok])
                outgx.append(x[ok] * (-dx) * (2 - abs(dy)))
                outgy.append(x[ok] * (-dy) * (2 - abs(dx)))
        return pa.table({key: np.concatenate(outc),
                         "gx": np.concatenate(outgx),
                         "gy": np.concatenate(outgy)})

    grad = (cnt.map_batches(scatter, batch_format="pyarrow")
            .groupby(key).aggregate(Sum("gx", alias_name="gx"),
                                    Sum("gy", alias_name="gy"))
            .map_batches(lambda t: t.rename_columns([key, "gx", "gy"]),
                         batch_format="pyarrow"))
    joined = hash_join(cnt, grad, on=[key], how="left")

    def finish(t: pa.Table) -> pa.Table:
        gx = pc.fill_null(pc.cast(t["gx"], pa.int64()), 0)
        gy = pc.fill_null(pc.cast(t["gy"], pa.int64()), 0)
        return pa.table({"cell6": t[key],
                         "n": pc.cast(t["n"], pa.int64()),
                         "gx": gx, "gy": gy})

    return joined.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------- marching-squares case census
MS_RES = 6   # 64×64 occupancy raster


@register("contour_case_counts", sql=lambda: f"""
    WITH pts AS (SELECT {cells.sql_cell('x', 'y', MS_RES)} AS cell
                 FROM ({_points_cte()})),
    c AS (SELECT DISTINCT cell & {(1 << cells.IY_SHIFT) - 1} AS ix,
                 (cell >> {cells.IY_SHIFT}) & {(1 << cells.IY_SHIFT) - 1}
                     AS iy
          FROM pts),
    off AS (SELECT * FROM (VALUES (0, 0, 1), (1, 0, 2),
                                  (0, 1, 4), (1, 1, 8)) o(dx, dy, bit)),
    sc AS (SELECT c.ix - off.dx AS bx, c.iy - off.dy AS by_, off.bit
           FROM c, off),
    b AS (SELECT bx, by_, CAST(SUM(bit) AS BIGINT) AS cs
          FROM sc GROUP BY 1, 2)
    SELECT cs AS case_id, CAST(COUNT(*) AS BIGINT) AS n_blocks
    FROM b GROUP BY 1""")
def contour_case_counts(sf_dir: str):
    """Marching-squares case census over the res-6 occupancy raster — the
    raster→vector contouring primitive: every 2×2 corner block touching
    an occupied cell gets its 4-bit case index (bit = dx + 2·dy corner
    order); the census counts blocks per case (case 0, the infinite empty
    background, is excluded by construction — only blocks reachable from
    occupied corners exist). Scatter-to-blocks (each occupied cell emits
    its 4 incident blocks) + two tiny integer groupbys; the wide input
    never shuffles."""
    from ..stages.shuffle import partial_group_counts

    mask = (1 << cells.IY_SHIFT) - 1
    occ = partial_group_counts(_docs_points(sf_dir, (MS_RES,)),
                               [f"cell{MS_RES}"])

    def scatter(t: pa.Table) -> pa.Table:
        cell = t[f"cell{MS_RES}"].to_numpy(zero_copy_only=False)
        ix, iy = cell & mask, (cell >> cells.IY_SHIFT) & mask
        outk, outb = [], []
        for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
            bx, by = ix - dx, iy - dy
            outk.append((bx + 1) + ((by + 1) << 16))
            outb.append(np.full(len(ix), 1 << (dx + 2 * dy), np.int64))
        return pa.table({"bk": np.concatenate(outk),
                         "bit": np.concatenate(outb)})

    blocks = (occ.map_batches(scatter, batch_format="pyarrow")
              .groupby("bk").aggregate(Sum("bit", alias_name="cs")))
    cases = (blocks.map_batches(
        lambda t: t.select(["cs"]), batch_format="pyarrow")
        .groupby("cs").count())
    return cases.map_batches(
        lambda t: t.rename_columns(["case_id", "n_blocks"]),
        batch_format="pyarrow")


# ---------------------------------------------------- BFS hop-distance field
BFS_RES = 5
BFS_DMAX = 128   # > any possible diameter of the 32×32 occupancy graph


def _bfs_sql() -> str:
    mask = (1 << cells.IY_SHIFT) - 1
    return f"""
    WITH RECURSIVE
    pts AS (SELECT {cells.sql_cell('x', 'y', BFS_RES)} AS cell
            FROM ({_points_cte()})),
    c AS (SELECT cell, cell & {mask} AS ix,
                 (cell >> {cells.IY_SHIFT}) & {mask} AS iy
          FROM pts GROUP BY 1, 2, 3),
    e AS (SELECT a.cell AS ia, b.cell AS ib FROM c a JOIN c b
          ON abs(a.ix - b.ix) + abs(a.iy - b.iy) = 1),
    walk(cell, d) AS (
        SELECT (SELECT MIN(cell) FROM c), 0
        UNION
        SELECT e.ib, w.d + 1 FROM walk w JOIN e ON e.ia = w.cell
        WHERE w.d < {BFS_DMAX})
    SELECT cell, CAST(MIN(d) AS BIGINT) AS hops FROM walk GROUP BY 1"""


@register("cell_hop_distance", sql=_bfs_sql)
def cell_hop_distance(sf_dir: str):
    """Distance field: BFS hop distance over the res-5 occupancy raster
    (4-adjacency through OCCUPIED cells) from the minimum occupied cell.
    The occupancy graph is BOUNDED BY CONSTRUCTION (≤ 4^res cells, ≤1024
    at res 5, ≤262k at res 9), so after the distributed partial-count
    pass the wavefront runs VECTORIZED on one worker (single-batch
    map_batches — one numpy grid, one shifted-min relax per ring,
    microseconds per round) instead of paying one multi-second
    distributed round per graph-eccentricity step. For UNBOUNDED graphs
    the engine's frontier pattern is the sentinel-tagged loop used by
    `cluster_pairs_ds` / `integer_pagerank`; for a bounded raster that
    shape measured >60 rounds at sf0.1 and overflowed Ray's stats
    lineage — the bounded-side collapse is the same judgment call as
    `hot_cells`' ≤16k-cell materialization. Unreached occupied cells are
    absent from the output (matching the closure oracle)."""
    import pyarrow.compute as pc

    from ..stages.shuffle import partial_group_counts

    key = f"cell{BFS_RES}"
    mask = (1 << cells.IY_SHIFT) - 1
    n = 1 << BFS_RES
    occ = partial_group_counts(
        _docs_points(sf_dir, (BFS_RES,)), [key]).select_columns([key])

    def wavefront(t: pa.Table) -> pa.Table:
        cell = t[key].to_numpy(zero_copy_only=False)
        ix, iy = cell & mask, (cell >> cells.IY_SHIFT) & mask
        grid = np.zeros((n, n), dtype=bool)
        grid[iy, ix] = True
        big = np.int64(1) << 62          # +1 must not overflow int64
        dist = np.full((n, n), big, np.int64)
        seed = np.argmin(cell)
        dist[iy[seed], ix[seed]] = 0
        while True:
            d = dist.copy()
            d[1:, :] = np.minimum(d[1:, :], dist[:-1, :] + 1)
            d[:-1, :] = np.minimum(d[:-1, :], dist[1:, :] + 1)
            d[:, 1:] = np.minimum(d[:, 1:], dist[:, :-1] + 1)
            d[:, :-1] = np.minimum(d[:, :-1], dist[:, 1:] + 1)
            d[~grid] = big                      # only occupied cells carry
            if np.array_equal(d, dist):
                break
            dist = d
        hops = dist[iy, ix]
        reach = hops < big
        return pa.table({"cell": pa.array(cell[reach]),
                         "hops": pa.array(hops[reach])})

    return occ.repartition(1).map_batches(wavefront,
                                          batch_format="pyarrow",
                                          batch_size=None)


# --------------------------------------- weighted SSSP cost-distance field
SSSP_DMAX = 256   # path-cost enumeration bound; engine asserts max dist < it


def _sssp_sql() -> str:
    x, y = points.sql_xy("event_id")
    mask = (1 << cells.IY_SHIFT) - 1
    return f"""
    WITH RECURSIVE
    pts AS (SELECT {cells.sql_cell('x', 'y', BFS_RES)} AS cell
            FROM (SELECT event_id, {x} AS x, {y} AS y FROM events)),
    c AS (SELECT cell, cell & {mask} AS ix,
                 (cell >> {cells.IY_SHIFT}) & {mask} AS iy,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM pts GROUP BY 1, 2, 3),
    e AS MATERIALIZED (SELECT a.cell AS ia, b.cell AS ib, 1 + (b.n & 3) AS w
         FROM c a JOIN c b ON abs(a.ix - b.ix) + abs(a.iy - b.iy) = 1),
    walk(cell, d) AS (
        SELECT (SELECT MIN(cell) FROM c), 0
        UNION
        SELECT e.ib, wk.d + e.w FROM walk wk JOIN e ON e.ia = wk.cell
        WHERE wk.d + e.w <= {SSSP_DMAX})
    SELECT cell, CAST(MIN(d) AS BIGINT) AS dist FROM walk GROUP BY 1"""


@register("cell_sssp_weighted", sql=_sssp_sql)
def cell_sssp_weighted(sf_dir: str):
    """Cost-distance field (weighted SSSP): least-cost path distance from
    the minimum occupied res-5 cell through the event-occupancy raster,
    where ENTERING cell v costs 1 + (count_v & 3) — the terrain/friction
    accumulated-cost surface (the weighted sibling of cell_hop_distance's
    BFS). Same bounded-raster judgment: after the distributed
    partial-count pass the ≤4^res count table collapses to one worker
    and Bellman–Ford relaxes vectorized over the whole grid per round
    (rounds ≤ the max cost, each one 4 shifted adds + a min). The oracle
    enumerates (cell, path-cost) pairs ≤ SSSP_DMAX through a recursive
    CTE and takes MIN per cell; the engine asserts its max distance stays
    below the bound so the truncation provably never clips a shortest
    path. Unreached cells are absent on both sides."""
    from ..stages.shuffle import partial_group_counts

    key = f"cell{BFS_RES}"
    mask = (1 << cells.IY_SHIFT) - 1
    n = 1 << BFS_RES

    ev = read_table(sf_dir, "events", ["event_id"])
    pts = ev.map_batches(derive_and_encode("event_id", (BFS_RES,)),
                         batch_format="pyarrow", zero_copy_batch=True)
    occ = partial_group_counts(pts, [key])

    def relax(t: pa.Table) -> pa.Table:
        cell = t[key].to_numpy(zero_copy_only=False)
        cnt = t["n"].to_numpy(zero_copy_only=False)
        ix, iy = cell & mask, (cell >> cells.IY_SHIFT) & mask
        grid = np.zeros((n, n), dtype=bool)
        grid[iy, ix] = True
        w = np.zeros((n, n), np.int64)           # cost to ENTER each cell
        w[iy, ix] = 1 + (cnt & 3)
        big = np.int64(1) << 62
        dist = np.full((n, n), big, np.int64)
        seed = np.argmin(cell)
        dist[iy[seed], ix[seed]] = 0
        while True:
            d = dist.copy()
            d[1:, :] = np.minimum(d[1:, :], dist[:-1, :] + w[1:, :])
            d[:-1, :] = np.minimum(d[:-1, :], dist[1:, :] + w[:-1, :])
            d[:, 1:] = np.minimum(d[:, 1:], dist[:, :-1] + w[:, 1:])
            d[:, :-1] = np.minimum(d[:, :-1], dist[:, 1:] + w[:, :-1])
            d[~grid] = big
            if np.array_equal(d, dist):
                break
            dist = d
        dd = dist[iy, ix]
        reach = dd < big
        if reach.any() and int(dd[reach].max()) >= SSSP_DMAX:
            raise RuntimeError(
                f"cell_sssp_weighted: max distance {int(dd[reach].max())} "
                f"reached the oracle enumeration bound {SSSP_DMAX} — "
                f"raise SSSP_DMAX on both sides")
        return pa.table({"cell": pa.array(cell[reach]),
                         "dist": pa.array(dd[reach])})

    return occ.repartition(1).map_batches(relax, batch_format="pyarrow",
                                          batch_size=None)


# --------------------------------------------- distance-to-nearest enrich
NEAR_RES = 6


@register("dist_to_nearest_supplier", sql=lambda: f"""
    WITH d AS (SELECT {cells.sql_cell('x', 'y', NEAR_RES)} AS cell
               FROM ({_points_cte()})),
    dc AS (SELECT cell, cell & {(1 << cells.IY_SHIFT) - 1} AS ix,
                  (cell >> {cells.IY_SHIFT})
                      & {(1 << cells.IY_SHIFT) - 1} AS iy,
                  CAST(COUNT(*) AS BIGINT) AS n_docs
           FROM d GROUP BY 1, 2, 3),
    s AS (SELECT DISTINCT
                 {cells.sql_cell('x', 'y', NEAR_RES)}
                     & {(1 << cells.IY_SHIFT) - 1} AS sx,
                 ({cells.sql_cell('x', 'y', NEAR_RES)}
                     >> {cells.IY_SHIFT})
                     & {(1 << cells.IY_SHIFT) - 1} AS sy
          FROM (SELECT s_suppkey AS doc_id, p.x, p.y
                FROM (SELECT s_suppkey,
                             {points.sql_xy('s_suppkey')[0]} AS x,
                             {points.sql_xy('s_suppkey')[1]} AS y
                      FROM supplier) p))
    SELECT dc.cell, dc.n_docs,
           CAST(MIN(abs(dc.ix - s.sx) + abs(dc.iy - s.sy)) AS BIGINT)
               AS d_cells
    FROM dc, s GROUP BY 1, 2""")
def dist_to_nearest_supplier(sf_dir: str):
    """Proximity enrichment (grid distance transform by broadcast): every
    occupied document cell gets the manhattan cell distance to its
    nearest supplier cell. The seed set (supplier cells, deduped) is tiny
    — broadcast once via ray.put; each count-table batch takes a
    vectorized min over the seed matrix. No shuffle beyond the partial
    counts; the wide input never moves."""
    import pyarrow.compute as pc

    from ..stages.shuffle import partial_group_counts

    mask = (1 << cells.IY_SHIFT) - 1
    key = f"cell{NEAR_RES}"
    cnt = partial_group_counts(_docs_points(sf_dir, (NEAR_RES,)), [key],
                               count_col="n_docs")

    sup = read_table(sf_dir, "supplier", ["s_suppkey"]).to_pandas()
    sx, sy = points.derive_xy(sup["s_suppkey"].to_numpy(np.int64))
    six, siy = cells.cell_xy(sx, sy, NEAR_RES)
    seeds = np.unique(six * (np.int64(1) << 32) + siy)
    seed_ref = ray.put((seeds >> 32, seeds & ((np.int64(1) << 32) - 1)))

    def nearest(t: pa.Table) -> pa.Table:
        ssx, ssy = ray.get(seed_ref)
        cell = t[key].to_numpy(zero_copy_only=False)
        ix, iy = cell & mask, (cell >> cells.IY_SHIFT) & mask
        d = (np.abs(ix[:, None] - ssx[None, :])
             + np.abs(iy[:, None] - ssy[None, :])).min(axis=1)
        return pa.table({"cell": pa.array(cell),
                         "n_docs": pc.cast(t["n_docs"], pa.int64()),
                         "d_cells": pa.array(d.astype(np.int64))})

    return cnt.map_batches(nearest, batch_format="pyarrow")


# ------------------------------------------------ layout locality compare
@register("curve_locality_compare", sql=lambda: f"""
    WITH d AS (SELECT {cells.sql_cell('x', 'y', HILBERT_ORDER)} AS cell
               FROM ({_points_cte()})),
    c AS (SELECT cell, cell & {(1 << cells.IY_SHIFT) - 1} AS ix,
                 (cell >> {cells.IY_SHIFT})
                     & {(1 << cells.IY_SHIFT) - 1} AS iy
          FROM d GROUP BY 1, 2, 3),
    src AS (SELECT cell AS id, ix AS hx, iy AS hy FROM c),
    {hilbert.sql_hilbert_ctes('src', HILBERT_ORDER)},
    k AS (SELECT c.cell, c.ix, c.iy, hd.hd,
                 {hilbert.sql_morton('c.ix', 'c.iy')} AS mz
          FROM c JOIN hd ON hd.id = c.cell),
    sh AS (SELECT CAST(SUM(st) AS BIGINT) AS s FROM (
             SELECT abs(ix - lag(ix) OVER w) + abs(iy - lag(iy) OVER w)
                 AS st FROM k WINDOW w AS (ORDER BY hd, cell))),
    sm AS (SELECT CAST(SUM(st) AS BIGINT) AS s FROM (
             SELECT abs(ix - lag(ix) OVER w) + abs(iy - lag(iy) OVER w)
                 AS st FROM k WINDOW w AS (ORDER BY mz, cell))),
    sr AS (SELECT CAST(SUM(st) AS BIGINT) AS s FROM (
             SELECT abs(ix - lag(ix) OVER w) + abs(iy - lag(iy) OVER w)
                 AS st FROM k WINDOW w AS (ORDER BY cell)))
    SELECT CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_cells,
           (SELECT s FROM sh) AS step_hilbert,
           (SELECT s FROM sm) AS step_morton,
           (SELECT s FROM sr) AS step_rowmajor""")
def curve_locality_compare(sf_dir: str):
    """Measured justification of the Hilbert layout key: total manhattan
    step length when walking the OCCUPIED res-8 cells in Hilbert order
    vs Z-order (Morton) vs row-major cell-id order — lower total step =
    consecutive keys stay physically adjacent = a bbox reader touches
    fewer, longer key ranges. The occupied-cell table is bounded
    (≤ 4^res), so the three orderings run vectorized on one worker after
    the distributed count pass. Integer-exact twin (bit-identical Hilbert
    CTE chain + Morton bit-interleave)."""
    import pyarrow.compute as pc

    from ..stages.shuffle import partial_group_counts

    mask = (1 << cells.IY_SHIFT) - 1
    key = f"cell{HILBERT_ORDER}"
    occ = partial_group_counts(
        _docs_points(sf_dir, (HILBERT_ORDER,)), [key]).select_columns(
        [key])

    def walk(t: pa.Table) -> pa.Table:
        cell = np.sort(t[key].to_numpy(zero_copy_only=False))
        ix, iy = cell & mask, (cell >> cells.IY_SHIFT) & mask
        hd = hilbert.xy_to_d(ix, iy, HILBERT_ORDER)
        mz = hilbert.xy_to_morton(ix, iy)

        def steps(order_key):
            o = np.lexsort((cell, order_key))
            return int(np.abs(np.diff(ix[o])).sum()
                       + np.abs(np.diff(iy[o])).sum())

        return pa.table({
            "n_cells": pa.array([len(cell)], pa.int64()),
            "step_hilbert": pa.array([steps(hd)], pa.int64()),
            "step_morton": pa.array([steps(mz)], pa.int64()),
            "step_rowmajor": pa.array([steps(cell)], pa.int64())})

    return occ.repartition(1).map_batches(walk, batch_format="pyarrow",
                                          batch_size=None)


# ------------------------------------------------- hilbert range cover
# demo query bbox (mid-south Finland, ~1°×1° → a few hundred res-8 cells)
RC_BBOX = (24.5, 60.0, 25.5, 61.0)


def _range_cover_sql() -> str:
    from ..functions.points import _d
    n = 1 << HILBERT_ORDER
    x0, y0, x1, y1 = RC_BBOX
    w, h = points._W, points._H

    def ix_expr(x):
        return (f"CAST(LEAST(GREATEST(floor((CAST('{x}' AS DOUBLE) - "
                f"{_d(points.FIN_X0)}) / {_d(w)} * {float(n)}), 0), "
                f"{n - 1}) AS BIGINT)")

    def iy_expr(y):
        return (f"CAST(LEAST(GREATEST(floor((CAST('{y}' AS DOUBLE) - "
                f"{_d(points.FIN_Y0)}) / {_d(h)} * {float(n)}), 0), "
                f"{n - 1}) AS BIGINT)")

    return f"""
    WITH b AS (SELECT {ix_expr(x0)} AS lox, {ix_expr(x1)} AS hix,
                      {iy_expr(y0)} AS loy, {iy_expr(y1)} AS hiy),
    src AS (SELECT (gy.y << 32) | gx.x AS id,
                   gx.x AS hx, gy.y AS hy
            FROM b,
                 (SELECT unnest(generate_series(0, {n - 1})) AS x) gx,
                 (SELECT unnest(generate_series(0, {n - 1})) AS y) gy
            WHERE gx.x BETWEEN b.lox AND b.hix
              AND gy.y BETWEEN b.loy AND b.hiy),
    {hilbert.sql_hilbert_ctes('src', HILBERT_ORDER)},
    o AS (SELECT hd.hd AS k FROM hd),
    g AS (SELECT k, CASE WHEN k - lag(k) OVER (ORDER BY k) = 1
                         THEN 0 ELSE 1 END AS brk
          FROM o),
    r AS (SELECT k, SUM(brk) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)
                        AS rid
          FROM g)
    SELECT CAST(MIN(k) AS BIGINT) AS range_start,
           CAST(MAX(k) AS BIGINT) AS range_end,
           CAST(COUNT(*) AS BIGINT) AS n_cells
    FROM r GROUP BY rid"""


@register("bbox_cover_ranges", sql=_range_cover_sql)
def bbox_cover_ranges(sf_dir: str):
    """The read-pruning primitive the Hilbert sink key exists for: turn a
    query bbox into the MINIMAL set of contiguous Hilbert-key ranges
    covering it (a reader of hilbert-sorted parquet seeks exactly these
    key ranges — few long ranges, thanks to the curve's locality, vs the
    per-scanline fragments a row-major layout needs). Cover cells →
    Hilbert keys → gaps-and-islands merge of consecutive keys; the cover
    set is bounded by the bbox area so the merge runs on one worker."""
    import pyarrow.compute as pc

    x0, y0, x1, y1 = RC_BBOX
    cover = np.array(cells.cover_bbox(x0, y0, x1, y1, HILBERT_ORDER),
                     dtype=np.int64)
    mask = (1 << cells.IY_SHIFT) - 1
    ix, iy = cover & mask, (cover >> cells.IY_SHIFT) & mask
    keys = np.sort(hilbert.xy_to_d(ix, iy, HILBERT_ORDER))
    ds = ray.data.from_arrow(pa.table({"k": pa.array(keys)}))

    def merge_runs(t: pa.Table) -> pa.Table:
        k = np.sort(t["k"].to_numpy(zero_copy_only=False))
        brk = np.empty(len(k), dtype=bool)
        brk[0] = True
        brk[1:] = np.diff(k) != 1
        rid = np.cumsum(brk) - 1
        starts = k[brk]
        ends = np.append(k[np.flatnonzero(brk)[1:] - 1], k[-1])
        counts = np.bincount(rid).astype(np.int64)
        return pa.table({"range_start": pa.array(starts),
                         "range_end": pa.array(ends),
                         "n_cells": pa.array(counts)})

    return ds.repartition(1).map_batches(merge_runs,
                                         batch_format="pyarrow",
                                         batch_size=None)


# ---------------------------------------------- segment-intersection join
SEG_RES = 5
SEG_CAP_U = 500_000       # segment length cap (µdeg, per axis)


def _crossings_sql() -> str:
    x, y = points.sql_xy("event_id")
    return f"""
    WITH e AS (SELECT user_id, ts, event_id,
                      CAST(floor({x} * 1000000) AS BIGINT) AS qx,
                      CAST(floor({y} * 1000000) AS BIGINT) AS qy
               FROM events),
    seg AS (SELECT event_id AS seg_id, qx AS ax, qy AS ay,
                   lead(qx) OVER w AS bx, lead(qy) OVER w AS by_
            FROM e WINDOW w AS (PARTITION BY user_id
                                ORDER BY ts, event_id)),
    s AS (SELECT * FROM seg
          WHERE bx IS NOT NULL
            AND GREATEST(abs(bx - ax), abs(by_ - ay)) <= {SEG_CAP_U}),
    pr AS (SELECT s1.seg_id AS sa, s2.seg_id AS sb,
                  (s1.bx - s1.ax) * (s2.ay - s1.ay)
                      - (s1.by_ - s1.ay) * (s2.ax - s1.ax) AS d1,
                  (s1.bx - s1.ax) * (s2.by_ - s1.ay)
                      - (s1.by_ - s1.ay) * (s2.bx - s1.ax) AS d2,
                  (s2.bx - s2.ax) * (s1.ay - s2.ay)
                      - (s2.by_ - s2.ay) * (s1.ax - s2.ax) AS d3,
                  (s2.bx - s2.ax) * (s1.by_ - s2.ay)
                      - (s2.by_ - s2.ay) * (s1.bx - s2.ax) AS d4
           FROM s s1 JOIN s s2 ON s1.seg_id < s2.seg_id)
    SELECT CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_segments,
           CAST(SUM(CASE WHEN ((d1 > 0 AND d2 < 0) OR (d1 < 0 AND d2 > 0))
                          AND ((d3 > 0 AND d4 < 0) OR (d3 < 0 AND d4 > 0))
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_crossings
    FROM pr"""


@register("trajectory_crossings", sql=_crossings_sql)
def trajectory_crossings(sf_dir: str):
    """Segment-intersection join (ST_Intersects on linestrings): count
    PROPER crossings between user-trajectory segments (length-capped;
    strict straddle test — shared endpoints and collinear touches don't
    count). Exact integer orientation tests on µdeg coordinates; one
    user-keyed shuffle builds the segments, a grid bbox cover cogroups
    candidates, and each pair is TESTED only in the minimum cell of the
    two covers' shared rectangle (computable from both bboxes inside the
    bucket) — exactly-once per pair with no dedup shuffle and no repeated
    work in the cells the pair also shares. Pair tests run in fixed-size
    row chunks so temporaries stay bounded in dense cells. The oracle is
    the O(n²) join with the same sign tests."""
    import pandas as pd
    import pyarrow.compute as pc

    from ..stages.shuffle import grouped_apply

    n_grid = 1 << SEG_RES

    ev = read_table(sf_dir, "events", ["event_id", "user_id", "ts"])

    def to_rows(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        x, y = points.derive_xy(eid)
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "t": pc.cast(t["ts"], pa.int64()),
            "event_id": pa.array(eid.astype(np.int64)),
            "qx": pa.array(np.floor(x * 1e6).astype(np.int64)),
            "qy": pa.array(np.floor(y * 1e6).astype(np.int64))})

    rows = ev.map_batches(to_rows, batch_format="pyarrow")

    def make_segments(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "t", "event_id"],
                            kind="mergesort").reset_index(drop=True)
        u = df["user_id"].to_numpy(np.int64)
        qx = df["qx"].to_numpy(np.int64)
        qy = df["qy"].to_numpy(np.int64)
        same = np.empty(len(df), dtype=bool)
        same[:-1] = u[1:] == u[:-1]
        same[-1] = False
        ax, ay = qx[same], qy[same]
        nxt = np.flatnonzero(same) + 1
        bx, by = qx[nxt], qy[nxt]
        keep = np.maximum(np.abs(bx - ax), np.abs(by - ay)) <= SEG_CAP_U
        return pd.DataFrame({
            "seg_id": df["event_id"].to_numpy(np.int64)[same][keep],
            "ax": ax[keep], "ay": ay[keep],
            "bx": bx[keep], "by": by[keep]})

    # spill, don't pin: the segment table is a shuffle product
    # (per-user cogroup) and events-proportional; two consumers
    # (count + cell cover) re-read the Parquet
    from ..state.spill import spill_checkpoint

    read_segs = spill_checkpoint(
        grouped_apply(rows, ["user_id"], make_segments), "traj_segs",
        # micro-degree coords are int64 (make_segments emits qx/qy
        # int64) — the sentinel schema must match the non-empty dtype
        schema=pa.schema([("seg_id", pa.int64()), ("ax", pa.int64()),
                          ("ay", pa.int64()), ("bx", pa.int64()),
                          ("by", pa.int64())]))
    segs = read_segs()
    n_segments = read_segs(columns=["seg_id"]).count()

    def cover(t: pa.Table) -> pa.Table:
        ax = t["ax"].to_numpy(zero_copy_only=False)
        ay = t["ay"].to_numpy(zero_copy_only=False)
        bx = t["bx"].to_numpy(zero_copy_only=False)
        by = t["by"].to_numpy(zero_copy_only=False)
        sid = t["seg_id"].to_numpy(zero_copy_only=False)
        x0 = np.minimum(ax, bx) / 1e6
        x1 = np.maximum(ax, bx) / 1e6
        y0 = np.minimum(ay, by) / 1e6
        y1 = np.maximum(ay, by) / 1e6
        lox, loy = cells.cell_xy(x0, y0, SEG_RES)
        hix, hiy = cells.cell_xy(x1, y1, SEG_RES)
        nx, ny = hix - lox + 1, hiy - loy + 1
        cnt = nx * ny
        idx = np.repeat(np.arange(len(sid), dtype=np.int64), cnt)
        starts = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        k = np.arange(int(cnt.sum()), dtype=np.int64) - starts[idx]
        kx = k % nx[idx]
        ky = k // nx[idx]
        cellv = ((np.int64(SEG_RES) << cells.RES_SHIFT)
                 | ((loy[idx] + ky) << cells.IY_SHIFT) | (lox[idx] + kx))
        return pa.table({"cell": pa.array(cellv),
                         "seg_id": pa.array(sid[idx]),
                         "ax": pa.array(ax[idx]), "ay": pa.array(ay[idx]),
                         "bx": pa.array(bx[idx]), "by": pa.array(by[idx])})

    exploded = segs.map_batches(cover, batch_format="pyarrow")

    def per_cell(df: pd.DataFrame) -> pd.DataFrame:
        total = 0
        for cellv, g in df.groupby("cell", sort=False):
            m = len(g)
            if m < 2:
                continue
            sid = g["seg_id"].to_numpy(np.int64)
            ax = g["ax"].to_numpy(np.int64)
            ay = g["ay"].to_numpy(np.int64)
            bx = g["bx"].to_numpy(np.int64)
            by = g["by"].to_numpy(np.int64)
            rx, ry = bx - ax, by - ay
            # each pair is tested ONLY where the bucket equals the MIN
            # cell of the two covers' shared rectangle — exactly-once
            # across all shared cells, recomputed from the bboxes
            x0 = np.minimum(ax, bx) / 1e6
            x1 = np.maximum(ax, bx) / 1e6
            y0 = np.minimum(ay, by) / 1e6
            y1 = np.maximum(ay, by) / 1e6
            lox, loy = cells.cell_xy(x0, y0, SEG_RES)
            cix = int(cellv) & ((1 << cells.IY_SHIFT) - 1)
            ciy = (int(cellv) >> cells.IY_SHIFT) \
                & ((1 << cells.IY_SHIFT) - 1)
            chunk = 512
            for lo in range(0, m, chunk):
                hi = min(lo + chunk, m)
                sl = slice(lo, hi)
                home = (np.maximum(lox[sl, None], lox[None, :]) == cix) \
                    & (np.maximum(loy[sl, None], loy[None, :]) == ciy) \
                    & (sid[sl, None] < sid[None, :])
                if not home.any():
                    continue
                d1 = rx[sl, None] * (ay[None, :] - ay[sl, None]) \
                    - ry[sl, None] * (ax[None, :] - ax[sl, None])
                d2 = rx[sl, None] * (by[None, :] - ay[sl, None]) \
                    - ry[sl, None] * (bx[None, :] - ax[sl, None])
                s12 = ((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))
                d3 = rx[None, :] * (ay[sl, None] - ay[None, :]) \
                    - ry[None, :] * (ax[sl, None] - ax[None, :])
                d4 = rx[None, :] * (by[sl, None] - ay[None, :]) \
                    - ry[None, :] * (bx[sl, None] - ax[None, :])
                s34 = ((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0))
                total += int((home & s12 & s34).sum())
        return pd.DataFrame({"c": pd.Series([total], dtype="int64")})

    from ray.data.aggregate import Sum
    agg = grouped_apply(exploded, ["cell"], per_cell).aggregate(
        Sum("c", alias_name="n_crossings"))
    return pd.DataFrame({
        "n_segments": np.array([n_segments], np.int64),
        "n_crossings": np.array([int(agg["n_crossings"])], np.int64)})


# ------------------------------------------------------- Gini concentration
@register("province_gini_cells", sql=lambda: f"""
    WITH pts AS (SELECT {cells.sql_cell('x', 'y', RES)} AS cell
                 FROM ({_points_cte()})),
    pc_ AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n FROM pts
            GROUP BY 1),
    pr AS (SELECT cell & {(1 << cells.IY_SHIFT) - 1} AS ix,
                  (cell >> {cells.IY_SHIFT})
                      & {(1 << cells.IY_SHIFT) - 1} AS iy, n
           FROM pc_),
    g AS (SELECT iy // {1 << (RES - 3)} AS band, n,
                 row_number() OVER (PARTITION BY iy // {1 << (RES - 3)}
                                    ORDER BY n, ix, iy) AS rk,
                 COUNT(*) OVER (PARTITION BY iy // {1 << (RES - 3)}) AS m,
                 CAST(SUM(n) OVER (PARTITION BY iy // {1 << (RES - 3)})
                      AS BIGINT) AS s
           FROM pr)
    SELECT band, CAST(MIN(m) AS BIGINT) AS n_cells, MIN(s) AS n_docs,
           CAST(SUM((2 * rk - m - 1) * n) AS BIGINT) AS gini_num,
           CAST(MIN(m) * MIN(s) AS BIGINT) AS gini_den
    FROM g GROUP BY 1""")
def province_gini_cells(sf_dir: str):
    """Spatial concentration (inequality) index: per latitude band, the
    Gini coefficient of per-cell document counts via the sorted-rank
    identity G = Σ(2·rank − n − 1)·x / (n·Σx) — pure integers once each
    band's occupied cells sort locally (ONE band-keyed shuffle of the
    tiny count table; deterministic ties by (n, ix, iy)). High Gini =
    observations concentrated in few cells (the Helsinki skew shows up
    directly); the consumer divides num/den."""
    import pandas as pd
    import pyarrow.compute as pc

    from ..stages.shuffle import grouped_apply, partial_group_counts

    mask = (1 << cells.IY_SHIFT) - 1
    key = f"cell{RES}"
    cnt = partial_group_counts(_docs_points(sf_dir), [key])

    def band_rows(t: pa.Table) -> pa.Table:
        cell = t[key].to_numpy(zero_copy_only=False)
        ix, iy = cell & mask, (cell >> cells.IY_SHIFT) & mask
        return pa.table({"band": pa.array(iy >> (RES - 3)),
                         "ix": pa.array(ix), "iy": pa.array(iy),
                         "n": pc.cast(t["n"], pa.int64())})

    rows = cnt.map_batches(band_rows, batch_format="pyarrow")

    def gini(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for band, g in df.groupby("band", sort=False):
            g = g.sort_values(["n", "ix", "iy"], kind="mergesort")
            n = g["n"].to_numpy(np.int64)
            m = len(n)
            s = int(n.sum())
            rk = np.arange(1, m + 1, dtype=np.int64)
            num = int(((2 * rk - m - 1) * n).sum())
            out.append((band, m, s, num, m * s))
        return pd.DataFrame(out, columns=["band", "n_cells", "n_docs",
                                          "gini_num", "gini_den"]) \
            .astype("int64")

    return grouped_apply(rows, ["band"], gini, num_buckets=8)


# ------------------------------------------- spatially balanced sampling
SYS_EVERY = 10


@register("hilbert_systematic_sample", sql=lambda: f"""
    WITH d AS (SELECT {cells.sql_cell('x', 'y', HILBERT_ORDER)} AS cell
               FROM ({_points_cte()})),
    c AS (SELECT cell, cell & {(1 << cells.IY_SHIFT) - 1} AS hx,
                 (cell >> {cells.IY_SHIFT})
                     & {(1 << cells.IY_SHIFT) - 1} AS hy,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM d GROUP BY 1, 2, 3),
    src AS (SELECT cell AS id, hx, hy FROM c),
    {hilbert.sql_hilbert_ctes('src', HILBERT_ORDER)},
    r AS (SELECT c.cell, c.n, hd.hd,
                 row_number() OVER (ORDER BY hd.hd, c.cell) AS rk
          FROM c JOIN hd ON hd.id = c.cell)
    SELECT cell, n, CAST(hd AS BIGINT) AS hd
    FROM r WHERE (rk - 1) % {SYS_EVERY} = 0""")
def hilbert_systematic_sample(sf_dir: str):
    """Spatially balanced sampling (survey design): every {SYS_EVERY}-th
    OCCUPIED cell along the Hilbert walk — systematic sampling on a
    space-filling curve spreads the sample evenly over the occupied
    territory (the GRTS idea in its deterministic form), unlike uniform
    row sampling which re-concentrates in the dense cluster. Bounded
    occupied-cell table → one vectorized rank pass."""
    import pyarrow.compute as pc

    from ..stages.shuffle import partial_group_counts

    mask = (1 << cells.IY_SHIFT) - 1
    key = f"cell{HILBERT_ORDER}"
    occ = partial_group_counts(_docs_points(sf_dir, (HILBERT_ORDER,)),
                               [key])

    def pick(t: pa.Table) -> pa.Table:
        cell = t[key].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        hx, hy = cell & mask, (cell >> cells.IY_SHIFT) & mask
        hd = hilbert.xy_to_d(hx, hy, HILBERT_ORDER)
        o = np.lexsort((cell, hd))
        keep = o[::SYS_EVERY]
        return pa.table({"cell": pa.array(cell[keep]),
                         "n": pa.array(n[keep].astype(np.int64)),
                         "hd": pa.array(hd[keep])})

    return occ.repartition(1).map_batches(pick, batch_format="pyarrow",
                                          batch_size=None)


# ------------------------------------------------- pruned-read efficiency
def _pruned_read_sql() -> str:
    n = 1 << HILBERT_ORDER
    x0, y0, x1, y1 = RC_BBOX
    # the cover rectangle bounds (same float ops as cells.cover_bbox)
    from ..functions.points import _d
    w, h = points._W, points._H

    def gex(v, lo_const, span):
        return (f"CAST(LEAST(GREATEST(floor((CAST('{v}' AS DOUBLE) - "
                f"{_d(lo_const)}) / {_d(span)} * {float(n)}), 0), "
                f"{n - 1}) AS BIGINT)")

    ranges = _range_cover_sql()
    return f"""
    WITH pts AS (SELECT doc_id, x, y,
                        {cells.sql_cell('x', 'y', HILBERT_ORDER)} AS cell
                 FROM ({_points_cte()})),
    b AS (SELECT {gex(x0, points.FIN_X0, w)} AS lox,
                 {gex(x1, points.FIN_X0, w)} AS hix,
                 {gex(y0, points.FIN_Y0, h)} AS loy,
                 {gex(y1, points.FIN_Y0, h)} AS hiy),
    rc AS ({ranges})
    SELECT CAST((SELECT COUNT(*) FROM rc) AS BIGINT) AS n_ranges,
           CAST((SELECT COUNT(*) FROM pts, b
                 WHERE (pts.cell & {(1 << cells.IY_SHIFT) - 1})
                           BETWEEN b.lox AND b.hix
                   AND ((pts.cell >> {cells.IY_SHIFT})
                        & {(1 << cells.IY_SHIFT) - 1})
                           BETWEEN b.loy AND b.hiy) AS BIGINT)
               AS n_scanned,
           CAST((SELECT COUNT(*) FROM pts
                 WHERE x >= CAST('{x0}' AS DOUBLE)
                   AND x <= CAST('{x1}' AS DOUBLE)
                   AND y >= CAST('{y0}' AS DOUBLE)
                   AND y <= CAST('{y1}' AS DOUBLE)) AS BIGINT) AS n_hits"""


@register("hilbert_pruned_read", sql=_pruned_read_sql)
def hilbert_pruned_read(sf_dir: str):
    """End-to-end proof of the layout story: a bbox reader over
    hilbert-sorted output seeks only the covering key ranges
    (`bbox_cover_ranges`), post-filters the exact bbox, and must find
    every hit. Reported: n_ranges (seeks), n_scanned (rows inside the
    key ranges = the I/O actually read) and n_hits (exact bbox rows) —
    n_scanned/n_hits is the measured read amplification of the pruning.
    The range membership test is a vectorized searchsorted against the
    broadcast range starts/ends."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    x0, y0, x1, y1 = RC_BBOX
    cover = np.array(cells.cover_bbox(x0, y0, x1, y1, HILBERT_ORDER),
                     dtype=np.int64)
    mask = (1 << cells.IY_SHIFT) - 1
    cix, ciy = cover & mask, (cover >> cells.IY_SHIFT) & mask
    keys = np.sort(hilbert.xy_to_d(cix, ciy, HILBERT_ORDER))
    brk = np.empty(len(keys), dtype=bool)
    brk[0] = True
    brk[1:] = np.diff(keys) != 1
    starts = keys[brk]
    ends = np.append(keys[np.flatnonzero(brk)[1:] - 1], keys[-1])
    n_ranges = len(starts)
    rng_ref = ray.put((starts, ends))

    ds = _docs_points(sf_dir, (HILBERT_ORDER,))

    def scan(t: pa.Table) -> pa.Table:
        s, e = ray.get(rng_ref)
        cell = t[f"cell{HILBERT_ORDER}"].to_numpy(zero_copy_only=False)
        hx, hy = cell & mask, (cell >> cells.IY_SHIFT) & mask
        hd = hilbert.xy_to_d(hx, hy, HILBERT_ORDER)
        pos = np.searchsorted(s, hd, side="right") - 1
        in_rng = (pos >= 0) & (hd <= e[np.clip(pos, 0, len(e) - 1)])
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        hit = in_rng & (x >= x0) & (x <= x1) & (y >= y0) & (y <= y1)
        return pa.table({
            "scanned": pa.array([int(in_rng.sum())], pa.int64()),
            "hits": pa.array([int(hit.sum())], pa.int64())})

    agg = ds.map_batches(scan, batch_format="pyarrow").aggregate(
        Sum("scanned", alias_name="n_scanned"),
        Sum("hits", alias_name="n_hits"))
    import pandas as pd
    return pd.DataFrame({
        "n_ranges": np.array([n_ranges], np.int64),
        "n_scanned": np.array([int(agg["n_scanned"])], np.int64),
        "n_hits": np.array([int(agg["n_hits"])], np.int64)})


# -------------------------------------------------- Getis-Ord G* hotspots
GI_Z = 2   # hotspot threshold (z > 2 ≈ 95%)


@register("hotspot_gi_cells", sql=lambda: f"""
    WITH pts AS (SELECT {cells.sql_cell('x', 'y', RES)} AS cell
                 FROM ({_points_cte()})),
    c AS (SELECT cell, (cell >> {cells.IY_SHIFT})
                           & {(1 << cells.IY_SHIFT) - 1} AS iy,
                 cell & {(1 << cells.IY_SHIFT) - 1} AS ix,
                 CAST(COUNT(*) AS BIGINT) AS x
          FROM pts GROUP BY 1),
    gmo AS (SELECT CAST(SUM(x) AS BIGINT) AS s,
                    CAST(SUM(x * x) AS BIGINT) AS s2 FROM c),
    off AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),
                                  (0,1),(1,-1),(1,0),(1,1)) o(dx, dy)),
    sc AS (SELECT ((CAST({RES} AS BIGINT) << {cells.RES_SHIFT})
                   | ((iy + dy) << {cells.IY_SHIFT}) | (ix + dx)) AS cell,
                  ix + dx AS jx, iy + dy AS jy, x
           FROM c, off
           WHERE ix + dx BETWEEN 0 AND {(1 << RES) - 1}
             AND iy + dy BETWEEN 0 AND {(1 << RES) - 1}),
    f AS (SELECT cell, MIN(jx) AS jx, MIN(jy) AS jy,
                 CAST(SUM(x) AS BIGINT) AS t FROM sc GROUP BY 1),
    k AS (SELECT cell, t,
                 CAST((CASE WHEN jx = 0 OR jx = {(1 << RES) - 1}
                            THEN 2 ELSE 3 END)
                      * (CASE WHEN jy = 0 OR jy = {(1 << RES) - 1}
                              THEN 2 ELSE 3 END) AS BIGINT) AS k
          FROM f)
    SELECT k.cell AS cell7, k.t, k.k FROM k, gmo
    WHERE CAST({1 << (2 * RES)} AS HUGEINT) * k.t > CAST(k.k AS HUGEINT)
              * gmo.s
      AND CAST(CAST({1 << (2 * RES)} AS HUGEINT) * k.t
               - CAST(k.k AS HUGEINT) * gmo.s AS HUGEINT)
          * CAST(CAST({1 << (2 * RES)} AS HUGEINT) * k.t
                 - CAST(k.k AS HUGEINT) * gmo.s AS HUGEINT)
          * CAST({(1 << (2 * RES)) - 1} AS HUGEINT)
          > CAST({GI_Z * GI_Z} AS HUGEINT)
            * (CAST({1 << (2 * RES)} AS HUGEINT) * gmo.s2
               - CAST(gmo.s AS HUGEINT) * gmo.s)
            * (CAST({1 << (2 * RES)} AS HUGEINT) * k.k
               - CAST(k.k AS HUGEINT) * k.k)""")
def hotspot_gi_cells(sf_dir: str):
    """Getis-Ord G* hotspot detection over the res-7 lattice (3×3 binary
    weights, empty cells = 0): a cell is a hotspot when its neighborhood
    sum exceeds expectation by more than Z=2 standard deviations. The
    z-test is squared into a pure INTEGER inequality
    (N·T − k·S)²·(N−1) > Z²·(N·S2 − S²)·(N·k − k²) with N·T > k·S for the
    sign — evaluated in arbitrary-precision Python ints on the bounded
    focal table (SQL side mirrors in HUGEINT), so no sqrt and no float
    ever decides a boundary case. Focal sums via scatter-to-neighbors on
    the sparse count table; negative-side cells can't be hotspots, so
    only scatter-reached cells are candidates (exact: a positive z needs
    T > 0)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from ..stages.shuffle import partial_group_counts

    n_lat = 1 << RES
    n_cells = n_lat * n_lat
    mask = (1 << cells.IY_SHIFT) - 1
    key = f"cell{RES}"
    cnt = partial_group_counts(_docs_points(sf_dir), [key]).materialize()

    g = cnt.map_batches(
        lambda t: pa.table({
            "s": pa.array([int(t["n"].to_numpy(
                zero_copy_only=False).sum())], pa.int64()),
            "s2": pa.array([int((t["n"].to_numpy(zero_copy_only=False)
                                 ** 2).sum())], pa.int64())}),
        batch_format="pyarrow").aggregate(
        Sum("s", alias_name="s"), Sum("s2", alias_name="s2"))
    S, S2 = int(g["s"]), int(g["s2"])

    def scatter(t: pa.Table) -> pa.Table:
        cell = t[key].to_numpy(zero_copy_only=False)
        x = t["n"].to_numpy(zero_copy_only=False)
        ix, iy = cell & mask, (cell >> cells.IY_SHIFT) & mask
        outc, outn = [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                jx, jy = ix + dx, iy + dy
                ok = (jx >= 0) & (jx < n_lat) & (jy >= 0) & (jy < n_lat)
                outc.append((np.int64(RES) << cells.RES_SHIFT)
                            | (jy[ok] << cells.IY_SHIFT) | jx[ok])
                outn.append(x[ok])
        return pa.table({"cell": np.concatenate(outc),
                         "t": np.concatenate(outn)})

    focal = (cnt.map_batches(scatter, batch_format="pyarrow")
             .groupby("cell").aggregate(Sum("t", alias_name="t")))

    def flag(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["cell", "t"])
        cell = t["cell"].to_numpy(zero_copy_only=False)
        tv = t["t"].to_numpy(zero_copy_only=False)
        ix, iy = cell & mask, (cell >> cells.IY_SHIFT) & mask
        kx = np.where((ix == 0) | (ix == n_lat - 1), 2, 3)
        ky = np.where((iy == 0) | (iy == n_lat - 1), 2, 3)
        kv = (kx * ky).astype(np.int64)
        keep = np.zeros(len(cell), dtype=bool)
        for i in range(len(cell)):
            N, T, K = n_cells, int(tv[i]), int(kv[i])
            lhs_sign = N * T - K * S
            if lhs_sign <= 0:
                continue
            lhs = lhs_sign * lhs_sign * (N - 1)
            rhs = (GI_Z * GI_Z) * (N * S2 - S * S) * (N * K - K * K)
            keep[i] = lhs > rhs
        out = t.filter(pa.array(keep))
        return pa.table({"cell7": out["cell"],
                         "t": pc.cast(out["t"], pa.int64()),
                         "k": pa.array(kv[keep])})

    return focal.map_batches(flag, batch_format="pyarrow")


# ------------------------------------------------------- change detection
CHG_RES = 5
CHG_SPLIT_DAY = 15      # first half: day < 15 (events span Jan 1-30)
CHG_T0_US = 1_704_067_200_000_000
CHG_US_PER_DAY = 86_400_000_000


@register("cell_change_detection", sql=lambda: (lambda x, y: f"""
    WITH e AS (SELECT {cells.sql_cell('p.x', 'p.y', CHG_RES)} AS cell,
                      CASE WHEN (CAST(epoch_us(ts) AS BIGINT)
                                 - {CHG_T0_US}) // {CHG_US_PER_DAY}
                                < {CHG_SPLIT_DAY}
                           THEN 0 ELSE 1 END AS half
               FROM (SELECT event_id, ts, {x} AS x, {y} AS y
                     FROM events) p),
    c AS (SELECT cell,
                 CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n1,
                 CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n2
          FROM e GROUP BY 1)
    SELECT cell AS cell5, n1, n2
    FROM c
    WHERE (n1 - n2) * (n1 - n2) > 4 * (n1 + n2)""")(
        *points.sql_xy("event_id")))
def cell_change_detection(sf_dir: str):
    """Spatiotemporal change detection: cells whose event density changed
    significantly between the two halves of the observation window —
    flagged by the integer Poisson-difference test (n1 − n2)² > 4(n1+n2)
    (|Δ| > 2·σ̂ under H0: equal rates, squared so no sqrt). Per-batch
    (cell, half) partial counts; the wide input never shuffles."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    ev = read_table(sf_dir, "events", ["event_id", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        x, y = points.derive_xy(eid)
        day = (pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
               - CHG_T0_US) // CHG_US_PER_DAY
        first = (day < CHG_SPLIT_DAY).astype(np.int64)
        return pa.table({"cell": pa.array(cells.encode(x, y, CHG_RES)),
                         "h1": pa.array(first),
                         "h2": pa.array(1 - first)})

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["cell"]).aggregate([("h1", "sum"), ("h2", "sum")])
        return g.rename_columns(["cell", "n1", "n2"])

    agg = (ev.map_batches(derive, batch_format="pyarrow")
           .map_batches(partial, batch_format="pyarrow")
           .groupby("cell").aggregate(Sum("n1", alias_name="n1"),
                                      Sum("n2", alias_name="n2")))

    def flag(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["cell", "n1", "n2"])
        n1 = t["n1"].to_numpy(zero_copy_only=False)
        n2 = t["n2"].to_numpy(zero_copy_only=False)
        keep = (n1 - n2) * (n1 - n2) > 4 * (n1 + n2)
        out = t.filter(pa.array(keep))
        return pa.table({"cell5": out["cell"],
                         "n1": pc.cast(out["n1"], pa.int64()),
                         "n2": pc.cast(out["n2"], pa.int64())})

    return agg.map_batches(flag, batch_format="pyarrow")


# ---------------------------------------------------------- shard planning
SHARD_K = 8


@register("shard_plan_cells", sql=lambda: f"""
    WITH pts AS (SELECT {cells.sql_cell('x', 'y', RES)} AS cell
                 FROM ({_points_cte()})),
    c AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n FROM pts
          GROUP BY 1),
    r AS (SELECT cell, n,
                 (row_number() OVER (ORDER BY n DESC, cell) - 1)
                     % {SHARD_K} AS shard_id
          FROM c)
    SELECT CAST(shard_id AS BIGINT) AS shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(n) AS BIGINT) AS total_docs
    FROM r GROUP BY 1""")
def shard_plan_cells(sf_dir: str):
    """Partition planning: assign the occupied cells to {SHARD_K} output
    shards by SORTED ROUND-ROBIN (descending count, deterministic ties)
    — the balancing heuristic that caps shard skew at one max-cell even
    under the planted Helsinki hot spot; the per-shard totals ARE the
    balance report. The count table is bounded (≤ 4^res), so the plan is
    one vectorized rank pass — the plan then drives the partitioned sink
    (`etl.py`'s hive layout) at any scale."""
    import pyarrow.compute as pc

    from ..stages.shuffle import partial_group_counts

    key = f"cell{RES}"
    cnt = partial_group_counts(_docs_points(sf_dir), [key])

    def plan(t: pa.Table) -> pa.Table:
        cell = t[key].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((cell, -n))
        shard = np.empty(len(cell), np.int64)
        shard[order] = np.arange(len(cell), dtype=np.int64) % SHARD_K
        tt = pa.table({"shard_id": pa.array(shard),
                       "one": pa.array(np.ones(len(cell), np.int64)),
                       "n": pa.array(n.astype(np.int64))})
        g = tt.group_by(["shard_id"]).aggregate(
            [("one", "sum"), ("n", "sum")])
        return g.rename_columns(["shard_id", "n_cells", "total_docs"])

    return cnt.repartition(1).map_batches(plan, batch_format="pyarrow",
                                          batch_size=None)


# ----------------------------- corridor join (point-to-polyline distance)
CORR_QS = 10_000        # quantizer: 1e-4 deg lattice (keeps cross² in int64)
CORR_R_Q = 1_000        # corridor radius: 0.1° in lattice units
CORR_CAP_Q = 5_000      # segment length cap per axis (0.5°)
CORR_RES = 5            # cover grid: cell 0.39° ≥ radius → ≤ 3×3 cells/seg


def _corridor_sql() -> str:
    ex, ey = points.sql_xy("event_id")
    dx_, dy_ = points.sql_xy("doc_id")
    r2 = CORR_R_Q * CORR_R_Q
    return f"""
    WITH e AS (SELECT user_id, ts, event_id,
                  CAST(floor({ex} * {CORR_QS}) AS BIGINT) AS qx,
                  CAST(floor({ey} * {CORR_QS}) AS BIGINT) AS qy
               FROM events),
    seg AS (SELECT user_id, qx AS ax, qy AS ay,
                   lead(qx) OVER w AS bx, lead(qy) OVER w AS by_
            FROM e WINDOW w AS (PARTITION BY user_id
                                ORDER BY ts, event_id)),
    s AS (SELECT * FROM seg WHERE bx IS NOT NULL
          AND GREATEST(abs(bx - ax), abs(by_ - ay)) <= {CORR_CAP_Q}),
    p AS (SELECT doc_id, CAST(floor({dx_} * {CORR_QS}) AS BIGINT) AS px,
                 CAST(floor({dy_} * {CORR_QS}) AS BIGINT) AS py
          FROM documents),
    m AS (SELECT s.user_id, p.doc_id,
                 (s.bx - s.ax) AS vx, (s.by_ - s.ay) AS vy,
                 (p.px - s.ax) AS wx, (p.py - s.ay) AS wy,
                 (p.px - s.bx) AS ux, (p.py - s.by_) AS uy
          FROM s, p),
    near AS (SELECT DISTINCT user_id, doc_id FROM m
             WHERE CASE
                 WHEN vx * wx + vy * wy <= 0
                     THEN wx * wx + wy * wy <= {r2}
                 WHEN vx * wx + vy * wy >= vx * vx + vy * vy
                     THEN ux * ux + uy * uy <= {r2}
                 ELSE (vx * wy - vy * wx) * (vx * wy - vy * wx)
                      <= {r2} * (vx * vx + vy * vy)
                 END)
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM near GROUP BY user_id"""


@register("corridor_doc_counts", sql=_corridor_sql)
def corridor_doc_counts(sf_dir: str):
    """CORRIDOR JOIN (``ST_DWithin`` point-to-LINESTRING — route-matching /
    buffer-intersect): per user trajectory, how many distinct documents
    lie within 0.1° of ANY path segment. Integer point-to-segment
    distance on the 10⁻⁴° lattice (endpoint / projection / cross²·len2
    branches — division-free, every product inside int64 on BOTH sides),
    so the O(n·m) SQL twin matches exactly.

    Distribution: segments cover the grid cells of their r-inflated bbox
    (≤ 3×3 at these caps), points land home; ONE cell shuffle cogroups
    candidates; per-cell chunked segment×point distance matrices emit
    candidate (user, doc) pairs, deduped by one (user, doc) shuffle into
    per-user partial counts — no O(n·m) scan, no driver state."""
    import pandas as pd
    import pyarrow.compute as pc

    from ..stages.shuffle import grouped_apply, partial_group_counts

    r2 = CORR_R_Q * CORR_R_Q
    ev = read_table(sf_dir, "events", ["event_id", "user_id", "ts"])

    def to_rows(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        x, y = points.derive_xy(eid)
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "t": pc.cast(t["ts"], pa.int64()),
            "event_id": pa.array(eid.astype(np.int64)),
            "qx": pa.array(np.floor(x * CORR_QS).astype(np.int64)),
            "qy": pa.array(np.floor(y * CORR_QS).astype(np.int64))})

    def make_segments(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "t", "event_id"],
                            kind="mergesort").reset_index(drop=True)
        u = df["user_id"].to_numpy(np.int64)
        qx = df["qx"].to_numpy(np.int64)
        qy = df["qy"].to_numpy(np.int64)
        same = np.empty(len(df), dtype=bool)
        if len(df):
            same[:-1] = u[1:] == u[:-1]
            same[-1] = False
        ax, ay = qx[same], qy[same]
        nxt = np.flatnonzero(same) + 1
        bx, by = qx[nxt], qy[nxt]
        keep = np.maximum(np.abs(bx - ax), np.abs(by - ay)) <= CORR_CAP_Q
        return pd.DataFrame({"user_id": u[same][keep],
                             "ax": ax[keep], "ay": ay[keep],
                             "bx": bx[keep], "by": by[keep]})

    segs = grouped_apply(ev.map_batches(to_rows, batch_format="pyarrow"),
                         ["user_id"], make_segments)

    def seg_cover(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ax = t["ax"].to_numpy(zero_copy_only=False)
        ay = t["ay"].to_numpy(zero_copy_only=False)
        bx = t["bx"].to_numpy(zero_copy_only=False)
        by = t["by"].to_numpy(zero_copy_only=False)
        x0 = (np.minimum(ax, bx) - CORR_R_Q) / CORR_QS
        x1 = (np.maximum(ax, bx) + CORR_R_Q) / CORR_QS
        y0 = (np.minimum(ay, by) - CORR_R_Q) / CORR_QS
        y1 = (np.maximum(ay, by) + CORR_R_Q) / CORR_QS
        lox, loy = cells.cell_xy(x0, y0, CORR_RES)
        hix, hiy = cells.cell_xy(x1, y1, CORR_RES)
        idx, cellv = cells.enumerate_cover(lox, hix, loy, hiy, CORR_RES)
        return pa.table({"cell": pa.array(cellv), "side": pa.array(
                             np.zeros(len(idx), np.int8)),
                         "id": pa.array(uid[idx].astype(np.int64)),
                         "ax": pa.array(ax[idx]), "ay": pa.array(ay[idx]),
                         "bx": pa.array(bx[idx]), "by": pa.array(by[idx])})

    docs = read_table(sf_dir, "documents", ["doc_id"])

    def doc_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        x, y = points.derive_xy(ids)
        px = np.floor(x * CORR_QS).astype(np.int64)
        py = np.floor(y * CORR_QS).astype(np.int64)
        ix, iy = cells.cell_xy(px / CORR_QS, py / CORR_QS, CORR_RES)
        cellv = ((np.int64(CORR_RES) << cells.RES_SHIFT)
                 | (iy << cells.IY_SHIFT) | ix)
        return pa.table({"cell": pa.array(cellv), "side": pa.array(
                             np.ones(len(ids), np.int8)),
                         "id": pa.array(ids.astype(np.int64)),
                         "ax": pa.array(px), "ay": pa.array(py),
                         "bx": pa.array(px), "by": pa.array(py)})

    tagged = segs.map_batches(seg_cover, batch_format="pyarrow").union(
        docs.map_batches(doc_rows, batch_format="pyarrow"))

    def per_cell(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("cell", sort=False):
            sgs = g[g["side"] == 0]
            pts = g[g["side"] == 1]
            if sgs.empty or pts.empty:
                continue
            uid = sgs["id"].to_numpy(np.int64)
            ax = sgs["ax"].to_numpy(np.int64)
            ay = sgs["ay"].to_numpy(np.int64)
            bx = sgs["bx"].to_numpy(np.int64)
            by = sgs["by"].to_numpy(np.int64)
            did = pts["id"].to_numpy(np.int64)
            px = pts["ax"].to_numpy(np.int64)
            py = pts["ay"].to_numpy(np.int64)
            vx, vy = bx - ax, by - ay
            len2 = vx * vx + vy * vy
            chunk = 512
            for lo in range(0, len(uid), chunk):
                sl = slice(lo, min(lo + chunk, len(uid)))
                wx = px[None, :] - ax[sl, None]
                wy = py[None, :] - ay[sl, None]
                ux = px[None, :] - bx[sl, None]
                uy = py[None, :] - by[sl, None]
                dot = vx[sl, None] * wx + vy[sl, None] * wy
                cross = vx[sl, None] * wy - vy[sl, None] * wx
                near = np.where(
                    dot <= 0, wx * wx + wy * wy <= r2,
                    np.where(dot >= len2[sl, None],
                             ux * ux + uy * uy <= r2,
                             cross * cross <= r2 * len2[sl, None]))
                ia, ib = np.nonzero(near)
                if len(ia):
                    outs.append(pd.DataFrame({
                        "user_id": uid[sl][ia], "doc_id": did[ib]}))
        if not outs:
            return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                                 "doc_id": pd.Series([], dtype="int64")})
        return pd.concat(outs, ignore_index=True).drop_duplicates()

    cands = grouped_apply(tagged, ["cell"], per_cell)
    dedup = grouped_apply(cands, ["user_id", "doc_id"],
                          lambda df: df.drop_duplicates())
    return partial_group_counts(dedup, ["user_id"], count_col="n_docs")


# -------------------------------------------- reverse nearest neighbor
@register("reverse_nn_supplier_counts", sql=lambda: f"""
    WITH d AS ({_points_cte()}),
    s AS (SELECT s_suppkey, {points.sql_xy('s_suppkey')[0]} AS x,
                 {points.sql_xy('s_suppkey')[1]} AS y FROM supplier),
    a AS (SELECT d.doc_id, s.s_suppkey,
                 (d.x - s.x) * (d.x - s.x) + (d.y - s.y) * (d.y - s.y)
                     AS d2,
                 row_number() OVER (PARTITION BY d.doc_id
                                    ORDER BY (d.x - s.x) * (d.x - s.x)
                                           + (d.y - s.y) * (d.y - s.y),
                                             s.s_suppkey) AS rk
          FROM d, s)
    SELECT s_suppkey, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM a WHERE rk = 1 GROUP BY 1""")
def reverse_nn_supplier_counts(sf_dir: str):
    """REVERSE nearest neighbor (influence sets, Korn & Muthukrishnan
    2000): for each supplier, how many documents have IT as their single
    nearest supplier — the facility-catchment / assignment-cardinality
    query (the dual of kNN: 'who is closest to me' → 'whose closest am
    I'). Ties break to the lowest supplier key on both sides.

    Shape: the supplier side is tiny → broadcast once (`ray.put`); each
    document batch does one vectorized (n×m) argmin over identically-
    ordered float ops, then PRE-COUNTS winners per supplier inside the
    block — only ≤ m-row partials shuffle into the final sum; the
    document table never moves."""
    from ..stages.shuffle import partial_group_counts

    sup = read_table(sf_dir, "supplier", ["s_suppkey"]).to_pandas()
    skey = np.sort(sup["s_suppkey"].to_numpy(np.int64))
    sx, sy = points.derive_xy(skey)
    sref = ray.put((skey, sx, sy))

    ds = _docs_points(sf_dir, ())

    def nearest(t: pa.Table) -> pa.Table:
        sk, sx_, sy_ = ray.get(sref)
        dx = t["x"].to_numpy(zero_copy_only=False)
        dy = t["y"].to_numpy(zero_copy_only=False)
        d2 = ((dx[:, None] - sx_[None, :]) * (dx[:, None] - sx_[None, :])
              + (dy[:, None] - sy_[None, :]) * (dy[:, None] - sy_[None, :]))
        win = sk[d2.argmin(axis=1)]     # keys ascending → ties → lowest
        return pa.table({"s_suppkey": pa.array(win)})

    wins = ds.map_batches(nearest, batch_format="pyarrow")
    return partial_group_counts(wins, ["s_suppkey"], count_col="n_docs")


# ----------------------------------------------- polygon adjacency matrix
def _adjacency_sql() -> str:
    from ..functions.pip import sql_pip_assign

    n = 1 << RES
    mask = (1 << cells.IY_SHIFT) - 1
    return f"""
    WITH g AS (SELECT unnest(generate_series(0, {n * n - 1})) AS i),
    ctr AS (SELECT (i & {n - 1}) AS ix, (i >> {RES}) AS iy,
                   {points._d(points.FIN_X0)}
                     + (CAST(i & {n - 1} AS DOUBLE)
                        + CAST(0.5 AS DOUBLE))
                       * {points._d(points._W / n)} AS x,
                   {points._d(points.FIN_Y0)}
                     + (CAST(i >> {RES} AS DOUBLE) + CAST(0.5 AS DOUBLE))
                       * {points._d(points._H / n)} AS y
            FROM g),
    assigned AS ({sql_pip_assign(
        "SELECT (iy << " + str(cells.IY_SHIFT) + ") | ix AS pk, x, y "
        "FROM ctr", "pk",
        fixtures.edges_values_sql(fixtures.province_layer()),
        fixtures.names_values_sql(fixtures.province_layer()))}),
    cov AS (SELECT pk & {mask} AS ix, pk >> {cells.IY_SHIFT} AS iy,
                   name AS province
            FROM assigned WHERE name IS NOT NULL),
    adj AS (SELECT LEAST(a.province, b.province) AS province_a,
                   GREATEST(a.province, b.province) AS province_b
            FROM cov a JOIN cov b
              ON (b.ix = a.ix + 1 AND b.iy = a.iy)
              OR (b.ix = a.ix AND b.iy = a.iy + 1)
            WHERE a.province <> b.province)
    SELECT DISTINCT province_a, province_b FROM adj"""


@register("province_adjacency_pairs", sql=_adjacency_sql)
def province_adjacency_pairs(sf_dir: str):
    """Polygon-topology adjacency matrix: which province pairs share a
    border — computed as 4-neighborhood adjacency of their raster cover
    sets at res {RES} (the standard discretized ST_Touches; the center
    rule keeps cover sets disjoint so a shared border shows up as an
    edge-adjacent cell pair of different labels).

    Shape: the cover lattice streams as integer blocks through the PIP
    actor pool (same machinery as `province_cover_cells`); every labeled
    cell GHOSTS one row east and one row north onto its neighbor's key;
    ONE hash cogroup by packed cell key pairs home vs ghost labels and
    emits per-block DISTINCT (least, greatest) label pairs; the final
    distinct sees ≤ |provinces|² rows. No all-pairs polygon test, no
    geometry ever shuffles."""
    import pyarrow.compute as pc

    from ..stages.shuffle import grouped_apply

    n = 1 << RES
    cw = np.float64(points._W / n)
    ch = np.float64(points._H / n)

    def centers(t: pa.Table) -> pa.Table:
        i = t["id"].to_numpy(zero_copy_only=False)
        ix = i & (n - 1)
        iy = i >> RES
        x = points.FIN_X0 + (ix.astype(np.float64) + 0.5) * cw
        y = points.FIN_Y0 + (iy.astype(np.float64) + 0.5) * ch
        return pa.table({"ix": ix, "iy": iy, "x": x, "y": y})

    ds = ray.data.range(n * n, override_num_blocks=16)
    ds = ds.map_batches(centers, batch_format="pyarrow",
                        zero_copy_batch=True)
    ds = ds.map_batches(assign.PIPAssigner, batch_format="pyarrow",
                        batch_size=16384, concurrency=default_pool(),
                        num_cpus=1)

    def scatter(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["province"]))
        ix = t["ix"].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = t["iy"].to_numpy(zero_copy_only=False).astype(np.int64)
        prov = t["province"].to_numpy(zero_copy_only=False)
        key = (iy << cells.IY_SHIFT) | ix
        # home row + ghost copies onto the east and north neighbor keys
        ghost_e = ((iy << cells.IY_SHIFT) | (ix + 1))[ix + 1 < n]
        ghost_n = (((iy + 1) << cells.IY_SHIFT) | ix)[iy + 1 < n]
        return pa.table({
            "key": pa.array(np.concatenate([key, ghost_e, ghost_n])),
            "province": pa.array(np.concatenate(
                [prov, prov[ix + 1 < n], prov[iy + 1 < n]])),
            "home": pa.array(np.concatenate(
                [np.ones(len(key), np.int8),
                 np.zeros(len(ghost_e) + len(ghost_n), np.int8)]))})

    sc = ds.map_batches(scatter, batch_format="pyarrow")

    def pair_up(df):
        import pandas as pd
        homes = df[df["home"] == 1][["key", "province"]]
        ghosts = df[df["home"] == 0][["key", "province"]] \
            .rename(columns={"province": "gprov"})
        m = ghosts.merge(homes, on="key")
        m = m[m["gprov"] != m["province"]]
        if not len(m):
            return pd.DataFrame({"province_a": pd.Series([], dtype="object"),
                                 "province_b": pd.Series([], dtype="object")})
        a = np.minimum(m["gprov"].to_numpy(), m["province"].to_numpy())
        b = np.maximum(m["gprov"].to_numpy(), m["province"].to_numpy())
        return pd.DataFrame({"province_a": a, "province_b": b}) \
            .drop_duplicates()

    pairs = grouped_apply(sc, ["key"], pair_up)
    return pairs.groupby(["province_a", "province_b"]).map_groups(
        lambda df: df.head(1), batch_format="pandas")


# ------------------------------------------ temporal autocorrelation (ACF)
def _acf_sql() -> str:
    x, y = points.sql_xy("event_id")
    return f"""
    WITH e AS (SELECT {cells.sql_cell('p.x', 'p.y', TREND_RES)} AS cell,
                      (CAST(epoch_us(ts) AS BIGINT) - {TREND_T0_US})
                          // {US_PER_HOUR} AS t
               FROM (SELECT event_id, ts, {x} AS x, {y} AS y
                     FROM events) p),
    c AS (SELECT cell, t, CAST(COUNT(*) AS BIGINT) AS y
          FROM e GROUP BY 1, 2),
    m AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_hours,
                 CAST(SUM(y) AS BIGINT) AS s,
                 CAST(SUM(y * y) AS BIGINT) AS s2
          FROM c GROUP BY 1),
    p AS (SELECT a.cell, CAST(COUNT(*) AS BIGINT) AS n_pairs,
                 CAST(SUM(a.y * b.y) AS BIGINT) AS s_lag
          FROM c a JOIN c b ON b.cell = a.cell AND b.t = a.t + 1
          GROUP BY 1)
    SELECT m.cell AS cell5, m.n_hours, m.s, m.s2,
           COALESCE(p.n_pairs, 0) AS n_pairs,
           COALESCE(p.s_lag, 0) AS s_lag
    FROM m LEFT JOIN p USING (cell)
    WHERE m.n_hours >= 2"""


@register("acf_cell_hourly", sql=_acf_sql)
def acf_cell_hourly(sf_dir: str):
    """Temporal AUTOCORRELATION surface: per res-5 cell, the exact integer
    moment terms of the lag-1 hourly-count series — Σy, Σy², the count of
    true consecutive-hour pairs and their lag product Σ y_t·y_{t+1} (the
    serial-correlation sibling of `cell_trend_hourly`'s slope; the
    consumer forms r₁ from the five integers). High r₁ cells have
    persistent hourly load — the cache-warming / pre-scaling signal.

    Shape: one (cell, hour) partial-count pass (shared machinery), then
    per-cell moments AND lag pairs inside ONE cell-keyed bucket pass —
    the hourly series of a cell sorts locally, consecutive-hour pairs
    come from one vectorized shifted comparison; no self-join ever
    materializes."""
    from ray.data.aggregate import Sum

    from ..stages.shuffle import grouped_apply

    ct = _event_hour_counts(sf_dir)

    def per_bucket(df):
        import pandas as pd
        df = df.sort_values(["cell", "t"], kind="mergesort")
        c = df["cell"].to_numpy(np.int64)
        t = df["t"].to_numpy(np.int64)
        y = df["y"].to_numpy(np.int64)
        same = np.zeros(len(c), bool)
        if len(c) > 1:
            same[:-1] = (c[:-1] == c[1:]) & (t[:-1] + 1 == t[1:])
        lag = np.zeros(len(c), np.int64)
        if len(c) > 1:
            lag[:-1] = y[:-1] * y[1:]
        lag[~same] = 0
        out = pd.DataFrame({
            "cell5": c, "n_hours": np.ones(len(c), np.int64),
            "s": y, "s2": y * y,
            "n_pairs": same.astype(np.int64), "s_lag": lag})
        return out.groupby("cell5", as_index=False).sum()

    partials = grouped_apply(ct, ["cell"], per_bucket)
    agg = partials.groupby("cell5").aggregate(
        Sum("n_hours", alias_name="n_hours"),
        Sum("s", alias_name="s"), Sum("s2", alias_name="s2"),
        Sum("n_pairs", alias_name="n_pairs"),
        Sum("s_lag", alias_name="s_lag"))

    def finish(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["cell5", "n_hours", "s", "s2",
                              "n_pairs", "s_lag"])
        return t.filter(pa.array(
            t["n_hours"].to_numpy(zero_copy_only=False) >= 2))

    return agg.map_batches(finish, batch_format="pyarrow")


# ------------------------------------------------------------------ geohash

def _geohash_sql(group_chars: int) -> str:
    from ..functions import geohash as gh
    return f"""
    WITH {gh.sql_geohash_ctes(_points_cte())}
    SELECT substring(gh, 1, {group_chars}) AS gh{group_chars},
           CAST(COUNT(*) AS BIGINT) AS n
    FROM __gh GROUP BY 1"""


GH_GROUP = 4      # counting precision (prefix of the 6-char assign)
GH_COARSE = 2     # rollup precision


def _geohash_counts_ds(sf_dir: str):
    """Shared fine layer: assign precision-6 geohash, count at GH_GROUP
    prefix. One partial-count pass; the point table never shuffles."""
    from ..functions import geohash as gh
    from ..stages.shuffle import partial_group_counts

    ds = _docs_points(sf_dir)

    def tag(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        g6 = gh.encode(x, y)
        # vectorized prefix: astype to a NARROWER unicode width truncates
        return pa.table({f"gh{GH_GROUP}": pa.array(
            g6.astype(f"U{GH_GROUP}"))})

    tagged = ds.map_batches(tag, batch_format="pyarrow",
                            zero_copy_batch=True)
    return partial_group_counts(tagged, [f"gh{GH_GROUP}"]).map_batches(
        lambda t: t.rename_columns([f"gh{GH_GROUP}", "n"]),
        batch_format="pyarrow")


@register("geohash_cell_counts", sql=lambda: _geohash_sql(GH_GROUP))
def geohash_cell_counts(sf_dir: str):
    """Occurrence counts per geohash prefix cell — the third curve family
    next to Morton tiles and Hilbert ranks (functions/geohash.py: classic
    bit-interleave + base-32, anchored at the working extent). The id's
    PREFIX PROPERTY is what Morton/Hilbert integer ids lack: coarse cell
    = string prefix, so downstream range scans are plain `LIKE 'u6dc%'`.
    Counts are batch-partial-aggregated; the oracle recomputes the
    quantize → interleave → base-32 chain bit-for-bit in SQL."""
    return _geohash_counts_ds(sf_dir)


@register("geohash_prefix_rollup", sql=lambda: _geohash_sql(GH_COARSE))
def geohash_prefix_rollup(sf_dir: str):
    """Coarse rollup by PREFIX TRUNCATION of the fine aggregate — unlike
    the hex rollup (center re-assignment: hexes don't nest) geohash
    parents need zero geometry: substring the fine cell id, sum. The
    input points feed only the fine pass."""
    from ray.data.aggregate import Sum

    fine = _geohash_counts_ds(sf_dir)

    def to_parent(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            f"gh{GH_COARSE}": pc.utf8_slice_codeunits(
                t[f"gh{GH_GROUP}"], 0, GH_COARSE),
            "n": t["n"]})

    agg = fine.map_batches(to_parent, batch_format="pyarrow") \
        .groupby(f"gh{GH_COARSE}").aggregate(Sum("n", alias_name="n"))
    return agg.map_batches(
        lambda t: t.rename_columns([f"gh{GH_COARSE}", "n"]),
        batch_format="pyarrow")


# ------------------------------------------------------- per-cell median

MED_RES = 5


def _median_sql() -> str:
    x, y = points.sql_xy("event_id")
    return f"""
    WITH base AS (SELECT event_id, value, {x} AS x, {y} AS y FROM events),
    c AS (SELECT {cells.sql_cell('x', 'y', MED_RES)} AS cell5, value
          FROM base)
    SELECT cell5, CAST(COUNT(*) AS BIGINT) AS n,
           quantile_disc(value, 0.5) AS med
    FROM c GROUP BY 1"""


@register("cell_median_value", sql=_median_sql)
def cell_median_value(sf_dir: str):
    """Exact per-cell median SURFACE (discrete quantile: the element at
    sorted index ⌊(n−1)/2⌋, matching quantile_disc) — the robust sibling
    of the per-cell mean rollups. Selection, not summation, so the float
    is hash-exact with no quantization (the Theil–Sen lesson). ONE
    cell-keyed shuffle; per-bucket vectorized sort + per-group index
    pick."""
    from ..stages.derive import derive_and_encode
    from ..stages.shuffle import grouped_apply

    ev = read_table(sf_dir, "events", ["event_id", "value"])
    ds = ev.map_batches(derive_and_encode("event_id", (MED_RES,)),
                        batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(
        lambda t: t.select([f"cell{MED_RES}", "value"]).rename_columns(
            ["cell5", "value"]), batch_format="pyarrow")

    def per_bucket(df):
        import pandas as pd

        df = df.sort_values(["cell5", "value"], kind="mergesort")
        c = df["cell5"].to_numpy(np.int64)
        v = df["value"].to_numpy(np.float64)
        # group boundaries in the cell-sorted run
        start = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        end = np.r_[start[1:], len(c)]
        n = end - start
        med = v[start + (n - 1) // 2]
        return pd.DataFrame({"cell5": c[start], "n": n.astype(np.int64),
                             "med": med})

    return grouped_apply(ds, ["cell5"], per_bucket)


# ------------------------------------------------- two-layer raster algebra

def _layer_corr_sql() -> str:
    xd, yd = points.sql_xy("doc_id")
    xe, ye = points.sql_xy("event_id")
    return f"""
    WITH dp AS (SELECT {cells.sql_cell(xd, yd, MED_RES)} AS cell5
                FROM documents),
    ep AS (SELECT {cells.sql_cell(xe, ye, MED_RES)} AS cell5 FROM events),
    da AS (SELECT cell5, CAST(COUNT(*) AS BIGINT) AS a FROM dp GROUP BY 1),
    eb AS (SELECT cell5, CAST(COUNT(*) AS BIGINT) AS b FROM ep GROUP BY 1),
    u AS (SELECT COALESCE(da.cell5, eb.cell5) AS cell5,
                 COALESCE(a, 0) AS a, COALESCE(b, 0) AS b
          FROM da FULL OUTER JOIN eb ON da.cell5 = eb.cell5)
    SELECT CAST(COUNT(*) AS BIGINT) AS k,
           CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(b) AS BIGINT) AS sb,
           CAST(SUM(a * b) AS BIGINT) AS sab,
           CAST(SUM(a * a) AS BIGINT) AS saa,
           CAST(SUM(b * b) AS BIGINT) AS sbb
    FROM u"""


@register("cell_layer_corr_terms", sql=_layer_corr_sql)
def cell_layer_corr_terms(sf_dir: str):
    """Two-layer raster algebra: per-cell document density vs event
    density, reduced to the EXACT integer Pearson moment terms
    (k, Σa, Σb, Σab, Σa², Σb²) over the union-of-support cell domain —
    the consumer forms r at any precision (the rational-output rule).
    The cross-layer co-registration every raster-correlation /
    map-algebra workload needs.

    Shape: per-batch partial counts on each layer (neither input
    shuffles), ONE cell-keyed outer hash join of the two SMALL per-cell
    aggregates, per-batch moment partials, 6-int fold."""
    from ray.data.aggregate import Count, Sum

    from ..stages.join import hash_join
    from ..stages.shuffle import partial_group_counts

    docs = _docs_points(sf_dir, resolutions=(MED_RES,)).map_batches(
        lambda t: t.select([f"cell{MED_RES}"]).rename_columns(["cell5"]),
        batch_format="pyarrow")
    ev = read_table(sf_dir, "events", ["event_id"]).map_batches(
        derive_and_encode("event_id", (MED_RES,)),
        batch_format="pyarrow", zero_copy_batch=True).map_batches(
        lambda t: t.select([f"cell{MED_RES}"]).rename_columns(["cell5"]),
        batch_format="pyarrow")

    da = partial_group_counts(docs, ["cell5"]).map_batches(
        lambda t: t.rename_columns(["cell5", "a"]), batch_format="pyarrow")
    eb = partial_group_counts(ev, ["cell5"]).map_batches(
        lambda t: t.rename_columns(["cell5", "b"]), batch_format="pyarrow")

    joined = hash_join(da, eb, on=["cell5"], how="outer")

    def moments(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        a = df["a"].fillna(0).to_numpy(np.int64)
        b = df["b"].fillna(0).to_numpy(np.int64)
        return pa.table({
            "k": pa.array([np.int64(len(a))]),
            "sa": pa.array([a.sum()]), "sb": pa.array([b.sum()]),
            "sab": pa.array([(a * b).sum()]),
            "saa": pa.array([(a * a).sum()]),
            "sbb": pa.array([(b * b).sum()])})

    row = joined.map_batches(moments, batch_format="pyarrow").aggregate(
        *[Sum(c, alias_name=c) for c in
          ("k", "sa", "sb", "sab", "saa", "sbb")])
    import pandas as pd
    return pd.DataFrame([{c: np.int64(row[c]) for c in
                          ("k", "sa", "sb", "sab", "saa", "sbb")}])


# ------------------------------------------------- map matching (nearest segment)

def _road_sql() -> str:
    sx, sy = points.sql_xy("s_suppkey")
    ex, ey = points.sql_xy("event_id")
    return f"""
    WITH sp AS (SELECT s_suppkey, {sx} AS x, {sy} AS y FROM supplier),
    seg0 AS (SELECT row_number() OVER (ORDER BY s_suppkey) - 1 AS seg_id,
                    x AS ax, y AS ay,
                    lead(x) OVER (ORDER BY s_suppkey) AS bx,
                    lead(y) OVER (ORDER BY s_suppkey) AS by_
             FROM sp),
    seg AS (SELECT seg_id, ax, ay, bx, by_,
                   (bx - ax) * (bx - ax) + (by_ - ay) * (by_ - ay) AS l2
            FROM seg0 WHERE bx IS NOT NULL),
    e AS (SELECT event_id, {ex} AS px, {ey} AS py FROM events),
    m AS (SELECT e.event_id, seg.seg_id,
                 LEAST(GREATEST(((px - ax) * (bx - ax)
                                 + (py - ay) * (by_ - ay)) / l2,
                                CAST(0.0 AS DOUBLE)),
                       CAST(1.0 AS DOUBLE)) AS t,
                 px - ax AS wx, py - ay AS wy,
                 bx - ax AS vx, by_ - ay AS vy
          FROM e, seg),
    d AS (SELECT event_id, seg_id,
                 (wx - t * vx) * (wx - t * vx)
                 + (wy - t * vy) * (wy - t * vy) AS d2
          FROM m)
    SELECT event_id, seg_id, d2 FROM d
    QUALIFY row_number() OVER (PARTITION BY event_id
                               ORDER BY d2, seg_id) = 1"""


@register("nearest_road_segment", sql=_road_sql)
def nearest_road_segment(sf_dir: str):
    """Map matching: snap every event point to its nearest segment of the
    supplier polyline (the 'road network' — consecutive supplier points by
    key order). The broadcast-small-side argmin shape: the segment table
    (|suppliers|−1 rows) ships once via ray.put; each batch runs a
    memory-bounded blocked scan (running min + first-argmin, 128 segments
    at a time — never the full |events|×|segments| matrix).

    Exactness: the clamp-project-distance chain is written op-for-op the
    same in numpy and SQL over the same bit-exact derived doubles, so d2
    and the (d2, seg_id) argmin agree bitwise — the points.sql_xy
    contract extended to a geometric kernel."""
    ev = read_table(sf_dir, "events", ["event_id"])

    sup = read_table(sf_dir, "supplier", ["s_suppkey"]).to_pandas()
    sk = np.sort(sup["s_suppkey"].to_numpy(np.int64))
    sx, sy = points.derive_xy(sk)
    ax, ay, bx, by_ = sx[:-1], sy[:-1], sx[1:], sy[1:]
    vx, vy = bx - ax, by_ - ay
    l2 = (bx - ax) * (bx - ax) + (by_ - ay) * (by_ - ay)
    seg_ref = ray.put((ax, ay, vx, vy, l2))

    def snap(t: pa.Table) -> pa.Table:
        sax, say, svx, svy, sl2 = ray.get(seg_ref)
        keys = t["event_id"].to_numpy(zero_copy_only=False)
        px, py = points.derive_xy(keys)
        n, m = len(keys), len(sax)
        best = np.full(n, np.inf)
        bestj = np.zeros(n, dtype=np.int64)
        for s0 in range(0, m, 128):
            s1 = min(s0 + 128, m)
            wx = px[:, None] - sax[None, s0:s1]
            wy = py[:, None] - say[None, s0:s1]
            traw = (wx * svx[None, s0:s1] + wy * svy[None, s0:s1]) \
                / sl2[None, s0:s1]
            tt = np.clip(traw, 0.0, 1.0)
            dx = wx - tt * svx[None, s0:s1]
            dy = wy - tt * svy[None, s0:s1]
            d2 = dx * dx + dy * dy
            jb = np.argmin(d2, axis=1)            # first min in block
            db = d2[np.arange(n), jb]
            upd = db < best                       # strict: keep lowest id
            best[upd] = db[upd]
            bestj[upd] = jb[upd] + s0
        return pa.table({"event_id": pa.array(keys),
                         "seg_id": pa.array(bestj),
                         "d2": pa.array(best)})

    return ev.map_batches(snap, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=4096)


# ---------------------------------------------------- join-count statistic

JC_RES = 5
JC_TH = 2       # cell is BLACK when it holds ≥ TH documents


def _joincount_sql() -> str:
    mask = (1 << cells.IY_SHIFT) - 1
    return f"""
    WITH pts AS (SELECT {cells.sql_cell('x', 'y', JC_RES)} AS cell
                 FROM ({_points_cte()})),
    c AS (SELECT cell, cell & {mask} AS ix,
                 (cell >> {cells.IY_SHIFT}) & {mask} AS iy,
                 CASE WHEN COUNT(*) >= {JC_TH} THEN 1 ELSE 0 END AS mark
          FROM pts GROUP BY 1, 2, 3),
    pr AS (SELECT a.mark AS ma, b.mark AS mb
           FROM c a JOIN c b
           ON (b.ix = a.ix + 1 AND b.iy = a.iy)
              OR (b.ix = a.ix AND b.iy = a.iy + 1))
    SELECT CAST(SUM(CASE WHEN ma = 1 AND mb = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bb,
           CAST(SUM(CASE WHEN ma <> mb THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bw,
           CAST(SUM(CASE WHEN ma = 0 AND mb = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_ww,
           (SELECT CAST(SUM(mark) AS BIGINT) FROM c) AS n_black,
           (SELECT CAST(SUM(1 - mark) AS BIGINT) FROM c) AS n_white
    FROM pr"""


@register("join_count_stats", sql=_joincount_sql)
def join_count_stats(sf_dir: str):
    """Join-count statistics (Cliff & Ord): BB / BW / WW counts over
    rook-adjacent OCCUPIED cells, cells marked black at ≥ {TH} documents —
    the categorical spatial-autocorrelation test (the binary-marked
    sibling of Moran's I). Exact integers end-to-end.

    Shape: per-batch partial counts feed a bounded cell table (≤ 4^res
    rows — the same domain-bounded contract as shard_plan_cells); one
    vectorized searchsorted pass pairs each cell with its east/north
    neighbors, each adjacency counted exactly once."""
    from ..stages.shuffle import partial_group_counts

    key = f"cell{JC_RES}"
    cnt = partial_group_counts(_docs_points(sf_dir, (JC_RES,)), [key])
    mask = (1 << cells.IY_SHIFT) - 1

    def fold(t: pa.Table) -> pa.Table:
        cell = t[key].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(cell)
        cell, n = cell[order], n[order]
        mark = (n >= JC_TH).astype(np.int64)
        ix, iy = cell & mask, (cell >> cells.IY_SHIFT) & mask
        res_bits = cell & ~((np.int64(1) << cells.RES_SHIFT) - 1)
        counts = {"n_bb": 0, "n_bw": 0, "n_ww": 0}
        for ncell in (np.where(ix + 1 <= mask,
                               cell + 1, -1),
                      np.where(iy + 1 <= mask,
                               cell + (np.int64(1) << cells.IY_SHIFT), -1)):
            pos = np.searchsorted(cell, ncell)
            ok = (pos < len(cell)) & (ncell >= 0)
            ok &= np.where(ok, cell[np.minimum(pos, len(cell) - 1)]
                           == ncell, False)
            ma = mark[ok]
            mb = mark[np.minimum(pos, len(cell) - 1)[ok]]
            counts["n_bb"] += int(((ma == 1) & (mb == 1)).sum())
            counts["n_bw"] += int((ma != mb).sum())
            counts["n_ww"] += int(((ma == 0) & (mb == 0)).sum())
        return pa.table({
            "n_bb": pa.array([counts["n_bb"]], pa.int64()),
            "n_bw": pa.array([counts["n_bw"]], pa.int64()),
            "n_ww": pa.array([counts["n_ww"]], pa.int64()),
            "n_black": pa.array([int(mark.sum())], pa.int64()),
            "n_white": pa.array([int(len(mark) - mark.sum())], pa.int64())})

    return cnt.repartition(1).map_batches(fold, batch_format="pyarrow",
                                          batch_size=None)


# ----------------------------------------------------- quad (Morton) rollup

QR_FINE, QR_COARSE = 7, 3


def sql_quad_parent(cell: str, fine: int, coarse: int) -> str:
    """Parent cell id by PURE BIT ARITHMETIC (Morton cells nest exactly —
    unlike hex — so rollup needs no re-encode): shift ix/iy down by the
    resolution delta, restamp the res bits."""
    mask = (1 << cells.IY_SHIFT) - 1
    d = fine - coarse
    return (f"((CAST({coarse} AS BIGINT) << {cells.RES_SHIFT})"
            f" | ((((({cell}) >> {cells.IY_SHIFT}) & {mask}) >> {d})"
            f" << {cells.IY_SHIFT})"
            f" | ((({cell}) & {mask}) >> {d}))")


@register("quad_rollup_7_to_3", sql=lambda: f"""
    WITH pts AS (SELECT {cells.sql_cell('x', 'y', QR_FINE)} AS cell7
                 FROM ({_points_cte()})),
    c7 AS (SELECT cell7, CAST(COUNT(*) AS BIGINT) AS n FROM pts
           GROUP BY 1)
    SELECT {sql_quad_parent('cell7', QR_FINE, QR_COARSE)} AS cell3,
           CAST(SUM(n) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_subcells
    FROM c7 GROUP BY 1""")
def quad_rollup_7_to_3(sf_dir: str):
    """Hierarchical quadtree rollup on the Morton tile id — the third
    member of the rollup family (S2: parent bit algebra; hex: center
    re-assign; Morton: EXACT nesting by coordinate shift). Fine counts
    aggregate once; the coarse pass runs on the ≤4^fine-row aggregate
    with zero point data."""
    from ray.data.aggregate import Count, Sum

    from ..stages.shuffle import partial_group_counts

    key = f"cell{QR_FINE}"
    cnt = partial_group_counts(_docs_points(sf_dir, (QR_FINE,)), [key])
    mask = (1 << cells.IY_SHIFT) - 1
    d = QR_FINE - QR_COARSE

    def to_parent(t: pa.Table) -> pa.Table:
        c = t[key].to_numpy(zero_copy_only=False)
        ix = (c & mask) >> d
        iy = ((c >> cells.IY_SHIFT) & mask) >> d
        parent = ((np.int64(QR_COARSE) << cells.RES_SHIFT)
                  | (iy << cells.IY_SHIFT) | ix)
        return pa.table({"cell3": pa.array(parent), "n": t["n"]})

    agg = cnt.map_batches(to_parent, batch_format="pyarrow") \
        .groupby("cell3").aggregate(Sum("n", alias_name="n"),
                                    Count(alias_name="n_subcells"))
    return agg.map_batches(
        lambda t: t.rename_columns(["cell3", "n", "n_subcells"]),
        batch_format="pyarrow")


# --------------------------------------- standard deviational ellipse moments

SDE_QS = 10_000        # 1e-4° lattice (same quantizer as the corridor join)


@register("sde_moments_by_province", sql=lambda: f"""
    WITH assigned AS ({sql_pip_assign(_points_cte(), "doc_id",
                       fixtures.edges_values_sql(fixtures.province_layer()),
                       fixtures.names_values_sql(fixtures.province_layer()))}),
    q AS (SELECT a.name AS province,
                 CAST(floor(p.x * {SDE_QS}) AS BIGINT) AS qx,
                 CAST(floor(p.y * {SDE_QS}) AS BIGINT) AS qy
          FROM assigned a JOIN ({_points_cte()}) p
               ON p.doc_id = a.doc_id)
    SELECT province, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(qx) AS BIGINT) AS sx, CAST(SUM(qy) AS BIGINT) AS sy,
           CAST(SUM(qx * qx) AS BIGINT) AS sxx,
           CAST(SUM(qy * qy) AS BIGINT) AS syy,
           CAST(SUM(qx * qy) AS BIGINT) AS sxy
    FROM q GROUP BY 1""")
def sde_moments_by_province(sf_dir: str):
    """Standard deviational ellipse (directional distribution) per
    province — the classic GIS dispersion summary: exact integer second
    moments (Σx, Σy, Σx², Σy², Σxy on the 1e-4° lattice), from which the
    consumer derives center, axes and rotation at any precision. PIP
    assignment in the broadcast-polygon actor pool; per-batch partials
    reduce each block to ≤ |provinces| rows."""
    from ray.data.aggregate import Sum

    ds = _docs_points(sf_dir).map_batches(
        assign.PIPAssigner, batch_format="pyarrow", batch_size=16384,
        concurrency=default_pool(), num_cpus=1)

    def moments(t: pa.Table) -> pa.Table:
        import pandas as pd

        qx = np.floor(t["x"].to_numpy(zero_copy_only=False)
                      * SDE_QS).astype(np.int64)
        qy = np.floor(t["y"].to_numpy(zero_copy_only=False)
                      * SDE_QS).astype(np.int64)
        df = pd.DataFrame({
            "province": t["province"].to_numpy(zero_copy_only=False),
            "n": 1, "sx": qx, "sy": qy, "sxx": qx * qx, "syy": qy * qy,
            "sxy": qx * qy})
        return pa.Table.from_pandas(
            df.groupby("province", as_index=False).sum(),
            preserve_index=False)

    cols = ["n", "sx", "sy", "sxx", "syy", "sxy"]
    agg = ds.map_batches(moments, batch_format="pyarrow") \
        .groupby("province").aggregate(
            *[Sum(c, alias_name=c) for c in cols])
    return agg.map_batches(
        lambda t: t.rename_columns(["province"] + cols),
        batch_format="pyarrow")


# --------------------------------------------------- vector-tile manifest

VT_RES = 5
VT_TOPK = 3


def _vt_sql() -> str:
    x, y = points.sql_xy("doc_id")
    return f"""
    WITH f AS (SELECT doc_id, n_chars,
                      {cells.sql_cell(x, y, VT_RES)} AS cell5
               FROM documents),
    r AS (SELECT *, row_number() OVER (PARTITION BY cell5
                    ORDER BY n_chars DESC, doc_id) AS rank,
                 COUNT(*) OVER (PARTITION BY cell5) AS n_features,
                 SUM(n_chars) OVER (PARTITION BY cell5) AS tile_bytes
          FROM f)
    SELECT cell5, CAST(rank AS BIGINT) AS rank, doc_id, n_chars,
           CAST(n_features AS BIGINT) AS n_features,
           CAST(tile_bytes AS BIGINT) AS tile_bytes
    FROM r WHERE rank <= {VT_TOPK}"""


@register("vector_tile_manifest", sql=_vt_sql)
def vector_tile_manifest(sf_dir: str):
    """Serving-tile build manifest: per tile, the TOP-{K} features by
    payload rank (n_chars DESC, deterministic id tie-break) plus the
    tile's feature count and byte budget — the feature-selection step a
    vector-tile pipeline runs at every zoom before encoding. ONE
    cell-keyed shuffle; per-tile vectorized argpartition-free sort (tiles
    are small by construction); totals computed in the same pass."""
    from ..stages.shuffle import grouped_apply

    ds = read_table(sf_dir, "documents", ["doc_id", "n_chars"])
    ds = ds.map_batches(derive_and_encode("doc_id", (VT_RES,)),
                        batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(
        lambda t: t.select(["doc_id", "n_chars", f"cell{VT_RES}"])
        .rename_columns(["doc_id", "n_chars", "cell5"]),
        batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        import pandas as pd

        outs = []
        for cell, g in df.groupby("cell5", sort=False):
            n_f = len(g)
            tb = int(g["n_chars"].sum())
            g = g.sort_values(["n_chars", "doc_id"],
                              ascending=[False, True],
                              kind="mergesort").head(VT_TOPK)
            out = g[["doc_id", "n_chars"]].copy()
            out.insert(0, "cell5", cell)
            out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
            out["n_features"] = np.int64(n_f)
            out["tile_bytes"] = np.int64(tb)
            outs.append(out)
        return pd.concat(outs, ignore_index=True) if outs else \
            pd.DataFrame({"cell5": pd.Series([], dtype=np.int64),
                          "doc_id": pd.Series([], dtype=np.int64),
                          "n_chars": pd.Series([], dtype=np.int64),
                          "rank": pd.Series([], dtype=np.int64),
                          "n_features": pd.Series([], dtype=np.int64),
                          "tile_bytes": pd.Series([], dtype=np.int64)})

    return grouped_apply(ds, ["cell5"], per_bucket)


# --------------------------------------------------- G-function (NN ECDF)

GF_RADII = (0.01, 0.02, 0.04, 0.08)
GF_RMAX = max(GF_RADII)
GF_RES = 5          # cell width 0.39° ≥ rmax → ring 1 covers


def _gfun_sql() -> str:
    x, y = points.sql_xy("doc_id")
    radii = " UNION ALL ".join(
        f"SELECT {i} AS radius_idx, CAST('{r!r}' AS DOUBLE) AS r"
        for i, r in enumerate(GF_RADII))
    return f"""
    WITH p AS (SELECT doc_id, {x} AS x, {y} AS y FROM documents),
    nn AS (SELECT a.doc_id,
                  MIN((a.x - b.x) * (a.x - b.x)
                      + (a.y - b.y) * (a.y - b.y)) AS d2
           FROM p a JOIN p b ON a.doc_id <> b.doc_id
           GROUP BY a.doc_id),
    radii AS ({radii})
    SELECT radius_idx, r,
           CAST((SELECT COUNT(*) FROM nn
                 WHERE nn.d2 <= radii.r * radii.r) AS BIGINT) AS n_docs
    FROM radii"""


@register("gfunction_nn_counts", sql=_gfun_sql)
def gfunction_nn_counts(sf_dir: str):
    """The G-function (nearest-neighbour distance ECDF numerators): how
    many documents have their NN within r, for increasing r — the
    point-process clustering diagnostic between Clark–Evans (mean NN)
    and Ripley K (all pairs). EXACT: per-doc NN d2 via the radius-bounded
    ghost-cell pair join at r_max (docs whose NN exceeds r_max simply
    never enter — correct for every reported radius ≤ r_max), min by
    selection, thresholds on bit-exact doubles."""
    from ray.data.aggregate import Min, Sum

    from ..stages.knn import dwithin_pairs

    ds = _docs_points(sf_dir).map_batches(
        lambda t: t.select(["doc_id", "x", "y"]).rename_columns(
            ["id", "x", "y"]), batch_format="pyarrow")
    pairs = dwithin_pairs(ds, GF_RMAX, res=GF_RES)

    both = pairs.map_batches(
        lambda t: pa.table({
            "id": pa.concat_arrays([t["id_a"].combine_chunks(),
                                    t["id_b"].combine_chunks()]),
            "d2": pa.concat_arrays([t["d2"].combine_chunks(),
                                    t["d2"].combine_chunks()])}),
        batch_format="pyarrow")
    nn = both.groupby("id").aggregate(Min("d2", alias_name="d2"))

    def bucket_counts(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["id", "d2"])
        d2 = t["d2"].to_numpy(zero_copy_only=False)
        idx = np.arange(len(GF_RADII), dtype=np.int64)
        n = np.array([(d2 <= r * r).sum() for r in GF_RADII], np.int64)
        return pa.table({"radius_idx": pa.array(idx),
                         "n_docs": pa.array(n)})

    agg = nn.map_batches(bucket_counts, batch_format="pyarrow") \
        .groupby("radius_idx").aggregate(Sum("n_docs", alias_name="n_docs"))

    def finish(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["radius_idx", "n_docs"])
        ridx = t["radius_idx"].to_numpy(zero_copy_only=False)
        return pa.table({
            "radius_idx": t["radius_idx"],
            "r": pa.array(np.array(GF_RADII, np.float64)[ridx]),
            "n_docs": t["n_docs"]})

    return agg.map_batches(finish, batch_format="pyarrow")


# ------------------------------------------------- Hilbert coverage gaps

HG_ORDER = 8        # 256×256 — same as the write-layout sort key


def _hgap_sql() -> str:
    x, y = points.sql_xy("doc_id")
    return f"""
    WITH pts AS (SELECT doc_id, {x} AS x, {y} AS y FROM documents),
    cxy AS (SELECT DISTINCT
                {cells.sql_cell('x', 'y', HG_ORDER)} AS id FROM pts),
    src AS (SELECT id, id & {(1 << cells.IY_SHIFT) - 1} AS hx,
                   (id >> {cells.IY_SHIFT})
                       & {(1 << cells.IY_SHIFT) - 1} AS hy
            FROM cxy),
    {hilbert.sql_hilbert_ctes('src', HG_ORDER)},
    g AS (SELECT hd, hd - lag(hd) OVER (ORDER BY hd) - 1 AS gap,
                 lag(hd) OVER (ORDER BY hd) AS prev
          FROM hd)
    SELECT CAST((SELECT MAX(gap) FROM g) AS BIGINT) AS max_gap,
           CAST((SELECT MIN(prev + 1) FROM g
                 WHERE gap = (SELECT MAX(gap) FROM g)) AS BIGINT)
               AS gap_start,
           CAST((SELECT COUNT(*) FROM hd) AS BIGINT) AS n_occupied"""


@register("hilbert_coverage_gaps", sql=_hgap_sql)
def hilbert_coverage_gaps(sf_dir: str):
    """Coverage-gap audit along the write layout: the LONGEST run of
    empty cells between occupied ones in Hilbert order (where an
    incremental crawl would spend longest without output; the
    'largest hole' statistic of the spatial coverage). Deterministic
    arg: smallest start rank attaining the max.

    Distributed scan shape: occupied cells → Hilbert ranks →
    range-partition by rank; each partition reports (min, max,
    best internal gap) and the driver folds the P−1 cross-partition
    gaps — one row per partition, no global sort."""
    from ..stages.shuffle import grouped_apply, partial_group_counts

    key = f"cell{HG_ORDER}"
    occ = partial_group_counts(_docs_points(sf_dir, (HG_ORDER,)), [key])
    mask = (1 << cells.IY_SHIFT) - 1

    def to_rank(t: pa.Table) -> pa.Table:
        c = t[key].to_numpy(zero_copy_only=False)
        hd = hilbert.xy_to_d(c & mask, (c >> cells.IY_SHIFT) & mask,
                             HG_ORDER)
        # range partition: 16 equal rank stripes over the 4^order curve
        part = hd // ((np.int64(1) << (2 * HG_ORDER)) // 16)
        return pa.table({"hd": pa.array(hd), "part": pa.array(part)})

    ranks = occ.map_batches(to_rank, batch_format="pyarrow")

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        import pandas as pd

        rows = []
        for p, g in df.groupby("part", sort=False):
            hd = np.sort(g["hd"].to_numpy(np.int64))
            if len(hd) > 1:
                gaps = hd[1:] - hd[:-1] - 1
                i = int(np.argmax(gaps))    # first max = smallest start
                bg, bs = int(gaps[i]), int(hd[i] + 1)
            else:
                bg, bs = -1, -1
            rows.append({"part": int(p), "lo": int(hd[0]),
                         "hi": int(hd[-1]), "best_gap": bg,
                         "best_start": bs, "n": len(hd)})
        return pd.DataFrame(rows)

    parts = grouped_apply(ranks, ["part"], per_part, num_buckets=8) \
        .take_all()                      # ≤ 16 rows: one per rank stripe
    parts.sort(key=lambda r: r["part"])
    best_gap, best_start, n_occ = -1, -1, 0
    prev_hi = None
    for r in parts:
        n_occ += int(r["n"])
        if prev_hi is not None:
            cross = int(r["lo"]) - prev_hi - 1
            if cross > best_gap:
                best_gap, best_start = cross, prev_hi + 1
        if int(r["best_gap"]) > best_gap:
            best_gap, best_start = int(r["best_gap"]), int(r["best_start"])
        prev_hi = int(r["hi"])
    import pandas as pd
    return pd.DataFrame([{"max_gap": np.int64(best_gap),
                          "gap_start": np.int64(best_start),
                          "n_occupied": np.int64(n_occ)}])


# --------------------------------------------------- label-coherence audit

LS_RES = 5


def _lsmooth_sql() -> str:
    x, y = points.sql_xy("doc_id")
    mask = (1 << cells.IY_SHIFT) - 1
    return f"""
    WITH pts AS (SELECT d.lang,
                        {cells.sql_cell(x, y, LS_RES)} AS cell5
                 FROM documents d),
    lc AS (SELECT cell5, lang, COUNT(*) AS n FROM pts GROUP BY 1, 2),
    mj AS (SELECT cell5, lang FROM lc
           QUALIFY row_number() OVER (PARTITION BY cell5
                                      ORDER BY n DESC, lang) = 1),
    c AS (SELECT cell5, lang, cell5 & {mask} AS ix,
                 (cell5 >> {cells.IY_SHIFT}) & {mask} AS iy FROM mj),
    pr AS (SELECT a.lang AS la, b.lang AS lb
           FROM c a JOIN c b
           ON (b.ix = a.ix + 1 AND b.iy = a.iy)
              OR (b.ix = a.ix AND b.iy = a.iy + 1))
    SELECT CAST(SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
               AS n_same,
           CAST(SUM(CASE WHEN la <> lb THEN 1 ELSE 0 END) AS BIGINT)
               AS n_diff,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM mj) AS n_cells
    FROM pr"""


@register("label_smoothing_audit", sql=_lsmooth_sql)
def label_smoothing_audit(sf_dir: str):
    """Spatial label coherence: among rook-adjacent occupied cells, how
    often do the two majority languages AGREE? The pre-smoothing audit
    for any label-map product (high n_diff ⇒ a majority-filter pass will
    flip many cells). Majority per cell with deterministic ties, then
    the join_count_stats searchsorted pairing over the bounded cell
    table; exact integers."""
    import pandas as pd

    from ..stages.shuffle import grouped_apply

    key = f"cell{LS_RES}"
    ds = read_table(sf_dir, "documents", ["doc_id", "lang"])
    ds = ds.map_batches(derive_and_encode("doc_id", (LS_RES,)),
                        batch_format="pyarrow", zero_copy_batch=True)

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "cell5": t[key].to_numpy(zero_copy_only=False),
            "lang": t["lang"].to_numpy(zero_copy_only=False)})
        g = df.groupby(["cell5", "lang"], as_index=False).size() \
            .rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum
    lc = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["cell5", "lang"]).aggregate(Sum("n", alias_name="n"))

    def majority(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={df.columns[-1]: "n"})
        df = df.sort_values(["cell5", "n", "lang"],
                            ascending=[True, False, True],
                            kind="mergesort")
        return df.drop_duplicates("cell5")[["cell5", "lang"]]

    mj = grouped_apply(lc, ["cell5"], majority)
    mask = (1 << cells.IY_SHIFT) - 1

    def fold(t: pa.Table) -> pa.Table:
        cell = t["cell5"].to_numpy(zero_copy_only=False)
        lang = t["lang"].to_numpy(zero_copy_only=False)
        order = np.argsort(cell)
        cell, lang = cell[order], lang[order]
        ix, iy = cell & mask, (cell >> cells.IY_SHIFT) & mask
        same = diff = 0
        for ncell in (cell + 1, cell + (np.int64(1) << cells.IY_SHIFT)):
            pos = np.searchsorted(cell, ncell)
            ok = pos < len(cell)
            ok &= np.where(ok, cell[np.minimum(pos, len(cell) - 1)]
                           == ncell, False)
            la = lang[ok]
            lb = lang[np.minimum(pos, len(cell) - 1)[ok]]
            same += int((la == lb).sum())
            diff += int((la != lb).sum())
        return pa.table({"n_same": pa.array([same], pa.int64()),
                         "n_diff": pa.array([diff], pa.int64()),
                         "n_cells": pa.array([len(cell)], pa.int64())})

    return mj.repartition(1).map_batches(fold, batch_format="pyarrow",
                                         batch_size=None)


# ----------------------------------------------- tile concentration (top-K)

TC_TOPK = 10


@register("tile_concentration_topk", sql=lambda: f"""
    WITH pts AS (SELECT {cells.sql_cell('x', 'y', RES)} AS cell7
                 FROM ({_points_cte()})),
    c AS (SELECT cell7, CAST(COUNT(*) AS BIGINT) AS n FROM pts
          GROUP BY 1),
    r AS (SELECT n, row_number() OVER (ORDER BY n DESC, cell7) AS rk
          FROM c)
    SELECT CAST(SUM(CASE WHEN rk <= {TC_TOPK} THEN n ELSE 0 END)
                AS BIGINT) AS topk_docs,
           CAST(SUM(n) AS BIGINT) AS total_docs,
           CAST(COUNT(*) AS BIGINT) AS n_cells
    FROM r""")
def tile_concentration_topk(sf_dir: str):
    """Spatial traffic concentration: how much of the corpus sits in the
    {K} hottest tiles (the spatial Lorenz point — quantifies the planted
    Helsinki skew the salting machinery exists for). Deterministic
    ranking (count desc, cell id); exact integer shares; one vectorized
    pass over the bounded cell aggregate."""
    import pandas as pd

    from ..stages.shuffle import partial_group_counts

    key = f"cell{RES}"
    cnt = partial_group_counts(_docs_points(sf_dir), [key])

    def fold(t: pa.Table) -> pa.Table:
        cell = t[key].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((cell, -n))
        top = int(n[order[:TC_TOPK]].sum())
        return pa.table({"topk_docs": pa.array([top], pa.int64()),
                         "total_docs": pa.array([int(n.sum())], pa.int64()),
                         "n_cells": pa.array([len(n)], pa.int64())})

    return cnt.repartition(1).map_batches(fold, batch_format="pyarrow",
                                          batch_size=None)


# ----------------------------------------------------- storage tiering plan

TIER_HOT_PCT, TIER_COLD_PCT = 90, 50


@register("storage_tiering_plan", sql=lambda: f"""
    WITH pts AS (SELECT {cells.sql_cell('x', 'y', RES)} AS cell7
                 FROM ({_points_cte()})),
    c AS (SELECT cell7, CAST(COUNT(*) AS BIGINT) AS n FROM pts
          GROUP BY 1),
    th AS (SELECT quantile_disc(n, {TIER_HOT_PCT / 100.0}) AS hot,
                  quantile_disc(n, {TIER_COLD_PCT / 100.0}) AS cold
           FROM c),
    t AS (SELECT CASE WHEN n >= th.hot THEN 'hot'
                      WHEN n >= th.cold THEN 'warm'
                      ELSE 'cold' END AS tier, n
          FROM c, th)
    SELECT tier, CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(n) AS BIGINT) AS n_docs
    FROM t GROUP BY tier""")
def storage_tiering_plan(sf_dir: str):
    """Access-tiering plan over the tile layout: cells classified
    hot/warm/cold by discrete count percentiles (p{90}/p{50} by
    SELECTION over the bounded cell aggregate — exact), with per-tier
    cell and row totals — the placement input for a hot-set cache /
    cold-archive split. Percentile indexes ⌈n·q⌉−1 match
    quantile_disc."""
    import pandas as pd

    from ..stages.shuffle import partial_group_counts

    key = f"cell{RES}"
    cnt = partial_group_counts(_docs_points(sf_dir), [key])

    def fold(t: pa.Table) -> pa.Table:
        n = np.sort(t["n"].to_numpy(zero_copy_only=False).astype(np.int64))
        k = len(n)
        hot = n[int(np.ceil(k * TIER_HOT_PCT / 100.0)) - 1]
        cold = n[int(np.ceil(k * TIER_COLD_PCT / 100.0)) - 1]
        nn = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        tier = np.where(nn >= hot, "hot",
                        np.where(nn >= cold, "warm", "cold"))
        df = pd.DataFrame({"tier": tier, "n_cells": 1, "n_docs": nn})
        return pa.Table.from_pandas(
            df.groupby("tier", as_index=False).sum(), preserve_index=False)

    return cnt.repartition(1).map_batches(fold, batch_format="pyarrow",
                                          batch_size=None)


# ------------------------- emerging-hotspot classification (space-time cube)
# The ESRI-style emerging-hotspot analysis: per-DAY Getis-Ord G* hot flags
# (hotspot_gi_cells' integer inequality, one surface per time slice)
# composed with a Mann-Kendall trend over each cell's focal-count series
# (mann_kendall_cells' statistic), classified by a deterministic integer
# CASE ladder.

US_PER_DAY = 24 * US_PER_HOUR
EHS_Z2 = 4                           # z > 2, squared
EHS_PCT_NUM, EHS_PCT_DEN = 9, 10     # "most days" = ≥ 90 % of slices


def _ehs_sql() -> str:
    x, y = points.sql_xy("event_id")
    n_lat = 1 << TREND_RES
    n_cells = n_lat * n_lat
    mask = (1 << cells.IY_SHIFT) - 1
    return f"""
    WITH e AS (SELECT {cells.sql_cell('p.x', 'p.y', TREND_RES)} AS cell,
                      (CAST(epoch_us(ts) AS BIGINT) - {TREND_T0_US})
                          // {US_PER_DAY} AS day
               FROM (SELECT event_id, ts, {x} AS x, {y} AS y
                     FROM events
                     -- pre-T0 rows are excluded on BOTH sides: DuckDB //
                     -- truncates toward zero while numpy floors, so a
                     -- negative epoch delta would land in different days
                     WHERE CAST(epoch_us(ts) AS BIGINT)
                           >= {TREND_T0_US}) p),
    c AS (SELECT cell, day, CAST(COUNT(*) AS BIGINT) AS y
          FROM e GROUP BY 1, 2),
    gd AS (SELECT day, CAST(SUM(y) AS BIGINT) AS s,
                  CAST(SUM(y * y) AS BIGINT) AS s2 FROM c GROUP BY 1),
    gl AS (SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS d_cnt,
                    CAST(MAX(day) AS BIGINT) AS d_max FROM c),
    off AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),
                                  (0,1),(1,-1),(1,0),(1,1)) o(dx, dy)),
    sc AS (SELECT ((CAST({TREND_RES} AS BIGINT) << {cells.RES_SHIFT})
                   | ((((cell >> {cells.IY_SHIFT}) & {mask}) + dy)
                       << {cells.IY_SHIFT})
                   | ((cell & {mask}) + dx)) AS cell,
                  day, (cell & {mask}) + dx AS jx,
                  ((cell >> {cells.IY_SHIFT}) & {mask}) + dy AS jy, y
           FROM c, off
           WHERE (cell & {mask}) + dx BETWEEN 0 AND {n_lat - 1}
             AND ((cell >> {cells.IY_SHIFT}) & {mask}) + dy
                 BETWEEN 0 AND {n_lat - 1}),
    f AS (SELECT cell, day, MIN(jx) AS jx, MIN(jy) AS jy,
                 CAST(SUM(y) AS BIGINT) AS t FROM sc GROUP BY 1, 2),
    k AS (SELECT cell, day, t,
                 CAST((CASE WHEN jx = 0 OR jx = {n_lat - 1}
                            THEN 2 ELSE 3 END)
                    * (CASE WHEN jy = 0 OR jy = {n_lat - 1}
                            THEN 2 ELSE 3 END) AS BIGINT) AS k
          FROM f),
    hot AS (SELECT k.cell, k.day,
                   CASE WHEN CAST({n_cells} AS HUGEINT) * k.t
                             > CAST(k.k AS HUGEINT) * gd.s
                         AND (CAST({n_cells} AS HUGEINT) * k.t
                              - CAST(k.k AS HUGEINT) * gd.s)
                             * (CAST({n_cells} AS HUGEINT) * k.t
                                - CAST(k.k AS HUGEINT) * gd.s)
                             * {n_cells - 1}
                             > CAST({EHS_Z2} AS HUGEINT)
                               * (CAST({n_cells} AS HUGEINT) * gd.s2
                                  - CAST(gd.s AS HUGEINT) * gd.s)
                               * (CAST({n_cells} AS HUGEINT) * k.k
                                  - CAST(k.k AS HUGEINT) * k.k)
                        THEN 1 ELSE 0 END AS hot
            FROM k JOIN gd ON gd.day = k.day),
    mk AS (SELECT a.cell,
                  CAST(SUM(CASE WHEN b.t > a.t THEN 1
                                WHEN b.t < a.t THEN -1 ELSE 0 END)
                       AS BIGINT) AS mk_s
           FROM f a JOIN f b ON b.cell = a.cell AND b.day > a.day
           GROUP BY 1),
    tv AS (SELECT cell, CAST(SUM(tk * (tk - 1) * (2 * tk + 5)) AS BIGINT)
                      AS tie
           FROM (SELECT cell, t, CAST(COUNT(*) AS BIGINT) AS tk
                 FROM f GROUP BY 1, 2) GROUP BY 1),
    agg AS (SELECT hot.cell, CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(SUM(hot.hot) AS BIGINT) AS n_hot,
                   CAST(MAX(CASE WHEN hot.day = gl.d_max
                                 THEN hot.hot ELSE 0 END) AS BIGINT)
                       AS hot_last,
                   CAST(MAX(gl.d_cnt) AS BIGINT) AS d_cnt
            FROM hot, gl GROUP BY 1),
    cls AS (SELECT agg.cell, agg.n_days, agg.n_hot, agg.hot_last,
                   CAST(COALESCE(mk.mk_s, 0) AS BIGINT) AS mk_s,
                   CAST(CASE WHEN agg.n_days >= 2
                             THEN agg.n_days * (agg.n_days - 1)
                                  * (2 * agg.n_days + 5) - tv.tie
                             ELSE 0 END AS BIGINT) AS var18,
                   agg.d_cnt
            FROM agg LEFT JOIN mk ON mk.cell = agg.cell
            LEFT JOIN tv ON tv.cell = agg.cell)
    SELECT cell AS cell5, n_days, n_hot, hot_last, mk_s, var18,
           CASE WHEN n_hot = 0 THEN 'none'
                WHEN hot_last = 1 AND n_hot = 1 THEN 'new'
                WHEN {EHS_PCT_DEN} * n_hot >= {EHS_PCT_NUM} * d_cnt
                     AND mk_s > 1
                     AND (mk_s - 1) * (mk_s - 1) * 18 > {EHS_Z2} * var18
                    THEN 'intensifying'
                WHEN {EHS_PCT_DEN} * n_hot >= {EHS_PCT_NUM} * d_cnt
                     AND mk_s < -1
                     AND (mk_s + 1) * (mk_s + 1) * 18 > {EHS_Z2} * var18
                    THEN 'diminishing'
                WHEN {EHS_PCT_DEN} * n_hot >= {EHS_PCT_NUM} * d_cnt
                    THEN 'persistent'
                WHEN hot_last = 1 THEN 'occasional'
                ELSE 'historical' END AS cls
    FROM cls"""


@register("emerging_hotspot_classes", sql=_ehs_sql)
def emerging_hotspot_classes(sf_dir: str):
    """Emerging-hotspot classification over the res-5 space-time cube:
    per DAY slice, the Getis-Ord G* hot flag (hotspot_gi_cells' squared
    integer inequality, N = full lattice with empties = 0, that day's
    S/S2); per cell, the Mann-Kendall S + tie-corrected var18 over the
    focal-count day series (mann_kendall_cells' statistic); a
    deterministic integer CASE ladder assigns the ESRI-style class
    (none/new/intensifying/diminishing/persistent/occasional/historical
    — 'most days' = ≥ 90 % of observed slices, trend significance =
    |z| > 2 via (S∓1)²·18 > Z²·var18). Scale shape: per-batch
    (cell, day) partial counts (wide events never shuffle) → 9-way
    scatter-to-neighbors → ONE cell-keyed shuffle in which each bucket
    does the focal sum, per-day hot test (per-day global stats are a
    ≤|days|-row broadcast) AND the per-cell trend + classification —
    no second exchange. Hot tests evaluate in arbitrary-precision
    Python ints (the SQL twin mirrors in HUGEINT), so no overflow and
    no float ever decides a boundary."""
    import pandas as pd
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum
    from ..stages.shuffle import grouped_apply, partial_group_counts

    n_lat = 1 << TREND_RES
    n_cells = n_lat * n_lat
    mask = (1 << cells.IY_SHIFT) - 1

    ev = read_table(sf_dir, "events", ["event_id", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        keep = us >= TREND_T0_US    # mirror of the twin's WHERE (the
        eid = t["event_id"].to_numpy(  # //-semantics divergence guard)
            zero_copy_only=False)[keep]
        x, y = points.derive_xy(eid)
        dd = (us[keep] - TREND_T0_US) // US_PER_DAY
        return pa.table({"cell": pa.array(cells.encode(x, y, TREND_RES)),
                         "day": pa.array(dd)})

    cd = partial_group_counts(
        ev.map_batches(derive, batch_format="pyarrow"), ["cell", "day"],
        count_col="y", partial_blocks=16).materialize()

    # per-day global stats — ≤ |days| rows, exact (cd is final counts)
    day_parts = cd.map_batches(
        lambda t: (pa.table({"day": t["day"],
                             "s": t["y"],
                             "s2": pa.array(
                                 t["y"].to_numpy(zero_copy_only=False)
                                 ** 2)})
                   .group_by(["day"])
                   .aggregate([("s", "sum"), ("s2", "sum")])
                   .rename_columns(["day", "s", "s2"])),
        batch_format="pyarrow")
    gd = (day_parts.groupby("day")
          .aggregate(Sum("s", alias_name="s"), Sum("s2", alias_name="s2"))
          .to_pandas())
    day_stats = {int(r.day): (int(r.s), int(r.s2))
                 for r in gd.itertuples()}
    d_max = max(day_stats)
    d_cnt = len(day_stats)

    def scatter(t: pa.Table) -> pa.Table:
        cell = t["cell"].to_numpy(zero_copy_only=False)
        day = t["day"].to_numpy(zero_copy_only=False)
        yv = t["y"].to_numpy(zero_copy_only=False)
        ix, iy = cell & mask, (cell >> cells.IY_SHIFT) & mask
        outc, outd, outy, outjx, outjy = [], [], [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                jx, jy = ix + dx, iy + dy
                ok = (jx >= 0) & (jx < n_lat) & (jy >= 0) & (jy < n_lat)
                outc.append((np.int64(TREND_RES) << cells.RES_SHIFT)
                            | (jy[ok] << cells.IY_SHIFT) | jx[ok])
                outd.append(day[ok])
                outy.append(yv[ok])
                outjx.append(jx[ok])
                outjy.append(jy[ok])
        return pa.table({"cell": np.concatenate(outc),
                         "day": np.concatenate(outd),
                         "y": np.concatenate(outy),
                         "jx": np.concatenate(outjx),
                         "jy": np.concatenate(outjy)})

    sc = cd.map_batches(scatter, batch_format="pyarrow")

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        f = (df.groupby(["cell", "day"], as_index=False)
             .agg(t=("y", "sum"), jx=("jx", "min"), jy=("jy", "min")))
        rows = []
        for cell, g in f.groupby("cell", sort=False):
            g = g.sort_values("day", kind="mergesort")
            days = g["day"].to_numpy(np.int64)
            tser = g["t"].to_numpy(np.int64)
            jx, jy = int(g["jx"].iloc[0]), int(g["jy"].iloc[0])
            kk = ((2 if jx in (0, n_lat - 1) else 3)
                  * (2 if jy in (0, n_lat - 1) else 3))
            n_days = len(days)
            n_hot, hot_last = 0, 0
            for d, tt in zip(days.tolist(), tser.tolist()):
                s, s2 = day_stats[d]
                lhs = n_cells * tt - kk * s
                hot = (lhs > 0 and
                       lhs * lhs * (n_cells - 1)
                       > EHS_Z2 * (n_cells * s2 - s * s)
                       * (n_cells * kk - kk * kk))
                if hot:
                    n_hot += 1
                    if d == d_max:
                        hot_last = 1
            if n_days >= 2:
                gt = tser[None, :] > tser[:, None]
                lt = tser[None, :] < tser[:, None]
                mk_s = int(np.triu(gt, 1).sum()) - int(np.triu(lt, 1).sum())
                _, tk = np.unique(tser, return_counts=True)
                tk = tk.astype(np.int64)
                var18 = (n_days * (n_days - 1) * (2 * n_days + 5)
                         - int((tk * (tk - 1) * (2 * tk + 5)).sum()))
            else:
                mk_s, var18 = 0, 0
            if n_hot == 0:
                c = "none"
            elif hot_last == 1 and n_hot == 1:
                c = "new"
            elif EHS_PCT_DEN * n_hot >= EHS_PCT_NUM * d_cnt:
                if (mk_s > 1
                        and (mk_s - 1) * (mk_s - 1) * 18 > EHS_Z2 * var18):
                    c = "intensifying"
                elif (mk_s < -1
                        and (mk_s + 1) * (mk_s + 1) * 18 > EHS_Z2 * var18):
                    c = "diminishing"
                else:
                    c = "persistent"
            elif hot_last == 1:
                c = "occasional"
            else:
                c = "historical"
            rows.append((int(cell), n_days, n_hot, hot_last, mk_s,
                         var18, c))
        out = pd.DataFrame(rows, columns=["cell5", "n_days", "n_hot",
                                          "hot_last", "mk_s", "var18",
                                          "cls"])
        for col in out.columns[:-1]:
            out[col] = out[col].astype(np.int64)
        return out

    return grouped_apply(sc, ["cell"], classify,
                         out_dtypes={c: pa.int64() for c in
                                     ("cell5", "n_days", "n_hot",
                                      "hot_last", "mk_s", "var18")})


# ----------------------------- raster reclassify + cross-tab (map algebra)

XTAB_MID_MULT = 3    # class 2 ends at 3× the layer mean


def _xtab_sql() -> str:
    xd, yd = points.sql_xy("doc_id")
    xe, ye = points.sql_xy("event_id")
    n_cells = 1 << (2 * MED_RES)
    return f"""
    WITH dp AS (SELECT {cells.sql_cell(xd, yd, MED_RES)} AS cell5
                FROM documents),
    ep AS (SELECT {cells.sql_cell(xe, ye, MED_RES)} AS cell5 FROM events),
    da AS (SELECT cell5, CAST(COUNT(*) AS BIGINT) AS a FROM dp GROUP BY 1),
    eb AS (SELECT cell5, CAST(COUNT(*) AS BIGINT) AS b FROM ep GROUP BY 1),
    u AS (SELECT COALESCE(da.cell5, eb.cell5) AS cell5,
                 COALESCE(a, 0) AS a, COALESCE(b, 0) AS b
          FROM da FULL OUTER JOIN eb ON da.cell5 = eb.cell5),
    g AS (SELECT CAST(SUM(a) AS BIGINT) AS ta,
                 CAST(SUM(b) AS BIGINT) AS tb FROM u),
    cl AS (SELECT CASE WHEN a = 0 THEN 0
                       WHEN a * {n_cells} <= g.ta THEN 1
                       WHEN a * {n_cells} <= {XTAB_MID_MULT} * g.ta THEN 2
                       ELSE 3 END AS class_a,
                  CASE WHEN b = 0 THEN 0
                       WHEN b * {n_cells} <= g.tb THEN 1
                       WHEN b * {n_cells} <= {XTAB_MID_MULT} * g.tb THEN 2
                       ELSE 3 END AS class_b
           FROM u, g)
    SELECT class_a, class_b, CAST(COUNT(*) AS BIGINT) AS n_cells
    FROM cl GROUP BY 1, 2"""


@register("raster_crosstab_classes", sql=_xtab_sql)
def raster_crosstab_classes(sf_dir: str):
    """Map-algebra RECLASSIFY + CROSS-TABULATION (the raster confusion
    matrix): each layer's per-cell count is reclassified into
    {{0: empty, 1: ≤ mean, 2: ≤ {XTAB_MID_MULT}× mean, 3: above}} with
    SCALE-INVARIANT integer thresholds (a·N_cells vs layer total — no
    division, no float, same classes at every sf), then the two class
    surfaces cross-tabulate over the union-of-support domain. The
    standard change-detection / layer-agreement product (cell_majority ×
    cell_change_detection's sibling for continuous layers).

    Shape: per-batch partial counts on each layer (wide tables never
    shuffle), ONE cell-keyed outer hash join of the two per-cell
    aggregates (≤ lattice rows), classification + ≤16-row contingency on
    the driver — the bounded-cell-aggregate contract (res-5 lattice =
    {{1024}} cells; at finer grids, classify per batch and fold count
    partials instead)."""
    from ..stages.join import hash_join
    from ..stages.shuffle import partial_group_counts

    n_cells = 1 << (2 * MED_RES)
    docs = _docs_points(sf_dir, resolutions=(MED_RES,)).map_batches(
        lambda t: t.select([f"cell{MED_RES}"]).rename_columns(["cell5"]),
        batch_format="pyarrow")
    ev = read_table(sf_dir, "events", ["event_id"]).map_batches(
        derive_and_encode("event_id", (MED_RES,)),
        batch_format="pyarrow", zero_copy_batch=True).map_batches(
        lambda t: t.select([f"cell{MED_RES}"]).rename_columns(["cell5"]),
        batch_format="pyarrow")

    da = partial_group_counts(docs, ["cell5"]).map_batches(
        lambda t: t.rename_columns(["cell5", "a"]), batch_format="pyarrow")
    eb = partial_group_counts(ev, ["cell5"]).map_batches(
        lambda t: t.rename_columns(["cell5", "b"]), batch_format="pyarrow")

    joined = hash_join(da, eb, on=["cell5"], how="outer").to_pandas()
    assert len(joined) <= n_cells
    import pandas as pd
    a = joined["a"].fillna(0).to_numpy(np.int64)
    b = joined["b"].fillna(0).to_numpy(np.int64)
    ta, tb = int(a.sum()), int(b.sum())

    def cls(v: np.ndarray, tot: int) -> np.ndarray:
        out = np.full(len(v), 3, np.int64)
        out[v * n_cells <= XTAB_MID_MULT * tot] = 2
        out[v * n_cells <= tot] = 1
        out[v == 0] = 0
        return out

    df = pd.DataFrame({"class_a": cls(a, ta), "class_b": cls(b, tb)})
    out = (df.groupby(["class_a", "class_b"], as_index=False)
           .size().rename(columns={"size": "n_cells"}))
    return out.astype(np.int64)


# --------------------------- shard rebalancing plan (transport on a line)

REBAL_RES = 5


def _rebal_sql() -> str:
    x, y = points.sql_xy("doc_id")
    n_lat = 1 << REBAL_RES
    n_shards = n_lat * n_lat
    mask = (1 << cells.IY_SHIFT) - 1
    cell = cells.sql_cell(x, y, REBAL_RES)
    return f"""
    WITH c AS (SELECT (({cell} >> {cells.IY_SHIFT}) & {mask}) * {n_lat}
                      + ({cell} & {mask}) AS r,
                      CAST(COUNT(*) AS BIGINT) AS n
               FROM documents GROUP BY 1),
    tot AS (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS t FROM c),
    lat AS (SELECT unnest(generate_series(0, {n_shards - 1})) AS r),
    s AS (SELECT lat.r,
                 COALESCE(c.n, 0)
                 - (tot.t // {n_shards}
                    + CASE WHEN lat.r < tot.t % {n_shards}
                           THEN 1 ELSE 0 END) AS surplus
          FROM lat LEFT JOIN c ON c.r = lat.r CROSS JOIN tot),
    f AS (SELECT r, CAST(SUM(surplus) OVER (ORDER BY r) AS BIGINT) AS flow
          FROM s)
    SELECT r AS boundary, flow FROM f
    WHERE flow <> 0 AND r < {n_shards - 1}"""


@register("shard_rebalance_flows", sql=_rebal_sql)
def shard_rebalance_flows(sf_dir: str):
    """Minimum-movement shard rebalancing plan over the row-major layout
    order — the 1-D transport problem solved in closed form: with shards
    on a line, the OPTIMAL rebalancing moves exactly
    flow(r) = Σ_{{i≤r}} (size_i − target_i) rows across each boundary r
    (sign = direction), and Σ|flow| is the provably minimal total
    movement. Targets are the uniform quota with the remainder assigned
    to the first (total mod n) shards — pure integers, so the plan is
    hash-exact. The maintenance complement of compaction_plan (file
    sizing) and storage_tiering_plan (placement): this one says what to
    MOVE.

    Shape: per-batch (shard → count) partials (documents never move);
    the lattice fill + prefix sum run on the bounded res-{REBAL_RES}
    aggregate ({1 << (2 * REBAL_RES)} rows) — at a data-scale shard
    count, swap the driver fold for stages/scan.global_cumsum over the
    same surplus rows (two-pass distributed prefix sum, same math)."""
    from ..stages.derive import derive_and_encode
    from ..stages.shuffle import partial_group_counts

    n_lat = 1 << REBAL_RES
    n_shards = n_lat * n_lat
    mask = (1 << cells.IY_SHIFT) - 1

    ds = read_table(sf_dir, "documents", ["doc_id"])
    ds = ds.map_batches(derive_and_encode("doc_id", (REBAL_RES,)),
                        batch_format="pyarrow", zero_copy_batch=True)

    def to_r(t: pa.Table) -> pa.Table:
        cell = t[f"cell{REBAL_RES}"].to_numpy(zero_copy_only=False)
        r = ((cell >> cells.IY_SHIFT) & mask) * n_lat + (cell & mask)
        return pa.table({"r": pa.array(r)})

    cnt = partial_group_counts(ds.map_batches(to_r, batch_format="pyarrow"),
                               ["r"]).to_pandas()
    cnt = cnt.rename(columns=dict(zip(cnt.columns, ["r", "n"])))
    assert len(cnt) <= n_shards
    sizes = np.zeros(n_shards, np.int64)
    sizes[cnt["r"].to_numpy(np.int64)] = cnt["n"].to_numpy(np.int64)
    total = int(sizes.sum())
    target = np.full(n_shards, total // n_shards, np.int64)
    target[:total % n_shards] += 1
    flow = np.cumsum(sizes - target)
    keep = (flow != 0) & (np.arange(n_shards) < n_shards - 1)
    import pandas as pd
    return pd.DataFrame({"boundary": np.arange(n_shards)[keep],
                         "flow": flow[keep]})


# ------------------------------ D8 flow directions (hydrology map algebra)

D8_DIRS = [(-1, -1), (-1, 0), (-1, 1), (0, -1),
           (0, 1), (1, -1), (1, 0), (1, 1)]   # (dx, dy), index 0..7
# res 4 (16x16): dense enough that interior cells flow into OCCUPIED
# neighbors and basins form (res 5 is so sparse every steepest drop goes
# to an empty neighbor and accumulation degenerates to 1)
D8_RES = 4


def _d8_sql() -> str:
    x, y = points.sql_xy("doc_id")
    n_lat = 1 << D8_RES
    mask = (1 << cells.IY_SHIFT) - 1
    offs = ", ".join(f"({i}, {dx}, {dy})"
                     for i, (dx, dy) in enumerate(D8_DIRS))
    return f"""
    WITH c AS (SELECT {cells.sql_cell(x, y, D8_RES)} AS cell,
                      CAST(COUNT(*) AS BIGINT) AS n
               FROM documents GROUP BY 1),
    o AS (SELECT * FROM (VALUES {offs}) t(dir, dx, dy)),
    cand AS (SELECT a.cell, o.dir,
                    a.n - COALESCE(b.n, 0) AS drop
             FROM c a CROSS JOIN o
             LEFT JOIN c b ON b.cell =
                 ((CAST({D8_RES} AS BIGINT) << {cells.RES_SHIFT})
                  | ((((a.cell >> {cells.IY_SHIFT}) & {mask}) + o.dy)
                      << {cells.IY_SHIFT})
                  | ((a.cell & {mask}) + o.dx))
             WHERE (a.cell & {mask}) + o.dx BETWEEN 0 AND {n_lat - 1}
               AND ((a.cell >> {cells.IY_SHIFT}) & {mask}) + o.dy
                   BETWEEN 0 AND {n_lat - 1}),
    best AS (SELECT cell, dir, drop,
                    row_number() OVER (PARTITION BY cell
                                       ORDER BY drop DESC, dir) AS rn
             FROM cand)
    SELECT cell AS cell4,
           CAST(CASE WHEN drop > 0 THEN dir ELSE -1 END AS BIGINT) AS dir,
           drop FROM best WHERE rn = 1"""


@register("d8_flow_directions", sql=_d8_sql)
def d8_flow_directions(sf_dir: str):
    """D8 steepest-descent flow direction per occupied cell — the
    hydrology/map-algebra focal primitive (flow routing, catchment
    seeds) applied to the document count surface as elevation: each
    occupied cell flows toward the 8-neighbor with the largest positive
    drop (absent neighbors = height 0; deterministic ties by direction
    index; a cell with no lower in-lattice neighbor is a pit, dir −1).
    Shape: per-batch partial counts; occupied cells scatter their height
    to each in-lattice neighbor tagged with the direction that neighbor
    sees them from (the focal_density/sobel scatter pattern); ONE
    cell-keyed shuffle gathers own height + received neighbor heights
    and the per-cell argmax is pure integer arithmetic."""
    import pandas as pd

    from ..stages.shuffle import grouped_apply, partial_group_counts

    n_lat = 1 << D8_RES
    mask = (1 << cells.IY_SHIFT) - 1
    key = f"cell{D8_RES}"
    cnt = partial_group_counts(
        _docs_points(sf_dir, resolutions=(D8_RES,)).map_batches(
            lambda t: t.select([key]), batch_format="pyarrow"),
        [key]).materialize()

    def scatter(t: pa.Table) -> pa.Table:
        cell = t[key].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        ix, iy = cell & mask, (cell >> cells.IY_SHIFT) & mask
        outc, outd, outn = [cell], [np.full(len(cell), -1, np.int64)], [n]
        for d, (dx, dy) in enumerate(D8_DIRS):
            # occupied cell b is seen from a = b − (dx,dy) in direction d
            jx, jy = ix - dx, iy - dy
            ok = (jx >= 0) & (jx < n_lat) & (jy >= 0) & (jy < n_lat)
            outc.append((np.int64(D8_RES) << cells.RES_SHIFT)
                        | (jy[ok] << cells.IY_SHIFT) | jx[ok])
            outd.append(np.full(int(ok.sum()), d, np.int64))
            outn.append(n[ok])
        return pa.table({"cell": np.concatenate(outc),
                         "dir": np.concatenate(outd),
                         "nb": np.concatenate(outn)})

    sc = cnt.map_batches(scatter, batch_format="pyarrow")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for cell, g in df.groupby("cell", sort=False):
            own = g.loc[g["dir"] == -1, "nb"]
            if own.empty:
                continue          # scatter-only reach: cell not occupied
            h = int(own.iloc[0])
            ix = int(cell) & mask
            iy = (int(cell) >> cells.IY_SHIFT) & mask
            nb = {}
            for d, (dx, dy) in enumerate(D8_DIRS):
                jx, jy = ix + dx, iy + dy
                if 0 <= jx < n_lat and 0 <= jy < n_lat:
                    nb[d] = 0
            for d, v in zip(g["dir"], g["nb"]):
                if d >= 0 and d in nb:
                    nb[int(d)] = int(v)
            best_d, best_drop = -1, None
            for d in sorted(nb):
                drop = h - nb[d]
                if best_drop is None or drop > best_drop:
                    best_d, best_drop = d, drop
            rows.append((int(cell),
                         best_d if best_drop > 0 else -1, best_drop))
        return pd.DataFrame(rows, columns=["cell4", "dir", "drop"]) \
            .astype(np.int64)

    return grouped_apply(sc, ["cell"], finish,
                         out_dtypes={c: pa.int64() for c in
                                     ("cell4", "dir", "drop")})


def _d8acc_sql() -> str:
    mask = (1 << cells.IY_SHIFT) - 1
    offs = ", ".join(f"({i}, {dx}, {dy})"
                     for i, (dx, dy) in enumerate(D8_DIRS))
    return f"""
    WITH RECURSIVE d8 AS ({_d8_sql()}),
    o AS (SELECT * FROM (VALUES {offs}) t(dir, dx, dy)),
    nxt AS (SELECT d8.cell4 AS cell,
                   CASE WHEN d8.dir = -1 THEN NULL
                        ELSE ((CAST({D8_RES} AS BIGINT)
                               << {cells.RES_SHIFT})
                              | ((((d8.cell4 >> {cells.IY_SHIFT})
                                   & {mask}) + o.dy) << {cells.IY_SHIFT})
                              | ((d8.cell4 & {mask}) + o.dx)) END AS nx
            FROM d8 LEFT JOIN o ON o.dir = d8.dir),
    reach AS (SELECT cell AS at, cell AS src FROM nxt
              UNION ALL
              -- follow the pointer only while the TARGET is occupied:
              -- flow into an empty cell leaves the surface (the engine's
              -- nxt = -1 convention)
              SELECT nxt.nx, reach.src
              FROM reach JOIN nxt ON nxt.cell = reach.at
              JOIN nxt occ ON occ.cell = nxt.nx)
    SELECT at AS cell4, CAST(COUNT(*) AS BIGINT) AS acc
    FROM reach GROUP BY 1"""


@register("d8_flow_accumulation", sql=_d8acc_sql)
def d8_flow_accumulation(sf_dir: str):
    """D8 flow ACCUMULATION — the catchment statistic on top of
    d8_flow_directions: per cell, the number of occupied cells whose
    steepest-descent path passes through it (itself included); pits
    collect their whole basin. The flow graph is a FOREST by
    construction (drop > 0 ⇒ strictly decreasing height along flow ⇒
    acyclic), so accumulation is exact parent-sum in reverse
    topological order (Kahn elimination on the single-out-pointer
    graph). Scale shape: the heavy work is d8_flow_directions' focal
    scatter + shuffle; the fold runs on the BOUNDED per-cell direction
    table (≤ 4^res rows — the documented lattice contract shared with
    the Gi*/rebalance/tiering family; a data-scale lattice would swap
    in rounds of grouped_apply frontier elimination, same math).
    Oracle: recursive-CTE path expansion over the same twin."""
    import pandas as pd

    d8 = d8_flow_directions(sf_dir).to_pandas()
    n_lat = 1 << D8_RES
    assert len(d8) <= n_lat * n_lat
    mask = (1 << cells.IY_SHIFT) - 1
    cell = d8["cell4"].to_numpy(np.int64)
    dirs = d8["dir"].to_numpy(np.int64)
    idx = {int(c): i for i, c in enumerate(cell)}
    nxt = np.full(len(cell), -1, np.int64)
    for i, (c, dd) in enumerate(zip(cell, dirs)):
        if dd >= 0:
            dx, dy = D8_DIRS[int(dd)]
            jx = (int(c) & mask) + dx
            jy = ((int(c) >> cells.IY_SHIFT) & mask) + dy
            nc = ((D8_RES << cells.RES_SHIFT)
                  | (jy << cells.IY_SHIFT) | jx)
            nxt[i] = idx.get(nc, -1)   # flow into an EMPTY cell ends there
    acc = np.ones(len(cell), np.int64)
    indeg = np.zeros(len(cell), np.int64)
    for j in nxt:
        if j >= 0:
            indeg[j] += 1
    frontier = [i for i in range(len(cell)) if indeg[i] == 0]
    while frontier:
        nxt_frontier = []
        for i in frontier:
            j = int(nxt[i])
            if j >= 0:
                acc[j] += acc[i]
                indeg[j] -= 1
                if indeg[j] == 0:
                    nxt_frontier.append(j)
        frontier = nxt_frontier
    return pd.DataFrame({"cell4": cell, "acc": acc})


def _d8ws_sql() -> str:
    mask = (1 << cells.IY_SHIFT) - 1
    offs = ", ".join(f"({i}, {dx}, {dy})"
                     for i, (dx, dy) in enumerate(D8_DIRS))
    return f"""
    WITH RECURSIVE d8 AS ({_d8_sql()}),
    o AS (SELECT * FROM (VALUES {offs}) t(dir, dx, dy)),
    nxt AS (SELECT d8.cell4 AS cell,
                   CASE WHEN d8.dir = -1 THEN NULL
                        ELSE ((CAST({D8_RES} AS BIGINT)
                               << {cells.RES_SHIFT})
                              | ((((d8.cell4 >> {cells.IY_SHIFT})
                                   & {mask}) + o.dy) << {cells.IY_SHIFT})
                              | ((d8.cell4 & {mask}) + o.dx)) END AS nx
            FROM d8 LEFT JOIN o ON o.dir = d8.dir),
    walk AS (SELECT cell AS src, cell AS cur FROM nxt
             UNION ALL
             SELECT walk.src, nxt.nx
             FROM walk JOIN nxt ON nxt.cell = walk.cur
             JOIN nxt occ ON occ.cell = nxt.nx)
    SELECT walk.src AS cell4, walk.cur AS basin
    FROM walk JOIN nxt n ON n.cell = walk.cur
    WHERE n.nx IS NULL
       OR NOT EXISTS (SELECT 1 FROM nxt occ WHERE occ.cell = n.nx)"""


@register("d8_watershed_labels", sql=_d8ws_sql)
def d8_watershed_labels(sf_dir: str):
    """Watershed labeling — the third leg of the hydrology triple
    (direction → accumulation → basin): each occupied cell is labeled
    with the TERMINAL cell its steepest-descent path drains to (a pit,
    or the last occupied cell before the flow exits the surface).
    Pointer following on the acyclic flow forest via pointer DOUBLING
    (O(log depth) rounds) over the bounded per-cell table — the same
    lattice contract as d8_flow_accumulation; the distributed form is
    the cluster_pairs_ds pointer-jumping loop. Oracle: recursive-CTE
    walk to the terminal."""
    import pandas as pd

    d8 = d8_flow_directions(sf_dir).to_pandas()
    n_lat = 1 << D8_RES
    assert len(d8) <= n_lat * n_lat
    mask = (1 << cells.IY_SHIFT) - 1
    cell = d8["cell4"].to_numpy(np.int64)
    dirs = d8["dir"].to_numpy(np.int64)
    idx = {int(c): i for i, c in enumerate(cell)}
    nxt = np.arange(len(cell), dtype=np.int64)   # terminal points to self
    for i, (c, dd) in enumerate(zip(cell, dirs)):
        if dd >= 0:
            dx, dy = D8_DIRS[int(dd)]
            jx = (int(c) & mask) + dx
            jy = ((int(c) >> cells.IY_SHIFT) & mask) + dy
            nc = ((D8_RES << cells.RES_SHIFT)
                  | (jy << cells.IY_SHIFT) | jx)
            j = idx.get(nc)
            if j is not None:
                nxt[i] = j
    # pointer doubling to the fixed point (log2(depth) rounds)
    while True:
        nn = nxt[nxt]
        if (nn == nxt).all():
            break
        nxt = nn
    return pd.DataFrame({"cell4": cell, "basin": cell[nxt]})


# ----------------------------- bivariate Moran (cross-layer association)

def _bimoran_sql() -> str:
    n, N, W = _morans_consts()
    mask = (1 << cells.IY_SHIFT) - 1
    xd, yd = points.sql_xy("doc_id")
    xe, ye = points.sql_xy("event_id")
    dega = (f"(4 - CASE WHEN ix = 0 THEN 1 ELSE 0 END"
            f" - CASE WHEN ix = {n - 1} THEN 1 ELSE 0 END"
            f" - CASE WHEN iy = 0 THEN 1 ELSE 0 END"
            f" - CASE WHEN iy = {n - 1} THEN 1 ELSE 0 END)")
    return f"""
    WITH ca AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS v,
                       cell & {mask} AS ix,
                       (cell >> {cells.IY_SHIFT}) & {mask} AS iy
                FROM (SELECT {cells.sql_cell(xd, yd, RES)} AS cell
                      FROM documents) GROUP BY 1),
    cb AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS v,
                  cell & {mask} AS ix,
                  (cell >> {cells.IY_SHIFT}) & {mask} AS iy
           FROM (SELECT {cells.sql_cell(xe, ye, RES)} AS cell
                 FROM events) GROUP BY 1),
    sa AS (SELECT CAST(SUM(v) AS BIGINT) AS s,
                  CAST(SUM(v * v) AS BIGINT) AS s2,
                  CAST(SUM(v * {dega}) AS BIGINT) AS degv FROM ca),
    sb AS (SELECT CAST(SUM(v) AS BIGINT) AS s,
                  CAST(SUM(v * v) AS BIGINT) AS s2,
                  CAST(SUM(v * {dega}) AS BIGINT) AS degv FROM cb),
    cr AS (SELECT CAST(COALESCE(SUM(a.v * b.v), 0) AS BIGINT) AS cab
           FROM ca a JOIN cb b
           ON abs(a.ix - b.ix) + abs(a.iy - b.iy) = 1)
    SELECT CAST({N} AS BIGINT) AS n_cells, CAST({W} AS BIGINT) AS w_pairs,
           sa.s AS n_docs, sb.s AS n_events, cr.cab AS cross_ab,
           CAST(CAST({N} AS HUGEINT) * {N} * cr.cab
                - CAST({N} AS HUGEINT) * sb.s * sa.degv
                - CAST({N} AS HUGEINT) * sa.s * sb.degv
                + CAST(sa.s AS HUGEINT) * sb.s * {W} AS BIGINT)
               AS num_scaled,
           CAST(CAST({N} AS HUGEINT) * {N} * sa.s2
                - CAST({N} AS HUGEINT) * sa.s * sa.s AS BIGINT) AS den_a,
           CAST(CAST({N} AS HUGEINT) * {N} * sb.s2
                - CAST({N} AS HUGEINT) * sb.s * sb.s AS BIGINT) AS den_b,
           (CAST(CAST({N} AS HUGEINT) * {N} * cr.cab
                 - CAST({N} AS HUGEINT) * sb.s * sa.degv
                 - CAST({N} AS HUGEINT) * sa.s * sb.degv
                 + CAST(sa.s AS HUGEINT) * sb.s * {W} AS DOUBLE)
            / sqrt(CAST(CAST({N} AS HUGEINT) * {N} * sa.s2
                        - CAST({N} AS HUGEINT) * sa.s * sa.s AS DOUBLE)
                   * CAST(CAST({N} AS HUGEINT) * {N} * sb.s2
                          - CAST({N} AS HUGEINT) * sb.s * sb.s
                          AS DOUBLE)))
           * (CAST({N} AS DOUBLE) / CAST({W} AS DOUBLE)) AS moran_xy
    FROM sa, sb, cr"""


@register("bivariate_moran_terms", sql=_bimoran_sql)
def bivariate_moran_terms(sf_dir: str):
    """BIVARIATE Moran's I — cross-layer spatial association between the
    document and event count surfaces on the res-7 lattice (rook
    weights, empties = 0): does doc density co-locate with NEIGHBORING
    event density? Complements cell_layer_corr_terms (same-cell Pearson)
    and cross_k_image_doc (distance-band K). Integer-exact via the
    morans_i centering trick applied twice (A_i = N·a_i − Sa sums to
    zero over the lattice): num = N²·Σ_adj a_i b_j − N·Sb·Σa·deg −
    N·Sa·Σb·deg + Sa·Sb·W, den = the two univariate den terms — all
    int64 partials over the SPARSE occupied tables; the one float
    expression (num / sqrt(denA·denB) · N/W) is pinned identically on
    both sides. Shape: two per-batch partial-count tables, ONE rook
    scatter of the b surface, one cell hash join, 6-int fold."""
    import pandas as pd

    from ..stages.derive import derive_and_encode
    from ..stages.join import hash_join
    from ..stages.shuffle import partial_group_counts

    n, N, W = _morans_consts()
    key = f"cell{RES}"
    mask = (1 << cells.IY_SHIFT) - 1

    cnt_a = partial_group_counts(_docs_points(sf_dir), [key]).materialize()
    ev = read_table(sf_dir, "events", ["event_id"]).map_batches(
        derive_and_encode("event_id", (RES,)),
        batch_format="pyarrow", zero_copy_batch=True)
    cnt_b = partial_group_counts(ev, [key]).materialize()

    def stats_of(cnt):
        def part(t: pa.Table) -> pa.Table:
            v = t["n"].to_numpy(zero_copy_only=False)
            cell = t[key].to_numpy(zero_copy_only=False)
            ix, iy = cell & mask, (cell >> cells.IY_SHIFT) & mask
            deg = (4 - (ix == 0) - (ix == n - 1)
                   - (iy == 0) - (iy == n - 1)).astype(np.int64)
            return pa.table({
                "s": pa.array([int(v.sum())], pa.int64()),
                "s2": pa.array([int((v * v).sum())], pa.int64()),
                "degv": pa.array([int((v * deg).sum())], pa.int64())})
        r = cnt.map_batches(part, batch_format="pyarrow").aggregate(
            Sum("s", alias_name="s"), Sum("s2", alias_name="s2"),
            Sum("degv", alias_name="degv"))
        return int(r["s"]), int(r["s2"]), int(r["degv"])

    s_a, s2_a, deg_a = stats_of(cnt_a)
    s_b, s2_b, deg_b = stats_of(cnt_b)

    nbr_b = _rook_neighbor_sums(cnt_b, key, n)
    joined = hash_join(
        nbr_b.map_batches(lambda t: t.rename_columns([key, "sx"]),
                          batch_format="pyarrow"),
        cnt_a, on=[key])

    def cross_part(t: pa.Table) -> pa.Table:
        v = (t["sx"].to_numpy(zero_copy_only=False)
             * t["n"].to_numpy(zero_copy_only=False))
        return pa.table({"cab": pa.array([int(v.sum())], pa.int64())})

    cab = int(joined.map_batches(cross_part, batch_format="pyarrow")
              .aggregate(Sum("cab", alias_name="cab"))["cab"])

    num = N * N * cab - N * s_b * deg_a - N * s_a * deg_b + s_a * s_b * W
    den_a = N * N * s2_a - N * s_a * s_a
    den_b = N * N * s2_b - N * s_b * s_b
    mi = (np.float64(num)
          / np.sqrt(np.float64(den_a) * np.float64(den_b))) \
        * (np.float64(N) / np.float64(W))
    return pd.DataFrame({
        "n_cells": np.array([N], np.int64),
        "w_pairs": np.array([W], np.int64),
        "n_docs": np.array([s_a], np.int64),
        "n_events": np.array([s_b], np.int64),
        "cross_ab": np.array([cab], np.int64),
        "num_scaled": np.array([num], np.int64),
        "den_a": np.array([den_a], np.int64),
        "den_b": np.array([den_b], np.int64),
        "moran_xy": np.array([mi], np.float64)})


# ----------------------------------------- Geary's C (companion statistic)

def _geary_sql() -> str:
    n, N, W = _morans_consts()
    mask = (1 << cells.IY_SHIFT) - 1
    deg = (f"(4 - CASE WHEN ix = 0 THEN 1 ELSE 0 END"
           f" - CASE WHEN ix = {n - 1} THEN 1 ELSE 0 END"
           f" - CASE WHEN iy = 0 THEN 1 ELSE 0 END"
           f" - CASE WHEN iy = {n - 1} THEN 1 ELSE 0 END)")
    return f"""
    WITH pts AS (SELECT {cells.sql_cell('x', 'y', RES)} AS cell
                 FROM ({_points_cte()})),
    c AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS x,
                 cell & {mask} AS ix,
                 (cell >> {cells.IY_SHIFT}) & {mask} AS iy
          FROM pts GROUP BY 1),
    base AS (SELECT CAST(SUM(x) AS BIGINT) AS s,
                    CAST(SUM(x * x) AS BIGINT) AS sx2,
                    CAST(SUM(x * x * {deg}) AS BIGINT) AS degx2
             FROM c),
    cr AS (SELECT CAST(COALESCE(SUM(a.x * b.x), 0) AS BIGINT) AS cross_x
           FROM c a JOIN c b
           ON abs(a.ix - b.ix) + abs(a.iy - b.iy) = 1)
    SELECT CAST({N} AS BIGINT) AS n_cells, CAST({W} AS BIGINT) AS w_pairs,
           base.s AS n_points,
           2 * (base.degx2 - cr.cross_x) AS num_inner,
           CAST(CAST({N} AS HUGEINT) * base.sx2
                - CAST(base.s AS HUGEINT) * base.s AS BIGINT)
               AS den_scaled,
           (CAST({N - 1} AS DOUBLE)
            * CAST(2 * (base.degx2 - cr.cross_x) AS DOUBLE)
            * CAST({N} AS DOUBLE))
           / (CAST(2 * {W} AS DOUBLE)
              * CAST(CAST({N} AS HUGEINT) * base.sx2
                     - CAST(base.s AS HUGEINT) * base.s AS DOUBLE))
               AS gearys_c
    FROM base, cr"""


@register("gearys_c_cells", sql=_geary_sql)
def gearys_c_cells(sf_dir: str):
    """Geary's C — Moran's I's companion global statistic (sensitive to
    local rather than global structure; C < 1 = positive autocorrelation)
    over the same res-7 rook lattice with empties = 0. Integer-exact
    without centering: Σ w_ij (x_i−x_j)² = 2(Σ deg_i x_i² − Σ_adj x_i x_j)
    — squared differences are translation-invariant, so the raw-count
    identity holds over the full lattice with only sparse-table sums;
    C = (N−1)·num·N / (2W·(N·Σx² − S²)) pinned as one float expression.
    Shares morans_i_cells' scatter/join machinery; one extra int partial
    (Σ x²·deg)."""
    import pandas as pd

    from ..stages.join import hash_join
    from ..stages.shuffle import partial_group_counts

    n, N, W = _morans_consts()
    key = f"cell{RES}"
    mask = (1 << cells.IY_SHIFT) - 1
    cnt = partial_group_counts(_docs_points(sf_dir), [key]).materialize()

    def part(t: pa.Table) -> pa.Table:
        x = t["n"].to_numpy(zero_copy_only=False)
        cell = t[key].to_numpy(zero_copy_only=False)
        ix, iy = cell & mask, (cell >> cells.IY_SHIFT) & mask
        deg = (4 - (ix == 0) - (ix == n - 1)
               - (iy == 0) - (iy == n - 1)).astype(np.int64)
        return pa.table({
            "s": pa.array([int(x.sum())], pa.int64()),
            "sx2": pa.array([int((x * x).sum())], pa.int64()),
            "degx2": pa.array([int((x * x * deg).sum())], pa.int64())})

    b = cnt.map_batches(part, batch_format="pyarrow").aggregate(
        Sum("s", alias_name="s"), Sum("sx2", alias_name="sx2"),
        Sum("degx2", alias_name="degx2"))
    s, sx2, degx2 = int(b["s"]), int(b["sx2"]), int(b["degx2"])

    nbr = _rook_neighbor_sums(cnt, key, n)
    joined = hash_join(
        nbr.map_batches(lambda t: t.rename_columns([key, "sx"]),
                        batch_format="pyarrow"),
        cnt, on=[key])

    def cross_part(t: pa.Table) -> pa.Table:
        v = (t["sx"].to_numpy(zero_copy_only=False)
             * t["n"].to_numpy(zero_copy_only=False))
        return pa.table({"cx": pa.array([int(v.sum())], pa.int64())})

    cross_x = int(joined.map_batches(cross_part, batch_format="pyarrow")
                  .aggregate(Sum("cx", alias_name="cx"))["cx"])

    num_inner = 2 * (degx2 - cross_x)
    den = N * sx2 - s * s
    c = (np.float64(N - 1) * np.float64(num_inner) * np.float64(N)) \
        / (np.float64(2 * W) * np.float64(den))
    return pd.DataFrame({
        "n_cells": np.array([N], np.int64),
        "w_pairs": np.array([W], np.int64),
        "n_points": np.array([s], np.int64),
        "num_inner": np.array([num_inner], np.int64),
        "den_scaled": np.array([den], np.int64),
        "gearys_c": np.array([c], np.float64)})


# --------------------- range-size (footprint) histogram per cell

def _rangesize_sql() -> str:
    x, y = points.sql_xy("event_id")
    return f"""
    WITH pc AS (SELECT DISTINCT user_id,
                       {cells.sql_cell(x, y, MED_RES)} AS cell
                FROM events),
    r AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS rng
          FROM pc GROUP BY 1),
    b AS (SELECT pc.cell,
                 CAST(floor(log2(r.rng)) AS BIGINT) AS rng_bucket
          FROM pc JOIN r ON r.user_id = pc.user_id)
    SELECT cell AS cell5, rng_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM b GROUP BY 1, 2"""


@register("user_range_size_by_cell", sql=_rangesize_sql)
def user_range_size_by_cell(sf_dir: str):
    """Range-size (mobility footprint) composition per cell — the
    rarity-weighted-richness input shape from ecology (per species:
    occupied-cell count; per cell: histogram of the range sizes seen
    there) applied to users: how LOCAL are the users observed in each
    res-5 cell? Two-level grouping: distinct (user, cell) pairs → per-
    user range size → log₂ bucket joined back onto the pairs → per
    (cell, bucket) user counts. log₂ on an int is exact for the
    comparison (both sides bucket the same integer). Shape: distinct
    pairs via one (user, cell) dedup shuffle; range sizes via per-batch
    partials on the deduped pairs; ONE user-keyed hash join; only
    (cell, bucket) count partials in the finale — raw events never
    shuffle twice."""
    from ..stages.join import hash_join
    from ..stages.shuffle import partial_group_counts

    ev = read_table(sf_dir, "events", ["event_id", "user_id"])

    def derive(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        x, y = points.derive_xy(eid)
        return pa.table({"user_id": t["user_id"],
                         "cell": pa.array(cells.encode(x, y, MED_RES))})

    pairs = partial_group_counts(
        ev.map_batches(derive, batch_format="pyarrow"),
        ["user_id", "cell"], count_col="_c").map_batches(
        lambda t: t.select(["user_id", "cell"]),
        batch_format="pyarrow").materialize()

    rng = partial_group_counts(pairs, ["user_id"], count_col="rng")
    joined = hash_join(pairs, rng, on=["user_id"])

    def bucketed(t: pa.Table) -> pa.Table:
        r = t["rng"].to_numpy(zero_copy_only=False)
        # floor(log2(int)) via the float64 EXPONENT (np.frexp) — exact
        # for every int < 2^53 and vectorized (a bit_length Python loop
        # here paid interpreter cost per distinct (user, cell) pair)
        b = (np.frexp(r.astype(np.float64))[1] - 1).astype(np.int64)
        return pa.table({"cell": t["cell"], "rng_bucket": pa.array(b)})

    out = partial_group_counts(
        joined.map_batches(bucketed, batch_format="pyarrow"),
        ["cell", "rng_bucket"], count_col="n_users")
    return out.map_batches(
        lambda t: t.rename_columns(["cell5", "rng_bucket", "n_users"]),
        batch_format="pyarrow")


# --------------------------------------- Getis-Ord General G (global)

def _generalg_sql() -> str:
    n, N, W = _morans_consts()
    mask = (1 << cells.IY_SHIFT) - 1
    return f"""
    WITH pts AS (SELECT {cells.sql_cell('x', 'y', RES)} AS cell
                 FROM ({_points_cte()})),
    c AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS x,
                 cell & {mask} AS ix,
                 (cell >> {cells.IY_SHIFT}) & {mask} AS iy
          FROM pts GROUP BY 1),
    base AS (SELECT CAST(SUM(x) AS BIGINT) AS s,
                    CAST(SUM(x * x) AS BIGINT) AS sx2 FROM c),
    cr AS (SELECT CAST(COALESCE(SUM(a.x * b.x), 0) AS BIGINT) AS cross_x
           FROM c a JOIN c b
           ON abs(a.ix - b.ix) + abs(a.iy - b.iy) = 1)
    SELECT CAST({N} AS BIGINT) AS n_cells, CAST({W} AS BIGINT) AS w_pairs,
           base.s AS n_points, cr.cross_x,
           CAST(CAST(base.s AS HUGEINT) * base.s - base.sx2 AS BIGINT)
               AS all_pairs_xx,
           CAST(cr.cross_x AS DOUBLE)
               / CAST(CAST(base.s AS HUGEINT) * base.s - base.sx2
                      AS DOUBLE) AS general_g
    FROM base, cr"""


@register("general_g_cells", sql=_generalg_sql)
def general_g_cells(sf_dir: str):
    """Getis-Ord GENERAL G — the global high/low-value clustering
    statistic completing the spatial-association suite (Moran's I:
    covariance; Geary's C: differences; General G: raw co-location of
    HIGH values): G = Σ_adjacent x_i·x_j / Σ_all-pairs x_i·x_j, both
    pure int64 over the sparse table (the all-pairs term is S² − Σx² —
    no pair enumeration), division pinned as one float expression.
    Reuses morans_i's scatter/join machinery wholesale."""
    import pandas as pd

    from ..stages.join import hash_join
    from ..stages.shuffle import partial_group_counts

    n, N, W = _morans_consts()
    key = f"cell{RES}"
    cnt = partial_group_counts(_docs_points(sf_dir), [key]).materialize()

    def part(t: pa.Table) -> pa.Table:
        x = t["n"].to_numpy(zero_copy_only=False)
        return pa.table({"s": pa.array([int(x.sum())], pa.int64()),
                         "sx2": pa.array([int((x * x).sum())],
                                         pa.int64())})

    b = cnt.map_batches(part, batch_format="pyarrow").aggregate(
        Sum("s", alias_name="s"), Sum("sx2", alias_name="sx2"))
    s, sx2 = int(b["s"]), int(b["sx2"])

    nbr = _rook_neighbor_sums(cnt, key, n)
    joined = hash_join(
        nbr.map_batches(lambda t: t.rename_columns([key, "sx"]),
                        batch_format="pyarrow"),
        cnt, on=[key])

    def cross_part(t: pa.Table) -> pa.Table:
        v = (t["sx"].to_numpy(zero_copy_only=False)
             * t["n"].to_numpy(zero_copy_only=False))
        return pa.table({"cx": pa.array([int(v.sum())], pa.int64())})

    cross_x = int(joined.map_batches(cross_part, batch_format="pyarrow")
                  .aggregate(Sum("cx", alias_name="cx"))["cx"])
    allp = s * s - sx2
    return pd.DataFrame({
        "n_cells": np.array([N], np.int64),
        "w_pairs": np.array([W], np.int64),
        "n_points": np.array([s], np.int64),
        "cross_x": np.array([cross_x], np.int64),
        "all_pairs_xx": np.array([allp], np.int64),
        "general_g": np.array([np.float64(cross_x) / np.float64(allp)],
                              np.float64)})
