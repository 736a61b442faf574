"""Mixed-geometry pipeline stages: deterministic feature synthesis, the
normalize+validate map_batches stage, and the reference's 3-way
geometry-type split.

The reference ingests Point/LineString/Polygon/GeometryCollection features
and splits its sink three ways by geometry base type — one PostGIS table
per (region, geom_type), 66 tables total (``edit_db.py:262-296``,
``main.py:193-198``); GeometryCollections are normalized first
(``process_data.py:132-181``). Here the same flow is:

    build WKB → normalize (GC→MultiX) + validate/repair → PIP province
    → geom_group (Multi* collapses to its base) → ``write_parquet(...,
    partition_cols=["province", "geom_group"])``

The synthetic feature mix is keyed by ``doc_id % 10`` so a SQL oracle can
reproduce the expected post-normalization class per record without
decoding WKB:

    0-5 → Point;  6 → LineString;  7 → Polygon (valid square);
    8 → GeometryCollection(Point, LineString)  — mixed → MultiPolygon;
    9 → GeometryCollection(Point)              — single → unwrap → Point.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import geom as G

GEOM_GROUP_OF_MOD = {0: "Point", 1: "Point", 2: "Point", 3: "Point",
                     4: "Point", 5: "Point", 6: "LineString", 7: "Polygon",
                     8: "Polygon", 9: "Point"}


def synth_geometry(key: int, x: float, y: float) -> G.Geometry:
    """Deterministic feature geometry for one record (rule above)."""
    m = key % 10
    if m <= 5:
        return G.Geometry("Point", np.array([x, y]))
    if m == 6:
        return G.Geometry("LineString", np.array(
            [[x, y], [x + 0.01, y + 0.005], [x + 0.02, y]]))
    if m == 7:
        s = 0.01
        ring = np.array([[x - s, y - s], [x + s, y - s], [x + s, y + s],
                         [x - s, y + s], [x - s, y - s]])
        return G.Geometry("Polygon", [ring])
    pt = G.Geometry("Point", np.array([x, y]))
    if m == 8:
        ls = G.Geometry("LineString", np.array([[x, y], [x + 0.01, y]]))
        return G.Geometry("GeometryCollection", [pt, ls])
    return G.Geometry("GeometryCollection", [pt])


def build_geometry(key_col: str = "doc_id"):
    """map_batches stage: derived (x, y) + key → raw WKB ``geometry``."""
    def fn(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False)
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        wkb = [G.wkb_encode(synth_geometry(int(ki), xi, yi))
               for ki, xi, yi in zip(k, x, y)]
        return t.append_column("geometry", pa.array(wkb, pa.binary()))
    return fn


def normalize_validate(t: pa.Table) -> pa.Table:
    """The ``convert_geometry_collection_to_multipolygon`` +
    ``validate_geometry`` stage: normalize GCs, repair invalid geometries,
    and emit the post-normalization ``geom_group`` (base type, Multi*
    collapsed — the reference's 3-way table split key) plus per-batch
    conversion/repair counters as columns the sink can aggregate."""
    wkbs = t["geometry"].to_pylist()
    out, groups = [], []
    converted = repaired = 0
    for b in wkbs:
        if b is None:
            out.append(None)
            groups.append(None)
            continue
        # fast path: Point (code 1) / LineString (2) / MultiPoint (4) /
        # MultiLineString (5) are normalization no-ops and always valid —
        # skip the decode/re-encode entirely (the hot 80 % of rows)
        code = b[1]
        if code in (1, 2, 4, 5):
            out.append(b)
            groups.append(G.WKB_TYPES[code][5:]
                          if code in (4, 5) else G.WKB_TYPES[code])
            continue
        g, _ = G.wkb_decode(b)
        g2, conv = G.normalize_geometry(g)
        converted += conv
        if g2 is not None and not G.is_valid(g2):
            g2 = G.make_valid(g2)
            repaired += 1
        out.append(G.wkb_encode(g2))
        groups.append(g2.base_type if g2 is not None else None)
    t = t.drop_columns(["geometry"])
    t = t.append_column("geometry", pa.array(out, pa.binary()))
    t = t.append_column("geom_group", pa.array(groups, pa.string()))
    n = len(t)
    t = t.append_column("n_converted", pa.array(
        np.full(n, converted, dtype=np.int64) if n else
        np.array([], dtype=np.int64)))
    return t.append_column("n_repaired", pa.array(
        np.full(n, repaired, dtype=np.int64) if n else
        np.array([], dtype=np.int64)))


def sql_geom_group(key: str) -> str:
    """DuckDB CASE reproducing the post-normalization class per record —
    the oracle twin of synth → normalize → geom_group."""
    return (f"(CASE WHEN ({key}) % 10 = 6 THEN 'LineString' "
            f"WHEN ({key}) % 10 IN (7, 8) THEN 'Polygon' "
            f"ELSE 'Point' END)")
