"""GeoJSON feature output — the serving-path response shape.

The reference serves OGC API Features responses built from
``gdf.__geo_interface__['features']`` (``process_features.py:35``) and
returns an empty FeatureCollection for empty input (``process_features.py:
9-20``). The engine renders its enriched Arrow rows the same way: each row
becomes a Feature with a Point geometry from (x, y) and every other column
as a property; timestamps are RFC3339 strings, nulls stay null."""
from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa

GEOM_COLS = ("x", "y")


def _json_value(v):
    if v is None:
        return None
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, (_dt.datetime, np.datetime64)):
        if isinstance(v, np.datetime64):
            v = v.astype("datetime64[us]").item()
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def to_feature_collection(table: pa.Table, *, id_col: str | None = None,
                          number_matched: int | None = None) -> dict:
    """Arrow table (needs x, y columns) → GeoJSON FeatureCollection dict.
    Empty input → an empty FeatureCollection (process_features.py:9-20)."""
    features = []
    if table.num_rows:
        cols = {name: table[name].to_pylist() for name in table.column_names}
        prop_names = [n for n in table.column_names if n not in GEOM_COLS]
        for i in range(table.num_rows):
            feat = {
                "type": "Feature",
                "geometry": {"type": "Point",
                             "coordinates": [float(cols["x"][i]),
                                             float(cols["y"][i])]},
                "properties": {n: _json_value(cols[n][i])
                               for n in prop_names},
            }
            if id_col and id_col in cols:
                feat["id"] = cols[id_col][i]
            features.append(feat)
    out = {"type": "FeatureCollection", "features": features,
           "numberReturned": len(features)}
    if number_matched is not None:
        out["numberMatched"] = number_matched
    return out
