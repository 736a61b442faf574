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


def write_geojson(ds, out_dir: str, *, id_col: str | None = None) -> int:
    """Partitioned GeoJSON sink: every batch becomes one FeatureCollection
    file written FROM THE WORKER (the feature payload never streams
    through the driver — only one manifest row per file does). File names
    are content-addressed (batch row-id range) so re-execution is
    idempotent. Returns the feature count."""
    import json
    import os
    import uuid

    import pyarrow as pa

    os.makedirs(out_dir, exist_ok=True)

    def write_batch(batch: "pa.Table") -> "pa.Table":
        fc = to_feature_collection(batch, id_col=id_col)
        payload = json.dumps(fc, sort_keys=True)
        name = f"part-{uuid.uuid5(uuid.NAMESPACE_URL, payload).hex}.geojson"
        tmp = os.path.join(out_dir, name + ".tmp")
        with open(tmp, "w") as f:
            json.dump(fc, f, ensure_ascii=False)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table({"file": pa.array([name]),
                         "n": pa.array([fc["numberReturned"]],
                                       pa.int64())})

    manifest = ds.map_batches(write_batch, batch_size=4096,
                              batch_format="pyarrow")
    return sum(b["n"].to_numpy(zero_copy_only=False).sum()
               for b in manifest.iter_batches(batch_size=None,
                                              batch_format="pyarrow"))


def read_geojson(path_or_dir: str) -> "pa.Table":
    """GeoJSON FeatureCollection file(s) → one Arrow table: Point
    coordinates back to (x, y) columns, properties to columns (the
    inverse of :func:`to_feature_collection`; nulls survive)."""
    import glob
    import json
    import os

    files = ([path_or_dir] if os.path.isfile(path_or_dir)
             else sorted(glob.glob(os.path.join(path_or_dir,
                                                "*.geojson"))))
    rows = []
    for fp in files:
        with open(fp) as f:
            fc = json.load(f)
        for feat in fc.get("features", []):
            row = dict(feat.get("properties") or {})
            geom = feat.get("geometry") or {}
            if geom.get("type") == "Point":
                row["x"], row["y"] = geom["coordinates"]
            if "id" in feat:
                row["__feature_id"] = feat["id"]
            rows.append(row)
    return pa.Table.from_pylist(rows)
