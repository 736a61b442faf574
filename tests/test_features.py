"""GeoJSON FeatureCollection rendering (serving-path response shape)."""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from laji_pygeoapi_ray.pipelines.features import to_feature_collection


def test_feature_collection_shape():
    t = pa.table({
        "x": [24.9, 25.1], "y": [60.2, 60.3],
        "province": ["Uusimaa", None],
        "n": pa.array([3, None], pa.int64()),
        "ts": pa.array([np.datetime64("2024-05-01T10:00:00", "us"), None]),
        "local_id": ["a_1", "b_2"],
    })
    fc = to_feature_collection(t, id_col="local_id")
    assert fc["type"] == "FeatureCollection" and fc["numberReturned"] == 2
    f0 = fc["features"][0]
    assert f0["geometry"] == {"type": "Point", "coordinates": [24.9, 60.2]}
    assert f0["properties"]["province"] == "Uusimaa"
    assert f0["properties"]["n"] == 3
    assert f0["properties"]["ts"] == "2024-05-01T10:00:00"
    assert f0["id"] == "a_1"
    f1 = fc["features"][1]
    assert f1["properties"]["province"] is None and f1["properties"]["n"] is None
    import json
    json.dumps(fc)   # fully JSON-serializable


def test_empty_feature_collection():
    fc = to_feature_collection(pa.table({"x": pa.array([], pa.float64()),
                                         "y": pa.array([], pa.float64())}))
    assert fc == {"type": "FeatureCollection", "features": [],
                  "numberReturned": 0}


def test_geojson_sink_round_trip(tmp_path):
    """Enriched points → partitioned GeoJSON FeatureCollections → read
    back: ids, coordinates and properties survive exactly."""
    import numpy as np
    import ray.data

    from laji_pygeoapi_ray.pipelines.features import (read_geojson,
                                                      write_geojson)
    from laji_pygeoapi_ray.pipelines.geoqueries import _docs_points
    from tests.conftest import SF_UNIT

    ds = _docs_points(SF_UNIT).select_columns(["doc_id", "x", "y"])
    out = str(tmp_path / "geojson")
    n = write_geojson(ds, out, id_col="doc_id")
    assert n == 500
    back = read_geojson(out)
    assert back.num_rows == 500
    got = {r["doc_id"]: (r["x"], r["y"], r["__feature_id"])
           for r in back.to_pylist()}
    src = {r["doc_id"]: (r["x"], r["y"])
           for r in ds.take_all()}
    for k, (x, y) in src.items():
        bx, by, fid = got[k]
        assert fid == k
        assert np.isclose(bx, x) and np.isclose(by, y)
