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
