"""Query-layer tests: TM35 projection golden values, filter translation
(mirroring test_convert_api_filters.py semantics), bbox predicate, paging."""
from __future__ import annotations

import numpy as np
import pytest

from laji_pygeoapi_ray.functions import tm35
from laji_pygeoapi_ray.pipelines import query
from tests.conftest import SF_UNIT


def test_tm35_golden_points():
    # central meridian: E exactly 500000; N = meridian arc(60°)·k0
    E, N = tm35.wgs84_to_tm35(27.0, 60.0)
    assert abs(E - 500000.0) < 1e-6
    assert abs(N - 6651411.190) < 2e-3
    # pyproj EPSG:3067 reference point (60°N 24°E)
    E, N = tm35.wgs84_to_tm35(24.0, 60.0)
    assert abs(E - 332705.179) < 2e-3
    assert abs(N - 6655205.484) < 2e-3


def test_tm35_roundtrip():
    lon = np.linspace(19.5, 31.5, 40)
    lat = np.linspace(59.5, 70.0, 40)
    E, N = tm35.wgs84_to_tm35(lon, lat)
    lon2, lat2 = tm35.tm35_to_wgs84(E, N)
    assert np.allclose(lon, lon2, atol=1e-9)
    assert np.allclose(lat, lat2, atol=1e-9)


def test_translate_filter_name():
    assert query.translate_filter_name("Kunta") == "finnishMunicipalityId"
    assert query.translate_filter_name("Aineiston_tunniste") == "collectionId"
    with pytest.raises(query.FilterError, match="Did you mean"):
        query.translate_filter_name("Kunta2")
    # far-from-anything unknown passes through (reference warns + passes)
    assert query.translate_filter_name("zzz_unknown") == "zzz_unknown"


def test_value_and_province_maps():
    vr = {"MX.1": "Elävä", "MX.2": "Kuollut"}
    assert query.map_value_ranges(vr, "elävä, Kuollut") == "MX.1,MX.2"
    assert query.map_value_ranges(vr, "muu") == "muu"
    assert query.map_biogeographical_provinces("Ahvenanmaa") == "ML.251"
    assert query.map_biogeographical_provinces(
        "uusimaa (U)") == "ML.253"
    assert query.map_biogeographical_provinces("Atlantis") == "Atlantis"
    assert query.remove_id_prefix("http://tun.fi/HR.1") == "HR.1"


def test_convert_time_golden():
    assert query.convert_time("2020.01.01 [9:41]") == "2020.01.01"
    assert query.convert_time("2020, 2021") == "2020,2021"
    assert query.convert_time("-7 / 0 ") == "-7/0"
    assert query.convert_time("2020/2021") == "2020/2021"
    assert query.convert_time(123) == 123
    assert query.convert_time(
        "2020-01-01 [9:41] / 2025-12-31 [9:43]") == "2020-01-01/2025-12-31"


def test_paging_guards():
    assert query.validate_paging(100, 0) == 1
    assert query.validate_paging(100, 250) == 3
    for limit, offset in [(0, 0), (10001, 0), (100, -1)]:
        with pytest.raises(query.FilterError):
            query.validate_paging(limit, offset)
    with pytest.raises(query.FilterError, match="exceeds"):
        query.validate_paging(100, 100, total=200_000)
    assert query.validate_paging(100, 0, total=200_000) == 1  # page 1 ok


def test_bbox_process_and_predicate():
    # pygeoapi order [ymin, xmin, ymax, xmax]; WGS84 passthrough (unswapped)
    x0, y0, x1, y1 = query.process_bbox([60.1014, 24.7741, 60.2333, 25.2246])
    assert (x0, y0, x1, y1) == (24.7741, 60.1014, 25.2246, 60.2333)
    # TM35FIN input inverse-projects back to the same lon/lat bbox
    E0, N0 = tm35.wgs84_to_tm35(24.7741, 60.1014)
    E1, N1 = tm35.wgs84_to_tm35(25.2246, 60.2333)
    bx = query.process_bbox([N0, E0, N1, E1])
    assert np.allclose(bx, (24.7741, 60.1014, 25.2246, 60.2333), atol=1e-8)
    cover, _ = query.bbox_predicate([60.1014, 24.7741, 60.2333, 25.2246])
    assert len(cover) > 0


def test_bbox_query_matches_bruteforce():
    from laji_pygeoapi_ray.pipelines.geoqueries import _docs_points
    from laji_pygeoapi_ray.functions import points as P

    ds = _docs_points(SF_UNIT)
    bbox = [60.0, 24.6, 60.4, 25.3]        # [ymin, xmin, ymax, xmax]
    out = query.bbox_query(ds, bbox, limit=10_000)
    keys = np.arange(500, dtype=np.int64)
    x, y = P.derive_xy(keys)
    exp = ((x >= 24.6) & (x <= 25.3) & (y >= 60.0) & (y <= 60.4)).sum()
    assert out.num_rows == exp and exp > 0


def test_convert_filters_dispatch():
    vr = {"MX.37": "punainen"}
    ev = {"sex": {"MALE": "koiras"}}
    mids = {"Helsinki": "ML.660"}
    out = query.convert_filters(
        [("Aineiston_tunniste", "http://tun.fi/HR.95"),
         ("Sukupuoli", "koiras"),
         ("Uhanalaisuusluokka", "punainen"),
         ("Eliomaakunta", "Ahvenanmaa"),
         ("Kunta", "Helsinki"),
         ("Aika", "2020.01.01 [9:41]"),
         ("Valtion_maalla", "true")],
        value_ranges=vr, enum_values=ev, municipality_ids=mids)
    assert out == {
        "collectionId": "HR.95",
        "sex": "MALE",
        "redListStatusId": "MX.37",
        "biogeographicalProvinceId": "ML.251",
        "finnishMunicipalityId": "ML.660",
        "time": "2020.01.01",
        "onlyNonStateLands": "False",
    }


def test_filtered_docs_bbox_oracle():
    from tests.conftest import assert_query_matches_oracle
    assert_query_matches_oracle("filtered_docs_bbox", SF_UNIT)


# ------------------------------------------------- serving-path filter exec

class TestServingFilters:
    def test_time_ranges_grammar(self):
        import numpy as np
        from laji_pygeoapi_ray.pipelines.serving import time_ranges
        # year expands to the full year
        (lo, hi), = time_ranges("2020")
        assert lo == np.datetime64("2020-01-01", "us")
        assert hi == np.datetime64("2021-01-01", "us")
        # month period + range endpoints expand per-period
        (lo, hi), = time_ranges("2020-05/2020-06")
        assert lo == np.datetime64("2020-05-01", "us")
        assert hi == np.datetime64("2020-07-01", "us")
        # comma OR list
        rs = time_ranges("2020,2022")
        assert len(rs) == 2
        # open-ended range
        (lo, hi), = time_ranges("2020-01-15/..")
        assert hi is None and lo == np.datetime64("2020-01-15", "us")

    def test_time_relative_days_need_now(self):
        import numpy as np
        import pytest
        from laji_pygeoapi_ray.pipelines.query import FilterError
        from laji_pygeoapi_ray.pipelines.serving import time_ranges
        with pytest.raises(FilterError):
            time_ranges("-7/0")
        now = np.datetime64("2024-06-15T12:00:00", "us")
        (lo, hi), = time_ranges("-7/0", now=now)
        assert lo == np.datetime64("2024-06-08", "us")
        assert hi == np.datetime64("2024-06-16", "us")

    def test_unbound_filter_is_loud(self):
        import pytest
        from laji_pygeoapi_ray.pipelines.query import FilterError
        from laji_pygeoapi_ray.pipelines.serving import (Binding,
                                                         compile_predicate)
        with pytest.raises(FilterError, match="no executable binding"):
            compile_predicate({"mystery": "1"}, {})

    def test_predicate_nulls_drop(self):
        import pyarrow as pa
        from laji_pygeoapi_ray.pipelines.serving import (Binding,
                                                         compile_predicate)
        t = pa.table({"src": ["a", None, "b", "a"]})
        pred = compile_predicate({"source": "a"},
                                 {"source": Binding("src")})
        import pyarrow.compute as pc
        kept = t.filter(pc.fill_null(pred(t), False))
        assert kept["src"].to_pylist() == ["a", "a"]

    def test_municipality_comma_split(self):
        from laji_pygeoapi_ray.pipelines.query import map_municipality
        ids = {"Helsinki": "91", "Espoo": "49"}
        assert map_municipality(ids, "Helsinki, Espoo, Oulu") == "91,49,Oulu"

    def test_value_ranges_internal_space(self):
        from laji_pygeoapi_ray.pipelines.query import map_value_ranges
        vr = {"MX.1": "Least Concern"}
        # ALL spaces stripped on both sides before the casefold compare
        assert map_value_ranges(vr, "least  concern") == "MX.1"
        assert map_value_ranges(vr, "LeastConcern") == "MX.1"
        assert map_value_ranges(vr, " least concern ") == "MX.1"
        assert map_value_ranges(vr, "unknown label") == "unknown label"


class TestGetById:
    def test_round_trip(self, tmp_path):
        from tests.conftest import SF_UNIT
        from laji_pygeoapi_ray.pipelines.filter_queries import \
            fetch_by_local_id
        t = fetch_by_local_id(SF_UNIT, "http://tun.fi/JX.42_0").take_all()
        assert len(t) == 1
        assert t[0]["doc_id"] == 42
        assert t[0]["local_id"] == "http://tun.fi/JX.42_0"

    def test_wrong_hash_suffix_no_match(self):
        from tests.conftest import SF_UNIT
        from laji_pygeoapi_ray.pipelines.filter_queries import \
            fetch_by_local_id
        # 42 % 7 == 0, so suffix _3 decodes to a unit id that exists for no
        # record — the post-filter guard must reject it
        t = fetch_by_local_id(SF_UNIT, "http://tun.fi/JX.42_3").take_all()
        assert t == []

    def test_malformed_id_raises(self):
        import pytest
        from tests.conftest import SF_UNIT
        from laji_pygeoapi_ray.pipelines.filter_queries import \
            fetch_by_local_id
        with pytest.raises(ValueError, match="malformed"):
            fetch_by_local_id(SF_UNIT, "not-an-id")


def test_provider_error_contract():
    """FilterError renders the reference's error payload shape
    (lajiapi_provider.py:193-201)."""
    import pytest

    from laji_pygeoapi_ray.pipelines import query
    with pytest.raises(query.FilterError) as ei:
        query.validate_paging(20001, 0)
    p = ei.value.payload()
    assert p["type"] == "urn:pygeoapi:lajiapi:invalid-parameter"
    assert p["title"] == "Invalid Parameter"
    assert "hint" in p
    with pytest.raises(query.FilterError) as ei:
        query.validate_paging(100, 200, total=500_000)
    assert ei.value.payload()["type"] == "urn:pygeoapi:lajiapi:too-many-results"


def test_request_log_round_trip(tmp_path):
    """RequestLog analogue: append, tail-N oldest-first, table render."""
    from laji_pygeoapi_ray.state.request_log import (format_log, log_request,
                                                     read_log)
    log = str(tmp_path / "req.jsonl")
    for i in range(5):
        log_request(log, path=f"/collections/x/items?page={i}",
                    query_string=f"limit=10&offset={i*10}",
                    date=f"2026-01-0{i+1}T00:00:00")
    rows = read_log(log, limit=3)
    assert len(rows) == 3
    assert rows[0]["date"] == "2026-01-03T00:00:00"   # oldest of last 3
    out = format_log(rows)
    assert "Status" in out and "page=4" in out


def test_api_key_verification_semantics():
    """verify_password parity: found + type + expiry gates, memoized
    lookup, empty/unknown keys rejected."""
    import datetime as dt

    from laji_pygeoapi_ray.state import auth

    now = dt.datetime(2026, 6, 1)
    auth.configure_key_store({
        "good": {"id": "k1", "found": True, "downloadType": "API_KEY",
                 "apiKeyExpires": "2027-01-01", "personId": "MA.1"},
        "expired": {"id": "k2", "found": True, "downloadType": "API_KEY",
                    "apiKeyExpires": "2025-01-01"},
        "wrong-type": {"id": "k3", "found": True,
                       "downloadType": "OTHER",
                       "apiKeyExpires": "2027-01-01"},
        "not-found": {"id": "k4", "found": False,
                      "downloadType": "API_KEY",
                      "apiKeyExpires": "2027-01-01"},
    })
    assert auth.verify_api_key("good", now=now) == "k1"
    assert auth.verify_api_key(" good ", now=now) == "k1"   # stripped
    assert auth.verify_api_key("expired", now=now) is None
    assert auth.verify_api_key("wrong-type", now=now) is None
    assert auth.verify_api_key("not-found", now=now) is None
    assert auth.verify_api_key("", now=now) is None
    assert auth.verify_api_key("unknown", now=now) is None
    # memoization: second lookup hits the cache
    auth.verify_api_key("good", now=now)
    assert auth._get_api_key_info.cache_info().hits >= 1
