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
