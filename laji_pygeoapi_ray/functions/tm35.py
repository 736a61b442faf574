"""ETRS-TM35FIN (EPSG:3067) ↔ WGS84 — vectorized transverse-Mercator.

The reference reprojects query bboxes 4326→3067 with pyproj
(``convert_api_filters.py:148-159``) and serves EUREF center-point columns
(``ETRS_TM35FIN_N/E``, lookup CSV rows 38-39). This container has no pyproj,
so the engine carries its own Karney–Krüger series implementation (6th
order in the third flattening — sub-millimetre over Finland) on GRS80:
central meridian 27°E, k₀ = 0.9996, false easting 500 000 m.

Golden-tested against the reference's own expected values
(``tests/test_convert_api_filters.py:77-89``):
WGS84 [24.7741, 60.1014, 25.2246, 60.2333] ↔
TM35FIN [376244.4479, 6664797.5738, 401678.9648, 6678720.0844].
"""
from __future__ import annotations

import numpy as np

_A_GRS80 = 6378137.0
_F = 1.0 / 298.257222101
_K0 = 0.9996
_LON0 = np.deg2rad(27.0)
_E0 = 500_000.0

_n = _F / (2.0 - _F)
_n2, _n3, _n4, _n5, _n6 = _n**2, _n**3, _n**4, _n**5, _n**6
_A = _A_GRS80 / (1 + _n) * (1 + _n2 / 4 + _n4 / 64 + _n6 / 256)

_ALPHA = np.array([
    _n / 2 - 2 * _n2 / 3 + 5 * _n3 / 16 + 41 * _n4 / 180 - 127 * _n5 / 288
    + 7891 * _n6 / 37800,
    13 * _n2 / 48 - 3 * _n3 / 5 + 557 * _n4 / 1440 + 281 * _n5 / 630
    - 1983433 * _n6 / 1935360,
    61 * _n3 / 240 - 103 * _n4 / 140 + 15061 * _n5 / 26880
    + 167603 * _n6 / 181440,
    49561 * _n4 / 161280 - 179 * _n5 / 168 + 6601661 * _n6 / 7257600,
    34729 * _n5 / 80640 - 3418889 * _n6 / 1995840,
    212378941 * _n6 / 319334400,
])

_BETA = np.array([
    _n / 2 - 2 * _n2 / 3 + 37 * _n3 / 96 - _n4 / 360 - 81 * _n5 / 512
    + 96199 * _n6 / 604800,
    _n2 / 48 + _n3 / 15 - 437 * _n4 / 1440 + 46 * _n5 / 105
    - 1118711 * _n6 / 3870720,
    17 * _n3 / 480 - 37 * _n4 / 840 - 209 * _n5 / 4480 + 5569 * _n6 / 90720,
    4397 * _n4 / 161280 - 11 * _n5 / 504 - 830251 * _n6 / 7257600,
    4583 * _n5 / 161280 - 108847 * _n6 / 3991680,
    20648693 * _n6 / 638668800,
])

_DELTA = np.array([
    2 * _n - 2 * _n2 / 3 - 2 * _n3 + 116 * _n4 / 45 + 26 * _n5 / 45
    - 2854 * _n6 / 675,
    7 * _n2 / 3 - 8 * _n3 / 5 - 227 * _n4 / 45 + 2704 * _n5 / 315
    + 2323 * _n6 / 945,
    56 * _n3 / 15 - 136 * _n4 / 35 - 1262 * _n5 / 105 + 73814 * _n6 / 2835,
    4279 * _n4 / 630 - 332 * _n5 / 35 - 399572 * _n6 / 14175,
    4174 * _n5 / 315 - 144838 * _n6 / 6237,
    601676 * _n6 / 22275,
])

_ES = 2 * np.sqrt(_n) / (1 + _n)   # = e (first eccentricity) relation term


def wgs84_to_tm35(lon_deg, lat_deg):
    """(lon°, lat°) → (E, N) metres in EPSG:3067. Vectorized."""
    lon = np.deg2rad(np.asarray(lon_deg, dtype=np.float64))
    lat = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    s = np.sin(lat)
    t = np.sinh(np.arctanh(s) - _ES * np.arctanh(_ES * s))
    dlon = lon - _LON0
    xi = np.arctan2(t, np.cos(dlon))
    eta = np.arctanh(np.sin(dlon) / np.sqrt(1 + t * t))
    xs, es = xi.copy(), eta.copy()
    for j in range(6):
        k = 2.0 * (j + 1)
        xs = xs + _ALPHA[j] * np.sin(k * xi) * np.cosh(k * eta)
        es = es + _ALPHA[j] * np.cos(k * xi) * np.sinh(k * eta)
    return _E0 + _K0 * _A * es, _K0 * _A * xs


def tm35_to_wgs84(e, n):
    """(E, N) EPSG:3067 → (lon°, lat°). Vectorized inverse."""
    e = np.asarray(e, dtype=np.float64)
    n = np.asarray(n, dtype=np.float64)
    xi = n / (_K0 * _A)
    eta = (e - _E0) / (_K0 * _A)
    xs, es = xi.copy(), eta.copy()
    for j in range(6):
        k = 2.0 * (j + 1)
        xs = xs - _BETA[j] * np.sin(k * xi) * np.cosh(k * eta)
        es = es - _BETA[j] * np.cos(k * xi) * np.sinh(k * eta)
    chi = np.arcsin(np.sin(xs) / np.cosh(es))
    lat = chi.copy()
    for j in range(6):
        k = 2.0 * (j + 1)
        lat = lat + _DELTA[j] * np.sin(k * chi)
    lon = _LON0 + np.arctan2(np.sinh(es), np.cos(xs))
    return np.rad2deg(lon), np.rad2deg(lat)


def looks_like_wgs84(x0, y0, x1, y1) -> bool:
    """The reference's plausibility check before reprojecting a bbox
    (convert_api_filters.py:153-155): values within lon/lat ranges."""
    return (-180 <= x0 <= 180 and -180 <= x1 <= 180
            and -90 <= y0 <= 90 and -90 <= y1 <= 90)


def bbox_wgs84_to_tm35_wkt(x0, y0, x1, y1) -> str:
    """bbox corners 4326→3067 → WKT POLYGON (the reference's query-path
    bbox translation, convert_api_filters.py:148-159)."""
    ex0, ny0 = wgs84_to_tm35(x0, y0)
    ex1, ny1 = wgs84_to_tm35(x1, y1)
    return (f"POLYGON (({ex0} {ny0}, {ex1} {ny0}, {ex1} {ny1}, "
            f"{ex0} {ny1}, {ex0} {ny0}))")
