"""Deterministic geospatial fixture layers (the PIP / kNN / tiling right side).

The reference assigns each occurrence to a biogeographical province
(21 regions, ``/root/reference/pygeoapi/scripts/compute_variables.py:10-32``)
and a municipality (``gathering.interpretations.municipalityDisplayname``,
interpreted upstream by the warehouse), then maps municipality → ELY area /
Elinvoimakeskus via a 308-row lookup
(``scripts/resources/municipality_ely_mappings.json``,
``compute_variables.py:79-98``).

The new engine computes those containment labels itself: this module builds
deterministic *non-convex polygon partitions* of the Finland bbox —
21 provinces (7 bands × 3 zigzag columns) and 42 municipalities (each
province split once more) — that play the role of the real admin layers.
Polygons partition the bbox exactly (shared zigzag boundaries reuse identical
vertex arrays), so every derived point gets exactly one label per layer.

``edges_values_sql`` renders a layer's edge list as a DuckDB VALUES relation
so the oracle can run the same even-odd ray-casting PIP in pure SQL.

Names are real Finnish admin names (public data, mirrored from the
reference's resources) so the municipality → ELY / Elinvoimakeskus mapping
chain is exercised end-to-end, diacritics included.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..functions.points import FIN_X0, FIN_X1, FIN_Y0, FIN_Y1

# Province id → name, verbatim from the reference
# (/root/reference/pygeoapi/scripts/compute_variables.py:10-32).
PROVINCE_ID_MAPPING = {
    "ML.251": "Ahvenanmaa",
    "ML.252": "Varsinais-Suomi",
    "ML.253": "Uusimaa",
    "ML.254": "Etelä-Karjala",
    "ML.255": "Satakunta",
    "ML.256": "Etelä-Häme",
    "ML.257": "Etelä-Savo",
    "ML.258": "Laatokan Karjala",
    "ML.259": "Etelä-Pohjanmaa",
    "ML.260": "Pohjois-Häme",
    "ML.261": "Pohjois-Savo",
    "ML.262": "Pohjois-Karjala",
    "ML.263": "Keski-Pohjanmaa",
    "ML.264": "Kainuu",
    "ML.265": "Oulun Pohjanmaa",
    "ML.266": "Perä-Pohjanmaa",
    "ML.267": "Koillismaa",
    "ML.268": "Kittilän Lappi",
    "ML.269": "Sompion Lappi",
    "ML.270": "Enontekiön Lappi",
    "ML.271": "Inarin Lappi",
}

# 42 (municipality, ELY area, Elinvoimakeskus) rows — a deterministic subset of
# the reference's 308-row municipality_ely_mappings.json (public admin data).
MUNICIPALITY_ELY = [
    ("Akaa", "Pirkanmaan ELY-keskus", "Sisä-Suomen elinvoimakeskus"),
    ("Alajärvi", "Etelä-Pohjanmaan ELY-keskus", "Etelä-Pohjanmaan elinvoimakeskus"),
    ("Alavieska", "Pohjois-Pohjanmaan ELY-keskus", "Pohjois-Suomen elinvoimakeskus"),
    ("Alavus", "Etelä-Pohjanmaan ELY-keskus", "Etelä-Pohjanmaan elinvoimakeskus"),
    ("Asikkala", "Hämeen ELY-keskus", "Kaakkois-Suomen elinvoimakeskus"),
    ("Askola", "Uudenmaan ELY-keskus", "Uudenmaan elinvoimakeskus"),
    ("Aura", "Varsinais-Suomen ELY-keskus", "Lounais-Suomen elinvoimakeskus"),
    ("Brändö", "Ahvenanmaa", "Lounais-Suomen elinvoimakeskus"),
    ("Eckerö", "Ahvenanmaa", "Lounais-Suomen elinvoimakeskus"),
    ("Enonkoski", "Etelä-Savon ELY-keskus", "Itä-Suomen elinvoimakeskus"),
    ("Enontekiö", "Lapin ELY-keskus", "Lapin elinvoimakeskus"),
    ("Espoo", "Uudenmaan ELY-keskus", "Uudenmaan elinvoimakeskus"),
    ("Eura", "Satakunnan ELY-keskus", "Lounais-Suomen elinvoimakeskus"),
    ("Eurajoki", "Satakunnan ELY-keskus", "Lounais-Suomen elinvoimakeskus"),
    ("Evijärvi", "Etelä-Pohjanmaan ELY-keskus", "Etelä-Pohjanmaan elinvoimakeskus"),
    ("Finström", "Ahvenanmaa", "Lounais-Suomen elinvoimakeskus"),
    ("Forssa", "Hämeen ELY-keskus", "Sisä-Suomen elinvoimakeskus"),
    ("Föglö", "Ahvenanmaa", "Lounais-Suomen elinvoimakeskus"),
    ("Geta", "Ahvenanmaa", "Lounais-Suomen elinvoimakeskus"),
    ("Haapajärvi", "Pohjois-Pohjanmaan ELY-keskus", "Pohjois-Suomen elinvoimakeskus"),
    ("Haapavesi", "Pohjois-Pohjanmaan ELY-keskus", "Pohjois-Suomen elinvoimakeskus"),
    ("Hailuoto", "Pohjois-Pohjanmaan ELY-keskus", "Pohjois-Suomen elinvoimakeskus"),
    ("Halsua", "Pohjanmaan ELY-keskus", "Pohjanmaan elinvoimakeskus"),
    ("Hamina", "Kaakkois-Suomen ELY-keskus", "Lounais-Suomen elinvoimakeskus"),
    ("Hammarland", "Ahvenanmaa", "Lounais-Suomen elinvoimakeskus"),
    ("Hankasalmi", "Keski-Suomen ELY-keskus", "Keski-Suomen elinvoimakeskus"),
    ("Hanko", "Uudenmaan ELY-keskus", "Uudenmaan elinvoimakeskus"),
    ("Harjavalta", "Satakunnan ELY-keskus", "Lounais-Suomen elinvoimakeskus"),
    ("Hartola", "Hämeen ELY-keskus", "Kaakkois-Suomen elinvoimakeskus"),
    ("Hattula", "Hämeen ELY-keskus", "Sisä-Suomen elinvoimakeskus"),
    ("Hausjärvi", "Hämeen ELY-keskus", "Sisä-Suomen elinvoimakeskus"),
    ("Heinola", "Hämeen ELY-keskus", "Kaakkois-Suomen elinvoimakeskus"),
    ("Heinävesi", "Pohjois-Karjalan ELY-keskus", "Kaakkois-Suomen elinvoimakeskus"),
    ("Helsinki", "Uudenmaan ELY-keskus", "Uudenmaan elinvoimakeskus"),
    ("Hirvensalmi", "Etelä-Savon ELY-keskus", "Itä-Suomen elinvoimakeskus"),
    ("Hollola", "Hämeen ELY-keskus", "Kaakkois-Suomen elinvoimakeskus"),
    ("Huittinen", "Satakunnan ELY-keskus", "Lounais-Suomen elinvoimakeskus"),
    ("Humppila", "Hämeen ELY-keskus", "Sisä-Suomen elinvoimakeskus"),
    ("Hyrynsalmi", "Kainuun ELY-keskus", "Pohjois-Suomen elinvoimakeskus"),
    ("Hyvinkää", "Uudenmaan ELY-keskus", "Uudenmaan elinvoimakeskus"),
    ("Hämeenkyrö", "Pirkanmaan ELY-keskus", "Sisä-Suomen elinvoimakeskus"),
    ("Hämeenlinna", "Hämeen ELY-keskus", "Sisä-Suomen elinvoimakeskus"),
]

N_BANDS = 7          # horizontal province bands
N_COLS = 3           # zigzag columns per band → 21 provinces
ZIG_SEGMENTS = 4     # segments per zigzag boundary (5 vertices)
ZIG_AMP = 0.35       # zigzag amplitude for province boundaries (degrees lon)
ZIG_AMP_MUNI = 0.30  # amplitude for the municipality split boundary


@dataclass(frozen=True)
class Polygon:
    """A simple polygon ring (open; last vertex != first), float64 (N, 2)."""
    pid: int
    name: str
    ring: np.ndarray

    @property
    def bbox(self) -> tuple[float, float, float, float]:
        return (float(self.ring[:, 0].min()), float(self.ring[:, 1].min()),
                float(self.ring[:, 0].max()), float(self.ring[:, 1].max()))


def _band_ys() -> list[float]:
    return [FIN_Y0 + (FIN_Y1 - FIN_Y0) * j / N_BANDS for j in range(N_BANDS + 1)]


def _zig_offset(i: int, j: int, t: int, amp: float) -> float:
    """Deterministic pseudo-zigzag offset in [-amp, amp]; endpoints (t=0, t=max)
    are NOT pinned to zero — each band owns its boundary polyline, and band
    edges are straight lines, so the bbox still partitions exactly."""
    s = ((i * 31 + j * 7 + t * 13 + 5) % 9) / 4.0 - 1.0   # in [-1, 1]
    return amp * s


def _boundary(i_base_frac: float, j: int, zig_key: int, amp: float) -> np.ndarray:
    """Vertical zigzag polyline for band ``j``: (ZIG_SEGMENTS+1, 2) vertices
    ordered bottom → top. ``i_base_frac`` is the base x position as a fraction
    of the bbox width."""
    ys = _band_ys()
    y_lo, y_hi = ys[j], ys[j + 1]
    base = FIN_X0 + (FIN_X1 - FIN_X0) * i_base_frac
    pts = []
    for t in range(ZIG_SEGMENTS + 1):
        y = y_lo + (y_hi - y_lo) * t / ZIG_SEGMENTS
        x = base + _zig_offset(zig_key, j, t, amp)
        pts.append((x, y))
    return np.asarray(pts, dtype=np.float64)


def _straight(x: float, j: int) -> np.ndarray:
    ys = _band_ys()
    y_lo, y_hi = ys[j], ys[j + 1]
    return np.asarray([(x, y_lo + (y_hi - y_lo) * t / ZIG_SEGMENTS)
                       for t in range(ZIG_SEGMENTS + 1)], dtype=np.float64)


def _cell_polygon(left: np.ndarray, right: np.ndarray) -> np.ndarray:
    """Close a band cell between a left and a right boundary polyline
    (both bottom → top) into a CCW ring."""
    return np.concatenate([right, left[::-1]], axis=0)


def _band_boundaries(j: int) -> list[np.ndarray]:
    """The 4 column boundaries of band j: [west edge, zig1, zig2, east edge]."""
    return [
        _straight(FIN_X0, j),
        _boundary(1.0 / N_COLS, j, 1, ZIG_AMP),
        _boundary(2.0 / N_COLS, j, 2, ZIG_AMP),
        _straight(FIN_X1, j),
    ]


def province_layer() -> list[Polygon]:
    """21 province polygons partitioning the Finland bbox. Ordering follows
    ``PROVINCE_ID_MAPPING`` insertion order: province p = band p//3, col p%3."""
    names = list(PROVINCE_ID_MAPPING.values())
    polys = []
    for j in range(N_BANDS):
        bounds = _band_boundaries(j)
        for c in range(N_COLS):
            p = j * N_COLS + c
            polys.append(Polygon(p, names[p], _cell_polygon(bounds[c], bounds[c + 1])))
    return polys


def municipality_layer() -> list[Polygon]:
    """42 municipality polygons: each province split by one extra zigzag.
    Municipality m = 2*p + {0 west, 1 east} of province p."""
    names = [m for m, _, _ in MUNICIPALITY_ELY]
    polys = []
    for j in range(N_BANDS):
        bounds = _band_boundaries(j)
        for c in range(N_COLS):
            p = j * N_COLS + c
            mid = _boundary((c + 0.5) / N_COLS, j, 10 + c, ZIG_AMP_MUNI)
            polys.append(Polygon(2 * p, names[2 * p], _cell_polygon(bounds[c], mid)))
            polys.append(Polygon(2 * p + 1, names[2 * p + 1], _cell_polygon(mid, bounds[c + 1])))
    return polys


def ely_mapping() -> dict[str, str]:
    """Municipality name → ELY area (reference: compute_areas,
    compute_variables.py:79-98 over municipality_ely_mappings.json)."""
    return {m: ely for m, ely, _ in MUNICIPALITY_ELY}


def elinvoima_mapping() -> dict[str, str]:
    """Municipality name → Elinvoimakeskus area (same reference rows)."""
    return {m: ev for m, _, ev in MUNICIPALITY_ELY}


def province_name_to_id() -> dict[str, str]:
    """Reverse of PROVINCE_ID_MAPPING (filter translation,
    convert_api_filters.py:87-101)."""
    return {v: k for k, v in PROVINCE_ID_MAPPING.items()}


def edges_table(layer: list[Polygon]) -> np.ndarray:
    """All edges of a layer as a float64 array (E, 5): pid, x1, y1, x2, y2."""
    rows = []
    for poly in layer:
        r = poly.ring
        nxt = np.roll(r, -1, axis=0)
        for (x1, y1), (x2, y2) in zip(r, nxt):
            rows.append((float(poly.pid), x1, y1, x2, y2))
    return np.asarray(rows, dtype=np.float64)


def edges_values_sql(layer: list[Polygon]) -> str:
    """Render a layer's edges as a DuckDB VALUES relation
    ``(pid BIGINT, x1, y1, x2, y2 DOUBLE)``; float64 literals round-trip via
    repr so SQL sees bit-identical coordinates."""
    parts = []
    first = True
    for poly in layer:
        r = poly.ring
        nxt = np.roll(r, -1, axis=0)
        for (x1, y1), (x2, y2) in zip(r, nxt):
            if first:
                parts.append(
                    f"(CAST({poly.pid} AS BIGINT), CAST({x1!r} AS DOUBLE), "
                    f"CAST({y1!r} AS DOUBLE), CAST({x2!r} AS DOUBLE), CAST({y2!r} AS DOUBLE))")
                first = False
            else:
                parts.append(f"({poly.pid}, {x1!r}, {y1!r}, {x2!r}, {y2!r})")
    return "(VALUES " + ", ".join(parts) + ")"


def names_values_sql(layer: list[Polygon]) -> str:
    """(pid, name) VALUES relation for joining labels in the oracle."""
    parts = [f"(CAST({p.pid} AS BIGINT), '{p.name}')" for p in layer]
    return "(VALUES " + ", ".join(parts) + ")"


def region_table_name(province_id: str) -> str:
    """``get_biogeographical_region_from_id`` (compute_variables.py:141-152):
    'ML.253' → 'uusimaa'; unknown → the reference's fallback string,
    snake-cased. Cleaning: spaces/'-'→'_', ä→a, ö→o, lowercase."""
    name = PROVINCE_ID_MAPPING.get(province_id, "Empty biogeographical region")
    return (name.replace(" ", "_").replace("-", "_")
            .replace("ä", "a").replace("ö", "o").lower())


def title_from_table_name(table_name: str) -> str:
    """``get_title_name_from_table_name`` (compute_variables.py:100-139):
    'sompion_lappi_polygons' → 'Sompion Lappi'; unknown base → 'Finland'.
    The reverse map is derived from PROVINCE_ID_MAPPING instead of a
    second hand-written dict."""
    base = table_name.rsplit("_", 1)[0]
    for name in PROVINCE_ID_MAPPING.values():
        if (name.replace(" ", "_").replace("-", "_")
                .replace("ä", "a").replace("ö", "o").lower()) == base:
            return name
    return "Finland"
