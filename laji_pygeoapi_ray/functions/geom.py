"""Minimal geometry layer: WKB codec + the reference's geometry
normalization/validation semantics, in pure numpy (no shapely in the
container).

Reproduced semantics (file:line into /root/reference/pygeoapi/scripts):
- ``convert_geometry_collection_to_multipolygon`` (process_data.py:132-181):
  GeometryCollection of 1 → unwrap; homogeneous → MultiX (flattening nested
  MultiX members); mixed → buffer points/lines by 0.5 and union into a
  MultiPolygon; None → None; conversion counting.
- ``validate_geometry`` (process_data.py:25-39): mask invalid geometries,
  repair only those, count edits.

Union and repair now run on the planar-overlay engine
(``functions/polyclip.py``) with true GEOS semantics:
- mixed-GC ``union`` = real unary_union: per-segment convex capsules for
  buffered points/lines, overlaid with polygon parts; concave merges,
  shared-edge dissolves, holes and disjoint structure all exact.
- ``make_valid`` = the odd-even linework rebuild (a bowtie splits into
  its two triangles, exactly as GEOS); falls back to the convex hull
  only for degenerate linework the overlay cannot trace.

The buffer disc is a regular 32-gon matching GEOS's default
quad_segs=8 vertex count (8 fillet segments per quadrant); vertex
PLACEMENT starts at angle 0, so individual coordinates can still differ
from a given GEOS build by a rotation while count/topology/structure
match.

WKB follows the OGC well-known-binary spec (little-endian, 2-D).
"""
from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

WKB_TYPES = {1: "Point", 2: "LineString", 3: "Polygon", 4: "MultiPoint",
             5: "MultiLineString", 6: "MultiPolygon",
             7: "GeometryCollection"}
WKB_CODES = {v: k for k, v in WKB_TYPES.items()}


@dataclass
class Geometry:
    """type ∈ WKB_TYPES values; data:
    Point → (2,) ndarray; LineString → (n, 2); Polygon → [rings (n, 2)];
    Multi*/GeometryCollection → [Geometry]."""
    type: str
    data: object

    @property
    def base_type(self) -> str:
        return self.type[5:] if self.type.startswith("Multi") else self.type


# ----------------------------------------------------------------- WKB codec

def _wkb_coords(buf, pos, n):
    arr = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=pos)
    return arr.reshape(n, 2).copy(), pos + 16 * n


def wkb_decode(buf: bytes, pos: int = 0) -> tuple[Geometry, int]:
    byte_order = buf[pos]
    assert byte_order == 1, "big-endian WKB not emitted by this engine"
    (code,) = struct.unpack_from("<I", buf, pos + 1)
    typ = WKB_TYPES[code & 0xFF]
    pos += 5
    if typ == "Point":
        xy, pos = _wkb_coords(buf, pos, 1)
        return Geometry("Point", xy[0]), pos
    if typ == "LineString":
        (n,) = struct.unpack_from("<I", buf, pos)
        xy, pos = _wkb_coords(buf, pos + 4, n)
        return Geometry("LineString", xy), pos
    if typ == "Polygon":
        (nr,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from("<I", buf, pos)
            xy, pos = _wkb_coords(buf, pos + 4, n)
            rings.append(xy)
        return Geometry("Polygon", rings), pos
    # Multi* / GeometryCollection: count + nested WKB geometries
    (ng,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    parts = []
    for _ in range(ng):
        g, pos = wkb_decode(buf, pos)
        parts.append(g)
    return Geometry(typ, parts), pos


def wkb_encode(g: Geometry | None) -> bytes | None:
    if g is None:
        return None
    code = WKB_CODES[g.type]
    head = b"\x01" + struct.pack("<I", code)
    if g.type == "Point":
        return head + np.asarray(g.data, dtype="<f8").tobytes()
    if g.type == "LineString":
        xy = np.asarray(g.data, dtype="<f8")
        return head + struct.pack("<I", len(xy)) + xy.tobytes()
    if g.type == "Polygon":
        out = head + struct.pack("<I", len(g.data))
        for ring in g.data:
            xy = np.asarray(ring, dtype="<f8")
            out += struct.pack("<I", len(xy)) + xy.tobytes()
        return out
    out = head + struct.pack("<I", len(g.data))
    for part in g.data:
        out += wkb_encode(part)
    return out


# ------------------------------------------------------------- construction

def close_ring(xy: np.ndarray) -> np.ndarray:
    xy = np.asarray(xy, dtype=np.float64)
    if len(xy) == 0 or not np.array_equal(xy[0], xy[-1]):
        xy = np.vstack([xy, xy[:1]])
    return xy


def convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain; returns CCW hull vertices (open ring)."""
    pts = np.unique(np.asarray(pts, dtype=np.float64), axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(points):
        out = []
        for p in points:
            while len(out) >= 2:
                a = out[-1] - out[-2]
                b = p - out[-2]
                if a[0] * b[1] - a[1] * b[0] > 0:   # == np.cross(a, b)
                    break
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.asarray(lower[:-1] + upper[:-1])


# GEOS default quad_segs=8 → 8 fillet segments per quadrant → 32 vertices
_DISC = np.stack([np.cos(np.linspace(0, 2 * np.pi, 32, endpoint=False)),
                  np.sin(np.linspace(0, 2 * np.pi, 32, endpoint=False))],
                 axis=1)


def buffer_to_polygon(g: Geometry, dist: float = 0.5) -> Geometry:
    """Dilate a point/line/polygon by ``dist``: Minkowski sum with a regular
    32-gon (GEOS quad_segs=8), realised as the convex hull of every vertex's
    translated disc (exact for points/segments/convex inputs)."""
    if g.type == "Point":
        verts = np.asarray(g.data, dtype=np.float64)[None, :]
    elif g.type == "LineString":
        verts = np.asarray(g.data, dtype=np.float64)
    elif g.type == "Polygon":
        verts = np.asarray(g.data[0], dtype=np.float64)
    else:
        verts = np.concatenate([
            np.atleast_2d(np.asarray(p.data if p.type == "Point"
                                     else (p.data if p.type == "LineString"
                                           else p.data[0])))
            for p in g.data])
    cloud = (verts[:, None, :] + dist * _DISC[None, :, :]).reshape(-1, 2)
    return Geometry("Polygon", [close_ring(convex_hull(cloud))])


def buffer_capsules(g: Geometry, dist: float = 0.5) -> list[list[np.ndarray]]:
    """Buffer a Point/LineString as a list of CONVEX capsule polygons —
    one disc per point, one segment capsule (hull of the two endpoint
    discs, exact Minkowski sum of a segment) per line segment. Their
    union (polyclip.union_rings) is the true — possibly concave — buffer
    of the whole geometry."""
    if g.type == "Point":
        pts = np.asarray(g.data, dtype=np.float64)[None, :]
        segs = []
    elif g.type == "LineString":
        xy = np.asarray(g.data, dtype=np.float64)
        pts = xy[:1] if len(xy) == 1 else np.empty((0, 2))
        segs = list(zip(xy[:-1], xy[1:]))
    else:
        raise ValueError(f"buffer_capsules: unsupported {g.type}")
    out = []
    for p in pts:
        disc = p[None, :] + dist * _DISC
        out.append([close_ring(convex_hull(disc))])
    for a, b in segs:
        cloud = (np.stack([a, b])[:, None, :]
                 + dist * _DISC[None, :, :]).reshape(-1, 2)
        out.append([close_ring(convex_hull(cloud))])
    return out


def convex_overlap(a: np.ndarray, b: np.ndarray) -> bool:
    """Exact overlap test for two CONVEX rings via the separating-axis
    theorem: the polygons are disjoint iff some edge normal of either
    separates the projections. Touching counts as overlap (union merges
    touching parts)."""
    for poly in (a, b):
        pts = poly[:-1] if np.array_equal(poly[0], poly[-1]) else poly
        for i in range(len(pts)):
            e = pts[(i + 1) % len(pts)] - pts[i]
            axis = np.array([-e[1], e[0]])
            pa_ = a @ axis
            pb_ = b @ axis
            if pa_.max() < pb_.min() or pb_.max() < pa_.min():
                return False
    return True


# ------------------------------------------------- GC normalization (§2.2)

def _flatten_members(parts: list[Geometry]) -> list[Geometry]:
    out = []
    for p in parts:
        if p.type.startswith("Multi"):
            out.extend(p.data)
        else:
            out.append(p)
    return out


def normalize_geometry(g: Geometry | None) -> tuple[Geometry | None, bool]:
    """``convert_geometry_collection_to_multipolygon`` semantics; returns
    (geometry, converted?)."""
    if g is None or g.type != "GeometryCollection":
        return g, False
    if len(g.data) == 1:
        return g.data[0], True
    bases = {p.base_type for p in g.data}
    if len(bases) == 1:
        base = bases.pop()
        members = _flatten_members(g.data)
        return Geometry(f"Multi{base}", members), True
    # mixed: buffer non-polygons by 0.5, union, promote to MultiPolygon
    # (process_data.py:163-176). TRUE unary_union via the planar-overlay
    # engine: points/lines become per-segment convex capsules, polygons
    # keep their rings (holes included), and the overlay merges touching
    # parts with real (possibly concave) boundary coordinates while
    # disjoint parts stay separate MultiPolygon members.
    from .polyclip import union_rings

    polys: list[list[np.ndarray]] = []
    for p in _flatten_members(g.data):
        if p.base_type == "Polygon":
            polys.append([close_ring(np.asarray(r, dtype=np.float64))
                          for r in p.data])
        else:
            polys.extend(buffer_capsules(p))
    merged = union_rings(polys)
    if not merged:      # degenerate linework: fall back to the hull
        allpts = np.concatenate([r for rs in polys for r in rs])
        merged = [(close_ring(convex_hull(allpts)), [])]
    members = [Geometry("Polygon", [shell] + list(holes))
               for shell, holes in merged]
    return Geometry("MultiPolygon", members), True


# --------------------------------------------------------------- validation

def _segments_intersect(p1, p2, p3, p4) -> bool:
    """Proper intersection of open segments (shared endpoints excluded).
    Cross products written as direct scalar arithmetic — the exact
    expression np.cross evaluates, minus its per-call broadcast
    machinery (this predicate runs O(edges²) per ring)."""
    sx, sy = p4[0] - p3[0], p4[1] - p3[1]
    rx, ry = p2[0] - p1[0], p2[1] - p1[1]
    d1 = sx * (p1[1] - p3[1]) - sy * (p1[0] - p3[0])
    d2 = sx * (p2[1] - p3[1]) - sy * (p2[0] - p3[0])
    d3 = rx * (p3[1] - p1[1]) - ry * (p3[0] - p1[0])
    d4 = rx * (p4[1] - p1[1]) - ry * (p4[0] - p1[0])
    return ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0))


def polygon_is_valid(g: Geometry) -> bool:
    """Exact structural validity: closed rings with ≥4 vertices and no
    proper self-intersection between non-adjacent edges."""
    for ring in g.data:
        ring = np.asarray(ring, dtype=np.float64)
        if len(ring) < 4 or not np.array_equal(ring[0], ring[-1]):
            return False
        e = len(ring) - 1
        for i in range(e):
            for j in range(i + 2, e):
                if i == 0 and j == e - 1:
                    continue
                if _segments_intersect(ring[i], ring[i + 1],
                                       ring[j], ring[j + 1]):
                    return False
    return True


def is_valid(g: Geometry | None) -> bool:
    if g is None:
        return False
    if g.type == "Polygon":
        return polygon_is_valid(g)
    if g.type in ("MultiPolygon", "GeometryCollection"):
        return all(is_valid(p) for p in g.data)
    return True


def make_valid(g: Geometry) -> Geometry:
    """Repair an invalid polygonal geometry with the GEOS linework
    semantics: node every self-crossing and keep the odd-winding faces
    (``polyclip.odd_even_rebuild`` — a bowtie splits into its two
    triangles). Falls back to the convex hull only when the linework is
    degenerate (no traceable face)."""
    if g.type == "Polygon":
        from .polyclip import odd_even_rebuild

        try:
            parts = odd_even_rebuild(
                [np.asarray(r, dtype=np.float64) for r in g.data])
        except Exception:
            parts = []
        if len(parts) == 1:
            shell, holes = parts[0]
            return Geometry("Polygon", [shell] + list(holes))
        if parts:
            return Geometry("MultiPolygon",
                            [Geometry("Polygon", [s] + list(hs))
                             for s, hs in parts])
        return Geometry("Polygon",
                        [close_ring(convex_hull(np.asarray(g.data[0])[:-1]
                                                if len(g.data[0]) > 1
                                                else g.data[0]))])
    if g.type == "MultiPolygon":
        members = []
        for p in g.data:
            rp = make_valid(p) if not is_valid(p) else p
            # a repaired member may itself split (bowtie → 2 polygons):
            # flatten so the result stays a legal MultiPolygon
            members.extend(rp.data if rp.type == "MultiPolygon" else [rp])
        return Geometry("MultiPolygon", members)
    return g


def validate_geometries(geoms: list[Geometry | None]) -> tuple[list, int]:
    """``validate_geometry``: repair ONLY the invalid ones, count edits."""
    out, edited = [], 0
    for g in geoms:
        if g is not None and not is_valid(g):
            out.append(make_valid(g))
            edited += 1
        else:
            out.append(g)
    return out, edited


def normalize_wkb_batch(wkbs: list[bytes | None]) -> tuple[list, int]:
    """Batch kernel used by the map_batches stage: decode → normalize →
    re-encode; returns (wkb list, conversions)."""
    out, converted = [], 0
    for b in wkbs:
        if b is None:
            out.append(None)
            continue
        g, _ = wkb_decode(b)
        g2, conv = normalize_geometry(g)
        converted += conv
        out.append(wkb_encode(g2))
    return out, converted
