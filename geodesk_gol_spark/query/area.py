"""Area-option parser (-a <coords> | @<file>): the reference accepts WKT
polygons/multipolygons, bare lon-lat coordinate lists (optionally
prefixed ``lonlat``/``latlon``), GeoJSON documents, or a file containing
any of these (``@name``; default extension ``.wkt``) —
src/gol/GolCommand.cpp:56-100, src/gol/util/PolygonParser.cpp:9-160,
src/gol/util/BoxParser.h.

``parse_area`` returns rings in WORLD x/y (the engine's projected
integer grid, ``oracle.slowpath.project``): each ring is a closed list
of (x, y) floats ready for the even-odd point-in-rings filter
(holes and multiple outers compose by even-odd crossing parity, the
same rule the reference's MCIndex ray test applies).
"""

from __future__ import annotations

import json
import os
import re

from ..oracle.slowpath import project

Ring = list[tuple[float, float]]


class AreaParseError(ValueError):
    pass


_NUM_RE = re.compile(r"[-+]?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?")
_KEYWORD_RE = re.compile(r"^\s*([A-Za-z]+)")
_KEYWORDS = {"polygon", "multipolygon", "lonlat", "latlon"}


def _deg_pair_to_world(lon_deg: float, lat_deg: float) -> tuple[int, int]:
    return project(int(round(lon_deg * 1e7)), int(round(lat_deg * 1e7)))


def _close(ring: Ring) -> Ring:
    if len(ring) < 3:
        raise AreaParseError("expected at least 3 coordinate pairs per ring")
    if ring[0] != ring[-1]:
        ring = ring + [ring[0]]
    return ring


def _rings_from_degree_rings(deg_rings: list[list[tuple[float, float]]]) -> list[Ring]:
    out = []
    for ring in deg_rings:
        pts = [tuple(map(float, _deg_pair_to_world(lon, lat))) for lon, lat in ring]
        out.append(_close(pts))
    return out


def _parse_coord_rings(text: str, lat_before_lon: bool) -> list[list[tuple[float, float]]]:
    """WKT-style body: nested ()/[] groups or a bare number list.  Every
    group (or the bare list) holding numbers is one ring; grouping depth
    beyond that only nests (POLYGON ((...)) == MULTIPOLYGON (((...))))."""
    rings: list[list[tuple[float, float]]] = []
    nums: list[float] = []

    def flush():
        if not nums:
            return
        if len(nums) % 2:
            raise AreaParseError("odd number of coordinate values")
        pairs = list(zip(nums[0::2], nums[1::2]))
        if lat_before_lon:
            pairs = [(lon, lat) for lat, lon in pairs]
        rings.append(pairs)
        nums.clear()

    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch in "([":
            flush()  # defensive: numbers never precede an open paren in WKT
            i += 1
        elif ch in ")]":
            flush()
            i += 1
        elif ch in ", \t\r\n":
            i += 1
        else:
            m = _NUM_RE.match(text, i)
            if not m:
                raise AreaParseError(f"unexpected character {ch!r} in area at {i}")
            nums.append(float(m.group(0)))
            i = m.end()
    flush()
    if not rings:
        raise AreaParseError("no coordinates found in area string")
    return rings


def _geojson_rings(obj) -> list[list[tuple[float, float]]]:
    """Collect polygon rings from a GeoJSON Geometry / Feature /
    FeatureCollection (PolygonParser::parseGeoJson accepts all three;
    GeoJSON coordinate order is always lon, lat)."""
    t = obj.get("type")
    if t == "FeatureCollection":
        rings = []
        for f in obj.get("features", []):
            rings.extend(_geojson_rings(f))
        return rings
    if t == "Feature":
        geom = obj.get("geometry")
        return _geojson_rings(geom) if geom else []
    if t == "GeometryCollection":
        rings = []
        for g in obj.get("geometries", []):
            rings.extend(_geojson_rings(g))
        return rings
    if t == "Polygon":
        return [[(float(p[0]), float(p[1])) for p in ring]
                for ring in obj["coordinates"]]
    if t == "MultiPolygon":
        return [[(float(p[0]), float(p[1])) for p in ring]
                for poly in obj["coordinates"] for ring in poly]
    raise AreaParseError(f"unsupported GeoJSON type: {t!r}")


def parse_area_text(text: str) -> list[Ring]:
    """Parse an area STRING (WKT / keyword-prefixed coords / GeoJSON)
    into world-xy rings."""
    text = text.strip()
    if not text:
        raise AreaParseError("empty area string")
    if text[0] == "{":
        return _rings_from_degree_rings(_geojson_rings(json.loads(text)))
    lat_before_lon = False
    m = _KEYWORD_RE.match(text)
    if m:
        kw = m.group(1).lower()
        if kw not in _KEYWORDS:
            raise AreaParseError(
                "expected 'polygon', 'multipolygon', 'lonlat' or "
                f"'latlon', or coordinates — got {kw!r}"
            )
        lat_before_lon = kw == "latlon"
        text = text[m.end():]
    return _rings_from_degree_rings(_parse_coord_rings(text, lat_before_lon))


def parse_area(value: str) -> list[Ring]:
    """The -a option: ``@file``, a bare file name (no comma/space/tab
    before the first separator ⇒ file, default extension .wkt), or a
    literal area string."""
    value = value.strip()
    if value.startswith("@"):
        return parse_area_text(_read_area_file(value[1:]))
    # the reference's heuristic: any comma/space/tab ⇒ literal coords.
    # Scan the WHOLE value (a file name can never contain a newline, so
    # a multiline keyword-prefixed literal must not be opened as a file).
    if not any(c in value for c in ", \t\n") and not value.startswith("{"):
        return parse_area_text(_read_area_file(value))
    return parse_area_text(value)


def _read_area_file(path: str) -> str:
    if not os.path.splitext(path)[1]:
        path += ".wkt"
    with open(path, encoding="utf-8") as f:
        return f.read()


def parse_box(value: str) -> tuple[int, int, int, int]:
    """-b <W>,<S>[,<E>,<N>] in degrees → world (minx, miny, maxx, maxy).
    A single coordinate is a degenerate box (BoxParser.h:15-23)."""
    nums = [float(m.group(0)) for m in _NUM_RE.finditer(value)]
    if len(nums) not in (2, 4):
        raise AreaParseError("expected 2 or 4 box coordinates (W,S[,E,N])")
    w, s = nums[0], nums[1]
    e, n = (nums[2], nums[3]) if len(nums) == 4 else (w, s)
    x0, y0 = _deg_pair_to_world(w, s)
    x1, y1 = _deg_pair_to_world(e, n)
    return min(x0, x1), min(y0, y1), max(x0, x1), max(y0, y1)
