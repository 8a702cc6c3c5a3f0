"""Leaflet map sink (S9) + text templates (F11).

Reference: ``gol map`` renders query layers into a self-contained HTML
map (src/gol/MapCommand.cpp:133-258) with compiled text templates for
popups (TextTemplate::compile, MapCommand.cpp:103-130).

Spark shape: formatting runs distributed (GeoJSON lines + format_string
popups are Column exprs); only the final template fill collects the
already-small result — matching the reference's driver-side printer.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TMPL_RE = re.compile(r"\{([A-Za-z0-9_:]+)\}")

_HTML = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<link rel="stylesheet" href="https://unpkg.com/leaflet/dist/leaflet.css"/>
<script src="https://unpkg.com/leaflet/dist/leaflet.js"></script>
<style>html,body,#map{{height:100%;margin:0}}</style></head>
<body><div id="map"></div><script>
var map = L.map('map');
var layer = L.geoJSON([{features}], {{
  onEachFeature: function(f, l) {{
    if (f.properties && f.properties._popup) l.bindPopup(f.properties._popup);
  }}
}}).addTo(map);
L.tileLayer('https://tile.openstreetmap.org/{{z}}/{{x}}/{{y}}.png').addTo(map);
try {{ map.fitBounds(layer.getBounds()); }} catch (e) {{ map.setView([0,0],2); }}
</script></body></html>
"""


def template_col(template: str, tags: str = "tags") -> Column:
    """F11: '{name} ({id})' → format_string over tag/id columns.

    ``{id}`` binds the feature id column; any other ``{key}`` binds
    ``tags[key]`` (missing keys render empty)."""
    fmt = _TMPL_RE.sub("%s", template).replace("%%", "%%")
    args = []
    for key in _TMPL_RE.findall(template):
        if key == "id":
            args.append(F.col("id").cast("string"))
        else:
            args.append(F.coalesce(F.col(tags).getItem(key), F.lit("")))
    return F.format_string(fmt, *args)


def render_map(
    geojson_lines: DataFrame,
    title: str = "geodesk_gol_spark map",
    limit: int = 10_000,
) -> str:
    """S9: collect formatted GeoJSON lines into a self-contained HTML map."""
    lines = [r["line"] for r in geojson_lines.limit(limit).collect()]
    return _HTML.format(title=title, features=",\n".join(lines))
