"""Full geometry assembly (S7/F9 closure): way GeoJSON/XML/CSV-geom and
relation MultiPolygon ring stitching.

Mirrors the reference's cross-format consistency protocol
(test/test_query.py:33-63) extended to way/relation geometry, plus a
constructed nesting fixture (shell ⊃ hole ⊃ island ⊃ inner hole +
disjoint shell) pinning the containment-based ring classification.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from geodesk_gol_spark.functions.mercator import with_projection
from geodesk_gol_spark.query.formats import (
    relation_xml,
    way_csv,
    way_geojsonl,
    way_wkt,
    way_xml,
)
from geodesk_gol_spark.query.geometry import (
    relation_multipolygon_geojson,
    ring_nesting,
    relation_ring_vertices,
)


def _square(cx, cy, r):
    """Closed square ring around (cx, cy) in 100-nanodegree units."""
    return [
        (cx - r, cy - r), (cx + r, cy - r), (cx + r, cy + r),
        (cx - r, cy + r), (cx - r, cy - r),
    ]


@pytest.fixture(scope="module")
def nested(spark):
    """5 concentric/disjoint square rings: A(big) ⊃ B ⊃ C ⊃ D, E apart.
    Expected stitching: polys [A - hole B, C - hole D, E]."""
    cx, cy = 80_000_000, 430_000_000
    rings = {
        100: _square(cx, cy, 4_000_000),   # shell, depth 0
        101: _square(cx, cy, 3_000_000),   # hole of 100, depth 1
        102: _square(cx, cy, 2_000_000),   # island in hole, depth 2
        103: _square(cx, cy, 1_000_000),   # hole of island, depth 3
        104: _square(cx + 20_000_000, cy, 1_000_000),  # disjoint shell
    }
    node_rows, way_rows, nid = [], [], 0
    for wid, pts in rings.items():
        ids = []
        for lon, lat in pts[:-1]:
            node_rows.append((nid, lon, lat, {}, "d", nid))
            ids.append(nid)
            nid += 1
        way_rows.append((wid, ids + [ids[0]], {}, "d", 0))
    nodes = spark.createDataFrame(
        node_rows,
        "id long, lon100nd int, lat100nd int, tags map<string,string>, "
        "doc_id string, span_seq int",
    )
    ways = spark.createDataFrame(
        way_rows,
        "id long, node_ids array<bigint>, tags map<string,string>, "
        "doc_id string, span_seq int",
    )
    rels = spark.createDataFrame(
        [(
            900,
            [(1, w, "outer" if w == 100 else "inner")
             for w in sorted(rings)],
            {"type": "multipolygon"}, "d", 0,
        )],
        "id long, members array<struct<t:tinyint,id:bigint,role:string>>, "
        "tags map<string,string>, doc_id string, span_seq int",
    )
    return with_projection(nodes).persist(), ways.persist(), rels


def test_ring_nesting_depths(nested):
    proj, ways, rels = nested
    vx = relation_ring_vertices(rels, ways, proj)
    _, depth = ring_nesting(vx)
    got = {r.way_id: r.d for r in depth.collect()}
    assert got == {100: 0, 101: 1, 102: 2, 103: 3, 104: 0}


def test_multipolygon_assembly(nested):
    proj, ways, rels = nested
    mp = relation_multipolygon_geojson(rels, ways, proj).collect()
    assert len(mp) == 1
    g = json.loads(mp[0].geometry)
    assert g["type"] == "MultiPolygon"
    # polygons ordered by shell way id: 100, 102, 104
    assert [len(p) for p in g["coordinates"]] == [2, 2, 1]
    # each ring closes and has 5 vertices (square + repeat)
    for poly in g["coordinates"]:
        for ring in poly:
            assert len(ring) == 5 and ring[0] == ring[-1]
    # the hole of polygon 0 is ring 101 (radius 3e6 100nd = 0.3 deg ->
    # lon spread 0.6 deg)
    shell0, hole0 = g["coordinates"][0]
    spread = lambda ring: max(p[0] for p in ring) - min(p[0] for p in ring)  # noqa: E731
    assert spread(shell0) == pytest.approx(0.8)
    assert spread(hole0) == pytest.approx(0.6)
    assert spread(g["coordinates"][1][0]) == pytest.approx(0.4)
    assert spread(g["coordinates"][1][1]) == pytest.approx(0.2)
    assert spread(g["coordinates"][2][0]) == pytest.approx(0.2)


def test_multipolygon_skips_open_ways(nested, spark):
    """An open (unclosed) member way contributes no ring (documented
    spec: the engine does not stitch open segments)."""
    proj, ways, rels = nested
    open_way = spark.createDataFrame(
        [(105, [0, 1, 2], {}, "d", 0)],
        "id long, node_ids array<bigint>, tags map<string,string>, "
        "doc_id string, span_seq int",
    )
    rels2 = spark.createDataFrame(
        [(901, [(1, 100, "outer"), (1, 105, "inner")], {}, "d", 0)],
        "id long, members array<struct<t:tinyint,id:bigint,role:string>>, "
        "tags map<string,string>, doc_id string, span_seq int",
    )
    mp = relation_multipolygon_geojson(
        rels2, ways.unionByName(open_way), proj
    ).collect()
    g = json.loads(mp[0].geometry)
    assert [len(p) for p in g["coordinates"]] == [1]  # only ring 100


def test_way_cross_format_consistency(spark):
    """count == geojsonl == wkt == xml == csv rows for the same way
    query (the reference's protocol, test/test_query.py:33-63, lifted
    to ways)."""
    from geodesk_gol_spark.sources.parser import parse_features
    from geodesk_gol_spark.sources.synth import synth_docs

    from .conftest import SF_DIR

    feats = parse_features(synth_docs(spark, SF_DIR))
    ways = feats["ways"].filter(F.col("id") % 13 == 0).persist()
    proj = with_projection(feats["nodes"]).persist()
    n = ways.count()
    assert n > 0
    assert way_geojsonl(ways, proj).count() == n
    assert way_wkt(ways, proj).count() == n
    assert way_xml(ways).count() == n
    assert way_csv(ways, proj, ["highway"]).count() == n
    # every geojson line parses and carries a geometry of the right kind
    for r in way_geojsonl(ways, proj).limit(20).collect():
        f = json.loads(r.line)
        assert f["geometry"]["type"] in ("LineString", "Polygon")


def test_xml_escaping(spark):
    """Tag keys/values with XML specials stay escaped in way and
    relation elements."""
    ways = spark.createDataFrame(
        [(1, [7, 8], {"name": 'Bar & <Grill> "x"'})],
        "id long, node_ids array<bigint>, tags map<string,string>",
    )
    line = way_xml(ways).collect()[0].line
    assert '<nd ref="7"/><nd ref="8"/>' in line
    assert "Bar &amp; &lt;Grill&gt; &quot;x&quot;" in line
    rels = spark.createDataFrame(
        [(2, [(0, 5, 'a"b')], {"k<": "v&"})],
        "id long, members array<struct<t:tinyint,id:bigint,role:string>>, "
        "tags map<string,string>",
    )
    rline = relation_xml(rels).collect()[0].line
    assert '<member type="node" ref="5" role="a&quot;b"/>' in rline
    assert '<tag k="k&lt;" v="v&amp;"/>' in rline


def test_format_way_result_dispatch(spark):
    """The way -f dispatcher returns every format and rejects unknown
    names before running a job."""
    from geodesk_gol_spark.query.formats import (
        InvalidFormatError, format_way_result)
    from geodesk_gol_spark.sources.parser import parse_features
    from geodesk_gol_spark.sources.synth import synth_docs

    from .conftest import SF_DIR

    feats = parse_features(synth_docs(spark, SF_DIR))
    ways = feats["ways"].filter(F.col("id") % 131 == 0).persist()
    proj = with_projection(feats["nodes"])
    n = format_way_result(ways, proj, "count")
    assert n == ways.count() and n > 0
    assert format_way_result(ways, proj, "jsonl").count() == n
    lines = format_way_result(ways, proj, "list").collect()
    assert all(r.line.startswith("w") for r in lines)
    fc = json.loads(
        format_way_result(ways, proj, "geojson").collect()[0].line
    )
    assert fc["type"] == "FeatureCollection" and len(fc["features"]) == n
    assert format_way_result(ways, proj, "xml").count() == n
    assert format_way_result(ways, proj, "csv", keys=["name"]).columns == [
        "id", "geom", "name"]
    with pytest.raises(InvalidFormatError):
        format_way_result(ways, proj, "nope")


def test_map_sink_renders_way_and_relation_geometry(nested):
    """S9 geometry closure by composition: the Leaflet sink consumes
    GeoJSON Feature lines through a generic L.geoJSON layer
    (MapCommand.cpp:133-258 renders the same layer kinds), so the
    way/relation formatters light it up with no sink change — pin that
    LineString/Polygon/MultiPolygon features all reach the HTML."""
    from geodesk_gol_spark.query.formats import way_geojsonl
    from geodesk_gol_spark.query.geometry import (
        relation_multipolygon_geojson,
    )
    from geodesk_gol_spark.query.map import render_map

    proj, ways, rels = nested
    # untagged closed rings format as LineString (F7 rule table); tag
    # one ring as an area so the Polygon branch is exercised too
    ways = ways.withColumn(
        "tags",
        F.when(F.col("id") == 104, F.create_map(F.lit("building"),
                                                F.lit("yes")))
        .otherwise(F.col("tags")),
    )
    open_way = ways.sparkSession.createDataFrame(
        [(200, [0, 1, 2], {"highway": "path"}, "d", 0)],
        ways.schema,
    )
    mp = relation_multipolygon_geojson(rels, ways, proj).selectExpr(
        "concat('{\"type\":\"Feature\",\"id\":', rel_id, "
        "',\"properties\":{},\"geometry\":', geometry, '}') as line"
    )
    lines = way_geojsonl(ways.union(open_way), proj).select("line").union(mp)
    html = render_map(lines, title="geom map")
    assert '"type":"Polygon"' in html        # closed square rings
    assert '"type":"LineString"' in html     # the open 3-node way
    assert '"type":"MultiPolygon"' in html   # stitched relation
    assert "L.geoJSON" in html


def test_format_relation_result_dispatch(nested):
    """The relation -f dispatcher: every format renders, geometry is
    the stitched MultiPolygon (GeoJSON + WKT dialects of the SAME
    assembly), ring-less relations keep their row with null/EMPTY
    geometry (count parity across formats)."""
    from geodesk_gol_spark.query.formats import (
        InvalidFormatError, format_relation_result)

    proj, ways, rels = nested
    # add a relation whose only member way is open -> no rings
    ringless = rels.sparkSession.createDataFrame(
        [(901, [(1, 200, "outer")], {"type": "multipolygon"}, "d", 0)],
        rels.schema,
    )
    rels2 = rels.union(ringless)
    assert format_relation_result(rels2, ways, proj, "count") == 2
    lines = format_relation_result(rels2, ways, proj, "list").collect()
    assert sorted(r.line for r in lines) == ["r900", "r901"]
    jl = {json.loads(r.line)["id"]: json.loads(r.line)
          for r in format_relation_result(
              rels2, ways, proj, "geojsonl").collect()}
    assert jl[900]["geometry"]["type"] == "MultiPolygon"
    assert len(jl[900]["geometry"]["coordinates"]) == 3
    assert jl[901]["geometry"] is None
    fc = json.loads(format_relation_result(
        rels2, ways, proj, "geojson").collect()[0].line)
    assert fc["type"] == "FeatureCollection" and len(fc["features"]) == 2
    wkts = sorted(r.wkt for r in format_relation_result(
        rels2, ways, proj, "wkt").collect())
    assert wkts[0] == "GEOMETRYCOLLECTION EMPTY"
    assert wkts[1].startswith("MULTIPOLYGON (((")
    # 3 polygons: shells 100 (1 hole), 102 (1 hole), 104 (no hole)
    assert wkts[1].count ("), (") >= 2
    csv = format_relation_result(rels2, ways, proj, "csv", keys=["type"])
    assert csv.columns == ["id", "geom", "type"]
    got = {r.id: r for r in csv.collect()}
    assert got[900].geom.startswith("MULTIPOLYGON") and got[900].type == "multipolygon"
    assert got[901].geom == "GEOMETRYCOLLECTION EMPTY"
    xml = format_relation_result(rels2, ways, proj, "xml").collect()
    assert any('<member type="way" ref="100" role="outer"/>' in r.line
               for r in xml)
    with pytest.raises(InvalidFormatError):
        format_relation_result(rels2, ways, proj, "nope")


def test_null_tags_and_dangling_refs_keep_count_parity(nested):
    """Printer hardening pins: (1) a NULL tags map must not NULL the
    whole line (count == lines across formats); (2) a way whose node
    refs resolve to zero rows renders an empty-geometry form instead of
    vanishing; (3) tag values with JSON specials stay parseable."""
    from geodesk_gol_spark.query.formats import format_way_result

    proj, ways, rels = nested
    spark = ways.sparkSession
    extra = spark.createDataFrame(
        [
            # null tags, resolvable nodes
            (300, ways.select("node_ids").first().node_ids, None, "d", 0),
            # dangling refs: no such node ids in proj
            (301, [999_990, 999_991, 999_992],
             {"name": 'The "Best" \\ Bar'}, "d", 0),
        ],
        ways.schema,
    )
    allw = ways.union(extra)
    n = allw.count()
    lines = format_way_result(allw, proj, "geojsonl").collect()
    assert len(lines) == n and all(r.line is not None for r in lines)
    feats = [json.loads(r.line) for r in lines]
    by_id = {f["id"]: f for f in feats}
    assert by_id[300]["properties"] == {}
    assert by_id[301]["geometry"] is None
    assert by_id[301]["properties"]["name"] == 'The "Best" \\ Bar'
    wkts = format_way_result(allw, proj, "wkt").collect()
    assert len(wkts) == n
    assert sum(w.wkt == "LINESTRING EMPTY" for w in wkts) == 1
    xml = format_way_result(allw, proj, "xml").collect()
    assert len(xml) == n and all(r.line is not None for r in xml)
    # the FeatureCollection carries every feature too
    fc = json.loads(
        format_way_result(allw, proj, "geojson").first().line)
    assert len(fc["features"]) == n
    # relation printers share the null-safe helpers
    nulltag_rel = rels.withColumn(
        "tags", F.lit(None).cast("map<string,string>"))
    from geodesk_gol_spark.query.formats import format_relation_result
    rl = format_relation_result(nulltag_rel, ways, proj, "geojsonl")
    assert [r.line is not None for r in rl.collect()] == [True]
    rx = relation_xml(nulltag_rel).collect()
    assert rx[0].line is not None


def test_way_csv_key_collision_with_id_and_geom(nested):
    """-k keys named 'id'/'geom' are reachable user input; the csv
    printer must not raise AMBIGUOUS_REFERENCE."""
    proj, ways, _ = nested
    out = way_csv(ways, proj, ["id", "geom", "building"])
    assert out.columns == ["id", "geom", "id", "geom", "building"]
    assert out.count() == ways.count()


def test_empty_way_and_relation_results_across_formats(nested):
    """Mirror of the reference's empty-result invariants
    (test/test_query.py:55-66) for the way/relation dispatchers: an
    empty selection yields count 0, zero lines in every row-per-feature
    format, and an empty-but-well-formed FeatureCollection."""
    from geodesk_gol_spark.query.formats import (
        format_relation_result,
        format_way_result,
    )

    proj, ways, rels = nested
    no_ways = ways.filter(F.lit(False))
    no_rels = rels.filter(F.lit(False))
    assert format_way_result(no_ways, proj, "count") == 0
    for fmt in ("geojsonl", "wkt", "csv", "xml", "list", "brief"):
        assert format_way_result(no_ways, proj, fmt).count() == 0, fmt
    fc = json.loads(format_way_result(no_ways, proj, "geojson").first().line)
    assert fc == {"type": "FeatureCollection", "features": []}
    assert format_relation_result(no_rels, ways, proj, "count") == 0
    for fmt in ("geojsonl", "wkt", "csv", "xml", "list", "brief"):
        assert format_relation_result(no_rels, ways, proj, fmt).count() == 0, fmt
    fc = json.loads(
        format_relation_result(no_rels, ways, proj, "geojson").first().line)
    assert fc == {"type": "FeatureCollection", "features": []}
