"""Output formats (S7/F9/F10): GeoJSON(L), WKT, CSV, XML, ID list, count.

Reference: format dispatch src/gol/QueryCommand.cpp:103-148,180-199;
printers src/gol/query/*.h (GeoJson GeoJsonQueryPrinter.h:23-28, Csv
CsvQueryPrinter.h:33-46); coordinate precision -p (0..15, default 7)
src/gol/QueryCommand.cpp:218-222; cross-format consistency protocol
test/test_query.py:33-63 (count == geojsonl lines == wkt count == list
lines), which our tests mirror.

All strings are built with exact integer/string Column ops (no float
formatting) so the DuckDB oracle can reproduce them byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import sqlgen

TYPE_LETTER = {0: "n", 1: "w", 2: "r"}


def coord_str(col: str, precision: int = 7) -> Column:
    """Coordinate text at ``precision`` decimals (reference -p 0..15).

    100-nanodegree units carry 7 real decimals; higher precisions pad
    exact zeros (feeding precision > 7 into the shared SQL generator
    would interpolate a fractional scale and break the expression)."""
    if not 0 <= precision <= 15:
        raise ValueError(f"precision must be 0..15, got {precision}")
    base = F.expr(sqlgen.coord_str_expr(col, min(precision, 7)))
    if precision > 7:
        base = F.concat(base, F.lit("0" * (precision - 7)))
    return base


def _type_letter_col() -> Column:
    # built from TYPE_LETTER so the mapping has one source of truth
    (f0, l0), (f1, l1), (_, l2) = sorted(TYPE_LETTER.items())
    return (
        F.when(F.col("ftype") == f0, l0)
        .when(F.col("ftype") == f1, l1)
        .otherwise(l2)
    )


def id_list(features: DataFrame) -> DataFrame:
    """ID list lines, e.g. ``n12345`` — the -f list format."""
    return features.select(
        F.concat(_type_letter_col(), F.col("id").cast("string")).alias("line")
    )


def count_result(features: DataFrame) -> int:
    """-f count (A7)."""
    return features.count()


def node_geojsonl_line(precision: int = 7) -> Column:
    """The per-feature GeoJSON line as a Column (over id, lon100nd,
    lat100nd, tags) — shared by the geojsonl and geojson sinks."""
    geometry = F.concat(
        F.lit('{"type":"Point","coordinates":['),
        coord_str("lon100nd", precision),
        F.lit(","),
        coord_str("lat100nd", precision),
        F.lit("]}"),
    )
    props = F.coalesce(F.to_json(F.col("tags")), F.lit("{}"))
    return F.concat(
        F.lit('{"type":"Feature","id":'),
        F.col("id").cast("string"),
        F.lit(',"properties":'),
        props,
        F.lit(',"geometry":'),
        geometry,
        F.lit("}"),
    )


def node_geojsonl(nodes: DataFrame, precision: int = 7) -> DataFrame:
    """One GeoJSON Feature per line for point features.

    Expects columns: id, lon100nd, lat100nd, tags.
    """
    return nodes.select(node_geojsonl_line(precision).alias("line"))


def node_wkt(nodes: DataFrame, precision: int = 7) -> DataFrame:
    return nodes.select(
        F.concat(
            F.lit("POINT ("),
            coord_str("lon100nd", precision),
            F.lit(" "),
            coord_str("lat100nd", precision),
            F.lit(")"),
        ).alias("wkt")
    )


def _way_body(
    ways: DataFrame, nodes: DataFrame, pt, sep: str
) -> DataFrame:
    """(id, as_area, tags, body): ordered member-coordinate text per way.

    ``pt`` is a Column over (lon100nd, lat100nd) rendering one vertex.
    Spark shape: explode node list with position, join node coords,
    re-sort inside the array (collect_list order is shuffle-dependent —
    array_sort on (seq, text) restores the span order invariant).

    Every input way keeps its row: a way whose node refs resolve to
    ZERO rows in ``nodes`` (dangling refs in a real extract, empty
    node list, pre-filtered node projection) comes back with
    ``body`` NULL instead of vanishing — the printers render an
    empty-geometry form so count parity holds across formats (the
    same contract format_relation_result keeps for ring-less
    relations).
    """
    from ..functions.areas import way_is_area

    wm = ways.select("id", F.posexplode("node_ids").alias("seq", "node_id"))
    coords = nodes.select(F.col("id").alias("node_id"), pt.alias("pt"))
    agg = (
        wm.join(coords, "node_id")
        .groupBy("id")
        .agg(
            F.array_sort(F.collect_list(F.struct("seq", "pt"))).alias("pts"),
        )
        .withColumn(
            "body", F.array_join(F.expr("transform(pts, p -> p.pt)"), sep)
        )
    )
    base = ways.select(
        "id",
        F.coalesce(F.col("tags"), F.expr("map()")).alias("tags"),
        way_is_area().alias("as_area"),
    )
    return base.join(agg.select("id", "body"), "id", "left")


def way_wkt(
    ways: DataFrame, nodes: DataFrame, precision: int = 7
) -> DataFrame:
    """LINESTRING/POLYGON per way from ordered member coordinates.

    POLYGON only for ways the area classifier accepts (closed ring AND
    area tags, functions/areas.way_is_area) — a closed
    junction=roundabout is a linear feature in the reference's printer
    and in this repo's own compiled is_area flag.
    """
    pt = F.concat(
        coord_str("lon100nd", precision), F.lit(" "),
        coord_str("lat100nd", precision),
    )
    per_way = _way_body(ways, nodes, pt, ", ")
    return per_way.select(
        "id",
        F.when(
            F.col("body").isNull(),
            F.when(F.col("as_area"), F.lit("POLYGON EMPTY"))
            .otherwise(F.lit("LINESTRING EMPTY")),
        )
        .when(
            F.col("as_area"), F.concat(F.lit("POLYGON (("), F.col("body"), F.lit("))"))
        )
        .otherwise(F.concat(F.lit("LINESTRING ("), F.col("body"), F.lit(")")))
        .alias("wkt"),
    )


def _sorted_tag_props_json() -> "F.Column":
    """Tag map → JSON object text with SORTED keys (deterministic across
    shuffles and engines; the reference prints tag-table storage order,
    our documented spec is sorted keys — same deviation node_brief
    makes).  Keys/values are JSON-escaped via to_json (map_from_entries
    preserves the sorted entry order), matching the node printer's
    convention; a NULL tag map renders ``{}`` so the line itself can
    never go NULL (count == lines across formats)."""
    return F.expr(
        "to_json(map_from_entries(array_sort("
        "map_entries(coalesce(tags, map())))))"
    )


def way_geojsonl(
    ways: DataFrame, nodes: DataFrame, precision: int = 7
) -> DataFrame:
    """(id, line): one full GeoJSON Feature per way — LineString for
    linear ways, Polygon for area ways (S7/F9 way-geometry closure; the
    reference's GeoJsonQueryPrinter emits exactly these two kinds for
    ways, src/gol/query/GeoJsonQueryPrinter.h:23-28).

    Properties are the sorted-key tag map; coordinates use the same
    exact integer rendering as the node sink, so the DuckDB oracle can
    reproduce the line byte-for-byte.
    """
    pt = F.concat(
        F.lit("["), coord_str("lon100nd", precision), F.lit(","),
        coord_str("lat100nd", precision), F.lit("]"),
    )
    per_way = _way_body(ways, nodes, pt, ",")
    geometry = F.when(
        F.col("body").isNull(), F.lit("null")
    ).when(
        F.col("as_area"),
        F.concat(
            F.lit('{"type":"Polygon","coordinates":[['),
            F.col("body"), F.lit("]]}"),
        ),
    ).otherwise(
        F.concat(
            F.lit('{"type":"LineString","coordinates":['),
            F.col("body"), F.lit("]}"),
        )
    )
    return per_way.select(
        "id",
        F.concat(
            F.lit('{"type":"Feature","id":'), F.col("id").cast("string"),
            F.lit(',"properties":'), _sorted_tag_props_json(),
            F.lit(',"geometry":'), geometry, F.lit("}"),
        ).alias("line"),
    )


def node_csv(nodes: DataFrame, keys: list[str], precision: int = 7) -> DataFrame:
    """-k key projection (P4): id,lon,lat + requested tag columns."""
    cols = [
        F.col("id"),
        coord_str("lon100nd", precision).alias("lon"),
        coord_str("lat100nd", precision).alias("lat"),
    ] + [F.col("tags").getItem(k).alias(k) for k in keys]
    return nodes.select(*cols)


_XML_ESC = ("replace(replace(replace(replace({0}, '&', '&amp;'), "
            "'<', '&lt;'), '>', '&gt;'), '\"', '&quot;')")

def _xml_tag_body() -> Column:
    """Sorted-key ``<tag k v/>`` body (deterministic spec; keys/values
    escaped; NULL tag maps render an empty body, never a NULL line).
    Built lazily — F.expr needs an active session."""
    return F.expr(
        "array_join(transform(array_sort("
        "map_entries(coalesce(tags, map()))), "
        "e -> concat('<tag k=\"', " + _XML_ESC.format("e.key")
        + ", '\" v=\"', " + _XML_ESC.format("e.value")
        + ", '\"/>')), '')"
    )


def way_xml(ways: DataFrame) -> DataFrame:
    """(id, line): OSM-XML ``<way>`` elements with the ``<nd ref>`` body
    the reference's XmlQueryPrinter emits (XmlQueryPrinter.cpp:203-215)
    — member node ids in stored order, then sorted escaped tags."""
    nd_body = F.expr(
        "array_join(transform(node_ids, "
        "n -> concat('<nd ref=\"', CAST(n AS STRING), '\"/>')), '')"
    )
    return ways.select(
        "id",
        F.concat(
            F.lit('<way id="'), F.col("id").cast("string"), F.lit('">'),
            nd_body, _xml_tag_body(), F.lit("</way>"),
        ).alias("line"),
    )


def relation_xml(relations: DataFrame) -> DataFrame:
    """(id, line): OSM-XML ``<relation>`` elements with ``<member>``
    bodies (type/ref/role, stored member order) + sorted escaped tags —
    the relation half of XmlQueryPrinter.cpp:203-215."""
    mem_body = F.expr(
        "array_join(transform(members, m -> concat("
        "'<member type=\"', element_at(array('node','way','relation'), "
        "CAST(m.t AS INT) + 1), '\" ref=\"', CAST(m.id AS STRING), "
        "'\" role=\"', " + _XML_ESC.format("coalesce(m.role, '')")
        + ", '\"/>')), '')"
    )
    return relations.select(
        "id",
        F.concat(
            F.lit('<relation id="'), F.col("id").cast("string"),
            F.lit('">'), mem_body, _xml_tag_body(), F.lit("</relation>"),
        ).alias("line"),
    )


def way_csv(
    ways: DataFrame, nodes: DataFrame, keys: list[str], precision: int = 7
) -> DataFrame:
    """Way CSV rows with a ``geom`` WKT column (the reference added
    ``geom`` to CSV output in v2.2.2, doc/releases/v2.2.2.md) plus the
    -k projected tag columns."""
    # ONE select from the joined frame, tag items pulled straight off
    # the map: -k keys named 'id'/'geom' (reachable user input) must not
    # create an ambiguous intermediate column reference
    wkt = way_wkt(ways, nodes, precision)
    return ways.join(wkt, "id").select(
        "id", F.col("wkt").alias("geom"),
        *[F.col("tags").getItem(k).alias(k) for k in keys],
    )


def node_xml(nodes: DataFrame, precision: int = 7) -> DataFrame:
    """OSM-XML-style <node> elements (S7 xml sink).  Tag keys/values are
    XML-escaped (&, <, >, \") — name="Bar & Grill" must stay parseable,
    as the reference's OSM-XML printer guarantees.  Shares
    ``_xml_tag_body`` with the way/relation printers: sorted keys (the
    documented deterministic spec) and NULL-map safety in one place."""
    tag_body = _xml_tag_body()
    return nodes.select(
        F.concat(
            F.lit('<node id="'), F.col("id").cast("string"),
            F.lit('" lon="'), coord_str("lon100nd", precision),
            F.lit('" lat="'), coord_str("lat100nd", precision),
            F.lit('">'), tag_body, F.lit("</node>"),
        ).alias("line")
    )


def node_brief(nodes: DataFrame) -> DataFrame:
    """-f brief — the reference's DEFAULT console format: a header line
    ``node/<id>`` followed by ``  <key> = <value>`` per tag, keys
    space-padded to the widest key (BriefQueryPrinter.cpp:52-75).

    Deterministic deviations from the console printer (documented spec):
    no ANSI colors, key alignment is per-feature (the reference aligns
    per 64-feature console batch — an output-order-dependent cosmetic),
    and tags print in sorted key order (the reference prints tag-table
    storage order).  One row per feature; the block is one string.
    """
    ftype = F.col("ftype") if "ftype" in nodes.columns else F.lit(0)
    nodes = nodes.withColumn(
        "tags", F.coalesce(F.col("tags"), F.expr("map()"))
    )
    return nodes.withColumn("_ft", ftype.cast("int")).select(
        F.expr(
            r"""
            concat(
              element_at(array('node','way','relation'), _ft + 1), '/', id,
              CASE WHEN size(map_entries(tags)) > 0 THEN '\n' ELSE '' END,
              array_join(
                transform(
                  array_sort(map_entries(tags)),
                  e -> concat(
                    '  ', e.key,
                    repeat(' ',
                           aggregate(map_entries(tags), 0,
                                     (a, x) -> greatest(a, length(x.key)))
                           - length(e.key)),
                    ' = ', e.value)),
                '\n'))
            """
        ).alias("block")
    )


class InvalidFormatError(ValueError):
    """Unknown -f format name (the reference exits 2 with an "invalid"
    message, src/gol/QueryCommand.cpp:103-148; test protocol
    test/test_query.py:66-69)."""


def format_result(
    nodes: DataFrame,
    fmt: str,
    keys: list[str] | None = None,
    precision: int = 7,
):
    """-f dispatch over node-shaped frames (id, lon100nd, lat100nd, tags).

    ``count`` returns an int; every other format returns a one-column
    line DataFrame.  Unknown names raise :class:`InvalidFormatError`
    before any job runs — mirroring the reference's argument validation.
    """
    fmt = fmt.lower()
    # reference alias table (QueryCommand.cpp:180-199): json→geojson,
    # jsonl/ndjson→geojsonl, table→list
    fmt = {"json": "geojson", "jsonl": "geojsonl", "ndjson": "geojsonl",
           "table": "list"}.get(fmt, fmt)
    if fmt == "count":
        return count_result(nodes)
    if fmt == "brief":
        return node_brief(nodes)
    if fmt == "list":
        if "ftype" not in nodes.columns:
            nodes = nodes.withColumn("ftype", F.lit(0))
        return id_list(nodes)
    if fmt == "geojsonl":
        return node_geojsonl(nodes, precision)
    if fmt == "geojson":
        # one FeatureCollection document (vs one Feature per line),
        # features in id order — the sort happens INSIDE the aggregate
        # (array_sort over (id, line) structs): a pre-agg orderBy would
        # not survive collect_list's partition merge
        return (
            nodes.select("id", node_geojsonl_line(precision).alias("line"))
            .agg(
                F.concat(
                    F.lit('{"type":"FeatureCollection","features":['),
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(F.struct("id", "line"))),
                            lambda s: s["line"],
                        ),
                        ",",
                    ),
                    F.lit("]}"),
                ).alias("line")
            )
        )
    if fmt == "wkt":
        return node_wkt(nodes, precision)
    if fmt == "csv":
        return node_csv(nodes, keys or [], precision)
    if fmt == "xml":
        return node_xml(nodes, precision)
    raise InvalidFormatError(
        f"invalid format: {fmt!r} (expected one of "
        f"brief, count, list, table, geojson, geojsonl, json, jsonl, "
        f"ndjson, wkt, csv, xml)"
    )


def format_way_result(
    ways: DataFrame,
    nodes: DataFrame,
    fmt: str,
    keys: list[str] | None = None,
    precision: int = 7,
):
    """-f dispatch for WAY results (id, node_ids, tags) — the way half
    of the reference's printer dispatch (QueryCommand.cpp:103-148), with
    full geometry: GeoJSON LineString/Polygon, WKT, XML ``<nd>`` bodies,
    CSV ``geom``.  ``nodes`` = projected node frame for coordinates.
    """
    fmt = {"json": "geojson", "jsonl": "geojsonl", "ndjson": "geojsonl",
           "table": "list"}.get(fmt.lower(), fmt.lower())
    if fmt == "count":
        return count_result(ways)
    if fmt == "list":
        return id_list(ways.withColumn("ftype", F.lit(1)))
    if fmt == "brief":
        return node_brief(ways.withColumn("ftype", F.lit(1)))
    if fmt == "geojsonl":
        return way_geojsonl(ways, nodes, precision).select("line")
    if fmt == "geojson":
        return (
            way_geojsonl(ways, nodes, precision)
            .agg(
                F.concat(
                    F.lit('{"type":"FeatureCollection","features":['),
                    F.array_join(
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.struct("id", "line"))
                            ),
                            lambda s: s["line"],
                        ),
                        ",",
                    ),
                    F.lit("]}"),
                ).alias("line")
            )
        )
    if fmt == "wkt":
        return way_wkt(ways, nodes, precision).select("wkt")
    if fmt == "csv":
        return way_csv(ways, nodes, keys or [], precision)
    if fmt == "xml":
        return way_xml(ways).select("line")
    raise InvalidFormatError(
        f"invalid way format: {fmt!r} (expected one of brief, count, "
        f"list, table, geojson, geojsonl, json, jsonl, ndjson, wkt, "
        f"csv, xml)"
    )


def relation_geojsonl(
    relations: DataFrame,
    ways: DataFrame,
    nodes: DataFrame,
    precision: int = 7,
) -> DataFrame:
    """(id, line): one full GeoJSON Feature per relation — MultiPolygon
    geometry stitched from closed member-way rings (geometry.py spec);
    relations with no closed member ring keep their Feature row with
    ``"geometry":null`` (every selected feature prints exactly once,
    like the reference's printer)."""
    from .geometry import relation_multipolygon_geojson

    geom = relation_multipolygon_geojson(relations, ways, nodes, precision)
    return (
        relations.select("id", "tags")
        .join(geom.withColumnRenamed("rel_id", "id"), "id", "left")
        .select(
            "id",
            F.concat(
                F.lit('{"type":"Feature","id":'), F.col("id").cast("string"),
                F.lit(',"properties":'), _sorted_tag_props_json(),
                F.lit(',"geometry":'),
                F.coalesce("geometry", F.lit("null")), F.lit("}"),
            ).alias("line"),
        )
    )


def format_relation_result(
    relations: DataFrame,
    ways: DataFrame,
    nodes: DataFrame,
    fmt: str,
    keys: list[str] | None = None,
    precision: int = 7,
):
    """-f dispatch for RELATION results (id, members, tags) — the
    relation half of the reference's printer dispatch
    (QueryCommand.cpp:103-148) with full MultiPolygon geometry:
    GeoJSON Features, WKT ``MULTIPOLYGON``, XML ``<member>`` bodies,
    CSV ``geom``.  ``ways``/``nodes`` = raw way + projected node frames
    for ring coordinates.  Relations whose members form no closed ring
    render ``"geometry":null`` / ``GEOMETRYCOLLECTION EMPTY`` rather
    than dropping (count parity across formats)."""
    from .geometry import relation_multipolygon_wkt

    fmt = {"json": "geojson", "jsonl": "geojsonl", "ndjson": "geojsonl",
           "table": "list"}.get(fmt.lower(), fmt.lower())
    if fmt == "count":
        return count_result(relations)
    if fmt == "list":
        return id_list(relations.withColumn("ftype", F.lit(2)))
    if fmt == "brief":
        return node_brief(relations.withColumn("ftype", F.lit(2)))
    if fmt == "geojsonl":
        return relation_geojsonl(relations, ways, nodes, precision).select(
            "line"
        )
    if fmt == "geojson":
        return (
            relation_geojsonl(relations, ways, nodes, precision)
            .agg(
                F.concat(
                    F.lit('{"type":"FeatureCollection","features":['),
                    F.array_join(
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.struct("id", "line"))
                            ),
                            lambda s: s["line"],
                        ),
                        ",",
                    ),
                    F.lit("]}"),
                ).alias("line")
            )
        )
    if fmt in ("wkt", "csv"):
        geom = relation_multipolygon_wkt(relations, ways, nodes, precision)
        with_geom = (
            relations.select("id", "tags")
            .join(geom.withColumnRenamed("rel_id", "id"), "id", "left")
            .withColumn(
                "geom",
                F.coalesce("wkt", F.lit("GEOMETRYCOLLECTION EMPTY")),
            )
        )
        if fmt == "wkt":
            return with_geom.select(F.col("geom").alias("wkt"))
        return with_geom.select(
            "id", "geom",
            *[F.col("tags").getItem(k).alias(k) for k in (keys or [])],
        )
    if fmt == "xml":
        return relation_xml(relations).select("line")
    raise InvalidFormatError(
        f"invalid relation format: {fmt!r} (expected one of brief, "
        f"count, list, table, geojson, geojsonl, json, jsonl, ndjson, "
        f"wkt, csv, xml)"
    )


def dump_tiles(store: DataFrame, out_dir: str) -> None:
    """Per-tile text dump — the ``gol dump-tiles`` analogue.

    The reference writes one text file per tile under a hex folder
    fan-out ``<gol>-tiles/<prefix>/<tile>.txt`` (DumpTilesCommand.cpp:
    12-40, prefix = tip >> 12 as 3 hex digits).  Spark shape:
    ``partitionBy(prefix, tile_hex)`` reproduces the two-level tree,
    ``repartition(tile_hex)`` keeps each tile's lines in one writer
    task, and ``sortWithinPartitions`` orders lines (ftype, id, ghost)
    per file without a global sort — the layout stays one-task-per-
    tile-group at any tile count (≤65 535 dirs, bounded by max_tiles).

    Line format: ``<n|w|r>/<id>`` with `` ghost`` appended for ghost
    copies.  Read back with ``read_tile_dump``.
    """
    kinds = F.element_at(
        F.array(F.lit("n"), F.lit("w"), F.lit("r")),
        (F.col("typed_id") % 4 + 1).cast("int"),
    )
    lines = (
        store.select(
            "tile_id",
            "typed_id",
            F.coalesce(F.col("is_ghost"), F.lit(False)).alias("is_ghost"),
        )
        .distinct()
        .select(
            F.format_string("%03X", F.shiftright("tile_id", 12)).alias("prefix"),
            F.format_string("%08X", F.col("tile_id")).alias("tile_hex"),
            (F.col("typed_id") % 4).alias("ftype"),
            F.shiftright("typed_id", 2).alias("fid"),
            F.format_string(
                "%s/%d%s",
                kinds,
                F.shiftright("typed_id", 2),
                F.when(F.col("is_ghost"), F.lit(" ghost")).otherwise(F.lit("")),
            ).alias("value"),
        )
        .repartition("tile_hex")
        .sortWithinPartitions("tile_hex", "ftype", "fid", "value")
        .select("prefix", "tile_hex", "value")
    )
    lines.write.mode("overwrite").partitionBy("prefix", "tile_hex").text(out_dir)


def read_tile_dump(spark, out_dir: str) -> DataFrame:
    """Read a dump_tiles tree back: (tile_id, line) — partition
    discovery recovers prefix/tile_hex from the folder names, proving
    the on-disk layout, not just the frame that produced it."""
    raw = spark.read.format("text").load(out_dir)
    return raw.select(
        F.conv("tile_hex", 16, 10).cast("int").alias("tile_id"),
        F.col("value").alias("line"),
    )
