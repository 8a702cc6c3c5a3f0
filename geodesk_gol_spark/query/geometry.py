"""Full geometry assembly for the output sinks (S7/F9 closure).

The reference's printers emit complete geometry for every feature kind:
way LineString/Polygon and relation MultiPolygon in GeoJSON
(src/gol/query/GeoJsonQueryPrinter.h:23-28, headline use case
doc/releases/v2.0.0.md "world's rivers → GeoJSON"), a ``geom`` column in
CSV since v2.2.2 (doc/releases/v2.2.2.md), and ``<nd ref>``/``<member>``
bodies in OSM-XML (src/gol/query/XmlQueryPrinter.cpp:203-215).  This
module assembles those geometries as pure DataFrame programs.

Multipolygon spec (our deterministic re-statement of the reference's
ring stitcher, which assembles outer/inner rings from member ways at
print time):

* rings = the relation's CLOSED member ways (first node repeated last,
  >= 3 distinct nodes — functions/areas.closed_ring).  Open member ways
  are skipped; the reference stitches open segments into rings, which
  this engine does not model (same caveat as
  spatial.relation_contains_join).
* nesting by CONTAINMENT, not by role text (the reference likewise
  repairs inconsistent roles): ring A is inside ring B iff A's first
  vertex ray-casts odd against B's edges (exact int64 arithmetic,
  spatial.edge_crossing_expr).  depth(A) = number of sibling rings
  containing A.  Even depth ⇒ shell, odd ⇒ hole.
* each hole attaches to its IMMEDIATE parent shell: the containing
  shell of maximum depth, ties broken by smallest way id; a hole no
  shell contains (possible only for degenerate crossing rings) is
  dropped.  All choices are deterministic functions of the exact
  integer containment relation, so the DuckDB oracle reproduces them
  bit-for-bit.
* output ordering: polygons by shell way id; holes inside a polygon by
  way id; ring vertices in stored member order (no winding
  normalization — a documented deviation from RFC 7946's
  SHOULD-orientation).

Scale shape: everything is keyed by rel_id — the pairwise ring-nesting
join is quadratic only in rings-per-relation (bounded, small) and
linear across relations; no cross-relation pairs ever form.  Ring text
is built with collect_list + array_sort inside one aggregation per
ring, so the assembly is 3 keyed shuffles regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.areas import closed_ring
from .formats import coord_str
from .spatial import edge_crossing_expr


def relation_ring_vertices(
    area_rels: DataFrame, ways: DataFrame, nodes_projected: DataFrame
) -> DataFrame:
    """(rel_id, way_id, seq, x, y, lon100nd, lat100nd) for every vertex
    of every closed member ring of the given relations.

    ``nodes_projected`` must carry id, x, y, lon100nd, lat100nd (the
    with_projection frame).  A way shared by several relations fans out
    per relation — the downstream math is per-(rel_id, way_id).
    """
    mem = (
        area_rels.select(
            F.col("id").alias("rel_id"), F.explode("members").alias("m")
        )
        .filter(F.col("m.t") == 1)
        .select("rel_id", F.col("m.id").alias("way_id"))
        .dropDuplicates(["rel_id", "way_id"])
    )
    rings = mem.join(
        ways.select(F.col("id").alias("way_id"), "node_ids"), "way_id"
    ).filter(closed_ring("node_ids"))
    return (
        rings.select(
            "rel_id", "way_id",
            F.posexplode("node_ids").alias("seq", "node_id"),
        )
        .join(
            nodes_projected.select(
                F.col("id").alias("node_id"),
                "x", "y", "lon100nd", "lat100nd",
            ),
            "node_id",
        )
        .select("rel_id", "way_id", "seq", "x", "y", "lon100nd", "lat100nd")
    )


def ring_nesting(vx: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Containment relation + depth over a ring-vertex frame.

    Returns (contains, depth): ``contains`` = (rel_id, inner_way,
    outer_way) pairs where inner's first vertex lies inside outer
    (exact int64 even-odd parity); ``depth`` = (rel_id, way_id, d) for
    EVERY ring (d = number of containing sibling rings, 0 if none).
    """
    w = Window.partitionBy("rel_id", "way_id").orderBy("seq")
    edges = (
        vx.select(
            "rel_id",
            F.col("way_id").alias("outer_way"),
            F.col("x").alias("x0"), F.col("y").alias("y0"),
            F.lead("x").over(w).alias("x1"),
            F.lead("y").over(w).alias("y1"),
        )
        .filter(F.col("x1").isNotNull())
    )
    reps = vx.filter(F.col("seq") == 0).select(
        "rel_id",
        F.col("way_id").alias("inner_way"),
        F.col("x").alias("px"), F.col("y").alias("py"),
    )
    contains = (
        reps.join(edges, "rel_id")
        .filter(F.col("outer_way") != F.col("inner_way"))
        .withColumn("c", edge_crossing_expr().cast("long"))
        .groupBy("rel_id", "inner_way", "outer_way")
        .agg((F.sum("c") % 2 == 1).alias("inside"))
        .filter("inside")
        .select("rel_id", "inner_way", "outer_way")
    )
    all_rings = vx.select("rel_id", "way_id").dropDuplicates()
    depth = (
        all_rings.join(
            contains.groupBy(
                "rel_id", F.col("inner_way").alias("way_id")
            ).agg(F.count(F.lit(1)).alias("d")),
            ["rel_id", "way_id"],
            "left",
        )
        .select("rel_id", "way_id", F.coalesce("d", F.lit(0)).alias("d"))
    )
    return contains, depth


# text-style table: how one vertex, one ring, one polygon and the
# geometry head/tail render in each output dialect.  The assembly
# (nesting, hole attachment, ordering) is identical — only these
# delimiters differ between GeoJSON and WKT.
_STYLES = {
    "geojson": dict(
        pt=("[", ",", "]"), pt_sep=",", ring=("[", "]"), ring_sep=",",
        poly=("[", "]"), poly_sep=",",
        top=('{"type":"MultiPolygon","coordinates":[', "]}"),
    ),
    "wkt": dict(
        pt=("", " ", ""), pt_sep=", ", ring=("(", ")"), ring_sep=", ",
        poly=("(", ")"), poly_sep=", ",
        top=("MULTIPOLYGON (", ")"),
    ),
}


def _ring_text(vx: DataFrame, precision: int, style: str) -> DataFrame:
    """(rel_id, way_id, ring) — one ring text per member ring in the
    requested dialect (GeoJSON ``[[lon,lat],...]`` / WKT
    ``(lon lat, ...)``) with exact integer coordinate rendering.
    collect_list order is shuffle-dependent; array_sort on (seq, pt)
    restores vertex order (same shape as formats.way_wkt)."""
    s = _STYLES[style]
    po, psep, pc = s["pt"]
    pt = F.concat(
        F.lit(po), coord_str("lon100nd", precision), F.lit(psep),
        coord_str("lat100nd", precision), F.lit(pc),
    )
    return (
        vx.select("rel_id", "way_id", "seq", pt.alias("pt"))
        .groupBy("rel_id", "way_id")
        .agg(F.array_sort(F.collect_list(F.struct("seq", "pt"))).alias("pts"))
        .select(
            "rel_id", "way_id",
            F.concat(
                F.lit(s["ring"][0]),
                F.array_join(F.expr("transform(pts, p -> p.pt)"),
                             s["pt_sep"]),
                F.lit(s["ring"][1]),
            ).alias("ring"),
        )
    )


def relation_multipolygon_geojson(
    area_rels: DataFrame,
    ways: DataFrame,
    nodes_projected: DataFrame,
    precision: int = 7,
) -> DataFrame:
    """(rel_id, geometry): the GeoJSON MultiPolygon geometry object per
    relation, assembled per the module-docstring spec.  Relations with
    zero closed member rings produce no row."""
    return _multipolygon(
        area_rels, ways, nodes_projected, precision, "geojson", "geometry"
    )


def relation_multipolygon_wkt(
    area_rels: DataFrame,
    ways: DataFrame,
    nodes_projected: DataFrame,
    precision: int = 7,
) -> DataFrame:
    """(rel_id, wkt): ``MULTIPOLYGON ((...))`` text per relation — the
    same ring assembly as the GeoJSON form in WKT delimiters (feeds the
    relation CSV ``geom`` column and the -f wkt printer)."""
    return _multipolygon(
        area_rels, ways, nodes_projected, precision, "wkt", "wkt"
    )


def _multipolygon(
    area_rels: DataFrame,
    ways: DataFrame,
    nodes_projected: DataFrame,
    precision: int,
    style: str,
    out_col: str,
) -> DataFrame:
    s = _STYLES[style]
    # vx roots the heaviest subtree (member explode ⋈ ways ⋈ node
    # coords) and feeds four consumers (edges, reps, all_rings, ring
    # text); depth feeds three.  Persist both so one action computes
    # the member joins once, not once per consumer branch.
    vx = relation_ring_vertices(area_rels, ways, nodes_projected).persist()
    contains, depth = ring_nesting(vx)
    depth = depth.persist()
    rtext = _ring_text(vx, precision, style)

    shells = depth.filter(F.col("d") % 2 == 0).select(
        "rel_id", F.col("way_id").alias("shell_way")
    )
    holes = depth.filter(F.col("d") % 2 == 1).select(
        "rel_id", F.col("way_id").alias("hole_way")
    )
    # hole → immediate parent shell: containing shell of max depth,
    # min way id on ties; holes nothing contains as a shell are dropped
    cand = (
        holes.join(
            contains.select(
                "rel_id",
                F.col("inner_way").alias("hole_way"),
                F.col("outer_way").alias("shell_way"),
            ),
            ["rel_id", "hole_way"],
        )
        .join(
            depth.select(
                "rel_id", F.col("way_id").alias("shell_way"),
                F.col("d").alias("shell_d"),
            ),
            ["rel_id", "shell_way"],
        )
        .filter(F.col("shell_d") % 2 == 0)
    )
    pick = Window.partitionBy("rel_id", "hole_way").orderBy(
        F.col("shell_d").desc(), F.col("shell_way").asc()
    )
    hole_parent = (
        cand.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select("rel_id", "hole_way", "shell_way")
    )

    hole_rings = (
        hole_parent.join(
            rtext.select(
                "rel_id", F.col("way_id").alias("hole_way"), "ring"
            ),
            ["rel_id", "hole_way"],
        )
        .groupBy("rel_id", "shell_way")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("hole_way", "ring"))
            ).alias("hs")
        )
        .select(
            "rel_id", "shell_way",
            F.concat(
                F.lit(s["ring_sep"]),
                F.array_join(F.expr("transform(hs, h -> h.ring)"),
                             s["ring_sep"]),
            ).alias("hole_txt"),
        )
    )
    polys = (
        shells.join(
            rtext.select(
                "rel_id", F.col("way_id").alias("shell_way"),
                F.col("ring").alias("shell_ring"),
            ),
            ["rel_id", "shell_way"],
        )
        .join(hole_rings, ["rel_id", "shell_way"], "left")
        .select(
            "rel_id", "shell_way",
            F.concat(
                F.lit(s["poly"][0]), F.col("shell_ring"),
                F.coalesce("hole_txt", F.lit("")), F.lit(s["poly"][1]),
            ).alias("poly"),
        )
    )
    return (
        polys.groupBy("rel_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("shell_way", "poly"))).alias("ps")
        )
        .select(
            "rel_id",
            F.concat(
                F.lit(s["top"][0]),
                F.array_join(F.expr("transform(ps, p -> p.poly)"),
                             s["poly_sep"]),
                F.lit(s["top"][1]),
            ).alias(out_col),
        )
    )
