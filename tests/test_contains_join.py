"""J11 containment join: exact even-odd semantics on adversarial geometry.

Gate row j11_contains_join covers corpus-scale parity with DuckDB; these
tests pin the geometric semantics on a hand-built concave ring where the
expected answer is checkable by eye, plus the duplicate-home dedup path
(a way homed at both a tile and its ancestor must not double-count
crossings and flip the parity).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from geodesk_gol_spark.config import CELL_SHIFT
from geodesk_gol_spark.query.spatial import contains_join, way_edges_int

O = 600_000_000  # place the fixture away from world edges

# U-shaped (concave) closed ring: the notch 40<x<60, y>40 is OUTSIDE
RING = [(0, 0), (100, 0), (100, 100), (60, 100), (60, 40),
        (40, 40), (40, 100), (0, 100), (0, 0)]


def _fixture(spark):
    ring_ids = list(range(1, len(RING)))  # last vertex repeats node 1
    node_ids = ring_ids + [ring_ids[0]]
    verts = [(i + 1, O + x, O + y) for i, (x, y) in enumerate(RING[:-1])]
    test_pts = [
        (101, O + 20, O + 50),   # inside the left arm
        (102, O + 50, O + 70),   # in the notch -> outside
        (103, O + 50, O + 20),   # below the notch -> inside
        (104, O + 200, O + 50),  # outside the bbox entirely
    ]
    pts = spark.createDataFrame(
        pd.DataFrame(verts + test_pts, columns=["id", "x", "y"])
    ).withColumn("cell_col", (F.col("x") / (1 << CELL_SHIFT)).cast("int")) \
     .withColumn("cell_row", (F.col("y") / (1 << CELL_SHIFT)).cast("int"))
    ways = spark.createDataFrame(
        [(7, node_ids)], "id long, node_ids array<long>"
    )
    cell = (O + 50) >> CELL_SHIFT
    z3_tile = (3 << 24) | ((cell >> 9) << 12) | (cell >> 9)
    homes = spark.createDataFrame(
        # homed at the z3 tile AND the root ancestor: every point's
        # ladder matches BOTH rows -> exercises candidate dedup
        [(7 * 4 + 1, z3_tile), (7 * 4 + 1, 0)],
        "typed_id long, tile_id int",
    )
    extents = spark.createDataFrame(
        [(7 * 4 + 1, O, O, O + 100, O + 100)],
        "typed_id long, minx long, miny long, maxx long, maxy long",
    )
    return pts, ways, homes, extents


def test_concave_ring_even_odd(spark):
    pts, ways, homes, extents = _fixture(spark)
    got = sorted(
        (r["node_id"], r["way_id"])
        for r in contains_join(pts, ways, homes, extents).collect()
        if r["node_id"] > 100  # ring's own vertices: parity is
        # deterministic but not asserted here (gate row covers parity
        # against the oracle at corpus scale)
    )
    assert got == [(101, 7), (103, 7)]


def test_way_edges_closing_edge_included(spark):
    pts, ways, _, _ = _fixture(spark)
    edges = way_edges_int(ways, pts).collect()
    assert len(edges) == len(RING) - 1  # 8 edges incl. the closing one
    # every edge's endpoints are consecutive ring vertices
    es = {(r["x0"] - O, r["y0"] - O, r["x1"] - O, r["y1"] - O)
          for r in edges}
    assert es == {(*a, *b) for a, b in zip(RING, RING[1:])}


def test_relation_hole_even_odd(spark):
    """J12: a point inside a multipolygon's inner ring (the hole)
    crosses both rings — even parity, outside; between the rings — odd,
    inside.  No role-based special casing needed."""
    from geodesk_gol_spark.query.spatial import relation_contains_join

    outer = [(0, 0), (100, 0), (100, 100), (0, 100), (0, 0)]
    hole = [(30, 30), (70, 30), (70, 70), (30, 70), (30, 30)]

    def ring_rows(base, ring):
        return [(base + i, O + x, O + y)
                for i, (x, y) in enumerate(ring[:-1])]

    verts = ring_rows(1, outer) + ring_rows(11, hole)
    test_pts = [
        (101, O + 10, O + 50),  # between rings -> inside
        (102, O + 50, O + 50),  # in the hole -> outside
    ]
    pts = spark.createDataFrame(
        pd.DataFrame(verts + test_pts, columns=["id", "x", "y"])
    ).withColumn("cell_col", (F.col("x") / (1 << CELL_SHIFT)).cast("int")) \
     .withColumn("cell_row", (F.col("y") / (1 << CELL_SHIFT)).cast("int"))
    ways = spark.createDataFrame(
        [(21, [1, 2, 3, 4, 1]), (22, [11, 12, 13, 14, 11])],
        "id long, node_ids array<long>",
    )
    rels = spark.createDataFrame(
        [(5, [(1, 21, "outer"), (1, 22, "inner")])],
        "id long, members array<struct<t:tinyint,id:bigint,role:string>>",
    )
    cell = (O + 50) >> CELL_SHIFT
    z3_tile = (3 << 24) | ((cell >> 9) << 12) | (cell >> 9)
    homes = spark.createDataFrame(
        [(5 * 4 + 2, z3_tile)], "typed_id long, tile_id int"
    )
    extents = spark.createDataFrame(
        [(5 * 4 + 2, O, O, O + 100, O + 100)],
        "typed_id long, minx long, miny long, maxx long, maxy long",
    )
    got = sorted(
        (r["node_id"], r["rel_id"])
        for r in relation_contains_join(pts, rels, ways, homes,
                                        extents).collect()
        if r["node_id"] > 100
    )
    assert got == [(101, 5)]


def test_dwithin_three_distance_cases(spark):
    """J13 exact point-to-segment distance: before-A (endpoint), past-B
    (endpoint), interior projection, and a just-outside control —
    boundary-exact (d == r counts as within)."""
    from geodesk_gol_spark.query.spatial import dwithin_join

    r = 100
    # one horizontal segment from (0,0) to (1000,0)
    verts = [(1, O + 0, O + 0), (2, O + 1000, O + 0)]
    test_pts = [
        (101, O - 60, O + 80),     # before A: dist = 100 exactly -> in
        (102, O + 1060, O + 80),   # past B: dist = 100 exactly -> in
        (103, O + 500, O + 100),   # interior: dist = 100 exactly -> in
        (104, O + 500, O + 101),   # interior: dist = 101 -> out
        (105, O - 61, O + 80),     # before A: dist > 100 -> out
    ]
    pts = spark.createDataFrame(
        pd.DataFrame(verts + test_pts, columns=["id", "x", "y"])
    )
    ways = spark.createDataFrame([(7, [1, 2])],
                                 "id long, node_ids array<long>")
    cell = O >> CELL_SHIFT
    z3_tile = (3 << 24) | ((cell >> 9) << 12) | (cell >> 9)
    homes = spark.createDataFrame([(7 * 4 + 1, z3_tile)],
                                  "typed_id long, tile_id int")
    extents = spark.createDataFrame(
        [(7 * 4 + 1, O, O, O + 1000, O)],
        "typed_id long, minx long, miny long, maxx long, maxy long",
    )
    got = sorted(
        r_["node_id"]
        for r_ in dwithin_join(pts, ways, homes, extents, r).collect()
        if r_["node_id"] > 100
    )
    assert got == [101, 102, 103]


def test_dwithin_cross_tile_coverage(spark):
    """A point whose OWN tile ancestry misses the way's home tile (it
    sits in the neighboring leaf tile) must still pair up when within r
    — the disk-corner ladder closes the coverage hole a plain ladder
    join would have."""
    from geodesk_gol_spark.query.spatial import dwithin_join

    leaf = 1 << CELL_SHIFT  # leaf-tile span in world units
    # segment hugging the right edge of leaf tile K
    bx = ((O >> CELL_SHIFT) + 1 << CELL_SHIFT)  # boundary x of next tile
    verts = [(1, bx - 10, O), (2, bx - 10, O + 1000)]
    # point just across the boundary, 20 units from the segment
    test_pts = [(101, bx + 10, O + 500)]
    pts = spark.createDataFrame(
        pd.DataFrame(verts + test_pts, columns=["id", "x", "y"])
    )
    ways = spark.createDataFrame([(7, [1, 2])],
                                 "id long, node_ids array<long>")
    cc, cr = (bx - 10) >> CELL_SHIFT, O >> CELL_SHIFT
    z12_home = (12 << 24) | (cr << 12) | cc  # way homed at ITS leaf tile
    homes = spark.createDataFrame([(7 * 4 + 1, z12_home)],
                                  "typed_id long, tile_id int")
    extents = spark.createDataFrame(
        [(7 * 4 + 1, bx - 10, O, bx - 10, O + 1000)],
        "typed_id long, minx long, miny long, maxx long, maxy long",
    )
    assert leaf > 100  # fixture sanity
    got = [r_["node_id"]
           for r_ in dwithin_join(pts, ways, homes, extents, 100).collect()
           if r_["node_id"] > 100]
    assert got == [101]


def test_dwithin_large_radius_middle_tile(spark):
    """Regression (r04): for r in (2^18, 2^19) the disk bbox spans
    THREE zoom-12 columns; 4-corner enumeration missed the middle
    column — including the point's own leaf tile — so a way homed
    there was silently dropped.  The 3x3 grid must find it."""
    from geodesk_gol_spark.query.spatial import dwithin_join

    leaf = 1 << CELL_SHIFT  # 2^19
    r = (1 << 18) + 50_000  # in (2^18, 2^19): bbox width > leaf span
    # point at the CENTER of its leaf tile, so x±r land in the two
    # neighbor columns and the middle column holds only the point
    col = O >> CELL_SHIFT
    px = (col << CELL_SHIFT) + leaf // 2
    py = O
    # short vertical segment 10 units right of the point — same tile
    verts = [(1, px + 10, py), (2, px + 10, py + 100)]
    pts = spark.createDataFrame(
        pd.DataFrame(verts + [(101, px, py)], columns=["id", "x", "y"])
    )
    ways = spark.createDataFrame([(7, [1, 2])],
                                 "id long, node_ids array<long>")
    cc, cr = (px + 10) >> CELL_SHIFT, py >> CELL_SHIFT
    home = (12 << 24) | (cr << 12) | cc
    homes = spark.createDataFrame([(7 * 4 + 1, home)],
                                  "typed_id long, tile_id int")
    extents = spark.createDataFrame(
        [(7 * 4 + 1, px + 10, py, px + 10, py + 100)],
        "typed_id long, minx long, miny long, maxx long, maxy long",
    )
    assert ((px - r) >> CELL_SHIFT) == col - 1  # bbox truly spans 3 cols
    assert ((px + r) >> CELL_SHIFT) == col + 1
    got = [row["node_id"]
           for row in dwithin_join(pts, ways, homes, extents, r).collect()
           if row["node_id"] > 100]
    assert got == [101]


def test_way_within_join_semantics(spark):
    """J14 on hand geometry against the U-ring: a small square in the
    left arm -> within; one straddling the ring edge -> crossing, not
    within; one inside the notch (bbox-contained but outside the ring)
    -> no vertex inside, not within."""
    from geodesk_gol_spark.query.spatial import way_within_join

    ring_verts = [(i + 1, O + x, O + y)
                  for i, (x, y) in enumerate(RING[:-1])]

    def square(base, x, y, s=6):
        pts = [(base, x, y), (base + 1, x + s, y),
               (base + 2, x + s, y + s), (base + 3, x, y + s)]
        return pts, [base, base + 1, base + 2, base + 3, base]

    in_pts, in_ids = square(101, O + 10, O + 50)       # inside left arm
    cr_pts, cr_ids = square(111, O - 3, O + 50)        # straddles edge
    no_pts, no_ids = square(121, O + 47, O + 60)       # in the notch
    # bbox-contained but proper-crosses the notch wall (x=40..46 at y 60)
    nc_pts, nc_ids = square(131, O + 37, O + 60)
    verts = ring_verts + in_pts + cr_pts + no_pts + nc_pts
    pts = spark.createDataFrame(
        pd.DataFrame(verts, columns=["id", "x", "y"])
    )
    ring_ids = [v[0] for v in ring_verts] + [ring_verts[0][0]]
    ways = spark.createDataFrame(
        [(7, ring_ids), (31, in_ids), (32, cr_ids), (33, no_ids),
         (34, nc_ids)],
        "id long, node_ids array<long>",
    )
    cell = (O + 50) >> CELL_SHIFT
    z3 = (3 << 24) | ((cell >> 9) << 12) | (cell >> 9)
    homes = spark.createDataFrame(
        [(w * 4 + 1, z3) for w in (7, 31, 32, 33, 34)],
        "typed_id long, tile_id int",
    )

    def ext(w, pts_):
        xs = [p[1] for p in pts_]
        ys = [p[2] for p in pts_]
        return (w * 4 + 1, min(xs), min(ys), max(xs), max(ys))

    extents = spark.createDataFrame(
        [ext(7, ring_verts), ext(31, in_pts), ext(32, cr_pts),
         ext(33, no_pts), ext(34, nc_pts)],
        "typed_id long, minx long, miny long, maxx long, maxy long",
    )
    inner = ways.filter(F.col("id") != 7)
    area = ways.filter(F.col("id") == 7)
    got = sorted(
        (r["way_id"], r["area_id"])
        for r in way_within_join(inner, area, homes, extents,
                                 pts).collect()
    )
    assert got == [(31, 7)]

    # Regression: relation typed_id 4k+2 collides with way 4k+1 after
    # the >>2 collapse.  A relation extent row sharing way 31's id must
    # NOT duplicate its candidate bbox row (a duplicate doubles every
    # parity sum — always even — silently dropping the within pair).
    extents_coll = extents.unionByName(
        spark.createDataFrame(
            [(31 * 4 + 2, O + 10, O + 50, O + 16, O + 56)],
            "typed_id long, minx long, miny long, maxx long, maxy long",
        )
    )
    got2 = sorted(
        (r["way_id"], r["area_id"])
        for r in way_within_join(inner, area, homes, extents_coll,
                                 pts).collect()
    )
    assert got2 == [(31, 7)]


def test_way_measures_known_values(spark):
    """F12 on hand-checkable geometry: a 100×100 square ring (2A=20000,
    perimeter 400) and an open 3-4-5 way (len 5+5=10 via exact
    hypotenuses, NULL area)."""
    from geodesk_gol_spark.functions.measure import way_measures

    verts = [(1, O, O), (2, O + 100, O), (3, O + 100, O + 100),
             (4, O, O + 100),
             (11, O, O), (12, O + 3, O + 4), (13, O + 6, O)]
    pts = spark.createDataFrame(
        pd.DataFrame(verts, columns=["id", "x", "y"])
    )
    ways = spark.createDataFrame(
        [(21, [1, 2, 3, 4, 1]), (22, [11, 12, 13])],
        "id long, node_ids array<long>",
    )
    rows = {r["way_id"]: r for r in way_measures(ways, pts).collect()}
    assert rows[21]["closed"] and rows[21]["area2"] == 20_000
    assert rows[21]["len_floor"] == 400
    assert not rows[22]["closed"] and rows[22]["area2"] is None
    assert rows[22]["len_floor"] == 10


def test_vertex_point_is_deterministic(spark):
    """A query point that IS a ring vertex must produce the same verdict
    on every run (exact integer arithmetic -> no tie-break wobble)."""
    pts, ways, homes, extents = _fixture(spark)
    runs = {
        tuple(sorted(r["node_id"] for r in
                     contains_join(pts, ways, homes, extents).collect()))
        for _ in range(2)
    }
    assert len(runs) == 1
