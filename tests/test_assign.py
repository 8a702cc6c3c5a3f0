"""Feature→tile assignment (J1-J6) vs the DuckDB oracle at sf0.001."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geodesk_gol_spark import sqlgen
from geodesk_gol_spark.config import BuildSettings
from geodesk_gol_spark.operators.assign import assign_features
from geodesk_gol_spark.plans.pyramid import build_tile_catalog
from geodesk_gol_spark.sources.parser import parse_features
from geodesk_gol_spark.sources.synth import synth_docs

from .conftest import SF_DIR, assert_frames_equal

DENSITY = 50


@pytest.fixture(scope="module")
def assigned(spark):
    from geodesk_gol_spark.functions.mercator import with_projection

    docs = synth_docs(spark, SF_DIR).persist()
    feats = {k: v.persist() for k, v in parse_features(docs).items()}
    proj = with_projection(feats["nodes"])
    catalog = build_tile_catalog(proj, BuildSettings.for_fixture(DENSITY))
    return assign_features(feats, catalog), catalog


def _pyr_prefix():
    return (
        f"WITH nodes AS ({sqlgen.nodes_select()}),\n"
        f"{sqlgen.pyramid_ctes('nodes', DENSITY)},\n"
    )


def test_node_tiles_match_oracle(assigned, duck):
    res, _ = assigned
    got = res["node_tiles"].select("typed_id", "tile_id")
    sql = (
        _pyr_prefix()
        + f"{sqlgen.cell_tile_cte()}\n"
        + "SELECT n.id * 4 AS typed_id, ct.tile_id AS tile_id FROM nodes n "
        "JOIN cell_tile ct ON ct.c = n.cell_col AND ct.r = n.cell_row"
    )
    assert_frames_equal(got, duck.execute(sql), ["typed_id"])


def test_way_homes_match_oracle(assigned, duck):
    res, _ = assigned
    got = res["way_homes"].select(
        "typed_id", "tile_id", "twin"
    )
    sql = (
        _pyr_prefix()
        + f"{sqlgen.way_extent_cte()},\n"
        + f"{sqlgen.home_tiles_ctes('wext', 'w')}\n"
        + "SELECT id * 4 + 1 AS typed_id, tile_id, twin FROM w_homes"
    )
    assert_frames_equal(got, duck.execute(sql), ["typed_id", "tile_id"])


def test_way_ghosts_match_oracle(assigned, duck):
    res, _ = assigned
    got = res["way_ghosts"].select("typed_id", "tile_id")
    sql = (
        _pyr_prefix()
        + f"{sqlgen.cell_tile_cte()},\n"
        + f"{sqlgen.way_extent_cte()},\n"
        + f"{sqlgen.home_tiles_ctes('wext', 'w')}\n"
        + """SELECT DISTINCT wm.way_id * 4 + 1 AS typed_id, ct.tile_id AS tile_id
FROM ("""
        + sqlgen.way_members_select()
        + """) wm
JOIN nodes n ON n.id = wm.node_id
JOIN cell_tile ct ON ct.c = n.cell_col AND ct.r = n.cell_row
WHERE NOT EXISTS (
  SELECT 1 FROM w_homes h
  WHERE h.id = wm.way_id AND h.tile_id = ct.tile_id
)"""
    )
    assert_frames_equal(got, duck.execute(sql), ["typed_id", "tile_id"])


def test_relation_homes_match_oracle(assigned, duck):
    res, _ = assigned
    got = res["rel_homes"].select("typed_id", "tile_id", "twin", "level")
    sql = (
        _pyr_prefix()
        + f"{sqlgen.way_extent_cte()},\n"
        + f"{sqlgen.relation_extent_ctes()},\n"
        + f"{sqlgen.home_tiles_ctes('rext', 'r')}\n"
        + "SELECT m.id * 4 + 2 AS typed_id, m.tile_id, m.twin, e.level "
        "FROM r_homes m JOIN rext e ON e.id = m.id"
    )
    assert_frames_equal(got, duck.execute(sql), ["typed_id", "tile_id"])


def test_relation_levels(assigned):
    res, _ = assigned
    lv = {
        r["l"]: r["n"]
        for r in res["rel_homes"]
        .groupBy(F.col("level").alias("l"))
        .agg(F.count_distinct("typed_id").alias("n"))
        .collect()
    }
    # customers=level0, nations=level1, regions=level2
    assert lv.get(1) == 25 and lv.get(2) == 5 and lv.get(0, 0) > 100


def test_no_unresolved_relations(assigned):
    res, _ = assigned
    assert res["unresolved_relations"].count() == 0


def test_twin_pairs_are_adjacent(assigned):
    """Pair homes must be E/W or N/S neighbors at the same zoom."""
    res, _ = assigned
    import pandas as pd

    homes = res["way_homes"].toPandas()
    pairs = homes[homes.duplicated("typed_id", keep=False)]
    from geodesk_gol_spark.config import tile_col, tile_row, tile_zoom

    for tid, grp in pairs.groupby("typed_id"):
        ts = sorted(grp.tile_id)
        assert len(ts) == 2
        z = [tile_zoom(t) for t in ts]
        if z[0] == z[1]:
            dc = abs(tile_col(ts[0]) - tile_col(ts[1]))
            dr = abs(tile_row(ts[0]) - tile_row(ts[1]))
            assert dc + dr == 1, (tid, ts)


def test_native_zstar_matches_sqlgen_text(spark, assigned):
    """J3 de-share pin: the engine's native bit-shift zstar/at-zstar/
    corner Columns (operators/assign._zstar_col etc.) equal the sqlgen
    SQL-text formulation (float floor-division) the DuckDB oracle
    composes — evaluated side-by-side over the REAL way+relation extent
    frame, plus adversarial synthetic extents at every span class."""
    from geodesk_gol_spark.operators.assign import (
        _at_zstar_col, _corner_cell_col, _zstar_col)

    res, _ = assigned
    ext = res["extents"].select("typed_id", "minc", "minr", "maxc", "maxr")
    # adversarial extents: single-cell, sibling pairs each axis, diagonal
    # (climbs), full-world, and cross-boundary spans at each zoom step
    extra = spark.createDataFrame(
        [(-1 - i, a, b, c, d) for i, (a, b, c, d) in enumerate([
            (0, 0, 0, 0), (4095, 4095, 4095, 4095),
            (0, 0, 1, 0), (0, 0, 0, 1), (0, 0, 1, 1),
            (7, 9, 8, 9), (7, 9, 7, 10), (7, 9, 8, 10),
            (0, 0, 4095, 4095), (2047, 0, 2048, 0), (0, 2047, 0, 2048),
            (511, 511, 512, 512), (63, 0, 64, 0), (4094, 4094, 4095, 4095),
        ])],
        "typed_id long, minc int, minr int, maxc int, maxr int",
    )
    both = (
        ext.unionByName(extra)
        .withColumn("z_nat", _zstar_col())
        .withColumn("z_sql", F.expr(sqlgen.zstar_expr()))
    )
    assert both.filter("z_nat <> z_sql").count() == 0
    withz = both.withColumn("zstar", F.col("z_nat"))
    pairs = [
        (_at_zstar_col("minc"), sqlgen.at_zstar_expr("minc")),
        (_at_zstar_col("maxr"), sqlgen.at_zstar_expr("maxr")),
    ]
    for nat, sql in pairs:
        assert withz.filter(nat != F.expr(sql)).count() == 0
    withc = withz.withColumn("c0", _at_zstar_col("minc"))
    assert withc.filter(
        _corner_cell_col("c0") != F.expr(sqlgen.corner_cell_expr("c0"))
    ).count() == 0
