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
