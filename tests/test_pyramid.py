"""Tile-pyramid engine vs the independent DuckDB CTE oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geodesk_gol_spark import sqlgen
from geodesk_gol_spark.config import BuildSettings, tile_id
from geodesk_gol_spark.functions.mercator import with_projection
from geodesk_gol_spark.plans.pyramid import build_tile_catalog

from .conftest import assert_frames_equal

DENSITY = 50


@pytest.fixture(scope="module")
def nodes(spark):
    df = with_projection(
        spark.sql(
            "SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem"
        ).selectExpr(
            f"{sqlgen.NODE_ID} AS id",
            f"{sqlgen.LON100ND} AS lon100nd",
            f"{sqlgen.LAT100ND} AS lat100nd",
        )
    ).persist()
    df.count()
    return df


@pytest.fixture(scope="module")
def catalog(nodes):
    return build_tile_catalog(nodes, BuildSettings.for_fixture(DENSITY))


def test_catalog_matches_sql_oracle(catalog, duck):
    got = catalog.tiles[["zoom", "col", "row", "node_count"]]
    want = duck.execute(
        f"WITH nodes AS ({sqlgen.nodes_select()}),\n"
        f"{sqlgen.pyramid_ctes('nodes', DENSITY)}\n"
        "SELECT 12 AS zoom, c AS col, r AS row, cnt AS node_count FROM s12 "
        "UNION ALL SELECT 9, c, r, cnt FROM s9 "
        "UNION ALL SELECT 6, c, r, cnt FROM s6 "
        "UNION ALL SELECT 3, c, r, cnt FROM s3 "
        "UNION ALL SELECT 0, c, r, cnt FROM s0"
    )
    assert_frames_equal(got, want, ["zoom", "col", "row"])


def test_cell_assignment_matches_sql_oracle(catalog, nodes, duck):
    got = (
        catalog.assign(nodes)
        .groupBy(
            F.col("cell_col").alias("c"), F.col("cell_row").alias("r"), "tile_id"
        )
        .count()
        .drop("count")
    )
    want = duck.execute(
        f"WITH nodes AS ({sqlgen.nodes_select()}),\n"
        f"{sqlgen.pyramid_ctes('nodes', DENSITY)},\n"
        f"{sqlgen.cell_tile_cte()}\n"
        "SELECT c, r, tile_id FROM cell_tile"
    )
    assert_frames_equal(got, want, ["c", "r"])


def test_node_counts_conserved(catalog, nodes):
    assert catalog.tiles.node_count.sum() == nodes.count()


def test_parent_links(catalog):
    t = catalog.tiles.set_index("tile_id")
    for tid, row in t.iterrows():
        if tid == 0:
            continue
        assert row.parent_tile_id in t.index
        assert t.loc[row.parent_tile_id].zoom < row.zoom


def test_max_tiles_cap(nodes):
    full = build_tile_catalog(nodes, BuildSettings.for_fixture(DENSITY))
    n_full = len(full.tiles)
    capped = build_tile_catalog(
        nodes, BuildSettings.for_fixture(DENSITY, max_tiles=n_full - 3)
    )
    assert len(capped.tiles) == n_full - 3
    # conservation still holds after dissolving dropped tiles upward
    assert capped.tiles.node_count.sum() == full.tiles.node_count.sum()
    # the dropped tiles are the least dense ones
    dropped = set(full.tiles.tile_id) - set(capped.tiles.tile_id)
    kept_nonroot = capped.tiles[capped.tiles.tile_id != 0]
    max_dropped = full.tiles[full.tiles.tile_id.isin(dropped)].node_count.max()
    # every kept non-root tile is at least as dense as the densest dropped
    # (ties broken by tile_id, so >= is the right check)
    assert (kept_nonroot.node_count >= max_dropped).all()
