"""Engine vs the independent pure-Python slow-path oracle (FIXTURES §3).

Three-way agreement: the Spark engine already matches the DuckDB SQL
oracle; this closes the triangle with a loop-and-dict implementation.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from geodesk_gol_spark import sqlgen
from geodesk_gol_spark.config import BuildSettings
from geodesk_gol_spark.functions.mercator import with_projection
from geodesk_gol_spark.oracle import slowpath as S
from geodesk_gol_spark.plans.pyramid import build_tile_catalog

DENSITY = 50


@pytest.fixture(scope="module")
def node_rows(spark):
    df = with_projection(
        spark.sql("SELECT * FROM lineitem").selectExpr(
            f"{sqlgen.NODE_ID} AS id",
            f"{sqlgen.LON100ND} AS lon100nd",
            f"{sqlgen.LAT100ND} AS lat100nd",
        )
    ).persist()
    return df.collect()


def test_projection_matches(node_rows):
    for r in node_rows:
        x, y = S.project(r.lon100nd, r.lat100nd)
        assert (x, y) == (r.x, r.y), (r.lon100nd, r.lat100nd)
        assert S.cell_of(x, y) == (r.cell_col, r.cell_row)


def test_pyramid_matches(spark, node_rows):
    df = with_projection(
        spark.sql("SELECT * FROM lineitem").selectExpr(
            f"{sqlgen.NODE_ID} AS id",
            f"{sqlgen.LON100ND} AS lon100nd",
            f"{sqlgen.LAT100ND} AS lat100nd",
        )
    )
    catalog = build_tile_catalog(df, BuildSettings.for_fixture(DENSITY))
    cells = Counter((r.cell_col, r.cell_row) for r in node_rows)
    pyr = S.pyramid(cells, DENSITY)
    want = {
        (int(t.zoom), int(t.col), int(t.row)): int(t.node_count)
        for t in catalog.tiles.itertuples()
    }
    got = {
        (z, c, r): n
        for z, zcells in pyr.items()
        for (c, r), n in zcells.items()
        if n > 0 or z == 0
    }
    assert got == want


def test_home_tiles_match(spark, node_rows, duck):
    cells_by_node = {r.id: (r.cell_col, r.cell_row) for r in node_rows}
    cells = Counter(cells_by_node[r.id] for r in node_rows)
    pyr = S.pyramid(cells, DENSITY)

    wm = duck.execute(sqlgen.way_members_select()).df()
    homes_sql = duck.execute(
        f"WITH nodes AS ({sqlgen.nodes_select()}),\n"
        f"{sqlgen.pyramid_ctes('nodes', DENSITY)},\n"
        f"{sqlgen.way_extent_cte()},\n"
        f"{sqlgen.home_tiles_ctes('wext', 'w')}\n"
        "SELECT id, tile_id, twin FROM w_homes"
    ).df()
    want = {
        wid: sorted(zip(g.tile_id, g.twin))
        for wid, g in homes_sql.groupby("id")
    }
    for wid, grp in wm.groupby("way_id"):
        mcells = [cells_by_node[n] for n in grp.node_id]
        got = S.home_tiles(pyr, mcells)
        assert got == want[wid], wid


def test_node_tile_assignment_matches(node_rows):
    cells = Counter((r.cell_col, r.cell_row) for r in node_rows)
    pyr = S.pyramid(cells, DENSITY)
    # every node's tile is the deepest survivor over its cell; single-node
    # home_tiles must agree with cell_to_tile
    for r in node_rows[:500]:
        t = S.cell_to_tile(pyr, r.cell_col, r.cell_row)
        assert S.home_tiles(pyr, [(r.cell_col, r.cell_row)]) == [(t, 0)]
