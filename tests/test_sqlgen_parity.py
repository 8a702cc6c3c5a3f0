"""Cross-engine (Spark vs DuckDB) parity of the shared SQL fragments.

These fragments are the foundation of every oracle comparison: if the two
engines disagree on a single derived int, every downstream oracle breaks.
"""

from __future__ import annotations

import pytest

from geodesk_gol_spark import sqlgen

from .conftest import assert_frames_equal


@pytest.mark.parametrize(
    "name,sql,keys",
    [
        ("nodes", sqlgen.nodes_select(), ["id"]),
        ("ways", sqlgen.ways_select(), ["id"]),
        ("way_members", sqlgen.way_members_select(), ["way_id", "seq"]),
        ("relations", sqlgen.relations_select(), ["id"]),
        ("rel_members", sqlgen.relation_members_select(), ["rel_id", "seq"]),
        ("super_members", sqlgen.super_relation_members_select(), ["rel_id", "seq"]),
    ],
)
def test_fragment_parity(spark, duck, name, sql, keys):
    assert_frames_equal(spark.sql(sql), duck.execute(sql), keys)


def test_node_distribution(duck):
    """Sanity: three density bands, full coordinate range, many cells."""
    d = duck.execute(
        f"WITH nodes AS ({sqlgen.nodes_select()}) "
        "SELECT count(*) AS n, count(DISTINCT cell_col * 100000 + cell_row) AS cells,"
        " min(x) AS mnx, max(x) AS mxx, min(y) AS mny, max(y) AS mxy FROM nodes"
    ).df()
    # sf0.001 lineitem has 6000 rows but only 4599 distinct
    # (l_orderkey, l_linenumber) pairs; nodes dedupe them.
    assert d.n[0] == 4599
    assert d.cells[0] > 1000
    assert 0 <= d.mnx[0] and d.mxx[0] < 2**31
    assert 0 <= d.mny[0] and d.mxy[0] < 2**31


def test_pyramid_sql_multilevel(duck):
    """The density merge must produce survivors at several zoom levels."""
    sql = (
        f"WITH nodes AS ({sqlgen.nodes_select()}),\n"
        f"{sqlgen.pyramid_ctes('nodes', 40)}\n"
        "SELECT 12 AS zoom, count(*) AS n FROM s12 "
        "UNION ALL SELECT 9, count(*) FROM s9 "
        "UNION ALL SELECT 6, count(*) FROM s6 "
        "UNION ALL SELECT 3, count(*) FROM s3"
    )
    d = duck.execute(sql).df().set_index("zoom")["n"]
    assert d[12] > 5 and d[9] > 0 and d[6] > 0
