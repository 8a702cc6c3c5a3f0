"""kNN cell-ring escalation: exactness vs brute force on adversarial
layouts (sparse far points force ring doubling and the final fallback)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geodesk_gol_spark.query.spatial import knn_bruteforce, knn_cell_rings


@pytest.fixture(scope="module")
def sparse(spark):
    # a dense clump near the origin + far-flung singletons: queries at the
    # clump resolve in ring 1; queries in the void need escalation/fallback
    cell = 1 << 15
    pts = [(i, 1000 + i * 37, 2000 + i * 53) for i in range(40)]
    pts += [(100 + j, 40 * cell + j * 11 * cell, 50 * cell + j * 13 * cell)
            for j in range(6)]
    points = spark.createDataFrame(pts, "id long, x long, y long")
    qs = spark.createDataFrame(
        [(0, 1500, 2500), (1, 45 * cell, 55 * cell)],
        "q_id long, qx long, qy long",
    )
    return points, qs


def test_rings_equals_brute(sparse):
    points, qs = sparse
    want = {(r["q_id"], r["rank"]): r["neighbor_id"]
            for r in knn_bruteforce(points, qs, k=5).collect()}
    got = {(r["q_id"], r["rank"]): r["neighbor_id"]
           for r in knn_cell_rings(points, qs, k=5, ring=2).collect()}
    assert got == want


def test_rings_no_duplicate_results(sparse):
    points, qs = sparse
    rows = knn_cell_rings(points, qs, k=5, ring=2).collect()
    keys = [(r["q_id"], r["rank"]) for r in rows]
    assert len(keys) == len(set(keys))
    per_q = {}
    for r in rows:
        per_q.setdefault(r["q_id"], []).append(r["rank"])
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_rings_near_world_edge(spark):
    """Coordinates in the top third of the 31-bit world: the ring-block
    edge products exceed int32, which ANSI mode turns into a job-killing
    overflow unless the margin arithmetic stays in long (and the coarse
    escalation passes multiply the hazard 8x per pass)."""
    top = (1 << 31) - 1
    pts = [(i, top - 1000 - i * 37, top - 2000 - i * 53) for i in range(30)]
    pts += [(200, 5, 7)]  # far corner so escalation has somewhere to look
    points = spark.createDataFrame(pts, "id long, x long, y long")
    qs = spark.createDataFrame(
        [(0, top - 1500, top - 2500), (1, 10, 10)],
        "q_id long, qx long, qy long",
    )
    want = {(r["q_id"], r["rank"]): r["neighbor_id"]
            for r in knn_bruteforce(points, qs, 3).collect()}
    got = {(r["q_id"], r["rank"]): r["neighbor_id"]
           for r in knn_cell_rings(points, qs, 3, cell_bits=22).collect()}
    assert got == want


def test_bruteforce_refuses_large_query_set(spark):
    """The brute cartesian is the oracle/residue path only: a query set
    above the cap raises instead of silently planning O(N x Q)."""
    import pytest as _pytest

    pts = spark.range(10).selectExpr("id", "id AS x", "id AS y")
    qs = spark.range(5000).selectExpr(
        "id AS q_id", "id AS qx", "id AS qy")
    with _pytest.raises(ValueError, match="knn_cell_rings"):
        knn_bruteforce(pts, qs, k=2)
    # and the escape hatch for the rings residue still works
    assert knn_bruteforce(pts, qs.limit(3), k=2).count() == 6
