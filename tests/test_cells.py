"""S2-style cell ids: bijectivity, parent algebra, range containment."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geodesk_gol_spark.functions.cells import (
    cell_id,
    level_col,
    parent_col,
    range_max_col,
    range_min_col,
    with_cell_ids,
)


def test_scalar_bijective_at_leaf():
    seen = set()
    for c in range(0, 4096, 257):
        for r in range(0, 4096, 263):
            i = cell_id(c, r, 12)
            assert i % 2 == 1  # leaf sentinel is bit 0
            assert i not in seen
            seen.add(i)


def test_scalar_parent_contains_child():
    c, r = 1234, 3456
    leaf = cell_id(c, r, 12)
    for z in (9, 6, 3, 0):
        p = cell_id(c >> (12 - z), r >> (12 - z), z)
        lsb = p & -p
        assert p - lsb + 1 <= leaf <= p + lsb - 1


def test_column_matches_scalar_and_invariants(spark):
    rows = [(i, (i * 797) % 4096, (i * 991) % 4096) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, cell_col long, cell_row long")
    out = with_cell_ids(df, zooms=(12, 9)).withColumn(
        "lvl", level_col("cell_id_z9")
    ).withColumn("rmin", range_min_col("cell_id_z9")).withColumn(
        "rmax", range_max_col("cell_id_z9")
    ).withColumn("p9", parent_col("cell_id", 9))
    got = {x["id"]: x for x in out.collect()}
    for i, c, r in rows:
        x = got[i]
        assert x["cell_id"] == cell_id(c, r, 12)
        assert x["cell_id_z9"] == cell_id(c >> 3, r >> 3, 9)
        assert x["lvl"] == 9
        # parent derived from the leaf id alone == parent from coords
        assert x["p9"] == x["cell_id_z9"]
        # leaf falls inside the parent's leaf range
        assert x["rmin"] <= x["cell_id"] <= x["rmax"]


def test_range_predicate_prunes(spark):
    # "features in z6 cell" as a BETWEEN over the leaf id — the sortable
    # predicate shape row-group stats can prune
    rows = [(i, i % 4096, (i * 7) % 4096) for i in range(2000)]
    df = with_cell_ids(
        spark.createDataFrame(rows, "id long, cell_col long, cell_row long"),
        zooms=(12, 6),
    )
    one = df.select("cell_id_z6").first()[0]
    lsb = one & -one
    n_between = df.filter(F.col("cell_id").between(one - lsb + 1, one + lsb - 1)).count()
    n_eq = df.filter(F.col("cell_id_z6") == one).count()
    assert n_between == n_eq > 0
