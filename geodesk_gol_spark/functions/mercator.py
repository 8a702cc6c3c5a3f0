"""Projection columns (F1/F2): lon/lat 100nd ints → world x/y → cells.

The reference projects with integer-exact Mercator
(/root/reference/src/build/sort/Sorter.cpp:199-201,
 /root/reference/src/build/analyze/FastTileCalculator.h:31-51).
We use the engine's canonical rational pseudo-Mercator from
:mod:`..sqlgen` (see its docstring for why), as pure Column
expressions — JVM-side, codegen'd, no Python per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import sqlgen
from ..config import LEAF_ZOOM


def x_col(lon100nd: str = "lon100nd") -> Column:
    return F.expr(sqlgen.x_expr(lon100nd))


def y_col(lat100nd: str = "lat100nd") -> Column:
    return F.expr(sqlgen.y_expr(lat100nd))


def cell_col(xy: str, zoom: int = LEAF_ZOOM) -> Column:
    return F.expr(sqlgen.cell_expr(xy, zoom))


def with_projection(df: DataFrame, lon: str = "lon100nd", lat: str = "lat100nd") -> DataFrame:
    """Add x, y (31-bit world ints) and zoom-12 cell_col/cell_row."""
    return (
        df.withColumn("x", x_col(lon))
        .withColumn("y", y_col(lat))
        .withColumn("cell_col", cell_col("x"))
        .withColumn("cell_row", cell_col("y"))
    )
