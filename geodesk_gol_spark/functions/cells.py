"""S2/H3-style hierarchical cell ids over the world grid (F2 extension).

The north rule asks for "H3/S2 index cells"; the reference's analogue is
its quadtree tile grid (src/build/util/TileCatalog.h:76-78).  This module
gives every feature an explicit 64-bit *cell id* with S2CellId semantics:

- one integer per (zoom, col, row), Morton-interleaved, level encoded by
  a trailing sentinel bit (S2's lsb trick);
- ``parent(id, zoom)`` by pure bit arithmetic, no lookup;
- ``range_min/range_max`` — the leaf-id interval covered by a cell, so a
  "cell contains feature" predicate becomes a sortable BETWEEN that
  parquet row-group stats can prune (the scan-pruning property S2/H3
  indexes exist for).

Everything is a Column expression (JVM codegen, no Python per row) built
from :func:`..sqlgen.cell_id_expr`, which also serves as the DuckDB
oracle — the id is bit-exact across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import sqlgen
from ..config import LEAF_ZOOM


def cell_id_col(col: str = "cell_col", row: str = "cell_row",
                zoom: int = LEAF_ZOOM) -> Column:
    """Cell id at ``zoom`` from grid coordinates *at that zoom*."""
    return F.expr(sqlgen.cell_id_expr(col, row, zoom))


def cell_id(col: int, row: int, zoom: int = LEAF_ZOOM) -> int:
    """Scalar twin of :func:`cell_id_col` (tests / driver-side)."""
    m = 0
    for b in range(zoom):
        m |= ((col >> b) & 1) << (2 * b + 1)
        m |= ((row >> b) & 1) << (2 * b)
    shift = 2 * (LEAF_ZOOM - zoom)
    return (m << (shift + 1)) | (1 << shift)


def _lsb(ident: str) -> str:
    # lowest set bit == the level sentinel:  id & -id
    return f"(({ident}) & -({ident}))"


def level_col(ident: str) -> Column:
    """Zoom level of a cell id (12 - sentinel-position/2)."""
    lsb = _lsb(ident)
    # log2(lsb)/2: lsb is a power of 4 times 1 or… sentinel at bit 2k
    return (F.lit(LEAF_ZOOM) - (F.log2(F.expr(lsb)) / 2).cast("int")).cast("int")


def parent_col(ident: str, zoom: int) -> Column:
    """Parent cell id at ``zoom`` (must be <= the id's own level)."""
    shift = 2 * (LEAF_ZOOM - zoom)
    block = 1 << (shift + 1)
    return ((F.expr(ident) / block).cast("long") * block + (1 << shift)).alias(
        f"parent_z{zoom}"
    )


def range_min_col(ident: str) -> Column:
    """Smallest leaf id inside this cell (S2CellId::range_min)."""
    return F.expr(f"({ident}) - ({_lsb(ident)}) + 1")


def range_max_col(ident: str) -> Column:
    """Largest leaf id inside this cell (S2CellId::range_max)."""
    return F.expr(f"({ident}) + ({_lsb(ident)}) - 1")


def with_cell_ids(df: DataFrame, zooms: tuple[int, ...] = (LEAF_ZOOM,),
                  col: str = "cell_col", row: str = "cell_row") -> DataFrame:
    """Add ``cell_id`` (leaf) and ``cell_id_z{z}`` ancestor columns.

    Input must carry leaf-zoom grid coordinates (with_projection output);
    ancestor grid coords are derived by exact power-of-two division, so
    no extra projection pass is needed.
    """
    out = df
    for z in zooms:
        d = 1 << (LEAF_ZOOM - z)
        c = f"CAST(floor({col} / {d}.0) AS BIGINT)"
        r = f"CAST(floor({row} / {d}.0) AS BIGINT)"
        name = "cell_id" if z == LEAF_ZOOM else f"cell_id_z{z}"
        out = out.withColumn(name, F.expr(sqlgen.cell_id_expr(c, r, z)))
    return out


def hex_cell_exprs(x: str = "x", y: str = "y",
                   size: int = 1 << 22) -> tuple[str, str]:
    """H3-style hexagonal binning: axial (q, r) of the pointy-top hex
    containing world point (x, y), hexagon circumradius ``size`` world
    units — the other half of the north rule's "H3/S2 index cells"
    (cell_id_col above is the S2 half; real H3's aperture-7 hierarchy
    adds parent/child levels this single-resolution binning doesn't
    model, which hex HEATMAP/JOIN use cases don't need).

    Returned as SQL text usable verbatim in Spark AND DuckDB: identical
    literals and operation order make the float math IEEE-reproducible
    across engines (the sqlgen determinism rule), and the half-up
    rounding is pinned via floor(v + 0.5) — engines disagree on bare
    round().  Cube-rounding per Red Blob Games' axial algorithm (public
    domain), correction branch picks the component with the largest
    rounding error.
    """
    # fractional axial coords; 0.5773502691896258 = sqrt(3)/3 (exact
    # double literal, same parse in both engines)
    qf = f"((0.5773502691896258 * ({x}) - (({y}) / 3.0)) / {size}.0)"
    rf = f"((2.0 * ({y}) / 3.0) / {size}.0)"
    # cube components: xf = qf, zf = rf, yf = -xf - zf
    yf = f"(-({qf}) - ({rf}))"
    rx = f"floor(({qf}) + 0.5)"
    ry = f"floor(({yf}) + 0.5)"
    rz = f"floor(({rf}) + 0.5)"
    dx = f"abs(({rx}) - ({qf}))"
    dy = f"abs(({ry}) - ({yf}))"
    dz = f"abs(({rz}) - ({rf}))"
    hq = (f"CAST(CASE WHEN ({dx}) > ({dy}) AND ({dx}) > ({dz}) "
          f"THEN -({ry}) - ({rz}) ELSE ({rx}) END AS BIGINT)")
    hr = (f"CAST(CASE WHEN NOT (({dx}) > ({dy}) AND ({dx}) > ({dz})) "
          f"AND NOT (({dy}) > ({dz})) "
          f"THEN -({rx}) - ({ry}) ELSE ({rz}) END AS BIGINT)")
    return hq, hr


def with_hex_cells(df: DataFrame, x: str = "x", y: str = "y",
                   size: int = 1 << 22) -> DataFrame:
    """Append ``hex_q``/``hex_r`` axial hex-cell columns (JVM codegen —
    the whole derivation is one Column CASE tree, no UDF)."""
    hq, hr = hex_cell_exprs(x, y, size)
    return df.withColumn("hex_q", F.expr(hq)).withColumn("hex_r", F.expr(hr))
