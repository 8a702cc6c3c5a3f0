"""Tile archive save / load (S5 / S6) + tile-set intersection (U3).

Reference: ``gol save`` exports selected tiles as a compressed archive
with per-tile checksums (src/gol/SaveCommand.cpp:40-100,
src/tile/tes/TesArchive.h:23-55); ``gol load`` imports/merges tiles
(src/gol/LoadCommand.cpp:30-60).  Tiles to export = tile-index walk ∩
bbox filter (SaveCommand.cpp:59-75 — U3).

Spark shape: the archive is a portable parquet export of the selected
tile partitions plus a JSON manifest carrying per-tile row counts and an
order-insensitive content checksum (xor-aggregated row hashes — the
reference's per-tile checksum, made shuffle-order independent).  Load
verifies the manifest and merges with latest-wins semantics.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.pyramid import TileCatalog
from ..query.spatial import tiles_for_bbox

MANIFEST = "manifest.json"


def _tile_checksums(rows: DataFrame) -> dict[int, dict]:
    sums = (
        rows.groupBy("tile_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # order-insensitive 64-bit content checksum (xor: no overflow)
            F.expr("bit_xor(xxhash64(typed_id, is_ghost, twin))").alias("sum_hash"),
        )
        .collect()
    )
    return {
        int(r["tile_id"]): {"rows": int(r["n"]), "checksum": int(r["sum_hash"])}
        for r in sums
    }


def save_tiles(
    store: DataFrame,
    catalog: TileCatalog,
    path: str,
    bbox: tuple[int, int, int, int] | None = None,
) -> dict:
    """S5: export tiles (all, or those intersecting ``bbox`` — U3)."""
    if bbox is not None:
        hit, _ = tiles_for_bbox(catalog, *bbox)
        sel = store.filter(F.col("tile_id").isin(hit))
    else:
        sel = store
    sel.write.mode("overwrite").partitionBy("tile_id").parquet(
        os.path.join(path, "tiles")
    )
    manifest = {
        "tiles": _tile_checksums(sel),
        "bbox": list(bbox) if bbox else None,
    }
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(manifest, f)
    return manifest


class ArchiveChecksumError(RuntimeError):
    pass


def load_tiles(spark: SparkSession, path: str, verify: bool = True) -> DataFrame:
    """S6: read an archive back, verifying per-tile checksums."""
    rows = spark.read.parquet(os.path.join(path, "tiles"))
    if verify:
        with open(os.path.join(path, MANIFEST)) as f:
            manifest = json.load(f)
        got = _tile_checksums(rows)
        want = {int(k): v for k, v in manifest["tiles"].items()}
        if got != want:
            bad = {k for k in set(got) | set(want) if got.get(k) != want.get(k)}
            raise ArchiveChecksumError(f"tile checksum mismatch: {sorted(bad)[:10]}")
    return rows


def merge_archives(base: DataFrame, incoming: DataFrame) -> DataFrame:
    """Merge an incoming archive into a base store: incoming tiles replace
    base tiles wholesale (the reference's tile-granularity transaction)."""
    incoming_tiles = incoming.select("tile_id").distinct()
    kept = base.join(incoming_tiles, "tile_id", "left_anti")
    return kept.unionByName(incoming)
