"""Tile-pyramid construction (A1 + A4 + A5 + the cell→tile map for J1).

Reference semantics re-expressed Spark-first
(/root/reference/src/build/analyze/TileIndexBuilder.cpp:55-269):

- leaf statistics grid is the 4096×4096 zoom-12 cell grid
  (FastTileCalculator.h:53-55) → ``groupBy(cell).count()`` — a classic
  partial/final hash aggregation (Analyzer.cpp:54-67,172-176);
- tiles below ``min_tile_density`` dissolve into their parent
  (TileIndexBuilder.cpp:183-239) → iterative 64×-shrinking rollup,
  zoom 12→9→6→3→0 (the reference's zoom-subset tests use exactly this
  ladder, test/test_save.py:20);
- ``max_tiles`` cap keeps the densest tiles (TileIndexBuilder.cpp:93-126)
  → driver-side top-K with deterministic (count desc, tile_id asc)
  tiebreak; dropped tiles re-dissolve into their nearest surviving
  ancestor;
- the cellToPile lookup grid (TileCatalog.h:74-82) → ONE vectorized
  broadcast lookup (functions/tile_lookup.py: sorted survivor-id array +
  np.searchsorted per ladder zoom, deepest surviving tile wins) — no
  join, no exchange.

Scale notes: the cell-count aggregate stays distributed (≤16.7M groups
worst case); only *survivor candidates* are collected (bounded by
total_nodes / density, and then capped at max_tiles = 65 535), so driver
memory is bounded regardless of input size.  The survivor frames that
drive assignment are ≤65 535 rows each → always broadcast, never a
shuffle on the big side.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import LADDER, BuildSettings, tile_id as make_tile_id

_LADDER = LADDER  # non-root zooms; root (zoom 0) handled separately


@dataclass
class TileCatalog:
    """Driver-side pyramid: ≤ max_tiles rows, broadcast to every join."""

    settings: BuildSettings
    tiles: pd.DataFrame  # tile_id, zoom, col, row, node_count, parent_tile_id

    def df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(self.tiles).select(
            F.col("tile_id").cast("int"),
            F.col("zoom").cast("int"),
            F.col("col").cast("int"),
            F.col("row").cast("int"),
            F.col("node_count").cast("long"),
            F.col("parent_tile_id").cast("int"),
        )

    def assign(
        self,
        df: DataFrame,
        cell_col: str = "cell_col",
        cell_row: str = "cell_row",
        out: str = "tile_id",
    ) -> DataFrame:
        """cell→tile: deepest surviving tile containing the cell (J1).

        One vectorized Arrow-batch lookup against the broadcast survivor
        set (functions/tile_lookup.py) — no exchange, no join; the stage
        stays a narrow map at any input size.
        """
        from ..functions.tile_lookup import assign_tiles

        return assign_tiles(df, self.tiles, cell_col, cell_row, out=out)


def build_tile_catalog(nodes: DataFrame, settings: BuildSettings) -> TileCatalog:
    """nodes (with cell_col/cell_row) → TileCatalog.

    Distributed aggregation; only bounded survivor candidates hit the
    driver.  Deterministic for a given input (pure integer arithmetic).
    """
    # ONE distributed job AND one shuffle: every node contributes its
    # cell at all four ladder zooms (explode immediately absorbed by the
    # map-side partial aggregation), then a single groupBy(zoom, c, r)
    # count.  Collected rows stay bounded: z12 is filtered to survivor
    # candidates (≤ total_nodes/density, then capped at max_tiles); the
    # full z9/z6/z3 total grids are ≤512² + 64² + 8² rows.  The
    # survivor/residual ladder — which level each count dissolves into —
    # is pure arithmetic on those bounded frames, done driver-side in
    # dicts.  (Was: a 12→9→6→3 shrink chain — 4 chained shuffle stages
    # of tiny frames, each paying a fixed stage barrier; the barriers,
    # not the data, dominated this stage's 4N profile.)
    d = settings.min_tile_density
    zoom_structs = ", ".join(
        f"struct({z} AS zoom, "
        f"CAST(shiftright(cell_col, {12 - z}) AS INT) AS c, "
        f"CAST(shiftright(cell_row, {12 - z}) AS INT) AS r)"
        for z in _LADDER
    )
    lvl = (
        nodes.selectExpr(f"inline(array({zoom_structs}))")
        .groupBy("zoom", "c", "r")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter((F.col("zoom") != 12) | (F.col("cnt") >= d))
    )
    pdf = lvl.toPandas()

    frames = []
    surv12 = pdf[pdf.zoom == 12].copy()
    frames.append(surv12[["c", "r", "cnt"]].assign(zoom=12))
    # per-level: residual(cell) = total(cell) − Σ counts already claimed
    # by surviving descendants; claimed rolls up level by level.
    claimed: dict[tuple[int, int], int] = {}  # at the PREVIOUS level's grid
    for c, r, cnt in zip(surv12.c, surv12.r, surv12.cnt):
        claimed[(int(c) // 8, int(r) // 8)] = (
            claimed.get((int(c) // 8, int(r) // 8), 0) + int(cnt)
        )
    root_count = 0
    for i, zoom in enumerate(_LADDER[1:], start=1):
        level = pdf[pdf.zoom == zoom]
        surv_rows = []
        nxt: dict[tuple[int, int], int] = {}
        for c, r, cnt in zip(level.c, level.r, level.cnt):
            c, r = int(c), int(r)
            resid = int(cnt) - claimed.get((c, r), 0)
            key_up = (c // 8, r // 8)
            if resid >= d:
                surv_rows.append((c, r, resid))
                nxt[key_up] = nxt.get(key_up, 0) + int(cnt)
            else:
                nxt[key_up] = nxt.get(key_up, 0) + claimed.get((c, r), 0)
                if zoom == _LADDER[-1]:
                    root_count += resid
        frames.append(
            pd.DataFrame(surv_rows, columns=["c", "r", "cnt"]).assign(zoom=zoom)
        )
        claimed = nxt

    cand = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()
    if len(cand) == 0:
        cand = pd.DataFrame(columns=["c", "r", "cnt", "zoom"])
    cand["tile_id"] = [
        make_tile_id(int(z), int(c), int(r))
        for z, c, r in zip(cand.zoom, cand.c, cand.r)
    ]

    # max_tiles cap: keep densest (count desc, tile_id asc); dropped tiles
    # dissolve into their nearest surviving ancestor (ultimately the root).
    cand = cand.sort_values(["cnt", "tile_id"], ascending=[False, True]).reset_index(
        drop=True
    )
    keep = cand.iloc[: settings.max_tiles - 1].copy()  # -1: root always exists
    dropped = cand.iloc[settings.max_tiles - 1 :]
    if len(dropped):
        kept_keys = {
            (int(z), int(c), int(r)) for z, c, r in zip(keep.zoom, keep.c, keep.r)
        }
        extra = dict.fromkeys(kept_keys, 0)
        root_extra = 0
        for z, c, r, cnt in zip(dropped.zoom, dropped.c, dropped.r, dropped.cnt):
            z, c, r = int(z), int(c), int(r)
            placed = False
            for az in [q for q in _LADDER if q < z]:
                dd = 1 << (z - az)
                key = (az, c // dd, r // dd)
                if key in extra:
                    extra[key] += int(cnt)
                    placed = True
                    break
            if not placed:
                root_extra += int(cnt)
        keep["cnt"] = keep.apply(
            lambda t: int(t.cnt) + extra[(int(t.zoom), int(t.c), int(t.r))], axis=1
        )
        root_count += root_extra

    # parent = nearest surviving ancestor (root otherwise)
    kept_keys = {(int(z), int(c), int(r)) for z, c, r in zip(keep.zoom, keep.c, keep.r)}

    def parent_of(z: int, c: int, r: int) -> int:
        for az in [q for q in _LADDER if q < z]:
            dd = 1 << (z - az)
            if (az, c // dd, r // dd) in kept_keys:
                return make_tile_id(az, c // dd, r // dd)
        return 0

    rows = [
        {
            "tile_id": make_tile_id(int(z), int(c), int(r)),
            "zoom": int(z),
            "col": int(c),
            "row": int(r),
            "node_count": int(cnt),
            "parent_tile_id": parent_of(int(z), int(c), int(r)),
        }
        for z, c, r, cnt in zip(keep.zoom, keep.c, keep.r, keep.cnt)
    ]
    rows.append(
        {
            "tile_id": 0,
            "zoom": 0,
            "col": 0,
            "row": 0,
            "node_count": int(root_count),
            "parent_tile_id": 0,
        }
    )
    tiles = pd.DataFrame(rows).sort_values("tile_id").reset_index(drop=True)
    return TileCatalog(settings=settings, tiles=tiles)
