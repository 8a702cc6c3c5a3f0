"""Tile compiler (O1 + O4 + S4): Hilbert-clustered, deterministic tile store.

Reference: per-tile compilation orders features along a Hilbert curve to
build R-tree leaves (src/tile/compiler/HilbertIndexBuilder.cpp:16-130) and
writes one binary blob per tile under a store transaction
(src/build/compile/Compiler.cpp:831-886,960-976).  TES serialization sorts
features by (type, id) for determinism (src/tile/tes/TesWriter.h:25-46).

Spark re-expression: the "store" is a parquet dataset partitioned by
``tile_id`` (partition pruning ≙ the reference's tile-index walk);
``sortWithinPartitions(tile_id, hilbert, ftype, id)`` gives the same
row-group spatial locality the reference gets from its R-tree leaf packing,
with (ftype, id) as the deterministic tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hilbert import ORDER, hilbert_udf

WORLD_BITS = 31


def with_tile_local_hilbert(df: DataFrame) -> DataFrame:
    """Add a Hilbert key from the feature center, scaled to the tile.

    Expects columns: tile_id, cx, cy (center world coords).
    The tile's zoom is tile_id >> 24; the tile spans 2^(31-zoom) world
    units, quantized to 2^ORDER Hilbert cells per axis.
    """
    # tile edge = 2^(31-zoom) world units; pow(2, k) is double-exact (k<=53)
    span = f"CAST(pow(2, {WORLD_BITS} - (tile_id >> 24)) AS BIGINT)"
    scale = f"CAST(pow(2, {WORLD_BITS} - {ORDER} - (tile_id >> 24)) AS BIGINT)"
    hx = (
        f"CAST(floor((cx - CAST(tile_id & 4095 AS BIGINT) * {span}) / "
        f"CAST({scale} AS DOUBLE)) AS BIGINT)"
    )
    hy = (
        f"CAST(floor((cy - CAST((tile_id >> 12) & 4095 AS BIGINT) * {span}) / "
        f"CAST({scale} AS DOUBLE)) AS BIGINT)"
    )
    lim = (1 << ORDER) - 1
    clamp = "greatest(CAST(0 AS BIGINT), least(CAST({lim} AS BIGINT), {v}))"
    hxc = F.expr(clamp.format(lim=lim, v=hx))
    hyc = F.expr(clamp.format(lim=lim, v=hy))
    return df.withColumn("hilbert", hilbert_udf(hxc, hyc))


def compile_feature_rows(
    feature_tiles: DataFrame,
    points: DataFrame,
    extents: DataFrame,
    nodes: DataFrame,
    ways: DataFrame,
    relations: DataFrame,
) -> DataFrame:
    """Join assignments with payloads into store rows.

    Output: tile_id, typed_id, ftype, id, is_ghost, twin, tags,
            minx..maxy bbox, cx, cy, hilbert, doc_id, span_seq.
    """
    from ..functions.areas import relation_is_area, way_is_area

    # one descriptor frame per feature (payload + geom + area flag merged
    # per-type BEFORE the big join — 1 shuffle join with feature_tiles
    # instead of 3)
    from ..functions.mercator import with_projection

    nulli = F.lit(None).cast("int")
    # nodes: projection is a narrow transform — no join needed
    node_desc = with_projection(nodes).select(
        (F.col("id") * 4).alias("typed_id"), "tags", "doc_id", "span_seq",
        "lon100nd", "lat100nd",
        F.col("x").alias("minx"), F.col("y").alias("miny"),
        F.col("x").alias("maxx"), F.col("y").alias("maxy"),
    ).withColumn("is_area", F.lit(False))
    # union way+relation payloads BEFORE the extent join: the extents
    # frame (every way+relation bbox) is corpus-sized, so joining it once
    # halves that join's shuffle I/O vs one join per type
    ext_by_id = extents.select("typed_id", "minx", "miny", "maxx", "maxy")
    wr_desc = ways.select(
        (F.col("id") * 4 + 1).alias("typed_id"), "tags", "doc_id", "span_seq",
        nulli.alias("lon100nd"), nulli.alias("lat100nd"),
        way_is_area().alias("is_area"),
    ).unionByName(relations.select(
        (F.col("id") * 4 + 2).alias("typed_id"), "tags", "doc_id", "span_seq",
        nulli.alias("lon100nd"), nulli.alias("lat100nd"),
        relation_is_area().alias("is_area"),
    )).join(ext_by_id, "typed_id")
    desc = node_desc.unionByName(wr_desc)

    rows = (
        feature_tiles.join(desc, "typed_id")
        .withColumn("ftype", (F.col("typed_id") % 4).cast("tinyint"))
        .withColumn("id", F.shiftright("typed_id", 2))
        .withColumn(
            "cx", ((F.col("minx") + F.col("maxx")) / 2).cast("long")
        )
        .withColumn("cy", ((F.col("miny") + F.col("maxy")) / 2).cast("long"))
    )
    return with_tile_local_hilbert(rows)


def write_store(rows: DataFrame, path: str, partitions: int | None = None) -> None:
    """S4: write the tile store — range-clustered by tile_id.

    NOT ``partitionBy("tile_id")``: at the reference's 65 535 tiles ×
    shuffle parallelism that layout explodes into millions of small files
    (a named object-store killer).  Instead tile_id is a SORT/CLUSTER
    key: ``repartitionByRange`` gives each output file a contiguous
    tile-id range, ``sortWithinPartitions`` keeps rows Hilbert-clustered
    inside a tile, and tile queries prune via parquet row-group min/max
    stats on tile_id — the same effect as the reference's tile-index walk
    with O(shuffle-partitions) files instead of O(tiles × partitions).

    Hot-tile skew (dense urban cells): ranging on (tile_id, hilbert)
    lets the range partitioner SPLIT a hot tile across output files at
    Hilbert-curve boundaries — each split is still a contiguous spatial
    run, so pruning and clustering survive, but no single writer task
    owns a whole planet-scale city tile.
    """
    n = partitions or rows.sparkSession.conf.get("spark.sql.shuffle.partitions")
    (
        rows.repartitionByRange(int(n), "tile_id", "hilbert", "ftype", "id")
        .sortWithinPartitions("tile_id", "hilbert", "ftype", "id")
        .write.mode("overwrite")
        .parquet(path)
    )


def plan_tile_batches(tiles, n_batches: int) -> list[tuple[int, int]]:
    """Split the tile catalog into ≤n_batches contiguous tile-id ranges of
    roughly equal node weight.

    Weighting by the catalog's per-tile ``node_count`` (not tile count)
    keeps batch checkpoints balanced under hot-tile skew: a dense urban
    range gets fewer tiles per batch, a sparse ocean range more.  Ranges
    are [lo, hi] inclusive and cover all of int32 tile-id space (the
    first starts at 0, the last ends at 2^31-1) so every store row —
    including ghosts in tiles the node catalog missed — lands in exactly
    one batch.
    """
    t = tiles.sort_values("tile_id").reset_index(drop=True)
    ids = t["tile_id"].astype("int64").tolist()
    w = t["node_count"].astype("int64").clip(lower=1).tolist()
    total = sum(w)
    n_batches = max(1, min(int(n_batches), len(t)))
    target = total / n_batches
    # greedy: close a batch when it reaches target weight; close it EARLY
    # when the next tile alone exceeds target, so a planet-scale hot tile
    # gets its own batch instead of dragging its light neighbors along
    bounds: list[int] = []  # exclusive upper tile_id of each cut
    cur = 0.0
    for i, wi in enumerate(w):
        if len(bounds) >= n_batches - 1 or i == len(ids) - 1:
            break
        if cur > 0 and wi > target:
            bounds.append(ids[i - 1] + 1)  # cut BEFORE the hot tile
            cur = 0.0
        cur += wi
        if cur >= target and len(bounds) < n_batches - 1:
            bounds.append(ids[i] + 1)
            cur = 0.0
    lo = 0
    ranges = []
    for b in bounds:
        ranges.append((lo, b - 1))
        lo = b
    ranges.append((lo, (1 << 31) - 1))
    return ranges


def write_store_resumable(
    rows: DataFrame,
    path: str,
    tiles,
    partitions: int | None = None,
    n_batches: int = 8,
) -> list[dict]:
    """S4 with per-tile-range checkpoints: the store is written as
    independent contiguous tile-id batches, each a restartable
    transaction, then finalized into the flat layout ``write_store``
    produces.

    The reference commits each compiled tile under a store transaction
    (src/build/compile/Compiler.cpp:960-976 ``putTile``) inside a
    restartable build phase (src/build/GolBuilder.cpp:61-115); the Spark
    re-expression makes the checkpoint unit a contiguous tile-id RANGE
    (a "pile set"), because one output transaction per tile (65 535
    commits) is an object-store anti-pattern while ~dozens of
    range-batches amortize job setup yet still bound lost work.

    Mechanics:
      * each batch b writes ``<path>/_batches/b<i>`` with Spark's own
        ``_SUCCESS`` as the commit marker; a re-run skips committed
        batches (kill the job mid-store and only in-flight batches redo)
      * ``rows`` should be a parquet-backed scan range-partitioned on
        tile_id (the pipeline checkpoints ``store_input`` that way) so
        each batch's ``tile_id BETWEEN`` filter prunes row groups
        instead of rescanning the corpus — total scan cost stays O(N)
        across all batches
      * finalize hardlinks batch part-files into ``<path>`` (same
        layout/naming contract as ``write_store``; readers and DuckDB
        glob see one flat parquet dir) and stamps ``<path>/_SUCCESS``;
        a crash mid-finalize re-links idempotently on resume
      * returns per-batch lineage dicts (batch, tile range, rows,
        seconds, resumed) — row counts read from parquet footers, no
        extra Spark job

    Spark ignores ``_``-prefixed subdirs, so ``_batches`` stays inside
    the store without affecting ``spark.read.parquet(path)``.
    """
    import glob
    import os
    import shutil
    import time

    import pyarrow.parquet as pq

    n = int(
        partitions
        or rows.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    ranges = plan_tile_batches(tiles, n_batches)
    per_batch = max(2, n // len(ranges))
    os.makedirs(path, exist_ok=True)
    done_marker = os.path.join(path, "_SUCCESS")
    lineage: list[dict] = []

    def _batch_rows(bdir: str) -> int:
        return sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in glob.glob(os.path.join(bdir, "*.parquet"))
        )

    import json

    for i, (lo, hi) in enumerate(ranges):
        bdir = os.path.join(path, "_batches", f"b{i:03d}")
        range_file = os.path.join(bdir, "_RANGE.json")
        resumed = os.path.exists(os.path.join(bdir, "_SUCCESS"))
        if resumed:
            # A committed batch is only reusable if it was planned over
            # the SAME tile range — resuming after store_batches or the
            # tile catalog changed would otherwise finalize a store
            # with duplicated/missing tile ranges.
            try:
                with open(range_file) as fh:
                    rec = json.load(fh)
                resumed = rec.get("tile_lo") == lo and rec.get("tile_hi") == hi
            except (OSError, ValueError):
                resumed = False  # pre-manifest or corrupt batch: rewrite
        t0 = time.time()
        if not resumed:
            if os.path.exists(bdir):
                shutil.rmtree(bdir)  # partial or stale-range batch
            (
                rows.filter(F.col("tile_id").between(lo, hi))
                .repartitionByRange(per_batch, "tile_id", "hilbert",
                                    "ftype", "id")
                .sortWithinPartitions("tile_id", "hilbert", "ftype", "id")
                .write.mode("overwrite")
                .parquet(bdir)
            )
            with open(range_file, "w") as fh:
                json.dump({"tile_lo": lo, "tile_hi": hi,
                           "n_batches": len(ranges)}, fh)
        lineage.append({
            "stage": "store_batch", "batch": i,
            "tile_lo": lo, "tile_hi": hi,
            "rows": _batch_rows(bdir),
            "seconds": round(time.time() - t0, 3),
            "resumed": resumed,
        })

    # finalize: hardlink every batch part into the flat store dir.
    # Idempotent — a crash between link and marker just re-links.
    if os.path.exists(done_marker):
        os.remove(done_marker)
    for f in glob.glob(os.path.join(path, "*.parquet")):
        os.remove(f)  # stale links from a partial finalize
    for i in range(len(ranges)):
        bdir = os.path.join(path, "_batches", f"b{i:03d}")
        for f in sorted(glob.glob(os.path.join(bdir, "*.parquet"))):
            dst = os.path.join(path, f"b{i:03d}-{os.path.basename(f)}")
            try:
                os.link(f, dst)
            except OSError:
                shutil.copy2(f, dst)
    with open(done_marker, "w"):
        pass
    return lineage
