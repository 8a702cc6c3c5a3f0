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
