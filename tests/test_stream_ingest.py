"""Streaming document ingestion == batch node assignment, chunk-invariant.

The streaming analyze/sort phase (streaming/ingest.py) must produce
exactly the batch pipeline's node→tile assignment regardless of how the
document stream is chunked into micro-batches — nodes are batch-local
by construction (coordinates inline), so this is the invariant that
makes the phase streamable at all.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from geodesk_gol_spark.functions.mercator import with_projection
from geodesk_gol_spark.operators.assign import node_points
from geodesk_gol_spark.plans.pyramid import BuildSettings, build_tile_catalog
from geodesk_gol_spark.sources.parser import parse_features_unified, split_features
from geodesk_gol_spark.sources.synth import synth_docs
from geodesk_gol_spark.streaming.ingest import read_doc_stream, stream_node_tiles

from .conftest import SF_DIR


def test_stream_ingest_matches_batch(spark, tmp_path):
    docs = synth_docs(spark, SF_DIR).persist()

    # batch reference path: parse → project → assign with a fixed catalog
    nodes = split_features(parse_features_unified(docs))["nodes"]
    pts = node_points(with_projection(nodes)).persist()
    catalog = build_tile_catalog(
        pts.select("id", "x", "y", "cell_col", "cell_row"),
        BuildSettings.for_fixture(500),
    )
    want = catalog.assign(pts).select("typed_id", "id", "tile_id")

    # stream the SAME docs in 3 arbitrary chunks (one file per micro-batch)
    d = tmp_path / "doc_stream"
    d.mkdir()
    h = F.abs(F.hash("doc_id")) % 3
    for i in range(3):
        docs.filter(h == i).coalesce(1).write.parquet(str(d / f"chunk{i}"))
    # flatten: file source wants files in one dir
    import shutil

    flat = tmp_path / "flat"
    flat.mkdir()
    n = 0
    for sub in sorted(d.iterdir()):
        for f in sorted(sub.glob("*.parquet")):
            shutil.copy(f, flat / f"part-{n:03d}.parquet")
            n += 1
    assert n == 3

    out = tmp_path / "node_tiles_out"
    stream_node_tiles(
        read_doc_stream(spark, str(flat)),
        catalog,
        str(out),
        str(tmp_path / "ckpt"),
    )

    got = spark.read.parquet(f"{out}/batch=*")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
