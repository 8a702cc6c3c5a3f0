"""Incremental document ingestion: the build's streaming analyze/sort phase.

The reference builds a GOL in weighted phases — analyze 10% / sort 40% /
validate 20% / compile 30% (/root/reference/src/build/GolBuilder.cpp:228-234)
— and only the first two are per-feature local: a node carries its
coordinates inline, so node→tile assignment needs no other feature (the
property the Sorter exploits to pile features with no global state,
src/build/sort/Sorter.h:99-105).  This module runs exactly those phases
over a LIVE document stream:

  readStream(docs) → explode+parse spans → project → node→tile assign
    → foreachBatch append (one parquet dir per micro-batch)

Ways and relations need the global node set (the reference's validate
barrier, a join by construction); they run as the existing batch
``assign_features`` once an ingest epoch closes — the same
pipelined-sort / join-heavy-validate split the reference makes, expressed
as stream + batch-epoch instead of thread phases.

Exactly-once: Structured Streaming's source checkpoint tracks consumed
files; the sink writes each micro-batch to its own ``batch=<id>``
directory with mode("overwrite"), so a replayed batch id overwrites its
own output instead of duplicating rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.mercator import with_projection
from ..operators.assign import node_points
from ..sources.parser import parse_features_unified, split_features


def read_doc_stream(spark: SparkSession, path: str,
                    max_files_per_trigger: int = 1) -> DataFrame:
    """File-source document stream (schema inferred from the existing
    parquet — the stream and the batch path share one schema by
    construction)."""
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_node_tiles(doc_stream: DataFrame, catalog, out_dir: str,
                      checkpoint_dir: str):
    """Parse + node-assign each micro-batch of documents; append the
    (typed_id, id, tile_id) assignment as ``batch=<id>`` parquet dirs.

    The per-batch work is the whole-stage-codegen'd batch plan — the
    same explode/from_json/projection/broadcast-assign Catalyst picks
    for the batch pipeline; foreachBatch only scopes it to the
    micro-batch.  Runs with Trigger.AvailableNow (bounded catch-up
    ingest); drop the trigger for continuous tailing.
    """

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        unified = parse_features_unified(batch_df)
        nodes = split_features(unified)["nodes"]
        pts = node_points(with_projection(nodes))
        (
            catalog.assign(pts)
            .select("typed_id", "id", "tile_id")
            .write.mode("overwrite")
            .parquet(f"{out_dir}/batch={batch_id}")
        )

    q = (
        doc_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
