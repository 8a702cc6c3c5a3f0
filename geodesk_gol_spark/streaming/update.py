"""Incremental update (S8/J10): change-feed merge into the feature store.

The reference's ``gol update`` is an incremental batch pipeline
(/root/reference/src/change/Updater.cpp:28-84: SEARCH → PREPARE_UPDATE →
APPLY_UPDATE over .osc change files, revision-ordered).  Spark shape:

- a *change frame* (op, typed_id, payload columns, revision) replaces the
  ChangeModel (src/change/model/ChangeModel.*);
- SEARCH (which tiles hold affected copies, J10) is a join of changes
  against ``feature_tiles`` on typed_id (src/change/Updater.cpp:258-270);
- APPLY is MERGE-emulation (no Iceberg jars in this image): latest-wins
  dedup of the change feed, anti-join the store, union upserts — the
  same exactly-once effect the reference gets from its tile transaction
  (Compiler.cpp:955-976), made atomic by an overwrite of the affected
  tile partitions only.

``apply_changes_streaming`` runs the same merge through Structured
Streaming's foreachBatch for a change *stream* (micro-batch =
revision batch; Trigger.AvailableNow ≙ catch-up ingestion like the
reference's replication client, src/change/ReplicationClient.cpp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CHANGE_OPS = ("create", "modify", "delete")


def latest_changes(changes: DataFrame) -> DataFrame:
    """Latest-wins per typed_id by (revision, change_seq) — the
    reference's strictly-ordered revisions (TesArchive.h:30-34)."""
    w = Window.partitionBy("typed_id").orderBy(
        F.desc("revision"), F.desc("change_seq")
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def search_affected_tiles(changes: DataFrame, feature_tiles: DataFrame) -> DataFrame:
    """J10 SEARCH: every tile whose stored copy is affected by a change."""
    return (
        changes.select("typed_id")
        .distinct()
        .join(feature_tiles, "typed_id")
        .select("typed_id", "tile_id", "is_ghost")
    )


def merge_changes(store_rows: DataFrame, changes: DataFrame) -> DataFrame:
    """Apply a change frame to store rows (MERGE INTO emulation).

    changes: (typed_id, op, revision, change_seq, tags, + any store
    columns for creates, e.g. tile_id from the assignment pipeline) —
    deletes drop every copy (home + ghost); modifies replace tags;
    upserts not present in the store are INSERTED (reference applies
    adds via TileCompiler.addChanges, src/change/Updater.cpp:68-84).
    A create whose typed_id already exists behaves as a modify, and a
    surviving change that is absent from the store is inserted even when
    its latest op is 'modify' — a batch may contain create→modify of the
    same feature, and latest-wins keeps only the modify row; the
    reference's revision-ordered apply retains that feature too.
    """
    latest = latest_changes(changes)
    deletes = latest.filter(F.col("op") == "delete").select("typed_id")
    upserts = latest.filter(F.col("op") != "delete")

    surviving = store_rows.join(deletes, "typed_id", "left_anti")
    modified = (
        surviving
        .join(
            upserts.select("typed_id", F.col("tags").alias("_new_tags")),
            "typed_id",
            "left",
        )
        .withColumn("tags", F.coalesce(F.col("_new_tags"), F.col("tags")))
        .drop("_new_tags")
    )
    # INSERT arm: any surviving upsert whose typed_id is not stored
    # becomes a new row (not just op=='create' — see docstring), carrying
    # whatever store columns the caller attached (tile_id etc.); missing
    # columns null-fill so the union stays schema-stable.
    inserts = (
        upserts
        .join(store_rows.select("typed_id"), "typed_id", "left_anti")
        .drop("op", "revision", "change_seq")
    )
    common = [c for c in inserts.columns if c in modified.columns]
    return modified.unionByName(
        inserts.select(*common), allowMissingColumns=True
    )


def apply_changes_streaming(
    spark,
    change_stream: DataFrame,
    store_path: str,
    out_path: str,
):
    """Micro-batch merge: each batch is revision-ordered and applied via
    foreachBatch (exactly-once per the sink's atomic rename)."""

    def _apply(batch: DataFrame, epoch_id: int) -> None:
        store = batch.sparkSession.read.parquet(store_path)
        merged = merge_changes(store, batch)
        merged.write.mode("overwrite").parquet(f"{out_path}/epoch={epoch_id}")

    return (
        change_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", f"{out_path}/_checkpoints")
        .trigger(availableNow=True)
        .start()
    )
