"""Streaming incremental dedup: each micro-batch of documents dedupes
against the accumulated history — the production shape of corpus
ingestion (a crawl lands in chunks; every chunk must be checked against
everything already ingested WITHOUT re-pairing history against itself).

Per micro-batch (foreachBatch):

  1. shingle-hash the batch (functions.minhash — same 48-bit md5-prefix
     hashes and Carter-Wegman signature slots as the batch operators)
  2. LSH band keys; candidates = batch-bands ⋈ state-bands  ∪
     batch-bands self-join (da < db) for intra-batch dups
  3. exact verify: distinct-shingle-hash intersection,
     2·common ≥ |A ∪ B| (same criterion as gate_ml.sql_dedup_minhash)
  4. emit verified (new_doc, seen_doc) PAIRS to ``out_dir/batch=<id>``
  5. append the batch's shingles / bands / sizes to the state store

Chunk-invariance (tested): the union of emitted pairs over ANY chunking
of the corpus equals the global da<db pair set — band keys don't depend
on chunk boundaries, and a pair is examined exactly once, in the batch
where its larger doc arrives.  This is what lets the bounded gate run be
oracle-checked by one batch SQL statement.

Exactly-once: the file-source checkpoint tracks consumed input files;
every per-batch write targets its own ``batch=<id>`` directory with
mode("overwrite"), so a replayed batch overwrites its own output and
state contribution instead of duplicating them.

Scale notes: state is parquet keyed by (band, key) on the bands table —
at 10^12 docs this is the bucketed seen-signature index a real pipeline
maintains; each batch shuffles only its own signatures into the bucket
join.  Flagged duplicates still enter the state (reporting, not
filtering — canonical selection is the reader's policy).  The batch
path's hot-shingle cap is a corpus-wide statistic and so has no
chunk-stable streaming analogue; the skew guard here is the band-bucket
join itself (a hot bucket is a data-quality signal to alert on, counted
by the caller via the emitted pair multiplicity).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.minhash import band_keys, shingle_hashes, signatures

__all__ = ["read_doc_stream_chunks", "stream_dedup_against_history",
           "dedup_pairs_frame"]


def read_doc_stream_chunks(spark: SparkSession, path: str,
                           max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over a directory of parquet chunk files."""
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def _state(spark: SparkSession, state_dir: str, name: str,
           schema: str) -> DataFrame:
    d = os.path.join(state_dir, name)
    if os.path.isdir(d) and any(
        f.startswith("batch=") for f in os.listdir(d)
    ):
        # no basePath: the glob's leaf dirs are the roots, so no
        # spurious `batch` partition column enters the union schema
        return spark.read.parquet(f"{d}/batch=*")
    return spark.createDataFrame([], schema)


def stream_dedup_against_history(
    doc_stream: DataFrame, state_dir: str, out_dir: str,
    checkpoint_dir: str, n_hash: int = 8,
):
    """Run the stream to completion (Trigger.AvailableNow) emitting
    verified duplicate pairs per micro-batch; returns the query."""
    spark = doc_stream.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        sh_b = shingle_hashes(batch_df).persist()
        sizes_b = sh_b.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n"))
        bands_b = band_keys(signatures(sh_b, n_hash), n_hash).persist()

        sh_s = _state(spark, state_dir, "sh", "doc_id long, h0 long")
        sizes_s = _state(spark, state_dir, "sizes", "doc_id long, n long")
        bands_s = _state(spark, state_dir, "bands",
                         "doc_id long, band int, key string")

        hist = bands_s.select(
            F.col("doc_id").alias("seen_doc"), "band", "key")
        cand_hist = (
            bands_b.join(hist, ["band", "key"])
            .select(F.col("doc_id").alias("new_doc"), "seen_doc")
        )
        cand_intra = (
            bands_b.alias("a")
            .join(bands_b.alias("b"),
                  (F.col("a.band") == F.col("b.band"))
                  & (F.col("a.key") == F.col("b.key"))
                  & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("b.doc_id").alias("new_doc"),
                    F.col("a.doc_id").alias("seen_doc"))
        )
        cand = cand_hist.unionByName(cand_intra).distinct()

        sh_all = sh_s.unionByName(sh_b)
        sizes_all = sizes_s.unionByName(sizes_b)
        common = (
            cand
            .join(sh_all.select(F.col("doc_id").alias("seen_doc"),
                                "h0"), "seen_doc")
            .join(sh_b.select(F.col("doc_id").alias("new_doc"), "h0"),
                  ["new_doc", "h0"])
            .groupBy("new_doc", "seen_doc")
            .agg(F.count(F.lit(1)).alias("com"))
        )
        pairs = (
            common
            .join(sizes_all.select(F.col("doc_id").alias("seen_doc"),
                                   F.col("n").alias("na")), "seen_doc")
            .join(sizes_b.select(F.col("doc_id").alias("new_doc"),
                                 F.col("n").alias("nb")), "new_doc")
            .filter(F.col("com") * 2 >= F.col("na") + F.col("nb")
                    - F.col("com"))
            .select("new_doc", "seen_doc")
        )

        pairs.write.mode("overwrite").parquet(
            f"{out_dir}/batch={batch_id}")
        sh_b.write.mode("overwrite").parquet(
            f"{state_dir}/sh/batch={batch_id}")
        sizes_b.write.mode("overwrite").parquet(
            f"{state_dir}/sizes/batch={batch_id}")
        bands_b.write.mode("overwrite").parquet(
            f"{state_dir}/bands/batch={batch_id}")
        sh_b.unpersist()
        bands_b.unpersist()

    q = (
        doc_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def dedup_pairs_frame(spark: SparkSession, out_dir: str) -> DataFrame:
    """All emitted pairs, aggregated per duplicate doc: canonical =
    smallest matching predecessor, n_matches = how many predecessors
    matched (each pair is emitted exactly once across all batches)."""
    pairs = spark.read.parquet(f"{out_dir}/batch=*")
    return pairs.groupBy("new_doc").agg(
        F.min("seen_doc").alias("canon_seen"),
        F.count(F.lit(1)).alias("n_matches"),
    )
