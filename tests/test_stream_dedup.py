"""streaming.dedup: chunk-invariance of incremental dedup.

The design claim (streaming/dedup.py docstring): the union of emitted
duplicate pairs is the global LSH-candidate pair set regardless of how
the corpus is chunked into micro-batches.  Proven here by running the
SAME corpus once as a single batch and once as three doc_id-ordered
chunks and requiring identical pair sets; the gate entry
(`streaming_dedup_incremental`) additionally pins the set to a batch
DuckDB oracle.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from .conftest import SF_DIR


def _stage_chunks(spark, docs, chunk_dir: str, n_chunks: int) -> None:
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
    cuts = [lo + (i + 1) * (hi - lo) // n_chunks for i in range(n_chunks - 1)]
    bounds = [float("-inf"), *cuts, float("inf")]
    os.makedirs(chunk_dir)
    for i in range(n_chunks):
        part = docs.filter(
            (F.col("doc_id") > bounds[i]) & (F.col("doc_id") <= bounds[i + 1])
        )
        tmp = f"{chunk_dir}.stage{i}"
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = glob.glob(f"{tmp}/part-*.parquet")[0]
        dst = f"{chunk_dir}/c{i}.parquet"
        shutil.move(src, dst)
        shutil.rmtree(tmp)
        os.utime(dst, (1_000_000_000 + i * 3600,) * 2)


def _run(spark, docs, root: str, n_chunks: int):
    from geodesk_gol_spark.streaming.dedup import (
        dedup_pairs_frame, read_doc_stream_chunks,
        stream_dedup_against_history,
    )

    chunks = f"{root}/chunks"
    _stage_chunks(spark, docs, chunks, n_chunks)
    stream = read_doc_stream_chunks(spark, chunks)
    stream_dedup_against_history(
        stream, f"{root}/state", f"{root}/pairs", f"{root}/ckpt")
    return dedup_pairs_frame(spark, f"{root}/pairs")


def test_stream_dedup_chunk_invariance(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    one = {
        (r.new_doc, r.canon_seen, r.n_matches)
        for r in _run(spark, docs, str(tmp_path / "one"), 1).collect()
    }
    three = {
        (r.new_doc, r.canon_seen, r.n_matches)
        for r in _run(spark, docs, str(tmp_path / "three"), 3).collect()
    }
    assert one, "fixture corpus must contain near-duplicates"
    assert one == three


def test_stream_dedup_state_grows_per_batch(spark, tmp_path):
    """Exactly-once bookkeeping: one state contribution per micro-batch,
    and every ingested doc's signature lands in the state store."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    root = str(tmp_path / "s")
    _run(spark, docs, root, 3)
    batches = sorted(os.listdir(f"{root}/state/bands"))
    assert [b for b in batches if b.startswith("batch=")] == [
        "batch=0", "batch=1", "batch=2"]
    state_docs = (
        spark.read.parquet(f"{root}/state/sizes/batch=*")
        .select("doc_id").distinct().count()
    )
    eligible = docs.filter(F.size(F.split("text", " ")) >= 3).count()
    assert state_docs == eligible
