"""Per-tile-range checkpointed store writes (north rule: "resumable from
per-tile checkpoints").

The reference commits each compiled tile under a store transaction inside
a restartable phase (/root/reference/src/build/compile/Compiler.cpp:960-976,
src/build/GolBuilder.cpp:61-115); here the commit unit is a contiguous
tile-id range.  These tests verify: the batched layout is content-equal to
the single-job layout, batch planning covers tile-id space with weighted
balance, and a killed write resumes redoing ONLY uncommitted batches.
"""

from __future__ import annotations

import glob
import os

import pandas as pd
from pyspark.sql import functions as F

from geodesk_gol_spark.operators.compile_tiles import (
    plan_tile_batches,
    write_store,
    write_store_resumable,
)


def _rows(spark, n=12_000, tiles=60):
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % 3).cast("tinyint").alias("ftype"),
        # skewed: tile 7 holds 40% of rows, the rest spread evenly
        F.when(F.col("id") % 10 < 4, F.lit(7))
        .otherwise(100 + F.col("id") % tiles).cast("int").alias("tile_id"),
        (F.col("id") * 2654435761 % 2**32).alias("hilbert"),
    )


def _tiles_pdf(rows_df):
    pdf = (
        rows_df.groupBy("tile_id").count().toPandas()
        .rename(columns={"count": "node_count"})
    )
    return pd.DataFrame(
        {"tile_id": pdf["tile_id"].astype("int64"),
         "node_count": pdf["node_count"].astype("int64")}
    )


def _content(spark, path):
    return (
        spark.read.parquet(path)
        .orderBy("tile_id", "hilbert", "ftype", "id")
        .toPandas()
        .reset_index(drop=True)
    )


def test_resumable_matches_plain(spark, tmp_path):
    rows = _rows(spark)
    tiles = _tiles_pdf(rows)
    plain, batched = str(tmp_path / "plain"), str(tmp_path / "batched")
    write_store(rows, plain, partitions=8)
    lineage = write_store_resumable(rows, batched, tiles,
                                    partitions=8, n_batches=4)
    a, b = _content(spark, plain), _content(spark, batched)
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])
    # lineage covers everything exactly once
    assert sum(x["rows"] for x in lineage) == rows.count()
    assert all(not x["resumed"] for x in lineage)


def test_batch_planning_covers_and_balances():
    tiles = pd.DataFrame({
        "tile_id": list(range(100, 160)),
        "node_count": [100_000 if t == 130 else 100
                       for t in range(100, 160)],
    })
    ranges = plan_tile_batches(tiles, 6)
    assert len(ranges) <= 6
    # disjoint, ordered, covering all of int32 tile-id space
    assert ranges[0][0] == 0 and ranges[-1][1] == (1 << 31) - 1
    for (lo, hi), (lo2, _) in zip(ranges, ranges[1:]):
        assert lo <= hi and lo2 == hi + 1
    # the hot tile dominates the weight: it gets its OWN batch instead of
    # dragging its light neighbors along
    hot = next((lo, hi) for lo, hi in ranges if lo <= 130 <= hi)
    n_tiles_in_hot = sum(1 for t in tiles["tile_id"] if hot[0] <= t <= hot[1])
    assert n_tiles_in_hot == 1


def test_resume_redoes_only_uncommitted_batches(spark, tmp_path):
    rows = _rows(spark)
    tiles = _tiles_pdf(rows)
    out = str(tmp_path / "store")
    first = write_store_resumable(rows, out, tiles, partitions=8, n_batches=4)
    want = _content(spark, out)

    # record the inode of every committed batch part file
    def inodes():
        return {
            f: os.stat(f).st_ino
            for f in glob.glob(os.path.join(out, "_batches", "*", "*.parquet"))
        }

    before = inodes()
    # simulate a crash: batch 2 uncommitted, finalize incomplete
    os.remove(os.path.join(out, "_batches", "b002", "_SUCCESS"))
    os.remove(os.path.join(out, "_SUCCESS"))
    for f in glob.glob(os.path.join(out, "*.parquet"))[:3]:
        os.remove(f)  # partial finalize damage

    second = write_store_resumable(rows, out, tiles, partitions=8, n_batches=4)
    assert [x["resumed"] for x in second] == [True, True, False, True]
    after = inodes()
    for f, ino in before.items():
        if os.sep + "b002" + os.sep not in f:
            assert after[f] == ino, f"committed batch rewritten: {f}"
    got = _content(spark, out)
    pd.testing.assert_frame_equal(want, got)
    assert sum(x["rows"] for x in first) == sum(x["rows"] for x in second)


def test_reader_ignores_batch_dirs(spark, tmp_path):
    rows = _rows(spark, n=2_000, tiles=10)
    out = str(tmp_path / "store")
    write_store_resumable(rows, out, _tiles_pdf(rows),
                          partitions=4, n_batches=2)
    # flat-dir contract: Spark and a *.parquet glob both see ONLY the
    # finalized store (the _batches checkpoint dir is invisible)
    assert spark.read.parquet(out).count() == 2_000
    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{out}/*.parquet')"
    ).fetchone()[0]
    assert n == 2_000


def test_resume_invalidates_stale_range_batches(spark, tmp_path):
    """Regression (r04): a committed batch is only reusable when it was
    planned over the SAME tile range.  Resuming into an existing path
    after the tile catalog changed must rewrite any batch whose
    recorded (lo, hi) differs — not silently finalize a store with
    duplicated/missing ranges."""
    rows = _rows(spark)
    out = str(tmp_path / "store")
    # first build: hot tile 7 dominates -> one batch plan
    write_store_resumable(rows, out, _tiles_pdf(rows),
                          partitions=8, n_batches=4)
    # second build into the SAME path with a shifted corpus: different
    # tile catalog -> different planned ranges
    rows2 = rows.withColumn("tile_id", F.col("tile_id") + 5)
    second = write_store_resumable(rows2, out, _tiles_pdf(rows2),
                                   partitions=8, n_batches=4)
    # every batch whose planned range changed was rewritten; the final
    # store equals a fresh single-job write of rows2
    fresh = str(tmp_path / "fresh")
    write_store(rows2, fresh, partitions=8)
    pd.testing.assert_frame_equal(_content(spark, fresh),
                                  _content(spark, out))
    assert sum(x["rows"] for x in second) == rows2.count()
