"""Structured Streaming: windowed aggs against the batch oracle; change merge."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geodesk_gol_spark.streaming.update import latest_changes, merge_changes
from geodesk_gol_spark.streaming.windows import (
    read_event_stream,
    run_to_memory,
    windowed_counts,
)

from .conftest import SF_DIR


def test_stream_window_equals_batch(spark, tmp_path):
    """Streaming tumbling windows == the same aggregation run in batch."""
    # file-stream sources need a directory
    import shutil

    d = tmp_path / "events_stream"
    d.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-000.parquet")
    stream = read_event_stream(spark, str(d))
    run_to_memory(windowed_counts(stream), "win_out")
    got = spark.sql("SELECT * FROM win_out")
    want = windowed_counts(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    # streaming 'complete' mode may differ in row order only
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_change_merge_semantics(spark):
    store = spark.createDataFrame(
        [(4, {"a": "1"}), (8, {"b": "2"}), (12, {"c": "3"})],
        "typed_id long, tags map<string,string>",
    )
    changes = spark.createDataFrame(
        [
            (4, "modify", 2, 1, {"a": "new"}),
            (4, "modify", 1, 1, {"a": "old"}),   # superseded revision
            (8, "delete", 1, 1, None),
            (16, "create", 1, 1, {"d": "4"}),    # unknown id: INSERTED
        ],
        "typed_id long, op string, revision int, change_seq int, "
        "tags map<string,string>",
    )
    latest = {r.typed_id: r.op for r in latest_changes(changes).collect()}
    assert latest == {4: "modify", 8: "delete", 16: "create"}
    merged = {r.typed_id: r.tags for r in merge_changes(store, changes).collect()}
    assert merged == {4: {"a": "new"}, 12: {"c": "3"}, 16: {"d": "4"}}
