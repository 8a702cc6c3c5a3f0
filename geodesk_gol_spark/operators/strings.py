"""Global string-table construction (A2) — two-phase frequency aggregation.

Reference: per-worker lossy string counters merged centrally, strings
below ``minStringUsage`` (default 300) culled, capped at ``maxStrings``
(32 000 default / 65 533 hard), core strings first, then indexed keys,
then by descending frequency (src/build/analyze/Analyzer.cpp:105-205,
src/build/util/StringCatalog.cpp:27-120, BuildSettings.h:163-164).

Spark shape: explode tag keys+values → partial/final hash agg → threshold
→ deterministic (count desc, string asc) ranking.  Exact counts — at our
scale the reference's lossy bounded-memory cull is unnecessary; the
threshold reproduces its *effect* deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CORE_STRINGS = ("", "no", "yes", "outer", "inner")  # StringCatalog.cpp:27-34


def string_frequencies(feature_frames: list[DataFrame]) -> DataFrame:
    """(string, n) across all tag keys and values of all feature kinds."""
    parts = []
    for df in feature_frames:
        e = df.select(F.explode("tags").alias("k", "v"))
        parts.append(e.select(F.col("k").alias("s")))
        parts.append(e.select(F.col("v").alias("s")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("s").agg(F.count(F.lit(1)).alias("n"))


def global_string_table(
    feature_frames: list[DataFrame],
    min_usage: int = 300,
    max_strings: int = 32_000,
) -> DataFrame:
    """(code, s, n): core strings first, then by (n desc, s asc), capped."""
    freq = string_frequencies(feature_frames).filter(F.col("n") >= min_usage)
    core = freq.sparkSession.createDataFrame(
        [(i, s) for i, s in enumerate(CORE_STRINGS)], "core_code int, s string"
    )
    ranked = (
        freq.join(F.broadcast(core), "s", "left")
        .withColumn(
            "rank_key",
            F.when(F.col("core_code").isNotNull(), F.col("core_code")).otherwise(
                F.lit(None)
            ),
        )
    )
    order = [
        F.col("core_code").isNull(),  # core first
        F.col("core_code"),
        F.desc("n"),
        F.asc("s"),
    ]
    # distributed top-K FIRST (TakeOrderedAndProject: per-partition heads
    # merged once), so the global row_number window only ever sees
    # <= max_strings rows — bounded single-task sort at any input scale
    capped = ranked.orderBy(*order).limit(max_strings)
    w = Window.orderBy(*order)
    return (
        capped.withColumn("code", (F.row_number().over(w) - 1).cast("int"))
        .select("code", "s", "n")
    )
