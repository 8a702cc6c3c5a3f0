"""Iceberg materialization of the tile catalog + feature assignments.

The north rule materializes the tile catalog and feature-to-tile
assignments as Iceberg tables with explicit range/salted partitioning
to defeat hot-tile skew (dense urban cells).  This container ships no
Iceberg runtime jars, so the module is gated: the partition-spec
builder, salting, and DDL generation are real (pure logic, tested); the
write path probes the session for Iceberg support and falls back to the
identical parquet layout (``compile_tiles.write_store``) when absent,
recording which path ran.

Reference parity: the catalog table is the GOL tile index
(/root/reference/src/build/analyze/TileIndexBuilder.cpp:55-269, stored
in the .gol header); the assignments table is the pile directory
(src/build/sort/Sorter.h:99-105 piles → tiles).  Iceberg's hidden
partitioning replaces both the reference's mmap pile file layout and
our parquet range files with the same two ideas: cluster by tile, split
hot tiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# transform DDL for the assignments table, in partition-evolution order
DEFAULT_SALT_BUCKETS = 16


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the session can plan an Iceberg DDL (jars + a configured
    catalog).  Probing the JVM classpath is the cheap reliable check —
    `format("iceberg")` errors are only raised at write time."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def with_salt(df: DataFrame, salt_buckets: int = DEFAULT_SALT_BUCKETS,
              col: str = "salt") -> DataFrame:
    """Deterministic skew salt: a hot tile's rows spread over
    ``salt_buckets`` write tasks, keyed off the feature id (stable across
    runs — no RNG, so resume/replay produce identical layouts)."""
    return df.withColumn(
        col, F.pmod(F.xxhash64("typed_id"), F.lit(salt_buckets)).cast("int")
    )


def assignment_partition_spec(salt_buckets: int = DEFAULT_SALT_BUCKETS
                              ) -> list[str]:
    """Iceberg PARTITIONED BY transforms for the feature-assignments
    table: zoom-level buckets keep partitions aligned with the tile
    pyramid; the salt splits hot tiles; is_ghost separates home copies
    (read far more often) from ghost copies."""
    return [
        "truncate(16777216, tile_id)",  # 1 << 24: the tile-id zoom group
        f"bucket({salt_buckets}, tile_id)",
        "is_ghost",
    ]


def catalog_partition_spec() -> list[str]:
    """The catalog is ≤65 535 rows — a single unpartitioned snapshot."""
    return []


def create_table_ddl(table: str, schema_ddl: str,
                     partition_spec: list[str]) -> str:
    """CREATE TABLE ... USING iceberg [PARTITIONED BY (...)] text."""
    p = (f" PARTITIONED BY ({', '.join(partition_spec)})"
         if partition_spec else "")
    return f"CREATE TABLE IF NOT EXISTS {table} ({schema_ddl}) USING iceberg{p}"


def write_assignments(
    df: DataFrame,
    target: str,
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
) -> str:
    """Materialize feature-to-tile assignments.

    With an Iceberg runtime, ``target`` is a table name: rows land via
    writeTo(...).append() under `assignment_partition_spec`.  Without
    one, ``target`` is a path: the salted frame is range-clustered into
    the same layout write_store uses (contiguous tile ranges, hot tiles
    split at salt boundaries).  Returns the path taken:
    'iceberg' | 'parquet'.
    """
    spark = df.sparkSession
    salted = with_salt(df, salt_buckets)
    if iceberg_available(spark):
        ddl = create_table_ddl(
            target,
            ", ".join(f"{f.name} {f.dataType.simpleString()}"
                      for f in salted.schema.fields),
            assignment_partition_spec(salt_buckets),
        )
        spark.sql(ddl)
        salted.writeTo(target).append()
        return "iceberg"
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    (
        salted.repartitionByRange(n, "tile_id", "salt", "typed_id")
        .sortWithinPartitions("tile_id", "salt", "typed_id")
        .write.mode("overwrite")
        .parquet(target)
    )
    return "parquet"


def write_catalog(catalog_df: DataFrame, target: str) -> str:
    """Materialize the tile catalog (≤65 535 rows, unpartitioned)."""
    spark = catalog_df.sparkSession
    if iceberg_available(spark):
        ddl = create_table_ddl(
            target,
            ", ".join(f"{f.name} {f.dataType.simpleString()}"
                      for f in catalog_df.schema.fields),
            catalog_partition_spec(),
        )
        spark.sql(ddl)
        catalog_df.writeTo(target).append()
        return "iceberg"
    catalog_df.coalesce(1).write.mode("overwrite").parquet(target)
    return "parquet"
