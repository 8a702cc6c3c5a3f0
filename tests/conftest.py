"""Shared fixtures: one SparkSession per test run + a DuckDB oracle conn.

Mirrors the reference's test strategy (SURVEY.md §5): fixture corpus +
independent oracle, cross-format consistency, invariant checks.
"""

from __future__ import annotations

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    from geodesk_gol_spark.session import get_spark

    spark = get_spark("local[8]", app_name="geodesk-gol-tests")
    for t in TABLES:
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").createOrReplaceTempView(t)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def assert_frames_equal(spark_df, duck_df, keycols):
    """Order-insensitive exact comparison (sorted by keycols, cols by name)."""
    import pandas as pd

    s = spark_df if isinstance(spark_df, pd.DataFrame) else spark_df.toPandas()
    d = duck_df if isinstance(duck_df, pd.DataFrame) else duck_df.df()
    s = s.sort_values(keycols).reset_index(drop=True)
    d = d.sort_values(keycols).reset_index(drop=True)
    s = s[sorted(s.columns)]
    d = d[sorted(d.columns)]
    assert len(s) == len(d), f"row count: spark={len(s)} duck={len(d)}"
    pd.testing.assert_frame_equal(s, d, check_dtype=False)
