"""Integrity checker (gol check analogue): clean store passes, seeded
corruptions are caught."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geodesk_gol_spark.operators.check import assert_store_ok, check_store


@pytest.fixture(scope="module")
def built(spark):
    from geodesk_gol_spark.gate import ctx

    return ctx(spark, "/root/testdata/sf0.001")


def test_clean_store_passes(built):
    assert_store_ok(
        built["store"], built["catalog"], built["exports"], built["stubs"]
    )


def test_corrupt_tile_id_caught(built):
    bad = built["store"].withColumn(
        "tile_id",
        F.when(F.col("typed_id") % 1001 == 0, F.lit(999_999_999).cast("int"))
        .otherwise(F.col("tile_id")),
    )
    res = {r["invariant"]: r["n_bad"] for r in
           check_store(bad, built["catalog"]).collect()}
    assert res["unknown_tile"] > 0


def test_corrupt_bbox_caught(built):
    bad = built["store"].withColumn(
        "minx",
        F.when(F.col("typed_id") % 1001 == 0, F.lit(2**31 - 2).cast("long"))
        .otherwise(F.col("minx")),
    ).withColumn(
        "maxx",
        F.when(F.col("typed_id") % 1001 == 0, F.lit(2**31 - 1).cast("long"))
        .otherwise(F.col("maxx")),
    )
    res = {r["invariant"]: r["n_bad"] for r in
           check_store(bad, built["catalog"]).collect()}
    assert res["bbox_outside_tile"] > 0


def test_corrupt_stub_caught(built):
    bad_stubs = built["stubs"].withColumn(
        "tex", F.col("tex") + F.lit(1_000_000)
    )
    res = {r["invariant"]: r["n_bad"] for r in
           check_store(built["store"], built["catalog"], built["exports"],
                       bad_stubs).collect()}
    assert res["stub_unresolved"] > 0


def test_duplicate_copy_caught(built):
    dup = built["store"].unionByName(built["store"].limit(5))
    res = {r["invariant"]: r["n_bad"] for r in
           check_store(dup, built["catalog"]).collect()}
    assert res["duplicate_copy"] > 0
