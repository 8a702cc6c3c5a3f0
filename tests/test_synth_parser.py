"""Interleaved-document synthesis + span parser tests.

Covers: span-sequence invariant (kind, text, media_ref, order) through a
forced shuffle; offsets strictly increasing; parsed features bit-equal to
the independent DuckDB derivation from the base tables.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from geodesk_gol_spark import sqlgen
from geodesk_gol_spark.sources.parser import parse_features, reconstruct_spans
from geodesk_gol_spark.sources.synth import synth_docs

from .conftest import SF_DIR, assert_frames_equal


@pytest.fixture(scope="module")
def docs(spark):
    d = synth_docs(spark, SF_DIR)
    d.persist()
    d.count()
    return d


@pytest.fixture(scope="module")
def feats(docs):
    return parse_features(docs)


def test_doc_counts(docs, duck):
    n_orders = duck.execute("SELECT count(*) FROM orders").fetchone()[0]
    n_cust = duck.execute("SELECT count(*) FROM customer").fetchone()[0]
    assert docs.count() == n_orders + n_cust + 25 + 5


def test_offsets_strictly_increasing(spark, docs):
    ex = docs.select(F.posexplode("spans").alias("i", "s"))
    bad = (
        docs.select("doc_id", F.posexplode("spans").alias("i", "s"))
        .withColumn(
            "prev",
            F.lag("s.offset").over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("doc_id")
                .orderBy("i")
            ),
        )
        .filter(F.col("prev").isNotNull() & (F.col("s.offset") <= F.col("prev")))
        .count()
    )
    assert bad == 0


def test_span_roundtrip_invariant(docs):
    """Explode → shuffle → regroup reproduces spans exactly (north rule)."""
    rt = reconstruct_spans(docs)
    orig = docs.select("doc_id", F.col("spans").alias("orig"))
    joined = rt.join(orig, "doc_id")
    mismatches = joined.filter(
        F.to_json(F.col("spans")) != F.to_json(F.col("orig"))
    ).count()
    assert mismatches == 0
    assert rt.count() == docs.count()


def test_parsed_nodes_match_oracle(feats, duck):
    got = feats["nodes"].selectExpr(
        "id",
        "lon100nd",
        "lat100nd",
        "tags['highway'] AS highway",
        "tags['name'] AS name",
        "tags['amenity'] AS amenity",
    )
    want = duck.execute(
        f"SELECT id, lon100nd, lat100nd, highway, name, amenity "
        f"FROM ({sqlgen.nodes_select()})"
    )
    assert_frames_equal(got, want, ["id"])


def test_parsed_way_members_match_oracle(feats, duck):
    got = feats["ways"].select(
        F.col("id").alias("way_id"), F.posexplode("node_ids").alias("seq", "node_id")
    )
    want = duck.execute(sqlgen.way_members_select())
    assert_frames_equal(got, want, ["way_id", "seq"])


def test_parsed_relations_match_oracle(feats, duck):
    got = feats["relations"].select(
        F.col("id").alias("rel_id"),
        F.posexplode("members").alias("seq", "m"),
    ).select(
        "rel_id",
        "seq",
        F.col("m.t").cast("int").alias("member_type"),
        F.col("m.id").alias("member_id"),
    )
    want = duck.execute(
        f"SELECT rel_id, seq, member_type, member_id FROM ("
        f"{sqlgen.relation_members_select()} UNION ALL "
        f"{sqlgen.super_relation_members_select()})"
    )
    assert_frames_equal(got, want, ["rel_id", "seq"])


def test_noise_spans_pass_through(docs):
    ex = docs.select(F.explode("spans").alias("s"))
    kinds = {r["kind"] for r in ex.select("s.kind").distinct().collect()}
    assert kinds == {"text", "media", "node", "way", "relation"}


def test_unified_parse_equals_per_kind(spark, docs, feats):
    """parse_features_unified + split_features ≡ parse_features (the
    single-scan path bench/gate/pipeline use must not drift from the
    reference per-kind semantics)."""
    from geodesk_gol_spark.sources.parser import (
        parse_features_unified,
        split_features,
    )

    uni = split_features(parse_features_unified(docs))
    for kind in ("nodes", "ways", "relations", "media"):
        a = feats[kind].toPandas().sort_values(
            ["doc_id", "span_seq"]).reset_index(drop=True)
        b = uni[kind].toPandas().sort_values(
            ["doc_id", "span_seq"]).reset_index(drop=True)
        assert a.columns.tolist() == b.columns.tolist(), kind
        assert len(a) == len(b), kind
        import pandas as pd

        pd.testing.assert_frame_equal(a, b, check_like=True)
