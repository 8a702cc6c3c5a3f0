"""End-to-end GOL-build pipeline with per-stage checkpoints (resume),
per-partition lineage and a metrics table.

Mirrors the reference's four-phase build with restartable phases
(/root/reference/src/build/GolBuilder.cpp:61-115: ANALYZE → SORT →
VALIDATE → COMPILE, resumable via persisted work files): each stage here
writes a parquet checkpoint; a re-run skips stages whose checkpoint
exists (idempotent stage reruns = the reference's startPhase).

Stages:
  1 docs        — interleaved-document synthesis (or a user-provided table)
  2 features    — parsed nodes/ways/relations (+ span lineage)
  3 catalog     — tile pyramid (A1/A4/A5)
  4 assignment  — feature_tiles + extents (J1-J6)
  5 validate    — exports (J7/J8), synthetic tags (A9), bboxes (A6)
  6 store       — Hilbert-clustered per-tile parquet store (O1/O4/S4)

The metrics table doubles as skew evidence: per-tile row counts are
recorded every build (north-rule lineage + metrics requirement).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import BuildSettings
from ..functions.mercator import with_projection
from ..operators import validate as V
from ..operators.assign import assign_features
from ..operators.compile_tiles import (
    compile_feature_rows,
    write_store,
    write_store_resumable,
)
from ..plans.pyramid import TileCatalog, build_tile_catalog
from ..sources.parser import parse_features_unified, split_features
from ..sources.synth import synth_docs


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


@dataclass
class BuildResult:
    out_dir: str
    catalog: TileCatalog
    metrics: list[dict]

    def store_path(self) -> str:
        return os.path.join(self.out_dir, "store")


def build_gol(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    settings: BuildSettings | None = None,
    resume: bool = True,
) -> BuildResult:
    """Run (or resume) the full build; returns catalog + metrics."""
    settings = settings or BuildSettings.for_fixture()
    os.makedirs(out_dir, exist_ok=True)
    metrics: list[dict] = []

    def record(stage: str, t0: float, **kw):
        metrics.append(
            {"stage": stage, "seconds": round(time.time() - t0, 3), **kw}
        )

    # -- stage 1: docs ------------------------------------------------------
    docs_path = os.path.join(out_dir, "docs")
    if not (resume and _done(docs_path)):
        t0 = time.time()
        synth_docs(spark, sf_dir).write.mode("overwrite").parquet(docs_path)
        record("docs", t0)
    docs = spark.read.parquet(docs_path)

    # -- stage 2: features --------------------------------------------------
    feat_paths = {k: os.path.join(out_dir, f"features_{k}") for k in
                  ("nodes", "ways", "relations", "media")}
    uni_path = os.path.join(out_dir, "features_unified")
    if not (resume and all(_done(p) for p in feat_paths.values())):
        t0 = time.time()
        # one scan+parse of docs checkpointed once, then per-kind writes
        # off the (much smaller) unified table
        parse_features_unified(docs).write.mode("overwrite").parquet(uni_path)
        feats = split_features(spark.read.parquet(uni_path))
        for k, p in feat_paths.items():
            feats[k].write.mode("overwrite").parquet(p)
        record("features", t0)
    feats = {k: spark.read.parquet(p) for k, p in feat_paths.items()}

    # -- stage 3: catalog ---------------------------------------------------
    cat_path = os.path.join(out_dir, "tile_catalog")
    proj = with_projection(feats["nodes"]).persist()
    if not (resume and _done(cat_path)):
        t0 = time.time()
        catalog = build_tile_catalog(proj, settings)
        catalog.df(spark).coalesce(1).write.mode("overwrite").parquet(cat_path)
        record("catalog", t0, tiles=len(catalog.tiles))
    else:
        tiles = spark.read.parquet(cat_path).toPandas()
        catalog = TileCatalog(settings=settings, tiles=tiles)

    # -- stage 4: assignment ------------------------------------------------
    asn_paths = {
        k: os.path.join(out_dir, k)
        for k in ("feature_tiles", "extents", "node_tiles", "way_homes", "rel_homes")
    }
    if not (resume and all(_done(p) for p in asn_paths.values())):
        t0 = time.time()
        res = assign_features(feats, catalog)
        for k, p in asn_paths.items():
            res[k].write.mode("overwrite").parquet(p)
        # J6 driver-residue meters ride into the metrics table so a
        # pathological super-relation corpus is visible, not silent
        record("assignment", t0, **res.get("j6_stats", {}))
    asn = {k: spark.read.parquet(p) for k, p in asn_paths.items()}

    # -- stage 5: validate --------------------------------------------------
    val_path = os.path.join(out_dir, "tile_exports")
    stub_path = os.path.join(out_dir, "foreign_stubs")
    tag_path = os.path.join(out_dir, "synthetic_tags")
    if not (resume and _done(val_path) and _done(stub_path)
            and _done(tag_path)):
        t0 = time.time()
        exports = V.export_tables(
            feats["ways"], feats["relations"],
            asn["node_tiles"], asn["way_homes"], asn["rel_homes"],
        )
        exports.write.mode("overwrite").parquet(val_path)
        V.foreign_ref_stubs(
            feats["ways"], feats["relations"],
            asn["node_tiles"], asn["way_homes"], asn["rel_homes"],
        ).write.mode("overwrite").parquet(stub_path)
        from ..operators.assign import node_points

        pts = node_points(proj)
        tags = (
            V.duplicate_location_nodes(pts)
            .unionByName(V.orphan_nodes(feats["nodes"], feats["ways"], feats["relations"]))
            .unionByName(V.missing_member_tags(asn["extents"]))
        )
        tags.write.mode("overwrite").parquet(tag_path)
        record("validate", t0)

    # -- stage 6: store -----------------------------------------------------
    # 6a: checkpoint the compiled rows ONCE, range-partitioned on tile_id
    # so every batch filter below prunes row groups instead of rescanning
    # the corpus (total batch scan cost stays O(N)).
    store_input = os.path.join(out_dir, "store_input")
    store_path = os.path.join(out_dir, "store")
    lineage_path = os.path.join(out_dir, "lineage")
    if not (resume and _done(store_input)):
        t0 = time.time()
        from ..operators.assign import node_points

        rows = compile_feature_rows(
            asn["feature_tiles"],
            node_points(proj),
            asn["extents"],
            feats["nodes"], feats["ways"], feats["relations"],
        )
        (
            rows.repartitionByRange(
                int(settings.shuffle_partitions), "tile_id", "hilbert"
            ).write.mode("overwrite").parquet(store_input)
        )
        record("store_input", t0)

    # 6b: per-tile-range checkpointed store write (north rule "resumable
    # from per-tile checkpoints"): each contiguous tile-id batch is an
    # independent transaction; a killed build redoes only uncommitted
    # batches.  Per-batch lineage + per-tile row counts land in the
    # ``lineage`` table (north rule "per-partition lineage").
    if not (resume and _done(store_path) and _done(lineage_path)):
        t0 = time.time()
        batch_lineage = write_store_resumable(
            spark.read.parquet(store_input), store_path, catalog.tiles,
            settings.shuffle_partitions, n_batches=settings.store_batches,
        )
        store_df = spark.read.parquet(store_path)
        per_tile = store_df.groupBy("tile_id").count()
        tile_rows = per_tile.selectExpr(
            "'store_tile' AS stage",
            "CAST(NULL AS INT) AS batch",
            "CAST(NULL AS LONG) AS tile_lo",
            "CAST(NULL AS LONG) AS tile_hi",
            "CAST(NULL AS DOUBLE) AS seconds",
            "CAST(NULL AS BOOLEAN) AS resumed",
            "CAST(tile_id AS INT) AS tile_id",
            "CAST(count AS LONG) AS n_rows",
        )
        batch_rows = spark.createDataFrame(
            [(b["stage"], b["batch"], b["tile_lo"], b["tile_hi"],
              b["seconds"], b["resumed"], None, b["rows"])
             for b in batch_lineage],
            "stage string, batch int, tile_lo long, tile_hi long, "
            "seconds double, resumed boolean, tile_id int, n_rows long",
        )
        tile_rows.unionByName(batch_rows).coalesce(1).write.mode(
            "overwrite"
        ).parquet(lineage_path)
        record(
            "store", t0, batches=len(batch_lineage),
            batches_resumed=sum(1 for b in batch_lineage if b["resumed"]),
        )

    # -- stage 7: integrity check (gol check analogue) ----------------------
    t0 = time.time()
    from ..operators.check import check_store

    store_df = spark.read.parquet(store_path)
    checks = {
        r["invariant"]: int(r["n_bad"])
        for r in check_store(
            store_df, catalog,
            spark.read.parquet(val_path), spark.read.parquet(stub_path),
        ).collect()
    }
    record("check", t0, **checks)

    # -- metrics (incl. per-tile skew evidence) -----------------------------
    # derived from the lineage table's per-tile rows — the store is not
    # rescanned; lineage IS the per-partition evidence
    t0 = time.time()
    per_tile = (
        spark.read.parquet(lineage_path)
        .filter(F.col("stage") == "store_tile")
        .select("tile_id", F.col("n_rows").alias("count"))
    )
    skew = per_tile.agg(
        F.count("*").alias("tiles"),
        F.max("count").alias("max_tile_rows"),
        F.expr("percentile_approx(count, 0.5)").alias("p50_tile_rows"),
        F.sum("count").alias("total_rows"),
    ).collect()[0]
    record(
        "metrics", t0,
        tiles=int(skew["tiles"]), max_tile_rows=int(skew["max_tile_rows"]),
        p50_tile_rows=int(skew["p50_tile_rows"]), total_rows=int(skew["total_rows"]),
    )
    with open(os.path.join(out_dir, "metrics.jsonl"), "a") as f:
        for m in metrics:
            f.write(json.dumps(m) + "\n")
    proj.unpersist()
    return BuildResult(out_dir=out_dir, catalog=catalog, metrics=metrics)
