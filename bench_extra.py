"""Optimization-round instrumentation harness (guide §1.4/§1.5).

NOT part of the driver contract — ``bench.py`` stays the frozen
measurement.  This file exists so each operator can be isolated and
timed with a warm JVM and a noop sink, per
/opt/skills/guides/spark_optimization_guide.md §1.

Modes:
  python bench_extra.py prep            # materialize the stage checkpoints once
  python bench_extra.py assign [N]      # time assign sub-phases N times
  python bench_extra.py stage <name> [N]  # time one downstream stage N times
  python bench_extra.py synth [N]       # time synth_docs with a noop sink
  python bench_extra.py ml [N]          # time dedup_minhash / ann / window

Checkpoints live under /dev/shm/gol_opt_<sf-basename> and are reused
across invocations (they are INPUTS to the timed region, mirroring how
bench.py checkpoints each stage; delete the dir to refresh).
"""

from __future__ import annotations

import json
import os
import sys
import time

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BASE = f"/dev/shm/gol_opt_{os.path.basename(SF.rstrip('/'))}"


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def get_session():
    from geodesk_gol_spark.session import get_spark

    extra = json.loads(os.environ.get("SPARK_GRAFT_EXTRA_CONF", "{}"))
    return get_spark(
        f"local[{CPUS}]", app_name="gol-bench-extra",
        shuffle_partitions=max(8, CPUS),
        extra={"spark.local.dir": "/dev/shm", **extra},
    )


def prep(spark):
    """Materialize docs/features/proj/catalog inputs once (untimed)."""
    from pyspark.sql import functions as F

    from geodesk_gol_spark.functions.mercator import with_projection
    from geodesk_gol_spark.sources.parser import parse_features_unified
    from geodesk_gol_spark.sources.synth import synth_docs

    os.makedirs(BASE, exist_ok=True)
    if not os.path.exists(f"{BASE}/docs/_SUCCESS"):
        synth_docs(spark, SF).write.mode("overwrite").parquet(f"{BASE}/docs")
    docs = spark.read.parquet(f"{BASE}/docs")
    if not os.path.exists(f"{BASE}/features/_SUCCESS"):
        parse_features_unified(docs).write.mode("overwrite").parquet(
            f"{BASE}/features")
    unified = spark.read.parquet(f"{BASE}/features")
    if not os.path.exists(f"{BASE}/proj/_SUCCESS"):
        from geodesk_gol_spark.sources.parser import split_features

        feats = split_features(unified)
        with_projection(feats["nodes"]).select(
            "id", "x", "y", "cell_col", "cell_row"
        ).write.mode("overwrite").parquet(f"{BASE}/proj")
    return docs, unified


def load_catalog(spark):
    from geodesk_gol_spark.config import BuildSettings
    from geodesk_gol_spark.plans.pyramid import build_tile_catalog

    proj = spark.read.parquet(f"{BASE}/proj")
    return build_tile_catalog(proj, BuildSettings.for_fixture(500))


def timed(label, fn, reps=1):
    out = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        out.append(round(time.time() - t0, 2))
    print(f"[{label}] {out} min={min(out)}", flush=True)
    return min(out)


def run_assign(spark, reps):
    """Decompose q_assign: sub-phase times with a warm JVM."""
    import shutil

    from geodesk_gol_spark.operators.assign import assign_features
    from geodesk_gol_spark.sources.parser import split_features

    unified = spark.read.parquet(f"{BASE}/features")
    catalog = load_catalog(spark)
    sc = spark.sparkContext

    for i in range(reps):
        feats = split_features(unified)
        t0 = time.time()
        sc.setJobDescription(f"assign rep{i}")
        asn = assign_features(feats, catalog)
        t_build = time.time() - t0

        from concurrent.futures import ThreadPoolExecutor

        out_dir = f"{BASE}/asn_out"
        shutil.rmtree(out_dir, ignore_errors=True)

        def w(name):
            t = time.time()
            asn[name].write.mode("overwrite").parquet(f"{out_dir}/{name}")
            return time.time() - t

        t1 = time.time()
        with ThreadPoolExecutor(3) as pool:
            futs = {n: pool.submit(w, n)
                    for n in ("feature_tiles", "points", "extents")}
            per = {n: round(f.result(), 2) for n, f in futs.items()}
        t_write = time.time() - t1
        n = spark.read.parquet(f"{out_dir}/feature_tiles").count()
        total = time.time() - t0
        print(f"[assign rep{i}] total={total:.2f} build+eager={t_build:.2f} "
              f"writes={t_write:.2f} {per} rows={n}", flush=True)
        spark.catalog.clearCache()


def run_synth(spark, reps):
    from geodesk_gol_spark.sources.synth import synth_docs

    for i in range(reps):
        spark.sparkContext.setJobDescription(f"synth rep{i}")
        timed(f"synth rep{i}", lambda: noop(synth_docs(spark, SF)))


def run_stage(spark, name, reps):
    """Downstream stages from the prep checkpoints."""
    from pyspark.sql import functions as F

    from geodesk_gol_spark.sources.parser import (
        parse_features_unified,
        split_features,
    )

    docs = spark.read.parquet(f"{BASE}/docs")
    unified = spark.read.parquet(f"{BASE}/features")
    feats = split_features(unified)

    if name == "parse":
        for i in range(reps):
            timed(f"parse rep{i}",
                  lambda: noop(parse_features_unified(docs)))
        return
    if name == "pyramid":
        from geodesk_gol_spark.functions.mercator import with_projection

        def go():
            with_projection(feats["nodes"]).select(
                "id", "x", "y", "cell_col", "cell_row"
            ).write.mode("overwrite").parquet(f"{BASE}/proj_t")
            load_catalog(spark)
        for i in range(reps):
            timed(f"pyramid rep{i}", go)
        return

    # stages needing assign outputs: materialize them once
    need = f"{BASE}/asn_out/feature_tiles"
    if not os.path.exists(need):
        run_assign(spark, 1)
    ft = spark.read.parquet(f"{BASE}/asn_out/feature_tiles")
    points = spark.read.parquet(f"{BASE}/asn_out/points")
    extents = spark.read.parquet(f"{BASE}/asn_out/extents")

    if name == "compile":
        from geodesk_gol_spark.operators.compile_tiles import (
            compile_feature_rows,
        )

        for i in range(reps):
            timed(f"compile rep{i}", lambda: noop(compile_feature_rows(
                ft, points, extents,
                feats["nodes"], feats["ways"], feats["relations"])))
        return
    if name == "store":
        from geodesk_gol_spark.operators.compile_tiles import (
            compile_feature_rows,
            write_store,
        )

        if not os.path.exists(f"{BASE}/rows/_SUCCESS"):
            compile_feature_rows(
                ft, points, extents, feats["nodes"], feats["ways"],
                feats["relations"],
            ).write.mode("overwrite").parquet(f"{BASE}/rows")
        rows = spark.read.parquet(f"{BASE}/rows")
        for i in range(reps):
            timed(f"store rep{i}",
                  lambda: write_store(rows, f"{BASE}/store_t"))
        return
    if name == "knn":
        from geodesk_gol_spark.query.spatial import knn_cell_rings

        pts = points.select("id", "x", "y")
        qs = pts.filter(F.col("id") % 499 == 0).select(
            F.col("id").alias("q_id"), F.col("x").alias("qx"),
            F.col("y").alias("qy"))
        for i in range(reps):
            timed(f"knn rep{i}",
                  lambda: knn_cell_rings(pts, qs, k=5, ring=2).count())
        return
    if name == "contains":
        from geodesk_gol_spark.functions.areas import way_is_area
        from geodesk_gol_spark.query.spatial import contains_join

        aw = feats["ways"].filter(
            way_is_area() & F.col("tags").getItem("leisure").isNotNull())
        whome = ft.filter(
            (F.col("typed_id") % 4 == 1) & ~F.col("is_ghost")
        ).select("typed_id", "tile_id")
        cafes = points.filter(F.col("id") % 173 == 0).join(
            feats["nodes"].filter(
                F.col("tags").getItem("amenity") == "cafe").select("id"),
            "id")
        for i in range(reps):
            timed(f"contains rep{i}", lambda: contains_join(
                cafes, aw, whome, extents, vertices=points).count())
        return
    if name == "goql":
        from geodesk_gol_spark.operators.compile_tiles import (
            compile_feature_rows,
            write_store,
        )
        from geodesk_gol_spark.query.goql import goql_to_column
        from geodesk_gol_spark.query.spatial import bbox_filter

        if not os.path.exists(f"{BASE}/store_t/_SUCCESS"):
            if not os.path.exists(f"{BASE}/rows/_SUCCESS"):
                compile_feature_rows(
                    ft, points, extents, feats["nodes"], feats["ways"],
                    feats["relations"],
                ).write.mode("overwrite").parquet(f"{BASE}/rows")
            write_store(spark.read.parquet(f"{BASE}/rows"),
                        f"{BASE}/store_t")
        store = spark.read.parquet(f"{BASE}/store_t")
        catalog = load_catalog(spark)

        def go():
            q = store.filter(
                ~F.col("is_ghost") & goql_to_column("w[highway][name=A*]"))
            bbox_filter(q, catalog, 1100000000, 600000000, 1200000000,
                        700000000).select("typed_id").distinct().count()
        for i in range(reps):
            timed(f"goql rep{i}", go)
        return
    raise SystemExit(f"unknown stage {name}")


def run_ml(spark, reps):
    from geodesk_gol_spark.operators import mldf

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    events = spark.read.parquet(f"{SF}/events.parquet")
    for i in range(reps):
        def dm():
            sh2 = mldf.capped_shingles(docs).localCheckpoint()
            mldf.dedup_minhash(docs, sh2=sh2).count()
        timed(f"dedup_minhash rep{i}", dm)
        timed(f"ann_topk rep{i}",
              lambda: mldf.ann_cosine_topk(emb).count())
        timed(f"window_agg rep{i}",
              lambda: mldf.window_agg(events).count())


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "prep"
    spark = get_session()
    try:
        prep(spark)
        if mode == "prep":
            print("prep done")
        elif mode == "assign":
            run_assign(spark, int(sys.argv[2]) if len(sys.argv) > 2 else 3)
        elif mode == "synth":
            run_synth(spark, int(sys.argv[2]) if len(sys.argv) > 2 else 3)
        elif mode == "ml":
            run_ml(spark, int(sys.argv[2]) if len(sys.argv) > 2 else 3)
        elif mode == "stage":
            run_stage(spark, sys.argv[2],
                      int(sys.argv[3]) if len(sys.argv) > 3 else 3)
        else:
            raise SystemExit(f"unknown mode {mode}")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
