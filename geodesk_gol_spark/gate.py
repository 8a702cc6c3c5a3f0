"""Gate context: one cached engine build per (SparkSession, sf_dir).

The driver calls every ``queries()`` entry independently with
(spark, sf_dir); rebuilding the synthesis → parse → pyramid → assignment
chain per query would be O(queries × build).  Two cache layers:

1. **Disk** (``.gatecache/<sf>-<code-fingerprint>/``): the first build at
   a scale factor materializes every context frame to parquet; later
   calls — *including calls from a fresh process*, e.g. a per-query
   driver harness — load the parquet directly.  The fingerprint is a
   hash of the package source, so any code change invalidates the cache
   automatically.  This is also the engine's checkpoint/resume story in
   miniature: every stage output is a restartable parquet table.
2. **Memory** (module dict): repeat calls in one process return the same
   DataFrame objects.

Reading the context back from parquet (rather than keeping the live
lineage) also gives each gate query a short, column-prunable scan plan
instead of the full build DAG.
"""

from __future__ import annotations

import hashlib
from pathlib import Path

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .config import BuildSettings
from .functions.mercator import with_projection
from .operators import validate as V
from .operators.assign import assign_features, node_points
from .operators.compile_tiles import compile_feature_rows
from .plans.pyramid import TileCatalog, build_tile_catalog
from .sources.synth import synth_docs

DENSITY = 500  # fixture-scale min_tile_density (reference default 75 000
               # is planet-scale; BuildSettings.h:165)

_CTX: dict[tuple[int, str], dict] = {}
_PKG = Path(__file__).resolve().parent

# context frames persisted to / loaded from the disk cache
_FRAMES = (
    "docs", "nodes", "ways", "relations", "media", "proj", "points", "node_tiles",
    "way_homes", "way_ghosts", "rel_homes", "extents", "feature_tiles",
    "unresolved_relations", "store", "exports", "stubs",
)


def _code_fingerprint() -> str:
    h = hashlib.sha256()
    for p in sorted(_PKG.rglob("*.py")):
        h.update(p.read_bytes())
    return h.hexdigest()[:12]


def _data_fingerprint(sf_dir: str) -> str:
    """Cheap input-identity hash: absolute path + (name, size, mtime) of
    every base parquet.  Regenerated-in-place testdata or two different
    trees sharing a basename must not reuse each other's context."""
    h = hashlib.sha256(str(Path(sf_dir).resolve()).encode())
    for p in sorted(Path(sf_dir).glob("*.parquet")):
        st = p.stat()
        h.update(f"{p.name}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:8]


def _cache_dir(sf_dir: str) -> Path:
    name = Path(sf_dir.rstrip("/")).name or "sf"
    return (_PKG.parent / ".gatecache"
            / f"{name}-{_code_fingerprint()}-{_data_fingerprint(sf_dir)}")


def derived_cache_dir(sf_dir: str, prefix: str) -> Path:
    """Cache dir for artifacts DERIVED from a gate context (memoized
    archives etc.) — same identity rule as the context itself (code AND
    data fingerprint; a regenerated-in-place testdata tree must not
    reuse a stale archive), same relocatable root."""
    name = Path(sf_dir.rstrip("/")).name or "sf"
    return (_PKG.parent / ".gatecache"
            / f"{prefix}_{name}-{_code_fingerprint()}"
              f"-{_data_fingerprint(sf_dir)}")


def _materialize(spark: SparkSession, sf_dir: str) -> Path:
    """Build once, checkpointing STAGE BY STAGE to parquet.

    Each stage reads the previous stage's parquet rather than extending
    one giant logical plan: the synth expressions are large CASE chains,
    and re-analyzing them per downstream action costs far more than the
    sf0.001/0.01 data itself.  Staged checkpoints cap plan size AND make
    every stage independently resumable.
    """
    d = _cache_dir(sf_dir)
    # per-process staging dir: two concurrent builders of the same
    # (sf, fingerprint) must not rmtree/overwrite each other's in-flight
    # writes (concurrent Spark overwrites of one dir can leave a union
    # of both jobs' part-files); the rename below keeps the existing
    # lost-the-race check.
    import os

    tmp = d.with_name(f"{d.name}.tmp.{os.getpid()}")
    if tmp.exists():
        import shutil

        shutil.rmtree(tmp)

    import time

    prof = os.environ.get("SPARK_GRAFT_GATE_PROFILE")

    def w(name: str, df: DataFrame) -> DataFrame:
        t0 = time.time()
        df.write.mode("overwrite").parquet(str(tmp / name))
        if prof:
            print(f"[gate] {name} {time.time() - t0:.1f}s", flush=True)
        return spark.read.parquet(str(tmp / name))

    settings = BuildSettings.for_fixture(DENSITY)
    docs = w("docs", synth_docs(spark, sf_dir))
    # one scan+parse of docs, then 4 cheap per-kind writes off the
    # unified checkpoint (was: 4 independent scans of docs)
    from .sources.parser import parse_features_unified, split_features

    unified = w("features_unified", parse_features_unified(docs))

    # independent leaf writes run as concurrent Spark jobs (latency = max,
    # not sum); ordering between waves preserves persist-population order
    # so concurrent siblings never race to compute the same upstream
    from concurrent.futures import ThreadPoolExecutor

    def wave(pairs: list[tuple[str, DataFrame]]) -> dict[str, DataFrame]:
        with ThreadPoolExecutor(len(pairs)) as pool:
            futs = {n: pool.submit(w, n, df) for n, df in pairs}
            return {n: f.result() for n, f in futs.items()}

    feats = wave(list(split_features(unified).items()))
    proj = w("proj", with_projection(feats["nodes"]))
    catalog = build_tile_catalog(proj, settings)
    asn = assign_features(feats, catalog)
    # sequential: each write populates a persist the next frames reuse
    # (extents materializes the wext and rel_ext persists the wave's
    # rel_homes/feature_tiles siblings would otherwise race to compute)
    for name in ("points", "node_tiles", "way_homes", "extents"):
        asn[name] = w(name, asn[name])
    asn.update(wave([(n, asn[n]) for n in (
        "way_ghosts", "rel_homes", "feature_tiles",
        "unresolved_relations")]))
    wave([
        ("store", compile_feature_rows(
            asn["feature_tiles"], asn["points"], asn["extents"],
            feats["nodes"], feats["ways"], feats["relations"],
        )),
        ("exports", V.export_tables(
            feats["ways"], feats["relations"],
            asn["node_tiles"].select("typed_id", "tile_id"),
            asn["way_homes"], asn["rel_homes"],
        )),
        ("stubs", V.foreign_ref_stubs(
            feats["ways"], feats["relations"],
            asn["node_tiles"].select("typed_id", "tile_id"),
            asn["way_homes"], asn["rel_homes"],
        )),
    ])
    catalog.tiles.to_parquet(tmp / "catalog_tiles.parquet")
    spark.catalog.clearCache()
    # atomic publish: rename may race another builder finishing first —
    # a bare exists() check is not enough (both can pass it before either
    # renames); losing the race means theirs is fine, discard ours
    try:
        tmp.rename(d)
    except OSError:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    _prune_stale(d)
    return d


def _prune_stale(current: Path) -> None:
    """Drop cache dirs for the same sf with a DIFFERENT fingerprint —
    every code or data change mints a new fingerprint and the old dirs
    (plus their derived archive/tiledump caches) are unreachable
    forever.  Only siblings sharing this sf's name-prefix are touched;
    in-flight .tmp.<pid> staging dirs of live builders are left alone."""
    import re
    import shutil

    # cache names end in "-<12-hex code fp>-<8-hex data fp>"; the sf name
    # itself may contain dashes, so strip the fixed-length suffix rather
    # than splitting on the first dash (which would make e.g. "tpch-sf1"
    # and "tpch-sf10" prune each other's live caches).
    fp_re = re.compile(r"-([0-9a-f]{12})-([0-9a-f]{8})$")
    cur_m = fp_re.search(current.name)
    if not cur_m:
        return
    sf_name = current.name[: cur_m.start()]
    cur_fp = cur_m.group(0)
    root = current.parent
    for p in root.iterdir():
        if p == current or ".tmp." in p.name:
            continue
        m = fp_re.search(p.name)
        if not m:
            continue
        stem = p.name[: m.start()]
        # ctx caches: "<sf>-fp"; derived caches: "<prefix>_<sf>-fp"
        if stem == sf_name or stem.endswith(f"_{sf_name}"):
            if m.group(0) != cur_fp:
                shutil.rmtree(p, ignore_errors=True)


def ctx(spark: SparkSession, sf_dir: str) -> dict:
    # keyed by applicationId, not id(spark): a stopped session's object
    # address can be recycled by a new session, which would hand out
    # DataFrames bound to the dead context (same hazard gate_ml's
    # component/matview caches already guard against)
    key = (spark.sparkContext.applicationId, sf_dir.rstrip("/"))
    if key in _CTX:
        return _CTX[key]
    d = _cache_dir(sf_dir)
    if not d.exists():
        _materialize(spark, sf_dir)
    frames = {n: spark.read.parquet(str(d / n)) for n in _FRAMES}
    settings = BuildSettings.for_fixture(DENSITY)
    catalog = TileCatalog(
        settings=settings, tiles=pd.read_parquet(d / "catalog_tiles.parquet")
    )
    c = {
        "settings": settings,
        "docs": frames["docs"],
        "feats": {
            "nodes": frames["nodes"],
            "ways": frames["ways"],
            "relations": frames["relations"],
            "media": frames["media"],
        },
        "proj": frames["proj"],
        "points": frames["points"],
        "catalog": catalog,
        "assignment": {
            "points": frames["points"],
            "node_tiles": frames["node_tiles"],
            "way_homes": frames["way_homes"],
            "way_ghosts": frames["way_ghosts"],
            "rel_homes": frames["rel_homes"],
            "extents": frames["extents"],
            "feature_tiles": frames["feature_tiles"],
            "unresolved_relations": frames["unresolved_relations"],
        },
        "store": frames["store"],
        "exports": frames["exports"],
        "stubs": frames["stubs"],
    }
    _CTX[key] = c
    return c


def base_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    names = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}
