"""Gate context: one cached engine build per (SparkSession, sf_dir).

The driver calls every ``queries()`` entry independently with
(spark, sf_dir); rebuilding the synthesis → parse → pyramid → assignment
chain per query would be O(queries × build).  This module memoizes the
persisted frames so the build happens once per scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import BuildSettings
from .functions.mercator import with_projection
from .operators import validate as V
from .operators.assign import assign_features, node_points
from .operators.compile_tiles import compile_feature_rows
from .plans.pyramid import TileCatalog, build_tile_catalog
from .sources.parser import parse_features
from .sources.synth import synth_docs

DENSITY = 500  # fixture-scale min_tile_density (reference default 75 000
               # is planet-scale; BuildSettings.h:165)

_CTX: dict[tuple[int, str], dict] = {}


def ctx(spark: SparkSession, sf_dir: str) -> dict:
    key = (id(spark), sf_dir.rstrip("/"))
    if key in _CTX:
        return _CTX[key]
    settings = BuildSettings.for_fixture(DENSITY)
    docs = synth_docs(spark, sf_dir).persist()
    feats = {k: v.persist() for k, v in parse_features(docs).items()}
    proj = with_projection(feats["nodes"]).persist()
    catalog = build_tile_catalog(proj, settings)
    asn = assign_features(feats, catalog)
    for k in ("feature_tiles", "extents", "node_tiles", "way_homes",
              "way_ghosts", "rel_homes"):
        asn[k] = asn[k].persist()
    store = compile_feature_rows(
        asn["feature_tiles"], asn["points"], asn["extents"],
        feats["nodes"], feats["ways"], feats["relations"],
    ).persist()
    exports = V.export_tables(
        feats["ways"], feats["relations"],
        asn["node_tiles"].select("typed_id", "tile_id"),
        asn["way_homes"], asn["rel_homes"],
    ).persist()
    c = {
        "settings": settings,
        "docs": docs,
        "feats": feats,
        "proj": proj,
        "points": asn["points"],
        "catalog": catalog,
        "assignment": asn,
        "store": store,
        "exports": exports,
    }
    _CTX[key] = c
    return c


def base_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    names = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}
