"""Feature→tile assignment joins (J1–J6) and extents (A6 groundwork).

Reference pipeline being re-expressed (all shapes per SURVEY.md §2.3):

- J1 node→tile: broadcast cell→tile lookup
  (src/build/sort/Sorter.cpp:189-214, TileCatalog.h:74-82)
- J2 way→nodes: shuffle hash join ways.explode(node_ids) × node cells
  (src/build/sort/Sorter.cpp:225-307)
- J3 TilePair normalization: deepest zoom where the extent spans ≤ 2
  adjacent sibling tiles (TileCatalog.h:114-122, ParentTileLocator.h:23-36)
- J4 ghost fan-out: node-member tiles that are not home tiles
  (Sorter.cpp:330-447)
- J5 relation→members join (Sorter.cpp:457-563)
- J6 super-relation leveling: bounded bottom-up iteration; unresolved
  cycles are cut and counted (SuperRelationResolver.cpp:15-235)

Key scale decision: instead of exploding every (member × zoom) pair, each
feature carries a *cell extent* (min/max zoom-12 cell coords).  min/max
commute with the floor-divisions that derive tile coords at coarser zooms,
so TilePair selection is a pure Column CASE chain over the extent — no
per-zoom shuffle, no UDF.  Extents aggregate with one groupBy per feature
kind and compose upward through relation levels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import sqlgen
from ..config import LEAF_ZOOM
from ..plans.pyramid import TileCatalog, _LADDER
from ..sources.parser import TYPE_NODE, TYPE_RELATION, TYPE_WAY

MAX_RELATION_LEVELS = 8  # reference caps super-relation nesting similarly
                         # (src/build/sort/SuperRelationResolver.cpp:28)


# ---------------------------------------------------------------------------
# extents
# ---------------------------------------------------------------------------

def node_points(nodes_projected: DataFrame) -> DataFrame:
    """(typed_id, id, x, y, cell_col, cell_row) for nodes."""
    return nodes_projected.select(
        (F.col("id") * 4 + TYPE_NODE).alias("typed_id"),
        "id",
        "x",
        "y",
        "cell_col",
        "cell_row",
    )


def way_extents(ways: DataFrame, points: DataFrame) -> DataFrame:
    """J2: explode way node lists, join node coords, aggregate extents.

    Output: (typed_id, id, n_members, n_resolved, minc, minr, maxc, maxr,
             minx, miny, maxx, maxy)
    """
    wm = ways.select(
        "id", F.explode("node_ids").alias("node_id"), F.size("node_ids").alias("nm")
    )
    j = wm.join(
        points.select(
            F.col("id").alias("node_id"), "x", "y", "cell_col", "cell_row"
        ),
        "node_id",
        "left",
    )
    return (
        j.groupBy("id")
        .agg(
            F.max("nm").alias("n_members"),
            F.count("x").alias("n_resolved"),
            F.min("cell_col").alias("minc"),
            F.min("cell_row").alias("minr"),
            F.max("cell_col").alias("maxc"),
            F.max("cell_row").alias("maxr"),
            F.min("x").alias("minx"),
            F.min("y").alias("miny"),
            F.max("x").alias("maxx"),
            F.max("y").alias("maxy"),
        )
        .withColumn("typed_id", F.col("id") * 4 + TYPE_WAY)
        .filter(F.col("n_resolved") >= 1)
    )


_EXT_COLS = ["minc", "minr", "maxc", "maxr", "minx", "miny", "maxx", "maxy"]


def relation_extents(relations: DataFrame, points: DataFrame, wext: DataFrame):
    """J5/J6: resolve member extents bottom-up by level.

    Scale shape (mirrors the reference's split): member resolution for
    *simple* relations (no relation members) is one distributed
    join + aggregate — this is the heavy part (billions of members).
    Relation-in-relation edges are rare and bounded (the reference
    defers them to a dedicated single-threaded resolver,
    src/build/sort/SuperRelationResolver.cpp:15-149); we collect only
    (super_rel → member_rel) edges plus one pre-aggregated extent row per
    super relation to the driver and run the level iteration there.

    Cycles are broken deterministically in ascending-id order (the
    reference scores candidates and tags losers geodesk:removed_refcycles,
    SuperRelationResolver.cpp:152-235; our spec: id order) and flagged
    ``refcycle``.  Self-references are dropped up front
    (Sorter.cpp:490-499).

    Returns (rel_ext, unresolved): ``rel_ext`` = (typed_id, id, level,
    n_members, n_resolved, refcycle, *extent); ``unresolved`` = relations
    with no resolvable member at all.
    """
    spark = relations.sparkSession
    rm = (
        relations.select(
            F.col("id").alias("rel_id"),
            F.size("members").alias("n_members"),
            F.explode("members").alias("m"),
        )
        .select(
            "rel_id",
            "n_members",
            F.col("m.t").cast("int").alias("m_t"),
            (F.col("m.id") * 4 + F.col("m.t").cast("long")).alias("m_typed"),
        )
        .filter(F.col("m_typed") != F.col("rel_id") * 4 + TYPE_RELATION)
        .persist()
    )

    base_ext = points.select(
        "typed_id",
        F.col("cell_col").alias("minc"),
        F.col("cell_row").alias("minr"),
        F.col("cell_col").alias("maxc"),
        F.col("cell_row").alias("maxr"),
        F.col("x").alias("minx"),
        F.col("y").alias("miny"),
        F.col("x").alias("maxx"),
        F.col("y").alias("maxy"),
    ).unionByName(wext.select("typed_id", *_EXT_COLS))

    agg_exprs = [
        F.count("minc").alias("n_resolved"),
        F.min("minc").alias("minc"),
        F.min("minr").alias("minr"),
        F.max("maxc").alias("maxc"),
        F.max("maxr").alias("maxr"),
        F.min("minx").alias("minx"),
        F.min("miny").alias("miny"),
        F.max("maxx").alias("maxx"),
        F.max("maxy").alias("maxy"),
    ]

    # one distributed pass: every relation × its node/way members
    nonrel = rm.filter(F.col("m_t") != TYPE_RELATION)
    nonrel_agg = (
        nonrel.join(base_ext.withColumnRenamed("typed_id", "m_typed"), "m_typed", "left")
        .groupBy("rel_id", "n_members")
        .agg(*agg_exprs)
        .persist()
    )

    # super-relation edge list: small by construction; driver-resolved
    rel_edges = rm.filter(F.col("m_t") == TYPE_RELATION).select(
        "rel_id", "n_members", F.shiftright("m_typed", 2).alias("member_rel")
    )
    edges = rel_edges.toPandas()

    simple_ids = None
    if len(edges) == 0:
        rel_ext = (
            nonrel_agg.filter(F.col("n_resolved") > 0)
            .withColumn("level", F.lit(0))
            .withColumn("refcycle", F.lit(False))
        )
        unresolved = nonrel_agg.filter(F.col("n_resolved") == 0).select("rel_id")
    else:
        super_ids = set(edges.rel_id)
        # extents needed on the driver: the super rels' own non-rel parts +
        # extents of every directly-referenced member relation that is simple
        need_ids = super_ids | set(edges.member_rel)
        need_pdf = nonrel_agg.filter(
            F.col("rel_id").isin([int(i) for i in need_ids])
        ).toPandas()
        drv = {
            int(r.rel_id): {
                "n_members": int(r.n_members),
                "n_resolved": int(r.n_resolved),
                "ext": None
                if r.n_resolved == 0
                else [r.minc, r.minr, r.maxc, r.maxr, r.minx, r.miny, r.maxx, r.maxy],
            }
            for r in need_pdf.itertuples()
        }
        by_super: dict[int, list[int]] = {}
        for r in edges.itertuples():
            by_super.setdefault(int(r.rel_id), []).append(int(r.member_rel))
            drv.setdefault(int(r.rel_id), {"n_members": int(r.n_members),
                                           "n_resolved": 0, "ext": None})

        def merge(a, b):
            if a is None:
                return list(b) if b else None
            if b is None:
                return a
            return [
                min(a[0], b[0]), min(a[1], b[1]), max(a[2], b[2]), max(a[3], b[3]),
                min(a[4], b[4]), min(a[5], b[5]), max(a[6], b[6]), max(a[7], b[7]),
            ]

        resolved_super: dict[int, tuple] = {}
        pending = set(by_super)
        for _ in range(MAX_RELATION_LEVELS):
            # ready: every member that is itself a super-rel is resolved
            ready = [
                s
                for s in pending
                if all(m not in by_super or m in resolved_super for m in by_super[s])
            ]
            if not ready:
                break
            for s in sorted(ready):
                ext = drv[s]["ext"]
                n_res = drv[s]["n_resolved"]
                lv = 0
                for m in by_super[s]:
                    m_ext, m_lv = None, -1
                    if m in resolved_super:
                        m_ext, m_lv = resolved_super[m][0], resolved_super[m][1]
                    elif m in drv and drv[m]["ext"] is not None:
                        m_ext, m_lv = drv[m]["ext"], 0
                    if m_ext is not None:
                        ext = merge(ext, m_ext)
                        n_res += 1
                        lv = max(lv, m_lv)
                resolved_super[s] = (ext, lv + 1, n_res, False)
                pending.discard(s)
        # cycle break: remaining supers resolve in id order with whatever
        # member extents exist so far; flagged refcycle
        for s in sorted(pending):
            ext = drv[s]["ext"]
            n_res = drv[s]["n_resolved"]
            lv = 0
            for m in by_super[s]:
                m_ext = None
                if m in resolved_super and resolved_super[m][0] is not None:
                    m_ext = resolved_super[m][0]
                    lv = max(lv, resolved_super[m][1])
                elif m in drv and drv[m]["ext"] is not None:
                    m_ext = drv[m]["ext"]
                if m_ext is not None:
                    ext = merge(ext, m_ext)
                    n_res += 1
            resolved_super[s] = (ext, lv + 1, n_res, True)

        rows = [
            {
                "rel_id": s,
                "n_members": drv[s]["n_members"],
                "n_resolved": n_res,
                "minc": int(ext[0]), "minr": int(ext[1]),
                "maxc": int(ext[2]), "maxr": int(ext[3]),
                "minx": int(ext[4]), "miny": int(ext[5]),
                "maxx": int(ext[6]), "maxy": int(ext[7]),
                "level": int(lv),
                "refcycle": bool(cyc),
            }
            for s, (ext, lv, n_res, cyc) in resolved_super.items()
            if ext is not None
        ]
        super_df = (
            spark.createDataFrame(
                rows,
                schema="rel_id long, n_members int, n_resolved long, "
                "minc int, minr int, maxc int, maxr int, "
                "minx long, miny long, maxx long, maxy long, "
                "level int, refcycle boolean",
            )
            if rows
            else None
        )
        simple_part = (
            nonrel_agg.join(
                spark.createDataFrame(
                    [(int(s),) for s in super_ids], "rel_id long"
                ),
                "rel_id",
                "left_anti",
            )
            .filter(F.col("n_resolved") > 0)
            .withColumn("level", F.lit(0))
            .withColumn("refcycle", F.lit(False))
        )
        rel_ext = (
            simple_part.unionByName(super_df)
            if super_df is not None
            else simple_part
        )
        resolved_ids = [s for s, v in resolved_super.items() if v[0] is not None]
        # unresolved: simple rels with zero resolvable members, plus supers
        # whose transitive member set resolved to nothing (pure cycles)
        dead_supers = [int(s) for s, v in resolved_super.items() if v[0] is None]
        unresolved = (
            nonrel_agg.filter(F.col("n_resolved") == 0)
            .join(
                spark.createDataFrame(
                    [(int(s),) for s in resolved_ids] or [(-1,)], "rel_id long"
                ),
                "rel_id",
                "left_anti",
            )
            .select("rel_id")
        )
        if dead_supers:
            unresolved = unresolved.unionByName(
                spark.createDataFrame([(s,) for s in dead_supers], "rel_id long")
            ).distinct()

    rel_ext = rel_ext.select(
        (F.col("rel_id") * 4 + TYPE_RELATION).alias("typed_id"),
        F.col("rel_id").alias("id"),
        "level",
        "n_members",
        "n_resolved",
        "refcycle",
        *_EXT_COLS,
    )
    return rel_ext, unresolved


# ---------------------------------------------------------------------------
# TilePair homes (J3) + survivor mapping
# ---------------------------------------------------------------------------

def home_candidates(ext: DataFrame) -> DataFrame:
    """Extent → 1-2 candidate home tiles (zstar, cand_c, cand_r, twin)."""
    e = ext.withColumn("zstar", F.expr(sqlgen.zstar_expr()))
    e = (
        e.withColumn("c0", F.expr(sqlgen.at_zstar_expr("minc")))
        .withColumn("r0", F.expr(sqlgen.at_zstar_expr("minr")))
        .withColumn("c1", F.expr(sqlgen.at_zstar_expr("maxc")))
        .withColumn("r1", F.expr(sqlgen.at_zstar_expr("maxr")))
    )
    cands = e.select(
        "typed_id",
        "zstar",
        F.explode(
            F.when(
                (F.col("c0") == F.col("c1")) & (F.col("r0") == F.col("r1")),
                F.array(F.struct(F.col("c0").alias("c"), F.col("r0").alias("r"),
                                 F.lit(0).alias("twin"))),
            ).otherwise(
                F.array(
                    F.struct(F.col("c0").alias("c"), F.col("r0").alias("r"),
                             F.lit(0).alias("twin")),
                    F.struct(F.col("c1").alias("c"), F.col("r1").alias("r"),
                             F.lit(1).alias("twin")),
                )
            )
        ).alias("cand"),
    ).select(
        "typed_id", "zstar",
        F.col("cand.c").alias("cand_c"),
        F.col("cand.r").alias("cand_r"),
        F.col("cand.twin").alias("twin"),
    )
    return cands


def map_to_survivors(cands: DataFrame, catalog: TileCatalog) -> DataFrame:
    """Candidate (zstar, c, r) → deepest surviving ancestor-or-self tile.

    Broadcast left join per pyramid zoom, guarded by zoom ≤ zstar so the
    walk only goes upward; COALESCE picks the deepest hit, root (0) last.
    Twins that collapse onto the same survivor dedupe to twin 0.
    """
    spark = cands.sparkSession
    res = cands.withColumn(
        "corner_c", F.expr(sqlgen.corner_cell_expr("cand_c"))
    ).withColumn("corner_r", F.expr(sqlgen.corner_cell_expr("cand_r")))
    picks = []
    joined = []
    for zoom in _LADDER:
        s = catalog.survivors(zoom)
        if len(s) == 0:
            continue
        joined.append(zoom)
        name = f"_h{zoom}"
        sdf = spark.createDataFrame(s[["col", "row", "tile_id"]].astype("int64")).select(
            F.col("col").cast("int").alias(f"{name}_c"),
            F.col("row").cast("int").alias(f"{name}_r"),
            F.col("tile_id").cast("int").alias(name),
        )
        d = 1 << (LEAF_ZOOM - zoom)
        res = res.join(
            F.broadcast(sdf),
            (F.col("zstar") >= zoom)
            & (F.expr(f"CAST(floor(corner_c / {d}.0) AS INT)") == F.col(f"{name}_c"))
            & (F.expr(f"CAST(floor(corner_r / {d}.0) AS INT)") == F.col(f"{name}_r")),
            "left",
        )
        picks.append(F.col(name))
    picks.append(F.lit(0))
    res = res.withColumn("tile_id", F.coalesce(*picks).cast("int"))
    res = res.drop(
        *[c for z in joined for c in (f"_h{z}", f"_h{z}_c", f"_h{z}_r")],
        "corner_c", "corner_r", "cand_c", "cand_r",
    )
    # twins collapsing to the same survivor tile dedupe to the lower twin id
    return res.groupBy("typed_id", "tile_id").agg(
        F.min("twin").alias("twin"), F.min("zstar").alias("zstar")
    )


# ---------------------------------------------------------------------------
# full assignment (J1 + J2/J3/J4 + J5/J6)
# ---------------------------------------------------------------------------

def assign_features(
    feats: dict[str, DataFrame], catalog: TileCatalog
) -> dict[str, DataFrame]:
    """Assign every feature to its home tile(s) (+ way ghosts).

    Returns dict with:
      ``points``        — projected nodes (cached upstream by caller)
      ``node_tiles``    — (typed_id, id, tile_id, is_ghost=false, twin=0)
      ``way_homes``     — (typed_id, tile_id, twin, zstar)
      ``way_ghosts``    — (typed_id, tile_id) node-holding tiles ≠ home
      ``rel_homes``     — (typed_id, tile_id, twin, zstar, level)
      ``extents``       — per-feature extent/bbox frame (A6 input)
      ``unresolved_relations`` — cycle-cut relations (J6)
      ``feature_tiles`` — union: (typed_id, tile_id, is_ghost, twin)

    Callers should ``persist()`` the input frames (or read them from a
    checkpoint table): the relation-level loop and the multi-output shape
    re-trigger upstream lineage otherwise.
    """
    from ..functions.mercator import with_projection

    nodes = feats["nodes"]
    proj = with_projection(nodes)
    points = node_points(proj).persist()

    node_tiles = (
        catalog.assign(points)
        .select("typed_id", "id", "tile_id")
        .withColumn("is_ghost", F.lit(False))
        .withColumn("twin", F.lit(0))
    ).persist()

    wext = way_extents(feats["ways"], points).persist()
    way_homes = map_to_survivors(home_candidates(wext), catalog).persist()

    # J4 ghosts: tiles holding member nodes, minus the home tiles
    wm = feats["ways"].select(
        (F.col("id") * 4 + TYPE_WAY).alias("typed_id"),
        F.explode("node_ids").alias("node_id"),
    )
    node_tile_by_id = node_tiles.select(
        F.col("id").alias("node_id"), F.col("tile_id").alias("ntile")
    )
    way_ghosts = (
        wm.join(node_tile_by_id, "node_id")
        .select("typed_id", F.col("ntile").alias("tile_id"))
        .distinct()
        .join(
            way_homes.select("typed_id", "tile_id"),
            ["typed_id", "tile_id"],
            "left_anti",
        )
    )

    rel_ext, unresolved = relation_extents(feats["relations"], points, wext)
    rel_ext = rel_ext.persist()
    rel_homes = map_to_survivors(home_candidates(rel_ext), catalog).join(
        rel_ext.select("typed_id", "level"), "typed_id"
    )

    feature_tiles = (
        node_tiles.select("typed_id", "tile_id", "is_ghost", "twin")
        .unionByName(
            way_homes.select(
                "typed_id", "tile_id", F.lit(False).alias("is_ghost"), "twin"
            )
        )
        .unionByName(
            way_ghosts.select(
                "typed_id", "tile_id", F.lit(True).alias("is_ghost"),
                F.lit(0).alias("twin"),
            )
        )
        .unionByName(
            rel_homes.select(
                "typed_id", "tile_id", F.lit(False).alias("is_ghost"), "twin"
            )
        )
    )

    extents = wext.select(
        "typed_id", "id", "n_members", "n_resolved", *_EXT_COLS
    ).unionByName(
        rel_ext.select("typed_id", "id", "n_members", "n_resolved", *_EXT_COLS)
    )

    return {
        "points": points,
        "node_tiles": node_tiles,
        "way_homes": way_homes,
        "way_ghosts": way_ghosts,
        "rel_homes": rel_homes,
        "extents": extents,
        "unresolved_relations": unresolved,
        "feature_tiles": feature_tiles,
    }
