"""``gol info`` / ``gol get`` analogues: store summary + fetch-by-id.

Reference: InfoCommand prints store revision, bbox, feature/tile counts
(/root/reference/src/gol/InfoCommand.cpp:38-118); GetCommand fetches
features by typed id spec like ``n123 w45`` (src/gol/GetCommand.cpp).
The revision/timestamp half of ``info`` lives in the replication state
sidecar here (streaming/replication.write_state) — the parquet store
itself is immutable snapshots.

Both are single declarative plans: info is one aggregate pass over the
store (plus a distinct-count for tiles); get is an IN-filter that
Catalyst pushes into the parquet scan (row-group pruning on typed_id at
scale because the store is typed_id-sorted within tiles).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SPEC_RE = re.compile(r"^([nwr])(\d+)$")
_TYPE_CODE = {"n": 0, "w": 1, "r": 2}


def parse_feature_specs(specs: list[str]) -> list[int]:
    """``["n123", "w45"]`` → typed ids (id*4 + type)."""
    out = []
    for s in specs:
        m = _SPEC_RE.match(s.strip())
        if not m:
            raise ValueError(f"bad feature spec {s!r} (want n<id>/w<id>/r<id>)")
        out.append(int(m.group(2)) * 4 + _TYPE_CODE[m.group(1)])
    return out


def get_features(store: DataFrame, specs: list[str]) -> DataFrame:
    """Fetch home copies by spec — one pushed-down IN filter."""
    typed = parse_feature_specs(specs)
    return (
        store.filter(~F.col("is_ghost") & F.col("typed_id").isin(typed))
        .select("typed_id", "ftype", "id", "tile_id", "tags")
        .dropDuplicates(["typed_id", "tile_id"])
    )


def members_of(relations: DataFrame, role: str | None = None) -> DataFrame:
    """Relation → member navigation: one row per (parent, member) in
    member order, optionally filtered to one role.

    The reference walks members with an iterator per relation (member
    type/ref/role emission, src/gol/query/XmlQueryPrinter.cpp:203-215;
    TRelation member storage, src/tile/model/TRelation.cpp).  Spark
    shape: one ``posexplode`` over the members array — narrow (no
    shuffle), ordinal preserved from array position, role filter pushed
    below everything downstream.
    """
    m = relations.select(
        (F.col("id") * 4 + 2).alias("parent_typed_id"),
        F.posexplode("members").alias("ordinal", "m"),
    ).select(
        "parent_typed_id",
        "ordinal",
        (F.col("m.id") * 4 + F.col("m.t")).alias("member_typed_id"),
        F.col("m.role").alias("role"),
    )
    if role is not None:
        m = m.filter(F.col("role") == role)
    return m


def nodes_of(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """Way → node navigation: one row per (way, ordinal, node) in way
    order with the node's coordinates — the reference's anonymous-node
    walk (WayNodeIterator over packed coordinate deltas,
    src/gol/query/XmlQueryPrinter.cpp:203-215 emits the same ``<nd>``
    stream; geometry assembly does the equivalent join in
    query/formats.way_wkt).

    Spark shape: narrow ``posexplode`` of the node-id array, then ONE
    equi-join on node id to attach coordinates — the same key the J2
    geometry join shuffles on, so at scale the two share a
    co-partitioning.  Closed rings keep their repeated closing node
    (one row per array slot, not per distinct node).
    """
    m = ways.select(
        (F.col("id") * 4 + 1).alias("way_typed_id"),
        F.posexplode("node_ids").alias("ordinal", "node_id"),
    )
    coords = nodes.select(
        F.col("id").alias("node_id"), "lon100nd", "lat100nd"
    )
    return m.join(coords, "node_id").select(
        "way_typed_id",
        F.col("ordinal").cast("int").alias("ordinal"),
        "node_id",
        "lon100nd",
        "lat100nd",
    )


def parents_of(relations: DataFrame, targets: DataFrame) -> DataFrame:
    """Feature → parent-relation navigation (the inverse of
    :func:`members_of`): direct parents of each target feature.

    ``targets`` carries one ``typed_id`` column.  The member stream is
    the big side; the target set joins as a broadcast semi-ish inner
    join so the explode never shuffles — at 10^12 scale the exploded
    members stay partition-local and only the (small) query set moves.
    """
    mem = members_of(relations)
    t = targets.select(F.col("typed_id").alias("member_typed_id")).distinct()
    return mem.join(F.broadcast(t), "member_typed_id").select(
        F.col("member_typed_id").alias("typed_id"),
        "parent_typed_id",
        "role",
        "ordinal",
    )


def store_info(store: DataFrame) -> DataFrame:
    """One summary row: distinct feature counts per type, ghost copies,
    populated tiles, and the world bbox of all home copies."""
    home = ~F.col("is_ghost")
    return store.agg(
        F.count_distinct(F.when((F.col("ftype") == 0) & home,
                                F.col("typed_id"))).alias("n_nodes"),
        F.count_distinct(F.when((F.col("ftype") == 1) & home,
                                F.col("typed_id"))).alias("n_ways"),
        F.count_distinct(F.when((F.col("ftype") == 2) & home,
                                F.col("typed_id"))).alias("n_relations"),
        F.sum(F.col("is_ghost").cast("long")).alias("n_ghost_copies"),
        F.count_distinct("tile_id").alias("n_tiles"),
        F.min(F.when(home, F.col("minx"))).alias("minx"),
        F.min(F.when(home, F.col("miny"))).alias("miny"),
        F.max(F.when(home, F.col("maxx"))).alias("maxx"),
        F.max(F.when(home, F.col("maxy"))).alias("maxy"),
    )
