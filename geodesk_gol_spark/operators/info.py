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
