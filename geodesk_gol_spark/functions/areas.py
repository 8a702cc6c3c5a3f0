"""Area classification (F7) and closed-ring detection (F8).

Reference: a closed way is an *area* if its tags hit the area-rule table
(default rules /root/reference/src/tag/AreaClassifier.cpp:11-39 — keys
like building/landuse/leisure/... with per-key exceptions); relations are
areas when typed as multipolygon/boundary (way check
Compiler.cpp:383-389, relation check :766-772).  Ring detection: first
node id == last node id, <3 distinct nodes rejected
(src/build/sort/Sorter.cpp:274-291).

Our spec keeps the shape with a compact rule table (pure Column exprs):
- way: closed ring AND any area key present, where ``highway`` ∉ area keys
- relation: has ``boundary`` tag, or tags['type'] ∈ {multipolygon, boundary}
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

AREA_KEYS = ("building", "landuse", "leisure", "amenity", "natural", "boundary")


def closed_ring(node_ids: str = "node_ids") -> Column:
    """True iff the way closes on itself with >= 3 distinct nodes."""
    return (
        (F.size(node_ids) >= 4)
        & (F.element_at(node_ids, 1) == F.element_at(node_ids, -1))
    )


def way_is_area(node_ids: str = "node_ids", tags: str = "tags") -> Column:
    any_key = None
    for k in AREA_KEYS:
        c = F.col(tags).getItem(k).isNotNull()
        any_key = c if any_key is None else (any_key | c)
    return closed_ring(node_ids) & any_key


def relation_is_area(tags: str = "tags") -> Column:
    return (
        F.col(tags).getItem("boundary").isNotNull()
        | F.col(tags).getItem("type").isin("multipolygon", "boundary")
    )


def area_flags(ways: DataFrame, relations: DataFrame) -> DataFrame:
    """(typed_id, is_area) for ways and relations (nodes are never areas)."""
    w = ways.select(
        (F.col("id") * 4 + 1).alias("typed_id"), way_is_area().alias("is_area")
    )
    r = relations.select(
        (F.col("id") * 4 + 2).alias("typed_id"), relation_is_area().alias("is_area")
    )
    return w.unionByName(r)
