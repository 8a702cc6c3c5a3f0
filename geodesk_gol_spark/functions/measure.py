"""F12: geometry measures — ring area (shoelace) and way length.

The reference exposes feature area/length through the GeoDesk library
surface (libgeodesk geometry; the gol CLI prints geometry via formatters,
SURVEY.md §2.7).  Here both are pure relational aggregates over the
integer vertex-edge frame (:func:`..query.spatial.way_edges_int`) with
cross-engine-deterministic arithmetic:

- ``area2`` — twice the enclosed area of a closed ring, via the exact
  integer shoelace sum.  Per-edge cross terms reach 2^62, and partial
  sums can transiently exceed int64, so the SUM runs in DECIMAL(38,0)
  (Spark) / HUGEINT (DuckDB) and only the final value — |2A| ≤ 2^62 for
  any ring in world space — is cast back to BIGINT.  Sign normalized
  with abs() so vertex orientation doesn't matter.
- ``len_floor`` — Σ floor(|edge|) per way.  IEEE-754 sqrt is correctly
  rounded (identical in both engines) and flooring each edge to an
  integer BEFORE the sum makes the aggregate order-independent and
  exact — a raw float Σ sqrt would differ between engines by summation
  order.  Units: world units (2^31 per 360°); callers convert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def way_measures(ways: DataFrame, vertices: DataFrame) -> DataFrame:
    """(way_id, closed, area2, len_floor) for every way with ≥1 edge.

    ``area2`` is NULL for open ways (shoelace needs a closed ring);
    ``len_floor`` covers open and closed ways alike.
    """
    from ..functions.areas import closed_ring
    from ..query.spatial import way_edges_int

    flags = ways.select(
        F.col("id").alias("way_id"), closed_ring("node_ids").alias("closed")
    )
    e = way_edges_int(ways, vertices)
    cross = (
        "CAST(x0 AS DECIMAL(38,0)) * CAST(y1 AS DECIMAL(38,0)) "
        "- CAST(x1 AS DECIMAL(38,0)) * CAST(y0 AS DECIMAL(38,0))"
    )
    edge_len = (
        "CAST(floor(sqrt(CAST((x1 - x0) * (x1 - x0) "
        "+ (y1 - y0) * (y1 - y0) AS DOUBLE))) AS BIGINT)"
    )
    agg = e.groupBy("way_id").agg(
        F.expr(f"CAST(abs(sum({cross})) AS BIGINT)").alias("area2_raw"),
        F.expr(f"sum({edge_len})").alias("len_floor"),
    )
    return agg.join(flags, "way_id").select(
        "way_id", "closed",
        F.when(F.col("closed"), F.col("area2_raw")).alias("area2"),
        "len_floor",
    )


def measures_oracle_sql(ways_sql: str, way_members_sql: str,
                        nodes_cte: str = "nodes") -> str:
    """DuckDB twin of :func:`way_measures` (HUGEINT shoelace sum)."""
    return f"""
        wmflag AS (SELECT id AS way_id, closed FROM ({ways_sql})),
        mvx AS (
          SELECT wm.way_id, wm.seq, n.x, n.y
          FROM ({way_members_sql}) wm
          JOIN {nodes_cte} n ON n.id = wm.node_id
        ),
        medges AS (
          SELECT * FROM (
            SELECT way_id, x AS x0, y AS y0,
                   lead(x) OVER (PARTITION BY way_id ORDER BY seq) AS x1,
                   lead(y) OVER (PARTITION BY way_id ORDER BY seq) AS y1
            FROM mvx
          ) WHERE x1 IS NOT NULL
        ),
        magg AS (
          SELECT way_id,
                 CAST(abs(sum(CAST(x0 AS HUGEINT) * CAST(y1 AS HUGEINT)
                              - CAST(x1 AS HUGEINT) * CAST(y0 AS HUGEINT)))
                      AS BIGINT) AS area2_raw,
                 sum(CAST(floor(sqrt(CAST((x1 - x0) * (x1 - x0)
                     + (y1 - y0) * (y1 - y0) AS DOUBLE))) AS BIGINT))
                   AS len_floor
          FROM medges GROUP BY way_id
        )
        SELECT m.way_id, f.closed,
               CASE WHEN f.closed THEN m.area2_raw ELSE NULL END AS area2,
               CAST(m.len_floor AS BIGINT) AS len_floor
        FROM magg m JOIN wmflag f ON f.way_id = m.way_id
    """
