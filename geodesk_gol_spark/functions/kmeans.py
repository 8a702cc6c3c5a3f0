"""Distributed Lloyd (k-means) iterations over an embedding column.

The reference engine has no clustering, but a training-data pipeline at
10^12-doc scale does: IVF index build, corpus bucketing, dedup-cluster
seeding.  ``ann_kmeans_iter`` (gate_ml) certifies ONE Lloyd step;
this module runs the actual iterative algorithm: assign → aggregate →
re-center, repeated until the centroids reach a fixed point or
``max_iters``.

Exactness across engines: every arithmetic step is integer.  Vector
components are floored to milli-units (BIGINT) once; distances are
integer squared-Euclidean in milli-space; the centroid update is
``floor(sum / n)`` back into milli-space.  Sums of integers are
aggregation-order-independent, so Spark's partial aggregation and
DuckDB's sequential fold produce bit-identical centroids, assignments
and WCSS — which is what lets a fixed-iteration run be oracle-gated
value-for-value (a double-precision k-means can only ever be gated
approximately).

Scale shape per iteration: one narrow map (scores via zip_with over
inlined centroid literals — k×dim ints travel in the PLAN, not a
shuffle), one partial-aggregated groupBy for the per-(centroid, dim)
sums, and a k×dim collect (8×64 = 512 tiny rows) for the driver-side
re-center — the classic distributed k-means control loop where only
centroid state ever hits the driver.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

__all__ = ["milli_vectors", "kmeans_lloyd"]


def milli_vectors(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(vec_id, mx: array<bigint>) — components floored to milli-units."""
    return df.select(
        "vec_id",
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * 1000).cast("long"),
        ).alias("mx"),
    )


def _score_col(cent: list[int]):
    """Integer squared-Euclidean distance to one centroid (milli-space)."""
    lit = F.array(*[F.lit(int(c)).cast("long") for c in cent])
    return F.aggregate(
        F.zip_with(F.col("mx"), lit, lambda x, c: (x - c) * (x - c)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _assign(mx: DataFrame, cents: dict[int, list[int]]) -> DataFrame:
    """(vec_id, centroid, score): nearest live centroid, ties to the
    smallest centroid id (deterministic)."""
    ids = sorted(cents)
    scored = mx.select(
        "vec_id", "mx",
        *[_score_col(cents[j]).alias(f"s{j}") for j in ids],
    )
    best = F.least(*[F.col(f"s{j}") for j in ids])
    # coalesce of per-centroid whens takes the FIRST (smallest id) match
    # on ties — deterministic
    pick = F.coalesce(
        *[F.when(F.col(f"s{j}") == best, F.lit(j)) for j in ids]
    )
    return scored.select(
        "vec_id", "mx", pick.alias("centroid"), best.alias("score")
    )


def kmeans_lloyd(
    vectors: DataFrame,
    init_centroids: list[list[float]],
    max_iters: int = 10,
    vec_col: str = "embedding",
) -> tuple[dict[int, list[int]], DataFrame, int]:
    """Run Lloyd iterations until the (integer) centroids repeat or
    ``max_iters`` is reached.

    Returns ``(centroids, assignment, iters_run)``: the final milli-space
    centroids by id, the final (vec_id, centroid, score) assignment
    frame, and how many assign+update rounds executed.  Centroids that
    lose all members drop out (same rule as the SQL oracle).
    """
    mx = milli_vectors(vectors, vec_col).persist()
    cents: dict[int, list[int]] = {
        j: [int(math.floor(x * 1000)) for x in c]
        for j, c in enumerate(init_centroids)
    }
    asn = _assign(mx, cents)
    iters = 0
    for _ in range(max_iters):
        iters += 1
        sums = (
            asn.select("centroid", F.posexplode("mx").alias("dim", "x"))
            .groupBy("centroid", "dim")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"))
            .collect()
        )
        new: dict[int, list[int]] = {}
        for r in sums:
            new.setdefault(r.centroid, [0] * len(cents[r.centroid]))
            # same IEEE op as the SQL oracle's floor(CAST(s AS DOUBLE)/n)
            new[r.centroid][r.dim] = int(math.floor(r.s / r.n))
        if new == {j: cents[j] for j in new}:
            cents = new
            break  # fixed point: asn already reflects these centroids
        cents = new
        asn = _assign(mx, cents)
    return cents, asn.drop("mx"), iters
