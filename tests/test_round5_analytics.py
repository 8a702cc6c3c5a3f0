"""Edge semantics for the round-5 analytics/ANN operators.

The gate proves value equality against DuckDB on the synthetic corpus;
these pin the semantic corners a clickstream / embedding pipeline hits
at scale: strictly-after funnel ordering (a click BEFORE the first view
must not advance the funnel), retention offsets, the all-zero-vector
quantization guard, and closed-ring node repetition in the way walk.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from geodesk_gol_spark.operators import mldf
from geodesk_gol_spark.operators.info import nodes_of

_TS = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(event_id=i, ts=_TS + dt.timedelta(minutes=m), user_id=u,
             event_type=t, value=1.0, props="{}")
         for i, (u, m, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_funnel_strictly_after_ordering(spark):
    # u1: click at t-1 precedes the first view — must NOT count;
    #     the click at t+2 does, and the purchase after it completes.
    # u2: purchase BEFORE its click — funnel stops at stage 2.
    # u3: no view at all — stage 0 even with clicks and purchases.
    ev = _events(spark, [
        (1, 0, "click"), (1, 1, "view"), (1, 2, "click"), (1, 3, "purchase"),
        (2, 0, "view"), (2, 1, "purchase"), (2, 2, "click"),
        (3, 0, "click"), (3, 1, "purchase"),
    ])
    got = {r["user_id"]: r for r in mldf.events_funnel(ev).collect()}
    assert got[1]["stage"] == 3
    assert got[1]["t_click"] == _TS + dt.timedelta(minutes=2)
    assert got[2]["stage"] == 2
    assert got[2]["t_purchase"] is None
    assert got[3]["stage"] == 0
    assert got[3]["t_view"] is None


def test_funnel_simultaneous_events_do_not_advance(spark):
    # view and click at the SAME timestamp: click is not strictly after.
    ev = _events(spark, [(1, 0, "view"), (1, 0, "click")])
    (row,) = mldf.events_funnel(ev).collect()
    assert row["stage"] == 1 and row["t_click"] is None


def test_retention_offsets_and_counts(spark):
    # u1 first active day 0, returns day 2; u2 first active day 1.
    ev = _events(spark, [
        (1, 0, "view"), (1, 60 * 48, "click"),
        (2, 60 * 24, "view"), (2, 60 * 48, "view"),
    ])
    got = {(r["cohort_day"], r["day_offset"]): r["n_users"]
           for r in mldf.events_retention(ev).collect()}
    assert got == {
        ("2024-01-01", 0): 1, ("2024-01-01", 2): 1,
        ("2024-01-02", 0): 1, ("2024-01-02", 1): 1,
    }


def _emb(spark, rows):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=v, label=0) for i, v in rows],
        "vec_id long, embedding array<float>, label int",
    )


def test_sq_codes_zero_vector_guard(spark):
    dim = 64
    emb = _emb(spark, [(0, [0.0] * dim), (1, [1.0] + [0.0] * (dim - 1))])
    got = {r["vec_id"]: r for r in mldf._sq_codes(emb).collect()}
    assert got[0]["s"] == 0.0 and set(got[0]["codes"]) == {0}
    assert got[1]["codes"][0] == 127


def test_ann_sq_topk_matches_exact_on_separable_corpus(spark):
    # three tight clusters along distinct axes: quantized candidate
    # generation must hand the exact re-rank the true neighbours.
    dim = 64
    rows = []
    for c in range(3):
        for j in range(6):
            v = [0.0] * dim
            v[c] = 1.0
            v[(c + 10) % dim] = 0.01 * j
            rows.append((c * 6 + j, v))
    out = mldf.ann_sq_topk(_emb(spark, rows), k=3, n_q=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["q_id"], set()).add(r["neighbor_id"])
    # vec_ids 0..5 form cluster 0 (6..11 and 12..17 the other axes);
    # queries 0,1,2 all live in cluster 0 so every neighbour must too.
    for q, ns in by_q.items():
        assert ns <= set(range(6)), (q, ns)
        assert len(ns) == 3


def test_nodes_of_keeps_closing_node_and_order(spark):
    ways = spark.createDataFrame(
        [Row(id=7, node_ids=[100, 101, 102, 100])],
        "id long, node_ids array<long>",
    )
    nodes = spark.createDataFrame(
        [Row(id=100 + i, lon100nd=10 * i, lat100nd=-10 * i)
         for i in range(3)],
        "id long, lon100nd long, lat100nd long",
    )
    got = sorted(nodes_of(ways, nodes).collect(),
                 key=lambda r: r["ordinal"])
    assert [r["node_id"] for r in got] == [100, 101, 102, 100]
    assert all(r["way_typed_id"] == 7 * 4 + 1 for r in got)
    assert got[3]["lon100nd"] == 0  # closing row repeats node 100's coords


def test_transitions_pairs_and_gaps(spark):
    # u1 timeline: view(0) -> click(1) -> click(3) -> purchase(7);
    # u2: error(0) -> view(10).  No cross-user pairs.
    ev = _events(spark, [
        (1, 0, "view"), (1, 1, "click"), (1, 3, "click"), (1, 7, "purchase"),
        (2, 0, "error"), (2, 10, "view"),
    ])
    got = {(r["prev_type"], r["next_type"]): (r["n"], r["total_gap_us"])
           for r in mldf.events_transitions(ev).collect()}
    m = 60_000_000  # one minute in microseconds
    assert got == {
        ("view", "click"): (1, 1 * m),
        ("click", "click"): (1, 2 * m),
        ("click", "purchase"): (1, 4 * m),
        ("error", "view"): (1, 10 * m),
    }


def test_transitions_single_event_users_emit_nothing(spark):
    ev = _events(spark, [(1, 0, "view"), (2, 5, "click")])
    assert mldf.events_transitions(ev).count() == 0


def test_transitions_partition_invariant(spark):
    # The transition matrix must not depend on how the input is split
    # across tasks: the window repartitions on user_id internally, so
    # an adversarial pre-partitioning (all rows shuffled into 7 parts
    # by event_id) yields the identical matrix — the property that
    # makes the operator safe behind any upstream exchange at scale.
    rows = [(u, m, t)
            for u in (1, 2, 3)
            for m, t in ((0, "view"), (2, "click"), (5, "view"),
                         (9, "purchase"), (14, "click"))]
    ev = _events(spark, rows)
    base = sorted(map(tuple, mldf.events_transitions(ev).collect()))
    scrambled = sorted(map(tuple, mldf.events_transitions(
        ev.repartition(7, "event_id")).collect()))
    assert base == scrambled and len(base) == 4
