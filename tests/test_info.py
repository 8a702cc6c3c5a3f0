"""gol info / gol get analogues."""

from __future__ import annotations

import pytest

from geodesk_gol_spark.operators.info import (
    get_features,
    parse_feature_specs,
    store_info,
)


def test_parse_feature_specs():
    assert parse_feature_specs(["n123", "w45", "r7"]) == [492, 181, 30]
    for bad in ["x5", "n", "12", "nw3", ""]:
        with pytest.raises(ValueError):
            parse_feature_specs([bad])


def test_get_and_info(spark):
    store = spark.createDataFrame(
        [
            (40, 0, 10, 5, False, {"highway": "primary"}, 100, 200, 100, 200),
            (41, 1, 10, 5, False, {"building": "yes"}, 100, 200, 150, 260),
            (41, 1, 10, 6, True, {"building": "yes"}, 100, 200, 150, 260),
            (80, 0, 20, 6, False, {}, 150, 260, 150, 260),
        ],
        "typed_id long, ftype int, id long, tile_id int, is_ghost boolean, "
        "tags map<string,string>, minx long, miny long, maxx long, maxy long",
    )
    got = {(r.typed_id, r.tile_id) for r in
           get_features(store, ["n10", "w10"]).collect()}
    assert got == {(40, 5), (41, 5)}  # ghost copy excluded

    info = store_info(store).collect()[0]
    assert (info.n_nodes, info.n_ways, info.n_relations) == (2, 1, 0)
    assert info.n_ghost_copies == 1
    assert info.n_tiles == 2
    assert (info.minx, info.miny, info.maxx, info.maxy) == (100, 200, 150, 260)


def test_members_and_parents_navigation(spark):
    from pyspark.sql import functions as F

    from geodesk_gol_spark.operators.info import members_of, parents_of

    rels = spark.createDataFrame(
        [
            (100, [(1, 7, "outer"), (1, 8, "inner"), (0, 9, "admin_centre")]),
            (101, [(2, 100, "subarea")]),
        ],
        "id long, members array<struct<t:int,id:long,role:string>>",
    )
    mem = members_of(rels).collect()
    assert len(mem) == 4
    by_parent = {}
    for r in mem:
        by_parent.setdefault(r["parent_typed_id"], []).append(r)
    # ordinals preserve member order
    assert [r["member_typed_id"] for r in
            sorted(by_parent[402], key=lambda r: r["ordinal"])] == [
        7 * 4 + 1, 8 * 4 + 1, 9 * 4]
    assert [r["role"] for r in
            sorted(by_parent[402], key=lambda r: r["ordinal"])] == [
        "outer", "inner", "admin_centre"]
    # role filter
    assert [r["member_typed_id"]
            for r in members_of(rels, role="subarea").collect()] == [402]

    # parents: way 8 belongs to rel 100; rel 100 belongs to rel 101
    targets = spark.createDataFrame([(8 * 4 + 1,), (402,)], "typed_id long")
    par = sorted(
        (r["typed_id"], r["parent_typed_id"], r["role"])
        for r in parents_of(rels, targets).collect()
    )
    assert par == [(33, 402, "inner"), (402, 406, "subarea")]
