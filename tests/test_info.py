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
