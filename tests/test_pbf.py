"""OSM PBF source: block framing, vectorized varint decode, round trip.

The fixture .pbf files are written by sources/pbf.write_pbf (the
published wire spec; no OSM download in the sandbox) and decoded by the
block-parallel Spark reader — encoder and decoder share only the
varint/zigzag codecs, which are themselves pinned against hand-computed
byte sequences here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from geodesk_gol_spark.functions.varint import (
    decode_varints,
    encode_varints,
    zigzag_decode,
    zigzag_encode,
)
from geodesk_gol_spark.sources import pbf


def test_varint_known_bytes():
    # spec examples: 1 -> 0x01, 300 -> 0xAC 0x02, 0 -> 0x00
    assert encode_varints([1]) == b"\x01"
    assert encode_varints([300]) == b"\xac\x02"
    assert encode_varints([0]) == b"\x00"
    got = decode_varints(np.frombuffer(b"\x01\xac\x02\x00", dtype=np.uint8))
    assert got.tolist() == [1, 300, 0]


def test_varint_roundtrip_random_width():
    rng = np.random.default_rng(7)
    vals = np.concatenate([
        rng.integers(0, 1 << b, size=50, dtype=np.uint64)
        for b in (7, 14, 35, 63)
    ])
    buf = np.frombuffer(encode_varints(vals.tolist()), dtype=np.uint8)
    assert decode_varints(buf).tolist() == vals.tolist()


def test_zigzag_roundtrip():
    v = np.array([0, -1, 1, -2, 2, 2**62, -(2**62)], dtype=np.int64)
    enc = zigzag_encode(v)
    assert enc[:5].tolist() == [0, 1, 2, 3, 4]  # spec mapping
    assert zigzag_decode(enc).tolist() == v.tolist()


def _fixture(tmp_path, n_nodes=9000, block_size=2500):
    """Deterministic fixture spanning multiple blobs (tests the
    block-parallel path, delta coding across wide id gaps, tags)."""
    nodes = [
        (10 + 7 * i,                       # rising ids, gaps
         -900_000_000 + i * 13_700,        # lat nanodeg (gran-aligned)
         1_800_000_000 - i * 31_100,       # lon nanodeg (gran-aligned)
         ({"amenity": "cafe", "name": f"n{i}"} if i % 5 == 0 else {}))
        for i in range(n_nodes)
    ]
    ways = [
        (100_000 + i,
         [10 + 7 * (i * 3 + j) for j in range(4)],
         {"highway": "residential"} if i % 2 else {})
        for i in range(300)
    ]
    rels = [
        (500_000 + i,
         [(1, 100_000 + i, "outer"), (0, 10 + 7 * i, "admin_centre")],
         {"type": "multipolygon"})
        for i in range(40)
    ]
    path = str(tmp_path / "fixture.osm.pbf")
    n_blobs = pbf.write_pbf(path, nodes, ways, rels,
                            block_size=block_size)
    return path, nodes, ways, rels, n_blobs


def test_blob_index_framing(tmp_path, spark):
    path, nodes, ways, rels, n_blobs = _fixture(tmp_path)
    idx = pbf.blob_index(path)
    assert len(idx) == n_blobs
    assert idx["kind"].tolist()[0] == "OSMHeader"
    assert (idx["kind"] == "OSMData").sum() == n_blobs - 1
    # 9000 nodes / 2500 per block = 4 node blobs + 1 way + 1 rel
    assert n_blobs == 1 + 4 + 1 + 1


def test_pbf_nodes_roundtrip(tmp_path, spark):
    path, nodes, _, _, _ = _fixture(tmp_path)
    got = (
        pbf.read_pbf(spark, path, "nodes")
        .orderBy("id").toPandas()
    )
    assert len(got) == len(nodes)
    assert got["id"].tolist() == [n[0] for n in nodes]
    assert got["lat_nd"].tolist() == [n[1] for n in nodes]
    assert got["lon_nd"].tolist() == [n[2] for n in nodes]
    tagged = got[got["id"] == 10].iloc[0]
    assert dict(tagged["tags"]) == {"amenity": "cafe", "name": "n0"}
    untagged = got[got["id"] == 17].iloc[0]
    assert len(untagged["tags"]) == 0


def test_pbf_ways_relations_roundtrip(tmp_path, spark):
    path, _, ways, rels, _ = _fixture(tmp_path)
    gw = pbf.read_pbf(spark, path, "ways").orderBy("id").toPandas()
    assert gw["id"].tolist() == [w[0] for w in ways]
    assert [list(r) for r in gw["node_ids"]] == [w[1] for w in ways]
    assert dict(gw.iloc[1]["tags"]) == {"highway": "residential"}
    gr = pbf.read_pbf(spark, path, "relations").orderBy("id").toPandas()
    assert gr["id"].tolist() == [r[0] for r in rels]
    m = gr.iloc[0]["members"]
    assert [(x["t"], x["id"], x["role"]) for x in m] == [
        (1, 100_000, "outer"), (0, 10, "admin_centre")]


def test_pbf_decode_is_block_parallel(tmp_path, spark):
    """The same rows come back regardless of partitioning — each blob
    decodes independently (no cross-blob state)."""
    path, nodes, _, _, _ = _fixture(tmp_path)
    a = pbf.read_pbf(spark, path, "nodes", partitions=1)
    b = pbf.read_pbf(spark, path, "nodes", partitions=7)
    pa = a.orderBy("id").toPandas().drop(columns=["tags"])
    pb = b.orderBy("id").toPandas().drop(columns=["tags"])
    pd.testing.assert_frame_equal(pa, pb)


def test_pbf_negative_coordinates_and_offsets(tmp_path, spark):
    """Southern/western hemisphere (negative nanodegrees) survives the
    zigzag+delta path."""
    nodes = [(1, -33_870_000_000 // 100 * 100, -151_210_000_000 // 100 * 100,
              {}),
             (2, -33_880_000_000 // 100 * 100, 151_200_000_000 // 100 * 100,
              {})]
    path = str(tmp_path / "neg.osm.pbf")
    pbf.write_pbf(path, nodes)
    got = pbf.read_pbf(spark, path, "nodes").orderBy("id").toPandas()
    assert got["lat_nd"].tolist() == [n[1] for n in nodes]
    assert got["lon_nd"].tolist() == [n[2] for n in nodes]


def test_varint_overlong_rejected():
    """An 11-byte varint group (shift >= 70 bits) must raise, not emit
    platform-dependent garbage via a C-undefined uint64 shift."""
    import pytest

    buf = np.frombuffer(b"\x80" * 10 + b"\x01", dtype=np.uint8)
    with pytest.raises(ValueError, match="overlong varint"):
        decode_varints(buf)
    # the max legal width (10 bytes) still decodes
    ok = np.frombuffer(encode_varints([2**64 - 1]), dtype=np.uint8)
    assert len(ok) == 10
    assert decode_varints(ok).tolist() == [2**64 - 1]


def test_blob_unsupported_compression_error():
    """A Blob carrying only an unsupported compression field (e.g.
    lz4_data, field 5) raises a clear ValueError, not a TypeError."""
    import pytest

    from geodesk_gol_spark.sources.pbf import _msg, _read_blob

    payload = _msg(5, b"\x00\x01\x02")  # field 5 = lz4_data
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".pbf", delete=False) as f:
        f.write(payload)
        name = f.name
    with pytest.raises(ValueError, match="unsupported blob compression"):
        _read_blob(name, 0, len(payload))


def test_pbf_empty_file_reads_empty(tmp_path, spark):
    """A header-only .pbf (zero OSMData blobs) returns an empty typed
    frame instead of failing pandas schema inference."""
    path = str(tmp_path / "empty.osm.pbf")
    pbf.write_pbf(path, nodes=[], ways=[], relations=[])
    got = pbf.read_pbf(spark, path, "nodes")
    assert got.count() == 0
    assert "id" in got.columns and "lat_nd" in got.columns
