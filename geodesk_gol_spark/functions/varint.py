"""Vectorized LEB128 varint / zigzag codecs (numpy).

The OSM PBF payload is dominated by packed varint arrays (dense-node
ids/lats/lons, way refs, relation memids).  Decoding them byte-by-byte
in Python would be the classic slow path; these kernels decode a whole
packed array in O(1) numpy passes, which is what makes the
mapInPandas PBF reader (sources/pbf.py) Arrow-batch-fast — the same
reason the reference hand-rolls readVarint32/64 in C++
(/root/reference/src/osm/OsmPbfReader.h:145-166) instead of using a
generic protobuf library.

Encoding twins exist for the fixture writer (tests build .pbf files
programmatically; no OSM download in the sandbox).
"""

from __future__ import annotations

import numpy as np


def decode_varints(buf: np.ndarray) -> np.ndarray:
    """Decode a packed varint byte array → uint64 values.

    One varint ends at each byte with the high bit clear.  Group
    membership and in-group byte position are computed with
    searchsorted over the terminator indices — no Python loop.
    """
    if len(buf) == 0:
        return np.zeros(0, dtype=np.uint64)
    ends = np.flatnonzero(buf < 0x80)
    if len(ends) == 0 or ends[-1] != len(buf) - 1:
        raise ValueError("truncated varint stream")
    idx = np.arange(len(buf))
    group = np.searchsorted(ends, idx)
    starts = np.concatenate(([0], ends[:-1] + 1))
    pos = (idx - starts[group]).astype(np.uint64)
    # a uint64 varint is <= 10 bytes; an overlong group would shift by
    # >= 70 bits — C-undefined in numpy, i.e. silent garbage instead of
    # an error — so reject corrupt input before shifting
    if pos.max() > 9:
        raise ValueError("overlong varint (> 10 bytes) in stream")
    parts = (buf & 0x7F).astype(np.uint64) << (pos * np.uint64(7))
    out = np.zeros(len(ends), dtype=np.uint64)
    np.add.at(out, group, parts)
    return out


def zigzag_decode(v: np.ndarray) -> np.ndarray:
    """uint64 zigzag → int64 (sint64 wire values)."""
    v = v.astype(np.uint64)
    return ((v >> np.uint64(1)).astype(np.int64)
            ^ -((v & np.uint64(1)).astype(np.int64)))


def zigzag_encode(v: np.ndarray) -> np.ndarray:
    v = np.asarray(v, dtype=np.int64)
    return ((v << np.int64(1)) ^ (v >> np.int64(63))).astype(np.uint64)


def encode_varints(vals) -> bytes:
    """Encode an iterable of non-negative ints as packed varints.
    Fixture-writer path; plain Python is fine here."""
    out = bytearray()
    for v in vals:
        v = int(v)
        if v < 0:
            raise ValueError("varint values must be non-negative")
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
    return bytes(out)
