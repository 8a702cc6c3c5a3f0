"""OsmChange (.osc) XML ingestion — the file-to-change-frame half of S8.

Reference: ``gol update`` reads OsmChange XML (optionally gzipped,
/root/reference/src/change/ChangeReader.cpp — 428 LoC of SAX-style
parsing into a ChangeModel) with strictly ordered revisions
(src/change/Updater.cpp:156-243).

Spark shape: ``spark.read.text(..., wholetext=True)`` distributes one
change *file* per row (gzip decoded by the input codec for .gz paths);
``mapInPandas`` parses each file's XML with ElementTree inside an Arrow
batch and emits one row per changed feature.  XML is inherently
record-oriented, so a Python parse per file is the right granularity —
the per-feature fan-out stays columnar from here on.  At scale the unit
of parallelism is the replication-diff file (thousands of small files),
which is exactly how the reference's ReplicationClient consumes them.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator
from decimal import Decimal

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

OSC_SCHEMA = (
    "op string, ftype int, id long, typed_id long, "
    "lon100nd long, lat100nd long, node_ids array<long>, "
    "members array<struct<t: int, id: long, role: string>>, "
    "tags map<string,string>, revision long, change_seq long"
)

_FTYPE = {"node": 0, "way": 1, "relation": 2}
_MTYPE = {"node": 0, "way": 1, "relation": 2}


def _coord100nd(attr: str | None) -> int | None:
    """Degrees string → 100-nanodegree int, exactly (no float round-trip)."""
    if attr is None:
        return None
    return int(Decimal(attr) * 10_000_000)


def parse_osc_text(text: str) -> list[dict]:
    """One OsmChange document → change rows (op per enclosing block)."""
    root = ET.fromstring(text)
    rows: list[dict] = []
    seq = 0
    for block in root:
        op = block.tag  # create | modify | delete
        if op not in ("create", "modify", "delete"):
            continue
        for el in block:
            ftype = _FTYPE.get(el.tag)
            if ftype is None:
                continue
            fid = int(el.attrib["id"])
            tags = {
                t.attrib["k"]: t.attrib["v"] for t in el.findall("tag")
            }
            node_ids = [int(nd.attrib["ref"]) for nd in el.findall("nd")] or None
            members = [
                {
                    "t": _MTYPE[m.attrib["type"]],
                    "id": int(m.attrib["ref"]),
                    "role": m.attrib.get("role", ""),
                }
                for m in el.findall("member")
            ] or None
            rows.append(
                {
                    "op": op,
                    "ftype": ftype,
                    "id": fid,
                    "typed_id": fid * 4 + ftype,
                    "lon100nd": _coord100nd(el.attrib.get("lon")),
                    "lat100nd": _coord100nd(el.attrib.get("lat")),
                    "node_ids": node_ids,
                    "members": members,
                    "tags": tags,
                    "revision": int(el.attrib.get("version", 0)),
                    "change_seq": seq,
                }
            )
            seq += 1
    return rows


_COLS = [
    "op", "ftype", "id", "typed_id", "lon100nd", "lat100nd",
    "node_ids", "members", "tags", "revision", "change_seq",
]


def parse_osc(spark: SparkSession, path: str) -> DataFrame:
    """Read .osc / .osc.gz files under ``path`` into a change frame."""
    raw = spark.read.text(path, wholetext=True)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for text in pdf["value"]:
                rows.extend(parse_osc_text(text))
            yield pd.DataFrame(rows, columns=_COLS)

    return raw.mapInPandas(gen, OSC_SCHEMA)
