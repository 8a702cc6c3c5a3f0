"""Replication-server client — the ``gol update <url>`` half of S8.

The reference follows an Osmosis-style replication endpoint
(/root/reference/src/change/ReplicationClient.cpp:1-164,
src/change/ChangeIngester.cpp:24-119, src/change/Updater.cpp:187-243):

- ``state.txt`` at the URL root is a Java-properties file carrying the
  newest ``sequenceNumber`` + ``timestamp``;
- revision *N* lives at ``AAA/BBB/CCC.osc.gz`` (three zero-filled
  3-digit groups of N) with a sibling ``CCC.state.txt``;
- the client walks sequence numbers strictly in order from the store's
  current revision to the server's head and applies each diff.

Spark shape: the fetch loop is control-plane I/O (tiny files, driver
side, resumable via .part renames — same pattern as
operators/archive.py:_fetch_archive).  The *apply* is NOT a sequential
loop of merges: every spooled diff parses into one change frame whose
latest-wins ordering key is (diff sequence number, in-document order),
so a single ``merge_changes`` window applies the whole catch-up batch
with exactly the reference's strictly-ordered semantics — one shuffle
instead of one pass per revision, which is what survives a 10^6-file
backlog on a cluster.
"""

from __future__ import annotations

import gzip
import os
import re
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .osc import _COLS, OSC_SCHEMA, parse_osc_text


@dataclass(frozen=True)
class ReplicationState:
    """One ``state.txt``: sequence number + its UTC timestamp string."""

    revision: int
    timestamp: str  # ISO-8601 Z, as published (lexicographically ordered)


def parse_state(text: str) -> ReplicationState:
    """Parse an Osmosis state file (Java properties: ``#`` comments,
    ``key=value``, colons escaped as ``\\:`` —
    ReplicationClient.cpp:14-41)."""
    revision = -1
    timestamp = ""
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        key, _, value = line.partition("=")
        value = value.replace("\\", "")
        if key.strip() == "sequenceNumber":
            revision = int(value)
        elif key.strip() == "timestamp":
            timestamp = value.strip()
    if revision < 0:
        raise ValueError("state file lacks sequenceNumber")
    return ReplicationState(revision, timestamp)


def revision_path(revision: int) -> str:
    """``AAA/BBB/CCC`` for revision AAABBBCCC (zero-filled 3-digit
    groups; ReplicationClient.cpp:43-52, the Osmosis directory layout)."""
    return (
        f"{revision // 1_000_000:03d}/"
        f"{(revision // 1_000) % 1_000:03d}/"
        f"{revision % 1_000:03d}"
    )


def _get(url: str) -> bytes:
    from urllib.request import urlopen  # stdlib; no extra deps

    with urlopen(url) as r:
        return r.read()


def fetch_state(base_url: str, revision: int | None = None) -> ReplicationState:
    """Head state (``state.txt``) or a specific revision's state
    (``AAA/BBB/CCC.state.txt``)."""
    base = base_url.rstrip("/")
    if revision is None:
        return parse_state(_get(f"{base}/state.txt").decode())
    return parse_state(
        _get(f"{base}/{revision_path(revision)}.state.txt").decode()
    )


def find_revision_for(
    timestamp: str,
    upper: ReplicationState,
    fetch: Callable[[int], ReplicationState],
    lowest: int = 1,
) -> ReplicationState:
    """Newest revision whose timestamp is < ``timestamp`` — where a
    store with that timestamp resumes (ReplicationClient.cpp:86-164,
    itself adapted from PyOsmium's public server.py).  ``fetch`` may
    raise for missing revisions; misses shrink the search range the way
    the reference's 404 handling does."""
    if upper.timestamp < timestamp:
        return upper
    lo_rev, hi = lowest, upper
    lo = None
    rev = max(lowest, upper.revision // 2)
    while lo is None:
        try:
            cand = fetch(rev)
        except Exception:
            nxt = (rev + hi.revision) // 2
            if nxt == rev:
                return hi
            rev = nxt
            continue
        if cand.timestamp < timestamp:
            lo = cand
        else:
            hi = cand
            if rev <= lo_rev:
                return hi  # entire history is newer; start at the bottom
            rev = max(lo_rev, rev // 2)
    while lo.revision + 1 < hi.revision:
        mid = (lo.revision + hi.revision) // 2
        try:
            cand = fetch(mid)
        except Exception:
            hi = ReplicationState(mid, hi.timestamp)
            continue
        if cand.timestamp < timestamp:
            lo = cand
        else:
            hi = cand
    return lo


def fetch_diffs(
    base_url: str, from_rev: int, to_rev: int, spool_dir: str
) -> list[str]:
    """Download revisions ``from_rev..to_rev`` (inclusive) into
    ``spool_dir`` as ``{revision:09d}.osc.gz``.  Resumable: finished
    files are kept, in-flight data goes to a dot-prefixed .part that is
    renamed on success (and that Spark's readers ignore if orphaned)."""
    os.makedirs(spool_dir, exist_ok=True)
    base = base_url.rstrip("/")
    out: list[str] = []
    for rev in range(from_rev, to_rev + 1):
        dst = os.path.join(spool_dir, f"{rev:09d}.osc.gz")
        if not os.path.exists(dst):
            part = os.path.join(spool_dir, f".{rev:09d}.osc.gz.part")
            data = _get(f"{base}/{revision_path(rev)}.osc.gz")
            with open(part, "wb") as f:
                f.write(data)
            os.replace(part, dst)
        out.append(dst)
    return out


_SEQ_RE = re.compile(r"(\d{9})\.osc(?:\.gz)?$")


def parse_spool(spark: SparkSession, spool_dir: str) -> DataFrame:
    """Spooled diffs → one change frame ordered for latest-wins apply.

    ``revision`` is the replication sequence number (from the file
    name), ``change_seq`` the in-document order — together exactly the
    strictly-ordered apply key the reference uses (Updater.cpp:156-178
    reads files in given order; within a file, document order).  One
    file per Spark task: replication diffs are the natural unit of
    parallelism for a backlog catch-up."""
    raw = (
        spark.read.text(os.path.join(spool_dir, "*.osc.gz"), wholetext=True)
        .withColumn("_src", F.input_file_name())
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for text, src in zip(pdf["value"], pdf["_src"]):
                m = _SEQ_RE.search(src)
                seq = int(m.group(1)) if m else 0
                for row in parse_osc_text(text):
                    row["revision"] = seq
                    rows.append(row)
            yield pd.DataFrame(rows, columns=_COLS)

    return raw.mapInPandas(gen, OSC_SCHEMA)


def replicate(
    spark: SparkSession,
    base_url: str,
    store_rows: DataFrame,
    local_revision: int,
    spool_dir: str,
    catalog=None,
) -> tuple[DataFrame, ReplicationState]:
    """``gol update <url>`` analogue: fetch server head state, walk the
    sequence from ``local_revision + 1`` to head strictly in order, and
    apply all diffs as one ordered merge.  Returns (merged store rows,
    server head state); if the store is current, returns it unchanged
    (ChangeIngester.cpp:24-119 NO_UPDATES path).  Pass the store's
    ``catalog`` so node upserts get fresh derived columns — tile
    assignment, projection, point bbox (without it, created nodes
    null-fill tile_id and tile-pruned consumers skip them, and moved
    nodes keep a stale tile)."""
    from .update import merge_changes, prepare_node_changes

    head = fetch_state(base_url)
    if local_revision >= head.revision:
        return store_rows, head
    fetch_diffs(base_url, local_revision + 1, head.revision, spool_dir)
    changes = parse_spool(spark, spool_dir).filter(
        F.col("revision") > local_revision
    )
    if catalog is not None and "tile_id" in store_rows.columns:
        changes = prepare_node_changes(changes, catalog)
    return merge_changes(store_rows, changes), head


def write_state(path: str, state: ReplicationState) -> None:
    """Persist the applied head state next to the store (the reference
    records revision + timestamp in the GOL header; our store is a
    parquet directory, so the state file is its sidecar)."""
    with open(path, "w") as f:
        ts = state.timestamp.replace(":", "\\:")
        f.write(f"sequenceNumber={state.revision}\ntimestamp={ts}\n")


def make_diff_gz(text: str) -> bytes:
    """Deterministic .osc.gz bytes (mtime pinned) — used by tests and
    fixture servers."""
    return gzip.compress(text.encode(), mtime=0)
