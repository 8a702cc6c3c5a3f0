"""Replication client: state files, sequence walk, strictly-ordered apply.

Mirrors the reference's Osmosis-style endpoint
(src/change/ReplicationClient.cpp, src/change/ChangeIngester.cpp): a
local HTTP fixture server publishes state.txt + three sequenced
.osc.gz diffs; the client must apply them in order, resume downloads,
and resolve a timestamp to its revision.
"""

from __future__ import annotations

import http.server
import os
import socketserver
import threading
from contextlib import contextmanager

import pytest

from geodesk_gol_spark.streaming.replication import (
    ReplicationState,
    fetch_diffs,
    fetch_state,
    find_revision_for,
    make_diff_gz,
    parse_spool,
    parse_state,
    replicate,
    revision_path,
    write_state,
)

HEAD = 3
TS = {1: "2026-01-01T00:00:00Z", 2: "2026-01-02T00:00:00Z",
      3: "2026-01-03T00:00:00Z"}

# revision 1 creates node 100 (v1) and node 200; revision 2 modifies
# node 100 (same catch-up batch as its create — the round-2 advice bug)
# and deletes node 200; revision 3 creates node 300.  Node 50 pre-exists
# in the store and is never touched.
DIFFS = {
    1: (
        '<osmChange version="0.6"><create>'
        '<node id="100" version="1" lat="1.5" lon="2.5">'
        '<tag k="amenity" v="cafe"/></node>'
        '<node id="200" version="1" lat="3.5" lon="4.5"/>'
        "</create></osmChange>"
    ),
    2: (
        '<osmChange version="0.6"><modify>'
        '<node id="100" version="2" lat="1.5" lon="2.5">'
        '<tag k="amenity" v="restaurant"/></node>'
        "</modify><delete>"
        '<node id="200" version="2"/>'
        "</delete></osmChange>"
    ),
    3: (
        '<osmChange version="0.6"><create>'
        '<node id="300" version="1" lat="5.5" lon="6.5">'
        '<tag k="shop" v="bakery"/></node>'
        "</create></osmChange>"
    ),
}


def _publish(root: str) -> None:
    for rev, text in DIFFS.items():
        d = os.path.join(root, os.path.dirname(revision_path(rev)))
        os.makedirs(d, exist_ok=True)
        base = os.path.join(root, revision_path(rev))
        with open(base + ".osc.gz", "wb") as f:
            f.write(make_diff_gz(text))
        write_state(base + ".state.txt", ReplicationState(rev, TS[rev]))
    write_state(os.path.join(root, "state.txt"),
                ReplicationState(HEAD, TS[HEAD]))


@contextmanager
def _server(root: str):
    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(  # noqa: E731
        *a, directory=root, **kw
    )
    with socketserver.TCPServer(("127.0.0.1", 0), handler) as httpd:
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            yield f"http://127.0.0.1:{httpd.server_address[1]}"
        finally:
            httpd.shutdown()


def test_parse_state_escapes():
    s = parse_state(
        "#Sat Aug 16 12:00:00 UTC 2025\n"
        "sequenceNumber=6123456\n"
        "timestamp=2025-08-16T12\\:00\\:00Z\n"
    )
    assert s == ReplicationState(6123456, "2025-08-16T12:00:00Z")


def test_revision_path_layout():
    assert revision_path(3) == "000/000/003"
    assert revision_path(6_123_456) == "006/123/456"


def test_replicate_applies_three_diffs_in_order(spark, tmp_path):
    fixture = str(tmp_path / "server")
    _publish(fixture)
    store = spark.createDataFrame(
        [(50 * 4, 50, {"name": "old"})],
        "typed_id long, id long, tags map<string,string>",
    )
    with _server(fixture) as url:
        merged, head = replicate(
            spark, url, store, local_revision=0,
            spool_dir=str(tmp_path / "spool"),
        )
        rows = {r.typed_id: r.tags for r in merged.collect()}
    assert head == ReplicationState(HEAD, TS[HEAD])
    # create→modify across revisions: node 100 survives with rev-2 tags
    assert rows[100 * 4] == {"amenity": "restaurant"}
    # created then deleted: node 200 is gone
    assert 200 * 4 not in rows
    # later create lands; untouched store row survives
    assert rows[300 * 4] == {"shop": "bakery"}
    assert rows[50 * 4] == {"name": "old"}


def test_replicate_noop_when_current(spark, tmp_path):
    fixture = str(tmp_path / "server")
    _publish(fixture)
    store = spark.createDataFrame(
        [(50 * 4, 50, {"name": "old"})],
        "typed_id long, id long, tags map<string,string>",
    )
    with _server(fixture) as url:
        merged, head = replicate(
            spark, url, store, local_revision=HEAD,
            spool_dir=str(tmp_path / "spool"),
        )
    assert merged is store and head.revision == HEAD


def test_fetch_diffs_resumes_and_is_ordered(tmp_path):
    fixture = str(tmp_path / "server")
    _publish(fixture)
    spool = str(tmp_path / "spool")
    with _server(fixture) as url:
        first = fetch_diffs(url, 1, 2, spool)
        # poison revision 2's spooled copy; a re-fetch must NOT redo it
        # (finished files are kept) but must fetch the missing 3
        with open(first[1], "ab") as f:
            f.write(b"LOCAL")
        again = fetch_diffs(url, 1, HEAD, spool)
    assert [os.path.basename(p) for p in again] == [
        "000000001.osc.gz", "000000002.osc.gz", "000000003.osc.gz"
    ]
    with open(again[1], "rb") as f:
        assert f.read().endswith(b"LOCAL")  # kept, not re-downloaded


def test_parse_spool_orders_by_sequence(spark, tmp_path):
    fixture = str(tmp_path / "server")
    _publish(fixture)
    spool = str(tmp_path / "spool")
    with _server(fixture) as url:
        fetch_diffs(url, 1, HEAD, spool)
    ch = parse_spool(spark, spool)
    revs = {(r.id, r.op): r.revision for r in ch.collect()}
    assert revs[(100, "create")] == 1 and revs[(100, "modify")] == 2
    assert revs[(200, "delete")] == 2 and revs[(300, "create")] == 3


def test_fetch_state_and_find_revision(tmp_path):
    fixture = str(tmp_path / "server")
    _publish(fixture)
    with _server(fixture) as url:
        head = fetch_state(url)
        assert head.revision == HEAD

        def fetch(rev: int) -> ReplicationState:
            return fetch_state(url, rev)

        # store stamped between rev 2 and 3 resumes at rev 2
        got = find_revision_for("2026-01-02T12:00:00Z", head, fetch)
        assert got.revision == 2
        # store older than all history starts at the bottom
        got = find_revision_for("2025-12-01T00:00:00Z", head, fetch)
        assert got.revision == 1
        # store newer than head: head is current
        got = find_revision_for("2026-02-01T00:00:00Z", head, fetch)
        assert got.revision == HEAD


@pytest.mark.parametrize("rev,expect", [(0, "000/000/000"),
                                        (999_999_999, "999/999/999")])
def test_revision_path_bounds(rev, expect):
    assert revision_path(rev) == expect
