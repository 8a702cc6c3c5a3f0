"""Property-based robustness: parsers either parse or raise cleanly.

Hypothesis sweeps the input spaces the hand-written tests sample:
GOQL clause text, replication state files / revision paths, and
feature-spec parsing.  No Spark session needed — these target the
driver-side front-ends.
"""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from geodesk_gol_spark.operators.info import parse_feature_specs
from geodesk_gol_spark.query.goql import GoqlError, goql_to_column
from geodesk_gol_spark.streaming.replication import (
    ReplicationState,
    parse_state,
    revision_path,
    write_state,
)

_key = st.text(string.ascii_lowercase + string.digits + "_:", min_size=1,
               max_size=12)
_val = st.text(string.ascii_letters + string.digits + " _-", min_size=1,
               max_size=12)


@settings(max_examples=200, deadline=None)
@given(types=st.sampled_from(["n", "w", "a", "r", "*", "nw", "na"]),
       key=_key, val=_val,
       op=st.sampled_from(["", "=", "!=", "~", "!~", ">", ">=", "<", "<="]))
def test_goql_wellformed_clauses_compile_or_raise_goqlerror(spark, types,
                                                            key, val, op):
    """Any well-formed selector either compiles to a Column or raises
    GoqlError (numeric ops with non-numeric comparands) — never any
    other exception type.  (spark fixture: Column construction needs an
    active SparkContext.)"""
    q = f"{types}[{key}]" if not op else f"{types}[{key}{op}'{val}']"
    try:
        col = goql_to_column(q)
    except GoqlError:
        return
    assert col is not None


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=40))
def test_goql_garbage_never_crashes_uncontrolled(spark, garbage):
    try:
        goql_to_column(garbage)
    except GoqlError:
        pass  # the only acceptable failure mode


@settings(max_examples=200, deadline=None)
@given(rev=st.integers(min_value=0, max_value=999_999_999))
def test_revision_path_roundtrip(rev):
    p = revision_path(rev)
    a, b, c = p.split("/")
    assert len(a) == len(b) == len(c) == 3
    assert int(a) * 1_000_000 + int(b) * 1_000 + int(c) == rev


@settings(max_examples=100, deadline=None)
@given(rev=st.integers(min_value=0, max_value=2**31 - 1),
       ts=st.datetimes().map(lambda d: d.strftime("%Y-%m-%dT%H:%M:%SZ")))
def test_state_file_roundtrip(tmp_path_factory, rev, ts):
    path = tmp_path_factory.mktemp("state") / "state.txt"
    write_state(str(path), ReplicationState(rev, ts))
    assert parse_state(path.read_text()) == ReplicationState(rev, ts)


@settings(max_examples=200, deadline=None)
@given(letter=st.sampled_from("nwr"),
       fid=st.integers(min_value=0, max_value=2**60))
def test_feature_spec_roundtrip(letter, fid):
    [typed] = parse_feature_specs([f"{letter}{fid}"])
    assert typed // 4 == fid
    assert typed % 4 == {"n": 0, "w": 1, "r": 2}[letter]


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=20))
def test_feature_spec_garbage_raises_valueerror(garbage):
    import re

    if re.fullmatch(r"[nwr]\d+", garbage.strip()):
        parse_feature_specs([garbage])
    else:
        try:
            parse_feature_specs([garbage])
        except ValueError:
            pass
        else:
            raise AssertionError(f"accepted garbage {garbage!r}")


_word = st.text(string.ascii_lowercase, min_size=1, max_size=5)


@settings(max_examples=100, deadline=None)
@given(words=st.lists(_word, min_size=0, max_size=40),
       win=st.integers(2, 8), step=st.integers(1, 8))
def test_text_chunks_boundaries_match_python_model(words, win, step):
    """The chunking SQL's window/boundary arithmetic equals an
    independent Python model for arbitrary (win, step, doc length) —
    including the empty document (SQL split('') = [''], one 1-word
    chunk) and trailing partial windows.  DuckDB dialect only: the
    Spark↔DuckDB equality of the same template is the gate's job."""
    import duckdb

    from geodesk_gol_spark.gate_ml import sql_text_chunks

    text = " ".join(words)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.execute("INSERT INTO t VALUES (1, ?)", [text])
    got = sorted(
        map(tuple, con.execute(
            sql_text_chunks("t", "duck", win=win, step=step)
        ).fetchall())
    )

    ws = text.split(" ")  # mirrors SQL: '' -> ['']
    n = len(ws)
    want = []
    for i in range((n - 1) // step + 1):
        sl = ws[i * step: i * step + win]
        acc = 0
        for w in sl:
            acc = (acc * 31 + (len(w) * 31 + (ord(w[0]) if w else 0))) \
                % 1000000007
        want.append((1, i, min(win, n - i * step), acc))
    assert got == sorted(want)


@settings(max_examples=100, deadline=None)
@given(
    docs=st.lists(
        st.tuples(st.sampled_from(["a", "b"]),
                  st.integers(1, 30)),  # (source, token count)
        min_size=1, max_size=20,
    ),
    cap=st.integers(2, 16),
)
def test_pack_sequences_matches_python_model(docs, cap):
    """Concat-and-chunk packing equals an independent Python model for
    arbitrary per-source document streams: per doc the segments sum to
    its token count, per sequence the segments sum to <= cap (== cap
    for every non-final sequence of a source), and offsets/boundaries
    match exact integer arithmetic.  DuckDB dialect only — Spark↔DuckDB
    equality of the same template is the gate's job."""
    import duckdb

    from geodesk_gol_spark.gate_ml import sql_pack_sequences

    con = duckdb.connect()
    con.execute("CREATE TABLE t(source VARCHAR, doc_id BIGINT, text VARCHAR)")
    for i, (src, toks) in enumerate(docs):
        con.execute("INSERT INTO t VALUES (?, ?, ?)",
                    [src, i, " ".join(["w"] * toks)])
    got = sorted(map(tuple, con.execute(
        sql_pack_sequences("t", "duck", cap=cap)).fetchall()))

    want = []
    for src in ("a", "b"):
        cum = 0
        for i, (s, toks) in enumerate(docs):
            if s != src:
                continue
            start, end = cum, cum + toks
            cum = end
            for seq in range(start // cap, (end - 1) // cap + 1):
                lo, hi = max(start, seq * cap), min(end, (seq + 1) * cap)
                want.append((src, i, seq, lo - seq * cap, hi - lo))
    assert got == sorted(want)
    # per-doc conservation and per-seq capacity
    by_doc: dict[int, int] = {}
    by_seq: dict[tuple, int] = {}
    for src, doc, seq, off, n in got:
        assert n >= 1 and 0 <= off < cap
        by_doc[doc] = by_doc.get(doc, 0) + n
        by_seq[(src, seq)] = by_seq.get((src, seq), 0) + n
    for i, (_, toks) in enumerate(docs):
        assert by_doc[i] == toks
    for (src, seq), n in by_seq.items():
        last = max(s for s_, s in by_seq if s_ == src)
        assert n == cap or seq == last


@settings(max_examples=200, deadline=None)
@given(x=st.integers(-2**31, 2**31), y=st.integers(-2**31, 2**31))
def test_hex_cells_match_python_model(x, y):
    """The hex-binning SQL (cube-rounding with floor(v+0.5) pinned
    rounding) equals an independent Python float model for arbitrary
    world coordinates.  DuckDB evaluates the same text Spark runs."""
    import math

    import duckdb

    from geodesk_gol_spark.functions.cells import hex_cell_exprs

    size = 1 << 22
    hq_sql, hr_sql = hex_cell_exprs("x", "y", size)
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {hq_sql} AS q, {hr_sql} AS r "
        f"FROM (SELECT CAST(? AS BIGINT) AS x, CAST(? AS BIGINT) AS y)",
        [x, y],
    ).fetchone()

    qf = (0.5773502691896258 * x - y / 3.0) / float(size)
    rf = (2.0 * y / 3.0) / float(size)
    yf = -qf - rf
    rx, ry, rz = (math.floor(v + 0.5) for v in (qf, yf, rf))
    dx, dy, dz = abs(rx - qf), abs(ry - yf), abs(rz - rf)
    if dx > dy and dx > dz:
        rx = -ry - rz
    elif dy > dz:
        pass  # y corrected; q/r outputs unaffected
    else:
        rz = -rx - ry
    assert got == (rx, rz)


# ---------------------------------------------------------------------------
# -a area parser (query/area.py)
# ---------------------------------------------------------------------------

_deg_lon = st.floats(min_value=-170, max_value=170, allow_nan=False,
                     allow_infinity=False).map(lambda v: round(v, 5))
_deg_lat = st.floats(min_value=-80, max_value=80, allow_nan=False,
                     allow_infinity=False).map(lambda v: round(v, 5))
_ring = st.lists(st.tuples(_deg_lon, _deg_lat), min_size=3, max_size=6)


def _expected_rings(deg_rings):
    from geodesk_gol_spark.oracle.slowpath import project

    out = []
    for ring in deg_rings:
        pts = [tuple(map(float, project(int(round(a * 1e7)),
                                        int(round(b * 1e7)))))
               for a, b in ring]
        if pts[0] != pts[-1]:
            pts.append(pts[0])
        out.append(pts)
    return out


@settings(max_examples=200, deadline=None)
@given(rings=st.lists(_ring, min_size=1, max_size=3),
       form=st.sampled_from(["bare", "polygon", "multipolygon", "latlon",
                             "geojson"]))
def test_area_parser_roundtrips_every_form(rings, form):
    """Any ring set rendered in any accepted -a form parses back to the
    projections of its vertices (closed), regardless of nesting style,
    keyword, coordinate order, or GeoJSON wrapping."""
    import json

    from geodesk_gol_spark.query.area import parse_area_text

    if form == "bare":
        if len(rings) > 1:
            return  # a bare list carries exactly one ring
        text = ", ".join(f"{a} {b}" for a, b in rings[0])
    elif form == "polygon":
        body = ", ".join(
            "(" + ", ".join(f"{a} {b}" for a, b in ring) + ")"
            for ring in rings)
        text = f"POLYGON ({body})"
    elif form == "multipolygon":
        body = ", ".join(
            "((" + ", ".join(f"{a} {b}" for a, b in ring) + "))"
            for ring in rings)
        text = f"MULTIPOLYGON ({body})"
    elif form == "latlon":
        if len(rings) > 1:
            return
        text = "latlon " + ", ".join(f"{b} {a}" for a, b in rings[0])
    else:
        text = json.dumps({
            "type": "MultiPolygon",
            "coordinates": [[[[a, b] for a, b in ring]] for ring in rings],
        })
    assert parse_area_text(text) == _expected_rings(rings)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=40))
def test_area_parser_garbage_never_crashes_uncontrolled(garbage):
    from geodesk_gol_spark.query.area import AreaParseError, parse_area_text

    try:
        parse_area_text(garbage)
    except (AreaParseError, ValueError):
        pass  # includes json.JSONDecodeError for malformed '{' inputs


# ---------------------------------------------------------------------------
# build -l option front-end (config.parse_levels)
# ---------------------------------------------------------------------------

def test_parse_levels_accepts_the_default_ladder():
    from geodesk_gol_spark.config import ZOOM_LEVELS, parse_levels

    assert parse_levels("0,3,6,9,12") == ZOOM_LEVELS
    assert parse_levels("0/3/6/9/12") == ZOOM_LEVELS
    assert parse_levels("12, 9, 6, 3, 0") == ZOOM_LEVELS
    # level 0 is the implicit root
    assert parse_levels("3,6,9,12") == ZOOM_LEVELS


def test_parse_levels_rejects_bad_input_like_the_reference():
    """gol build -l bad_bad_bad exits 2 (reference test_build.py:22-24);
    our front-end raises ValueError for every malformed form."""
    import pytest

    from geodesk_gol_spark.config import parse_levels

    for bad in ("bad_bad_bad", "0,3,x", "-1,3", "13", "2.5", "",
                "inf", "-inf", "nan"):
        with pytest.raises(ValueError):
            parse_levels(bad)
    # valid per-number but violates the pyramid constraints
    with pytest.raises(ValueError, match="3 apart"):
        parse_levels("0,4,8,12")
    with pytest.raises(ValueError, match="at most 8"):
        parse_levels("0,1,2,3,4,5,6,7,8,9")
    # valid ladder the pinned engine does not execute: loud, not silent
    with pytest.raises(ValueError, match="pinned"):
        parse_levels("0,2,4,6,8,10,12")


@settings(max_examples=200, deadline=None)
@given(st.text(string.printable, max_size=30))
def test_parse_levels_garbage_never_crashes_uncontrolled(garbage):
    from geodesk_gol_spark.config import ZOOM_LEVELS, parse_levels

    try:
        assert parse_levels(garbage) == ZOOM_LEVELS
    except ValueError:
        pass  # the only acceptable failure mode
