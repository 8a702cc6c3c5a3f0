"""Independent slow-path reference implementation (pure Python).

Third implementation of the engine's core semantics (besides the Spark
engine and the DuckDB SQL oracle): projection, pyramid density merge,
cell→tile mapping and TilePair home selection, written with plain loops
and dicts over integers.  Used by tests for byte-for-byte row equality —
the FIXTURES.md §3 oracle strategy (mirrors the reference's independent
checker, src/gol/CheckCommand.cpp / src/check/TileChecker.*).

Deliberately naive — clarity over speed; run on sf0.001-scale inputs.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from ..config import LEAF_ZOOM, ZOOM_LEVELS, tile_id

WORLD = 1 << 31


def project(lon100nd: int, lat100nd: int) -> tuple[int, int]:
    """Rational pseudo-Mercator, exactly as sqlgen.x_expr / y_expr."""
    x = math.floor((float(lon100nd) + 1800000000.0) / 3600000000.0 * 2147483648.0)
    u = float(lat100nd) * 0.000000001
    uu = u * u
    m = u * (1.0 + uu * (0.1962 + uu * 0.0937))
    y = math.floor((0.5 - 0.45 * m) * 2147483648.0)
    return x, y


def cell_of(x: int, y: int, zoom: int = LEAF_ZOOM) -> tuple[int, int]:
    d = 1 << (31 - zoom)
    return x // d, y // d


def pyramid(cells: Counter, density: int) -> dict[int, dict[tuple[int, int], int]]:
    """Density merge 12→9→6→3→0; returns {zoom: {(c, r): count}}."""
    out: dict[int, dict[tuple[int, int], int]] = {z: {} for z in ZOOM_LEVELS}
    cur = dict(cells)
    for zoom in (12, 9, 6, 3):
        nxt: dict[tuple[int, int], int] = defaultdict(int)
        for (c, r), n in cur.items():
            if n >= density:
                out[zoom][(c, r)] = n
            else:
                nxt[(c // 8, r // 8)] += n
        cur = dict(nxt)
    out[0][(0, 0)] = sum(cur.values())
    return out


def cell_to_tile(pyr: dict, c: int, r: int) -> int:
    """Deepest surviving tile containing the zoom-12 cell."""
    for zoom in (12, 9, 6, 3):
        d = 1 << (LEAF_ZOOM - zoom)
        key = (c // d, r // d)
        if key in pyr[zoom]:
            return tile_id(zoom, key[0], key[1])
    return 0


def home_tiles(pyr: dict, cells: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """TilePair selection from member cells → [(tile_id, twin)]."""
    minc = min(c for c, _ in cells)
    maxc = max(c for c, _ in cells)
    minr = min(r for _, r in cells)
    maxr = max(r for _, r in cells)
    zstar = 0
    for zoom in (12, 9, 6, 3):
        d = 1 << (LEAF_ZOOM - zoom)
        if (maxc // d - minc // d) + (maxr // d - minr // d) <= 1:
            zstar = zoom
            break
    d = 1 << (LEAF_ZOOM - zstar)
    cand = [(minc // d, minr // d, 0)]
    if (minc // d, minr // d) != (maxc // d, maxr // d):
        cand.append((maxc // d, maxr // d, 1))

    homes: dict[int, int] = {}
    for c, r, twin in cand:
        # map up to deepest surviving ancestor-or-self
        corner = (c * d, r * d)
        t = 0
        for zoom in (12, 9, 6, 3):
            if zoom > zstar:
                continue
            dd = 1 << (LEAF_ZOOM - zoom)
            key = (corner[0] // dd, corner[1] // dd)
            if key in pyr[zoom]:
                t = tile_id(zoom, key[0], key[1])
                break
        if t not in homes or twin < homes[t]:
            homes[t] = twin
    return sorted(homes.items())
