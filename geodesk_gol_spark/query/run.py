"""The ``gol query`` entry point, composed end-to-end: GOQL selector +
optional -b/-a spatial restriction + -f output format (+ -k keys,
-p precision) over a store frame — the reference's main user surface
(src/gol/QueryCommand.cpp: query compile :105, option table
src/gol/GolCommand.cpp:13-22, printers src/gol/query/*).

Each feature prints once even when the store holds twin copies
(the reference's query runner dedupes across tile copies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.pyramid import TileCatalog
from .area import parse_area, parse_box
from .formats import format_result
from .goql import goql_to_column
from .spatial import area_filter, bbox_filter


def gol_query(
    store: DataFrame,
    catalog: TileCatalog,
    goql: str,
    *,
    bbox: str | tuple | None = None,
    area: str | list | None = None,
    fmt: str = "brief",
    keys: list[str] | None = None,
    precision: int = 7,
):
    """Run ``gol query <gol> <goql> [-b|-a] [-f] [-k] [-p]``.

    ``bbox`` is a "W,S[,E,N]" degree string (or a pre-parsed world-xy
    4-tuple); ``area`` is any -a string form — WKT / coordinate list /
    GeoJSON / @file (or pre-parsed world-xy rings).  Returns whatever
    :func:`format_result` returns for ``fmt`` (an int for ``count``,
    else a one-column line frame).
    """
    sel = store.filter(~F.col("is_ghost") & goql_to_column(goql))
    if bbox is not None:
        b = parse_box(bbox) if isinstance(bbox, str) else tuple(bbox)
        sel = bbox_filter(sel, catalog, *b)
    if area is not None:
        rings = parse_area(area) if isinstance(area, str) else area
        sel = area_filter(sel, catalog, rings)
    sel = sel.dropDuplicates(["typed_id"])
    return format_result(sel, fmt, keys=keys, precision=precision)
