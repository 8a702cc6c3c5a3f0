"""Hilbert curve (F4): uniqueness + unit-step adjacency vs a scalar oracle."""

from __future__ import annotations

import numpy as np

from geodesk_gol_spark.functions.hilbert import hilbert_xy2d


def _scalar_xy2d(order: int, x: int, y: int) -> int:
    """Independent scalar implementation (classic Wikipedia form)."""
    rx = ry = 0
    d = 0
    s = 1 << (order - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        # rotate
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_matches_scalar_oracle():
    n = 5
    xs, ys = np.meshgrid(np.arange(1 << n), np.arange(1 << n))
    xs, ys = xs.ravel(), ys.ravel()
    got = hilbert_xy2d(xs, ys, order=n)
    want = np.array([_scalar_xy2d(n, int(x), int(y)) for x, y in zip(xs, ys)])
    assert (got == want).all()


def test_bijective_and_unit_steps():
    n = 4
    xs, ys = np.meshgrid(np.arange(1 << n), np.arange(1 << n))
    xs, ys = xs.ravel(), ys.ravel()
    d = hilbert_xy2d(xs, ys, order=n)
    assert len(set(d.tolist())) == (1 << n) ** 2  # bijection
    # consecutive curve positions are grid neighbors (locality property)
    order_idx = np.argsort(d)
    sx, sy = xs[order_idx], ys[order_idx]
    steps = np.abs(np.diff(sx)) + np.abs(np.diff(sy))
    assert (steps == 1).all()


def test_sql_ctes_match_numpy():
    """The oracle-side unrolled SQL (sqlgen.hilbert_ctes) computes the
    exact distances of the numpy UDF, including grid corners."""
    import duckdb

    from geodesk_gol_spark import sqlgen

    rng = np.random.default_rng(11)
    xs = rng.integers(0, 1 << 16, 300)
    ys = rng.integers(0, 1 << 16, 300)
    corners = [(0, 0), (65535, 65535), (0, 65535), (65535, 0)]
    pts = list(zip(xs.tolist(), ys.tolist())) + corners
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pts AS SELECT * FROM (VALUES "
        + ",".join(f"({x},{y})" for x, y in pts) + ") t(x, y)"
    )
    got = con.execute(
        "WITH " + sqlgen.hilbert_ctes("pts", 16)
        + " SELECT cx, cy, hd FROM h16"
    ).df()
    want = hilbert_xy2d(got.cx.to_numpy(), got.cy.to_numpy(), order=16)
    assert (got.hd.to_numpy() == want).all()
