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
