"""Geometry scalar kernel invariants (ST_Length/Area/Centroid/Simplify)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from fs2_osm_spark.functions.geom_ops import (
    centroid,
    line_length_m,
    shoelace_area_deg2,
    simplify_dp,
)

SQUARE = np.array([0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 1.0, 0.0, 0.0])


def test_length_equator_degree():
    # 1 degree of longitude at the equator ~ 111.19 km (mean-radius sphere)
    seg = np.array([0.0, 0.0, 1.0, 0.0])
    expected = 2 * math.pi * 6_371_008.8 / 360.0
    assert line_length_m(seg) == pytest.approx(expected, rel=1e-9)


def test_length_additive():
    two = np.array([0.0, 0.0, 1.0, 0.0, 2.0, 0.0])
    one = np.array([0.0, 0.0, 2.0, 0.0])
    assert line_length_m(two) == pytest.approx(line_length_m(one), rel=1e-9)


def test_shoelace_area_and_orientation():
    assert shoelace_area_deg2(SQUARE) == pytest.approx(1.0)
    reversed_ring = SQUARE.reshape(-1, 2)[::-1].ravel()
    assert shoelace_area_deg2(reversed_ring) == pytest.approx(-1.0)


def test_centroid_drops_closure_vertex():
    cx, cy = centroid(SQUARE)
    assert (cx, cy) == pytest.approx((0.5, 0.5))


def test_simplify_collinear_to_segment():
    line = np.array([0.0, 0.0, 1.0, 1e-7, 2.0, 0.0, 3.0, -1e-7, 4.0, 0.0])
    simp = simplify_dp(line, tolerance=1e-3)
    assert len(simp) == 4  # endpoints only
    assert simp[0] == 0.0 and simp[-2] == 4.0


def test_simplify_preserves_significant_vertices():
    zigzag = np.array([0.0, 0.0, 1.0, 1.0, 2.0, 0.0, 3.0, 1.0, 4.0, 0.0])
    simp = simplify_dp(zigzag, tolerance=0.1)
    assert (simp == zigzag).all()  # every vertex deviates > tol


def test_simplify_error_bound():
    rng = np.random.default_rng(17)
    xs = np.linspace(0, 10, 200)
    ys = np.sin(xs) + rng.normal(scale=0.01, size=200)
    line = np.empty(400)
    line[0::2] = xs
    line[1::2] = ys
    tol = 0.05
    simp = simplify_dp(line, tol)
    assert len(simp) < len(line)
    # every original vertex lies within tol of the simplified polyline
    sx, sy = simp[0::2], simp[1::2]
    for px, py in zip(xs, ys):
        dmin = np.inf
        for i in range(len(sx) - 1):
            dx, dy = sx[i + 1] - sx[i], sy[i + 1] - sy[i]
            seg2 = dx * dx + dy * dy
            t = 0.0 if seg2 == 0 else np.clip(
                ((px - sx[i]) * dx + (py - sy[i]) * dy) / seg2, 0, 1
            )
            dmin = min(dmin, math.hypot(px - (sx[i] + t * dx), py - (sy[i] + t * dy)))
        assert dmin <= tol + 1e-9
