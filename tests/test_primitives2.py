"""2D primitive correctness: independent float64 oracles (analytic or
brute-force boundary sampling) + property tests.

Mirrors reference gsdf_test.go:285-353 coverage.
"""
import numpy as np
import pytest

from gsdf_tpu import Builder
from gsdf_tpu.eval import new_sdf2

from helpers import assert_bounds_valid_2d, assert_field_valid_2d, grid_points_2d

bld = Builder()
ATOL = 2e-6


def _check(shape, oracle, atol=ATOL, scale=1.4, n=17):
    sdf = new_sdf2(shape)
    pts = grid_points_2d(shape.bounds(), n=n, scale=scale)
    got = sdf.evaluate(pts)
    want = oracle(pts.astype(np.float64))
    np.testing.assert_allclose(got, want, atol=atol, rtol=0)


def _boundary_oracle(boundary_pts, inside_fn):
    """Brute-force signed distance from densely sampled boundary points."""

    def oracle(p):
        d = np.full(len(p), np.inf)
        for chunk in np.array_split(boundary_pts, max(1, len(boundary_pts) // 4096)):
            dd = np.linalg.norm(p[:, None, :] - chunk[None, :, :], axis=-1).min(axis=1)
            d = np.minimum(d, dd)
        sign = np.where(inside_fn(p), -1.0, 1.0)
        return sign * d

    return oracle


def test_circle_values():
    _check(bld.new_circle(0.8), lambda p: np.linalg.norm(p, axis=-1) - 0.8)


def test_rect_values():
    def oracle(p, b=np.array([0.5, 0.3])):
        d = np.abs(p) - b
        return np.linalg.norm(np.maximum(d, 0), axis=-1) + np.minimum(
            d.max(axis=-1), 0
        )

    _check(bld.new_rectangle(1.0, 0.6), oracle)


def test_line_values():
    a = np.array([-0.4, -0.2])
    b = np.array([0.5, 0.35])
    w = 0.1

    def oracle(p):
        pa = p - a
        ba = b - a
        h = np.clip(pa @ ba / (ba @ ba), 0, 1)
        return np.linalg.norm(pa - h[:, None] * ba, axis=-1) - w / 2

    _check(bld.new_line2d(a[0], a[1], b[0], b[1], w), oracle)


def test_line_degenerate_becomes_circle():
    s = bld.new_line2d(0.1, 0.1, 0.1, 0.1, 0.4)
    from gsdf_tpu.core.primitives2 import Circle

    assert isinstance(s, Circle)


def test_hexagon_inside_outside():
    s = bld.new_hexagon(0.5)
    sdf = new_sdf2(s)
    d = sdf.evaluate(np.array([[0, 0], [0, 0.49], [0, 0.51], [2, 2]], np.float32))
    assert d[0] < 0 and d[1] < 0 and d[2] > 0 and d[3] > 0
    # face at y=side: distance from origin straight up is side
    np.testing.assert_allclose(d[0], -0.5, atol=1e-6)


def test_octagon_values():
    s = bld.new_octagon(0.7)
    sdf = new_sdf2(s)
    # the octagon's flats lie at distance c from center along x and y
    d = sdf.evaluate(np.array([[0, 0], [0.7, 0], [0, -0.7], [1, 1]], np.float32))
    np.testing.assert_allclose(d[0], -0.7, atol=1e-6)
    np.testing.assert_allclose(d[1], 0.0, atol=1e-6)
    np.testing.assert_allclose(d[2], 0.0, atol=1e-6)
    assert d[3] > 0


def test_equilateral_triangle_sign():
    h = 0.6
    s = bld.new_equilateral_triangle(h)
    sdf = new_sdf2(s)
    d = sdf.evaluate(np.array([[0, 0], [0, 10], [10, 0]], np.float32))
    assert d[0] < 0 and d[1] > 0 and d[2] > 0


def test_ellipse_brute_force():
    a, b = 0.8, 0.45
    t = np.linspace(0, 2 * np.pi, 200_000, endpoint=False)
    boundary = np.stack([a * np.cos(t), b * np.sin(t)], axis=-1)
    inside = lambda p: (p[:, 0] / a) ** 2 + (p[:, 1] / b) ** 2 < 1
    _check(
        bld.new_ellipse(a, b),
        _boundary_oracle(boundary, inside),
        atol=2e-4,
        n=15,
    )


def test_diamond_values():
    s = bld.new_diamond2d(1.0, 0.6)
    sdf = new_sdf2(s)
    d = sdf.evaluate(
        np.array([[0, 0], [0.5, 0], [0, 0.3], [0.6, 0], [0, 0.4]], np.float32)
    )
    assert d[0] < 0
    np.testing.assert_allclose(d[1], 0.0, atol=1e-6)
    np.testing.assert_allclose(d[2], 0.0, atol=1e-6)
    assert d[3] > 0 and d[4] > 0


def test_rounded_x_values():
    s = bld.new_rounded_x(1.0, 0.1)
    sdf = new_sdf2(s)
    d = sdf.evaluate(np.array([[0, 0], [2, 2]], np.float32))
    np.testing.assert_allclose(d[0], -0.1, atol=1e-6)
    assert d[1] > 0


def test_polygon_square():
    verts = [(-0.5, -0.5), (0.5, -0.5), (0.5, 0.5), (-0.5, 0.5)]

    def oracle(p, b=np.array([0.5, 0.5])):
        d = np.abs(p) - b
        return np.linalg.norm(np.maximum(d, 0), axis=-1) + np.minimum(
            d.max(axis=-1), 0
        )

    _check(bld.new_polygon(verts), oracle)


def test_polygon_winding_concave():
    # L-shape: the notch must be outside
    verts = [(0, 0), (2, 0), (2, 1), (1, 1), (1, 2), (0, 2)]
    sdf = new_sdf2(bld.new_polygon(verts))
    d = sdf.evaluate(np.array([[0.5, 0.5], [1.5, 1.5], [0.5, 1.5]], np.float32))
    assert d[0] < 0  # inside main body
    assert d[1] > 0  # in the notch
    assert d[2] < 0  # inside vertical arm


def test_polygon_closed_dedup():
    # closing vertex equal to the first is dropped (primitives2d.go:473)
    verts = [(0, 0), (1, 0), (1, 1), (0, 0)]
    s = bld.new_polygon(verts)
    assert len(s.vert) == 3


def test_lines2d_values():
    segs = [
        [(-0.5, 0.0), (0.0, 0.3)],
        [(0.0, 0.3), (0.5, -0.2)],
    ]
    w = 0.08

    def oracle(p):
        best = np.full(len(p), np.inf)
        for (a, b) in segs:
            a, b = np.array(a), np.array(b)
            pa = p - a
            ba = b - a
            h = np.clip(pa @ ba / (ba @ ba), 0, 1)
            best = np.minimum(
                best, np.linalg.norm(pa - h[:, None] * ba, axis=-1)
            )
        return best - w / 2

    _check(bld.new_lines2d(segs, w), oracle)


def test_arc_values():
    r, ang, th = 0.6, np.pi / 1.5, 0.08
    t = np.linspace(-ang / 2, ang / 2, 100_000)
    # arc opens at (0, r): angle measured from +y axis
    boundary = np.stack([r * np.sin(t), r * np.cos(t)], axis=-1)
    oracle = lambda p: _boundary_oracle(boundary, lambda q: np.zeros(len(q), bool))(
        p
    ) - th / 2
    _check(bld.new_arc(r, ang, th), oracle, atol=2e-4, n=13)


def test_bezier_brute_force():
    A = np.array([-0.5, -0.2])
    B = np.array([0.1, 0.6])
    C = np.array([0.6, -0.1])
    th = 0.1
    t = np.linspace(0, 1, 200_000)[:, None]
    curve = (1 - t) ** 2 * A + 2 * (1 - t) * t * B + t**2 * C
    oracle = lambda p: _boundary_oracle(curve, lambda q: np.zeros(len(q), bool))(
        p
    ) - th / 2
    _check(
        bld.new_quadratic_bezier2d(A, B, C, th),
        oracle,
        atol=5e-4,
        n=13,
    )


ALL_2D = [
    ("circle", lambda: bld.new_circle(0.8)),
    ("line", lambda: bld.new_line2d(-0.4, -0.2, 0.5, 0.35, 0.1)),
    ("lines", lambda: bld.new_lines2d([[(-0.5, 0), (0, 0.3)], [(0, 0.3), (0.5, -0.2)]], 0.08)),
    ("arc", lambda: bld.new_arc(0.6, np.pi / 1.5, 0.08)),
    ("eqtri", lambda: bld.new_equilateral_triangle(0.6)),
    ("rect", lambda: bld.new_rectangle(1.0, 0.6)),
    ("hexagon", lambda: bld.new_hexagon(0.5)),
    ("octagon", lambda: bld.new_octagon(0.7)),
    ("ellipse", lambda: bld.new_ellipse(0.8, 0.45)),
    ("polygon", lambda: bld.new_polygon([(-0.5, -0.4), (0.5, -0.5), (0.4, 0.5), (-0.3, 0.35)])),
    ("diamond", lambda: bld.new_diamond2d(1.0, 0.6)),
    ("roundedx", lambda: bld.new_rounded_x(1.0, 0.1)),
    ("bezier", lambda: bld.new_quadratic_bezier2d((-0.5, -0.2), (0.1, 0.6), (0.6, -0.1), 0.1)),
]


@pytest.mark.parametrize("name,mk", ALL_2D)
def test_field_valid_2d(name, mk):
    assert_field_valid_2d(mk(), n=20)


@pytest.mark.parametrize("name,mk", ALL_2D)
def test_bounds_valid_2d(name, mk):
    assert_bounds_valid_2d(mk(), n=8)
