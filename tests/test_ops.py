"""CSG operation correctness: formula cross-checks in float64, geometric
invariants, and randomized property tests mirroring the reference's
randomized unary-op suite (gsdf_test.go:233-283).
"""
import numpy as np
import pytest

from gsdf_tpu import Builder
from gsdf_tpu.eval import new_cpu_sdf3, new_sdf2, new_sdf3

from helpers import (
    assert_bounds_valid_3d,
    assert_field_valid_3d,
    grid_points_3d,
)

bld = Builder()
rng = np.random.default_rng(1)


def _eval(shape, pts):
    return new_cpu_sdf3(shape).evaluate(pts)


def test_binary_ops_formulas():
    s1 = bld.new_sphere(0.7)
    s2 = bld.translate(bld.new_box(0.8, 0.5, 0.9, 0.0), 0.3, 0.1, -0.2)
    pts = grid_points_3d(s1.bounds().union(s2.bounds()), n=9, scale=1.3)
    d1 = _eval(s1, pts).astype(np.float64)
    d2 = _eval(s2, pts).astype(np.float64)

    np.testing.assert_allclose(_eval(bld.union(s1, s2), pts), np.minimum(d1, d2), atol=1e-6)
    np.testing.assert_allclose(_eval(bld.difference(s1, s2), pts), np.maximum(d1, -d2), atol=1e-6)
    np.testing.assert_allclose(_eval(bld.intersection(s1, s2), pts), np.maximum(d1, d2), atol=1e-6)
    np.testing.assert_allclose(
        _eval(bld.xor(s1, s2), pts),
        np.maximum(np.minimum(d1, d2), -np.maximum(d1, d2)),
        atol=1e-6,
    )

    for k in (0.1, 0.35):
        h = np.clip(0.5 + 0.5 * (d2 - d1) / k, 0, 1)
        want = d2 * (1 - h) + d1 * h - k * h * (1 - h)
        np.testing.assert_allclose(_eval(bld.smooth_union(k, s1, s2), pts), want, atol=2e-6)

        h = np.clip(0.5 - 0.5 * (d2 + d1) / k, 0, 1)
        want = d1 * (1 - h) + (-d2) * h + k * h * (1 - h)
        np.testing.assert_allclose(_eval(bld.smooth_difference(k, s1, s2), pts), want, atol=2e-6)

        h = np.clip(0.5 - 0.5 * (d2 - d1) / k, 0, 1)
        want = d2 * (1 - h) + d1 * h + k * h * (1 - h)
        np.testing.assert_allclose(_eval(bld.smooth_intersect(k, s1, s2), pts), want, atol=2e-6)


def test_union_flattening():
    a, b, c = bld.new_sphere(1), bld.new_sphere(2), bld.new_sphere(3)
    u = bld.union(bld.union(a, b), c)
    assert len(u.joined) == 3


def test_translate_rotate_scale():
    s = bld.new_sphere(0.5)
    t = bld.translate(s, 1.0, -2.0, 0.5)
    pts = np.array([[1.0, -2.0, 0.5], [1.5, -2.0, 0.5]], np.float32)
    d = _eval(t, pts)
    np.testing.assert_allclose(d, [-0.5, 0.0], atol=1e-6)

    # rotating a sphere about any axis is identity
    r = bld.rotate(s, 1.1, (1, 2, 3))
    pts = grid_points_3d(s.bounds(), n=7, scale=1.5)
    np.testing.assert_allclose(_eval(r, pts), _eval(s, pts), atol=1e-5)

    sc = bld.scale(s, 2.0)
    np.testing.assert_allclose(_eval(sc, pts), _eval(bld.new_sphere(1.0), pts), atol=1e-6)


def test_transform_matches_translate():
    from gsdf_tpu.geometry import translation_mat4

    s = bld.new_box(0.6, 0.8, 1.0, 0.0)
    t1 = bld.translate(s, 0.2, -0.3, 0.4)
    t2 = bld.transform(s, translation_mat4((0.2, -0.3, 0.4)))
    pts = grid_points_3d(t1.bounds(), n=7, scale=1.4)
    np.testing.assert_allclose(_eval(t1, pts), _eval(t2, pts), atol=1e-6)


def test_offset_shrinks_grows():
    s = bld.new_sphere(0.5)
    grown = bld.offset(s, -0.1)  # negative offset grows the shape
    pts = np.array([[0.55, 0, 0], [0.65, 0, 0]], np.float32)
    d = _eval(grown, pts)
    assert d[0] < 0 and abs(d[1] - 0.05) < 1e-6


def test_shell():
    s = bld.new_sphere(0.5)
    sh = bld.shell(s, 0.05)
    # shell evaluates s at p/t scaled; surface near r=0.5*0.05?? — the
    # reference semantics shell(s,t): t*(|d(p/t)| - t). Check the zero set
    # numerically: points where |d(p/t)| = t.
    sdf = new_cpu_sdf3(sh)
    d = sdf.evaluate(np.array([[0.5 * 0.05 + 0.05 * 0.05, 0, 0]], np.float32))
    np.testing.assert_allclose(d, [0.0], atol=1e-6)


def test_elongate():
    s = bld.new_sphere(0.3)
    e = bld.elongate(s, 0.4, 0.0, 0.0)
    sdf = new_cpu_sdf3(e)
    # points along x within the stretched region are inside
    d = sdf.evaluate(np.array([[0.2, 0, 0], [0.5, 0, 0], [0.51, 0, 0]], np.float32))
    assert d[0] < 0 and abs(d[1]) < 1e-6 and d[2] > 0


def test_symmetry():
    s = bld.translate(bld.new_sphere(0.3), 0.5, 0, 0)
    sym = bld.symmetry(s, mirror_x=True)
    pts = np.array([[-0.5, 0, 0], [0.5, 0, 0]], np.float32)
    d = _eval(sym, pts)
    np.testing.assert_allclose(d, [-0.3, -0.3], atol=1e-6)


def test_array_instances():
    s = bld.new_sphere(0.2)
    arr = bld.array(s, 1.0, 1.0, 1.0, 3, 2, 1)
    sdf = new_cpu_sdf3(arr)
    # instances at (i,j,k)*spacing for i<3, j<2, k<1
    centers = [(0, 0, 0), (1, 0, 0), (2, 0, 0), (0, 1, 0), (2, 1, 0)]
    pts = np.array(centers, np.float32)
    d = sdf.evaluate(pts)
    np.testing.assert_allclose(d, -0.2, atol=1e-6)
    # no instance beyond the repeat limit
    d = sdf.evaluate(np.array([[3.0, 0, 0], [0, 2.0, 0]], np.float32))
    assert np.all(d > 0)


def test_circular_array():
    s = bld.translate(bld.new_sphere(0.1), 0.5, 0, 0)
    ca = bld.circular_array(s, 5, 8)  # 5 instances spaced 2pi/8
    sdf = new_cpu_sdf3(ca)
    ang = 2 * np.pi / 8
    for i in range(5):
        p = np.array([[0.5 * np.cos(i * ang), 0.5 * np.sin(i * ang), 0]], np.float32)
        assert sdf.evaluate(p)[0] < -0.09, f"instance {i} missing"
    # instance 6 must NOT exist
    p = np.array([[0.5 * np.cos(6 * ang), 0.5 * np.sin(6 * ang), 0]], np.float32)
    assert sdf.evaluate(p)[0] > 0


def test_twist_preserves_axis_distance():
    s = bld.new_box(0.8, 0.3, 1.0, 0.0)
    tw = bld.twist(s, 0.75)
    sdf = new_cpu_sdf3(tw)
    d = sdf.evaluate(np.array([[0, 0, 0]], np.float32))
    np.testing.assert_allclose(d, -0.15, atol=1e-6)


def test_extrude_equals_cylinder():
    c2 = bld.new_circle(0.5)
    ext = bld.extrude(c2, 1.2)
    cyl = bld.new_cylinder(0.5, 1.2, 0.0)
    pts = grid_points_3d(cyl.bounds(), n=9, scale=1.4)
    np.testing.assert_allclose(_eval(ext, pts), _eval(cyl, pts), atol=1e-6)


def test_revolve_equals_torus():
    c2 = bld.translate2d(bld.new_circle(0.2), 0.8, 0.0)
    rev = bld.revolve(c2, 0.0)
    # revolve of circle at x=0.8 about y -> torus with axis y; our torus has
    # axis z, so compare with swizzled points
    tor = bld.new_torus(0.8, 0.2)
    pts = grid_points_3d(rev.bounds(), n=9, scale=1.2)
    swizzled = pts[:, [0, 2, 1]].copy()  # torus frame: (x, z, y)
    np.testing.assert_allclose(_eval(rev, pts), _eval(tor, swizzled), atol=1e-6)


def test_ops2d_formulas():
    a = bld.new_circle(0.5)
    b = bld.new_rectangle(0.7, 0.4)
    pts2 = rng.uniform(-1, 1, (256, 2)).astype(np.float32)
    d1 = new_sdf2(a).evaluate(pts2).astype(np.float64)
    d2 = new_sdf2(b).evaluate(pts2).astype(np.float64)
    np.testing.assert_allclose(
        new_sdf2(bld.union2d(a, b)).evaluate(pts2), np.minimum(d1, d2), atol=1e-6
    )
    np.testing.assert_allclose(
        new_sdf2(bld.difference2d(a, b)).evaluate(pts2), np.maximum(d1, -d2), atol=1e-6
    )
    np.testing.assert_allclose(
        new_sdf2(bld.intersection2d(a, b)).evaluate(pts2), np.maximum(d1, d2), atol=1e-6
    )
    np.testing.assert_allclose(
        new_sdf2(bld.xor2d(a, b)).evaluate(pts2),
        np.maximum(np.minimum(d1, d2), -np.maximum(d1, d2)),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        new_sdf2(bld.annulus(a, 0.1)).evaluate(pts2), np.abs(d1) - 0.1, atol=1e-6
    )
    np.testing.assert_allclose(
        new_sdf2(bld.offset2d(a, 0.07)).evaluate(pts2), d1 + 0.07, atol=1e-6
    )


def test_rotate2d_scale2d():
    r = bld.new_rectangle(0.8, 0.3)
    rot = bld.rotate2d(r, np.pi / 2)
    sdf = new_sdf2(rot)
    d = sdf.evaluate(np.array([[0, 0.35], [0.35, 0]], np.float32))
    assert d[0] < 0 and d[1] > 0  # rotated 90 deg: long axis now along y

    sc = bld.scale2d(bld.new_circle(0.5), 2.0)
    d = new_sdf2(sc).evaluate(np.array([[1.0, 0], [2.5, 0]], np.float32))
    np.testing.assert_allclose(d, [0.0, 1.5], atol=1e-6)


def test_translate_multi2d():
    c = bld.new_circle(0.1)
    disp = [(0.5, 0), (-0.5, 0), (0, 0.7)]
    tm = bld.translate_multi2d(c, disp)
    sdf = new_sdf2(tm)
    for dx, dy in disp:
        d = sdf.evaluate(np.array([[dx, dy]], np.float32))
        np.testing.assert_allclose(d, [-0.1], atol=1e-6)


def test_circular_array2d():
    c = bld.translate2d(bld.new_circle(0.05), 0.4, 0.0)
    ca = bld.circular_array2d(c, 6, 6)
    sdf = new_sdf2(ca)
    ang = 2 * np.pi / 6
    for i in range(6):
        p = np.array([[0.4 * np.cos(i * ang), 0.4 * np.sin(i * ang)]], np.float32)
        assert sdf.evaluate(p)[0] < -0.04


# --- randomized unary-op property tests (reference gsdf_test.go:233) ----
def _random_base():
    kind = rng.integers(0, 3)
    if kind == 0:
        return bld.new_sphere(0.3 + 0.5 * rng.random())
    if kind == 1:
        return bld.new_box(*(0.3 + rng.random(3)), 0.0)
    return bld.new_cylinder(0.2 + 0.4 * rng.random(), 0.5 + rng.random(), 0.0)


UNARY_OPS = [
    lambda s: bld.rotate(s, float(rng.random() * 3), (1, 2, 3)),
    lambda s: bld.translate(s, *(rng.random(3) - 0.5)),
    lambda s: bld.scale(s, 0.5 + rng.random()),
    lambda s: bld.symmetry(s, True, False, True),
    lambda s: bld.elongate(s, *np.abs(rng.random(3) * 0.4)),
    lambda s: bld.offset(s, -0.1 * rng.random()),
    lambda s: bld.shell(bld.scale(s, 1.0), 0.05 + 0.05 * rng.random()),
    lambda s: bld.array(s, 1.5, 1.5, 1.5, 2, 2, 2),
    lambda s: bld.circular_array(bld.translate(s, 1.5, 0, 0), 3, 6),
    lambda s: bld.twist(s, 0.3),
]


@pytest.mark.parametrize("i", range(len(UNARY_OPS)))
def test_random_unary_bounds(i):
    for _ in range(3):
        s = UNARY_OPS[i](_random_base())
        assert_bounds_valid_3d(s, n=4)


def test_smooth_ops_bounds():
    """Smooth blends bulge up to ~k/4 beyond the union of child bounds (the
    reference's Bounds has the same limitation, operations.go:575); validate
    against a k-padded box."""
    s1 = bld.new_sphere(0.5)
    s2 = bld.translate(bld.new_box(0.4, 0.6, 0.5, 0.0), 0.4, 0.2, 0.0)
    k = 0.1

    class PaddedBounds:
        def __init__(self, inner):
            self.inner = inner

        def distance(self, p):
            return self.inner.distance(p)

        def bounds(self):
            return self.inner.bounds().pad(k)

        def tree_hash(self):
            return self.inner.tree_hash() + b"pad"

    from gsdf_tpu.core.node import Shader3D

    for op in (bld.smooth_union, bld.smooth_difference, bld.smooth_intersect):
        wrapped = PaddedBounds(op(k, s1, s2))
        wrapped.__class__ = type(
            "PaddedShader", (PaddedBounds, Shader3D), {}
        )
        assert_bounds_valid_3d(wrapped, n=4)


def test_union_scan_grouping_exact():
    """Grouped-translate unions (lax.scan path) must match the sequential
    reduction bit-exactly (float min is exact)."""
    hole = bld.new_cylinder(0.08, 2.0, 0.0)
    rng2 = np.random.default_rng(5)
    offs = rng2.uniform(-1, 1, (12, 3)).astype(np.float32)
    translated = [bld.translate(hole, *o) for o in offs]
    u = bld.union(bld.new_sphere(0.3), *translated)
    assert len(u.joined) == 13
    pts = rng2.uniform(-1.5, 1.5, (512, 3)).astype(np.float32)
    got = _eval(u, pts)
    want = _eval(bld.new_sphere(0.3), pts)
    for t in translated:
        want = np.minimum(want, _eval(t, pts))
    np.testing.assert_array_equal(got, want)
