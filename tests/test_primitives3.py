"""3D primitive correctness: analytic values (float64 oracle written
independently of the device code) + bounds/Lipschitz property tests,
mirroring reference gsdf_test.go:182-201."""
import numpy as np
import pytest

from gsdf_tpu import Builder
from gsdf_tpu.eval import new_cpu_sdf3

from helpers import assert_bounds_valid_3d, assert_field_valid_3d, grid_points_3d

bld = Builder()

ATOL = 2e-6


def oracle_sphere(p, r):
    return np.linalg.norm(p, axis=-1) - r


def oracle_box(p, dims, rnd):
    d = np.asarray(dims, np.float64) / 2
    q = np.abs(p) + rnd - d
    out = np.linalg.norm(np.maximum(q, 0), axis=-1)
    ins = np.minimum(q.max(axis=-1), 0)
    return out + ins - rnd


def oracle_cylinder(p, r, h, rnd):
    hh = (h - 2 * rnd) / 2
    dxy = np.hypot(p[..., 0], p[..., 1]) - r + rnd
    dz = np.abs(p[..., 2]) - hh
    return (
        np.minimum(np.maximum(dxy, dz), 0)
        + np.hypot(np.maximum(dxy, 0), np.maximum(dz, 0))
        - rnd
    )


def oracle_torus(p, rg, rl):
    q = np.hypot(p[..., 0], p[..., 1]) - rg
    return np.hypot(q, p[..., 2]) - rl


def _check(shape, oracle, atol=ATOL):
    sdf = new_cpu_sdf3(shape)
    pts = grid_points_3d(shape.bounds(), n=11, scale=1.4)
    got = sdf.evaluate(pts)
    want = oracle(pts.astype(np.float64))
    np.testing.assert_allclose(got, want, atol=atol, rtol=0)


def test_sphere_values():
    _check(bld.new_sphere(0.7), lambda p: oracle_sphere(p, 0.7))


def test_box_values():
    _check(bld.new_box(1.0, 0.61, 0.42, 0.0), lambda p: oracle_box(p, (1.0, 0.61, 0.42), 0.0))
    _check(bld.new_box(1.0, 0.61, 0.42, 0.1), lambda p: oracle_box(p, (1.0, 0.61, 0.42), 0.1))


def test_cylinder_values():
    _check(bld.new_cylinder(0.5, 1.2, 0.0), lambda p: oracle_cylinder(p, 0.5, 1.2, 0.0))
    _check(bld.new_cylinder(0.5, 1.2, 0.1), lambda p: oracle_cylinder(p, 0.5, 1.2, 0.1))


def test_torus_values():
    _check(bld.new_torus(1.0, 0.3), lambda p: oracle_torus(p, 1.0, 0.3))


def test_sphere_center_value():
    sdf = new_cpu_sdf3(bld.new_sphere(1.0))
    d = sdf.evaluate(np.zeros((1, 3), np.float32))
    assert abs(d[0] + 1.0) < 1e-7


ALL_PRIMS = [
    ("sphere", lambda: bld.new_sphere(0.7)),
    ("box", lambda: bld.new_box(1.0, 0.61, 0.42, 0.05)),
    ("cylinder", lambda: bld.new_cylinder(0.5, 1.2, 0.0)),
    ("cylinder_round", lambda: bld.new_cylinder(0.5, 1.2, 0.1)),
    ("hex_prism", lambda: bld.new_hexagonal_prism(0.6, 0.4)),
    ("torus", lambda: bld.new_torus(1.0, 0.3)),
    ("box_frame", lambda: bld.new_box_frame(1.0, 0.8, 0.6, 0.1)),
    ("tri_prism", lambda: bld.new_triangular_prism(0.5, 0.8)),
]


@pytest.mark.parametrize("name,mk", ALL_PRIMS)
def test_bounds_property(name, mk):
    assert_bounds_valid_3d(mk(), n=5)


@pytest.mark.parametrize("name,mk", ALL_PRIMS)
def test_field_valid(name, mk):
    assert_field_valid_3d(mk(), n=8)


def test_builder_validation():
    import pytest as _pytest

    from gsdf_tpu import Flags, ShapeError

    b = Builder()
    with _pytest.raises(ShapeError):
        b.new_sphere(-1.0)
    with _pytest.raises(ShapeError):
        b.new_box(1, 1, 1, 10)
    # accumulate mode (reference TestBuilderErrors, gsdf_test.go:136)
    b2 = Builder(Flags.NO_DIMENSION_PANIC)
    b2.new_sphere(-1.0)
    b2.new_cylinder(-1, 2, 0)
    err = b2.err()
    assert err is not None
    b2.clear_errors()
    assert b2.err() is None
