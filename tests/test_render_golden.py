"""Golden renderer determinism tests (reference glrender/glrender_test.go)."""
import io

import numpy as np
import pytest

from gsdf_tpu import Builder
from gsdf_tpu.render import FlatRenderer, read_binary_stl, write_binary_stl


def test_sphere_golden_triangle_count():
    """Sphere r=1 at res r/33 must produce exactly 41072 triangles
    (reference glrender/glrender_test.go:96)."""
    bld = Builder()
    s = bld.new_sphere(1.0)
    fr = FlatRenderer(s, 1.0 / 33)
    tris = fr.render()
    assert tris.shape == (41072, 3, 3)
    # every corner evaluated exactly once
    assert fr.evaluations() == 68**3


def test_stl_roundtrip():
    bld = Builder()
    s = bld.new_box(1.0, 0.75, 0.5, 0.05)
    tris = FlatRenderer(s, 0.05).render()
    assert len(tris) > 0
    buf = io.BytesIO()
    write_binary_stl(buf, tris)
    buf.seek(0)
    back = read_binary_stl(buf)
    np.testing.assert_array_equal(tris, back)


def test_triangles_on_surface():
    """All MC vertices must lie within a cube diagonal of the true surface."""
    bld = Builder()
    s = bld.new_sphere(0.8)
    res = 0.8 / 20
    tris = FlatRenderer(s, res).render()
    verts = tris.reshape(-1, 3)
    r = np.linalg.norm(verts, axis=1)
    assert np.max(np.abs(r - 0.8)) < res


def test_empty_far_field():
    """A tiny sphere rendered at coarse resolution still yields triangles;
    degenerate empty cases return empty arrays rather than crashing."""
    bld = Builder()
    s = bld.new_sphere(0.1)
    tris = FlatRenderer(s, 0.05).render()
    assert len(tris) > 0


def test_stl_validation():
    from gsdf_tpu.render.stl import validate_stl_triangles, _STL_DTYPE
    from gsdf_tpu.native import stl_encode

    bld2 = Builder()
    tris = FlatRenderer(bld2.new_sphere(0.5), 0.05).render()
    rec = np.frombuffer(stl_encode(tris), dtype=_STL_DTYPE)
    stats = validate_stl_triangles(rec)
    assert stats["nonfinite"] == 0
    assert stats["normal_mismatches"] == 0
    # validated read path
    buf = io.BytesIO()
    write_binary_stl(buf, tris)
    buf.seek(0)
    back = read_binary_stl(buf, validate=True)
    assert len(back) == len(tris)


def test_staged_slab_chunking_bitexact():
    """Regression (CONFIRMED 1-ulp drift): the staged path's z-slab
    chunking must pass the slab's GLOBAL layer offset as a traced k0
    (positions = origin + (k0+i)*res) — shifting the origin per slab
    ((origin + k*res) + i*res) drifted ~1/3 of coordinates by 1 ulp, so
    triangle output depended on max_slab_points, violating the
    slabbed-path bit-exactness hard rule."""
    bld2 = Builder()
    s = bld2.difference(
        bld2.smooth_union(
            0.1, bld2.new_sphere(0.73), bld2.new_box(1.1, 0.9, 0.53, 0.05)
        ),
        bld2.new_cylinder(0.21, 3.0, 0.0),
    )
    res = 0.047  # deliberately non-dyadic: exercises rounding
    whole = FlatRenderer(s, res).render(fused=False)
    fr = FlatRenderer(s, res, max_slab_points=0)  # 1-plane slabs
    chunked = fr.render(fused=False)
    np.testing.assert_array_equal(chunked, whole)
