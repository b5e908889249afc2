"""Dual contour renderer tests (reference glrender/dual_contour_test.go +
glrender_test.go:22-81)."""
import numpy as np
import pytest

from gsdf_tpu import Builder
from gsdf_tpu.render.dual_contour import DualContourLeastSquares, DualContourRenderer

bld = Builder()


def _watertight(tris, tol=1e-5):
    """Each directed edge must appear exactly once (closed orientable mesh)."""
    q = np.round(tris / tol).astype(np.int64)
    edges = set()
    for t in q:
        for a, b in ((0, 1), (1, 2), (2, 0)):
            e = (tuple(t[a]), tuple(t[b]))
            if e in edges:
                return False  # duplicate directed edge
            edges.add(e)
    # every edge must have its reverse
    for (a, b) in edges:
        if (b, a) not in edges:
            return False
    return True


@pytest.mark.parametrize("chiseled", [False, True])
def test_dc_sphere(chiseled):
    s = bld.new_sphere(1.0)
    dc = DualContourRenderer(s, 1 / 12, DualContourLeastSquares(chiseled=chiseled))
    tris = dc.render()
    assert len(tris) > 500
    r = np.linalg.norm(tris.reshape(-1, 3), axis=1)
    assert abs(r.min() - 1) < 0.02 and abs(r.max() - 1) < 0.02
    assert _watertight(tris)


def test_dc_box_sharp_features():
    """DC's selling point: box corners should be recovered near-exactly."""
    s = bld.new_box(1.0, 0.8, 0.6, 0.0)
    dc = DualContourRenderer(s, 0.1, DualContourLeastSquares(chiseled=True))
    tris = dc.render()
    assert len(tris) > 100
    verts = tris.reshape(-1, 3)
    # some vertex should be near each of the 8 corners
    for sx in (-0.5, 0.5):
        for sy in (-0.4, 0.4):
            for sz in (-0.3, 0.3):
                d = np.linalg.norm(verts - [sx, sy, sz], axis=1).min()
                assert d < 0.08, f"corner ({sx},{sy},{sz}) missed by {d}"
    assert _watertight(tris)


def test_dc_nonuniform_part():
    s = bld.difference(
        bld.smooth_union(0.1, bld.new_sphere(0.6), bld.new_cylinder(0.3, 1.4, 0.0)),
        bld.new_cylinder(0.15, 3.0, 0.0),
    )
    dc = DualContourRenderer(s, 0.05)
    tris = dc.render()
    assert len(tris) > 1000
    assert np.all(np.isfinite(tris))


def test_dc_bolt_stl(tmp_path):
    """Full bolt through dual contouring to STL (reference
    glrender_test.go:22-53)."""
    import io

    from gsdf_tpu.forge import threads
    from gsdf_tpu.render.stl import read_binary_stl, write_binary_stl

    b = threads.bolt(
        bld,
        threads.BoltParams(
            thread=threads.ISO(d=3, p=0.5, ext=True),
            style=threads.NutStyle.HEX,
            total_length=5.0,
            shank_length=2.0,
        ),
    )
    res = b.bounds().diagonal() / 64
    tris = DualContourRenderer(b, res, DualContourLeastSquares(chiseled=True)).render()
    assert len(tris) > 1000
    buf = io.BytesIO()
    write_binary_stl(buf, tris)
    buf.seek(0)
    back = read_binary_stl(buf)
    np.testing.assert_array_equal(tris, back)


def test_dc_edge_field_grid_size_guard():
    """Edge ids pack into bits 0-30 (bit 31 = winding flip): grids with
    3*nvox >= 2^31 must be rejected, not silently corrupted."""
    import jax
    import pytest

    from gsdf_tpu.render.dual_contour import _dc_edges_fn

    bld2 = Builder()
    s = bld2.new_sphere(1.0)
    with pytest.raises(ValueError, match="edge ids"):
        _dc_edges_fn(s, (900, 900, 900), 1024, 0.01, jax.devices()[0])
