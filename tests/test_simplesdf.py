"""simplesdf chainable API tests (reference gsdfaux/simplesdf)."""
import os

import numpy as np
import pytest

from gsdf_tpu import simplesdf as sdf
from gsdf_tpu.eval import new_cpu_sdf3


def _d(shape3, pts):
    return new_cpu_sdf3(shape3.shader()).evaluate(np.asarray(pts, np.float32))


def test_chain_and_k_consumption():
    f = sdf.cylinder(1, 5, 0.1)
    g = f.diff(sdf.cylinder(0.5, 8, 0).k(0.1))
    from gsdf_tpu.core.ops3 import SmoothDifference

    assert isinstance(g.shader(), SmoothDifference)
    # k consumed: next boolean is sharp
    h = g.diff(sdf.sphere(0.2))
    from gsdf_tpu.core.ops3 import Difference

    assert isinstance(h.shader(), Difference)


def test_k_survives_transforms():
    c = sdf.cylinder(0.25, 3).rotate_y(np.pi / 2).k(0.1).translate(0, 0, -2.5)
    f = sdf.cylinder(1, 5).diff(c)
    from gsdf_tpu.core.ops3 import SmoothDifference

    assert isinstance(f.shader(), SmoothDifference)


def test_operator_sugar():
    f = sdf.sphere(1) | sdf.box(1, 1, 1, 0)
    from gsdf_tpu.core.ops3 import OpUnion

    assert isinstance(f.shader(), OpUnion)
    g = sdf.sphere(1) - sdf.sphere(0.5)
    d = _d(g, [[0.0, 0, 0]])
    assert d[0] > 0  # hollow center

    i = sdf.sphere(1) & sdf.box(0.5, 4, 4, 0)
    d = _d(i, [[0.0, 0, 0], [0.8, 0, 0]])
    assert d[0] < 0 and d[1] > 0


def test_2d_chain_extrude():
    f = sdf.hexagon(1).diff(sdf.circle(0.5)).extrude(2)
    d = _d(f, [[0.75, 0, 0], [0, 0, 0]])
    assert d[0] < 0  # inside hex ring
    assert d[1] > 0  # inside the hole


def test_fogleman_knurled_snippet():
    """The README-style program: rounded cylinder with smooth-diffed hole."""
    f = sdf.cylinder(1, 5, 0.1)
    x = sdf.box(1, 1, 4, 0).rotate_z(np.pi / 4)
    x = x.translate(1.6, 0, 0).circ_array(24, 24)
    x = x.twist(0.75) | x.twist(-0.75)
    f = f.diff(x.k(0.1))
    f = f.diff(sdf.cylinder(0.5, 8).k(0.1))
    bb = f.shader().bounds()
    assert np.all(np.isfinite(bb.min)) and np.all(np.isfinite(bb.max))
    d = _d(f, [[0.75, 0, 0]])
    assert np.isfinite(d[0])


def test_save_stl(tmp_path):
    p = tmp_path / "ball.stl"
    stats = sdf.sphere(1).save_stl(
        str(p), sdf.STLConfig(resolution_divisions=64, use_gpu=False)
    )
    assert stats["triangles"] > 100
    assert os.path.getsize(p) == 84 + 50 * stats["triangles"]


def test_panic_mode():
    sdf.set_panic_mode(False)
    try:
        sdf.sphere(-1)  # no raise
        assert sdf.err() is not None
        sdf.clear_errors()
        assert sdf.err() is None
    finally:
        sdf.set_panic_mode(True)
    with pytest.raises(Exception):
        sdf.sphere(-1)
