"""Pallas grid kernels (interpret mode on the CPU mesh): const-hoisting
for array-parameter trees, fused classification, FlatRenderer backend
flag. On-chip numbers live in docs/PERFORMANCE.md."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsdf_tpu import Builder
from gsdf_tpu.eval import evaluate_grid
from gsdf_tpu.eval.pallas_grid import (
    HAS_PALLAS,
    classified_grid_pallas,
    evaluate_grid_pallas,
)
from gsdf_tpu.ops import mc_emit
from gsdf_tpu.render.flat import FlatRenderer

pytestmark = pytest.mark.skipif(not HAS_PALLAS, reason="pallas unavailable")

bld = Builder()


def _poly_tree():
    """Tree with embedded ARRAY constants (polygon vertices) — exercises
    jaxpr-const hoisting into kernel operands."""
    poly = bld.new_polygon(
        np.array(
            [[0.0, 0.0], [1.0, 0.1], [0.8, 0.9], [0.2, 1.1], [-0.3, 0.5]],
            np.float32,
        )
    )
    return bld.union(bld.extrude(poly, 0.6), bld.new_sphere(0.4))


def test_pallas_array_const_tree():
    s = _poly_tree()
    shape = (6, 16, 140)
    origin = np.array([-0.8, -0.5, -0.4], np.float32)
    res = np.float32(0.02)
    dev = jax.devices("cpu")[0]
    g_pallas = np.asarray(evaluate_grid_pallas(s, origin, res, shape, dev))
    g_xla = np.asarray(evaluate_grid(s, origin, res, shape, dev))
    np.testing.assert_allclose(g_pallas, g_xla, atol=1e-6)


def test_pallas_fused_classification():
    """The in-kernel case grid equals mc_emit.classify of the XLA grid."""
    import jax.numpy as jnp

    s = bld.difference(bld.new_sphere(0.7), bld.new_box(0.6, 0.6, 2.0, 0.0))
    bb = s.bounds().scale_centered((1.01, 1.01, 1.01))
    res = np.float32(s.bounds().diagonal() / 40)
    shape = (18, 20, 22)
    dev = jax.devices("cpu")[0]
    dist, case = classified_grid_pallas(s, bb.min, res, shape, dev)
    g_xla = evaluate_grid(s, bb.min, res, shape, dev)
    np.testing.assert_allclose(np.asarray(dist), np.asarray(g_xla), atol=1e-6)
    index, active = mc_emit.classify(jnp.asarray(np.asarray(dist)), res)
    eff = np.where(np.asarray(active), np.asarray(index), 0)
    np.testing.assert_array_equal(np.asarray(case), eff)
    assert (np.asarray(case) != 0).sum() > 0


def test_flat_renderer_pallas_backend():
    """eval_backend='pallas' must reproduce the default render exactly
    (same classification -> same triangle count; coords to 1 ulp)."""
    s = bld.smooth_union(0.1, bld.new_sphere(0.6), bld.new_torus(0.7, 0.15))
    res = s.bounds().diagonal() / 48
    t_ref = FlatRenderer(s, res).render()
    t_pal = FlatRenderer(s, res, eval_backend="pallas").render(fused=False)
    assert len(t_ref) == len(t_pal)
    np.testing.assert_allclose(t_pal, t_ref, atol=1e-5)


def test_atan2_lowerable_signed_zero_seam():
    """The Cephes atan2 expansion must agree with jnp.arctan2 on the y=0
    half-plane seam, INCLUDING signed zeros — a sign flip there shifts
    angle-dependent SDFs (CircularArray, Screw) by 2*pi between the
    Pallas and XLA backends."""
    from gsdf_tpu.core.mathx import _atan2_lowerable

    zs = np.float32([0.0, -0.0, 1.0, -1.0, 0.5, -0.5, 3.0, -3.0])
    y, x = np.meshgrid(zs, zs)
    y, x = y.ravel(), x.ravel()
    got = np.asarray(_atan2_lowerable(jnp.asarray(y), jnp.asarray(x)))
    ref = np.arctan2(y, x)
    np.testing.assert_allclose(got, ref, atol=2e-7)
    # seam sign agreement, bit-level: +-0 and +-pi must match exactly
    seam = (y == 0) | (x == 0)
    np.testing.assert_array_equal(np.signbit(got[seam]), np.signbit(ref[seam]))


def test_xla_backend_is_default_at_production_shapes():
    """The Pallas backends are an ITERATION MODE, not the production
    path: FlatRenderer (and therefore every production render route)
    must select the XLA fused path by default regardless of shape
    (measured record in docs/PERFORMANCE.md — XLA wins runtime at every
    size and cold-compile at production sizes)."""
    from gsdf_tpu import Builder
    from gsdf_tpu.render.flat import FlatRenderer

    bld = Builder()
    s = bld.new_sphere(1.0)
    fr = FlatRenderer(s, 0.01)  # production-scale grid (~8M cubes)
    assert fr.eval_backend == "xla"
    fr2 = FlatRenderer(s, 0.2)
    assert fr2.eval_backend == "xla"
