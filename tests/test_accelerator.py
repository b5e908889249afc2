"""Accelerator-vs-oracle parity (runs only when a non-CPU device exists;
the CI mesh is CPU-only so these skip there — examples/acceptance.py is the
full on-device harness)."""
import numpy as np
import pytest

import jax


def _accel():
    devs = [d for d in jax.devices() if d.platform != "cpu"]
    return devs[0] if devs else None


requires_accel = pytest.mark.skipif(_accel() is None, reason="no accelerator")


@requires_accel
def test_cross_device_distances():
    from gsdf_tpu import Builder
    from gsdf_tpu.eval import new_sdf3

    bld = Builder()
    s = bld.smooth_difference(
        0.1,
        bld.union(bld.new_sphere(0.6), bld.new_box(0.8, 0.5, 0.9, 0.05)),
        bld.new_cylinder(0.2, 3.0, 0.0),
    )
    rng = np.random.default_rng(7)
    pts = rng.uniform(-1.2, 1.2, (4096, 3)).astype(np.float32)
    d_cpu = new_sdf3(s, jax.devices("cpu")[0]).evaluate(pts)
    d_acc = new_sdf3(s, _accel()).evaluate(pts)
    # reference CPU<->GPU tolerance is 5e-3 (gsdf_test.go:529); ours is ulps
    np.testing.assert_allclose(d_acc, d_cpu, atol=5e-3)
    assert np.max(np.abs(d_acc - d_cpu)) < 1e-5


@requires_accel
def test_render_paths_agree_on_device():
    from gsdf_tpu import Builder
    from gsdf_tpu.render.flat import FlatRenderer

    bld = Builder()
    s = bld.new_sphere(0.7)
    fr = FlatRenderer(s, 0.05, device=_accel())
    tris = fr.render()
    verts, idx = fr.render_indexed()
    assert len(idx) == len(tris)


@requires_accel
def test_dc_count_backend_invariant():
    """DC triangle counts are backend-invariant: the same rotated scene
    (rotation exercises Transform.distance, historically the one source
    of cross-backend sign flips via the MXU's bf16 matmul default —
    fixed with expanded f32 VPU mul-adds, core/ops3.py) renders the
    SAME count on the CPU oracle and the accelerator. The flagship
    anchor is test_dual_contour.py::test_dc_bolt_golden_count_accel
    (bolt resdiv-256 == 99,844 on both backends)."""
    import math

    from gsdf_tpu import Builder
    from gsdf_tpu.render.dual_contour import DualContourRenderer

    bld = Builder()
    s = bld.smooth_union(0.12, bld.new_torus(0.7, 0.22), bld.new_box(0.9, 0.4, 0.6, 0.05))
    s = bld.rotate(s, 2.5 * math.pi / 2, (1, 0, 0.1))
    res = s.bounds().diagonal() / 96
    t_cpu = DualContourRenderer(s, res, device=jax.devices("cpu")[0]).render()
    t_acc = DualContourRenderer(s, res, device=_accel()).render()
    assert len(t_cpu) == len(t_acc)


@requires_accel
def test_compact_path_on_device_matches_cpu():
    """The production compact path on the accelerator must produce the
    same triangle count as the CPU oracle render AND bit-identical
    connectivity to the on-device welded path."""
    from gsdf_tpu import Builder
    from gsdf_tpu.render.flat import FlatRenderer

    bld = Builder()
    s = bld.smooth_union(0.15, bld.new_torus(0.7, 0.2), bld.new_sphere(0.5))
    res = s.bounds().diagonal() / 64
    cv, ct = FlatRenderer(s, res, device=_accel()).render_compact()
    wv, wt = FlatRenderer(s, res, device=_accel()).render_indexed()
    np.testing.assert_array_equal(ct, wt)
    tris_cpu = FlatRenderer(s, res, device=jax.devices("cpu")[0]).render()
    assert len(ct) == len(tris_cpu)
