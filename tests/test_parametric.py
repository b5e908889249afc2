"""Parametric evaluation: edited dimensions re-evaluate through the SAME
compiled executable, matching a freshly-built tree within float32 ulps
(operand vs baked-constant compilation changes XLA's constant folding, so
bit-exactness is not guaranteed — agreement is held to the framework's
1e-6 budget)."""

def _close(a, b):
    np.testing.assert_allclose(a, b, atol=1e-6, rtol=0)

import numpy as np
import pytest

from gsdf_tpu import Builder
from gsdf_tpu.eval import new_cpu_sdf3, new_sdf2
from gsdf_tpu.eval.parametric import (
    ParametricSDF2,
    ParametricSDF3,
    pack_params,
    structural_hash,
)

import jax

bld = Builder()
CPU = jax.devices("cpu")[0]


def _part(r, box, k, shift):
    return bld.smooth_union(
        k,
        bld.new_sphere(r),
        bld.translate(bld.new_box(*box, 0.05), *shift),
    )


def test_parametric_matches_fresh_tree():
    t1 = _part(0.6, (0.8, 0.5, 0.9), 0.1, (0.4, 0.1, -0.2))
    psdf = ParametricSDF3(t1, CPU)
    pts = np.random.default_rng(0).uniform(-1.5, 1.5, (1024, 3)).astype(np.float32)
    _close(psdf.evaluate(pts), new_cpu_sdf3(t1).evaluate(pts))
    # edit every continuous parameter; same executable, new values
    t2 = _part(0.75, (0.6, 0.7, 0.4), 0.2, (-0.1, 0.3, 0.1))
    assert structural_hash(t2) == structural_hash(t1)
    assert t2.tree_hash() != t1.tree_hash()
    _close(psdf.evaluate(pts, t2), new_cpu_sdf3(t2).evaluate(pts))


def test_parametric_structure_mismatch_raises():
    t1 = _part(0.6, (0.8, 0.5, 0.9), 0.1, (0.4, 0.1, -0.2))
    psdf = ParametricSDF3(t1, CPU)
    other = bld.union(bld.new_sphere(1.0), bld.new_sphere(2.0))
    with pytest.raises(ValueError):
        psdf.evaluate(np.zeros((4, 3), np.float32), other)


def test_parametric_screw():
    from gsdf_tpu.forge import threads

    s1 = threads.screw(bld, 2.0, threads.ISO(d=3, p=0.5, ext=True))
    psdf = ParametricSDF3(s1, CPU)
    pts = np.random.default_rng(1).uniform(-2, 2, (512, 3)).astype(np.float32)
    _close(psdf.evaluate(pts), new_cpu_sdf3(s1).evaluate(pts))
    # longer screw, same profile polygon: same structure (pitch/lead/length
    # are continuous; the profile is identical because p is unchanged)
    s2 = threads.screw(bld, 3.0, threads.ISO(d=3, p=0.5, ext=True))
    assert structural_hash(s2) == structural_hash(s1)
    _close(psdf.evaluate(pts, s2), new_cpu_sdf3(s2).evaluate(pts))


def test_parametric_2d():
    t1 = bld.annulus(bld.union2d(bld.new_circle(0.5), bld.new_rectangle(0.8, 0.3)), 0.1)
    psdf = ParametricSDF2(t1, CPU)
    pts = np.random.default_rng(2).uniform(-1, 1, (512, 2)).astype(np.float32)
    _close(psdf.evaluate(pts), new_sdf2(t1).evaluate(pts))
    t2 = bld.annulus(bld.union2d(bld.new_circle(0.4), bld.new_rectangle(0.5, 0.6)), 0.15)
    _close(psdf.evaluate(pts, t2), new_sdf2(t2).evaluate(pts))


def test_parametric_scan_union():
    hole = bld.new_cylinder(0.08, 2.0, 0.0)
    offs = np.random.default_rng(3).uniform(-1, 1, (6, 3)).astype(np.float32)
    u1 = bld.union(bld.new_sphere(0.3), *[bld.translate(hole, *o) for o in offs])
    psdf = ParametricSDF3(u1, CPU)
    pts = np.random.default_rng(4).uniform(-1.5, 1.5, (256, 3)).astype(np.float32)
    _close(psdf.evaluate(pts), new_cpu_sdf3(u1).evaluate(pts))
    offs2 = offs * 0.5
    u2 = bld.union(bld.new_sphere(0.35), *[bld.translate(hole, *o) for o in offs2])
    _close(psdf.evaluate(pts, u2), new_cpu_sdf3(u2).evaluate(pts))


def test_pack_params_roundtrip():
    t = _part(0.6, (0.8, 0.5, 0.9), 0.1, (0.4, 0.1, -0.2))
    flat = pack_params(t)
    # k + r + dims(3) + round + translate(3) = 9 floats
    assert flat.size == 9
    assert flat.dtype == np.float32


def test_parametric_render_no_recompile():
    """Mutating a continuous parameter re-renders through the same welded
    executable (the interactive-editing loop)."""
    import numpy as _np

    from gsdf_tpu.core.wrappers import with_bounds
    from gsdf_tpu.geometry import box3
    from gsdf_tpu.ops import fused_welded
    from gsdf_tpu.render.flat import FlatRenderer

    sph = bld.new_sphere(0.5)
    part = with_bounds(bld.union(sph, bld.new_box(0.4, 0.4, 1.0, 0.05)),
                       box3(-1, -1, -1, 1, 1, 1))
    fr = FlatRenderer(part, 0.06, device=CPU)
    def n_param_execs():
        return len(
            [k for k in fused_welded._welded_cache
             if isinstance(k, tuple) and k and k[0] == "param"]
        )

    v1, i1 = fr.render_indexed(parametric=True)
    try:
        # growing the sphere may grow buffers (legit grow-and-retry compiles)
        object.__setattr__(sph, "r", _np.float32(0.8))
        v2, i2 = fr.render_indexed(parametric=True)
        assert len(i2) != len(i1)
        r = _np.linalg.norm(v2[i2].reshape(-1, 3), axis=1).max()
        assert 0.78 < r < 0.82
        # further edits within the grown capacity: ZERO new executables
        n_exec = n_param_execs()
        object.__setattr__(sph, "r", _np.float32(0.7))
        v3, i3 = fr.render_indexed(parametric=True)
        assert n_param_execs() == n_exec, "in-capacity edit caused a recompile"
        r = _np.linalg.norm(v3[i3].reshape(-1, 3), axis=1).max()
        assert 0.68 < r < 0.72
    finally:
        object.__setattr__(sph, "r", _np.float32(0.5))


def test_parametric_scan_group_member_edit():
    """Regression (CONFIRMED bug): equal-valued Translate subtrees are
    scan-grouped; under the parametric executable the grouping must be
    value-BLIND with each member's subtree params riding the scan, so a
    post-compile rebind of ONE member is honored (previously the
    executable evaluated nodes[0]'s params for the whole group and the
    edit was silently ignored)."""
    spheres = [bld.new_sphere(1.0) for _ in range(4)]
    tree = bld.union(
        *[
            bld.translate(s, 4.0 * i, 0.0, 0.0)
            for i, s in enumerate(spheres)
        ]
    )
    psdf = ParametricSDF3(tree, CPU)
    pts = np.array(
        [[4.0 * i, 0.0, 1.5] for i in range(4)], np.float32
    )
    _close(psdf.evaluate(pts), new_cpu_sdf3(tree).evaluate(pts))
    tree.rebind({spheres[1]: {"r": 2.0}})
    oracle = new_cpu_sdf3(tree).evaluate(pts)
    assert oracle[1] < 0  # inside the edited sphere
    _close(psdf.evaluate(pts), oracle)
    # a structurally-identical tree with per-member DIFFERENT radii must
    # also evaluate correctly through the same executable
    spheres2 = [bld.new_sphere(0.5 + 0.3 * i) for i in range(4)]
    tree2 = bld.union(
        *[
            bld.translate(s, 4.0 * i, 0.0, 0.0)
            for i, s in enumerate(spheres2)
        ]
    )
    assert structural_hash(tree2) == structural_hash(tree)
    _close(psdf.evaluate(pts, tree2), new_cpu_sdf3(tree2).evaluate(pts))


def test_rebind_transform_rederives_inverse():
    """Regression (CONFIRMED bug): rebind({transform: {"t": M}}) must
    recompute the derived inverse — distance() uses ONLY t_inv, so a
    stale inverse made geometry silently disagree with bounds()."""
    import math as _math

    box = bld.new_box(1.0, 0.4, 0.2, 0.0)
    rot1 = bld.rotate(box, 0.3, (0, 0, 1))
    node = rot1  # the Transform node
    pts = np.random.default_rng(5).uniform(-1.2, 1.2, (256, 3)).astype(
        np.float32
    )
    # rebind to a different rotation and compare against a fresh build
    from gsdf_tpu.core.ops3 import Transform

    assert isinstance(node, Transform)
    fresh = bld.rotate(bld.new_box(1.0, 0.4, 0.2, 0.0), 1.1, (0, 0, 1))
    node.rebind({node: {"t": fresh.t}})
    _close(
        new_cpu_sdf3(node).evaluate(pts), new_cpu_sdf3(fresh).evaluate(pts)
    )
    np.testing.assert_allclose(
        node.bounds().min, fresh.bounds().min, atol=1e-6
    )
    # 2D rotation: same derived-inverse contract
    from gsdf_tpu.core.ops2 import Rotation2D

    c2 = bld.new_rectangle(1.0, 0.3)
    r2 = bld.rotate2d(c2, 0.4)
    assert isinstance(r2, Rotation2D)
    fresh2 = bld.rotate2d(bld.new_rectangle(1.0, 0.3), 1.2)
    r2.rebind({r2: {"t": fresh2.t}})
    pts2 = np.random.default_rng(6).uniform(-1, 1, (256, 2)).astype(
        np.float32
    )
    _close(new_sdf2(r2).evaluate(pts2), new_sdf2(fresh2).evaluate(pts2))


from test_fuzz_paths import _random_tree, _seed_range  # noqa: E402


@pytest.mark.parametrize("seed", _seed_range(6))
def test_parametric_binding_fuzz(seed):
    """Random trees over the FULL randomized op set (the generator the
    render-path fuzz uses): the operand-bound parametric executable must
    match the baked-constant trace at the framework's 1e-6 budget —
    before AND after a random continuous-parameter rebind evaluated
    through the SAME executable. Exercises _bind_params across every
    node family (screw/polygon/twist/circular-array/... params bound as
    tracers), where the fixed-scene tests above only cover a handful.

    Seed count widens with GSDF_TPU_FUZZ_SEEDS (marathon sweeps)."""
    from gsdf_tpu.eval.parametric import param_spec

    rng = np.random.default_rng(400 + seed)
    t = _random_tree(rng)
    if t is None:
        pytest.skip("builder rejected random combination")
    bb = t.bounds()
    if not np.isfinite(bb.diagonal()) or bb.diagonal() <= 0:
        pytest.skip("degenerate bounds")
    pts = rng.uniform(bb.min - 0.2, bb.max + 0.2, (2048, 3)).astype(np.float32)

    psdf = ParametricSDF3(t, CPU)
    _close(psdf.evaluate(pts), new_cpu_sdf3(t).evaluate(pts))

    spec = param_spec(t)
    if not spec:
        pytest.skip("tree has no continuous parameters")
    picks = rng.choice(len(spec), size=min(3, len(spec)), replace=False)
    for i in picks:
        node, name, _ = spec[int(i)]
        old = np.asarray(getattr(node, name), np.float32)
        t.rebind({node: {name: old * np.float32(1.05) + np.float32(0.01)}})
    # rebind invalidated the tree hash: new_cpu_sdf3 re-traces with the
    # edited constants; psdf re-packs the same values as operands
    _close(psdf.evaluate(pts), new_cpu_sdf3(t).evaluate(pts))
