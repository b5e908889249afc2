"""Shader.rebind — the supported parametric-edit API.

An edit must (a) re-render through the SAME parametric executable (zero
recompiles), (b) invalidate structural hashes so non-parametric paths see
the new geometry, and (c) reject structural edits."""
import numpy as np
import pytest

from gsdf_tpu import Builder
from gsdf_tpu.render.flat import FlatRenderer


def _part(bld):
    hole = bld.new_cylinder(0.25, 4.0, 0.0)
    body = bld.smooth_union(
        0.1,
        bld.new_box(1.6, 1.0, 0.5, 0.05),
        bld.new_cylinder(0.45, 1.2, 0.05),
    )
    return bld.difference(body, hole), body.s2  # (tree, boss cylinder)


def test_rebind_zero_recompiles_welded():
    from gsdf_tpu.core.wrappers import with_bounds
    from gsdf_tpu.geometry import box3
    from gsdf_tpu.ops import fused_welded

    bld = Builder()
    part, cyl = _part(bld)
    pinned = with_bounds(part, box3(-1.2, -0.8, -0.9, 1.2, 0.8, 0.9))
    fr = FlatRenderer(pinned, 0.05)
    fr.render_indexed(parametric=True)
    # second render reaches steady state (the first records a tighter
    # buffer hint; the minimal-size executable compiles once here)
    _, i0 = fr.render_indexed(parametric=True)
    n_exec = len(fused_welded._welded_cache)

    pinned.rebind({cyl: {"r": 0.35}})  # shrink: sized buffers still fit
    _, i1 = fr.render_indexed(parametric=True)
    assert len(i1) != len(i0)  # geometry actually changed
    assert len(fused_welded._welded_cache) == n_exec  # zero new executables


def test_rebind_zero_recompiles_compact():
    from gsdf_tpu.core.wrappers import with_bounds
    from gsdf_tpu.geometry import box3
    from gsdf_tpu.ops import compact_field

    bld = Builder()
    part, cyl = _part(bld)
    pinned = with_bounds(part, box3(-1.2, -0.8, -0.9, 1.2, 0.8, 0.9))
    fr = FlatRenderer(pinned, 0.05)
    fr.render_compact(parametric=True)
    _, i0 = fr.render_compact(parametric=True)  # steady state (see above)
    n_exec = len(compact_field._cache)

    pinned.rebind({cyl: {"r": 0.35}})  # shrink: sized buffers still fit
    _, i1 = fr.render_compact(parametric=True)
    assert len(i1) != len(i0)
    assert len(compact_field._cache) == n_exec


def test_rebind_invalidates_tree_hash():
    bld = Builder()
    s = bld.new_sphere(0.5)
    tree = bld.union(s, bld.new_box(1, 1, 1, 0))
    h0 = tree.tree_hash()
    tree.rebind({s: {"r": 0.7}})
    assert tree.tree_hash() != h0  # non-parametric paths get a fresh key
    # distances reflect the edit
    d = np.asarray(s.distance(np.zeros((1, 3), np.float32)))
    np.testing.assert_allclose(d, [-0.7], atol=1e-7)


def test_rebind_rejects_structural_and_foreign():
    bld = Builder()
    s = bld.new_sphere(0.5)
    tree = bld.union(s, bld.new_box(1, 1, 1, 0))
    other = bld.new_sphere(1.0)
    with pytest.raises(ValueError, match="not in this tree"):
        tree.rebind({other: {"r": 0.2}})
    with pytest.raises(AttributeError):
        tree.rebind({s: {"nope": 1.0}})
    # a structural param: polygon vertices feed host-side validation
    poly = bld.new_polygon(
        np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    )
    name = next(
        (
            p
            for p in poly.PARAMS
            if p not in getattr(poly, "CONT_PARAMS", ())
        ),
        None,
    )
    if name is not None:
        with pytest.raises(ValueError, match="structural"):
            bld.extrude(poly, 1.0).rebind({poly: {name: 0.0}})


def test_rebind_shape_mismatch():
    bld = Builder()
    s = bld.new_sphere(0.5)
    with pytest.raises(ValueError, match="shape"):
        s.rebind({s: {"r": np.zeros(3, np.float32)}})


def test_rebind_zero_recompiles_sharded():
    """Parametric editing composes with the 8-device mesh: a rebind edit
    re-renders through the SAME sharded executable (zero new steps), and
    the sharded result still matches the single-device compact render."""
    import jax

    from gsdf_tpu.core.wrappers import with_bounds
    from gsdf_tpu.geometry import box3
    from gsdf_tpu.parallel import sharded
    from gsdf_tpu.parallel.sharded import make_mesh, render_sharded_compact

    bld = Builder()
    part, cyl = _part(bld)
    pinned = with_bounds(part, box3(-1.2, -0.8, -0.9, 1.2, 0.8, 0.9))
    mesh = make_mesh(jax.devices("cpu")[:8])
    render_sharded_compact(pinned, mesh, 0.05, parametric=True)
    _, i0 = render_sharded_compact(pinned, mesh, 0.05, parametric=True)
    n_exec = sum(1 for k in sharded._step_cache if k and k[0] == "param")

    pinned.rebind({cyl: {"r": 0.35}})  # shrink: sized buffers still fit
    sv, i1 = render_sharded_compact(pinned, mesh, 0.05, parametric=True)
    assert len(i1) != len(i0)  # geometry actually changed
    assert (
        sum(1 for k in sharded._step_cache if k and k[0] == "param") == n_exec
    )  # zero new executables

    # and the edited sharded render equals the single-device compact path
    cv, ct = FlatRenderer(pinned, 0.05, device=jax.devices("cpu")[0]).render_compact()
    np.testing.assert_array_equal(i1, ct)
    np.testing.assert_allclose(sv, cv, atol=1e-6)


def test_rebind_zero_recompiles_pruned_compact():
    """Parametric editing composes with the tile-pruned compact path: an
    edit re-renders through the SAME coarse + tile executables (zero new
    kernels as long as batch-size buckets recur) and still matches the
    dense compact render."""
    from gsdf_tpu.core.wrappers import with_bounds
    from gsdf_tpu.geometry import box3
    from gsdf_tpu.render import pruned as pruned_mod
    from gsdf_tpu.render.pruned import PrunedRenderer

    bld = Builder()
    part, cyl = _part(bld)
    pinned = with_bounds(part, box3(-1.2, -0.8, -0.9, 1.2, 0.8, 0.9))
    pr = PrunedRenderer(pinned, 0.05, tiles_per_batch=512)
    pr.render_compact(parametric=True)
    _, i0 = pr.render_compact(parametric=True)  # steady state
    n_exec = sum(
        1
        for k in pruned_mod._kernel_cache
        if k and isinstance(k[0], str) and k[0].endswith("-param")
    )

    pinned.rebind({cyl: {"r": 0.35}})  # shrink: sized buffers still fit
    _, i1 = pr.render_compact(parametric=True)
    assert len(i1) != len(i0)  # geometry actually changed
    assert (
        sum(
            1
            for k in pruned_mod._kernel_cache
            if k and isinstance(k[0], str) and k[0].endswith("-param")
        )
        == n_exec
    )  # zero new executables

    # the edited pruned render equals the dense compact path
    _, ct = FlatRenderer(pinned, 0.05).render_compact()
    np.testing.assert_array_equal(i1, ct)
