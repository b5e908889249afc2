"""Multi-chip dual contouring on the virtual 8-device CPU mesh.

The sharded DC path must reproduce the single-device device-QEF
renderer BIT-FOR-BIT: every voxel's QEF is solved in exactly one shard
from rows with identical values and identical addend order, and the
host quad emission is the SAME finish_dc_mesh implementation
(parallel/sharded_dc.py module docstring has the argument)."""
import jax
import numpy as np
import pytest

from gsdf_tpu import Builder
from gsdf_tpu.parallel import make_mesh, render_dc_sharded
from gsdf_tpu.render.dual_contour import (
    DualContourLeastSquares,
    DualContourRenderer,
)

bld = Builder()


def _part():
    return bld.difference(
        bld.smooth_union(0.1, bld.new_sphere(0.8), bld.new_box(1.2, 1.2, 0.5, 0.05)),
        bld.new_cylinder(0.3, 4.0, 0.0),
    )


@pytest.mark.parametrize("n_dev", [2, 8])
def test_dc_sharded_bitexact(n_dev):
    devices = jax.devices("cpu")[:n_dev]
    assert len(devices) == n_dev
    mesh = make_mesh(devices)
    part = _part()
    res = 0.05
    t_single = DualContourRenderer(part, res, device=devices[0]).render()
    t_sharded = render_dc_sharded(part, mesh, res)
    np.testing.assert_array_equal(t_sharded, t_single)


def test_dc_sharded_chiseled_bitexact():
    devices = jax.devices("cpu")[:8]
    mesh = make_mesh(devices)
    part = _part()
    res = 0.06
    c = DualContourLeastSquares(chiseled=True)
    t_single = DualContourRenderer(part, res, c, device=devices[0]).render()
    t_sharded = render_dc_sharded(part, mesh, res, contourer=c)
    np.testing.assert_array_equal(t_sharded, t_single)


def test_dc_sharded_nondivisible_padding():
    """Slab counts not divisible by the mesh size pad with far-field
    layers that must stay inactive (zero extra triangles)."""
    devices = jax.devices("cpu")[:8]
    mesh = make_mesh(devices)
    part = _part()
    for res in (0.09, 0.11, 0.13):
        dc = DualContourRenderer(part, res, device=devices[0])
        if dc.nz % 8 != 0:
            break
    else:
        pytest.skip("could not find a non-divisible slab count")
    t_single = dc.render()
    t_sharded = render_dc_sharded(part, mesh, res)
    np.testing.assert_array_equal(t_sharded, t_single)


def test_dc_sharded_ample_budget_clamped():
    """An AMPLE max_points_per_shard must behave exactly like the
    whole-grid split: the chunk height is clamped to the real grid
    (regression: unclamped, a 10^9-point budget made every shard
    evaluate ~10^9/plane far-field corner planes)."""
    devices = jax.devices("cpu")[:4]
    mesh = make_mesh(devices)
    part = _part()
    res = 0.07
    t_single = DualContourRenderer(part, res, device=devices[0]).render()
    t_sharded = render_dc_sharded(
        part, mesh, res, max_points_per_shard=10**9
    )
    np.testing.assert_array_equal(t_sharded, t_single)


def test_dc_sharded_grow_and_retry():
    """Undersized payload hints must grow-and-retry to the identical
    result, never truncate (header counts are the in-band signal)."""
    devices = jax.devices("cpu")[:4]
    mesh = make_mesh(devices)
    part = _part()
    res = 0.07
    t_single = DualContourRenderer(part, res, device=devices[0]).render()
    t_sharded = render_dc_sharded(part, mesh, res, size_hint=(1024, 1024, 4096))
    np.testing.assert_array_equal(t_sharded, t_single)


def test_dc_sharded_parametric_edit_zero_recompile():
    """Structural (parametric) sharded DC: a rebind edit re-renders
    through the same mesh executable — render_sharded_compact's edit
    contract, extended to DC."""
    from gsdf_tpu.core.wrappers import with_bounds
    from gsdf_tpu.geometry import box3
    from gsdf_tpu.parallel import sharded_dc as sdc

    devices = jax.devices("cpu")[:4]
    mesh = make_mesh(devices)
    bld2 = Builder()
    boss = bld2.new_cylinder(0.45, 1.2, 0.05)
    body = bld2.smooth_union(0.1, bld2.new_box(1.6, 1.0, 0.5, 0.05), boss)
    pinned = with_bounds(body, box3(-1.2, -0.8, -0.9, 1.2, 0.8, 0.9))
    t0 = render_dc_sharded(pinned, mesh, 0.06, parametric=True)
    n_exec = sum(
        1 for k in sdc._step_cache if isinstance(k, tuple) and k[0] == "dc-param"
    )
    pinned.rebind({boss: {"r": 0.3}})
    t1 = render_dc_sharded(pinned, mesh, 0.06, parametric=True)
    assert (
        sum(
            1
            for k in sdc._step_cache
            if isinstance(k, tuple) and k[0] == "dc-param"
        )
        == n_exec
    ), "parametric sharded DC edit compiled a new executable"
    assert len(t1) != len(t0)  # the edit changed the surface
    # vs the single-device PARAMETRIC render (same traced-operand
    # semantics): bit-identical. A non-parametric render constant-folds
    # the parameters into the executable and fuses differently — the
    # single-device parametric test pins that pairing at 1e-6, not
    # bit-exactness (test_dual_contour.py::test_dc_parametric_edit...).
    t_ref = DualContourRenderer(pinned, 0.06, device=devices[0]).render(
        parametric=True
    )
    np.testing.assert_array_equal(t1, t_ref)


@pytest.mark.parametrize("seed", range(3))
def test_dc_sharded_fuzz_seeded_trees(seed):
    """Seeded random trees through the sharded DC path: bit-identical
    to single-device (the MC fuzz battery's cross-path discipline)."""
    from tests.test_dual_contour import _fuzz_tree

    t = _fuzz_tree(seed)
    if t is None:
        pytest.skip("builder rejected combination")
    devices = jax.devices("cpu")[:8]
    mesh = make_mesh(devices)
    res = float(t.bounds().diagonal()) / 40
    t_single = DualContourRenderer(t, res, device=devices[0]).render()
    t_sharded = render_dc_sharded(t, mesh, res)
    np.testing.assert_array_equal(t_sharded, t_single)


def test_dc_sharded_slab_chunk_composition():
    """Sharding composed with slab dispatch (max_points_per_shard): the
    chunked render is BIT-IDENTICAL to the whole-grid sharded render
    (chunk slabs concatenate into exactly the whole-grid payload) and
    re-dispatches one shared executable per z-chunk."""
    devices = jax.devices("cpu")[:4]
    mesh = make_mesh(devices)
    part = _part()
    res = 0.06
    t_whole = render_dc_sharded(part, mesh, res)
    dc = DualContourRenderer(part, res, device=devices[0])
    plane_corners = (dc.ny + 2) * (dc.nx + 2)
    # force >= 3 chunks: each shard slab gets ~3 voxel layers
    t_chunked = render_dc_sharded(
        part, mesh, res, max_points_per_shard=5 * plane_corners
    )
    np.testing.assert_array_equal(t_chunked, t_whole)


def test_dc_sharded_chunked_parametric_edit():
    """Chunked composition under the parametric (zero-recompile) edit
    contract: every chunk reuses ONE per-structure executable across a
    rebind edit, and the result matches the single-device parametric
    render bit-for-bit."""
    from gsdf_tpu.core.wrappers import with_bounds
    from gsdf_tpu.geometry import box3
    from gsdf_tpu.parallel import sharded_dc as sdc

    devices = jax.devices("cpu")[:4]
    mesh = make_mesh(devices)
    bld2 = Builder()
    boss = bld2.new_cylinder(0.45, 1.2, 0.05)
    body = bld2.smooth_union(0.1, bld2.new_box(1.6, 1.0, 0.5, 0.05), boss)
    pinned = with_bounds(body, box3(-1.2, -0.8, -0.9, 1.2, 0.8, 0.9))
    res = 0.06
    dc = DualContourRenderer(pinned, res, device=devices[0])
    mp = 5 * (dc.ny + 2) * (dc.nx + 2)
    render_dc_sharded(pinned, mesh, res, parametric=True, max_points_per_shard=mp)
    n_exec = sum(
        1 for k in sdc._step_cache if isinstance(k, tuple) and k[0] == "dc-param"
    )
    pinned.rebind({boss: {"r": 0.3}})
    t1 = render_dc_sharded(
        pinned, mesh, res, parametric=True, max_points_per_shard=mp
    )
    assert (
        sum(
            1
            for k in sdc._step_cache
            if isinstance(k, tuple) and k[0] == "dc-param"
        )
        == n_exec
    ), "chunked parametric sharded DC edit compiled a new executable"
    t_ref = DualContourRenderer(pinned, res, device=devices[0]).render(
        parametric=True
    )
    np.testing.assert_array_equal(t1, t_ref)


def test_dc_sharded_grid_size_guard():
    """The per-SHARD int32 edge-id ceiling raises cleanly with the
    max_points_per_shard escape hatch named; a small chunk budget keeps
    the same grid renderable (the guard is per dispatch, not global)."""
    devices = jax.devices("cpu")[:2]
    mesh = make_mesh(devices)
    s = bld.new_sphere(1.0)
    with pytest.raises(ValueError, match="max_points_per_shard"):
        render_dc_sharded(s, mesh, 1.0 / 800)
