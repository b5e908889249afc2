"""Multi-device sharded-render tests on the virtual 8-device CPU mesh
(conftest.py forces JAX_PLATFORMS=cpu + xla_force_host_platform_device_count=8).

The sharded path must reproduce the single-device FlatRenderer exactly:
same triangle count AND the same triangle set (the dryrun_multichip
criteria, __graft_entry__.py). Mirrors the reference's CPU-as-oracle
cross-check discipline (SURVEY.md §4)."""
import jax
import numpy as np
import pytest

from gsdf_tpu import Builder
from gsdf_tpu.forge import threads
from gsdf_tpu.parallel import make_mesh, render_sharded, sharded_grid_eval
from gsdf_tpu.render.flat import FlatRenderer


def _part():
    bld = Builder()
    return bld.difference(
        bld.smooth_union(0.1, bld.new_sphere(0.8), bld.new_box(1.2, 1.2, 0.5, 0.05)),
        bld.new_cylinder(0.3, 4.0, 0.0),
    )


def _assert_tris_equal(tris_a, tris_b):
    assert len(tris_a) == len(tris_b)
    np.testing.assert_allclose(
        np.sort(tris_a.reshape(-1, 9), axis=0),
        np.sort(tris_b.reshape(-1, 9), axis=0),
        atol=1e-6,
    )


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_render_sharded_matches_single(n_dev):
    devices = jax.devices("cpu")[:n_dev]
    assert len(devices) == n_dev
    mesh = make_mesh(devices)
    part = _part()
    res = 0.07
    tris_sharded = render_sharded(part, mesh, res, max_tris_per_shard=4096)
    tris_single = FlatRenderer(part, res, device=devices[0]).render()
    _assert_tris_equal(tris_sharded, tris_single)


def test_render_sharded_nondivisible_padding():
    """nk not divisible by mesh size: render_sharded pads the slab axis;
    the padded slabs must contribute zero triangles."""
    devices = jax.devices("cpu")[:8]
    mesh = make_mesh(devices)
    part = _part()
    # res chosen so nk = nz+1 is NOT a multiple of 8
    for res in (0.09, 0.11, 0.13):
        fr = FlatRenderer(part, res, device=devices[0])
        if (fr.nz + 1) % 8 != 0:
            break
    else:
        pytest.skip("could not find a non-divisible nk")
    tris_sharded = render_sharded(part, mesh, res, max_tris_per_shard=4096)
    tris_single = fr.render()
    _assert_tris_equal(tris_sharded, tris_single)


def test_render_sharded_deep_tree_screw():
    """Deep CSG tree (ISO screw: helical domain transform, polygon profile
    via scan) across 4 devices — exercises the sharded path on the tree
    family the flagship parts use."""
    devices = jax.devices("cpu")[:4]
    mesh = make_mesh(devices)
    bld = Builder()
    iso = threads.ISO(d=3.0, p=0.5)
    screw = threads.screw(bld, 4.0, iso)
    res = screw.bounds().diagonal() / 48
    tris_sharded = render_sharded(screw, mesh, res, max_tris_per_shard=1 << 14)
    tris_single = FlatRenderer(screw, res, device=devices[0]).render()
    _assert_tris_equal(tris_sharded, tris_single)


def test_sharded_grid_eval_matches_dense():
    """sharded_grid_eval over the mesh equals the single-device grid eval."""
    from gsdf_tpu.eval import evaluator as ev

    devices = jax.devices("cpu")[:8]
    mesh = make_mesh(devices)
    part = _part()
    bb = part.bounds().scale_centered((1.01, 1.01, 1.01))
    res = 0.1
    shape = (16, 21, 23)  # nk divisible by 8
    sharded = sharded_grid_eval(part, mesh, shape, bb.min, res)
    dense = ev.evaluate_grid(part, bb.min, np.float32(res), shape, devices[0])
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(dense), atol=1e-6
    )


def test_grow_and_retry_overflow():
    """A max_tris_per_shard smaller than the real count must raise or grow —
    render_sharded's contract is exact output, never silent truncation."""
    devices = jax.devices("cpu")[:2]
    mesh = make_mesh(devices)
    part = _part()
    res = 0.07
    tris_big = render_sharded(part, mesh, res, max_tris_per_shard=1 << 18)
    tris_small = render_sharded(part, mesh, res, max_tris_per_shard=256)
    _assert_tris_equal(tris_small, tris_big)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_render_sharded_compact_bitexact(n_dev):
    """The sharded compact-field path must produce the SAME indexed mesh
    as the single-device production path: identical tri_idx arrays and
    ulp-equal vertices (payload concatenation == single-device payload)."""
    devices = jax.devices("cpu")[:n_dev]
    mesh = make_mesh(devices)
    part = _part()
    res = 0.07
    from gsdf_tpu.parallel import render_sharded_compact

    sv, st = render_sharded_compact(part, mesh, res)
    fr = FlatRenderer(part, res, device=devices[0])
    cv, ct = fr.render_compact()
    np.testing.assert_array_equal(st, ct)
    np.testing.assert_allclose(sv, cv, atol=1e-6)


def test_render_sharded_compact_overflow_retry():
    from gsdf_tpu.parallel import render_sharded_compact

    devices = jax.devices("cpu")[:4]
    mesh = make_mesh(devices)
    part = _part()
    sv, st = render_sharded_compact(part, mesh, 0.07, size_hint=(1024, 1024, 64))
    fr = FlatRenderer(part, 0.07, device=devices[0])
    cv, ct = fr.render_compact()
    np.testing.assert_array_equal(st, ct)


def test_render_sharded_compact_slabbed_composition():
    """Sharding composed with slab dispatch (max_points_per_shard): the
    z-layer space is chunked, one executable is re-dispatched with a
    traced k_base, and the result is EXACTLY the whole-grid sharded (and
    single-device) indexed mesh — the payload-concatenation identity
    extended to chunks."""
    from gsdf_tpu.parallel import render_sharded_compact
    from gsdf_tpu.parallel.sharded import _step_cache

    devices = jax.devices("cpu")[:4]
    mesh = make_mesh(devices)
    part = _part()
    res = 0.07
    fr = FlatRenderer(part, res, device=devices[0])
    cv, ct = fr.render_compact()
    # force several chunks: a shard's whole-grid dispatch is ~nk/4 planes;
    # cap points per shard at ~3 planes worth
    plane = (fr.ny + 2) * (fr.nx + 2)
    n_exec_before = len(_step_cache)
    sv, st = render_sharded_compact(
        part, mesh, res, max_points_per_shard=3 * plane
    )
    np.testing.assert_array_equal(st, ct)
    np.testing.assert_allclose(sv, cv, atol=1e-6)
    # chunking reuses ONE executable (the k_base operand, not one
    # executable per chunk)
    assert len(_step_cache) <= n_exec_before + 2  # step + possible retry


def test_render_sharded_compact_ample_budget_clamped():
    """An AMPLE max_points_per_shard must behave exactly like the
    whole-grid split: the chunk height is clamped to the real grid, so a
    generous memory budget never makes shards evaluate — or the
    MAX_CUBES guard count — far-field padding past the part (regression:
    unclamped, a 10^9-point budget inflated C to ~10^9/plane layers)."""
    from gsdf_tpu.parallel import render_sharded_compact

    devices = jax.devices("cpu")[:4]
    mesh = make_mesh(devices)
    part = _part()
    res = 0.07
    fr = FlatRenderer(part, res, device=devices[0])
    cv, ct = fr.render_compact()
    sv, st = render_sharded_compact(
        part, mesh, res, max_points_per_shard=10**9
    )
    np.testing.assert_array_equal(st, ct)
    np.testing.assert_allclose(sv, cv, atol=1e-6)


def test_sharded_compact_grid_size_guard():
    """Global cube ids are int32-bounded exactly like the single-device
    builder: oversized grids raise instead of wrapping id arithmetic."""
    import pytest

    from gsdf_tpu.parallel.sharded import make_mesh, render_sharded_compact

    bld2 = Builder()
    s = bld2.new_sphere(1.0)
    mesh = make_mesh(jax.devices()[:2])
    with pytest.raises(ValueError, match="too large"):
        render_sharded_compact(s, mesh, 0.0015)
