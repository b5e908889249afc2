"""Compact-field render path (ops/compact_field.py + native mc_decode):
must reproduce the welded/soup paths exactly in count and connectivity,
and vertex coordinates to the last ulp."""
import numpy as np
import pytest

from gsdf_tpu import Builder
from gsdf_tpu.render.flat import FlatRenderer


def _parts():
    bld = Builder()
    yield "sphere", bld.new_sphere(0.9)
    yield "boolean", bld.difference(
        bld.smooth_union(0.1, bld.new_sphere(0.8), bld.new_box(1.2, 1.2, 0.5, 0.05)),
        bld.new_cylinder(0.3, 4.0, 0.0),
    )
    yield "torus", bld.new_torus(0.7, 0.25)


@pytest.mark.parametrize("name,part", list(_parts()))
def test_compact_matches_soup(name, part):
    res = part.bounds().diagonal() / 64
    fr = FlatRenderer(part, res)
    verts, tri_idx = fr.render_compact()
    tris_compact = verts[tri_idx]
    tris_soup = FlatRenderer(part, res).render()
    assert len(tris_compact) == len(tris_soup)
    # same triangles in the same order, ulp-level coordinate agreement
    np.testing.assert_allclose(
        tris_compact, tris_soup, atol=1e-5, rtol=1e-6
    )


def test_compact_matches_welded_exactly():
    """Same vertex enumeration as the welded device path: identical
    tri_idx arrays and ulp-equal vertices."""
    bld = Builder()
    part = bld.smooth_union(0.15, bld.new_sphere(0.7), bld.new_torus(0.8, 0.2))
    res = part.bounds().diagonal() / 48
    fr1 = FlatRenderer(part, res)
    cv, ct = fr1.render_compact()
    fr2 = FlatRenderer(part, res)
    wv, wt = fr2.render_indexed()
    np.testing.assert_array_equal(ct, wt)
    assert cv.shape == wv.shape
    np.testing.assert_allclose(cv, wv, atol=1e-5, rtol=1e-6)


def test_numpy_fallback_matches_native():
    """The numpy decoder and the C++ decoder agree bit-for-bit (when the
    native library is available)."""
    from gsdf_tpu import native
    from gsdf_tpu.native import _mc_decode_numpy, mc_decode
    from gsdf_tpu.ops.compact_field import compact_field_render

    import jax

    bld = Builder()
    part = bld.new_box(1.0, 0.8, 0.6, 0.1)
    res = np.float32(0.05)
    fr = FlatRenderer(part, res)
    nk, nj, ni = fr.nz + 1, fr.ny + 1, fr.nx + 1
    ids, cases, tvals, _ = compact_field_render(
        part, fr.origin, res, (nk, nj, ni), jax.devices()[0]
    )
    v_np, t_np = _mc_decode_numpy(
        np.asarray(ids), np.asarray(cases), np.asarray(tvals),
        fr.nx, fr.ny, fr.nz, fr.origin, fr.res,
    )
    if native.get_lib() is None:
        pytest.skip("no native toolchain")
    v_c, t_c = mc_decode(ids, cases, tvals, fr.nx, fr.ny, fr.nz, fr.origin, fr.res)
    np.testing.assert_array_equal(t_np, t_c)
    np.testing.assert_array_equal(v_np, v_c)


def test_stl_encode_indexed_matches_soup_encoder():
    from gsdf_tpu.native import stl_encode, stl_encode_indexed

    rng = np.random.default_rng(1)
    verts = rng.standard_normal((64, 3)).astype(np.float32)
    tri_idx = rng.integers(0, 64, (40, 3)).astype(np.int32)
    assert stl_encode_indexed(verts, tri_idx) == stl_encode(verts[tri_idx])


def test_sphere_golden_compact():
    """The compact path must hit the same golden count as every other
    path (glrender/glrender_test.go:96)."""
    bld = Builder()
    fr = FlatRenderer(bld.new_sphere(1.0), 1.0 / 33)
    verts, tri_idx = fr.render_compact()
    assert tri_idx.shape == (41072, 3)


def test_empty_scene_compact():
    """A grid whose surface misses every cube: zero actives, empty mesh."""
    bld = Builder()
    s = bld.new_sphere(0.05)
    from gsdf_tpu.core.wrappers import with_bounds
    from gsdf_tpu.geometry import box3

    # render region far away from the tiny sphere's surface
    far = with_bounds(bld.translate(s, 100, 100, 100), box3(-1, -1, -1, 1, 1, 1))
    verts, tri_idx = FlatRenderer(far, 0.2).render_compact()
    assert len(verts) == 0 and len(tri_idx) == 0


def test_simplesdf_obj_ply_export(tmp_path):
    from gsdf_tpu import simplesdf as sdf

    part = sdf.sphere(0.6) | sdf.box(0.8, 0.8, 0.8, 0)
    cfg = sdf.STLConfig(resolution_divisions=48)
    n1 = part.save_obj(str(tmp_path / "p.obj"), cfg)
    n2 = part.save_ply(str(tmp_path / "p.ply"), cfg)
    assert n1 == n2 > 100
    txt = (tmp_path / "p.obj").read_text()
    assert txt.startswith("v ") and "\nf " in txt
    assert (tmp_path / "p.ply").read_bytes().startswith(b"ply\n")


def test_render_compact_without_native_toolchain(monkeypatch):
    """With no native library (numpy fallbacks), render_compact must
    produce the identical mesh."""
    from gsdf_tpu import native

    bld = Builder()
    part = bld.difference(bld.new_sphere(0.8), bld.new_box(0.5, 0.5, 2.0, 0))
    res = part.bounds().diagonal() / 40
    v_ref, t_ref = FlatRenderer(part, res).render_compact()
    monkeypatch.setattr(native, "get_lib", lambda: None)
    v_np, t_np = FlatRenderer(part, res).render_compact()
    np.testing.assert_array_equal(t_np, t_ref)
    np.testing.assert_array_equal(v_np, v_ref)


def _box_payload():
    """A real compact payload for a box surface, plus its grid dims."""
    import jax

    from gsdf_tpu.ops.compact_field import compact_field_render

    bld = Builder()
    part = bld.new_box(1.0, 0.8, 0.6, 0.1)
    res = np.float32(0.05)
    fr = FlatRenderer(part, res)
    nk, nj, ni = fr.nz + 1, fr.ny + 1, fr.nx + 1
    ids, cases, tvals, _ = compact_field_render(
        part, fr.origin, res, (nk, nj, ni), jax.devices()[0]
    )
    return (
        np.asarray(ids),
        np.asarray(cases),
        np.asarray(tvals),
        fr.nx,
        fr.ny,
        fr.nz,
        np.asarray(fr.origin, np.float32),
        np.float32(fr.res),
    )


def test_mc_decode_rejects_out_of_range_ids():
    """An id past the decode space must raise ValueError on BOTH decode
    paths — the native decoder bounds-checks in pass 1 instead of writing
    out of bounds; the numpy fallback checks ids up front."""
    from gsdf_tpu import native
    from gsdf_tpu.native import _mc_decode_numpy, mc_decode

    ids, cases, tvals, nx, ny, nz, origin, res = _box_payload()
    # shrink the decode space: the top slab's ids fall out of range
    with pytest.raises(ValueError):
        _mc_decode_numpy(ids, cases, tvals, nx, ny, nz - 1, origin, res)
    if native.get_lib() is not None:
        with pytest.raises(ValueError):
            mc_decode(ids, cases, tvals, nx, ny, nz - 1, origin, res)


def test_mc_decode_numpy_rejects_boundary_owner():
    """Owner-edge references past the grid's max face must raise (so the
    caller's welded fallback triggers) exactly like the native decoder —
    never silently clamp back to the referencing cube (a silently corrupt
    mesh)."""
    from gsdf_tpu.native import _crossing_bits, _mc_decode_numpy

    ids, cases, tvals, nx, ny, nz, origin, res = _box_payload()
    # keep a consistent prefix of the payload: all cubes below the top
    # active slab, with the matching vertex-count prefix of tvals
    ck = ids.astype(np.int64) // (nx * ny)
    top = int(ck.max())
    keep = ck < top
    n_keep = int(keep.sum())
    assert 0 < n_keep < len(ids) and bool(keep[:n_keep].all())
    nv_keep = int(_crossing_bits(cases[:n_keep].astype(np.int32)).sum())
    # decode space ends exactly at the kept slabs: the top kept slab's
    # +z owner references land out of range
    with pytest.raises(ValueError):
        _mc_decode_numpy(
            ids[:n_keep], cases[:n_keep], tvals[:nv_keep],
            nx, ny, top, origin, res,
        )


def test_slabbed_compact_payload_identity():
    """Past the memory gate the compact kernel dispatches per z-slab; the
    concatenated payload must be EXACTLY the whole-grid payload (same
    identity the sharded path relies on), so the decoded mesh is
    bit-identical — the path never degrades to the soup/welded paths."""
    import jax

    from gsdf_tpu.ops.compact_field import (
        compact_field_render,
        compact_field_render_slabbed,
    )

    bld = Builder()
    part = bld.smooth_union(0.1, bld.new_sphere(0.7), bld.new_torus(0.8, 0.2))
    res = np.float32(part.bounds().diagonal() / 56)
    fr = FlatRenderer(part, res)
    shape = (fr.nz + 1, fr.ny + 1, fr.nx + 1)
    dev = jax.devices()[0]
    ids1, cases1, t1, _ = compact_field_render(part, fr.origin, res, shape, dev)
    # gate small enough to force several slabs
    max_pts = shape[1] * shape[2] * max(2, shape[0] // 5)
    ids2, cases2, t2, n_pts = compact_field_render_slabbed(
        part, fr.origin, res, shape, dev, max_pts
    )
    np.testing.assert_array_equal(ids2, ids1)
    np.testing.assert_array_equal(cases2, cases1)
    np.testing.assert_array_equal(t2, t1)
    assert n_pts >= shape[0] * shape[1] * shape[2]  # overlap planes counted


def test_render_compact_slabbed_gate():
    """FlatRenderer.render_compact with a tiny memory gate must produce
    the identical indexed mesh through the slabbed dispatches."""
    bld = Builder()
    part = bld.difference(bld.new_sphere(0.8), bld.new_box(0.5, 0.5, 2.0, 0))
    res = part.bounds().diagonal() / 48
    v_ref, t_ref = FlatRenderer(part, res).render_compact()
    fr = FlatRenderer(part, res)
    fr.compact_cubes = fr.ny * fr.nx * 4  # force ~nz/3 slabs
    v_sl, t_sl = fr.render_compact()
    np.testing.assert_array_equal(t_sl, t_ref)
    np.testing.assert_array_equal(v_sl, v_ref)


def test_compact_indices_hierarchical():
    """The hierarchical (block) compaction path must agree with a numpy
    reference exactly, including overflow truncation and -1 padding."""
    import jax.numpy as jnp

    from gsdf_tpu.ops.mc_emit import compact_indices

    rng = np.random.default_rng(0)
    cases = [
        (4_200_000, 0.02, 131072),  # hier path (n > 2^21, 16*size < n)
        (4_200_001, 0.001, 16384),  # non-multiple-of-8 length
        (3_000_000, 0.02, 32768),  # overflow: n_active > size
    ]
    for n, frac, size in cases:
        mask = rng.random(n) < frac
        ref = np.full(size, -1, np.int32)
        idx = np.flatnonzero(mask)[:size]
        ref[: len(idx)] = idx
        got = np.asarray(compact_indices(jnp.asarray(mask), size))
        np.testing.assert_array_equal(got, ref)
        flat = np.asarray(
            compact_indices(jnp.asarray(mask), size, method="sort-flat")
        )
        np.testing.assert_array_equal(flat, ref)


def test_compact_indices_blocks_overflow_signal():
    """The tightened block budget (compact_indices_blocks) must report
    the TRUE block count so callers can detect overflow in-band — never
    silent truncation. With enough slots the result is identical to the
    safe compact_indices path."""
    import jax.numpy as jnp

    from gsdf_tpu.ops.mc_emit import compact_indices, compact_indices_blocks

    rng = np.random.default_rng(7)
    n, size = 4_200_000, 131072
    mask = rng.random(n) < 0.02
    npads = -(-n // 8) * 8
    blocks_true = int(
        np.pad(mask, (0, npads - n)).reshape(-1, 8).any(axis=1).sum()
    )
    ref = np.asarray(compact_indices(jnp.asarray(mask), size))

    idx, n_blk = compact_indices_blocks(jnp.asarray(mask), size, blocks_true + 8)
    assert int(n_blk) == blocks_true
    np.testing.assert_array_equal(np.asarray(idx), ref)

    # undersized block budget: the true count is still reported (the
    # caller's grow-and-retry contract); the indices are NOT trusted
    _idx_bad, n_blk2 = compact_indices_blocks(
        jnp.asarray(mask), size, blocks_true // 2
    )
    assert int(n_blk2) == blocks_true  # overflow visible in-band

    # small inputs: hierarchy disabled, flat result, n_blk = 0
    small = rng.random(100_000) < 0.05
    ref_s = np.asarray(compact_indices(jnp.asarray(small), 8192))
    idx_s, nb_s = compact_indices_blocks(jnp.asarray(small), 8192, 4096)
    assert int(nb_s) == 0
    np.testing.assert_array_equal(np.asarray(idx_s), ref_s)


def test_compact_render_tight_block_budget_retry():
    """compact_field_render with a deliberately undersized block budget
    in the hint must grow-and-retry to a payload identical to the
    default run (the in-band n_blk header signal at work)."""
    import jax

    from gsdf_tpu.ops.compact_field import compact_field_render

    bld2 = Builder()
    part = bld2.smooth_union(
        0.08, bld2.new_sphere(0.8), bld2.new_box(1.1, 1.1, 0.4, 0.05)
    )
    res = np.float32(float(part.bounds().diagonal()) / 300)
    fr = FlatRenderer(part, res)
    shape = (fr.nz + 1, fr.ny + 1, fr.nx + 1)
    ncubes = fr.nx * fr.ny * fr.nz
    assert ncubes > (1 << 21), "grid must engage the hierarchical path"
    dev = jax.devices()[0]
    ids, cases, tvals, hint = compact_field_render(
        part, fr.origin, res, shape, dev
    )
    assert len(hint) == 4
    ids2, cases2, tvals2, hint2 = compact_field_render(
        part, fr.origin, res, shape, dev,
        size_hint=(hint[0], hint[1], hint[2], 4096),
    )
    np.testing.assert_array_equal(ids, ids2)
    np.testing.assert_array_equal(cases, cases2)
    np.testing.assert_array_equal(tvals, tvals2)
    assert hint2[3] > 4096  # the retry grew the block budget


def test_delta_payload_roundtrip_and_escape_retry():
    """The v2 wire format's delta encoding is LOSSLESS: decoded ids equal
    the pre-delta ids for payloads with large inter-cube gaps (escapes),
    a large first id (first delta is an escape), and an undersized
    exception table (grow-and-retry)."""
    import jax

    from gsdf_tpu.ops.compact_field import compact_field_render

    from gsdf_tpu.core.wrappers import with_bounds
    from gsdf_tpu.geometry.boxes import Box

    bld = Builder()
    # two tiny spheres far apart, domain forced to the full cube: the
    # first active cube sits deep into the grid (first delta is an
    # escape) and empty planes separate the runs (deltas >= 255)
    part = with_bounds(
        bld.union(
            bld.translate(bld.new_sphere(0.08), 0.9, 0.9, 0.9),
            bld.translate(bld.new_sphere(0.08), -0.9, -0.9, -0.3),
        ),
        Box((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0)),
    )
    res = np.float32(0.02)
    fr = FlatRenderer(part, res)
    shape = (fr.nz + 1, fr.ny + 1, fr.nx + 1)
    dev = jax.devices()[0]

    ids, cases, tvals, hint = compact_field_render(
        part, fr.origin, res, shape, dev
    )
    assert ids[0] > 255  # first delta must have gone through the table
    assert np.any(np.diff(ids.astype(np.int64)) >= 255)
    assert np.all(np.diff(ids.astype(np.int64)) > 0)  # ascending, unique

    # force an escape-table overflow: e_size=4 (the format's only new
    # buffer) must grow-and-retry to an identical result
    ids2, cases2, tvals2, _ = compact_field_render(
        part, fr.origin, res, shape, dev, size_hint=(hint[0], hint[1], 4)
    )
    np.testing.assert_array_equal(ids, ids2)
    np.testing.assert_array_equal(cases, cases2)
    np.testing.assert_array_equal(tvals, tvals2)


def test_merge_compact_payloads_empty_parts():
    """A surviving coarse tile can contain zero sign-crossing cubes: the
    merge must skip empty parts instead of crashing on the per-part
    rebase arithmetic (found by review, round 3)."""
    from gsdf_tpu.ops.compact_field import merge_compact_payloads

    ne = (
        np.array([5, 9], np.uint32),
        np.array([3, 120], np.uint8),  # 2 crossing edges each
        np.array([0.5, 0.25, 0.75, 0.125], np.float32),
    )
    empty = (
        np.empty(0, np.uint32),
        np.empty(0, np.uint8),
        np.empty(0, np.float32),
    )
    for parts in ([ne, empty], [empty, ne], [empty, ne, empty]):
        ids, cases, t = merge_compact_payloads(parts)
        np.testing.assert_array_equal(ids, ne[0])
        np.testing.assert_array_equal(cases, ne[1])
        np.testing.assert_array_equal(t, ne[2])
    ids, cases, t = merge_compact_payloads([empty, empty])
    assert len(ids) == 0 and len(cases) == 0 and len(t) == 0


def test_slabbed_shares_one_executable_per_height():
    """The slabbed dispatch must NOT compile a new executable per slab:
    the running hint is grow-only (max of sizes seen), so slabs of equal
    height share one build-cache entry (found by review, round 3)."""
    import jax

    from gsdf_tpu.ops import compact_field as cf

    bld = Builder()
    part = bld.smooth_union(
        0.1, bld.new_sphere(0.8), bld.new_box(1.2, 1.2, 0.5, 0.05)
    )
    res = np.float32(part.bounds().diagonal() / 48)
    fr = FlatRenderer(part, res)
    shape = (fr.nz + 1, fr.ny + 1, fr.nx + 1)
    dev = jax.devices()[0]
    before = {k for k in cf._cache if isinstance(k, tuple)}
    ids, cases, tvals, n_pts = cf.compact_field_render_slabbed(
        part, fr.origin, res, shape, dev, max_points=shape[1] * shape[2] * 12
    )
    new_exec = [
        k for k in cf._cache
        if isinstance(k, tuple) and k not in before
        and not (isinstance(k[0], str) and k[0].startswith("hint"))
    ]
    heights = {k[1][0] for k in new_exec}  # slab shapes actually compiled
    # one executable per distinct slab height, no growth thrash
    assert len(new_exec) == len(heights), (new_exec, heights)
