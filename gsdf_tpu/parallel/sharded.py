"""Multi-chip rendering: shard the voxel grid across a 1-D device mesh.

The reference's only process-level parallelism is goroutine k-plane
partitioning of the dense grid (glrender/flatrenderer.go:103-141). The
TPU-native scale-out analog: shard the z (slab) axis of the corner grid over
a `jax.sharding.Mesh`, evaluate each shard's slab locally (pure data
parallel — zero communication, positions synthesized on device), then
exchange a single boundary plane with the +z neighbor (ppermute over ICI)
so each shard can classify the cubes between its planes. Compacted triangle
payloads are all-gathered at the end — the only collective proportional to
output size, matching SURVEY.md §2.10's design note.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.node import Shader3D

_f32 = np.float32

AXIS = "slab"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (AXIS,))


def _replicated(mesh: Mesh, value):
    """Commit a host value to the mesh's own devices, replicated.

    Every operand of a sharded step must be created ON the mesh —
    `jnp.asarray` would place it on the process default device (the real
    TPU when one is attached), which both wastes a transfer and breaks
    hermetic CPU-mesh runs (the driver's dryrun_multichip)."""
    return jax.device_put(
        np.asarray(value, _f32), NamedSharding(mesh, P())
    )


def sharded_grid_eval(tree: Shader3D, mesh: Mesh, shape, origin, res):
    """Evaluate a (nk,nj,ni) corner grid with the k axis sharded over the
    mesh. nk must be divisible by mesh size. Returns a global jax.Array with
    sharding P(AXIS, None, None)."""
    nk, nj, ni = (int(x) for x in shape)
    n_dev = mesh.devices.size
    if nk % n_dev != 0:
        raise ValueError(f"slab axis {nk} not divisible by {n_dev} devices")
    nk_local = nk // n_dev
    origin = _replicated(mesh, origin)
    res = _replicated(mesh, res)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(AXIS, None, None),
        check_vma=False,  # pure DP step; lax.scan carries in deep trees
        # (polygon edges, scan-grouped unions) start as unvarying consts
    )
    def impl(origin, res):
        k0 = jax.lax.axis_index(AXIS) * nk_local
        iz = jax.lax.broadcasted_iota(jnp.float32, (nk_local, nj, ni), 0) + k0
        iy = jax.lax.broadcasted_iota(jnp.float32, (nk_local, nj, ni), 1)
        ix = jax.lax.broadcasted_iota(jnp.float32, (nk_local, nj, ni), 2)
        p = jnp.stack(
            [origin[0] + ix * res, origin[1] + iy * res, origin[2] + iz * res],
            axis=-1,
        )
        return tree.distance(p)

    return jax.jit(impl)(origin, res)


def sharded_render_step(tree: Shader3D, mesh: Mesh, shape, max_tris_per_shard: int):
    """Build the full multi-chip render step: sharded grid eval + halo
    exchange + per-shard marching cubes + all-gather of triangle payloads.

    Returns a jitted fn (origin, res) -> (tris (n_dev, max_tris, 3, 3),
    counts (n_dev,)) where counts[d] is the number of valid triangles from
    shard d. Triangles of shard d are in reference cube order within the
    shard, so concatenation preserves global order.
    """
    from ..ops.mc_emit import dense_grid_mc

    nk, nj, ni = (int(x) for x in shape)
    n_dev = mesh.devices.size
    if nk % n_dev != 0:
        raise ValueError(f"slab axis {nk} not divisible by {n_dev} devices")
    nk_local = nk // n_dev
    M = int(max_tris_per_shard)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(AXIS, None, None, None), P(AXIS), P(AXIS)),
        check_vma=False,  # see sharded_grid_eval
    )
    def step(origin, res):
        me = jax.lax.axis_index(AXIS)
        k0 = me * nk_local
        # local slab + one extra plane (halo) evaluated redundantly: one
        # plane of recompute beats a ppermute dependency chain at this size,
        # and keeps the step collective-free until the final gather.
        iz = jax.lax.broadcasted_iota(jnp.float32, (nk_local + 1, nj, ni), 0) + k0
        iy = jax.lax.broadcasted_iota(jnp.float32, (nk_local + 1, nj, ni), 1)
        ix = jax.lax.broadcasted_iota(jnp.float32, (nk_local + 1, nj, ni), 2)
        p = jnp.stack(
            [origin[0] + ix * res, origin[1] + iy * res, origin[2] + iz * res],
            axis=-1,
        )
        grid_ext = tree.distance(p)
        # shared MC-emit kernel over this shard's cubes; grid_ext includes
        # the +z halo plane, k0 keeps positions bit-exact with whole-grid
        tris, n_act, total = dense_grid_mc(
            grid_ext, origin, res, k0.astype(jnp.float32), M, M
        )
        return tris[None], total[None], n_act[None]

    return jax.jit(step)


_step_cache: dict = {}


def sharded_compact_step(
    tree: Shader3D, mesh: Mesh, shape, a_size: int, v_size: int,
    e_size: int = 8192, parametric: bool = False,
):
    """Multi-chip COMPACT-FIELD render step (the production path,
    ops/compact_field.py, sharded): each shard evaluates its z-slab
    (+1 halo plane), classifies, compacts its active cubes and crossing
    owner-edge interpolation parameters, and emits one v2 packed buffer
    (delta-encoded ids — ops/compact_field.py module docstring).

    Cube ids are LOCAL to the slab; global id = local + k0*nx*ny, and
    slab order equals global z-order, so the host-side concatenation of
    shard payloads is EXACTLY the single-device compact payload — the
    native decoder (native.mc_decode) consumes it unchanged, owner
    references across slab boundaries resolving in the merged active
    set. No collectives: the only cross-shard data is one redundantly
    evaluated halo plane.

    The emit itself is ops/compact_field.compact_emit — the SAME
    implementation the single-device builder compiles, so any epsilon or
    packing change keeps sharded-vs-single bit-exactness by construction.

    parametric=True traces once per tree STRUCTURE and takes the packed
    continuous-parameter vector as a third (replicated) operand — the
    single-device zero-recompile editing story (eval/parametric.py),
    extended to the mesh. Steps are cached per (tree, shape, sizes, mesh).
    """
    from ..ops.compact_field import compact_emit

    nk, nj, ni = (int(x) for x in shape)
    n_dev = mesh.devices.size
    if nk % n_dev != 0:
        raise ValueError(f"slab axis {nk} not divisible by {n_dev} devices")
    nk_local = nk // n_dev
    A = int(a_size)
    if A % 4:
        raise ValueError("a_size must be a multiple of 4")
    E = int(e_size)
    V = int(v_size)

    if parametric:
        from ..eval.parametric import _bind_params, param_spec, structural_hash

        tree.tree_hash()  # pre-cache node hashes before tracer binding
        key = ("param", structural_hash(tree), tuple(shape), A, E, V, mesh)
    else:
        key = (tree.tree_hash(), tuple(shape), A, E, V, mesh)
    cached = _step_cache.get(key)
    if cached is not None:
        return cached

    def body(origin, res):
        me = jax.lax.axis_index(AXIS)
        k0 = me * nk_local
        iz = jax.lax.broadcasted_iota(jnp.float32, (nk_local + 1, nj, ni), 0) + k0
        iy = jax.lax.broadcasted_iota(jnp.float32, (nk_local + 1, nj, ni), 1)
        ix = jax.lax.broadcasted_iota(jnp.float32, (nk_local + 1, nj, ni), 2)
        p = jnp.stack(
            [origin[0] + ix * res, origin[1] + iy * res, origin[2] + iz * res],
            axis=-1,
        )
        grid = tree.distance(p)  # local slab + one +z halo plane
        return compact_emit(grid, res, A, E, V)[None]

    if parametric:
        spec = param_spec(tree)

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P()),
            out_specs=P(AXIS, None),
            check_vma=False,  # see sharded_grid_eval
        )
        def step(origin, res, flat):
            with _bind_params(spec, flat):
                return body(origin, res)

    else:

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(), P()),
            out_specs=P(AXIS, None),
            check_vma=False,  # see sharded_grid_eval
        )
        def step(origin, res):
            return body(origin, res)

    jitted = jax.jit(step)
    _step_cache[key] = jitted
    return jitted


def render_sharded_compact(
    tree: Shader3D, mesh: Mesh, res: float, size_hint=None, parametric=False
):
    """Multi-chip production render: returns (verts (V,3) f32,
    tri_idx (T,3) i32) — identical arrays to the single-device
    FlatRenderer.render_compact (same enumeration order).

    parametric=True compiles per tree STRUCTURE: re-rendering an edited
    (structurally identical) tree reuses the mesh executable with zero
    new compiles — the same contract as render_compact(parametric=True),
    scaled out. Payload-size hints are remembered per structure and only
    grow, so successive edits don't thrash (a_size, v_size) shapes."""
    import math as _math

    from ..native import mc_decode
    from ..ops.marching_cubes import _bucket

    bb = tree.bounds().scale_centered((1.01, 1.01, 1.01))
    sz = bb.size()
    res32 = _f32(res)
    nx = int(_math.ceil(_f32(sz[0]) / res32))
    ny = int(_math.ceil(_f32(sz[1]) / res32))
    nz = int(_math.ceil(_f32(sz[2]) / res32))
    n_dev = mesh.devices.size
    nk = nz + 1
    if nk % n_dev:
        nk += n_dev - nk % n_dev
    shape = (nk, ny + 1, nx + 1)
    nz_padded = nk - 1  # decode space includes padded (inactive) slabs
    from ..ops.compact_field import MAX_CUBES

    if nx * ny * nz_padded >= MAX_CUBES:
        # global ids (local + d*nk_local*nx*ny) and the decoder's slot map
        # are int32-bounded, same limit as the single-device builder
        raise ValueError("grid too large for int32 cube ids")
    origin = _replicated(mesh, bb.min)
    res_dev = _replicated(mesh, res32)
    if parametric:
        from ..eval.parametric import pack_params, structural_hash

        hint_key = ("shard-hint", structural_hash(tree), shape, mesh)
        params = _replicated(mesh, pack_params(tree))
    else:
        hint_key = None
        params = None
    if size_hint is None and hint_key is not None:
        size_hint = _step_cache.get(hint_key)
    if size_hint:
        a_size, v_size, e_size = size_hint
    else:
        ncubes_local = nx * ny * (nk // n_dev)
        est = int(12 * ncubes_local ** (2 / 3)) + 4096
        a_size = _bucket(min(est, ncubes_local))
        v_size = _bucket(int(a_size * 1.5))
        e_size = _bucket(max(4096, a_size // 8), granule=4096)
    while True:
        step = sharded_compact_step(
            tree, mesh, shape, a_size, v_size, e_size, parametric=parametric
        )
        args = (origin, res_dev, params) if parametric else (origin, res_dev)
        packed = np.ascontiguousarray(np.asarray(step(*args)))
        counts = np.ascontiguousarray(packed[:, :4]).view(np.uint32)
        worst_a = int(counts[:, 0].max(initial=0))
        worst_v = int(counts[:, 1].max(initial=0))
        worst_e = int(counts[:, 2].max(initial=0))
        if worst_a <= a_size and worst_v <= v_size and worst_e <= e_size:
            break
        if worst_a > a_size:
            a_size = _bucket(worst_a, granule=16384)
        if worst_v > v_size:
            v_size = _bucket(worst_v, granule=16384)
        if worst_e > e_size:
            e_size = _bucket(worst_e, granule=4096)
    if hint_key is not None:
        # grow-only: successive edits keep one executable per structure
        _step_cache[hint_key] = (a_size, v_size, e_size)
    nk_local = nk // n_dev
    from ..ops.compact_field import unpack_compact_payload

    ids_parts, case_parts, t_parts = [], [], []
    for d in range(n_dev):
        ids, cases_d, t_d, _counts = unpack_compact_payload(
            packed[d], a_size, e_size
        )
        # local slab id -> global id (slab order IS global z-order)
        ids_parts.append(ids + np.uint32(d * nk_local * nx * ny))
        case_parts.append(cases_d)
        t_parts.append(t_d)
    ids = np.concatenate(ids_parts)
    cases = np.concatenate(case_parts)
    tvals = np.concatenate(t_parts).astype(_f32)
    return mc_decode(ids, cases, tvals, nx, ny, nz_padded, bb.min, res32)


def render_sharded(tree: Shader3D, mesh: Mesh, res: float, max_tris_per_shard=1 << 18):
    """Full multi-chip render: returns (T,3,3) float32 triangles on host.

    Grid sizing matches FlatRenderer; nk is padded up to a multiple of the
    mesh size (extra slabs lie outside bounds and produce no triangles --
    they evaluate beyond the far field where the quick-reject culls them).
    """
    import math as _math

    bb = tree.bounds().scale_centered((1.01, 1.01, 1.01))
    sz = bb.size()
    res32 = _f32(res)
    nx = int(_math.ceil(_f32(sz[0]) / res32))
    ny = int(_math.ceil(_f32(sz[1]) / res32))
    nz = int(_math.ceil(_f32(sz[2]) / res32))
    n_dev = mesh.devices.size
    nk = nz + 1
    if nk % n_dev:
        nk += n_dev - nk % n_dev
    origin = _replicated(mesh, bb.min)
    res_dev = _replicated(mesh, res32)
    M = int(max_tris_per_shard)
    while True:
        step = sharded_render_step(tree, mesh, (nk, ny + 1, nx + 1), M)
        tris, counts, n_act = step(origin, res_dev)
        counts = np.asarray(counts)
        n_act = np.asarray(n_act)
        worst = max(counts.max(initial=0), n_act.max(initial=0))
        if worst <= M:
            break
        # grow-and-retry: never silently truncate (the same discipline as
        # the single-device fused path, ops/fused_render.py)
        while worst > M:
            M *= 2
    tris = np.asarray(tris)
    out = [tris[d, : counts[d]] for d in range(tris.shape[0])]
    return np.concatenate(out, axis=0)
