"""Multi-chip dual contouring: z-slab shard_map over a device mesh.

Same scale-out design as the marching-cubes sharded path
(parallel/sharded.py, SURVEY.md §2.10): each shard evaluates its slab of
the corner grid locally (positions synthesized on device from global
indices — pure data parallel), detects and compacts its active edges,
solves the QEF for ITS voxels on device, and ships one fixed-size v2
mesh payload; the only cross-shard data is redundantly recomputed halo
planes — zero collectives until the final gather.

DC needs a 2-plane halo where MC needs 1: a voxel at slab layer k
gathers QEF rows from x/y edges at layers {k, k+1} (render/
dual_contour._OFFS has dk in {-1, 0}), so a shard owning voxel layers
[k0, k0+c) must see edge layers [k0, k0+c] and therefore corner planes
[k0, k0+c+1] — c+2 planes. The halo edge layer k0+c contributes rows to
owned voxels only (dc_mesh_emit n_own=c drops claims on the next
shard's voxels); shard d's halo edges are recomputed by shard d+1 as
its own, with bit-identical values (elementwise eval of identical f32
positions).

Merged-payload identity: every global voxel is owned by exactly one
shard, its QEF rows have the same values and the same relative addend
order locally as in the whole-grid render (local edge ids are
order-isomorphic to global ids over the shard's edge set), so the
per-voxel sums — and the vertices — reproduce the single-device render
bit-for-bit; concatenated per-slab vertex slots are exactly the global
ascending-unique voxel table finish_dc_mesh derives. The host-side quad
emission is the SAME finish_dc_mesh the single-device path uses
(pinned in tests/test_sharded_dc.py).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..core.node import Shader3D
from ..render.dual_contour import (
    DualContourLeastSquares,
    dc_mesh_emit,
    finish_dc_mesh,
    unpack_dc_mesh_payload,
)
from .sharded import AXIS, _replicated

_f32 = np.float32

_step_cache: dict = {}


def sharded_dc_step(
    tree: Shader3D, mesh, shape_local, c_own: int, a_size: int,
    w_size: int, e_size: int, norm_step: float, sqrt_lambda: float,
    parametric: bool = False,
):
    """Build the per-shard DC step: slab+halo grid eval -> dc_mesh_emit
    (the ONE emit implementation, render/dual_contour.py) with this
    shard's layer offset and voxel ownership. Returns a jitted fn
    (origin, res[, params]) -> (n_dev, L) packed v2 payloads.

    shape_local = (c_own+2, nj, ni) corner planes per shard; ids in the
    payload are LOCAL to the shard's extended (c_own+1)-layer edge
    space — render_dc_sharded globalizes them."""
    nk_l, nj, ni = (int(x) for x in shape_local)
    c = int(c_own)
    if nk_l != c + 2:
        raise ValueError("shard shape must carry exactly 2 halo planes")
    A, W, E = int(a_size), int(w_size), int(e_size)
    half = _f32(norm_step) * _f32(0.5)
    inv_step = _f32(1.0) / _f32(norm_step)
    lam = _f32(sqrt_lambda) * inv_step

    if parametric:
        from ..eval.parametric import _bind_params, param_spec, structural_hash

        tree.tree_hash()  # pre-cache node hashes before tracer binding
        key = (
            "dc-param", structural_hash(tree), tuple(shape_local), c, A, W,
            E, half, lam, mesh,
        )
    else:
        key = ("dc", tree.tree_hash(), tuple(shape_local), c, A, W, E, half,
               lam, mesh)
    cached = _step_cache.get(key)
    if cached is not None:
        return cached

    def body(origin, res, k_base):
        me = jax.lax.axis_index(AXIS)
        # k_base (traced, replicated int32) offsets this dispatch within
        # the global layer space: the slab-chunk composition
        # (render_dc_sharded max_points_per_shard) re-dispatches ONE
        # executable per z-chunk; k_base=0 is the whole-grid call.
        # Integer layer indices stay exact in f32.
        k0 = me * c + k_base  # first owned voxel layer (int32)
        iz = (
            jax.lax.broadcasted_iota(jnp.float32, (nk_l, nj, ni), 0)
            + k0.astype(jnp.float32)
        )
        iy = jax.lax.broadcasted_iota(jnp.float32, (nk_l, nj, ni), 1)
        ix = jax.lax.broadcasted_iota(jnp.float32, (nk_l, nj, ni), 2)
        p = jnp.stack(
            [origin[0] + ix * res, origin[1] + iy * res, origin[2] + iz * res],
            axis=-1,
        )
        grid = tree.distance(p)  # slab + 2 halo planes
        return dc_mesh_emit(
            tree, grid, origin, res, A, W, E, half, inv_step, lam,
            k0=k0, n_own=c,
        )[None]

    if parametric:
        spec = param_spec(tree)

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(), P()),
            out_specs=P(AXIS, None),
            check_vma=False,  # see sharded.sharded_grid_eval
        )
        def step(origin, res, k_base, flat):
            with _bind_params(spec, flat):
                return body(origin, res, k_base)

    else:

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P()),
            out_specs=P(AXIS, None),
            check_vma=False,  # see sharded.sharded_grid_eval
        )
        def step(origin, res, k_base):
            return body(origin, res, k_base)

    jitted = jax.jit(step)
    _step_cache[key] = jitted
    return jitted


def render_dc_sharded(
    tree: Shader3D, mesh, res: float,
    contourer: DualContourLeastSquares | None = None,
    parametric: bool = False, size_hint=None,
    max_points_per_shard=None, counters=None,
):
    """Multi-chip dual-contour render: returns the SAME (T,3,3) f32
    triangle array as DualContourRenderer(...).render() on one device
    (bit-identical vertices and order — pinned in test_sharded_dc.py).

    Grid sizing matches DualContourRenderer (bounds shifted by -res/2,
    reference glrender/dual_contour.go:31-33); the slab axis is padded
    to a multiple of the mesh size (padded layers lie beyond the far
    field and stay inactive). parametric=True compiles per tree
    STRUCTURE with grow-only size hints — the zero-recompile edit
    contract of render_sharded_compact, extended to DC.

    max_points_per_shard composes sharding with slab dispatch (the
    render_sharded_compact discipline, docs/MULTICHIP.md): when one
    whole-grid dispatch would exceed a shard's memory gate, the global
    voxel-layer space is partitioned into chunks of c_own*n_dev layers
    dispatched through ONE executable with a traced k_base operand.
    Chunk slabs are just more slabs: per-(chunk, shard) payloads
    concatenate into exactly the whole-grid payload, so the triangles
    stay bit-identical. The per-SHARD int32 edge-id ceiling
    (3*(c_own+1)*plane < 2^31) is what chunking relaxes; global ids are
    int64 on host.

    counters (optional dict) is filled with {"corners": evaluated grid
    corners incl. halo recompute, "edges": owned+halo active edges} so
    callers (DualContourRenderer's auto-chunk route) can keep their
    evaluations() contract."""
    from ..ops.mc_emit import bucket as _bucket

    contourer = contourer or DualContourLeastSquares()
    res32 = _f32(res)
    if res32 <= 0:
        raise ValueError("invalid dual contour resolution")
    bb = tree.bounds().add(np.full(3, -float(res32) / 2, _f32))
    sz = bb.size()
    nxv = int(math.ceil(_f32(sz[0]) / res32)) + 1
    nyv = int(math.ceil(_f32(sz[1]) / res32)) + 1
    nzv = int(math.ceil(_f32(sz[2]) / res32)) + 1
    if nxv <= 1 or nyv <= 1 or nzv <= 1:
        # inverted (empty-intersection) or sub-voxel bounds — reject like
        # the single-device renderer (flatrenderer.go:54 discipline)
        raise ValueError("resolution not fine enough for dual contouring")
    n_dev = mesh.devices.size
    plane = nyv * nxv
    plane_corners = (nyv + 1) * (nxv + 1)

    # slab-chunk composition: chunks of C = c*n_dev voxel layers, one
    # shared executable re-dispatched with k_base = chunk*C
    if max_points_per_shard is not None:
        # clamp to the real grid: an ample budget must not make shards
        # evaluate far-field slabs beyond the whole-grid split
        c = max(1, min(int(max_points_per_shard) // plane_corners - 2,
                       -(-nzv // n_dev)))
        C = c * n_dev
        n_chunks = -(-nzv // C)
    else:
        nz_p0 = nzv + (-nzv) % n_dev
        c = nz_p0 // n_dev
        C = nz_p0
        n_chunks = 1
    nz_p = n_chunks * C  # padded; extra layers lie beyond the far field
    if nz_p >= 1 << 24:
        # layer indices are cast to f32 for position synthesis; past
        # 2^24 the cast rounds and slabs silently desync from the
        # whole-grid render
        raise ValueError("grid too tall for exact f32 layer indices")
    nvox_ext = (c + 1) * plane  # per-shard extended edge-id space
    if 3 * nvox_ext >= 1 << 31:
        # the kernel's edge ids are shard-local int32; shrink the chunk
        # (max_points_per_shard) to fit — host ids are int64 throughout
        raise ValueError(
            "shard slab too large for int32 edge ids "
            "(3*(c+1)*plane >= 2^31); pass max_points_per_shard"
        )
    shape_local = (c + 2, nyv + 1, nxv + 1)

    origin = _replicated(mesh, bb.min)
    res_dev = _replicated(mesh, res32)
    if parametric:
        from ..eval.parametric import pack_params, structural_hash

        hint_key = (
            "dc-hint-param", structural_hash(tree), shape_local, n_chunks,
            mesh, _f32(contourer.norm_step),
        )
        params = _replicated(mesh, pack_params(tree))
    else:
        hint_key = (
            "dc-hint", tree.tree_hash(), shape_local, n_chunks, mesh,
            _f32(contourer.norm_step),
        )
        params = None
    if size_hint is None:
        size_hint = _step_cache.get(hint_key)
    if size_hint:
        a_size, w_size, e_size = size_hint
    else:
        a_size = _bucket(int(12 * nvox_ext ** (2 / 3)) + 4096)
        w_size = a_size
        e_size = _bucket(max(4096, a_size // 8), granule=4096)

    verts_parts, eax_parts, lin_parts, flip_parts = [], [], [], []
    n_vox_total = 0
    n_edges_total = 0
    max_a = max_w = max_e = 0  # true per-shard maxima across all chunks
    for chunk in range(n_chunks):
        kb = _replicated(mesh, np.int32(chunk * C), dtype=np.int32)
        # grow-only sizes shared across chunks: every chunk reuses one
        # executable once sizes stabilize (slabbed-path discipline)
        while True:
            step = sharded_dc_step(
                tree, mesh, shape_local, c, a_size, w_size, e_size,
                contourer.norm_step, contourer.sqrt_lambda,
                parametric=parametric,
            )
            args = (
                (origin, res_dev, kb, params)
                if parametric
                else (origin, res_dev, kb)
            )
            packed = np.ascontiguousarray(np.asarray(step(*args)))
            counts = np.ascontiguousarray(packed[:, :3]).view(np.int32)
            worst_a = int(counts[:, 0].max(initial=0))
            worst_w = int(counts[:, 1].max(initial=0))
            worst_e = int(counts[:, 2].max(initial=0))
            if worst_a <= a_size and worst_w <= w_size and worst_e <= e_size:
                max_a = max(max_a, worst_a)
                max_w = max(max_w, worst_w)
                max_e = max(max_e, worst_e)
                break
            if worst_a > a_size:
                a_size = _bucket(worst_a, granule=16384)
            if worst_w > w_size:
                w_size = _bucket(worst_w, granule=16384)
            if worst_e > e_size:
                e_size = _bucket(worst_e, granule=4096)
        for d in range(n_dev):
            verts, eids, flips, (n_e, n_v, _n_x) = unpack_dc_mesh_payload(
                packed[d], a_size, w_size, e_size
            )
            ax = eids // nvox_ext
            rem = eids % nvox_ext
            own = (rem // plane) < c  # drop halo edges (next slab owns them)
            eax_parts.append(ax[own])
            # local -> global lin (chunk-major slab order IS global z-order)
            lin_parts.append(rem[own] + (chunk * C + d * c) * plane)
            flip_parts.append(flips[own])
            verts_parts.append(verts[:n_v])
            n_vox_total += n_v
            n_edges_total += n_e
    if parametric:
        # grow-only hints: successive parametric renders keep one
        # executable per structure (the zero-recompile edit contract)
        _step_cache[hint_key] = (a_size, w_size, e_size)
    else:
        # TIGHT hints (+25% headroom), the single-device DC discipline:
        # the initial w_size = a_size estimate can be ~9x the true voxel
        # count, and every padded slot ships 12 payload bytes per chunk
        # and pays 6 padded normal evals — at a chunked DC render the
        # padding dominated the warm fetch. The next render compiles
        # once more at the tight sizes, then stays minimal; never store
        # below what this render actually needed.
        _step_cache[hint_key] = (
            min(a_size, _bucket(int(max_a * 1.25) + 1, granule=16384)),
            min(w_size, _bucket(int(max_w * 1.25) + 1, granule=16384)),
            min(e_size, _bucket(int(max_e * 1.25) + 64, granule=4096)),
        )
    if counters is not None:
        counters["corners"] = n_chunks * n_dev * (c + 2) * plane_corners
        counters["edges"] = n_edges_total
    eax = np.concatenate(eax_parts)
    if len(eax) == 0:
        return np.empty((0, 3, 3), _f32)
    tris, _blocks = finish_dc_mesh(
        np.concatenate(verts_parts),
        eax,
        np.concatenate(lin_parts),
        np.concatenate(flip_parts),
        nxv, nyv, nz_p, n_vox_total,
    )
    return tris
