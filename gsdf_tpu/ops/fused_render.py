"""Single-dispatch fused renderer: SDF grid eval + marching cubes in ONE
XLA executable.

The phase-split pipeline (evaluate_grid -> _classify -> nonzero -> emit)
costs a host round trip per phase; over a remote device link each dispatch
adds latency. This module traces the whole render — position synthesis, SDF
evaluation, cube classification, active-cube compaction, edge interpolation,
triangle emission and exact output compaction — as one jit with static
buffer sizes, so a render is ONE dispatch and ONE device->host transfer.

Buffer sizes (active cubes / triangles) are data-dependent; the renderer
guesses from a surface-area heuristic (or remembered sizes from the previous
render of the same tree), checks the returned exact counts, and retries with
larger buckets on overflow — the same grow-and-retry discipline the
reference uses for its triangle buffers (glrender/octreerenderer.go:131).

Classification avoids the 256-entry table gather over all cubes: a cube is
active iff its corner signs are mixed (index not 0 or 255) — exactly the
cases with a non-empty triangle table.
"""
from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np

from .marching_cubes import _bucket
from .mc_emit import canonical_dense_grid_eval, dense_grid_mc

_f32 = np.float32

_fused_cache: dict = {}


def build_fused_render(tree, shape, a_size: int, t_size: int, device):
    """Compiled (origin, res) -> (tris (t_size,3,3), n_active, total_tris).

    shape = (nk, nj, ni) grid planes; grid[k,j,i] with z slowest.
    """
    key = (tree.tree_hash(), tuple(shape), a_size, t_size, device)
    fn = _fused_cache.get(key)
    if fn is not None:
        return fn

    nk, nj, ni = (int(x) for x in shape)
    A = int(a_size)
    T = int(t_size)

    def impl(origin, res, k0):
        # k0 is a plane offset added to iz so a slab render reproduces the
        # exact float32 positions of a whole-grid render (origin + (iz+k0)*res)
        if device.platform == "cpu":
            grid = canonical_dense_grid_eval(tree, origin, res, (nk, nj, ni), k0=k0)
        else:
            iz = jax.lax.broadcasted_iota(jnp.float32, (nk, nj, ni), 0) + k0
            iy = jax.lax.broadcasted_iota(jnp.float32, (nk, nj, ni), 1)
            ix = jax.lax.broadcasted_iota(jnp.float32, (nk, nj, ni), 2)
            p = jnp.stack(
                [origin[0] + ix * res, origin[1] + iy * res, origin[2] + iz * res],
                axis=-1,
            )
            grid = tree.distance(p)
        tris, n_active, total = dense_grid_mc(grid, origin, res, k0, A, T)
        return tris, n_active, total

    jitted = jax.jit(impl)

    def fn(origin, res, k0=np.float32(0), _jitted=jitted, _dev=device):
        with jax.default_device(_dev):
            return _jitted(jax.device_put(origin, _dev), res, _f32(k0))

    _fused_cache[key] = fn
    return fn


# remembered exact buffer sizes per (tree_hash, shape): any new renderer of
# a previously-rendered tree dispatches with minimal buffers immediately
_hint_cache: dict = {}


def default_sizes(shape, size_hint=None):
    """Initial (a_size, t_size) buckets for a grid shape."""
    if size_hint:
        return size_hint
    nk, nj, ni = (int(x) for x in shape)
    ncubes = max((nk - 1) * (nj - 1) * (ni - 1), 1)
    est = int(12 * ncubes ** (2 / 3)) + 4096
    a_size = _bucket(min(est, ncubes))
    t_size = _bucket(int(a_size * 2.5))
    return a_size, t_size


def fused_render_async(tree, origin, res, shape, device, size_hint=None, k0=0.0):
    """Dispatch one fused render without waiting. Returns
    (out_dev, n_active_dev, total_dev, (a_size, t_size)). The caller fetches
    results later (overlapping other dispatches) and must re-dispatch with
    bigger sizes if int(n_active) > a_size or int(total) > t_size.

    k0 shifts the grid's plane index along z (slab rendering) while keeping
    bit-exact position arithmetic with a whole-grid render."""
    if size_hint is None:
        size_hint = _hint_cache.get((tree.tree_hash(), tuple(shape), float(k0)))
    a_size, t_size = default_sizes(shape, size_hint)
    fn = build_fused_render(tree, shape, a_size, t_size, device)
    out, n_active, total = fn(jnp.asarray(np.asarray(origin, _f32)), _f32(res), k0)
    return out, n_active, total, (a_size, t_size)


def fused_render(tree, origin, res, shape, device, size_hint=None):
    """Render in one dispatch. Returns (tris (total,3,3) np.float32,
    n_active, (a_size, t_size) used) — pass the sizes back as size_hint on
    the next render of the same tree for an exact-size dispatch."""
    if size_hint is None:
        size_hint = _hint_cache.get((tree.tree_hash(), tuple(shape), 0.0))
    a_size, t_size = default_sizes(shape, size_hint)
    origin = np.asarray(origin, _f32)
    res = _f32(res)
    while True:
        fn = build_fused_render(tree, shape, a_size, t_size, device)
        out, n_active, total = fn(jnp.asarray(origin), res)
        n_active = int(n_active)
        total = int(total)
        if n_active <= a_size and total <= t_size:
            # shrink the hint to exact buckets so steady-state renders
            # dispatch with minimal buffers (and minimal transfer)
            hint = (_bucket(n_active), _bucket(total))
            _hint_cache[(tree.tree_hash(), tuple(shape), 0.0)] = hint
            return np.asarray(out)[:total], n_active, hint
        if n_active > a_size:
            a_size = _bucket(n_active)
        if total > t_size:
            t_size = _bucket(max(total, int(a_size * 2.5)))
