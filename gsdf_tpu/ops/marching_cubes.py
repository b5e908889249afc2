"""Vectorized device-side marching cubes.

TPU-native replacement for the reference's per-cube CPU marching cubes
(glrender/marchcubes.go:14-98). The per-cube loop becomes three phases:

1. classify (jit): slice the corner grid into the 8 per-cube corner arrays,
   build the 256-case index, apply the reference's corner-0 quick-reject
   (|d0| > 2*sqrt3*res, flatrenderer.go:218 / marchcubes.go:23), and count
   triangles per cube. One reduction yields the active-cube count.
2. compact: device `nonzero` (static padded size) extracts active cube
   linear indices in x-fastest cube order — the exact iteration order of the
   reference (flatrenderer.go:210-212), so triangle ORDER also matches.
3. emit (jit): gather the 8 corner values/positions per active cube,
   interpolate the 12 edge points with the reference's epsilon rules
   (mcInterpolate, marchcubes.go:76-98), gather the triangle table and emit
   up to 5 triangles per cube with the reference's winding
   (marchcubes.go:63-68 reverses each index triple).

Grid convention: grid[k, j, i], shape (nz+1, ny+1, nx+1).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .mc_tables import MC_EDGE_PAIRS, MC_TRI_COUNT, MC_TRI_TABLE

_f32 = np.float32
# float32(2*sqrt3) with the reference's sqrt3 constant (glrender/glrender.go:9)
_CUBE_DIAG_FACTOR = np.float32(2 * 1.73205080757)
_MC_EPS = 1e-12


def _corner_slices(grid):
    """The 8 per-cube corner arrays, each (nz,ny,nx), in the reference's
    corner order (flatrenderer.go:222-233)."""
    return (
        grid[:-1, :-1, :-1],  # 0: (0,0,0)
        grid[:-1, :-1, 1:],  # 1: (+x,0,0)
        grid[:-1, 1:, 1:],  # 2: (+x,+y,0)
        grid[:-1, 1:, :-1],  # 3: (0,+y,0)
        grid[1:, :-1, :-1],  # 4: (0,0,+z)
        grid[1:, :-1, 1:],  # 5: (+x,0,+z)
        grid[1:, 1:, 1:],  # 6: (+x,+y,+z)
        grid[1:, 1:, :-1],  # 7: (0,+y,+z)
    )


# corner offsets (dx,dy,dz) in the same order
_CORNER_OFFSETS = np.array(
    [
        [0, 0, 0],
        [1, 0, 0],
        [1, 1, 0],
        [0, 1, 0],
        [0, 0, 1],
        [1, 0, 1],
        [1, 1, 1],
        [0, 1, 1],
    ],
    dtype=np.int32,
)


@functools.partial(jax.jit, static_argnums=())
def _classify(grid, res):
    """Per-cube triangle counts (nz,ny,nx) and activity mask."""
    corners = _corner_slices(grid)
    index = jnp.zeros(corners[0].shape, dtype=jnp.int32)
    for c, v in enumerate(corners):
        index = index | (jnp.int32(v < 0.0) << c)
    counts = jnp.asarray(MC_TRI_COUNT)[index]
    keep = jnp.abs(corners[0]) <= _CUBE_DIAG_FACTOR * res
    counts = jnp.where(keep, counts, 0)
    active = counts > 0
    return counts, active, jnp.sum(counts), jnp.sum(active.astype(jnp.int32))


def _bucket(n: int, minimum: int = 1024, granule: int = 65536) -> int:
    """Round n up: powers of two below `granule`, multiples of `granule`
    above. Bounds both recompile count and padded-transfer waste."""
    b = minimum
    while b < n and b < granule:
        b <<= 1
    if b >= n:
        return b
    return ((n + granule - 1) // granule) * granule


@functools.partial(jax.jit, static_argnames=("size",))
def _active_indices(active, size):
    (idx,) = jnp.nonzero(active.ravel(), size=size, fill_value=-1)
    return idx


@functools.partial(jax.jit, static_argnames=("nx", "ny"))
def _emit(grid, cube_idx, n_active, origin, res, nx, ny):
    """Emit up to 5 triangles for each active cube.

    cube_idx: (A,) linear cube indices (x-fastest order), -1 padded.
    Returns tris (A,5,3,3) float32 and valid mask (A,5) bool.
    """
    A = cube_idx.shape[0]
    safe_idx = jnp.maximum(cube_idx, 0)
    ci = safe_idx % nx
    cj = (safe_idx // nx) % ny
    ck = safe_idx // (nx * ny)

    npx = grid.shape[2]  # nx+1
    npy = grid.shape[1]  # ny+1
    gflat = grid.ravel()

    offs = jnp.asarray(_CORNER_OFFSETS)
    # corner grid linear index: (k+dz)*(npy*npx) + (j+dy)*npx + (i+dx)
    gi = (
        (ck[:, None] + offs[None, :, 2]) * (npy * npx)
        + (cj[:, None] + offs[None, :, 1]) * npx
        + (ci[:, None] + offs[None, :, 0])
    )  # (A,8)
    v = gflat[gi]  # (A,8)

    # corner positions (float32, matching flatrenderer.go:235-247 arithmetic)
    base = jnp.stack(
        [
            origin[0] + ci.astype(jnp.float32) * res,
            origin[1] + cj.astype(jnp.float32) * res,
            origin[2] + ck.astype(jnp.float32) * res,
        ],
        axis=-1,
    )  # (A,3)
    pcorner = base[:, None, :] + offs[None, :, :].astype(jnp.float32) * res  # (A,8,3)

    # cube index from corner signs
    index = jnp.zeros((A,), dtype=jnp.int32)
    for c in range(8):
        index = index | (jnp.int32(v[:, c] < 0.0) << c)

    # interpolate the 12 edge points (mcInterpolate, marchcubes.go:76)
    pairs = jnp.asarray(MC_EDGE_PAIRS)  # (12,2)
    va = v[:, pairs[:, 0]]  # (A,12)
    vb = v[:, pairs[:, 1]]
    pa = pcorner[:, pairs[:, 0], :]  # (A,12,3)
    pb = pcorner[:, pairs[:, 1], :]
    close_a = jnp.abs(va) < _MC_EPS
    close_b = jnp.abs(vb) < _MC_EPS
    denom = vb - va
    t = jnp.where(close_a & close_b, 0.5, (0.0 - va) / denom)
    pt = pa + t[..., None] * (pb - pa)
    pt = jnp.where((close_b & ~close_a)[..., None], pb, pt)
    pt = jnp.where((close_a & ~close_b)[..., None], pa, pt)  # (A,12,3)

    table = jnp.asarray(MC_TRI_TABLE)[index]  # (A,5,3) edge ids, -1 padded
    counts = jnp.asarray(MC_TRI_COUNT)[index]  # (A,)
    safe_table = jnp.maximum(table, 0)  # (A,5,3)
    flat_pt = pt.reshape(A * 12, 3)
    flat_gidx = (
        jax.lax.broadcasted_iota(jnp.int32, (A, 5, 3), 0) * 12 + safe_table
    ).reshape(-1)
    gathered = flat_pt[flat_gidx].reshape(A, 5, 3, 3)
    # reference winding: Triangle{points[t2], points[t1], points[t0]}
    tris = gathered[:, :, ::-1, :]

    slot = jax.lax.broadcasted_iota(jnp.int32, (A, 5), 1)
    arange = jax.lax.broadcasted_iota(jnp.int32, (A, 5), 0)
    valid = (slot < counts[:, None]) & (arange < n_active) & (cube_idx[:, None] >= 0)
    return tris, valid


@functools.partial(jax.jit, static_argnames=("nx", "ny", "out_size"))
def _emit_compact(grid, cube_idx, n_active, origin, res, nx, ny, out_size):
    """Emit + device-side exact compaction: returns (out_size, 3, 3) float32
    with the first `total_tris` rows holding triangles in reference order.
    Only this compact payload crosses the device->host link."""
    tris, valid = _emit(grid, cube_idx, n_active, origin, res, nx, ny)
    A = tris.shape[0]
    flat_tris = tris.reshape(A * 5, 9)
    flat_valid = valid.reshape(A * 5)
    (tidx,) = jnp.nonzero(flat_valid, size=out_size, fill_value=0)
    return flat_tris[tidx].reshape(out_size, 3, 3)


def marching_cubes_grid(grid, origin, res, device=None):
    """Run marching cubes over a device-resident corner grid.

    grid: jnp (nz+1, ny+1, nx+1) float32 distances
    origin: (3,) float32 position of grid[0,0,0]
    res: cube edge length

    Returns (triangles np (T,3,3) float32, total_active_cubes int).
    Triangle order matches the reference flat renderer exactly.
    """
    grid = jnp.asarray(grid)
    nz = grid.shape[0] - 1
    ny = grid.shape[1] - 1
    nx = grid.shape[2] - 1
    res = _f32(res)
    origin = jnp.asarray(np.asarray(origin, _f32))

    counts, active, total_tris, n_active = _classify(grid, res)
    n_active = int(n_active)
    total_tris = int(total_tris)
    if n_active == 0:
        return np.empty((0, 3, 3), _f32), 0
    size = _bucket(n_active)
    idx = _active_indices(active, size)
    out_size = _bucket(total_tris)
    tris = _emit_compact(grid, idx, n_active, origin, res, nx, ny, out_size)
    return np.asarray(tris)[:total_tris], n_active
