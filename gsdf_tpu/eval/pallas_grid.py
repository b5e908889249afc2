"""Pallas TPU kernels for dense SDF grid evaluation (+ fused classification).

The XLA path (eval.evaluator.grid_eval_fn) already fuses position synthesis
into the distance arithmetic; these Pallas variants make the tiling
explicit and are the measured alternative backend
(docs/PERFORMANCE.md "Pallas vs XLA fusion"):

- pallas_grid_eval_fn: each program instance synthesizes one position tile
  in VMEM from its grid coordinates and evaluates the full fused CSG tree
  on it — HBM traffic is exactly 4 bytes per evaluated corner.
- pallas_classified_grid_fn: additionally fuses MARCHING-CUBES
  CLASSIFICATION into the same kernel. TPU Pallas grids execute
  sequentially on the core, so a VMEM scratch plane carries the previous
  z-plane of distances across grid steps; each step classifies the cube
  layer between the carried plane and the plane it just evaluated and
  writes an "effective case" byte grid (0 where the corner-0 quick-reject
  or an empty case kills the cube). Downstream compaction consumes the
  case grid directly — no dense re-reads of the distance grid.

Trees whose distance() closes over array constants (polygon profiles,
scan-grouped union offsets) can't be captured by a Pallas kernel; the
jaxpr consts are hoisted into kernel operands automatically
(_hoist_consts), so every tree the XLA path accepts works here too.

Block sizes respect the f32 (8, 128) minimum tile; block_i should be a
multiple of 128 and block_j of 8.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

try:  # pragma: no cover - environment dependent
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False

_f32 = np.float32

_pallas_cache: dict = {}


def _round_up(x, m):
    return -(-x // m) * m


def _hoist_consts(tree, block_shape):
    """Trace tree.distance over one position tile and hoist the jaxpr's
    array constants into explicit arguments.

    Returns (fn, consts): fn(p, *consts) == tree.distance(p)."""
    from ..core import mathx

    ex = jax.ShapeDtypeStruct(tuple(block_shape) + (3,), jnp.float32)
    # trace with polynomial inverse-trig: Mosaic has no atan2/acos lowering
    with mathx.lowerable_transcendentals():
        closed = jax.make_jaxpr(lambda p: tree.distance(p))(ex)
    consts = [np.asarray(c) for c in closed.consts]

    def fn(p, *const_vals, _jaxpr=closed.jaxpr):
        (out,) = jax.core.eval_jaxpr(_jaxpr, list(const_vals), p)
        return out

    return fn, consts


def _const_inputs(consts):
    """Kernel-ready views of hoisted constants: at least 2-D for VMEM
    residency (original shapes restored in-kernel)."""
    arrs = []
    for c in consts:
        a = np.asarray(c)
        if a.dtype == np.bool_:
            a = a.astype(np.int8)
        arrs.append(a.reshape((1, -1)) if a.ndim < 2 else a)
    return arrs


def _read_consts(refs, consts):
    vals = []
    for ref, orig in zip(refs, consts):
        v = ref[...]
        a = np.asarray(orig)
        v = v.reshape(a.shape)
        if a.dtype == np.bool_:
            v = v.astype(jnp.bool_)
        vals.append(v)
    return vals


def _interpret(device) -> bool:
    # interpret mode on non-TPU backends (tests run on the CPU mesh)
    return getattr(device, "platform", "tpu") not in ("tpu", "axon")


def pallas_grid_eval_fn(tree, shape, device, block_j: int = 8, block_i: int = 256):
    """Compiled (origin, res) -> (nk, nj_pad, ni_pad) distances via a Pallas
    kernel; caller slices to (nk, nj, ni). Grid layout matches
    evaluator.grid_eval_fn: [k, j, i], x contiguous."""
    if not HAS_PALLAS:
        raise RuntimeError("pallas unavailable in this environment")
    nk, nj, ni = (int(x) for x in shape)
    nj_pad = _round_up(nj, block_j)
    ni_pad = _round_up(ni, block_i)
    key = ("eval", tree.tree_hash(), shape, device, block_j, block_i)
    fn = _pallas_cache.get(key)
    if fn is not None:
        return fn

    distance, consts = _hoist_consts(tree, (block_j, block_i))
    const_in = _const_inputs(consts)

    def kernel(origin_ref, res_ref, *refs):
        const_refs, out_ref = refs[:-1], refs[-1]
        k = pl.program_id(0)
        j0 = pl.program_id(1) * block_j
        i0 = pl.program_id(2) * block_i
        res = res_ref[0]
        # Mosaic iota is integer-only; cast to f32 after
        iy = jax.lax.broadcasted_iota(jnp.int32, (block_j, block_i), 0).astype(jnp.float32)
        ix = jax.lax.broadcasted_iota(jnp.int32, (block_j, block_i), 1).astype(jnp.float32)
        x = origin_ref[0] + (ix + i0.astype(jnp.float32)) * res
        y = origin_ref[1] + (iy + j0.astype(jnp.float32)) * res
        z = jnp.full((block_j, block_i), origin_ref[2] + k.astype(jnp.float32) * res)
        p = jnp.stack([x, y, z], axis=-1)
        out_ref[0] = distance(p, *_read_consts(const_refs, consts))

    grid = (nk, nj_pad // block_j, ni_pad // block_i)

    def impl(origin, res, *const_vals):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nk, nj_pad, ni_pad), jnp.float32),
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(const_vals),
            out_specs=pl.BlockSpec(
                (1, block_j, block_i),
                lambda k, j, i: (k, j, i),
                memory_space=pltpu.VMEM,
            ),
            interpret=_interpret(device),
        )(origin, res, *const_vals)

    jitted = jax.jit(impl)

    def fn(origin, res, _jitted=jitted, _dev=device):
        with jax.default_device(_dev):
            origin = jnp.asarray(np.asarray(origin, _f32))
            res_arr = jnp.asarray(np.asarray([res], _f32))
            return _jitted(
                jax.device_put(origin, _dev),
                jax.device_put(res_arr, _dev),
                *(jax.device_put(c, _dev) for c in const_in),
            )

    _pallas_cache[key] = fn
    return fn


def evaluate_grid_pallas(tree, origin, res, shape, device=None):
    """Pallas-kernel dense grid evaluation; same contract as
    evaluator.evaluate_grid."""
    device = device if device is not None else jax.devices()[0]
    nk, nj, ni = (int(x) for x in shape)
    fn = pallas_grid_eval_fn(tree, (nk, nj, ni), device)
    out = fn(origin, _f32(res))
    return out[:, :nj, :ni]


# float32(2*sqrt3), the reference's corner-0 quick-reject factor
_DIAG = np.float32(2 * 1.73205080757)


def pallas_classified_grid_fn(tree, shape, device):
    """Compiled (origin, res) -> (distances (nk,nj_pad,ni_pad) f32,
    effective case grid (nk,nj_pad,ni_pad) i32).

    cases[k,j,i] (valid for k<nk-1, j<nj-1, i<ni-1) is the 256-case MC
    index of cube (i,j,k), already masked by the corner-0 quick-reject and
    zeroed for empty/full cases — `cases != 0` IS the active mask, and
    jnp-sum(MC_TRI_COUNT[cases]) the triangle count. One kernel pass:
    evaluation and classification fused via a carried previous-plane
    scratch (TPU grid steps run sequentially on the core).

    Whole z-planes are one block here, so VMEM holds ~3 planes — fine up
    to ~1024x1024 plane sizes."""
    if not HAS_PALLAS:
        raise RuntimeError("pallas unavailable in this environment")
    nk, nj, ni = (int(x) for x in shape)
    nj_pad = _round_up(nj, 8)
    ni_pad = _round_up(ni, 128)
    key = ("classify", tree.tree_hash(), shape, device)
    fn = _pallas_cache.get(key)
    if fn is not None:
        return fn

    distance, consts = _hoist_consts(tree, (nj_pad, ni_pad))
    const_in = _const_inputs(consts)
    interp = _interpret(device)

    _INF = np.float32(np.inf)

    # left-shift a plane by one along i/j with +inf fill. Mosaic's
    # pad->concatenate lowering miscompiles at large plane widths, so on
    # TPU use the native roll + an iota edge mask instead.
    def _shift_left_i(a):
        if interp:
            return jnp.pad(a[:, 1:], ((0, 0), (0, 1)), constant_values=np.inf)
        col = jax.lax.broadcasted_iota(jnp.int32, (nj_pad, ni_pad), 1)
        return jnp.where(col == ni_pad - 1, _INF, pltpu.roll(a, ni_pad - 1, 1))

    def _shift_left_j(a):
        if interp:
            return jnp.pad(a[1:, :], ((0, 1), (0, 0)), constant_values=np.inf)
        row = jax.lax.broadcasted_iota(jnp.int32, (nj_pad, ni_pad), 0)
        return jnp.where(row == nj_pad - 1, _INF, pltpu.roll(a, nj_pad - 1, 0))

    def kernel(origin_ref, res_ref, *refs):
        const_refs = refs[: len(const_in)]
        dist_ref, case_ref, prev_ref = refs[len(const_in) :]
        k = pl.program_id(0)
        res = res_ref[0]
        iy = jax.lax.broadcasted_iota(jnp.int32, (nj_pad, ni_pad), 0).astype(jnp.float32)
        ix = jax.lax.broadcasted_iota(jnp.int32, (nj_pad, ni_pad), 1).astype(jnp.float32)
        x = origin_ref[0] + ix * res
        y = origin_ref[1] + iy * res
        z = jnp.full((nj_pad, ni_pad), origin_ref[2] + k.astype(jnp.float32) * res)
        p = jnp.stack([x, y, z], axis=-1)
        cur = distance(p, *_read_consts(const_refs, consts))
        dist_ref[0] = cur

        prev = prev_ref[...]
        # corners 0-3 on the carried plane (z=k-1), 4-7 on this plane;
        # +inf padding keeps padded cubes inactive (sign bit 0 + reject)
        low = (prev, _shift_left_i(prev), _shift_left_i(_shift_left_j(prev)),
               _shift_left_j(prev))
        high = (cur, _shift_left_i(cur), _shift_left_i(_shift_left_j(cur)),
                _shift_left_j(cur))
        case = jnp.zeros((nj_pad, ni_pad), jnp.int32)
        for b, v in enumerate(low + high):
            case = case | (jnp.int32(v < 0.0) << b)
        keep = jnp.abs(prev) <= _DIAG * res
        case = jnp.where(keep & (case != 0) & (case != 255), case, 0)
        # k=0 has no carried plane: its write lands on block 0 and is
        # overwritten by k=1's (the index map clamps k-1 to 0; both steps
        # target the same VMEM-resident block, flushed once)
        case_ref[0] = case
        prev_ref[...] = cur

    def impl(origin, res, *const_vals):
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((nk, nj_pad, ni_pad), jnp.float32),
                jax.ShapeDtypeStruct((nk, nj_pad, ni_pad), jnp.int32),
            ),
            grid=(nk,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(const_vals),
            out_specs=(
                pl.BlockSpec(
                    (1, nj_pad, ni_pad), lambda k: (k, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, nj_pad, ni_pad),
                    lambda k: (jnp.maximum(k - 1, 0), 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            scratch_shapes=[pltpu.VMEM((nj_pad, ni_pad), jnp.float32)],
            interpret=_interpret(device),
        )(origin, res, *const_vals)

    jitted = jax.jit(impl)

    def fn(origin, res, _jitted=jitted, _dev=device):
        with jax.default_device(_dev):
            origin = jnp.asarray(np.asarray(origin, _f32))
            res_arr = jnp.asarray(np.asarray([res], _f32))
            return _jitted(
                jax.device_put(origin, _dev),
                jax.device_put(res_arr, _dev),
                *(jax.device_put(c, _dev) for c in const_in),
            )

    _pallas_cache[key] = fn
    return fn


def classified_grid_pallas(tree, origin, res, shape, device=None):
    """Fused eval+classify: returns (grid (nk,nj,ni) f32 distances,
    cases (nz,ny,nx) i32 effective MC case per cube)."""
    device = device if device is not None else jax.devices()[0]
    nk, nj, ni = (int(x) for x in shape)
    fn = pallas_classified_grid_fn(tree, (nk, nj, ni), device)
    dist, case = fn(origin, _f32(res))
    return dist[:, :nj, :ni], case[: nk - 1, : nj - 1, : ni - 1]
