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

STATUS — iteration mode, NOT the production path. XLA's fusion wins
runtime at every measured size (2.6-11x) and cold-compile at production
sizes; these kernels are kept for fast small-shape iteration (2-6 s
compiles), as an independent cross-check of classification, and as the
explicit-tiling record (docs/PERFORMANCE.md "Pallas vs XLA fusion").
The XLA path is the default everywhere
(tests/test_pallas.py::test_xla_backend_is_default_at_production_shapes).

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


def pallas_classified_grid_fn(
    tree, shape, device, block_j: int = 8, block_i: int = 256
):
    """Compiled (origin, res) -> (distances (nk,nj_pad,ni_pad) f32,
    effective case grid (nk,nj_pad,ni_pad) i32).

    cases[k,j,i] (valid for k<nk-1, j<nj-1, i<ni-1) is the 256-case MC
    index of cube (i,j,k), already masked by the corner-0 quick-reject and
    zeroed for empty/full cases — `cases != 0` IS the active mask, and
    jnp-sum(MC_TRI_COUNT[cases]) the triangle count.

    TILED pipeline (the whole-plane predecessor made Mosaic compile time
    explode past 10 min on deep trees at production plane sizes — the
    program body scaled with the plane): each program evaluates ONE
    (block_j, block_i) tile, so the compiled body is tile-sized
    regardless of the grid. A VMEM ring of TWO full planes (padded by
    one tile of +inf margin) carries recent planes across the
    sequential grid steps:

      step (k, j, i):
        1. k >= 2: classify cube layer k-2 for this tile — low corners
           from ring slot k%2 (plane k-2), high corners from slot
           (k+1)%2 (plane k-1), +1 halos read from the padded ring
           (neighbor tiles still hold plane k-2: the slot is only
           overwritten tile-by-tile later this k).
        2. k < nk: evaluate plane k's tile, store into ring slot k%2
           and the distance output. k == nk re-writes plane nk-1's tile
           from the ring so the clamped output block revisit can't
           flush stale data.

    The classification trails two planes behind the evaluation, which is
    why the grid has nk+1 z-steps."""
    if not HAS_PALLAS:
        raise RuntimeError("pallas unavailable in this environment")
    nk, nj, ni = (int(x) for x in shape)
    bj, bi = int(block_j), int(block_i)
    nj_pad = _round_up(nj, bj)
    ni_pad = _round_up(ni, bi)
    key = ("classify", tree.tree_hash(), shape, device, bj, bi)
    fn = _pallas_cache.get(key)
    if fn is not None:
        return fn

    distance, consts = _hoist_consts(tree, (bj, bi))
    const_in = _const_inputs(consts)

    _INF = np.float32(np.inf)

    def kernel(origin_ref, res_ref, *refs):
        const_refs = refs[: len(const_in)]
        dist_ref, case_ref, ring_ref = refs[len(const_in) :]
        k = pl.program_id(0)
        j = pl.program_id(1)
        i = pl.program_id(2)
        j0 = j * bj
        i0 = i * bi
        res = res_ref[0]

        # one-time +inf fill of the ring margins (and everything else):
        # padded cubes stay inactive (sign bit 0 + quick-reject)
        @pl.when((k == 0) & (j == 0) & (i == 0))
        def _init():
            ring_ref[...] = jnp.full(ring_ref.shape, _INF, jnp.float32)

        # --- classify cube layer k-2 (planes k-2 / k-1 in the ring) ---
        @pl.when(k >= 2)
        def _classify():
            low_sl = jax.lax.rem(k, 2)
            high_sl = jax.lax.rem(k + 1, 2)
            # (bj+8, bi+128) aligned halo loads; only [+1] rows/cols used
            lowR = ring_ref[low_sl, pl.ds(j0, bj + 8), pl.ds(i0, bi + 128)]
            highR = ring_ref[high_sl, pl.ds(j0, bj + 8), pl.ds(i0, bi + 128)]

            def c(R, dj, di):
                return R[dj : bj + dj, di : bi + di]

            # corner order per mc_emit.CORNER_OFFSETS: (di,dj) low plane
            # 0:(0,0) 1:(1,0) 2:(1,1) 3:(0,1), then high plane 4-7
            corners = (
                c(lowR, 0, 0), c(lowR, 0, 1), c(lowR, 1, 1), c(lowR, 1, 0),
                c(highR, 0, 0), c(highR, 0, 1), c(highR, 1, 1), c(highR, 1, 0),
            )
            case = jnp.zeros((bj, bi), jnp.int32)
            for b, v in enumerate(corners):
                case = case | (jnp.int32(v < 0.0) << b)
            keep = jnp.abs(corners[0]) <= _DIAG * res
            case_ref[0] = jnp.where(
                keep & (case != 0) & (case != 255), case, 0
            )

        # --- evaluate plane k's tile --------------------------------
        @pl.when(k < nk)
        def _evaluate():
            iy = jax.lax.broadcasted_iota(jnp.int32, (bj, bi), 0).astype(
                jnp.float32
            )
            ix = jax.lax.broadcasted_iota(jnp.int32, (bj, bi), 1).astype(
                jnp.float32
            )
            x = origin_ref[0] + (ix + (i * bi).astype(jnp.float32)) * res
            y = origin_ref[1] + (iy + (j * bj).astype(jnp.float32)) * res
            z = jnp.full((bj, bi), origin_ref[2] + k.astype(jnp.float32) * res)
            p = jnp.stack([x, y, z], axis=-1)
            cur = distance(p, *_read_consts(const_refs, consts))
            dist_ref[0] = cur
            ring_ref[jax.lax.rem(k, 2), pl.ds(j0, bj), pl.ds(i0, bi)] = cur

        # k == nk revisits the clamped distance block (nk-1, j, i): not
        # writing would let the pipeline flush stale VMEM over the real
        # plane; re-write it from the ring (slot (nk+1)%2 = plane nk-1)
        @pl.when(k == nk)
        def _rewrite_last():
            dist_ref[0] = ring_ref[
                jax.lax.rem(k + 1, 2), pl.ds(j0, bj), pl.ds(i0, bi)
            ]

    grid = (nk + 1, nj_pad // bj, ni_pad // bi)

    def impl(origin, res, *const_vals):
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((nk, nj_pad, ni_pad), jnp.float32),
                jax.ShapeDtypeStruct((nk, nj_pad, ni_pad), jnp.int32),
            ),
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(const_vals),
            out_specs=(
                pl.BlockSpec(
                    (1, bj, bi),
                    lambda k, j, i: (jnp.minimum(k, nk - 1), j, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, bj, bi),
                    lambda k, j, i: (jnp.maximum(k - 2, 0), j, i),
                    memory_space=pltpu.VMEM,
                ),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, nj_pad + 8, ni_pad + 128), jnp.float32)
            ],
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
