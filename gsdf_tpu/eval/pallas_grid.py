"""Pallas TPU kernel for dense SDF grid evaluation.

The XLA path (eval.evaluator.grid_eval_fn) already fuses position synthesis
into the distance arithmetic; this Pallas variant makes the tiling explicit:
each program instance synthesizes one (1, BJ, BI) position tile in VMEM from
its grid coordinates and evaluates the full fused CSG tree on it — HBM
traffic is exactly 4 bytes per evaluated corner (the distance written back).

Useful as a measured alternative backend and as the substrate for future
in-kernel fusion of classification (sign/index computation) with evaluation.

Block sizes respect the f32 (8, 128) minimum tile; BI should be a multiple
of 128 and BJ of 8. Trees with large embedded vertex arrays (polygons,
text) broadcast those arrays per tile — keep BI*BJ*V*8B within the VMEM
budget by lowering block sizes for such trees.
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


def pallas_grid_eval_fn(tree, shape, device, block_j: int = 8, block_i: int = 256):
    """Compiled (origin, res) -> (nk, nj_pad, ni_pad) distances via a Pallas
    kernel; caller slices to (nk, nj, ni). Grid layout matches
    evaluator.grid_eval_fn: [k, j, i], x contiguous."""
    if not HAS_PALLAS:
        raise RuntimeError("pallas unavailable in this environment")
    nk, nj, ni = (int(x) for x in shape)
    nj_pad = _round_up(nj, block_j)
    ni_pad = _round_up(ni, block_i)
    key = (tree.tree_hash(), shape, device, block_j, block_i)
    fn = _pallas_cache.get(key)
    if fn is not None:
        return fn

    def kernel(origin_ref, res_ref, out_ref):
        k = pl.program_id(0)
        j0 = pl.program_id(1) * block_j
        i0 = pl.program_id(2) * block_i
        res = res_ref[0]
        iy = jax.lax.broadcasted_iota(jnp.float32, (block_j, block_i), 0) + jnp.float32(0)
        ix = jax.lax.broadcasted_iota(jnp.float32, (block_j, block_i), 1)
        x = origin_ref[0] + (ix + i0.astype(jnp.float32)) * res
        y = origin_ref[1] + (iy + j0.astype(jnp.float32)) * res
        z = jnp.full((block_j, block_i), origin_ref[2] + k.astype(jnp.float32) * res)
        p = jnp.stack([x, y, z], axis=-1)
        out_ref[0] = tree.distance(p)

    grid = (nk, nj_pad // block_j, ni_pad // block_i)

    # interpret mode on non-TPU backends (tests run on the CPU mesh)
    interpret = getattr(device, "platform", "tpu") not in ("tpu", "axon")

    def impl(origin, res):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nk, nj_pad, ni_pad), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, block_j, block_i),
                lambda k, j, i: (k, j, i),
                memory_space=pltpu.VMEM,
            ),
            interpret=interpret,
        )(origin, res)

    jitted = jax.jit(impl)

    def fn(origin, res, _jitted=jitted, _dev=device):
        with jax.default_device(_dev):
            origin = jnp.asarray(np.asarray(origin, _f32))
            res_arr = jnp.asarray(np.asarray([res], _f32))
            return _jitted(jax.device_put(origin, _dev), jax.device_put(res_arr, _dev))

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
