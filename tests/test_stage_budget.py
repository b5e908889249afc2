"""On-chip per-stage device-time regression gate (flange production path).

docs/PERFORMANCE.md's stage budget (grid eval ~11.5 ms, hierarchical
compaction ~19 ms, gathers+pack ~3.5 ms => ~34 ms device total at
resdiv 400) is pinned here with generous 2x ceilings so a kernel-term
regression cannot hide inside tunnel/link noise. Each stage is timed
CHECKSUM-FORCED: the kernel output is sum-reduced ON DEVICE and the
4-byte scalar fetched (block_until_ready returns early through this
tunnel's async dispatch — end-to-end scalar fetches are the only
honest clock, docs/PERFORMANCE.md "Timing on axon"). The per-dispatch
RPC floor is calibrated on a tiny kernel and subtracted; a degraded
window (floor > 100 ms) skips rather than flakes — re-run healthy
(the window-calibration discipline, .claude/skills/verify/SKILL.md).

Runs only under GSDF_TPU_TEST_ACCEL=1 with a real accelerator.
"""
import os
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

_f32 = np.float32


def _accel():
    devs = [d for d in jax.devices() if d.platform != "cpu"]
    return devs[0] if devs else None


requires_accel = pytest.mark.skipif(
    _accel() is None or not os.environ.get("GSDF_TPU_TEST_ACCEL"),
    reason="stage-budget gate needs GSDF_TPU_TEST_ACCEL=1 and a chip",
)

# 2x ceilings over the docs/PERFORMANCE.md medians (net of RPC floor)
GRID_EVAL_CEILING_MS = 2 * 11.5
DEVICE_TOTAL_CEILING_MS = 2 * 34.0
NON_EVAL_CEILING_MS = 2 * 22.5  # compaction (~19) + gathers/pack (~3.5)


def _median_scalar_ms(fn, *args, repeats=7):
    """Median wall time of fn(*args) -> device scalar, scalar fetched
    (checksum-forced end-to-end); 2 warmups discarded."""
    for _ in range(2):
        float(np.asarray(fn(*args)))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


@requires_accel
def test_flange_stage_budget():
    from gsdf_tpu.flagships import build_flange
    from gsdf_tpu.ops.compact_field import _blk_slots, compact_emit, compact_field_render

    dev = _accel()

    # window calibration: per-dispatch RPC floor (scalar in, scalar out)
    tiny = jax.jit(lambda x: jnp.sum(x + 1.0), device=dev)
    x0 = jax.device_put(np.zeros((8,), _f32), dev)
    rpc_floor = _median_scalar_ms(tiny, x0)
    if rpc_floor > 100.0:
        pytest.skip(f"degraded tunnel window (RPC floor {rpc_floor:.0f} ms)")

    from gsdf_tpu.render.flat import FlatRenderer

    obj = build_flange()
    res = _f32(obj.bounds().diagonal() / 400)
    # the ONE production grid sizing (render/flat.py) — don't re-derive
    fr = FlatRenderer(obj, res, device=dev)
    nk, nj, ni = fr.nz + 1, fr.ny + 1, fr.nx + 1
    res = fr.res
    np_origin = np.asarray(fr.origin, _f32)
    origin = jax.device_put(np_origin, dev)

    def _positions():
        # the production synthesis (accelerator branch of the compact
        # kernel, ops/compact_field.py build_compact_field.impl)
        iz = jax.lax.broadcasted_iota(jnp.float32, (nk, nj, ni), 0)
        iy = jax.lax.broadcasted_iota(jnp.float32, (nk, nj, ni), 1)
        ix = jax.lax.broadcasted_iota(jnp.float32, (nk, nj, ni), 2)
        return lambda o, r: jnp.stack(
            [o[0] + ix * r, o[1] + iy * r, o[2] + iz * r], axis=-1
        )

    # stage 1: fused grid eval (6.7M corners), sum-reduced on device
    psynth = _positions()
    grid_sum = jax.jit(lambda o, r: jnp.sum(obj.distance(psynth(o, r))), device=dev)
    t_grid = _median_scalar_ms(grid_sum, origin, res)
    net_grid = max(t_grid - rpc_floor, 0.0)
    assert net_grid <= GRID_EVAL_CEILING_MS, (
        f"flange grid eval {net_grid:.1f} ms net of {rpc_floor:.1f} ms RPC "
        f"floor exceeds the {GRID_EVAL_CEILING_MS:.0f} ms ceiling "
        f"(docs/PERFORMANCE.md budget ~11.5 ms)"
    )

    # stage 2: the FULL production device pipeline (eval + classify +
    # hierarchical compaction + owner-edge t + v3 pack) at the warm
    # production buffer hints, sum-reduced on device so the payload
    # never crosses the link
    _, _, _, hint = compact_field_render(obj, np_origin, res, (nk, nj, ni), dev)
    if len(hint) == 4:
        a_size, v_size, e_size, blk = hint
    else:
        a_size, v_size, e_size = hint
        blk = _blk_slots(a_size)
    compact_sum = jax.jit(
        lambda o, r: jnp.sum(
            compact_emit(
                obj.distance(psynth(o, r)), r, a_size, e_size, v_size,
                blk_size=blk,
            )
        ),
        device=dev,
    )
    t_total = _median_scalar_ms(compact_sum, origin, res)
    net_total = max(t_total - rpc_floor, 0.0)
    assert net_total <= DEVICE_TOTAL_CEILING_MS, (
        f"flange compact device pipeline {net_total:.1f} ms net of "
        f"{rpc_floor:.1f} ms RPC floor exceeds the "
        f"{DEVICE_TOTAL_CEILING_MS:.0f} ms ceiling "
        f"(docs/PERFORMANCE.md budget ~34 ms)"
    )
    # the non-eval device terms inherit a derived bound so an eval
    # speedup can't mask a compaction regression
    assert net_total - net_grid <= NON_EVAL_CEILING_MS, (
        f"compaction+pack term {net_total - net_grid:.1f} ms exceeds "
        f"2x the ~22.5 ms budget"
    )
