"""Roofline analysis of the flagship dense-evaluation workload.

Answers: what fraction of the chip does the flange tree evaluation use,
and what binds it? (VERDICT r2 item 6 / BASELINE.json "evals/sec/chip"
north-star, made honest.)

Method: lower + compile the exact checksum kernel `throughput_grid` runs
(eval/special.py:75), read XLA's `cost_analysis()` for flops/
transcendentals/bytes, measure wall time on the real chip, and compare
achieved rates against the v5e ceilings:

- VPU f32:   the TensorCore's vector unit is an (8,128) 2-D ALU array with
  4 independent ALUs per lane; at the ~1.5 GHz clock implied by the
  published 197 bf16 TFLOP/s MXU peak (4 MXUs x 128x128 x 2 flop x clock)
  that is 8*128*4*2*1.5e9 = ~12.3 Tflop/s f32 counting FMA as 2 (half
  that for non-fused ops). Elementwise SDF math runs here, not the MXU.
- HBM:       819 GB/s.
- transcendentals (atan2/sqrt/exp in screw sweeps and smooth booleans)
  retire on a slower special-function path; XLA reports them separately.

Run: python examples/roofline.py   (uses the default device; on the axon
tunnel the checksum fetch adds ~25 ms RPC which is subtracted via the
reported pure-device estimate).
"""
import json
import statistics
import time

import numpy as np

import _common  # noqa: F401  (ensures gsdf_tpu importable)
from gsdf_tpu.flagships import build_flange

_f32 = np.float32


def main():
    import jax
    import jax.numpy as jnp

    tree = build_flange()
    dev = jax.devices()[0]
    shape = (512, 512, 512)
    nk, nj, ni = shape
    n_eval = nk * nj * ni

    bb = tree.bounds().scale_centered((1.01, 1.01, 1.01))
    res = _f32(max(bb.size()) / (nk - 1))
    origin = np.asarray(bb.min, _f32)

    def impl(origin, res):
        iz = jax.lax.broadcasted_iota(jnp.float32, shape, 0)
        iy = jax.lax.broadcasted_iota(jnp.float32, shape, 1)
        ix = jax.lax.broadcasted_iota(jnp.float32, shape, 2)
        p = jnp.stack(
            [origin[0] + ix * res, origin[1] + iy * res, origin[2] + iz * res],
            axis=-1,
        )
        d = tree.distance(p)
        return jnp.sum(jnp.abs(jnp.clip(d, -1.0, 1.0)))

    print(f"lowering + compiling flange tree checksum kernel {shape} ...")
    compiled = jax.jit(impl).lower(jnp.asarray(origin), res).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    transcendentals = float(ca.get("transcendentals", 0.0))
    bytes_accessed = float(ca.get("bytes accessed", 0.0))

    # measured wall time, checksum fetch as completion barrier
    with jax.default_device(dev):
        args = (jax.device_put(jnp.asarray(origin), dev), res)
        float(compiled(*args))  # warm
        times = []
        for _ in range(7):
            t0 = time.monotonic()
            float(compiled(*args))
            times.append(time.monotonic() - t0)
    med = statistics.median(times)
    rpc = 0.025  # measured tunnel round trip (docs/PERFORMANCE.md)
    dev_s = max(med - rpc, 1e-9)

    geval = n_eval / med / 1e9
    geval_dev = n_eval / dev_s / 1e9
    flops_per_eval = flops / n_eval
    trans_per_eval = transcendentals / n_eval
    achieved_flops = flops / dev_s
    achieved_trans = transcendentals / dev_s

    vpu_fma = 8 * 128 * 4 * 2 * 1.5e9  # f32, FMA=2 flop
    vpu_nofma = vpu_fma / 2
    hbm = 819e9
    # fused kernel's true HBM traffic ~= one f32 per eval written + read
    # once by the reduce (cost_analysis "bytes accessed" counts every
    # logical buffer touch pre-fusion and wildly overstates traffic)
    hbm_traffic = 2 * 4.0 * n_eval

    out = {
        "shape": list(shape),
        "evals": n_eval,
        "median_wall_ms": round(med * 1e3, 1),
        "geval_per_s_end_to_end": round(geval, 3),
        "geval_per_s_device": round(geval_dev, 3),
        "xla_flops_per_eval": round(flops_per_eval, 1),
        "xla_transcendentals_per_eval": round(trans_per_eval, 2),
        "achieved_vector_tflops": round(achieved_flops / 1e12, 3),
        "achieved_transcendental_gops": round(achieved_trans / 1e9, 2),
        "vpu_f32_ceiling_tflops_fma": round(vpu_fma / 1e12, 1),
        "vpu_utilization_pct_fma": round(100 * achieved_flops / vpu_fma, 1),
        "vpu_utilization_pct_nofma": round(100 * achieved_flops / vpu_nofma, 1),
        "hbm_traffic_gb_per_s": round(hbm_traffic / dev_s / 1e9, 2),
        "hbm_utilization_pct": round(100 * hbm_traffic / dev_s / hbm, 2),
        "xla_bytes_accessed_logical_gb": round(bytes_accessed / 1e9, 1),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
