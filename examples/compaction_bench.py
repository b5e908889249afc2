"""Microbenchmark: stream-compaction strategies on the real chip.

Compares mc_emit.compact_indices methods (searchsorted / sort / scatter)
at production grid sizes, plus the end-to-end effect on the flange
compact render. Run with the chip idle; checksum-forced timings.
"""
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def med_ms(fn, repeats=7):
    fn()
    ts = []
    for _ in range(repeats):
        t0 = time.monotonic()
        fn()
        ts.append(time.monotonic() - t0)
    return statistics.median(ts) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from gsdf_tpu.ops import mc_emit

    dev = jax.devices()[0]
    rng = np.random.default_rng(3)
    for n in (6_700_000, 53_000_000):
        mask = rng.random(n) < 0.03
        size = mc_emit.bucket(int(mask.sum()))
        mask_d = jax.device_put(jnp.asarray(mask), dev)
        for method in ("searchsorted", "sort", "scatter"):
            f = jax.jit(
                lambda m, _meth=method: mc_emit.compact_indices(m, size, _meth)[
                    -1
                ]
            )
            ms = med_ms(lambda: int(f(mask_d)))
            print(f"n={n:>11,} size={size:>8,} {method:>13}: {ms:7.2f} ms")

    from bench import build_flange
    from gsdf_tpu.render.flat import FlatRenderer

    tree = build_flange()
    res = tree.bounds().diagonal() / 400
    ms = med_ms(lambda: FlatRenderer(tree, res).render_compact(), repeats=7)
    print(f"flange resdiv400 render_compact end-to-end: {ms:.1f} ms")


if __name__ == "__main__":
    main()
