"""Dual-contouring benchmark: the bolt example scene on the real chip.

Reproduces the docs/PERFORMANCE.md "Dual contouring" table: warm median
SDF -> triangle-mesh wall times for the fully-on-device QEF pipeline
(default and chiseled modes) and payload/fetch sizes, plus the float64
host-QEF oracle for reference. Run with the chip idle; end-to-end wall
times only (async dispatch lies on the tunneled link).

`--cpu` runs the same battery on the host CPU backend (the oracle
device); `--resdiv` changes the grid (golden counts only hold at 256).
"""
import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from _common import example_args  # noqa: F401  (sets examples/ on path)


def med_ms(fn, repeats=7):
    fn()
    ts = []
    for _ in range(repeats):
        t0 = time.monotonic()
        fn()
        ts.append(time.monotonic() - t0)
    return statistics.median(ts) * 1e3, ts


def main():
    import jax

    from bolt import scene  # the golden bolt scene (examples/bolt.py)

    from gsdf_tpu import Builder
    from gsdf_tpu.render.dual_contour import (
        DualContourLeastSquares,
        DualContourRenderer,
    )

    args = example_args(resdiv_default=256)
    device = jax.devices("cpu")[0] if args.cpu else jax.devices()[0]
    m3 = scene(Builder())
    res = args.res or m3.bounds().diagonal() / args.resdiv
    print(f"device: {device}, bolt scene resdiv {args.resdiv} (res {res:.5f})")

    for label, kw in (
        ("device QEF", {}),
        ("device QEF chiseled", {"contourer": DualContourLeastSquares(chiseled=True)}),
        ("host f64 QEF oracle", {"host_qef": True}),
    ):
        dc = DualContourRenderer(m3, res, device=device, **kw)
        tris = dc.render()  # compile + warm hints
        ms, ts = med_ms(lambda d=dc: d.render())
        print(
            f"{label:>22}: {ms:7.1f} ms median of 7 "
            f"(min {min(ts)*1e3:.1f} / max {max(ts)*1e3:.1f}), "
            f"{len(tris):,} triangles, {dc.evaluations():,} cumulative evals"
        )


if __name__ == "__main__":
    main()
