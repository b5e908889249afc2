"""M3 ISO bolt with hex head (reference examples/bolt/main.go:27-40)."""
import math

from _common import example_args, render_stl

from gsdf_tpu import Builder
from gsdf_tpu.forge import threads


def scene(bld: Builder):
    L, shank = 8, 3
    threader = threads.ISO(d=3, p=0.5, ext=True)
    m3 = threads.bolt(
        bld,
        threads.BoltParams(
            thread=threader,
            style=threads.NutStyle.HEX,
            total_length=L + shank,
            shank_length=shank,
        ),
    )
    m3 = bld.rotate(m3, 2.5 * math.pi / 2, (1, 0, 0.1))
    err = bld.err()
    if err:
        raise err
    return m3


if __name__ == "__main__":
    args = example_args()
    bld = Builder()
    render_stl(scene(bld), "bolt", args)
