"""M3 ISO bolt with hex head (reference examples/bolt/main.go:27-40).
Scene lives in gsdf_tpu.flagships; this is the CLI wrapper."""
from _common import example_args, render_stl

from gsdf_tpu import Builder
from gsdf_tpu.flagships import bolt_scene


def scene(bld: Builder):
    m3 = bolt_scene(bld)
    err = bld.err()
    if err:
        raise err
    return m3


if __name__ == "__main__":
    args = example_args()
    bld = Builder()
    render_stl(scene(bld), "bolt", args)
