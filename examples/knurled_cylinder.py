"""Knurled cylinder with twisted diamond pattern and vent holes
(reference examples/knurled-cylinder/knurled-cyl.go:57-110; a port of
fogleman's sdf python knurling example). Scene lives in
gsdf_tpu.flagships; this is the CLI wrapper.
"""
from _common import example_args, render_stl

from gsdf_tpu import Builder
from gsdf_tpu.flagships import knurled_scene


def build_shape(bld: Builder, diameter=20.0, hole_diam=0.0, length=0.0, knurl_size=0.0):
    obj = knurled_scene(
        bld, diameter=diameter, hole_diam=hole_diam, length=length,
        knurl_size=knurl_size,
    )
    err = bld.err()
    if err:
        raise err
    return obj


if __name__ == "__main__":
    args = example_args(d=(20.0, "diameter of cylinder"))
    bld = Builder()
    render_stl(build_shape(bld, diameter=args.d), "knurled-cyl", args)
